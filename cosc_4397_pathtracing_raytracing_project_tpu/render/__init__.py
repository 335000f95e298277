from .denoise import Aovs, atrous_denoise, denoise_image, render_aovs
from .engine import RenderConfig, Renderer, render_chunk, trace_sample
from .metrics import MetricsTracker, mse_between, psnr_from_mse
from .state import RenderState

__all__ = [
    "Aovs",
    "atrous_denoise",
    "denoise_image",
    "render_aovs",
    "RenderConfig",
    "Renderer",
    "render_chunk",
    "trace_sample",
    "MetricsTracker",
    "mse_between",
    "psnr_from_mse",
    "RenderState",
]
