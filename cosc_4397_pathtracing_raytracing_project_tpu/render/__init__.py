from .engine import RenderConfig, Renderer, render_chunk, trace_sample
from .metrics import MetricsTracker, mse_between, psnr_from_mse
from .state import RenderState

__all__ = [
    "RenderConfig",
    "Renderer",
    "render_chunk",
    "trace_sample",
    "MetricsTracker",
    "mse_between",
    "psnr_from_mse",
    "RenderState",
]
