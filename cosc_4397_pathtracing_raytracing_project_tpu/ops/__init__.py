from . import camera, intersect, linalg, rng, sampling, shade, tonemap
from .intersect import Hit, intersect_scene
from .shade import PathState, init_paths, shade_step
from .camera import generate_rays

__all__ = [
    "camera",
    "intersect",
    "linalg",
    "rng",
    "sampling",
    "shade",
    "tonemap",
    "Hit",
    "intersect_scene",
    "PathState",
    "init_paths",
    "shade_step",
    "generate_rays",
]
