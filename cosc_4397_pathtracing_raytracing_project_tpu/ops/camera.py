"""Pinhole camera ray generation (`src/pathtrace.cu:270-286`).

Rays are produced directly as flat ``[N, 3]`` SoA arrays (pixel index
``idx = x + y*width``) — the TPU redesign of the reference's per-thread
PathSegment initialization. Optional sub-pixel jitter enables antialiasing
(the reference shoots every sample through the same pixel corner).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..scene.structs import Camera
from . import linalg


def generate_rays(
    camera: Camera,
    jitter: Optional[jnp.ndarray] = None,
    pixel_offset: int = 0,
    num_pixels: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (origins [N,3], directions [N,3]) for pixels
    [pixel_offset, pixel_offset + N) in row-major order.

    Matches `generateRayFromCamera`:
    ``dir = normalize(view - right*plx*(x - w/2) - up*ply*(y - h/2))``.
    `jitter` is an optional [N,2] array of sub-pixel offsets in [0,1).
    """
    w, h = camera.resolution
    n = num_pixels if num_pixels is not None else w * h
    idx = pixel_offset + jnp.arange(n, dtype=jnp.int32)
    x = (idx % w).astype(jnp.float32)
    y = (idx // w).astype(jnp.float32)
    if jitter is not None:
        x = x + jitter[:, 0]
        y = y + jitter[:, 1]
    sx = camera.pixel_length[0] * (x - 0.5 * w)
    sy = camera.pixel_length[1] * (y - 0.5 * h)
    directions = (
        camera.view[None, :]
        - camera.right[None, :] * sx[:, None]
        - camera.up[None, :] * sy[:, None]
    )
    directions = linalg.normalize(directions)
    origins = jnp.broadcast_to(camera.position[None, :], (n, 3))
    return origins, directions
