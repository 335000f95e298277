"""Accumulator → display conversions.

Two output paths, matching the reference exactly:
- display path (`sendImageToPBO`, `pathtrace.cu:250-268`): mean, gamma 1/2.2,
  clamp, uint8;
- PNG save path (`saveImage` + `image::savePNG`, `main.cpp:86-107`,
  `image.cpp:22-39`): mean, clamp [0,1], ×255, NO gamma, horizontally
  mirrored (x → width-1-x).
"""

from __future__ import annotations

import jax.numpy as jnp


def display_image(accum: jnp.ndarray, iteration) -> jnp.ndarray:
    """[H, W, 3] or [N, 3] accumulator → uint8 with gamma 2.2."""
    pix = accum / jnp.maximum(jnp.asarray(iteration, jnp.float32), 1.0)
    pix = jnp.power(jnp.maximum(pix, 0.0), 1.0 / 2.2)
    return jnp.clip(pix * 255.0, 0.0, 255.0).astype(jnp.uint8)


def save_image(accum: jnp.ndarray, iteration, width: int, height: int) -> jnp.ndarray:
    """Accumulator (flat [N,3] or [H,W,3]) → [H, W, 3] uint8, linear (no
    gamma), mirrored horizontally as the reference writes PNGs."""
    img = accum.reshape(height, width, 3)
    pix = img / jnp.maximum(jnp.asarray(iteration, jnp.float32), 1.0)
    pix = jnp.clip(pix, 0.0, 1.0) * 255.0
    pix = pix[:, ::-1, :]  # saveImage writes pixel x to column width-1-x
    return pix.astype(jnp.uint8)


def mean_image(accum: jnp.ndarray, iteration) -> jnp.ndarray:
    """Linear per-pixel mean (used by the PSNR harness)."""
    return accum / jnp.maximum(jnp.asarray(iteration, jnp.float32), 1.0)
