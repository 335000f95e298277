"""Generate the procedural HDR environment map used by the IBL extension
demo + tests (`scenes/meadow.hdr`): a blue-sky gradient, a small very bright
sun disk (the importance-sampling stress: ~4000× the sky radiance on ~0.01%
of the pixels), a horizon haze band, and a dim brown ground hemisphere.

Run from the repo root:  python scripts/make_envmap.py [--height 128]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosc_4397_pathtracing_raytracing_project_tpu.io.png import write_hdr
from cosc_4397_pathtracing_raytracing_project_tpu.ops.envmap import uv_to_dir


def make_meadow(h: int = 128) -> np.ndarray:
    w = 2 * h
    v, u = np.meshgrid(
        (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij"
    )
    import jax.numpy as jnp  # uv_to_dir is jnp; tiny arrays, CPU-fine

    d = np.asarray(uv_to_dir(jnp.asarray(u), jnp.asarray(v)))
    y = d[..., 1]

    img = np.zeros((h, w, 3), np.float32)
    # sky: zenith blue → horizon white
    t = np.clip(y, 0.0, 1.0)
    sky = (1.0 - t)[..., None] * np.array([0.9, 0.9, 0.95]) + t[..., None] * (
        np.array([0.25, 0.45, 0.95])
    )
    # ground: dim warm brown with a little horizon bounce
    g = np.clip(-y, 0.0, 1.0)
    ground = (1.0 - g)[..., None] * np.array([0.35, 0.3, 0.25]) + g[
        ..., None
    ] * np.array([0.12, 0.09, 0.06])
    img = np.where(y[..., None] >= 0, sky, ground).astype(np.float32)
    # horizon haze
    img += np.exp(-np.abs(y) * 12.0)[..., None] * np.array(
        [0.25, 0.22, 0.18], np.float32
    )
    # sun disk at 35° elevation: radiance step ~4000× the sky
    sun_dir = np.array([np.sin(0.6), np.sin(np.deg2rad(35)), -np.cos(0.6)])
    sun_dir /= np.linalg.norm(sun_dir)
    cosang = d @ sun_dir
    disk = cosang > np.cos(np.deg2rad(1.8))
    img[disk] = np.array([3800.0, 3400.0, 2800.0], np.float32)
    return img


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--out", default="scenes/meadow.hdr")
    args = ap.parse_args()
    img = make_meadow(args.height)
    path = write_hdr(args.out, img)
    print(f"wrote {path}  ({img.shape[0]}x{img.shape[1]}, "
          f"max {img.max():.0f}, mean {img.mean():.3f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
