"""Probe: can MAX_ENV_EXACT_TEXELS be lifted past 256×512?

The in-kernel exact env gather's MXU cost scales linearly with texel
count (16 row-matmuls of [Wp, Hp]·[Hp, 128] per channel per tile-sample),
so each 2× in map area costs ~2× the gather. This script measures the
in-kernel exact and exact+NEE throughput at 256×512, 512×1024 and (with
--huge) 1024×2048 on the showcase scene geometry, against the XLA fast
pipeline at the same size — the honest basis for raising (or keeping)
the cap.

Run from the repo root on the TPU:  python scripts/bench_env_big.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosc_4397_pathtracing_raytracing_project_tpu import (  # noqa: E402
    Renderer,
    RenderConfig,
)
from cosc_4397_pathtracing_raytracing_project_tpu.ops.pallas import (  # noqa: E402
    megakernel,
)
from cosc_4397_pathtracing_raytracing_project_tpu.scene.parser import (  # noqa: E402
    load_scene_desc,
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_envmap import make_meadow  # noqa: E402


def bench(desc, cfg, spp, chunk):
    r = Renderer(desc, cfg)
    r.step(chunk)  # compile
    r.reset()
    t0 = time.perf_counter()
    r.render(spp)
    r.sync()
    wall = time.perf_counter() - t0
    n = desc.camera.resolution[0] * desc.camera.resolution[1]
    return n * spp / wall / 1e6


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--huge", action="store_true")
    args = ap.parse_args()

    heights = [128, 256, 512] + ([1024] if args.huge else [])
    megakernel.MAX_ENV_EXACT_TEXELS = 1024 * 2048 * 4  # probe override
    for h in heights:
        desc = load_scene_desc("scenes/env_spheres.txt")
        desc.env_image = make_meadow(h).astype(np.float32)
        common = dict(samples_per_launch=args.chunk, enable_refraction=True)
        rows = [
            ("exact(kernel)", RenderConfig(pipeline="pallas", **common)),
            ("exact+nee(kernel)", RenderConfig(pipeline="pallas", nee=True,
                                               **common)),
            ("exact(fast)", RenderConfig(pipeline="fast", **common)),
        ]
        for name, cfg in rows:
            try:
                m = bench(desc, cfg, args.spp, args.chunk)
                print(f"{h}x{2 * h}  {name:18s} {m:7.1f} M rays/s",
                      flush=True)
            except Exception as e:  # VMEM overflow etc. — report honestly
                print(f"{h}x{2 * h}  {name:18s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
