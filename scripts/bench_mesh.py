"""Mesh-pipeline microbenchmark on the real TPU (BASELINE config 5 scene).

Times one warm sample of trace_sample_mesh at 1080p over the 38.5k-triangle
scene, with a breakdown of the per-bounce pieces (sort vs cluster kernel),
and sweeps tuning knobs when asked.

    python scripts/bench_mesh.py [--samples 3] [--depth 8] [--res 1920x1080]
                                 [--cluster 64] [--no-sort]

All timings use a data-dependent fetch (float(sum(x[:2]))) — on this backend
block_until_ready can return before queued kernels finish (see CLAUDE.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache, same path as bench.py / tpu_experiments.py:
# sweep reruns skip the 25-90s remote compile for already-seen shapes
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("PT_COMPILE_CACHE", os.path.expanduser("~/.cache/jax_pt")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:2]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--res", default="1920x1080")
    ap.add_argument("--cluster", type=int, default=None)
    ap.add_argument("--no-sort", action="store_true")
    ap.add_argument("--batch", type=int, default=1,
                    help="samples per jitted dispatch")
    ap.add_argument("--sort-every", type=int, default=1,
                    help="sort the wavefront every Nth bounce")
    ap.add_argument("--fused-sort", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="fused lax.sort with payloads instead of argsort+"
                         "gather (default on: 4.78 vs 2.64 M rays/s)")
    ap.add_argument("--sort-cells", type=int, default=2,
                    help="origin-grid resolution of the sort key "
                         "(default 2: 4.90 vs 4.78 M rays/s at cells=4)")
    ap.add_argument("--tile-rows", type=int, default=None,
                    help="override mesh_kernel.TILE_ROWS (fresh process only)")
    ap.add_argument("--super", type=int, default=None, dest="super_",
                    help="override mesh_kernel.SUPER — clusters per "
                         "supercluster (fresh process only)")
    ap.add_argument("--box-batch", type=int, default=None,
                    help="override mesh_kernel.BATCH — boxes slab-tested "
                         "per scalar branch (fresh process only)")
    ap.add_argument("--nee", action="store_true",
                    help="direct light sampling + MIS (cluster-kernel "
                         "shadow rays; needs an analytic emitter)")
    ap.add_argument("--ablation", default=None,
                    choices=["notri", "noload"],
                    help="timing probe (image is WRONG): 'notri' keeps row "
                         "loads, drops the MT math; 'noload' keeps the "
                         "math, drops the loads")
    args = ap.parse_args()

    if (args.tile_rows is not None or args.super_ is not None
            or args.box_batch is not None or args.ablation is not None):
        from cosc_4397_pathtracing_raytracing_project_tpu.ops.pallas import (
            mesh_kernel,
        )

        if args.tile_rows is not None:
            mesh_kernel.TILE_ROWS = args.tile_rows
            mesh_kernel.TILE = args.tile_rows * mesh_kernel.LANES
        if args.super_ is not None:
            mesh_kernel.SUPER = args.super_
        if args.box_batch is not None:
            mesh_kernel.BATCH = args.box_batch
        if args.ablation is not None:
            mesh_kernel.ABLATION = args.ablation

    from cosc_4397_pathtracing_raytracing_project_tpu import RenderConfig
    from cosc_4397_pathtracing_raytracing_project_tpu.ops import fast
    from cosc_4397_pathtracing_raytracing_project_tpu.render.engine import (
        make_mesh_intersector,
    )
    from cosc_4397_pathtracing_raytracing_project_tpu.scene import (
        Scene,
        load_scene_desc,
    )

    scenes = os.path.join(os.path.dirname(__file__), "..", "scenes")
    desc = load_scene_desc(os.path.join(scenes, "mesh1080p.txt"))
    w, h = (int(v) for v in args.res.split("x"))
    desc.camera.resolution = (w, h)
    scene = Scene.from_desc(desc)
    print(f"scene: {scene.triangles.count} tris, {w}x{h}", file=sys.stderr)

    kw = {}
    if args.cluster is not None:
        kw["cluster_size"] = args.cluster
    import cosc_4397_pathtracing_raytracing_project_tpu.render.engine as eng

    if args.cluster is not None:
        from cosc_4397_pathtracing_raytracing_project_tpu.ops import bvh as bvh_mod
        from cosc_4397_pathtracing_raytracing_project_tpu.ops.pallas.mesh_kernel import (
            ClusterMeshIntersector,
        )

        v0 = np.asarray(scene.triangles.v0)
        e1 = np.asarray(scene.triangles.e1)
        e2 = np.asarray(scene.triangles.e2)
        mat = np.asarray(scene.triangles.material_id)
        tmin = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
        tmax = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
        bvh = bvh_mod.try_native_build(tmin, tmax, 8) or bvh_mod.build_bvh(
            tmin, tmax, leaf_size=8
        )
        o = bvh.order
        # pass the BVH so the sweep measures the production treelet
        # partition (without it the fallback fixed-run partition with
        # looser AABBs is benchmarked — not comparable to the default)
        cluster = ClusterMeshIntersector(
            v0[o], e1[o], e2[o], mat[o], cluster_size=args.cluster, bvh=bvh
        )
    else:
        cluster = make_mesh_intersector(scene)
    sampler = None
    if args.nee:
        from cosc_4397_pathtracing_raytracing_project_tpu.ops.lights import (
            make_light_sampler,
        )

        sampler = make_light_sampler(scene)
        assert sampler is not None, "scene has no analytic emitter"
    cfg = RenderConfig(
        trace_depth=args.depth,
        sky_strength=1.0,
        nee=args.nee,
        mesh_ray_sort=not args.no_sort,
        mesh_sort_every=args.sort_every,
        mesh_sort_fused=args.fused_sort,
        mesh_sort_cells=args.sort_cells,
    )

    import functools

    from cosc_4397_pathtracing_raytracing_project_tpu.ops.pallas.mesh_kernel import (
        JIT_COMPILER_OPTIONS,
    )

    @functools.partial(jax.jit, static_argnames=("k",),
                       compiler_options=JIT_COMPILER_OPTIONS)
    def run(scene, key, iteration, k):
        def body(i, acc):
            return acc + fast.trace_sample_mesh(
                scene, cfg, key, iteration + i, cluster,
                light_sampler=sampler,
            )
        acc0 = jnp.zeros((scene.camera.pixel_count, 3), jnp.float32)
        if k == 1:
            return acc0 + fast.trace_sample_mesh(
                scene, cfg, key, iteration, cluster, light_sampler=sampler
            )
        return jax.lax.fori_loop(0, k, body, acc0)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    sync(run(scene, key, jnp.int32(1), args.batch))
    print(f"compile+first: {time.time()-t0:.2f}s", file=sys.stderr)

    best = float("inf")
    for i in range(args.samples):
        t0 = time.time()
        out = run(scene, key, jnp.int32(2 + i * args.batch), args.batch)
        sync(out)
        dt = (time.time() - t0) / args.batch
        best = min(best, dt)
        print(f"sample {i}: {dt*1e3:.1f} ms/sample", file=sys.stderr)

    rays = w * h
    print(
        {
            "ms_per_sample": round(best * 1e3, 2),
            "mrays_per_sec": round(rays / best / 1e6, 3),
            "depth": args.depth,
            "sort": not args.no_sort,
            "cluster": args.cluster,
            "batch": args.batch,
            "nee": args.nee,
        }
    )


if __name__ == "__main__":
    main()
