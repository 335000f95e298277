"""Profiling & tracing utilities.

The reference brackets each of its four kernels with CUDA events and prints
per-stage milliseconds every iteration (`pathtrace.cu:539-547,632-646`). The
TPU build fuses the whole sample into one computation, so per-stage numbers
come from running the stages as separately-jitted functions on demand
(`profile_stages`), and whole-program analysis uses the XLA profiler
(`trace`, viewable in TensorBoard / xprof)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import jax.numpy as jnp

from ..ops import camera as camera_ops
from ..ops import rng as rng_ops
from ..ops.intersect import intersect_scene
from ..ops.shade import init_paths, shade_step
from ..scene.structs import Scene


def _sync(x) -> None:
    """Reliable device sync (see Renderer.sync)."""
    jax.tree.leaves(x)[0].block_until_ready()
    import numpy as np

    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.reshape(-1)[0])


def _time(fn, *args, reps: int = 10) -> float:
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


def profile_stages(scene: Scene, config, seed: int = 0, reps: int = 10) -> Dict[str, float]:
    """Per-stage milliseconds for one full-frame bounce — the reference's
    raygen/intersect/shade breakdown (`pathtrace.cu:642-645`)."""
    key = jax.random.PRNGKey(seed)
    n = scene.camera.pixel_count

    raygen = jax.jit(lambda: camera_ops.generate_rays(scene.camera))
    o, d = raygen()
    isect = jax.jit(lambda o, d: intersect_scene(scene, o, d))
    hit = isect(o, d)
    paths = init_paths(o, d, config.trace_depth)
    rng_fn = jax.jit(lambda it: rng_ops.bounce_uniforms(key, it, 0, n))
    u = rng_fn(jnp.int32(1))
    shade = jax.jit(
        lambda p, h, u: shade_step(
            p, h, scene.materials, u, 1, config.rr_start_depth,
            gather_mode=config.gather_mode, sky_strength=config.sky_strength,
        )
    )
    gather = jax.jit(lambda acc, c: acc + c)
    acc0 = jnp.zeros((n, 3), jnp.float32)

    return {
        "raygen_ms": _time(raygen, reps=reps),
        "rng_ms": _time(rng_fn, jnp.int32(1), reps=reps),
        "intersect_ms": _time(isect, o, d, reps=reps),
        "shade_ms": _time(shade, paths, hit, u, reps=reps),
        "gather_ms": _time(gather, acc0, paths.color, reps=reps),
    }


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace (open with TensorBoard's profile plugin / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (TraceAnnotation analog)."""
    return jax.profiler.TraceAnnotation(name)
