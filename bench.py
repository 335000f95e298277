"""Headline benchmark: Cornell Box 800×800, trace depth 8, single TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

Baseline: 236 M primary samples/s (the reference CUDA renderer's naive
configuration, README.md:30; "rays/s" = pixels × iterations / wall seconds,
`src/pathtrace.cu:173`). vs_baseline is value / 236e6.

Env knobs: PT_BENCH_ITERS (default 1000), PT_BENCH_CHUNK (samples per device
call, default 200 — divisible by the megakernel's INTERLEAVE=8 so the full
measured interleave factor engages, and 1000 iters = 5 exact dispatches;
measured 589.3 M vs 584.8 at chunk 40), PT_BENCH_SCENE (scene path),
PT_BENCH_PROBE_TIMEOUT (seconds per backend probe, default 120),
PT_BENCH_PROBE_ATTEMPTS (default 6 — with 60/120/240/480/600s backoff the
full budget is ~37 min, sized to outlast the round-3 backend outage that
zeroed that round's number), PT_BENCH_SAMPLER (default "sobol" —
the flagship low-discrepancy sampler; "independent" for the plain
PRNG streams).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_RAYS_PER_SEC = 236e6


def _wait_for_backend() -> bool:
    """Probe the configured JAX backend with bounded retry/backoff.

    The remote-TPU backend has two transient failure modes observed in
    practice: UNAVAILABLE at first contact (fails fast) and a hang during
    setup/compile (never returns). Each probe therefore runs a trivial
    computation in a *subprocess* under its own timeout; between failed
    probes we back off (30/60/120s) so one blip doesn't zero a benchmark
    round. Returns True when a probe succeeds; False when the budget is
    exhausted (caller exits non-zero without printing a bogus JSON line)."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return True  # local CPU can't be "down"
    probe_timeout = float(os.environ.get("PT_BENCH_PROBE_TIMEOUT", "120"))
    attempts = int(os.environ.get("PT_BENCH_PROBE_ATTEMPTS", "6"))
    code = (
        "import jax, jax.numpy as jnp\n"
        "x = jnp.ones((8, 8))\n"
        "print(float((x @ x).sum()))\n"
    )
    for i in range(attempts):
        t0 = time.perf_counter()
        try:
            res = subprocess.run(
                [sys.executable, "-c", code],
                timeout=probe_timeout,
                capture_output=True,
                text=True,
            )
            ok = res.returncode == 0
            err = (res.stderr or "").strip().splitlines()[-1:] or [""]
        except subprocess.TimeoutExpired:
            ok, err = False, [f"probe hung > {probe_timeout:.0f}s"]
        dt = time.perf_counter() - t0
        if ok:
            if i:
                print(f"bench: backend up after {i} retries", file=sys.stderr)
            return True
        print(
            f"bench: backend probe {i + 1}/{attempts} failed ({dt:.0f}s): "
            f"{err[0]}",
            file=sys.stderr,
        )
        if i + 1 < attempts:
            time.sleep(min(60 * 2**i, 600))
    return False


def main():
    if not _wait_for_backend():
        print(
            "bench: backend unavailable after bounded retries — aborting "
            "without a JSON line (infra outage, not a benchmark result)",
            file=sys.stderr,
        )
        return 1
    # Persistent compile cache: compile time is outside the timed region,
    # but the remote compile service has degraded to >20-min per shape in
    # practice — a cache shared with earlier processes on this host (the
    # experiment scripts use the same path) makes the bench robust to that.
    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # the env var alone is overridden by the TPU plugin's sitecustomize;
        # a CPU smoke run needs the config set too (see tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "PT_COMPILE_CACHE", os.path.expanduser("~/.cache/jax_pt")
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    iters = int(os.environ.get("PT_BENCH_ITERS", "1000"))
    chunk = int(os.environ.get("PT_BENCH_CHUNK", "200"))
    scene_path = os.environ.get(
        "PT_BENCH_SCENE", os.path.join(REPO, "scenes", "cornell.txt")
    )

    from cosc_4397_pathtracing_raytracing_project_tpu import RenderConfig, Renderer

    # sampler='sobol' is the flagship configuration: the in-kernel LD
    # lattice measured FASTER than the PRNG draws it replaces (586.8/596.7
    # vs 572.8/572.1 M rays/s, alternating best-of-3, 2026-08-18) and
    # converges ~1.7 dB better at equal spp. Same estimator mean.
    sampler = os.environ.get("PT_BENCH_SAMPLER", "sobol")
    renderer = Renderer(
        scene_path,
        RenderConfig(samples_per_launch=chunk, sampler=sampler),
    )

    # Warm up / compile outside the timed region, then reset device state,
    # the host iteration mirror, and metrics together (resetting only device
    # state would make render(iters) trace iters-chunk samples while rays/s
    # divides by iters — a ~5% inflation).
    renderer.step(chunk)
    renderer.reset()

    # Best-of-N laps (default 3): the chip is pooled and tenant load drifts
    # on a tens-of-seconds scale — identical configs measured 431-547 M
    # rays/s in single laps. Best-of discards the contended laps and reports
    # the machine's actual capability (CLAUDE.md: "take best-of-N").
    laps = int(os.environ.get("PT_BENCH_LAPS", "3"))
    wall = float("inf")
    for _ in range(max(1, laps)):
        renderer.reset()
        t0 = time.perf_counter()
        renderer.render(iters)
        wall = min(wall, time.perf_counter() - t0)

    pixels = renderer.scene.camera.pixel_count
    rays_per_sec = pixels * iters / wall

    # Convergence sanity: self-referential PSNR harness (reference parity).
    psnr = renderer.metrics.update_psnr(renderer.state.accum, renderer.iteration)

    # Golden-image PSNR (the north-star quality gate): render the upstream
    # starter configuration and compare against its 5000-sample reference,
    # at 1000 spp (noise-floor context) and converged at 5000 spp.
    # Measured asymptote: 39.4 dB @ 100k spp, limited by the golden's own
    # 5000-spp Monte Carlo noise.
    psnr_golden = psnr_golden_5000 = None
    golden_png = os.path.join(REPO, "tests", "data", "REFERENCE_cornell.5000samp.png")
    golden_scene = os.path.join(REPO, "scenes", "cornell_golden.txt")
    if os.path.exists(golden_png) and os.path.exists(golden_scene):
        import math

        import numpy as np

        from cosc_4397_pathtracing_raytracing_project_tpu.io.png import read_png

        ref_img = read_png(golden_png).astype("float32") / 255.0

        def golden_psnr(renderer):
            mine = np.clip(renderer.linear_image(), 0, 1)[:, ::-1, :]
            return round(10.0 * math.log10(1.0 / float(((mine - ref_img) ** 2).mean())), 2)

        rg = Renderer(
            golden_scene,
            RenderConfig(
                samples_per_launch=chunk, antialias=True, sampler=sampler
            ),
        )
        rg.render(min(iters, 1000))
        psnr_golden = golden_psnr(rg)
        if iters >= 1000:
            rg.render(5000)
            psnr_golden_5000 = golden_psnr(rg)

    result = {
        "metric": "primary_samples_per_sec_cornell_800x800_depth8",
        "value": round(rays_per_sec, 0),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "detail": {
            "iterations": iters,
            "wall_seconds": round(wall, 3),
            "avg_iteration_ms": round(wall / iters * 1e3, 3),
            "pixels": pixels,
            "chunk": chunk,
            "device": str(__import__("jax").devices()[0]),
            "psnr_vs_golden_db_1000spp": psnr_golden,
            "psnr_vs_golden_db_5000spp": psnr_golden_5000,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
