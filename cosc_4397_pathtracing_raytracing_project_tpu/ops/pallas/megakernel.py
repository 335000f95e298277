"""Pallas TPU megakernel: an entire batch of path-traced samples per dispatch.

The reference pays ~18 synchronizing kernel launches + a full-frame D2H copy
per sample (`pathtrace.cu:529-653`). The XLA fast path (ops.fast) fuses a
sample into a handful of kernels but still round-trips the 13-array wavefront
carry through HBM every bounce. This kernel eliminates that too:

- grid over pixel tiles (TILE_ROWS×128 lanes); each tile's wavefront state
  (origins, directions, throughput, bounce counters, radiance) lives in
  VMEM/vector registers for the *whole* sample batch;
- scene constants (camera, geometry matrices, materials) are scalar SMEM
  reads, the TPU analog of the reference's shared-memory material cache
  (`pathtrace.cu:343-350`);
- randomness is the on-core hardware PRNG (`pltpu.prng_random_bits`),
  reseeded per (seed, iteration, bounce, tile) so every bounce is replayable,
  mirroring the counter-based design of ops.rng;
- HBM traffic per chunk is just the pixel-coordinate load + radiance store —
  nothing per sample, nothing per bounce.

Geometry/shading semantics are identical to ops.fast (see that module and
ops.intersect/shade for the reference-code citations).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...scene.structs import Scene
from ..rng import SOBOL_NBITS as _SOBOL_NBITS
from ..rng import _SOBOL_DIR, ld_bounce_tags, ld_nee_tags

# Tile-size sweep (fresh-process, Cornell 800×800): 8→308, 16→342, 32→341,
# 64→303, 128→257, 512→199 M rays/s. Small tiles pipeline VMEM better.
TILE_ROWS = 16
LANES = 128
TILE = TILE_ROWS * LANES

_PI = 3.14159265358979323846
_TWO_PI = 6.283185307179586
_INV_PI = 0.3183098861837907
_FMAX = 3.402823466e38
_MISS = 1e30
_BACKOFF = 1e-4
_ORIGIN_OFFSET = 1e-3

# geometry record layout in the packed SMEM table (floats per geom)
_GF = 21  # inv(12) + invT(9); material id packed separately
# material record: color(3) spec_color(3) refl refr emit ior
_MF = 10


def _recip(x):
    """Fast reciprocal: hardware approximation + one Newton-Raphson step
    (~23-bit accurate, several cycles cheaper than exact f32 divide).
    Preserves IEEE edge cases we rely on: 1/0 → ±inf (approx returns ±inf),
    and the Newton step keeps inf·finite → inf, nan → nan."""
    if getattr(x, "ndim", 1) == 0 or isinstance(x, (int, float)):
        # Mosaic's reciprocal lowering is vector-only (scalar operands hit
        # an F32Type.element_type crash); scalars — e.g. the constant-
        # direction sun shadow rays' per-geom transforms — take the exact
        # divide, which on the scalar unit is off the vector critical path
        return 1.0 / x
    r0 = pl.reciprocal(x, approx=True)
    r1 = r0 * (2.0 - x * r0)
    # inf/nan lanes: Newton gives inf*0 → nan; restore the raw approximation
    return jnp.where(jnp.isfinite(r1), r1, r0)


# Mosaic has no atan2/arccos lowering; the exact-envmap direction→(u,v)
# mapping uses a degree-9 Chebyshev-fit polynomial for atan(t)/t in t² on
# [0,1] (max |err| 8.2e-8 rad in f32 — sub-milli-texel even on a 4096-wide
# map), with the classic octant reduction for the full atan2 range.
_ATAN_C = (
    0.9999999930825906, -0.33333254080432473, 0.199977505037471,
    -0.14257992653960597, 0.1092607635073435, -0.08340029963538047,
    0.05703403618375145, -0.030384225558022983, 0.010544175519843985,
    -0.0017213223616973183,
)


def _patan2(y, x):
    """Polynomial atan2(y, x) (vector-safe in Mosaic; matches jnp.arctan2
    to ~1e-7 rad). Convention: (0, 0) → 0."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.maximum(jnp.where(swap, ay, ax), 1e-30)
    t = num / den
    s = t * t
    p = jnp.float32(_ATAN_C[-1])
    for c in _ATAN_C[-2::-1]:
        p = p * s + jnp.float32(c)
    r = p * t
    r = jnp.where(swap, jnp.float32(_PI * 0.5) - r, r)
    r = jnp.where(x < 0, jnp.float32(_PI) - r, r)
    return jnp.where(y < 0, -r, r)


def _pacos(x):
    """acos via _patan2 (exact identity, so accuracy follows the poly)."""
    return _patan2(jnp.sqrt(jnp.maximum((1.0 - x) * (1.0 + x), 0.0)), x)


def _u01(shape):
    # prng_random_bits yields signed int32 — bitcast before shifting, or the
    # arithmetic shift produces "uniforms" in [-0.5, 0.5).
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    top24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)  # < 2^24, positive
    return top24.astype(jnp.float32) * jnp.float32(2.0**-24)


def _lane_ids(shape):
    # Mosaic only lowers int32 iota; build lane ids signed and bitcast.
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    flat = rows * jnp.int32(shape[1]) + cols
    return jax.lax.bitcast_convert_type(flat, jnp.uint32)


class _HashPrng:
    """Pure-jnp counter-hash PRNG used in interpret mode (pltpu.prng_* has no
    CPU lowering). Same replayability contract: uniforms are a function of
    (seed, draw counter, lane)."""

    def __init__(self, shape):
        self.seed = jnp.uint32(0)
        self.counter = 0
        self.lane = _lane_ids(shape)

    def reseed(self, seed):
        self.seed = jnp.asarray(seed).astype(jnp.uint32)
        self.counter = 0

    def u01(self, shape):
        self.counter += 1
        if shape == self.lane.shape:
            lane = self.lane
        else:  # batched draws: lane ids for the wider block
            lane = _lane_ids(shape)
        x = lane ^ (self.seed * jnp.uint32(0x9E3779B9))
        x = x + jnp.uint32(self.counter) * jnp.uint32(0x85EBCA6B)
        x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x7FEB352D)
        x = (x ^ (x >> jnp.uint32(15))) * jnp.uint32(0x846CA68B)
        x = x ^ (x >> jnp.uint32(16))
        # Mosaic has no uint32→f32 cast; the top-24 bits are positive, so
        # bitcast to int32 and cast from there (works on CPU interpret too).
        top24 = jax.lax.bitcast_convert_type(x >> jnp.uint32(8), jnp.int32)
        return top24.astype(jnp.float32) * jnp.float32(2.0**-24)


def _mix(*xs):
    h = jnp.uint32(0x9E3779B9)
    out = jnp.uint32(0)
    for i, x in enumerate(xs):
        xi = jnp.asarray(x).astype(jnp.uint32)
        out = out ^ (xi * (h + jnp.uint32(2 * i + 1)))
        out = out * jnp.uint32(0x85EBCA6B)
        out = out ^ (out >> jnp.uint32(13))
    return out


def _pack_scene(scene: Scene) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(geo [K*_GF] f32, geo_mat [K] i32, mats [M*9] f32) packed tables."""

    def pack_batch(b):
        if b.count == 0:
            return jnp.zeros((0, _GF), jnp.float32)
        inv = b.inv_transform[:, :3, :4].reshape(b.count, 12)
        invt = b.inv_transpose[:, :3, :3].reshape(b.count, 9)
        return jnp.concatenate([inv, invt], axis=1)

    geo = jnp.concatenate(
        [pack_batch(scene.cubes), pack_batch(scene.spheres)], axis=0
    ).reshape(-1)
    geo_mat = jnp.concatenate(
        [scene.cubes.material_id, scene.spheres.material_id], axis=0
    )
    m = scene.materials
    mats = jnp.concatenate(
        [
            m.color,
            m.specular_color,
            m.reflectivity[:, None],
            m.refractive[:, None],
            m.emittance[:, None],
            m.ior[:, None],
        ],
        axis=1,
    ).reshape(-1)
    return geo, geo_mat, mats


# Perf-diagnosis knobs. Both are forwarded into the jit cache key (static
# args of _render_samples_impl), so flipping them mid-process retraces
# correctly — no stale-executable trap.
ABLATION = ""  # '' | 'noprng' | 'nointersect' | 'noscatter'
# Sample chains interleaved per loop iteration: N independent chains
# advanced bounce-by-bounce let the scheduler overlap one chain's
# transcendental/divide latency with the others' arithmetic. Fresh-process
# sweeps on Cornell 800×800: round-2 (TR=tile rows) TR16/IL1 476, TR16/IL2
# 501, TR16/IL5 528, TR8/IL1 474, TR32/IL1 444; round-3 at chunk 40 with
# static tables: IL4 532.9, IL5 530.7, IL8 546.2, IL10 537.8 M rays/s
# (IL20 failed to compile inside 25 min — past the scheduler's sweet
# spot anyway). Accumulation order is unchanged (ascending iteration), so
# renders are bit-identical across interleave factors. The effective
# factor per call is the largest divisor of num_samples ≤ INTERLEAVE (so
# any chunk size benefits, but chunks divisible by 8 get the measured
# peak — bench.py uses 200).
INTERLEAVE = 8
# Pass the gmat/material tables as jit-static immediates (collapses the
# per-material select chains at compile time). Fresh-process TPU A/B
# (Cornell 800×800, 300 iters, 2026-08-17): 512.3 M rays/s vs 483.9 M with
# SMEM tables — +5.9%, so immediates are the default. Cost: the executable
# is keyed on material values, so editing a scene recompiles (scenes are
# fixed after load; the camera stays a traced operand). Read in the
# unjitted wrapper, so flipping it mid-process retraces correctly.
STATIC_TABLES = True
# Skip a bounce's entire vector body when every lane in the tile has
# terminated (scalar any-alive reduce + lax.cond per bounce). Exact: each
# bounce reseeds the PRNG from (seed, iteration, depth, tile), so skipping
# a dead bounce never shifts a later bounce's stream; dead lanes are
# already frozen by the `act` masks. Disabled in legacy/throughput mode,
# where the reference-quirk sky multiply (`pathtrace.cu:358-362` parity)
# keeps touching terminated lanes. Fresh-process TPU A/B (300 iters,
# 2026-08-17): open sphere scene 1344.2 vs 794.6 M rays/s (+69% — whole
# tiles die once their rays escape); closed Cornell 431.5 vs 483.9 M
# (-11% — some lane in 2048 nearly always survives, so every tile pays the
# reduce+cond for nothing). Scene-dependent ⇒ a config choice, not a
# global: default off (headline scene is closed); enable per render with
# RenderConfig(early_exit=True) / --early-exit for open scenes. The module
# flag is the experiment override. CPU interpret-mode bit-identity vs off
# is proven for both gather modes on scenes/sphere.txt.
EARLY_EXIT = False
# Without antialias jitter the primary ray is iteration-invariant, so the
# bounce-0 intersection + material select are the same for every sample in
# the batch: compute them once per tile and reuse (exact — same arithmetic,
# same values, bit-identical renders; proven in interpret mode). No effect
# when antialias is on. Fresh-process TPU A/B (Cornell 800×800, 300
# iters, chunk 40, 2026-08-17): hoist 552.5 vs 530.7 M rays/s control at
# IL5 (+4.1%); combined with IL8 556.0 M — the best measured config, so
# both are defaults.
HOIST_PRIMARY = True
# Settled question (flag deleted after the A/B): replacing
# pltpu.prng_random_bits with the counter-hash PRNG (_HashPrng) on TPU
# measured 363.6 M rays/s vs 531.4 M control (fresh processes, Cornell
# 800×800, 50 iters, 2026-08-17) — the hash's ~12 VPU ops per draw cost
# more than the HW generator, despite the `noprng` ablation reading
# 2230 M (that ablation removes the *draws*, not just the generator, so
# it overstated the PRNG's share). HW PRNG stays; _HashPrng remains the
# interpret-mode fallback only.


def _static_light_table(scene: Scene):
    """Static emissive-light table for in-kernel NEE, as nested python
    scalars: ``(L, rows)`` with one row per analytic emitter —
    ``(kind, mat_id, A 3×3, translation, A⁻ᵀ 3×3, |det A|, Le rgb)``.

    The TPU-native form of the sampler tables in ops/lights.py
    (make_light_sampler — itself the working version of the reference's
    dead ``dev_lightPositions`` upload, `pathtrace.cu:491-504`): with the
    handful of light rows as jit-static immediates, the per-light sampling
    and pdf math constant-folds per light and the where-chain over L
    collapses entirely for the common single-light scene. Raises on
    emissive triangles (the mesh pipeline BRDF-samples its emitters) and
    on two lights sharing a material id — the in-kernel MIS weight
    identifies the hit light by material, which must be unambiguous.
    Returns None when the scene has no analytic emitters."""
    emit = np.asarray(jax.device_get(scene.materials.emittance))
    colors = np.asarray(jax.device_get(scene.materials.color))
    rows = []
    for kind_id, batch in ((0, scene.cubes), (1, scene.spheres)):
        if not batch.count:
            continue
        mids = np.asarray(jax.device_get(batch.material_id))
        tfs = np.asarray(jax.device_get(batch.transform))
        its = np.asarray(jax.device_get(batch.inv_transpose))
        for i in np.nonzero(emit[mids] > 0.0)[0]:
            a = tfs[i][:3, :3]
            rows.append(
                (
                    kind_id,
                    int(mids[i]),
                    tuple(tuple(float(x) for x in r) for r in a),
                    tuple(float(x) for x in tfs[i][:3, 3]),
                    tuple(
                        tuple(float(x) for x in r) for r in its[i][:3, :3]
                    ),
                    float(abs(np.linalg.det(a))),
                    tuple(
                        float(x) for x in colors[mids[i]] * emit[mids[i]]
                    ),
                )
            )
    if scene.triangles.count:
        tri_mids = np.asarray(jax.device_get(scene.triangles.material_id))
        if np.any(emit[tri_mids] > 0.0):
            raise ValueError(
                "nee: emissive triangles are not sampleable — use analytic "
                "(cube/sphere) lights or disable nee"
            )
    if not rows:
        return None
    mat_ids = [r[1] for r in rows]
    if len(set(mat_ids)) != len(mat_ids):
        raise ValueError(
            "nee (megakernel): two lights share a material id — the MIS "
            "weight identifies the hit light by material; give each "
            "emitter its own material or use pipeline='reference'"
        )
    return (len(rows), tuple(rows))


def _static_geom_kinds(scene: Scene):
    """Static per-geom specialization tags, read from concrete scene arrays.

    Returns a tuple of ('cube'|'sphere', perm) where perm is a 3-tuple
    (column of the single nonzero in each row of the 3×3 inverse transform)
    for axis-aligned geoms — translation + scale + any 90°-multiple rotation
    — or None for a general transform. Axis-aligned geoms skip ~60% of the
    per-geom transform arithmetic and their cube normals are exact axes.

    Falls back to all-generic when the scene is a tracer (e.g. inside
    shard_map) — callers on the sharded path precompute kinds outside the
    trace and pass them through."""
    kinds = []
    try:
        for batch, base in ((scene.cubes, "cube"), (scene.spheres, "sphere")):
            if batch.count == 0:
                continue
            inv = np.asarray(jax.device_get(batch.inv_transform))
            for k in range(batch.count):
                m = inv[k, :3, :3]
                scale = max(float(np.abs(m).max()), 1e-20)
                perm = []
                ok = True
                for r in range(3):
                    nz = np.nonzero(np.abs(m[r]) > 1e-7 * scale)[0]
                    if len(nz) != 1:
                        ok = False
                        break
                    perm.append(int(nz[0]))
                ok = ok and sorted(perm) == [0, 1, 2]
                kinds.append((base, tuple(perm) if ok else None))
    except Exception:
        return tuple(
            [("cube", None)] * int(scene.cubes.count)
            + [("sphere", None)] * int(scene.spheres.count)
        )
    return tuple(kinds)


def _static_scene_tables(scene: Scene):
    """(geo_static, gmat_static, mat_static) — the packed transform,
    geom-material-id and material tables as nested tuples of python
    scalars, read from concrete scene arrays.

    Passing them as jit-static turns every per-geom matrix entry and
    per-material property into an immediate in the kernel: the scalar SMEM
    loads disappear and the compiler constant-folds the select chains
    (e.g. materials sharing a zero reflectivity collapse to one constant).
    Returns ((), ()) when the scene is a tracer (inside shard_map) — callers
    on that path precompute the tables outside the trace (parallel.shard).
    Cache note: the executable is keyed on the values, so editing a scene
    recompiles — correct, since scenes are fixed after load (only the
    camera stays a traced operand)."""
    if not STATIC_TABLES:
        return ((), (), ())
    try:
        geo, geo_mat, mats = _pack_scene(scene)
        gm_v = np.asarray(jax.device_get(geo_mat)).reshape(-1)
        mat_v = np.asarray(jax.device_get(mats)).reshape(-1, _MF)
        # NB: geometry matrices stay dynamic (SMEM) on purpose — making the
        # 21 floats/geom immediates sent the remote XLA compile past 20 min
        # (constant folding through the fully-unrolled sample loop); the
        # material/gmat immediates are what collapse the select chains.
        return (
            (),
            tuple(int(x) for x in gm_v),
            tuple(tuple(float(x) for x in row) for row in mat_v),
        )
    except Exception:
        return ((), (), ())


def _static_env_split(scene: Scene, config) -> tuple:
    """Sun/sky split tables for env_mode='split' (ops.envmap.split_envmap),
    as pure-float static tuples: ``(suns, sh, bg_external)``. suns =
    ((dx,dy,dz, Er,Eg,Eb), …) delta directional lights sampled
    deterministically per bounce; sh = per-channel SH-9 coefficients of
    the residual sky for in-kernel misses; bg_external = primary rays are
    iteration-invariant (no AA/DOF), so the impl composites the exact
    bilinear background outside the kernel and depth-0 misses contribute
    nothing in-kernel."""
    from .. import envmap as envmap_ops

    env = scene.envmap
    img = np.asarray(jax.device_get(env.img), np.float64) * float(
        jax.device_get(env.strength)
    )
    suns, sh = envmap_ops.split_envmap(
        img,
        max_suns=int(getattr(config, "env_split_suns", 8)),
        thresh=float(getattr(config, "env_split_thresh", 32.0)),
    )
    bg_external = not (
        bool(getattr(config, "antialias", False))
        or bool(getattr(config, "dof", False))
    )
    return (suns, sh, bg_external)


# In-kernel exact env cap: the gather's MXU cost per sample scales with
# Hp·Wp (16 row-matmuls of [Wp, Hp]·[Hp, 128] per channel per tile), and
# the three planes live whole in VMEM. 256×512 ≈ 131k texels keeps both
# comfortable; larger maps route to env_mode='split' or the fast pipeline.
# Measured curve (scripts/bench_env_big.py, 2026-08-20): 93.6 M rays/s at
# 128×256, 34.1 M at the cap (fast path 10.3 M), FAILS TO COMPILE at
# 512×1024 — the cap is placed exactly where the design gives out.
MAX_ENV_EXACT_TEXELS = 256 * 512


def _wants_env_nee(scene: Scene, config) -> bool:
    """True iff this (scene, config) runs the in-kernel env NEE estimator:
    env_mode='exact' + config.nee on an envmap scene with NO analytic
    emissive lights (mixed scenes need the combined two-technique NEE —
    that runs on pipeline='fast'). Reads concrete emittance values, so
    call with a concrete scene only (shard closures precompute it)."""
    if not getattr(config, "nee", False):
        return False
    if scene.envmap is None or (
        getattr(config, "env_mode", "exact") == "split"
    ):
        return False
    if config.gather_mode != "light_only":
        raise ValueError("nee requires gather_mode='light_only'")
    if _static_light_table(scene) is not None:
        raise ValueError(
            "exact env + analytic emissive lights: the combined "
            "two-technique NEE runs on pipeline='fast'"
        )
    return True


def _static_env_exact(scene: Scene) -> tuple:
    """(H, W, Hp, Wp) static dims for the in-kernel exact env gather.
    Shape-only — safe to derive inside a trace (shard_map), unlike
    _static_env_split which reads concrete texel values."""
    h, w = scene.envmap.shape
    hp = ((h + 127) // 128) * 128  # minor dim of the [Wp, Hp] planes
    wp = ((w + 7) // 8) * 8
    return (h, w, hp, wp)


def _make_kernel(
    *,
    num_cubes: int,
    num_spheres: int,
    num_materials: int,
    trace_depth: int,
    num_samples: int,
    rr_start_depth: int,
    legacy: bool,
    sky_strength: float,
    antialias: bool,
    width: int,
    height: int,
    hw_prng: bool = True,
    ablation: str = "",
    interleave: int = 1,
    enable_refraction: bool = False,
    geom_kinds: tuple = (),
    geo_static: tuple = (),
    gmat_static: tuple = (),
    mat_static: tuple = (),
    early_exit: bool = False,
    hoist_primary: bool = False,
    nee: tuple = None,
    dof: bool = False,
    ld: int = 0,  # number of leading LD bounce depths (0 = sampler off)
    adaptive_grid: int = 0,  # K>0: per-grid-step tile ids/iter bases in scal
    env_split: tuple = None,  # (suns, sh, bg_external) — _static_env_split
    env_exact: tuple = None,  # (H, W, Hp, Wp) — in-kernel bilinear HDR env
    env_nee: bool = False,  # in-kernel env NEE+MIS (shared per-(iter,depth)
    # samples via a [S·D, 8] VMEM row table + a 4th [Wp, Hp] pdf plane)
):
    # legacy mode's sky multiply keeps updating terminated lanes (quirk
    # parity), so an all-dead bounce is NOT a no-op there — never skip
    early_exit = early_exit and not legacy
    if nee is not None and legacy:
        raise ValueError("nee requires gather_mode='light_only'")
    if env_split is not None and legacy:
        raise ValueError("env_mode='split' requires gather_mode='light_only'")
    if env_exact is not None and (legacy or env_split is not None):
        raise ValueError(
            "env_mode='exact' (in-kernel) requires gather_mode='light_only' "
            "and excludes env_mode='split'"
        )
    if env_nee and (env_exact is None or adaptive_grid or nee is not None):
        raise ValueError(
            "env_nee needs env_exact, excludes adaptive tile dispatch, and "
            "replaces (not augments) the analytic light table"
        )
    carry_pdf = nee is not None or env_nee  # prev-lobe pdf rides the state
    k_total = num_cubes + num_spheres
    if not geom_kinds:
        geom_kinds = tuple(
            [("cube", None)] * num_cubes + [("sphere", None)] * num_spheres
        )

    def kernel(*_refs):
        if env_exact is not None and env_nee:
            # exact-env inputs + the nearest-texel pdf plane (MIS partner
            # of the deferred escape gather) + the per-(sample, depth)
            # shared env light rows (dir, bilinear radiance, pdf)
            (scal_ref, cam_ref, geo_ref, gmat_ref, mat_ref,
             er_ref, eg_ref, eb_ref, ep_ref, envrows_ref, px_ref, py_ref,
             or_ref, og_ref, ob_ref) = _refs
        elif env_exact is not None:
            # three extra VMEM inputs: the strength-folded env radiance,
            # one PRE-TRANSPOSED [Wp, Hp] plane per channel (transposing
            # outside keeps the in-kernel gather free of relayouts)
            (scal_ref, cam_ref, geo_ref, gmat_ref, mat_ref,
             er_ref, eg_ref, eb_ref, px_ref, py_ref,
             or_ref, og_ref, ob_ref) = _refs
        else:
            (scal_ref, cam_ref, geo_ref, gmat_ref, mat_ref, px_ref, py_ref,
             or_ref, og_ref, ob_ref) = _refs
        # tile_base keeps RNG streams tied to the *global* tile decomposition
        # when a dp shard renders a pixel slice (parallel.shard): local tile t
        # of the shard at pixel_offset seeds exactly like global tile
        # pixel_offset//TILE + t, so a TILE-aligned sharded render is
        # bit-identical to the single-device one.
        if adaptive_grid:
            # Adaptive sampling (render.adaptive): each grid step renders one
            # *selected* tile — its global RNG tile key and its own 1-based
            # iteration base come from per-step SMEM slots, so refined tiles
            # continue their sample streams exactly where they left off.
            g = pl.program_id(0)
            tile = scal_ref[3 + g]
            iter_base = scal_ref[3 + adaptive_grid + g]
        else:
            tile = pl.program_id(0) + scal_ref[2]
            iter_base = scal_ref[1]
        seed = scal_ref[0]

        pos = [cam_ref[0], cam_ref[1], cam_ref[2]]
        view = [cam_ref[3], cam_ref[4], cam_ref[5]]
        right = [cam_ref[6], cam_ref[7], cam_ref[8]]
        up = [cam_ref[9], cam_ref[10], cam_ref[11]]
        plx = cam_ref[12]
        ply = cam_ref[13]
        if dof:  # thin-lens scalars, hoisted to kernel entry like the rest
            aperture = cam_ref[14]
            focal = cam_ref[15]

        px = px_ref[:]
        py = py_ref[:]
        shape = px.shape
        soft_prng = None if hw_prng else _HashPrng(shape)

        def seed_prng(value):
            if hw_prng:
                pltpu.prng_seed(value)
            else:
                soft_prng.reseed(value)

        def draw_u01():
            # NB: batching k draws into one prng call of a [k·R, 128] block
            # (then slicing) measured 3% SLOWER at IL=5 — per-draw cost is
            # element-wise, not per-call, and the wide block spills registers.
            return _u01(shape) if hw_prng else soft_prng.u01(shape)

        # ── sampler='sobol' (ld): in-kernel Owen-scrambled (0,2) draws ──
        # Bit-compatible with ops.rng's ld_* lattice (same murmur seed
        # hash, same Laine-Karras constants, same seed = key_data[-1]), so
        # the megakernel's LD dimensions sample the exact points the XLA
        # pipelines do. The per-(pixel, tag) scramble-seed lattices are
        # iteration-invariant → hoisted here, once per dispatch; per sample
        # only the two scalar REVERSED Sobol components (pure bit math on
        # the iteration index, scalar unit — reversal is free: XOR of
        # bit-reversed direction numbers) and one Laine-Karras chain +
        # bit-reversal per draw (~24 int vector ops) remain.
        if ld:
            pid_u = jax.lax.bitcast_convert_type(
                py.astype(jnp.int32) * jnp.int32(width) + px.astype(jnp.int32),
                jnp.uint32,
            )
            seed_u = jnp.asarray(seed).astype(jnp.uint32)

            def _ld_shift(tag):
                x = pid_u ^ (
                    jnp.uint32(0x5D000000 + tag)
                    ^ (seed_u * jnp.uint32(0x9E3779B9))
                )
                x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x7FEB352D)
                x = (x ^ (x >> jnp.uint32(15))) * jnp.uint32(0x846CA68B)
                return x ^ (x >> jnp.uint32(16))

            # tags: ops.rng.LD_AA_X..LD_LENS_V (0..3) + per-depth
            # branch/bsdf (+ nee) tag triples from ops.rng.ld_bounce_tags /
            # ld_nee_tags — one hoisted shift lattice per (depth, lane)
            ld_aa = (_ld_shift(0), _ld_shift(1)) if antialias else None
            ld_lens = (_ld_shift(2), _ld_shift(3)) if dof else None
            n_ld = min(int(ld), trace_depth)
            ld_bd = [
                tuple(_ld_shift(t) for t in ld_bounce_tags(d))
                for d in range(n_ld)
            ]
            ld_nee_d = None
            if nee is not None:
                ld_nee_d = []
                for d in range(n_ld):
                    tp, tu, tv = ld_nee_tags(d)
                    ld_nee_d.append(
                        (
                            _ld_shift(tp) if nee[0] > 1 else None,
                            _ld_shift(tu),
                            _ld_shift(tv),
                        )
                    )

            def _rev32(v):
                # uint32 bit reversal (5 swap stages, vector shift/mask ops)
                v = ((v & jnp.uint32(0x55555555)) << jnp.uint32(1)) | (
                    (v >> jnp.uint32(1)) & jnp.uint32(0x55555555)
                )
                v = ((v & jnp.uint32(0x33333333)) << jnp.uint32(2)) | (
                    (v >> jnp.uint32(2)) & jnp.uint32(0x33333333)
                )
                v = ((v & jnp.uint32(0x0F0F0F0F)) << jnp.uint32(4)) | (
                    (v >> jnp.uint32(4)) & jnp.uint32(0x0F0F0F0F)
                )
                v = ((v & jnp.uint32(0x00FF00FF)) << jnp.uint32(8)) | (
                    (v >> jnp.uint32(8)) & jnp.uint32(0x00FF00FF)
                )
                return (v << jnp.uint32(16)) | (v >> jnp.uint32(16))

            def _sobol_scalar_pair(iteration):
                # BIT-REVERSED (0,2) components: reversal of an XOR is the
                # XOR of reversals, so reversing the direction-number table
                # at trace time makes rev32(sobol_pair(n)) free. Component
                # 0's reversed form is just the low index bits.
                nv = jnp.asarray(iteration).astype(jnp.uint32)
                x0 = nv & jnp.uint32((1 << _SOBOL_NBITS) - 1)
                x1 = jnp.uint32(0)
                for k in range(_SOBOL_NBITS):
                    bit = (nv >> jnp.uint32(k)) & jnp.uint32(1)
                    rv = int(f"{int(_SOBOL_DIR[1, k]):032b}"[::-1], 2)
                    x1 = x1 ^ (bit * jnp.uint32(rv))
                return x0, x1

            def _lk(x):
                # Laine-Karras rounds (seed pre-added by the caller)
                x = x ^ (x * jnp.uint32(0x6C50B47C))
                x = x ^ (x * jnp.uint32(0xB82F1E52))
                x = x ^ (x * jnp.uint32(0xC7AFE638))
                x = x ^ (x * jnp.uint32(0x8D22F6E6))
                return x

            def _ld_u01(rev_sbits, seed):
                # hash-based Owen scramble (ops.rng.ld_u01, Burley JCGT
                # 2020): Laine-Karras permutation in the reversed domain,
                # then reverse back. rev_sbits is the reversed component
                # (scalar at depth 0, vector on shuffled depths), seed the
                # hoisted per-(pixel, tag) lattice.
                x = _rev32(_lk(rev_sbits + seed)) >> jnp.uint32(8)
                # Mosaic has no uint32→f32 cast; top-24 bits are positive
                top24 = jax.lax.bitcast_convert_type(x, jnp.int32)
                return top24.astype(jnp.float32) * jnp.float32(2.0**-24)

            # Per-(pixel, depth) index-shuffle seed lattices for depths ≥ 1
            # (ops.rng._LD_SHUFFLE_TAG_BASE tag space) and the bit-reversed
            # dim-1 direction table, hoisted for _ld_rev_components.
            ld_shuf = [None] + [
                _ld_shift(256 + d) for d in range(1, max(n_ld, 1))
            ]
            _rev_dir1 = [
                int(f"{int(_SOBOL_DIR[1, k]):032b}"[::-1], 2)
                for k in range(_SOBOL_NBITS)
            ]

            def _ld_rev_components(iteration, depth):
                """Reversed-domain (0,2) components for one bounce depth:
                scalar raw-index pair at depth 0 (bit-compatible with the
                first-vertex sampler), per-(pixel, depth) Owen-shuffled
                index past it (ops.rng.ld_shuffled_index — cross-depth pad
                decorrelation). Works directly in the reversed domain: the
                shuffled rev-index jp IS LK(rev(i)+seed)&mask, comp0's
                reversed form is rev(jp), comp1's is an XOR chain over
                jp's bits against the reversed direction table."""
                if depth == 0:
                    return _sobol_scalar_pair(iteration)
                nb = _SOBOL_NBITS
                mask = jnp.uint32((1 << nb) - 1)
                j = _rev32(jnp.asarray(iteration).astype(jnp.uint32)) >> (
                    jnp.uint32(32 - nb)
                )
                jp = _lk(j + ld_shuf[depth]) & mask
                r0 = jnp.zeros_like(jp)
                r1 = jnp.zeros_like(jp)
                for m in range(nb):
                    bit = (jp >> jnp.uint32(m)) & jnp.uint32(1)
                    r0 = r0 ^ (bit * jnp.uint32(1 << (nb - 1 - m)))
                    r1 = r1 ^ (bit * jnp.uint32(_rev_dir1[nb - 1 - m]))
                return r0, r1

        # Scene tables: static immediates when available (geometry and
        # materials are fixed after scene load — the compiler folds shared
        # constants and dead selects away), otherwise scalar SMEM reads
        # hoisted to kernel entry (loads inside the sample/bounce loops
        # would re-issue on the scalar unit each iteration and stall the
        # vector pipeline).
        if geo_static:
            geo_rows = [
                (list(row[:12]), list(row[12:21])) for row in geo_static
            ]
        else:
            geo_rows = []
            for k in range(k_total):
                base = k * _GF
                iv = [geo_ref[base + j] for j in range(12)]
                it = [geo_ref[base + 12 + j] for j in range(9)]
                geo_rows.append((iv, it))
        if gmat_static:
            gmat = list(gmat_static)
        else:
            gmat = [gmat_ref[k] for k in range(k_total)]
        if mat_static:
            mat_rows = [list(row) for row in mat_static]
        else:
            mat_rows = [
                [mat_ref[i * _MF + j] for j in range(_MF)]
                for i in range(num_materials)
            ]

        def raygen(fx, fy):
            # ── raygen (generateRayFromCamera, `pathtrace.cu:270-286`) ──
            sx = plx * (fx - 0.5 * width)
            sy = ply * (fy - 0.5 * height)
            dx = view[0] - right[0] * sx - up[0] * sy
            dy = view[1] - right[1] * sx - up[1] * sy
            dz = view[2] - right[2] * sx - up[2] * sy
            rn = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
            return dx * rn, dy * rn, dz * rn

        # without sub-pixel jitter or a lens the primary rays are iteration-
        # invariant: generate them once per tile, not once per sample
        base_dir = None if (antialias or dof) else raygen(px, py)

        def intersect_all(ox, oy, oz, dx, dy, dz):
            """Nearest hit over all primitives, unrolled. Returns
            (t, world-normal xyz, material id[, outside]) in final form.

            The object-space direction q_d = M⁻¹·d is left unnormalized,
            which makes the slab/quadratic parameter s *directly* the
            world-space distance (M·q_d = d with |d| = 1), comparable
            across primitives with no per-geom normalization. The
            reference's 1e-4 object-space backoff becomes a constant
            world-space backoff (equivalent in purpose, cheaper).

            Normals are produced in WORLD space inside each geom's
            block (the winner-select then carries a final-form normal):
            axis-aligned geoms (static `perm` kind) read theirs straight
            off the face sign / scaled hit point, and only general
            transforms pay the inverse-transpose matvec — cheaper than
            the old carry-object-normal + 9-select-per-geom winner
            transform."""
            best_t = jnp.full(shape, _MISS)
            best_nx = jnp.zeros(shape, jnp.float32)
            best_ny = jnp.zeros(shape, jnp.float32)
            best_nz = jnp.zeros(shape, jnp.float32)
            best_mat = jnp.zeros(shape, jnp.int32)
            if enable_refraction:
                best_out = jnp.zeros(shape, jnp.int32) == 0  # all True

            for k in range(0 if ablation == "nointersect" else k_total):
                iv, it = geo_rows[k]
                kind, perm = geom_kinds[k]
                if perm is None:
                    qox = iv[0] * ox + iv[1] * oy + iv[2] * oz + iv[3]
                    qoy = iv[4] * ox + iv[5] * oy + iv[6] * oz + iv[7]
                    qoz = iv[8] * ox + iv[9] * oy + iv[10] * oz + iv[11]
                    qdx = iv[0] * dx + iv[1] * dy + iv[2] * dz
                    qdy = iv[4] * dx + iv[5] * dy + iv[6] * dz
                    qdz = iv[8] * dx + iv[9] * dy + iv[10] * dz
                else:
                    # axis-aligned: one nonzero per row of M⁻¹ (col
                    # perm[r]) — 6 mul + 3 add instead of 21 ops
                    pw = (ox, oy, oz)
                    dw = (dx, dy, dz)
                    c0, c1, c2 = perm
                    qox = iv[c0] * pw[c0] + iv[3]
                    qoy = iv[4 + c1] * pw[c1] + iv[7]
                    qoz = iv[8 + c2] * pw[c2] + iv[11]
                    qdx = iv[c0] * dw[c0]
                    qdy = iv[4 + c1] * dw[c1]
                    qdz = iv[8 + c2] * dw[c2]

                if k < num_cubes:
                    ix = _recip(qdx)
                    iy = _recip(qdy)
                    iz = _recip(qdz)
                    t1x = (-0.5 - qox) * ix
                    t2x = (0.5 - qox) * ix
                    t1y = (-0.5 - qoy) * iy
                    t2y = (0.5 - qoy) * iy
                    t1z = (-0.5 - qoz) * iz
                    t2z = (0.5 - qoz) * iz
                    tax = jnp.minimum(t1x, t2x)
                    tbx = jnp.maximum(t1x, t2x)
                    tay = jnp.minimum(t1y, t2y)
                    tby = jnp.maximum(t1y, t2y)
                    taz = jnp.minimum(t1z, t2z)
                    tbz = jnp.maximum(t1z, t2z)
                    sgx = jnp.where(t2x < t1x, 1.0, -1.0)
                    sgy = jnp.where(t2y < t1y, 1.0, -1.0)
                    sgz = jnp.where(t2z < t1z, 1.0, -1.0)
                    ax = jnp.where(tax > 0, tax, -_FMAX)
                    ay = jnp.where(tay > 0, tay, -_FMAX)
                    az = jnp.where(taz > 0, taz, -_FMAX)
                    bx = jnp.where(tbx < _FMAX, tbx, _FMAX)
                    by = jnp.where(tby < _FMAX, tby, _FMAX)
                    bz = jnp.where(tbz < _FMAX, tbz, _FMAX)
                    s_min = jnp.maximum(ax, jnp.maximum(ay, az))
                    s_max = jnp.minimum(bx, jnp.minimum(by, bz))
                    min_is_x = (ax >= ay) & (ax >= az)
                    min_is_y = ~min_is_x & (ay >= az)
                    max_is_x = (bx <= by) & (bx <= bz)
                    max_is_y = ~max_is_x & (by <= bz)
                    outside = s_min > 0
                    hit = (s_max >= s_min) & (s_max > 0)
                    sparam = jnp.where(outside, s_min, s_max)
                    # NB: bool-valued jnp.where (i1 select) doesn't lower
                    # in Mosaic — use boolean algebra instead.
                    use_x = (outside & min_is_x) | (~outside & max_is_x)
                    use_y = (outside & min_is_y) | (~outside & max_is_y)
                    t_world = sparam - _BACKOFF
                    # world normal = invT · (face axis · sign)
                    if perm is not None:
                        # one nonzero per invT column: the face-a normal
                        # lands on world row perm[a]
                        inv_p = [perm.index(r) for r in range(3)]
                        sgs = (sgx, sgy, sgz)
                        sels = (use_x, use_y, ~(use_x | use_y))
                        wn = []
                        for r in range(3):
                            a = inv_p[r]
                            wn.append(
                                jnp.where(sels[a], sgs[a] * it[r * 3 + a], 0.0)
                            )
                        nox, noy, noz = wn
                    else:
                        sfx = jnp.where(use_x, 1.0, 0.0)
                        sfy = jnp.where(use_y, 1.0, 0.0)
                        gx = sgx * sfx
                        gy = sgy * sfy
                        gz = sgz * (1.0 - sfx - sfy)
                        nox = gx * it[0] + gy * it[1] + gz * it[2]
                        noy = gx * it[3] + gy * it[4] + gz * it[5]
                        noz = gx * it[6] + gy * it[7] + gz * it[8]
                else:
                    nq2 = qdx * qdx + qdy * qdy + qdz * qdz
                    b = qox * qdx + qoy * qdy + qoz * qdz
                    c = qox * qox + qoy * qoy + qoz * qoz - 0.25
                    disc = b * b - nq2 * c
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    inv_a = _recip(nq2)
                    s1 = (-b + sq) * inv_a
                    s2 = (-b - sq) * inv_a
                    both_neg = (s1 < 0) & (s2 < 0)
                    both_pos = (s1 > 0) & (s2 > 0)
                    sparam = jnp.where(
                        both_pos, jnp.minimum(s1, s2), jnp.maximum(s1, s2)
                    )
                    hit = (disc >= 0) & ~both_neg
                    t_world = sparam - _BACKOFF
                    flip = jnp.where(both_pos, 1.0, -1.0)
                    sx_ = (qox + t_world * qdx) * flip
                    sy_ = (qoy + t_world * qdy) * flip
                    sz_ = (qoz + t_world * qdz) * flip
                    # world normal = invT · n_obj
                    if perm is not None:
                        inv_p = [perm.index(r) for r in range(3)]
                        sv = (sx_, sy_, sz_)
                        nox = it[0 * 3 + inv_p[0]] * sv[inv_p[0]]
                        noy = it[1 * 3 + inv_p[1]] * sv[inv_p[1]]
                        noz = it[2 * 3 + inv_p[2]] * sv[inv_p[2]]
                    else:
                        nox = it[0] * sx_ + it[1] * sy_ + it[2] * sz_
                        noy = it[3] * sx_ + it[4] * sy_ + it[5] * sz_
                        noz = it[6] * sx_ + it[7] * sy_ + it[8] * sz_

                better = hit & (t_world > 0) & (t_world < best_t)
                best_t = jnp.where(better, t_world, best_t)
                best_nx = jnp.where(better, nox, best_nx)
                best_ny = jnp.where(better, noy, best_ny)
                best_nz = jnp.where(better, noz, best_nz)
                best_mat = jnp.where(better, gmat[k], best_mat)
                if enable_refraction:
                    hit_out = outside if k < num_cubes else both_pos
                    best_out = (best_out & ~better) | (hit_out & better)

            # winner normal is already world-space: one normalize
            rw = jax.lax.rsqrt(
                jnp.maximum(
                    best_nx * best_nx + best_ny * best_ny + best_nz * best_nz,
                    1e-30,
                )
            )
            best_nx = best_nx * rw
            best_ny = best_ny * rw
            best_nz = best_nz * rw
            if enable_refraction:
                return (best_t, best_nx, best_ny, best_nz, best_mat, best_out)
            return (best_t, best_nx, best_ny, best_nz, best_mat)

        def occluded_any(ox, oy, oz, dx, dy, dz, limit):
            """Shadow-ray occlusion: any hit with backoff-adjusted t in
            (0, limit)? Exactly equivalent to intersect_all's
            `best_t < limit` (same per-geom sparam/backoff arithmetic,
            same positivity gate) but skips everything the nearest-hit
            pass computes beyond t: face/normal selection, material ids,
            the best_* where-chains, and the final normalize — the NEE
            shadow pass only consumes the boolean."""
            occ = ox < ox  # all-False of the right shape/dtype
            for k in range(0 if ablation == "nointersect" else k_total):
                iv, _it = geo_rows[k]
                _kind, perm = geom_kinds[k]
                if perm is None:
                    qox = iv[0] * ox + iv[1] * oy + iv[2] * oz + iv[3]
                    qoy = iv[4] * ox + iv[5] * oy + iv[6] * oz + iv[7]
                    qoz = iv[8] * ox + iv[9] * oy + iv[10] * oz + iv[11]
                    qdx = iv[0] * dx + iv[1] * dy + iv[2] * dz
                    qdy = iv[4] * dx + iv[5] * dy + iv[6] * dz
                    qdz = iv[8] * dx + iv[9] * dy + iv[10] * dz
                else:
                    pw = (ox, oy, oz)
                    dw = (dx, dy, dz)
                    c0, c1, c2 = perm
                    qox = iv[c0] * pw[c0] + iv[3]
                    qoy = iv[4 + c1] * pw[c1] + iv[7]
                    qoz = iv[8 + c2] * pw[c2] + iv[11]
                    qdx = iv[c0] * dw[c0]
                    qdy = iv[4 + c1] * dw[c1]
                    qdz = iv[8 + c2] * dw[c2]

                if k < num_cubes:
                    ix = _recip(qdx)
                    iy = _recip(qdy)
                    iz = _recip(qdz)
                    t1x = (-0.5 - qox) * ix
                    t2x = (0.5 - qox) * ix
                    t1y = (-0.5 - qoy) * iy
                    t2y = (0.5 - qoy) * iy
                    t1z = (-0.5 - qoz) * iz
                    t2z = (0.5 - qoz) * iz
                    ax = jnp.minimum(t1x, t2x)
                    ay = jnp.minimum(t1y, t2y)
                    az = jnp.minimum(t1z, t2z)
                    bx = jnp.maximum(t1x, t2x)
                    by = jnp.maximum(t1y, t2y)
                    bz = jnp.maximum(t1z, t2z)
                    ax = jnp.where(ax > 0, ax, -_FMAX)
                    ay = jnp.where(ay > 0, ay, -_FMAX)
                    az = jnp.where(az > 0, az, -_FMAX)
                    bx = jnp.where(bx < _FMAX, bx, _FMAX)
                    by = jnp.where(by < _FMAX, by, _FMAX)
                    bz = jnp.where(bz < _FMAX, bz, _FMAX)
                    s_min = jnp.maximum(ax, jnp.maximum(ay, az))
                    s_max = jnp.minimum(bx, jnp.minimum(by, bz))
                    hit = (s_max >= s_min) & (s_max > 0)
                    sparam = jnp.where(s_min > 0, s_min, s_max)
                else:
                    nq2 = qdx * qdx + qdy * qdy + qdz * qdz
                    b = qox * qdx + qoy * qdy + qoz * qdz
                    c = qox * qox + qoy * qoy + qoz * qoz - 0.25
                    disc = b * b - nq2 * c
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    inv_a = _recip(nq2)
                    s1 = (-b + sq) * inv_a
                    s2 = (-b - sq) * inv_a
                    both_neg = (s1 < 0) & (s2 < 0)
                    both_pos = (s1 > 0) & (s2 > 0)
                    sparam = jnp.where(
                        both_pos, jnp.minimum(s1, s2), jnp.maximum(s1, s2)
                    )
                    hit = (disc >= 0) & ~both_neg
                t_world = sparam - _BACKOFF
                occ = occ | (hit & (t_world > 0) & (t_world < limit))
            return occ

        def fetch_material(best_mat):
            """Material property select chains (shared-mem cache analog)."""
            m_cr = jnp.zeros(shape, jnp.float32)
            m_cg = jnp.zeros(shape, jnp.float32)
            m_cb = jnp.zeros(shape, jnp.float32)
            m_sr = jnp.zeros(shape, jnp.float32)
            m_sg = jnp.zeros(shape, jnp.float32)
            m_sb = jnp.zeros(shape, jnp.float32)
            m_refl = jnp.zeros(shape, jnp.float32)
            m_refr = jnp.zeros(shape, jnp.float32)
            m_emit = jnp.zeros(shape, jnp.float32)
            if enable_refraction:
                m_ior = jnp.zeros(shape, jnp.float32)
            for i in range(num_materials):
                sel = best_mat == i
                row = mat_rows[i]
                m_cr = jnp.where(sel, row[0], m_cr)
                m_cg = jnp.where(sel, row[1], m_cg)
                m_cb = jnp.where(sel, row[2], m_cb)
                m_sr = jnp.where(sel, row[3], m_sr)
                m_sg = jnp.where(sel, row[4], m_sg)
                m_sb = jnp.where(sel, row[5], m_sb)
                m_refl = jnp.where(sel, row[6], m_refl)
                m_refr = jnp.where(sel, row[7], m_refr)
                m_emit = jnp.where(sel, row[8], m_emit)
                if enable_refraction:
                    m_ior = jnp.where(sel, row[9], m_ior)
            if enable_refraction:
                return (m_cr, m_cg, m_cb, m_sr, m_sg, m_sb, m_refl, m_refr,
                        m_emit, m_ior)
            return (m_cr, m_cg, m_cb, m_sr, m_sg, m_sb, m_refl, m_refr,
                    m_emit)

        if env_exact is not None:
            # ── exact in-kernel HDR environment (env_mode='exact') ──
            # The reference evaluates its env light inside the shade kernel
            # (`pathtrace.cu:357-365`); the TPU counterpart of its per-thread
            # texture fetch is a one-hot MXU row gather. A path can miss at
            # most once (a miss terminates it), so each sample chain DEFERS
            # its miss to six registers (throughput + direction at escape)
            # and pays ONE bilinear gather per sample after the bounce loop
            # instead of one per bounce. Per sublane row r of the tile, the
            # y one-hot (bilinear weights folded in) is built as [Hp, 128]
            # by comparing a sublane iota against the row's [1, 128] slice
            # — a native sublane broadcast, no relayout — then matmul'd
            # against the pre-transposed radiance plane [Wp, Hp] on the
            # MXU; the x one-hot selects elementwise and a sublane reduce
            # yields [1, 128], the output row's native layout.
            env_h, env_w, env_hp, env_wp = env_exact
            _env_iy = jax.lax.broadcasted_iota(jnp.int32, (env_hp, LANES), 0)
            _env_ix = jax.lax.broadcasted_iota(jnp.int32, (env_wp, LANES), 0)
            # hoist the plane loads to kernel entry (scalar/VMEM reads
            # inside the sample loop stall the vector pipeline)
            _env_planes = (er_ref[:], eg_ref[:], eb_ref[:])

            def env_lookup(edx, edy, edz):
                """ops.envmap.env_radiance semantics (bilinear, wrap in
                azimuth, clamp at poles); strength is folded into the
                planes outside the kernel."""
                u = 0.5 + _patan2(edx, -edz) * jnp.float32(1.0 / _TWO_PI)
                v = _pacos(jnp.clip(edy, -1.0, 1.0)) * jnp.float32(1.0 / _PI)
                fx = u * env_w - 0.5
                fy = v * env_h - 0.5
                x0 = jnp.floor(fx)
                y0 = jnp.floor(fy)
                tx = fx - x0
                ty = fy - y0
                x0i = x0.astype(jnp.int32)
                x0i = jnp.where(
                    x0i < 0, env_w - 1, jnp.minimum(x0i, env_w - 1)
                )
                x1i = jnp.where(x0i + 1 > env_w - 1, 0, x0i + 1)
                y0i = jnp.clip(y0.astype(jnp.int32), 0, env_h - 1)
                y1i = jnp.minimum(y0i + 1, env_h - 1)
                zero = jnp.float32(0.0)
                rows = ([], [], [])
                for r in range(TILE_ROWS):
                    wy = jnp.where(
                        _env_iy == y0i[r:r + 1, :], 1.0 - ty[r:r + 1, :],
                        zero,
                    ) + jnp.where(
                        _env_iy == y1i[r:r + 1, :], ty[r:r + 1, :], zero
                    )
                    wx = jnp.where(
                        _env_ix == x0i[r:r + 1, :], 1.0 - tx[r:r + 1, :],
                        zero,
                    ) + jnp.where(
                        _env_ix == x1i[r:r + 1, :], tx[r:r + 1, :], zero
                    )
                    for c in range(3):
                        tmp = jax.lax.dot_general(
                            _env_planes[c], wy, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )  # [Wp, 128]
                        rows[c].append(
                            jnp.sum(wx * tmp, axis=0, keepdims=True)
                        )
                return tuple(jnp.concatenate(ch, axis=0) for ch in rows)

            if env_nee:
                _env_pplane = ep_ref[:]

                def env_pdf_lookup(edx, edy, edz):
                    """ops.envmap.env_pdf semantics: NEAREST texel (no −0.5
                    offset, no wrap arithmetic — clip only), same one-hot
                    MXU gather as env_lookup with single-texel weights."""
                    u = 0.5 + _patan2(edx, -edz) * jnp.float32(1.0 / _TWO_PI)
                    v = _pacos(jnp.clip(edy, -1.0, 1.0)) * jnp.float32(
                        1.0 / _PI
                    )
                    xi = jnp.clip(
                        (u * env_w).astype(jnp.int32), 0, env_w - 1
                    )
                    yi = jnp.clip(
                        (v * env_h).astype(jnp.int32), 0, env_h - 1
                    )
                    out = []
                    for r in range(TILE_ROWS):
                        wy = (_env_iy == yi[r:r + 1, :]).astype(jnp.float32)
                        wx = (_env_ix == xi[r:r + 1, :]).astype(jnp.float32)
                        tmp = jax.lax.dot_general(
                            _env_pplane, wy, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )  # [Wp, 128]
                        out.append(jnp.sum(wx * tmp, axis=0, keepdims=True))
                    return jnp.concatenate(out, axis=0)

        # With no sub-pixel jitter the primary ray — and therefore the
        # bounce-0 hit and its material row — is the same for EVERY sample
        # in the batch: hoist that intersection out of the sample loop and
        # compute it once per tile. Exact (same arithmetic, same values),
        # so renders are bit-identical; the values are loop-invariant
        # registers/VMEM across the whole batch.
        pre0 = None
        if hoist_primary and not antialias and not dof:
            o0x = jnp.full(shape, pos[0])
            o0y = jnp.full(shape, pos[1])
            o0z = jnp.full(shape, pos[2])
            hit0 = intersect_all(o0x, o0y, o0z, *base_dir)
            pre0 = (hit0, fetch_material(hit0[4]))

        def init_sample(iteration):
            if ld and (antialias or dof):
                s0, s1 = _sobol_scalar_pair(iteration)
            if antialias:
                if ld:
                    jx = _ld_u01(s0, ld_aa[0])
                    jy = _ld_u01(s1, ld_aa[1])
                else:
                    seed_prng(_mix(seed, iteration, jnp.int32(0xAA), tile))
                    jx = draw_u01()
                    jy = draw_u01()
                dx, dy, dz = raygen(px + jx, py + jy)
            elif dof:
                if not ld:
                    # lens-only: seed the per-(seed, iter, tile) camera
                    # stream (with antialias on, the 0xAA stream continues
                    # below; LD draws its lens pair from the lattice)
                    seed_prng(_mix(seed, iteration, jnp.int32(0xD0F), tile))
                dx, dy, dz = raygen(px, py)
            else:
                dx, dy, dz = base_dir
            ox = jnp.full(shape, pos[0])
            oy = jnp.full(shape, pos[1])
            oz = jnp.full(shape, pos[2])
            if dof:
                # thin-lens (ops.camera.thin_lens, tile form): trace the
                # pinhole ray to the focal plane, jitter the origin to a
                # concentric lens-disk sample, re-aim at the pierce point
                ct = dx * view[0] + dy * view[1] + dz * view[2]
                ft = focal / jnp.maximum(ct, 1e-6)
                fpx = ox + dx * ft
                fpy = oy + dy * ft
                fpz = oz + dz * ft
                if ld:
                    u1 = _ld_u01(s0, ld_lens[0])
                    u2 = _ld_u01(s1, ld_lens[1])
                else:
                    u1 = draw_u01()
                    u2 = draw_u01()
                rl = aperture * jnp.sqrt(u1)
                th = (2.0 * _PI) * u2
                lx = rl * jnp.cos(th)
                ly = rl * jnp.sin(th)
                ox = ox + right[0] * lx + up[0] * ly
                oy = oy + right[1] * lx + up[1] * ly
                oz = oz + right[2] * lx + up[2] * ly
                dx = fpx - ox
                dy = fpy - oy
                dz = fpz - oz
                rn = jax.lax.rsqrt(
                    jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-20)
                )
                dx, dy, dz = dx * rn, dy * rn, dz * rn
            cr = jnp.ones(shape, jnp.float32)
            cg = jnp.ones(shape, jnp.float32)
            cb = jnp.ones(shape, jnp.float32)
            bounces = jnp.full(shape, trace_depth, jnp.int32)
            rad_r = jnp.zeros(shape, jnp.float32)
            rad_g = jnp.zeros(shape, jnp.float32)
            rad_b = jnp.zeros(shape, jnp.float32)
            st = (ox, oy, oz, dx, dy, dz, cr, cg, cb, bounces,
                  rad_r, rad_g, rad_b)
            if carry_pdf:
                # solid-angle pdf of the lobe that produced this ray, for
                # the next emissive hit's (or env escape's) MIS weight;
                # −1 = delta lobe / primary ray (weight 1). Appended LAST
                # so st[9] stays the bounces-remaining slot early_exit
                # keys on.
                st = st + (jnp.full(shape, -1.0, jnp.float32),)
            if env_exact is not None:
                # deferred-miss registers: throughput + direction at escape
                # (w=0 nullifies the post-loop gather for paths that never
                # miss; the default direction only needs to be valid input)
                st = st + (
                    jnp.zeros(shape, jnp.float32),
                    jnp.zeros(shape, jnp.float32),
                    jnp.zeros(shape, jnp.float32),
                    jnp.zeros(shape, jnp.float32),
                    jnp.ones(shape, jnp.float32),
                    jnp.zeros(shape, jnp.float32),
                )
                if env_nee:
                    # + the escaping ray's lobe pdf (MIS vs env sampling)
                    st = st + (jnp.full(shape, -1.0, jnp.float32),)
            return st

        def make_bounce(iteration):
            def bounce_body(depth, st, pre=None):
                (ox, oy, oz, dx, dy, dz, cr, cg, cb, bounces,
                 rad_r, rad_g, rad_b) = st[:13]
                prev_pdf = st[13] if carry_pdf else None
                n_ereg = (7 if env_nee else 6) if env_exact is not None else 0
                env_regs = list(st[-n_ereg:]) if n_ereg else None
                if ablation == "noprng":
                    u_rr = u_branch = u_a = u_b = px * 0.001
                    if nee is not None:
                        u_l0 = u_l1 = u_l2 = px * 0.002
                elif ld and depth < n_ld:
                    # leading-vertex draws from the per-depth Owen-scrambled
                    # (0,2) lattices (same lane layout as ops.rng's
                    # ld_bounce_uniforms / ld_nee_bounce_uniforms); RR stays
                    # on the PRNG stream (only consumed past rr_start_depth)
                    s0, s1 = _ld_rev_components(iteration, depth)
                    if depth > rr_start_depth:
                        seed_prng(_mix(seed, iteration, depth, tile))
                        u_rr = draw_u01()
                    else:
                        u_rr = None
                    u_branch = _ld_u01(s0, ld_bd[depth][0])
                    u_a = _ld_u01(s0, ld_bd[depth][1])
                    u_b = _ld_u01(s1, ld_bd[depth][2])
                    if nee is not None:
                        u_l0 = (
                            _ld_u01(s0, ld_nee_d[depth][0])
                            if nee[0] > 1
                            else None
                        )
                        u_l1 = _ld_u01(s0, ld_nee_d[depth][1])
                        u_l2 = _ld_u01(s1, ld_nee_d[depth][2])
                else:
                    seed_prng(_mix(seed, iteration, depth, tile))
                    # pre-RR bounces never consume u_rr: skip the draw (the
                    # stream is keyed per (seed, iter, depth, tile), so the
                    # draw count per bounce is free to vary by depth)
                    u_rr = draw_u01() if depth > rr_start_depth else None
                    u_branch = draw_u01()
                    u_a = draw_u01()
                    u_b = draw_u01()
                    if nee is not None:
                        # light pick + 2 surface coords, drawn after the
                        # BSDF uniforms so the nee-off stream is untouched;
                        # single-light scenes (the common case) skip the
                        # pick draw entirely
                        u_l0 = draw_u01() if nee[0] > 1 else None
                        u_l1 = draw_u01()
                        u_l2 = draw_u01()

                # ── nearest hit (precomputed for the hoisted bounce 0) ──
                hit = pre[0] if pre is not None else intersect_all(
                    ox, oy, oz, dx, dy, dz
                )
                if enable_refraction:
                    best_t, best_nx, best_ny, best_nz, best_mat, best_out = hit
                else:
                    best_t, best_nx, best_ny, best_nz, best_mat = hit

                missed = best_t >= _MISS
                alive = bounces > 0

                if env_exact is not None:
                    # ── deferred exact env miss (env_mode='exact'): record
                    # throughput + direction; the bilinear gather happens
                    # once per sample in accumulate(), not per bounce ──
                    esc = missed & alive
                    new_regs = [
                        jnp.where(esc, cr, env_regs[0]),
                        jnp.where(esc, cg, env_regs[1]),
                        jnp.where(esc, cb, env_regs[2]),
                        jnp.where(esc, dx, env_regs[3]),
                        jnp.where(esc, dy, env_regs[4]),
                        jnp.where(esc, dz, env_regs[5]),
                    ]
                    if env_nee:
                        # the escaping ray's lobe pdf, for the MIS weight
                        # applied to the deferred gather in accumulate()
                        new_regs.append(
                            jnp.where(esc, prev_pdf, env_regs[6])
                        )
                    env_regs = new_regs
                elif env_split is not None:
                    # ── SH-9 residual sky (env_mode='split'; the suns are
                    # handled by the deterministic table below and the
                    # depth-0 background outside the kernel when
                    # bg_external) — pure VPU math, clamped at 0 against
                    # SH ringing ──
                    if not (env_split[2] and depth == 0):
                        from ...ops.envmap import sh9_eval

                        s3 = sh9_eval(env_split[1], dx, dy, dz)
                        esc = missed & alive
                        rad_r = jnp.where(
                            esc, rad_r + cr * jnp.maximum(s3[0], 0.0), rad_r
                        )
                        rad_g = jnp.where(
                            esc, rad_g + cg * jnp.maximum(s3[1], 0.0), rad_g
                        )
                        rad_b = jnp.where(
                            esc, rad_b + cb * jnp.maximum(s3[2], 0.0), rad_b
                        )
                else:
                    # ── sky (`pathtrace.cu:358-362`) ──
                    t_sky = 0.5 * (dy + 1.0)
                    sky_r = ((1.0 - t_sky) + t_sky * 0.5) * 0.5
                    sky_g = ((1.0 - t_sky) + t_sky * 0.7) * 0.5
                    sky_b = ((1.0 - t_sky) + t_sky * 1.0) * 0.5
                    if legacy:
                        cr = jnp.where(missed, cr * sky_r, cr)
                        cg = jnp.where(missed, cg * sky_g, cg)
                        cb = jnp.where(missed, cb * sky_b, cb)
                    elif sky_strength:
                        esc = missed & alive
                        ss = jnp.float32(sky_strength)
                        rad_r = jnp.where(esc, rad_r + cr * sky_r * ss, rad_r)
                        rad_g = jnp.where(esc, rad_g + cg * sky_g * ss, rad_g)
                        rad_b = jnp.where(esc, rad_b + cb * sky_b * ss, rad_b)

                act = ~missed & alive

                # ── material select (precomputed for the hoisted bounce 0) ──
                msel = pre[1] if pre is not None else fetch_material(best_mat)
                if enable_refraction:
                    (m_cr, m_cg, m_cb, m_sr, m_sg, m_sb, m_refl, m_refr,
                     m_emit, m_ior) = msel
                else:
                    (m_cr, m_cg, m_cb, m_sr, m_sg, m_sb, m_refl, m_refr,
                     m_emit) = msel

                # ── emissive termination ──
                emissive = m_emit > 0.0
                hit_light = act & emissive
                w_emit = None
                if nee is not None:
                    # MIS balance heuristic (ops/shade.py emissive branch):
                    # a BRDF-sampled emissive hit reached via the previous
                    # vertex's diffuse lobe competes with NEE having
                    # sampled the same point. The hit light is identified
                    # by material id (validated unique per light); its
                    # area pdf at the hit follows from the static light
                    # transform and the world normal:
                    #   n̂_obj ∝ Aᵀ·n̂_w,  s = |det A|·|A⁻ᵀ·n̂_obj|,
                    #   pdf_A = pdf_obj / (L·s)   (lights.area_pdf_at)
                    n_lights, light_rows = nee
                    p_nee_area = jnp.zeros(shape, jnp.float32)
                    sampled = jnp.zeros(shape, jnp.bool_)
                    for (lk, lmat, la, _ltr, lait, ldet, _le) in light_rows:
                        o0 = (la[0][0] * best_nx + la[1][0] * best_ny
                              + la[2][0] * best_nz)
                        o1 = (la[0][1] * best_nx + la[1][1] * best_ny
                              + la[2][1] * best_nz)
                        o2 = (la[0][2] * best_nx + la[1][2] * best_ny
                              + la[2][2] * best_nz)
                        rn = jax.lax.rsqrt(
                            jnp.maximum(o0 * o0 + o1 * o1 + o2 * o2, 1e-20)
                        )
                        o0, o1, o2 = o0 * rn, o1 * rn, o2 * rn
                        t0 = lait[0][0] * o0 + lait[0][1] * o1 + lait[0][2] * o2
                        t1 = lait[1][0] * o0 + lait[1][1] * o1 + lait[1][2] * o2
                        t2 = lait[2][0] * o0 + lait[2][1] * o1 + lait[2][2] * o2
                        s = ldet * jnp.sqrt(
                            jnp.maximum(t0 * t0 + t1 * t1 + t2 * t2, 1e-40)
                        )
                        pdf_obj = _INV_PI if lk == 1 else (1.0 / 6.0)
                        p_l = jnp.float32(pdf_obj / n_lights) * _recip(
                            jnp.maximum(s, 1e-20)
                        )
                        sel = best_mat == lmat
                        p_nee_area = jnp.where(sel, p_l, p_nee_area)
                        sampled = sampled | sel
                    cos_l = jnp.maximum(
                        -(dx * best_nx + dy * best_ny + dz * best_nz), 1e-6
                    )
                    p_nee_dir = p_nee_area * best_t * best_t * _recip(cos_l)
                    w_emit = jnp.where(
                        (prev_pdf < 0.0) | ~sampled,
                        1.0,
                        prev_pdf
                        * _recip(jnp.maximum(prev_pdf + p_nee_dir, 1e-20)),
                    )
                if legacy:
                    cr = jnp.where(hit_light, cr * m_cr * m_emit, cr)
                    cg = jnp.where(hit_light, cg * m_cg * m_emit, cg)
                    cb = jnp.where(hit_light, cb * m_cb * m_emit, cb)
                elif w_emit is not None:
                    rad_r = jnp.where(hit_light, rad_r + cr * m_cr * m_emit * w_emit, rad_r)
                    rad_g = jnp.where(hit_light, rad_g + cg * m_cg * m_emit * w_emit, rad_g)
                    rad_b = jnp.where(hit_light, rad_b + cb * m_cb * m_emit * w_emit, rad_b)
                else:
                    rad_r = jnp.where(hit_light, rad_r + cr * m_cr * m_emit, rad_r)
                    rad_g = jnp.where(hit_light, rad_g + cg * m_cg * m_emit, rad_g)
                    rad_b = jnp.where(hit_light, rad_b + cb * m_cb * m_emit, rad_b)
                act = act & ~emissive

                # ── Russian roulette (depth is a static unrolled index, so
                # pre-RR bounces compile to nothing) ──
                if depth > rr_start_depth:
                    p_cont = jnp.maximum(m_cr, jnp.maximum(m_cg, m_cb))
                    rr_kill = act & (u_rr > p_cont)
                    keep = act & ~rr_kill
                    boost = jnp.where(
                        keep, _recip(jnp.maximum(p_cont, 1e-12)), 1.0
                    )
                    cr = cr * boost
                    cg = cg * boost
                    cb = cb * boost
                    act = act & ~rr_kill

                # ── scatter ──
                if ablation == "noscatter":
                    bounces = jnp.where(act, bounces - 1, jnp.zeros_like(bounces))
                    ox = ox + u_a * 0.001  # keep u's live
                    out = (ox, oy, oz, dx, dy, dz, cr, cg, cb, bounces,
                           rad_r, rad_g, rad_b)
                    out = out + (prev_pdf,) if carry_pdf else out
                    return (
                        out if env_regs is None else out + tuple(env_regs)
                    )
                nx, ny, nz = best_nx, best_ny, best_nz
                rough = 1.0 - m_refr
                spec = act & (m_refl > 0.0) & (u_branch < m_refl)

                ddn = dx * nx + dy * ny + dz * nz
                rx = dx - 2.0 * ddn * nx
                ry = dy - 2.0 * ddn * ny
                rz = dz - 2.0 * ddn * nz

                def frame(vx, vy, vz):
                    use_a = jnp.abs(vx) > jnp.abs(vy)
                    tx = jnp.where(use_a, vz, 0.0)
                    ty = jnp.where(use_a, 0.0, -vz)
                    tz = jnp.where(use_a, -vx, vy)
                    r = jax.lax.rsqrt(
                        jnp.maximum(tx * tx + ty * ty + tz * tz, 1e-20)
                    )
                    tx, ty, tz = tx * r, ty * r, tz * r
                    bx = vy * tz - vz * ty
                    by = vz * tx - vx * tz
                    bz = vx * ty - vy * tx
                    return tx, ty, tz, bx, by, bz

                # One azimuth angle serves both branches: a lane is either
                # specular or diffuse, never both, so sharing cos/sin(2π·u_b)
                # is statistically identical and saves a sin+cos+draw on
                # every lane.
                ph2 = 2.0 * jnp.float32(_PI) * u_b
                cp2 = jnp.cos(ph2)
                sp2 = jnp.sin(ph2)

                ang = rough * u_a * jnp.float32(_PI * 0.5)
                sa = jnp.sin(ang)
                ca = jnp.cos(ang)
                st_ = jnp.sqrt(u_a)
                ct_ = jnp.sqrt(jnp.maximum(1.0 - u_a, 0.0))
                # The exclusivity also lets the two frames collapse to one:
                # select the polar axis (reflection for specular, normal for
                # diffuse) and polar sin/cos FIRST, then build a single
                # orthonormal frame around the selected axis. Each lane runs
                # the exact arithmetic it ran before (same values, same op
                # order), so renders are bit-identical — but one frame()
                # (rsqrt + cross product) and one 9-mul combine disappear
                # from every bounce.
                vax = jnp.where(spec, rx, nx)
                vay = jnp.where(spec, ry, ny)
                vaz = jnp.where(spec, rz, nz)
                s_pol = jnp.where(spec, sa, st_)
                c_pol = jnp.where(spec, ca, ct_)
                tx, ty, tz, bxv, byv, bzv = frame(vax, vay, vaz)
                # (t, v, b) is orthonormal and (s·cp2, c, s·sp2) is unit, so
                # the combined direction is already unit — no renormalize.
                scp = s_pol * cp2
                ssp = s_pol * sp2
                ndx = tx * scp + vax * c_pol + bxv * ssp
                ndy = ty * scp + vay * c_pol + byv * ssp
                ndz = tz * scp + vaz * c_pol + bzv * ssp
                t_r = jnp.where(spec, m_sr, m_cr)
                t_g = jnp.where(spec, m_sg, m_cg)
                t_b = jnp.where(spec, m_sb, m_cb)

                if enable_refraction:
                    # dielectric transmission (Snell + Schlick), identical
                    # semantics to ops.fast.shade_soa / ops.shade.shade_step
                    is_glass = (m_ior > 0.0) & (m_refr > 0.0)
                    cos_i = jnp.clip(-ddn, 0.0, 1.0)
                    n1 = jnp.where(best_out, 1.0, m_ior)
                    n2 = jnp.where(best_out, m_ior, 1.0)
                    eta = n1 * _recip(jnp.maximum(n2, 1e-6))
                    sin2_t = eta * eta * jnp.maximum(1.0 - cos_i * cos_i, 0.0)
                    tir = sin2_t > 1.0
                    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
                    r0 = (n1 - n2) * _recip(n1 + n2)
                    r0 = r0 * r0
                    omc = 1.0 - cos_i
                    omc2 = omc * omc
                    fres = r0 + (1.0 - r0) * omc2 * omc2 * omc
                    coef = eta * cos_i - cos_t
                    fxr = eta * dx + coef * nx
                    fyr = eta * dy + coef * ny
                    fzr = eta * dz + coef * nz
                    rnr = jax.lax.rsqrt(
                        jnp.maximum(fxr * fxr + fyr * fyr + fzr * fzr, 1e-20)
                    )
                    transmit = is_glass & ~tir & (u_branch >= fres)
                    glass = act & is_glass
                    gdx = jnp.where(transmit, fxr * rnr, rx)
                    gdy = jnp.where(transmit, fyr * rnr, ry)
                    gdz = jnp.where(transmit, fzr * rnr, rz)
                    ndx = jnp.where(glass, gdx, ndx)
                    ndy = jnp.where(glass, gdy, ndy)
                    ndz = jnp.where(glass, gdz, ndz)
                    t_r = jnp.where(glass, jnp.where(transmit, m_cr, m_sr), t_r)
                    t_g = jnp.where(glass, jnp.where(transmit, m_cg, m_sg), t_g)
                    t_b = jnp.where(glass, jnp.where(transmit, m_cb, m_sb), t_b)
                    off = jnp.where(
                        glass & transmit, -_ORIGIN_OFFSET, _ORIGIN_OFFSET
                    )
                else:
                    off = _ORIGIN_OFFSET

                hx = ox + best_t * dx + nx * off
                hy = oy + best_t * dy + ny * off
                hz = oz + best_t * dz + nz * off

                if nee is not None:
                    # ── direct light at this vertex (ops/shade.py NEE
                    # block, restated as static-table component math) ──
                    # Estimates the diffuse component of the mixture BRDF,
                    # (1−P_spec)·albedo/π, for every diffuse-capable lane;
                    # cr/cg/cb here are the post-RR, pre-tint throughput.
                    # The balance-heuristic partner term is the w_emit
                    # weight at the emissive branch above.
                    n_lights, light_rows = nee

                    def sample_light(row):
                        lk, _lm, la, ltr, lait, ldet, le = row
                        if lk == 1:  # sphere: uniform direction, r = 0.5
                            z = 1.0 - 2.0 * u_l1
                            rxy = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
                            ph = 2.0 * jnp.float32(_PI) * u_l2
                            sn0 = rxy * jnp.cos(ph)
                            sn1 = z
                            sn2 = rxy * jnp.sin(ph)
                            sp0, sp1, sp2 = 0.5 * sn0, 0.5 * sn1, 0.5 * sn2
                            pdf_obj = _INV_PI
                        else:  # cube: uniform over the 6 unit faces
                            f6 = u_l1 * 6.0
                            face = jnp.minimum(f6.astype(jnp.int32), 5)
                            u_f = f6 - face.astype(jnp.float32)
                            axis = face // 2
                            sgn = jnp.where(face % 2 == 0, 1.0, -1.0)
                            cu = u_f - 0.5
                            cv = u_l2 - 0.5
                            sp0 = jnp.where(axis == 0, sgn * 0.5, cu)
                            sp1 = jnp.where(
                                axis == 1, sgn * 0.5,
                                jnp.where(axis == 0, cu, cv),
                            )
                            sp2 = jnp.where(axis == 2, sgn * 0.5, cv)
                            sn0 = jnp.where(axis == 0, sgn, 0.0)
                            sn1 = jnp.where(axis == 1, sgn, 0.0)
                            sn2 = jnp.where(axis == 2, sgn, 0.0)
                            pdf_obj = 1.0 / 6.0
                        wx = la[0][0] * sp0 + la[0][1] * sp1 + la[0][2] * sp2 + ltr[0]
                        wy = la[1][0] * sp0 + la[1][1] * sp1 + la[1][2] * sp2 + ltr[1]
                        wz = la[2][0] * sp0 + la[2][1] * sp1 + la[2][2] * sp2 + ltr[2]
                        un0 = lait[0][0] * sn0 + lait[0][1] * sn1 + lait[0][2] * sn2
                        un1 = lait[1][0] * sn0 + lait[1][1] * sn1 + lait[1][2] * sn2
                        un2 = lait[2][0] * sn0 + lait[2][1] * sn1 + lait[2][2] * sn2
                        nn = jnp.sqrt(
                            jnp.maximum(un0 * un0 + un1 * un1 + un2 * un2, 1e-40)
                        )
                        rnn = _recip(nn)
                        # pdf in world-area measure incl. the 1/L pick factor
                        pdf_a = jnp.float32(pdf_obj / n_lights) * _recip(
                            jnp.maximum(ldet * nn, 1e-20)
                        )
                        return (wx, wy, wz, un0 * rnn, un1 * rnn, un2 * rnn,
                                pdf_a, le[0], le[1], le[2])

                    if n_lights == 1:
                        (lpx, lpy, lpz, lnx, lny, lnz,
                         pdf_a, le_r, le_g, le_b) = sample_light(light_rows[0])
                    else:
                        pick = jnp.minimum(
                            (u_l0 * n_lights).astype(jnp.int32),
                            jnp.int32(n_lights - 1),
                        )
                        vals = None
                        for li, row in enumerate(light_rows):
                            cand = sample_light(row)
                            if vals is None:
                                vals = cand
                            else:
                                sel = pick == li
                                vals = tuple(
                                    jnp.where(sel, c, v)
                                    for c, v in zip(cand, vals)
                                )
                        (lpx, lpy, lpz, lnx, lny, lnz,
                         pdf_a, le_r, le_g, le_b) = vals

                    tox, toy, toz = lpx - hx, lpy - hy, lpz - hz
                    d2 = tox * tox + toy * toy + toz * toz
                    dist = jnp.sqrt(jnp.maximum(d2, 1e-24))
                    rdist = _recip(dist)
                    wix, wiy, wiz = tox * rdist, toy * rdist, toz * rdist
                    cos_s = nx * wix + ny * wiy + nz * wiz
                    cos_l2 = -(lnx * wix + lny * wiy + lnz * wiz)
                    # shadow ray = any-hit occlusion only; the sampled
                    # point itself intersects at ~dist, anything nearer
                    # occludes (ops/shade.py visibility rule). occluded_any
                    # is boolean-identical to intersect_all's
                    # `best_t < limit` at ~60% of the op count; measured
                    # NEUTRAL on Cornell's 8 geoms (315.7 vs 314.4 M
                    # rays/s — the skipped selects hide in the VPU
                    # pipeline) but renders stay bit-identical and the
                    # saving scales with geom count.
                    visible = ~occluded_any(
                        hx, hy, hz, wix, wiy, wiz,
                        dist - jnp.maximum(1e-3, 1e-3 * dist),
                    )
                    base = act & ~glass if enable_refraction else act
                    add = (base & (cos_s > 0.0) & (cos_l2 > 0.0)
                           & (dist > 1e-4) & visible)
                    diffuse_prob = 1.0 - m_refl
                    p_brdf_area = (
                        diffuse_prob * jnp.maximum(cos_s, 0.0)
                        * jnp.float32(_INV_PI) * jnp.maximum(cos_l2, 0.0)
                        * _recip(jnp.maximum(d2, 1e-12))
                    )
                    w_mis = pdf_a * _recip(
                        jnp.maximum(pdf_a + p_brdf_area, 1e-20)
                    )
                    geomf = cos_s * cos_l2 * _recip(
                        jnp.maximum(d2 * pdf_a, 1e-20)
                    )
                    k_d = (diffuse_prob * jnp.float32(_INV_PI)
                           * geomf * w_mis)
                    rad_r = jnp.where(add, rad_r + cr * m_cr * k_d * le_r, rad_r)
                    rad_g = jnp.where(add, rad_g + cg * m_cg * k_d * le_g, rad_g)
                    rad_b = jnp.where(add, rad_b + cb * m_cb * k_d * le_b, rad_b)

                if env_nee:
                    # ── direct environment light (extension; the in-kernel
                    # twin of ops/shade.py's env NEE block). ONE shared env
                    # sample per (iteration, depth): drawn OUTSIDE the
                    # kernel from the alias table (ops.envmap.sample_env,
                    # exact importance sampling) and carried in as a
                    # [S·D, 8] VMEM row table (direction, bilinear
                    # radiance, solid-angle pdf). Sharing the draw across
                    # lanes leaves every pixel's mean AND variance
                    # unchanged (each pixel still consumes one env draw
                    # per bounce); it only correlates neighboring pixels'
                    # noise — and it removes every per-lane table gather
                    # from the hot loop (the row load is one dynamic
                    # (1, 8) VMEM slice, the mesh kernel's proven
                    # pattern). MIS partner: the deferred escape gather is
                    # weighted by prev_pdf/(prev_pdf+pdf_env) in
                    # accumulate(). ──
                    erow = envrows_ref[
                        pl.ds((iteration - iter_base) * trace_depth + depth,
                              1), :,
                    ]  # (1, 8)
                    ewx, ewy, ewz = erow[0, 0], erow[0, 1], erow[0, 2]
                    el_r, el_g, el_b = erow[0, 3], erow[0, 4], erow[0, 5]
                    e_pdf = erow[0, 6]
                    ecos = best_nx * ewx + best_ny * ewy + best_nz * ewz
                    evis = ~occluded_any(
                        hx, hy, hz, ewx, ewy, ewz, jnp.float32(1e7)
                    )
                    ebase = act & ~glass if enable_refraction else act
                    ediff = 1.0 - m_refl
                    e_pb = (
                        ediff * jnp.maximum(ecos, 0.0)
                        * jnp.float32(_INV_PI)
                    )
                    e_w = e_pdf / jnp.maximum(e_pdf + e_pb, 1e-20)
                    e_k = (
                        ediff * jnp.float32(_INV_PI)
                        * jnp.maximum(ecos, 0.0)
                        / jnp.maximum(e_pdf, jnp.float32(1e-20)) * e_w
                    )
                    eadd = ebase & (ecos > 0.0) & evis
                    rad_r = jnp.where(eadd, rad_r + cr * m_cr * e_k * el_r,
                                      rad_r)
                    rad_g = jnp.where(eadd, rad_g + cg * m_cg * e_k * el_g,
                                      rad_g)
                    rad_b = jnp.where(eadd, rad_b + cb * m_cb * e_k * el_b,
                                      rad_b)

                if carry_pdf:
                    # density with which THIS vertex's lobe generated the
                    # extension ray (next emissive hit's / env escape's MIS
                    # weight): diffuse lanes carry (1−P)·cosθ/π, delta
                    # lobes −1
                    cos_new = jnp.maximum(ndx * nx + ndy * ny + ndz * nz, 0.0)
                    diffuse_ext = act & ~spec
                    if enable_refraction:
                        diffuse_ext = diffuse_ext & ~glass
                    prev_pdf = jnp.where(
                        diffuse_ext,
                        (1.0 - m_refl) * cos_new * jnp.float32(_INV_PI),
                        jnp.float32(-1.0),
                    )

                if env_split is not None and env_split[0]:
                    # ── delta sun lights (env_mode='split') at diffuse-
                    # capable vertices: deterministic — no RNG draw, no
                    # MIS (a delta light has no BRDF competitor of
                    # nonzero measure); one any-hit shadow ray per sun
                    # whose DIRECTION is a compile-time constant, so the
                    # per-geom direction transforms in occluded_any
                    # constant-fold to immediates ──
                    sun_base = act & ~glass if enable_refraction else act
                    diffuse_p = 1.0 - m_refl
                    for (sd0, sd1, sd2, ser, seg, seb) in env_split[0]:
                        cos_sun = (best_nx * sd0 + best_ny * sd1
                                   + best_nz * sd2)
                        sun_vis = ~occluded_any(
                            hx, hy, hz,
                            jnp.float32(sd0), jnp.float32(sd1),
                            jnp.float32(sd2), jnp.float32(1e7),
                        )
                        sun_add = sun_base & (cos_sun > 0.0) & sun_vis
                        k_sun = (diffuse_p * jnp.float32(_INV_PI)
                                 * jnp.maximum(cos_sun, 0.0))
                        rad_r = jnp.where(
                            sun_add, rad_r + cr * m_cr * k_sun * ser, rad_r
                        )
                        rad_g = jnp.where(
                            sun_add, rad_g + cg * m_cg * k_sun * seg, rad_g
                        )
                        rad_b = jnp.where(
                            sun_add, rad_b + cb * m_cb * k_sun * seb, rad_b
                        )

                cr = jnp.where(act, cr * t_r, cr)
                cg = jnp.where(act, cg * t_g, cg)
                cb = jnp.where(act, cb * t_b, cb)
                ox = jnp.where(act, hx, ox)
                oy = jnp.where(act, hy, oy)
                oz = jnp.where(act, hz, oz)
                dx = jnp.where(act, ndx, dx)
                dy = jnp.where(act, ndy, dy)
                dz = jnp.where(act, ndz, dz)
                bounces = jnp.where(act, bounces - 1, jnp.zeros_like(bounces))

                out = (ox, oy, oz, dx, dy, dz, cr, cg, cb, bounces,
                       rad_r, rad_g, rad_b)
                out = out + (prev_pdf,) if carry_pdf else out
                return out if env_regs is None else out + tuple(env_regs)

            return bounce_body

        def accumulate(acc, st):
            acc_r, acc_g, acc_b = acc
            (_, _, _, _, _, _, cr, cg, cb, _, rad_r, rad_g, rad_b) = st[:13]
            if legacy:
                return (acc_r + cr, acc_g + cg, acc_b + cb)
            if env_exact is not None:
                # settle the sample's deferred env miss: one bilinear MXU
                # gather per sample (never-missed lanes carry weight 0)
                if env_nee:
                    # + the nearest-texel pdf gather for the MIS weight
                    # against env importance sampling (prev_pdf < 0 =
                    # primary/specular/glass escape → weight 1)
                    (e_wr, e_wg, e_wb, e_dx, e_dy, e_dz, e_pp) = st[-7:]
                    er, eg, eb = env_lookup(e_dx, e_dy, e_dz)
                    pe = env_pdf_lookup(e_dx, e_dy, e_dz)
                    wmis = jnp.where(
                        e_pp < 0.0,
                        jnp.float32(1.0),
                        e_pp * _recip(jnp.maximum(e_pp + pe, 1e-20)),
                    )
                    return (
                        acc_r + rad_r + e_wr * er * wmis,
                        acc_g + rad_g + e_wg * eg * wmis,
                        acc_b + rad_b + e_wb * eb * wmis,
                    )
                e_wr, e_wg, e_wb, e_dx, e_dy, e_dz = st[-6:]
                er, eg, eb = env_lookup(e_dx, e_dy, e_dz)
                return (
                    acc_r + rad_r + e_wr * er,
                    acc_g + rad_g + e_wg * eg,
                    acc_b + rad_b + e_wb * eb,
                )
            return (acc_r + rad_r, acc_g + rad_g, acc_b + rad_b)

        def bounce_step(bounce_fn, depth, st):
            # depth 0 reuses the hoisted primary hit (pre0 is None when
            # antialias jitters the primaries). Lanes can first go all-dead
            # after bounce 0 ran, so depth 0 (and every bounce when
            # early_exit is off) calls straight in.
            pre = pre0 if depth == 0 else None
            if not early_exit or depth == 0:
                return bounce_fn(depth, st, pre)
            return jax.lax.cond(
                jnp.any(st[9] > 0),  # st[9] = bounces-remaining
                lambda s: bounce_fn(depth, s),
                lambda s: s,
                st,
            )

        # Unrolled bounce loop: a fori_loop here costs ~0.3 ms/bounce in
        # carry copies + loop control — more than the bounce's compute.
        def sample_body(s, acc):
            iteration = iter_base + s
            st = init_sample(iteration)
            bounce = make_bounce(iteration)
            for depth in range(trace_depth):
                st = bounce_step(bounce, depth, st)
            return accumulate(acc, st)

        def group_body(p, acc):
            # `interleave` independent sample chains advanced bounce-by-bounce:
            # the scheduler can overlap one chain's transcendental/divide
            # latency with the others' independent arithmetic. Accumulation
            # order (ascending iteration) matches sample_body, so the result
            # is bit-identical for any interleave factor.
            its = [iter_base + interleave * p + c for c in range(interleave)]
            sts = [init_sample(it) for it in its]
            chains = [make_bounce(it) for it in its]
            for depth in range(trace_depth):
                for c in range(interleave):
                    sts[c] = bounce_step(chains[c], depth, sts[c])
            for c in range(interleave):
                acc = accumulate(acc, sts[c])
            return acc

        acc = (
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
        )
        if interleave > 1 and num_samples % interleave == 0:
            acc = jax.lax.fori_loop(0, num_samples // interleave, group_body, acc)
        else:
            acc = jax.lax.fori_loop(0, num_samples, sample_body, acc)
        or_ref[:] = acc[0]
        og_ref[:] = acc[1]
        ob_ref[:] = acc[2]

    return kernel


def supports(scene: Scene) -> bool:
    from .. import fast

    # envmap scenes: carried in-kernel (exact bilinear via one-hot MXU
    # gathers, or the sun/sky split) up to the VMEM/matmul budget; larger
    # maps run exact only on the XLA fast pipeline
    if scene.envmap is not None:
        h, w = scene.envmap.shape
        if h * w > MAX_ENV_EXACT_TEXELS:
            return False
    return fast.supports(scene)


def render_samples(
    scene: Scene,
    config,
    seed: jnp.ndarray,
    iter_base: jnp.ndarray,
    num_samples: int,
    interpret: bool = False,
    pixel_offset=0,
    num_pixels=None,
    geom_kinds=None,
    scene_static=None,
    tile_base=None,
    nee_static=None,
    env_split=None,
    env_nee=None,
) -> jnp.ndarray:
    """Render `num_samples` samples in one kernel dispatch (public wrapper;
    forwards the module-level ABLATION/INTERLEAVE knobs as jit-static args so
    the executable cache keys on them). `geom_kinds` (static) carries the
    per-geom axis-aligned specialization and `scene_static` the immediate
    geometry/material tables (_static_scene_tables); when None they are
    derived from the scene's concrete arrays (callers inside a trace —
    shard_map — must precompute them, see parallel.shard). `nee_static`
    (static, `_static_light_table`) enables in-kernel direct light
    sampling with MIS when `config.nee`; derived here when None."""
    if num_pixels is None and not (
        isinstance(pixel_offset, int) and pixel_offset == 0
    ):
        # num_pixels=None always means "the full frame" inside the jitted
        # impl — a bare offset would be silently ignored there
        raise ValueError(
            "pixel_offset requires num_pixels (a slice render); "
            "num_pixels=None renders the full frame"
        )
    if geom_kinds is None:
        geom_kinds = _static_geom_kinds(scene)
    if scene_static is None:
        scene_static = _static_scene_tables(scene)
    env_exact = None
    if env_split is None and scene.envmap is not None:
        if getattr(config, "env_mode", "exact") == "split":
            env_split = _static_env_split(scene, config)
        else:
            # exact mode: in-kernel bilinear gather; with config.nee the
            # environment is additionally importance-sampled in-kernel
            # (shared per-(iteration, depth) alias draws — see the kernel's
            # env NEE block). Scenes mixing an envmap with analytic
            # emissive lights keep routing to the fast pipeline (the
            # combined two-technique NEE is not in-kernel).
            h, w = scene.envmap.shape
            if h * w > MAX_ENV_EXACT_TEXELS:
                raise ValueError(
                    f"env_mode='exact' in-kernel supports maps up to "
                    f"{MAX_ENV_EXACT_TEXELS} texels (got {h}x{w}); use "
                    "env_mode='split' or pipeline='fast'"
                )
            env_exact = _static_env_exact(scene)
    if env_nee is None:
        try:
            env_nee = env_exact is not None and _wants_env_nee(scene, config)
        except ValueError:
            raise
        except Exception as e:  # tracer scene: the flag must come from outside
            raise ValueError(
                "sharded env NEE needs the env_nee flag precomputed from "
                "the concrete scene — call via "
                "parallel.shard.make_sharded_pallas_step"
            ) from e
    if not env_nee and nee_static is None and getattr(config, "nee", False):
        if config.gather_mode != "light_only":
            raise ValueError("nee requires gather_mode='light_only'")
        nee_static = _static_light_table(scene)
        if nee_static is None and scene.envmap is None:
            raise ValueError(
                "nee: scene has no analytic (cube/sphere) emissive lights"
            )
    # Interpret mode is a CPU correctness tool: interleaving there only
    # multiplies the interpreted graph (and under shard_map the slower shards
    # can miss XLA:CPU's 40 s collective-rendezvous deadline — observed as a
    # SIGABRT in tests). The group path has its own direct test
    # (test_megakernel_interleave_bit_identical).
    if interpret:
        interleave = 1
    else:
        interleave = max(
            (d for d in range(1, INTERLEAVE + 1) if num_samples % d == 0),
            default=1,
        )
    return _render_samples_impl(
        scene, config, seed, iter_base, num_samples, interpret,
        pixel_offset, num_pixels, ABLATION, interleave, geom_kinds,
        scene_static, tile_base,
        EARLY_EXIT or getattr(config, "early_exit", False),
        HOIST_PRIMARY, nee_static, env_split, env_exact, env_nee,
    )


def render_tiles(
    scene: Scene,
    config,
    seed: jnp.ndarray,
    tile_ids: jnp.ndarray,
    iter_bases: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    num_samples: int,
    interpret: bool = False,
    geom_kinds=None,
    scene_static=None,
    nee_static=None,
) -> jnp.ndarray:
    """Render `num_samples` samples for K *selected* tiles in one dispatch
    (the adaptive-sampling entry point — see render.adaptive).

    `tile_ids` [K] int32 are the tiles' global RNG keys (any stable
    assignment; render.adaptive uses the spatial-block index), `iter_bases`
    [K] int32 each tile's next 1-based iteration, and `px`/`py`
    [K·TILE_ROWS, LANES] f32 the pixel coordinates of each tile's lanes
    (arbitrary layout — the caller owns pixel→lane assignment and scatters
    the result back). Returns the [K·TILE, 3] radiance sum over the batch.
    K is static (from the shapes); tile selection is data, so refining a
    different tile set never recompiles."""
    env_exact = None
    if scene.envmap is not None:
        # exact mode works per-tile natively (misses — including primary
        # ones — settle in-kernel, no full-frame composite); split mode's
        # exact-background composite needs the full frame, so it still
        # routes to dense rendering.
        if getattr(config, "env_mode", "exact") == "split":
            raise ValueError(
                "render_tiles (adaptive sampling) does not carry "
                "env_mode='split' — its exact-background composite needs "
                "the full frame; use env_mode='exact' or render dense"
            )
        if getattr(config, "nee", False):
            raise ValueError(
                "render_tiles (adaptive sampling): env NEE rows are keyed "
                "by dense absolute iterations, which per-tile bases break; "
                "render dense (render_samples) or use pipeline='fast'"
            )
        h, w = scene.envmap.shape
        if h * w > MAX_ENV_EXACT_TEXELS:
            raise ValueError(
                f"env_mode='exact' in-kernel supports maps up to "
                f"{MAX_ENV_EXACT_TEXELS} texels (got {h}x{w}); use "
                "env_mode='split' or pipeline='fast'"
            )
        env_exact = _static_env_exact(scene)
    if geom_kinds is None:
        geom_kinds = _static_geom_kinds(scene)
    if scene_static is None:
        scene_static = _static_scene_tables(scene)
    if nee_static is None and getattr(config, "nee", False):
        if config.gather_mode != "light_only":
            raise ValueError("nee requires gather_mode='light_only'")
        nee_static = _static_light_table(scene)
        if nee_static is None:
            raise ValueError(
                "nee: scene has no analytic (cube/sphere) emissive lights"
            )
    if interpret:
        interleave = 1
    else:
        interleave = max(
            (d for d in range(1, INTERLEAVE + 1) if num_samples % d == 0),
            default=1,
        )
    return _render_tiles_impl(
        scene, config, seed, tile_ids, iter_bases, px, py, num_samples,
        interpret, ABLATION, interleave, geom_kinds, scene_static,
        EARLY_EXIT or getattr(config, "early_exit", False),
        HOIST_PRIMARY, nee_static, env_exact,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "num_samples", "interpret", "ablation", "interleave",
        "geom_kinds", "scene_static", "early_exit", "hoist_primary",
        "nee_static", "env_exact",
    ),
)
def _render_tiles_impl(
    scene: Scene,
    config,
    seed,
    tile_ids,
    iter_bases,
    px,
    py,
    num_samples: int,
    interpret: bool,
    ablation: str,
    interleave: int,
    geom_kinds: tuple,
    scene_static: tuple,
    early_exit: bool,
    hoist_primary: bool,
    nee_static,
    env_exact=None,
) -> jnp.ndarray:
    cam = scene.camera
    w, h = cam.resolution
    if getattr(config, "sampler", "independent") == "sobol" and (
        w * h >= 1 << 24
    ):
        raise ValueError("sampler='sobol' supports at most 2^24 pixels")
    k_tiles = tile_ids.shape[0]
    rows = k_tiles * TILE_ROWS
    if px.shape != (rows, LANES) or py.shape != (rows, LANES):
        raise ValueError(
            f"px/py must be [{rows}, {LANES}] for {k_tiles} tiles; "
            f"got {px.shape}/{py.shape}"
        )

    geo, geo_mat, mats = _pack_scene(scene)
    cam_vec = jnp.concatenate(
        [cam.position, cam.view, cam.right, cam.up, cam.pixel_length,
         cam.aperture[None], cam.focal[None]]
    )
    # scal layout: [seed, 0, 0, tile_ids[K], iter_bases[K]] — slots 1/2
    # (iter_base / tile_base) are unused in adaptive mode but kept so the
    # kernel's fixed offsets (3, 3+K) stay uniform with the dense path.
    scal = jnp.concatenate(
        [
            jnp.stack(
                [jnp.asarray(seed, jnp.int32), jnp.int32(0), jnp.int32(0)]
            ),
            jnp.asarray(tile_ids, jnp.int32).reshape(-1),
            jnp.asarray(iter_bases, jnp.int32).reshape(-1),
        ]
    )

    kernel = _make_kernel(
        num_cubes=scene.cubes.count,
        num_spheres=scene.spheres.count,
        num_materials=scene.materials.color.shape[0],
        trace_depth=config.trace_depth,
        num_samples=num_samples,
        rr_start_depth=config.rr_start_depth,
        legacy=config.gather_mode == "throughput",
        sky_strength=config.sky_strength,
        antialias=config.antialias,
        width=w,
        height=h,
        hw_prng=not interpret,
        ablation=ablation,
        interleave=interleave,
        enable_refraction=getattr(config, "enable_refraction", False),
        geom_kinds=geom_kinds,
        geo_static=scene_static[0],
        gmat_static=scene_static[1],
        mat_static=scene_static[2],
        early_exit=early_exit,
        hoist_primary=hoist_primary,
        nee=nee_static,
        dof=bool(getattr(config, "dof", False)),
        ld=(
            max(1, int(getattr(config, "ld_depths", 1)))
            if getattr(config, "sampler", "independent") == "sobol"
            else 0
        ),
        adaptive_grid=k_tiles,
        env_exact=env_exact,
    )

    env_planes = ()
    env_specs = []
    if env_exact is not None:
        eh, ew, ehp, ewp = env_exact
        et = jnp.transpose(scene.envmap.img * scene.envmap.strength,
                           (2, 1, 0))  # [3, W, H]
        et = jnp.pad(et, ((0, 0), (0, ewp - ew), (0, ehp - eh)))
        env_planes = (et[0], et[1], et[2])
        env_specs = [
            pl.BlockSpec(
                (ewp, ehp), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
        ] * 3

    block = pl.BlockSpec(
        (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_r, out_g, out_b = pl.pallas_call(
        kernel,
        grid=(k_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cam
            pl.BlockSpec(memory_space=pltpu.SMEM),  # geo
            pl.BlockSpec(memory_space=pltpu.SMEM),  # geo material ids
            pl.BlockSpec(memory_space=pltpu.SMEM),  # materials
            *env_specs,  # env radiance planes (env_mode='exact' only)
            block,  # px
            block,  # py
        ],
        out_specs=(block, block, block),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        ),
        interpret=interpret,
    )(scal, cam_vec, geo, geo_mat, mats, *env_planes, px, py)

    return jnp.stack(
        [out_r.reshape(-1), out_g.reshape(-1), out_b.reshape(-1)], axis=-1
    )


def _build_env_nee_rows(env, seed, iter_base, num_samples, trace_depth):
    """[S·D, 8] shared env-NEE rows for the in-kernel estimator: one alias
    draw per (iteration, depth) — (dir xyz, BILINEAR radiance rgb,
    solid-angle pdf, pad). Radiance is bilinear (not the sampler's
    nearest-texel) so both MIS techniques integrate the SAME L as the
    deferred miss gather (see ops/shade.py's env NEE block). Deterministic
    in (seed, absolute iteration, depth): chunked renders and resumes
    continue the stream exactly."""
    from .. import envmap as envmap_ops

    key = jax.random.PRNGKey(
        jnp.asarray(seed, jnp.int32).astype(jnp.uint32)
        ^ jnp.uint32(0xE17B0075)
    )
    iters = jnp.asarray(iter_base, jnp.int32) + jnp.arange(
        num_samples, dtype=jnp.int32
    )
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, iters)
    u = jax.vmap(
        lambda k: jax.random.uniform(k, (trace_depth, 2), jnp.float32)
    )(keys).reshape(num_samples * trace_depth, 2)
    d, _le_nearest, pdf = envmap_ops.sample_env(env, u[:, 0], u[:, 1])
    le = envmap_ops.env_radiance(env, d)
    return jnp.concatenate(
        [d, le, pdf[:, None], jnp.zeros_like(pdf)[:, None]], axis=-1
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "num_samples", "interpret", "num_pixels",
        "ablation", "interleave", "geom_kinds", "scene_static",
        "early_exit", "hoist_primary", "nee_static", "env_split",
        "env_exact", "env_nee",
    ),
)
def _render_samples_impl(
    scene: Scene,
    config,
    seed: jnp.ndarray,
    iter_base: jnp.ndarray,
    num_samples: int,
    interpret: bool = False,
    pixel_offset=0,
    num_pixels=None,
    ablation: str = "",
    interleave: int = 1,
    geom_kinds: tuple = (),
    scene_static: tuple = ((), (), ()),
    tile_base=None,
    early_exit: bool = False,
    hoist_primary: bool = False,
    nee_static=None,
    env_split=None,
    env_exact=None,
    env_nee: bool = False,
) -> jnp.ndarray:
    """Render `num_samples` samples in one kernel dispatch.

    Returns the [N, 3] radiance *sum* over the batch (caller adds to accum).
    `seed`/`iter_base` are traced int32 scalars, so advancing iterations never
    recompiles. `pixel_offset` (traced) + `num_pixels` (static) select a
    contiguous slice of the flat pixel array — the multi-chip dp tiling
    (parallel.shard.make_sharded_pallas_step)."""
    cam = scene.camera
    w, h = cam.resolution
    n = num_pixels if num_pixels is not None else w * h

    if getattr(config, "sampler", "independent") == "sobol" and (
        w * h >= 1 << 24
    ):
        # the in-kernel lattice rebuilds global pixel ids from the f32
        # px/py coordinates; exact only below 2^24
        raise ValueError("sampler='sobol' supports at most 2^24 pixels")

    n_pad = ((n + TILE - 1) // TILE) * TILE
    rows = n_pad // LANES

    if num_pixels is None:
        # full frame (pixel_offset is 0 on this path — only the dp-sharded
        # caller slices, and it always sets num_pixels): iota avoids integer
        # div/mod on device. NB: the old additional `isinstance(pixel_offset,
        # int)` test was always False under jit (non-static args are
        # tracers), which silently disabled this branch.
        col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        px = col.reshape(-1).astype(jnp.float32)
        py = row.reshape(-1).astype(jnp.float32)
        pad = n_pad - n
        if pad:
            px = jnp.concatenate([px, jnp.zeros((pad,), jnp.float32)])
            py = jnp.concatenate([py, jnp.zeros((pad,), jnp.float32)])
        tile_base_ = jnp.int32(0)
    else:
        off = jnp.asarray(pixel_offset, jnp.int32)
        idx = jnp.minimum(off + jnp.arange(n_pad, dtype=jnp.int32), w * h - 1)
        px = (idx % w).astype(jnp.float32)
        py = (idx // w).astype(jnp.float32)
        tile_base_ = off // jnp.int32(TILE)
    if tile_base is not None:
        # caller-supplied global tile id base (the dp-sharded path: offset
        # // TILE collides across shards whose slice is smaller than TILE,
        # which would hand different pixel regions identical RNG streams)
        tile_base_ = jnp.asarray(tile_base, jnp.int32)
    px = px.reshape(rows, LANES)
    py = py.reshape(rows, LANES)

    geo, geo_mat, mats = _pack_scene(scene)
    cam_vec = jnp.concatenate(
        [cam.position, cam.view, cam.right, cam.up, cam.pixel_length,
         cam.aperture[None], cam.focal[None]]  # 14,15: thin-lens (dof)
    )
    scal = jnp.stack(
        [
            jnp.asarray(seed, jnp.int32),
            jnp.asarray(iter_base, jnp.int32),
            tile_base_,
        ]
    )

    kernel = _make_kernel(
        num_cubes=scene.cubes.count,
        num_spheres=scene.spheres.count,
        num_materials=scene.materials.color.shape[0],
        trace_depth=config.trace_depth,
        num_samples=num_samples,
        rr_start_depth=config.rr_start_depth,
        legacy=config.gather_mode == "throughput",
        sky_strength=config.sky_strength,
        antialias=config.antialias,
        width=w,
        height=h,
        hw_prng=not interpret,  # pltpu.prng_* has no CPU interpret lowering
        ablation=ablation,
        interleave=interleave,
        enable_refraction=getattr(config, "enable_refraction", False),
        geom_kinds=geom_kinds,
        geo_static=scene_static[0],
        gmat_static=scene_static[1],
        mat_static=scene_static[2],
        early_exit=early_exit,
        hoist_primary=hoist_primary,
        nee=nee_static,
        dof=bool(getattr(config, "dof", False)),
        ld=(
            max(1, int(getattr(config, "ld_depths", 1)))
            if getattr(config, "sampler", "independent") == "sobol"
            else 0
        ),
        env_split=env_split,
        env_exact=env_exact,
        env_nee=env_nee,
    )

    env_planes = ()
    env_specs = []
    if env_exact is not None:
        # strength-folded, channel-planar, PRE-TRANSPOSED [Wp, Hp] inputs
        # (transposing outside keeps the in-kernel gather relayout-free)
        eh, ew, ehp, ewp = env_exact
        et = jnp.transpose(scene.envmap.img * scene.envmap.strength,
                           (2, 1, 0))  # [3, W, H]
        et = jnp.pad(et, ((0, 0), (0, ewp - ew), (0, ehp - eh)))
        env_planes = (et[0], et[1], et[2])
        plane_spec = pl.BlockSpec(
            (ewp, ehp), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        env_specs = [plane_spec] * 3
        if env_nee:
            # 4th plane: the sampler's solid-angle pdf (nearest gather for
            # the escape-side MIS weight) + the shared env-NEE row table
            ept = jnp.pad(
                jnp.transpose(scene.envmap.pdf, (1, 0)),
                ((0, ewp - ew), (0, ehp - eh)),
            )
            rows_tbl = _build_env_nee_rows(
                scene.envmap, seed, iter_base, num_samples,
                config.trace_depth,
            )
            env_planes = env_planes + (ept, rows_tbl)
            env_specs.append(plane_spec)
            env_specs.append(
                pl.BlockSpec(
                    rows_tbl.shape, lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                )
            )

    grid = n_pad // TILE
    block = pl.BlockSpec(
        (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_r, out_g, out_b = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cam
            pl.BlockSpec(memory_space=pltpu.SMEM),  # geo
            pl.BlockSpec(memory_space=pltpu.SMEM),  # geo material ids
            pl.BlockSpec(memory_space=pltpu.SMEM),  # materials
            *env_specs,  # env radiance planes (env_mode='exact' only)
            block,  # px
            block,  # py
        ],
        out_specs=(block, block, block),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        ),
        interpret=interpret,
    )(scal, cam_vec, geo, geo_mat, mats, *env_planes, px, py)

    rad = jnp.stack(
        [out_r.reshape(-1)[:n], out_g.reshape(-1)[:n], out_b.reshape(-1)[:n]],
        axis=-1,
    )
    if env_split is not None and env_split[2]:
        # exact-background composite (env_mode='split'): primary rays are
        # iteration-invariant here (no AA/DOF — bg_external gate), so the
        # camera-visible environment is one bilinear lookup per pixel per
        # DISPATCH, added in XLA at full fidelity. In-kernel depth-0
        # misses contributed nothing (see the SH sky block).
        from .. import camera as camera_ops
        from .. import envmap as envmap_ops
        from ..intersect import intersect_scene

        o3, d3 = camera_ops.generate_rays(
            cam, None,
            pixel_offset=pixel_offset if num_pixels is not None else 0,
            num_pixels=n,
        )
        miss0 = intersect_scene(scene, o3, d3).miss
        bg = envmap_ops.env_radiance(scene.envmap, d3)
        rad = rad + jnp.float32(num_samples) * bg * miss0[:, None]
    return rad
