"""The jitted render core and the host-side Renderer driver.

TPU-native redesign of the reference's per-iteration orchestration
(`pathtrace` in `src/pathtrace.cu:529-653`): where the reference launches
~18 synchronizing kernels per sample (raygen, 8× [memset → intersect →
shade], gather, tonemap, D2H copy), here an entire *batch* of samples is one
XLA computation — raygen, a `lax.scan` over bounce depth, and the
accumulation all fuse with zero host round-trips. Host transfer happens only
when the caller asks for pixels or metrics.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.structs import Scene, SceneDesc
from ..scene.parser import load_scene_desc
from ..ops import camera as camera_ops
from ..ops import rng as rng_ops
from ..ops import tonemap
from ..ops.intersect import intersect_scene
from ..ops.shade import init_paths, shade_step
from .state import RenderState
from .metrics import MetricsTracker


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render configuration (compile-time constants).

    The reference's equivalents live in the scene file's CAMERA block and
    compile-time defines (`scene.cpp:99-115`, `pathtrace.cu:137-138`)."""

    trace_depth: int = 8
    antialias: bool = False  # reference has no sub-pixel jitter
    rr_start_depth: int = 3  # Russian roulette opens after this depth
    samples_per_launch: int = 10  # samples fused into one jitted call
    intersector: str = "auto"  # 'bruteforce' | 'bvh' | 'auto'
    bvh_leaf_size: int = 4
    # Estimator (see ops.shade.shade_step): 'light_only' matches the correct
    # upstream golden render; 'throughput' replicates the reference code's
    # finalGather-of-throughputs.
    gather_mode: str = "light_only"
    sky_strength: float = 0.0  # environment strength in light_only mode
    # Extension: dielectric refraction via REFRIOR (the reference parses it
    # but never refracts). Supported by every pipeline (reference, fast,
    # megakernel); statically gated, so disabling it costs nothing.
    enable_refraction: bool = False
    # Mesh pipeline: re-sort the wavefront by (origin cell, direction octant)
    # each bounce so tile-level cluster culling survives incoherent bounces.
    mesh_ray_sort: bool = True
    # Sort every Nth bounce (1 = every bounce). With the fused sort the
    # resort is cheap enough that full per-bounce culling coherence wins:
    # 1080p/38.5k-tri TPU sweep (2026-08-17) 434 ms/sample fused+every=1 vs
    # 529 fused+every=2 (and 787/733 for the old argsort+gather at
    # every=1/2). Cadence never changes the image (pixel-keyed RNG + strict
    # nearest-t winner).
    mesh_sort_every: int = 1
    # Fused lax.sort carrying all wavefront payloads instead of argsort +
    # row gather (identical permutation, stable sort). TPU A/B 2026-08-17:
    # 4.78 M rays/s vs 2.64 with the separate gather (+81%) — the [N,14]
    # row gather, not the sort network, was the bottleneck. Default on.
    mesh_sort_fused: bool = True
    # Origin-grid resolution of the sort key (cells³ × 8 octants buckets).
    # Finer grids give tiles tighter frusta for cluster culling at the
    # cost of sort depth. TPU A/B on the fused path, mesh1080p (38.5k
    # tris, 2026-08-17): cells=2 4.90, cells=4 4.78, cells=8 4.29 M
    # rays/s — direction octant dominates the culling win, so the
    # coarsest origin grid (64 buckets) pays the least sort depth.
    # Default 2. (cells=4's 512 buckets = 10-bit keys still enable the
    # packed single-array sort on the non-fused path.)
    mesh_sort_cells: int = 2
    # Extension: next-event estimation (direct light sampling) — the working
    # version of the reference's dead dev_lightPositions machinery
    # (`pathtrace.cu:454-456,491-504`; see ops/lights.py). Changes the
    # estimator (variance, not its mean), so it's off by default and
    # supported on the 'reference' pipeline in light_only mode only.
    nee: bool = False
    # Extension: sample generator. 'independent' = the default pseudo-random
    # streams (threefry for the lane pipelines, counter-hash for the
    # pixel-keyed ones); 'sobol' = per-pixel digitally-shifted Sobol
    # (0,2)-sequences on the variance-critical first-vertex dimensions
    # (sub-pixel AA, lens disk, first-bounce BSDF branch+direction,
    # first-bounce NEE — see ops/rng.py's LD block). Same estimator mean
    # (every marginal stays uniform), lower variance at equal spp. The
    # reference has no counterpart (independent thrust engines per
    # (iter, pixel), `src/pathtrace.cu:203-207`).
    sampler: str = "independent"
    # With sampler='sobol': how many leading bounce depths draw their
    # branch/direction (and NEE) lanes from the LD lattice. Each depth owns
    # fresh digital-shift lattices over the same (0,2) pair (padded Sobol),
    # so the second path vertex stays stratified too — RR only decorrelates
    # path lengths after rr_start_depth. Depths past this use the
    # counter-hash streams. ld_depths=1 reproduces the original
    # first-vertex-only sampler bit-exactly.
    ld_depths: int = 2
    # Megakernel: skip a bounce's whole vector body when every lane in a
    # tile has terminated. Scene-dependent (TPU A/B, 2026-08-17): +69% on
    # the open sphere scene (tiles die as rays escape), -11% on the closed
    # Cornell box (a tile almost never fully dies, so the per-bounce
    # reduce+cond is pure cost) — hence per-render opt-in, not a default.
    # Exact for light_only: bounces reseed per (seed, iter, depth, tile).
    # Ignored in throughput mode (the reference sky-multiply quirk keeps
    # touching dead lanes).
    early_exit: bool = False
    # Extension: thin-lens depth of field (ops.camera.thin_lens) — the
    # reference camera is strictly pinhole. None = auto (on iff the scene
    # camera's APERTURE > 0); the Renderer resolves this to a concrete
    # bool at init so the flag stays a static compile gate. aperture /
    # focal themselves live on the Camera pytree (dynamic — refocusing
    # never recompiles; FOCAL ≤ 0 auto-focuses on LOOKAT).
    dof: Optional[bool] = None
    # Environment-map evaluation mode (scenes with an ENVIRONMENT block):
    # 'exact' = bilinear HDR lookups + alias-table importance sampling —
    # IN-KERNEL on the TPU megakernel for maps up to
    # megakernel.MAX_ENV_EXACT_TEXELS (one-hot MXU gathers; with nee,
    # shared per-(iteration, depth) alias draws), the XLA fast pipeline
    # past the cap (unbiased either way); 'split' =
    # the megakernel's sun/sky decomposition (ops/envmap.py split_envmap):
    # top-K bright texels become delta directional lights (deterministic
    # shadow rays), the residual sky an SH-9 fit for indirect bounces, and
    # the camera-visible background composites from the exact map outside
    # the kernel. 'split' is an approximation (delta suns = hard shadows,
    # SH sky in secondary reflections) that runs at megakernel speed.
    env_mode: str = "exact"
    # env_mode='split' decomposition knobs: texels holding ≥ env_split_thresh
    # × the mean luminance become delta sun lights, keeping at most
    # env_split_suns of them (by energy). If more candidates exist than
    # env_split_suns, the leftovers stay in the SH-9 residual — which a
    # clamped 9-coefficient fit represents poorly — so split_envmap warns
    # when that happens (raise env_split_suns or use env_mode='exact').
    env_split_suns: int = 8
    env_split_thresh: float = 32.0
    # Pipeline: 'pallas' = single-dispatch TPU megakernel (ops.pallas),
    # 'fast' = SoA unrolled XLA hot path (ops.fast), 'reference' = readable
    # [N,3] path (ops.intersect/shade). 'auto' picks the fastest the scene
    # and backend support.
    pipeline: str = "auto"

    def resolve_pipeline(self, scene: Scene) -> str:
        if self.sampler not in ("independent", "sobol"):
            raise ValueError(f"unknown sampler {self.sampler!r}")
        if self.env_mode not in ("exact", "split"):
            raise ValueError(f"unknown env_mode {self.env_mode!r}")
        if self.pipeline != "auto":
            return self.pipeline
        from ..ops import fast as fast_mod

        try:
            on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
        except Exception:
            on_tpu = False

        # envmap scenes on the megakernel: sun/sky split always; exact mode
        # in-kernel (one-hot MXU bilinear gather) when the map fits the
        # VMEM/matmul budget. With nee, the environment is importance-
        # sampled in-kernel too (shared per-(iteration, depth) alias draws
        # + MIS) — unless the scene ALSO has analytic emissive lights,
        # whose combined two-technique NEE stays on the XLA fast pipeline.
        env_ok_exact = False
        if (
            scene.envmap is not None
            and self.env_mode == "exact"
            and self.gather_mode == "light_only"
        ):
            from ..ops.pallas import megakernel as mk_mod

            h, w = scene.envmap.shape
            env_ok_exact = h * w <= mk_mod.MAX_ENV_EXACT_TEXELS
            if self.nee and env_ok_exact:
                # only env-only scenes get in-kernel env NEE; reading the
                # light table touches concrete emittance values, which a
                # TRACED scene (resolve_pipeline is also reached from
                # inside jitted chunks via trace_sample) cannot provide —
                # fall back to the conservative fast routing there
                try:
                    env_ok_exact = (
                        mk_mod._static_light_table(scene) is None
                    )
                except Exception:
                    env_ok_exact = False
        env_free = (
            scene.envmap is None or self.env_mode == "split" or env_ok_exact
        )

        if self.nee:
            # direct light sampling: in-kernel on the TPU megakernel
            # (static light tables + shadow-ray pass), the SoA fast path
            # elsewhere, the mesh pipeline for triangle scenes (cluster-
            # kernel shadow rays), the readable wavefront as fallback; all
            # need light_only gathering (legacy mode raises downstream)
            if self.gather_mode == "light_only" and fast_mod.supports(scene):
                return "pallas" if (on_tpu and env_free) else "fast"
            if (
                self.gather_mode == "light_only"
                and on_tpu
                and fast_mod.supports_mesh(scene)
            ):
                return "fast_mesh"
            return "reference"

        if self.intersector in ("auto", "bruteforce") and fast_mod.supports(scene):
            return "pallas" if (on_tpu and env_free) else "fast"
        if on_tpu and fast_mod.supports_mesh(scene):
            return "fast_mesh"
        return "reference"

    def resolve_intersector(self, scene: Scene) -> str:
        if self.intersector != "auto":
            return self.intersector
        # Dense vectorized all-primitive testing beats tree traversal on a
        # vector machine until the primitive count is substantial.
        return "bruteforce" if scene.num_primitives <= 64 else "bvh"


def make_intersector(scene: Scene, config: RenderConfig) -> Callable:
    kind = config.resolve_intersector(scene)
    if kind == "bruteforce":
        return intersect_scene
    elif kind == "bvh":
        from ..ops import bvh as bvh_mod

        return bvh_mod.make_bvh_intersector(scene, leaf_size=config.bvh_leaf_size)
    raise ValueError(f"unknown intersector {kind!r}")


def trace_sample(
    scene: Scene,
    config: RenderConfig,
    base_key: jnp.ndarray,
    iteration: jnp.ndarray,
    intersector: Optional[Callable] = None,
    pixel_offset=0,
    num_pixels: Optional[int] = None,
    light_sampler=None,
) -> jnp.ndarray:
    """Trace one sample per pixel; returns the [N, 3] color contribution.

    One full wavefront pipeline: raygen → scan over bounce depth
    {intersect, shade} → path colors (finalGather's unconditional
    ``image[pixel] += color``, `pathtrace.cu:439-444`, happens in the
    caller's accumulate). `pixel_offset`/`num_pixels` select a contiguous
    tile of the flat pixel array (used by the sharded multi-chip path)."""
    if config.nee and config.resolve_pipeline(scene) not in (
        "reference", "fast", "pallas",
    ):
        raise ValueError(
            "nee at per-sample granularity needs the 'reference' or 'fast' "
            f"pipeline (resolved {config.resolve_pipeline(scene)!r}); "
            "the chunk-level megakernel supports it via pipeline='pallas' "
            "(make_pallas_step)"
        )
    # 'pallas' is chunk-level (see make_pallas_step); at per-sample
    # granularity its XLA twin is the SoA fast path.
    if intersector is None and config.resolve_pipeline(scene) in ("fast", "pallas"):
        from ..ops import fast as fast_mod

        return fast_mod.trace_sample_fast(
            scene, config, base_key, iteration, pixel_offset, num_pixels,
            light_sampler=light_sampler,
        )

    cam = scene.camera
    n = num_pixels if num_pixels is not None else cam.pixel_count
    isect = intersector if intersector is not None else intersect_scene

    env = scene.envmap
    use_area_nee = config.nee and light_sampler is not None
    use_env_nee = config.nee and env is not None
    use_nee = use_area_nee or use_env_nee
    if config.nee and not use_nee:
        raise ValueError(
            "config.nee=True needs a light_sampler "
            "(ops.lights.make_light_sampler on the concrete scene; the "
            "Renderer builds one automatically) or an ENVIRONMENT map"
        )

    # sampler='sobol': the first-vertex dimensions draw per-pixel shifted
    # (0,2)-sequence points (pixel-keyed by GLOBAL id, so shard slices see
    # the full-frame stream); deeper bounces keep the threefry streams.
    use_ld = config.sampler == "sobol"
    pix = pixel_offset + jnp.arange(n, dtype=jnp.int32)
    jitter = lens = None
    if config.antialias:
        jitter = (
            rng_ops.ld_pixel_jitter(base_key, iteration, pix)
            if use_ld
            else rng_ops.pixel_jitter(base_key, iteration, n)
        )
    if config.dof:
        lens = (
            rng_ops.ld_lens_uniforms(base_key, iteration, pix)
            if use_ld
            else rng_ops.lens_uniforms(base_key, iteration, n)
        )
    origins, directions = camera_ops.generate_rays(
        cam, jitter, pixel_offset=pixel_offset, num_pixels=n, lens=lens
    )
    paths = init_paths(origins, directions, config.trace_depth)

    def bounce(carry, depth, u=None, nee_u=None):
        paths, radiance, prev_pdf = carry
        uniforms = (
            u
            if u is not None
            else rng_ops.bounce_uniforms(base_key, iteration, depth, n)
        )
        hit = isect(scene, paths.origin, paths.direction)
        if use_nee:
            nee = env_nee = None
            if use_area_nee:
                from ..ops.lights import NEEInputs

                nee = NEEInputs(
                    sampler=light_sampler,
                    shadow_isect=lambda o, d: isect(scene, o, d),
                    uniforms=(
                        nee_u
                        if nee_u is not None
                        else rng_ops.nee_uniforms(base_key, iteration, depth, n)
                    ),
                )
            if use_env_nee:
                from ..ops.envmap import EnvNEEInputs

                env_nee = EnvNEEInputs(
                    env=env,
                    shadow_isect=lambda o, d: isect(scene, o, d),
                    uniforms=rng_ops.env_uniforms(base_key, iteration, depth, n),
                )
            paths, contrib, prev_pdf = shade_step(
                paths,
                hit,
                scene.materials,
                uniforms,
                depth,
                config.rr_start_depth,
                gather_mode=config.gather_mode,
                sky_strength=config.sky_strength,
                enable_refraction=config.enable_refraction,
                nee=nee,
                prev_pdf=prev_pdf,
                env=env,
                env_nee=env_nee,
            )
        else:
            paths, contrib = shade_step(
                paths,
                hit,
                scene.materials,
                uniforms,
                depth,
                config.rr_start_depth,
                gather_mode=config.gather_mode,
                sky_strength=config.sky_strength,
                enable_refraction=config.enable_refraction,
                env=env,
            )
        return (paths, radiance + contrib, prev_pdf), None

    radiance0 = jnp.zeros((n, 3), jnp.float32)
    # primary rays carry the delta marker: the camera "technique" has no
    # NEE competitor, so direct light-hits keep full weight
    pdf0 = jnp.full((n,), -1.0, jnp.float32)
    carry0 = (paths, radiance0, pdf0)
    start = 0
    if use_ld:
        # LD bounces unrolled out of the scan: their uniforms come from the
        # per-depth LD lattices (static branch — depth is traced inside the
        # scan, so LD depths can't live there)
        for d in range(min(config.ld_depths, config.trace_depth)):
            carry0, _ = bounce(
                carry0,
                jnp.int32(d),
                u=rng_ops.ld_bounce_uniforms(base_key, iteration, pix, d).T,
                nee_u=(
                    rng_ops.ld_nee_bounce_uniforms(base_key, iteration, pix, d)
                    if use_nee
                    else None
                ),
            )
            start = d + 1
    (paths, radiance, _), _ = jax.lax.scan(
        bounce,
        carry0,
        jnp.arange(start, config.trace_depth, dtype=jnp.int32),
    )
    if config.gather_mode == "throughput":
        # finalGather parity: every path adds its terminal throughput product.
        return paths.color
    return radiance


def render_chunk(
    scene: Scene,
    state: RenderState,
    config: RenderConfig,
    num_samples: int,
    intersector: Optional[Callable] = None,
    light_sampler=None,
) -> RenderState:
    """Accumulate `num_samples` full-frame samples into the state (one jitted
    call; `num_samples` is static)."""

    def body(accum, i):
        iteration = state.iteration + 1 + i  # 1-based like the reference
        color = trace_sample(
            scene, config, state.key, iteration, intersector,
            light_sampler=light_sampler,
        )
        return accum + color, None

    accum, _ = jax.lax.scan(
        body, state.accum, jnp.arange(num_samples, dtype=jnp.int32)
    )
    return state.replace(
        accum=accum, iteration=state.iteration + jnp.int32(num_samples)
    )


# Samples per megakernel dispatch (the in-kernel sample loop amortizes
# raygen/output traffic; ~50 is ~10% faster than 10 and compiles in ~30 s).
PALLAS_CHUNK = 50


def make_pallas_step(interpret: bool = False, scene: Scene = None,
                     config: "RenderConfig" = None):
    """Step function driving the single-dispatch TPU megakernel.

    When `scene` is given, the jit-static geometry specialization and
    immediate scene tables are derived ONCE here — deriving them per chunk
    costs a device fetch of the packed tables every call (a network
    round-trip on a remote TPU). Geometry/materials are fixed after load
    (set_camera replaces only the camera), so the closure stays valid.
    `config` (optional) lets the nee light table be derived once too."""
    from ..ops.pallas import megakernel

    geom_kinds = scene_static = nee_static = env_split = None
    if scene is not None:
        geom_kinds = megakernel._static_geom_kinds(scene)
        scene_static = megakernel._static_scene_tables(scene)
        if (
            scene.envmap is not None
            and config is not None
            and config.env_mode == "split"
        ):
            env_split = megakernel._static_env_split(scene, config)
        # env_mode='exact' needs no pre-derivation: the in-kernel gather's
        # static dims are shape-only (megakernel._static_env_exact) and the
        # wrapper derives them per call — including the env_nee flag when
        # config.nee; invalid combos (analytic+env combined NEE, oversize
        # maps) raise inside render_samples with actionable messages
        if config is not None and config.nee:
            nee_static = megakernel._static_light_table(scene)
            if nee_static is None and scene.envmap is None:
                raise ValueError(
                    "nee: scene has no analytic (cube/sphere) emissive "
                    "lights"
                )

    def step(scene, state: RenderState, config: RenderConfig, num_samples: int):
        accum = state.accum
        # a stable int32 seed derived from the threefry key
        seed = (state.key.reshape(-1)[-1].astype(jnp.uint32)).astype(jnp.int32)
        done = 0
        while done < num_samples:
            k = min(PALLAS_CHUNK, num_samples - done)
            accum = accum + megakernel.render_samples(
                scene,
                config,
                seed,
                state.iteration + jnp.int32(1 + done),
                k,
                interpret=interpret,
                geom_kinds=geom_kinds,
                scene_static=scene_static,
                nee_static=nee_static,
                env_split=env_split,
            )
            done += k
        return state.replace(
            accum=accum, iteration=state.iteration + jnp.int32(num_samples)
        )

    return step


def make_mesh_intersector(scene: Scene, interpret: bool = False):
    """Cluster-culled triangle intersector over a BVH treelet partition:
    triangles permuted into leaf order, clusters/superclusters cut as
    subtrees (tight AABBs at both levels — see mesh_kernel.treelet_cut)."""
    import numpy as np

    from ..ops import bvh as bvh_mod
    from ..ops.pallas.mesh_kernel import ClusterMeshIntersector

    v0 = np.asarray(scene.triangles.v0)
    e1 = np.asarray(scene.triangles.e1)
    e2 = np.asarray(scene.triangles.e2)
    mat = np.asarray(scene.triangles.material_id)
    tmin = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    tmax = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    bvh = bvh_mod.try_native_build(tmin, tmax, 8) or bvh_mod.build_bvh(
        tmin, tmax, leaf_size=8
    )
    order = bvh.order
    return ClusterMeshIntersector(
        v0[order], e1[order], e2[order], mat[order], interpret=interpret,
        bvh=bvh,
    )


def make_mesh_step(scene: Scene, interpret: bool = False,
                   light_sampler=None):
    """Step function for the SoA mesh pipeline (ops.fast.trace_sample_mesh).

    Dispatches ONE sample per device call: a large-mesh sample at high
    resolution can run for seconds, and batching several into a single XLA
    computation trips the TPU watchdog (observed as a worker crash).
    `light_sampler` (ops.lights.make_light_sampler on the concrete scene)
    enables NEE when the config asks for it."""
    from ..ops import fast as fast_mod

    from ..ops.pallas.mesh_kernel import JIT_COMPILER_OPTIONS

    cluster = make_mesh_intersector(scene, interpret=interpret)

    @partial(jax.jit, static_argnames=("config",),
             compiler_options=None if interpret else JIT_COMPILER_OPTIONS)
    def one(scene, accum, key, iteration, config):
        return accum + fast_mod.trace_sample_mesh(
            scene, config, key, iteration, cluster,
            light_sampler=light_sampler,
        )

    def step(scene, state, config, num_samples):
        accum = state.accum
        for i in range(num_samples):
            accum = one(scene, accum, state.key, state.iteration + 1 + i, config)
        return state.replace(
            accum=accum, iteration=state.iteration + jnp.int32(num_samples)
        )

    return step


class Renderer:
    """Host-side driver: owns the device scene, render state, and metrics.

    Replaces the reference's `pathtraceInit`/`pathtrace`/`pathtraceFree`
    lifecycle (`pathtrace.cu:462-527`) — in JAX, device buffers are garbage
    collected, so there is no explicit free; a camera change is just a state
    reset plus a scene-pytree update (no re-jit: camera vectors are dynamic
    leaves)."""

    def __init__(
        self,
        scene,
        config: Optional[RenderConfig] = None,
        seed: int = 0,
    ):
        if isinstance(scene, str):
            self.desc: Optional[SceneDesc] = load_scene_desc(scene)
            self.scene = Scene.from_desc(self.desc)
            if config is None:
                config = RenderConfig(trace_depth=self.desc.trace_depth)
            self.target_iterations = self.desc.iterations
            self.image_name = self.desc.image_name
        elif isinstance(scene, SceneDesc):
            self.desc = scene
            self.scene = Scene.from_desc(scene)
            if config is None:
                config = RenderConfig(trace_depth=scene.trace_depth)
            self.target_iterations = scene.iterations
            self.image_name = scene.image_name
        else:
            self.desc = None
            self.scene = scene
            if config is None:
                config = RenderConfig()
            self.target_iterations = 0
            self.image_name = "render"

        if config.dof is None:
            # resolve the auto gate to a concrete static bool: DOF compiles
            # in exactly when the scene camera has a nonzero aperture
            config = dataclasses.replace(
                config, dof=bool(float(self.scene.camera.aperture) > 0.0)
            )
        self.config = config
        self.state = RenderState.create(self.scene.camera.pixel_count, seed)
        self.metrics = MetricsTracker(self.scene.camera.pixel_count)
        self._host_iteration = 0  # mirrors state.iteration without a D2H fetch
        # opt-in reference-parity PSNR snapshot (see step()): split the chunk
        # crossing iteration 10 so the self-PSNR baseline is a true 10-spp
        # frame regardless of samples_per_launch
        self.psnr_snapshot = False
        pipeline = config.resolve_pipeline(self.scene)
        # the fast/pallas pipelines carry their own fused intersector
        if pipeline in ("fast", "pallas", "fast_mesh"):
            self._intersector = None
        else:
            self._intersector = make_intersector(self.scene, config)

        if pipeline == "pallas":
            self._step = make_pallas_step(scene=self.scene, config=config)
        elif pipeline == "fast_mesh":
            mesh_sampler = None
            if config.nee:
                from ..ops.lights import make_light_sampler

                mesh_sampler = make_light_sampler(self.scene)
                if mesh_sampler is None:
                    # emissive triangles stay BRDF-sampled; NEE needs at
                    # least one analytic (cube/sphere) emitter to aim at
                    raise ValueError(
                        "config.nee=True but the scene has no emissive "
                        "analytic (cube/sphere) lights to sample"
                    )
            self._step = make_mesh_step(self.scene,
                                        light_sampler=mesh_sampler)
        else:
            # A distinct closure per Renderer: sharing a HashablePartial
            # across jit wrappers aliases their executable caches in jax 0.9
            # (observed as "supplied N buffers but compiled program expected
            # M").
            isect = self._intersector

            sampler = None
            if config.nee:
                from ..ops.lights import make_light_sampler

                sampler = make_light_sampler(self.scene)
                if sampler is None and self.scene.envmap is None:
                    raise ValueError(
                        "config.nee=True but the scene has no emissive "
                        "analytic (cube/sphere) lights and no ENVIRONMENT "
                        "map to sample"
                    )

            def _chunk(scene, state, config, num_samples):
                return render_chunk(
                    scene, state, config, num_samples, isect,
                    light_sampler=sampler,
                )

            self._step = jax.jit(
                _chunk, static_argnames=("config", "num_samples")
            )

    @property
    def iteration(self) -> int:
        return self._host_iteration

    def reset(self) -> "Renderer":
        """Clear accumulation AND the host-side iteration mirror + metrics
        (resetting only device state desynchronizes rays/s and PSNR
        normalization — every sample-count consumer reads _host_iteration)."""
        self.state = self.state.reset()
        self._host_iteration = 0
        self.metrics = MetricsTracker(self.scene.camera.pixel_count)
        return self

    def step(self, num_samples: Optional[int] = None, sync: bool = True) -> int:
        """Run a batch of samples; returns the new iteration count.

        With sync=False the work is left queued on the device (used by
        render() to avoid a host round-trip per batch)."""
        if num_samples is None:
            num_samples = self.config.samples_per_launch
        t0 = time.perf_counter()
        total = num_samples
        # psnr_snapshot: materialize a true iteration-10 frame for the
        # reference-parity PSNR harness by splitting the chunk that crosses
        # SNAPSHOT_ITER (`pathtrace.cu:184-191` snapshots at exactly 10).
        # Opt-in: the split changes float accumulation order (no longer
        # bit-identical to the unsplit chunk) and compiles one extra chunk
        # shape, so it stays off for benchmarks.
        from .metrics import SNAPSHOT_ITER

        if (
            self.psnr_snapshot
            and self.metrics.snapshot is None
            and self._host_iteration < SNAPSHOT_ITER
            and self._host_iteration + num_samples >= SNAPSHOT_ITER
        ):
            head = SNAPSHOT_ITER - self._host_iteration
            self.state = self._step(self.scene, self.state, self.config, head)
            self._host_iteration += head
            num_samples -= head
            self.metrics.capture_snapshot(
                self.state.accum, self._host_iteration
            )
        if num_samples:
            self.state = self._step(
                self.scene, self.state, self.config, num_samples
            )
            self._host_iteration += num_samples
        if sync:
            self.sync()
        self.metrics.record(total, time.perf_counter() - t0)
        return self.iteration

    def sync(self) -> None:
        """True device sync: fetch a value data-dependent on the accumulator.
        On the tunneled axon backend, block_until_ready can return before
        queued kernels finish; a scalar fetch cannot."""
        np.asarray(self.state.accum[0, 0])

    def render(self, iterations: Optional[int] = None, progress: bool = False):
        """Render to `iterations` total samples (scene-file ITERATIONS by
        default), batching samples_per_launch per device call."""
        target = iterations if iterations is not None else self.target_iterations
        while self.iteration < target:
            n = min(self.config.samples_per_launch, target - self.iteration)
            last = self.iteration + n >= target
            self.step(n, sync=last or progress)
            if progress:
                m = self.metrics
                print(
                    f"iter {self.iteration}/{target}  "
                    f"{m.samples_per_second / 1e6:.1f} M rays/s  "
                    f"avg {m.avg_iteration_ms:.2f} ms/iter"
                )
        return self

    # ── outputs ──

    def linear_image(self) -> np.ndarray:
        """[H, W, 3] float32 linear mean radiance."""
        w, h = self.scene.camera.resolution
        img = tonemap.mean_image(self.state.accum, self.state.iteration)
        return np.asarray(img).reshape(h, w, 3)

    def display_image(self) -> np.ndarray:
        """[H, W, 3] uint8 gamma-2.2 preview frame (PBO path parity)."""
        w, h = self.scene.camera.resolution
        img = tonemap.display_image(self.state.accum, self.state.iteration)
        return np.asarray(img).reshape(h, w, 3)

    def denoised_image(self, **filter_kwargs) -> np.ndarray:
        """[H, W, 3] float32 linear radiance after the feature-guided
        À-Trous denoiser (render.denoise — extension, no reference
        counterpart). Keyword args pass through to `atrous_denoise`."""
        from .denoise import denoise_image

        return denoise_image(self, **filter_kwargs)

    def save_png(
        self, path: Optional[str] = None, denoise: bool = False
    ) -> str:
        """Write the PNG exactly as the reference's saveImage: linear clamp,
        no gamma, horizontal mirror, ``<name>.<timestamp>.<N>samp.png``.
        With ``denoise=True`` the accumulator mean is passed through the
        À-Trous denoiser first (same save transform after)."""
        from ..io.png import write_png
        from ..utils.timing import current_time_string

        w, h = self.scene.camera.resolution
        if denoise:
            lin = self.denoised_image()
            img = (np.clip(lin, 0.0, 1.0) * 255.0)[:, ::-1, :].astype(
                np.uint8
            )
        else:
            img = np.asarray(
                tonemap.save_image(
                    self.state.accum, self.state.iteration, w, h
                )
            )
        if path is None:
            path = f"{self.image_name}.{current_time_string()}.{self.iteration}samp.png"
        write_png(path, img)
        return path

    # ── checkpoint / resume (no reference counterpart; the accumulator +
    # iteration + key is the complete render state) ──

    def save_checkpoint(self, path: str) -> str:
        from .checkpoint import save_checkpoint

        meta = {
            "image_name": self.image_name,
            "resolution": list(self.scene.camera.resolution),
            "target_iterations": self.target_iterations,
        }
        return save_checkpoint(path, self.state, meta)

    def load_checkpoint(self, path: str) -> "Renderer":
        from .checkpoint import load_checkpoint

        state, meta = load_checkpoint(path)
        if state.accum.shape != self.state.accum.shape:
            raise ValueError(
                f"checkpoint resolution {state.accum.shape} does not match "
                f"renderer {self.state.accum.shape}"
            )
        self.state = state
        self._host_iteration = int(state.iteration)
        return self

    # ── camera interaction (accumulation reset, `main.cpp:110-136`) ──

    def set_camera(self, camera) -> None:
        self.scene = self.scene.replace(camera=camera)
        self.state = self.state.reset()
        self._host_iteration = 0
        self.metrics = MetricsTracker(self.scene.camera.pixel_count)
