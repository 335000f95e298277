"""Multi-chip render step: shard_map over the ('sp', 'dp') mesh.

Each dp rank traces a contiguous tile of the flat pixel array; each sp rank
traces a disjoint subset of the sample iterations for those pixels, and the
per-chunk partial accumulators are combined with one ``psum`` over the
sample axis (the only collective — paths are independent, so there is no
halo traffic). Scene pytrees are replicated (they are KBs); the accumulator
lives sharded over dp for its whole life, so no full-frame gather happens
until the host asks for pixels.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.engine import RenderConfig, trace_sample
from ..render.state import RenderState
from ..scene.structs import Scene
from .mesh import PIXEL_AXIS, SAMPLE_AXIS


def _resolve_dof(scene: Scene, config: RenderConfig) -> RenderConfig:
    """Resolve config.dof=None (auto) to a concrete static bool while the
    scene is concrete — the same rule Renderer.__init__ applies (on iff the
    camera's aperture > 0). Inside shard_map the camera is a tracer, so
    the gate must be fixed here."""
    if getattr(config, "dof", None) is None:
        import dataclasses

        config = dataclasses.replace(
            config, dof=bool(float(scene.camera.aperture) > 0.0)
        )
    return config


def _shard_extents(scene: Scene, num_samples: int, mesh: Mesh):
    """(local_pixels, local_samples) after validating divisibility."""
    n_total = scene.camera.pixel_count
    n_dp = mesh.shape[PIXEL_AXIS]
    n_sp = mesh.shape[SAMPLE_AXIS]
    if n_total % n_dp != 0:
        raise ValueError(f"pixel count {n_total} not divisible by dp={n_dp}")
    if num_samples % n_sp != 0:
        raise ValueError(f"num_samples {num_samples} not divisible by sp={n_sp}")
    return n_total // n_dp, num_samples // n_sp


def _run_sharded(body, scene: Scene, state: RenderState, mesh: Mesh,
                 num_samples: int) -> RenderState:
    """Common shard_map wiring: `body(scene, accum_local, iteration, key)`
    returns the rank's updated local accumulator. Inputs are placed on the
    mesh (scene/state may arrive committed to a single device): scene
    replicated, accumulator sharded over dp."""
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(PIXEL_AXIS, None), P(), P()),
        out_specs=P(PIXEL_AXIS, None),
        # The bounce-scan carry starts replicated (raygen) and becomes
        # device-varying once per-tile RNG enters; skip the VMA check rather
        # than pvary-annotating every carry leaf.
        check_vma=False,
    )
    scene = jax.device_put(scene, NamedSharding(mesh, P()))
    accum_in = jax.device_put(state.accum, NamedSharding(mesh, P(PIXEL_AXIS, None)))
    iteration = jax.device_put(state.iteration, NamedSharding(mesh, P()))
    key = jax.device_put(state.key, NamedSharding(mesh, P()))
    accum = sharded(scene, accum_in, iteration, key)
    return state.replace(
        accum=accum, iteration=state.iteration + jnp.int32(num_samples)
    )


def render_chunk_sharded(
    scene: Scene,
    state: RenderState,
    config: RenderConfig,
    num_samples: int,
    mesh: Mesh,
    intersector: Optional[Callable] = None,
    light_sampler=None,
) -> RenderState:
    """Accumulate `num_samples` samples, sharded over the mesh. Both
    `num_samples` and the mesh are static; `num_samples` must divide by the
    sp extent and the pixel count by the dp extent."""
    local_pixels, local_samples = _shard_extents(scene, num_samples, mesh)

    def body(scene, accum_local, iteration, key):
        dp = jax.lax.axis_index(PIXEL_AXIS)
        sp = jax.lax.axis_index(SAMPLE_AXIS)
        offset = dp * local_pixels
        tile_key = jax.random.fold_in(key, dp)

        def one(acc, i):
            it = iteration + 1 + sp * jnp.int32(local_samples) + i
            color = trace_sample(
                scene,
                config,
                tile_key,
                it,
                intersector,
                pixel_offset=offset,
                num_pixels=local_pixels,
                light_sampler=light_sampler,
            )
            return acc + color, None

        partial_accum, _ = jax.lax.scan(
            one,
            jnp.zeros((local_pixels, 3), jnp.float32),
            jnp.arange(local_samples, dtype=jnp.int32),
        )
        partial_accum = jax.lax.psum(partial_accum, SAMPLE_AXIS)
        return accum_local + partial_accum

    return _run_sharded(body, scene, state, mesh, num_samples)


def render_chunk_sharded_pallas(
    scene: Scene,
    state: RenderState,
    config: RenderConfig,
    num_samples: int,
    mesh: Mesh,
    interpret: bool = False,
    geom_kinds=None,
    scene_static=None,
    nee_static=None,
    env_split=None,
    env_nee=None,
) -> RenderState:
    """Multi-chip megakernel step: each dp rank runs the single-dispatch
    Pallas megakernel (ops.pallas.megakernel) on its contiguous pixel slice;
    sp ranks split the sample batch and combine with one psum. When the
    per-rank pixel count is TILE-aligned, the result is bit-identical to the
    single-device megakernel (tile-base RNG alignment, see render_samples).
    ENVIRONMENT scenes ride through env_mode='split' — the static sun/SH
    tables come from the closure (make_sharded_pallas_step) and the exact
    background composites per pixel slice (pixel_offset-aware)."""
    from ..ops.pallas import megakernel

    local_pixels, local_samples = _shard_extents(scene, num_samples, mesh)
    if geom_kinds is None:
        # inside shard_map the scene is a tracer: derive the static
        # axis-aligned specialization here (concrete on the direct call path;
        # make_sharded_pallas_step passes it through its closure)
        geom_kinds = megakernel._static_geom_kinds(scene)
    if scene_static is None:
        # falls back to ((), (), ()) — dynamic SMEM tables — when the scene
        # is a tracer; make_sharded_pallas_step passes the concrete tables
        scene_static = megakernel._static_scene_tables(scene)
    if nee_static is None and getattr(config, "nee", False) and not env_nee:
        try:
            nee_static = megakernel._static_light_table(scene)
        except Exception as e:  # tracer scene: tables must come from outside
            raise ValueError(
                "sharded nee needs the concrete light table — call via "
                "make_sharded_pallas_step (which derives it while the "
                "scene is concrete)"
            ) from e
    if (
        env_split is None
        and scene.envmap is not None
        and getattr(config, "env_mode", "exact") == "split"
    ):
        try:
            env_split = megakernel._static_env_split(scene, config)
        except Exception as e:  # tracer scene: tables must come from outside
            raise ValueError(
                "sharded env_mode='split' needs the concrete sun/SH tables "
                "— call via make_sharded_pallas_step"
            ) from e
    # env_mode='exact' needs nothing here: render_samples derives the
    # in-kernel gather dims from shapes alone (tracer-safe) and the planes
    # ride the sharded scene's replicated EnvMap leaves

    # Each shard's kernel tiles seed RNG as (global tile_base + local tile).
    # tile_base must be unique per shard: offset // TILE collides when the
    # per-shard slice is smaller than one TILE (two shards would then draw
    # identical uniforms for different pixel regions — spatially correlated
    # noise that never averages out). dp · ceil(local/TILE) is unique for
    # any alignment and equals offset // TILE exactly when the slice is
    # TILE-aligned, preserving bit-identity with the single-device render.
    tiles_per_shard = (local_pixels + megakernel.TILE - 1) // megakernel.TILE

    def body(scene, accum_local, iteration, key):
        dp = jax.lax.axis_index(PIXEL_AXIS)
        sp = jax.lax.axis_index(SAMPLE_AXIS)
        offset = dp * jnp.int32(local_pixels)
        # same seed derivation as engine.make_pallas_step — per-tile streams
        # already decorrelate via the global tile id
        seed = (key.reshape(-1)[-1].astype(jnp.uint32)).astype(jnp.int32)
        iter_base = iteration + 1 + sp * jnp.int32(local_samples)
        rad = megakernel.render_samples(
            scene,
            config,
            seed,
            iter_base,
            local_samples,
            interpret=interpret,
            pixel_offset=offset,
            num_pixels=local_pixels,
            geom_kinds=geom_kinds,
            scene_static=scene_static,
            nee_static=nee_static,
            env_split=env_split,
            env_nee=env_nee,
            tile_base=dp * jnp.int32(tiles_per_shard),
        )
        rad = jax.lax.psum(rad, SAMPLE_AXIS)
        return accum_local + rad

    return _run_sharded(body, scene, state, mesh, num_samples)


def make_sharded_pallas_step(
    scene: Scene,
    config: RenderConfig,
    num_samples: int,
    mesh: Mesh,
    interpret: bool = False,
):
    """jit-compiled closure over the static pieces (megakernel pipeline)."""
    config = _resolve_dof(scene, config)
    from ..ops.pallas import megakernel

    fn = partial(
        render_chunk_sharded_pallas,
        config=config,
        num_samples=num_samples,
        mesh=mesh,
        interpret=interpret,
        # derived here while the scene is concrete — inside the jit trace
        # below the scene arrays are tracers
        geom_kinds=megakernel._static_geom_kinds(scene),
        scene_static=megakernel._static_scene_tables(scene),
        nee_static=(
            megakernel._static_light_table(scene)
            if getattr(config, "nee", False)
            and not megakernel._wants_env_nee(scene, config)
            else None
        ),
        env_split=(
            megakernel._static_env_split(scene, config)
            if scene.envmap is not None and config.env_mode == "split"
            else None
        ),
        # env NEE needs concrete emittance values to derive; precompute the
        # flag here so the traced render_samples call never probes the
        # (tracer) scene
        env_nee=megakernel._wants_env_nee(scene, config),
    )
    return jax.jit(lambda scene, state: fn(scene, state))


def render_chunk_sharded_mesh(
    scene: Scene,
    state: RenderState,
    config: RenderConfig,
    num_samples: int,
    mesh: Mesh,
    cluster_isect,
    light_sampler=None,
) -> RenderState:
    """Multi-chip triangle-mesh step: each dp rank runs the sorted-wavefront
    mesh pipeline (ops.fast.trace_sample_mesh + the cluster-culled Pallas
    kernel) on its contiguous pixel slice; sp ranks split samples and
    combine with one psum. The cluster tables are replicated (a few MB).
    RNG (bounce uniforms AND antialias jitter) keys on the *global* pixel
    id, so every shard traces exactly the paths the single-device render
    would; per-pixel results match to float reassociation (1-2 ulp — XLA
    fuses the differently-shaped per-shard graphs differently)."""
    from ..ops import fast

    local_pixels, local_samples = _shard_extents(scene, num_samples, mesh)

    def body(scene, accum_local, iteration, key):
        dp = jax.lax.axis_index(PIXEL_AXIS)
        sp = jax.lax.axis_index(SAMPLE_AXIS)
        offset = dp * jnp.int32(local_pixels)

        def one(acc, i):
            it = iteration + 1 + sp * jnp.int32(local_samples) + i
            color = fast.trace_sample_mesh(
                scene, config, key, it, cluster_isect,
                pixel_offset=offset, num_pixels=local_pixels,
                light_sampler=light_sampler,
            )
            return acc + color, None

        rad, _ = jax.lax.scan(
            one,
            jnp.zeros((local_pixels, 3), jnp.float32),
            jnp.arange(local_samples, dtype=jnp.int32),
        )
        rad = jax.lax.psum(rad, SAMPLE_AXIS)
        return accum_local + rad

    return _run_sharded(body, scene, state, mesh, num_samples)


def make_sharded_mesh_step(
    scene: Scene,
    config: RenderConfig,
    num_samples: int,
    mesh: Mesh,
    interpret: bool = False,
):
    """jit-compiled closure over the static pieces (mesh pipeline). The
    cluster intersector (triangle tables + visit order) is built once here
    from the concrete scene and closed over — inside the trace the scene
    arrays are tracers."""
    config = _resolve_dof(scene, config)
    from ..render.engine import make_mesh_intersector

    cluster = make_mesh_intersector(scene, interpret=interpret)
    light_sampler = None
    if getattr(config, "nee", False):
        from ..ops.lights import make_light_sampler

        light_sampler = make_light_sampler(scene)
        if light_sampler is None:
            raise ValueError(
                "config.nee=True but the scene has no emissive analytic "
                "(cube/sphere) lights to sample"
            )
    fn = partial(
        render_chunk_sharded_mesh,
        config=config,
        num_samples=num_samples,
        mesh=mesh,
        cluster_isect=cluster,
        light_sampler=light_sampler,
    )
    from ..ops.pallas.mesh_kernel import JIT_COMPILER_OPTIONS

    return jax.jit(
        lambda scene, state: fn(scene, state),
        compiler_options=None if interpret else JIT_COMPILER_OPTIONS,
    )


def render_tiles_sharded(
    scene: Scene,
    config: RenderConfig,
    seed,
    tile_ids,
    iter_bases,
    px,
    py,
    num_samples: int,
    mesh: Mesh,
    interpret: bool = False,
    geom_kinds=None,
    scene_static=None,
    nee_static=None,
):
    """Multi-chip tile-selected megakernel dispatch (the adaptive-sampling
    kernel entry, ops.pallas.megakernel.render_tiles) sharded over the
    selected-tile axis.

    Tiles are fully independent work items whose identity is *data* (per-
    tile RNG key + iteration base ride in SMEM), so the K-tile dispatch
    shards over ALL mesh devices at once — the leading axis splits over the
    flattened ('sp','dp') axes, each rank running a K/n_devices-step grid on
    its contiguous slice. No collective at all: the output radiance comes
    back sharded over the same axis and the caller's scatter-add consumes
    it. Bit-identical to the single-device dispatch by construction — each
    tile's kernel sees exactly the same (seed, tile id, iter base, px, py).

    K must divide by the mesh's device count (the adaptive driver rounds
    its selection size up to guarantee this)."""
    from ..ops.pallas import megakernel

    n_dev = mesh.devices.size
    k = tile_ids.shape[0]
    if k % n_dev != 0:
        raise ValueError(
            f"selected tile count {k} not divisible by {n_dev} devices"
        )
    if geom_kinds is None:
        geom_kinds = megakernel._static_geom_kinds(scene)
    if scene_static is None:
        scene_static = megakernel._static_scene_tables(scene)

    tile_axes = (SAMPLE_AXIS, PIXEL_AXIS)

    def body(scene, seed, ids, bases, px, py):
        return megakernel.render_tiles(
            scene, config, seed, ids, bases, px, py, num_samples,
            interpret=interpret, geom_kinds=geom_kinds,
            scene_static=scene_static, nee_static=nee_static,
        )

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(tile_axes), P(tile_axes),
                  P(tile_axes, None), P(tile_axes, None)),
        out_specs=P(tile_axes, None),
        check_vma=False,
    )
    scene = jax.device_put(scene, NamedSharding(mesh, P()))
    return sharded(scene, seed, tile_ids, iter_bases, px, py)


def make_sharded_step(
    scene: Scene,
    config: RenderConfig,
    num_samples: int,
    mesh: Mesh,
    intersector: Optional[Callable] = None,
):
    """jit-compiled closure over the static pieces (incl. the nee light
    sampler, built here while the scene is concrete)."""
    config = _resolve_dof(scene, config)
    light_sampler = None
    if getattr(config, "nee", False):
        from ..ops.lights import make_light_sampler

        light_sampler = make_light_sampler(scene)
        if light_sampler is None and scene.envmap is None:
            raise ValueError(
                "config.nee=True but the scene has no emissive analytic "
                "(cube/sphere) lights and no ENVIRONMENT map to sample"
            )
    fn = partial(
        render_chunk_sharded,
        config=config,
        num_samples=num_samples,
        mesh=mesh,
        intersector=intersector,
        light_sampler=light_sampler,
    )
    return jax.jit(lambda scene, state: fn(scene, state))
