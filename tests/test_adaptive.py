"""Adaptive sampling (render.adaptive): layout, bookkeeping, estimator
consistency, and the tile-selected kernel path — all in interpret mode on
the 64×64 CORNELL_SMALL scene."""

import numpy as np
import jax.numpy as jnp
import pytest

from cosc_4397_pathtracing_raytracing_project_tpu import RenderConfig
from cosc_4397_pathtracing_raytracing_project_tpu.ops.pallas import megakernel
from cosc_4397_pathtracing_raytracing_project_tpu.render.adaptive import (
    AdaptiveRenderer,
    make_tile_layout,
)
from cosc_4397_pathtracing_raytracing_project_tpu.scene import Scene, parse_scene

from test_render import CORNELL_SMALL


@pytest.fixture(scope="module")
def scene():
    return Scene.from_desc(parse_scene(CORNELL_SMALL))


def test_tile_layout_covers_frame_exactly_once():
    w, h = 100, 70  # partial blocks on both axes
    px, py, idx, valid = make_tile_layout(w, h, (32, 64))
    assert px.shape == py.shape == idx.shape
    assert px.shape[1] == megakernel.TILE
    flat = idx.reshape(-1)
    real = flat[flat < w * h]
    # every pixel exactly once; padding lanes all map to the trash slot
    assert np.array_equal(np.sort(real), np.arange(w * h))
    assert valid.sum() == w * h
    # coordinates agree with the scatter index on valid lanes
    sel = idx < w * h
    assert np.array_equal(
        (py[sel].astype(np.int64) * w + px[sel].astype(np.int64)),
        idx[sel],
    )


def test_tile_layout_rejects_wrong_area():
    with pytest.raises(ValueError):
        make_tile_layout(64, 64, (32, 32))


def test_warmup_counts_and_mean(scene):
    cfg = RenderConfig(trace_depth=2)
    r = AdaptiveRenderer(scene, cfg, interpret=True)
    r.warmup(2)
    assert r.avg_spp == pytest.approx(2.0)
    spp = r.spp_map()
    assert spp.shape == (64, 64)
    assert (spp == 2).all()
    img = r.linear_image()
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all() and (img >= 0).all()
    # the emissive ceiling light must be visible in the mean
    assert img.max() > 0.5


def test_refine_updates_only_selected_tiles(scene):
    cfg = RenderConfig(trace_depth=2)
    r = AdaptiveRenderer(scene, cfg, interpret=True)
    r.warmup(2)
    img_before = r.linear_image()
    sel = r.refine(spp=2, frac=0.5)  # 1 of 2 tiles
    assert len(sel) == 1
    spp = r.spp_map()
    assert sorted(np.unique(spp).tolist()) == [2, 4]
    # unselected tile's accumulator (and so its mean) is untouched
    img_after = r.linear_image()
    untouched = spp == 2
    assert np.array_equal(img_before[untouched], img_after[untouched])
    assert r.avg_spp == pytest.approx(3.0)


def test_adaptive_all_tiles_matches_dense_megakernel_depth1_sobol(scene):
    """At trace_depth=1 with sampler='sobol' every random draw comes from
    the pixel-keyed LD lattice, so the render is independent of the tile
    decomposition: the adaptive path (spatial blocks, per-tile iteration
    slots) must reproduce the dense megakernel render bit-exactly."""
    cfg = RenderConfig(trace_depth=1, sampler="sobol", ld_depths=1)
    k = 2
    dense = np.asarray(
        megakernel.render_samples(
            scene, cfg, jnp.int32(7), jnp.int32(1), k, interpret=True
        )
    )

    r = AdaptiveRenderer(scene, cfg, seed=0, interpret=True)
    r._seed = jnp.int32(7)
    r.warmup(2 * k)  # k into A, k into B: iterations 1..k then k+1..2k
    total = np.asarray(r._acc_a[: r._n] + r._acc_b[: r._n])
    # A holds iterations 1..k == the dense render's batch
    a_only = np.asarray(r._acc_a[: r._n])
    assert np.array_equal(a_only, dense)
    assert np.isfinite(total).all()


def test_adaptive_env_exact_matches_dense():
    """Adaptive × envmap closure (exact mode): render_tiles carries the
    in-kernel bilinear env gather, and — since misses settle per tile with
    no full-frame composite — the depth-1 sobol decomposition-independence
    proof extends verbatim to env scenes: spatial-block tiles reproduce the
    dense env render bit-exactly."""
    import os

    from cosc_4397_pathtracing_raytracing_project_tpu.scene.parser import (
        load_scene_desc,
    )

    scenes = os.path.join(os.path.dirname(__file__), "..", "scenes")
    desc = load_scene_desc(os.path.join(scenes, "env_spheres.txt"))
    desc.camera.resolution = (64, 64)
    env_scene = Scene.from_desc(desc)

    cfg = RenderConfig(trace_depth=1, sampler="sobol", ld_depths=1)
    k = 2
    dense = np.asarray(
        megakernel.render_samples(
            env_scene, cfg, jnp.int32(7), jnp.int32(1), k, interpret=True
        )
    )
    r = AdaptiveRenderer(env_scene, cfg, seed=0, interpret=True)
    r._seed = jnp.int32(7)
    r.warmup(2 * k)
    a_only = np.asarray(r._acc_a[: r._n])
    assert np.array_equal(a_only, dense)


def test_render_budget_loop(scene):
    cfg = RenderConfig(trace_depth=2)
    r = AdaptiveRenderer(scene, cfg, interpret=True)
    r.render(avg_spp=8, warmup_spp=4, round_spp=2, frac=0.5)
    assert r.avg_spp >= 8.0
    spp = r.spp_map()
    assert spp.min() >= 4  # warmup floor
    assert spp.max() > spp.min()  # refinement actually concentrated work


def test_cli_adaptive_headless(tmp_path):
    from cosc_4397_pathtracing_raytracing_project_tpu.utils.cli import main
    from cosc_4397_pathtracing_raytracing_project_tpu.io.png import read_png

    scene_path = tmp_path / "scene.txt"
    scene_path.write_text(CORNELL_SMALL)
    out = tmp_path / "out.png"
    rc = main(
        [
            str(scene_path),
            "--adaptive",
            "--iterations", "6",
            "--adaptive-round", "2",
            "--adaptive-frac", "0.5",
            "--depth", "2",
            "--output", str(out),
            "--quiet",
        ]
    )
    assert rc == 0 and out.exists()
    assert read_png(str(out)).shape == (64, 64, 3)
    # incompatible-flag guards
    assert main([str(scene_path), "--adaptive", "--model", "bvh"]) == 2
    assert main([str(scene_path), "--adaptive", "--serve"]) == 2


def test_sharded_adaptive_bit_identical(scene):
    """The tile-sharded dispatch (parallel.shard.render_tiles_sharded) must
    reproduce the single-device adaptive render bit-exactly — each tile's
    kernel sees identical (seed, tile id, iter base, px, py) regardless of
    which rank runs it."""
    from cosc_4397_pathtracing_raytracing_project_tpu.parallel import make_mesh

    cfg = RenderConfig(trace_depth=2)
    ref = AdaptiveRenderer(scene, cfg, interpret=True)
    ref.warmup(4)
    ref.refine(spp=2, frac=1.0)

    mesh = make_mesh(4)  # 2 tiles → the 2K=4-step dispatch, 1 tile/rank
    r = AdaptiveRenderer(scene, cfg, interpret=True, mesh=mesh)
    r.warmup(4)
    r.refine(spp=2, frac=1.0)

    assert np.array_equal(np.asarray(ref._acc_a), np.asarray(r._acc_a))
    assert np.array_equal(np.asarray(ref._acc_b), np.asarray(r._acc_b))
    assert np.array_equal(np.asarray(ref._counts), np.asarray(r._counts))


def test_sharded_adaptive_partial_selection():
    """Partial refinement on a 4-tile frame over the full 8-device mesh:
    the selection rounds up to the divisibility quantum and unselected
    tiles stay untouched."""
    from cosc_4397_pathtracing_raytracing_project_tpu.parallel import make_mesh

    wide = CORNELL_SMALL.replace("RES 64 64", "RES 128 64")
    sc = Scene.from_desc(parse_scene(wide))
    cfg = RenderConfig(trace_depth=2)
    mesh = make_mesh(8)  # m = 4: n_sel rounds 1 → 4? no — frac 0.25 of 4
    r = AdaptiveRenderer(sc, cfg, interpret=True, mesh=mesh)
    assert r.num_tiles == 4
    r.warmup(2)
    img_before = r.linear_image()
    sel = r.refine(spp=2, frac=0.25)  # 1 tile requested → rounds to m=4
    assert len(sel) == 4  # the full frame this time (tiny test scene)
    # a second round on a 2-device mesh exercises true partial selection
    mesh2 = make_mesh(2)  # m = 1: selection stays 1 tile
    r2 = AdaptiveRenderer(sc, cfg, interpret=True, mesh=mesh2)
    r2.warmup(2)
    before2 = r2.linear_image()
    sel2 = r2.refine(spp=2, frac=0.25)
    assert len(sel2) == 1
    spp = r2.spp_map()
    assert sorted(np.unique(spp).tolist()) == [2, 4]
    untouched = spp == 2
    assert np.array_equal(before2[untouched], r2.linear_image()[untouched])
    del img_before


def test_sharded_adaptive_pads_indivisible_tiles(scene):
    """A 2-tile frame on the full 8-device mesh: the dispatch quantum is
    m=4, so both warmup (2 real + 2 trash tiles) and refinement (2 real +
    2 trash) pad with the synthetic trash tile — and the padded sharded
    render stays bit-identical to the single-device one on every real
    accumulator row (only the trash slot differs)."""
    from cosc_4397_pathtracing_raytracing_project_tpu.parallel import make_mesh

    cfg = RenderConfig(trace_depth=2)
    ref = AdaptiveRenderer(scene, cfg, interpret=True)
    ref.warmup(4)
    ref.refine(spp=2, frac=1.0)

    mesh = make_mesh(8)  # 2 tiles → quantum 4 → trash-tile padding
    r = AdaptiveRenderer(scene, cfg, interpret=True, mesh=mesh)
    assert r.num_tiles == 2 and r._quantum == 4
    r.warmup(4)
    sel = r.refine(spp=2, frac=1.0)
    assert len(sel) == 2  # selection reports real tiles only

    n = r._n
    assert np.array_equal(
        np.asarray(ref._acc_a)[:n], np.asarray(r._acc_a)[:n]
    )
    assert np.array_equal(
        np.asarray(ref._acc_b)[:n], np.asarray(r._acc_b)[:n]
    )
    assert np.array_equal(np.asarray(ref._counts), np.asarray(r._counts))
    assert np.array_equal(ref.linear_image(), r.linear_image())


def test_adaptive_checkpoint_resume_bit_identical(scene, tmp_path):
    """Save mid-render, resume in a fresh instance, finish: per-tile
    iteration counters key every stream, so the result must be bit-exact
    vs an uninterrupted run."""
    cfg = RenderConfig(trace_depth=2)
    straight = AdaptiveRenderer(scene, cfg, interpret=True)
    straight.warmup(4)
    straight.refine(spp=2, frac=0.5)
    straight.refine(spp=2, frac=0.5)

    r = AdaptiveRenderer(scene, cfg, interpret=True)
    r.warmup(4)
    r.refine(spp=2, frac=0.5)
    ckpt = r.save_checkpoint(str(tmp_path / "adaptive.npz"))

    r2 = AdaptiveRenderer(scene, cfg, interpret=True).load_checkpoint(ckpt)
    assert r2.avg_spp == r.avg_spp
    r2.refine(spp=2, frac=0.5)

    assert np.array_equal(np.asarray(straight._acc_a), np.asarray(r2._acc_a))
    assert np.array_equal(np.asarray(straight._acc_b), np.asarray(r2._acc_b))
    assert np.array_equal(
        np.asarray(straight._counts), np.asarray(r2._counts)
    )


def test_adaptive_render_resumes_without_rewarmup(scene, tmp_path):
    """render() on a resumed instance tops up to the total budget without
    re-running the uniform warmup."""
    cfg = RenderConfig(trace_depth=2)
    r = AdaptiveRenderer(scene, cfg, interpret=True)
    r.render(avg_spp=4, warmup_spp=4, round_spp=2, frac=0.5)
    ckpt = r.save_checkpoint(str(tmp_path / "a.npz"))
    r2 = AdaptiveRenderer(scene, cfg, interpret=True).load_checkpoint(ckpt)
    spent_before = r2._lane_budget_spent
    r2.render(avg_spp=8, warmup_spp=4, round_spp=2, frac=0.5)
    assert r2.avg_spp >= 8.0
    # no second uniform pass: a re-warmup would add 4 spp to EVERY pixel
    # (min >= 8); refinement rounds may still touch low-variance tiles,
    # so the min can creep above 4 — but only in round_spp steps.
    assert r2.spp_map().min() < 8
    assert r2._lane_budget_spent > spent_before


def test_checkpoint_kind_mismatch_raises(scene, tmp_path):
    from cosc_4397_pathtracing_raytracing_project_tpu.render.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from cosc_4397_pathtracing_raytracing_project_tpu.render.state import (
        RenderState,
    )

    cfg = RenderConfig(trace_depth=2)
    r = AdaptiveRenderer(scene, cfg, interpret=True)
    r.warmup(2)
    adaptive_ckpt = r.save_checkpoint(str(tmp_path / "adaptive.npz"))
    with pytest.raises(ValueError, match="adaptive"):
        load_checkpoint(adaptive_ckpt)

    uniform_ckpt = save_checkpoint(
        str(tmp_path / "uniform.npz"), RenderState.create(64 * 64, seed=0)
    )
    with pytest.raises(ValueError, match="uniform"):
        AdaptiveRenderer(scene, cfg, interpret=True).load_checkpoint(
            uniform_ckpt
        )
    # layout mismatch: same kind, different frame
    with pytest.raises(ValueError, match="does not match"):
        wide = CORNELL_SMALL.replace("RES 64 64", "RES 128 64")
        AdaptiveRenderer(
            Scene.from_desc(parse_scene(wide)), cfg, interpret=True
        ).load_checkpoint(adaptive_ckpt)


def test_cli_adaptive_checkpoint_resume(tmp_path):
    from cosc_4397_pathtracing_raytracing_project_tpu.utils.cli import main

    scene_path = tmp_path / "scene.txt"
    scene_path.write_text(CORNELL_SMALL)
    ckpt = tmp_path / "ck.npz"
    out1 = tmp_path / "o1.png"
    args = [str(scene_path), "--adaptive", "--adaptive-round", "2",
            "--adaptive-frac", "0.5", "--depth", "2", "--quiet"]
    rc = main(args + ["--iterations", "4", "--checkpoint", str(ckpt),
                      "--output", str(out1)])
    assert rc == 0 and ckpt.exists()
    out2 = tmp_path / "o2.png"
    rc = main(args + ["--iterations", "8", "--resume", str(ckpt),
                      "--output", str(out2)])
    assert rc == 0 and out2.exists()


def test_adaptive_requires_megakernel_scene():
    from cosc_4397_pathtracing_raytracing_project_tpu.scene.structs import (
        TriangleBatch,
    )

    sc = Scene.from_desc(parse_scene(CORNELL_SMALL))
    tri = TriangleBatch(
        v0=jnp.zeros((1, 3), jnp.float32),
        e1=jnp.asarray([[1.0, 0, 0]]),
        e2=jnp.asarray([[0, 1.0, 0]]),
        normal=jnp.asarray([[0, 0, 1.0]]),
        material_id=jnp.zeros((1,), jnp.int32),
        geom_index=jnp.zeros((1,), jnp.int32),
    )
    sc = sc.replace(triangles=tri)
    with pytest.raises(ValueError, match="megakernel|analytic"):
        AdaptiveRenderer(sc, RenderConfig())
