"""Equivalence of the SoA fast pipeline vs the readable reference pipeline.

The two pipelines draw differently-shaped uniform blocks, so images are
compared statistically (means and structure), plus deterministic ray-level
checks of the fused intersector against ops.intersect."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosc_4397_pathtracing_raytracing_project_tpu import RenderConfig, Renderer
from cosc_4397_pathtracing_raytracing_project_tpu.ops import fast, intersect
from cosc_4397_pathtracing_raytracing_project_tpu.scene import Scene, parse_scene

from test_render import CORNELL_SMALL


@pytest.fixture(scope="module")
def scene():
    return Scene.from_desc(parse_scene(CORNELL_SMALL))


def test_supports(scene):
    assert fast.supports(scene)
    cfg = RenderConfig()
    assert cfg.resolve_pipeline(scene) == "fast"
    assert RenderConfig(pipeline="reference").resolve_pipeline(scene) == "reference"


def test_fused_intersector_matches_reference(scene, rng_np):
    n = 512
    o = rng_np.uniform(-6, 11, (n, 3)).astype(np.float32)
    d = rng_np.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ref = intersect.intersect_scene(scene, jnp.asarray(o), jnp.asarray(d))
    got = fast.intersect_unrolled(
        scene,
        jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]),
        jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]),
    )
    miss_ref = np.asarray(ref.miss)
    miss_got = np.asarray(got.miss)
    assert (miss_ref == miss_got).mean() > 0.995  # fp-boundary ties only
    both = ~miss_ref & ~miss_got
    np.testing.assert_allclose(
        np.asarray(got.t)[both], np.asarray(ref.t)[both], rtol=2e-3, atol=2e-3
    )
    # winner identity via material ids
    agree = (np.asarray(got.mat)[both] == np.asarray(ref.material_id)[both]).mean()
    assert agree > 0.99
    n_ref = np.asarray(ref.normal)[both]
    n_got = np.stack(
        [np.asarray(got.nx)[both], np.asarray(got.ny)[both], np.asarray(got.nz)[both]],
        axis=1,
    )
    same_winner = np.asarray(got.mat)[both] == np.asarray(ref.material_id)[both]
    np.testing.assert_allclose(
        n_got[same_winner], n_ref[same_winner], rtol=1e-3, atol=2e-3
    )


@pytest.mark.parametrize("mode", ["light_only", "throughput"])
def test_pipelines_statistically_agree(mode):
    desc = parse_scene(CORNELL_SMALL)
    cfg_f = RenderConfig(gather_mode=mode, pipeline="fast", samples_per_launch=16)
    cfg_r = RenderConfig(gather_mode=mode, pipeline="reference", samples_per_launch=16)
    rf = Renderer(desc, cfg_f, seed=5)
    rr = Renderer(desc, cfg_r, seed=5)
    rf.render(48)
    rr.render(48)
    a = np.asarray(rf.state.accum) / 48
    b = np.asarray(rr.state.accum) / 48
    assert abs(a.mean() - b.mean()) / max(b.mean(), 1e-9) < 0.06
    corr = np.corrcoef(a.mean(-1), b.mean(-1))[0, 1]
    assert corr > 0.95


def test_fast_antialias_runs():
    desc = parse_scene(CORNELL_SMALL)
    r = Renderer(desc, RenderConfig(antialias=True, samples_per_launch=4))
    r.step(4)
    assert np.isfinite(np.asarray(r.state.accum)).all()
