"""BVH build + traversal tests: structural invariants of the flattened tree
and exact equivalence of traversal vs the brute-force intersector."""

import numpy as np
import jax.numpy as jnp
import pytest

from cosc_4397_pathtracing_raytracing_project_tpu.ops import bvh as bvh_mod
from cosc_4397_pathtracing_raytracing_project_tpu.ops import intersect
from cosc_4397_pathtracing_raytracing_project_tpu.scene import (
    CameraDesc,
    Scene,
    SceneDesc,
    transforms,
)


def random_scene(rng, num_geoms=24, with_tris=0):
    gtypes = rng.integers(0, 2, num_geoms).astype(np.int32)
    trans = rng.uniform(-8, 8, (num_geoms, 3)).astype(np.float32)
    rots = rng.uniform(0, 360, (num_geoms, 3)).astype(np.float32)
    scales = rng.uniform(0.3, 2.5, (num_geoms, 3)).astype(np.float32)
    tf = np.zeros((num_geoms, 4, 4), np.float32)
    inv = np.zeros_like(tf)
    invt = np.zeros_like(tf)
    for i in range(num_geoms):
        tf[i], inv[i], invt[i] = transforms.geom_matrices(trans[i], rots[i], scales[i])
    m = 3
    tri_v = tri_m = None
    if with_tris:
        tri_v = rng.uniform(-8, 8, (with_tris, 3, 3)).astype(np.float32)
        tri_m = rng.integers(0, m, with_tris).astype(np.int32)
    desc = SceneDesc(
        geom_type=gtypes,
        material_id=rng.integers(0, m, num_geoms).astype(np.int32),
        translation=trans,
        rotation=rots,
        scale=scales,
        transform=tf,
        inv_transform=inv,
        inv_transpose=invt,
        color=rng.uniform(0.2, 1, (m, 3)).astype(np.float32),
        specular_exponent=np.zeros(m, np.float32),
        specular_color=np.zeros((m, 3), np.float32),
        reflectivity=np.zeros(m, np.float32),
        refractive=np.zeros(m, np.float32),
        ior=np.zeros(m, np.float32),
        emittance=np.zeros(m, np.float32),
        camera=CameraDesc((8, 8), 45.0, np.array([0, 0, 20.0]), np.zeros(3), np.array([0, 1, 0.0])),
        tri_vertices=tri_v,
        tri_material_id=tri_m,
    )
    return Scene.from_desc(desc)


def test_flat_bvh_invariants(rng_np):
    n = 33
    mins = rng_np.uniform(-10, 10, (n, 3)).astype(np.float32)
    maxs = mins + rng_np.uniform(0.1, 3, (n, 3)).astype(np.float32)
    bvh = bvh_mod.build_bvh(mins, maxs, leaf_size=2)
    k = bvh.num_nodes
    # every primitive appears exactly once in leaf order
    assert sorted(bvh.order.tolist()) == list(range(n))
    # leaves cover `order` contiguously and disjointly
    leaves = [(int(s), int(c)) for s, c in zip(bvh.leaf_start, bvh.leaf_count) if s >= 0]
    leaves.sort()
    pos = 0
    for s, c in leaves:
        assert s == pos and 1 <= c <= 2
        pos += c
    assert pos == n
    # miss links point strictly forward and the root's spans the whole tree
    assert int(bvh.miss_link[0]) == k
    assert (bvh.miss_link > np.arange(k)).all()
    # parent bounds contain primitive bounds
    assert (bvh.bounds_min[0] <= mins.min(axis=0) + 1e-5).all()
    assert (bvh.bounds_max[0] >= maxs.max(axis=0) - 1e-5).all()


@pytest.mark.parametrize("leaf_size", [1, 4])
def test_bvh_matches_bruteforce(rng_np, leaf_size):
    scene = random_scene(rng_np, num_geoms=24)
    isect = bvh_mod.make_bvh_intersector(scene, leaf_size=leaf_size)
    n = 512
    o = rng_np.uniform(-12, 12, (n, 3)).astype(np.float32)
    d = rng_np.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    got = isect(scene, jnp.asarray(o), jnp.asarray(d))
    ref = intersect.intersect_scene(scene, jnp.asarray(o), jnp.asarray(d))
    miss_agree = (np.asarray(got.miss) == np.asarray(ref.miss)).mean()
    assert miss_agree > 0.995
    both = ~np.asarray(got.miss) & ~np.asarray(ref.miss)
    np.testing.assert_allclose(
        np.asarray(got.t)[both], np.asarray(ref.t)[both], rtol=2e-3, atol=2e-3
    )
    same = np.asarray(got.geom_index)[both] == np.asarray(ref.geom_index)[both]
    assert same.mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(got.normal)[both][same],
        np.asarray(ref.normal)[both][same],
        rtol=1e-3,
        atol=2e-3,
    )


def test_bvh_with_triangles(rng_np):
    scene = random_scene(rng_np, num_geoms=6, with_tris=50)
    isect = bvh_mod.make_bvh_intersector(scene, leaf_size=4)
    n = 256
    o = rng_np.uniform(-12, 12, (n, 3)).astype(np.float32)
    d = rng_np.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    got = isect(scene, jnp.asarray(o), jnp.asarray(d))
    ref = intersect.intersect_scene(scene, jnp.asarray(o), jnp.asarray(d))
    both = ~np.asarray(got.miss) & ~np.asarray(ref.miss)
    assert (np.asarray(got.miss) == np.asarray(ref.miss)).mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(got.t)[both], np.asarray(ref.t)[both], rtol=2e-3, atol=2e-3
    )


def test_bvh_render_pipeline(rng_np):
    """End-to-end: a renderer forced onto the BVH path produces the same
    statistics as the brute-force reference pipeline."""
    from cosc_4397_pathtracing_raytracing_project_tpu import RenderConfig, Renderer
    from cosc_4397_pathtracing_raytracing_project_tpu.scene import parse_scene
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_render import CORNELL_SMALL

    desc = parse_scene(CORNELL_SMALL)
    r_bvh = Renderer(
        desc,
        RenderConfig(pipeline="reference", intersector="bvh", samples_per_launch=8),
        seed=4,
    )
    r_ref = Renderer(
        desc,
        RenderConfig(pipeline="reference", intersector="bruteforce", samples_per_launch=8),
        seed=4,
    )
    r_bvh.render(8)
    r_ref.render(8)
    a = np.asarray(r_bvh.state.accum)
    b = np.asarray(r_ref.state.accum)
    # identical RNG streams; results differ only at fp ties on overlapping
    # surfaces (wall/floor seams), which reroute whole paths — so compare
    # statistically rather than per-pixel
    mismatched = (np.abs(a - b).max(axis=1) > 1e-3).mean()
    assert mismatched < 0.02
    assert abs(a.mean() - b.mean()) / max(b.mean(), 1e-9) < 0.02
