"""Scene parser + transform golden tests against the reference's
`scenes/cornell.txt` values (`src/scene.cpp`, `src/utilities.cpp:65-72`)."""

import numpy as np
import pytest

from cosc_4397_pathtracing_raytracing_project_tpu.scene import (
    CUBE,
    SPHERE,
    Scene,
    parse_scene,
    transforms,
)


def test_cornell_counts(cornell_desc):
    assert cornell_desc.num_materials == 5
    assert cornell_desc.num_geoms == 7
    assert cornell_desc.camera.resolution == (800, 800)
    assert cornell_desc.iterations == 1000
    assert cornell_desc.trace_depth == 8
    assert cornell_desc.image_name == "cornell"


def test_cornell_materials(cornell_desc):
    d = cornell_desc
    np.testing.assert_allclose(d.color[0], [1, 1, 1])
    assert d.emittance[0] == pytest.approx(1.5)
    np.testing.assert_allclose(d.color[2], [0.85, 0.35, 0.35], atol=1e-6)
    assert d.reflectivity[4] == pytest.approx(1.0)
    np.testing.assert_allclose(d.specular_color[4], [0.98, 0.98, 0.98], atol=1e-6)
    assert d.emittance[1] == 0.0


def test_cornell_geometry(cornell_desc):
    d = cornell_desc
    assert list(d.geom_type) == [CUBE] * 6 + [SPHERE]
    assert list(d.material_id) == [0, 1, 1, 1, 2, 3, 4]
    np.testing.assert_allclose(d.translation[0], [0, 10, 0])
    np.testing.assert_allclose(d.scale[0], [3, 0.3, 3])
    np.testing.assert_allclose(d.rotation[2], [0, 0, 90])
    np.testing.assert_allclose(d.translation[6], [-1, 4, -1])


def test_trs_matrix_matches_glm():
    # T(1,2,3)·Rz(90°)·S(2,2,2) applied to x-axis unit vector:
    # scale → (2,0,0); rotate z 90° → (0,2,0); translate → (1,4,3)
    m = transforms.build_transformation_matrix([1, 2, 3], [0, 0, 90], [2, 2, 2])
    p = m @ np.array([1, 0, 0, 1], np.float32)
    np.testing.assert_allclose(p[:3], [1, 4, 3], atol=1e-5)


def test_rotation_order_is_x_then_y_then_z():
    # M = T·Rx·Ry·Rz: applied to a vector, Rz acts first.
    m = transforms.build_transformation_matrix([0, 0, 0], [90, 0, 90], [1, 1, 1])
    # v=(1,0,0): Rz90 → (0,1,0); Rx90 → (0,0,1)
    p = m @ np.array([1, 0, 0, 1], np.float32)
    np.testing.assert_allclose(p[:3], [0, 0, 1], atol=1e-6)


def test_inverse_matrices(cornell_desc):
    d = cornell_desc
    for i in range(d.num_geoms):
        np.testing.assert_allclose(
            d.transform[i] @ d.inv_transform[i], np.eye(4), atol=1e-4
        )
        np.testing.assert_allclose(
            d.inv_transpose[i], d.inv_transform[i].T, atol=1e-6
        )


def test_camera_derivation(cornell_desc):
    cam = Scene.from_desc(cornell_desc).camera
    # EYE (0,5,10.5) LOOKAT (0,5,0): spherical reconstruction gives the same
    # camera back (view -z, up +y), per main.cpp:57-71,110-128
    np.testing.assert_allclose(np.asarray(cam.position), [0, 5, 10.5], atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam.view), [0, 0, -1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam.up), [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam.right), [1, 0, 0], atol=1e-5)
    # pixelLength per scene.cpp:133-140: yscaled = tan(45°) = 1
    np.testing.assert_allclose(
        np.asarray(cam.pixel_length), [2 / 800, 2 / 800], atol=1e-7
    )


def test_partitioned_batches(cornell_scene):
    s = cornell_scene
    assert s.cubes.count == 6
    assert s.spheres.count == 1
    assert s.triangles.count == 0
    assert s.num_primitives == 7
    assert int(s.spheres.material_id[0]) == 4
    assert int(s.spheres.geom_index[0]) == 6


def test_sequential_id_enforcement():
    bad = "MATERIAL 1\nRGB 1 1 1\nSPECEX 0\nSPECRGB 0 0 0\nREFL 0\nREFR 0\nREFRIOR 0\nEMITTANCE 0\n"
    with pytest.raises(Exception):
        parse_scene(bad)


def test_crlf_and_comments():
    text = (
        "// a comment\r\n"
        "MATERIAL 0\r\nRGB .5 .5 .5\r\nSPECEX 0\r\nSPECRGB 0 0 0\r\n"
        "REFL 0\r\nREFR 0\r\nREFRIOR 0\r\nEMITTANCE 0\r\n\r\n"
        "CAMERA\r\nRES 16 8\r\nFOVY 45\r\nITERATIONS 3\r\nDEPTH 2\r\nFILE x\r\n"
        "EYE 0 0 5\r\nLOOKAT 0 0 0\r\nUP 0 1 0\r\n\r\n"
        "OBJECT 0\r\ncube\r\nmaterial 0\r\nTRANS 0 0 0\r\nROTAT 0 0 0\r\nSCALE 1 1 1\r\n"
    )
    d = parse_scene(text)
    assert d.num_geoms == 1 and d.num_materials == 1
    assert d.camera.resolution == (16, 8)


def test_world_aabbs(cornell_desc):
    from cosc_4397_pathtracing_raytracing_project_tpu.scene import desc_world_aabbs

    mins, maxs = desc_world_aabbs(cornell_desc)
    # ceiling light: TRANS (0,10,0) SCALE (3,.3,3)
    np.testing.assert_allclose(mins[0], [-1.5, 9.85, -1.5], atol=1e-5)
    np.testing.assert_allclose(maxs[0], [1.5, 10.15, 1.5], atol=1e-5)
    # sphere object AABB uses the 8-corner cube method (pathtrace.cu:34-50)
    np.testing.assert_allclose(mins[6], [-2.5, 2.5, -2.5], atol=1e-5)
    np.testing.assert_allclose(maxs[6], [0.5, 5.5, 0.5], atol=1e-5)


def test_glass_scene_parses_and_cli_detects_refraction():
    """scenes/cornell_glass.txt (showcase): parses with a glass material,
    and the CLI's --refraction auto detection fires on it but not on the
    reference scenes (REFRIOR 0 everywhere upstream)."""
    import os

    from cosc_4397_pathtracing_raytracing_project_tpu.scene.parser import (
        load_scene_desc,
    )

    scenes = os.path.join(os.path.dirname(__file__), "..", "scenes")
    glass = load_scene_desc(os.path.join(scenes, "cornell_glass.txt"))
    assert glass.num_geoms == 8 and glass.num_materials == 6
    has_glass = any(
        r > 0 and i > 0 for r, i in zip(glass.refractive, glass.ior)
    )
    assert has_glass

    ref = load_scene_desc(os.path.join(scenes, "cornell.txt"))
    assert not any(r > 0 and i > 0 for r, i in zip(ref.refractive, ref.ior))
