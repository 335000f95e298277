"""Native C++ runtime: build, then verify equivalence with Python fallbacks."""

import numpy as np
import pytest

from cosc_4397_pathtracing_raytracing_project_tpu.native import runtime
from cosc_4397_pathtracing_raytracing_project_tpu.ops import bvh as bvh_mod
from cosc_4397_pathtracing_raytracing_project_tpu.io.png import read_png


@pytest.fixture(scope="module")
def native_lib():
    if not runtime.ensure_built():
        pytest.skip("native toolchain unavailable")
    return runtime


def test_native_png_roundtrip(tmp_path, native_lib, rng_np):
    img = rng_np.integers(0, 255, (37, 53, 3), dtype=np.uint8)
    path = str(tmp_path / "native.png")
    native_lib.write_png(path, img)
    back = read_png(path)
    np.testing.assert_array_equal(back, img)


def test_native_bvh_matches_python(native_lib, rng_np):
    n = 57
    mins = rng_np.uniform(-10, 10, (n, 3)).astype(np.float32)
    maxs = mins + rng_np.uniform(0.1, 3, (n, 3)).astype(np.float32)
    for leaf in (1, 4):
        py = bvh_mod.build_bvh(mins, maxs, leaf_size=leaf)
        nat = bvh_mod.try_native_build(mins, maxs, leaf)
        assert nat is not None
        assert nat.num_nodes == py.num_nodes
        np.testing.assert_array_equal(nat.order, py.order)
        np.testing.assert_array_equal(nat.miss_link, py.miss_link)
        np.testing.assert_array_equal(nat.leaf_start, py.leaf_start)
        np.testing.assert_array_equal(nat.leaf_count, py.leaf_count)
        np.testing.assert_allclose(nat.bounds_min, py.bounds_min, atol=1e-6)
        np.testing.assert_allclose(nat.bounds_max, py.bounds_max, atol=1e-6)


def test_native_obj_loader(tmp_path, native_lib):
    obj = tmp_path / "tri.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "f 1 2 3\nf 2 4 3\n"
        "f 1 2 4 3\n"  # quad → 2 triangles by fan
    )
    tris = native_lib.load_obj_triangles(str(obj))
    assert tris is not None and tris.shape == (4, 3, 3)
    from cosc_4397_pathtracing_raytracing_project_tpu.scene.parser import (
        load_obj_triangles,
    )

    py = load_obj_triangles(str(obj))
    np.testing.assert_allclose(tris, py)
