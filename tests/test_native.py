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


def _encode_png_forced_filters(img: np.ndarray, ftypes) -> bytes:
    """PNG encoder that forces a per-row filter-type cycle (our encoder only
    emits filter 0, so decode tests need an independent source of Sub/Up/
    Average/Paeth rows)."""
    import struct
    import zlib

    from cosc_4397_pathtracing_raytracing_project_tpu.io.png import _PNG_SIG, _chunk

    h, w, c = img.shape
    prev = np.zeros(w * c, np.int32)
    rows = []
    for y in range(h):
        f = ftypes[y % len(ftypes)]
        line = img[y].reshape(-1).astype(np.int32)
        lc = line.reshape(-1, c)
        left = np.concatenate([np.zeros((1, c), np.int32), lc[:-1]], 0).reshape(-1)
        ul = np.concatenate(
            [np.zeros((1, c), np.int32), prev.reshape(-1, c)[:-1]], 0
        ).reshape(-1)
        if f == 0:
            filt = line
        elif f == 1:
            filt = (line - left) & 0xFF
        elif f == 2:
            filt = (line - prev) & 0xFF
        elif f == 3:
            filt = (line - ((left + prev) >> 1)) & 0xFF
        else:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            filt = (line - pred) & 0xFF
        rows.append(bytes([int(f)]) + filt.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if c == 3 else 6, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[4], [3], [0, 1, 2, 3, 4], [4, 0, 4, 2]])
def test_png_defilter_all_filters(tmp_path, ftypes, rng_np, monkeypatch):
    """Both defilter paths (native C++ and the NumPy anti-diagonal wavefront)
    invert every PNG filter type exactly (stb writes Paeth-heavy files —
    `/root/reference/src/image.cpp:22-45` — so golden decode needs this)."""
    from cosc_4397_pathtracing_raytracing_project_tpu.native import runtime as nr

    for c in (3, 4):
        img = rng_np.integers(0, 256, (23, 31, c), dtype=np.uint8)
        path = str(tmp_path / f"f{c}.png")
        with open(path, "wb") as f:
            f.write(_encode_png_forced_filters(img, ftypes))
        if runtime.ensure_built():
            np.testing.assert_array_equal(read_png(path), img)
        monkeypatch.setattr(nr, "png_defilter", lambda *a: False)
        np.testing.assert_array_equal(read_png(path), img)
        monkeypatch.undo()


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
