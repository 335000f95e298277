"""Dependency-free PNG/HDR image I/O.

Replaces the reference's vendored stb_image_write (`src/image.cpp:22-45`,
`src/stb.cpp`). PNG encoding is pure Python (zlib + struct) with an optional
native C++ encoder (io.native) used when the shared library is built; decoding
supports the subset needed to load the reference's golden images (8-bit RGB/
RGBA, non-interlaced)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(image: np.ndarray, compress_level: int = 6) -> bytes:
    """[H, W, 3|4] uint8 → PNG bytes."""
    image = np.ascontiguousarray(image)
    if image.dtype != np.uint8 or image.ndim != 3 or image.shape[2] not in (3, 4):
        raise ValueError("expected [H, W, 3|4] uint8 image")
    h, w, c = image.shape
    color_type = 2 if c == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) per scanline
    raw = np.empty((h, 1 + w * c), np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = image.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def write_png(path: str, image: np.ndarray) -> str:
    try:
        from ..native import runtime as native_runtime

        if native_runtime.available():
            native_runtime.write_png(path, image)
            return path
    except Exception:
        pass
    if not path.endswith(".png"):
        path = path + ".png"
    with open(path, "wb") as f:
        f.write(encode_png(image))
    return path


def _defilter(raw: np.ndarray, height: int, stride: int, channels: int) -> np.ndarray:
    """Reverse PNG scanline filters; `raw` is uint8 [height, 1+stride].
    Native C++ when built; otherwise vectorized NumPy (Sub is a cumsum mod
    256, Up is a row add; Average/Paeth keep their sequential left-to-right
    dependency but run one int32 pixel-vector step per pixel, not per byte)."""
    try:
        from ..native import runtime as native_runtime

        if native_runtime.png_defilter(raw, height, stride, channels):
            return raw[:, 1:]
    except Exception:
        pass

    filters = raw[:, 0]
    scan = raw[:, 1:]
    c = channels
    prev = np.zeros(stride, np.int32)
    for y in range(height):
        f_type = filters[y]
        if f_type == 0:
            line = scan[y].astype(np.int32)
        elif f_type == 1:  # Sub: out[x] = Σ raw[..x] per channel, mod 256
            line = scan[y].reshape(-1, c).astype(np.uint32)
            line = (line.cumsum(axis=0) & 0xFF).astype(np.int32).reshape(-1)
        elif f_type == 2:  # Up
            line = (scan[y].astype(np.int32) + prev) & 0xFF
        elif f_type == 3:  # Average
            line = scan[y].astype(np.int32)
            up = prev.reshape(-1, c)
            px = line.reshape(-1, c)
            left = np.zeros(c, np.int32)
            for x in range(px.shape[0]):
                left = (px[x] + ((left + up[x]) >> 1)) & 0xFF
                px[x] = left
        elif f_type == 4:  # Paeth
            line = scan[y].astype(np.int32)
            up = prev.reshape(-1, c)
            px = line.reshape(-1, c)
            left = np.zeros(c, np.int32)
            ul = np.zeros(c, np.int32)
            for x in range(px.shape[0]):
                p = left + up[x] - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - up[x]), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up[x], ul)
                )
                left = (px[x] + pred) & 0xFF
                px[x] = left
                ul = up[x]
        else:
            raise ValueError(f"unknown PNG filter type {f_type}")
        scan[y] = line.astype(np.uint8)
        prev = line
    return scan


def read_png(path: str) -> np.ndarray:
    """Decode an 8-bit RGB/RGBA/gray non-interlaced PNG → [H, W, C] uint8."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos = 8
    width = height = None
    bit_depth = color_type = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if bit_depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNGs supported")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    stride = width * channels
    # copy: frombuffer views are read-only and the defilter runs in place
    raw = raw.reshape(height, 1 + stride).copy()
    scan = _defilter(raw, height, stride, channels)
    return scan.reshape(height, width, channels)


def write_hdr(path: str, image: np.ndarray) -> str:
    """Radiance RGBE HDR writer (`image::saveHDR`, `image.cpp:41-45`).
    Expects [H, W, 3] float32 linear radiance; uses uncompressed RGBE
    scanlines."""
    image = np.asarray(image, np.float32)
    h, w, _ = image.shape
    if not path.endswith(".hdr"):
        path = path + ".hdr"
    maxc = image.max(axis=2)
    exp = np.zeros((h, w), np.int32)
    mant = np.zeros((h, w), np.float32)
    nz = maxc > 1e-32
    mant_nz, exp_nz = np.frexp(maxc[nz])
    exp[nz] = exp_nz
    mant[nz] = mant_nz
    scale = np.zeros((h, w), np.float32)
    scale[nz] = mant_nz * 256.0 / maxc[nz]
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(image * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(nz, exp + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())
    return path
