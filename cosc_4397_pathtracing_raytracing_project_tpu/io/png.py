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


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


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
    raw = raw.reshape(height, 1 + stride)
    filters = raw[:, 0]
    scan = raw[:, 1:].copy()
    prev = np.zeros(stride, np.uint8)
    for y in range(height):
        line = scan[y]
        f_type = filters[y]
        if f_type == 1:  # Sub
            for x in range(channels, stride):
                line[x] = (line[x] + line[x - channels]) & 0xFF
        elif f_type == 2:  # Up
            line += prev
        elif f_type == 3:  # Average
            for x in range(stride):
                left = line[x - channels] if x >= channels else 0
                line[x] = (line[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif f_type == 4:  # Paeth
            for x in range(stride):
                a = line[x - channels] if x >= channels else np.uint8(0)
                c = prev[x - channels] if x >= channels else np.uint8(0)
                line[x] = (line[x] + _paeth(a, prev[x], c)) & 0xFF
        prev = line
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
