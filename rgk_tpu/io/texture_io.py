"""Texture image loading: PNG / JPEG (sRGB, gamma-decoded) and HDR
(linear), plus EXR via rgk_tpu.io.exr.

Behavioral parity with the reference loaders (reference
src/texture.cpp:189-321): 8-bit formats are decoded with a pow-2.2
gamma curve; JPEGs are flipped vertically (the reference stores them
bottom-up); HDR is read linearly.  Returns float32 [H, W, 3] arrays in
top-down row order as consumed by the bilinear fetch.
"""

from __future__ import annotations

import os

import numpy as np

from . import exr as exr_io

GAMMA = 2.2


def gamma_decode(img: np.ndarray, gamma: float = GAMMA) -> np.ndarray:
    return np.power(np.clip(img, 0.0, 1.0), gamma).astype(np.float32)


def load_texture(path: str) -> np.ndarray:
    """Load an image file as float32 [H, W, 3] linear radiance."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".hdr":
        return _load_hdr(path)
    if ext == ".exr":
        return exr_io.read_exr(path)[..., :3].astype(np.float32)
    from PIL import Image

    with Image.open(path) as im:
        flip = ext in (".jpg", ".jpeg")
        arr = np.asarray(im.convert("RGB"), np.float32) / 255.0
    if flip:
        arr = arr[::-1].copy()
    return gamma_decode(arr)


def _load_hdr(path: str) -> np.ndarray:
    """Radiance RGBE (.hdr) reader (replaces the reference's stb_image
    use).  Supports the common 32-bit_rle_rgbe format with new-style
    RLE scanlines."""
    with open(path, "rb") as f:
        data = f.read()
    # Header
    pos = data.index(b"\n\n") if b"\n\n" in data else -1
    if pos < 0:
        raise ValueError("malformed HDR header")
    header = data[:pos].decode("latin-1")
    if "32-bit_rle_rgbe" not in header and not header.startswith("#?"):
        raise ValueError("not an RGBE HDR file")
    pos += 2
    dim_end = data.index(b"\n", pos)
    dims = data[pos:dim_end].decode("latin-1").split()
    if len(dims) != 4 or dims[0] != "-Y" or dims[2] != "+X":
        raise ValueError(f"unsupported HDR orientation: {dims}")
    h, w = int(dims[1]), int(dims[3])
    pos = dim_end + 1

    rgbe = np.zeros((h, w, 4), np.uint8)
    buf = memoryview(data)
    for y in range(h):
        if w < 8 or w > 0x7FFF or buf[pos] != 2 or buf[pos + 1] != 2:
            # Flat (non-RLE) scanline
            row = np.frombuffer(buf[pos:pos + w * 4], np.uint8)
            rgbe[y] = row.reshape(w, 4)
            pos += w * 4
            continue
        scan_w = (buf[pos + 2] << 8) | buf[pos + 3]
        if scan_w != w:
            raise ValueError("HDR scanline width mismatch")
        pos += 4
        for ch in range(4):
            x = 0
            while x < w:
                count = buf[pos]
                pos += 1
                if count > 128:  # run
                    rgbe[y, x:x + count - 128, ch] = buf[pos]
                    pos += 1
                    x += count - 128
                else:  # literal
                    rgbe[y, x:x + count, ch] = np.frombuffer(
                        buf[pos:pos + count], np.uint8)
                    pos += count
                    x += count

    mantissa = rgbe[..., :3].astype(np.float32)
    exponent = rgbe[..., 3].astype(np.int32)
    scale = np.ldexp(1.0, exponent - 136).astype(np.float32)  # 128 + 8
    out = mantissa * scale[..., None]
    out[exponent == 0] = 0.0
    return out.astype(np.float32)
