"""Stdlib BMP codec (no PIL) for the multimodal image stages.

Scope: the formats that dominate real BMP files — BITMAPINFOHEADER
(and the V4/V5 supersets, which only extend the header), uncompressed
``BI_RGB``, 24-bit truecolor and 8-bit palette, bottom-up (positive
height) and top-down (negative height) row order, 4-byte row padding.
RLE / 16-bit / 32-bit BI_BITFIELDS raise ``NotImplementedError``;
malformed bytes raise ``ValueError`` (the png/gif/wav contract).

``encode_bmp`` writes 24-bit bottom-up BI_RGB (the fixture producer).
Reference analogue: OpenCV's unconditional ``imdecode``
(``scripts/extract_images.py``).
"""

from __future__ import annotations

import struct

import numpy as np


def is_bmp(data: bytes) -> bool:
    return data[:2] == b"BM"


def decode_bmp(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """BMP bytes -> ``(w, h, 3, pixels)`` with pixels ``(h, w, 3)``
    uint8 RGB (the ``decode_png`` shape)."""
    if not is_bmp(data):
        raise ValueError("not a BMP (bad magic)")
    if len(data) < 54:
        raise ValueError("BMP: truncated header")
    offset = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise NotImplementedError(f"BMP: BITMAPCOREHEADER ({hdr_size}) unsupported")
    w, h_raw = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    compression = struct.unpack("<I", data[30:34])[0]
    n_colors = struct.unpack("<I", data[46:50])[0]
    if w <= 0 or h_raw == 0:
        raise ValueError(f"BMP: bad dimensions {w}x{h_raw}")
    if planes != 1:
        raise ValueError(f"BMP: planes must be 1, got {planes}")
    if compression != 0:
        raise NotImplementedError(f"BMP: compression {compression} (only BI_RGB)")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw

    if bpp == 24:
        palette = None
    elif bpp == 8:
        n = n_colors or 256
        pal_off = 14 + hdr_size
        raw = np.frombuffer(data[pal_off : pal_off + 4 * n], np.uint8)
        if len(raw) != 4 * n:
            raise ValueError("BMP: truncated palette")
        palette = raw.reshape(n, 4)[:, 2::-1]  # BGRX -> RGB
    else:
        raise NotImplementedError(f"BMP: {bpp}-bit (only 8/24-bit BI_RGB)")

    bytes_per_px = bpp // 8
    stride = (w * bytes_per_px + 3) & ~3
    body = np.frombuffer(data[offset : offset + stride * h], np.uint8)
    if len(body) != stride * h:
        raise ValueError("BMP: truncated pixel data")
    rows = body.reshape(h, stride)[:, : w * bytes_per_px]
    if not top_down:
        rows = rows[::-1]
    if palette is None:
        px = rows.reshape(h, w, 3)[:, :, ::-1].copy()  # BGR -> RGB
    else:
        idx = rows.reshape(h, w)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("BMP: pixel index outside palette")
        px = palette[idx]
    return w, h, 3, np.ascontiguousarray(px)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """``(h, w, 3)`` RGB or ``(h, w)`` gray uint8 -> 24-bit bottom-up
    BI_RGB BMP bytes."""
    px = np.asarray(pixels, np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3) or (h, w)")
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    body = rows.tobytes()
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body
