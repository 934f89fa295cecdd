"""Stdlib PNG decoding (no PIL): chunk walk + zlib inflate + scanline
unfiltering, for the multimodal image stages (VERDICT r1 item 8 — the
most common real image case no longer needs the PIL gate).

Scope: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), interlace 0. Anything else raises
``NotImplementedError`` (16-bit / Adam7 are rare in web-crawl thumbs
and DO need a real codec); JPEG stays behind the PIL gate in
``stages/multimodal.py``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_SIGNATURE


def _chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (spec §6): returns (h, stride) u8.
    Up/None are vectorized; Sub/Average/Paeth are inherently sequential
    per byte — fine at thumbnail scale, and each row is still numpy."""
    out = np.zeros((h, stride), np.uint8)
    pos = 0
    for r in range(h):
        f = raw[pos]
        pos += 1
        line = np.frombuffer(raw[pos : pos + stride], np.uint8).copy()
        pos += stride
        prev = out[r - 1] if r else np.zeros(stride, np.uint8)
        if f == 0:  # None
            recon = line
        elif f == 2:  # Up (uint8 addition wraps mod 256 — spec arithmetic)
            recon = line + prev
        elif f == 1:  # Sub
            recon = line
            for i in range(bpp, stride):
                recon[i] = (int(recon[i]) + int(recon[i - bpp])) & 0xFF
        elif f == 3:  # Average
            recon = line
            for i in range(stride):
                left = int(recon[i - bpp]) if i >= bpp else 0
                recon[i] = (int(recon[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            recon = line
            for i in range(stride):
                a = int(recon[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                recon[i] = (int(recon[i]) + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {f}")
        out[r] = recon
    return out


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """PNG bytes -> (width, height, channels, pixels[h, w, channels] u8).
    Palette images are expanded to RGB."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    depth = ctype = interlace = None
    palette: np.ndarray | None = None
    idat: list[bytes] = []
    try:
        for name, body in _chunks(data):
            if name == b"IHDR":
                width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
            elif name == b"PLTE":
                palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
            elif name == b"IDAT":
                idat.append(body)
    except (struct.error, ValueError) as e:
        # truncated/garbled chunk stream -> ONE error type for callers
        raise ValueError(f"malformed PNG chunk stream: {e}") from e
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if depth != 8 or interlace != 0 or ctype not in _CHANNELS:
        raise NotImplementedError(
            f"PNG depth={depth} colortype={ctype} interlace={interlace}: "
            "only 8-bit non-interlaced gray/RGB/palette/alpha supported"
        )
    ch = _CHANNELS[ctype]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"malformed PNG IDAT stream: {e}") from e
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch (truncated?)")
    px = _unfilter(raw, height, stride, ch).reshape(height, width, ch)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        if int(px.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        px = palette[px[:, :, 0]]
        ch = 3
    return width, height, ch, px


def encode_png(px: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0 rows) — the decoder's test partner
    and a real sink for synthetic image outputs. px: (h, w) or
    (h, w, ch) u8 with ch in {1, 3, 4}."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    rows = b"".join(b"\x00" + px[r].tobytes() for r in range(h))

    def chunk(name: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + name + body
            + struct.pack(">I", zlib.crc32(name + body) & 0xFFFFFFFF)
        )

    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )
