"""Stdlib PNG decoding (no PIL): chunk walk + zlib inflate + scanline
unfiltering, for the multimodal image stages (VERDICT r1 item 8 — the
most common real image case no longer needs the PIL gate).

Scope (round 4 widened from 8-bit/interlace-0): bit depths 1/2/4/8/16
(16-bit downscales to the high byte; sub-8-bit gray scales to full
range), color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
6 (RGBA), and BOTH interlace methods (0 and Adam7 — each of the 7
passes is an independently filtered sub-image scattered back onto the
output grid). Output is always 8-bit. JPEG/webp stay behind the PIL
gate in ``stages/multimodal.py``.
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


def _stride(width: int, ch: int, depth: int) -> int:
    return (width * ch * depth + 7) // 8


def _expand_rows(rows: np.ndarray, width: int, ch: int, depth: int) -> np.ndarray:
    """Unfiltered scanline bytes (h, stride) -> (h, width, ch) u8
    samples. 16-bit takes the high byte (big-endian); sub-8-bit gray
    scales to full 8-bit range (palette indices are left as-is by the
    caller's LUT)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : width * ch].reshape(h, width, ch)
    if depth == 16:
        return rows[:, : width * ch * 2].reshape(h, width, ch, 2)[:, :, :, 0]
    bits = np.unpackbits(rows, axis=1)
    samples = bits.reshape(h, -1, depth) @ (1 << np.arange(depth - 1, -1, -1))
    return samples[:, : width * ch].reshape(h, width, ch).astype(np.uint8)


_ADAM7 = (  # x0, y0, dx, dy per pass
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """PNG bytes -> (width, height, channels, pixels[h, w, channels] u8).
    Palette images are expanded to RGB; 16-bit downscales to 8."""
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
    if ctype not in _CHANNELS or interlace not in (0, 1):
        raise NotImplementedError(
            f"PNG colortype={ctype} interlace={interlace} unsupported"
        )
    if depth not in (8, 16) and not (depth in (1, 2, 4) and ctype in (0, 3)):
        raise NotImplementedError(
            f"PNG depth={depth} colortype={ctype}: sub-8-bit is only "
            "defined for gray/palette"
        )
    ch = _CHANNELS[ctype]
    bpp = max(1, ch * depth // 8)  # the filter unit, in bytes
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"malformed PNG IDAT stream: {e}") from e

    if interlace == 0:
        stride = _stride(width, ch, depth)
        if len(raw) != height * (stride + 1):
            raise ValueError("PNG data length mismatch (truncated?)")
        px = _expand_rows(_unfilter(raw, height, stride, bpp), width, ch, depth)
    else:  # Adam7: 7 independently-filtered sub-images
        px = np.zeros((height, width, ch), np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = _stride(pw, ch, depth)
            need = ph * (stride + 1)
            if pos + need > len(raw):
                raise ValueError("PNG Adam7 data truncated")
            sub = _expand_rows(
                _unfilter(raw[pos : pos + need], ph, stride, bpp), pw, ch, depth
            )
            pos += need
            px[y0::dy, x0::dx] = sub
        if pos != len(raw):
            raise ValueError("PNG Adam7 data length mismatch")

    # scale sub-8-bit GRAY to full range (255/(2^d - 1) is integral);
    # palette indices must stay raw for the LUT
    if depth in (1, 2, 4) and ctype == 0:
        px = (px.astype(np.uint16) * (255 // ((1 << depth) - 1))).astype(np.uint8)
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
