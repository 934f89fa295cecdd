"""Stdlib GIF codec (no PIL): LZW decompression, interlacing,
transparency and multi-frame animation, for the multimodal stages.

Like ``core.png`` / ``core.jpeg``: a very common real web format
decodes without any external library, shrinking the honest
``NotImplementedError`` gate in ``stages.multimodal``. Reference
analogue: OpenCV's unconditional ``imdecode`` in the reference's image
pipeline (``scripts/extract_images.py``).

Scope:

- GIF87a and GIF89a; global and local color tables; interlaced and
  sequential images; graphic-control transparency; animation frames
  with disposal methods 0/1 (leave), 2 (restore background) and 3
  (treated as 1 — "restore previous" is vanishingly rare and a frame
  copy per frame would double memory for no fixture value, noted
  loud here).
- ``decode_gif``           first frame composited on the logical
                           screen -> ``(w, h, 3, pixels)`` (the
                           ``core.png.decode_png`` shape).
- ``decode_gif_frames``    all frames -> ``(w, h, [frame, ...])``,
                           each frame an ``(h, w, 3)`` uint8 canvas
                           snapshot (what a player would show).
- ``encode_gif``           fixture encoder over INDEXED input (list of
                           ``(h, w)`` uint8 index arrays + an
                           ``(n, 3)`` palette) — no color quantization
                           by design; supports interlace and a
                           transparent index so every decoder branch
                           has an in-repo producer.

Error contract: ``ValueError`` for malformed bytes (same as png/wav).
"""

from __future__ import annotations

import struct

import numpy as np


def is_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


# ------------------------------------------------------------------ LZW


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: variable 3..12-bit codes, CLEAR/EOI, early
    table growth. Returns exactly ``n_pixels`` indices (uint8)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"GIF: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader over the whole sub-block-joined stream, LSB first
    bits = np.unpackbits(
        np.frombuffer(data, np.uint8)[:, None], axis=1, bitorder="little"
    ).ravel()
    out = np.empty(n_pixels, np.uint8)
    n_out = 0
    pos = 0
    nbits = len(bits)

    def reset_table():
        return (
            [bytes([i]) for i in range(clear)] + [b"", b""],
            min_code_size + 1,
        )

    table, width = reset_table()
    prev: bytes | None = None
    while n_out < n_pixels:
        if pos + width > nbits:
            raise ValueError("GIF: LZW stream truncated")
        code = int(bits[pos : pos + width] @ (1 << np.arange(width, dtype=np.int64)))
        pos += width
        if code == clear:
            table, width = reset_table()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF: first LZW code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # full table: encoder stopped adding too
                table.append(prev + entry[:1])
        elif code == len(table) and code < 4096:  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF: LZW code out of range")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n_out < n_pixels:
        raise ValueError(f"GIF: LZW ended early ({n_out}/{n_pixels} pixels)")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW compression (fixture encoder): emits CLEAR when
    the table reaches 4096 codes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[int] = []  # (code, width) flattened via append

    codes: list[tuple[int, int]] = []

    def emit(code: int, width: int):
        codes.append((code, width))

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    seq = b""
    for b in indices.astype(np.uint8).tobytes():
        nxt = seq + bytes([b])
        if nxt in table:
            seq = nxt
            continue
        emit(table[seq], width)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            # the decoder's table trails ours by one entry (it appends
            # only from the second code on), so it grows width one code
            # later than a naive == (1 << width) check would: grow when
            # next_code passes the boundary, not when it reaches it
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # table full: reset both sides
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = bytes([b])
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    # pack LSB-first
    buf = bytearray()
    acc = n_acc = 0
    for code, w in codes:
        acc |= code << n_acc
        n_acc += w
        while n_acc >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8
    if n_acc:
        buf.append(acc & 0xFF)
    return bytes(buf)


# ------------------------------------------------------------ container

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_rows(h: int) -> np.ndarray:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return np.asarray(rows, np.int64)


def _parse(data: bytes):
    """Yield the decoded frames; shared by both public decoders."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("GIF: truncated header")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8)
        if len(gct) != 3 * n:
            raise ValueError("GIF: truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    if w == 0 or h == 0:
        raise ValueError("GIF: zero logical screen size")

    # canvas starts as background color (or black without a GCT)
    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    bg_rgb = canvas[0, 0].copy()

    transparent = -1
    disposal = 0

    def sub_blocks(p: int) -> tuple[bytes, int]:
        parts = []
        while True:
            if p >= len(data):
                raise ValueError("GIF: truncated sub-blocks")
            n = data[p]
            p += 1
            if n == 0:
                return b"".join(parts), p
            parts.append(data[p : p + n])
            if len(parts[-1]) != n:
                raise ValueError("GIF: truncated sub-block")
            p += n

    frames = []
    while True:
        if pos >= len(data):
            break  # missing trailer: accept what we have if any frame decoded
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("GIF: truncated extension")
            label = data[pos]
            pos += 1
            body, pos = sub_blocks(pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                gflags = body[0]
                disposal = (gflags >> 2) & 7
                transparent = body[3] if gflags & 1 else -1
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(data):
            raise ValueError("GIF: truncated image descriptor")
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            ct = np.frombuffer(data[pos : pos + 3 * n], np.uint8)
            if len(ct) != 3 * n:
                raise ValueError("GIF: truncated local color table")
            ct = ct.reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF: image without any color table")
        if ix + iw > w or iy + ih > h:
            raise ValueError("GIF: frame outside logical screen")
        if pos >= len(data):
            raise ValueError("GIF: truncated image data")
        min_code = data[pos]
        pos += 1
        lzw, pos = sub_blocks(pos)
        idx = _lzw_decode(min_code, lzw, iw * ih).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows arrive pass-ordered
            dest = np.empty_like(idx)
            dest[_deinterlace_rows(ih)] = idx
            idx = dest
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF: pixel index outside color table")
        rgb = ct[idx]
        region = canvas[iy : iy + ih, ix : ix + iw]
        if transparent >= 0:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        # disposal AFTER the frame is shown: 2 restores background in
        # the frame rect; 0/1 leave the canvas; 3 treated as leave
        if disposal == 2:
            canvas[iy : iy + ih, ix : ix + iw] = bg_rgb
        transparent = -1
        disposal = 0
    if not frames:
        raise ValueError("GIF: no image frames")
    return w, h, frames


def decode_gif(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """First frame -> ``(w, h, 3, pixels)`` (the decode_png shape)."""
    w, h, frames = _parse(data)
    return w, h, 3, frames[0]


def decode_gif_frames(data: bytes) -> tuple[int, int, list[np.ndarray]]:
    """All frames -> ``(w, h, [canvas, ...])``, each ``(h, w, 3)``."""
    return _parse(data)


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    palette: np.ndarray,
    *,
    interlace: bool = False,
    transparent: int | None = None,
    delay_cs: int = 4,
) -> bytes:
    """Fixture encoder over indexed input: ``frames`` is one ``(h, w)``
    uint8 index array or a list of them (animation), ``palette`` is
    ``(n, 3)`` uint8 with n a power of two in [2, 256]. No quantizer by
    design — callers hand in indices, so decode(encode(x)) is exact."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    palette = np.asarray(palette, np.uint8)
    n = len(palette)
    if n < 2 or n > 256 or n & (n - 1):
        raise ValueError("palette size must be a power of two in [2, 256]")
    depth = n.bit_length() - 1  # log2(n)
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette.tobytes()
    if len(frames) > 1:  # Netscape loop extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, depth)
    for fr in frames:
        fr = np.asarray(fr, np.uint8)
        if fr.shape != (h, w):
            raise ValueError("all frames must share the first frame's shape")
        if int(fr.max(initial=0)) >= n:
            raise ValueError("frame index outside palette")
        gflags = 0x04  # disposal 1 (leave)
        tidx = 0
        if transparent is not None:
            gflags |= 1
            tidx = transparent
        out += b"\x21\xf9\x04" + struct.pack("<BHB", gflags, delay_cs, tidx) + b"\x00"
        iflags = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
        rows = fr[_deinterlace_rows(h)] if interlace else fr
        out.append(min_code)
        lzw = _lzw_encode(rows.ravel(), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
