"""Stdlib TIFF codec (no PIL) for the multimodal image stages.

TIFF dominates scanned-document corpora (the reference's OCR inputs are
exactly this shape), so the common baseline profile decodes in-repo:

- both byte orders (``II``/``MM``), classic (non-Big) TIFF;
- 8-bit samples, grayscale (1 sample), RGB (3), RGBA (4, alpha
  dropped), and palette-color via ColorMap;
- strip organization (any RowsPerStrip), PlanarConfiguration 1;
- Compression 1 (none), 5 (TIFF-variant LZW: MSB-first bit order and
  the "early change" width bump, unlike GIF's LSB-first), and 32773
  (PackBits RLE); Predictor 2 (horizontal differencing) for LZW;
- BILEVEL (1-bit) scanned pages: uncompressed packed bits, CCITT
  Modified Huffman (compression 2) and Group 4 / T.6 MMR (compression
  4) via ``core.ccitt``, honoring FillOrder 2 and both
  PhotometricInterpretation senses — the classic fax-scan profile.

Tiles, 4/16-bit samples and JPEG-in-TIFF raise
``NotImplementedError``; malformed bytes raise ``ValueError`` (the
png/gif/bmp contract). ``encode_tiff`` writes the fixture profile
(uncompressed / LZW+predictor / G4 / MH, gray / RGB, configurable
RowsPerStrip). Reference analogue: OpenCV's unconditional decode
(``scripts/extract_images.py``).
"""

from __future__ import annotations

import struct

import numpy as np


def is_tiff(data: bytes) -> bool:
    return data[:4] in (b"II*\x00", b"MM\x00*")


# ------------------------------------------------------------- LZW (TIFF)

_CLEAR, _EOI = 256, 257


def _tiff_lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF LZW (spec §13): MSB-first codes, 9->12 bits with the EARLY
    width change (grow when the next entry would be table slot
    ``(1 << width) - 1``)."""
    bits = np.unpackbits(np.frombuffer(data, np.uint8))
    pos, nbits = 0, len(bits)
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while len(out) < max_out:
        if pos + width > nbits:
            raise ValueError("TIFF: LZW stream truncated")
        code = int(
            bits[pos : pos + width] @ (1 << np.arange(width - 1, -1, -1, dtype=np.int64))
        )
        pos += width
        if code == _CLEAR:
            reset()
            continue
        if code == _EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("TIFF: first LZW code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and code < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF: LZW code out of range")
        out += entry
        prev = entry
        # EARLY CHANGE: the width grows one code sooner than GIF
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out[:max_out])


def _tiff_lzw_encode(raw: bytes) -> bytes:
    codes: list[tuple[int, int]] = []
    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    codes.append((_CLEAR, width))
    seq = b""
    for bv in raw:
        nxt = seq + bytes([bv])
        if nxt in table:
            seq = nxt
            continue
        codes.append((table[seq], width))
        if next_code < 4094:  # leave room: encoder resets before full
            table[nxt] = next_code
            next_code += 1
            # decoder trails by one entry AND changes early: both
            # cancel to "grow when next_code passes (1<<width) - 1"
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            codes.append((_CLEAR, width))
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        seq = bytes([bv])
    if seq:
        codes.append((table[seq], width))
    codes.append((_EOI, width))
    buf = bytearray()
    acc = n_acc = 0
    for code, w in codes:
        acc = (acc << w) | code
        n_acc += w
        while n_acc >= 8:
            buf.append((acc >> (n_acc - 8)) & 0xFF)
            n_acc -= 8
    if n_acc:
        buf.append((acc << (8 - n_acc)) & 0xFF)
    return bytes(buf)


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < max_out:
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1
            if i + h + 1 > n:
                raise ValueError("TIFF: PackBits literal truncated")
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if i >= n:
                raise ValueError("TIFF: PackBits repeat truncated")
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op
    if len(out) < max_out:
        raise ValueError("TIFF: PackBits ended early")
    return bytes(out[:max_out])


# --------------------------------------------------------------- container

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd(data: bytes, e: str):
    if len(data) < 8:
        raise ValueError("TIFF: truncated header")
    (off,) = struct.unpack(e + "I", data[4:8])
    if off + 2 > len(data):
        raise ValueError("TIFF: IFD offset out of range")
    (n_entries,) = struct.unpack(e + "H", data[off : off + 2])
    tags: dict[int, list] = {}
    for i in range(n_entries):
        p = off + 2 + i * 12
        if p + 12 > len(data):
            raise ValueError("TIFF: IFD entry out of range")
        tag, typ, count = struct.unpack(e + "HHI", data[p : p + 8])
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            payload = data[p + 8 : p + 8 + size]
        else:
            (voff,) = struct.unpack(e + "I", data[p + 8 : p + 12])
            payload = data[voff : voff + size]
            if len(payload) != size:
                raise ValueError("TIFF: tag payload out of range")
        if typ == 3:
            vals = list(struct.unpack(e + "H" * count, payload))
        elif typ == 4:
            vals = list(struct.unpack(e + "I" * count, payload))
        elif typ == 1:
            vals = list(payload)
        else:  # rational/ascii/etc — not needed for the pixel path
            vals = [payload]
        tags[tag] = vals
    return tags


_BITREV = np.packbits(
    np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1)[:, ::-1], axis=1
)[:, 0]


def _decode_bilevel(data, tags, w, h, comp, photo, fill_order):
    """1-bit strips: uncompressed packed bits, CCITT MH (compression 2)
    or G4 (compression 4). Fax 'black' bits map to gray via
    PhotometricInterpretation (0 = WhiteIsZero, the fax default)."""
    from .ccitt import g4_decode, mh_decode

    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF: missing/mismatched strip offsets or byte counts")
    rows_per_strip = tags.get(278, [h])[0]
    rows_left = h
    parts = []
    for soff, scnt in zip(offsets, counts):
        raw = data[soff : soff + scnt]
        if len(raw) != scnt:
            raise ValueError("TIFF: strip out of range")
        if fill_order == 2:  # LSB-first bit fill: reverse each byte
            raw = _BITREV[np.frombuffer(raw, np.uint8)].tobytes()
        n_rows = min(rows_per_strip, rows_left)
        rows_left -= n_rows
        if comp == 4:
            bits = g4_decode(raw, w, n_rows)
        elif comp == 2:
            bits = mh_decode(raw, w, n_rows)
        else:
            stride = (w + 7) // 8
            if len(raw) < stride * n_rows:
                raise ValueError("TIFF: bilevel strip short")
            rows = np.frombuffer(raw[: stride * n_rows], np.uint8).reshape(
                n_rows, stride
            )
            bits = np.unpackbits(rows, axis=1)[:, :w]
        parts.append(bits)
    bits = np.concatenate(parts, axis=0)
    # photo 0 (WhiteIsZero): stored 1 = black -> gray 0; photo 1 inverts
    px = (255 * (1 - bits if photo == 0 else bits)).astype(np.uint8)
    return w, h, 1, px


def decode_tiff(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """TIFF bytes -> ``(w, h, ch, pixels)`` with pixels ``(h, w)`` u8
    gray or ``(h, w, 3)`` u8 RGB (the ``decode_png`` shape family)."""
    if not is_tiff(data):
        raise ValueError("not a TIFF (bad magic)")
    e = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, e)

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF: required tag {tag} missing")
            return default
        return v[0]

    w, h = one(256), one(257)
    if w <= 0 or h <= 0 or w * h > 500_000_000:
        raise ValueError(f"TIFF: bad dimensions {w}x{h}")
    spp = one(277, 1)
    bps = tags.get(258, [8])
    comp = one(259, 1)
    photo = one(262, 1)
    planar = one(284, 1)
    predictor = one(317, 1)
    fill_order = one(266, 1)
    if planar != 1:
        raise NotImplementedError("TIFF: PlanarConfiguration 2")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("TIFF: tiled organization")
    if bps == [1] and spp == 1 and comp in (1, 2, 4):
        return _decode_bilevel(data, tags, w, h, comp, photo, fill_order)
    if any(b != 8 for b in bps):
        raise NotImplementedError(
            f"TIFF: {bps}-bit samples (8-bit, or 1-bit bilevel "
            "none/MH/G4, supported)"
        )
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF: compression {comp} (none/LZW/PackBits, or CCITT "
            "MH/G4 for bilevel, supported)"
        )
    if spp not in (1, 3, 4):
        raise NotImplementedError(f"TIFF: {spp} samples per pixel")

    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF: missing/mismatched strip offsets or byte counts")
    rows_per_strip = one(278, h)
    row_bytes = w * spp
    rows_left = h
    parts = []
    for soff, scnt in zip(offsets, counts):
        raw = data[soff : soff + scnt]
        if len(raw) != scnt:
            raise ValueError("TIFF: strip out of range")
        n_rows = min(rows_per_strip, rows_left)
        rows_left -= n_rows
        want = n_rows * row_bytes
        if comp == 1:
            if len(raw) < want:
                raise ValueError("TIFF: uncompressed strip short")
            chunk = raw[:want]
        elif comp == 5:
            chunk = _tiff_lzw_decode(raw, want)
        else:
            chunk = _packbits_decode(raw, want)
        arr = np.frombuffer(chunk, np.uint8).reshape(n_rows, w, spp)
        if predictor == 2:
            # horizontal differencing is mod-256; int64 accumulator
            # (uint16 would overflow past 257 columns)
            arr = (np.cumsum(arr.astype(np.int64), axis=1) & 0xFF).astype(np.uint8)
        elif predictor != 1:
            raise NotImplementedError(f"TIFF: predictor {predictor}")
        parts.append(arr)
    px = np.concatenate(parts, axis=0)
    if spp == 1:
        if photo == 0:  # WhiteIsZero
            px = 255 - px
        if photo == 3:  # palette: ColorMap is 3*2^bits uint16s
            cmap = tags.get(320)
            if not cmap or len(cmap) < 3 * 256:
                raise ValueError("TIFF: palette image without a full ColorMap")
            lut = (np.asarray(cmap[: 3 * 256], np.uint32).reshape(3, 256) >> 8).astype(
                np.uint8
            )
            return w, h, 3, np.ascontiguousarray(lut.T[px[:, :, 0]])
        return w, h, 1, px[:, :, 0]
    return w, h, 3, np.ascontiguousarray(px[:, :, :3])  # drop alpha if present


def encode_tiff(
    pixels: np.ndarray, *, compression: str = "none",
    predictor: bool = False, rows_per_strip: int | None = None,
) -> bytes:
    """``(h, w)`` gray or ``(h, w, 3)`` RGB uint8 -> classic
    little-endian TIFF (fixture producer). ``compression``: ``'none'``
    or ``'lzw'``; ``predictor`` applies horizontal differencing (LZW
    only, per spec)."""
    px = np.asarray(pixels, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    if spp not in (1, 3):
        raise ValueError("encode_tiff expects gray or RGB")
    if compression not in ("none", "lzw", "g4", "mh"):
        raise ValueError(f"compression {compression!r}")
    if predictor and compression != "lzw":
        raise ValueError("predictor requires lzw")
    rps = rows_per_strip or h
    bilevel = compression in ("g4", "mh")
    if bilevel:
        if spp != 1:
            raise ValueError("CCITT compression is bilevel: pass (h, w) gray")
        from .ccitt import g4_encode, mh_encode

        # fax sense: 1 = black; threshold gray at 128, WhiteIsZero
        bits = (px[:, :, 0] < 128).astype(np.uint8)
        enc = g4_encode if compression == "g4" else mh_encode
        strips = [bits[r0 : r0 + rps] for r0 in range(0, h, rps)]
        strips = [enc(s) for s in strips]
    else:
        strips = []
        for r0 in range(0, h, rps):
            chunk = px[r0 : r0 + rps]
            if predictor:
                d = chunk.astype(np.int16)
                d[:, 1:] -= chunk[:, :-1].astype(np.int16)
                chunk = (d & 0xFF).astype(np.uint8)
            raw = chunk.tobytes()
            strips.append(_tiff_lzw_encode(raw) if compression == "lzw" else raw)

    entries = []  # (tag, type, count, value_or_bytes)
    def short(tag, v):
        entries.append((tag, 3, 1, struct.pack("<HH", v, 0)))

    def long_(tag, v):
        entries.append((tag, 4, 1, struct.pack("<I", v)))

    short(256, w)
    short(257, h)
    if bilevel:
        short(258, 1)
    elif spp == 1:
        short(258, 8)
    else:
        entries.append((258, 3, 3, struct.pack("<HHH", 8, 8, 8)))
    short(259, {"none": 1, "lzw": 5, "mh": 2, "g4": 4}[compression])
    # WhiteIsZero for fax (the CCITT default), else BlackIsZero / RGB
    short(262, 0 if bilevel else (1 if spp == 1 else 2))
    entries.append((273, 4, len(strips), None))  # patched below
    short(277, spp)
    short(278, rps)
    entries.append((279, 4, len(strips), None))
    short(284, 1)
    if predictor:
        short(317, 2)
    entries.sort(key=lambda x: x[0])

    n = len(entries)
    ifd_off = 8
    ifd_size = 2 + n * 12 + 4
    # out-of-line payload area follows the IFD, strips follow it
    payload_off = ifd_off + ifd_size
    payloads = []
    pos = payload_off
    fixed = []
    for tag, typ, count, val in entries:
        if tag in (273, 279):
            size = 4 * len(strips)
            fixed.append((tag, typ, count, ("ptr", pos) if size > 4 else ("inl", None)))
            if size > 4:
                payloads.append((pos, None, tag))
                pos += size
        elif val is not None and len(val) > 4:
            fixed.append((tag, typ, count, ("ptr", pos)))
            payloads.append((pos, val, tag))
            pos += len(val)
        else:
            fixed.append((tag, typ, count, ("val", val)))
    strip_off0 = pos
    offs, cnts = [], []
    p = strip_off0
    for s in strips:
        offs.append(p)
        cnts.append(len(s))
        p += len(s)

    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n)
    for tag, typ, count, (kind, v) in fixed:
        out += struct.pack("<HHI", tag, typ, count)
        if kind == "val":
            out += (v + b"\x00\x00\x00\x00")[:4]
        elif kind == "ptr":
            out += struct.pack("<I", v)
        else:  # inline strip offset/count (single strip)
            out += struct.pack("<I", offs[0] if tag == 273 else cnts[0])
    out += struct.pack("<I", 0)  # next IFD
    for pos_, val, tag in payloads:
        assert len(out) == pos_, (len(out), pos_, tag)
        if val is None:
            arr = offs if tag == 273 else cnts
            out += struct.pack(f"<{len(arr)}I", *arr)
        else:
            out += val
    for s in strips:
        out += s
    return bytes(out)
