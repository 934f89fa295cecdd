"""Stdlib TIFF codec (no PIL) for the multimodal image stages.

TIFF dominates scanned-document corpora (the reference's OCR inputs are
exactly this shape), so the common baseline profile decodes in-repo:

- both byte orders (``II``/``MM``), classic (non-Big) TIFF;
- 8-bit and 16-bit samples (16-bit honors the file's byte order,
  predictor 2 differences whole sample values, and the high byte
  downscales to u8 — the decode_png rule), grayscale (1 sample),
  RGB (3), RGBA (4, alpha dropped), and palette-color via ColorMap;
- strip AND tile organization (TileWidth/TileLength/TileOffsets,
  edge tiles padded per spec §15 and cropped on decode),
  PlanarConfiguration 1;
- Compression 1 (none), 5 (TIFF-variant LZW: MSB-first bit order and
  the "early change" width bump, unlike GIF's LSB-first), 8/32946
  (Deflate, zlib), 32773 (PackBits RLE), and 7 (new-style JPEG: each
  strip/tile is a standalone JPEG stream decoded by ``core.jpeg``,
  with shared quantization/Huffman tables spliced in from the
  JPEGTables tag 347 when present); Predictor 2 (horizontal
  differencing) for LZW/Deflate;
- BILEVEL (1-bit) scanned pages, strips or tiles: uncompressed packed
  bits, CCITT Modified Huffman (compression 2) and Group 4 / T.6 MMR
  (compression 4) via ``core.ccitt``, honoring FillOrder 2 and both
  PhotometricInterpretation senses — the classic fax-scan profile.
  Each tile is an independently coded rectangle (spec §15).
- OLD-style JPEG (compression 6, TIFF 6.0 §22): the dominant
  real-world profile — one full interchange stream addressed by
  JPEGInterchangeFormat/Length (tags 513/514) — decodes through
  ``core.jpeg``; the deprecated per-strip variant (517/519/520 table
  tags, killed by TIFF TN2) stays honestly gated.

4-bit samples, 16-bit JPEG/palette and per-strip old-style JPEG
raise ``NotImplementedError``; malformed bytes raise ``ValueError``
(the png/gif/bmp contract). ``encode_tiff`` writes the fixture
profile (uncompressed / LZW+predictor / Deflate / JPEG, optionally
via a shared JPEGTables tag or as an old-style tag-513 stream /
G4 / MH; gray / RGB; strips or tiles).
Reference analogue: OpenCV's unconditional decode
(``scripts/extract_images.py``).
"""

from __future__ import annotations

import struct
import zlib

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


# --------------------------------------------------------- JPEG-in-TIFF


def _jpeg_splice_tables(tables: bytes, seg: bytes) -> bytes:
    """Merge a JPEGTables (tag 347) abbreviated stream with a
    table-less strip/tile stream into one decodable JPEG (TIFF TN2:
    tables stream is SOI..tables..EOI; the segment is SOI..frame)."""
    if tables[:2] != b"\xff\xd8" or seg[:2] != b"\xff\xd8":
        raise ValueError("TIFF: JPEGTables/segment missing SOI")
    body = tables[2:]
    if body[-2:] == b"\xff\xd9":
        body = body[:-2]
    return b"\xff\xd8" + body + seg[2:]


def _jpeg_split_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Standalone baseline stream -> (abbreviated JPEGTables stream,
    table-less segment stream) — the encoder's tag-347 producer. DQT
    and DHT marker segments move to the tables stream; everything
    else (APPn, SOF, SOS + entropy data + EOI) stays in the segment."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    tables = bytearray()
    rest = bytearray(b"\xff\xd8")
    while pos + 4 <= len(stream):
        if stream[pos] != 0xFF:
            raise ValueError("bad JPEG marker segment")
        marker = stream[pos + 1]
        if marker == 0xDA:  # SOS: entropy-coded data runs to EOI
            rest += stream[pos:]
            return bytes(b"\xff\xd8" + tables + b"\xff\xd9"), bytes(rest)
        (ln,) = struct.unpack(">H", stream[pos + 2 : pos + 4])
        segment = stream[pos : pos + 2 + ln]
        if marker in (0xDB, 0xC4):  # DQT / DHT
            tables += segment
        else:
            rest += segment
        pos += 2 + ln
    raise ValueError("JPEG stream without SOS")


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


def _ints(tags, tag, default=None):
    """Tag payload validated as an integer list (malformed files can
    flip a tag's type field so a numeric tag parses as bytes — the
    skip-row contract demands ValueError, not a TypeError downstream)."""
    v = tags.get(tag)
    if v is None:
        return default
    if not v or not all(isinstance(x, (int, np.integer)) for x in v):
        raise ValueError(
            f"TIFF: tag {tag} has an empty or non-integer payload"
        )
    return v


def _decode_bilevel(data, tags, w, h, comp, photo, fill_order, tiled=False):
    """1-bit strips or tiles: uncompressed packed bits, CCITT MH
    (compression 2) or G4 (compression 4). Each segment (strip or tile)
    is an independently coded rectangle; edge tiles are full-size in
    the file and cropped here (spec §15). Fax 'black' bits map to gray
    via PhotometricInterpretation (0 = WhiteIsZero, the fax default)."""
    from .ccitt import g4_decode, mh_decode

    def seg_bits(raw: bytes, n_rows: int, seg_w: int) -> np.ndarray:
        if fill_order == 2:  # LSB-first bit fill: reverse each byte
            raw = _BITREV[np.frombuffer(raw, np.uint8)].tobytes()
        if comp == 4:
            return g4_decode(raw, seg_w, n_rows)
        if comp == 2:
            return mh_decode(raw, seg_w, n_rows)
        stride = (seg_w + 7) // 8
        if len(raw) < stride * n_rows:
            raise ValueError("TIFF: bilevel segment short")
        rows = np.frombuffer(raw[: stride * n_rows], np.uint8).reshape(
            n_rows, stride
        )
        return np.unpackbits(rows, axis=1)[:, :seg_w]

    if tiled:
        tw = _ints(tags, 322, [0])[0]
        tl = _ints(tags, 323, [0])[0]
        if tw <= 0 or tl <= 0:
            raise ValueError(f"TIFF: bad tile size {tw}x{tl}")
        offsets = _ints(tags, 324)
        counts = _ints(tags, 325)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF: missing/mismatched tile offsets or byte counts")
        across = -(-w // tw)
        down = -(-h // tl)
        if len(offsets) != across * down:
            raise ValueError(f"TIFF: {len(offsets)} tiles, expected {across * down}")
        bits = np.zeros((h, w), np.uint8)
        for idx, (soff, scnt) in enumerate(zip(offsets, counts)):
            raw = data[soff : soff + scnt]
            if len(raw) != scnt:
                raise ValueError("TIFF: tile out of range")
            tile = seg_bits(raw, tl, tw)
            ty, tx = (idx // across) * tl, (idx % across) * tw
            bits[ty : ty + tl, tx : tx + tw] = tile[: h - ty, : w - tx]
    else:
        offsets = _ints(tags, 273)
        counts = _ints(tags, 279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF: missing/mismatched strip offsets or byte counts")
        rows_per_strip = _ints(tags, 278, [h])[0]
        rows_left = h
        parts = []
        for soff, scnt in zip(offsets, counts):
            raw = data[soff : soff + scnt]
            if len(raw) != scnt:
                raise ValueError("TIFF: strip out of range")
            n_rows = min(rows_per_strip, rows_left)
            rows_left -= n_rows
            parts.append(seg_bits(raw, n_rows, w))
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
        if not v or not isinstance(v[0], (int, np.integer)):
            raise ValueError(
                f"TIFF: tag {tag} has an empty or non-integer payload"
            )
        return v[0]

    w, h = one(256), one(257)
    if w <= 0 or h <= 0 or w * h > 500_000_000:
        raise ValueError(f"TIFF: bad dimensions {w}x{h}")
    spp = one(277, 1)
    bps = _ints(tags, 258, [8])
    comp = one(259, 1)
    photo = one(262, 1)
    planar = one(284, 1)
    predictor = one(317, 1)
    fill_order = one(266, 1)
    if planar != 1:
        raise NotImplementedError("TIFF: PlanarConfiguration 2")
    tiled = 322 in tags or 323 in tags
    if bps == [1] and spp == 1 and comp in (1, 2, 4):
        return _decode_bilevel(data, tags, w, h, comp, photo, fill_order, tiled)
    depth = bps[0]
    if depth not in (8, 16) or any(b != depth for b in bps):
        raise NotImplementedError(
            f"TIFF: {bps}-bit samples (8/16-bit, or 1-bit bilevel "
            "none/MH/G4, supported)"
        )
    if depth == 16 and comp in (6, 7):
        raise NotImplementedError("TIFF: 16-bit JPEG compression")
    if depth == 16 and photo == 3:
        raise NotImplementedError("TIFF: 16-bit palette-color")
    if comp == 6:
        # Old-style JPEG (TIFF 6.0 §22, deprecated by TIFF TN2): the
        # dominant real-world profile stores ONE full interchange
        # stream at JPEGInterchangeFormat (513) / ...Length (514).
        # The per-strip variant driven by the 517/519/520 table tags
        # is the part TN2 killed — honest gate below.
        off = _ints(tags, 513)
        if not off:
            raise NotImplementedError(
                "TIFF: old-style per-strip JPEG (compression 6 without "
                "a JPEGInterchangeFormat stream)"
            )
        ln = _ints(tags, 514, [len(data) - off[0]])[0]
        stream = data[off[0] : off[0] + ln]
        if len(stream) != ln:
            raise ValueError("TIFF: JPEGInterchangeFormat out of range")
        from .jpeg import decode_jpeg

        jw, jh, _jch, jpx = decode_jpeg(stream)
        if (jw, jh) != (w, h):
            raise ValueError(
                f"TIFF: old-JPEG stream is {jw}x{jh}, IFD says {w}x{h}"
            )
        if jpx.ndim == 2:
            jpx = jpx[:, :, None]
        if jpx.shape[2] < spp:
            raise ValueError(
                f"TIFF: old-JPEG stream has {jpx.shape[2]} channels, "
                f"need {spp}"
            )
        if spp == 1:
            return w, h, 1, np.ascontiguousarray(jpx[:, :, 0])
        return w, h, 3, np.ascontiguousarray(jpx[:, :, :3])
    if comp not in (1, 5, 7, 8, 32773, 32946):
        raise NotImplementedError(
            f"TIFF: compression {comp} (none/LZW/JPEG/Deflate/PackBits, "
            "or CCITT MH/G4 for bilevel, supported)"
        )
    if spp not in (1, 3, 4):
        raise NotImplementedError(f"TIFF: {spp} samples per pixel")
    if comp == 7 and predictor == 2:
        raise ValueError("TIFF: predictor with JPEG compression")

    jpeg_tables: bytes | None = None
    if comp == 7 and 347 in tags:
        jt = tags[347]
        # UNDEFINED payload arrives as [bytes]; BYTE as a list of ints
        jpeg_tables = jt[0] if isinstance(jt[0], (bytes, bytearray)) else bytes(jt)

    def seg_pixels(raw: bytes, n_rows: int, seg_w: int) -> np.ndarray:
        """One strip or tile -> (n_rows, seg_w, spp) uint8."""
        if comp == 7:
            from .jpeg import decode_jpeg

            stream = raw if jpeg_tables is None else _jpeg_splice_tables(
                jpeg_tables, raw
            )
            jw, jh, jch, jpx = decode_jpeg(stream)
            if (jh, jw) != (n_rows, seg_w):
                raise ValueError(
                    f"TIFF: JPEG segment is {jw}x{jh}, expected {seg_w}x{n_rows}"
                )
            if jpx.ndim == 2:
                jpx = jpx[:, :, None]
            if jpx.shape[2] < spp:
                raise ValueError(
                    f"TIFF: JPEG segment has {jpx.shape[2]} channels, need {spp}"
                )
            return np.ascontiguousarray(jpx[:, :, :spp])
        want = n_rows * seg_w * spp * (depth // 8)
        if comp == 1:
            if len(raw) < want:
                raise ValueError("TIFF: uncompressed segment short")
            chunk = raw[:want]
        elif comp == 5:
            chunk = _tiff_lzw_decode(raw, want)
        elif comp in (8, 32946):
            try:
                chunk = zlib.decompress(raw)
            except zlib.error as exc:
                raise ValueError(f"TIFF: bad deflate segment: {exc}") from None
            if len(chunk) < want:
                raise ValueError("TIFF: deflate segment short")
            chunk = chunk[:want]
        else:
            chunk = _packbits_decode(raw, want)
        if depth == 16:
            # samples follow the FILE's byte order; predictor 2
            # differences whole 16-bit sample values (spec §14), then
            # the high byte downscales to u8 (the decode_png rule)
            a16 = np.frombuffer(chunk, np.dtype(e + "u2")).reshape(
                n_rows, seg_w, spp
            )
            if predictor == 2:
                a16 = (np.cumsum(a16.astype(np.int64), axis=1) & 0xFFFF).astype(
                    np.uint16
                )
            elif predictor != 1:
                raise NotImplementedError(f"TIFF: predictor {predictor}")
            return (a16 >> 8).astype(np.uint8)
        arr = np.frombuffer(chunk, np.uint8).reshape(n_rows, seg_w, spp)
        if predictor == 2:
            # horizontal differencing is mod-256; int64 accumulator
            # (uint16 would overflow past 257 columns)
            arr = (np.cumsum(arr.astype(np.int64), axis=1) & 0xFF).astype(np.uint8)
        elif predictor != 1:
            raise NotImplementedError(f"TIFF: predictor {predictor}")
        return arr

    if tiled:
        tw, tl = one(322), one(323)
        if tw <= 0 or tl <= 0:
            raise ValueError(f"TIFF: bad tile size {tw}x{tl}")
        offsets = _ints(tags, 324)
        counts = _ints(tags, 325)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF: missing/mismatched tile offsets or byte counts")
        across = -(-w // tw)
        down = -(-h // tl)
        if len(offsets) != across * down:
            raise ValueError(
                f"TIFF: {len(offsets)} tiles, expected {across * down}"
            )
        px = np.zeros((h, w, spp), np.uint8)
        for idx, (soff, scnt) in enumerate(zip(offsets, counts)):
            raw = data[soff : soff + scnt]
            if len(raw) != scnt:
                raise ValueError("TIFF: tile out of range")
            tile = seg_pixels(raw, tl, tw)
            ty, tx = (idx // across) * tl, (idx % across) * tw
            # edge tiles are full-size in the file; crop the padding
            px[ty : ty + tl, tx : tx + tw] = tile[: h - ty, : w - tx]
    else:
        offsets = _ints(tags, 273)
        counts = _ints(tags, 279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF: missing/mismatched strip offsets or byte counts")
        rows_per_strip = one(278, h)
        rows_left = h
        parts = []
        for soff, scnt in zip(offsets, counts):
            raw = data[soff : soff + scnt]
            if len(raw) != scnt:
                raise ValueError("TIFF: strip out of range")
            n_rows = min(rows_per_strip, rows_left)
            rows_left -= n_rows
            parts.append(seg_pixels(raw, n_rows, w))
        px = np.concatenate(parts, axis=0)
    if spp == 1:
        if photo == 0:  # WhiteIsZero
            px = 255 - px
        if photo == 3:  # palette: ColorMap is 3*2^bits uint16s
            cmap = _ints(tags, 320)
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
    tile: tuple[int, int] | None = None, jpeg_tables: bool = False,
    jpeg_quality: int = 85, bit_depth: int = 8, old_style_jpeg: bool = False,
) -> bytes:
    """``(h, w)`` gray or ``(h, w, 3)`` RGB uint8 -> classic
    little-endian TIFF (fixture producer). ``compression``: ``'none'``
    / ``'lzw'`` / ``'deflate'`` / ``'jpeg'`` / ``'g4'`` / ``'mh'``;
    ``predictor`` applies horizontal differencing (LZW/Deflate, per
    spec); ``tile=(tile_h, tile_w)`` writes tiled organization (edge
    tiles zero-padded to full size, spec §15); ``jpeg_tables`` moves
    the shared DQT/DHT segments into a JPEGTables tag (347) and writes
    table-less strips/tiles (TIFF TN2); ``bit_depth=16`` takes uint16
    pixels (decode returns the high byte, the decode_png rule)."""
    if bit_depth not in (8, 16):
        raise ValueError(f"bit_depth {bit_depth}")
    px = np.asarray(pixels, np.uint16 if bit_depth == 16 else np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    if spp not in (1, 3):
        raise ValueError("encode_tiff expects gray or RGB")
    if compression not in ("none", "lzw", "deflate", "jpeg", "g4", "mh"):
        raise ValueError(f"compression {compression!r}")
    if predictor and compression not in ("lzw", "deflate"):
        raise ValueError("predictor requires lzw or deflate")
    if jpeg_tables and compression != "jpeg":
        raise ValueError("jpeg_tables requires compression='jpeg'")
    if bit_depth == 16 and compression in ("jpeg", "g4", "mh"):
        raise ValueError(f"16-bit {compression} is not in the fixture profile")
    bilevel = compression in ("g4", "mh")
    if old_style_jpeg and (
        compression != "jpeg" or tile is not None or jpeg_tables
    ):
        raise ValueError(
            "old_style_jpeg writes one interchange stream: requires "
            "compression='jpeg', no tiles, no jpeg_tables"
        )
    if old_style_jpeg:
        rows_per_strip = None  # one full-image stream at tag 513
    if tile is not None:
        th, tw = tile
        if th <= 0 or tw <= 0:
            raise ValueError(f"bad tile size {tile}")
        # row-major padded full-size tiles (decoder crops the padding);
        # bilevel tiles are g4/mh-coded per tile like any other segment

        chunks = []
        for ty in range(0, h, th):
            for tx in range(0, w, tw):
                c = np.zeros((th, tw, spp), px.dtype)
                part = px[ty : ty + th, tx : tx + tw]
                c[: part.shape[0], : part.shape[1]] = part
                chunks.append(c)
        seg_h, seg_w = th, tw
    else:
        rps = rows_per_strip or h
        chunks = [px[r0 : r0 + rps] for r0 in range(0, h, rps)]
        seg_h, seg_w = rps, w

    table_stream: bytes | None = None
    if bilevel:
        if spp != 1:
            raise ValueError("CCITT compression is bilevel: pass (h, w) gray")
        from .ccitt import g4_encode, mh_encode

        # fax sense: 1 = black; threshold gray at 128, WhiteIsZero
        enc = g4_encode if compression == "g4" else mh_encode
        strips = [enc((c[:, :, 0] < 128).astype(np.uint8)) for c in chunks]
    elif compression == "jpeg":
        from .jpeg import encode_jpeg

        strips = [
            encode_jpeg(c[:, :, 0] if spp == 1 else c, quality=jpeg_quality)
            for c in chunks
        ]
        if jpeg_tables:
            split = [_jpeg_split_tables(s) for s in strips]
            tbls = {t for t, _ in split}
            # one encoder, one quality -> identical tables per segment
            assert len(tbls) == 1, "JPEG segments disagree on tables"
            table_stream = split[0][0]
            strips = [rest for _, rest in split]
    else:
        strips = []
        for chunk in chunks:
            if predictor:
                d = chunk.astype(np.int32)
                d[:, 1:] -= chunk[:, :-1].astype(np.int32)
                if bit_depth == 16:
                    chunk = (d & 0xFFFF).astype(np.uint16)
                else:
                    chunk = (d & 0xFF).astype(np.uint8)
            # file is little-endian (II): 16-bit samples as <u2
            raw = (
                chunk.astype("<u2").tobytes() if bit_depth == 16
                else chunk.tobytes()
            )
            if compression == "lzw":
                raw = _tiff_lzw_encode(raw)
            elif compression == "deflate":
                raw = zlib.compress(raw)
            strips.append(raw)

    # old-style JPEG: the single interchange stream is addressed by
    # JPEGInterchangeFormat/Length (513/514) instead of strip tags
    if old_style_jpeg:
        off_tag, cnt_tag = 513, 514
    else:
        off_tag, cnt_tag = (324, 325) if tile is not None else (273, 279)
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
        short(258, bit_depth)
    else:
        entries.append(
            (258, 3, 3, struct.pack("<HHH", bit_depth, bit_depth, bit_depth))
        )
    short(259, 6 if old_style_jpeg else
          {"none": 1, "lzw": 5, "deflate": 8, "jpeg": 7,
           "mh": 2, "g4": 4}[compression])
    # WhiteIsZero for fax (the CCITT default), YCbCr for color JPEG
    # (what core.jpeg encodes), else BlackIsZero / RGB
    if bilevel:
        short(262, 0)
    elif compression == "jpeg" and spp == 3:
        short(262, 6)
    else:
        short(262, 1 if spp == 1 else 2)
    entries.append((off_tag, 4, len(strips), None))  # patched below
    short(277, spp)
    if tile is not None:
        short(322, seg_w)
        short(323, seg_h)
    else:
        short(278, seg_h)
    entries.append((cnt_tag, 4, len(strips), None))
    short(284, 1)
    if predictor:
        short(317, 2)
    if table_stream is not None:
        entries.append((347, 7, len(table_stream), table_stream))
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
        if tag in (off_tag, cnt_tag):
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
            out += struct.pack("<I", offs[0] if tag == off_tag else cnts[0])
    out += struct.pack("<I", 0)  # next IFD
    for pos_, val, tag in payloads:
        assert len(out) == pos_, (len(out), pos_, tag)
        if val is None:
            arr = offs if tag == off_tag else cnts
            out += struct.pack(f"<{len(arr)}I", *arr)
        else:
            out += val
    for s in strips:
        out += s
    return bytes(out)
