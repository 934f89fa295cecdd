"""Stdlib WebP lossless (VP8L) codec (no PIL) for the multimodal
image stages.

WebP is ~10% of real-web images; the LOSSLESS profile (VP8L) is a
self-contained bitstream — LSB-first bit packing, canonical prefix
codes (RFC 1951 canonicalization), LZ77 over ARGB pixels with a
2-D distance neighborhood map, an ARGB color cache, and four
invertible transforms — all implementable without a codec library:

- container: RIFF/WEBP chunk walk; ``VP8L`` decodes here, ``VP8X``
  extended files are walked to their inner ``VP8L``;
- entropy image (meta prefix groups), color cache (hash
  ``0x1e35a7bd * argb >> (32 - bits)``), LZ77 length/distance prefix
  coding with the 120-entry 2-D neighborhood distance map;
- inverse transforms, applied in reverse read order: PREDICTOR (all
  14 modes, per-block mode image), COLOR (signed ``(t*c) >> 5``
  cross-channel deltas), SUBTRACT-GREEN, COLOR-INDEXING (delta-coded
  palette, sub-byte pixel bundling for palettes <= 16).

Animation (``ANIM``/``ANMF``) composes lossless frames on the canvas
per the container spec (``decode_webp_frames``: background color,
2-px frame offsets, alpha-blend vs overwrite, dispose-to-background)
and feeds FrameSample as a real video branch alongside animated GIF.
Lossy ``VP8 `` (DCT + boolean coder) — still or as animation frames
(with their ``ALPH`` alpha chunks) — raises ``NotImplementedError``,
an honest gate, same contract as arithmetic JPEG; malformed bytes
raise ``ValueError``.

``encode_webp`` writes the fixture profile: literal or greedy
run-length LZ77 (linear-escape distances), per-alphabet canonical
codes (simple 1/2-symbol codes where the histogram allows, else
flat-over-used-symbols normal codes written through the code-length
code), optional subtract-green transform and optional palette
(color-indexing) with bundling. Decode(encode(x)) is exact — the
profile is lossless end to end.

Reference analogue: OpenCV's unconditional ``imdecode``
(``scripts/extract_images.py``); format per the public "WebP Lossless
Bitstream Specification".
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- container


def is_webp(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WEBP"


def _chunks(data: bytes, pos: int, end: int):
    """Yield ``(fourcc, body)`` RIFF sub-chunks in ``data[pos:end]``."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if pos + 8 + size > end:
            raise ValueError("WebP: chunk out of range")
        yield fourcc, body
        pos += 8 + size + (size & 1)  # chunks are even-padded


def _vp8l_payload(data: bytes) -> bytes:
    """Walk RIFF chunks to the still image's VP8L payload; gate lossy.
    Animated files (ANMF frames) are handled by ``decode_webp_frames``;
    a bare ANIM chunk with no frames is malformed."""
    if not is_webp(data):
        raise ValueError("not a WebP (bad RIFF header)")
    for fourcc, body in _chunks(data, 12, len(data)):
        if fourcc == b"VP8L":
            return body
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "WebP lossy (VP8) requires a DCT/bool-coder codec; only "
                "lossless (VP8L) decodes in-repo"
            )
    raise ValueError("WebP: no VP8L chunk found")


def _is_animated(data: bytes) -> bool:
    if not is_webp(data):
        return False
    try:
        return any(f == b"ANMF" for f, _ in _chunks(data, 12, len(data)))
    except ValueError:
        return False


# ----------------------------------------------------------- bit I/O


class _BitReader:
    """LSB-first bit reader (VP8L bit order)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.pos >= len(self.data):
                raise ValueError("VP8L: bitstream truncated")
            v |= ((self.data[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


class _BitWriter:
    __slots__ = ("out", "cur", "bit")

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.bit = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            if (v >> i) & 1:
                self.cur |= 1 << self.bit
            self.bit += 1
            if self.bit == 8:
                self.out.append(self.cur)
                self.cur = 0
                self.bit = 0

    def bytes(self) -> bytes:
        if self.bit:
            self.out.append(self.cur)
            self.cur = 0
            self.bit = 0
        return bytes(self.out)


# ------------------------------------------------------ prefix codes

# order in which code-length-code lengths are stored
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _canonical_codes(lengths) -> dict[tuple[int, int], int]:
    """RFC-1951 canonical assignment: {(length, code): symbol}."""
    maxlen = max(lengths) if lengths else 0
    bl_count = [0] * (maxlen + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (maxlen + 2)
    for ln in range(1, maxlen + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    table: dict[tuple[int, int], int] = {}
    for sym, ln in enumerate(lengths):
        if ln:
            table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
    return table


class _PrefixCode:
    """Decode side: walk the canonical code bit by bit (codes are read
    MSB-first while the stream is LSB-first — each stream bit descends
    one tree level)."""

    __slots__ = ("table", "single", "maxlen")

    def __init__(self, lengths):
        nz = [(s, ln) for s, ln in enumerate(lengths) if ln]
        if not nz:
            raise ValueError("VP8L: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][0]
            self.table = None
            self.maxlen = 0
            return
        self.single = None
        self.table = _canonical_codes(lengths)
        self.maxlen = max(ln for _, ln in nz)
        # completeness check (Kraft): an over/under-subscribed code is
        # a malformed stream, not a crash-later
        kraft = sum(1 / (1 << ln) for _, ln in nz)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError("VP8L: incomplete prefix code")

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        while ln <= self.maxlen:
            code = (code << 1) | br.read(1)
            ln += 1
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: bad prefix code in stream")


def _single_code(symbol: int) -> _PrefixCode:
    pc = _PrefixCode.__new__(_PrefixCode)
    pc.single = symbol
    pc.table = None
    pc.maxlen = 0
    return pc


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        if num_symbols == 1:
            if s0 >= alphabet_size:
                raise ValueError("VP8L: simple-code symbol out of range")
            return _single_code(s0)
        s1 = br.read(8)
        if s0 >= alphabet_size or s1 >= alphabet_size or s0 == s1:
            raise ValueError("VP8L: bad simple code")
        lengths = [0] * alphabet_size
        lengths[s0] = lengths[s1] = 1
        return _PrefixCode(lengths)
    # normal code: code-length code first
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode(clc_lengths)
    # optional cap on the number of coded symbols
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = clc.read(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        else:
            if cl == 16:
                repeat, val = 3 + br.read(2), prev
            elif cl == 17:
                repeat, val = 3 + br.read(3), 0
            else:
                repeat, val = 11 + br.read(7), 0
            if sym + repeat > alphabet_size:
                raise ValueError("VP8L: code-length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[sym] = val
                sym += 1
    return _PrefixCode(lengths)


# ----------------------------------------------------- LZ77 plumbing

# 2-D distance neighborhood (spec table): distance codes 1..120 map to
# (dx, dy) offsets close to the current pixel; codes > 120 are linear
# (distance = code - 120).
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (5, 8), (-5, 8), (6, 7), (-6, 7), (8, 4), (3, 8), (-3, 8), (7, 6),
    (-7, 6), (8, 5), (8, 6), (8, 7),
)


def _prefix_decode(br: _BitReader, code: int) -> int:
    """Length/distance prefix code -> 1-based value (spec prefix
    coding: codes 0..3 are literal values 1..4, then exponential)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """1-based value -> (prefix_code, extra_bits_value, extra_bits_n)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    offset = (2 + ((v >> extra) & 1)) << extra
    return 2 * extra + 2 + ((v >> extra) & 1), value - offset - 1, extra


# ------------------------------------------------------------- decode


def _color_cache_hash(argb, bits: int) -> int:
    return ((0x1E35A7BD * int(argb)) & 0xFFFFFFFF) >> (32 - bits)


def _decode_entropy_image(br: _BitReader, w: int, h: int, is_level0: bool,
                          out_transforms=None, max_pixels: int = 64_000_000):
    """Decode one VP8L entropy-coded ARGB image of size w x h. At
    level 0 transforms are read into ``out_transforms`` (list of
    (type, data...) in read order) and the working width may shrink
    (color-indexing bundling)."""
    if w <= 0 or h <= 0 or w * h > max_pixels:
        raise ValueError(f"VP8L: bad image size {w}x{h}")
    xsize = w
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("VP8L: duplicate transform")
            seen.add(ttype)
            if ttype == 0:  # PREDICTOR
                bits = 2 + br.read(3)
                bw, bh = -(-xsize // (1 << bits)), -(-h // (1 << bits))
                data = _decode_entropy_image(br, bw, bh, False)
                out_transforms.append(("predictor", bits, data, xsize))
            elif ttype == 1:  # COLOR
                bits = 2 + br.read(3)
                bw, bh = -(-xsize // (1 << bits)), -(-h // (1 << bits))
                data = _decode_entropy_image(br, bw, bh, False)
                out_transforms.append(("color", bits, data, xsize))
            elif ttype == 2:  # SUBTRACT-GREEN
                out_transforms.append(("subtract_green",))
            else:  # COLOR-INDEXING
                pal_size = br.read(8) + 1
                pal = _decode_entropy_image(br, pal_size, 1, False)
                # palette entries are delta-coded per channel
                pal = np.cumsum(
                    pal.astype(np.uint64).view(np.uint8).reshape(-1, 8),
                    axis=0, dtype=np.uint64,
                ).astype(np.uint8)  # per-byte running sum mod 256
                pal = pal.copy().view(np.uint64).reshape(-1)
                if pal_size <= 2:
                    width_bits = 3
                elif pal_size <= 4:
                    width_bits = 2
                elif pal_size <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                out_transforms.append(
                    ("palette", pal, width_bits, xsize)
                )
                if width_bits:
                    xsize = -(-xsize // (1 << width_bits))

    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L: bad color-cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    # meta prefix groups (level 0 only)
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):
        meta_bits = 2 + br.read(3)
        mw, mh = -(-xsize // (1 << meta_bits)), -(-h // (1 << meta_bits))
        meta_img = _decode_entropy_image(br, mw, mh, False)
        meta = (((meta_img >> np.uint64(8)) & np.uint64(0xFFFF))
                .astype(np.int64).reshape(mh, mw))
        n_groups = int(meta.max()) + 1

    green_size = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        g = _read_prefix_code(br, green_size)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))

    total = xsize * h
    px = np.zeros(total, np.uint64)
    pos = 0
    gsel = groups[0]
    while pos < total:
        if meta is not None:
            y, x = divmod(pos, xsize)
            gsel = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        cg, cr, cb, ca, cd = gsel
        s = cg.read(br)
        if s < 256:
            g = s
            r = cr.read(br)
            b = cb.read(br)
            a = ca.read(br)
            argb = (a << 24) | (r << 16) | (g << 8) | b
            px[pos] = argb
            pos += 1
            if cache_size:
                cache[_color_cache_hash(argb, cache_bits)] = argb
        elif s < 280:
            length = _prefix_decode(br, s - 256)
            dist_code = _prefix_decode(br, cd.read(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * xsize + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > total:
                raise ValueError("VP8L: LZ77 reference out of range")
            for _ in range(length):
                argb = int(px[pos - dist])
                px[pos] = argb
                pos += 1
                if cache_size:
                    cache[_color_cache_hash(argb, cache_bits)] = argb
        else:
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("VP8L: color-cache index out of range")
            px[pos] = cache[idx]
            pos += 1
    return px


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return ((a.astype(np.uint16) + b.astype(np.uint16)) >> 1).astype(np.uint8)


def _apply_predictor_inverse(res: np.ndarray, bits: int, mode_img: np.ndarray,
                             w: int, h: int) -> np.ndarray:
    """res: (h, w, 4) u8 residuals (channel order a,r,g,b);
    mode per block from mode_img's green channel."""
    bw = -(-w // (1 << bits))
    modes = (((mode_img >> np.uint64(8)) & np.uint64(0xFF))
             .astype(np.int64).reshape(-1, bw))
    out = np.zeros_like(res)
    black = np.array([255, 0, 0, 0], np.uint8)

    def clamp(v):
        return np.clip(v, 0, 255).astype(np.uint8)

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = black
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                m = int(modes[y >> bits, x >> bits])
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                # TR in raster order is pixel (y-1)*w + x + 1; on the
                # last column that linear index is y*w — the CURRENT
                # row's first pixel, already decoded (spec's linear
                # neighborhood definition)
                TR = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                if m == 0:
                    pred = black
                elif m == 1:
                    pred = L
                elif m == 2:
                    pred = T
                elif m == 3:
                    pred = TR
                elif m == 4:
                    pred = TL
                elif m == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif m == 6:
                    pred = _avg2(L, TL)
                elif m == 7:
                    pred = _avg2(L, T)
                elif m == 8:
                    pred = _avg2(TL, T)
                elif m == 9:
                    pred = _avg2(T, TR)
                elif m == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif m == 11:
                    p = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
                    pL = int(np.abs(p - L.astype(np.int32)).sum())
                    pT = int(np.abs(p - T.astype(np.int32)).sum())
                    pred = T if pT <= pL else L
                elif m == 12:
                    pred = clamp(
                        L.astype(np.int32) + T.astype(np.int32)
                        - TL.astype(np.int32)
                    )
                elif m == 13:
                    av = _avg2(L, T).astype(np.int32)
                    d = av - TL.astype(np.int32)
                    # C-style truncation toward zero for the half step
                    half = np.where(d >= 0, d // 2, -((-d) // 2))
                    pred = clamp(av + half)
                else:
                    raise ValueError(f"VP8L: bad predictor mode {m}")
            out[y, x] = res[y, x] + pred  # u8 wraparound add
    return out


def _apply_color_inverse(px: np.ndarray, bits: int, tr_img: np.ndarray,
                         w: int, h: int) -> np.ndarray:
    """px: (h, w, 4) u8 (a,r,g,b). Cross-channel delta inverse."""
    bw = -(-w // (1 << bits))
    t = tr_img.reshape(-1, bw)
    g2r = ((t >> np.uint64(0)) & np.uint64(0xFF)).astype(np.int8)
    g2b = ((t >> np.uint64(8)) & np.uint64(0xFF)).astype(np.int8)
    r2b = ((t >> np.uint64(16)) & np.uint64(0xFF)).astype(np.int8)
    ys = np.arange(h) >> bits
    xs = np.arange(w) >> bits
    G2R = g2r[np.ix_(ys, xs)].astype(np.int32)
    G2B = g2b[np.ix_(ys, xs)].astype(np.int32)
    R2B = r2b[np.ix_(ys, xs)].astype(np.int32)
    g = px[:, :, 2].astype(np.int8).astype(np.int32)
    r = px[:, :, 1].astype(np.int32)
    r = (r + ((G2R * g) >> 5)) & 0xFF
    b = px[:, :, 3].astype(np.int32)
    b = (b + ((G2B * g) >> 5)) & 0xFF
    b = (b + ((R2B * r.astype(np.int8).astype(np.int32)) >> 5)) & 0xFF
    out = px.copy()
    out[:, :, 1] = r.astype(np.uint8)
    out[:, :, 3] = b.astype(np.uint8)
    return out


def decode_webp(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """WebP bytes -> (width, height, channels, pixels u8). Channels is
    4 when any alpha < 255, else 3. Animated files return the first
    composited canvas as RGB (the ``decode_gif`` rule)."""
    if _is_animated(data):
        w, h, frames = decode_webp_frames(data)
        return w, h, 3, frames[0]
    p = _decode_vp8l(_vp8l_payload(data))
    h, w = p.shape[:2]
    a, r, g, b = p[:, :, 0], p[:, :, 1], p[:, :, 2], p[:, :, 3]
    rgb = np.stack([r, g, b], axis=2)
    if bool((a != 255).any()):
        return w, h, 4, np.ascontiguousarray(np.dstack([rgb, a]))
    return w, h, 3, np.ascontiguousarray(rgb)


def _decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L payload -> ``(h, w, 4)`` u8 planes in (a, r, g, b) order."""
    br = _BitReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: bad version")

    transforms: list = []
    px = _decode_entropy_image(br, w, h, True, transforms)

    # split ARGB into (h, cur_w, 4) channel planes lazily per transform
    def planes(flat: np.ndarray, width: int) -> np.ndarray:
        out = np.zeros((h, width, 4), np.uint8)
        f = flat.reshape(h, width)
        out[:, :, 0] = (f >> np.uint64(24)) & np.uint64(0xFF)
        out[:, :, 1] = (f >> np.uint64(16)) & np.uint64(0xFF)
        out[:, :, 2] = (f >> np.uint64(8)) & np.uint64(0xFF)
        out[:, :, 3] = f & np.uint64(0xFF)
        return out

    # inverse transforms in REVERSE read order
    for tr in reversed(transforms):
        if tr[0] == "palette":
            _, pal, width_bits, full_w = tr
            idx_w = -(-full_w // (1 << width_bits)) if width_bits else full_w
            f = px.reshape(h, idx_w)
            green = ((f >> np.uint64(8)) & np.uint64(0xFF)).astype(np.int64)
            if width_bits:
                bpp = 8 >> width_bits
                per = 1 << width_bits
                # unpack bundled indices LSB-first within the green byte
                cols = []
                for i in range(per):
                    cols.append((green >> (i * bpp)) & ((1 << bpp) - 1))
                idx = np.stack(cols, axis=2).reshape(h, idx_w * per)[:, :full_w]
            else:
                idx = green
            safe = np.where(idx < len(pal), idx, 0)
            vals = pal[safe]
            vals = np.where(idx < len(pal), vals, np.uint64(0))
            px = vals.reshape(-1)
        elif tr[0] == "subtract_green":
            cur_w = px.size // h
            p = planes(px, cur_w)
            g = p[:, :, 2].astype(np.uint16)
            p[:, :, 1] = ((p[:, :, 1] + g) & 0xFF).astype(np.uint8)
            p[:, :, 3] = ((p[:, :, 3] + g) & 0xFF).astype(np.uint8)
            px = _pack(p)
        elif tr[0] == "color":
            _, bits, tr_img, tw = tr
            p = _apply_color_inverse(planes(px, tw), bits, tr_img, tw, h)
            px = _pack(p)
        elif tr[0] == "predictor":
            _, bits, mode_img, tw = tr
            p = _apply_predictor_inverse(planes(px, tw), bits, mode_img, tw, h)
            px = _pack(p)

    return planes(px, w)


def _pack(p: np.ndarray) -> np.ndarray:
    """(h, w, 4) u8 (a,r,g,b) -> flat uint64 ARGB."""
    return (
        (p[:, :, 0].astype(np.uint64) << np.uint64(24))
        | (p[:, :, 1].astype(np.uint64) << np.uint64(16))
        | (p[:, :, 2].astype(np.uint64) << np.uint64(8))
        | p[:, :, 3].astype(np.uint64)
    ).reshape(-1)


# ---------------------------------------------------------- animation


def _u24(b: bytes, off: int) -> int:
    return b[off] | (b[off + 1] << 8) | (b[off + 2] << 16)


def _blend_over(canvas: np.ndarray, frame: np.ndarray, y: int, x: int) -> None:
    """Alpha-blend ``frame`` (RGBA u8) over the canvas rect at (y, x),
    non-premultiplied, per the container spec's blending formula:
    ``A = aF + aC*(1-aF)``; ``rgb = (rgbF*aF + rgbC*aC*(1-aF)) / A``
    (0 where A == 0). Round-half-up back to u8 (deterministic)."""
    fh, fw = frame.shape[:2]
    c = canvas[y : y + fh, x : x + fw].astype(np.float64) / 255.0
    f = frame.astype(np.float64) / 255.0
    af, ac = f[:, :, 3:4], c[:, :, 3:4]
    a_out = af + ac * (1.0 - af)
    rgb = f[:, :, :3] * af + c[:, :, :3] * ac * (1.0 - af)
    with np.errstate(invalid="ignore"):
        rgb = np.where(a_out > 0, rgb / np.where(a_out > 0, a_out, 1.0), 0.0)
    out = np.concatenate([rgb, a_out], axis=2)
    canvas[y : y + fh, x : x + fw] = np.floor(out * 255.0 + 0.5).astype(
        np.uint8
    )


def decode_webp_frames(data: bytes) -> tuple[int, int, list[np.ndarray]]:
    """All frames -> ``(canvas_w, canvas_h, [canvas, ...])``, each
    ``(h, w, 3)`` RGB u8 — the composited canvas as displayed at that
    point of the animation (the ``decode_gif_frames`` contract).

    Container semantics per the public WebP container spec: VP8X
    carries the canvas size; ANIM the background color (BGRA byte
    order) and loop count; each ANMF a frame rect in 2-px units, a
    duration and a flags byte (bit 1: blending — 0 alpha-blends the
    frame over the canvas, 1 overwrites; bit 0: disposal — 1 fills the
    frame rect with the background color after rendering). The canvas
    starts filled with the background color. Lossless (VP8L) frames
    only; lossy VP8 / ALPH frames raise ``NotImplementedError``. A
    still (non-animated) file decodes as a single frame."""
    if not _is_animated(data):
        w, h, ch, px = decode_webp(data)
        return w, h, [px[:, :, :3] if ch == 4 else px]
    cw = ch_ = None
    bg = np.array([255, 255, 255, 255], np.uint8)  # RGBA
    frames: list[np.ndarray] = []
    canvas = None
    for fourcc, body in _chunks(data, 12, len(data)):
        if fourcc == b"VP8X":
            if len(body) < 10:
                raise ValueError("WebP: short VP8X chunk")
            cw = _u24(body, 4) + 1
            ch_ = _u24(body, 7) + 1
            # 24-bit canvas fields: cap like the TIFF dims guard, or a
            # corrupted header demands a TiB canvas (fuzz-found)
            if cw * ch_ > 500_000_000:
                raise ValueError(f"WebP: bad canvas dimensions {cw}x{ch_}")
        elif fourcc == b"ANIM":
            if len(body) < 6:
                raise ValueError("WebP: short ANIM chunk")
            # background color is stored B, G, R, A
            bg = np.array([body[2], body[1], body[0], body[3]], np.uint8)
        elif fourcc == b"ANMF":
            if cw is None:
                raise ValueError("WebP: ANMF frame without a VP8X canvas")
            if len(body) < 16:
                raise ValueError("WebP: short ANMF header")
            fx, fy = _u24(body, 0) * 2, _u24(body, 3) * 2
            fw, fh = _u24(body, 6) + 1, _u24(body, 9) + 1
            flags = body[15]
            blend_over = (flags >> 1) & 1 == 0
            dispose_bg = flags & 1 == 1
            if fx + fw > cw or fy + fh > ch_:
                raise ValueError("WebP: frame rect exceeds the canvas")
            payload = None
            for sub, sbody in _chunks(body, 16, len(body)):
                if sub == b"ALPH":
                    raise NotImplementedError(
                        "WebP: ALPH frame alpha pairs with lossy VP8 frames"
                    )
                if sub == b"VP8 ":
                    raise NotImplementedError(
                        "WebP lossy (VP8) animation frames require a "
                        "DCT/bool-coder codec"
                    )
                if sub == b"VP8L":
                    payload = sbody
                    break
            if payload is None:
                raise ValueError("WebP: ANMF frame without image data")
            p = _decode_vp8l(payload)
            if p.shape[:2] != (fh, fw):
                raise ValueError(
                    f"WebP: frame bitstream is {p.shape[1]}x{p.shape[0]}, "
                    f"ANMF header says {fw}x{fh}"
                )
            rgba = p[:, :, [1, 2, 3, 0]]  # (a,r,g,b) planes -> RGBA
            if canvas is None:
                canvas = np.broadcast_to(bg, (ch_, cw, 4)).copy()
            if blend_over:
                _blend_over(canvas, rgba, fy, fx)
            else:
                canvas[fy : fy + fh, fx : fx + fw] = rgba
            frames.append(canvas[:, :, :3].copy())
            if dispose_bg:
                canvas[fy : fy + fh, fx : fx + fw] = bg
    if not frames:
        raise ValueError("WebP: no animation frames")
    return cw, ch_, frames


def encode_webp_animated(
    frames: list[np.ndarray],
    *,
    offsets: list[tuple[int, int]] | None = None,
    durations: int | list[int] = 100,
    blend: list[bool] | None = None,
    dispose: list[bool] | None = None,
    bg: tuple[int, int, int, int] = (255, 255, 255, 255),
    canvas: tuple[int, int] | None = None,
    loop: int = 0,
    **encode_kwargs,
) -> bytes:
    """Animated WebP fixture producer: each frame is a lossless VP8L
    sub-image (via ``encode_webp``) placed at ``offsets[i]`` (x, y; 2-px
    units, so both must be even). ``blend[i]`` True alpha-blends the
    frame over the canvas (flag bit B=0), False overwrites (default);
    ``dispose[i]`` True restores the rect to the background color after
    the frame. ``bg`` is RGBA; ``canvas`` (w, h) defaults to the frames'
    joint extent. ``decode_webp_frames(encode_webp_animated(fs))`` is
    exact for opaque non-blended frames."""
    if not frames:
        raise ValueError("encode_webp_animated needs at least one frame")
    n = len(frames)
    offsets = offsets or [(0, 0)] * n
    durs = [durations] * n if isinstance(durations, int) else list(durations)
    blend = blend or [False] * n
    dispose = dispose or [False] * n
    if not (len(offsets) == len(durs) == len(blend) == len(dispose) == n):
        raise ValueError("per-frame lists must match the frame count")
    dims = []
    for f, (x, y) in zip(frames, offsets):
        if x < 0 or y < 0 or x % 2 or y % 2:
            raise ValueError(f"frame offsets must be even and >= 0: {(x, y)}")
        fh, fw = np.asarray(f).shape[:2]
        dims.append((x + fw, y + fh))
    cw, chh = canvas or (max(d[0] for d in dims), max(d[1] for d in dims))
    if any(d[0] > cw or d[1] > chh for d in dims):
        raise ValueError("a frame rect exceeds the canvas")

    def u24(v: int) -> bytes:
        return bytes((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF))

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return (
            fourcc + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    has_alpha = bg[3] < 255 or any(
        np.asarray(f).ndim == 3 and np.asarray(f).shape[2] == 4 for f in frames
    )
    vp8x = bytes([0x02 | (0x10 if has_alpha else 0)]) + bytes(3)
    vp8x += u24(cw - 1) + u24(chh - 1)
    anim = bytes((bg[2], bg[1], bg[0], bg[3])) + struct.pack("<H", loop)
    out = chunk(b"VP8X", vp8x) + chunk(b"ANIM", anim)
    for f, (x, y), dur, bl, dp in zip(frames, offsets, durs, blend, dispose):
        f = np.asarray(f, np.uint8)
        fh, fw = f.shape[:2]
        payload = _vp8l_payload(encode_webp(f, **encode_kwargs))
        hdr = u24(x // 2) + u24(y // 2) + u24(fw - 1) + u24(fh - 1)
        hdr += u24(dur) + bytes([(0 if bl else 2) | (1 if dp else 0)])
        out += chunk(b"ANMF", hdr + chunk(b"VP8L", payload))
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WEBP" + out


# ------------------------------------------------------------- encode


def _flat_lengths(n_used: int, used_mask: np.ndarray) -> list[int]:
    """Complete canonical lengths: flat over the USED symbols (0 for
    unused). k = 2^L - n symbols get L-1 bits, the rest L."""
    n = int(n_used)
    size = len(used_mask)
    if n < 2:
        raise ValueError("flat code needs >= 2 symbols")
    L = max(1, (n - 1).bit_length())
    k = (1 << L) - n
    lengths = [0] * size
    i = 0
    for sym in range(size):
        if used_mask[sym]:
            lengths[sym] = (L - 1) if i < k and L > 1 else L
            i += 1
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths: list[int],
                       used_syms: list[int]) -> dict[int, tuple[int, int]]:
    """Write a prefix code (simple when <=2 used symbols, else the
    normal code-length-code form) and return {symbol: (code, len)}."""
    if len(used_syms) == 1 and used_syms[0] <= 255:
        s0 = used_syms[0]
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # 1 symbol
        if s0 < 2:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        return {s0: (0, 0)}
    if len(used_syms) == 2 and used_syms[-1] <= 255:
        s0, s1 = sorted(used_syms)
        bw.write(1, 1)  # simple
        bw.write(1, 1)  # 2 symbols
        if s0 < 2:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        bw.write(s1, 8)
        return {s0: (0, 1), s1: (1, 1)}
    bw.write(0, 1)  # normal
    # code-length code over the distinct length values in `lengths`
    used_cl = sorted({ln for ln in lengths})
    cl_lengths = [0] * 19
    if len(used_cl) == 1:
        cl_lengths[used_cl[0]] = 1  # single-symbol CL code: 0 bits/len
        cl_codes = {used_cl[0]: (0, 0)}
    else:
        m = len(used_cl)
        L = max(1, (m - 1).bit_length())
        k = (1 << L) - m
        for i, v in enumerate(used_cl):
            cl_lengths[v] = (L - 1) if i < k and L > 1 else L
        table = _canonical_codes(cl_lengths)
        cl_codes = {sym: (code, ln) for (ln, code), sym in table.items()}
    # num_code_lengths must cover the highest CLC_ORDER position used
    need = max(i for i, s in enumerate(_CLC_ORDER) if cl_lengths[s]) + 1
    num_clc = max(4, need)
    bw.write(num_clc - 4, 4)
    for i in range(num_clc):
        bw.write(cl_lengths[_CLC_ORDER[i]], 3)
    bw.write(0, 1)  # no max-symbol cap
    for ln in lengths:
        _emit(bw, cl_codes, ln)
    table = _canonical_codes(lengths)
    return {sym: (code, ln) for (ln, code), sym in table.items()}


def _emit(bw: _BitWriter, codes: dict[int, tuple[int, int]], sym: int) -> None:
    code, n = codes[sym]
    # canonical codes are written MSB-first (mirrors the bit-by-bit read)
    for i in range(n - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def encode_webp(pixels: np.ndarray, *, subtract_green: bool = False,
                palette: bool = False, lz77: bool = True) -> bytes:
    """``(h, w)`` gray, ``(h, w, 3)`` RGB or ``(h, w, 4)`` RGBA u8 ->
    lossless WebP (fixture producer). ``subtract_green`` applies the
    spectral transform; ``palette`` uses color-indexing when the image
    has <= 256 distinct colors (with sub-byte bundling for <= 16);
    ``lz77`` enables greedy distance-1 run-length copies (linear
    escape codes). Decode is exact for every knob combination."""
    px = np.asarray(pixels, np.uint8)
    if px.ndim == 2:
        px = np.stack([px, px, px], axis=2)
    h, w, ch = px.shape
    if ch == 3:
        a = np.full((h, w), 255, np.uint8)
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    elif ch == 4:
        r, g, b, a = px[:, :, 0], px[:, :, 1], px[:, :, 2], px[:, :, 3]
    else:
        raise ValueError("encode_webp expects gray, RGB or RGBA")
    if h > 1 << 14 or w > 1 << 14:
        raise ValueError("image too large for VP8L (14-bit dims)")

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if ch == 4 else 0, 1)
    bw.write(0, 3)  # version

    argb = (
        (a.astype(np.uint64) << np.uint64(24))
        | (r.astype(np.uint64) << np.uint64(16))
        | (g.astype(np.uint64) << np.uint64(8))
        | b.astype(np.uint64)
    ).reshape(-1)

    pal_arr = None
    width_bits = 0
    if palette:
        uniq = np.unique(argb)
        if len(uniq) > 256:
            raise ValueError(
                f"palette requested but image has {len(uniq)} distinct colors"
            )
        pal_arr = uniq
        if len(uniq) <= 2:
            width_bits = 3
        elif len(uniq) <= 4:
            width_bits = 2
        elif len(uniq) <= 16:
            width_bits = 1

    if subtract_green and palette:
        raise ValueError("fixture profile: pick one transform")

    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # transform type 2
        rr = ((r.astype(np.int16) - g.astype(np.int16)) & 0xFF).astype(np.uint64)
        bb = ((b.astype(np.int16) - g.astype(np.int16)) & 0xFF).astype(np.uint64)
        argb = (
            (a.astype(np.uint64) << np.uint64(24))
            | (rr << np.uint64(16))
            | (g.astype(np.uint64) << np.uint64(8))
            | bb
        ).reshape(-1)

    if palette:
        bw.write(1, 1)
        bw.write(3, 2)  # transform type 3
        bw.write(len(pal_arr) - 1, 8)
        # palette written as a delta-coded 1-row aux image
        deltas = pal_arr.astype(np.uint64).view(np.uint8).reshape(-1, 8).copy()
        deltas[1:] = (
            deltas[1:].astype(np.int16) - deltas[:-1].astype(np.int16)
        ).astype(np.uint8)
        pal_pixels = deltas.view(np.uint64).reshape(-1)
        _encode_image_body(bw, pal_pixels, lz77=False, level0=False)
        # main image becomes palette indices in the green channel,
        # bundled when width_bits > 0
        lut = {int(v): i for i, v in enumerate(pal_arr)}
        idx = np.array([lut[int(v)] for v in argb], np.uint64).reshape(h, w)
        if width_bits:
            per = 1 << width_bits
            bpp = 8 >> width_bits
            iw = -(-w // per)
            packed = np.zeros((h, iw), np.uint64)
            for i in range(per):
                cols = idx[:, i::per]
                packed[:, : cols.shape[1]] |= cols << np.uint64(i * bpp)
            argb = ((np.uint64(0xFF) << np.uint64(24))
                    | (packed << np.uint64(8))).reshape(-1)
        else:
            argb = ((np.uint64(0xFF) << np.uint64(24))
                    | (idx << np.uint64(8))).reshape(-1)

    bw.write(0, 1)  # no more transforms
    _encode_image_body(bw, argb, lz77=lz77, level0=True)

    payload = bw.bytes()
    riff_size = 4 + 8 + len(payload) + (len(payload) & 1)
    out = b"RIFF" + struct.pack("<I", riff_size) + b"WEBP"
    out += b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"
    return out


def _code_for(bw: _BitWriter, used, size: int) -> dict[int, tuple[int, int]]:
    """Write the cheapest valid prefix code for a used-symbol set:
    simple (1-2 symbols), else flat-over-used normal code."""
    used = sorted(used) or [0]
    # simple codes carry at most 8-bit symbol values (spec); length /
    # cache symbols (>= 256) must go through the normal form
    if len(used) <= 2 and used[-1] <= 255:
        return _write_prefix_code(bw, [], used)
    if len(used) == 1:
        # single >8-bit symbol: normal code needs >= 2 coded symbols,
        # so pad with symbol 0 (never emitted)
        used = sorted({0, used[0]})
    mask = np.zeros(size, bool)
    mask[used] = True
    return _write_prefix_code(bw, _flat_lengths(len(used), mask), used)


def _encode_image_body(bw: _BitWriter, argb: np.ndarray, *, lz77: bool,
                       level0: bool) -> None:
    """Entropy-coded image body: no cache, no meta groups, one prefix
    group; literals plus (optional) greedy distance-1 runs. The
    meta-prefix bit exists only at level 0 (aux images — palette — do
    not carry one), hence the flag."""
    bw.write(0, 1)  # no color cache
    if level0:
        bw.write(0, 1)  # no meta prefix groups
    toks = _tokenize(argb, lz77)
    g_used, r_used, b_used, a_used, d_used = set(), set(), set(), set(), set()
    for t in toks:
        if t[0] == "lit":
            v = t[1]
            g_used.add((v >> 8) & 0xFF)
            r_used.add((v >> 16) & 0xFF)
            b_used.add(v & 0xFF)
            a_used.add((v >> 24) & 0xFF)
        else:
            g_used.add(256 + _prefix_encode(t[1])[0])
            d_used.add(_prefix_encode(t[2] + 120)[0])
    cg = _code_for(bw, g_used, 256 + 24)
    cr = _code_for(bw, r_used, 256)
    cb = _code_for(bw, b_used, 256)
    ca = _code_for(bw, a_used, 256)
    cd = _code_for(bw, d_used, 40)
    for t in toks:
        if t[0] == "lit":
            v = t[1]
            _emit(bw, cg, (v >> 8) & 0xFF)
            _emit(bw, cr, (v >> 16) & 0xFF)
            _emit(bw, cb, v & 0xFF)
            _emit(bw, ca, (v >> 24) & 0xFF)
        else:
            lcode, lextra, lbits = _prefix_encode(t[1])
            _emit(bw, cg, 256 + lcode)
            bw.write(lextra, lbits)
            dcode, dextra, dbits = _prefix_encode(t[2] + 120)
            _emit(bw, cd, dcode)
            bw.write(dextra, dbits)


def _tokenize(argb: np.ndarray, lz77: bool):
    """-> list of ('lit', argb) / ('copy', length, dist)."""
    toks = []
    n = len(argb)
    i = 0
    while i < n:
        if lz77 and i > 0:
            run = 0
            while i + run < n and argb[i + run] == argb[i - 1] and run < 4096:
                run += 1
            if run >= 3:
                toks.append(("copy", run, 1))
                i += run
                continue
        toks.append(("lit", int(argb[i])))
        i += 1
    return toks
