"""CCITT fax codecs (ITU T.4 / T.6) for bilevel scanned TIFFs.

Group 4 (T.6 MMR, TIFF compression 4) is THE classic scanned-document
encoding — the reference's OCR corpus shape — and Modified Huffman
(T.4 1-D, TIFF compression 2) is its simpler per-line sibling. Both
decode and encode here with no external codec:

- ``g4_decode(data, w, h)`` / ``g4_encode(bits)``     2-D MMR
- ``mh_decode(data, w, h)`` / ``mh_encode(bits)``     1-D MH,
  byte-aligned rows (the TIFF compression-2 convention)

Bilevel convention: arrays are uint8 with 1 = BLACK (a run of 0s is a
white run, which every line starts with, per the spec). TIFF
PhotometricInterpretation decides the gray mapping at the caller.

The run-length and mode code tables are transcribed from ITU-T
Recommendation T.4 (tables 2/3) and T.6 §4.2; the encoder and decoder
share them, and the tests exercise roundtrips over structured and
random bitmaps including multi-strip and >2560-pixel runs (makeup
chaining). Work is per-RUN, not per-pixel — a 2k-wide scanned line is
a handful of table lookups, so the pure-Python loop is fine inside an
actor-pool batch stage.

Error contract: ``ValueError`` for malformed/truncated streams.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------- T.4 tables
# (run, bitstring) — terminating codes 0..63 then makeup codes.

_WHITE_CODES = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    # makeup
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

_BLACK_CODES = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
    # makeup
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# extended makeup (T.4 table 3b), shared by both colors
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# vertical/pass/horizontal mode codes (T.6 §4.2.1)
_MODE_CODES = {
    "1": ("v", 0), "011": ("v", 1), "000011": ("v", 2),
    "0000011": ("v", 3), "010": ("v", -1), "000010": ("v", -2),
    "0000010": ("v", -3), "001": ("h", None), "0001": ("p", None),
}
_MODE_MAXLEN = 7


def _decode_lut(codes: dict[int, str], extra: dict[int, str]):
    lut = {v: k for k, v in codes.items()}
    lut.update({v: k for k, v in extra.items()})
    maxlen = max(len(s) for s in lut)
    return lut, maxlen


_WHITE_LUT, _WHITE_MAX = _decode_lut(_WHITE_CODES, _EXT_MAKEUP)
_BLACK_LUT, _BLACK_MAX = _decode_lut(_BLACK_CODES, _EXT_MAKEUP)


class _BitReader:
    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def left(self) -> int:
        return len(self.bits) - self.pos

    def take(self, n: int) -> str:
        b = self.bits[self.pos : self.pos + n]
        self.pos += n
        return "".join("1" if x else "0" for x in b)

    def align(self):
        self.pos = (self.pos + 7) & ~7


def _read_prefix(r: _BitReader, lut: dict[str, int], maxlen: int, what: str):
    s = ""
    while len(s) < maxlen:
        if r.left() < 1:
            raise ValueError(f"CCITT: stream ended inside a {what} code")
        s += r.take(1)
        v = lut.get(s)
        if v is not None:
            return v
    raise ValueError(f"CCITT: invalid {what} code {s!r}")


def _read_run(r: _BitReader, white: bool) -> int:
    """One full run length: chained makeup codes + a terminating code."""
    total = 0
    while True:
        lut, mx = (_WHITE_LUT, _WHITE_MAX) if white else (_BLACK_LUT, _BLACK_MAX)
        v = _read_prefix(r, lut, mx, "white run" if white else "black run")
        total += v
        if v < 64:  # terminating code ends the run
            return total
        # makeup code: the spec requires a terminating code to follow


def _transitions(row: np.ndarray) -> list[int]:
    """Positions where the color changes, starting from white."""
    d = np.flatnonzero(np.diff(row.astype(np.int8))) + 1
    out = list(d)
    if row[0]:
        out.insert(0, 0)
    return out


def _row_from_transitions(trans: list[int], w: int) -> np.ndarray:
    row = np.zeros(w, np.uint8)
    for i in range(0, len(trans), 2):
        start = trans[i]
        end = trans[i + 1] if i + 1 < len(trans) else w
        row[start:end] = 1
    return row


# ------------------------------------------------------------------ G4


def g4_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """T.6 MMR -> (height, width) uint8 with 1 = black."""
    if width <= 0 or height <= 0:
        raise ValueError("CCITT G4: bad dimensions")
    r = _BitReader(data)
    ref: list[int] = []  # imaginary all-white line above the image
    out = np.zeros((height, width), np.uint8)
    for y in range(height):
        cur: list[int] = []
        a0 = -1
        color = 0  # 0 = white
        while a0 < width:
            # b1: first reference transition > a0 with opposite color
            # of a0 (i.e., transition index parity == current color)
            b1 = width
            b2 = width
            for i, t in enumerate(ref):
                if t > a0 and (i % 2) == color:
                    b1 = t
                    b2 = ref[i + 1] if i + 1 < len(ref) else width
                    break
            mode = _read_prefix(r, _MODE_CODES, _MODE_MAXLEN, "mode")
            kind, d = mode
            if kind == "p":
                a0 = b2  # pass: current run swallows b1..b2
            elif kind == "v":
                a1 = b1 + d
                if not -1 <= a1 <= width:
                    raise ValueError("CCITT G4: vertical move out of line")
                cur.append(max(a1, 0))
                a0 = a1
                color ^= 1
            else:  # horizontal: two explicit runs
                a0p = max(a0, 0)
                r1 = _read_run(r, white=color == 0)
                r2 = _read_run(r, white=color == 1)
                cur.append(min(a0p + r1, width))
                cur.append(min(a0p + r1 + r2, width))
                a0 = a0p + r1 + r2
            if a0 >= width:
                break
        # normalize: drop zero-length phantom runs (repeated positions)
        clean: list[int] = []
        for t in cur:
            if clean and clean[-1] == t:
                clean.pop()
            else:
                clean.append(t)
        out[y] = _row_from_transitions(clean, width)
        ref = _transitions(out[y])
    return out


def g4_encode(bits: np.ndarray) -> bytes:
    """(h, w) uint8 (1 = black) -> T.6 MMR bytes (EOFB-terminated)."""
    bits = np.asarray(bits)
    if bits.ndim != 2:
        raise ValueError("g4_encode expects (h, w)")
    h, w = bits.shape
    out: list[str] = []
    ref: list[int] = []
    for y in range(h):
        cur = _transitions(bits[y])
        a0 = -1
        color = 0
        i_cur = 0
        while a0 < w:
            a1 = cur[i_cur] if i_cur < len(cur) else w
            b1 = w
            b2 = w
            for i, t in enumerate(ref):
                if t > a0 and (i % 2) == color:
                    b1 = t
                    b2 = ref[i + 1] if i + 1 < len(ref) else w
                    break
            if b2 < a1:  # pass mode
                out.append("0001")
                a0 = b2
                continue
            if abs(a1 - b1) <= 3:  # vertical mode
                out.append(
                    {0: "1", 1: "011", 2: "000011", 3: "0000011",
                     -1: "010", -2: "000010", -3: "0000010"}[a1 - b1]
                )
                a0 = a1
                color ^= 1
                i_cur += 1
            else:  # horizontal mode
                a2 = cur[i_cur + 1] if i_cur + 1 < len(cur) else w
                a0p = max(a0, 0)
                out.append("001")
                out.append(_encode_run(a1 - a0p, white=color == 0))
                out.append(_encode_run(a2 - a1, white=color == 1))
                a0 = a2
                i_cur += 2
            if a0 >= w:
                break
        ref = cur
    out.append("000000000001" * 2)  # EOFB
    s = "".join(out)
    pad = (-len(s)) % 8
    return int(s + "0" * pad, 2).to_bytes((len(s) + pad) // 8, "big") if s else b""


def _encode_run(n: int, white: bool) -> str:
    codes = _WHITE_CODES if white else _BLACK_CODES
    parts = []
    while n > 2560:
        parts.append(_EXT_MAKEUP[2560])
        n -= 2560
    if n >= 64:
        big = (n // 64) * 64
        parts.append(codes[big] if big <= 1728 else _EXT_MAKEUP[big])
        n -= big
    parts.append(codes[n])
    return "".join(parts)


# -------------------------------------------------------- MH (G3 1-D)


def mh_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """T.4 1-D Modified Huffman, byte-aligned rows (the TIFF
    compression-2 convention) -> (height, width) uint8, 1 = black.

    Each row is alternating run lengths starting with white (a row
    that starts black is coded with a zero-length white run); the run
    boundaries ARE the color transitions, the final one landing
    exactly on the line width."""
    if width <= 0 or height <= 0:
        raise ValueError("CCITT MH: bad dimensions")
    r = _BitReader(data)
    out = np.zeros((height, width), np.uint8)
    for y in range(height):
        pos = 0
        white = True
        bounds: list[int] = []
        while pos < width:
            pos += _read_run(r, white)
            bounds.append(pos)
            white = not white
        if pos != width:
            raise ValueError(f"CCITT MH: row {y} over-ran the line width")
        out[y] = _row_from_transitions(bounds[:-1], width)
        r.align()  # rows are byte-aligned
    return out


def mh_encode(bits: np.ndarray) -> bytes:
    """(h, w) uint8 (1 = black) -> byte-aligned MH rows."""
    bits = np.asarray(bits)
    if bits.ndim != 2:
        raise ValueError("mh_encode expects (h, w)")
    h, w = bits.shape
    chunks: list[bytes] = []
    for y in range(h):
        bounds = _transitions(bits[y]) + [w]
        parts = []
        pos = 0
        white = True
        for t in bounds:
            parts.append(_encode_run(t - pos, white))
            pos = t
            white = not white
        s = "".join(parts)
        pad = (-len(s)) % 8
        s += "0" * pad
        chunks.append(int(s, 2).to_bytes(len(s) // 8, "big"))
    return b"".join(chunks)
