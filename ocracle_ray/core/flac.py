"""Stdlib/numpy FLAC codec — decoder for real-web lossless audio plus
a fixture encoder so tests and media fixtures are self-contained.

Reference semantics: RFC 9639 (FLAC, IETF 2024) / the xiph format spec
— public documents. Reference-repo analogue: the reference decodes
audio through system codec libraries; this repo's contract
(`stages/multimodal.py AudioFeatures`) needs a deterministic in-repo
decoder with honest error contracts instead.

Decoder coverage: STREAMINFO parsing, fixed/variable blocking, all
block-size/sample-rate/sample-size header codes, UTF-8-coded frame and
sample numbers, CRC-8 header and CRC-16 frame verification, subframe
types CONSTANT / VERBATIM / FIXED (orders 0-4) / LPC (orders 1-32),
wasted bits, 4- and 5-bit Rice partitions incl. the raw-bits escape,
and all four channel assignments (independent, left/side, right/side,
mid/side). Bit depths 8/12/16/20/24/32.

Encoder (fixture-grade, spec-valid): fixed blocksize, per-block
subframe choice among CONSTANT (auto when a channel is flat),
VERBATIM, FIXED order 2 + Rice, and a fixed-coefficient LPC mode;
stereo modes independent / left_side / right_side / mid_side. The
decoder must invert every mode bit-exactly — integer math end to end.

Error contract (shared with the other codecs): ValueError for
malformed/corrupt streams, NotImplementedError never (FLAC has no
optional profiles this decoder skips) — the multimodal skip-row catch
list applies unchanged.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"fLaC"

# ---------------------------------------------------------------- CRCs


def _make_crc8_table() -> np.ndarray:
    t = np.zeros(256, np.uint8)
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07 if c & 0x80 else (c << 1)) & 0xFF
        t[i] = c
    return t


def _make_crc16_table() -> np.ndarray:
    t = np.zeros(256, np.uint16)
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005 if c & 0x8000 else (c << 1)) & 0xFFFF
        t[i] = c
    return t


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8[c ^ b])
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# ------------------------------------------------------------ bit I/O


class _Bits:
    """MSB-first bit reader with byte-position access for CRC spans."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def at_end(self) -> bool:
        return self.byte >= len(self.data)

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.byte >= len(self.data):
                raise ValueError("FLAC: truncated stream")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        n = 0
        while True:
            if self.byte >= len(self.data):
                raise ValueError("FLAC: truncated unary")
            if self.read(1):
                return n
            n += 1

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitWriter:
    """MSB-first bit writer."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        if n and value >> n:
            raise ValueError(f"value {value} does not fit {n} bits")
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        if self.nbits:
            raise ValueError("unaligned")
        return bytes(self.out)


# ------------------------------------------------------ coded numbers


def _read_coded_number(br: _Bits) -> int:
    """FLAC's UTF-8-style variable-length number (up to 36 bits)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("FLAC: invalid coded number prefix")
    v = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC: invalid coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_coded_number(bw: _BitWriter, v: int):
    if v < 0x80:
        bw.write(v, 8)
        return
    # count of payload bits -> number of bytes
    for nbytes in range(2, 8):
        if v < (1 << (nbytes * 5 + 1)):
            break
    else:
        raise ValueError("coded number too large")
    lead = (0xFF00 >> nbytes) & 0xFF
    shifts = (nbytes - 1) * 6
    bw.write(lead | (v >> shifts), 8)
    for i in range(nbytes - 1):
        shifts -= 6
        bw.write(0x80 | ((v >> shifts) & 0x3F), 8)


# ------------------------------------------------------------- decode


def is_flac(data: bytes) -> bool:
    return data[:4] == MAGIC


_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_SR_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SS_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_residual(br: _Bits, order: int, block_size: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual method {method}")
    pbits, escape = (4, 15) if method == 0 else (5, 31)
    porder = br.read(4)
    npart = 1 << porder
    if block_size % npart:
        raise ValueError("FLAC: block size not divisible by partitions")
    out = np.empty(block_size - order, np.int64)
    pos = 0
    for p in range(npart):
        n = (block_size >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC: partition smaller than predictor order")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for i in range(n):
                out[pos + i] = br.read_signed(raw)
        else:
            for i in range(n):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out[pos + i] = (u >> 1) ^ -(u & 1)
        pos += n
    return out


def _read_subframe(br: _Bits, block_size: int, bits: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eb = bits - wasted
    if eb <= 0:
        raise ValueError("FLAC: wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        out = np.full(block_size, br.read_signed(eb), np.int64)
    elif stype == 1:  # VERBATIM
        out = np.fromiter(
            (br.read_signed(eb) for _ in range(block_size)),
            np.int64, count=block_size,
        )
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        if order > block_size:
            raise ValueError("FLAC: predictor order exceeds block size")
        warm = [br.read_signed(eb) for _ in range(order)]
        res = _read_residual(br, order, block_size)
        out = np.empty(block_size, np.int64)
        out[:order] = warm
        coef = _FIXED_COEF[order]
        for i in range(order, block_size):
            pred = 0
            for j, c in enumerate(coef):
                pred += c * out[i - 1 - j]
            out[i] = res[i - order] + pred
    elif stype >= 32:  # LPC
        order = (stype & 31) + 1
        if order > block_size:
            raise ValueError("FLAC: predictor order exceeds block size")
        warm = [br.read_signed(eb) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid LPC precision code 15")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coef = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, order, block_size)
        out = np.empty(block_size, np.int64)
        out[:order] = warm
        for i in range(order, block_size):
            pred = 0
            for j in range(order):
                pred += coef[j] * out[i - 1 - j]
            out[i] = res[i - order] + (pred >> shift)
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    if wasted:
        out = out << wasted
    return out


def decode_flac(data: bytes) -> tuple[int, int, np.ndarray]:
    """FLAC bytes -> ``(sample_rate, n_channels, samples[frame,
    channel] as float64 in [-1, 1])`` — the ``core.wav.decode_wav``
    contract."""
    if not is_flac(data):
        raise ValueError("not a FLAC stream (bad magic)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC: truncated metadata")
        head = data[pos]
        last, btype = head >> 7, head & 0x7F
        (blen,) = struct.unpack(">I", b"\0" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + blen]
        if len(body) < blen:
            raise ValueError("FLAC: truncated metadata block")
        if btype == 0:
            if blen < 34:
                raise ValueError("FLAC: short STREAMINFO")
            br = _Bits(body)
            br.read(16)  # min block size
            br.read(16)  # max block size
            br.read(24)  # min frame size
            br.read(24)  # max frame size
            rate = br.read(20)
            ch = br.read(3) + 1
            bits = br.read(5) + 1
            total = br.read(36)
            info = (rate, ch, bits, total)
        elif btype == 127:
            raise ValueError("FLAC: invalid metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    rate, ch, bits, total = info
    if rate == 0 or ch < 1:
        raise ValueError("FLAC: bad STREAMINFO rate/channels")

    blocks = []
    br = _Bits(data, pos)
    while not br.at_end():
        frame_start = br.byte
        if br.read(14) != 0x3FFE:
            raise ValueError("FLAC: bad frame sync")
        if br.read(1):
            raise ValueError("FLAC: frame reserved bit set")
        br.read(1)  # blocking strategy (fixed=0 / variable=1)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_asgn = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("FLAC: frame header reserved bit set")
        _num = _read_coded_number(br)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code 0")
        elif bs_code == 1:
            bsize = 192
        elif bs_code <= 5:
            bsize = 576 << (bs_code - 2)
        elif bs_code == 6:
            bsize = br.read(8) + 1
        elif bs_code == 7:
            bsize = br.read(16) + 1
        else:
            bsize = 256 << (bs_code - 8)
        if sr_code == 0:
            frate = rate
        elif sr_code in _SR_TABLE:
            frate = _SR_TABLE[sr_code]
        elif sr_code == 12:
            frate = br.read(8) * 1000
        elif sr_code == 13:
            frate = br.read(16)
        elif sr_code == 14:
            frate = br.read(16) * 10
        else:
            raise ValueError("FLAC: invalid sample rate code 15")
        if ss_code == 0:
            fbits = bits
        elif ss_code in _SS_TABLE:
            fbits = _SS_TABLE[ss_code]
        else:
            raise ValueError(f"FLAC: reserved sample size code {ss_code}")
        br.align()  # CRC-8 byte follows the (byte-aligned) header
        hdr_crc = br.read(8)
        if crc8(data[frame_start:br.byte - 1]) != hdr_crc:
            raise ValueError("FLAC: frame header CRC-8 mismatch")

        if ch_asgn < 8:
            nch = ch_asgn + 1
            side_ch = -1
        elif ch_asgn == 8:  # left/side
            nch, side_ch = 2, 1
        elif ch_asgn == 9:  # side/right
            nch, side_ch = 2, 0
        elif ch_asgn == 10:  # mid/side
            nch, side_ch = 2, 1
        else:
            raise ValueError(f"FLAC: reserved channel assignment {ch_asgn}")
        if nch != ch:
            raise ValueError("FLAC: frame channel count != STREAMINFO")

        subs = []
        for c in range(nch):
            sbits = fbits + (1 if c == side_ch else 0)
            subs.append(_read_subframe(br, bsize, sbits))
        br.align()
        fcrc = br.read(16)
        if crc16(data[frame_start:br.byte - 2]) != fcrc:
            raise ValueError("FLAC: frame CRC-16 mismatch")

        if ch_asgn == 8:
            left, side = subs
            subs = [left, left - side]
        elif ch_asgn == 9:
            side, right = subs
            subs = [right + side, right]
        elif ch_asgn == 10:
            mid, side = subs
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        blocks.append(np.stack(subs, axis=1))
        _ = frate  # per-frame rate is parsed/validated; STREAMINFO rules

    if not blocks:
        raise ValueError("FLAC: no audio frames")
    samples = np.concatenate(blocks, axis=0)
    if total and len(samples) > total:
        samples = samples[:total]
    scale = float(1 << (bits - 1))
    return rate, ch, samples.astype(np.float64) / scale


# ------------------------------------------------------------- encode


def _rice_param(res: np.ndarray) -> int:
    mean = float(np.mean(np.abs(res))) if len(res) else 0.0
    k = 0
    while (1 << k) < mean + 1 and k < 14:
        k += 1
    return k


def _write_residual(bw: _BitWriter, res: np.ndarray):
    """Partition order 0, 4-bit Rice with auto parameter."""
    bw.write(0, 2)   # method 0: 4-bit params
    bw.write(0, 4)   # partition order 0
    k = _rice_param(res)
    bw.write(k, 4)
    for r in res:
        u = (int(r) << 1) ^ (-1 if r < 0 else 0)
        q = u >> k
        for _ in range(q):
            bw.write(0, 1)
        bw.write(1, 1)
        bw.write(u & ((1 << k) - 1), k)


_LPC_ORDER, _LPC_PREC, _LPC_SHIFT = 2, 12, 5
_LPC_COEF = [63, -31]  # arbitrary fixed fixture coefficients


def _write_subframe(bw: _BitWriter, s: np.ndarray, bits: int, mode: str):
    s = s.astype(np.int64)
    if mode == "auto":
        mode = "constant" if len(s) and (s == s[0]).all() else "fixed"
    if mode == "lpc" and len(s) <= _LPC_ORDER:
        mode = "verbatim"  # too short for the fixture predictor
    bw.write(0, 1)  # padding
    if mode == "constant":
        if not (s == s[0]).all():
            raise ValueError("constant subframe over non-constant data")
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(s[0]), bits)
    elif mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in s:
            bw.write_signed(int(v), bits)
    elif mode == "fixed":
        order = min(2, len(s))
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for v in s[:order]:
            bw.write_signed(int(v), bits)
        if order == 2:
            res = s[2:] - (2 * s[1:-1] - s[:-2])
        elif order == 1:
            res = s[1:] - s[:-1]
        else:
            res = s[0:0]
        _write_residual(bw, res)
    elif mode == "lpc":
        order = _LPC_ORDER
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)
        for v in s[:order]:
            bw.write_signed(int(v), bits)
        bw.write(_LPC_PREC - 1, 4)
        bw.write_signed(_LPC_SHIFT, 5)
        for c in _LPC_COEF:
            bw.write_signed(c, _LPC_PREC)
        pred = (_LPC_COEF[0] * s[1:-1] + _LPC_COEF[1] * s[:-2]) >> _LPC_SHIFT
        _write_residual(bw, s[2:] - pred)
    else:
        raise ValueError(f"unknown subframe mode {mode!r}")


def encode_flac(samples: np.ndarray, rate: int, *, bits: int = 16,
                block_size: int = 1024, subframe: str = "auto",
                stereo: str = "independent") -> bytes:
    """float samples in [-1, 1] (frames or frames×ch) -> FLAC bytes.

    ``subframe``: 'auto' (constant where flat, else fixed order <= 2),
    'verbatim', 'fixed', 'lpc' (fixed fixture coefficients).
    ``stereo`` (2-channel input only): 'independent', 'left_side',
    'right_side', 'mid_side'."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if ch > 8:
        raise ValueError("FLAC: at most 8 channels")
    if stereo != "independent" and ch != 2:
        raise ValueError("stereo decorrelation requires 2 channels")
    peak = 1 << (bits - 1)
    ints = np.clip(
        np.round(samples * peak), -peak, peak - 1
    ).astype(np.int64)

    out = bytearray(MAGIC)
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(ch - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\0" * 16  # zero MD5 = unset, per spec
    out.append(0x80)  # last block, type 0 (STREAMINFO)
    out += struct.pack(">I", len(body))[1:]
    out += body

    try:
        ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits]
    except KeyError:
        raise ValueError(f"FLAC: unsupported bit depth {bits}") from None
    asgn = {"independent": ch - 1, "left_side": 8, "right_side": 9,
            "mid_side": 10}[stereo]

    frame_no = 0
    for start in range(0, max(n, 1), block_size):
        blk = ints[start:start + block_size]
        bsize = len(blk)
        if bsize == 0:
            break
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed-blocksize strategy
        bw.write(7, 4)  # block size as 16-bit value - 1
        bw.write(0, 4)  # sample rate from STREAMINFO
        bw.write(asgn, 4)
        bw.write(ss_code, 3)
        bw.write(0, 1)
        _write_coded_number(bw, frame_no)
        bw.write(bsize - 1, 16)
        bw.align()
        hdr = bw.bytes()
        hdr += bytes([crc8(hdr)])

        if stereo == "independent":
            chans = [(blk[:, c], bits) for c in range(ch)]
        else:
            left = blk[:, 0]
            right = blk[:, 1]
            side = left - right
            if stereo == "left_side":
                chans = [(left, bits), (side, bits + 1)]
            elif stereo == "right_side":
                chans = [(side, bits + 1), (right, bits)]
            else:
                chans = [((left + right) >> 1, bits), (side, bits + 1)]
        sw = _BitWriter()
        for s, b in chans:
            _write_subframe(sw, s, b, subframe)
        sw.align()
        frame = hdr + sw.bytes()
        frame += struct.pack(">H", crc16(frame))
        out += frame
        frame_no += 1

    return bytes(out)
