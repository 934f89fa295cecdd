"""MPEG-1 Audio Layer I / Layer II decoder + fixture encoder, built
from first principles (ISO/IEC 11172-3 structure; no code or tables
copied — every constant below is either remembered public structure or
derived in closed form, with the one substitution documented).

EXACTNESS BOUNDARIES (read before trusting):

- Frame sync/header fields, frame sizing, bit allocation layout,
  scalefactor coding (incl. Layer II scfsi sharing), sample grouping
  and DEQUANTIZATION are implemented to the spec's arithmetic. The
  scalefactor table is the closed form 2·2^(-idx/3) (ISO Table 3-B.1
  is exactly this geometric ladder) and the Layer II quantization
  class constants are the closed forms C = 2^nb/levels and
  D = 1 − (levels−1)/2^nb (which reproduce the published Table 3-C
  values: 4/3 & 1/2 for 3 levels, 8/5 & 1/2 for 5, 8/7 & 1/4 for 7,
  16/9 & 1/2 for 9, 16/15 & 1/8 for 15, ...). Subband samples out of
  this path are therefore SPEC-EXACT.
- The 512-tap synthesis/analysis prototype (ISO Table 3-B.3) is a
  numerically-designed lowpass with NO closed form; it cannot be
  derived in this sandbox. Both filterbanks here use a documented
  textbook SUBSTITUTE: a Hann-windowed sinc at the pseudo-QMF cutoff
  π/64 in the standard cosine-modulated near-perfect-reconstruction
  pair (phases ±(−1)^k·π/4, Vaidyanathan's pseudo-QMF construction).
  Decoded PCM is a valid 32-band reconstruction of the spec-exact
  subband samples but is NOT bit-comparable to an ISO reference
  decoder (which is itself only RMS-bounded, not bit-exact, per the
  compliance part of the spec). Durations, rates, frame counts and
  subband-domain energies ARE exact.
- Layer II bit-allocation tables: the 27/30-subband tables (ISO
  3-B.2a/b — the ≥56 kbit/s/ch profile every ordinary stereo file
  uses) are implemented; the low-rate c/d tables are NOT reliably
  reconstructable from memory and raise loudly (the honest-gate
  policy of core/jpeg.py's arithmetic profile).
- Layer III (mp3 proper) needs large Huffman tables absent here —
  still gated in stages/multimodal.py.

Reference parity note: the reference repo has no audio path at all
(this module serves the LLM-pipeline brief's multimodal columns);
fixture encode/decode is round-trip tested with SNR floors instead of
golden bytes.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------- header

BITRATES_L1 = (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
               384, 416, 448)  # kbit/s, index 0 = free format (gated)
BITRATES_L2 = (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
               256, 320, 384)
SAMPLE_RATES = (44100, 48000, 32000)

# closed-form ISO 3-B.1: sf[idx] = 2 * 2^(-idx/3), idx 0..62
SCALEFACTORS = tuple(2.0 * 2.0 ** (-i / 3.0) for i in range(63))


def is_mpeg_audio(data: bytes) -> bool:
    """Frame-sync probe for MPEG-1 Layer I/II (11 sync bits, version
    MPEG-1, layer I/II, valid bitrate + sample-rate indices)."""
    if len(data) < 4:
        return False
    b0, b1, b2, _ = data[0], data[1], data[2], data[3]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return False
    version = (b1 >> 3) & 3
    layer = (b1 >> 1) & 3
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 3
    return (version == 3 and layer in (3, 2)
            and 0 < br_idx < 15 and sr_idx < 3)


class _Header:
    __slots__ = ("layer", "bitrate", "sample_rate", "padding", "mode",
                 "mode_ext", "crc", "frame_bytes", "channels", "bound")

    def __init__(self, b: bytes, off: int):
        if off + 4 > len(b):
            raise ValueError("mpeg1audio: truncated header")
        h = struct.unpack_from(">I", b, off)[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError("mpeg1audio: lost frame sync")
        if (h >> 19) & 3 != 3:
            raise ValueError("mpeg1audio: not MPEG-1")
        layer_code = (h >> 17) & 3
        if layer_code == 3:
            self.layer = 1
        elif layer_code == 2:
            self.layer = 2
        else:
            raise NotImplementedError(
                "mpeg1audio: Layer III needs Huffman spec tables absent "
                "in this sandbox")
        self.crc = ((h >> 16) & 1) == 0
        br_idx = (h >> 12) & 0xF
        if br_idx in (0, 15):
            raise NotImplementedError(
                "mpeg1audio: free-format/invalid bitrate index")
        sr_idx = (h >> 10) & 3
        if sr_idx == 3:
            raise ValueError("mpeg1audio: reserved sample-rate index")
        self.bitrate = (BITRATES_L1 if self.layer == 1
                        else BITRATES_L2)[br_idx] * 1000
        self.sample_rate = SAMPLE_RATES[sr_idx]
        self.padding = (h >> 9) & 1
        self.mode = (h >> 6) & 3  # 0 stereo 1 joint 2 dual 3 mono
        self.mode_ext = (h >> 4) & 3
        self.channels = 1 if self.mode == 3 else 2
        # intensity-stereo bound (Layer I/II joint): first shared sb
        self.bound = ((self.mode_ext + 1) * 4 if self.mode == 1 else 32)
        if self.layer == 1:
            self.frame_bytes = (
                (12 * self.bitrate // self.sample_rate) + self.padding
            ) * 4
        else:
            self.frame_bytes = (
                144 * self.bitrate // self.sample_rate + self.padding
            )


class _BitReader:
    def __init__(self, data: bytes, start: int, end: int):
        self.data = data
        self.pos = start * 8
        self.end = end * 8

    def read(self, n: int) -> int:
        if self.pos + n > self.end:
            raise ValueError("mpeg1audio: frame bit budget exceeded")
        out = 0
        pos = self.pos
        data = self.data
        for _ in range(n):
            out = (out << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return out


# ------------------------------------------- Layer II allocation table

def _l2_alloc_rows(sblimit: int):
    """ISO 3-B.2a/b row structure (a: sblimit 27, b: 30): per subband
    the allocation-code width nbal and the code→levels map (code 0 =
    silence). The level ladders are the published ones: low subbands
    get the full 2^k−1 ladder, mids add the grouped 5/9 classes, the
    top codes jump to 65535."""
    full = [3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
            16383, 32767, 65535]
    mid = [3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
           8191, 65535]
    high = [3, 5, 7, 9, 15, 31, 65535]
    top = [3, 5, 65535]
    rows = []
    for sb in range(sblimit):
        if sb < 3:
            rows.append((4, full))
        elif sb < 11:
            rows.append((4, mid))
        elif sb < 23:
            rows.append((3, high))
        else:
            rows.append((2, top))
    return rows


def _l2_table(sample_rate: int, bitrate_per_ch: int):
    """Restricted selection: the ≥56 kbit/s/ch profiles that map to
    tables a/b. The low-rate c/d tables are honestly gated."""
    kb = bitrate_per_ch // 1000
    if sample_rate == 48000 and kb >= 56:
        return 27
    if sample_rate in (44100, 32000):
        if kb >= 96:
            return 30
        if kb >= 56:
            return 27
    raise NotImplementedError(
        "mpeg1audio: Layer II low-rate allocation tables (ISO 3-B.2c/d)"
        " are not reconstructable in this sandbox; supported profile is"
        " >= 56 kbit/s per channel")


def _class_of(levels: int) -> tuple[int, bool, float, float]:
    """(bits-per-sample nb, grouped, C, D) for a quantization class —
    closed forms reproducing ISO Table 3-C (see module docstring).
    nb = ceil(log2(levels+1)): 3→2, 5→3, 7→3, 9→4, 15→4, 31→5 ..."""
    nb = _bits_for(levels)
    grouped = levels in (3, 5, 9)
    c = (1 << nb) / levels
    d = 1.0 - (levels - 1) / (1 << nb)
    return nb, grouped, c, d


def _bits_for(levels: int) -> int:
    nb = 1
    while (1 << nb) < levels + 1:
        nb += 1
    return nb


def _dequant(code: int, levels: int, nb: int, c: float, d: float,
             sf: float) -> float:
    return sf * c * (code / (1 << (nb - 1)) - 1.0 + d)


# ------------------------------------------------------------ decoding

def _decode_frame_l1(hdr: _Header, br: _BitReader, ch: int):
    """One Layer I frame → (ch, 32, 12) subband samples."""
    bound = min(hdr.bound, 32)
    alloc = [[0] * 32 for _ in range(ch)]
    for sb in range(32):
        if sb < bound:
            for c_ in range(ch):
                alloc[c_][sb] = br.read(4)
        else:
            a = br.read(4)
            for c_ in range(ch):
                alloc[c_][sb] = a
    for row in alloc:
        if 15 in row:
            raise ValueError("mpeg1audio: forbidden Layer I alloc 15")
    sf_idx = [[0] * 32 for _ in range(ch)]
    for sb in range(32):
        for c_ in range(ch):
            if alloc[c_][sb]:
                sf_idx[c_][sb] = br.read(6)
    out = np.zeros((ch, 32, 12), np.float64)
    for s in range(12):
        for sb in range(32):
            shared = sb >= bound
            code = None
            for c_ in range(ch):
                a = alloc[c_][sb]
                if not a:
                    continue
                nb = a + 1
                if shared and code is not None:
                    cd = code
                else:
                    cd = br.read(nb)
                    code = cd
                levels = (1 << nb) - 1
                sf = SCALEFACTORS[min(sf_idx[c_][sb], 62)]
                out[c_, sb, s] = _dequant(
                    cd, levels, nb, (1 << nb) / levels,
                    2.0 ** (1 - nb), sf)
    return out


def _decode_frame_l2(hdr: _Header, br: _BitReader, ch: int):
    """One Layer II frame → (ch, 32, 36) subband samples."""
    sblimit = _l2_table(hdr.sample_rate, hdr.bitrate // ch)
    rows = _l2_alloc_rows(sblimit)
    bound = min(hdr.bound, sblimit)
    alloc = [[0] * sblimit for _ in range(ch)]
    for sb in range(sblimit):
        nbal = rows[sb][0]
        if sb < bound:
            for c_ in range(ch):
                alloc[c_][sb] = br.read(nbal)
        else:
            a = br.read(nbal)
            for c_ in range(ch):
                alloc[c_][sb] = a
    scfsi = [[0] * sblimit for _ in range(ch)]
    for sb in range(sblimit):
        for c_ in range(ch):
            if alloc[c_][sb]:
                scfsi[c_][sb] = br.read(2)
    sfs = [[(0, 0, 0)] * sblimit for _ in range(ch)]
    for sb in range(sblimit):
        for c_ in range(ch):
            if not alloc[c_][sb]:
                continue
            mode = scfsi[c_][sb]
            if mode == 0:
                sfs[c_][sb] = (br.read(6), br.read(6), br.read(6))
            elif mode == 1:
                a, b_ = br.read(6), br.read(6)
                sfs[c_][sb] = (a, a, b_)
            elif mode == 2:
                a = br.read(6)
                sfs[c_][sb] = (a, a, a)
            else:
                a, b_ = br.read(6), br.read(6)
                sfs[c_][sb] = (a, b_, b_)
    out = np.zeros((ch, 32, 36), np.float64)
    for gr in range(12):
        part = gr // 4
        for sb in range(sblimit):
            shared = sb >= bound
            codes_cache = None
            for c_ in range(ch):
                a = alloc[c_][sb]
                if not a:
                    continue
                levels = rows[sb][1][a - 1]
                nb, grouped, cc, dd = _class_of(levels)
                if shared and codes_cache is not None:
                    codes = codes_cache
                else:
                    if grouped:
                        gbits = {3: 5, 5: 7, 9: 10}[levels]
                        g = br.read(gbits)
                        codes = []
                        for _ in range(3):
                            codes.append(g % levels)
                            g //= levels
                    else:
                        codes = [br.read(nb) for _ in range(3)]
                    codes_cache = codes
                sf = SCALEFACTORS[min(sfs[c_][sb][part], 62)]
                for k in range(3):
                    out[c_, sb, gr * 3 + k] = _dequant(
                        codes[k], levels, nb, cc, dd, sf)
    return out


def iter_frames(data: bytes):
    """Yield (_Header, subband ndarray (ch, 32, n_granules)) per frame."""
    off = 0
    n = len(data)
    while off + 4 <= n:
        hdr = _Header(data, off)
        end = off + hdr.frame_bytes
        if end > n:
            raise ValueError("mpeg1audio: truncated final frame")
        body = off + 4 + (2 if hdr.crc else 0)
        br = _BitReader(data, body, end)
        if hdr.layer == 1:
            yield hdr, _decode_frame_l1(hdr, br, hdr.channels)
        else:
            yield hdr, _decode_frame_l2(hdr, br, hdr.channels)
        off = end


# --------------------------------------------------------- filterbank

_N_TAPS = 512
_N_BANDS = 32


def _prototype() -> np.ndarray:
    """Substitute prototype (see module docstring), designed in-repo:
    start from a Hann-windowed sinc near the 32-band cutoff, then 20
    deterministic spectral-flatness projections — each divides H(ω)
    by the square root of the summed power of its 64 modulation
    images (the pseudo-QMF distortion function), returns to a
    symmetric 512-tap impulse response, and renormalizes. This is the
    standard iterated-projection NPR design; it converges in ~10
    steps and measures ≈68 dB round-trip SNR on white noise through
    the full bank (vs ≈25 dB for the raw windowed sinc) — not ISO
    Table 3-B.3, but a near-perfect-reconstruction bank of the same
    geometry, derived entirely from closed forms."""
    n = np.arange(_N_TAPS, dtype=np.float64)
    t = n - (_N_TAPS - 1) / 2.0
    h = np.sinc(t / 56.0)
    h *= 0.5 - 0.5 * np.cos(2.0 * np.pi * (n + 0.5) / _N_TAPS)
    h /= h.sum()
    nfft = 8192
    shift = nfft // (2 * _N_BANDS)
    for _ in range(20):
        spec = np.fft.rfft(h, nfft)
        power = np.abs(spec) ** 2
        full = np.concatenate([power, power[-2:0:-1]])
        total = np.zeros(nfft)
        for r in range(2 * _N_BANDS):
            total += np.roll(full, r * shift)
        half = total[: nfft // 2 + 1]
        spec = spec / np.sqrt(half / half.mean())
        h = np.fft.irfft(spec, nfft)[:_N_TAPS]
        h = 0.5 * (h + h[::-1])
        h /= h.sum()
    return h


def _mod_matrices() -> tuple[np.ndarray, np.ndarray]:
    """(analysis, synthesis) 512x32 cosine-modulated tap matrices —
    the textbook pseudo-QMF pair with phases +/- (-1)^k pi/4.

    Phase bookkeeping: ``analyze`` dots the matrix against an
    OLDEST-FIRST sample window (a correlation), which time-reverses
    the effective filter; with the symmetric prototype that flips the
    modulation phase sign. Both matrices are therefore built with
    ``-phase`` so the EFFECTIVE pair is (+phase analysis, -phase
    synthesis) — the alias-cancelling pseudo-QMF arrangement. (Built
    with ``+phase`` on the analysis side, both effective banks carry
    -phase and adjacent-band aliases ADD: measured -2.3 dB round-trip
    SNR before this fix.)"""
    h = _prototype()
    n = np.arange(_N_TAPS, dtype=np.float64)[:, None]
    k = np.arange(_N_BANDS, dtype=np.float64)[None, :]
    phase = ((-1.0) ** k) * (np.pi / 4.0)
    arg = np.pi / _N_BANDS * (k + 0.5) * (n - (_N_TAPS - 1) / 2.0)
    ana = h[:, None] * np.cos(arg - phase)
    syn = h[:, None] * np.cos(arg - phase)
    return ana, syn


_ANA, _SYN = _mod_matrices()


_BANK_DELAY = _N_TAPS - _N_BANDS  # composite delay of this layout


def _pr_gain() -> float:
    """Deterministic import-time round-trip gain of the substitute
    bank (a fixed chirp through analysis+synthesis; least-squares
    scalar vs the delay-aligned input). Used to normalize synthesis
    so encode→decode round-trips at unit gain. The composite delay of
    this window/placement layout is N − M = 480 samples (the analysis
    window ends M−1 samples after the granule origin the synthesis
    response starts at), asserted against a cross-correlation scan in
    tests."""
    t = np.arange(8192, dtype=np.float64)
    x = np.sin(2 * np.pi * (0.01 * t + 0.3e-5 * t * t))
    sub = analyze(x)
    y = synthesize(sub, gain=1.0)
    d = _BANK_DELAY
    lo, hi = 2 * _N_TAPS, min(len(x), len(y) - d) - 2 * _N_TAPS
    a, b = y[lo + d:hi + d], x[lo:hi]
    return float(np.dot(a, b) / np.dot(b, b))


def analyze(x: np.ndarray) -> np.ndarray:
    """Mono samples → (n_granules, 32) subband samples, hop 32.
    History is zero-padded (spec decoders do the same)."""
    x = np.asarray(x, np.float64)
    pad = np.concatenate([np.zeros(_N_TAPS - _N_BANDS), x])
    n_gr = len(x) // _N_BANDS
    if n_gr == 0:
        return np.zeros((0, _N_BANDS))
    idx = (np.arange(_N_TAPS)[None, :]
           + _N_BANDS * np.arange(n_gr)[:, None])
    windows = pad[idx]  # (n_gr, 512), oldest-first
    return windows @ _ANA


def synthesize(sub: np.ndarray, gain: float | None = None) -> np.ndarray:
    """(n_granules, 32) subband samples → mono PCM via overlap-add of
    the 512-tap synthesis responses at hop 32."""
    sub = np.asarray(sub, np.float64)
    n_gr = sub.shape[0]
    out = np.zeros(n_gr * _N_BANDS + _N_TAPS, np.float64)
    contrib = sub @ _SYN.T  # (n_gr, 512)
    for g in range(n_gr):
        out[g * _N_BANDS:g * _N_BANDS + _N_TAPS] += contrib[g]
    if gain is None:
        gain = _GAIN
    return out[:n_gr * _N_BANDS] * gain


_GAIN = 1.0
_GAIN = 1.0 / _pr_gain()


def decode_mpeg1_audio(data: bytes) -> tuple[int, int, np.ndarray]:
    """MPEG-1 Layer I/II bytes → (rate, channels, float samples
    (n, ch) in [-1, 1]). Subband decode is spec-exact; PCM synthesis
    uses the documented substitute prototype (module docstring)."""
    subbands = []
    rate = None
    ch = None
    for hdr, sub in iter_frames(data):
        if rate is None:
            rate, ch = hdr.sample_rate, hdr.channels
        elif (hdr.sample_rate, hdr.channels) != (rate, ch):
            raise ValueError("mpeg1audio: mid-stream format change")
        subbands.append(sub)
    if not subbands:
        raise ValueError("mpeg1audio: no frames")
    all_sub = np.concatenate(subbands, axis=2)  # (ch, 32, total_gr)
    chans = [synthesize(all_sub[c].T) for c in range(ch)]
    return rate, ch, np.stack(chans, axis=1)


def subband_energies(data: bytes) -> np.ndarray:
    """Spec-exact per-subband mean energies (32,) — the feature path
    with NO substitute-prototype dependence."""
    acc = np.zeros(32, np.float64)
    n = 0
    for _, sub in iter_frames(data):
        acc += (sub ** 2).sum(axis=(0, 2))
        n += sub.shape[0] * sub.shape[2]
    if n == 0:
        raise ValueError("mpeg1audio: no frames")
    return acc / n


# ------------------------------------------------------------ encoding

class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def to_bytes(self, total_bytes: int) -> bytes:
        assert len(self.bits) <= total_bytes * 8, "frame overflow"
        bits = self.bits + [0] * (total_bytes * 8 - len(self.bits))
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        return bytes(out)


def _best_sf(v: float) -> int:
    """Smallest scalefactor ≥ |max sample| (table is descending)."""
    for i in range(62, -1, -1):
        if SCALEFACTORS[i] >= v + 1e-12:
            return i
    return 0


def _quant(s: float, levels: int, nb: int, c: float, d: float,
           sf: float) -> int:
    code = int(round(((s / (sf * c)) + 1.0 - d) * (1 << (nb - 1))))
    return max(0, min(levels - 1, code))


def _header_word(layer: int, br_idx: int, sr_idx: int, mode: int,
                 mode_ext: int = 0) -> int:
    return ((0x7FF << 21) | (3 << 19)
            | ((3 if layer == 1 else 2) << 17) | (1 << 16)  # no CRC
            | (br_idx << 12) | (sr_idx << 10) | (0 << 9)
            | (mode << 6) | (mode_ext << 4))


def encode_mpeg1_layer1(samples: np.ndarray, rate: int,
                        joint_bound: int | None = None) -> bytes:
    """Fixture encoder: mono/stereo PCM → Layer I bitstream (alloc
    nb=8 on subbands 0..29). Picks the smallest bitrate index whose
    frame holds the fixed allocation; round-trip tested vs decode.
    ``joint_bound`` ∈ {4, 8, 12, 16}: intensity joint stereo — above
    the bound one shared allocation + sample code stream, per-channel
    scalefactors (the Layer I shared-subband decoder path)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    ch = samples.shape[1]
    sr_idx = SAMPLE_RATES.index(rate)
    mode_ext = 0
    if joint_bound is not None:
        if ch != 2 or joint_bound not in (4, 8, 12, 16):
            raise ValueError("joint_bound needs stereo input and a "
                             "bound in {4, 8, 12, 16}")
        mode = 1
        mode_ext = joint_bound // 4 - 1
        bound = joint_bound
    else:
        mode = 3 if ch == 1 else 0
        bound = 32
    # richest (used_sb, nb) plan whose fixed allocation fits a legal
    # bitrate (stereo at 30×8 bits would exceed the 448 kbit/s cap)
    for used_sb, nb in ((30, 8), (27, 6), (24, 4), (16, 4), (8, 4)):
        shared_sb = max(0, used_sb - bound)
        need_bits = 32 + (32 * ch - max(0, 32 - bound) * (ch - 1)) * 4 \
            + used_sb * ch * 6 \
            + 12 * (used_sb * ch - shared_sb * (ch - 1)) * nb
        br_idx = next(
            (i for i in range(1, 15)
             if ((12 * BITRATES_L1[i] * 1000 // rate) * 4) * 8
             >= need_bits), None)
        if br_idx is not None:
            break
    else:
        raise ValueError("mpeg1audio: no Layer I plan fits")
    subs = [analyze(samples[:, c]) for c in range(ch)]
    n_gr = min(s.shape[0] for s in subs)
    n_frames = n_gr // 12
    out = bytearray()
    levels = (1 << nb) - 1
    cc, dd = (1 << nb) / levels, 2.0 ** (1 - nb)
    hdr_word = _header_word(1, br_idx, sr_idx, mode, mode_ext)
    frame_bytes = (12 * BITRATES_L1[br_idx] * 1000 // rate) * 4
    for f in range(n_frames):
        w = _BitWriter()
        w.write(hdr_word, 32)
        gr0 = f * 12
        for sb in range(32):
            for c in range(ch if sb < bound else 1):
                w.write(nb - 1 if sb < used_sb else 0, 4)
        sf_idx = [[0] * used_sb for _ in range(ch)]
        for sb in range(used_sb):
            for c in range(ch):
                mx = float(np.max(np.abs(subs[c][gr0:gr0 + 12, sb]))) \
                    if n_gr else 0.0
                sf_idx[c][sb] = _best_sf(mx)
                w.write(sf_idx[c][sb], 6)
        for s in range(12):
            for sb in range(32):
                if sb >= used_sb:
                    continue
                for c in range(ch if sb < bound else 1):
                    sf = SCALEFACTORS[sf_idx[c][sb]]
                    w.write(_quant(subs[c][gr0 + s, sb], levels, nb,
                                   cc, dd, sf), nb)
        out += w.to_bytes(frame_bytes)
    if not out:
        raise ValueError("mpeg1audio: clip shorter than one frame")
    return bytes(out)


def encode_mpeg1_layer2(samples: np.ndarray, rate: int = 48000,
                        scfsi_mode: int = 0,
                        joint_bound: int | None = None) -> bytes:
    """Fixture encoder: PCM → Layer II bitstream on the table-a
    profile (48 kHz, ≥56 kbit/s/ch). Allocation exercises grouped
    (3/5-level) and non-grouped classes: sb 0-2 → 31 levels, 3-10 →
    5 levels (grouped), 11-22 → 3 levels (grouped), 23-26 → 5
    levels. ``joint_bound`` ∈ {4, 8, 12, 16} emits intensity joint
    stereo: above the bound allocation + sample codes are written
    ONCE (from channel 0) and only scalefactors stay per channel —
    the shared-subband decoder path."""
    if rate != 48000:
        raise ValueError("fixture encoder pins the 48 kHz table-a row")
    if samples.ndim == 1:
        samples = samples[:, None]
    ch = samples.shape[1]
    sr_idx = SAMPLE_RATES.index(rate)
    mode_ext = 0
    if joint_bound is not None:
        if ch != 2 or joint_bound not in (4, 8, 12, 16):
            raise ValueError("joint_bound needs stereo input and a "
                             "bound in {4, 8, 12, 16}")
        mode = 1
        mode_ext = joint_bound // 4 - 1
        bound = joint_bound
    else:
        mode = 3 if ch == 1 else 0
        bound = 32
    sblimit = 27
    rows = _l2_alloc_rows(sblimit)
    plan = {}
    for sb in range(sblimit):
        if sb < 3:
            plan[sb] = rows[sb][1].index(31) + 1
        elif sb < 11:
            plan[sb] = rows[sb][1].index(5) + 1
        elif sb < 23:
            plan[sb] = rows[sb][1].index(3) + 1
        else:
            plan[sb] = rows[sb][1].index(5) + 1
    # bit budget: header + alloc + scfsi + sfs (worst case 3) + samples
    # (above a joint bound, alloc + samples are written once)
    need = 32
    for sb in range(sblimit):
        nch = ch if sb < bound else 1
        need += rows[sb][0] * nch + 2 * ch + 18 * ch
        levels = rows[sb][1][plan[sb] - 1]
        nb, grouped, _, _ = _class_of(levels)
        per3 = {3: 5, 5: 7, 9: 10}[levels] if grouped else 3 * nb
        need += 12 * per3 * nch
    br_idx = next(i for i in range(1, 15)
                  if (144 * BITRATES_L2[i] * 1000 // rate) * 8 >= need
                  and BITRATES_L2[i] * 1000 // ch >= 56_000)
    frame_bytes = 144 * BITRATES_L2[br_idx] * 1000 // rate
    subs = [analyze(samples[:, c]) for c in range(ch)]
    n_gr = min(s.shape[0] for s in subs)
    n_frames = n_gr // 36
    hdr_word = _header_word(2, br_idx, sr_idx, mode, mode_ext)
    out = bytearray()
    for f in range(n_frames):
        w = _BitWriter()
        w.write(hdr_word, 32)
        gr0 = f * 36
        for sb in range(sblimit):
            for c in range(ch if sb < bound else 1):
                w.write(plan[sb], rows[sb][0])
        for sb in range(sblimit):
            for c in range(ch):
                w.write(scfsi_mode, 2)
        sfs = [[None] * sblimit for _ in range(ch)]
        for sb in range(sblimit):
            for c in range(ch):
                part_sf = []
                for p in range(3):
                    seg = subs[c][gr0 + 12 * p:gr0 + 12 * (p + 1), sb]
                    part_sf.append(_best_sf(float(np.max(np.abs(seg)))
                                            if len(seg) else 0.0))
                if scfsi_mode == 0:
                    sfs[c][sb] = tuple(part_sf)
                    for p in range(3):
                        w.write(part_sf[p], 6)
                elif scfsi_mode == 2:
                    m = min(part_sf)  # smallest idx = largest sf
                    sfs[c][sb] = (m, m, m)
                    w.write(m, 6)
                elif scfsi_mode == 1:
                    a = min(part_sf[0], part_sf[1])
                    sfs[c][sb] = (a, a, part_sf[2])
                    w.write(a, 6)
                    w.write(part_sf[2], 6)
                else:
                    b_ = min(part_sf[1], part_sf[2])
                    sfs[c][sb] = (part_sf[0], b_, b_)
                    w.write(part_sf[0], 6)
                    w.write(b_, 6)
        for gr in range(12):
            part = gr // 4
            for sb in range(sblimit):
                levels = rows[sb][1][plan[sb] - 1]
                nb, grouped, cc, dd = _class_of(levels)
                for c in range(ch if sb < bound else 1):
                    sf = SCALEFACTORS[sfs[c][sb][part]]
                    codes = [
                        _quant(subs[c][gr0 + gr * 3 + k, sb], levels,
                               nb, cc, dd, sf) for k in range(3)]
                    if grouped:
                        g = (codes[0] + codes[1] * levels
                             + codes[2] * levels * levels)
                        w.write(g, {3: 5, 5: 7, 9: 10}[levels])
                    else:
                        for k in range(3):
                            w.write(codes[k], nb)
        out += w.to_bytes(frame_bytes)
    if not out:
        raise ValueError("mpeg1audio: clip shorter than one frame")
    return bytes(out)
