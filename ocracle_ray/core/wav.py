"""Stdlib WAV (RIFF) codec for the multimodal audio stages.

Like ``core.png``: the most common real formats decode without any
external library, so only genuinely compressed codecs (mp3/ogg/aac)
remain behind the honest NotImplementedError in
``stages.multimodal.AudioFeatures``.

Scope (round 4 widened from 8/16-bit PCM): PCM 8/16/24/32-bit, G.711
mu-law and A-law (ITU telephony — format tags 7 and 6, the expansion
arithmetic is the classic g711 reference formulas), and
WAVE_FORMAT_EXTENSIBLE wrapping any of those. The RIFF walk is manual
(Python's ``wave`` module refuses non-PCM format tags). Error contract
is ValueError for malformed bytes.

``encode_wav`` (16-bit PCM) and ``encode_wav_g711`` (mu-law / A-law via
nearest-representable-level search over the 256-entry decode table) are
the fixture producers.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


# --------------------------------------------------------------- G.711

_SEG_SHIFT, _QUANT_MASK, _SEG_MASK, _SIGN_BIT, _BIAS = 4, 0x0F, 0x70, 0x80, 0x84


def _ulaw_table() -> np.ndarray:
    """256-entry mu-law byte -> linear int16 (g711.c ulaw2linear)."""
    u = np.arange(256, dtype=np.int64) ^ 0xFF  # ~u_val (low 8 bits)
    t = ((u & _QUANT_MASK) << 3) + _BIAS
    t <<= (u & _SEG_MASK) >> _SEG_SHIFT
    return np.where(u & _SIGN_BIT, _BIAS - t, t - _BIAS).astype(np.int16)


def _alaw_table() -> np.ndarray:
    """256-entry A-law byte -> linear int16 (g711.c alaw2linear)."""
    a = np.arange(256, dtype=np.int64) ^ 0x55
    t = (a & _QUANT_MASK) << 4
    seg = (a & _SEG_MASK) >> _SEG_SHIFT
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & _SIGN_BIT, t, -t).astype(np.int16)


_ULAW = _ulaw_table()
_ALAW = _alaw_table()

_TAG_PCM, _TAG_ALAW, _TAG_ULAW, _TAG_EXTENSIBLE = 1, 6, 7, 0xFFFE


def _walk_chunks(data: bytes):
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        yield cid, body
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> (sample_rate, n_channels, samples[frame, channel]
    as float64 in [-1, 1])."""
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF header)")
    fmt = pcm = None
    for cid, body in _walk_chunks(data):
        if cid == b"fmt " and fmt is None:
            if len(body) < 16:
                raise ValueError("malformed WAV: short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
            if fmt[0] == _TAG_EXTENSIBLE:
                # the real tag is the first two GUID bytes of the
                # extension (WAVEFORMATEXTENSIBLE SubFormat)
                if len(body) < 26:
                    raise ValueError("malformed WAV: short extensible fmt")
                (sub,) = struct.unpack("<H", body[24:26])
                fmt = (sub,) + fmt[1:]
        elif cid == b"data" and pcm is None:
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError("malformed WAV: missing fmt or data chunk")
    tag, ch, rate, _bps, _align, bits = fmt
    if ch < 1 or rate < 1:
        raise ValueError(f"malformed WAV: channels={ch} rate={rate}")
    if tag == _TAG_PCM:
        if bits == 8:  # 8-bit PCM is unsigned
            raw = np.frombuffer(pcm, np.uint8).astype(np.float64)
            samples = (raw - 128.0) / 128.0
        elif bits == 16:
            samples = np.frombuffer(pcm, "<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b = np.frombuffer(pcm[: len(pcm) - len(pcm) % 3], np.uint8).reshape(-1, 3)
            v = (
                b[:, 0].astype(np.int64)
                | (b[:, 1].astype(np.int64) << 8)
                | (b[:, 2].astype(np.int64) << 16)
            )
            v -= (v & 0x800000) << 1  # sign-extend
            samples = v.astype(np.float64) / 8388608.0
        elif bits == 32:
            samples = np.frombuffer(pcm, "<i4").astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(f"WAV: {bits}-bit PCM (8/16/24/32 supported)")
    elif tag == _TAG_ULAW:
        samples = _ULAW[np.frombuffer(pcm, np.uint8)].astype(np.float64) / 32768.0
    elif tag == _TAG_ALAW:
        samples = _ALAW[np.frombuffer(pcm, np.uint8)].astype(np.float64) / 32768.0
    else:
        raise NotImplementedError(
            f"WAV format tag {tag}: PCM (1), A-law (6) and mu-law (7) supported"
        )
    n_frames = len(samples) // ch
    return rate, ch, samples[: n_frames * ch].reshape(-1, ch)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float samples in [-1, 1] (frames or frames×ch) -> 16-bit PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    ch = samples.shape[1]
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def encode_wav_g711(samples: np.ndarray, rate: int, *, law: str = "mu") -> bytes:
    """float samples in [-1, 1] (frames or frames×ch) -> G.711 WAV
    (format tag 7 mu-law / 6 A-law). Encoding picks the
    nearest-representable level from the 256-entry decode table, so
    decode(encode(x)) is the best 8-bit companded approximation —
    deterministic and exactly invertible through ``decode_wav``."""
    if law not in ("mu", "a"):
        raise ValueError(f"law must be 'mu' or 'a', got {law!r}")
    table = _ULAW if law == "mu" else _ALAW
    tag = _TAG_ULAW if law == "mu" else _TAG_ALAW
    if samples.ndim == 1:
        samples = samples[:, None]
    ch = samples.shape[1]
    lin = np.clip(np.round(samples.reshape(-1) * 32768.0), -32768, 32767)
    # nearest level via searchsorted over the sorted table (256 levels)
    order = np.argsort(table, kind="stable")
    levels = table[order].astype(np.float64)
    pos = np.searchsorted(levels, lin)
    lo = np.clip(pos - 1, 0, 255)
    hi = np.clip(pos, 0, 255)
    pick = np.where(np.abs(levels[hi] - lin) < np.abs(lin - levels[lo]), hi, lo)
    codes = order[pick].astype(np.uint8)
    fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * ch, ch, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(codes)) + codes.tobytes()
    return b"RIFF" + struct.pack("<I", len(body)) + body
