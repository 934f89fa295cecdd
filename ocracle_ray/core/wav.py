"""Stdlib WAV (RIFF/PCM) codec for the multimodal audio stages.

Like ``core.png``: the most common real format decodes without any
external library (Python's ``wave`` + numpy), so only compressed
codecs (mp3/ogg/aac) remain behind the honest NotImplementedError in
``stages.multimodal.AudioFeatures``. Scope: PCM 8/16-bit, any channel
count; error contract is ValueError for malformed bytes."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> (sample_rate, n_channels, samples[frame, channel]
    as float64 in [-1, 1])."""
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF header)")
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            rate = w.getframerate()
            ch = w.getnchannels()
            width = w.getsampwidth()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError, struct.error) as e:
        raise ValueError(f"malformed WAV: {e}") from e
    if width == 1:  # 8-bit PCM is unsigned
        raw = np.frombuffer(frames, np.uint8).astype(np.float64)
        samples = (raw - 128.0) / 128.0
    elif width == 2:
        samples = np.frombuffer(frames, "<i2").astype(np.float64) / 32768.0
    else:
        raise NotImplementedError(f"WAV sample width {width * 8} bit: only 8/16-bit PCM")
    if ch > 1:
        samples = samples.reshape(-1, ch)
    else:
        samples = samples.reshape(-1, 1)
    return rate, ch, samples


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
