"""Stdlib PNG codec tests (core/png.py): chunk walk, every scanline
filter, palette expansion, and the multimodal ImageFeatures wiring."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from ocracle_ray.core.png import PNG_SIGNATURE, decode_png, encode_png, is_png


def _rng_image(h, w, ch, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_roundtrip(ch):
    px = _rng_image(13, 9, ch)
    w, h, ch_out, out = decode_png(encode_png(px))
    assert (w, h, ch_out) == (9, 13, ch)
    np.testing.assert_array_equal(out, px)


def _png_with_filters(px: np.ndarray, filters: list[int]) -> bytes:
    """Hand-filter each scanline with the given per-row filter types —
    exercises the decoder's unfilter paths directly."""
    h, w, ch = px.shape
    bpp = ch
    stride = w * ch
    flat = px.reshape(h, stride).astype(np.int16)
    rows = []
    for r, f in enumerate(filters):
        line = flat[r]
        prev = flat[r - 1] if r else np.zeros(stride, np.int16)
        if f == 0:
            enc = line
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int16), line[:-bpp]])
            enc = (line - left) % 256
        elif f == 2:  # Up
            enc = (line - prev) % 256
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int16), line[:-bpp]])
            enc = (line - ((left + prev) >> 1)) % 256
        elif f == 4:  # Paeth
            enc = np.zeros(stride, np.int16)
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                enc[i] = (int(line[i]) - pred) % 256
        rows.append(bytes([f]) + enc.astype(np.uint8).tobytes())
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)

    def chunk(name, body):
        return (
            struct.pack(">I", len(body)) + name + body
            + struct.pack(">I", zlib.crc32(name + body) & 0xFFFFFFFF)
        )

    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )


def test_all_filter_types_unfilter_correctly():
    px = _rng_image(5, 6, 3)
    data = _png_with_filters(px, [0, 1, 2, 3, 4])
    _w, _h, _ch, out = decode_png(data)
    np.testing.assert_array_equal(out, px)


def test_palette_expands_to_rgb():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    rows = b"\x00" + idx[0].tobytes() + b"\x00" + idx[1].tobytes()

    def chunk(name, body):
        return (
            struct.pack(">I", len(body)) + name + body
            + struct.pack(">I", zlib.crc32(name + body) & 0xFFFFFFFF)
        )

    data = (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )
    w, h, ch, out = decode_png(data)
    assert (w, h, ch) == (2, 2, 3)
    np.testing.assert_array_equal(out, pal[idx])


def test_unsupported_depth_raises():
    # round 4: depth 16 / Adam7 / sub-8-bit gray DECODE now; the
    # remaining honest gate is sub-8-bit truecolor (not in the spec's
    # valid combinations anyway) — and a depth byte flipped to 16 on an
    # 8-bit stream is a LENGTH error, not a capability gap
    px = _rng_image(2, 2, 3)
    data = encode_png(px)
    ihdr_off = 8 + 8
    bad = bytearray(data)
    bad[ihdr_off + 8] = 4  # 4-bit RGB: invalid per spec, gated honest
    with pytest.raises(NotImplementedError, match="sub-8-bit"):
        decode_png(bytes(bad))
    bad[ihdr_off + 8] = 16  # 16-bit claimed over an 8-bit stream
    with pytest.raises(ValueError, match="length mismatch|truncated"):
        decode_png(bytes(bad))


def test_not_png_raises():
    assert not is_png(b"IMG1xxxx")
    with pytest.raises(ValueError):
        decode_png(b"IMG1xxxx")


def test_image_features_decodes_png_payload():
    from ocracle_ray.stages.multimodal import ImageFeatures

    px = _rng_image(10, 8, 3)
    t = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "kind": pa.array(["image"], pa.string()),
            "payload": pa.array([encode_png(px)], pa.large_binary()),
        }
    )
    out = ImageFeatures()(t)
    assert out["width"].to_pylist() == [8]
    assert out["height"].to_pylist() == [10]
    assert out["mean_intensity"].to_pylist()[0] == round(float(px.mean()), 4)


def test_image_features_jpeg_still_raises():
    from ocracle_ray.stages.multimodal import ImageFeatures

    t = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "kind": pa.array(["image"], pa.string()),
            "payload": pa.array([b"\xff\xd8\xff\xe0 not decodable"], pa.large_binary()),
        }
    )
    with pytest.raises(NotImplementedError, match="PIL"):
        ImageFeatures()(t)


# --------------------------------------------------------------- wav

def test_wav_roundtrip_and_features():
    import numpy as np

    from ocracle_ray.core.wav import decode_wav, encode_wav, is_wav
    from ocracle_ray.stages.multimodal import AudioFeatures

    t_axis = np.arange(8000) / 8000.0
    tone = 0.5 * np.sin(2 * np.pi * 440 * t_axis)
    data = encode_wav(tone, 8000)
    assert is_wav(data)
    rate, ch, out = decode_wav(data)
    assert (rate, ch) == (8000, 1)
    np.testing.assert_allclose(out[:, 0], tone, atol=1 / 32767)

    t = pa.table(
        {
            "media_id": pa.array([7], pa.int64()),
            "kind": pa.array(["audio"], pa.string()),
            "payload": pa.array([data], pa.large_binary()),
        }
    )
    feats = AudioFeatures()(t).to_pandas()
    assert feats.loc[0, "sample_rate"] == 8000
    assert feats.loc[0, "duration_s"] == 1.0
    # RMS of a 0.5-amplitude sine ≈ 0.5/sqrt(2)
    assert abs(feats.loc[0, "rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(feats.loc[0, "peak"] - 0.5) < 1e-3


def test_wav_stereo_and_8bit():
    import io
    import wave

    import numpy as np

    from ocracle_ray.core.wav import decode_wav, encode_wav

    stereo = np.stack([np.linspace(-1, 1, 100), np.linspace(1, -1, 100)], axis=1)
    rate, ch, out = decode_wav(encode_wav(stereo, 44100))
    assert (rate, ch) == (44100, 2)
    np.testing.assert_allclose(out, stereo, atol=2 / 32767)

    buf = io.BytesIO()  # 8-bit unsigned PCM
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([0, 128, 255]))
    rate, ch, out = decode_wav(buf.getvalue())
    np.testing.assert_allclose(out[:, 0], [-1.0, 0.0, 127 / 128], atol=1e-9)


def test_audio_features_synthetic_and_unsupported():
    import struct as _struct

    from ocracle_ray.stages.multimodal import AudioFeatures, synth_media_table

    t = synth_media_table(9)
    feats = AudioFeatures()(t).to_pandas()
    assert len(feats) == 3  # every 3rd synthetic row is audio
    assert (feats["sample_rate"] == 8000).all()
    assert (feats["rms"] > 0).all()

    bad = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "kind": pa.array(["audio"], pa.string()),
            "payload": pa.array([b"ID3\x04mp3 bytes"], pa.large_binary()),
        }
    )
    with pytest.raises(NotImplementedError, match="codec"):
        AudioFeatures()(bad)


# ---------------------------------------------- round-4 depth/interlace


def _chunk4(name, body):
    import struct
    import zlib

    return (
        struct.pack(">I", len(body)) + name + body
        + struct.pack(">I", zlib.crc32(name + body) & 0xFFFFFFFF)
    )


def test_16bit_gray_takes_high_byte():
    import struct
    import zlib

    from ocracle_ray.core.png import PNG_SIGNATURE

    g8 = _rng_image(6, 5, 1)[:, :, 0]
    g16 = (g8.astype(np.uint16) << 8) | 0x34  # low byte must be dropped
    rows = b"".join(b"\x00" + g16[r].astype(">u2").tobytes() for r in range(6))
    ihdr = struct.pack(">IIBBBBB", 5, 6, 16, 0, 0, 0, 0)
    data = (
        PNG_SIGNATURE + _chunk4(b"IHDR", ihdr)
        + _chunk4(b"IDAT", zlib.compress(rows)) + _chunk4(b"IEND", b"")
    )
    w, h, ch, out = decode_png(data)
    assert (w, h, ch) == (5, 6, 1)
    np.testing.assert_array_equal(out[:, :, 0], g8)


def test_16bit_rgb_sub_filter_uses_6byte_bpp():
    import struct
    import zlib

    from ocracle_ray.core.png import PNG_SIGNATURE

    c8 = _rng_image(4, 5, 3)
    c16 = c8.astype(np.uint16) << 8
    parts = []
    for r in range(4):
        arr = np.frombuffer(c16[r].astype(">u2").tobytes(), np.uint8).copy()
        sub = arr.copy()
        sub[6:] = (arr[6:].astype(int) - arr[:-6].astype(int)) & 0xFF
        parts.append(b"\x01" + sub.tobytes())
    ihdr = struct.pack(">IIBBBBB", 5, 4, 16, 2, 0, 0, 0)
    data = (
        PNG_SIGNATURE + _chunk4(b"IHDR", ihdr)
        + _chunk4(b"IDAT", zlib.compress(b"".join(parts))) + _chunk4(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(data)[3], c8)


@pytest.mark.parametrize("d", [1, 2, 4])
def test_sub8bit_gray_scales_to_full_range(d):
    import struct
    import zlib

    from ocracle_ray.core.png import PNG_SIGNATURE

    rng = np.random.RandomState(20 + d)
    vals = rng.randint(0, 1 << d, (7, 11), dtype=np.uint8)
    stride = (11 * d + 7) // 8
    parts = []
    for r in range(7):
        bits = np.zeros(stride * 8, np.uint8)
        vb = np.unpackbits(vals[r][:, None], axis=1, bitorder="big")[:, 8 - d :]
        bits[: 11 * d] = vb.ravel()
        parts.append(b"\x00" + np.packbits(bits).tobytes())
    ihdr = struct.pack(">IIBBBBB", 11, 7, d, 0, 0, 0, 0)
    data = (
        PNG_SIGNATURE + _chunk4(b"IHDR", ihdr)
        + _chunk4(b"IDAT", zlib.compress(b"".join(parts))) + _chunk4(b"IEND", b"")
    )
    w, h, ch, out = decode_png(data)
    exp = (vals.astype(np.uint16) * (255 // ((1 << d) - 1))).astype(np.uint8)
    np.testing.assert_array_equal(out[:, :, 0], exp)


def test_adam7_interlaced_rgb():
    import struct
    import zlib

    from ocracle_ray.core.png import PNG_SIGNATURE

    px = _rng_image(10, 13, 3)
    passes = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )
    stream = b""
    for x0, y0, dx, dy in passes:
        sub = px[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for r in range(sub.shape[0]):
            stream += b"\x00" + sub[r].tobytes()
    ihdr = struct.pack(">IIBBBBB", 13, 10, 8, 2, 0, 0, 1)
    data = (
        PNG_SIGNATURE + _chunk4(b"IHDR", ihdr)
        + _chunk4(b"IDAT", zlib.compress(stream)) + _chunk4(b"IEND", b"")
    )
    w, h, ch, out = decode_png(data)
    assert (w, h, ch) == (13, 10, 3)
    np.testing.assert_array_equal(out, px)


def test_adam7_truncated_raises():
    import struct
    import zlib

    from ocracle_ray.core.png import PNG_SIGNATURE

    px = _rng_image(10, 13, 3)
    # only pass 1 present (2x2 sub-image: 2 rows of 1+2*3 bytes),
    # truncated exactly at the pass boundary
    sub = px[0::8, 0::8]
    stream = b"".join(b"\x00" + sub[r].tobytes() for r in range(sub.shape[0]))
    ihdr = struct.pack(">IIBBBBB", 13, 10, 8, 2, 0, 0, 1)
    data = (
        PNG_SIGNATURE + _chunk4(b"IHDR", ihdr)
        + _chunk4(b"IDAT", zlib.compress(stream)) + _chunk4(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="Adam7"):
        decode_png(data)
