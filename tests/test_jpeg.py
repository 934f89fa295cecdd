"""core/jpeg.py — stdlib baseline JPEG codec.

Round-trip validation (encoder and decoder share only the public T.81
constants), error contracts, and the decode paths wired into the
figure/multimodal stages.
"""

import numpy as np
import pytest

from ocracle_ray.core.jpeg import decode_jpeg, encode_jpeg, is_jpeg


def _gradient(h, w):
    return (
        np.linspace(0, 255, h * w).reshape(h, w).astype(np.uint8)
    )


def test_roundtrip_gray_smooth_high_quality():
    g = _gradient(48, 64)
    raw = encode_jpeg(g, quality=95)
    assert is_jpeg(raw) and raw.endswith(b"\xff\xd9")
    w, h, c, px = decode_jpeg(raw)
    assert (w, h, c) == (64, 48, 1)
    assert np.abs(px.astype(int) - g.astype(int)).max() <= 2


def test_roundtrip_rgb_and_color_error_bounded():
    x = np.linspace(0, 255, 40)
    y = np.linspace(255, 0, 56)
    rgb = np.stack(np.meshgrid(x, y) + [np.full((56, 40), 64.0)], axis=-1).astype(
        np.uint8
    )
    raw = encode_jpeg(rgb, quality=92)
    w, h, c, px = decode_jpeg(raw)
    assert (w, h, c) == (40, 56, 3)
    assert np.abs(px.astype(int) - rgb.astype(int)).max() <= 6


def test_odd_dimensions_pad_and_crop():
    """Non-multiple-of-8 sizes: encoder edge-pads, decoder crops back."""
    g = _gradient(33, 29)
    raw = encode_jpeg(g, quality=90)
    w, h, c, px = decode_jpeg(raw)
    assert (w, h) == (29, 33)
    assert np.abs(px.astype(int) - g.astype(int)).max() <= 3


def test_noise_stresses_huffman_tables():
    """Random pixels hit long AC codes, ZRL and byte stuffing."""
    rng = np.random.default_rng(7)
    noisy = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    raw = encode_jpeg(noisy, quality=97)
    w, h, c, px = decode_jpeg(raw)
    assert (w, h) == (40, 24)
    assert np.abs(px.astype(int) - noisy.astype(int)).mean() < 6


def test_flat_image_compresses_tiny():
    flat = np.full((64, 64), 190, np.uint8)
    raw = encode_jpeg(flat, quality=85)
    w, h, c, px = decode_jpeg(raw)
    assert np.abs(px.astype(int) - 190).max() <= 1
    assert len(raw) < 1200  # all-EOB blocks: header dominates


def test_quality_scales_size():
    g = np.tile(_gradient(16, 16), (2, 2))
    lo, hi = encode_jpeg(g, quality=20), encode_jpeg(g, quality=95)
    assert len(lo) < len(hi)


def test_progressive_equals_baseline_bit_for_bit():
    """SOF2 decode (round 4): same quantized coefficients, different
    entropy layout -> pixel output must EQUAL the baseline decode.
    Both scan scripts: successive approximation (DC+AC first/refine,
    the libjpeg default shape) and spectral-selection-only."""
    from ocracle_ray.core.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(11)
    images = [
        _gradient(16, 16),
        rng.randint(0, 256, (17, 23), dtype=np.uint8),
        rng.randint(0, 256, (16, 24, 3), dtype=np.uint8),
        np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (48, 1)),  # EOB runs
    ]
    for img in images:
        base = decode_jpeg(encode_jpeg(img, quality=85))
        for successive in (True, False):
            prog = decode_jpeg(
                encode_jpeg_progressive(img, quality=85, successive=successive)
            )
            assert base[:3] == prog[:3]
            assert np.array_equal(base[3], prog[3])


def test_progressive_is_sof2_and_multiscan():
    """The fixture encoder must emit a GENUINE progressive layout (or
    the equality test above is vacuous): SOF2 marker, >= 4 scans."""
    from ocracle_ray.core.jpeg import encode_jpeg_progressive

    raw = encode_jpeg_progressive(_gradient(16, 16))
    assert b"\xff\xc2" in raw and b"\xff\xc0" not in raw
    assert raw.count(b"\xff\xda") >= 4


def test_baseline_header_inside_sof2_raises():
    g = _gradient(16, 16)
    raw = bytearray(encode_jpeg(g))
    i = raw.find(b"\xff\xc0")
    raw[i + 1] = 0xC2  # flip SOF0 -> SOF2 but keep the baseline scan
    with pytest.raises(ValueError, match="Ss=0 requires Se=0"):
        decode_jpeg(bytes(raw))


def test_arithmetic_still_raises():
    g = _gradient(16, 16)
    raw = bytearray(encode_jpeg(g))
    i = raw.find(b"\xff\xc0")
    raw[i + 1] = 0xC9  # SOF9: arithmetic sequential
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(raw))


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n not a jpeg")


def test_figures_decode_handles_jpeg_and_damaged_jpeg():
    from ocracle_ray.stages.figures import _decode

    g = _gradient(24, 24)
    px = _decode(encode_jpeg(g, quality=95))
    assert px is not None and px.shape == (24, 24)
    # truncated entropy data -> skip row (None), not an exception
    raw = encode_jpeg(g)
    assert _decode(raw[:40]) is None or _decode(raw[:40]).size >= 0


def test_image_features_stage_decodes_jpeg():
    import pyarrow as pa

    from ocracle_ray.stages.multimodal import ImageFeatures

    g = _gradient(20, 28)
    rgb = np.stack([g, g, g], axis=-1)
    t = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "kind": pa.array(["image", "image"], pa.string()),
            "payload": pa.array(
                [encode_jpeg(g, quality=95), encode_jpeg(rgb, quality=95)],
                pa.large_binary(),
            ),
        }
    )
    out = ImageFeatures()(t)
    assert out.num_rows == 2
    assert out["width"].to_pylist() == [28, 28]
    assert out["height"].to_pylist() == [20, 20]
    means = out["mean_intensity"].to_pylist()
    assert abs(means[0] - float(g.mean())) < 3
    assert abs(means[1] - float(g.mean())) < 3
