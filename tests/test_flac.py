"""FLAC codec (core/flac.py): exact round-trips across every encoder
mode, stereo decorrelation assignments, bit depths and edge block
sizes; white-box streams for decoder-only paths; the error contract."""

import numpy as np
import pytest

from ocracle_ray.core import flac


def _mono(n=3000, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 8000.0
    return 0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)


def _want(s, bits):
    s = s[:, None] if s.ndim == 1 else s
    peak = 1 << (bits - 1)
    return np.clip(np.round(s * peak), -peak, peak - 1) / peak


def _rt(samples, bits=16, **kw):
    data = flac.encode_flac(samples, 8000, bits=bits, **kw)
    rate, ch, out = flac.decode_flac(data)
    want = _want(samples, bits)
    assert rate == 8000 and ch == want.shape[1]
    assert np.array_equal(out, want)
    return data


@pytest.mark.parametrize("mode", ["verbatim", "fixed", "lpc", "auto"])
def test_mono_roundtrip_modes(mode):
    _rt(_mono(), subframe=mode)


@pytest.mark.parametrize("st", ["independent", "left_side", "right_side",
                                "mid_side"])
@pytest.mark.parametrize("mode", ["verbatim", "fixed", "lpc"])
def test_stereo_roundtrip(st, mode):
    m = _mono()
    stereo = np.stack([m, 0.3 * np.roll(m, 5)], axis=1)
    _rt(stereo, subframe=mode, stereo=st)


@pytest.mark.parametrize("bits", [8, 12, 16, 20, 24, 32])
def test_bit_depths(bits):
    _rt(_mono(500), bits=bits, subframe="fixed")


@pytest.mark.parametrize("n", [1, 2, 3, 1023, 1024, 1025])
@pytest.mark.parametrize("mode", ["auto", "verbatim", "fixed", "lpc"])
def test_edge_block_sizes(n, mode):
    _rt(_mono(1100)[:n], subframe=mode)


def test_constant_via_auto_and_extremes():
    _rt(np.full(2000, 0.25), subframe="auto")
    _rt(np.concatenate([np.ones(100), -np.ones(100), np.zeros(100)]),
        subframe="fixed")


def test_compression_actually_happens():
    """A pure tone must compress well below verbatim — i.e. the Rice
    path carries real information, not a disguised verbatim dump."""
    tone = 0.4 * np.sin(2 * np.pi * 110 * np.arange(8000) / 8000.0)
    fixed = flac.encode_flac(tone, 8000, subframe="fixed")
    verb = flac.encode_flac(tone, 8000, subframe="verbatim")
    assert len(fixed) < 0.66 * len(verb), (len(fixed), len(verb))


def test_coded_number_roundtrip():
    for v in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF,
              (1 << 31) - 1, (1 << 36) - 1):
        bw = flac._BitWriter()
        flac._write_coded_number(bw, v)
        br = flac._Bits(bw.bytes())
        assert flac._read_coded_number(br) == v, v


def test_error_contract():
    with pytest.raises(ValueError, match="magic"):
        flac.decode_flac(b"RIFFxxxx")
    good = flac.encode_flac(_mono(300), 8000)
    # flip a residual byte -> CRC-16 must catch it
    bad = bytearray(good)
    bad[-10] ^= 0xFF
    with pytest.raises(ValueError):
        flac.decode_flac(bytes(bad))
    # truncated stream
    with pytest.raises(ValueError):
        flac.decode_flac(good[: len(good) // 2])
    with pytest.raises(ValueError, match="bit depth"):
        flac.encode_flac(_mono(10), 8000, bits=13)


def test_audiofeatures_decodes_flac(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ocracle_ray.stages.multimodal import AudioFeatures

    clip = _mono(1600)
    payload = flac.encode_flac(clip, 8000, subframe="lpc")
    t = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "kind": pa.array(["audio"], pa.string()),
        "payload": pa.array([payload], pa.large_binary()),
        "width": pa.array([0], pa.int32()),
        "height": pa.array([0], pa.int32()),
    })
    out = rd.from_arrow(t).map_batches(
        AudioFeatures, batch_format="pyarrow", concurrency=1
    ).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    want = _want(clip, 16)[:, 0]
    assert row["sample_rate"] == 8000
    assert row["n_samples"] == 1600
    assert row["rms"] == round(float(np.sqrt(np.mean(want ** 2))), 6)
