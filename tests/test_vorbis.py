"""core.vorbis — Ogg framing, the spec's codeword assignment, custom
float32, floor/render primitives, MDCT TDAC, and lossy round trips."""

import numpy as np
import pytest

from ocracle_ray.core.vorbis import (
    BitReader,
    BitWriter,
    INV_DB_TABLE,
    _render_line,
    assign_codewords,
    build_page,
    decode_vorbis,
    encode_vorbis,
    float32_pack,
    float32_unpack,
    ilog,
    imdct,
    is_ogg,
    mdct,
    ogg_crc,
    parse_ogg_packets,
    vorbis_window,
)


def test_ilog():
    assert [ilog(x) for x in (0, 1, 2, 3, 4, 7, 8)] == [0, 1, 2, 2, 3, 3, 4]


def test_bitpacking_lsb_first_round_trip():
    bw = BitWriter()
    vals = [(5, 3), (0, 1), (1023, 10), (1, 1), (0xDEADBEEF, 32)]
    for v, n in vals:
        bw.write(v, n)
    br = BitReader(bw.bytes())
    for v, n in vals:
        assert br.read(n) == v


def test_codeword_assignment_spec_example():
    """The Vorbis I spec §3.2.1 worked example: lengths
    [2,4,4,4,4,2,3,3] -> codewords 00 0100 0101 0110 0111 10 110 111."""
    codes = assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    assert codes == [0b00, 0b0100, 0b0101, 0b0110, 0b0111,
                     0b10, 0b110, 0b111]


def test_codeword_assignment_prefix_free():
    lengths = [1, 3, 3, 4, 4, 4, 4]
    codes = assign_codewords(lengths)
    words = [format(c, f"0{l}b") for c, l in zip(codes, lengths)]
    for i, a in enumerate(words):
        for j, b in enumerate(words):
            if i != j:
                assert not b.startswith(a)


def test_float32_round_trip():
    for v in (0.0, 1.0, -1.5, 0.2, 0.0125, 256.0, -0.1 / 15):
        got = float32_unpack(float32_pack(v))
        assert got == pytest.approx(v, rel=1e-6), v


def test_render_line_reference():
    def naive(x0, y0, x1, y1):
        dy, adx = y1 - y0, x1 - x0
        base = -((-dy) // adx) if dy < 0 else dy // adx
        sy = base - 1 if dy < 0 else base + 1
        ady = abs(dy) - abs(base) * adx
        out, y, err = [y0], y0, 0
        for _x in range(x0 + 1, x1):
            err += ady
            if err >= adx:
                err -= adx
                y += sy
            else:
                y += base
            out.append(y)
        return out

    for (x0, y0, x1, y1) in [(0, 0, 10, 255), (0, 255, 16, 0),
                             (3, 17, 40, 200), (0, 100, 7, 93)]:
        buf = np.zeros(x1, np.float64)
        _render_line(x0, y0, x1, y1, buf)
        assert buf[x0:x1].tolist() == naive(x0, y0, x1, y1)


def test_inv_db_table_anchors():
    assert INV_DB_TABLE[255] == 1.0
    assert INV_DB_TABLE[0] == pytest.approx(1.0649863e-07, rel=1e-6)
    assert np.all(np.diff(INV_DB_TABLE) > 0)


def test_mdct_tdac_reconstruction():
    n = 256
    rng = np.random.RandomState(0)
    sig = rng.randn(6 * (n // 2))
    w = vorbis_window(n)
    recon = np.zeros_like(sig)
    for i in range(len(sig) // (n // 2) - 1):
        f = sig[i * (n // 2): i * (n // 2) + n]
        recon[i * (n // 2): i * (n // 2) + n] += imdct(mdct(f * w)) * w
    a, b = n // 2, len(sig) - n
    assert np.abs(recon[a:b] - sig[a:b]).max() < 1e-12


def test_ogg_page_round_trip_and_crc():
    pkts = [b"hello", b"x" * 700, b"z"]  # includes a >255 lacing packet
    page = build_page(pkts, serial=7, seqno=0, granule=42, bos=True)
    got, gran = parse_ogg_packets(page)
    assert got == pkts and gran == 42
    bad = bytearray(page)
    bad[-1] ^= 1
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg_packets(bytes(bad))
    assert ogg_crc(b"") == 0


@pytest.mark.parametrize("nch", [1, 2])
def test_round_trip_tone(nch):
    t = np.arange(1500)
    x = 0.5 * np.sin(2 * np.pi * 440 * t / 8000) \
        + 0.1 * np.sin(2 * np.pi * 97 * t / 8000)
    if nch == 2:
        x = np.stack([x, -0.4 * x], axis=1)
    data = encode_vorbis(x, 8000)
    assert is_ogg(data)
    rate, ch, y = decode_vorbis(data)
    assert (rate, ch) == (8000, nch)
    ref = x if nch == 2 else x[:, None]
    assert y.shape == ref.shape
    err = np.abs(y - ref)
    assert err.max() < 0.05
    # SNR > 25 dB: a real lossy codec, not noise
    snr = 10 * np.log10((ref ** 2).mean() / ((y - ref) ** 2).mean())
    assert snr > 25


def test_round_trip_noise_and_odd_length():
    rng = np.random.RandomState(7)
    x = np.clip(rng.randn(777) * 0.3, -1, 1)
    rate, ch, y = decode_vorbis(encode_vorbis(x, 16000))
    assert (rate, ch, len(y)) == (16000, 1, 777)  # granule trim exact
    assert np.abs(y[:, 0] - x).max() < 0.02


def test_empty_input():
    rate, ch, y = decode_vorbis(encode_vorbis(np.zeros(0), 8000))
    assert (rate, ch, len(y)) == (8000, 1, 0)


def test_not_ogg_raises():
    with pytest.raises(ValueError, match="Ogg"):
        decode_vorbis(b"RIFF1234")


def test_audio_features_stage_decodes_ogg(ray_session):
    import pyarrow as pa

    from ocracle_ray.stages.multimodal import AudioFeatures

    t = np.arange(1600)
    clip = 0.4 * np.sin(2 * np.pi * 220 * t / 8000)
    tbl = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "kind": pa.array(["audio"], pa.string()),
        "payload": pa.array([encode_vorbis(clip, 8000)], pa.large_binary()),
    })
    out = AudioFeatures()(tbl).to_pandas()
    assert len(out) == 1
    assert out["sample_rate"].iloc[0] == 8000
    assert out["duration_s"].iloc[0] == pytest.approx(0.2, abs=1e-6)
    want_rms = float(np.sqrt((clip ** 2).mean()))
    assert out["rms"].iloc[0] == pytest.approx(want_rms, abs=0.01)


@pytest.mark.parametrize("nch", [1, 2])
def test_round_trip_mixed_blocks(nch):
    """256/1024 mixed streams: every transition shape (short->long,
    long->long, long->short) through the general lapped placement."""
    t = np.arange(2600)
    x = 0.5 * np.sin(2 * np.pi * 440 * t / 8000) \
        + 0.1 * np.sin(2 * np.pi * 97 * t / 8000)
    if nch == 2:
        x = np.stack([x, -0.4 * x], axis=1)
    rate, ch, y = decode_vorbis(encode_vorbis(x, 8000, mixed_blocks=True))
    ref = x if nch == 2 else x[:, None]
    assert (rate, ch) == (8000, nch) and y.shape == ref.shape
    # long blocks sum quantization error over 4x the coefficients
    assert np.abs(y - ref).max() < 0.12
    snr = 10 * np.log10((ref ** 2).mean() / ((y - ref) ** 2).mean())
    assert snr > 20


def test_mixed_blocks_odd_length_trim():
    rng = np.random.RandomState(3)
    x = np.clip(rng.randn(1333) * 0.3, -1, 1)
    rate, ch, y = decode_vorbis(encode_vorbis(x, 16000, mixed_blocks=True))
    assert len(y) == 1333
    assert np.abs(y[:, 0] - x).max() < 0.05


def test_mixed_window_tdac():
    """The unequal-window overlap-add chain reconstructs exactly
    (no quantization): window construction + placement algebra only."""
    from ocracle_ray.core.vorbis import _plan_frames, window_shape

    rng = np.random.RandomState(0)
    plan, p0 = _plan_frames(1800, True)
    total = max(t + n for t, n, *_ in plan)
    sig = rng.randn(total)
    recon = np.zeros(total)
    for t, n, ps, ns, _e in plan:
        w, *_ = window_shape(n, 256, ps, ns)
        recon[t: t + n] += imdct(mdct(sig[t: t + n] * w)) * w
    last_rs = plan[-1][0] + window_shape(
        plan[-1][1], 256, plan[-1][2], plan[-1][3])[3]
    assert np.abs(recon[p0:last_rs] - sig[p0:last_rs]).max() < 1e-11


def test_codebook_lookup_type1_lattice():
    """White-box: a hand-built type-1 codebook bitstream decodes to
    the spec's implicit lattice (entry digits in base lookup_values,
    dim-major), including the sequence_p running sum."""
    from ocracle_ray.core.vorbis import BitWriter, Codebook

    def build(seq_p):
        bw = BitWriter()
        bw.write(0x564342, 24)
        bw.write(2, 16)      # dims
        bw.write(9, 24)      # entries = 3^2 -> lookup_values = 3
        bw.write(0, 1)       # not ordered
        bw.write(0, 1)       # not sparse
        for _ in range(9):
            bw.write(4 - 1, 5)   # all lengths 4
        bw.write(1, 4)       # lookup type 1
        from ocracle_ray.core.vorbis import float32_pack
        bw.write(float32_pack(1.0), 32)   # min
        bw.write(float32_pack(2.0), 32)   # delta
        bw.write(3 - 1, 4)   # value_bits = 3
        bw.write(seq_p, 1)
        for m in (0, 1, 2):  # multiplicands
            bw.write(m, 3)
        from ocracle_ray.core.vorbis import BitReader
        return Codebook.parse(BitReader(bw.bytes()))

    cb = build(0)
    # entry e: d0 digit = e % 3, d1 digit = (e // 3) % 3
    for e in range(9):
        want = [1.0 + 2.0 * (e % 3), 1.0 + 2.0 * ((e // 3) % 3)]
        assert cb.vq[e].tolist() == want
    cbs = build(1)
    for e in range(9):
        v0 = 1.0 + 2.0 * (e % 3)
        v1 = v0 + 1.0 + 2.0 * ((e // 3) % 3)  # sequence_p running sum
        assert cbs.vq[e].tolist() == [v0, v1]
