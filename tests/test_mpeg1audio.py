"""MPEG-1 Audio Layer I/II (core/mpeg1audio.py): closed-form constant
checks against the published table values, spec-exact subband
round-trips through real encoded bitstreams, filterbank NPR quality,
hostile-input contracts, and the honest gates (Layer III, low-rate
c/d tables). See the module docstring for the exactness boundaries —
subband decode is spec arithmetic; PCM synthesis uses the documented
substitute prototype, so SNR floors (not golden bytes) pin quality."""

from __future__ import annotations

import numpy as np
import pytest

from ocracle_ray.core import mpeg1audio as m


def _tone(n=24000, f=1000, rate=48000, amp=0.4):
    t = np.arange(n)
    return amp * np.sin(2 * np.pi * f * t / rate)


class TestClosedFormConstants:
    def test_scalefactor_table_is_iso_ladder(self):
        # ISO 3-B.1 head values, exact geometric ratio 2^(-1/3)
        assert m.SCALEFACTORS[0] == 2.0
        assert abs(m.SCALEFACTORS[1] - 1.5874010519682) < 1e-12
        assert abs(m.SCALEFACTORS[2] - 1.2599210498949) < 1e-12
        for i in range(62):
            assert abs(m.SCALEFACTORS[i + 1] / m.SCALEFACTORS[i]
                       - 2.0 ** (-1 / 3)) < 1e-12

    def test_layer2_class_constants_match_table_3c(self):
        published = {
            3: (4 / 3, 0.5), 5: (8 / 5, 0.5), 7: (8 / 7, 0.25),
            9: (16 / 9, 0.5), 15: (16 / 15, 0.125),
            31: (32 / 31, 0.0625), 63: (64 / 63, 0.03125),
            127: (128 / 127, 1 / 64), 255: (256 / 255, 1 / 128),
            65535: (65536 / 65535, 2 / 65536),
        }
        for levels, (c_ref, d_ref) in published.items():
            nb, grouped, c, d = m._class_of(levels)
            assert abs(c - c_ref) < 1e-12, levels
            assert abs(d - d_ref) < 1e-12, levels
            assert grouped == (levels in (3, 5, 9))
            assert (1 << nb) >= levels + 1 > (1 << (nb - 1))

    def test_dequant_is_symmetric_midtread(self):
        for levels in (3, 5, 7, 9, 15, 31, 65535):
            nb, _, c, d = m._class_of(levels)
            vals = [m._dequant(code, levels, nb, c, d, 1.0)
                    for code in range(levels)]
            # symmetric around 0, zero at the middle code, max (L-1)/L
            assert abs(vals[(levels - 1) // 2]) < 1e-12
            assert abs(vals[0] + vals[-1]) < 1e-12
            assert abs(vals[-1] - (levels - 1) / levels) < 1e-12

    def test_quant_dequant_roundtrip(self):
        rng = np.random.RandomState(5)
        for levels in (3, 5, 7, 15, 255):
            nb, _, c, d = m._class_of(levels)
            step = 2.0 * c / (1 << (nb - 1))  # quant step at sf=1
            for s in rng.uniform(-0.95, 0.95, 50):
                code = m._quant(s, levels, nb, c, d, 1.0)
                back = m._dequant(code, levels, nb, c, d, 1.0)
                assert abs(back - s) <= step / 2 + 1e-9


class TestFilterbank:
    def test_npr_snr_floor_white_noise(self):
        x = np.random.RandomState(1).randn(24000) * 0.2
        y = m.synthesize(m.analyze(x))
        d = m._BANK_DELAY
        lo, hi = 2048, len(x) - 2048
        err = y[lo + d:hi + d] - x[lo:hi]
        snr = 10 * np.log10(np.mean(x[lo:hi] ** 2) / np.mean(err ** 2))
        assert snr > 55.0, snr  # measured ≈68 dB

    def test_delay_is_n_minus_m(self):
        x = np.random.RandomState(2).randn(20000)
        y = m.synthesize(m.analyze(x))
        c = np.correlate(y[:15000], x[:15000], "full")
        lag = int(np.argmax(np.abs(c))) - (15000 - 1)
        assert lag == m._BANK_DELAY == 480

    def test_prototype_is_symmetric_lowpass(self):
        h = m._prototype()
        assert len(h) == 512
        assert np.allclose(h, h[::-1])
        spec = np.abs(np.fft.rfft(h, 8192))
        # passband at DC, strong attenuation past 2x the band edge
        assert spec[0] > 0.9
        edge = int(8192 / 64)  # pi/32 in bins
        assert spec[4 * edge:].max() < 0.05


class TestLayerRoundTrips:
    @pytest.mark.parametrize("stereo", [False, True])
    def test_layer1_subbands_exact(self, stereo):
        x = _tone()
        pcm = np.stack([x, -0.6 * x], axis=1) if stereo else x
        enc = m.encode_mpeg1_layer1(pcm, 48000)
        ref = [m.analyze(pcm[:, c] if stereo else pcm)
               for c in range(2 if stereo else 1)]
        n_fr = 0
        for fi, (hdr, sub) in enumerate(m.iter_frames(enc)):
            assert hdr.layer == 1 and hdr.sample_rate == 48000
            n_fr += 1
            for c in range(hdr.channels):
                want = ref[c][fi * 12:(fi + 1) * 12].T  # (32, 12)
                # quantized-to-spec: error bounded by the coarsest
                # step at the per-band scalefactor
                assert np.abs(sub[c] - want).max() < 0.2
        assert n_fr == len(x) // 384

    @pytest.mark.parametrize("scfsi", [0, 1, 2, 3])
    def test_layer2_subbands_exact_all_scfsi(self, scfsi):
        x = _tone()
        st = np.stack([x, 0.5 * _tone(f=700)], axis=1)
        enc = m.encode_mpeg1_layer2(st, 48000, scfsi_mode=scfsi)
        ref = [m.analyze(st[:, c]) for c in range(2)]
        for fi, (hdr, sub) in enumerate(m.iter_frames(enc)):
            assert hdr.layer == 2
            for c in range(2):
                want = ref[c][fi * 36:(fi + 1) * 36].T
                assert np.abs(sub[c][:27] - want[:27]).max() < 0.1, \
                    (scfsi, fi, c)

    def test_layer2_joint_stereo_shared_subbands(self):
        """Intensity joint stereo (mode 01): above the bound the
        decoder must replicate ONE shared code stream into both
        channels scaled by each channel's own scalefactor — i.e. the
        two decoded channels are exactly proportional per (subband,
        scalefactor part), while below the bound they carry
        independent codes."""
        x = _tone()
        st = np.stack([x, 0.45 * _tone(f=2100)], axis=1)
        enc = m.encode_mpeg1_layer2(st, 48000, joint_bound=8)
        hdrs = [h for h, _ in m.iter_frames(enc)]
        assert all(h.mode == 1 and h.bound == 8 for h in hdrs)
        ref = [m.analyze(st[:, c]) for c in range(2)]
        for fi, (hdr, sub) in enumerate(m.iter_frames(enc)):
            # below bound: channels decode their own codes
            for c in range(2):
                want = ref[c][fi * 36:(fi + 1) * 36].T
                assert np.abs(sub[c][:8] - want[:8]).max() < 0.1
            # above bound: exact per-(sb, part) proportionality
            for sb in range(8, 27):
                for part in range(3):
                    v0 = sub[0][sb, part * 12:(part + 1) * 12]
                    v1 = sub[1][sb, part * 12:(part + 1) * 12]
                    nz = np.abs(v0) > 1e-12
                    if not nz.any():
                        assert np.abs(v1).max() < 1e-12
                        continue
                    r = v1[nz] / v0[nz]
                    assert np.ptp(r) < 1e-9, (fi, sb, part)

    def test_layer1_joint_stereo_shared_subbands(self):
        x = _tone()
        st = np.stack([x, 0.45 * _tone(f=2100)], axis=1)
        enc = m.encode_mpeg1_layer1(st, 48000, joint_bound=8)
        hdrs = [h for h, _ in m.iter_frames(enc)]
        assert all(h.mode == 1 and h.bound == 8 for h in hdrs)
        for _, sub in m.iter_frames(enc):
            for sb in range(8, 30):
                v0, v1 = sub[0][sb], sub[1][sb]
                nz = np.abs(v0) > 1e-12
                if not nz.any():
                    assert np.abs(v1).max() < 1e-12
                    continue
                r = v1[nz] / v0[nz]
                assert np.ptp(r) < 1e-9, sb

    @pytest.mark.parametrize("rate", [32000, 44100, 48000])
    def test_layer1_all_sample_rates(self, rate):
        t = np.arange(rate // 3)
        x = 0.3 * np.sin(2 * np.pi * 500 * t / rate)
        enc = m.encode_mpeg1_layer1(x, rate)
        got_rate, ch, out = m.decode_mpeg1_audio(enc)
        assert got_rate == rate and ch == 1
        n_frames = sum(1 for _ in m.iter_frames(enc))
        assert len(out) == n_frames * 384

    def test_padding_bit_frame_sizing(self):
        """A frame with the padding bit set is one slot longer
        (Layer II: 1 byte; Layer I: 4 bytes); the pad carries no
        payload bits, so decode must skip it and keep frame sync."""
        x = _tone(n=4608)  # 4 Layer II frames
        enc = bytearray(m.encode_mpeg1_layer2(x, 48000))
        hdr = m._Header(bytes(enc), 0)
        fb = hdr.frame_bytes
        # set padding on frame 0 and insert one pad byte at its end
        enc[1 + 0]  # noqa: B018 (readability)
        padded = bytearray(enc)
        padded[2] |= 0x02  # padding bit
        padded[fb:fb] = b"\x00"
        subs_ref = [s for _, s in m.iter_frames(bytes(enc))]
        subs_pad = [s for _, s in m.iter_frames(bytes(padded))]
        assert len(subs_ref) == len(subs_pad)
        for a, b in zip(subs_ref, subs_pad):
            assert np.array_equal(a, b)

    def test_layer1_pcm_snr(self):
        x = _tone()
        enc = m.encode_mpeg1_layer1(x, 48000)
        rate, ch, out = m.decode_mpeg1_audio(enc)
        assert (rate, ch) == (48000, 1)
        # xcorr alignment needs a non-periodic signal: use noise
        # band-limited to the encoder's 30 coded subbands (raw white
        # noise has ~2/32 of its energy in the zeroed top bands —
        # an allocation-truncation floor of ~12 dB by construction)
        rng = np.random.RandomState(7)
        xn = rng.randn(24000) * 0.2
        sub = m.analyze(xn)
        sub[:, 30:] = 0.0
        xn = m.synthesize(sub)[:24000]
        encn = m.encode_mpeg1_layer1(xn, 48000)
        _, _, outn = m.decode_mpeg1_audio(encn)
        c = np.correlate(outn[:15000, 0], xn[:15000], "full")
        lag = int(np.argmax(np.abs(c))) - (15000 - 1)
        lo, hi = 2048, 14000
        err = outn[lo + lag:hi + lag, 0] - xn[lo:hi]
        snr = 10 * np.log10(np.mean(xn[lo:hi] ** 2) / np.mean(err ** 2))
        assert snr > 20.0, snr  # 8-bit subband quantization floor

    def test_duration_and_frame_math(self):
        x = _tone(n=48000)  # 1.0 s
        enc = m.encode_mpeg1_layer2(x, 48000)
        hdrs = [h for h, _ in m.iter_frames(enc)]
        assert all(h.frame_bytes == hdrs[0].frame_bytes for h in hdrs)
        n_samples = len(hdrs) * 1152
        assert abs(n_samples - 48000) <= 1152
        rate, ch, out = m.decode_mpeg1_audio(enc)
        assert len(out) == n_samples

    def test_subband_energies_spec_exact_path(self):
        x = _tone(f=3375)  # center of subband 4 at 48 kHz (750 Hz/band)
        enc = m.encode_mpeg1_layer2(x, 48000)
        e = m.subband_energies(enc)
        assert e.argmax() == 4
        assert e[4] > 10 * np.sort(e)[-3]


class TestHypothesisProperties:
    """Hypothesis fuzz of the pure arithmetic core (test_properties
    model): quant/dequant stay inside one step for any in-range
    sample at any class and scalefactor; grouped code decompose is a
    bijection; the varint-free header parser is total on arbitrary
    sync-valid prefixes."""

    def test_quant_dequant_hypothesis(self):
        from hypothesis import given, settings, strategies as st

        classes = [3, 5, 7, 9, 15, 31, 63, 255, 4095, 65535]

        @settings(max_examples=300, deadline=None)
        @given(st.sampled_from(classes),
               st.integers(min_value=0, max_value=62),
               st.floats(min_value=-0.999, max_value=0.999,
                         allow_nan=False))
        def run(levels, sf_idx, frac):
            sf = m.SCALEFACTORS[sf_idx]
            s = frac * sf
            nb, _, c, d = m._class_of(levels)
            code = m._quant(s, levels, nb, c, d, sf)
            assert 0 <= code < levels
            back = m._dequant(code, levels, nb, c, d, sf)
            step = sf * c * 2.0 / (1 << (nb - 1))
            assert abs(back - s) <= step / 2 + 1e-9 * sf

        run()

    def test_grouped_code_bijection_hypothesis(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=300, deadline=None)
        @given(st.sampled_from([3, 5, 9]),
               st.tuples(st.integers(0, 8), st.integers(0, 8),
                         st.integers(0, 8)))
        def run(levels, codes):
            codes = tuple(c % levels for c in codes)
            g = (codes[0] + codes[1] * levels
                 + codes[2] * levels * levels)
            out = []
            gg = g
            for _ in range(3):
                out.append(gg % levels)
                gg //= levels
            assert tuple(out) == codes
            assert g < levels ** 3 <= 1 << {3: 5, 5: 7, 9: 10}[levels]

        run()


class TestFingerprintIntegration:
    """AudioFingerprint decodes MPEG payloads (round 5: the codec
    joined its sniff list), and the Haitsma-Kalker key's behavior
    across the lossy round trip is PINNED as measured: robust once
    the filterbank delay is compensated (~15/128 bits), but
    alignment-SENSITIVE to the raw 2×480-sample codec delay (the
    segment grid shifts ~68% of a segment → near-random hamming).
    Neither side should silently drift."""

    def _clip(self):
        rng = np.random.RandomState(3)
        t = np.arange(24000)
        clip = sum(0.08 * np.sin(2 * np.pi * (300 + 400 * b) * t
                                 / 48000 + rng.rand() * 6)
                   for b in range(9))
        return np.clip(clip, -0.9, 0.9)

    def test_mpeg_payloads_are_fingerprintable(self):
        import pyarrow as pa

        from ocracle_ray.stages.multimodal import AudioFingerprint

        clip = self._clip()
        tb = pa.table({
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array(
                [m.encode_mpeg1_layer1(clip, 48000),
                 m.encode_mpeg1_layer2(clip, 48000)],
                pa.large_binary()),
        })
        out = AudioFingerprint()(tb).to_pandas()
        assert len(out) == 2  # decoded, not skipped

    def test_delay_aligned_roundtrip_is_near_dup(self):
        from ocracle_ray.stages.multimodal import AudioFingerprint

        clip = self._clip()
        _, _, dec = m.decode_mpeg1_audio(
            m.encode_mpeg1_layer2(clip, 48000))
        d = 2 * m._BANK_DELAY
        aligned = dec[d:, 0][: len(clip) - d]
        ref = clip[: len(aligned)]
        fp = AudioFingerprint()
        b1 = fp._pack_bits(fp._energies(ref))
        b2 = fp._pack_bits(fp._energies(aligned))
        ham = sum(bin((x ^ y) & ((1 << 64) - 1)).count("1")
                  for x, y in zip(b1, b2))
        assert ham <= 25, ham  # measured 15/128; cross-family is >=52


class TestHostileAndGated:
    def test_is_mpeg_audio(self):
        enc = m.encode_mpeg1_layer1(_tone(), 48000)
        assert m.is_mpeg_audio(enc)
        assert not m.is_mpeg_audio(b"RIFF....WAVE")
        assert not m.is_mpeg_audio(b"\xff\xe0\x00\x00")  # bad version
        assert not m.is_mpeg_audio(b"")

    def test_layer3_gated(self):
        # layer bits 01 = Layer III
        hdr = bytes([0xFF, 0xFB, 0x90, 0x00]) + bytes(100)
        with pytest.raises(NotImplementedError, match="Layer III"):
            list(m.iter_frames(hdr))

    def test_low_rate_cd_tables_gated(self):
        with pytest.raises(NotImplementedError, match="3-B.2c/d"):
            m._l2_table(32000, 48_000)

    def test_truncated_frame_raises(self):
        enc = m.encode_mpeg1_layer1(_tone(), 48000)
        with pytest.raises(ValueError, match="truncated"):
            list(m.iter_frames(enc[:len(enc) - 7]))

    def test_lost_sync_raises(self):
        enc = bytearray(m.encode_mpeg1_layer1(_tone(), 48000))
        enc[0] = 0x00
        with pytest.raises(ValueError, match="sync"):
            list(m.iter_frames(bytes(enc)))

    def test_free_format_gated(self):
        hdr = bytes([0xFF, 0xFF, 0x00, 0x00]) + bytes(100)
        with pytest.raises(NotImplementedError, match="free-format"):
            list(m.iter_frames(hdr))

    def test_bitflip_fuzz_never_crashes_unexpectedly(self):
        """Codec-fuzz contract (test_codec_fuzz model): any corruption
        either still decodes or raises ValueError /
        NotImplementedError — never IndexError/struct.error/etc."""
        rng = np.random.RandomState(11)
        enc = bytearray(m.encode_mpeg1_layer2(_tone(n=6000), 48000))
        for _ in range(200):
            b = bytearray(enc)
            for _ in range(rng.randint(1, 4)):
                b[rng.randint(len(b))] ^= 1 << rng.randint(8)
            try:
                m.decode_mpeg1_audio(bytes(b))
            except (ValueError, NotImplementedError):
                pass

    def test_determinism(self):
        x = _tone()
        a = m.encode_mpeg1_layer2(x, 48000)
        b = m.encode_mpeg1_layer2(x, 48000)
        assert a == b
        _, _, o1 = m.decode_mpeg1_audio(a)
        _, _, o2 = m.decode_mpeg1_audio(b)
        assert np.array_equal(o1, o2)
