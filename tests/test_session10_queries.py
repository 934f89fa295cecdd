"""Engineered fixtures for the session-10 query families — semantics
the sf-corpus oracle sweep can't isolate (entropy edge cases, prefix
filter exactness, HITS fixed-point arithmetic). Full engine-vs-DuckDB
parity runs in tests/test_queries_oracle.py."""

import math

import numpy as np


class TestCharEntropy:
    """stages.entropy.char_entropy_micro vs a pure-Python reference."""

    @staticmethod
    def _ref(s: str) -> int:
        if not s:
            return 0
        counts = {}
        for ch in s:
            counts[ch] = counts.get(ch, 0) + 1
        L = len(s)
        h = math.log(L) - sum(c * math.log(c) for c in counts.values()) / L
        return int(math.floor(h * 1e6 + 0.5))

    def test_matches_reference_on_mixed_batch(self):
        from ocracle_ray.stages.entropy import char_entropy_micro

        texts = ["", "a", "aaaa", "ab", "abcd", "hello world",
                 "日本語テキスト entropy ünïcødé", "aabbccddeeff",
                 "the quick brown fox jumps over the lazy dog"]
        got = char_entropy_micro(texts)
        # Σ c·ln c summation order differs from the per-doc reference
        # (np.add.reduceat over sorted keys vs dict order) — identical
        # to within one micro-nat at the rounding boundary; assert
        # exact here (no boundary in this fixture) to pin the rule.
        assert got.tolist() == [self._ref(s) for s in texts]

    def test_uniform_and_degenerate_anchors(self):
        from ocracle_ray.stages.entropy import char_entropy_micro

        # single repeated char: H = 0 exactly
        assert char_entropy_micro(["zzzzzzzz"])[0] == 0
        # L distinct chars: H = ln L
        got = char_entropy_micro(["abcdefgh"])[0]
        assert got == int(math.floor(math.log(8) * 1e6 + 0.5))

    def test_empty_docs_count_zero(self):
        from ocracle_ray.stages.entropy import char_entropy_micro

        assert char_entropy_micro([]).tolist() == []
        assert char_entropy_micro(["", ""]).tolist() == [0, 0]


class TestPrefixFilterTheorem:
    """The prefix-filter completeness claim stages/setsim.py rests on:
    under ANY single global total order, two sets with Jaccard >= tau
    share at least one token among the first |s| - ceil(tau|s|) + 1
    elements of BOTH sets — swept against brute force over random
    skewed universes, plus the PPJoin length filter."""

    @staticmethod
    def _candidates(sets, tau_ppm):
        from ocracle_ray.stages.setsim import _ceil_ppm

        # global rare-first order (df asc, token asc), like the engine
        df = {}
        for s in sets:
            for x in s:
                df[x] = df.get(x, 0) + 1
        rank = {x: i for i, x in
                enumerate(sorted(df, key=lambda x: (df[x], x)))}
        buckets = {}
        sizes = [len(s) for s in sets]
        for di, s in enumerate(sets):
            rs = sorted(rank[x] for x in s)
            plen = int(len(rs) - _ceil_ppm(np.array([len(rs)]),
                                           tau_ppm)[0] + 1)
            for r in rs[:plen]:
                buckets.setdefault(r, []).append(di)
        cands = set()
        for docs in buckets.values():
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    a, b = sorted((docs[i], docs[j]))
                    if (min(sizes[a], sizes[b]) * 1_000_000
                            >= tau_ppm * max(sizes[a], sizes[b])):
                        cands.add((a, b))
        return cands

    def test_covers_every_qualifying_pair(self):
        rng = np.random.RandomState(7)
        for tau_ppm in (300_000, 500_000, 800_000):
            for trial in range(20):
                # skewed universe: token t appears with prob ~ 1/(t+2)
                uni = np.arange(40)
                sets = []
                for _ in range(30):
                    p = 1.0 / (uni + 2.0)
                    mask = rng.rand(len(uni)) < p * rng.uniform(1, 6)
                    s = frozenset(uni[mask].tolist())
                    if s:
                        sets.append(s)
                cands = self._candidates(sets, tau_ppm)
                for i in range(len(sets)):
                    for j in range(i + 1, len(sets)):
                        inter = len(sets[i] & sets[j])
                        union = len(sets[i] | sets[j])
                        if inter * 1_000_000 >= tau_ppm * union:
                            assert (i, j) in cands, (
                                tau_ppm, trial, sets[i], sets[j])

    def test_singleton_sets_emit_their_token(self):
        cands = self._candidates([frozenset({1}), frozenset({1})],
                                 1_000_000)
        assert (0, 1) in cands


class TestContainmentPrefixTheorem:
    """Probe-prefix × full-index completeness: C(a,b) >= tau implies
    a's rare-first prefix intersects b — swept vs brute force,
    including the asymmetric subset case Jaccard hides."""

    @staticmethod
    def _candidates(sets, tau_ppm):
        from ocracle_ray.stages.setsim import _ceil_ppm

        df = {}
        for s in sets:
            for x in s:
                df[x] = df.get(x, 0) + 1
        rank = {x: i for i, x in
                enumerate(sorted(df, key=lambda x: (df[x], x)))}
        index, probes = {}, {}
        for di, s in enumerate(sets):
            rs = sorted(rank[x] for x in s)
            for r in rs:
                index.setdefault(r, []).append(di)
            plen = int(len(rs) - _ceil_ppm(np.array([len(rs)]),
                                           tau_ppm)[0] + 1)
            for r in rs[:plen]:
                probes.setdefault(r, []).append(di)
        cands = set()
        for r, ps in probes.items():
            for a in ps:
                for b in index.get(r, ()):
                    if a != b and (len(sets[b]) * 1_000_000
                                   >= tau_ppm * len(sets[a])):
                        cands.add((a, b))
        return cands

    def test_covers_every_qualifying_ordered_pair(self):
        rng = np.random.RandomState(13)
        for tau_ppm in (600_000, 800_000, 1_000_000):
            for _ in range(15):
                uni = np.arange(30)
                sets = []
                for _ in range(25):
                    p = 1.0 / (uni + 2.0)
                    mask = rng.rand(len(uni)) < p * rng.uniform(1, 8)
                    s = frozenset(uni[mask].tolist())
                    if s:
                        sets.append(s)
                cands = self._candidates(sets, tau_ppm)
                for a in range(len(sets)):
                    for b in range(len(sets)):
                        if a == b:
                            continue
                        inter = len(sets[a] & sets[b])
                        if inter * 1_000_000 >= tau_ppm * len(sets[a]):
                            assert (a, b) in cands

    def test_asymmetric_subset(self):
        # a is a strict subset of a much larger b: containment(a→b)=1,
        # jaccard low; the ordered pair (a, b) must be found, (b, a) not
        a = frozenset(range(4))
        b = frozenset(range(40))
        cands = self._candidates([a, b], 800_000)
        assert (0, 1) in cands and (1, 0) not in cands


class TestHits:
    """stages.hits on engineered bipartite graphs vs a numpy
    reference of the exact integer fixed-point rule."""

    @staticmethod
    def _ref(edges, n_rounds=2):
        # edges: list of (c, p, w)
        cs = sorted({c for c, _, _ in edges})
        ps = sorted({p for _, p, _ in edges})
        ci = {c: i for i, c in enumerate(cs)}
        pi = {p: i for i, p in enumerate(ps)}
        W = np.zeros((len(cs), len(ps)), np.int64)
        for c, p, w in edges:
            W[ci[c], pi[p]] += w
        SCALE = 1_000_000

        def norm(x):
            m = x.max()
            return (x * SCALE) // m if m else x

        a = np.full(len(ps), SCALE, np.int64)
        for _ in range(n_rounds):
            h = norm(W @ a)
            a = norm(W.T @ h)
        return cs, ps, h, a

    def test_matches_reference(self, ray_session):
        import ray.data as rd
        import pyarrow as pa

        from ocracle_ray.stages.hits import hits

        edges = [(1, 10, 3), (1, 11, 1), (2, 10, 1), (2, 12, 5),
                 (3, 12, 1), (3, 13, 2), (4, 13, 2)]
        ds = rd.from_arrow(pa.table({
            "c": pa.array([e[0] for e in edges], pa.int64()),
            "p": pa.array([e[1] for e in edges], pa.int64()),
            "w": pa.array([e[2] for e in edges], pa.int64()),
        }))
        out = hits(ds, n_rounds=2, k=10)
        cs, ps, h, a = self._ref(edges)
        hub = out[out["kind"] == "hub"]
        auth = out[out["kind"] == "authority"]
        got_h = dict(zip(hub["node"], hub["score_fp"]))
        got_a = dict(zip(auth["node"], auth["score_fp"]))
        assert got_h == {c: int(h[i]) for i, c in enumerate(cs)}
        assert got_a == {p: int(a[i]) for i, p in enumerate(ps)}
        # rank tie-break: (score desc, node asc)
        assert hub["score_fp"].is_monotonic_decreasing
        assert auth["score_fp"].is_monotonic_decreasing

    def test_max_normalized_winner_is_scale(self, ray_session):
        import ray.data as rd
        import pyarrow as pa

        from ocracle_ray.stages.hits import hits

        ds = rd.from_arrow(pa.table({
            "c": pa.array([1, 2], pa.int64()),
            "p": pa.array([10, 10], pa.int64()),
            "w": pa.array([2, 1], pa.int64()),
        }))
        out = hits(ds, n_rounds=2, k=10)
        top = out[out["rk"] == 1]
        assert set(top["score_fp"]) == {1_000_000}


class TestAttribution:
    """Largest-remainder and window-edge semantics on engineered
    streams (the sf corpus can't isolate an exact boundary)."""

    @staticmethod
    def _events(rows):
        import pyarrow as pa

        return pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        })

    def test_remainder_goes_to_earliest_touches(self, ray_session):
        import ray.data as rd

        from ocracle_ray.stages.attribution import attribution_by_type

        base = 1_700_000_000_000_000  # us epoch, mid-bucket
        rows = [
            (1, base + 100, 7, "click", 0.0),
            (2, base + 200, 7, "view", 0.0),
            (3, base + 300, 7, "click", 0.0),
            (4, base + 400, 7, "purchase", 0.07),  # 7 cents, k=3
        ]
        out = attribution_by_type(rd.from_arrow(self._events(rows)))
        got = dict(zip(out["kind"], out["cents"]))
        # base 2 each; remainder 1 goes to the EARLIEST touch (click)
        assert got == {"click": 5, "view": 2, "unattributed": 0}
        assert int(out[out["kind"] == "click"]["n"].iloc[0]) == 2

    def test_window_edges(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from ocracle_ray.stages.attribution import attribution_by_type

        hour = 3_600_000_000
        base = 1_700_000_000_000_000
        rows = [
            (1, base - hour, 5, "click", 0.0),      # exactly ts-W: IN
            (2, base - hour - 1, 5, "view", 0.0),   # just outside
            (3, base, 5, "view", 0.0),              # == purchase ts: OUT
            (4, base, 5, "purchase", 1.0),
            (5, base + 50, 6, "purchase", 0.25),    # no touches
        ]
        out = attribution_by_type(rd.from_arrow(self._events(rows)))
        got = {k: (c, n) for k, c, n in
               zip(out["kind"], out["cents"], out["n"])}
        assert got["click"] == (100, 1)
        assert got["view"] == (0, 0)
        assert got["unattributed"] == (25, 1)

    def test_total_cents_conserved(self, ray_session):
        import numpy as np
        import ray.data as rd

        from ocracle_ray.stages.attribution import attribution_by_type

        rng = np.random.RandomState(11)
        base = 1_700_000_000_000_000
        rows = []
        eid = 0
        total = 0
        for u in range(8):
            t = base + u * 10**9
            for i in range(rng.randint(0, 12)):
                eid += 1
                ty = ["click", "view", "purchase"][rng.randint(3)]
                val = float(rng.randint(0, 10_000)) / 100.0
                if ty == "purchase":
                    total += int(round(val * 100))
                else:
                    val = 0.0
                t += int(rng.randint(1, 3_000_000_000))
                rows.append((eid, t, u, ty, val))
        if not any(r[3] == "purchase" for r in rows):
            rows.append((eid + 1, base, 99, "purchase", 1.0))
            total += 100
        out = attribution_by_type(rd.from_arrow(self._events(rows)))
        assert int(out["cents"].sum()) == total


class TestExpectations:
    """Planted violations: the sf corpus is clean, so every FAIL path
    needs an engineered stream."""

    def test_each_check_fails_on_its_violation(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from ocracle_ray.stages.expect import events_expectations

        base = 1_700_000_000_000_000
        ev = pa.table({
            "event_id": pa.array([1, 1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "ts": pa.array(
                [base] * 7 + [631152000000000],  # 1989: out of range
                pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 999, 1, 1, 1, 1], pa.int64()),
            "event_type": pa.array(
                ["click", "click", "WAT", "view", "view", "view",
                 "purchase", "view"], pa.string()),
            "value": pa.array(
                [0.0, 0.0, 0.0, 0.0, -1.0, 200_000.0, None, 0.0],
                pa.float64()),
        })
        cust = pa.table({"c_custkey": pa.array([1, 2], pa.int64())})
        out = events_expectations(rd.from_arrow(ev),
                                  rd.from_arrow(cust))
        got = {c: (o, p) for c, o, p in
               zip(out["check"], out["observed"], out["passed"])}
        assert got["event_id_unique"] == (1, 0)
        assert got["event_type_in_domain"] == (1, 0)
        assert got["ts_in_range"] == (1, 0)
        assert got["user_id_references_customer"] == (1, 0)
        assert got["value_non_negative"] == (1, 0)
        assert got["value_cents_at_most_max"] == (1, 0)
        # 1 null of 8 rows = 125000 ppm > 10000 ppm limit
        assert got["value_null_rate_ppm"] == (125_000, 0)


class TestIncrementalExact:
    """Planted cross-side duplicates (whitespace/case variants — equal
    normalized text, equal fingerprint) must be Bloom-positive AND
    counted as true dups; the census partitions n_new exactly."""

    def test_planted_dups(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocracle_ray.pipelines.queries import q_docs_incremental_exact

        rows = []
        for i in range(30):
            rows.append((i, f"unique doc number {i} with words"))
        # doc 9 (new side: 9 % 3 == 0) duplicates doc 1 (old side)
        rows[9] = (9, "UNIQUE   doc\tnumber 1  with words".lower())
        rows[9] = (9, "unique Doc  number 1 with\twords")
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["s"] * len(rows), pa.string()),
            "n_chars": pa.array(
                [len(r[1]) for r in rows], pa.int64()),
        })
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = q_docs_incremental_exact(str(tmp_path)).iloc[0]
        assert out["n_old"] == 20 and out["n_new"] == 10
        assert out["n_true_dup"] == 1
        # partition: provably_new + bloom_pos == n_new,
        # and the dup can never be bloom-negative
        assert out["n_provably_new"] + out["n_bloom_pos"] == 10
        assert out["n_bloom_pos"] >= out["n_true_dup"]
        assert out["n_bloom_fp"] == out["n_bloom_pos"] - 1


class TestImageDHash:
    """dHash arithmetic against a pure-Python reference + the
    invariance claims the query rests on."""

    @staticmethod
    def _ref(g):
        h, w = g.shape
        small = [[int(g[(r * h) // 8][(c * w) // 9]) for c in range(9)]
                 for r in range(8)]
        packed = 0
        for r in range(8):
            for c in range(8):
                if small[r][c] < small[r][c + 1]:
                    packed |= 1 << (63 - (r * 8 + c))
        if packed >= 1 << 63:
            packed -= 1 << 64
        return packed, [v for row in small for v in row]

    def test_matches_reference(self):
        from ocracle_ray.stages.multimodal import ImageDHash

        rng = np.random.RandomState(5)
        for shape in ((32, 32), (17, 23), (9, 9), (64, 48)):
            g = rng.randint(0, 256, shape).astype(np.uint8)
            dh, gray = ImageDHash._dhash_gray(g)
            rdh, rgray = self._ref(g.astype(np.int64))
            assert dh == rdh and gray.tolist() == rgray

    def test_luma_of_equal_channels_is_identity(self):
        from ocracle_ray.stages.multimodal import ImageDHash

        g = np.random.RandomState(6).randint(
            0, 256, (16, 16)).astype(np.uint8)
        rgb = np.stack([g] * 3, axis=2)
        assert ImageDHash._dhash_gray(rgb)[0] == \
            ImageDHash._dhash_gray(g)[0]

    def test_small_noise_small_hamming(self):
        from ocracle_ray.stages.multimodal import ImageDHash

        rng = np.random.RandomState(7)
        raw = rng.randint(0, 256, (34, 34)).astype(np.int64)
        g = np.zeros((32, 32), np.int64)
        for dy in range(3):
            for dx in range(3):
                g += raw[dy:dy + 32, dx:dx + 32]
        g = (g // 9).astype(np.uint8)
        noisy = np.clip(
            g.astype(np.int64) + rng.randint(-2, 3, (32, 32)),
            0, 255).astype(np.uint8)
        other = rng.randint(0, 256, (32, 32)).astype(np.uint8)
        a = ImageDHash._dhash_gray(g)[0]
        b = ImageDHash._dhash_gray(noisy)[0]
        c = ImageDHash._dhash_gray(other)[0]

        def ham(x, y):
            return bin((x ^ y) & ((1 << 64) - 1)).count("1")

        assert ham(a, b) <= 10
        assert ham(a, c) > 15


class TestAudioFingerprint:
    """Haitsma–Kalker bit arithmetic vs a pure-Python reference + the
    invariance claims q_media_audio_fingerprint rests on (FLAC twin
    EXACT, companding/noise small, cross-family far above)."""

    @staticmethod
    def _ref_bits(ei):
        # ei: (17, 9) ints -> (hi, lo) signed int64s
        raw = 0
        for t in range(16):
            for c in range(8):
                d0 = ei[t + 1][c] - ei[t][c]
                d1 = ei[t + 1][c + 1] - ei[t][c + 1]
                if d0 - d1 > 0:
                    raw |= 1 << (127 - (t * 8 + c))
        hi, lo = raw >> 64, raw & ((1 << 64) - 1)
        return (hi - (1 << 64) if hi >= 1 << 63 else hi,
                lo - (1 << 64) if lo >= 1 << 63 else lo)

    def test_pack_bits_matches_reference(self):
        from ocracle_ray.stages.multimodal import AudioFingerprint

        rng = np.random.RandomState(17)
        for _ in range(20):
            ei = rng.randint(0, 2000, (17, 9)).astype(np.int64)
            assert AudioFingerprint._pack_bits(ei) == self._ref_bits(
                ei.tolist())

    @staticmethod
    def _signal(seed):
        n_seg, n_bands, L = 17, 9, 360
        per = (L // 2) // n_bands
        t = np.arange(L)
        amps = np.random.RandomState(seed).uniform(
            0.02, 0.045, (n_seg, n_bands))
        sig = np.zeros(n_seg * L)
        for seg in range(n_seg):
            s = np.zeros(L)
            for band in range(n_bands):
                kbin = 1 + band * per + per // 2
                s += amps[seg, band] * np.sin(2 * np.pi * kbin * t / L)
            sig[seg * L:(seg + 1) * L] = s
        q = np.round(sig * 32767.0)
        assert np.abs(q).max() < 16384
        return q / 32768.0

    @staticmethod
    def _fp(payload):
        from ocracle_ray.core.flac import decode_flac, is_flac
        from ocracle_ray.core.wav import decode_wav
        from ocracle_ray.stages.multimodal import AudioFingerprint

        dec = decode_flac if is_flac(payload) else decode_wav
        _r, _c, s = dec(payload)
        mono = s.mean(axis=1) if s.ndim == 2 else s
        ei = AudioFingerprint._energies(np.asarray(mono, np.float64))
        return AudioFingerprint._pack_bits(ei)

    @staticmethod
    def _ham(p, q):
        return sum(bin((x ^ y) & ((1 << 64) - 1)).count("1")
                   for x, y in zip(p, q))

    def test_invariance_and_separation(self):
        from ocracle_ray.core.flac import encode_flac
        from ocracle_ray.core.wav import encode_wav, encode_wav_g711

        fps = []
        for b in range(4):
            x = self._signal(95_000 + b)
            noisy = np.clip(
                x + np.random.RandomState(96_000 + b)
                      .randint(-16, 17, len(x)) / 32768.0, -0.5, 0.5)
            fps.append([self._fp(p) for p in (
                encode_wav(x, 8000), encode_flac(x, 8000),
                encode_wav_g711(x, 8000, law="mu"),
                encode_wav(noisy, 8000))])
        for fam in fps:
            # lossless re-encode: EXACT (shared-grid quantization)
            assert self._ham(fam[0], fam[1]) == 0
            assert self._ham(fam[0], fam[2]) <= 6   # mu-law
            assert self._ham(fam[0], fam[3]) <= 6   # noise
        for a in range(len(fps)):
            for b in range(a + 1, len(fps)):
                assert self._ham(fps[a][0], fps[b][0]) > 30

    def test_short_clip_skips(self):
        import pyarrow as pa

        from ocracle_ray.core.wav import encode_wav
        from ocracle_ray.stages.multimodal import AudioFingerprint

        short = encode_wav(np.zeros(17 * 63), 8000)  # < 17*64 mono
        ok = encode_wav(self._signal(95_000), 8000)
        t = pa.table({
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([short, ok], pa.large_binary()),
        })
        out = AudioFingerprint()(t)
        assert out["media_id"].to_pylist() == [2]
        assert len(out["e"][0].as_py()) == 17 * 9

    def test_stereo_mono_mean(self):
        import pyarrow as pa

        from ocracle_ray.core.wav import encode_wav
        from ocracle_ray.stages.multimodal import AudioFingerprint

        x = self._signal(95_007)
        stereo = np.stack([x, x], axis=1)
        t = pa.table({
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([encode_wav(x, 8000),
                                 encode_wav(stereo, 8000)],
                                pa.large_binary()),
        })
        out = AudioFingerprint()(t)
        assert out["hash_hi"][0].as_py() == out["hash_hi"][1].as_py()
        assert out["hash_lo"][0].as_py() == out["hash_lo"][1].as_py()


class TestVideoFrameHash:
    """The invariance claims q_media_video_neardup rests on: GIF and
    lossless-WebP twins hash IDENTICALLY, an unclipped uniform
    brightness shift preserves every dHash bit, noise stays small,
    cross-family far above."""

    @staticmethod
    def _frames(seed):
        frames = []
        for f in range(8):
            raw = np.random.RandomState(seed + f).randint(
                0, 256, (26, 26)).astype(np.int64)
            g = np.zeros((24, 24), np.int64)
            for dy in range(3):
                for dx in range(3):
                    g += raw[dy:dy + 24, dx:dx + 24]
            frames.append((30 + (g // 9) * 190 // 255).astype(np.uint8))
        return frames

    @staticmethod
    def _hashes(payload):
        import pyarrow as pa

        from ocracle_ray.stages.multimodal import VideoFrameHash

        t = pa.table({
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([payload], pa.large_binary()),
        })
        out = VideoFrameHash()(t)
        return out["dhash"].to_pylist()

    @staticmethod
    def _tot_ham(ha, hb):
        return sum(bin((x ^ y) & ((1 << 64) - 1)).count("1")
                   for x, y in zip(ha, hb))

    def test_codec_twins_and_brightness_exact(self):
        from ocracle_ray.core.gif import encode_gif
        from ocracle_ray.core.webp import encode_webp_animated

        pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        frames = self._frames(97_000)
        gif = self._hashes(encode_gif(frames, pal))
        webp = self._hashes(encode_webp_animated(
            [np.stack([fr] * 3, axis=2) for fr in frames]))
        bright = self._hashes(encode_gif(
            [(fr + 10).astype(np.uint8) for fr in frames], pal))
        assert len(gif) == 4  # every=2 over 8 frames
        assert gif == webp
        assert gif == bright

    def test_noise_small_cross_large(self):
        from ocracle_ray.core.gif import encode_gif

        pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        a = self._frames(97_000)
        noisy = [np.clip(fr.astype(np.int64)
                         + np.random.RandomState(98_000 + i)
                             .randint(-2, 3, fr.shape), 0, 255)
                 .astype(np.uint8) for i, fr in enumerate(a)]
        other = self._frames(97_500)
        ha = self._hashes(encode_gif(a, pal))
        hn = self._hashes(encode_gif(noisy, pal))
        ho = self._hashes(encode_gif(other, pal))
        assert self._tot_ham(ha, hn) <= 40
        assert self._tot_ham(ha, ho) > 80

    def test_non_animation_payloads_skip(self):
        import pyarrow as pa

        from ocracle_ray.core.png import encode_png
        from ocracle_ray.stages.multimodal import VideoFrameHash

        png = encode_png(np.zeros((8, 8), np.uint8))
        t = pa.table({
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([png, b"garbage"], pa.large_binary()),
        })
        assert VideoFrameHash()(t).num_rows == 0


class TestBatchLevenshtein:
    """The vectorized pair-axis DP vs a scalar reference, including
    the shift hazard that makes hamming prefilters unsound."""

    @staticmethod
    def _ref(a, b):
        la, lb = len(a), len(b)
        dp = list(range(lb + 1))
        for i in range(1, la + 1):
            prev = dp[0]
            dp[0] = i
            for j in range(1, lb + 1):
                cur = min(dp[j] + 1, dp[j - 1] + 1,
                          prev + (a[i - 1] != b[j - 1]))
                prev = dp[j]
                dp[j] = cur
        return dp[lb]

    def test_random_sweep(self):
        from ocracle_ray.stages.linkage import batch_levenshtein

        rng = np.random.RandomState(23)
        pairs = []
        for _ in range(300):
            la, lb = rng.randint(0, 12, 2)
            a = "".join(chr(97 + c) for c in rng.randint(0, 4, la))
            b = "".join(chr(97 + c) for c in rng.randint(0, 4, lb))
            pairs.append((a, b))
        got = batch_levenshtein([p[0] for p in pairs],
                                [p[1] for p in pairs])
        assert got.tolist() == [self._ref(a, b) for a, b in pairs]

    def test_shift_pair_is_close(self):
        from ocracle_ray.stages.linkage import _lev_class

        # hamming 6, levenshtein 2 — a hamming prefilter would
        # misclassify this as far
        cls = _lev_class(["ababab", "ababab", "ababab"],
                         ["bababa", "ababab", "zzzzzz"])
        assert cls.tolist() == [1, 0, 2]

    def test_unicode_codepoint_level(self):
        from ocracle_ray.stages.linkage import batch_levenshtein

        # one codepoint substitution, regardless of utf-8 byte width
        assert batch_levenshtein(["naïve"], ["naive"]).tolist() == [1]

    def test_fs_scoring_weights(self):
        from ocracle_ray.stages.linkage import classify, score_pairs

        s = score_pairs(
            ["Customer#000000042"] * 3 + ["Customer#000000042"],
            ["Customer#000000042", "Customer#0X0000042",
             "Nobody#00000000000", "Customer#0X0000042"],
            ["A", "A", "A", "B"], ["A", "A", "A", "C"],
            np.array([1000, 1000, 1000, 1000]),
            np.array([1000, 1000, 1000, 900_000]))
        # exact+seg+band / close+seg+band / far+seg+band /
        # close+segNE+bandNE
        assert s.tolist() == [65, 50, -5, 10]
        assert classify(s).tolist() == [
            "match", "match", "non_match", "non_match"]


class TestLDiversity:
    """Engineered homogeneous class: large (k-anonymous) yet
    single-segment — exactly what l-diversity exists to flag."""

    def test_homogeneous_class_flagged(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocracle_ray.pipelines.queries import q_customer_l_diversity

        rows = []
        for i in range(10):   # nation 0: 10 rows, ALL one segment
            rows.append((i, 0, "BUILDING", 100.0))
        for i, seg in enumerate(["AUTOMOBILE", "HOUSEHOLD",
                                 "MACHINERY"]):  # nation 1: diverse
            rows.append((100 + i, 1, seg, 100.0))
        t = pa.table({
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array([f"Customer#{r[0]:09d}" for r in rows]),
            "c_nationkey": pa.array([r[1] for r in rows], pa.int32()),
            "c_mktsegment": pa.array([r[2] for r in rows]),
            "c_acctbal": pa.array([r[3] for r in rows], pa.float64()),
        })
        pq.write_table(t, str(tmp_path / "customer.parquet"))
        out = q_customer_l_diversity(str(tmp_path)).iloc[0]
        assert out["n_classes"] == 2
        assert out["min_diversity"] == 1
        assert out["classes_below_l"] == 1
        assert out["rows_at_risk"] == 10
        assert out["risk_ppm"] == 10 * 1_000_000 // 13


class TestLinkCensusExtraction:
    """The REAL per-batch href kernel (_extract_links_partial) vs
    DuckDB's regexp_extract_all on engineered hazard strings —
    quoted prefixes (a stray quote before any href must not fabricate
    a link) and unterminated hrefs (a left-to-right scan consumes the
    NEXT 'href=\"' separator inside the capture; those pages route
    through the python-re fallback)."""

    HTMLS = [
        '<a href="/x">a</a> <a href="/y">b</a> <a href="/x">c</a>',
        'prefix "quote" then href="/z">ok',
        'href="unterminated then href="/w">',
        'no links at all',
        'href="a href="b" href="c"',
        '',
    ]

    def _kernel_census(self):
        import pyarrow as pa

        from ocracle_ray.pipelines.queries import _extract_links_partial

        t = pa.table({
            "url": pa.array([f"u{i}" for i in range(len(self.HTMLS))]),
            "ts_us": pa.array(list(range(len(self.HTMLS))), pa.int64()),
            "html": pa.array(self.HTMLS, pa.string()),
        })
        out = _extract_links_partial(t)
        return {g: (n, d) for g, n, d in
                zip(out["target"].to_pylist(),
                    out["n_links"].to_pylist(),
                    out["n_docs"].to_pylist())}

    def test_kernel_matches_duckdb_scan(self):
        import os
        import tempfile

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pa.table({
            "url": pa.array([f"u{i}" for i in range(len(self.HTMLS))]),
            "ts_us": pa.array(list(range(len(self.HTMLS))), pa.int64()),
            "html": pa.array(self.HTMLS, pa.string()),
        })
        con = duckdb.connect()
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(t, os.path.join(d, "p.parquet"))
            sql = con.sql(f"""
                WITH links AS (
                    SELECT url, ts_us,
                           unnest(regexp_extract_all(html,
                                  'href="([^"]*)"', 1)) AS g
                    FROM read_parquet('{d}/p.parquet'))
                SELECT g, count(*)::BIGINT AS n,
                       count(DISTINCT (url, ts_us))::BIGINT AS nd
                FROM links GROUP BY 1 ORDER BY g
            """).df()
        want = {g: (int(n), int(d)) for g, n, d in
                zip(sql["g"], sql["n"], sql["nd"])}
        assert self._kernel_census() == want
        # the hazard row's capture really does swallow the separator
        assert "unterminated then href=" in want


class TestEvolveTo:
    """The mergeSchema read rule: null-fill, widen, drop, and the
    loud-on-incompatible contract (ArrowInvalid IS a ValueError, so
    the skip/abort machinery upstream sees the standard type)."""

    def test_fill_widen_drop(self):
        import pyarrow as pa

        from ocracle_ray.sources.readers import evolve_to

        t = pa.table({
            "a": pa.array([1, 2], pa.int32()),
            "junk": pa.array(["x", "y"]),
        })
        target = pa.schema([("a", pa.int64()), ("b", pa.string())])
        out = evolve_to(t, target)
        assert out.schema == target
        assert out["a"].to_pylist() == [1, 2]
        assert out["b"].null_count == 2
        assert "junk" not in out.column_names

    def test_incompatible_cast_raises_valueerror(self):
        import pyarrow as pa
        import pytest

        from ocracle_ray.sources.readers import evolve_to

        t = pa.table({"a": pa.array(["not-a-number"])})
        with pytest.raises(ValueError):
            evolve_to(t, pa.schema([("a", pa.int64())]))

    def test_lossy_narrowing_raises(self):
        import pyarrow as pa
        import pytest

        from ocracle_ray.sources.readers import evolve_to

        t = pa.table({"a": pa.array([2**40], pa.int64())})
        with pytest.raises(ValueError):
            evolve_to(t, pa.schema([("a", pa.int32())]))


class TestVarintZigzag:
    """The storage advisor's closed forms vs real encoders: the
    128^k comparison ladder must equal the length of an actual
    LEB128 encoding, and the uint64-wraparound zigzag must equal the
    SQL 2d / −2d−1 form for every int64."""

    @staticmethod
    def _leb128_len(u: int) -> int:
        n = 1
        while u >= 0x80:
            u >>= 7
            n += 1
        return n

    def test_varint_ladder_matches_encoder(self):
        from ocracle_ray.pipelines.queries import _varint_bytes

        rng = np.random.RandomState(41)
        vals = [0, 1, 127, 128, 16383, 16384, 2**63 - 1, 2**64 - 1]
        vals += [int(rng.randint(0, 2**62)) for _ in range(200)]
        vals += [(1 << k) - 1 for k in range(1, 64)]
        vals += [1 << k for k in range(64)]
        got = _varint_bytes(np.array(vals, np.uint64))
        assert got.tolist() == [self._leb128_len(v) for v in vals]

    def test_zigzag_equals_sql_form(self):
        rng = np.random.RandomState(43)
        d = np.concatenate([
            rng.randint(-2**62, 2**62, 500),
            np.array([0, 1, -1, 2**62, -2**62], np.int64),
        ]).astype(np.int64)
        zz = (d.astype(np.uint64) << np.uint64(1)) \
            ^ (d >> 63).astype(np.uint64)
        ref = np.where(d >= 0, 2 * d.astype(object),
                       -2 * d.astype(object) - 1)
        assert [int(x) for x in zz] == [int(x) for x in ref]


class TestCliQueryRunner:
    """The --query/--list-queries CLI surface (in-process: main()
    detects the fixture-owned Ray session and must not tear it
    down)."""

    def test_list_queries(self, capsys):
        from ocracle_ray.__main__ import main

        assert main(["--list-queries"]) == 0
        out = capsys.readouterr().out.splitlines()
        assert "pricing_summary" in out and len(out) >= 170

    def test_run_query(self, ray_session, capsys):
        import json

        import ray

        from ocracle_ray.__main__ import main

        assert main(["--query", "nation_region_counts",
                     "--sf-dir", "/root/testdata/sf0.001"]) == 0
        res = json.loads(capsys.readouterr().out)
        assert res["rows"] == 5
        assert ray.is_initialized()  # caller-owned session survives

    def test_unknown_query_exits_2(self, ray_session, capsys):
        from ocracle_ray.__main__ import main

        assert main(["--query", "no_such_query"]) == 2


class TestStorageAdvisorLayoutInvariance:
    """The per-block partial + boundary-carry fold must equal the
    single-pass varint-delta sum under ANY block layout — the
    property the distributed rewrite rests on."""

    @staticmethod
    def _direct(v):
        from ocracle_ray.pipelines.queries import _varint_bytes

        d = np.empty(len(v), np.int64)
        d[0] = v[0]
        d[1:] = v[1:] - v[:-1]
        zz = (d.astype(np.uint64) << np.uint64(1)) \
            ^ (d >> 63).astype(np.uint64)
        return int(_varint_bytes(zz).sum())

    def test_random_splits(self):
        from ocracle_ray.pipelines.queries import _varint_bytes

        rng = np.random.RandomState(47)
        for _ in range(25):
            n = rng.randint(5, 400)
            v = rng.randint(-10**12, 10**12, n).astype(np.int64)
            cuts = np.unique(rng.randint(1, n, rng.randint(0, 6)))
            blocks = np.split(v, cuts)
            total, prev = 0, 0
            for b in blocks:
                if len(b) == 0:
                    continue
                d = b[1:] - b[:-1]
                zz = (d.astype(np.uint64) << np.uint64(1)) \
                    ^ (d >> 63).astype(np.uint64)
                total += int(_varint_bytes(zz).sum())
                first = np.array([b[0] - prev], np.int64)
                zf = (first.astype(np.uint64) << np.uint64(1)) \
                    ^ (first >> 63).astype(np.uint64)
                total += int(_varint_bytes(zf).sum())
                prev = int(b[-1])
            assert total == self._direct(v)


class TestRobotsPriorityEncoding:
    """The packed priority (len·100 + allow-bonus + index term) must
    order rules exactly like the declared (length DESC, allow-first,
    index ASC) tuple — collision-free for any realistic rule count,
    and matching a naive reference argmax on random rule sets."""

    def test_priorities_pairwise_distinct_and_ordered(self):
        from ocracle_ray.pipelines.queries import ROBOTS_RULES

        n = len(ROBOTS_RULES)
        pris = {}
        for idx, (verdict, rule) in enumerate(ROBOTS_RULES):
            pris[idx] = (len(rule) * 100
                         + (10 if verdict == "allow" else 0)
                         + (n - idx))
        assert len(set(pris.values())) == n
        # packed order == tuple order for every pair
        for a in range(n):
            for b in range(n):
                if a == b:
                    continue
                va, ra = ROBOTS_RULES[a]
                vb, rb = ROBOTS_RULES[b]
                tup_a = (len(ra), va == "allow", -a)
                tup_b = (len(rb), vb == "allow", -b)
                assert (pris[a] > pris[b]) == (tup_a > tup_b)

    def test_random_rule_sets_match_reference(self):
        import re

        from ocracle_ray.pipelines.queries import _robots_regex

        rng = np.random.RandomState(53)
        segs = ["/a", "/bb", "/ccc", "/*", "/a*", "/b$", "/ab*c"]
        for _ in range(30):
            k = rng.randint(2, 7)
            rules = [("allow" if rng.rand() < 0.5 else "disallow",
                      "".join(rng.choice(segs)
                              for _ in range(rng.randint(1, 3))))
                     for _ in range(k)]
            # sanitize: '$' only meaningful at the end; drop inner $
            rules = [(v, r.replace("$", "") + ("$" if r.endswith("$")
                                               else ""))
                     for v, r in rules]
            paths = ["/a/bb", "/ccc/a", "/ab Zc", "/b", "/a" * 5]
            for p in paths:
                best = None  # (len, allow, -idx, idx, verdict)
                for idx, (v, r) in enumerate(rules):
                    if re.match(_robots_regex(r), p):
                        key = (len(r), v == "allow", -idx)
                        if best is None or key > best[0]:
                            best = (key, idx, v)
                # packed-priority winner
                got = None
                bp = -1
                for idx, (v, r) in enumerate(rules):
                    if re.match(_robots_regex(r), p):
                        pri = (len(r) * 100
                               + (10 if v == "allow" else 0)
                               + (len(rules) - idx))
                        if pri > bp:
                            bp = pri
                            got = (idx, v)
                assert (got is None) == (best is None)
                if best is not None:
                    assert got == (best[1], best[2])


class TestCrossEngineParityKernels:
    """Direct DuckDB-in-the-loop sweeps of the parity kernels the
    oracles rest on — sharper than catching a divergence through a
    whole query."""

    def test_truncdiv_equals_duckdb_floordiv(self):
        import duckdb

        from ocracle_ray.stages.linkage import truncdiv

        rng = np.random.RandomState(59)
        v = np.concatenate([
            rng.randint(-10**12, 10**12, 300),
            np.array([0, 1, -1, 499_999, -499_999, 500_000,
                      -500_000, 500_001, -500_001], np.int64),
        ]).astype(np.int64)
        for d in (7, 500_000, 200_000):
            got = truncdiv(v, d)
            want = duckdb.connect().execute(
                "SELECT list_transform($1::BIGINT[], x -> x // $2)",
                [v.tolist(), d]).fetchone()[0]
            assert got.tolist() == want

    def test_batch_levenshtein_equals_duckdb(self):
        import duckdb

        from ocracle_ray.stages.linkage import batch_levenshtein

        rng = np.random.RandomState(61)
        pairs = []
        for _ in range(150):
            la, lb = rng.randint(0, 15, 2)
            a = "".join(chr(97 + c) for c in rng.randint(0, 5, la))
            b = "".join(chr(97 + c) for c in rng.randint(0, 5, lb))
            pairs.append((a, b))
        pairs += [("Customer#000000042", "Customer#0X0000042"),
                  ("ababab", "bababa"), ("", "abc"), ("x", "")]
        got = batch_levenshtein([p[0] for p in pairs],
                                [p[1] for p in pairs])
        con = duckdb.connect()
        want = [con.execute("SELECT levenshtein($1, $2)",
                            [a, b]).fetchone()[0] for a, b in pairs]
        assert got.tolist() == want

    def test_round_half_away_equals_duckdb_round(self):
        import duckdb

        from ocracle_ray.core.textstats import round_half_away

        rng = np.random.RandomState(67)
        # exact-decimal inputs (2 decimals scaled from ints), the
        # regime every cents conversion lives in
        cents = rng.randint(-10**7, 10**7, 300)
        v = cents / 100.0
        got = round_half_away(v * 100.0, 0).astype(np.int64)
        want = duckdb.connect().execute(
            "SELECT list_transform($1::DOUBLE[], "
            "x -> CAST(round(x * 100) AS BIGINT))",
            [v.tolist()]).fetchone()[0]
        assert got.tolist() == want


class TestFnvSqlIdiom:
    """The list_reduce FNV-1a SQL fragment (shared by the dsir,
    augmentation, urlnorm-dedup and redirect oracles) vs
    core.textstats.fnv1a64, over random ASCII incl. spaces and
    URL-ish punctuation (codepoint == UTF-8 byte in ASCII — the
    idiom's documented domain)."""

    def test_matches_python_fnv(self):
        import duckdb

        from ocracle_ray.core.textstats import fnv1a64

        rng = np.random.RandomState(71)
        alphabet = ("abcdefghijklmnopqrstuvwxyz0123456789"
                    " ./:?=&#%-_")
        strs = ["".join(alphabet[c] for c in
                        rng.randint(0, len(alphabet),
                                    rng.randint(1, 40)))
                for _ in range(100)]
        strs += ["a", " ", "https://exam.example/p?a=1&b=2"]
        con = duckdb.connect()
        sql = """
            SELECT CAST(list_reduce(
                list_prepend(CAST(14695981039346656037 AS UHUGEINT),
                    list_transform(string_split($1, ''),
                        c -> CAST(unicode(c) AS UHUGEINT))),
                (h, c) -> (xor(CAST(h AS UBIGINT),
                               CAST(c AS UBIGINT))::UHUGEINT
                           * 1099511628211)
                          % 18446744073709551616::UHUGEINT
            ) AS UHUGEINT)
        """
        for s in strs:
            want = fnv1a64(s.encode())
            got = int(con.execute(sql, [s]).fetchone()[0])
            assert got == want, s


class TestKAnonymityBanding:
    """The quasi-id banding arithmetic on signed balances — DuckDB //
    truncates toward zero, so -4999.99 dollars must band to 0 and
    -5000.01 to -1 on BOTH sides (the monthly_growth lesson)."""

    def test_signed_bands_truncate(self):
        import numpy as np

        v = np.array([-5000.01, -4999.99, -0.004, 0.004, 4999.99,
                      5000.01, 10000.0])
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(
            np.int64)
        band = np.sign(cents) * (np.abs(cents) // 500_000)
        assert band.tolist() == [-1, 0, 0, 0, 0, 1, 2]
        import duckdb

        got = duckdb.connect().execute(
            "SELECT list_transform($1::DOUBLE[], x -> "
            "CAST(round(x * 100) AS BIGINT) // 500000)",
            [list(map(float, v))]).fetchone()[0]
        assert got == band.tolist()
