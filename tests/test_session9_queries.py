"""Engineered fixtures for the session-9 query families — semantics
the sf-corpus oracle sweep can't isolate (a planted CUSUM level shift,
edit-distance verification corners). Full engine-vs-DuckDB parity runs
in tests/test_queries_oracle.py."""

import numpy as np


class TestCusumFold:
    """The CUSUM walk itself (the query's driver fold), on planted
    series — exact integer semantics."""

    @staticmethod
    def _fold(cents):
        T = len(cents)
        total = sum(cents)
        cum = 0
        best_i, best_dev = None, -1
        for t, c in enumerate(cents, start=1):
            cum += c
            dev = abs(T * cum - t * total)
            if dev > best_dev:
                best_i, best_dev = t - 1, dev
        return best_i, best_dev

    def test_level_shift_found_at_shift_day(self):
        # 10 days at 100 cents, then 10 days at 500: |S'| peaks at the
        # last pre-shift day (index 9)
        cents = [100] * 10 + [500] * 10
        i, dev = self._fold(cents)
        assert i == 9
        # S'_10 = 20*1000 - 10*6000 = -40000
        assert dev == 40000

    def test_stationary_tie_breaks_earliest(self):
        # constant series: every S' == 0 -> earliest day wins
        i, dev = self._fold([7, 7, 7, 7])
        assert i == 0 and dev == 0

    def test_single_outlier_day(self):
        # deviation peaks on the LAST pre-outlier day (the regime
        # boundary), the same phase convention as the level shift:
        # S'_3 = 6·30 − 3·1050 = −2970 vs S'_4 = 6·1030 − 4·1050 = 1980
        cents = [10, 10, 10, 1000, 10, 10]
        i, dev = self._fold(cents)
        assert i == 2 and dev == 2970

    def test_scaled_form_equals_float_cusum(self):
        rng = np.random.RandomState(3)
        cents = rng.randint(0, 10_000, 50).tolist()
        T, total = len(cents), sum(cents)
        mean = total / T
        s = np.abs(np.cumsum(np.array(cents) - mean))
        i, dev = self._fold(cents)
        assert i == int(np.argmax(np.round(s * T)))
        assert dev == int(round(float(s[i]) * T))


class TestNdcgArithmetic:
    """Pure-fold NDCG semantics (the query's driver resolve): known
    gains, both DCG legs, and the perfect-ranking anchor."""

    @staticmethod
    def _dcg(gains):
        return sum(g / np.log2(r + 2.0) for r, g in enumerate(gains))

    def test_perfect_ranking_is_1(self):
        gains = [9, 7, 7, 3, 1]
        assert self._dcg(gains) / self._dcg(sorted(gains, reverse=True)) == 1.0

    def test_worst_vs_best_ordering(self):
        worst, best = [1, 3, 9], [9, 3, 1]
        n = self._dcg(worst) / self._dcg(best)
        assert 0 < n < 1
        # hand value: (1 + 3/log2(3) + 9/2) / (9 + 3/log2(3) + 1/2)
        hand = (1 + 3 / np.log2(3) + 4.5) / (9 + 3 / np.log2(3) + 0.5)
        assert n == hand


class TestEd1Kernel:
    """Exact ed<=1 verification corners (stages/editjoin.ed1_mask):
    the one-gap alignment and the distance-2-shared-variant trap."""

    @staticmethod
    def _ed(a, b):
        # full DP reference
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                cur = d[j]
                d[j] = min(d[j] + 1, d[j - 1] + 1,
                           prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return d[n]

    def test_hand_corners(self):
        from ocracle_ray.stages.editjoin import ed1_mask

        cases = [
            ("abc", "abc", False),   # identity is NOT a d1 pair
            ("abc", "abd", True),    # substitution (suffix)
            ("abc", "xbc", True),    # substitution (prefix)
            ("abc", "ab", True),     # trailing deletion
            ("abc", "bc", True),     # leading deletion
            ("abc", "abcd", True),   # trailing insertion
            ("abc", "axbc", True),   # interior insertion
            ("ab", "ba", False),     # shares deletion variant, ed=2
            ("abcd", "badc", False),
            ("a", "", True),
            ("", "", False),
            ("aa", "aaaa", False),   # length diff 2
        ]
        got = ed1_mask([a for a, _, _ in cases],
                       [b for _, b, _ in cases])
        assert got.tolist() == [e for _, _, e in cases]

    def test_random_vs_dp(self):
        from ocracle_ray.stages.editjoin import ed1_mask

        rng = np.random.RandomState(11)
        alpha = "abcx"
        pairs = []
        for _ in range(400):
            a = "".join(rng.choice(list(alpha),
                                   rng.randint(0, 6)))
            b = "".join(rng.choice(list(alpha),
                                   rng.randint(0, 6)))
            pairs.append((a, b))
        got = ed1_mask([a for a, _ in pairs], [b for _, b in pairs])
        for (a, b), g in zip(pairs, got):
            assert g == (self._ed(a, b) == 1), (a, b)


def test_ed1_join_vs_bruteforce(ray_session):
    """Full pipeline vs brute-force DP over a typo'd-key corpus with
    many tiny blocks — recall AND precision of the deletion-variant
    candidates."""
    import ray.data as rd

    from ocracle_ray.stages.editjoin import ed1_self_join

    rng = np.random.RandomState(5)
    base = ["alpha", "beta", "gamma", "delta"]
    names = set()
    for w in base:
        names.add(w)
        for _ in range(6):  # random single edits of each base word
            i = rng.randint(0, len(w))
            op = rng.randint(0, 3)
            if op == 0:
                names.add(w[:i] + "x" + w[i + 1:])
            elif op == 1:
                names.add(w[:i] + w[i + 1:])
            else:
                names.add(w[:i] + "q" + w[i:])
    names = sorted(names)
    ds = rd.from_items([{"c_name": n} for n in names]).repartition(6)
    got = {(r["a"], r["b"])
           for r in ed1_self_join(ds, name_col="c_name").take_all()}
    ref = {(a, b) for i, a in enumerate(names)
           for b in names[i + 1:]
           if TestEd1Kernel._ed(a, b) == 1}
    assert got == ref and len(ref) > 10
