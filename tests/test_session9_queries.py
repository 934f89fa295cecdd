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
