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
