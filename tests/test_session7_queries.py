"""Engineered fixtures for the session-7 query families: LPA vote
semantics, bigram batch extraction, Morton/zone-map geometry, RRF
fusion arithmetic. The full engine-vs-DuckDB parity runs in
tests/test_queries_oracle.py's sweep; these pin the semantics the
sweep can't isolate (ties, layout invariance, leg-miss handling)."""

import numpy as np
import pyarrow as pa

from ocracle_ray.pipelines.queries import (
    _batch_bigram_rows,
    _lpa_propagate,
    _rrf_bucket,
)


def _lpa(vids, labels, seeds, edges, rounds):
    vids = np.array(vids, np.int64)
    init = np.array(labels, np.int64)
    seed = np.array(seeds, bool)
    a = np.array([e[0] for e in edges], np.int64)
    b = np.array([e[1] for e in edges], np.int64)
    return _lpa_propagate(vids, init, seed, a, b, rounds).tolist()


class TestLpaPropagate:
    def test_tie_breaks_to_smallest_label(self):
        # node 2 sees labels {0: 1 vote, 1: 1 vote} -> tie -> 0
        out = _lpa([0, 1, 2], [0, 1, -1], [True, True, False],
                   [(0, 2), (1, 2)], rounds=1)
        assert out == [0, 1, 0]

    def test_majority_beats_smaller_label(self):
        # node 3 sees {5: 2 votes, 0: 1 vote} -> 5 wins despite 0 < 5
        out = _lpa([0, 1, 2, 3], [0, 5, 5, -1],
                   [True, True, True, False],
                   [(0, 3), (1, 3), (2, 3)], rounds=1)
        assert out == [0, 5, 5, 5]

    def test_chain_needs_two_rounds(self):
        # 0(seed)=7 -- 1 -- 2: node 2 is unreachable in one round
        one = _lpa([0, 1, 2], [7, -1, -1], [True, False, False],
                   [(0, 1), (1, 2)], rounds=1)
        assert one == [7, 7, -1]
        two = _lpa([0, 1, 2], [7, -1, -1], [True, False, False],
                   [(0, 1), (1, 2)], rounds=2)
        assert two == [7, 7, 7]

    def test_seed_never_changes(self):
        # seed 0 keeps label 9 even though all neighbors vote 1
        out = _lpa([0, 1, 2], [9, 1, 1], [True, True, True],
                   [(1, 0), (2, 0)], rounds=3)
        assert out == [9, 1, 1]

    def test_isolated_non_seed_stays_unlabeled(self):
        out = _lpa([0, 1, 5], [3, -1, -1], [True, False, False],
                   [(0, 1)], rounds=2)
        assert out == [3, 3, -1]

    def test_unlabeled_neighbors_abstain(self):
        # node 1's only neighbor is unlabeled -> stays -1 in round 1
        out = _lpa([0, 1, 2], [4, -1, -1], [True, False, False],
                   [(1, 2), (0, 2)], rounds=1)
        assert out == [4, -1, 4]


class TestBatchBigramRows:
    def _t(self, ids, texts):
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    def test_basic_grams_and_docs(self):
        grams, dids = _batch_bigram_rows(
            self._t([10, 20], ["a b c", "x y"]))
        assert grams.to_pylist() == ["a\x01b", "b\x01c", "x\x01y"]
        assert dids.to_pylist() == [10, 10, 20]

    def test_no_cross_document_gram(self):
        grams, _ = _batch_bigram_rows(self._t([1, 2], ["a b", "c d"]))
        assert "b\x01c" not in grams.to_pylist()

    def test_tokenization_rule_shared_with_bm25(self):
        # punctuation splits, case folds, empties drop
        grams, _ = _batch_bigram_rows(self._t([1], ["A-b!!c"]))
        assert grams.to_pylist() == ["a\x01b", "b\x01c"]

    def test_single_token_doc_yields_nothing(self):
        grams, dids = _batch_bigram_rows(self._t([1, 2], ["solo", "p q"]))
        assert grams.to_pylist() == ["p\x01q"]
        assert dids.to_pylist() == [2]

    def test_empty_batch(self):
        grams, dids = _batch_bigram_rows(self._t([], []))
        assert len(grams) == 0 and len(dids) == 0


class TestRrfBucket:
    def test_matches_sql_md5_idiom(self):
        # ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64
        import duckdb

        con = duckdb.connect()
        for tok in ["dup", "vector", "merge", "window", "zz9"]:
            sql = con.sql(
                "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT % 64",
                params=[tok]).fetchone()[0]
            assert _rrf_bucket(tok) == int(sql), tok

    def test_range(self):
        assert all(0 <= _rrf_bucket(f"t{i}") < 64 for i in range(200))


class TestMortonInterleave:
    def test_zorder_locality_vs_linear(self):
        # the inline interleave from q_events_zorder_layout, re-stated:
        # even bits user-bucket, odd bits time-bucket
        def morton(ub, tb):
            z = 0
            for i in range(8):
                z |= ((ub >> i) & 1) << (2 * i)
                z |= ((tb >> i) & 1) << (2 * i + 1)
            return z

        # bit-exact round trip: de-interleaving recovers both inputs
        for ub in (0, 1, 7, 128, 255):
            for tb in (0, 3, 200, 255):
                z = morton(ub, tb)
                rub = sum(((z >> (2 * i)) & 1) << i for i in range(8))
                rtb = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
                assert (rub, rtb) == (ub, tb)
        # z-order locality: equal user-buckets stay nearer in z than
        # the full tb spread (the zone-map pruning premise)
        assert morton(7, 0) < morton(8, 0) < morton(7, 255)


class TestAucFromHist:
    def _brute_ppm(self, pos_scores, neg_scores):
        # pairwise Mann-Whitney with half credit for ties, x2-scaled
        num2 = 0
        for p in pos_scores:
            for n in neg_scores:
                if p > n:
                    num2 += 2
                elif p == n:
                    num2 += 1
        return num2 * 1_000_000 // (2 * len(pos_scores) * len(neg_scores))

    def _hist_ppm(self, pos_scores, neg_scores):
        from ocracle_ray.pipelines.queries import _auc_ppm_from_hist

        scores = sorted(set(pos_scores) | set(neg_scores))
        np_c = [sum(1 for s in pos_scores if s == c) for c in scores]
        nn_c = [sum(1 for s in neg_scores if s == c) for c in scores]
        P, N, ppm = _auc_ppm_from_hist(np_c, nn_c)
        assert (P, N) == (len(pos_scores), len(neg_scores))
        return ppm

    def test_perfect_separation(self):
        assert self._hist_ppm([10, 11], [1, 2]) == 1_000_000

    def test_all_tied_is_half(self):
        assert self._hist_ppm([5, 5, 5], [5, 5]) == 500_000

    def test_inverted(self):
        assert self._hist_ppm([1, 2], [10, 11]) == 0

    def test_property_matches_bruteforce(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.lists(st.integers(0, 6), min_size=1, max_size=20),
               st.lists(st.integers(0, 6), min_size=1, max_size=20))
        def check(pos, neg):
            assert self._hist_ppm(pos, neg) == self._brute_ppm(pos, neg)

        check()
