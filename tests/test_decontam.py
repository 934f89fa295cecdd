"""Benchmark decontamination (stages/decontam.py): engineered corpus
pinning the n-gram overlap semantics, the guard, and the broadcast
shape (per-doc rows never reach the driver as anything but per-batch
partials — covered structurally by contamination_by_lang's use of
driver_grouped_agg)."""

import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages import decontam


def _ds(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    }))


BENCH_TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
# tokens 1..8 of the benchmark = one shared 8-gram
OVERLAP_8 = "alpha beta gamma delta epsilon zeta eta theta XEND YEND"
# only 7 consecutive shared tokens — below the gram size
OVERLAP_7 = "alpha beta gamma delta epsilon zeta eta SPLIT theta iota"


def test_contamination_semantics(ray_session):
    bench = _ds([(0, "en", BENCH_TEXT)])
    grams = decontam.benchmark_gram_set(bench, n=8)
    # 10 tokens -> 3 complete 8-grams
    assert len(grams) == 3
    train = _ds([
        (1, "en", BENCH_TEXT),          # exact copy: all 3 grams hit
        (2, "en", OVERLAP_8),           # exactly one shared 8-gram
        (3, "en", OVERLAP_7),           # 7-token overlap: clean
        (4, "fr", "tiny doc"),          # < 8 tokens: clean
        (5, "fr", BENCH_TEXT + " " + BENCH_TEXT),  # copy x2 + seam grams
    ])
    out = decontam.contamination_by_lang(train, grams, n=8)
    en = out[out["lang"] == "en"].iloc[0]
    fr = out[out["lang"] == "fr"].iloc[0]
    assert (en["n_docs"], en["n_contaminated"], en["n_gram_hits"]) == (3, 2, 4)
    # doc 5: 20 tokens -> 13 gram positions; ALL windows of the doubled
    # text are rotations of the benchmark's token cycle, but only those
    # matching one of the 3 bench grams hit: positions 0,1,2 and 10,11,12
    assert (fr["n_docs"], fr["n_contaminated"], fr["n_gram_hits"]) == (2, 1, 6)
    assert fr["contam_rate"] == 0.5


def test_empty_benchmark_is_all_clean(ray_session):
    grams = decontam.benchmark_gram_set(_ds([(0, "en", "too short")]), n=8)
    assert grams == []
    out = decontam.contamination_by_lang(
        _ds([(1, "en", BENCH_TEXT)]), grams, n=8
    )
    assert out["n_contaminated"].sum() == 0
    assert out["n_gram_hits"].sum() == 0


def test_bench_gram_guard_is_loud(ray_session, monkeypatch):
    monkeypatch.setattr(decontam, "BENCH_GRAM_LIMIT", 2)
    with pytest.raises(ValueError, match="BENCH_GRAM_LIMIT"):
        decontam.benchmark_gram_set(_ds([(0, "en", BENCH_TEXT)]), n=8)


def test_gram_keys_never_cross_documents(ray_session):
    # two 5-token docs: no complete 8-gram exists even though the
    # concatenated token stream would have them
    half1 = "alpha beta gamma delta epsilon"
    half2 = "zeta eta theta iota kappa"
    grams = decontam.benchmark_gram_set(_ds([(0, "en", BENCH_TEXT)]), n=8)
    out = decontam.contamination_by_lang(
        _ds([(1, "en", half1), (2, "en", half2)]), grams, n=8
    )
    assert out["n_contaminated"].sum() == 0
