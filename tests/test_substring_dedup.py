"""Exact substring dedup (stages/substring_dedup.py): engineered
corpora pinning the dup-gram definition (occurrences >= 2, within-doc
repeats count), the diff-array cover, the removal op, and the guard —
each against a pure-Python reference."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages import substring_dedup as sd

BOILER = "all rights reserved contact us at example dot com today"  # 10 toks
UNIQ_A = "quick brown foxes jump over a lazy dog near the river bank"
UNIQ_B = "seven silver ships sail slowly past the misty harbor light"


def _ds(rows):
    return rd.from_arrow(pa.table({
        "lang": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def _py_reference(texts, n):
    """Pure-Python cover: dup grams (count >= 2 over all docs), then
    per-doc covered token index sets."""
    toks = [[w for w in t.lower().split() if w] for t in texts]
    from collections import Counter

    c = Counter()
    for ws in toks:
        for i in range(len(ws) - n + 1):
            c[tuple(ws[i:i + n])] += 1
    dup = {g for g, k in c.items() if k >= 2}
    covers = []
    for ws in toks:
        cov = set()
        for i in range(len(ws) - n + 1):
            if tuple(ws[i:i + n]) in dup:
                cov.update(range(i, i + n))
        covers.append(cov)
    return toks, covers


def test_cover_matches_python_reference(ray_session):
    rows = [
        ("en", UNIQ_A + " " + BOILER),
        ("en", BOILER + " " + UNIQ_B),
        ("fr", UNIQ_B.replace("seven", "nine")),
        ("fr", " ".join(["spam"] * 20)),  # within-doc repeats count
        ("de", "short doc"),
    ]
    ds = _ds(rows)
    grams = sd.duplicated_gram_set(ds, n=8)
    out = sd.span_coverage_by_lang(ds, grams, n=8)
    toks, covers = _py_reference([r[1] for r in rows], 8)
    import pandas as pd

    ref = pd.DataFrame({
        "lang": [r[0] for r in rows],
        "n_tok": [len(t) for t in toks],
        "cov": [len(c) for c in covers],
    }).groupby("lang").agg(
        n_docs=("cov", "size"),
        n_affected=("cov", lambda s: int((s > 0).sum())),
        total_tokens=("n_tok", "sum"),
        covered_tokens=("cov", "sum"),
    ).reset_index()
    merged = out.merge(ref, on="lang", suffixes=("", "_ref"))
    for c in ("n_docs", "n_affected", "total_tokens", "covered_tokens"):
        assert (merged[c] == merged[f"{c}_ref"]).all(), (c, merged)
    # spam doc: every 8-gram is ("spam",)*8, repeated -> full cover
    # (20); the mutated UNIQ_B still shares its two trailing 8-grams
    # with doc 2's tail -> tokens 1..9 covered (9)
    fr = out[out["lang"] == "fr"].iloc[0]
    assert fr["covered_tokens"] == 29
    assert fr["n_affected"] == 2


def test_remove_duplicated_spans(ray_session):
    rows = [("en", UNIQ_A + " " + BOILER), ("en", BOILER + " " + UNIQ_B)]
    ds = _ds(rows)
    grams = sd.duplicated_gram_set(ds, n=8)
    got = sd.remove_duplicated_spans(ds, grams, n=8).to_pandas()
    got = got.sort_values("text").reset_index(drop=True)
    # the shared 10-token boilerplate is removed from both docs; the
    # unique halves survive verbatim (token-joined)
    cleans = sorted(got["text_clean"])
    assert cleans == sorted([UNIQ_A, UNIQ_B])
    assert sorted(got["n_removed_tokens"]) == [10, 10]


def test_no_dups_removes_nothing(ray_session):
    ds = _ds([("en", UNIQ_A), ("en", UNIQ_B)])
    grams = sd.duplicated_gram_set(ds, n=8)
    assert grams == []
    got = sd.remove_duplicated_spans(ds, grams, n=8).to_pandas()
    assert (got["n_removed_tokens"] == 0).all()
    assert sorted(got["text_clean"]) == sorted([UNIQ_A, UNIQ_B])


def test_dup_gram_guard_is_loud(ray_session, monkeypatch):
    monkeypatch.setattr(sd, "DUP_GRAM_LIMIT", 1)
    ds = _ds([("en", UNIQ_A + " " + BOILER), ("en", BOILER + " " + UNIQ_B)])
    with pytest.raises(ValueError, match="DUP_GRAM_LIMIT"):
        sd.duplicated_gram_set(ds, n=8)


def test_covered_mask_merges_overlaps():
    # two overlapping windows over 12 tokens: ends at 7 and 9, n=8
    m = sd._covered_mask(12, np.array([7, 9]), 8)
    assert m.tolist() == [True] * 10 + [False] * 2
