"""BM25 keyword scoring (stages/bm25.py): kernel vs a pure-Python
model, end-to-end two-pass top-k vs an exhaustive reference, and the
term-set error contracts."""

import math
import re

import numpy as np
import pyarrow as pa
import pytest

from ocracle_ray.stages.bm25 import (
    MAX_TERMS,
    _term_hits,
    bm25_topk,
    corpus_stats,
)

TERMS = ["dup", "vector", "merge"]


def _toks(s: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _docs(n=60, seed=3):
    rng = np.random.RandomState(seed)
    vocab = ["dup", "vector", "merge", "scan", "row", "hash", "Window"]
    texts = [
        " ".join(rng.choice(vocab, rng.randint(0, 30)))
        + (";punct!" if i % 7 == 0 else "")
        for i in range(n)
    ]
    return list(range(n)), texts


def _reference_bm25(ids, texts, terms, k1=1.2, b=0.75):
    toks = [_toks(t) for t in texts]
    n = len(texts)
    avgdl = sum(len(t) for t in toks) / n
    df = {t: sum(1 for d in toks if t in d) for t in terms}
    idf = {t: math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5)) for t in terms}
    out = {}
    for i, d in zip(ids, toks):
        s = 0.0
        for t in terms:
            tf = d.count(t)
            if tf:
                s += idf[t] * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(d) / avgdl)
                )
        if s > 0:
            out[i] = s
    return out


def test_term_hits_matches_python_model():
    ids, texts = _docs()
    dl, tf = _term_hits(pa.array(texts), TERMS)
    for i, text in enumerate(texts):
        toks = _toks(text)
        assert dl[i] == len(toks)
        for j, term in enumerate(TERMS):
            assert tf[i, j] == toks.count(term), (i, term)


def test_bm25_topk_end_to_end(ray_session):
    import ray.data as rd

    ids, texts = _docs(n=80, seed=5)
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    ).repartition(5)
    stats = corpus_stats(ds, TERMS)
    ref = _reference_bm25(ids, texts, TERMS)
    assert stats["n_docs"] == 80
    assert stats["total_dl"] == sum(len(_toks(t)) for t in texts)
    assert stats["df"] == [
        sum(1 for t in texts if term in _toks(t)) for term in TERMS
    ]
    got = bm25_topk(ds, TERMS, stats, k=10)
    exp = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(got["doc_id"]) == [i for i, _ in exp]
    assert list(got["bm25"]) == [round(s, 4) for _, s in exp]
    # scoring only ships matching docs: k larger than the hit count
    # returns exactly the hit count
    all_rows = bm25_topk(ds, TERMS, stats, k=10_000)
    assert len(all_rows) == len(ref)


def test_bm25_term_contracts(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"doc_id": 0, "text": "a b"}])
    with pytest.raises(ValueError, match="1.."):
        corpus_stats(ds, [])
    with pytest.raises(ValueError, match="lowercase"):
        corpus_stats(ds, ["Dup"])
    with pytest.raises(ValueError, match="lowercase"):
        corpus_stats(ds, ["two words"])
    with pytest.raises(ValueError, match="1.."):
        corpus_stats(ds, ["t"] * (MAX_TERMS + 1))
    with pytest.raises(ValueError, match="duplicates"):
        corpus_stats(ds, ["dup", "dup"])
    with pytest.raises(ValueError, match="empty corpus"):
        bm25_topk(ds, ["a"], {"n_docs": 0, "total_dl": 0, "df": [0]})
