"""TextRank (stages/textrank.py): fixed-point iteration vs a pure-
Python reference, partitioning invariance, and the edge-limit guard."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages import textrank as tr


def _ds(docs, nparts=3):
    return rd.from_arrow(pa.table({
        "lang": pa.array([d[0] for d in docs], pa.string()),
        "text": pa.array([d[1] for d in docs], pa.string()),
    })).repartition(nparts)


def _reference(docs, n_iters):
    """Pure-Python mirror of the documented fixed-point update."""
    import re
    edges = {}
    for lang, text in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        for p, q in zip(toks, toks[1:]):
            if p == q:
                continue
            key = (lang, min(p, q), max(p, q))
            edges[key] = edges.get(key, 0) + 1
    out = {}
    langs = {k[0] for k in edges}
    for lang in langs:
        adj = {}
        for (lg, a, b), w in edges.items():
            if lg != lang:
                continue
            adj.setdefault(a, {})[b] = w
            adj.setdefault(b, {})[a] = w
        wu = {u: sum(nb.values()) for u, nb in adj.items()}
        r = {u: tr.SCALE for u in adj}
        for _ in range(n_iters):
            nr = {}
            for v in adj:
                s = sum((w * r[u]) // wu[u] for u, w in adj[v].items())
                nr[v] = tr.BASE + (tr.D_NUM * s) // tr.D_DEN
            r = nr
        out[lang] = r
    return out


DOCS = [
    ("en", "graph rank graph walk rank graph"),
    ("en", "walk the graph; the rank, the walk"),
    ("de", "ein graph ein pfad ein graph"),
    ("en", ""),  # empty doc contributes nothing
]


def test_textrank_matches_pure_python_reference(ray_session):
    got = tr.textrank_terms(_ds(DOCS), n_iters=6, k=10)
    ref = _reference(DOCS, 6)
    for _, row in got.iterrows():
        assert ref[row["lang"]][row["term"]] == row["score_fp"], row
    # top-1 per lang is the max-score node with term-ASC tiebreak
    for lang, scores in ref.items():
        best = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        assert got[(got["lang"] == lang) & (got["rk"] == 1)]["term"].iloc[0] == best


def test_textrank_partitioning_invariant(ray_session):
    a = tr.textrank_terms(_ds(DOCS, nparts=1), n_iters=4, k=10)
    b = tr.textrank_terms(_ds(DOCS, nparts=4), n_iters=4, k=10)
    pd.testing.assert_frame_equal(a, b)


def test_textrank_edge_limit_guard(ray_session, monkeypatch):
    monkeypatch.setattr(tr, "TEXTRANK_EDGE_LIMIT", 2)
    with pytest.raises(ValueError, match="TEXTRANK_EDGE_LIMIT"):
        tr.textrank_terms(_ds(DOCS), n_iters=2, k=3)
