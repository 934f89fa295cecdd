"""Distributed BM25 keyword scoring over a document corpus.

The retrieval-filtering op a training-data pipeline runs to pull (or
down-weight) documents matching a query term set: classic Robertson
BM25 with the (k1+1) numerator,

    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1-b + b*dl/avgdl))
    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))

computed in TWO streaming passes over a column-pruned read (the
two-pass shape q_events_value_quantiles set the precedent for: global
statistics first, then a scan that only ships bounded candidates):

1. ``corpus_stats`` — one tiny fixed-schema partial row per batch
   (doc count, total token length, per-term document frequency),
   summed on the driver. Driver traffic is O(n_batches), never O(rows).
2. ``bm25_topk`` — per-batch scoring against the broadcast constants
   (idf/avgdl are a handful of floats, captured in the closure), then
   a LOCAL top-k among matching docs; the driver resolves the global
   top-k from <= k * n_batches candidate rows.

Tokenization is lowercase runs of ``[a-z0-9]`` — deliberately simple
so the DuckDB oracle reproduces it exactly with
``regexp_split_to_array(lower(text), '[^a-z0-9]+')``; both engines
drop empty tokens. All hot-path work is Arrow/numpy kernels
(``split_pattern_regex`` + ``list_parent_indices`` + per-term
``pc.equal`` -> ``np.bincount``); Python touches only the per-batch
top-k frame.

At 100 TB: both passes are embarrassingly parallel maps (no shuffle at
all); the term set is assumed small (a query, not a vocabulary) — a
full-vocabulary index build is a different op with a groupby, and this
module raises loud past ``MAX_TERMS`` instead of degrading.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_SPLIT_RE = r"[^a-z0-9]+"  # shared with the SQL oracle, verbatim
MAX_TERMS = 64


def _check_terms(terms: list[str]) -> None:
    if not terms or len(terms) > MAX_TERMS:
        raise ValueError(f"BM25 term set must be 1..{MAX_TERMS} terms")
    if len(set(terms)) != len(terms):
        raise ValueError(
            "BM25 term set has duplicates (a repeated term would "
            "double-count its score contribution)"
        )
    for t in terms:
        if not t or any(not ("a" <= c <= "z" or "0" <= c <= "9") for c in t):
            raise ValueError(
                f"BM25 terms must be lowercase [a-z0-9]+ tokens: {t!r}"
            )


def _term_hits(texts, terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """``(dl, tf)``: per-doc non-empty token count (int64, len n) and
    per-doc per-term counts (int64, n x len(terms))."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), TOKEN_SPLIT_RE)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    dl = np.bincount(parents[nonempty], minlength=n).astype(np.int64)
    tf = np.zeros((n, len(terms)), np.int64)
    for j, term in enumerate(terms):
        m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
        if m.any():
            tf[:, j] = np.bincount(parents[m], minlength=n)
    return dl, tf


def corpus_stats(ds, terms: list[str], *, text_col: str = "text") -> dict:
    """Pass 1: ``{"n_docs", "total_dl", "df": [..]}`` for the corpus.
    One partial row per batch; the driver folds O(n_batches) rows."""
    _check_terms(terms)
    nt = len(terms)

    def partial(t: pa.Table) -> pa.Table:
        dl, tf = _term_hits(t[text_col], terms)
        row = {
            "n_docs": pa.array([len(dl)], pa.int64()),
            "total_dl": pa.array([int(dl.sum())], pa.int64()),
        }
        for j in range(nt):
            row[f"df_{j}"] = pa.array([int((tf[:, j] > 0).sum())], pa.int64())
        return pa.table(row)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return {
        "n_docs": int(parts["n_docs"].sum()),
        "total_dl": int(parts["total_dl"].sum()),
        "df": [int(parts[f"df_{j}"].sum()) for j in range(nt)],
    }


def bm25_topk(
    ds,
    terms: list[str],
    stats: dict,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Pass 2: global top-k ``(id_col, bm25)`` pandas frame, scored
    against ``corpus_stats`` output, ties broken by ascending id.
    The driver only ever sees <= k rows per batch."""
    _check_terms(terms)
    n_total = stats["n_docs"]
    if n_total <= 0:
        raise ValueError("BM25 over an empty corpus")
    avgdl = stats["total_dl"] / n_total
    idf = np.array(
        [
            math.log(1.0 + (n_total - df + 0.5) / (df + 0.5))
            for df in stats["df"]
        ],
        np.float64,
    )

    def score_batch(t: pa.Table) -> pa.Table:
        dl, tf = _term_hits(t[text_col], terms)
        norm = k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl)
        tff = tf.astype(np.float64)
        score = (idf * tff * (k1 + 1.0) / (tff + norm[:, None])).sum(axis=1)
        hit = tf.any(axis=1)
        ids = t[id_col].to_numpy(zero_copy_only=False)[hit]
        sc = score[hit]
        # local top-k: descending score, ascending id
        order = np.lexsort((ids, -sc))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "bm25": pa.array(sc[order], pa.float64()),
            }
        )

    cand = ds.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(
        ["bm25", id_col], ascending=[False, True]
    ).head(k)
    cand["bm25"] = cand["bm25"].round(4)
    return cand.reset_index(drop=True)
