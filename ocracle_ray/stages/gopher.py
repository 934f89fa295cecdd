"""Gopher-style repetition quality signals — the other half of the
classic LLM quality gate (docs_quality covers the length/punct
signals; these catch DEGENERATE REPETITION, the dominant failure mode
of scraped text the simple signals miss).

Two signals per document over the shared tokenization
(stages/bm25.py ``TOKEN_SPLIT_RE``, lowercase [a-z0-9]+ runs):

- ``top_bigram_char_frac`` — characters covered by the most frequent
  word 2-gram: ``count * (len(w1)+len(w2)) / total_token_chars``
  (ties broken by the lexicographically SMALLEST bigram key, so both
  engines pick the same winner). Docs with < 2 tokens score 0.
- ``dup_5gram_frac`` — fraction of word-5-gram OCCURRENCES that are
  repeats: ``1 - distinct_5grams / total_5grams``. (The published
  char-coverage variant needs an overlap-union per doc; the
  occurrence form is the same monotone signal and stays exactly
  SQL-mirrorable.) Docs with < 5 tokens score 0.

Shape: one streaming pass, no shuffle — per-batch Arrow kernels build
the n-gram keys (shift + ``binary_join_element_wise``), an in-batch
Arrow ``group_by`` counts per (doc, gram), and only the per-lang
partial aggregate leaves the worker; the driver folds O(langs x
batches) rows. Per-doc rows never reach the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .ngram_lm import SEP, _doc_token_stream


def _shifted(tok: pa.Array, parents: np.ndarray, lag: int):
    """``(keys, valid)`` for (w_{i-lag} .. w_i) joins: the key string
    and a mask marking rows whose whole window sits in one document."""
    n = len(tok)
    cols = []
    valid = np.ones(n, bool)
    for d in range(lag, -1, -1):
        if d == 0:
            cols.append(tok)
        else:
            # clamp for batches with fewer than lag+1 total tokens
            # (a block of one tiny doc): the column is all-pad and no
            # row is valid — slice(0, negative) would raise
            take = max(0, n - d)
            pad = pa.nulls(n - take, pa.string())
            cols.append(pa.concat_arrays([pad, tok.slice(0, take)]))
            v = np.zeros(n, bool)
            if take:
                v[d:] = parents[d:] == parents[:-d]
            valid &= v
    keys = pc.binary_join_element_wise(*cols, SEP, null_handling="replace",
                                       null_replacement="")
    return keys, valid


def _doc_gram_stats(texts) -> dict[str, np.ndarray]:
    """Per-doc arrays: total token chars, top-bigram covered chars,
    total/distinct 5-gram occurrences."""
    parents, _prev, tok = _doc_token_stream(texts)
    n_docs_hint = 0 if len(parents) == 0 else int(parents.max()) + 1

    def fit(a, n):
        out = np.zeros(n, a.dtype if hasattr(a, "dtype") else np.float64)
        out[: len(a)] = a
        return out

    tok_chars = pc.utf8_length(tok).to_numpy(zero_copy_only=False)
    total_chars = np.bincount(
        parents, weights=tok_chars, minlength=n_docs_hint
    )

    # --- top bigram per doc
    top_cover = np.zeros(n_docs_hint, np.float64)
    bk, bvalid = _shifted(tok, parents, 1)
    if bvalid.any():
        sel = pa.array(bvalid)
        t = pa.table(
            {
                "d": pa.array(parents[bvalid], pa.int64()),
                "k": bk.filter(sel),
                # chars covered per occurrence: len(w1)+len(w2)
                "c": pc.subtract(
                    pc.utf8_length(bk.filter(sel)), len(SEP)
                ),
            }
        )
        g = t.group_by(["d", "k"]).aggregate([("c", "count"), ("c", "max")])
        gd = g["d"].to_numpy(zero_copy_only=False)
        cnt = g["c_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        clen = g["c_max"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.asarray(g["k"].to_pylist(), object)
        # per doc: max count, tie-break smallest key — realized by a
        # lexsort on (doc, -count, key) and taking each doc's first row
        order = np.lexsort((keys, -cnt, gd))
        first = np.ones(len(order), bool)
        dg = gd[order]
        first[1:] = dg[1:] != dg[:-1]
        sel_rows = order[first]
        top_cover[gd[sel_rows]] = cnt[sel_rows] * clen[sel_rows]

    # --- 5-gram occurrence dup fraction per doc
    total5 = np.zeros(n_docs_hint, np.int64)
    distinct5 = np.zeros(n_docs_hint, np.int64)
    fk, fvalid = _shifted(tok, parents, 4)
    if fvalid.any():
        sel = pa.array(fvalid)
        t5 = pa.table(
            {
                "d": pa.array(parents[fvalid], pa.int64()),
                "k": fk.filter(sel),
            }
        )
        g5 = t5.group_by(["d", "k"]).aggregate([("k", "count")])
        gd5 = g5["d"].to_numpy(zero_copy_only=False)
        c5 = g5["k_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        total5 = np.bincount(gd5, weights=c5, minlength=n_docs_hint).astype(
            np.int64
        )
        distinct5 = np.bincount(gd5, minlength=n_docs_hint)

    return {
        "total_chars": fit(total_chars, n_docs_hint),
        "top_cover": top_cover,
        "total5": total5,
        "distinct5": distinct5,
    }


def repetition_by_lang(ds, *, text_col: str = "text",
                       lang_col: str = "lang"):
    """Per-lang ``(n_docs, avg_top_bigram_char_frac, avg_dup_5gram_frac)``
    pandas frame, averaged over ALL docs (short docs contribute 0)."""

    def partial(t: pa.Table) -> pa.Table:
        s = _doc_gram_stats(t[text_col])
        n = t.num_rows

        def full(a):
            out = np.zeros(n, np.float64)
            out[: len(a)] = a
            return out

        tc, cover = full(s["total_chars"]), full(s["top_cover"])
        t5, d5 = full(s["total5"]), full(s["distinct5"])
        with np.errstate(divide="ignore", invalid="ignore"):
            big = np.where(tc > 0, cover / np.maximum(tc, 1), 0.0)
            dup5 = np.where(t5 > 0, 1.0 - d5 / np.maximum(t5, 1), 0.0)
        g = pa.table(
            {
                "lang": t[lang_col],
                "big": pa.array(big, pa.float64()),
                "dup5": pa.array(dup5, pa.float64()),
            }
        ).group_by(["lang"]).aggregate(
            [("big", "sum"), ("dup5", "sum"), ("big", "count")]
        )
        return g.rename_columns(["lang", "sum_big", "sum_dup5", "n_docs"])

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("lang", as_index=False).agg(
        sum_big=("sum_big", "sum"),
        sum_dup5=("sum_dup5", "sum"),
        n_docs=("n_docs", "sum"),
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["avg_top_bigram_char_frac"] = (out["sum_big"] / out["n_docs"]).round(4)
    out["avg_dup_5gram_frac"] = (out["sum_dup5"] / out["n_docs"]).round(4)
    return (
        out[["lang", "n_docs", "avg_top_bigram_char_frac",
             "avg_dup_5gram_frac"]]
        .sort_values("lang")
        .reset_index(drop=True)
    )
