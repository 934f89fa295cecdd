"""Exact substring dedup — mask token spans that occur more than once
in the corpus (Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better"; the ExactSubstr pass of RefinedWeb/FineWeb).
Where document-level dedup (stages/dedup.py) drops whole near-copies,
this removes the boilerplate/quote SPANS shared between otherwise
distinct documents.

Semantics: a token n-gram is DUPLICATED when it occurs >= 2 times in
the corpus (occurrences, not distinct docs — a doc repeating its own
n-gram counts, per the paper). A token is COVERED when any duplicated
n-gram's window contains it; removal drops covered tokens. The paper
uses a suffix array over the concatenated corpus; the n-gram form
computes the same cover for spans >= n tokens (every length->=n
duplicated span is a union of duplicated n-grams) and is the shape
that distributes.

Scale shape: ONE exchange. Per-batch Arrow ``group_by`` pre-aggregates
(gram, count) partials — the classic combiner, so shuffle volume is
distinct-grams-per-batch, not tokens — then a distributed
``groupby(gram).sum`` finds corpus-wide counts, and ONLY grams with
count >= 2 leave the cluster (stream-folded behind a LOUD
``DUP_GRAM_LIMIT`` guard; a mostly-unique corpus has a small dup set
by construction). The dup set broadcasts via ``ray.put`` and the
scoring pass is map-only ``pc.is_in`` probes + a numpy diff-array
cover. For corpora whose dup set itself exceeds the guard, keep the
dup grams as a Dataset and pair-side join per batch (the
stages/dedup.py lane pattern) — a different dispatch, deliberately not
silently engaged here.

Tokenization is the shared stages/bm25.py rule (lowercase [a-z0-9]+
runs); gram keys join tokens with ``\\x01``; both reproduced verbatim
by the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .gopher import _shifted
from .ngram_lm import _doc_token_stream

DUP_GRAM_LIMIT = 5_000_000  # loud ceiling on the broadcast dup-gram set
DEFAULT_NGRAM = 8


def _batch_gram_stream(texts, n: int):
    """Per-batch token/gram geometry: ``(parents, n_tok_per_doc,
    gram_keys, gram_end_idx)`` where ``gram_end_idx`` indexes the gram's
    LAST token in the batch-global token stream (grams never cross
    docs)."""
    parents, _prev, tok = _doc_token_stream(texts)
    n_tokens = len(tok)
    if n_tokens < n:
        return parents, n_tokens, pa.array([], pa.string()), \
            np.empty(0, np.int64)
    keys, valid = _shifted(tok, parents, n - 1)
    end_idx = np.flatnonzero(valid).astype(np.int64)
    return parents, n_tokens, keys.filter(pa.array(valid)), end_idx


def duplicated_gram_set(ds, *, n: int = DEFAULT_NGRAM,
                        text_col: str = "text") -> list[str]:
    """Corpus-wide duplicated n-gram keys (occurrence count >= 2).

    Per-batch combiner partials -> ONE distributed ``groupby(g).sum``
    -> the >=2 filter runs in the cluster, so only the dup set itself
    streams to the driver (guarded loud at ``DUP_GRAM_LIMIT``)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        _p, _nt, keys, _e = _batch_gram_stream(t[text_col], n)
        g = pa.table({"g": keys}).group_by(["g"]).aggregate([("g", "count")])
        return g.rename_columns(["g", "c"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("c", alias_name="c_sum"))
    )

    def dup_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["c_sum"], 2)).select(["g"])

    grams: list[str] = []
    for bt in counts.map_batches(
        dup_only, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        grams.extend(bt["g"].to_pylist())
        if len(grams) > DUP_GRAM_LIMIT:
            raise ValueError(
                f"duplicated-gram set exceeds DUP_GRAM_LIMIT="
                f"{DUP_GRAM_LIMIT}: keep the dup set distributed and "
                "pair-side join per batch (stages/dedup.py lane "
                "pattern) instead of broadcasting"
            )
    # sorted so the broadcast object is byte-identical across block
    # layouts / parallelism levels
    return sorted(grams)


def _covered_mask(n_tokens: int, hit_end_idx: np.ndarray,
                  n: int) -> np.ndarray:
    """Boolean per-token cover from duplicated-gram END indices via a
    diff array (grams never cross docs, so intervals stay in-doc)."""
    if n_tokens == 0 or len(hit_end_idx) == 0:
        return np.zeros(n_tokens, bool)
    diff = np.zeros(n_tokens + 1, np.int64)
    np.add.at(diff, hit_end_idx - (n - 1), 1)
    np.add.at(diff, hit_end_idx + 1, -1)
    return np.cumsum(diff[:-1]) > 0


class SpanCoverScorer:
    """Actor-pool batch scorer: the dup-gram set rides the object store
    once (``broadcast.cached_get``); membership is a ``pc.is_in``
    value-set hash probe and the cover is a numpy diff-array — no
    Python per token."""

    def __init__(self, gram_ref, *, n: int = DEFAULT_NGRAM,
                 text_col: str = "text", lang_col: str = "lang"):
        from ..broadcast import cached_get

        self.value_set = pa.array(cached_get(gram_ref), pa.string())
        self.n = int(n)
        self.text_col = text_col
        self.lang_col = lang_col

    def _cover(self, texts):
        parents, n_tokens, keys, end_idx = _batch_gram_stream(
            texts, self.n
        )
        if len(keys) and len(self.value_set):
            hit = pc.is_in(keys, value_set=self.value_set).to_numpy(
                zero_copy_only=False
            )
            covered = _covered_mask(n_tokens, end_idx[hit], self.n)
        else:
            covered = np.zeros(n_tokens, bool)
        return parents, covered

    def __call__(self, t: pa.Table) -> pa.Table:
        n_docs = t.num_rows
        parents, covered = self._cover(t[self.text_col])
        total = np.bincount(parents, minlength=n_docs).astype(np.int64)
        cov = np.bincount(
            parents[covered], minlength=n_docs
        ).astype(np.int64)
        return pa.table(
            {
                "lang": t[self.lang_col],
                "n_tok": pa.array(total, pa.int64()),
                "covered": pa.array(cov, pa.int64()),
                "affected": pa.array(cov > 0, pa.bool_()),
            }
        )


def span_coverage_by_lang(ds, grams: list[str], *,
                          n: int = DEFAULT_NGRAM, text_col: str = "text",
                          lang_col: str = "lang", concurrency: int = 2
                          ) -> pd.DataFrame:
    """Per-lang duplicated-span coverage stats. Per-doc rows never
    reach the driver — ``driver_grouped_agg`` folds per-batch per-lang
    partials (integer sums, order-independent)."""
    import ray

    from ..pipelines.queries import driver_grouped_agg

    gram_ref = ray.put(grams)
    scored = ds.map_batches(
        SpanCoverScorer,
        fn_constructor_kwargs={"gram_ref": gram_ref, "n": n,
                               "text_col": text_col, "lang_col": lang_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    out = driver_grouped_agg(
        scored,
        ["lang"],
        {
            "n_docs": ("affected", "count"),
            "n_affected": ("affected", "sum"),
            "total_tokens": ("n_tok", "sum"),
            "covered_tokens": ("covered", "sum"),
        },
    )
    for c in ("n_affected", "total_tokens", "covered_tokens"):
        out[c] = out[c].astype("int64")
    from ..core.textstats import round_half_away

    out["covered_rate"] = round_half_away(
        out["covered_tokens"] / out["total_tokens"].clip(lower=1), 4
    )
    return (
        out[["lang", "n_docs", "n_affected", "total_tokens",
             "covered_tokens", "covered_rate"]]
        .sort_values("lang")
        .reset_index(drop=True)
    )


def remove_duplicated_spans(ds, grams: list[str], *,
                            n: int = DEFAULT_NGRAM,
                            text_col: str = "text",
                            concurrency: int = 2):
    """The pipeline op itself: documents with covered tokens REMOVED.

    Output columns: the input's, plus ``text_clean`` (kept tokens
    joined by single spaces — the op is defined on the token stream,
    like the paper's) and ``n_removed_tokens``. Streaming map-only
    pass; consume with ``write_parquet`` downstream."""
    import ray

    gram_ref = ray.put(grams)

    class Cleaner(SpanCoverScorer):
        def __call__(self, t: pa.Table) -> pa.Table:
            n_docs = t.num_rows
            texts = t[self.text_col]
            parents, covered = self._cover(texts)
            # rebuild kept-token text per doc without Python-per-token:
            # filter the flat token stream, then list-gather by parent
            _parents_all, _prev, tok = _doc_token_stream(texts)
            keep = ~covered
            kept_tok = tok.filter(pa.array(keep)) if len(tok) else tok
            kept_par = parents[keep] if len(tok) else parents
            texts_out = []
            # per-doc join via offsets (kept_par is sorted)
            bounds = np.searchsorted(kept_par, np.arange(n_docs + 1))
            pylist = kept_tok.to_pylist()
            for i in range(n_docs):
                texts_out.append(
                    " ".join(pylist[bounds[i]:bounds[i + 1]])
                )
            removed = np.bincount(
                parents[covered], minlength=n_docs
            ).astype(np.int64)
            return t.append_column(
                "text_clean", pa.array(texts_out, pa.string())
            ).append_column(
                "n_removed_tokens", pa.array(removed, pa.int64())
            )

    return ds.map_batches(
        Cleaner,
        fn_constructor_kwargs={"gram_ref": gram_ref, "n": n,
                               "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
