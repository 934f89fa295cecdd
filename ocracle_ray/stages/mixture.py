"""Source-mixture balancing — compute per-source sampling weights that
cap every source at a uniform token budget, then sample docs
deterministically (the data-mixing pass of an LLM corpus release:
The Pile / Llama-style source reweighting, in its simplest published
form — uniform cap, weight_s = min(1, budget / tokens_s)).

Everything is INTEGER arithmetic so the DuckDB oracle reproduces each
decision bit-for-bit:

- token counts use the shared stages/bm25.py tokenization;
- ``budget = total_tokens // n_sources``;
- ``threshold_ppm(s) = min(1e6, (1e6 * budget) // tokens_s)``
  (1e6 for an empty source — nothing to drop);
- doc selection: Knuth multiplicative hash on ``doc_id``,
  ``((doc_id % 2^31) * 2654435761) % 2^32 % 1e6 < threshold_ppm`` —
  the ``% 2^31`` keeps the product inside int64 so the engine (numpy
  int64) and SQL (BIGINT) compute the identical value with no
  overflow divergence.

Scale shape: pass 1 folds per-batch (source, docs, tokens) partials on
the driver (sources are the broadcast side by definition — a corpus
has few of them); the threshold table broadcasts in the scorer's
closure and pass 2 is map-only. No shuffle anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .bm25 import TOKEN_SPLIT_RE

KNUTH = 2654435761
PPM = 1_000_000


def _token_counts(texts) -> np.ndarray:
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), TOKEN_SPLIT_RE)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return np.bincount(parents[keep], minlength=len(texts)).astype(np.int64)


def source_token_stats(ds, *, source_col: str = "source",
                       text_col: str = "text") -> pd.DataFrame:
    """Pass 1: per-source ``(n_docs, total_tokens)`` via per-batch
    partials folded on the driver (source cardinality is small by
    definition; the fold is still guarded by driver_grouped_agg's
    partial-row ceiling)."""
    from ..pipelines.queries import driver_grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t[source_col],
                "n_tok": pa.array(_token_counts(t[text_col]), pa.int64()),
            }
        )

    out = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source"],
        {"n_docs": ("n_tok", "count"), "total_tokens": ("n_tok", "sum")},
    )
    out["total_tokens"] = out["total_tokens"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def mixture_thresholds(stats: pd.DataFrame) -> dict[str, int]:
    """Uniform-cap weights in parts-per-million, all-integer."""
    total = int(stats["total_tokens"].sum())
    n_sources = len(stats)
    budget = total // n_sources if n_sources else 0
    out = {}
    for _, r in stats.iterrows():
        tok = int(r["total_tokens"])
        out[str(r["source"])] = (
            PPM if tok == 0 else min(PPM, (PPM * budget) // tok)
        )
    return out


def doc_sample_mask(doc_ids: np.ndarray,
                    thresholds_ppm: np.ndarray) -> np.ndarray:
    """Deterministic keep mask: Knuth hash of doc_id vs per-row
    threshold (both int64; see module docstring for the overflow-free
    form)."""
    h = ((doc_ids.astype(np.int64) % (1 << 31)) * KNUTH) % (1 << 32) % PPM
    return h < thresholds_ppm


def mixture_sample_stats(ds, thresholds: dict[str, int], *,
                         source_col: str = "source",
                         text_col: str = "text",
                         id_col: str = "doc_id") -> pd.DataFrame:
    """Pass 2 + aggregate: per-source ``(n_docs, n_sampled,
    total_tokens, sampled_tokens, weight_ppm)``. Map-only; per-doc
    rows never reach the driver."""
    from ..pipelines.queries import driver_grouped_agg

    srcs = sorted(thresholds)
    value_set = pa.array(srcs, pa.string())
    thr = np.asarray([thresholds[s] for s in srcs], np.int64)

    def score(t: pa.Table) -> pa.Table:
        n_tok = _token_counts(t[text_col])
        idx = pc.index_in(t[source_col], value_set=value_set)
        idx_np = idx.to_numpy(zero_copy_only=False)
        if idx.null_count:
            raise ValueError(
                "mixture_sample_stats: batch contains a source absent "
                "from the threshold table"
            )
        row_thr = thr[idx_np.astype(np.int64)]
        ids = t[id_col].to_numpy(zero_copy_only=False)
        keep = doc_sample_mask(ids, row_thr)
        return pa.table(
            {
                "source": t[source_col],
                "kept": pa.array(keep, pa.bool_()),
                "n_tok": pa.array(n_tok, pa.int64()),
                "kept_tok": pa.array(
                    np.where(keep, n_tok, 0), pa.int64()
                ),
            }
        )

    out = driver_grouped_agg(
        ds.map_batches(score, batch_format="pyarrow"),
        ["source"],
        {
            "n_docs": ("kept", "count"),
            "n_sampled": ("kept", "sum"),
            "total_tokens": ("n_tok", "sum"),
            "sampled_tokens": ("kept_tok", "sum"),
        },
    )
    for c in ("n_sampled", "total_tokens", "sampled_tokens"):
        out[c] = out[c].astype("int64")
    out["weight_ppm"] = out["source"].map(thresholds).astype("int64")
    return (
        out[["source", "n_docs", "n_sampled", "total_tokens",
             "sampled_tokens", "weight_ppm"]]
        .sort_values("source")
        .reset_index(drop=True)
    )
