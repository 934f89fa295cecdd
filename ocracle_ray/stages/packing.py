"""GPT-style sequence packing — concatenate every document's tokens
(each followed by one EOS) in doc_id order and chunk the stream into
fixed-length training sequences. The op every autoregressive-LM data
pipeline runs LAST (The Pile / GPT-3 / Llama pretraining all pack this
way); ``stages/chunking.py`` is the per-doc sibling (windows never
cross documents), this one is the cross-doc form where a document can
straddle a sequence boundary.

Semantics (integer-exact, shared with the DuckDB oracle):

- token count t_d = the corpus-standard lowercase [a-z0-9]+ runs
  (``stages/bm25.py`` tokenization, shared verbatim with SQL);
- stream position: doc d occupies [off_d, off_d + t_d) where
  off_d = Σ_{id' < id} (t_{d'} + 1)  (the +1 is the EOS after each
  doc — zero-token docs still emit their EOS but span no sequence);
- sequence of a position p = p // L; a doc CROSSES when its first and
  last content token land in different sequences;
- n_sequences = ceil(total_stream / L) (the final short sequence is
  padded, n_pad_tokens = n_sequences·L - total_stream).

Scale shape (100 TB): a global ordered prefix sum — the running-sum
pattern (``stages/running.py``) applied to a corpus-wide key instead
of a per-user one. Sort by doc_id (range partition), materialize,
then TWO passes over the same immutable blocks: pass 1 emits one
(block min doc_id, block stream length) row per block (O(blocks)
driver traffic), the driver computes exclusive block offsets; pass 2
re-maps the same blocks, adds the broadcast offset to the in-block
cumsum and folds per-lang partials. Per-doc spans never sit on the
driver — ``pack_doc_spans`` streams them as a Dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .mixture import _token_counts

SEQ_LEN = 256


def _block_key_and_cumsum(t: pa.Table):
    """(block min doc_id, per-doc token counts, in-block exclusive
    cumsum of the stream stride t+1, block stream total)."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    toks = _token_counts(t["text"])
    stride = toks + 1  # content tokens + EOS
    excl = np.concatenate(([0], np.cumsum(stride)[:-1]))
    return int(ids.min()), toks, excl, int(stride.sum())


def _block_offsets(sorted_ds) -> dict[int, int]:
    """Pass 1: exclusive stream offset per block, keyed by the block's
    min doc_id (blocks are immutable after materialize, so pass 2 sees
    the identical batches)."""

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:  # sort can emit empty range blocks
            return pa.table({
                "key": pa.array([], pa.int64()),
                "total": pa.array([], pa.int64()),
            })
        key, _, _, total = _block_key_and_cumsum(t)
        return pa.table({
            "key": pa.array([key], pa.int64()),
            "total": pa.array([total], pa.int64()),
        })

    parts = sorted_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    parts = parts.sort_values("key").reset_index(drop=True)
    offs = np.concatenate(([0], np.cumsum(parts["total"].to_numpy())[:-1]))
    return dict(zip(parts["key"].astype(int), offs.astype(int)))


def _prep(ds):
    """Sort by doc_id and materialize so both passes map the SAME
    blocks (sorted blocks are range-partitioned and internally
    ordered; the offset dict keys on each block's min doc_id)."""
    return ds.sort("doc_id").materialize()


def pack_doc_spans(ds, *, seq_len: int = SEQ_LEN):
    """Per-doc packing spans as a streaming Dataset:
    (doc_id, lang, n_tok, first_seq, last_seq, crosses). Zero-token
    docs get first_seq = last_seq = -1 and never cross."""
    sorted_ds = _prep(ds)
    offsets = _block_offsets(sorted_ds)

    def spans(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "lang": pa.array([], pa.string()),
                "n_tok": pa.array([], pa.int64()),
                "first_seq": pa.array([], pa.int64()),
                "last_seq": pa.array([], pa.int64()),
                "crosses": pa.array([], pa.bool_()),
            })
        key, toks, excl, _ = _block_key_and_cumsum(t)
        off = offsets[key] + excl
        first = off // seq_len
        last = (off + np.maximum(toks, 1) - 1) // seq_len
        empty = toks == 0
        first = np.where(empty, -1, first)
        last = np.where(empty, -1, last)
        return pa.table({
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "n_tok": pa.array(toks, pa.int64()),
            "first_seq": pa.array(first.astype(np.int64), pa.int64()),
            "last_seq": pa.array(last.astype(np.int64), pa.int64()),
            "crosses": pa.array((~empty) & (first != last)),
        })

    return sorted_ds.map_batches(spans, batch_format="pyarrow", batch_size=None)


def packing_stats_by_lang(ds, *, seq_len: int = SEQ_LEN) -> pd.DataFrame:
    """Per-lang (n_docs, n_tokens, n_crossing_docs) + the global
    (n_sequences, n_pad_tokens) as constant columns. Driver sees only
    per-block partial rows."""
    from ..pipelines.queries import driver_grouped_agg

    spans = pack_doc_spans(ds, seq_len=seq_len)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": t["lang"],
            "n_tok": t["n_tok"],
            "crossing": pa.array(
                t["crosses"].to_numpy(zero_copy_only=False).astype(np.int64),
                pa.int64(),
            ),
        })

    out = driver_grouped_agg(
        spans.map_batches(partial, batch_format="pyarrow"),
        ["lang"],
        {
            "n_docs": ("n_tok", "count"),
            "n_tokens": ("n_tok", "sum"),
            "n_crossing_docs": ("crossing", "sum"),
        },
    )
    total_stream = int(out["n_tokens"].sum()) + int(out["n_docs"].sum())
    n_seq = (total_stream + seq_len - 1) // seq_len
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["n_crossing_docs"] = out["n_crossing_docs"].astype("int64")
    out["n_sequences"] = np.int64(n_seq)
    out["n_pad_tokens"] = np.int64(n_seq * seq_len - total_stream)
    return out.sort_values("lang").reset_index(drop=True)
