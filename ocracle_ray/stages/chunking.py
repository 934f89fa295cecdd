"""Document chunking — split every document into fixed-size token
windows with overlap (the context-window packing pass in front of
tokenizer/embedding stages: RAG indexing and pretraining sharding both
run exactly this shape).

Rule (shared verbatim with the DuckDB oracle): windows of ``size``
tokens start every ``stride`` tokens (``stride = size - overlap``);
the last window of a document may be short but is emitted only when it
adds at least one NEW token (i.e. window starts < n_tok and either
start == 0 or start + size covers tokens the previous window did not —
equivalently starts are ``0, stride, 2*stride, ...`` while
``start < n_tok`` and ``start == 0 or start + size - stride < n_tok``
... simplified: starts s while s == 0 or s < n_tok - overlap). Docs
with zero tokens emit zero chunks.

Scale shape: pure map — ``map_batches`` emits one row per chunk with
vectorized window arithmetic (no Python per token); the chunk TEXT is
rebuilt only by the library op (``chunk_documents``), while the stats
query ships counts only. At 100 TB this is the embarrassing-parallel
stage between dedup and embedding; nothing shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .mixture import _token_counts


def _chunk_counts(n_tok: np.ndarray, size: int,
                  stride: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc (n_chunks, short_last) under the start rule
    ``s = 0, stride, ... while s == 0 or s < n_tok - (size - stride)``:
    every start must add new tokens vs the previous window."""
    overlap = size - stride
    # number of starts: 1 + ceil((n_tok - size) / stride) for docs
    # longer than one window; 1 for 1..size tokens; 0 for empty
    n = np.where(
        n_tok == 0,
        0,
        np.where(
            n_tok <= size,
            1,
            1 + np.ceil((n_tok - size) / stride).astype(np.int64),
        ),
    ).astype(np.int64)
    last_start = np.maximum(n - 1, 0) * stride
    last_len = np.minimum(n_tok - last_start, size)
    short_last = (n > 0) & (last_len < size)
    _ = overlap
    return n, short_last


def chunk_stats_by_lang(ds, *, size: int = 64, stride: int = 48,
                        text_col: str = "text",
                        lang_col: str = "lang") -> pd.DataFrame:
    """Per-lang ``(n_docs, n_chunks, n_short_last, total_tokens,
    total_chunk_tokens)`` — the window bookkeeping a packing stage
    audits (``total_chunk_tokens`` counts tokens per chunk, i.e.
    overlap tokens count once per window they appear in)."""
    from ..pipelines.queries import driver_grouped_agg

    if stride <= 0 or stride > size:
        raise ValueError("chunking: need 0 < stride <= size")

    def partial(t: pa.Table) -> pa.Table:
        n_tok = _token_counts(t[text_col])
        n, short = _chunk_counts(n_tok, size, stride)
        # sum of per-chunk lengths: full windows * size + short last
        last_start = np.maximum(n - 1, 0) * stride
        last_len = np.where(
            n > 0, np.minimum(n_tok - last_start, size), 0
        )
        chunk_toks = np.maximum(n - 1, 0) * size + last_len
        return pa.table(
            {
                "lang": t[lang_col],
                "n_tok": pa.array(n_tok, pa.int64()),
                "n_chunks": pa.array(n, pa.int64()),
                "short": pa.array(short.astype(np.int64), pa.int64()),
                "chunk_toks": pa.array(
                    chunk_toks.astype(np.int64), pa.int64()
                ),
            }
        )

    out = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang"],
        {
            "n_docs": ("n_tok", "count"),
            "total_tokens": ("n_tok", "sum"),
            "n_chunks": ("n_chunks", "sum"),
            "n_short_last": ("short", "sum"),
            "total_chunk_tokens": ("chunk_toks", "sum"),
        },
    )
    for c in ("total_tokens", "n_chunks", "n_short_last",
              "total_chunk_tokens"):
        out[c] = out[c].astype("int64")
    return (
        out[["lang", "n_docs", "n_chunks", "n_short_last",
             "total_tokens", "total_chunk_tokens"]]
        .sort_values("lang")
        .reset_index(drop=True)
    )


def chunk_documents(ds, *, size: int = 64, stride: int = 48,
                    text_col: str = "text", id_col: str = "doc_id"):
    """The pipeline op itself: one output row per chunk with
    ``(doc_id, chunk_index, chunk_text, n_chunk_tokens)``. Chunk text
    is the window's tokens joined by single spaces (the op is defined
    on the token stream). Streaming map; consume with write_parquet."""
    if stride <= 0 or stride > size:
        raise ValueError("chunking: need 0 < stride <= size")

    from .ngram_lm import _doc_token_stream

    def emit(t: pa.Table) -> pa.Table:
        parents, _prev, tok = _doc_token_stream(t[text_col])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        toks = tok.to_pylist()
        bounds = np.searchsorted(parents, np.arange(t.num_rows + 1))
        out_id, out_ix, out_txt, out_n = [], [], [], []
        for d in range(t.num_rows):
            words = toks[bounds[d]:bounds[d + 1]]
            n_tok = len(words)
            s = 0
            ix = 0
            while s == 0 or s < n_tok - (size - stride):
                if n_tok == 0:
                    break
                w = words[s:s + size]
                out_id.append(int(ids[d]))
                out_ix.append(ix)
                out_txt.append(" ".join(w))
                out_n.append(len(w))
                ix += 1
                s += stride
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "chunk_index": pa.array(out_ix, pa.int64()),
                "chunk_text": pa.array(out_txt, pa.string()),
                "n_chunk_tokens": pa.array(out_n, pa.int64()),
            }
        )

    return ds.map_batches(emit, batch_format="pyarrow")
