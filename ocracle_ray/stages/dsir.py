"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw document by how target-like its
hashed bag-of-words is, ``log w(doc) = Σ_tok [ln p_target(bucket(tok))
− ln p_raw(bucket(tok))]``, the published recipe for picking
pretraining data that matches a trusted target distribution.

The hashing trick IS the scale story: features live in a FIXED space of
``N_BUCKETS`` FNV-1a buckets, so the pass-1 model fold is bounded by
construction — per-batch partials are at most ``N_BUCKETS`` sparse rows
and the driver holds two int64[N_BUCKETS] arrays, with NO vocabulary
guard needed (contrast stages/ngram_lm.py, whose explicit-vocab model
must abort past MAX_VOCAB_BIGRAMS; DSIR's estimator absorbs collisions
as part of the model, which is exactly why the paper hashes).

Two streaming passes, zero shuffle:

1. ``dsir_bucket_counts`` — ONE corpus pass emitting per-batch sparse
   ``(bucket, n_target, n_raw)`` partials (raw counts cover every doc;
   target counts cover docs matching the target predicate — the
   "trusted distribution" side), stream-folded on the driver.
2. ``dsir_score_by_lang`` — an actor pool holding the broadcast
   λ = ln(p_t) − ln(p_r) array (N_BUCKETS floats); per-doc log-weights
   are one vectorized gather + ``np.bincount(parents, weights=λ)``,
   and only per-lang partials leave the workers.

Token hashing is 64-bit FNV-1a over the token bytes, computed by a
POSITION-SWEEP numpy kernel over the batch's token dictionary (hash
each distinct token once; O(max_token_len) vectorized passes, no
Python per token). FNV-1a is byte-sequential arithmetic, so the DuckDB
oracle re-derives every hash exactly with a ``list_reduce`` over
``string_split(tok, '')`` codepoints (the events_user_cms
generated-hash-oracle precedent) — tokens are ASCII by construction
(stages/bm25.py's lowercase ``[a-z0-9]+`` runs), so codepoints equal
UTF-8 bytes.

Smoothing: add-1 over the bucket space on BOTH distributions,
``p(b) = (c[b] + 1) / (C + N_BUCKETS)``; per-doc log-weights round to
6 before any aggregate on both sides (the nb_classifier
summation-order rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .bm25 import TOKEN_SPLIT_RE

N_BUCKETS = 4096
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a64_bucket_vec(tokens, n_buckets: int = N_BUCKETS) -> np.ndarray:
    """Per-token FNV-1a bucket indices (int64), vectorized: hash each
    DISTINCT token of the batch once via an O(max_len) position sweep
    over the dictionary's raw byte buffer, then gather through the
    dictionary indices. Exact twin of core.textstats.fnv1a64 per token
    (asserted in tests)."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    n = len(tokens)
    if n == 0:
        return np.empty(0, np.int64)
    enc = tokens.dictionary_encode()
    dic = enc.dictionary
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nd = len(dic)
    width = np.int64 if pa.types.is_large_string(dic.type) else np.int32
    off = np.frombuffer(dic.buffers()[1], dtype=width)[
        dic.offset: dic.offset + nd + 1
    ].astype(np.int64)
    data = np.frombuffer(dic.buffers()[2], dtype=np.uint8)
    lens = off[1:] - off[:-1]
    h = np.full(nd, _FNV_OFFSET, np.uint64)
    starts = off[:-1]
    with np.errstate(over="ignore"):
        for p in range(int(lens.max(initial=0))):
            active = lens > p
            b = data[starts[active] + p].astype(np.uint64)
            h[active] = (h[active] ^ b) * _FNV_PRIME  # uint64 wraps
    buckets = (h % np.uint64(n_buckets)).astype(np.int64)
    return buckets[idx]


def _doc_tokens(texts) -> tuple[np.ndarray, pa.Array]:
    """(parents, flat non-empty tokens) for a batch of texts —
    stages/bm25.py's tokenization, shared verbatim with the oracle."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), TOKEN_SPLIT_RE)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return parents[keep], flat.filter(pa.array(keep))


def dsir_bucket_counts(ds, *, text_col: str = "text",
                       target_col: str = "lang", target_value: str = "en",
                       n_buckets: int = N_BUCKETS) -> dict:
    """Pass 1 → the model: per-bucket target/raw token counts plus
    totals. Per-batch partials are sparse ``(bucket, n_t, n_r)`` rows
    (≤ n_buckets each); the driver fold is two fixed int64 arrays —
    bounded by construction, no guard needed."""

    def partial(t: pa.Table) -> pa.Table:
        parents, tok = _doc_tokens(t[text_col])
        if len(tok) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n_t": pa.array([], pa.int64()),
                             "n_r": pa.array([], pa.int64())})
        buckets = fnv1a64_bucket_vec(tok, n_buckets)
        is_target = pc.equal(t[target_col], target_value).to_numpy(
            zero_copy_only=False)
        n_r = np.bincount(buckets, minlength=n_buckets)
        n_t = np.bincount(buckets[is_target[parents]],
                          minlength=n_buckets)
        nz = np.flatnonzero(n_r)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "n_t": pa.array(n_t[nz], pa.int64()),
                         "n_r": pa.array(n_r[nz], pa.int64())})

    ct = np.zeros(n_buckets, np.int64)
    cr = np.zeros(n_buckets, np.int64)
    part_ds = ds.map_batches(partial, batch_format="pyarrow")
    for bt in part_ds.iter_batches(batch_format="pyarrow"):
        b = bt["bucket"].to_numpy(zero_copy_only=False)
        np.add.at(ct, b, bt["n_t"].to_numpy(zero_copy_only=False))
        np.add.at(cr, b, bt["n_r"].to_numpy(zero_copy_only=False))
    return {"n_t": ct, "n_r": cr, "total_t": int(ct.sum()),
            "total_r": int(cr.sum()), "n_buckets": n_buckets}


def dsir_lambda(model: dict) -> np.ndarray:
    """λ[b] = ln p_target(b) − ln p_raw(b), add-1 smoothed over the
    bucket space."""
    nb = model["n_buckets"]
    lt = np.log((model["n_t"] + 1.0) / (model["total_t"] + float(nb)))
    lr = np.log((model["n_r"] + 1.0) / (model["total_r"] + float(nb)))
    return lt - lr


class DsirScorer:
    """Actor-pool batch scorer: λ rides the object store once
    (broadcast.cached_get); per-doc log-weights are one bucket gather +
    bincount, rounded to 6 per doc (summation-order rule)."""

    def __init__(self, lam_ref, *, text_col: str = "text",
                 lang_col: str = "lang",
                 n_buckets: int = N_BUCKETS):
        from ..broadcast import cached_get

        self.lam = np.asarray(cached_get(lam_ref), np.float64)
        self.text_col = text_col
        self.lang_col = lang_col
        self.n_buckets = n_buckets

    def __call__(self, t: pa.Table) -> pa.Table:
        parents, tok = _doc_tokens(t[self.text_col])
        logw = np.zeros(t.num_rows, np.float64)
        if len(tok):
            buckets = fnv1a64_bucket_vec(tok, self.n_buckets)
            logw = np.bincount(parents, weights=self.lam[buckets],
                               minlength=t.num_rows)
        return pa.table({
            "lang": t[self.lang_col],
            "logw": pa.array(np.round(logw, 6), pa.float64()),
        })


def dsir_score_by_lang(ds, lam: np.ndarray, *, text_col: str = "text",
                       n_buckets: int = N_BUCKETS, concurrency: int = 2):
    """Pass 2 + aggregate: per-lang ``(n_docs, avg_logw, n_pos)``
    pandas frame — n_pos counts docs whose rounded log-weight is > 0
    (the "more target-like than raw" side). Per-doc rows never reach
    the driver."""
    import ray

    lam_ref = ray.put(np.asarray(lam, np.float64))
    scored = ds.map_batches(
        DsirScorer,
        fn_constructor_kwargs={"lam_ref": lam_ref, "text_col": text_col,
                               "n_buckets": n_buckets},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def partial(t: pa.Table) -> pa.Table:
        pos = pc.greater(t["logw"], 0.0)
        g = pa.table({
            "lang": t["lang"], "logw": t["logw"],
            "pos": pc.cast(pos, pa.int64()),
        }).group_by(["lang"]).aggregate(
            [("logw", "sum"), ("pos", "sum"), ("lang", "count")])
        return g.rename_columns(["lang", "sum_logw", "n_pos", "n_docs"])

    from ..pipelines.queries import driver_grouped_agg

    agg = driver_grouped_agg(
        scored.map_batches(partial, batch_format="pyarrow"),
        ["lang"], {"sum_logw": ("sum_logw", "sum"),
                   "n_pos": ("n_pos", "sum"),
                   "n_docs": ("n_docs", "sum")},
    )
    agg["n_docs"] = agg["n_docs"].astype("int64")
    agg["n_pos"] = agg["n_pos"].astype("int64")
    agg["avg_logw"] = (agg["sum_logw"] / agg["n_docs"]).round(4)
    return (agg[["lang", "n_docs", "avg_logw", "n_pos"]]
            .sort_values("lang").reset_index(drop=True))
