"""Bigram language-model perplexity scoring — the classic
quality-filter op of an LLM training-data pipeline (KenLM-style
perplexity gates, here with an exactly-reproducible bigram model so
the DuckDB oracle can re-derive every score).

Model: add-k-smoothed bigram LM over the corpus' own token stream
(self-perplexity — the standard "score the corpus with a model fit on
it" filter shape). Each document contributes the token sequence
``<s> t1 .. tn`` (one BOS context per document, no EOS), so

    logp(doc) = sum_i ln( (c(w_{i-1}, w_i) + k) /
                          (c(w_{i-1}) + k * (V + 1)) )

where ``c`` are corpus-wide bigram/context counts, ``V`` is the
unigram vocabulary size and the ``+1`` covers the unseen-token mass.
``ppl(doc) = exp(-logp/n)`` for docs with ``n >= 1`` tokens.

Two streaming passes (the stages/bm25.py shape):

1. ``bigram_counts`` — per-batch partial bigram-count tables (Arrow
   ``group_by`` inside the batch) STREAM-folded on the driver via
   ``iter_batches`` (never a full pull). The vocabulary is the
   natural-language long tail at 100 TB, so the fold is guarded LOUD
   and CONTINUOUSLY at ``MAX_VOCAB_BIGRAMS`` — it aborts on the batch
   that crosses the ceiling (the honest limit: a bigger model needs a
   count-shuffle + pruning pass, a different op). Driver traffic is
   O(distinct bigrams), never O(tokens).
2. ``perplexity_by_lang`` — an actor-pool scorer holding the model as
   Arrow value-set arrays (shipped once via ``ray.put`` +
   ``broadcast.cached_get``); per-token lookups are ``pc.index_in``
   hash probes (C kernels, no Python per token), and the per-lang
   aggregate folds per-batch partials so per-doc rows never reach the
   driver.

Tokenization is stages/bm25.py's ``TOKEN_SPLIT_RE`` (lowercase
[a-z0-9]+ runs), shared verbatim with the SQL oracle; the bigram key
joins (prev, tok) with ``\\x01`` and BOS is ``\\x02``, both outside
the token alphabet.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .bm25 import TOKEN_SPLIT_RE

MAX_VOCAB_BIGRAMS = 2_000_000  # loud ceiling on the driver-folded model
BOS = "\x02"  # out-of-alphabet sentinel: can never collide with a token
SEP = "\x01"


def _doc_token_stream(texts) -> tuple[np.ndarray, pa.Array, pa.Array]:
    """``(parents, prev, tok)`` per non-empty token in document order:
    doc index, predecessor token (BOS at each document start) and the
    token itself, as Arrow string arrays."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), TOKEN_SPLIT_RE)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    parents = parents[keep]
    tok = flat.filter(pa.array(keep))
    n = len(tok)
    if n == 0:
        return parents, pa.array([], pa.string()), tok
    # prev = tok shifted down one, BOS at each document start
    starts = np.empty(n, bool)
    starts[0] = True
    starts[1:] = parents[1:] != parents[:-1]
    prev = pc.if_else(
        pa.array(starts),
        pa.scalar(BOS, pa.string()),
        pa.concat_arrays(
            [pa.array([BOS], pa.string()), tok.slice(0, n - 1)]
        ),
    )
    return parents, prev, tok


def _batch_bigrams(texts) -> pa.Table:
    """Per-batch partial: (prev, tok, n) bigram counts."""
    _parents, prev, tok = _doc_token_stream(texts)
    t = pa.table({"prev": prev, "tok": tok})
    g = t.group_by(["prev", "tok"]).aggregate([("tok", "count")])
    return g.rename_columns(["prev", "tok", "n"])


def bigram_counts(ds, *, text_col: str = "text") -> dict:
    """Pass 1 -> the model: bigram keys/counts and context keys/counts
    as parallel lists plus the vocabulary size. Per-batch partials are
    stream-folded on the driver (``iter_batches``), guarded
    continuously at ``MAX_VOCAB_BIGRAMS``."""
    part_ds = ds.map_batches(
        lambda t: _batch_bigrams(t[text_col]), batch_format="pyarrow"
    )
    # stream-fold the per-batch partials (one pass, no full driver
    # pull), guarding the model size CONTINUOUSLY — a vocabulary past
    # the ceiling aborts on the batch that crosses it, not after
    # holding everything
    merged: dict = {}
    for bt in part_ds.iter_batches(batch_format="pyarrow"):
        for p, t_, n in zip(
            bt["prev"].to_pylist(), bt["tok"].to_pylist(), bt["n"].to_pylist()
        ):
            k = p + SEP + t_
            merged[k] = merged.get(k, 0) + n
        if len(merged) > MAX_VOCAB_BIGRAMS:
            raise ValueError(
                f"bigram model exceeds MAX_VOCAB_BIGRAMS="
                f"{MAX_VOCAB_BIGRAMS}: prune with a distributed "
                "count-shuffle pass before scoring (different op)"
            )
    ctx: dict = {}
    vocab = set()
    for k, n in merged.items():
        p, t_ = k.split(SEP, 1)
        ctx[p] = ctx.get(p, 0) + n
        vocab.add(t_)
    return {
        "bg_keys": list(merged),
        "bg_n": [int(v) for v in merged.values()],
        "ctx_keys": list(ctx),
        "ctx_n": [int(v) for v in ctx.values()],
        "vocab_size": len(vocab),
    }


PRUNED_BG_LIMIT = 5_000_000  # pruned survivors must still broadcast
CTX_FOLD_LIMIT = 2_000_000  # contexts ≈ vocab+1 — broadcast payload too


def bigram_counts_pruned(ds, *, min_count: int = 2,
                         text_col: str = "text") -> dict:
    """The distributed training pass ``bigram_counts`` documents as the
    escape hatch for vocabularies past ``MAX_VOCAB_BIGRAMS``: ONE
    count-shuffle — per-batch partial bigram counts (Arrow ``group_by``
    combiner, so the exchange carries distinct-per-batch rows, never
    tokens) → ``groupby(key).sum`` → min-count pruning INSIDE the
    cluster (``filter(expr=...)`` over the aggregated blocks). Only the
    pruned survivors (guarded loud at ``PRUNED_BG_LIMIT``) and the
    context/vocab aggregates (O(vocab) rows, guarded at
    ``CTX_FOLD_LIMIT``) ever reach the driver.

    Standard count-pruning semantics (Katz/KenLM ``--prune``): pruned
    numerators fall into the ``+k`` unseen mass, while context
    denominators keep the FULL counts — the model stays a proper
    smoothed distribution over the true token totals. The returned
    dict is ``PerplexityScorer``'s model shape, so scoring is
    unchanged; a pruned (prev, tok) simply misses the ``index_in``
    probe and scores as unseen."""
    from ray.data.aggregate import Sum

    def keyed(t: pa.Table) -> pa.Table:
        g = _batch_bigrams(t[text_col])
        key = pc.binary_join_element_wise(g["prev"], g["tok"], SEP)
        return pa.table({"key": key, "n": g["n"]})

    full = (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # three consumers below — don't re-run the shuffle
    )

    bg_keys: list[str] = []
    bg_n: list[int] = []
    for bt in full.filter(expr=f"n >= {int(min_count)}").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        bg_keys.extend(bt["key"].to_pylist())
        bg_n.extend(int(v) for v in bt["n"].to_pylist())
        if len(bg_keys) > PRUNED_BG_LIMIT:
            raise ValueError(
                f"bigram_counts_pruned: survivors exceed PRUNED_BG_LIMIT="
                f"{PRUNED_BG_LIMIT} at min_count={min_count} — raise "
                "min_count; the model must fit one broadcast payload"
            )

    def ctx_rows(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["key"], SEP, max_splits=1)
        return pa.table({"prev": pc.list_element(parts, 0), "n": t["n"]})

    ctx_keys: list[str] = []
    ctx_n: list[int] = []
    for bt in (
        full.map_batches(ctx_rows, batch_format="pyarrow")
        .groupby("prev")
        .aggregate(Sum("n", alias_name="n"))
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ):
        ctx_keys.extend(bt["prev"].to_pylist())
        ctx_n.extend(int(v) for v in bt["n"].to_pylist())
        if len(ctx_keys) > CTX_FOLD_LIMIT:
            raise ValueError(
                f"bigram_counts_pruned: contexts exceed CTX_FOLD_LIMIT="
                f"{CTX_FOLD_LIMIT} — vocabulary too large to broadcast"
            )

    def tok_rows(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["key"], SEP, max_splits=1)
        return pa.table({"tok": pc.list_element(parts, 1)})

    vocab_size = (
        full.map_batches(tok_rows, batch_format="pyarrow")
        .groupby("tok")
        .count()
        .count()
    )

    return {
        "bg_keys": bg_keys,
        "bg_n": bg_n,
        "ctx_keys": ctx_keys,
        "ctx_n": ctx_n,
        "vocab_size": int(vocab_size),
    }


def _lookup(keys: pa.Array, value_set: pa.Array, counts: np.ndarray):
    """Hash-probe ``keys`` in ``value_set`` -> float64 counts (0 for
    misses). All C kernels — no Python per key."""
    idx = pc.index_in(keys, value_set=value_set)
    idx_np = idx.to_numpy(zero_copy_only=False)
    miss = np.isnan(idx_np) if idx_np.dtype.kind == "f" else idx.is_null(
    ).to_numpy(zero_copy_only=False)
    safe = np.where(miss, 0, idx_np).astype(np.int64)
    return np.where(miss, 0.0, counts[safe])


class PerplexityScorer:
    """Actor-pool batch scorer: the model rides the object store once
    (``broadcast.cached_get``); lookups are ``pc.index_in`` probes."""

    def __init__(self, model_ref, *, k: float = 0.5,
                 text_col: str = "text", keep_cols: tuple = ("lang",)):
        from ..broadcast import cached_get

        model = cached_get(model_ref)
        self.k = float(k)
        self.text_col = text_col
        self.keep_cols = keep_cols
        self.bg_set = pa.array(model["bg_keys"], pa.string())
        self.bg_n = np.asarray(model["bg_n"], np.float64)
        self.ctx_set = pa.array(model["ctx_keys"], pa.string())
        self.ctx_n = np.asarray(model["ctx_n"], np.float64)
        self.v1 = float(model["vocab_size"] + 1)

    def __call__(self, t: pa.Table) -> pa.Table:
        parents, prev, tok = _doc_token_stream(t[self.text_col])
        n_docs = t.num_rows
        n_tok = np.bincount(parents, minlength=n_docs).astype(np.int64)
        logp = np.zeros(n_docs, np.float64)
        if len(tok):
            keys = pc.binary_join_element_wise(prev, tok, SEP)
            num = _lookup(keys, self.bg_set, self.bg_n)
            den = _lookup(prev, self.ctx_set, self.ctx_n)
            lp = np.log((num + self.k) / (den + self.k * self.v1))
            logp = np.bincount(parents, weights=lp, minlength=n_docs)
        with np.errstate(divide="ignore", invalid="ignore"):
            ppl = np.where(
                n_tok > 0, np.exp(-logp / np.maximum(n_tok, 1)), 0.0
            )
        cols = {c: t[c] for c in self.keep_cols}
        cols["n_tok"] = pa.array(n_tok, pa.int64())
        cols["ppl"] = pa.array(ppl, pa.float64())
        return pa.table(cols)


def perplexity_by_lang(ds, model, *, k: float = 0.5,
                       text_col: str = "text", concurrency: int = 2):
    """Pass 2 + aggregate: per-lang (n_docs, avg_ppl over docs with
    >= 1 token) pandas frame. Per-doc rows never reach the driver —
    the aggregate folds per-batch partials."""
    import ray

    model_ref = ray.put(model)

    scored = ds.map_batches(
        PerplexityScorer,
        fn_constructor_kwargs={"model_ref": model_ref, "k": k,
                               "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def partial(t: pa.Table) -> pa.Table:
        tt = t.filter(pc.greater(t["n_tok"], 0))
        g = pa.table({"lang": tt["lang"], "ppl": tt["ppl"]}).group_by(
            ["lang"]
        ).aggregate([("ppl", "sum"), ("ppl", "count")])
        return g.rename_columns(["lang", "sum_ppl", "n_docs"])

    parts = scored.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("lang", as_index=False).agg(
        sum_ppl=("sum_ppl", "sum"), n_docs=("n_docs", "sum")
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["avg_ppl"] = (out["sum_ppl"] / out["n_docs"]).round(4)
    return (
        out[["lang", "n_docs", "avg_ppl"]]
        .sort_values("lang")
        .reset_index(drop=True)
    )
