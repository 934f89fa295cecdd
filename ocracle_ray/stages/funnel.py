"""The composite training-data filter funnel — the end-to-end gate
chain a real corpus release runs, in one engine pass, with per-gate
drop attribution. Individual gates exist as standalone oracled ops
(docs_exact_dedup / docs_quality / docs_perplexity /
docs_repetition); this module composes them the way a user would and
reports the FUNNEL: each document is attributed to its FIRST failing
gate, in the fixed order

    dup -> short -> quality -> ppl -> repetition -> kept

so the per-lang drop counts partition n_docs exactly (n_kept + the
five drop columns always sums to n_docs — an invariant the tests
pin).

Shape: two light prep passes (the bigram model via
``ngram_lm.bigram_counts`` and a conflicted-fingerprint winner map
folded from per-batch partials, both loud-guarded) and then ONE
scoring pass: an actor pool holding the broadcast model + winner map
computes every signal per batch (ppl via pc.index_in probes,
repetition via the in-batch gram group_by, quality via the shared RE2
kernels, fingerprints for the dup gate) and emits per-lang partial
counts — per-doc rows never reach the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.textstats import fingerprint, quality_scores_vec
from .gopher import _doc_gram_stats
from .ngram_lm import PerplexityScorer

DUP_MAP_LIMIT = 5_000_000  # conflicted-fingerprint winner-map ceiling

# gate thresholds (shared verbatim with the SQL oracle)
MIN_TOKENS = 10
MIN_QUALITY = 0.75
MAX_PPL = 29.6  # compared on round(ppl, 6), both engines
MAX_TOP_BIGRAM_FRAC = 0.20

GATES = ("dup", "short", "quality", "ppl", "repetition")


def conflicted_winners(ds, *, id_col: str = "doc_id",
                       text_col: str = "text") -> dict:
    """``{fingerprint: min id}`` for fingerprints occurring MORE THAN
    once — the flagship's winner-map trick: unique docs never enter the
    broadcast map, so it stays tiny on a mostly-unique corpus.

    Dispatch on corpus size: below ``DUP_MAP_LIMIT`` the per-batch
    (fp, min_id, n) partials stream-fold on the driver (no shuffle —
    the fast lane at bench scale where every exchange carries a ~5 s
    session floor); past it the fold flips to ONE distributed
    crc32-bucketed groupby and the driver pulls ONLY the conflicted
    keys — at 100 TB the driver never holds the unique majority."""

    def partial(t: pa.Table) -> pa.Table:
        fps = pa.array(
            [fingerprint(x) for x in t[text_col].to_pylist()], pa.int64()
        )
        g = pa.table({"fp": fps, "id": t[id_col]}).group_by(["fp"]).aggregate(
            [("id", "min"), ("id", "count")]
        )
        return g.rename_columns(["fp", "min_id", "n"])

    part_ds = ds.map_batches(partial, batch_format="pyarrow")
    merged: dict = {}
    for bt in part_ds.iter_batches(batch_format="pyarrow"):
        for fp, mid, n in zip(
            bt["fp"].to_pylist(), bt["min_id"].to_pylist(), bt["n"].to_pylist()
        ):
            old = merged.get(fp)
            merged[fp] = (mid if old is None else min(old[0], mid),
                          n if old is None else old[1] + n)
        if len(merged) > DUP_MAP_LIMIT:
            break
    else:
        return {fp: mid for fp, (mid, n) in merged.items() if n > 1}

    # distributed lane: re-fold the partials with a bucketed groupby,
    # ship only conflicted rows to the driver
    del merged
    import zlib

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pa.array(
            [zlib.crc32(str(fp).encode()) % 256 for fp in t["fp"].to_pylist()],
            pa.int32(),
        )
        return t.append_column("_b", b)

    def fold_conflicted(group: pa.Table) -> pa.Table:
        g = group.group_by(["fp"]).aggregate(
            [("min_id", "min"), ("n", "sum")]
        ).rename_columns(["fp", "min_id", "n"])
        return g.filter(pc.greater(g["n"], 1)).select(["fp", "min_id"])

    conflicted = (
        part_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(fold_conflicted, batch_format="pyarrow")
        .to_pandas()
    )
    if len(conflicted) > DUP_MAP_LIMIT:
        raise ValueError(
            f"funnel has {len(conflicted)} CONFLICTED fingerprints > "
            f"DUP_MAP_LIMIT={DUP_MAP_LIMIT}: a broadcast winner map no "
            "longer fits — run the full-shuffle exact dedup instead "
            "(stages.dedup.exact_dedup)"
        )
    return dict(zip(conflicted["fp"], conflicted["min_id"]))


class FunnelScorer:
    """Per-batch gate attribution: every signal computed locally, one
    per-lang partial-count table out."""

    def __init__(self, model_ref, winners_ref, *, id_col: str = "doc_id",
                 lang_col: str = "lang", text_col: str = "text"):
        from ..broadcast import cached_get

        self.ppl = PerplexityScorer(
            model_ref, text_col=text_col, keep_cols=()
        )
        self.winners = cached_get(winners_ref)
        self.id_col, self.lang_col, self.text_col = id_col, lang_col, text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        texts = t[self.text_col]
        ids = t[self.id_col].to_numpy(zero_copy_only=False)

        # dup: conflicted fingerprint and not the winner
        w = self.winners
        fps = [fingerprint(x) for x in texts.to_pylist()]
        is_dup = np.array(
            [fp in w and i != w[fp] for fp, i in zip(fps, ids)], bool
        )

        scored = self.ppl(t)  # n_tok + ppl columns
        n_tok = scored["n_tok"].to_numpy(zero_copy_only=False)
        ppl = np.round(scored["ppl"].to_numpy(zero_copy_only=False), 6)

        q = quality_scores_vec(texts)

        s = _doc_gram_stats(texts)

        def full(a):
            out = np.zeros(n, np.float64)
            out[: len(a)] = a
            return out

        tc, cover = full(s["total_chars"]), full(s["top_cover"])
        with np.errstate(divide="ignore", invalid="ignore"):
            bigf = np.where(tc > 0, cover / np.maximum(tc, 1), 0.0)

        outcome = np.select(
            [
                is_dup,
                n_tok < MIN_TOKENS,
                q < MIN_QUALITY,
                ppl > MAX_PPL,
                bigf > MAX_TOP_BIGRAM_FRAC,
            ],
            GATES,
            default="kept",
        )
        g = pa.table(
            {
                "lang": t[self.lang_col],
                "outcome": pa.array(outcome.tolist(), pa.string()),
            }
        ).group_by(["lang", "outcome"]).aggregate([("outcome", "count")])
        return g.rename_columns(["lang", "outcome", "n"])


def filter_funnel_by_lang(ds, *, id_col: str = "doc_id",
                          lang_col: str = "lang", text_col: str = "text",
                          concurrency: int = 2):
    """Per-lang funnel frame: ``n_docs, n_kept, n_dup, n_short,
    n_quality, n_ppl, n_repetition`` (the six outcome columns partition
    n_docs exactly)."""
    import ray

    from .ngram_lm import bigram_counts

    model_ref = ray.put(bigram_counts(ds, text_col=text_col))
    winners_ref = ray.put(
        conflicted_winners(ds, id_col=id_col, text_col=text_col)
    )
    parts = ds.map_batches(
        FunnelScorer,
        fn_constructor_kwargs={
            "model_ref": model_ref,
            "winners_ref": winners_ref,
            "id_col": id_col,
            "lang_col": lang_col,
            "text_col": text_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    ).to_pandas()
    folded = parts.groupby(["lang", "outcome"], as_index=False)["n"].sum()
    wide = folded.pivot(index="lang", columns="outcome", values="n")
    wide = wide.rename_axis(columns=None)  # drop pivot's axis label
    for col in GATES + ("kept",):
        if col not in wide:
            wide[col] = 0
    wide = wide.fillna(0).astype("int64").reset_index()
    wide["n_docs"] = sum(wide[c] for c in GATES + ("kept",))
    out = wide.rename(
        columns={g: f"n_{g}" for g in GATES} | {"kept": "n_kept"}
    )
    cols = ["lang", "n_docs", "n_kept"] + [f"n_{g}" for g in GATES]
    return out[cols].sort_values("lang").reset_index(drop=True)
