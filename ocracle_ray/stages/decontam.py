"""Benchmark decontamination — flag training documents that overlap a
held-out evaluation set by shared token n-grams (the GPT-3 appendix-C
/ Llama / FineWeb "13-gram decontamination" op; n is a parameter and
the default here is 8 because the synthetic corpus' duplicate families
share runs shorter than 13 tokens).

Shape at 100 TB: a benchmark/eval suite is small BY DEFINITION (MBs of
text even for a large eval harness), so its distinct n-gram set is the
classic broadcast side — collected once on the driver behind a LOUD
guard (``BENCH_GRAM_LIMIT``), shipped via ``ray.put`` and probed inside
``map_batches`` with ``pc.is_in`` value-set hash kernels. The training
corpus streams through a single map pass — NO shuffle, no join, no
driver traffic beyond per-batch per-lang partial rows. That is the
shape every published decontamination run uses (hash-set membership
against the eval grams), and the only one that works when the training
side is 100 TB and the benchmark side is 100 MB.

Tokenization is the shared ``stages/bm25.py`` rule (lowercase
[a-z0-9]+ runs) and gram keys join tokens with ``\\x01``, both
reproduced verbatim by the DuckDB oracle (lag() windows over ordered
unnest + a semi-join against the benchmark gram set).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .gopher import _shifted
from .ngram_lm import _doc_token_stream

# Loud ceiling on the driver-collected benchmark gram set. Benchmarks
# are small by definition; a "benchmark" past this is a corpus, and
# decontaminating against a corpus is a dedup JOIN (stages/dedup.py),
# a different op.
BENCH_GRAM_LIMIT = 5_000_000

DEFAULT_NGRAM = 8


def _batch_grams(texts, n: int) -> tuple[np.ndarray, pa.Array]:
    """Per-batch (doc-parent index, gram key) pairs for every complete
    in-document token n-gram. Docs with < n tokens emit nothing."""
    parents, _prev, tok = _doc_token_stream(texts)
    if len(tok) < n:  # _shifted slices negative below lag+1 tokens
        return parents[:0], pa.array([], pa.string())
    keys, valid = _shifted(tok, parents, n - 1)
    sel = pa.array(valid)
    return parents[valid], keys.filter(sel)


def benchmark_gram_set(bench_ds, *, n: int = DEFAULT_NGRAM,
                       text_col: str = "text") -> list[str]:
    """Pass 1: the benchmark's distinct n-gram keys. Per-batch
    ``pc.unique`` partials stream-fold on the driver (``iter_batches``,
    never a full pull), guarded CONTINUOUSLY at ``BENCH_GRAM_LIMIT`` —
    an over-sized "benchmark" aborts on the batch that crosses the
    ceiling with the fix named."""

    def partial(t: pa.Table) -> pa.Table:
        _parents, keys = _batch_grams(t[text_col], n)
        return pa.table({"g": pc.unique(keys)})

    part_ds = bench_ds.map_batches(partial, batch_format="pyarrow")
    grams: set[str] = set()
    for bt in part_ds.iter_batches(batch_format="pyarrow"):
        grams.update(bt["g"].to_pylist())
        if len(grams) > BENCH_GRAM_LIMIT:
            raise ValueError(
                f"benchmark gram set exceeds BENCH_GRAM_LIMIT="
                f"{BENCH_GRAM_LIMIT}: that side is corpus-sized — "
                "decontaminate with a distributed dedup join "
                "(stages/dedup.py) instead of a broadcast set"
            )
    # sorted so the broadcast object (and thus every downstream probe
    # order) is byte-identical across block layouts / parallelism
    return sorted(grams)


class ContaminationScorer:
    """Actor-pool batch scorer: the benchmark gram set rides the object
    store once (``broadcast.cached_get``); per-gram membership is a
    ``pc.is_in`` value-set hash probe (C kernel, no Python per gram)."""

    def __init__(self, gram_ref, *, n: int = DEFAULT_NGRAM,
                 text_col: str = "text", lang_col: str = "lang"):
        from ..broadcast import cached_get

        self.value_set = pa.array(cached_get(gram_ref), pa.string())
        self.n = int(n)
        self.text_col = text_col
        self.lang_col = lang_col

    def __call__(self, t: pa.Table) -> pa.Table:
        n_docs = t.num_rows
        hits = np.zeros(n_docs, np.int64)
        parents, keys = _batch_grams(t[self.text_col], self.n)
        if len(keys) and len(self.value_set):
            hit = pc.is_in(keys, value_set=self.value_set).to_numpy(
                zero_copy_only=False
            )
            hits += np.bincount(
                parents[hit], minlength=n_docs
            ).astype(np.int64)
        return pa.table(
            {
                "lang": t[self.lang_col],
                "contaminated": pa.array(hits > 0, pa.bool_()),
                "n_gram_hits": pa.array(hits, pa.int64()),
            }
        )


def contamination_by_lang(train_ds, grams: list[str], *,
                          n: int = DEFAULT_NGRAM, text_col: str = "text",
                          lang_col: str = "lang", concurrency: int = 2
                          ) -> pd.DataFrame:
    """Pass 2 + aggregate: per-lang ``(n_docs, n_contaminated,
    n_gram_hits, contam_rate)`` over the training side. Per-doc rows
    never reach the driver — ``driver_grouped_agg`` folds per-batch
    per-lang partials (integer sums, order-independent)."""
    import ray

    from ..pipelines.queries import driver_grouped_agg

    gram_ref = ray.put(grams)
    scored = train_ds.map_batches(
        ContaminationScorer,
        fn_constructor_kwargs={"gram_ref": gram_ref, "n": n,
                               "text_col": text_col, "lang_col": lang_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    out = driver_grouped_agg(
        scored,
        ["lang"],
        {
            "n_docs": ("contaminated", "count"),
            "n_contaminated": ("contaminated", "sum"),
            "n_gram_hits": ("n_gram_hits", "sum"),
        },
    )
    out["n_contaminated"] = out["n_contaminated"].astype("int64")
    out["n_gram_hits"] = out["n_gram_hits"].astype("int64")
    from ..core.textstats import round_half_away

    out["contam_rate"] = round_half_away(
        out["n_contaminated"] / out["n_docs"], 4
    )
    return (
        out[["lang", "n_docs", "n_contaminated", "n_gram_hits",
             "contam_rate"]]
        .sort_values("lang")
        .reset_index(drop=True)
    )
