"""Deterministic train/valid/test holdout split + cross-split
duplicate-leakage audit — the dataset-release step after filtering and
dedup: carve immutable evaluation holdouts and PROVE no near-identical
document straddles the boundary (the classic eval-contamination bug a
corpus release must audit for; docs_decontaminate is the sibling that
checks against an EXTERNAL benchmark, this one checks the corpus
against its own holdouts).

Everything is integer arithmetic shared bit-for-bit with the DuckDB
oracle:

- hash: a DOUBLE-round Knuth multiplicative hash on ``doc_id``
  (``h1 = ((id % 2^31) * 2654435761) % 2^32``, ``h2`` the same round
  applied to ``h1``) — two rounds so the split decision is independent
  of ``stages/mixture.py``'s single-round sampling hash (a corpus that
  was mixture-sampled must not end up with a biased holdout: one round
  would make split ppm a FUNCTION of the sampling ppm; the second
  round decorrelates them). The ``% 2^31`` pre-reductions keep every
  product inside int64 on both engines (numpy int64 / DuckDB BIGINT).
- split: ppm = h2 % 1e6 → train < 900000 ≤ valid < 950000 ≤ test
  (90/5/5).
- leakage: two docs share a group when their fingerprint-normalized
  text (``core.textstats.normalize_for_fingerprint``) is identical; a
  group is LEAKY when its members land in more than one split.

Scale shape (100 TB): the split assignment + per-(lang, split) stats
are one map pass with per-batch partials folded on the driver
(``driver_grouped_agg`` — 15 groups). The leakage audit shuffles only
per-batch-DISTINCT ``(tnorm, split-bitmask)`` pairs (≤ 3 rows per key
per block) through ONE groupby whose per-key reduction is
min/max — a key spans >1 split iff min(mask) != max(mask), so no
count-distinct state and no per-group Python; the driver sees a single
scalar. At real scale tnorm would ride as its 64-bit fingerprint
(`textstats.fingerprint`) instead of the normalized string; the string
is kept here so the DuckDB oracle groups on exactly the same key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..core.textstats import normalize_for_fingerprint
from .mixture import KNUTH, PPM, _token_counts

# (label, exclusive ppm upper bound), ascending; last bound == PPM
SPLIT_BOUNDS = (("train", 900_000), ("valid", 950_000), ("test", PPM))

_M31 = np.int64(1) << 31
_M32 = np.int64(1) << 32


def split_ppm(doc_ids: np.ndarray) -> np.ndarray:
    """Double-round Knuth hash → ppm in [0, 1e6). int64-safe: every
    product is ≤ (2^31)·2654435761 < 2^63."""
    ids = doc_ids.astype(np.int64, copy=False)
    h1 = ((ids % _M31) * KNUTH) % _M32
    h2 = ((h1 % _M31) * KNUTH) % _M32
    return h2 % PPM


def assign_split(doc_ids: np.ndarray) -> np.ndarray:
    """Vectorized split labels for a batch of doc_ids."""
    ppm = split_ppm(doc_ids)
    bounds = np.array([b for _, b in SPLIT_BOUNDS], dtype=np.int64)
    labels = np.array([s for s, _ in SPLIT_BOUNDS])
    return labels[np.searchsorted(bounds, ppm, side="right")]


def split_stats(ds) -> pd.DataFrame:
    """Per-(lang, split) doc and token counts. Map-only + driver fold
    (15 groups); tokenization = the shared lowercase [a-z0-9]+ rule."""
    from ..pipelines.queries import driver_grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t["lang"],
                "split": pa.array(assign_split(
                    t["doc_id"].to_numpy(zero_copy_only=False))),
                "n_tok": pa.array(_token_counts(t["text"]), pa.int64()),
            }
        )

    out = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "split"],
        {"n_docs": ("n_tok", "count"), "n_tokens": ("n_tok", "sum")},
    )
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out.sort_values(["lang", "split"]).reset_index(drop=True)


def leaky_group_count(ds) -> int:
    """Number of normalized-text groups whose members span more than
    one split. One exchange over per-batch-distinct (tnorm, mask)
    pairs; min(mask) != max(mask) ⟺ ≥ 2 distinct splits (masks are
    distinct powers of two per split)."""
    from ray.data.aggregate import Max, Min

    mask_of = {s: 1 << i for i, (s, _) in enumerate(SPLIT_BOUNDS)}

    def pairs(t: pa.Table) -> pa.Table:
        splits = assign_split(t["doc_id"].to_numpy(zero_copy_only=False))
        masks = np.array([mask_of[s] for s in splits], dtype=np.int64)
        tnorm = pa.array(
            [normalize_for_fingerprint(x) for x in t["text"].to_pylist()],
            pa.string(),
        )
        batch = pa.table({"tnorm": tnorm, "mask": pa.array(masks, pa.int64())})
        # in-batch combiner: distinct pairs only leave the worker
        return batch.group_by(["tnorm", "mask"]).aggregate([])

    grouped = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("tnorm")
        .aggregate(Min("mask", alias_name="lo"), Max("mask", alias_name="hi"))
    )

    def count_leaky(t: pa.Table) -> pa.Table:
        n = int(pc.sum(pc.not_equal(t["lo"], t["hi"])).as_py() or 0)
        return pa.table({"n": pa.array([n], pa.int64())})

    return int(
        grouped.map_batches(count_leaky, batch_format="pyarrow").sum("n") or 0
    )
