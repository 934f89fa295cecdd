"""Approximate quantiles via the mergeable QuantileSketch — the
one-pass, shuffle-free sibling of stages/quantile.py's exact two-pass
histogram refinement. At 100 TB you run THIS when you need many
quantiles of many columns cheaply and the exact pass only for the few
that must be exact.

Scale shape: map_batches turns each input block into sketch-sized
rows — the block's compactor levels flattened to (level, value) plus
one count row — so the driver fold carries O(k·log n) rows per block,
never the values themselves. Folding is merge (concat per level +
recompress): associative up to the documented error bound, i.e. the
tree-merge shape. Estimates depend on block boundaries (any mergeable
quantile sketch's estimates do) but the ERROR BOUND does not; the
consuming query verifies the realized error externally per quantile
(true-rank columns both sides re-derive from raw rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.sketch import QuantileSketch

N_LEVEL = -1  # sentinel level carrying the exact row count


def sketch_column(ds, column: str, *, k: int = 512) -> QuantileSketch:
    """Fold one column of a Dataset into a QuantileSketch."""

    def partial(t: pa.Table) -> pa.Table:
        col = t[column]
        if col.null_count:
            col = col.drop_null()  # COUNT-parity rule: nulls rank nowhere
        sk = QuantileSketch(k).add(col.to_numpy(zero_copy_only=False))
        levels = [np.full(len(arr), i, np.int64)
                  for i, arr in enumerate(sk.levels) if len(arr)]
        values = [arr for arr in sk.levels if len(arr)]
        levels.append(np.array([N_LEVEL], np.int64))
        values.append(np.array([float(sk.n)], np.float64))
        return pa.table({
            "level": pa.array(np.concatenate(levels), pa.int64()),
            "value": pa.array(np.concatenate(values), pa.float64()),
        })

    acc = QuantileSketch(k)
    part = ds.map_batches(partial, batch_format="pyarrow")
    for block in part.iter_batches(batch_size=None, batch_format="pyarrow"):
        lv = block["level"].to_numpy(zero_copy_only=False)
        vv = block["value"].to_numpy(zero_copy_only=False)
        for level in np.unique(lv):
            vals = vv[lv == level]
            if level == N_LEVEL:
                acc.n += int(vals.sum())
            else:
                acc.add_level(int(level), vals)
        acc.compress()
    return acc


def quantile_estimates(ds, column: str, q_pms: list[int],
                       *, k: int = 512) -> list[tuple[int, float, int]]:
    """(q_permille, estimate, target_rank) per requested quantile.
    target_rank = ceil(q_pm * n / 1000) in exact integer arithmetic
    ((q_pm*n + 999) // 1000 — shared verbatim with the SQL oracle)."""
    sk = sketch_column(ds, column, k=k)
    if sk.n == 0:
        raise ValueError("quantile_estimates: empty input")
    out = []
    for q_pm in q_pms:
        target = (int(q_pm) * sk.n + 999) // 1000
        out.append((int(q_pm), sk.rank_value(target), int(target)))
    return out
