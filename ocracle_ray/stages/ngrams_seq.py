"""Consecutive n-gram counting over a grouped total order — the
k-row generalization of the pair seam (stages/pagerank.py
``consecutive_pairs`` carries ONE row per block edge; an n-gram window
needs n−1).

Shape: one sort on (group, *order_cols) (MATERIALIZED so both passes
see identical block boundaries), then
- the WITHIN pass counts windows fully inside each block (vectorized
  group-equality over n shifted views, in-batch Arrow group_by), and
- the SEAM pass carries each block's first/last k=n−1 rows (blocks
  with ≤ 2k rows are carried WHOLE — a window can span three tiny
  blocks, which a fixed two-edge stitch would miss) tagged with the
  block's first sort key (blocks own disjoint key ranges, so ordering
  seams by it reconstructs block order without block ids). The driver
  stitches the carried stream with GAP markers at large-block
  interiors and counts ONLY windows that cross a block boundary —
  disjoint from and exhaustive with the within-pass by construction.

O(blocks·k) seam rows travel; counts fold associatively. The SQL
mirror is lag(,1)..lag(,n−1) windows over the identical total order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SEP = "\x1f"
GAP = object()


def consecutive_ngram_counts(ds, *, group_col: str,
                             order_cols: list[str], item_col: str,
                             n: int = 3) -> pd.DataFrame:
    """-> DataFrame (gram, n_occurrences); gram = items joined by
    ``SEP`` in stream order. ``(group, *order_cols)`` must be a total
    order (include a unique tiebreak column)."""
    if n < 2:
        raise ValueError("consecutive_ngram_counts: n must be >= 2")
    k = n - 1
    cols = list(dict.fromkeys([group_col, *order_cols, item_col]))
    s = (ds.select_columns(cols)
         .sort([group_col, *order_cols]).materialize())

    def within(t: pa.Table) -> pa.Table:
        m = t.num_rows
        if m < n:
            return pa.table({"gram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        g = t[group_col].to_numpy(zero_copy_only=False)
        it = np.asarray(t[item_col].to_pylist(), dtype=object)
        valid = np.ones(m - k, bool)
        for j in range(1, n):
            valid &= g[j:m - k + j] == g[:m - k]
        idx = np.flatnonzero(valid)
        if not len(idx):
            return pa.table({"gram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        grams = it[idx]
        for j in range(1, n):
            grams = grams + SEP + it[idx + j]
        u, c = np.unique(grams.astype(str), return_counts=True)
        return pa.table({"gram": pa.array(u.tolist(), pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    def seam(t: pa.Table) -> pa.Table:
        m = t.num_rows
        if m == 0:
            return pa.table({
                "g": pa.array([], t.schema.field(group_col).type),
                **{f"o{i}": pa.array([], t.schema.field(c).type)
                   for i, c in enumerate(order_cols)},
                "it": pa.array([], t.schema.field(item_col).type),
                "idx": pa.array([], pa.int64()),
                "m": pa.array([], pa.int64()),
            })
        if m <= 2 * k:
            idxs = list(range(m))
        else:
            idxs = list(range(k)) + list(range(m - k, m))
        ia = pa.array(idxs, pa.int64())
        return pa.table({
            "g": t[group_col].take(ia),
            **{f"o{i}": t[c].take(ia)
               for i, c in enumerate(order_cols)},
            "it": t[item_col].take(ia),
            "idx": pa.array(idxs, pa.int64()),
            "m": pa.array([m] * len(idxs), pa.int64()),
        })

    parts = (s.map_batches(within, batch_format="pyarrow",
                           batch_size=None).to_pandas()
             .groupby("gram", as_index=False)["cnt"].sum())

    okeys = [f"o{i}" for i in range(len(order_cols))]
    seams = s.map_batches(seam, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if len(seams):
        # blocks hold DISJOINT key ranges under the total order, so
        # sorting all carried rows by the global key makes each
        # block's rows contiguous, and a block starts exactly at its
        # idx == 0 row (every block carries its first row)
        seams = seams.sort_values(["g", *okeys, "idx"]).reset_index(
            drop=True)
        block_of = np.cumsum((seams["idx"] == 0).to_numpy()) - 1
        seams["_b"] = block_of
        # stitched stream with GAP markers inside large blocks
        stream: list = []
        for b, grp in seams.groupby("_b", sort=True):
            mm = int(grp["m"].iloc[0])
            rows = list(zip(grp["g"], grp["it"], grp["idx"]))
            if mm > 2 * k:
                for r in rows[:k]:
                    stream.append((b, r[0], r[1]))
                stream.append(GAP)
                for r in rows[k:]:
                    stream.append((b, r[0], r[1]))
            else:
                for r in rows:
                    stream.append((b, r[0], r[1]))
        extra: dict[str, int] = {}
        for i in range(len(stream) - n + 1):
            win = stream[i:i + n]
            if any(w is GAP for w in win):
                continue
            blocks = {w[0] for w in win}
            if len(blocks) < 2:
                continue  # fully inside one block: the within pass
            groups = {w[1] for w in win}
            if len(groups) > 1:
                continue
            key = SEP.join(str(w[2]) for w in win)
            extra[key] = extra.get(key, 0) + 1
        if extra:
            parts = (pd.concat([parts, pd.DataFrame(
                {"gram": list(extra), "cnt": list(extra.values())})],
                ignore_index=True)
                .groupby("gram", as_index=False)["cnt"].sum())
    return parts.sort_values(["cnt", "gram"],
                             ascending=[False, True]).reset_index(
        drop=True)
