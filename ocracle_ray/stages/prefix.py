"""Global prefix scan over a sorted Dataset — the distributed
cumulative-sum primitive behind ranked cumulative-share analytics
(Pareto/ABC analysis, cumulative market share, "how many keys cover
80% of volume").

Shape (the stages/watermark.py boundary carry, with SUM instead of
MAX): sort (the one all-to-all), MATERIALIZE so both passes see the
same block boundaries, pass 1 folds per-block ``(first_key…, total)``
rows on the driver (O(blocks), loud-guarded), the exclusive prefix
over block totals broadcasts as a dict, pass 2 adds
``np.cumsum + carry`` per block. Values are int64 (cents/ppm — the
stages/running.py exact-integer rule); overflow would need 2^63 cents
≈ 9e16 dollars, loudly out of scope.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BLOCK_INFO_LIMIT = 1_000_000


def global_prefix_sum(ds, *, order_cols: list[tuple[str, str]],
                      val_col: str, out_col: str = "cum"):
    """Sort by ``order_cols`` ([(col, 'ascending'|'descending')...])
    and append ``out_col`` = inclusive prefix sum of int64 ``val_col``
    in that global order. Returns (sorted+scanned Dataset, total)."""
    import ray

    from ..broadcast import cached_get

    keys = [c for c, _ in order_cols]
    s = ds.sort(keys, descending=[d == "descending"
                                  for _, d in order_cols]).materialize()

    def block_info(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {f"k{i}": pa.array([], t[c].type)
                    for i, c in enumerate(keys)}
            cols["total"] = pa.array([], pa.int64())
            return pa.table(cols)
        cols = {f"k{i}": t[c].slice(0, 1) for i, c in enumerate(keys)}
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols["total"] = pa.array([int(v.sum())], pa.int64())
        return pa.table(cols)

    info = s.map_batches(block_info, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    if len(info) > BLOCK_INFO_LIMIT:
        raise RuntimeError(
            f"global_prefix_sum: {len(info)} block-info rows exceed "
            f"{BLOCK_INFO_LIMIT} — repartition coarser first")
    asc = [d != "descending" for _, d in order_cols]
    info = info.sort_values([f"k{i}" for i in range(len(keys))],
                            ascending=asc).reset_index(drop=True)
    totals = info["total"].to_numpy(np.int64)
    carry = np.concatenate(([0], np.cumsum(totals)[:-1]))
    carry_map = {tuple(info.loc[i, f"k{j}"] for j in range(len(keys))):
                 int(carry[i]) for i in range(len(info))}
    grand_total = int(totals.sum())
    ref = ray.put(carry_map)

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        cm = cached_get(ref)
        key = tuple(t[c][0].as_py() for c in keys)
        c0 = cm[key]
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            out_col, pa.array(np.cumsum(v) + c0, pa.int64()))

    return (s.map_batches(scan, batch_format="pyarrow",
                          batch_size=None), grand_total)
