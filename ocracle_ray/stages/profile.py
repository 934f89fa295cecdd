"""Table profiling — per-column null counts and distinct counts in ONE
streaming pass (the "profile this dataset" feature of every data
tool): each batch emits one partial row PER COLUMN (null count + a KMV
distinct sketch), all columns simultaneously, so a 100 TB profile
costs one read instead of one scan per column.

Distincts use the shared KMV contract (``core.sketch``): EXACT while
true distinct < k (k = 65536 covers every sf corpus — the driver
oracle compares against COUNT(DISTINCT)), graceful estimate beyond,
8·k bytes per (column, block) partial. Null-vs-distinct parity rule:
COUNT(DISTINCT x) skips NULLs, so nulls are dropped before hashing
(the kmv_distinct_by rule)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def profile_table(ds, columns: list[str], *, k: int = 65536) -> pd.DataFrame:
    """(col_name, n_nulls, n_distinct) per column, one pass."""

    def partial(t: pa.Table) -> pa.Table:
        names, nulls, sketches = [], [], []
        for c in columns:
            arr = t[c]
            vals = arr.drop_null().to_numpy(zero_copy_only=False)
            h = np.unique(pd.util.hash_array(vals))[:k]
            names.append(c)
            nulls.append(arr.null_count)
            sketches.append(h.astype(np.uint64).tobytes())
        return pa.table(
            {
                "col_name": pa.array(names, pa.string()),
                "n_nulls": pa.array(nulls, pa.int64()),
                "sketch": pa.array(sketches, pa.large_binary()),
            }
        )

    acc_nulls: dict[str, int] = {c: 0 for c in columns}
    acc_sketch: dict[str, np.ndarray] = {
        c: np.array([], dtype=np.uint64) for c in columns
    }
    # KMV merge (union + truncate) is associative/commutative: the
    # per-block partials may arrive in any order; tree-merge at scale
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for c, n, blob in zip(
            b["col_name"].to_pylist(), b["n_nulls"].to_pylist(),
            b["sketch"].to_pylist(),
        ):
            acc_nulls[c] += int(n)
            merged = np.concatenate(
                [acc_sketch[c], np.frombuffer(blob, dtype=np.uint64)]
            )
            acc_sketch[c] = np.unique(merged)[:k]

    rows = []
    for c in columns:
        s = acc_sketch[c]
        if len(s) < k:
            nd = len(s)  # exact below k
        else:
            nd = int(round((k - 1) / (float(s[-1]) / float(1 << 64))))
        rows.append({"col_name": c, "n_nulls": acc_nulls[c], "n_distinct": nd})
    out = pd.DataFrame(rows).sort_values("col_name").reset_index(drop=True)
    return out.astype({"n_nulls": "int64", "n_distinct": "int64"})
