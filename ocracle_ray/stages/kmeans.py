"""Distributed Lloyd k-means over an embedding column — the trainer
behind the IVF index and SemDeDup, which until now was a TRUSTED step
in their artifact oracles ("only the k-means map is trusted"). This
operator closes that caveat: every Lloyd iteration is re-executed by a
generated DuckDB oracle, so the assignment map itself is verified.

Float-parity design (the stages/nbayes.py round-before-argmax rule,
applied twice per iteration):
- squared distances round to 6 decimals BEFORE the argmin (ties take
  the lowest cell) — numpy's pairwise summation and SQL's sequential
  ``list_sum`` differ by ~1e-12 relative, far inside the rounding
  boundary, so the assignment cannot flip between engines;
- new centroids round every coordinate to 6 decimals AFTER the mean —
  partial-sum order (driver fold vs SQL aggregate) becomes invisible,
  and the NEXT iteration starts from bit-identical centroids on both
  sides. Initial centroids = the k smallest vec_ids' vectors, rounded
  the same way. Embeddings cast f32→DOUBLE before any arithmetic (the
  repo-wide embeddings rule). Empty cells keep their previous centroid
  (coalesced identically in SQL).

Scale shape: centroids broadcast per iteration (ray.put +
cached_get); each batch emits per-cell (count, per-dim sum) partials
— k×(dim+1) numbers, never vectors — folded by driver_grouped_agg.
One streaming pass per iteration, zero shuffle; k·dim driver state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..broadcast import cached_get
from ..core.textstats import round_half_away


def _stack(col) -> np.ndarray:
    return np.stack([np.asarray(v, np.float64)
                     for v in col.to_pylist()]).astype(np.float64)


def lloyd_kmeans(ds, *, k: int = 8, n_iters: int = 4,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
    """Returns (centroids ndarray [k, dim] — rounded per the parity
    rule, counts ndarray [k] from the final assignment pass)."""
    import ray

    from ..pipelines.queries import driver_grouped_agg

    init = ds.sort(id_col).limit(k).to_pandas()
    cents = round_half_away(_stack(pa.array(init[vec_col])), 6)
    dim = cents.shape[1]

    sum_cols = [f"s{i}" for i in range(dim)]

    def assign_counts(cents_ref):
        def fn(t: pa.Table) -> pa.Table:
            c = cached_get(cents_ref)
            v = _stack(t[vec_col])
            d2 = ((v[:, None, :] - c[None, :, :]) ** 2).sum(axis=-1)
            cell = np.argmin(round_half_away(d2, 6), axis=1)
            cols = {"cell": pa.array(cell.astype(np.int64)),
                    "n": pa.array(np.ones(len(v), np.int64))}
            for i, name in enumerate(sum_cols):
                cols[name] = pa.array(v[:, i], pa.float64())
            return pa.table(cols)
        return fn

    for _ in range(n_iters):
        ref = ray.put(cents)
        agg = driver_grouped_agg(
            ds.map_batches(assign_counts(ref), batch_format="pyarrow"),
            ["cell"],
            {"n": ("n", "sum"), **{s: (s, "sum") for s in sum_cols}},
        ).set_index("cell")
        new = cents.copy()  # empty cells keep their previous centroid
        for cell in agg.index:
            n = int(agg.loc[cell, "n"])
            new[int(cell)] = round_half_away(
                agg.loc[cell, sum_cols].to_numpy(np.float64) / n, 6)
        cents = new

    ref = ray.put(cents)
    final = driver_grouped_agg(
        ds.map_batches(assign_counts(ref), batch_format="pyarrow"),
        ["cell"], {"n": ("n", "sum")},
    ).set_index("cell")
    counts = np.zeros(k, np.int64)
    for cell in final.index:
        counts[int(cell)] = int(final.loc[cell, "n"])
    return cents, counts


def kmeans_cells(ds, **kwargs) -> pd.DataFrame:
    """(cell, n_vecs, c_norm2) per cell — the driver-row summary; the
    norm is over the ROUNDED centroid so both sides square identical
    numbers."""
    cents, counts = lloyd_kmeans(ds, **kwargs)
    norm2 = round_half_away((cents ** 2).sum(axis=1), 4)
    out = pd.DataFrame({
        "cell": np.arange(len(counts), dtype=np.int64),
        "n_vecs": counts.astype(np.int64),
        "c_norm2": norm2,
    })
    return out


def kmeans_oracle_sql(k: int, n_iters: int, dim: int) -> str:
    """Generated unrolled Lloyd mirror: assignment (round-6 squared
    distance, lowest-cell ties), per-dim mean (round 6), empty-cell
    coalesce — every iteration re-executed relationally."""

    def assign(prev: str, name: str) -> str:
        return f"""
        {name} AS (
            SELECT vec_id, v, cell FROM (
                SELECT e.vec_id, e.v, c.cell,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY round(list_sum(list_transform(
                               range(1, {dim + 1}),
                               i -> (e.v[i] - c.v[i])
                                    * (e.v[i] - c.v[i]))), 6),
                               c.cell) AS rn
                FROM emb e CROSS JOIN {prev} c
            ) WHERE rn = 1
        )"""

    def update(asg: str, prev: str, name: str) -> str:
        return f"""
        {name}_sums AS (
            SELECT cell, i, sum(x) AS sx, count(*) AS n FROM (
                SELECT cell, unnest(v) AS x,
                       unnest(range(1, len(v) + 1)) AS i
                FROM {asg}
            ) GROUP BY cell, i
        ),
        {name}_new AS (
            SELECT cell, list(round(sx / n, 6) ORDER BY i) AS v
            FROM {name}_sums GROUP BY cell
        ),
        {name} AS (  -- empty cells keep the previous centroid
            SELECT p.cell, coalesce(u.v, p.v) AS v
            FROM {prev} p LEFT JOIN {name}_new u ON u.cell = p.cell
        )"""

    parts = []
    prev = "c0"
    for it in range(1, n_iters + 1):
        parts.append(assign(prev, f"a{it}"))
        parts.append(update(f"a{it}", prev, f"c{it}"))
        prev = f"c{it}"
    parts.append(assign(prev, "afinal"))
    body = ",".join(parts)
    return f"""
        WITH emb AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        c0 AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                   list_transform(v, x -> round(x, 6)) AS v
            FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT {k})
        ),
        {body},
        counts AS (SELECT cell, count(*)::BIGINT AS n_vecs
                   FROM afinal GROUP BY cell)
        SELECT c.cell::BIGINT AS cell,
               coalesce(n.n_vecs, 0)::BIGINT AS n_vecs,
               round(list_sum(list_transform(c.v, x -> x * x)), 4)
                   AS c_norm2
        FROM {prev} c LEFT JOIN counts n ON n.cell = c.cell
        ORDER BY c.cell
    """
