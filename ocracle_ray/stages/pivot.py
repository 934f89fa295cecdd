"""Crosstab / pivot: long (time, key, value) events to a WIDE table
with one column pair per key — the reporting reshape every analytics
pipeline runs (SQL ``PIVOT`` / pandas ``crosstab``).

Scale shape: the key domain must be small and KNOWN (a pivot with an
unbounded key domain is a different op — its output schema would be
data-dependent, which neither Arrow nor a downstream consumer can
plan around). So the caller passes ``expected_keys``; an observed key
outside the domain raises LOUD (schema stability is the contract, a
silent drop would hide upstream corruption). The aggregation itself
is the cheap part: ONE streaming pass emits per-batch in-Arrow-grouped
(bucket, key) partials — ``n`` row counts plus integer-cent sums (the
stages/running.py exactness rule, so the wide sums are bit-exact vs
SQL with no float-summation-order caveat) — and the driver folds only
``n_buckets x n_keys`` aggregate rows (guarded by driver_grouped_agg).
The pivot reshape then happens on that aggregate, never on raw rows.

At 100 TB nothing changes: partials stay mergeable/associative
(tree-fold shape), the wide result is calendar-sized, and the value
columns are int64 cents end to end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .running import _cents


def pivot_counts(
    ds,
    *,
    time_col: str,
    key_col: str,
    value_col: str,
    expected_keys: list[str],
    unit: str = "day",
) -> pd.DataFrame:
    """Wide crosstab: one row per truncated ``time_col`` bucket, one
    ``n_<key>`` (row count) and ``cents_<key>`` (int64 cent sum)
    column per expected key. Keys absent from a bucket fill 0/0."""
    from ..pipelines.queries import driver_grouped_agg

    expected = sorted(expected_keys)
    expected_set = set(expected)

    def partial(t: pa.Table) -> pa.Table:
        bucket = pc.floor_temporal(t[time_col], unit=unit)
        cents = _cents(t[value_col].to_numpy(zero_copy_only=False), 100)
        g = (
            pa.table(
                {
                    "bucket": bucket,
                    "key": t[key_col],
                    "cents": pa.array(cents, pa.int64()),
                }
            )
            .group_by(["bucket", "key"])
            .aggregate([("cents", "sum"),
                        ("cents", "count", pc.CountOptions(mode="all"))])
        )
        return g.rename_columns(["bucket", "key", "cents", "n"])

    agg = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["bucket", "key"],
        {"cents": ("cents", "sum"), "n": ("n", "sum")},
    )
    seen = set(agg["key"])
    if not seen <= expected_set:
        raise ValueError(
            f"pivot_counts: observed keys outside the declared domain: "
            f"{sorted(seen - expected_set)!r} — a pivot's output schema "
            f"is part of its contract; widen expected_keys explicitly"
        )

    buckets = sorted(agg["bucket"].unique())
    out = pd.DataFrame({"bucket": pd.Series(buckets, dtype="datetime64[us]")})
    by_key = {k: g.set_index("bucket") for k, g in agg.groupby("key")}
    for k in expected:
        g = by_key.get(k)
        if g is None:
            out[f"n_{k}"] = np.zeros(len(out), np.int64)
            out[f"cents_{k}"] = np.zeros(len(out), np.int64)
            continue
        out[f"n_{k}"] = (
            g["n"].reindex(buckets).fillna(0).astype("int64").to_numpy()
        )
        out[f"cents_{k}"] = (
            g["cents"].reindex(buckets).fillna(0).astype("int64").to_numpy()
        )
    return out.sort_values("bucket").reset_index(drop=True)
