"""Cohort retention matrix over an event stream — the product-analytics
aggregate every warehouse runs (users bucketed by first-seen week, then
"what fraction came back k weeks later").

Scale shape (the count_sessions doctrine, stages/sessions.py):

1. Per-batch Arrow combiner: distinct ``(user, week)`` pairs — the
   stream entering the one shuffle is bounded by ``users x weeks``, not
   by event count (a bot with 10^8 events in a week contributes ONE
   pair per batch it appears in).
2. ``groupby(user).map_groups``: a user's group holds at most
   ``blocks_touched x distinct_weeks`` rows — distinct weeks are
   calendar-bounded (a 10-year corpus is ~520), so the group is small
   at ANY event skew; ``guarded_map_groups`` still makes the
   assumption loud rather than hoped.  Each group emits one
   ``(cohort_week, week_offset)`` row per distinct active week, i.e.
   exactly one row per user per matrix cell.
3. The matrix itself is ``weeks^2 / 2`` cells — driver-foldable by
   construction (``driver_grouped_agg``, guarded at 2M partial rows).

No join anywhere: the cohort lookup that a SQL formulation expresses as
``uw JOIN (SELECT user, min(week)...)`` happens inside the per-user
group, where the min is local.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sessions import guarded_map_groups

WEEK_US = 7 * 86_400 * 1_000_000


def user_week_pairs(ds, user_col: str = "user_id", ts_col: str = "ts",
                    *, week_us: int = WEEK_US):
    """Per-batch-distinct ``(user_col, week)`` pairs; ``week`` is the
    floored epoch-microsecond week index (int64), matching SQL
    ``epoch_us(ts) // week_us`` for the post-1970 timestamps this
    engine ingests."""

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({user_col: pa.array([], pa.int64()),
                             "week": pa.array([], pa.int64())})
        ts = (t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        pairs = pa.table({user_col: t[user_col],
                          "week": pa.array(ts // week_us, pa.int64())})
        return pairs.group_by([user_col, "week"]).aggregate([])

    return ds.map_batches(combine, batch_format="pyarrow")


def retention_matrix(ds, user_col: str = "user_id", ts_col: str = "ts",
                     *, week_us: int = WEEK_US,
                     max_group_rows: int = 100_000) -> pd.DataFrame:
    """``(cohort_week, week_offset, n_users)`` sorted by (cohort,
    offset): n_users = distinct users first seen in ``cohort_week``
    that were active ``week_offset`` weeks later (offset 0 row = cohort
    size)."""
    from ..pipelines.queries import driver_grouped_agg

    pairs = user_week_pairs(ds, user_col, ts_col, week_us=week_us)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        w = np.unique(g["week"].to_numpy())  # sorted + cross-block dedup
        return pd.DataFrame({"cohort_week": np.full(len(w), w[0]),
                             "week_offset": w - w[0]})

    cells = guarded_map_groups(pairs, user_col, per_user,
                               max_group_rows=max_group_rows)

    def cell_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cohort_week" not in t.column_names:
            return pa.table({"cohort_week": pa.array([], pa.int64()),
                             "week_offset": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        g = t.group_by(["cohort_week", "week_offset"]).aggregate(
            [("cohort_week", "count")])
        return g.rename_columns(["cohort_week", "week_offset", "n"])

    agg = driver_grouped_agg(
        cells.map_batches(cell_counts, batch_format="pyarrow"),
        ["cohort_week", "week_offset"], {"n_users": ("n", "sum")},
    )
    if agg.empty:
        return pd.DataFrame(columns=["cohort_week", "week_offset",
                                     "n_users"])
    agg["n_users"] = agg["n_users"].astype("int64")
    agg["cohort_week"] = agg["cohort_week"].astype("int64")
    agg["week_offset"] = agg["week_offset"].astype("int64")
    return agg.sort_values(["cohort_week", "week_offset"]).reset_index(
        drop=True)
