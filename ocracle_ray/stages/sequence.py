"""Ordered event-sequence matching — the conversion funnel (CEP-lite):
how many users performed step1 -> step2 -> ... IN ORDER, where each
step must occur STRICTLY AFTER the user's earliest completion of the
previous step. The product-analytics op every event pipeline ships
(and a genuinely different operator from sessionization/as-of: the
predicate chains across rows per key).

Shape: one streaming pass per step. Step k is "per-user min ts of
``steps[k]`` events with ts > threshold_k-1(user)" — a filtered
groupby-min. The per-user threshold map from step k-1 broadcasts via
``ray.put`` (``pc.is_in``/``index_in`` probes); per-batch combiners
pre-fold the min so the driver folds O(users x blocks) partial rows
behind ``driver_grouped_agg``'s loud ceiling. At 10^12 users the same
chain runs as k hash joins + groupby-mins (the engine's join lane);
the broadcast form is the measured-small-side fast path, and the
ceiling makes the switch a loud decision, never a silent OOM.

Timestamps compare as int64 microseconds; "after" is strictly greater
(shared with the SQL oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _min_ts_by_user(ds, step: str, prev: dict[int, int] | None, *,
                    user_col: str, ts_col: str,
                    type_col: str) -> dict[int, int]:
    """Per-user min event ts (us) of ``step`` events, restricted to
    ts strictly after ``prev[user]`` when ``prev`` is given (users
    absent from ``prev`` contribute nothing)."""
    import ray

    from ..pipelines.queries import driver_grouped_agg

    if prev is not None:
        users = np.fromiter(sorted(prev), np.int64, count=len(prev))
        thr = np.asarray([prev[u] for u in users], np.int64)
        ref = ray.put((users, thr))
    else:
        ref = None

    def narrow(t: pa.Table) -> pa.Table:
        keep = pc.equal(t[type_col], step)
        f = t.filter(keep)
        ts_us = pc.cast(f[ts_col], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        uid = f[user_col].to_numpy(zero_copy_only=False)
        if ref is not None:
            from ..broadcast import cached_get

            users_b, thr_b = cached_get(ref)
            pos = np.searchsorted(users_b, uid)
            pos_c = np.clip(pos, 0, len(users_b) - 1)
            known = len(users_b) > 0
            ok = (
                (pos < len(users_b))
                & (users_b[pos_c] == uid)
                & (ts_us > thr_b[pos_c])
            ) if known else np.zeros(len(uid), bool)
            uid, ts_us = uid[ok], ts_us[ok]
        return pa.table(
            {
                "u": pa.array(uid, pa.int64()),
                "t": pa.array(ts_us, pa.int64()),
            }
        )

    out = driver_grouped_agg(
        ds.map_batches(narrow, batch_format="pyarrow"),
        ["u"],
        {"t": ("t", "min")},
    )
    return dict(zip(out["u"].astype("int64"), out["t"].astype("int64")))


def conversion_steps(ds, steps: tuple[str, ...] = ("view", "click",
                                                   "purchase"), *,
                     user_col: str = "user_id", ts_col: str = "ts",
                     type_col: str = "event_type") -> pd.DataFrame:
    """``(step_idx, step, n_users)`` — users completing each prefix of
    the ordered step chain."""
    rows = []
    prev: dict[int, int] | None = None
    for i, step in enumerate(steps, start=1):
        cur = _min_ts_by_user(ds, step, prev, user_col=user_col,
                              ts_col=ts_col, type_col=type_col)
        rows.append({"step_idx": i, "step": step, "n_users": len(cur)})
        prev = cur
    return pd.DataFrame(rows).astype(
        {"step_idx": "int64", "n_users": "int64"}
    )
