"""Conversion funnel (stages/sequence.py): engineered event streams
pinning the strictly-after chain semantics the dense synthetic corpus
can't exercise (every sf user completes every step)."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ocracle_ray.stages.sequence import conversion_steps

T0 = pd.Timestamp("2024-01-01 00:00:00")


def _ds(rows):
    return rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([T0 + pd.Timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    }))


def test_funnel_dropoffs(ray_session):
    rows = [
        # user 1: full funnel in order
        (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
        # user 2: clicks BEFORE viewing -> stops at view
        (2, 10, "click"), (2, 20, "view"),
        # user 3: view then purchase, no click -> stops at click... er,
        # completes view only
        (3, 0, "view"), (3, 5, "purchase"),
        # user 4: never views (click+purchase only)
        (4, 0, "click"), (4, 1, "purchase"),
        # user 5: out-of-order purchase, then a VALID chain later
        (5, 0, "purchase"), (5, 10, "view"), (5, 20, "click"),
        (5, 30, "purchase"),
    ]
    out = conversion_steps(_ds(rows))
    assert list(out["step"]) == ["view", "click", "purchase"]
    # view: users 1,2,3,5; click-after-view: 1,5; purchase-after: 1,5
    assert list(out["n_users"]) == [4, 2, 2]


def test_strictly_after_excludes_equal_ts(ray_session):
    rows = [
        (1, 0, "view"), (1, 0, "click"),       # same instant: NOT after
        (2, 0, "view"), (2, 1, "click"),
    ]
    out = conversion_steps(_ds(rows), steps=("view", "click"))
    assert list(out["n_users"]) == [2, 1]


def test_earliest_previous_step_is_the_threshold(ray_session):
    # user views at t=0 and t=100; a click at t=50 counts (after the
    # EARLIEST view), even though it precedes the later view
    rows = [(1, 0, "view"), (1, 100, "view"), (1, 50, "click")]
    out = conversion_steps(_ds(rows), steps=("view", "click"))
    assert list(out["n_users"]) == [1, 1]


def test_empty_and_missing_steps(ray_session):
    out = conversion_steps(_ds([(1, 0, "view")]),
                           steps=("view", "click", "purchase"))
    assert list(out["n_users"]) == [1, 0, 0]
