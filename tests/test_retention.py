"""stages.retention — engineered-cohort semantics (the sf events corpus
is retention-degenerate: every user is active every week, so the driver
oracle only checks the dense diagonal; these fixtures pin sparse
cohorts, gaps and the guard)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages.retention import WEEK_US, retention_matrix

EPOCH = pd.Timestamp("2024-01-01")


def _events(rows):
    """rows: (user_id, week_index) — one event mid-week, plus a
    duplicate event 1h later to exercise the per-batch distinct."""
    recs = []
    for uid, w in rows:
        t0 = EPOCH + pd.Timedelta(weeks=int(w), days=2)
        recs.append({"user_id": uid, "ts": t0})
        recs.append({"user_id": uid, "ts": t0 + pd.Timedelta(hours=1)})
    return rd.from_pandas(pd.DataFrame(recs)).repartition(3)


def _reference(rows):
    base = int(EPOCH.value // 1000)  # ns -> us
    df = pd.DataFrame(rows, columns=["user_id", "w"])
    df["week"] = (base + df["w"] * WEEK_US + 2 * 86_400_000_000) // WEEK_US
    df = df.drop_duplicates(["user_id", "week"])
    cohort = df.groupby("user_id")["week"].transform("min")
    out = (
        df.assign(cohort_week=cohort, week_offset=df["week"] - cohort)
        .groupby(["cohort_week", "week_offset"])
        .size()
        .rename("n_users")
        .reset_index()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    return out.astype({"cohort_week": "int64", "week_offset": "int64",
                       "n_users": "int64"})


def test_sparse_cohorts_match_reference(ray_session):
    # cohort A (week 0): u1 retained weeks 0,1,3; u2 only week 0
    # cohort B (week 1): u3 weeks 1,2; u4 weeks 1,4
    # cohort C (week 4): u5 week 4 only
    rows = [
        (1, 0), (1, 1), (1, 3),
        (2, 0),
        (3, 1), (3, 2),
        (4, 1), (4, 4),
        (5, 4),
    ]
    got = retention_matrix(_events(rows))
    pd.testing.assert_frame_equal(got, _reference(rows))
    # offset-0 rows are the cohort sizes
    sizes = got[got["week_offset"] == 0].set_index("cohort_week")["n_users"]
    assert list(sizes) == [2, 2, 1]


def test_duplicate_events_count_once(ray_session):
    rows = [(7, 0)] * 4 + [(7, 2)]
    got = retention_matrix(_events(rows))
    assert got["n_users"].tolist() == [1, 1]
    assert got["week_offset"].tolist() == [0, 2]


def test_group_guard_fires(ray_session):
    rows = [(1, w) for w in range(6)]
    with pytest.raises(Exception, match="guarded_map_groups"):
        retention_matrix(_events(rows), max_group_rows=2)


def test_week_boundary_exact(ray_session):
    """An event at exactly a week boundary belongs to the new week
    (floor division), matching SQL epoch_us // WEEK_US."""
    df = pd.DataFrame({
        "user_id": [9, 9],
        "ts": [EPOCH, EPOCH + pd.Timedelta(weeks=1)],
    })
    got = retention_matrix(rd.from_pandas(df))
    assert got["week_offset"].tolist() == [0, 1]
    assert (got["n_users"] == 1).all()
