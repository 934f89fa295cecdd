"""Boundary-carry sessionization + parquet-streamed running sums.

The scale claims these stages make (no per-user group materialization;
segment counts bounded by block count; written artifact == verified
artifact) are asserted here on skewed fixtures the old map_groups
shapes could not survive (except via the loud guard).
"""

import glob

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages.running import running_sum_to_parquet
from ocracle_ray.stages.sessions import count_sessions, guarded_map_groups


def _events(n_users=20, per_user=60, seed=3, hot_user=None, hot_n=0):
    rng = np.random.default_rng(seed)
    rows = []
    eid = 0
    for u in range(n_users):
        n = hot_n if u == hot_user else per_user
        t = np.cumsum(rng.integers(1, 90, size=n))  # minutes, gaps up to 89
        for m in t:
            rows.append((eid, u, np.datetime64("2024-01-01", "us") + m * 60_000_000,
                         round(float(rng.uniform(0, 100)), 2)))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    return df.sample(frac=1, random_state=seed).reset_index(drop=True)  # shuffle


def _naive_sessions(df, gap_min=30):
    out = []
    for u, g in df.groupby("user_id"):
        ts = g["ts"].sort_values()
        out.append((u, int((ts.diff() > pd.Timedelta(minutes=gap_min)).sum()) + 1))
    return pd.DataFrame(out, columns=["user_id", "n_sessions"])


def _ds(df, blocks):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(
        blocks
    )


def test_sessions_match_naive_across_block_counts():
    df = _events()
    expect = _naive_sessions(df).sort_values("user_id").reset_index(drop=True)
    for blocks in (1, 3, 16):
        got = (
            count_sessions(_ds(df, blocks), "user_id", "ts")
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_sessions_survive_hot_user_that_guard_rejects():
    """One user dominates the corpus. The boundary-carry shape handles
    it (per-block memory only); the OLD per-group shape, run under the
    guard at the same bound, refuses — demonstrating exactly the
    assumption the rework removed."""
    df = _events(n_users=5, per_user=20, hot_user=2, hot_n=3000)
    expect = _naive_sessions(df).sort_values("user_id").reset_index(drop=True)
    got = (
        count_sessions(_ds(df, 12), "user_id", "ts")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)

    def old_shape(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values()
        return pd.DataFrame(
            {"user_id": [g["user_id"].iloc[0]],
             "n_sessions": [int((ts.diff() > pd.Timedelta(minutes=30)).sum()) + 1]}
        )

    with pytest.raises(Exception, match="max_group_rows"):
        guarded_map_groups(
            _ds(df, 12), "user_id", old_shape, max_group_rows=1000
        ).to_pandas()


def test_sessions_exact_gap_boundary_merges():
    """A gap of exactly 30 min does NOT start a new session (strictly
    greater), including across a block boundary."""
    ts0 = np.datetime64("2024-01-01", "us")
    df = pd.DataFrame(
        {
            "event_id": range(4),
            "user_id": [1, 1, 1, 1],
            "ts": [ts0, ts0 + 30 * 60_000_000, ts0 + 60 * 60_000_000,
                   ts0 + 60 * 60_000_000 + 30 * 60_000_000 + 1],
        }
    )
    got = count_sessions(_ds(df, 2), "user_id", "ts").to_pandas()
    assert got["n_sessions"].iloc[0] == 2  # only the +1us gap splits


def _naive_running_summary(df):
    out = []
    for u, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        cents = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        run = np.cumsum(cents)
        out.append((u, len(g), int(run.sum())))
    return pd.DataFrame(out, columns=["user_id", "n_events", "total_running_cents"])


def test_running_sum_summary_and_artifact(tmp_path):
    df = _events(n_users=8, per_user=40)
    out_dir = str(tmp_path / "run")
    got = running_sum_to_parquet(_ds(df, 6), out_dir)
    got = got.sort_values("user_id").reset_index(drop=True)
    expect = _naive_running_summary(df)
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)

    # the artifact is real partitioned parquet with one row per event
    files = glob.glob(out_dir + "/*.parquet")
    assert files
    written = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    assert len(written) == len(df)
    # spot-check one user's final running value == their exact total
    u = df["user_id"].iloc[0]
    sub = df[df["user_id"] == u]
    total = int(np.rint(sub["value"].to_numpy() * 100).sum())
    assert written[written["user_id"] == u]["running_cents"].max() == total


def test_running_sum_parallelism_invariant(tmp_path):
    df = _events(n_users=6, per_user=30, seed=9)
    a = running_sum_to_parquet(_ds(df, 1), str(tmp_path / "a"))
    b = running_sum_to_parquet(_ds(df, 13), str(tmp_path / "b"))
    pd.testing.assert_frame_equal(
        a.sort_values("user_id").reset_index(drop=True),
        b.sort_values("user_id").reset_index(drop=True),
    )


def test_running_sum_rejects_null_values(tmp_path):
    """NaN values must fail the exactness guard loudly (NaN > tol is
    False, so a '> tol' guard would let NaN slip into INT64_MIN cents)."""
    df = pd.DataFrame(
        {
            "event_id": [1, 2],
            "user_id": [1, 1],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
            "value": [1.0, None],
        }
    )
    with pytest.raises(Exception, match="scale"):
        running_sum_to_parquet(_ds(df, 1), str(tmp_path / "n"))


def test_running_sum_rejects_inexact_scale(tmp_path):
    df = pd.DataFrame(
        {
            "event_id": [1, 2],
            "user_id": [1, 1],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
            "value": [0.001, 0.002],  # 3 decimals: not exact at scale=100
        }
    )
    with pytest.raises(Exception, match="scale"):
        running_sum_to_parquet(_ds(df, 1), str(tmp_path / "c"))
