"""stages/range_join.py — time-bucket range join vs a naive per-row scan."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ocracle_ray.stages.range_join import range_join_count

W = pd.Timedelta(hours=1)


def _naive(df, window=W):
    """O(n^2) reference: inclusive-both trailing-window count."""
    out = []
    for _, c in df[df["event_type"] == "click"].iterrows():
        v = df[
            (df["event_type"] == "view")
            & (df["user_id"] == c["user_id"])
            & (df["ts"] >= c["ts"] - window)
            & (df["ts"] <= c["ts"])
        ]
        out.append((c["event_id"], c["user_id"], c["ts"], len(v)))
    return (
        pd.DataFrame(out, columns=["event_id", "user_id", "ts", "n_right"])
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def _run(df, n_blocks=7, **kw):
    ds = rd.from_pandas(df).repartition(n_blocks)
    got = (
        range_join_count(ds, window=W, **kw)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got["ts"] = got["ts"].astype("datetime64[us]")
    return got


def _events(n_users=10, per_user=60, seed=11):
    rng = np.random.default_rng(seed)
    rows, eid = [], 0
    base = np.datetime64("2024-01-01", "us")
    for u in range(n_users):
        # gaps of 1..40 min: windows regularly span bucket boundaries
        t = np.cumsum(rng.integers(60, 2400, size=per_user))
        for m in t:
            rows.append(
                (eid, u, base + int(m) * 1_000_000,
                 str(rng.choice(["click", "view", "purchase", "error"])))
            )
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    return df.sample(frac=1, random_state=seed).reset_index(drop=True)


def test_matches_naive():
    df = _events()
    expect = _naive(df).rename(columns={"n_right": "n_right"})
    got = _run(df)
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_boundary_inclusive_both_ends():
    """view at exactly ts-W and exactly ts both count; one µs outside
    the window does not; bucket-boundary clicks see prior-bucket views."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    us = np.timedelta64(1, "us")
    h = np.timedelta64(1, "h")
    rows = [
        # click exactly on a bucket boundary (02:00): views in bucket 1
        (0, 1, base + 2 * h, "click"),
        (1, 1, base + 2 * h - h, "view"),        # == ts - W -> counts
        (2, 1, base + 2 * h - h - us, "view"),   # just outside -> no
        (3, 1, base + 2 * h, "view"),            # == ts -> counts
        (4, 1, base + 2 * h + us, "view"),       # after click -> no
        # same-user second click far away, zero views near it
        (5, 1, base + 30 * h, "click"),
        # other user's views never leak in
        (6, 2, base + 2 * h, "view"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    got = _run(df, n_blocks=3).set_index("event_id")["n_right"]
    assert got[0] == 2
    assert got[5] == 0
    assert set(got.index) == {0, 5}


def test_hot_user_and_zero_view_users():
    """A bot user (dense traffic, many buckets) and a user with clicks
    but no views at all — every click row must still come back."""
    rng = np.random.default_rng(3)
    base = np.datetime64("2024-01-01", "us")
    rows, eid = [], 0
    # bot: 2,000 events at ~20 s spacing (many per bucket, many buckets)
    t = np.cumsum(rng.integers(5, 40, size=2000))
    for m in t:
        rows.append((eid, 7, base + int(m) * 1_000_000,
                     "view" if eid % 3 else "click"))
        eid += 1
    # click-only user
    for m in (100, 5000, 90000):
        rows.append((eid, 8, base + m * 1_000_000, "click"))
        eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    expect = _naive(df)
    got = _run(df, n_blocks=5)
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)
    assert (got[got["user_id"] == 8]["n_right"] == 0).all()


def test_output_is_dataset_and_out_col_name():
    df = _events(n_users=3, per_user=20, seed=2)
    ds = rd.from_pandas(df).repartition(3)
    out = range_join_count(ds, window=W, out_col="n_views_1h")
    assert hasattr(out, "to_pandas")  # streams; caller decides the sink
    cols = set(out.to_pandas().columns)
    assert cols == {"event_id", "user_id", "ts", "n_views_1h"}
