"""stages/asof.py — boundary-carry as-of join vs naive merge_asof."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ocracle_ray.stages.asof import asof_prev_event


def _events(n_users=12, per_user=50, seed=5, tie_frac=0.0, hot_user=None, hot_n=0):
    rng = np.random.default_rng(seed)
    rows = []
    eid = 0
    for u in range(n_users):
        n = hot_n if u == hot_user else per_user
        t = np.cumsum(rng.integers(1, 50, size=n))
        if tie_frac:
            dup = rng.random(n) < tie_frac
            t[dup] = np.roll(t, 1)[dup]  # some equal timestamps
            t.sort()
        for m in t:
            rows.append(
                (eid, u, np.datetime64("2024-01-01", "us") + int(m) * 60_000_000,
                 str(rng.choice(["click", "purchase", "view", "error"])))
            )
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    return df.sample(frac=1, random_state=seed).reset_index(drop=True)


def _naive(df):
    out = []
    for u, g in df.groupby("user_id"):
        buys = g[g["event_type"] == "purchase"].sort_values(["ts", "event_id"])
        clicks = g[g["event_type"] == "click"].sort_values(["ts", "event_id"])
        for _, b in buys.iterrows():
            prior = clicks[clicks["ts"] < b["ts"]]
            if len(prior):
                out.append((b["event_id"], prior["event_id"].iloc[-1]))
    return (
        pd.DataFrame(out, columns=["event_id", "prev_click_id"])
        .astype("int64")
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def _ds(df, blocks):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(
        blocks
    )


def test_matches_naive_across_block_counts():
    df = _events()
    expect = _naive(df)
    assert len(expect) > 50  # fixture actually exercises the operator
    for blocks in (1, 4, 17):
        got = asof_prev_event(_ds(df, blocks))
        pd.testing.assert_frame_equal(got, expect)


def test_ts_ties_strictness():
    """Equal-ts click/purchase pairs: the click must NOT match its
    own-timestamp purchase, including across block boundaries (the c0
    carry is exactly for this)."""
    df = _events(seed=11, tie_frac=0.35)
    expect = _naive(df)
    got = asof_prev_event(_ds(df, 13))
    pd.testing.assert_frame_equal(got, expect)


def test_hot_user_no_guard_needed():
    """A user with 30x everyone's events — the shape the old guarded
    per-group form refused — just works."""
    df = _events(n_users=5, per_user=20, seed=7, hot_user=3, hot_n=1500)
    expect = _naive(df)
    got = asof_prev_event(_ds(df, 16))
    pd.testing.assert_frame_equal(got, expect)


def test_clickless_and_buyless_users():
    ts0 = np.datetime64("2024-01-01", "us")
    df = pd.DataFrame(
        {
            "event_id": range(6),
            "user_id": [1, 1, 1, 2, 2, 3],
            "ts": [ts0 + i * 60_000_000 for i in range(6)],
            "event_type": ["purchase", "purchase", "click",  # clicks only after
                           "click", "click",                   # no purchases
                           "purchase"],                        # clickless buyer
        }
    )
    got = asof_prev_event(_ds(df, 3))
    assert len(got) == 0  # nothing resolvable anywhere


def test_asof_to_parquet_artifact_and_summary(tmp_path):
    """Round 4: the per-purchase result streams to parquet; the
    returned summary is aggregated FROM the files and matches naive."""
    import glob

    from ocracle_ray.stages.asof import asof_to_parquet

    df = _events(n_users=8, per_user=40, seed=13)
    expect = _naive(df)
    out_dir = str(tmp_path / "asof")
    summary = asof_to_parquet(_ds(df, 7), out_dir)

    files = glob.glob(out_dir + "/*.parquet")
    assert files
    written = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    got = (
        written[["event_id", "prev_click_id"]]
        .astype("int64")
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect)

    # summary == the naive result aggregated the same way
    naive_users = df.set_index("event_id")["user_id"]
    exp_sum = (
        expect.assign(user_id=expect["event_id"].map(naive_users))
        .groupby("user_id")
        .agg(
            n_resolved=("event_id", "count"),
            sum_event_id=("event_id", "sum"),
            sum_prev_click_id=("prev_click_id", "sum"),
        )
        .reset_index()
        .astype("int64")
    )
    got_sum = (
        summary.sort_values("user_id")
        .reset_index(drop=True)[
            ["user_id", "n_resolved", "sum_event_id", "sum_prev_click_id"]
        ]
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got_sum, exp_sum)


def test_asof_string_user_keys():
    """advice r3: the scan must not coerce the user key through int();
    string user ids ride in their native dtype end to end."""
    df = _events(n_users=6, per_user=30, seed=17)
    expect = _naive(df)
    df2 = df.assign(user_id="u" + df["user_id"].astype(str))
    got = asof_prev_event(_ds(df2, 9))
    pd.testing.assert_frame_equal(got, expect)
