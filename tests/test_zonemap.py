"""Zone-map data skipping (stages/zonemap.py): pruning PROVED by
corrupting every non-overlapping file, residual-filter exactness at
the range edges, and the foreign-directory marker guard."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages.zonemap import (build_time_partitioned,
                                        pruned_paths, range_aggregate)


def _events(n=2000, seed=3):
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 20 * 86_400_000_000, n).astype(
        "timedelta64[us]")
    return pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(rng.choice(["a", "b"], n), pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 50, n), 2), pa.float64()),
    })


LO, HI = "2024-01-05T06:00:00", "2024-01-08T18:00:00"


@pytest.fixture()
def store(tmp_path, ray_session):
    t = _events()
    d = str(tmp_path / "store")
    build_time_partitioned(rd.from_arrow(t).repartition(4), d)
    return d, t


def _reference(t, lo, hi):
    df = t.to_pandas()
    m = (df["ts"] >= pd.Timestamp(lo)) & (df["ts"] < pd.Timestamp(hi))
    g = df[m].copy()
    g["cents"] = np.rint(g["value"] * 100).astype("int64")
    out = g.groupby("event_type", as_index=False).agg(
        n_events=("cents", "size"), cents=("cents", "sum"))
    return out.sort_values("event_type").reset_index(drop=True)


def test_range_aggregate_exact_with_edge_residuals(store):
    d, t = store
    got = range_aggregate(d, LO, HI)
    ref = _reference(t, LO, HI)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_pruning_proved_by_corrupting_skipped_files(store):
    d, t = store
    keep, total = pruned_paths(d, LO, HI)
    assert 0 < len(keep) < total  # pruning is real
    keep_set = set(keep)
    for root, _dirs, files in os.walk(d):
        for f in files:
            p = os.path.join(root, f)
            if p.endswith(".parquet") and p not in keep_set:
                with open(p, "wb") as fh:
                    fh.write(b"corrupted")  # skipped file: never opened
    got = range_aggregate(d, LO, HI)
    pd.testing.assert_frame_equal(got, _reference(t, LO, HI),
                                  check_dtype=False)


def test_empty_range_reads_nothing(store):
    d, _t = store
    keep, _ = pruned_paths(d, "2030-01-01T00:00:00", "2030-01-02T00:00:00")
    assert keep == []
    out = range_aggregate(d, "2030-01-01T00:00:00", "2030-01-02T00:00:00")
    assert len(out) == 0


def test_marker_guard_refuses_foreign_dir(tmp_path, ray_session):
    d = str(tmp_path / "foreign")
    os.makedirs(d)
    with open(os.path.join(d, "precious.txt"), "w") as f:
        f.write("not ours")
    with pytest.raises(ValueError, match="refusing to delete"):
        build_time_partitioned(rd.from_arrow(_events(50)), d)


# ------------------------------------------------------------- Z-order


def _box_reference(t, ts_lo, ts_hi, key_lo, key_hi):
    df = t.to_pandas()
    m = ((df["ts"] >= pd.Timestamp(ts_lo)) & (df["ts"] < pd.Timestamp(ts_hi))
         & (df["user_id"] >= key_lo) & (df["user_id"] < key_hi))
    g = df[m].copy()
    g["cents"] = np.rint(g["value"] * 100).astype("int64")
    out = g.groupby("event_type", as_index=False).agg(
        n_events=("cents", "size"), cents=("cents", "sum"))
    return out.sort_values("event_type").reset_index(drop=True)


def _events_2d(n=4000, seed=7):
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    t = _events(n, seed).to_pandas()
    t["user_id"] = rng.integers(0, 400, n)
    t["ts"] = base + rng.integers(0, 16 * 86_400_000_000, n).astype(
        "timedelta64[us]")
    return pa.Table.from_pandas(t, preserve_index=False)


BOX = dict(ts_lo="2024-01-04T00:00:00", ts_hi="2024-01-08T00:00:00",
           key_lo=50, key_hi=150)


def test_zorder_box_aggregate_and_two_axis_pruning(tmp_path, ray_session):
    from ocracle_ray.stages.zonemap import (box_aggregate, build_zordered,
                                            pruned_paths_box)

    t = _events_2d()
    d = str(tmp_path / "zstore")
    build_zordered(rd.from_arrow(t).repartition(4), d,
                   target_rows_per_file=256)
    got = box_aggregate(d, **BOX)
    pd.testing.assert_frame_equal(
        got, _box_reference(t, **BOX), check_dtype=False)

    both, total = pruned_paths_box(
        d, {"ts": (BOX["ts_lo"], BOX["ts_hi"]),
            "user_id": (BOX["key_lo"], BOX["key_hi"])})
    ts_only, _ = pruned_paths_box(d, {"ts": (BOX["ts_lo"], BOX["ts_hi"])})
    # the user dimension prunes files the time dimension alone admits —
    # the whole point of the Z layout
    assert len(both) < len(ts_only) <= total
    assert len(both) > 0

    # corruption proof: files outside the box are never opened
    keep = set(both)
    for root, _dirs, files in os.walk(d):
        for f in files:
            p = os.path.join(root, f)
            if p.endswith(".parquet") and p not in keep:
                with open(p, "wb") as fh:
                    fh.write(b"corrupted")
    pd.testing.assert_frame_equal(
        box_aggregate(d, **BOX), _box_reference(t, **BOX),
        check_dtype=False)


def test_morton_interleave_locality():
    from ocracle_ray.stages.zonemap import morton2

    a = np.array([0, 1, 0, 0xFFFF], np.int64)
    b = np.array([0, 0, 1, 0xFFFF], np.int64)
    z = morton2(a, b)
    assert list(z[:3]) == [0, 1, 2]  # bit interleave: a even, b odd
    assert z[3] == (1 << 32) - 1
    # clamp beyond 16 bits is locality-only (documented)
    assert morton2(np.array([0x1_0000]), np.array([0]))[0] == 0
