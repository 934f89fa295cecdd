"""Skyline (Pareto frontier) stage: dominance/tie semantics against a
brute-force reference, combiner soundness across block layouts, and the
fold guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ocracle_ray.stages.skyline import local_skyline, skyline_2d


def brute_skyline(pts):
    """O(n^2) reference: minimize x, maximize y; (x, y) ties survive."""
    out = []
    for i, (x, y) in enumerate(pts):
        dominated = any(
            bx <= x and by >= y and (bx < x or by > y)
            for j, (bx, by) in enumerate(pts) if j != i
        )
        if not dominated:
            out.append(i)
    return out


def _table(pts):
    return pa.table({
        "id": pa.array(range(len(pts)), pa.int64()),
        "x": pa.array([p[0] for p in pts], pa.int64()),
        "y": pa.array([p[1] for p in pts], pa.int64()),
    })


def _ids(t):
    return sorted(t["id"].to_pylist())


def test_local_skyline_matches_brute_force_random():
    rng = np.random.RandomState(7)
    for trial in range(20):
        pts = [tuple(map(int, rng.randint(0, 12, 2))) for _ in range(60)]
        t = _table(pts)
        got = _ids(local_skyline(t, "x", "y"))
        assert got == sorted(brute_skyline(pts)), f"trial {trial}"


def test_ties_on_both_axes_survive():
    # two identical points: neither dominates, both in the frontier
    pts = [(1, 5), (1, 5), (2, 6), (3, 6)]
    got = _ids(local_skyline(_table(pts), "x", "y"))
    # (3,6) is dominated by (2,6) (same y, smaller x); duplicates stay
    assert got == [0, 1, 2]


def test_equal_y_smaller_x_dominates():
    pts = [(1, 5), (2, 5)]
    assert _ids(local_skyline(_table(pts), "x", "y")) == [0]


def test_null_coordinates_raise():
    t = pa.table({"id": pa.array([0, 1], pa.int64()),
                  "x": pa.array([1, None], pa.int64()),
                  "y": pa.array([2, 3], pa.int64())})
    with pytest.raises(ValueError, match="null"):
        local_skyline(t, "x", "y")


def test_distributed_equals_local_across_layouts(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(13)
    pts = [tuple(map(int, rng.randint(0, 50, 2))) for _ in range(500)]
    t = _table(pts)
    want = _ids(local_skyline(t, "x", "y"))
    for parts in (1, 3, 16):
        ds = rd.from_arrow(t).repartition(parts)
        got = _ids(skyline_2d(ds, "x", "y"))
        assert got == want, f"partitions={parts}"


def test_fold_guard_trips_loud(ray_session):
    import ray.data as rd

    # an anti-chain: x and y both increase, so under (min x, max y)
    # nothing dominates anything — the corpus IS its frontier
    pts = [(i, i) for i in range(100)]
    ds = rd.from_arrow(_table(pts)).repartition(4)
    with pytest.raises(RuntimeError, match="fold exceeded"):
        skyline_2d(ds, "x", "y", fold_limit=10)
