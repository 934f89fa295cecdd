"""Distributed tie-aware Spearman (stages/spearman.py) vs a
pure-Python reference — heavy-tie corpora over many tiny blocks so
tie runs cross block boundaries (the seam-correction path), plus the
monotone ±1 anchors."""

import numpy as np
import pyarrow as pa
import pytest

from ocracle_ray.stages.spearman import (
    grouped_spearman_stats,
    spearman_rho,
)


def _ref_rho(vals, xs):
    """Pure-Python Spearman with average ranks."""
    def avg_ranks(a):
        order = sorted(range(len(a)), key=lambda i: a[i])
        ranks = [0.0] * len(a)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and a[order[j]] == a[order[i]]:
                j += 1
            r = (i + 1 + j) / 2.0  # average of ranks i+1..j
            for k in range(i, j):
                ranks[order[k]] = r
            i = j
        return ranks

    ra, rb = avg_ranks(vals), avg_ranks(xs)
    n = len(vals)
    ma, mb = sum(ra) / n, sum(rb) / n
    num = sum((p - ma) * (q - mb) for p, q in zip(ra, rb))
    den = (sum((p - ma) ** 2 for p in ra)
           * sum((q - mb) ** 2 for q in rb)) ** 0.5
    return round(num / den, 6)


def _run(groups, vals, xs, n_blocks):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "g": groups,
        "v": pa.array(vals, pa.int64()),
        "x": pa.array(xs, pa.int64()),
        "uid": pa.array(range(len(vals)), pa.int64()),
    })).repartition(n_blocks)
    stats = grouped_spearman_stats(
        ds, group_col="g", val_col="v", x_col="x", uid_col="uid")
    return {g: (n, rho) for g, n, rho in spearman_rho(stats)}


def test_heavy_ties_across_tiny_blocks(ray_session):
    # values from a 4-symbol domain over 97 rows in 12 blocks: nearly
    # every tie run crosses a boundary, so the correction path is the
    # common case, not the exception
    rng = np.random.RandomState(7)
    n = 97
    groups = [("a", "b")[i % 2] for i in range(n)]
    vals = rng.randint(0, 4, n).tolist()
    xs = rng.randint(0, 3, n).tolist()
    got = _run(groups, vals, xs, 12)
    for g in ("a", "b"):
        sel = [i for i in range(n) if groups[i] == g]
        ref = _ref_rho([vals[i] for i in sel], [xs[i] for i in sel])
        assert got[g][0] == len(sel)
        assert got[g][1] == pytest.approx(ref, abs=1e-9), g


def test_monotone_anchors(ray_session):
    # tie-free both sides: any monotone map gives exactly ±1
    n = 40
    vals = list(range(n))
    got = _run(["g"] * n, vals, [v * v for v in vals], 7)
    assert got["g"] == (n, 1.0)
    got = _run(["g"] * n, vals, [(n - v) * 3 for v in vals], 7)
    assert got["g"][1] == -1.0
    # ties on one side only: NOT ±1 — must still equal the reference
    xs = [v // 3 for v in vals]
    got = _run(["g"] * n, vals, xs, 7)
    assert got["g"][1] == pytest.approx(_ref_rho(vals, xs), abs=1e-9)


def test_single_giant_tie_run_spanning_all_blocks(ray_session):
    # one value for a whole group: every block is a whole-block edge
    # run; rho is NaN (zero variance) and the rank-sum invariant holds
    n = 30
    groups = ["c"] * n + ["d"] * n
    vals = [5] * n + list(range(n))
    xs = list(range(n)) + list(range(n))
    got = _run(groups, vals, xs, 10)
    assert got["c"][0] == n and np.isnan(got["c"][1])
    assert got["d"] == (n, 1.0)
