"""QuantileSketch (core/sketch.py) + stages/qsketch.py: determinism,
merge algebra, realized error, and the null/NaN contract."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.core.sketch import QuantileSketch
from ocracle_ray.stages.qsketch import quantile_estimates, sketch_column


def _err(sk, data, q_pm):
    target = (q_pm * sk.n + 999) // 1000
    est = sk.rank_value(target)
    true_rank = int((np.sort(data) <= est).sum())
    return abs(true_rank - target) / sk.n


def test_sketch_deterministic_and_accurate():
    rng = np.random.default_rng(3)
    data = rng.exponential(10.0, 30000)
    sks = []
    for _ in range(2):
        sk = QuantileSketch(512)
        for i in range(0, len(data), 777):
            sk.add(data[i:i + 777])
        sks.append(sk)
    # identical fold order -> bit-identical levels (no randomness)
    assert sks[0].n == sks[1].n == len(data)
    for a, b in zip(sks[0].levels, sks[1].levels):
        np.testing.assert_array_equal(a, b)
    for q_pm in (10, 100, 500, 900, 990):
        assert _err(sks[0], data, q_pm) <= 0.01, q_pm
    # sketch is actually small
    assert sum(len(l) for l in sks[0].levels) <= 512 * len(sks[0].levels)


def test_sketch_merge_stays_within_bound():
    rng = np.random.default_rng(11)
    parts = [rng.normal(50, 9, 4000), rng.normal(80, 2, 4000),
             rng.uniform(0, 200, 4000)]
    merged = QuantileSketch(512)
    for p in parts:
        merged.merge(QuantileSketch(512).add(p))
    data = np.concatenate(parts)
    assert merged.n == len(data)
    for q_pm in (100, 250, 500, 750, 900):
        assert _err(merged, data, q_pm) <= 0.01, q_pm


def test_sketch_exact_below_k():
    data = np.arange(100, dtype=np.float64)
    sk = QuantileSketch(512).add(data)
    # nothing compacted: every rank is exact
    assert sk.rank_value(1) == 0.0
    assert sk.rank_value(50) == 49.0
    assert sk.rank_value(100) == 99.0


def test_sketch_nan_raises_and_mismatched_k():
    with pytest.raises(ValueError, match="non-finite"):
        QuantileSketch(512).add(np.array([1.0, np.nan]))
    with pytest.raises(ValueError, match="mismatched k"):
        QuantileSketch(64).merge(QuantileSketch(128).add(np.ones(4)))


def test_stage_fold_handles_nulls_and_matches_bound(ray_session):
    rng = np.random.default_rng(5)
    vals = rng.uniform(0, 1000, 5000)
    col = pa.array(list(vals) + [None, None], pa.float64())
    ds = rd.from_arrow(pa.table({"value": col})).repartition(5)
    sk = sketch_column(ds, "value", k=512)
    assert sk.n == len(vals)  # nulls dropped, not sketched
    ests = quantile_estimates(ds, "value", [500])
    q_pm, est, target = ests[0]
    true_rank = int((np.sort(vals) <= est).sum())
    assert abs(true_rank - target) * 100 <= sk.n
