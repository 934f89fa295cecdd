"""stages.prefix — global prefix sum vs numpy, across block layouts."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ocracle_ray.stages.prefix import global_prefix_sum


def _ds(vals, keys=None, parts=4):
    df = pd.DataFrame({
        "k": keys if keys is not None else np.arange(len(vals)),
        "v": np.asarray(vals, np.int64),
    })
    return rd.from_pandas(df).repartition(parts)


def test_ascending_matches_numpy(ray_session):
    rng = np.random.RandomState(0)
    vals = rng.randint(-50, 1000, 300).astype(np.int64)
    ds, total = global_prefix_sum(
        _ds(vals), order_cols=[("k", "ascending")], val_col="v")
    out = ds.to_pandas().sort_values("k")
    np.testing.assert_array_equal(out["cum"].to_numpy(), np.cumsum(vals))
    assert total == int(vals.sum())


def test_descending_with_tiebreak(ray_session):
    vals = np.array([5, 5, 3, 9, 5, 1], np.int64)
    ds, total = global_prefix_sum(
        _ds(vals, parts=3),
        order_cols=[("v", "descending"), ("k", "ascending")],
        val_col="v")
    out = ds.to_pandas()
    order = sorted(range(6), key=lambda i: (-vals[i], i))
    want = np.cumsum(vals[order])
    got = out.sort_values(["v", "k"], ascending=[False, True])["cum"]
    np.testing.assert_array_equal(got.to_numpy(), want)
    assert total == 28


@pytest.mark.parametrize("parts", [1, 2, 7, 13])
def test_block_layout_independent(ray_session, parts):
    rng = np.random.RandomState(parts)
    vals = rng.randint(0, 100, 120).astype(np.int64)
    ds, total = global_prefix_sum(
        _ds(vals, parts=parts), order_cols=[("k", "ascending")],
        val_col="v")
    out = ds.to_pandas().sort_values("k")
    np.testing.assert_array_equal(out["cum"].to_numpy(), np.cumsum(vals))
