"""stages/quantile.py — two-pass exact grouped quantiles.

The point of the stage is that NO step ever materializes a whole
group: pass A moves only (group, bucket, count) partials and pass B's
pull size is proven from the histogram before any value is pulled.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages.quantile import grouped_exact_quantiles


def _ds(df: pd.DataFrame, blocks: int = 4):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(
        blocks
    )


def _expected(df, probs=(0.5, 0.95)):
    rows = []
    for g, sub in df.groupby("g"):
        row = {"g": g}
        for q in probs:
            row[f"p{100 * q:g}"] = float(np.percentile(sub["v"].to_numpy(), 100 * q))
        rows.append(row)
    return pd.DataFrame(rows).sort_values("g").reset_index(drop=True)


def test_matches_numpy_percentile_exactly():
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], size=5000),
            "v": np.round(rng.uniform(0, 500, size=5000), 2),
        }
    )
    got = grouped_exact_quantiles(_ds(df), "g", "v", probs=(0.5, 0.95))
    got = got.sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, _expected(df), atol=1e-12, check_dtype=False)


def test_skewed_group_and_odd_probs():
    """One group holds 90% of rows — exactly the shape that killed the
    old map_groups percentile; also exercises interpolation mid-bucket
    and quantiles whose two order stats span bucket boundaries."""
    rng = np.random.default_rng(11)
    hot = pd.DataFrame({"g": "hot", "v": np.round(rng.normal(100, 30, 9000), 2)})
    cold = pd.DataFrame({"g": "cold", "v": np.round(rng.uniform(0, 10, 1000), 2)})
    df = pd.concat([hot, cold], ignore_index=True)
    probs = (0.01, 0.25, 0.5, 0.75, 0.99)
    got = grouped_exact_quantiles(_ds(df, blocks=8), "g", "v", probs=probs)
    got = got.sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, _expected(df, probs), atol=1e-12, check_dtype=False
    )


def test_duplicate_heavy_values():
    """Heavy ties: a single value dominating a bucket must still yield
    exact order statistics."""
    df = pd.DataFrame({"g": "x", "v": [5.0] * 998 + [1.0, 9.0]})
    got = grouped_exact_quantiles(_ds(df), "g", "v", probs=(0.5,))
    assert got["p50"].iloc[0] == 5.0


def test_guard_raises_before_pulling():
    """The refine pull is bounded by max_refine_pull, proven from the
    histogram BEFORE pass B — a hot bucket fails loudly, it does not
    flood the driver."""
    df = pd.DataFrame({"g": "x", "v": np.full(5000, 3.14)})
    with pytest.raises(ValueError, match="max_refine_pull"):
        grouped_exact_quantiles(
            _ds(df), "g", "v", probs=(0.5,), max_refine_pull=100
        )


def test_nulls_dropped_like_sql():
    df = pd.DataFrame({"g": ["a"] * 4, "v": [1.0, None, 3.0, None]})
    got = grouped_exact_quantiles(_ds(df, blocks=1), "g", "v", probs=(0.5,))
    assert got["p50"].iloc[0] == 2.0


def test_null_group_key_is_its_own_group():
    """SQL GROUP BY keeps NULL as a group (null VALUES are skipped,
    null KEYS are not rows to drop)."""
    df = pd.DataFrame(
        {
            "g": ["a", "a", None, None, None, "b"],
            "v": [1.0, 3.0, 10.0, 20.0, 30.0, 5.0],
        }
    )
    got = grouped_exact_quantiles(_ds(df, blocks=2), "g", "v", probs=(0.5,))
    by_key = {
        (None if pd.isna(k) else k): v
        for k, v in zip(got["g"], got["p50"])
    }
    assert by_key["a"] == 2.0
    assert by_key["b"] == 5.0
    assert by_key[None] == 20.0
