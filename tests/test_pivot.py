"""Crosstab pivot (stages/pivot.py): wide-schema contract, zero-fill
for absent (bucket, key) cells, and the declared-domain guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages.pivot import pivot_counts


def _ds(rows):
    return rd.from_arrow(pa.table({
        "ts": pa.array([pd.Timestamp(r[0]) for r in rows],
                       pa.timestamp("us")),
        "k": pa.array([r[1] for r in rows], pa.string()),
        "v": pa.array([r[2] for r in rows], pa.float64()),
    })).repartition(3)


def test_pivot_wide_and_zero_fill(ray_session):
    rows = [
        ("2024-01-01 05:00", "a", 1.25),
        ("2024-01-01 09:30", "a", 2.00),
        ("2024-01-01 10:00", "b", 0.50),
        ("2024-01-02 00:10", "b", 4.75),
        # day 2 has no "a"; key "c" never occurs at all
    ]
    out = pivot_counts(_ds(rows), time_col="ts", key_col="k",
                       value_col="v", expected_keys=["b", "a", "c"])
    assert list(out.columns) == [
        "bucket", "n_a", "cents_a", "n_b", "cents_b", "n_c", "cents_c"
    ]
    assert len(out) == 2
    d1, d2 = out.iloc[0], out.iloc[1]
    assert d1["bucket"] == pd.Timestamp("2024-01-01")
    assert int(d1["n_a"]) == 2 and int(d1["cents_a"]) == 325
    assert int(d1["n_b"]) == 1 and int(d1["cents_b"]) == 50
    assert int(d2["n_a"]) == 0 and int(d2["cents_a"]) == 0
    assert int(d2["n_b"]) == 1 and int(d2["cents_b"]) == 475
    assert out["n_c"].sum() == 0 and out["cents_c"].sum() == 0
    for c in out.columns[1:]:
        assert out[c].dtype == np.int64, c


def test_pivot_undeclared_key_raises(ray_session):
    rows = [("2024-01-01", "a", 1.0), ("2024-01-01", "zzz", 1.0)]
    with pytest.raises(ValueError, match="outside the declared domain"):
        pivot_counts(_ds(rows), time_col="ts", key_col="k",
                     value_col="v", expected_keys=["a", "b"])
