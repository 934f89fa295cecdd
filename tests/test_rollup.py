"""Rollup (stages/rollup.py): level partition invariants and the
null-key sentinel guard."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages.rollup import ALL, rollup_agg


def _ds(rows):
    return rd.from_arrow(pa.table({
        "a": pa.array([r[0] for r in rows], pa.string()),
        "b": pa.array([r[1] for r in rows], pa.string()),
        "cents": pa.array([r[2] for r in rows], pa.int64()),
    })).repartition(3)


def test_rollup_levels_partition(ray_session):
    rows = [("x", "p", 10), ("x", "q", 5), ("y", "p", 7), ("x", "p", 1)]
    out = rollup_agg(_ds(rows), ["a", "b"])
    # finest level
    fin = out[(out["a"] != ALL) & (out["b"] != ALL)]
    assert len(fin) == 3
    assert int(fin.set_index(["a", "b"]).loc[("x", "p"), "total_cents"]) == 11
    # mid level sums the finest
    mid = out[(out["a"] != ALL) & (out["b"] == ALL)].set_index("a")
    assert int(mid.loc["x", "total_cents"]) == 16
    assert int(mid.loc["y", "n_events"]) == 1
    # grand total
    top = out[(out["a"] == ALL) & (out["b"] == ALL)]
    assert int(top["total_cents"].iloc[0]) == 23
    assert int(top["n_events"].iloc[0]) == 4
    # exactly n+1 levels' worth of rows: 3 + 2 + 1
    assert len(out) == 6


def test_rollup_null_key_raises(ray_session):
    ds = rd.from_arrow(pa.table({
        "a": pa.array(["x", None], pa.string()),
        "b": pa.array(["p", "q"], pa.string()),
        "cents": pa.array([1, 2], pa.int64()),
    }))
    with pytest.raises(ValueError, match="null values in key column"):
        rollup_agg(ds, ["a", "b"])
