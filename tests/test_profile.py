"""Table profiling (stages/profile.py): null handling, mixed dtypes,
block-layout invariance of the merged sketches."""

import pyarrow as pa
import ray.data as rd

from ocracle_ray.stages.profile import profile_table


def _ds(parts):
    return rd.from_arrow(pa.table({
        "a": pa.array([1, 2, 2, None, 3, None], pa.int64()),
        "b": pa.array(["x", None, "x", "y", "z", "z"], pa.string()),
        "c": pa.array([1.5, 1.5, 2.5, 3.5, None, 4.5], pa.float64()),
    })).repartition(parts)


def test_profile_counts(ray_session):
    out = profile_table(_ds(3), ["a", "b", "c"]).set_index("col_name")
    assert int(out.loc["a", "n_nulls"]) == 2
    assert int(out.loc["a", "n_distinct"]) == 3
    assert int(out.loc["b", "n_nulls"]) == 1
    assert int(out.loc["b", "n_distinct"]) == 3
    assert int(out.loc["c", "n_nulls"]) == 1
    assert int(out.loc["c", "n_distinct"]) == 4


def test_profile_block_invariance(ray_session):
    a = profile_table(_ds(1), ["a", "b", "c"])
    b = profile_table(_ds(6), ["a", "b", "c"])
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
