"""Source-mixture balancing (stages/mixture.py): engineered skew
pinning the uniform-cap weight rule, the integer hash determinism, and
the unknown-source guard."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages import mixture


def _ds(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    }))


def test_uniform_cap_weights(ray_session):
    # big: 10 docs x 10 tokens = 100; small: 2 docs x 5 = 10;
    # empty source: 1 doc, 0 tokens
    rows = (
        [(i, "big", "a b c d e f g h i j") for i in range(10)]
        + [(100 + i, "small", "k l m n o") for i in range(2)]
        + [(200, "none", "!!! ???")]
    )
    ds = _ds(rows)
    stats = mixture.source_token_stats(ds)
    assert stats.set_index("source")["total_tokens"].to_dict() == {
        "big": 100, "small": 10, "none": 0,
    }
    thr = mixture.mixture_thresholds(stats)
    # total=110, 3 sources -> budget=36; big: 360000ppm, small: capped
    # 1e6, empty: 1e6 by rule
    assert thr == {"big": 360000, "small": 1000000, "none": 1000000}
    out = mixture.mixture_sample_stats(ds, thr)
    got = out.set_index("source")
    assert got.loc["small", "n_sampled"] == 2  # weight 1.0 keeps all
    assert got.loc["none", "n_sampled"] == 1
    # big keeps exactly the docs whose hash lands under 360000ppm
    ids = np.arange(10, dtype=np.int64)
    expect = mixture.doc_sample_mask(ids, np.full(10, 360000)).sum()
    assert got.loc["big", "n_sampled"] == expect
    assert got.loc["big", "sampled_tokens"] == expect * 10


def test_hash_is_deterministic_and_uniform():
    ids = np.arange(200_000, dtype=np.int64)
    m1 = mixture.doc_sample_mask(ids, np.full(len(ids), 250_000))
    m2 = mixture.doc_sample_mask(ids.copy(), np.full(len(ids), 250_000))
    assert np.array_equal(m1, m2)
    # keep rate within 1% absolute of 25% on 200k ids
    assert abs(m1.mean() - 0.25) < 0.01


def test_unknown_source_is_loud(ray_session):
    ds = _ds([(0, "mystery", "a b c")])
    with pytest.raises(Exception, match="absent"):
        mixture.mixture_sample_stats(ds, {"known": 1000000})
