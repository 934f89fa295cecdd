"""SemDeDup (stages/semdedup.py): engineered embedding geometry
pinning the within-cell pair/component/removal math (including a
triangle, where n_removed < n_pairs) and the mega-cell guard."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages import semdedup


def _ds(vectors):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vectors)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vectors],
                              pa.list_(pa.float32())),
    }))


def _cluster(base, n, jitter, rng):
    return [base + jitter * rng.standard_normal(len(base))
            for _ in range(n)]


def test_triangle_and_pair_math(ray_session):
    rng = np.random.default_rng(3)
    d = 16
    e1 = np.zeros(d); e1[0] = 1.0
    e2 = np.zeros(d); e2[1] = 1.0
    vecs = (
        _cluster(e1 * 10, 3, 0.01, rng)     # triangle: 3 pairs, 2 removed
        + _cluster(e2 * 10, 2, 0.01, rng)   # pair: 1 pair, 1 removed
        + [e1 * 10 + e2 * 10]               # lone vector near nothing
    )
    out = semdedup.semantic_dedup_stats(
        _ds(vecs), n_cells=2, threshold=0.99, sample_size=10
    )
    assert out["n_vecs"].sum() == 6
    assert out["n_pairs"].sum() == 3 + 1
    assert out["n_removed"].sum() == 2 + 1  # triangle keeps 1 of 3


def test_no_dups_below_threshold(ray_session):
    rng = np.random.default_rng(5)
    vecs = [rng.standard_normal(16) for _ in range(20)]
    out = semdedup.semantic_dedup_stats(
        _ds(vecs), n_cells=2, threshold=0.999, sample_size=20
    )
    assert out["n_pairs"].sum() == 0
    assert out["n_removed"].sum() == 0
    assert out["n_vecs"].sum() == 20


def test_mega_cell_guard(ray_session, monkeypatch):
    monkeypatch.setattr(semdedup, "SEMDEDUP_CELL_LIMIT", 3)
    rng = np.random.default_rng(7)
    base = np.ones(8)
    vecs = _cluster(base * 5, 10, 0.01, rng)  # all land in one cell
    with pytest.raises(Exception, match="SEMDEDUP_CELL_LIMIT"):
        semdedup.semantic_dedup_stats(
            _ds(vecs), n_cells=2, threshold=0.9, sample_size=10
        )
