"""Lloyd k-means (stages/kmeans.py): separable-cluster recovery,
tie/empty-cell rules, and block-layout invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages.kmeans import kmeans_cells, lloyd_kmeans


def _ds(vecs, nparts=3):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })).repartition(nparts)


def test_recovers_separable_clusters(ray_session):
    rng = np.random.default_rng(2)
    centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]])
    # first 3 ids seed one point of each cluster (deterministic init)
    vecs = [centers[0] + 0.01, centers[1] + 0.01, centers[2] + 0.01]
    labels = [0, 1, 2]
    for i in range(120):
        c = i % 3
        vecs.append(centers[c] + rng.normal(0, 0.3, 2))
        labels.append(c)
    cents, counts = lloyd_kmeans(_ds(vecs), k=3, n_iters=5)
    assert sorted(counts) == [41, 41, 41]
    for c in range(3):
        d = np.linalg.norm(cents - centers[c], axis=1)
        assert d.min() < 0.5  # one learned centroid near each truth


def test_identical_points_tie_to_lowest_cell(ray_session):
    vecs = [[1.0, 2.0]] * 10
    cents, counts = lloyd_kmeans(_ds(vecs), k=3, n_iters=2)
    assert counts[0] == 10 and counts[1] == 0 and counts[2] == 0
    # empty cells kept their (identical) init centroids
    np.testing.assert_allclose(cents[1], [1.0, 2.0])


def test_block_layout_invariance(ray_session):
    rng = np.random.default_rng(5)
    vecs = rng.normal(0, 1, (80, 4)).round(3)
    a = kmeans_cells(_ds(list(vecs), 1), k=4, n_iters=3)
    b = kmeans_cells(_ds(list(vecs), 7), k=4, n_iters=3)
    pd.testing.assert_frame_equal(a, b)
