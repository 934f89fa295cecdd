"""stages.ivfpq — residual coding + probe semantics on separable
clusters (the sf corpus exercises the measured-recall path; these pin
the mechanics via structural properties — ADC with an 8-code lattice
cannot rank WITHIN a dense isotropic blob, so exact-recall assertions
would test the blob, not the operator)."""

import numpy as np
import pandas as pd
import ray.data as rd

from ocracle_ray.stages.ivfpq import _assign_cells, build_ivfpq, ivfpq_search


def _clusters(n_per=20, dim=16, seed=0):
    rng = np.random.RandomState(seed)
    centers = np.array([[6.0] * dim, [-6.0] * dim])
    pts = np.vstack([c + rng.randn(n_per, dim) * 0.2 for c in centers])
    return pts.astype(np.float32)


def _ds(v, parts=3):
    return rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(len(v)), "embedding": list(v)}
    )).repartition(parts)


def test_self_is_top1_and_clusters_never_mix(ray_session):
    v = _clusters()
    ds = _ds(v)
    cents, cb = build_ivfpq(ds, n_cells=2, m=2, k=8, n_iters=3)
    q = np.vstack([v[0], v[25]]).astype(np.float64)
    out = ivfpq_search(ds, cents, cb, q, n_probe=2, k=5)
    assert out["adc_top1"].tolist() == [0, 25]
    # recall is measured, bounded, and nonzero (self always hits)
    assert ((out["recall_at_k"] > 0) & (out["recall_at_k"] <= 1)).all()


def test_partial_probe_is_the_nearest_cell(ray_session):
    v = _clusters()
    ds = _ds(v, parts=2)
    cents, cb = build_ivfpq(ds, n_cells=2, m=2, k=8, n_iters=2)
    q = np.array([[-6.0] * 16], np.float64)
    out = ivfpq_search(ds, cents, cb, q, n_probe=1, k=5)
    d = ((cents - q) ** 2).sum(1)
    near = int(np.argmin(d))
    assert out["probed"].iloc[0] == str(near)
    # the top-1 comes from the probed (= query's own) cluster
    cell_of_top = _assign_cells(
        v[int(out["adc_top1"].iloc[0])][None].astype(np.float64), cents
    )[0]
    assert cell_of_top == near


def test_residual_codes_reconstruct_better_than_centroid(ray_session):
    """The point of residual PQ: centroid + decoded residual is
    strictly closer to the vector than the centroid alone."""
    v = _clusters(n_per=30)
    ds = _ds(v, parts=2)
    cents, cb = build_ivfpq(ds, n_cells=2, m=2, k=8, n_iters=3)
    x = v.astype(np.float64)
    cell = _assign_cells(x, cents)
    resid = (x - cents[cell]).reshape(len(x), 2, 8)
    d2 = ((resid[:, :, None, :] - cb[None]) ** 2).sum(-1)
    code = np.argmin(d2, axis=2)
    approx = cents[cell] + np.concatenate(
        [cb[m][code[:, m]] for m in range(2)], axis=1)
    err_pq = ((x - approx) ** 2).sum(1).mean()
    err_cent = ((x - cents[cell]) ** 2).sum(1).mean()
    assert err_pq < err_cent * 0.9
