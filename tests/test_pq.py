"""stages.pq — product quantization vs a pure-Python Lloyd reference
(same init / round-6-before-argmin / round-6 centroid rules)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.core.textstats import round_half_away
from ocracle_ray.stages.pq import codebook_table, encode_pq, train_pq


def _vectors(n=40, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    # two well-separated blobs per subspace so codes are meaningful
    base = rng.randn(n, dim).astype(np.float32)
    base[n // 2:] += 6.0
    return base


def _reference_train(v, m, k, n_iters):
    v = v.astype(np.float64)
    n, dim = v.shape
    dsub = dim // m
    cb = round_half_away(v[:k].copy(), 6).reshape(k, m, dsub).transpose(1, 0, 2)
    vv = v.reshape(n, m, dsub)
    for _ in range(n_iters):
        new = cb.copy()
        for mi in range(m):
            d2 = ((vv[:, mi, None, :] - cb[mi][None]) ** 2).sum(-1)
            cell = np.argmin(round_half_away(d2, 6), axis=1)
            for c in range(k):
                sel = vv[cell == c, mi]
                if len(sel):
                    new[mi, c] = round_half_away(sel.mean(axis=0), 6)
        cb = new
    return cb


def test_train_matches_reference(ray_session):
    v = _vectors()
    df = pd.DataFrame({"vec_id": np.arange(len(v)),
                       "embedding": list(v)})
    ds = rd.from_pandas(df).repartition(3)
    cb = train_pq(ds, m=2, k=4, n_iters=3)
    ref = _reference_train(v, 2, 4, 3)
    np.testing.assert_allclose(cb, ref, atol=1e-12)


def test_encode_codes_and_errors(ray_session):
    v = _vectors()
    df = pd.DataFrame({"vec_id": np.arange(len(v)),
                       "embedding": list(v)})
    ds = rd.from_pandas(df).repartition(3)
    cb = train_pq(ds, m=2, k=4, n_iters=2)
    codes = encode_pq(ds, cb).to_pandas().sort_values(
        ["vec_id", "m"]).reset_index(drop=True)
    assert len(codes) == len(v) * 2
    vv = v.astype(np.float64).reshape(len(v), 2, 4)
    for _, row in codes.iloc[::7].iterrows():
        d2 = round_half_away(
            ((vv[int(row.vec_id), int(row.m)] - cb[int(row.m)]) ** 2
             ).sum(-1), 6)
        assert int(row.code) == int(np.argmin(d2))
        assert row.d2 == pytest.approx(d2[int(row.code)], abs=1e-12)
    # separable blobs: the two halves never share a code in any subspace
    for mi in (0, 1):
        lo = set(codes[(codes.m == mi) & (codes.vec_id < 20)].code)
        hi = set(codes[(codes.m == mi) & (codes.vec_id >= 20)].code)
        assert not (lo & hi)


def test_codebook_table_round_trip():
    cb = np.arange(2 * 3 * 4, dtype=np.float64).reshape(2, 3, 4)
    t = codebook_table(cb)
    df = t.to_pandas().sort_values(["m", "cell", "j"])
    back = df["value"].to_numpy().reshape(2, 3, 4)
    np.testing.assert_array_equal(back, cb)


def test_dim_not_divisible_raises(ray_session):
    df = pd.DataFrame({"vec_id": [0, 1],
                       "embedding": [np.ones(6, np.float32)] * 2})
    with pytest.raises(ValueError, match="not divisible"):
        train_pq(rd.from_pandas(df), m=4, k=2, n_iters=1)
