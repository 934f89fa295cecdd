"""emb_outliers — a planted far vector must be flagged (the sf corpus
only exercises the natural 1.1x tail)."""

import numpy as np
import pandas as pd

from ocracle_ray.pipelines.queries import q_emb_outliers


def test_planted_outlier_flagged(ray_session, tmp_path):
    rng = np.random.RandomState(0)
    v = rng.randn(60, 64) * 0.05
    v[:30] += np.r_[np.ones(32), np.zeros(32)]   # cluster A
    v[30:] -= np.r_[np.zeros(32), np.ones(32)]   # cluster B
    v[7] = v[7] + 3.0                            # planted outlier in A
    pd.DataFrame({
        "vec_id": np.arange(60),
        "embedding": list(v.astype(np.float32)),
        "label": np.zeros(60, np.int32),
    }).to_parquet(tmp_path / "embeddings.parquet")
    out = q_emb_outliers(str(tmp_path))
    assert out["n_vecs"].sum() == 60
    assert out["n_outliers"].sum() >= 1
    # the planted vector dominates its cell's outlier count
    big = out.loc[out["n_outliers"] > 0]
    assert len(big) >= 1
