"""Product quantization (Jégou et al. 2011, "Product Quantization for
Nearest Neighbor Search") — THE embedding-compression op of a 100-TB
vector corpus: split each vector into M subspaces, k-means each
subspace independently, store M small codes per vector (here 8
subspaces × 16 codes = 8 nibbles for a 64-dim float vector, a 64×
compression), search via asymmetric distance over code tables.

Scale shape (the stages/kmeans.py doctrine, extended over subspaces):
every training iteration is ONE zero-shuffle streaming pass — the
whole M×K×dsub codebook broadcasts per iteration (ray.put +
cached_get) and each batch emits per-(subspace, cell) (count,
per-dim-sum) partials, M·K·(dsub+1) numbers regardless of corpus
size, folded by driver_grouped_agg. Encoding is one more pass that
streams (vec_id, m, code, d2) rows straight to the parquet artifact.

Float parity (the kmeans round-before-argmin rule, applied per
subspace): squared distances round to 6 before the argmin (ties →
lowest cell), centroids round to 6 after the mean, embeddings cast
f32→DOUBLE before any arithmetic. The artifact oracle trusts ONLY the
trained codebook (written as flat (m, cell, j, value) rows, the
knn_ivf trusted-training contract): DuckDB re-derives every
assignment and every reconstruction error from the RAW embeddings +
the written codebook, so a wrong engine-side assignment kernel shows
up as an n_match / sq_err mismatch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..broadcast import cached_get
from ..core.textstats import round_half_away


def _stack64(col) -> np.ndarray:
    return np.stack([np.asarray(v, np.float64)
                     for v in col.to_pylist()]).astype(np.float64)


def train_pq(ds, *, m: int = 8, k: int = 16, n_iters: int = 3,
             vec_col: str = "embedding", id_col: str = "vec_id"
             ) -> np.ndarray:
    """Train the [m, k, dsub] codebook. Init = the k smallest
    ``id_col`` vectors' subspace slices (rounded 6 — the lloyd_kmeans
    init rule per subspace); empty cells keep their previous
    centroid."""
    import ray

    from ..pipelines.queries import driver_grouped_agg

    init = ds.sort(id_col).limit(k).to_pandas()
    full = round_half_away(_stack64(pa.array(init[vec_col])), 6)
    dim = full.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    cb = full.reshape(k, m, dsub).transpose(1, 0, 2).copy()  # [m, k, dsub]

    sum_cols = [f"s{j}" for j in range(dsub)]

    def partials(cb_ref):
        def fn(t: pa.Table) -> pa.Table:
            c = cached_get(cb_ref)  # [m, k, dsub]
            v = _stack64(t[vec_col]).reshape(-1, m, dsub)
            d2 = ((v[:, :, None, :] - c[None, :, :, :]) ** 2).sum(-1)
            cell = np.argmin(round_half_away(d2, 6), axis=2)  # [n, m]
            n = v.shape[0]
            cols = {
                "m": np.repeat(np.arange(m, dtype=np.int64), n),
                "cell": cell.T.reshape(-1).astype(np.int64),
                "n": np.ones(n * m, np.int64),
            }
            flat = v.transpose(1, 0, 2).reshape(n * m, dsub)
            out = {kk: pa.array(vv) for kk, vv in cols.items()}
            for j, name in enumerate(sum_cols):
                out[name] = pa.array(flat[:, j], pa.float64())
            return pa.table(out)
        return fn

    for _ in range(n_iters):
        ref = ray.put(cb)
        agg = driver_grouped_agg(
            ds.map_batches(partials(ref), batch_format="pyarrow"),
            ["m", "cell"],
            {"n": ("n", "sum"), **{s: (s, "sum") for s in sum_cols}},
        )
        new = cb.copy()  # empty cells keep their previous centroid
        for _, row in agg.iterrows():
            n = int(row["n"])
            new[int(row["m"]), int(row["cell"])] = round_half_away(
                row[sum_cols].to_numpy(np.float64) / n, 6)
        cb = new
    return cb


def encode_pq(ds, cb: np.ndarray, *, vec_col: str = "embedding",
              id_col: str = "vec_id"):
    """One streaming pass → Dataset of ``(vec_id, m, code, d2)`` rows:
    the chosen cell per subspace and its ROUNDED-6 squared distance
    (= the reconstruction error of that subspace)."""
    import ray

    m, _k, dsub = cb.shape
    cb_ref = ray.put(cb)

    def fn(t: pa.Table) -> pa.Table:
        c = cached_get(cb_ref)
        v = _stack64(t[vec_col]).reshape(-1, m, dsub)
        d2 = round_half_away(
            ((v[:, :, None, :] - c[None, :, :, :]) ** 2).sum(-1), 6)
        cell = np.argmin(d2, axis=2)  # [n, m]
        n = v.shape[0]
        chosen = np.take_along_axis(d2, cell[:, :, None], axis=2)[:, :, 0]
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, m)),
            "m": pa.array(np.tile(np.arange(m, dtype=np.int64), n)),
            "code": pa.array(cell.reshape(-1).astype(np.int64)),
            "d2": pa.array(chosen.reshape(-1), pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def codebook_table(cb: np.ndarray) -> pa.Table:
    """Flat (m, cell, j, value) rows — the trusted-training artifact
    the oracle reads the codebook from."""
    m, k, dsub = cb.shape
    mm, cc, jj = np.meshgrid(np.arange(m), np.arange(k), np.arange(dsub),
                             indexing="ij")
    return pa.table({
        "m": pa.array(mm.reshape(-1).astype(np.int64)),
        "cell": pa.array(cc.reshape(-1).astype(np.int64)),
        "j": pa.array(jj.reshape(-1).astype(np.int64)),
        "value": pa.array(cb.reshape(-1), pa.float64()),
    })


def adc_search(ds, cb: np.ndarray, queries: np.ndarray, *, k: int = 10,
               vec_col: str = "embedding", id_col: str = "vec_id"
               ) -> pd.DataFrame:
    """Asymmetric-distance top-k (the PQ search side): per query,
    distance(vec) = Σ_m table[m][code(vec, m)] where table[m][cell] =
    round-6 ||q_sub − centroid||² — the classic M-lookup scoring that
    never touches the original vectors at query time. Here codes are
    computed in the same streaming pass (one corpus scan, per-batch
    top-k candidates per query for BOTH the ADC and the exact ranking,
    driver resolves ≤ 2·k·n_queries·n_batches rows), and recall@k of
    ADC against the exact ranking is measured in-query.

    Ties break (distance, vec_id) on both rankings — shared with the
    SQL mirror. ADC totals round to 6 (sums of 8 round-6 terms) before
    ranking; exact distances round to 6 before ranking."""
    m, _kc, dsub = cb.shape
    q = np.asarray(queries, np.float64)
    nq = q.shape[0]
    qsub = q.reshape(nq, m, dsub)
    # table[qi, m, cell]
    table = round_half_away(
        ((qsub[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(-1), 6)

    import ray

    from ..broadcast import cached_get

    ref = ray.put((table, cb, q))

    def fn(t: pa.Table) -> pa.Table:
        tab, c, qq = cached_get(ref)
        v = _stack64(t[vec_col])
        vv = v.reshape(-1, m, dsub)
        d2 = round_half_away(
            ((vv[:, :, None, :] - c[None, :, :, :]) ** 2).sum(-1), 6)
        cell = np.argmin(d2, axis=2)  # [n, m]
        # ADC per query: gather tab[qi, m, cell]
        adc = round_half_away(
            np.stack([tab[qi, np.arange(m)[None, :], cell].sum(-1)
                      for qi in range(nq)]), 6)  # [nq, n]
        exact = round_half_away(
            ((qq[:, None, :] - v[None, :, :]) ** 2).sum(-1), 6)  # [nq, n]
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        rows = {"qid": [], "vec_id": [], "adc": [], "exact": []}
        for qi in range(nq):
            cand = np.union1d(
                np.lexsort((ids, adc[qi]))[:k],
                np.lexsort((ids, exact[qi]))[:k],
            )
            rows["qid"].extend([qi] * len(cand))
            rows["vec_id"].extend(ids[cand].tolist())
            rows["adc"].extend(adc[qi][cand].tolist())
            rows["exact"].extend(exact[qi][cand].tolist())
        return pa.table({
            "qid": pa.array(rows["qid"], pa.int64()),
            "vec_id": pa.array(rows["vec_id"], pa.int64()),
            "adc": pa.array(rows["adc"], pa.float64()),
            "exact": pa.array(rows["exact"], pa.float64()),
        })

    cand = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    out = []
    for qi in range(nq):
        g = cand[cand.qid == qi]
        top_adc = g.sort_values(["adc", "vec_id"]).head(k)
        top_exact = g.sort_values(["exact", "vec_id"]).head(k)
        hit = len(set(top_adc.vec_id) & set(top_exact.vec_id))
        out.append({
            "qid": int(qi),
            "adc_top1": int(top_adc.iloc[0].vec_id),
            "adc_d2": round(float(top_adc.iloc[0].adc), 4),
            "recall_at_k": round(hit / k, 4),
        })
    return pd.DataFrame(out)


def pq_summary(codes_df: pd.DataFrame) -> pd.DataFrame:
    """Per-subspace driver row from the written artifact: vector
    count, distinct codes used, n_match (pinned externally by the
    oracle's re-derived assignment) and the rounded error sum."""
    g = codes_df.groupby("m")
    out = pd.DataFrame({
        "m": np.sort(codes_df["m"].unique()).astype(np.int64),
        "n_vectors": g.size().sort_index().to_numpy(np.int64),
        "k_used": g["code"].nunique().sort_index().to_numpy(np.int64),
        "n_match": g.size().sort_index().to_numpy(np.int64),
        "sq_err": g["d2"].sum().sort_index().round(4).to_numpy(),
    })
    return out.reset_index(drop=True)
