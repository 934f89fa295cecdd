"""IVF-PQ (IVFADC, Jégou et al. 2011 §IV) — the faiss-standard
composite of the repo's two ANN trainers: a coarse k-means quantizer
routes vectors to inverted cells, and product quantization encodes the
RESIDUAL (vector − cell centroid); search probes the closest P cells
and scores candidates by asymmetric distance against per-(query, cell)
lookup tables, never touching raw vectors at query time.

Scale shape: training is lloyd_kmeans + train_pq (each already one
zero-shuffle pass per iteration); the residual computation rides the
PQ training pass's batches. Search is ONE corpus scan per query set:
a pc.is_in probe filter, an ADC gather over the broadcast
[nq, cells, m, k] table (nq·cells·m·k floats — 4096 here), per-batch
top-k candidates for BOTH the ADC and exact rankings, driver resolve.

Float parity: the emb_kmeans/emb_pq round-6-before-argmin rules at
every decision point (cell assignment, code assignment, cell probe
ranking, ADC totals, exact distances), ties to the lower index — so
the oracle re-derives EVERY assignment, probe set, ranking and the
recall from raw embeddings given only the two trained artifacts
(centroids + residual codebook)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..broadcast import cached_get
from ..core.textstats import round_half_away
from .kmeans import lloyd_kmeans
from .pq import _stack64, train_pq


def _assign_cells(v: np.ndarray, cents: np.ndarray) -> np.ndarray:
    d2 = ((v[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    return np.argmin(round_half_away(d2, 6), axis=1)


def build_ivfpq(ds, *, n_cells: int = 8, m: int = 8, k: int = 16,
                n_iters: int = 3, vec_col: str = "embedding",
                id_col: str = "vec_id"):
    """Train both quantizers: (centroids [n_cells, dim], pq codebook
    [m, k, dsub] trained on residuals)."""
    import ray

    cents, _counts = lloyd_kmeans(ds, k=n_cells, n_iters=n_iters,
                                  vec_col=vec_col, id_col=id_col)
    cents_ref = ray.put(cents)

    def residuals(t: pa.Table) -> pa.Table:
        c = cached_get(cents_ref)
        v = _stack64(t[vec_col])
        cell = _assign_cells(v, c)
        r = v - c[cell]
        return pa.table({
            id_col: t[id_col],
            "resid": pa.array(list(r), pa.list_(pa.float64())),
        })

    resid_ds = ds.map_batches(residuals, batch_format="pyarrow")
    cb = train_pq(resid_ds, m=m, k=k, n_iters=n_iters,
                  vec_col="resid", id_col=id_col)
    return cents, cb


def ivfpq_search(ds, cents: np.ndarray, cb: np.ndarray,
                 queries: np.ndarray, *, n_probe: int = 3, k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id"
                 ) -> pd.DataFrame:
    """Per query: probe the ``n_probe`` closest cells, rank their
    vectors by IVFADC distance, report top-1 + measured recall@k
    against the exact ranking (over ALL vectors — misses outside the
    probe set COUNT against recall, that is the IVF tradeoff being
    measured)."""
    import ray

    q = np.asarray(queries, np.float64)
    nq = len(q)
    n_cells, _dim = cents.shape
    m, kc, dsub = cb.shape
    # probe sets: round-6 distance, lower cell wins ties
    qc = round_half_away(
        ((q[:, None, :] - cents[None, :, :]) ** 2).sum(-1), 6)
    probes = []
    for qi in range(nq):
        idx = sorted(range(n_cells), key=lambda cidx: (qc[qi, cidx], cidx))
        probes.append(sorted(idx[:n_probe]))
    # ADC tables per (query, cell): residual target = (q - cent)_m
    tab = np.zeros((nq, n_cells, m, kc))
    for qi in range(nq):
        rq = (q[qi][None, :] - cents).reshape(n_cells, m, dsub)
        tab[qi] = round_half_away(
            ((rq[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(-1), 6)

    ref = ray.put((cents, cb, tab, q,
                   [np.asarray(p, np.int64) for p in probes]))

    def scan(t: pa.Table) -> pa.Table:
        c, code_book, tabs, qq, prbs = cached_get(ref)
        v = _stack64(t[vec_col])
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = _assign_cells(v, c)
        r = (v - c[cell]).reshape(len(v), m, dsub)
        d2 = round_half_away(
            ((r[:, :, None, :] - code_book[None, :, :, :]) ** 2).sum(-1), 6)
        code = np.argmin(d2, axis=2)  # [n, m]
        exact = round_half_away(
            ((qq[:, None, :] - v[None, :, :]) ** 2).sum(-1), 6)
        rows = {"qid": [], "vec_id": [], "adc": [], "exact": [],
                "in_probe": []}
        for qi in range(nq):
            adc = round_half_away(
                tabs[qi, cell[:, None], np.arange(m)[None, :],
                     code].sum(-1), 6)
            inp = np.isin(cell, prbs[qi])
            cand = set()
            probed_idx = np.flatnonzero(inp)
            if len(probed_idx):
                by_adc = probed_idx[np.lexsort(
                    (ids[probed_idx], adc[probed_idx]))][:k]
                cand.update(by_adc.tolist())
            cand.update(np.lexsort((ids, exact[qi]))[:k].tolist())
            cand = sorted(cand)
            rows["qid"].extend([qi] * len(cand))
            rows["vec_id"].extend(ids[cand].tolist())
            rows["adc"].extend(adc[cand].tolist())
            rows["exact"].extend(exact[qi][cand].tolist())
            rows["in_probe"].extend(inp[cand].astype(np.int64).tolist())
        return pa.table({
            "qid": pa.array(rows["qid"], pa.int64()),
            "vec_id": pa.array(rows["vec_id"], pa.int64()),
            "adc": pa.array(rows["adc"], pa.float64()),
            "exact": pa.array(rows["exact"], pa.float64()),
            "in_probe": pa.array(rows["in_probe"], pa.int64()),
        })

    cand = ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    out = []
    for qi in range(nq):
        g = cand[cand.qid == qi]
        gp = g[g.in_probe == 1]
        top_adc = gp.sort_values(["adc", "vec_id"]).head(k)
        top_exact = g.sort_values(["exact", "vec_id"]).head(k)
        hit = len(set(top_adc.vec_id) & set(top_exact.vec_id))
        out.append({
            "qid": int(qi),
            "probed": ",".join(str(c) for c in probes[qi]),
            "adc_top1": int(top_adc.iloc[0].vec_id),
            "adc_d2": round(float(top_adc.iloc[0].adc), 4),
            "recall_at_k": round(hit / k, 4),
        })
    return pd.DataFrame(out)
