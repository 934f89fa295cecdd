"""Similarity search over embedding columns: brute force + IVF.

- ``brute_force_topk``   exact cosine top-k against a broadcast query
                         matrix: per-batch numpy matmul emits per-batch
                         candidates; a tiny driver-side resolve merges
                         them. Baseline and verifier.
- ``IvfIndex``           the scale path: deterministic k-means (seeded
                         init, fixed iterations) fit on a driver-side
                         sample, centroids broadcast via ``ray.put``;
                         per-batch assignment tags every row with its
                         cell, and queries probe only the ``n_probe``
                         closest cells. Recall < 1 by design — measured
                         against brute force in tests, never assumed.

Partitioning assumption: one cell's rows fit in a worker (cells ≈
sqrt(N) for balanced IVF); probing reads only tagged cells.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _as_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    return np.stack(col.to_pandas().to_numpy()).astype(np.float64)


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def brute_force_topk(ds, query_vecs: np.ndarray, *, key: str = "vec_id",
                     emb: str = "embedding", k: int = 10, concurrency=2):
    """Exact cosine top-k for each query row; returns pandas
    (query_id, vec_id, cosine, rank) sorted by (query_id, rank)."""
    import pandas as pd
    import ray

    q_unit = _unit(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    q_ref = ray.put(q_unit)

    class BatchTopK:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t[key].to_pylist(), dtype=np.int64)
            unit = _unit(_as_matrix(t[emb]))
            cos = unit @ self.q.T  # (batch, n_queries)
            n = min(k, len(ids))
            out_q, out_id, out_cos = [], [], []
            for qi in range(self.q.shape[0]):
                top = np.argpartition(-cos[:, qi], n - 1)[:n]
                out_q.extend([qi] * n)
                out_id.extend(ids[top])
                out_cos.extend(cos[top, qi])
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    key: pa.array(out_id, pa.int64()),
                    "cosine": pa.array(out_cos, pa.float64()),
                }
            )

    cand = ds.map_batches(
        BatchTopK, batch_format="pyarrow", batch_size=2048, concurrency=concurrency
    ).to_pandas()
    cand = cand.sort_values(["query_id", "cosine", key], ascending=[True, False, True])
    cand["rank"] = cand.groupby("query_id").cumcount() + 1
    out = cand[cand["rank"] <= k].reset_index(drop=True)
    out["cosine"] = out["cosine"].round(6)
    return out


def deterministic_kmeans(sample: np.ndarray, n_cells: int, *, iters: int = 10,
                         seed: int = 42) -> np.ndarray:
    """Seeded k-means with a fixed iteration count (no convergence test
    — determinism over optimality). Returns unit-normalized centroids."""
    rng = np.random.RandomState(seed)
    unit = _unit(sample)
    idx = rng.choice(len(unit), size=min(n_cells, len(unit)), replace=False)
    centroids = unit[np.sort(idx)].copy()
    for _ in range(iters):
        sims = unit @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(centroids.shape[0]):
            members = unit[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _unit(centroids)
    return centroids


class IvfIndex:
    """IVF over a Dataset with (key, embedding) columns.

    Two storage modes:

    - in-memory (default): tagged rows materialized in the object
      store; ``search`` filter-scans them (fine in one session).
    - ``index_dir`` given: tagged rows written as hive-partitioned
      parquet (``cell=N/``) and ``search`` READS ONLY the probed
      cells' directories — the pruned-read cluster form (n_probe /
      n_cells of the data leaves storage, per the module docstring).
    """

    def __init__(self, ds, *, key: str = "vec_id", emb: str = "embedding",
                 n_cells: int = 16, sample_size: int = 2048, seed: int = 42,
                 index_dir: str | None = None):
        import ray

        self.key, self.emb, self.n_cells = key, emb, n_cells
        self.index_dir = index_dir
        sample = _as_matrix(
            pa.chunked_array(
                [pa.array([r[emb] for r in ds.take(sample_size)])]
            )
        )
        self.centroids = deterministic_kmeans(sample, n_cells, seed=seed)
        cent_ref = ray.put(self.centroids)
        key_col, emb_col = key, emb

        class Assign:
            def __init__(self):
                self.cent = ray.get(cent_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                unit = _unit(_as_matrix(t[emb_col]))
                cell = (unit @ self.cent.T).argmax(axis=1).astype(np.int32)
                return pa.table(
                    {
                        key_col: t[key_col],
                        emb_col: t[emb_col],
                        "cell": pa.array(cell, pa.int32()),
                    }
                )

        tagged = ds.map_batches(Assign, batch_format="pyarrow", concurrency=2)
        if index_dir is not None:
            import json
            import os
            import shutil

            # the index build: one partition directory per cell; search
            # then reads ONLY the probed cells from storage. Clear any
            # previous build first — write_parquet APPENDS uniquely-named
            # files, so a stale index would double every row (review
            # finding r2). Only clear directories WE built (marker file):
            # a caller pointing index_dir at an arbitrary data directory
            # must not have it silently deleted (review finding r3).
            marker = os.path.join(index_dir, "_IVF_INDEX.json")
            if os.path.isdir(index_dir) and os.listdir(index_dir):
                if not os.path.exists(marker):
                    raise ValueError(
                        f"index_dir {index_dir!r} is a non-empty directory "
                        "without an _IVF_INDEX.json marker; refusing to "
                        "delete it. Point index_dir at a fresh path."
                    )
                shutil.rmtree(index_dir)
            tagged.write_parquet(index_dir, partition_cols=["cell"])
            with open(marker, "w") as f:
                json.dump({"n_cells": n_cells, "key": key, "emb": emb}, f)
            self.tagged = None
        else:
            self.tagged = tagged.materialize()

    def _probed_rows(self, probe: np.ndarray):
        """Dataset of rows in the probed cells: pruned directory read
        (index_dir mode) or an is_in filter over the in-memory tag."""
        import pyarrow.compute as pc

        if self.index_dir is not None:
            import glob
            import os

            import ray.data as rd

            paths = [
                f
                for c in probe
                for f in sorted(
                    glob.glob(
                        os.path.join(self.index_dir, f"cell={int(c)}", "*.parquet")
                    )
                )
            ]
            if not paths:
                return None
            return rd.read_parquet(paths, columns=[self.key, self.emb])

        probe_set = pa.array(probe, pa.int32())

        def in_cells(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["cell"], value_set=probe_set))

        return self.tagged.map_batches(in_cells, batch_format="pyarrow")

    def _candidate_frame(self, q: np.ndarray, k: int, probe: np.ndarray):
        """Per-batch top-k candidates from the probed cells, as pandas.

        Each batch emits only its k best rows (the ``brute_force_topk``
        pattern) so the driver resolve sees ≤ k × n_batches candidate
        rows, never every probed row's score — a probed cell at scale
        is millions of rows and must not land on the driver.
        """
        import pandas as pd

        key_col, emb_col = self.key, self.emb

        def score_topk(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {key_col: pa.array([], pa.int64()),
                     "cosine": pa.array([], pa.float64())}
                )
            unit = _unit(_as_matrix(t[emb_col]))
            cos = unit @ q
            n = min(k, len(cos))
            ids_all = np.asarray(t[key_col].to_pylist(), dtype=np.int64)
            # deterministic truncation: ties at the k-boundary must
            # keep the SMALLER key (the driver resolve and the oracle
            # both order by cosine DESC, key ASC). O(N) argpartition
            # finds the boundary score, then only the >= boundary
            # candidates (n plus boundary ties) pay the lexsort — a
            # full per-batch sort would make every probe O(N log N)
            if n < len(cos):
                boundary = cos[np.argpartition(-cos, n - 1)[:n]].min()
                cand = np.flatnonzero(cos >= boundary)
            else:
                cand = np.arange(len(cos))
            order = np.lexsort((ids_all[cand], -cos[cand]))
            top = cand[order[:n]]
            ids = ids_all[top]
            return pa.table(
                {key_col: pa.array(ids, pa.int64()),
                 "cosine": pa.array(cos[top], pa.float64())}
            )

        rows = self._probed_rows(probe)
        if rows is None:
            return pd.DataFrame(
                {self.key: pd.Series(dtype="int64"),
                 "cosine": pd.Series(dtype="float64")}
            )
        return rows.map_batches(
            score_topk, batch_format="pyarrow", batch_size=2048
        ).to_pandas()

    def search(self, query_vec: np.ndarray, *, k: int = 10, n_probe: int = 4):
        """Probe the n_probe closest cells, exact cosine inside them;
        per-batch top-k candidates, tiny driver resolve."""
        q = _unit(np.atleast_2d(np.asarray(query_vec, dtype=np.float64)))[0]
        probe = np.argsort(-(self.centroids @ q))[:n_probe].astype(np.int32)
        out = self._candidate_frame(q, k, probe)
        out = out.sort_values(["cosine", self.key], ascending=[False, True]).head(k)
        out["cosine"] = out["cosine"].round(6)
        return out.reset_index(drop=True)
