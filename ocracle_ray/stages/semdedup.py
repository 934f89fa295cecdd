"""SemDeDup — semantic deduplication in embedding space (Abbas et al.
2023, "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication"): k-means the embeddings, then WITHIN each cluster drop
all but one of every group of vectors above a cosine threshold. The
published recipe is exactly this two-level shape because all-pairs
cosine over the corpus is quadratic — the cells bound the pair search,
and cross-cell near-dups are missed BY DESIGN (the paper's stated
approximation).

Shape: centroids fit on a driver sample (``stages/knn.py``'s
deterministic k-means — the same trusted-assignment contract as the
IVF index); assignment is a broadcast map; the pair search is a
per-cell ``map_groups`` behind a LOUD row guard (a mega-cell means the
clustering collapsed — re-fit with more cells, the guard message says
so); components reuse the dedup contraction
(``neardup_clusters_from_pairs``) so a huge near-dup group never
materializes as a Python set.

Oracled the knn_ivf way (artifact): the query writes its (vec_id,
cell) assignment before returning; DuckDB re-derives the within-cell
pair set from the RAW embeddings view (``list_cosine_similarity`` over
DOUBLE[]), re-clusters with a recursive CTE, and re-aggregates the
per-cell stats — only the k-means assignment itself is trusted.
"""

from __future__ import annotations

import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

from .knn import _as_matrix, _unit, deterministic_kmeans

SEMDEDUP_CELL_LIMIT = 200_000  # loud per-cell pair-search bound


def semantic_dedup_stats(ds, *, key: str = "vec_id",
                         emb: str = "embedding", n_cells: int = 8,
                         threshold: float = 0.35,
                         sample_size: int = 2048, seed: int = 42,
                         artifact_dir: str | None = None) -> pd.DataFrame:
    """Per-cell ``(cell, n_vecs, n_pairs, n_removed)``: vectors in the
    cell, within-cell pairs at ``cosine >= threshold``, and vectors a
    keep-min-representative dedup would drop."""
    import ray

    from .dedup import neardup_clusters_from_pairs

    sample = _as_matrix(
        pa.chunked_array([pa.array([r[emb] for r in ds.take(sample_size)])])
    )
    centroids = deterministic_kmeans(sample, n_cells, seed=seed)
    cent_ref = ray.put(centroids)
    key_col, emb_col = key, emb

    class Assign:
        def __init__(self):
            from ..broadcast import cached_get

            self.cent = cached_get(cent_ref)

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

    tagged = ds.map_batches(
        Assign, batch_format="pyarrow", concurrency=2
    ).materialize()

    if artifact_dir is not None:
        shutil.rmtree(artifact_dir, ignore_errors=True)
        tagged.map_batches(
            lambda t: pa.table({"vec_id": t[key_col], "cell": t["cell"]}),
            batch_format="pyarrow",
        ).write_parquet(artifact_dir)

    thr = float(threshold)

    def cell_pairs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty = pa.table(
            {
                "cell": pa.array([], pa.int32()),
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        if n > SEMDEDUP_CELL_LIMIT:
            raise ValueError(
                f"semdedup: cell {t['cell'][0]} holds {n} vectors "
                f"(> SEMDEDUP_CELL_LIMIT={SEMDEDUP_CELL_LIMIT}) — the "
                "clustering collapsed; re-fit with more cells (the "
                "paper's k scales with corpus size)"
            )
        ids = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)  # deterministic pair orientation
        ids = ids[order]
        unit = _unit(_as_matrix(t[emb_col]))[order]
        cos = unit @ unit.T
        ai, bi = np.triu_indices(n, 1)
        hit = cos[ai, bi] >= thr
        if not hit.any():
            return empty
        return pa.table(
            {
                "cell": pa.array(
                    np.full(int(hit.sum()), t["cell"][0].as_py(),
                            np.int32)
                ),
                "a": pa.array(ids[ai[hit]], pa.int64()),
                "b": pa.array(ids[bi[hit]], pa.int64()),
            }
        )

    pairs = tagged.groupby("cell").map_groups(
        cell_pairs, batch_format="pyarrow"
    ).to_pandas()
    if "a" not in pairs.columns:
        pairs = pd.DataFrame({"cell": [], "a": [], "b": []})

    # components (pairs never span cells, so one global clustering is
    # exact); removed = nodes whose representative is another vector
    clusters = neardup_clusters_from_pairs(pairs[["a", "b"]])
    cell_of = None
    if len(clusters):
        cmap = tagged.map_batches(
            lambda t: pa.table({"k": t[key_col], "cell": t["cell"]}),
            batch_format="pyarrow",
        ).to_pandas()
        cell_of = dict(zip(cmap["k"], cmap["cell"]))

    per_cell_vecs = (
        tagged.groupby("cell").count().to_pandas()
        .rename(columns={"count()": "n_vecs"})
    )
    per_cell_pairs = (
        pairs.groupby("cell").size().rename("n_pairs").reset_index()
        if len(pairs) else pd.DataFrame({"cell": [], "n_pairs": []})
    )
    removed_rows = (
        clusters[clusters["key"] != clusters["cluster_id"]]
        if len(clusters) else clusters
    )
    if len(removed_rows):
        rem = (
            removed_rows["key"].map(cell_of).value_counts()
            .rename_axis("cell").rename("n_removed").reset_index()
        )
    else:
        rem = pd.DataFrame({"cell": [], "n_removed": []})

    out = per_cell_vecs.merge(per_cell_pairs, on="cell", how="left") \
        .merge(rem, on="cell", how="left")
    for c in ("n_pairs", "n_removed"):
        out[c] = out[c].fillna(0).astype("int64")
    out["cell"] = out["cell"].astype("int64")
    out["n_vecs"] = out["n_vecs"].astype("int64")
    return (
        out[["cell", "n_vecs", "n_pairs", "n_removed"]]
        .sort_values("cell")
        .reset_index(drop=True)
    )

