"""HITS hubs & authorities (Kleinberg 1999) over a bipartite edge
Dataset — the OTHER classic eigenvector centrality next to PageRank
(stages/pagerank.py): PageRank ranks a homogeneous graph by damped
random-walk mass; HITS ranks a directed/bipartite structure by the
mutual reinforcement h = W·a, a = Wᵀ·h (customers are good hubs when
they buy authoritative parts, parts are authoritative when good hubs
buy them — the query/page duality of the original paper).

Scale shape = pagerank's: the edge list stays a (materialized, reused)
Dataset; each half-iteration is ONE streaming zero-shuffle pass —
the opposite side's score vector broadcasts via ``ray.put`` +
``cached_get``, every batch emits in-batch-summed (node, contribution)
partials, and the driver folds |V|-sized rows, never |E|. Past
NODE_LIMIT the score vector itself must shard (a different op; loud
guard).

Exactness: int64 fixed point scaled by 1e6 with floor division at
exactly ONE documented point per half-iteration — the classic L2
normalization needs a sqrt, so this implementation normalizes by the
MAX raw score (same ranking fixed point, integer-exact), i.e.
``x ← (x_raw · SCALE) // max(x_raw)``. The generated unrolled DuckDB
oracle re-derives every raw sum and every normalization by exact
integer equality (the textrank/pagerank precedent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..broadcast import cached_get
from .textrank import SCALE

NODE_LIMIT = 5_000_000
# raw sums must survive the * SCALE normalization in int64
_RAW_LIMIT = 2**62 // SCALE


def hits(edges_ds, *, n_rounds: int = 2, k: int = 10) -> pd.DataFrame:
    """Top-k hubs and authorities over bipartite (c, p, w) int64
    edges. Returns (kind, node, score_fp, rk) with kind ∈
    {'authority', 'hub'}, ties broken (score DESC, node ASC)."""
    import ray

    _schema = pa.schema([("c", pa.int64()), ("p", pa.int64()),
                         ("w", pa.int64())])

    def _safe(t: pa.Table) -> pa.Table:
        # normalize zero-row degenerate-schema aggregate blocks
        if t.num_rows == 0:
            return _schema.empty_table()
        return t.select(["c", "p", "w"])

    edges = edges_ds.map_batches(
        _safe, batch_format="pyarrow").materialize()

    from ..pipelines.queries import driver_grouped_agg

    cdeg = driver_grouped_agg(edges, ["c"], {"_n": ("w", "count")})
    pdeg = driver_grouped_agg(edges, ["p"], {"_n": ("w", "count")})
    if len(cdeg) + len(pdeg) > NODE_LIMIT:
        raise ValueError(
            f"hits: {len(cdeg) + len(pdeg)} nodes exceed "
            f"NODE_LIMIT={NODE_LIMIT}; shard the score vectors "
            "(a different op) instead of folding them")
    cn = np.sort(cdeg["c"].to_numpy().astype(np.int64))
    pn = np.sort(pdeg["p"].to_numpy().astype(np.int64))
    cn_ref, pn_ref = ray.put(cn), ray.put(pn)

    def half_pass(score_ref, *, src_col: str, dst_col: str,
                  src_nodes_ref, dst_nodes_ref, n_dst: int) -> np.ndarray:
        """One streaming edges pass: raw[dst] = Σ w · score[src]."""

        def contrib(t: pa.Table) -> pa.Table:
            sn = cached_get(src_nodes_ref)
            dn = cached_get(dst_nodes_ref)
            sv = cached_get(score_ref)
            src = np.searchsorted(sn, t[src_col].to_numpy(
                zero_copy_only=False))
            dst = np.searchsorted(dn, t[dst_col].to_numpy(
                zero_copy_only=False))
            w = t["w"].to_numpy(zero_copy_only=False)
            s = np.zeros(len(dn), np.int64)
            np.add.at(s, dst, w * sv[src])
            nz = np.nonzero(s)[0]
            return pa.table({"i": pa.array(nz, pa.int64()),
                             "s": pa.array(s[nz], pa.int64())})

        acc = np.zeros(n_dst, np.int64)
        for block in edges.map_batches(
                contrib, batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"):
            acc[block["i"].to_numpy(zero_copy_only=False)] += (
                block["s"].to_numpy(zero_copy_only=False))
        if acc.max(initial=0) > _RAW_LIMIT:
            raise ValueError("hits: raw score would overflow the "
                             "SCALE normalization — rescale weights")
        return acc

    def normalize(raw: np.ndarray) -> np.ndarray:
        m = int(raw.max(initial=0))
        if m == 0:
            return raw
        return (raw * SCALE) // m

    a = np.full(len(pn), SCALE, np.int64)
    h = np.zeros(len(cn), np.int64)
    for _ in range(n_rounds):
        h = normalize(half_pass(ray.put(a), src_col="p", dst_col="c",
                                src_nodes_ref=pn_ref,
                                dst_nodes_ref=cn_ref, n_dst=len(cn)))
        a = normalize(half_pass(ray.put(h), src_col="c", dst_col="p",
                                src_nodes_ref=cn_ref,
                                dst_nodes_ref=pn_ref, n_dst=len(pn)))

    def topk(nodes: np.ndarray, scores: np.ndarray, kind: str):
        order = np.lexsort((nodes, -scores))[:k]
        return pd.DataFrame({
            "kind": kind,
            "node": nodes[order].astype(np.int64),
            "score_fp": scores[order].astype(np.int64),
            "rk": np.arange(1, len(order) + 1, dtype=np.int64),
        })

    out = pd.concat([topk(pn, a, "authority"), topk(cn, h, "hub")],
                    ignore_index=True)
    return out.sort_values(["kind", "rk"]).reset_index(drop=True)


def hits_oracle_sql(edge_cte: str, n_rounds: int = 2,
                    k: int = 10) -> str:
    """Generated unrolled mirror over a caller-supplied ``edges`` CTE
    yielding bipartite (c, p, w) rows — every raw sum and max
    normalization re-derived by exact integer equality."""
    steps = [f"edges AS ({edge_cte})",
             f"""h1r AS (SELECT c, sum(w * {SCALE})::BIGINT AS s
                         FROM edges GROUP BY c)""",
             f"""h1 AS (SELECT c, ((s * {SCALE})
                        // (SELECT max(s) FROM h1r))::BIGINT AS v
                        FROM h1r)"""]
    for i in range(1, n_rounds + 1):
        steps.append(f"""a{i}r AS (
            SELECT e.p, sum(e.w * h{i}.v)::BIGINT AS s
            FROM edges e JOIN h{i} USING (c) GROUP BY e.p)""")
        steps.append(f"""a{i} AS (
            SELECT p, ((s * {SCALE})
             // (SELECT max(s) FROM a{i}r))::BIGINT AS v FROM a{i}r)""")
        if i < n_rounds:
            steps.append(f"""h{i + 1}r AS (
                SELECT e.c, sum(e.w * a{i}.v)::BIGINT AS s
                FROM edges e JOIN a{i} USING (p) GROUP BY e.c)""")
            steps.append(f"""h{i + 1} AS (
                SELECT c, ((s * {SCALE})
                 // (SELECT max(s) FROM h{i + 1}r))::BIGINT AS v
                FROM h{i + 1}r)""")
    last = n_rounds
    return f"""
        WITH {','.join(steps)}
        SELECT kind, node, score_fp, rk FROM (
            SELECT 'authority' AS kind, p AS node, v AS score_fp,
                   row_number() OVER (ORDER BY v DESC, p) AS rk
            FROM a{last}
        ) WHERE rk <= {k}
        UNION ALL
        SELECT kind, node, score_fp, rk FROM (
            SELECT 'hub' AS kind, c AS node, v AS score_fp,
                   row_number() OVER (ORDER BY v DESC, c) AS rk
            FROM h{last}
        ) WHERE rk <= {k}
        ORDER BY kind, rk
    """
