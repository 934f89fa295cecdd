"""Distributed PageRank over an edge Dataset — the graph-centrality
op at the "rank vector fits in memory, edge list does not" scale
point (the common web/citation/co-purchase regime: |V| ~ 10^6-10^8,
|E| ~ 10^10+). stages/textrank.py runs the SAME fixed-point math but
folds its vocabulary-sized edge AGGREGATE onto the driver; here the
edges stay a (materialized, reused) Dataset and every damped iteration
is one streaming zero-shuffle pass: the rank vector broadcasts via
``ray.put`` + ``cached_get``, each batch emits in-batch-summed
(dst, contribution) partials, and the driver folds |V|-sized rows —
never |E|. Past NODE_LIMIT you shard the rank vector too (a different
op); the guard raises loud at that boundary.

Exactness: identical to textrank — int64 fixed point scaled by 1e6,
floor division at exactly the two documented points, so the generated
unrolled DuckDB oracle matches by exact integer equality after any
number of iterations.

Edge construction (``consecutive_pair_edges``): consecutive-item
pairs per group key (basket co-purchase, session co-click) from a
sort-once + per-block vectorized pairing; pairs that straddle block
boundaries are recovered from an O(blocks) driver-side seam pass (the
stages/running.py two-pass pattern), so the edge set is EXACT and the
SQL mirror is a plain lag() window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..broadcast import cached_get
from .textrank import BASE, D_DEN, D_NUM, SCALE

NODE_LIMIT = 5_000_000


def consecutive_pairs(ds, *, group_col: str, order_cols: list[str],
                      item_col: str):
    """DIRECTED (p, q) pairs of consecutive items within each group
    (totally ordered by ``order_cols``), item dtype preserved,
    self-pairs KEPT (downstream ops filter per their semantics). Exact
    across block boundaries: within-block pairs come from a vectorized
    pass over the sorted blocks; the O(blocks) seam rows (each block's
    first/last item) pair up on the driver.

    ``order_cols`` must make the sort a TOTAL order within each group
    — (group, order) alone need not be unique (the synthetic lineitem
    duplicates ~20% of its (orderkey, linenumber) pairs, found by the
    sf0.01 oracle); include the item column as the final tiebreak when
    no unique key exists: any remaining ties are then fully-identical
    rows, whose permutation cannot change the pair multiset. The SQL
    mirror orders its lag() window by the same columns."""
    import ray.data as rd

    cols = [group_col, *order_cols, item_col]
    s = ds.select_columns(list(dict.fromkeys(cols))).sort(
        [group_col, *order_cols]).materialize()

    sch = s.schema()
    item_type = dict(zip(sch.names, sch.types))[item_col]

    def within(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False)
        if len(g) < 2:
            return pa.table({"p": pa.array([], item_type),
                             "q": pa.array([], item_type)})
        same = np.nonzero(g[1:] == g[:-1])[0]
        it = t[item_col].combine_chunks()
        return pa.table({
            "p": it.take(pa.array(same, pa.int64())),
            "q": it.take(pa.array(same + 1, pa.int64())),
        })

    def seam(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"g": pa.array([], t.schema.field(group_col).type),
                 **{f"o{i}": pa.array([], t.schema.field(c).type)
                    for i, c in enumerate(order_cols)},
                 "it": pa.array([], item_type),
                 "pos": pa.array([], pa.string())})
        idx = pa.array([0, t.num_rows - 1], pa.int64())
        return pa.table({
            "g": t[group_col].take(idx),
            **{f"o{i}": t[c].take(idx) for i, c in enumerate(order_cols)},
            "it": t[item_col].take(idx),
            "pos": pa.array(["first", "last"], pa.string()),
        })

    # seam pass: blocks are in sorted order; ordering seam rows by the
    # sort key reconstructs the block sequence without block ids
    okeys = [f"o{i}" for i in range(len(order_cols))]
    seams = s.map_batches(seam, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    seams = seams.sort_values(["g", *okeys, "it", "pos"]).reset_index(
        drop=True)
    extra_p, extra_q = [], []
    lasts = seams[seams["pos"] == "last"].reset_index()
    firsts = seams[seams["pos"] == "first"].reset_index()
    # pair each block's last row with the NEXT block's first row
    for i in range(len(lasts) - 1):
        if lasts.loc[i, "g"] == firsts.loc[i + 1, "g"]:
            extra_p.append(lasts.loc[i, "it"])
            extra_q.append(firsts.loc[i + 1, "it"])

    pairs = s.map_batches(within, batch_format="pyarrow", batch_size=None)
    if extra_p:
        pairs = pairs.union(rd.from_arrow(pa.table({
            "p": pa.array(list(extra_p), item_type),
            "q": pa.array(list(extra_q), item_type),
        })))
    return pairs


def consecutive_pair_edges(ds, *, group_col: str, order_col: str,
                           item_col: str):
    """Undirected canonical (a, b, w) int64 edges between consecutive
    items per group, self-pairs dropped — PageRank's edge builder on
    top of ``consecutive_pairs`` (item col as final sort tiebreak)."""
    from ray.data.aggregate import Sum

    pairs = consecutive_pairs(ds, group_col=group_col,
                              order_cols=[order_col, item_col],
                              item_col=item_col)

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "p" not in t.column_names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        p = t["p"].to_numpy(zero_copy_only=False)
        q = t["q"].to_numpy(zero_copy_only=False)
        keep = p != q
        p, q = p[keep], q[keep]
        g = pa.table({
            "a": pa.array(np.minimum(p, q), pa.int64()),
            "b": pa.array(np.maximum(p, q), pa.int64()),
        }).group_by(["a", "b"]).aggregate([("a", "count")])
        return g.rename_columns(["a", "b", "w"])

    return (
        pairs.map_batches(combine, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("w", alias_name="w"))
    )


def pagerank(edges_ds, *, n_iters: int = 8, k: int = 10,
             seed_nodes=None) -> pd.DataFrame:
    """Top-k nodes by fixed-point PageRank over undirected canonical
    (a, b, w) edges. Returns (rk, node, score_fp).

    ``seed_nodes``: PERSONALIZED PageRank (the recommender form —
    "random walk with restart to this seed set"): the teleport mass
    lands only on the seeds (base = BASE·1[v ∈ S], r₀ = SCALE·1[v ∈
    S], both unnormalized — a positive scalar on the teleport vector
    rescales every score identically under this linear update, so the
    RANKING is the |S|-normalized classic one). None = uniform
    teleport (classic PageRank, unchanged)."""
    import ray

    def direct(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            "w": pa.array(np.tile(w, 2), pa.int64()),
        })

    edges = edges_ds.map_batches(direct, batch_format="pyarrow").materialize()

    from ..pipelines.queries import driver_grouped_agg

    deg = driver_grouped_agg(edges, ["src"], {"wu": ("w", "sum")})
    if len(deg) > NODE_LIMIT:
        raise ValueError(
            f"pagerank: {len(deg)} nodes exceed NODE_LIMIT={NODE_LIMIT}; "
            f"shard the rank vector (different op) instead of folding it"
        )
    nodes = np.sort(deg["src"].to_numpy().astype(np.int64))
    wu = np.zeros(len(nodes), np.int64)
    wu[np.searchsorted(nodes, deg["src"].to_numpy().astype(np.int64))] = (
        deg["wu"].to_numpy().astype(np.int64))
    nodes_ref = ray.put(nodes)
    wu_ref = ray.put(wu)

    if seed_nodes is None:
        base_vec = np.full(len(nodes), BASE, np.int64)
        r = np.full(len(nodes), SCALE, np.int64)
    else:
        sm = np.isin(nodes, np.asarray(seed_nodes, np.int64))
        if not sm.any():
            raise ValueError("pagerank: no seed node appears in the "
                             "edge set")
        base_vec = np.where(sm, BASE, 0).astype(np.int64)
        r = np.where(sm, SCALE, 0).astype(np.int64)
    for _ in range(n_iters):
        r_ref = ray.put(r)

        def contrib(t: pa.Table) -> pa.Table:
            nd = cached_get(nodes_ref)
            dg = cached_get(wu_ref)
            rv = cached_get(r_ref)
            src = np.searchsorted(nd, t["src"].to_numpy(zero_copy_only=False))
            dst = np.searchsorted(nd, t["dst"].to_numpy(zero_copy_only=False))
            w = t["w"].to_numpy(zero_copy_only=False)
            c = (w * rv[src]) // dg[src]
            s = np.zeros(len(nd), np.int64)
            np.add.at(s, dst, c)
            nz = np.nonzero(s)[0]
            return pa.table({"i": pa.array(nz, pa.int64()),
                             "s": pa.array(s[nz], pa.int64())})

        acc = np.zeros(len(nodes), np.int64)
        for block in edges.map_batches(
            contrib, batch_format="pyarrow"
        ).iter_batches(batch_size=None, batch_format="pyarrow"):
            i = block["i"].to_numpy(zero_copy_only=False)
            acc[i] += block["s"].to_numpy(zero_copy_only=False)
        r = base_vec + (D_NUM * acc) // D_DEN

    order = np.lexsort((nodes, -r))[:k]
    out = pd.DataFrame({
        "rk": np.arange(1, len(order) + 1, dtype=np.int64),
        "node": nodes[order].astype(np.int64),
        "score_fp": r[order].astype(np.int64),
    })
    return out


def pagerank_oracle_sql(edge_cte: str, n_iters: int = 8,
                        k: int = 10, node_alias: str = "node") -> str:
    """Generated unrolled mirror over a caller-supplied edge CTE that
    must yield canonical undirected (a, b, w) rows."""
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(f"""
        r{i} AS (
            SELECT e.dst AS node,
                   ({BASE} + ({D_NUM} * sum((e.w * r.r) // d.wu))
                    // {D_DEN})::BIGINT AS r
            FROM edges e
            JOIN r{i - 1} r ON r.node = e.src
            JOIN deg d ON d.node = e.src
            GROUP BY e.dst
        )""")
    return f"""
        WITH {edge_cte},
        edges AS (
            SELECT a AS src, b AS dst, w FROM ew
            UNION ALL
            SELECT b AS src, a AS dst, w FROM ew
        ),
        deg AS (SELECT src AS node, sum(w)::BIGINT AS wu
                FROM edges GROUP BY src),
        r0 AS (SELECT node, {SCALE}::BIGINT AS r FROM deg),
        {",".join(iters)},
        ranked AS (
            SELECT node, r AS score_fp,
                   row_number() OVER (ORDER BY r DESC, node) AS rk
            FROM r{n_iters}
        )
        SELECT rk, node AS {node_alias}, score_fp FROM ranked
        WHERE rk <= {k} ORDER BY rk
    """


def ppr_oracle_sql(edge_cte: str, seeds_cte: str, n_iters: int = 8,
                   k: int = 10, node_alias: str = "node") -> str:
    """Generated unrolled mirror of PERSONALIZED PageRank: the caller
    supplies the edge CTE (canonical undirected (a, b, w) rows, named
    ``ew``) and a ``seeds`` CTE body yielding one ``node`` column;
    base and r0 are seed-gated exactly like the engine."""
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(f"""
        r{i} AS (
            SELECT e.dst AS node,
                   (CASE WHEN s.node IS NOT NULL THEN {BASE}
                         ELSE 0 END
                    + ({D_NUM} * sum((e.w * r.r) // d.wu))
                      // {D_DEN})::BIGINT AS r
            FROM edges e
            JOIN r{i - 1} r ON r.node = e.src
            JOIN deg d ON d.node = e.src
            LEFT JOIN seeds s ON s.node = e.dst
            GROUP BY e.dst, s.node
        )""")
    return f"""
        WITH {edge_cte},
        edges AS (
            SELECT a AS src, b AS dst, w FROM ew
            UNION ALL
            SELECT b AS src, a AS dst, w FROM ew
        ),
        deg AS (SELECT src AS node, sum(w)::BIGINT AS wu
                FROM edges GROUP BY src),
        seeds AS ({seeds_cte}),
        r0 AS (SELECT d.node,
                      (CASE WHEN s.node IS NOT NULL THEN {SCALE}
                            ELSE 0 END)::BIGINT AS r
               FROM deg d LEFT JOIN seeds s ON s.node = d.node),
        {",".join(iters)},
        ranked AS (
            SELECT node, r AS score_fp,
                   row_number() OVER (ORDER BY r DESC, node) AS rk
            FROM r{n_iters}
        )
        SELECT rk, node AS {node_alias}, score_fp FROM ranked
        WHERE rk <= {k} ORDER BY rk
    """
