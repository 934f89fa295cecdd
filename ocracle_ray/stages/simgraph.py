"""Distributed EXACT all-pairs cosine machinery for the embedding
similarity-graph family (kcore / triangles / BFS / label-prop /
mutual-NN; VERDICT r4 next-round #2).

The round-3/4 edge builder gathered the corpus to the driver and
broadcast the full matrix to every worker behind a 200k-vector guard.
This module replaces it with the classic blocked all-pairs join
("chunk-pair cover"): hash every vector into one of ``n_chunks``
chunks, replicate each row to the ``n_chunks`` chunk-PAIR groups it
participates in, and let one ``groupby(pair).map_groups`` task score
each chunk pair with a single vectorized matmul.

Exactness: every unordered vector pair {u, v} lands in exactly one
group — (chunk(u), chunk(v)) ordered — so the edge set equals the
brute-force all-pairs result (no LSH recall loss; at cosine tau 0.3
sign-bucket LSH retains <2% of true pairs, which is why the near-dup
bucket machinery in ``stages/dedup.py`` CANNOT feed this family).

Scale shape (100 TB): nothing is broadcast and nothing touches the
driver — per-task memory is O(2·n/B·dim) for B = ``n_chunks`` (pick
B ~ n·dim·8 / worker_heap), shipping cost is the unavoidable B-fold
replication of an exact all-pairs join, compute is the inherent
O(n²·dim/B²) per task across B(B+1)/2 tasks. The O(n²) total work is
the QUERY's semantics (exact threshold graph), not an implementation
artifact; raising tau enough to make LSH recall viable is the
documented cheaper path when approximation is acceptable.

Determinism: chunk id is a pure function of the key (Knuth
multiplicative hash), cosines round to 6 decimals before any
threshold/argmax, ties break to the lowest key — byte-identical
output across block layouts and parallelism levels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KNUTH = np.uint64(2654435761)
_MASK32 = np.uint64(0xFFFFFFFF)


def _chunk_of(keys: np.ndarray, n_chunks: int) -> np.ndarray:
    """Deterministic balanced chunk id: Knuth multiplicative hash of
    the int64 key, mod n_chunks (uint64 ops only — no float
    promotion, see the varint-ladder hazard)."""
    h = (keys.astype(np.uint64) * _KNUTH) & _MASK32
    return (h % np.uint64(n_chunks)).astype(np.int64)


def _unit_rows(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column -> row-normalized float64 matrix."""
    mat = np.stack([np.asarray(v, np.float64) for v in col.to_pylist()])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _fan_out(t: pa.Table, key: str, emb: str, n_chunks: int) -> pa.Table:
    """Replicate each row to its n_chunks chunk-pair groups.
    ``_grp`` = c*B + d with c ≤ d so (c,d) and (d,c) share a group."""
    ids = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
    c = _chunk_of(ids, n_chunks)
    n = len(ids)
    idx_parts, grp_parts, chunk_parts = [], [], []
    for j in range(n_chunks):
        lo = np.minimum(c, j)
        hi = np.maximum(c, j)
        idx_parts.append(np.arange(n))
        grp_parts.append(lo * n_chunks + hi)
        chunk_parts.append(c)
    idx = np.concatenate(idx_parts)
    rep = t.select([key, emb]).take(pa.array(idx))
    return rep.append_column(
        "_grp", pa.array(np.concatenate(grp_parts), pa.int64())
    ).append_column(
        "_chunk", pa.array(np.concatenate(chunk_parts), pa.int64())
    )


def blocked_cosine_edges(ds, key: str, emb: str, *, tau: float,
                         n_chunks: int = 8):
    """EXACT threshold edge Dataset: all (a < b) key pairs with
    round-6 cosine ≥ tau. Returns a Dataset with int64 columns
    (a, b, cos_us) — cosine in integer micro-units so nothing float
    leaves the task."""

    def pairs_closure(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "cos_us": pa.array([], pa.int64()),
        })
        if g.num_rows < 2:
            return empty
        grp = int(g["_grp"][0].as_py())
        c, d = grp // n_chunks, grp % n_chunks
        ids = g[key].to_numpy(zero_copy_only=False).astype(np.int64)
        chunks = g["_chunk"].to_numpy(zero_copy_only=False)
        unit = _unit_rows(g[emb])
        if c == d:
            # within-chunk: all i<j pairs, ordered by key
            order = np.argsort(ids)
            ids, unit = ids[order], unit[order]
            cos = np.round(unit @ unit.T, 6)
            ii, jj = np.triu_indices(len(ids), k=1)
            m = cos[ii, jj] >= tau
            a, b, cv = ids[ii[m]], ids[jj[m]], cos[ii[m], jj[m]]
        else:
            left, right = chunks == c, chunks == d
            la, ra = ids[left], ids[right]
            cos = np.round(unit[left] @ unit[right].T, 6)
            ii, jj = np.nonzero(cos >= tau)
            a, b, cv = la[ii], ra[jj], cos[ii, jj]
            swap = a > b
            a2 = np.where(swap, b, a)
            b2 = np.where(swap, a, b)
            a, b = a2, b2
        return pa.table({
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
            "cos_us": pa.array(
                np.rint(cv * 1_000_000).astype(np.int64), pa.int64()),
        })

    return (
        ds.map_batches(lambda t: _fan_out(t, key, emb, n_chunks),
                       batch_format="pyarrow")
        .groupby("_grp")
        .map_groups(pairs_closure, batch_format="pyarrow")
    )


def blocked_top1(ds, key: str, emb: str, *, n_chunks: int = 8):
    """EXACT global top-1 neighbor Dataset (a, nn, cos_us): per
    chunk-pair group each row reports its LOCAL best (round-6 cosine,
    ties → lowest key), then a second groupby folds partials into the
    global best under the same rule. No corpus broadcast, no driver
    work; each candidate appears in exactly one group so the fold of
    per-group maxima is the true global maximum."""

    def local_best(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "a": pa.array([], pa.int64()),
            "nn": pa.array([], pa.int64()),
            "cos_us": pa.array([], pa.int64()),
        })
        if g.num_rows < 2:
            return empty
        grp = int(g["_grp"][0].as_py())
        c, d = grp // n_chunks, grp % n_chunks
        ids = g[key].to_numpy(zero_copy_only=False).astype(np.int64)
        chunks = g["_chunk"].to_numpy(zero_copy_only=False)
        unit = _unit_rows(g[emb])

        def best_vs(q_ids, q_unit, c_ids, c_unit, exclude_self):
            # candidates ordered by ascending id ⇒ first-max argmax
            # realizes the lowest-id tie rule
            order = np.argsort(c_ids)
            c_ids, c_unit = c_ids[order], c_unit[order]
            cos = np.round(q_unit @ c_unit.T, 6)
            if exclude_self:
                self_col = np.searchsorted(c_ids, q_ids)
                ok = (self_col < len(c_ids))
                rows = np.nonzero(ok)[0]
                cos[rows, self_col[ok]] = np.where(
                    c_ids[self_col[ok]] == q_ids[ok], -2.0,
                    cos[rows, self_col[ok]])
            if cos.shape[1] == 0:
                return None
            bi = np.argmax(cos, axis=1)
            return pa.table({
                "a": pa.array(q_ids, pa.int64()),
                "nn": pa.array(c_ids[bi], pa.int64()),
                "cos_us": pa.array(np.rint(
                    cos[np.arange(len(q_ids)), bi] * 1_000_000
                ).astype(np.int64), pa.int64()),
            })

        parts = []
        if c == d:
            r = best_vs(ids, unit, ids, unit, True)
            if r is not None:
                parts.append(r)
        else:
            left, right = chunks == c, chunks == d
            for qm, cm in ((left, right), (right, left)):
                r = best_vs(ids[qm], unit[qm], ids[cm], unit[cm], False)
                if r is not None:
                    parts.append(r)
        return pa.concat_tables(parts) if parts else empty

    def fold_best(g: pa.Table) -> pa.Table:
        ids = g["a"].to_numpy(zero_copy_only=False)
        nn = g["nn"].to_numpy(zero_copy_only=False)
        cu = g["cos_us"].to_numpy(zero_copy_only=False)
        # global rule: max cos_us, ties → lowest nn id
        order = np.lexsort((nn, -cu))
        k = order[0]
        return pa.table({
            "a": pa.array([int(ids[k])], pa.int64()),
            "nn": pa.array([int(nn[k])], pa.int64()),
            "cos_us": pa.array([int(cu[k])], pa.int64()),
        })

    partials = (
        ds.map_batches(lambda t: _fan_out(t, key, emb, n_chunks),
                       batch_format="pyarrow")
        .groupby("_grp")
        .map_groups(local_best, batch_format="pyarrow")
    )
    return partials.groupby("a").map_groups(
        fold_best, batch_format="pyarrow")


def bfs_hop_census_distributed(edges_ds, *, hops: int):
    """Distributed hop-census BFS from the max-degree node (tie:
    smallest id) — the escape hatch for `q_emb_graph_bfs` past the
    dense-bitset node guard. Per hop: broadcast the frontier/visited
    id arrays, one map pass over the materialized edge Dataset
    emitting per-batch unique new neighbors, driver union. Driver
    state is O(visited nodes); edges never leave the cluster.
    Output matches the driver lane: (hop, seed_vec_id, n_new,
    n_reached) for hops 1..hops."""
    import pandas as pd
    import ray

    from ..broadcast import cached_get

    edges_ds = edges_ds.select_columns(["a", "b"]).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate([
            t["a"].to_numpy(zero_copy_only=False),
            t["b"].to_numpy(zero_copy_only=False)])
        ids, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(ids, pa.int64()),
                         "d": pa.array(cnt, pa.int64())})

    deg = (edges_ds.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("v").sum("d").to_pandas())
    deg = deg.sort_values(["sum(d)", "v"],
                          ascending=[False, True])
    seed = int(deg["v"].iloc[0])

    visited = np.array([seed], np.int64)
    frontier = visited
    rows = []
    for hop in range(1, hops + 1):
        ref = ray.put((np.sort(frontier), np.sort(visited)))

        def new_nodes(t: pa.Table) -> pa.Table:
            fr, vis = cached_get(ref)
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            out = np.concatenate([b[np.isin(a, fr)],
                                  a[np.isin(b, fr)]])
            out = np.unique(out)
            out = out[~np.isin(out, vis)]
            return pa.table({"v": pa.array(out, pa.int64())})

        parts = edges_ds.map_batches(
            new_nodes, batch_format="pyarrow").to_pandas()
        frontier = np.unique(parts["v"].to_numpy(np.int64)) \
            if len(parts) else np.array([], np.int64)
        visited = np.union1d(visited, frontier)
        rows.append({"hop": hop, "n_new": int(len(frontier)),
                     "n_reached": int(len(visited)) - 1})
    out = pd.DataFrame(rows)
    out["seed_vec_id"] = seed
    return out[["hop", "seed_vec_id", "n_new", "n_reached"]].astype(
        "int64")


def lpa_rounds_distributed(vids: np.ndarray, init_labels: np.ndarray,
                           seed_mask: np.ndarray, edges_ds, *,
                           rounds: int) -> np.ndarray:
    """Distributed synchronous seed-clamped label propagation — the
    groupby-mode form of `_lpa_propagate` (the escape hatch
    `q_emb_label_propagation` documents). Per round: broadcast the
    O(nodes) label state, one map pass over the materialized edge
    Dataset emitting per-batch (target, label) vote partials, a
    distributed groupby sum, then the driver resolves each target's
    mode under the exact driver-lane rule (count DESC, label ASC).
    Driver state is O(nodes) + O(distinct (node, label)) vote rows —
    never edges."""
    import ray

    from ..broadcast import cached_get

    edges_ds = edges_ds.select_columns(["a", "b"]).materialize()
    vids = np.asarray(vids, np.int64)
    cur = np.asarray(init_labels, np.int64).copy()
    seed = np.asarray(seed_mask, bool)
    n = len(vids)
    for _ in range(rounds):
        ref = ray.put((vids, cur))

        def votes(t: pa.Table) -> pa.Table:
            ids, labels = cached_get(ref)
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            ia = np.searchsorted(ids, a)
            ib = np.searchsorted(ids, b)
            # guard-don't-hope: an endpoint absent from vids would
            # otherwise silently read a NEIGHBOR's label (searchsorted
            # returns the insertion point, not a miss)
            if (ia >= len(ids)).any() or (ib >= len(ids)).any() \
                    or (ids[np.minimum(ia, len(ids) - 1)] != a).any() \
                    or (ids[np.minimum(ib, len(ids) - 1)] != b).any():
                raise KeyError(
                    "lpa_rounds_distributed: edge endpoint not in the "
                    "node id array — edges must be built over vids")
            la = labels[ia]
            lb = labels[ib]
            tgt = np.concatenate([b[la != -1], a[lb != -1]])
            lab = np.concatenate([la[la != -1], lb[lb != -1]])
            g = pa.table({"tgt": pa.array(tgt, pa.int64()),
                          "lab": pa.array(lab, pa.int64())}) \
                .group_by(["tgt", "lab"], use_threads=False) \
                .aggregate([([], "count_all")])
            return g.rename_columns(["tgt", "lab", "c"])

        agg = (edges_ds.map_batches(votes, batch_format="pyarrow")
               .groupby(["tgt", "lab"]).sum("c").to_pandas())
        upd = np.full(n, -1, np.int64)
        if len(agg):
            rt = np.searchsorted(vids, agg["tgt"].to_numpy(np.int64))
            rl = agg["lab"].to_numpy(np.int64)
            counts = agg["sum(c)"].to_numpy(np.int64)
            o2 = np.lexsort((rl, -counts, rt))
            rt2, rl2 = rt[o2], rl[o2]
            first = np.ones(len(rt2), bool)
            first[1:] = rt2[1:] != rt2[:-1]
            upd[rt2[first]] = rl2[first]
        nxt = cur.copy()
        nxt[~seed] = upd[~seed]
        cur = nxt
    return cur


def triangle_census_distributed(edges_ds):
    """Distributed triangle census — the node-iterator MapReduce
    algorithm (Suri & Vassilvitskii 2011), the escape hatch for
    `q_emb_similarity_triangles` past the dense-bitset node guard:

    1. adjacency rows (v, u) both directions, one groupby(v) pass
       emits each node's open wedges (u < w over its neighbor list —
       the inherent Σ deg² cost of an exact census);
    2. wedge multiplicities + the edge set fold in ONE further
       groupby over the (u, w) pair key: a pair's wedge count joins
       the census iff the pair is itself an edge — each triangle
       matches at exactly its 3 centers, so n_triangles = matches/3;
    3. n_nodes / n_edges / n_wedges come from the degree groupby
       (driver holds one int64 row per node, never edges or wedges).

    Output row matches the driver lane exactly: (n_nodes, n_edges,
    n_triangles, n_wedges, global_cc_ppm)."""
    import pandas as pd

    edges_ds = edges_ds.select_columns(["a", "b"]).materialize()
    n_edges = edges_ds.count()

    def adj(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "v": pa.array(np.concatenate([a, b]), pa.int64()),
            "u": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    def wedges(g: pa.Table) -> pa.Table:
        nb = np.unique(g["u"].to_numpy(zero_copy_only=False))
        if len(nb) < 2:
            return pa.table({"u": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        ii, jj = np.triu_indices(len(nb), k=1)
        return pa.table({"u": pa.array(nb[ii], pa.int64()),
                         "w": pa.array(nb[jj], pa.int64())})

    wedge_rows = (
        edges_ds.map_batches(adj, batch_format="pyarrow")
        .groupby("v")
        .map_groups(wedges, batch_format="pyarrow")
    )

    def wedge_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["u", "w"], use_threads=False) \
            .aggregate([([], "count_all")])
        g = g.rename_columns(["u", "w", "wc"])
        return g.append_column(
            "is_edge", pa.array(np.zeros(g.num_rows, np.int64)))

    def edge_marker(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": t["a"], "w": t["b"],
            "wc": pa.array(np.zeros(t.num_rows, np.int64)),
            "is_edge": pa.array(np.ones(t.num_rows, np.int64)),
        })

    tagged = wedge_rows.map_batches(
        wedge_partial, batch_format="pyarrow"
    ).union(edges_ds.map_batches(edge_marker, batch_format="pyarrow"))

    def matches(g: pa.Table) -> pa.Table:
        has_edge = int(pc.sum(g["is_edge"]).as_py() or 0) > 0
        wc = int(pc.sum(g["wc"]).as_py() or 0)
        return pa.table({
            "m": pa.array([wc if has_edge else 0], pa.int64())})

    total = 0
    for b in (tagged.groupby(["u", "w"])
              .map_groups(matches, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        total += int(pc.sum(b["m"]).as_py() or 0)
    tri = total // 3

    def deg_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate([
            t["a"].to_numpy(zero_copy_only=False),
            t["b"].to_numpy(zero_copy_only=False)])
        ids, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(ids, pa.int64()),
                         "d": pa.array(cnt, pa.int64())})

    deg = (edges_ds.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("v").sum("d").to_pandas())
    d = deg["sum(d)"].to_numpy(np.int64)
    wedges_n = int((d * (d - 1) // 2).sum())
    return pd.DataFrame([{
        "n_nodes": int(len(deg)), "n_edges": int(n_edges),
        "n_triangles": int(tri), "n_wedges": wedges_n,
        "global_cc_ppm": 3 * tri * 1_000_000 // wedges_n
        if wedges_n else 0,
    }]).astype("int64")


def kcore_census_distributed(edges_ds, *, k: int, rounds: int):
    """Distributed k-core peel over an EDGE DATASET — the escape hatch
    the driver-fold `q_emb_kcore` documents for corpora past the edge
    guard. Each round is one degree groupby over the (materialized)
    edges plus a broadcast alive-set filter; the driver only ever
    holds O(alive nodes) int64 ids (never edges, never texts).

    Semantics mirror the driver peel EXACTLY: simultaneous removal of
    every node whose degree among SURVIVING edges is < k, census rows
    (rnd, n_alive, id_xor) for rounds 0..rounds, loud failure if the
    peel has not reached fixpoint by ``rounds``.
    """
    import pandas as pd
    import ray

    from ..broadcast import cached_get

    edges_ds = edges_ds.select_columns(["a", "b"]).materialize()

    def degrees(alive_ref):
        def partial(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            if alive_ref is not None:
                alive = cached_get(alive_ref)  # sorted int64 array
                keep = np.isin(a, alive) & np.isin(b, alive)
                a, b = a[keep], b[keep]
            v = np.concatenate([a, b])
            ids, cnt = np.unique(v, return_counts=True)
            return pa.table({"v": pa.array(ids, pa.int64()),
                             "d": pa.array(cnt, pa.int64())})

        return (
            edges_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("v")
            .sum("d")
        )

    # round 0: every touched node is alive
    deg0 = degrees(None).to_pandas()
    alive = np.sort(deg0["v"].to_numpy(np.int64))

    def census(rnd: int, nodes: np.ndarray) -> dict:
        x = int(np.bitwise_xor.reduce(nodes)) if len(nodes) else 0
        return {"rnd": rnd, "n_alive": int(len(nodes)), "id_xor": x}

    rows = [census(0, alive)]
    converged = False
    for r in range(1, rounds + 1):
        if converged:
            rows.append(census(r, alive))
            continue
        ref = ray.put(alive)
        deg = degrees(ref).to_pandas()
        keep = deg[deg["sum(d)"] >= k]
        new_alive = np.sort(keep["v"].to_numpy(np.int64))
        # alive & deg>=k: nodes absent from deg have degree 0 < k
        new_alive = new_alive[np.isin(new_alive, alive)]
        rows.append(census(r, new_alive))
        converged = len(new_alive) == len(alive) and \
            bool((new_alive == alive).all())
        alive = new_alive
    if not converged:
        raise RuntimeError(
            f"kcore_census_distributed: no fixpoint within {rounds} "
            f"rounds — raise the round budget (the oracle unroll must "
            f"grow with it)")
    return pd.DataFrame(rows).astype("int64")
