"""Distributed PageRank (stages/pagerank.py): edge exactness across
block layouts, fixed-point parity with a pure-Python reference, and
the node-limit guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages import pagerank as pr


def _basket_ds(baskets, nparts):
    g, o, it = [], [], []
    for gi, items in enumerate(baskets):
        for oi, item in enumerate(items):
            g.append(gi)
            o.append(oi)
            it.append(item)
    return rd.from_arrow(pa.table({
        "g": pa.array(g, pa.int64()),
        "o": pa.array(o, pa.int64()),
        "it": pa.array(it, pa.int64()),
    })).repartition(nparts)


def _ref_edges(baskets):
    edges = {}
    for items in baskets:
        for p, q in zip(items, items[1:]):
            if p == q:
                continue
            k = (min(p, q), max(p, q))
            edges[k] = edges.get(k, 0) + 1
    return edges


def _ref_pagerank(edges, n_iters):
    adj = {}
    for (a, b), w in edges.items():
        adj.setdefault(a, {})[b] = adj.setdefault(a, {}).get(b, 0) + w
        adj.setdefault(b, {})[a] = adj.setdefault(b, {}).get(a, 0) + w
    wu = {u: sum(nb.values()) for u, nb in adj.items()}
    r = {u: pr.SCALE for u in adj}
    for _ in range(n_iters):
        r = {v: pr.BASE + (pr.D_NUM * sum(
            (w * r[u]) // wu[u] for u, w in adj[v].items())) // pr.D_DEN
            for v in adj}
    return r


BASKETS = [
    [1, 2, 3, 2, 1],
    [2, 4],
    [4, 4, 5],       # self-pair dropped
    [5, 1, 2, 5],
    [7],             # singleton: no edges
    [1, 2],          # repeat edge weight
]


@pytest.mark.parametrize("nparts", [1, 7])
def test_edges_exact_across_block_layouts(ray_session, nparts):
    got = pr.consecutive_pair_edges(
        _basket_ds(BASKETS, nparts), group_col="g", order_col="o",
        item_col="it").to_pandas()
    ref = _ref_edges(BASKETS)
    got_d = {(a, b): w for a, b, w in
             zip(got["a"], got["b"], got["w"])}
    assert got_d == ref


def test_pagerank_matches_reference(ray_session):
    edges = pr.consecutive_pair_edges(
        _basket_ds(BASKETS, 5), group_col="g", order_col="o",
        item_col="it")
    got = pr.pagerank(edges, n_iters=5, k=100)
    ref = _ref_pagerank(_ref_edges(BASKETS), 5)
    assert len(got) == len(ref)
    for _, row in got.iterrows():
        assert ref[row["node"]] == row["score_fp"], row
    # ranking: score desc, node asc
    exp = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(got["node"]) == [n for n, _ in exp]


def test_pagerank_node_limit_guard(ray_session, monkeypatch):
    monkeypatch.setattr(pr, "NODE_LIMIT", 2)
    edges = pr.consecutive_pair_edges(
        _basket_ds(BASKETS, 2), group_col="g", order_col="o",
        item_col="it")
    with pytest.raises(ValueError, match="NODE_LIMIT"):
        pr.pagerank(edges, n_iters=2)
