"""Blocked (chunk-pair) exact all-pairs cosine machinery vs brute
force: the distributed edge source for the similarity-graph family
must equal the O(n^2) numpy reference for any chunking, since every
unordered pair lands in exactly one chunk-pair group."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ocracle_ray.stages.simgraph import (_chunk_of, blocked_cosine_edges,
                                         blocked_top1)


def _corpus(n=60, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    ids = rng.permutation(n * 3)[:n].astype(np.int64)  # sparse ids
    mat = rng.randn(n, dim)
    # plant exact duplicates and near-dups so ties and high-cos pairs exist
    mat[7] = mat[3]
    mat[11] = mat[5] + 1e-9 * rng.randn(dim)
    return ids, mat


def _brute_edges(ids, mat, tau):
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = np.round(unit @ unit.T, 6)
    out = []
    n = len(ids)
    for i in range(n):
        for j in range(n):
            if ids[i] < ids[j] and cos[i, j] >= tau:
                out.append((ids[i], ids[j],
                            int(np.rint(cos[i, j] * 1_000_000))))
    return sorted(out)


def _brute_top1(ids, mat):
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = np.round(unit @ unit.T, 6)
    out = {}
    for i in range(len(ids)):
        best, best_id = -2.0, None
        for j in range(len(ids)):
            if j == i:
                continue
            c = cos[i, j]
            if c > best or (c == best and ids[j] < best_id):
                best, best_id = c, ids[j]
        out[int(ids[i])] = (int(best_id), int(np.rint(best * 1_000_000)))
    return out


def _ds(ids, mat, blocks=5):
    df = pd.DataFrame({"vec_id": ids,
                       "embedding": [row.tolist() for row in mat]})
    return rd.from_pandas(df).repartition(blocks)


@pytest.mark.parametrize("n_chunks", [1, 3, 8])
@pytest.mark.parametrize("tau", [0.3, 0.95])
def test_blocked_edges_equal_brute_force(ray_session, n_chunks, tau):
    ids, mat = _corpus()
    got = blocked_cosine_edges(_ds(ids, mat), "vec_id", "embedding",
                               tau=tau, n_chunks=n_chunks).to_pandas()
    got_t = sorted(zip(got["a"].astype("int64"),
                       got["b"].astype("int64"),
                       got["cos_us"].astype("int64")))
    assert got_t == _brute_edges(ids, mat, tau)


@pytest.mark.parametrize("n_chunks", [1, 4, 7])
def test_blocked_top1_equal_brute_force(ray_session, n_chunks):
    ids, mat = _corpus(n=45)
    got = blocked_top1(_ds(ids, mat), "vec_id", "embedding",
                       n_chunks=n_chunks).to_pandas()
    assert len(got) == len(ids)
    want = _brute_top1(ids, mat)
    for a, nn, cu in zip(got["a"].astype("int64"),
                         got["nn"].astype("int64"),
                         got["cos_us"].astype("int64")):
        assert want[int(a)] == (int(nn), int(cu)), f"vec {a}"


def test_chunk_of_is_deterministic_and_balanced():
    keys = np.arange(100_000, dtype=np.int64)
    c = _chunk_of(keys, 16)
    assert (c == _chunk_of(keys, 16)).all()
    counts = np.bincount(c, minlength=16)
    assert counts.min() > 0.8 * counts.mean()
    assert counts.max() < 1.2 * counts.mean()


def test_kcore_distributed_equals_driver_peel(ray_session):
    """The distributed degree-filter peel must reproduce the driver
    fold's full census trajectory (incl. membership XOR per round)
    on a graph engineered to peel over several rounds."""
    from ocracle_ray.stages.simgraph import kcore_census_distributed

    # path-cube (i ~ i+1, i+2, i+3): at k=4 the ends have degree 3 and
    # peel; each removal drops the next node below 4 → the erosion
    # cascades inward one layer per round. A 6-clique core survives.
    edges = []
    m = 10
    for i in range(m):
        for d in (1, 2, 3):
            if i + d < m:
                edges.append((i, i + d))
    for i in range(6):
        for j in range(i + 1, 6):
            edges.append((100 + i, 100 + j))
    edges.append((m - 1, 100))
    a = np.array([e[0] for e in edges], np.int64)
    b = np.array([e[1] for e in edges], np.int64)

    k, rounds = 4, 12
    # driver peel (the q_emb_kcore fold, re-derived)
    nodes = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    alive = np.ones(len(nodes), bool)

    def census(rnd, mask):
        ids = nodes[mask]
        return {"rnd": rnd, "n_alive": int(mask.sum()),
                "id_xor": int(np.bitwise_xor.reduce(ids)) if len(ids)
                else 0}

    want = [census(0, alive)]
    for r in range(1, rounds + 1):
        keep = alive[ai] & alive[bi]
        deg = np.zeros(len(nodes), np.int64)
        np.add.at(deg, ai[keep], 1)
        np.add.at(deg, bi[keep], 1)
        alive = alive & (deg >= k)
        want.append(census(r, alive))
    want_df = pd.DataFrame(want).astype("int64")
    assert want_df["n_alive"].nunique() > 3  # multi-round peel

    edges_ds = rd.from_pandas(
        pd.DataFrame({"a": a, "b": b})).repartition(4)
    got = kcore_census_distributed(edges_ds, k=k, rounds=rounds)
    pd.testing.assert_frame_equal(got, want_df)


def test_bfs_distributed_matches_driver_query(ray_session):
    """Distributed frontier-join BFS == the driver bitset lane, via
    the real query at sf0.001 under the force flag."""
    import os

    from ocracle_ray.pipelines.queries import q_emb_graph_bfs

    want = q_emb_graph_bfs("/root/testdata/sf0.001")
    os.environ["GRAFT_GRAPH_DISTRIBUTED"] = "1"
    try:
        got = q_emb_graph_bfs("/root/testdata/sf0.001")
    finally:
        del os.environ["GRAFT_GRAPH_DISTRIBUTED"]
    pd.testing.assert_frame_equal(got, want)


def test_lpa_distributed_matches_driver_query(ray_session):
    import os

    from ocracle_ray.pipelines.queries import q_emb_label_propagation

    want = q_emb_label_propagation("/root/testdata/sf0.001")
    os.environ["GRAFT_GRAPH_DISTRIBUTED"] = "1"
    try:
        got = q_emb_label_propagation("/root/testdata/sf0.001")
    finally:
        del os.environ["GRAFT_GRAPH_DISTRIBUTED"]
    pd.testing.assert_frame_equal(got, want)


def test_lpa_distributed_vote_rule_on_engineered_ties(ray_session):
    """The distributed groupby-mode must reproduce _lpa_propagate's
    exact tie rule (count DESC, label ASC; abstaining -1 neighbors;
    isolated non-seeds -> -1) on a crafted tie graph."""
    from ocracle_ray.pipelines.queries import _lpa_propagate
    from ocracle_ray.stages.simgraph import lpa_rounds_distributed

    vids = np.arange(10, dtype=np.int64) * 3  # sparse ids
    # node 0,1 seeds with labels 7 and 2; node 2 neighbors both (tie
    # -> smaller label 2); node 3 chain; node 9 isolated
    seed = np.zeros(10, bool)
    seed[[0, 1]] = True
    labs = np.full(10, -1, np.int64)
    labs[0], labs[1] = 7, 2
    edges = [(0, 2), (1, 2), (2, 3), (3, 4), (4, 5), (0, 6), (6, 7)]
    a = np.array([vids[x] for x, _ in edges], np.int64)
    b = np.array([vids[y] for _, y in edges], np.int64)
    want = _lpa_propagate(vids, labs, seed, a, b, 3)
    edges_ds = rd.from_pandas(
        pd.DataFrame({"a": a, "b": b})).repartition(3)
    got = lpa_rounds_distributed(vids, labs, seed, edges_ds, rounds=3)
    assert np.array_equal(got, want)


def test_lpa_distributed_unknown_endpoint_fails_loud(ray_session):
    """An edge endpoint missing from vids must raise (searchsorted
    would otherwise silently read a neighbor's label)."""
    from ocracle_ray.stages.simgraph import lpa_rounds_distributed

    vids = np.array([0, 10, 20], np.int64)
    seed = np.array([True, False, False])
    labs = np.array([1, -1, -1], np.int64)
    edges_ds = rd.from_pandas(pd.DataFrame(
        {"a": np.array([0, 5], np.int64),   # 5 not in vids
         "b": np.array([10, 20], np.int64)}))
    with pytest.raises(Exception, match="endpoint not in"):
        lpa_rounds_distributed(vids, labs, seed, edges_ds, rounds=1)


def test_triangles_distributed_matches_driver_query(ray_session):
    import os

    from ocracle_ray.pipelines.queries import q_emb_similarity_triangles

    want = q_emb_similarity_triangles("/root/testdata/sf0.001")
    os.environ["GRAFT_GRAPH_DISTRIBUTED"] = "1"
    try:
        got = q_emb_similarity_triangles("/root/testdata/sf0.001")
    finally:
        del os.environ["GRAFT_GRAPH_DISTRIBUTED"]
    pd.testing.assert_frame_equal(got, want)


def test_triangles_distributed_known_graph(ray_session):
    """Node-iterator census on a hand-countable graph: K4 (4
    triangles) + a C5 (0) + one extra chord on the C5 (1)."""
    from ocracle_ray.stages.simgraph import triangle_census_distributed

    edges = []
    for i in range(4):
        for j in range(i + 1, 4):
            edges.append((i, j))          # K4: 4 triangles, 6 edges
    cyc = [10, 11, 12, 13, 14]
    for i in range(5):
        edges.append((cyc[i], cyc[(i + 1) % 5]))  # C5: 0 triangles
    edges.append((10, 12))                # chord -> exactly 1 triangle
    a = np.array([min(e) for e in edges], np.int64)
    b = np.array([max(e) for e in edges], np.int64)
    ds = rd.from_pandas(pd.DataFrame({"a": a, "b": b})).repartition(3)
    got = triangle_census_distributed(ds)
    assert got["n_nodes"].iloc[0] == 9
    assert got["n_edges"].iloc[0] == len(edges)
    assert got["n_triangles"].iloc[0] == 5
    deg = np.zeros(20, np.int64)
    for x, y in edges:
        deg[x] += 1
        deg[y] += 1
    assert got["n_wedges"].iloc[0] == int((deg * (deg - 1) // 2).sum())


def test_blocked_edges_layout_invariant(ray_session):
    """Output is byte-identical across input block layouts (the
    flagship's determinism rule applied to the edge source)."""
    ids, mat = _corpus(n=40)
    a = blocked_cosine_edges(_ds(ids, mat, blocks=1), "vec_id",
                             "embedding", tau=0.5).to_pandas()
    b = blocked_cosine_edges(_ds(ids, mat, blocks=9), "vec_id",
                             "embedding", tau=0.5).to_pandas()
    key = ["a", "b", "cos_us"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True)[key],
        b.sort_values(key).reset_index(drop=True)[key])
