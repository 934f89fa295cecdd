"""Round-3 review fixes: IVF search driver volume + rmtree guard,
IMG1 truncated-header contract, verify-pairs both-missing parity,
uint64 stratified-sample hash, lang-id tokenizer \\v parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocracle_ray.stages.knn import IvfIndex


def _emb_ds():
    import ray.data as rd

    return rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")


# ------------------------------------------------------------------ knn

def test_ivf_search_driver_candidates_bounded():
    """search() must pull per-batch top-k candidates, not every probed
    row's score (VERDICT r2 'what's wrong' #1): driver-side candidate
    rows <= k * n_batches and strictly < probed row count here."""
    df = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    n_rows = len(df)
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    q = mat[3] / np.linalg.norm(mat[3])

    idx = IvfIndex(_emb_ds(), n_cells=4)
    probe = np.argsort(-(idx.centroids @ q))[:4].astype(np.int32)  # all cells
    k = 5
    cand = idx._candidate_frame(q, k, probe)
    # with batch_size=2048 and sf0.001 (~600 rows in a handful of
    # blocks) the candidate frame is at most k rows per batch
    n_batches_upper = max(1, -(-n_rows // 2048)) + 8  # slack for block splits
    assert len(cand) <= k * n_batches_upper
    assert len(cand) < n_rows
    # and the resolved result still equals the exact top-k
    out = idx.search(mat[3], k=k, n_probe=4)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = unit @ q
    exact = set(np.argsort(-cos, kind="stable")[:k] + df["vec_id"].min())
    # vec_id may not be positional; recompute via ids
    ids = df["vec_id"].to_numpy()
    order = np.lexsort((ids, -cos))
    exact = set(ids[order[:k]])
    assert set(out["vec_id"]) == exact


def test_ivf_index_dir_refuses_foreign_directory(tmp_path):
    """index_dir pointing at a non-empty dir without the build marker
    must raise, never rmtree it (ADVICE r3)."""
    victim = tmp_path / "precious"
    victim.mkdir()
    (victim / "data.txt").write_text("do not delete")
    with pytest.raises(ValueError, match="_IVF_INDEX"):
        IvfIndex(_emb_ds(), n_cells=4, index_dir=str(victim))
    assert (victim / "data.txt").read_text() == "do not delete"


# -------------------------------------------------------------- figures

def test_img1_truncated_header_skips_not_crashes():
    from ocracle_ray.stages.figures import _decode

    assert _decode(b"IMG1") is None
    assert _decode(b"IMG1\x05") is None
    # intact tiny image still decodes
    import struct

    payload = b"IMG1" + struct.pack("<HH", 2, 2) + bytes(4)
    px = _decode(payload)
    assert px is not None and px.shape == (2, 2)


# ---------------------------------------------------------------- dedup

def test_verify_pairs_drops_both_missing_keys():
    """A candidate pair with BOTH keys absent from the corpus is dropped
    by the driver-gather path, matching the distributed join path
    (jaccard(\"\",\"\") is 1.0 and would otherwise survive)."""
    import ray.data as rd

    from ocracle_ray.stages.dedup import (
        _verify_pairs_distributed,
        verify_candidate_pairs,
    )

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "alpha beta gamma delta epsilon"},
            {"doc_id": 2, "text": "alpha beta gamma delta epsilon"},
        ]
    )
    cand = pd.DataFrame({"a": [1, 97], "b": [2, 99]})  # 97/99 absent
    via_driver = verify_candidate_pairs(ds, "doc_id", "text", cand)
    via_dist = _verify_pairs_distributed(
        ds, "doc_id", "text", cand, k_shingle=3, threshold=0.8
    )
    for out in (via_driver, via_dist):
        assert list(out["a"]) == [1] and list(out["b"]) == [2]
        assert out["jaccard"].iloc[0] == 1.0


# -------------------------------------------------------------- queries

def test_stratified_hash_uint64_matches_duckdb():
    """The Knuth hash must agree with the UBIGINT oracle expression for
    doc_ids past the int64*multiplier overflow point (~3.5e9)."""
    import duckdb

    ids = np.array([1, 7, 3_500_000_000, 2**62 + 12345], dtype=np.int64)
    h_py = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2147483648)
    # the oracle form: reduce both factors mod 2^31 first (2^31 | 2^64,
    # so this equals the uint64 wraparound result) — never overflows
    h_sql = duckdb.sql(
        "SELECT ((i % 2147483648) * 506952113) % 2147483648 AS h"
        " FROM (SELECT UNNEST([1, 7, 3500000000, 4611686018427400249]) AS i)"
    ).fetchnumpy()["h"].astype(np.uint64)
    assert (h_py == h_sql).all()


# ------------------------------------------------------------- textstats

def test_langid_tokenizer_no_vertical_tab_split():
    """RE2 '\\s' is [\\t\\n\\f\\r ]; the Python tokenizer must not split
    on \\v or it diverges from the generated docs_langid oracle."""
    from ocracle_ray.core.textstats import _WS_ASCII_RE

    assert _WS_ASCII_RE.split("a\vb") == ["a\vb"]
    assert _WS_ASCII_RE.split("a b\tc\nd\re\ff") == ["a", "b", "c", "d", "e", "f"]


# --------------------------------------------------- dup_winner_map KMV

def test_kmv_precheck_skips_merge_loop(tmp_path, monkeypatch):
    """VERDICT r2 #7: a high-cardinality key read must go straight to
    the shuffle path on the KMV ESTIMATE — the driver merge loop is
    never entered (asserted by making it explode)."""
    import pyarrow.parquet as pq

    from ocracle_ray.pipelines import extraction
    from ocracle_ray.sources.pages import pages_table

    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages_table(0, 60), p)  # 60 distinct urls

    def boom(*a, **k):
        raise AssertionError("merge loop entered despite KMV pre-check")

    monkeypatch.setattr(extraction, "_stream_merge_partials", boom)
    winners, ambiguous = extraction.dup_winner_map([p], limit=10)
    assert winners is None and ambiguous is None


def test_kmv_precheck_headroom_allows_near_limit(tmp_path):
    """An input NEAR the limit (within KMV head-room) must still build
    the winner map — the pre-check only skips obvious overshoot."""
    import pyarrow.parquet as pq

    from ocracle_ray.pipelines.extraction import dup_winner_map
    from ocracle_ray.sources.pages import pages_table

    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages_table(0, 50), p)
    winners, ambiguous = dup_winner_map([p], limit=50)
    assert winners is not None


def test_clamp_join_partitions_budget():
    """The clamp keeps desired counts below the session CPU budget
    (4 * cpus / n_joins) but never shrinks the floor."""
    from ocracle_ray.pool import clamp_join_partitions, session_cpus

    cpus = session_cpus()
    cap = max(8, (4 * cpus) // 2)
    assert clamp_join_partitions(10_000, n_joins=2) == cap
    assert clamp_join_partitions(4, n_joins=2) == 4  # below cap: untouched


def test_join_cpu_reservation_guard_sets_and_restores():
    """Inside the guard the join CPU override caps total aggregator
    reservation at half the session; outside it is restored."""
    from ray.data import DataContext

    from ocracle_ray.pool import join_cpu_reservation_guard, session_cpus

    ctx = DataContext.get_current()
    before = ctx.join_operator_actor_num_cpus_per_partition_override
    n_parts, n_joins = 13, 2
    with join_cpu_reservation_guard(n_parts, n_joins=n_joins):
        per_part = ctx.join_operator_actor_num_cpus_per_partition_override
        assert per_part is not None
        assert per_part <= 0.125
        assert per_part * n_parts * n_joins <= session_cpus() / 2 + 1e-9
    assert ctx.join_operator_actor_num_cpus_per_partition_override == before


def test_distributed_verify_large_pairset_small_session():
    """Regression for the round-3 livelock: a pair volume that pushes
    n_parts past 8 must complete on the small test session (two 13-way
    joins unguarded reserved 3.25 of 4 CPUs and hung forever)."""
    import pandas as pd
    import ray.data as rd

    from ocracle_ray.stages.dedup import verify_candidate_pairs

    n = 1200
    texts = ["samme tekst i alle dokumenter for verifisering her"] * n
    ds = rd.from_arrow(pa.table({"doc_id": list(range(n)), "text": texts}))
    # ALL unique pairs: C(1200, 2) = 719,400 -> n_parts = 14, past the
    # livelock point (13-way was the reproduced hang)
    ia, ib = np.triu_indices(n, k=1)
    cand = pd.DataFrame({"a": ia.astype(np.int64), "b": ib.astype(np.int64)})
    out = verify_candidate_pairs(ds, "doc_id", "text", cand,
                                 verify_mode="distributed", threshold=0.5)
    assert len(out) == len(cand)
    assert (out["jaccard"] == 1.0).all()


def test_driver_grouped_agg_aborts_on_high_cardinality(ray_session):
    """The driver-fold aggregate must fail loudly when the group key's
    cardinality floods the partial stream (guard-don't-hope), naming
    the distributed groupby as the fix."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from ocracle_ray.pipelines.queries import driver_grouped_agg

    df = pd.DataFrame({"k": range(3000), "v": [1.0] * 3000})
    ds = rd.from_pandas(df).repartition(4)
    with pytest.raises(RuntimeError, match="distributed groupby"):
        driver_grouped_agg(
            ds, ["k"], {"s": ("v", "sum")}, max_partial_rows=500
        )
    # under the cap the same call folds normally
    small = driver_grouped_agg(
        ds, ["k"], {"s": ("v", "sum")}, max_partial_rows=10_000
    )
    assert len(small) == 3000 and float(small["s"].sum()) == 3000.0
