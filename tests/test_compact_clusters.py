"""Tests: cross-partition compaction and near-dup clustering."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ocracle_ray.pipelines.manifest import compact, run_partitioned
from ocracle_ray.sources.pages import gen_page, pages_table
from ocracle_ray.stages.dedup import neardup_clusters_from_pairs


def test_clusters_union_find():
    pairs = pd.DataFrame({"a": [1, 2, 10, 11], "b": [2, 3, 11, 12]})
    out = neardup_clusters_from_pairs(pairs)
    m = dict(zip(out["key"], out["cluster_id"]))
    assert m == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_clusters_empty():
    out = neardup_clusters_from_pairs(pd.DataFrame({"a": [], "b": []}))
    assert len(out) == 0


def _random_pairs(seed: int, n_nodes: int, n_edges: int) -> pd.DataFrame:
    import numpy as np

    rng = np.random.RandomState(seed)
    a = rng.randint(0, n_nodes, size=n_edges).astype("int64")
    b = rng.randint(0, n_nodes, size=n_edges).astype("int64")
    keep = a != b
    lo, hi = np.minimum(a[keep], b[keep]), np.maximum(a[keep], b[keep])
    return pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()


@pytest.mark.parametrize(
    "pairs",
    [
        # long chain: the pointer-doubling path (pure relabel rounds
        # would need O(n) iterations here)
        pd.DataFrame({"a": list(range(200)), "b": list(range(1, 201))}),
        # star with a late hub: every leaf must reach min key 0
        pd.DataFrame({"a": [0] * 50, "b": list(range(100, 150))}),
        # random sparse graph: many components of varied shapes
        _random_pairs(3, 400, 300),
        # random dense-ish graph: few big components
        _random_pairs(4, 120, 300),
    ],
    ids=["chain", "star", "sparse", "dense"],
)
def test_clusters_groupby_rounds_equals_union_find(ray_session, pairs):
    from ocracle_ray.stages.dedup import cluster_pairs_groupby_rounds

    driver = neardup_clusters_from_pairs(pairs, mode="driver")
    dist = cluster_pairs_groupby_rounds(pairs, num_partitions=4)
    pd.testing.assert_frame_equal(
        driver.sort_values("key").reset_index(drop=True),
        dist.sort_values("key").reset_index(drop=True),
    )


def test_clusters_auto_dispatch(monkeypatch, ray_session):
    """auto mode hands off to the distributed contraction past
    CLUSTER_DRIVER_LIMIT — equality already proven above, here just
    that the dispatch happens."""
    import ocracle_ray.stages.dedup as dd

    pairs = pd.DataFrame({"a": [1, 2], "b": [2, 3]})
    monkeypatch.setattr(dd, "CLUSTER_DRIVER_LIMIT", 1)
    called = {}
    real = dd.cluster_pairs_groupby_rounds

    def spy(p, **kw):
        called["yes"] = True
        return real(p, **kw)

    monkeypatch.setattr(dd, "cluster_pairs_groupby_rounds", spy)
    out = dd.neardup_clusters_from_pairs(pairs)
    assert called.get("yes")
    assert dict(zip(out["key"], out["cluster_id"])) == {1: 1, 2: 1, 3: 1}


def test_compact_cross_partition_dups(tmp_path):
    """Shards that OVERLAP in urls: per-partition dedup leaves one
    winner per url per shard; compact() must leave one global winner."""
    d = tmp_path / "shards"
    d.mkdir()
    # shard 0 holds rows 0..39; shard 1 holds rows 20..59 (overlap 20..39)
    pq.write_table(pages_table(0, 40), str(d / "s0.parquet"))
    pq.write_table(pages_table(20, 40), str(d / "s1.parquet"))
    files = sorted(glob.glob(str(d / "*.parquet")))
    out = str(tmp_path / "out")
    run_partitioned(files, out, concurrency=2)

    def all_urls():
        fs = sorted(glob.glob(os.path.join(out, "part-*", "*.parquet")))
        return pd.concat([pd.read_parquet(f, columns=["url", "warc_ts"]) for f in fs])

    before = all_urls()
    assert before["url"].duplicated().any()  # cross-partition dups exist

    res = compact(out)
    assert res["rewritten_partitions"] >= 1
    assert res["dropped_rows"] > 0

    after = all_urls()
    assert not after["url"].duplicated().any()
    # winner is max warc_ts: row i=20..39 appear in both shards with the
    # SAME warc_ts (same generator row) — compact keeps exactly one copy
    expect_urls = {gen_page(i)["url"] for i in range(60)}
    assert set(after["url"]) == expect_urls

    # idempotent: second compact is a no-op
    res2 = compact(out)
    assert res2 == {"rewritten_partitions": 0, "dropped_rows": 0}


def test_compact_crash_recovery(tmp_path):
    """Leftover part-NNNNN.old / .tmp dirs from a killed compact() are
    recovered/cleaned, not scanned as data partitions."""
    import shutil

    d = tmp_path / "shards"
    d.mkdir()
    pq.write_table(pages_table(0, 30), str(d / "s0.parquet"))
    pq.write_table(pages_table(30, 30), str(d / "s1.parquet"))
    files = sorted(glob.glob(str(d / "*.parquet")))
    out = str(tmp_path / "out")
    run_partitioned(files, out, concurrency=2)

    # simulate: crash after os.rename(part, part.old) — part dir gone
    part1 = os.path.join(out, "part-00001")
    shutil.move(part1, part1 + ".old")
    # and a stale tmp from another kill
    os.makedirs(os.path.join(out, "part-00000.compact.tmp"))

    res = compact(out)
    assert os.path.isdir(part1)          # restored from .old
    assert not os.path.exists(part1 + ".old")
    assert not os.path.exists(os.path.join(out, "part-00000.compact.tmp"))
    assert res == {"rewritten_partitions": 0, "dropped_rows": 0}


def test_compact_distributed_equals_local(tmp_path):
    """Distributed compaction (key-shuffle + per-partition loser lists)
    produces exactly the same surviving rows as driver-dict compact()."""
    from ocracle_ray.pipelines.manifest import compact_distributed

    d = tmp_path / "shards"
    d.mkdir()
    pq.write_table(pages_table(0, 40), str(d / "s0.parquet"))
    pq.write_table(pages_table(20, 40), str(d / "s1.parquet"))
    files = sorted(glob.glob(str(d / "*.parquet")))

    out_a = str(tmp_path / "out_a")
    out_b = str(tmp_path / "out_b")
    run_partitioned(files, out_a, concurrency=2)
    run_partitioned(files, out_b, concurrency=2)

    from ocracle_ray.pipelines.manifest import compact

    ra = compact(out_a)
    rb = compact_distributed(out_b)
    assert ra["dropped_rows"] == rb["dropped_rows"] > 0

    def rows(out):
        fs = sorted(glob.glob(os.path.join(out, "part-*", "*.parquet")))
        df = pd.concat(
            [pd.read_parquet(f, columns=["url", "warc_ts", "text_fingerprint"]) for f in fs]
        )
        return df.sort_values(["url"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(rows(out_a), rows(out_b))
    # idempotent
    assert compact_distributed(out_b) == {"rewritten_partitions": 0, "dropped_rows": 0}
