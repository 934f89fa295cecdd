"""Incremental LSH band index (stages/dedup_index.py): streaming
candidate discovery equals the one-shot run, persists across reopens,
and rejects parameter drift."""

import pandas as pd
import pytest
import ray.data as rd

from ocracle_ray.stages.dedup import MinHasher, make_bucket_pairs_fn
from ocracle_ray.stages.dedup_index import BandIndex

BASE = "fysikk oppgave om krefter og energi i systemet med kloss på skråplan "


def _docs(lo, hi):
    # every key maps to one of 8 near-dup variants -> cross-partition dups
    return [{"doc_id": i, "text": BASE + f"variant {i % 8}"} for i in range(lo, hi)]


def _oneshot_candidates(items):
    """The one-shot LSH candidate set (no verification), same params."""
    ds = rd.from_items(items).repartition(3)
    band_rows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(key="doc_id", text="text", n_perm=128,
                                   k_shingle=3, n_bands=16),
        batch_format="pyarrow",
        concurrency=2,
    )
    out = (
        band_rows.groupby(["band_id", "band_hash"])
        .map_groups(make_bucket_pairs_fn("doc_id", 10_000), batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    return out


def test_incremental_equals_oneshot(tmp_path):
    idx = BandIndex(str(tmp_path / "idx"), max_bucket=10_000)
    p1 = idx.add_partition(rd.from_items(_docs(0, 12)).repartition(2),
                           key="doc_id", text="text")
    p2 = idx.add_partition(rd.from_items(_docs(12, 24)).repartition(2),
                           key="doc_id", text="text")
    got = (
        pd.concat([p1, p2], ignore_index=True)
        .drop_duplicates()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = _oneshot_candidates(_docs(0, 24))
    pd.testing.assert_frame_equal(got, want)
    # cross-partition pairs exist (doc 0 and doc 16 share variant 0)
    assert ((got["a"] < 12) & (got["b"] >= 12)).any()


def test_reopen_continues_and_param_drift_rejected(tmp_path):
    d = str(tmp_path / "idx")
    idx = BandIndex(d, max_bucket=10_000)
    idx.add_partition(rd.from_items(_docs(0, 8)), key="doc_id", text="text")

    reopened = BandIndex(d, max_bucket=10_000)
    assert reopened.n_partitions == 1
    p2 = reopened.add_partition(rd.from_items(_docs(8, 16)), key="doc_id", text="text")
    # every new doc links to its earlier same-variant twin
    assert ((p2["a"] < 8) & (p2["b"] >= 8)).any()

    with pytest.raises(ValueError, match="incompatible"):
        BandIndex(d, n_bands=32, max_bucket=10_000)


def test_empty_and_first_partition(tmp_path):
    idx = BandIndex(str(tmp_path / "idx"), max_bucket=10_000)
    # all-distinct first partition: no pairs, but bands are indexed
    distinct = [{"doc_id": i, "text": f"helt unik tekst nummer {i} " * 3}
                for i in range(5)]
    p = idx.add_partition(rd.from_items(distinct), key="doc_id", text="text")
    assert len(p) == 0 and list(p.columns) == ["a", "b"]
    assert idx.n_partitions == 1


def test_crash_between_rename_and_meta_recovers(tmp_path):
    """Review r3: n_partitions derives from committed dirs, so a crash
    after the rename (before any bookkeeping) cannot brick the index;
    stale bands-*.tmp dirs are swept on open."""
    import os
    import shutil

    d = str(tmp_path / "idx")
    idx = BandIndex(d, max_bucket=10_000)
    idx.add_partition(rd.from_items(_docs(0, 6)), key="doc_id", text="text")
    # simulate: a second append committed its dir but died immediately
    shutil.copytree(os.path.join(d, "bands-00000"), os.path.join(d, "bands-00001"))
    os.makedirs(os.path.join(d, "bands-00002.tmp"))  # and a stale tmp

    reopened = BandIndex(d, max_bucket=10_000)
    assert reopened.n_partitions == 2  # orphan dir counted as committed
    assert not os.path.exists(os.path.join(d, "bands-00002.tmp"))
    p = reopened.add_partition(rd.from_items(_docs(6, 12)), key="doc_id", text="text")
    assert reopened.n_partitions == 3
    assert ((p["a"] < 6) & (p["b"] >= 6)).any()  # joins against ALL committed


def test_empty_partition_does_not_brick_index(tmp_path):
    """Review r3: an empty partition commits an empty dir; later
    appends must not crash on a file-less read."""
    idx = BandIndex(str(tmp_path / "idx"), max_bucket=10_000)
    empty = rd.from_items(_docs(0, 1)).filter(lambda r: False)
    p0 = idx.add_partition(empty, key="doc_id", text="text")
    assert len(p0) == 0 and idx.n_partitions == 1
    p1 = idx.add_partition(rd.from_items(_docs(0, 8)), key="doc_id", text="text")
    assert idx.n_partitions == 2
    assert len(p1) > 0  # new-vs-new pairs still found
