"""Round-4 de-drivering of the near-dup pair plumbing (VERDICT r3 #1).

The claim under test: candidate pairs can ride banding → unique →
verify → clustering as a DATASET end-to-end, with the driver never
holding a pair frame. Asserted three ways:

1. lane equivalence — the Dataset lane's verified pairs / clusters
   equal the driver fast lane's on the same corpus;
2. a booby-trapped ``Dataset.to_pandas`` (the dup_winner_map KMV-test
   trick) proves the Dataset lane never pulls anything to the driver;
3. a corpus pushed past a (monkeypatched) ``CANDIDATE_PAIR_LIMIT``
   runs to completion instead of raising, with identical output.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

import ocracle_ray.stages.dedup as dd
from ocracle_ray.stages.dedup import (
    cluster_pairs_ds,
    minhash_lsh_pairs,
    minhash_lsh_pairs_ds,
    neardup_clusters_from_pairs,
    verify_candidate_pairs,
)
from ocracle_ray.stages.dedup_index import BandIndex


def _corpus(n=60, n_dup_groups=8, seed=7):
    """Docs with planted near-dup groups (same base text, one word
    tweaked) plus distinct filler."""
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(50)]
    rows = []
    did = 0
    for g in range(n_dup_groups):
        base = " ".join(rng.choice(words, size=30))
        for v in range(3):
            txt = base + (f" tail{v}" if v else "")
            rows.append({"doc_id": did, "text": txt})
            did += 1
    while did < n:
        rows.append(
            {"doc_id": did, "text": " ".join(rng.choice(words, size=25))}
        )
        did += 1
    return rows


def _pairs_df(x) -> pd.DataFrame:
    if not isinstance(x, pd.DataFrame):
        x = pd.DataFrame(x.take_all())
    if x.empty or "a" not in x.columns:
        return pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )
    return (
        x[["a", "b", "jaccard"]]
        .astype({"a": "int64", "b": "int64", "jaccard": "float64"})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


def test_dataset_lane_equals_driver_lane(ray_session):
    ds = rd.from_items(_corpus()).repartition(4)
    drv = _pairs_df(minhash_lsh_pairs(ds, "doc_id", "text", threshold=0.8,
                                      n_bands=32))
    assert len(drv) > 0  # planted dups must be found
    dist = _pairs_df(minhash_lsh_pairs_ds(ds, "doc_id", "text", threshold=0.8,
                                          n_bands=32))
    pd.testing.assert_frame_equal(drv, dist)


def test_dataset_lane_never_touches_driver(ray_session, monkeypatch):
    """Booby-trap Dataset.to_pandas: the whole pipeline — banding,
    unique, verify, clustering — must run without it. Consumption is
    take_all (the test's own sink, not part of the lane)."""
    ds = rd.from_items(_corpus()).repartition(4)
    expected_pairs = _pairs_df(
        minhash_lsh_pairs(ds, "doc_id", "text", threshold=0.8, n_bands=32)
    )
    expected_clusters = neardup_clusters_from_pairs(expected_pairs)

    def boom(self, *a, **kw):  # pragma: no cover - firing IS the failure
        raise AssertionError("Dataset.to_pandas called in the Dataset lane")

    monkeypatch.setattr(rd.Dataset, "to_pandas", boom)
    pairs_ds = minhash_lsh_pairs_ds(
        ds, "doc_id", "text", threshold=0.8, n_bands=32
    ).materialize()
    clusters_ds = cluster_pairs_ds(pairs_ds, num_partitions=4)
    got_clusters = pd.DataFrame(clusters_ds.take_all())
    got_pairs = _pairs_df(pairs_ds)
    monkeypatch.undo()

    pd.testing.assert_frame_equal(got_pairs, expected_pairs)
    got_clusters = (
        got_clusters.sort_values("key").reset_index(drop=True).astype("int64")
    )
    pd.testing.assert_frame_equal(got_clusters, expected_clusters)


def test_over_limit_corpus_runs_to_completion(ray_session, monkeypatch):
    """Past CANDIDATE_PAIR_LIMIT the one-shot API must dispatch to the
    Dataset lane and return the same verified pairs — the pre-round-4
    behavior was a RuntimeError."""
    ds = rd.from_items(_corpus()).repartition(4)
    expected = _pairs_df(minhash_lsh_pairs(ds, "doc_id", "text", threshold=0.8,
                                           n_bands=32))
    monkeypatch.setattr(dd, "CANDIDATE_PAIR_LIMIT", 1)
    got = _pairs_df(minhash_lsh_pairs(ds, "doc_id", "text", threshold=0.8,
                                      n_bands=32))
    pd.testing.assert_frame_equal(got, expected)


def test_verify_accepts_dataset_candidates(ray_session):
    docs = [
        {"doc_id": 1, "text": "a b c d e f"},
        {"doc_id": 2, "text": "a b c d e f"},
        {"doc_id": 3, "text": "x y z"},
    ]
    ds = rd.from_items(docs)
    cand_pd = pd.DataFrame({"a": [1, 1], "b": [2, 3]})
    # Dataset candidates WITH a duplicated pair: the unique pass must
    # collapse it in both lanes
    cand_ds = rd.from_arrow(
        pa.table({"a": pa.array([1, 1, 1], pa.int64()),
                  "b": pa.array([2, 3, 2], pa.int64())})
    )
    via_pd = verify_candidate_pairs(ds, "doc_id", "text", cand_pd, threshold=0.5)
    via_ds = verify_candidate_pairs(ds, "doc_id", "text", cand_ds, threshold=0.5)
    via_dist = verify_candidate_pairs(
        ds, "doc_id", "text", cand_ds, threshold=0.5, verify_mode="distributed"
    )
    pd.testing.assert_frame_equal(via_pd, via_ds)
    pd.testing.assert_frame_equal(via_pd, via_dist)
    assert via_pd["a"].tolist() == [1]  # (1,2) identical; (1,3) below 0.5


def test_band_index_ds_lane_equals_pandas_lane(tmp_path, ray_session):
    rows = _corpus(n=30, n_dup_groups=4)
    half = len(rows) // 2
    a = BandIndex(str(tmp_path / "a"), n_bands=32)
    b = BandIndex(str(tmp_path / "b"), n_bands=32)

    def run(idx, use_ds):
        outs = []
        for part in (rows[:half], rows[half:]):
            ds = rd.from_items(part).repartition(2)
            if use_ds:
                outs.append(
                    pd.DataFrame(
                        idx.add_partition_ds(ds, key="doc_id", text="text")
                        .take_all()
                    )
                )
            else:
                outs.append(idx.add_partition(ds, key="doc_id", text="text"))
        outs = [o for o in outs if len(o)]
        got = (
            pd.concat(outs, ignore_index=True)[["a", "b"]]
            .astype("int64")
            .drop_duplicates()
        )
        return got.sort_values(["a", "b"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(run(a, False), run(b, True))


def test_band_index_pandas_lane_guard(tmp_path, ray_session, monkeypatch):
    import ocracle_ray.stages.dedup as dedup_mod

    monkeypatch.setattr(dedup_mod, "CANDIDATE_PAIR_LIMIT", 0)
    idx = BandIndex(str(tmp_path / "i"), n_bands=32)
    ds = rd.from_items(_corpus(n=12, n_dup_groups=4))
    with pytest.raises(RuntimeError, match="add_partition_ds"):
        idx.add_partition(ds, key="doc_id", text="text")
    # the Dataset lane has no such ceiling
    idx2 = BandIndex(str(tmp_path / "i2"), n_bands=32)
    out = idx2.add_partition_ds(ds, key="doc_id", text="text")
    assert out.count() > 0
