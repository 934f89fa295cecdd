"""Tests: TextStats stage, multimodal stubs, brute-force + IVF search."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocracle_ray.core.textstats import detect_lang, quality_score
from ocracle_ray.stages.knn import IvfIndex, brute_force_topk, deterministic_kmeans
from ocracle_ray.stages.multimodal import (
    FrameSample,
    ImageFeatures,
    Resize,
    synth_media_table,
)
from ocracle_ray.stages.text import annotate_text


# ------------------------------------------------------------- textstats

def test_detect_lang_samples():
    assert detect_lang("the quick brown fox and the lazy dog of it all") == "en"
    assert detect_lang("der Hund und die Katze ist nicht zu Hause mit den Kindern") == "de"
    assert detect_lang("og det er en fin dag på fjellet med mye snø i lufta") in ("nb", "nn")
    assert detect_lang("这是一个中文句子很长的中文文本内容") == "zh"
    assert detect_lang("") == "und"


def test_quality_score_bounds():
    assert quality_score("") <= 0.5
    good = "Dette er en god tekst med mange fine ord som gir mening " * 3
    assert quality_score(good) == 1.0


def test_annotate_text_stage():
    import ray.data as rd

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "the cat and the dog sat on the mat of the house"},
            {"doc_id": 2, "text": ""},
        ]
    )
    df = annotate_text(ds).to_pandas()
    assert set(df.columns) >= {
        "lang_pred", "quality", "tokens_ws", "tokens_bpe", "punct_ratio",
        "text_fingerprint",
    }
    assert df.loc[df.doc_id == 1, "lang_pred"].iloc[0] == "en"
    assert df.loc[df.doc_id == 2, "tokens_ws"].iloc[0] == 0


# ------------------------------------------------------------ multimodal

def test_synth_media_deterministic():
    a, b = synth_media_table(12), synth_media_table(12)
    assert a.equals(b)


def test_image_features_stage():
    import ray.data as rd

    ds = rd.from_arrow(synth_media_table(12))
    out = ds.map_batches(ImageFeatures, batch_format="pyarrow",
                         batch_size=4, concurrency=2).to_pandas()
    assert len(out) == 4  # every 3rd row is an image
    assert (out["mean_intensity"] >= 0).all() and (out["mean_intensity"] <= 255).all()
    assert (out["width"] > 0).all()


def test_resize_stage():
    import ray.data as rd

    ds = rd.from_arrow(synth_media_table(9))
    out = ds.map_batches(Resize, fn_constructor_kwargs={"target": 8},
                         batch_format="pyarrow", concurrency=2).to_pandas()
    assert len(out) == 3
    for p in out["payload"]:
        assert p[:4] == b"IMG1"
        import struct

        w, h = struct.unpack("<HH", p[4:8])
        assert (w, h) == (8, 8)
        assert len(p) == 8 + 64


def test_frame_sample_stage():
    import ray.data as rd

    ds = rd.from_arrow(synth_media_table(9))
    out = ds.map_batches(FrameSample, fn_constructor_kwargs={"every": 2},
                         batch_format="pyarrow", concurrency=2).to_pandas()
    assert (out["frame_index"] % 2 == 0).all()
    assert len(out) > 0


def test_real_codec_is_stubbed():
    import ray.data as rd

    bad = pa.Table.from_pydict(
        {
            "media_id": pa.array([0], pa.int64()),
            "kind": ["image"],
            "payload": pa.array([b"\x89PNG\r\n..."], pa.large_binary()),
            "width": pa.array([0], pa.int32()),
            "height": pa.array([0], pa.int32()),
        }
    )
    with pytest.raises(Exception, match="PIL|NotImplemented"):
        rd.from_arrow(bad).map_batches(
            ImageFeatures, batch_format="pyarrow", concurrency=1
        ).to_pandas()


def test_truncated_jpeg_hits_stub_not_struct_error():
    """A JPEG whose SOF segment is cut short raises struct.error from
    the decoder — ImageFeatures must translate that into the honest
    PIL-stub contract, not crash the actor batch."""
    import ray.data as rd

    bad = pa.Table.from_pydict(
        {
            "media_id": pa.array([0], pa.int64()),
            "kind": ["image"],
            # SOI + truncated SOF0 (5-byte segment, body too short)
            "payload": pa.array(
                [b"\xff\xd8\xff\xc0\x00\x05\x08\x00"], pa.large_binary()
            ),
            "width": pa.array([0], pa.int32()),
            "height": pa.array([0], pa.int32()),
        }
    )
    with pytest.raises(Exception, match="PIL|NotImplemented"):
        rd.from_arrow(bad).map_batches(
            ImageFeatures, batch_format="pyarrow", concurrency=1
        ).to_pandas()


# ------------------------------------------------------------------ knn

def _emb_ds():
    import ray.data as rd

    return rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_brute_force_topk_matches_numpy():
    df = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = unit[0]
    cos = unit @ q
    order = np.lexsort((df["vec_id"].to_numpy(), -cos))
    expect = list(df["vec_id"].to_numpy()[order][:5])

    got = brute_force_topk(_emb_ds(), mat[0], k=5)
    assert list(got["vec_id"]) == expect
    assert list(got["rank"]) == [1, 2, 3, 4, 5]


def test_kmeans_deterministic():
    rng = np.random.RandomState(0)
    x = rng.randn(200, 8)
    a = deterministic_kmeans(x, 4)
    b = deterministic_kmeans(x, 4)
    assert np.array_equal(a, b)


def test_ivf_recall_vs_bruteforce():
    df = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    q = mat[7]
    exact = set(brute_force_topk(_emb_ds(), q, k=10)["vec_id"])
    idx = IvfIndex(_emb_ds(), n_cells=8)
    approx = idx.search(q, k=10, n_probe=4)
    recall = len(set(approx["vec_id"]) & exact) / 10
    assert recall >= 0.5  # measured, not assumed; full probe -> exact
    full = idx.search(q, k=10, n_probe=8)
    assert set(full["vec_id"]) == exact


def test_ivf_search_deterministic_under_cosine_ties():
    """Duplicate embeddings tie exactly at the k-boundary: the
    per-batch truncation must keep the SMALLEST vec_ids (cosine DESC,
    key ASC — the driver resolve and oracle order), not whatever
    argpartition leaves."""
    import ray.data as rd

    n = 20
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    # descending ids so raw batch order disagrees with the tie-break
    t = pa.table(
        {
            "vec_id": pa.array(list(range(2 * n - 1, -1, -1)), pa.int64()),
            "embedding": pa.array(
                [a] * n + [b] * n, pa.list_(pa.float64())
            ),
        }
    )
    ds = rd.from_arrow(t)
    idx = IvfIndex(ds, n_cells=2)
    got = idx.search(np.array(a), k=5, n_probe=2)
    # ids 2n-1..n hold vector `a`: all cosine 1.0, smallest ids win
    assert list(got["vec_id"]) == list(range(n, n + 5))


def test_ivf_pruned_read_equals_filter_scan(tmp_path):
    """index_dir mode: hive-partitioned cell dirs on disk, search reads
    ONLY the probed subset — results identical to the in-memory scan."""
    import os

    df = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    q = mat[7]

    mem = IvfIndex(_emb_ds(), n_cells=8)
    disk = IvfIndex(_emb_ds(), n_cells=8, index_dir=str(tmp_path / "ivf"))

    entries = sorted(os.listdir(tmp_path / "ivf"))
    assert "_IVF_INDEX.json" in entries  # build marker gating rmtree
    cells = [c for c in entries if c != "_IVF_INDEX.json"]
    assert all(c.startswith("cell=") for c in cells) and len(cells) > 1

    for n_probe in (2, 8):
        a = mem.search(q, k=10, n_probe=n_probe)
        b = disk.search(q, k=10, n_probe=n_probe)
        pd.testing.assert_frame_equal(a, b)

    # review r2: rebuilding into the SAME dir must not double rows
    disk2 = IvfIndex(_emb_ds(), n_cells=8, index_dir=str(tmp_path / "ivf"))
    c = disk2.search(q, k=10, n_probe=8)
    pd.testing.assert_frame_equal(c, mem.search(q, k=10, n_probe=8))
    assert not c["vec_id"].duplicated().any()
