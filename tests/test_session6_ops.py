"""Engineered-fixture tests for the session-6 operators: the semantics
the synthetic sf corpus can't exercise.

- PPS systematic sampling: a doc heavier than the step must get >1
  pick (multiplicity, not just membership).
- Positional phrase search: overlapping matches, k=3 phrases, and the
  bucket-pruning proof (corrupting every non-query bucket must not
  change the answer).
- Lag-1 autocorr seam: the per-block sufficient-statistics fold must
  equal a single-block brute force under every block layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_pps_multiplicity_when_doc_heavier_than_step(ray_session, tmp_path):
    import ray.data as rd

    from ocracle_ray.stages.prefix import global_prefix_sum
    from ocracle_ray.stages.watermark import knuth_arrival

    # one giant doc (weight 75) among 25 light ones (weight 1):
    # total=100, step=5 -> the giant must collect MULTIPLE picks
    ids = np.arange(26, dtype=np.int64)
    w = np.where(ids == 13, 75, 1).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "w": pa.array(w),
                  "h": pa.array(knuth_arrival(ids).astype(np.int64))})
    scanned, total = global_prefix_sum(
        rd.from_arrow(t).repartition(3),
        order_cols=[("h", "ascending"), ("doc_id", "ascending")],
        val_col="w", out_col="cum")
    assert total == 100
    step = total // 20
    df = scanned.to_pandas().sort_values(["h", "doc_id"])
    picks = df["cum"] // step - (df["cum"] - df["w"]) // step
    sel = df[picks >= 1]
    n_picks = picks[picks >= 1]
    giant = sel[sel["doc_id"] == 13]
    assert len(giant) == 1
    assert int(n_picks[giant.index[0]]) >= 75 // step  # many picks
    # total multiplicity == number of step boundaries crossed
    assert int(n_picks.sum()) == int(df["cum"].max()) // step


def _docs(rows):
    return pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array(rows, pa.string()),
    })


def test_phrase_overlapping_and_k3(ray_session, tmp_path):
    import ray.data as rd

    from ocracle_ray.stages.invindex import build_positional_index, \
        query_index_phrase

    idx = str(tmp_path / "posidx")
    docs = _docs([
        "a a a a",          # "a a" overlaps: 3 matches
        "x a a y a a",      # 2 matches (non-adjacent runs)
        "b c d b c d e",    # "b c d" twice
        "no phrase here",
    ])
    build_positional_index(rd.from_arrow(docs).repartition(2), idx)
    m = query_index_phrase(idx, ["a", "a"])
    assert dict(zip(m["doc_id"], m["n_matches"])) == {0: 3, 1: 2}
    m3 = query_index_phrase(idx, ["b", "c", "d"])
    assert dict(zip(m3["doc_id"], m3["n_matches"])) == {2: 2}
    assert query_index_phrase(idx, ["zz", "qq"]).empty


def test_phrase_query_reads_only_its_buckets(ray_session, tmp_path):
    """Corrupt every bucket the phrase terms do NOT hash to; the
    answer must be unchanged — proving the pruned read."""
    import glob
    import os

    import ray.data as rd

    from ocracle_ray.stages.invindex import N_BUCKETS, \
        build_positional_index, query_index_phrase, term_bucket

    idx = str(tmp_path / "posidx2")
    docs = _docs(["alpha beta gamma alpha beta",
                  "beta alpha beta gamma",
                  "delta epsilon zeta"])
    build_positional_index(rd.from_arrow(docs), idx)
    want = query_index_phrase(idx, ["alpha", "beta"])
    assert len(want) == 2
    keep = {term_bucket(w) for w in ("alpha", "beta")}
    corrupted = 0
    for b in range(N_BUCKETS):
        if b in keep:
            continue
        for f in glob.glob(os.path.join(idx, f"bucket={b}", "*.parquet")):
            with open(f, "wb") as fh:
                fh.write(b"CORRUPTED - a read here must explode")
            corrupted += 1
    assert corrupted > 0, "fixture too small to prove pruning"
    got = query_index_phrase(idx, ["alpha", "beta"])
    pd.testing.assert_frame_equal(got, want)


def test_autocorr_seam_layout_invariant(ray_session, monkeypatch, tmp_path):
    """q_events_autocorr's per-block stats + seam pairs must equal a
    brute-force lag-1 correlation regardless of block layout. Driven
    through a fake events parquet so the whole query runs."""
    import pyarrow.parquet as pq

    from ocracle_ray.pipelines.queries import q_events_autocorr

    rng = np.random.RandomState(5)
    n = 400
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array((1_700_000_000_000_000
                        + rng.permutation(n).astype(np.int64) * 1_000_000)
                       .astype("datetime64[us]"), pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n, np.int64)),
        "event_type": pa.array(rng.choice(["p", "q"], n).tolist()),
        "value": pa.array(np.round(rng.uniform(1, 50, n), 2)),
        "props": pa.array([""] * n),
    })
    sf_dir = str(tmp_path)
    pq.write_table(t, f"{sf_dir}/events.parquet")

    got = q_events_autocorr(sf_dir)

    # brute force in pandas
    df = t.to_pandas()
    df["c"] = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
    rows = []
    for et, g in df.sort_values(["event_type", "ts", "event_id"]).groupby(
            "event_type"):
        x = g["c"].to_numpy()[:-1].astype(np.float64)
        y = g["c"].to_numpy()[1:].astype(np.float64)
        r = np.corrcoef(x, y)[0, 1]
        rows.append({"event_type": et, "n_pairs": len(x),
                     "lag1_r": round(r, 6)})
    want = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(got, want, atol=1e-6, check_dtype=False)


def test_ngram_seam_layout_invariant(ray_session):
    """consecutive_ngram_counts must be exact under every block
    layout, including single-row blocks (a trigram spanning THREE
    blocks — the case the whole-tiny-block carry exists for)."""
    import ray.data as rd

    from ocracle_ray.stages.ngrams_seq import SEP, \
        consecutive_ngram_counts

    rng = np.random.RandomState(17)
    n = 120
    t = pa.table({
        "u": pa.array(rng.randint(0, 5, n), pa.int64()),
        "o": pa.array(np.arange(n, dtype=np.int64)),
        "x": pa.array(rng.choice(["a", "b", "c"], n).tolist()),
    })
    # brute force
    df = t.to_pandas().sort_values(["u", "o"])
    want: dict[str, int] = {}
    for _, g in df.groupby("u"):
        xs = g["x"].tolist()
        for i in range(len(xs) - 2):
            key = SEP.join(xs[i:i + 3])
            want[key] = want.get(key, 0) + 1
    for parts in (1, 3, 16, 60):  # 60 -> 2-row blocks
        ds = rd.from_arrow(t).repartition(parts)
        got = consecutive_ngram_counts(
            ds, group_col="u", order_cols=["o"], item_col="x", n=3)
        gd = dict(zip(got["gram"], got["cnt"]))
        assert gd == want, f"partitions={parts}"
