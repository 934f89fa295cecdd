"""Round-4 ADVICE regression tests.

Each test pins one of the round-3 advice findings:
- kmv_distinct_estimate must skip NULLs (COUNT(DISTINCT) parity);
- verify_candidate_pairs must reject unknown verify_mode strings;
- running_sum segment totals stay int64 (no float64 bincount detour);
- range_join_count raises loud on null timestamps.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.core.sketch import kmv_distinct_estimate
from ocracle_ray.stages.dedup import verify_candidate_pairs
from ocracle_ray.stages.range_join import range_join_count
from ocracle_ray.stages.running import running_sum_to_parquet


def test_kmv_estimate_skips_nulls(ray_session):
    """A null-bearing key column must estimate COUNT(DISTINCT x) —
    which skips NULLs — not distinct-values-plus-one (advice r3:
    pd.util.hash_array hashes NaN/None to a real bucket)."""
    ids = [float(i) for i in range(40)] + [None] * 10
    ds = rd.from_arrow(pa.table({"id": pa.array(ids, pa.float64())}))
    est = kmv_distinct_estimate(ds, "id", k=256)
    assert est == 40.0  # exact below k; 41.0 would mean NULL was counted

    # string column, None nulls (object path through hash_array)
    vals = [f"u{i % 7}" for i in range(30)] + [None] * 5
    ds2 = rd.from_arrow(pa.table({"s": pa.array(vals, pa.string())}))
    assert kmv_distinct_estimate(ds2, "s", k=256) == 7.0


def test_verify_mode_typo_raises(ray_session):
    ds = rd.from_items([{"doc_id": 1, "text": "a b c"}, {"doc_id": 2, "text": "a b c"}])
    cand = pd.DataFrame({"a": [1], "b": [2]})
    with pytest.raises(ValueError, match="verify_mode"):
        verify_candidate_pairs(ds, "doc_id", "text", cand, verify_mode="dist")
    with pytest.raises(ValueError, match="verify_mode"):
        verify_candidate_pairs(ds, "doc_id", "text", cand, verify_mode="DRIVER")


def test_run_totals_int64_exact_past_2_53():
    """A run whose cent total exceeds 2^53 must stay exact. float64
    accumulation (the old bincount(weights=) path) round-half-evens
    2^53 + 3 to 2^53 + 4; np.add.reduceat keeps int64 end to end."""
    from ocracle_ray.stages.running import _run_totals

    big = (2**53 + 3) // 100 * 100  # even -> float64-representable
    rem = (2**53 + 3) - big
    c = np.array([big, rem, 5], dtype=np.int64)
    starts = np.array([0, 2])  # run 1: [big, rem]; run 2: [5]
    totals = _run_totals(c, starts)
    assert totals.dtype == np.int64
    assert totals.tolist() == [2**53 + 3, 5]
    # the old path really was lossy (documents WHY the helper exists)
    lossy = np.bincount(np.array([0, 0, 1]), weights=c.astype(np.float64))
    assert int(lossy[0]) != 2**53 + 3


def test_running_sum_still_green_end_to_end(tmp_path, ray_session):
    """The reduceat swap must not change ordinary-scale results."""
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [7, 7, 8],
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-01"]
            ).astype("datetime64[us]"),
            "value": [1.25, 2.50, 4.00],
        }
    )
    out_dir = str(tmp_path / "rs")
    running_sum_to_parquet(rd.from_pandas(df).repartition(2), out_dir)
    import glob

    written = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(out_dir + "/*.parquet")],
        ignore_index=True,
    ).sort_values("event_id")
    assert written["running_cents"].tolist() == [125, 375, 400]


def test_range_join_null_ts_raises(ray_session):
    df = pd.DataFrame(
        {
            "event_id": [1, 2],
            "user_id": [1, 1],
            "ts": pd.to_datetime(["2024-01-01", pd.NaT]).astype("datetime64[us]"),
            "event_type": ["click", "view"],
        }
    )
    ds = rd.from_pandas(df)
    with pytest.raises(Exception, match="null timestamp"):
        range_join_count(ds, window=pd.Timedelta(hours=1)).to_pandas()


# ------------------------- broadcast verify lane (round-4 late work)


def _neardup_ds(n=24):
    base = "fysikk oppgave om krefter og energi i systemet med kloss "
    return rd.from_items(
        [{"key": i, "text": base + f"variant {i % 8}"} for i in range(n)]
    ).repartition(4)


def test_broadcast_verify_equals_join_lane(ray_session):
    """The zero-exchange broadcast lane and the two-join lane return
    identical verified pairs (same jaccard values, same order)."""
    from ocracle_ray.stages import dedup as dd

    ds = _neardup_ds()
    auto = dd.minhash_lsh_pairs(ds, "key", "text", threshold=0.8)
    dist = dd.minhash_lsh_pairs(
        ds, "key", "text", threshold=0.8, verify_mode="distributed"
    )
    pd.testing.assert_frame_equal(auto, dist)
    assert len(auto) > 0


def test_broadcast_verify_missing_key_semantics(ray_session):
    """Pairs whose keys are absent from the corpus: both-missing drops
    (join parity); one-side-missing scores against '' and drops below
    any positive threshold."""
    from ocracle_ray.stages import dedup as dd

    ds = rd.from_items(
        [{"key": i, "text": "helt lik tekst om fysikk og energi"} for i in (1, 2)]
    )
    cand = pd.DataFrame({"a": [1, 1, 90], "b": [2, 91, 91]})
    out = verify_candidate_pairs(ds, "key", "text", cand, threshold=0.5)
    assert out[["a", "b"]].values.tolist() == [[1, 2]]
    assert float(out["jaccard"].iloc[0]) == 1.0


def test_broadcast_lane_guard_raises_past_cap(ray_session, monkeypatch):
    """Explicit 'driver' mode past GATHER_TEXT_LIMIT still raises loud
    (the ADVICE r3 hard cap, now enforced by the broadcast lane)."""
    from ocracle_ray.stages import dedup as dd

    ds = _neardup_ds(8)
    cand = pd.DataFrame({"a": [0, 1, 2], "b": [8 + 0, 8 + 1, 8 + 2]})
    monkeypatch.setattr(dd, "GATHER_TEXT_LIMIT", 3)
    with pytest.raises(RuntimeError, match="GATHER_TEXT_LIMIT"):
        verify_candidate_pairs(ds, "key", "text", cand, verify_mode="driver")


def test_minhash_auto_dispatch_never_pulls_pair_frame(ray_session, monkeypatch):
    """In the broadcast-lane regime the pair set must stay in the
    object store: booby-trap the driver unique helper."""
    from ocracle_ray.stages import dedup as dd

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("driver pair frame pulled in broadcast lane")

    monkeypatch.setattr(dd, "_dedup_candidates", boom)
    out = dd.minhash_lsh_pairs(_neardup_ds(), "key", "text", threshold=0.8)
    assert len(out) > 0


def test_text_map_cache_reuse(ray_session):
    """_text_map caches the built dict per broadcast object (worker
    processes reuse it across scoring tasks)."""
    import ray

    from ocracle_ray.stages import dedup as dd

    dd._TEXT_MAP_CACHE.clear()
    t = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "txt": pa.array(["a", "b"], pa.large_string())})
    refs_obj = ray.put([ray.put(t)])
    m1, memo1 = dd._text_map(refs_obj)
    m2, memo2 = dd._text_map(refs_obj)
    assert m1 is m2 and memo1 is memo2 and m1 == {1: "a", 2: "b"}
