"""Round-2 regression tests: VERDICT.md "Next round" items 1-5 and the
ADVICE.md null-warc_ts / crash-recovery findings."""

import glob
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocracle_ray.pipelines.extraction import (
    dup_winner_map,
    extract_records,
    extract_records_from_paths,
    read_pages,
)
from ocracle_ray.pipelines.manifest import (
    compact,
    compact_distributed,
    run_partitioned,
)
from ocracle_ray.sources.pages import pages_table


def _with_null_ts_dups(start: int, count: int, n_dups: int) -> pa.Table:
    """pages_table(start, count) plus ``n_dups`` extra copies of the
    first urls whose warc_ts is NULL and whose html differs (so the
    surviving copy is observable via text_fingerprint)."""
    base = pages_table(start, count)
    cols = {name: base[name].to_pylist() for name in base.column_names}
    for i in range(n_dups):
        cols["url"].append(cols["url"][i])
        cols["warc_ts"].append(None)
        cols["html"].append(cols["html"][i] + b"<p>endret null-ts kopi</p>")
        cols["text"].append(cols["text"][i])
        cols["lang"].append(cols["lang"][i])
    arrays = [pa.array(cols[f.name], type=f.type) for f in base.schema]
    return pa.Table.from_arrays(arrays, schema=base.schema)


def _kept(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[["url", "text_fingerprint"]]
        .sort_values(["url", "text_fingerprint"])
        .reset_index(drop=True)
    )


def test_null_ts_identical_across_dedup_modes(tmp_path):
    """ADVICE #1: a null-ts copy must LOSE (epoch-0 convention) in BOTH
    broadcast and shuffle dedup modes — byte-identical survivors."""
    p = str(tmp_path / "pages.parquet")
    pq.write_table(_with_null_ts_dups(0, 12, 4), p)

    winners, ambiguous = dup_winner_map([p])
    assert winners and not ambiguous  # null != real ts -> unambiguous

    broadcast = extract_records(read_pages([p]), dup_winners=winners).to_pandas()
    shuffle = extract_records(read_pages([p])).to_pandas()

    base = extract_records(read_pages([p]), dedup=False).to_pandas()
    assert len(broadcast) == base["url"].nunique()  # dups removed in both modes
    pd.testing.assert_frame_equal(_kept(broadcast), _kept(shuffle))

    # the survivor per dup url is the max-(ts, fp) copy with null ts
    # counted as epoch 0 — i.e. the null-ts rewrite always LOSES
    base["_ts"] = base["warc_ts"].fillna(pd.Timestamp(0))
    expect = (
        base.sort_values(["url", "_ts", "text_fingerprint"])
        .groupby("url")
        .tail(1)
        .set_index("url")["text_fingerprint"]
    )
    kept = shuffle.set_index("url")["text_fingerprint"]
    for u in base["url"][base["url"].duplicated()].unique():
        assert kept[u] == expect[u]


def test_dup_winner_map_stream_abort(tmp_path):
    """VERDICT #1: the driver-map guard fires MID-merge, returning the
    (None, None) sentinel, and the auto path still dedups correctly via
    the shuffle fallback."""
    d = tmp_path / "shards"
    d.mkdir()
    for s in range(3):
        pq.write_table(pages_table(s * 20, 20), str(d / f"s{s}.parquet"))
    files = sorted(glob.glob(str(d / "*.parquet")))

    winners, ambiguous = dup_winner_map(files, limit=10)  # 60 urls >> 10
    assert winners is None and ambiguous is None

    # unlimited map still works (the same data, guard not hit)
    full_winners, full_amb = dup_winner_map(files)
    assert full_winners is not None

    # auto path under a tiny limit == auto path under no pressure
    small = extract_records_from_paths(files, limit=10).to_pandas()
    big = extract_records_from_paths(files).to_pandas()
    pd.testing.assert_frame_equal(_kept(small), _kept(big))
    assert not small["url"].duplicated().any()


def test_compact_handles_null_ts(tmp_path):
    """ADVICE #2: cross-partition dup with a null-ts copy must not
    TypeError in compact(); the null copy loses in both compact paths."""
    d = tmp_path / "shards"
    d.mkdir()
    # shard 0: originals 0..19 (real ts); shard 1: null-ts copies of 0..3
    pq.write_table(pages_table(0, 20), str(d / "s0.parquet"))
    t = _with_null_ts_dups(0, 4, 4)  # rows 0..3 + 4 null-ts copies
    pq.write_table(t.slice(4), str(d / "s1.parquet"))  # only the null copies
    files = sorted(glob.glob(str(d / "*.parquet")))

    out_a = str(tmp_path / "out_a")
    out_b = str(tmp_path / "out_b")
    run_partitioned(files, out_a, concurrency=2)
    run_partitioned(files, out_b, concurrency=2)

    ra = compact(out_a)
    rb = compact_distributed(out_b)
    assert ra["dropped_rows"] == rb["dropped_rows"] == 4

    def rows(out):
        fs = sorted(glob.glob(os.path.join(out, "part-*", "*.parquet")))
        df = pd.concat(
            [pd.read_parquet(f, columns=["url", "warc_ts", "text_fingerprint"]) for f in fs]
        )
        return df.sort_values("url").reset_index(drop=True)

    pd.testing.assert_frame_equal(rows(out_a), rows(out_b))
    assert rows(out_a)["warc_ts"].notna().all()  # real-ts copies won


def test_compact_distributed_crash_recovery(tmp_path):
    """ADVICE #3: compact_distributed restores part-*.old / removes
    stale tmp dirs before scanning (same preamble as compact())."""
    d = tmp_path / "shards"
    d.mkdir()
    pq.write_table(pages_table(0, 30), str(d / "s0.parquet"))
    pq.write_table(pages_table(30, 30), str(d / "s1.parquet"))
    files = sorted(glob.glob(str(d / "*.parquet")))
    out = str(tmp_path / "out")
    run_partitioned(files, out, concurrency=2)

    part1 = os.path.join(out, "part-00001")
    shutil.move(part1, part1 + ".old")  # crash between the two renames
    os.makedirs(os.path.join(out, "part-00000.compact.tmp"))

    res = compact_distributed(out)
    assert os.path.isdir(part1)
    assert not os.path.exists(part1 + ".old")
    assert not os.path.exists(os.path.join(out, "part-00000.compact.tmp"))
    assert res == {"rewritten_partitions": 0, "dropped_rows": 0}


def test_compact_distributed_losers_in_many_partitions(tmp_path):
    """VERDICT #3: losers spread across 3 partitions are each resolved
    from that partition's own hive subdir (url winners correct, no
    global loser frame needed for correctness)."""
    d = tmp_path / "shards"
    d.mkdir()
    # 4 shards, consecutive overlaps -> losing copies live in shards 0-2
    for s in range(4):
        pq.write_table(pages_table(s * 15, 30), str(d / f"s{s}.parquet"))
    files = sorted(glob.glob(str(d / "*.parquet")))
    out = str(tmp_path / "out")
    run_partitioned(files, out, concurrency=2)

    res = compact_distributed(out)
    assert res["rewritten_partitions"] >= 3
    fs = sorted(glob.glob(os.path.join(out, "part-*", "*.parquet")))
    df = pd.concat([pd.read_parquet(f, columns=["url"]) for f in fs])
    assert not df["url"].duplicated().any()
    expect = pd.concat([pd.read_parquet(f, columns=["url"]) for f in files])
    assert len(df) == expect["url"].nunique()


def test_minhash_distributed_verify_equals_driver(monkeypatch):
    """The distributed pair-side-join verification (engaged past
    GATHER_TEXT_LIMIT) returns exactly the driver gather's pairs."""
    import ray.data as rd

    from ocracle_ray.stages import dedup as dd

    base = "fysikk oppgave om krefter og energi i systemet med kloss på skråplan "
    items = []
    for i in range(30):
        # 10 near-dup trios + distinct tails
        items.append({"key": i, "text": base + f"variant {i % 10}"})
    ds = rd.from_items(items).repartition(4)

    driver = dd.minhash_lsh_pairs(ds, "key", "text", threshold=0.8)
    monkeypatch.setattr(dd, "GATHER_TEXT_LIMIT", 2)  # force distributed
    dist = dd.minhash_lsh_pairs(ds, "key", "text", threshold=0.8)
    pd.testing.assert_frame_equal(driver, dist)
    assert len(driver) > 0  # the comparison is not vacuous


def test_gather_texts_guard(monkeypatch):
    """VERDICT #4: the candidate-text gather raises past its cap
    instead of silently materializing an unbounded driver dict."""
    import ray.data as rd

    from ocracle_ray.stages import dedup as dd

    ds = rd.from_items(
        [{"key": i, "text": f"tekst nummer {i} om fysikk og energi"} for i in range(8)]
    )
    monkeypatch.setattr(dd, "GATHER_TEXT_LIMIT", 3)
    with pytest.raises(RuntimeError, match="GATHER_TEXT_LIMIT"):
        dd._gather_texts(ds, "key", "text", list(range(5)))
    # under the cap it still gathers
    out = dd._gather_texts(ds, "key", "text", [1, 2])
    assert set(out) == {1, 2}


def test_spread_giant_pages_identical_output(tmp_path):
    """VERDICT #9 (stretch): the skew knob only changes block layout —
    extraction output is byte-identical with it on or off."""
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages_table(0, 60), p)  # ~0.5% giants at gen rates
    plain = extract_records(read_pages([p])).to_pandas()
    spread = extract_records(read_pages([p]), spread_giant_pages=True).to_pandas()
    pd.testing.assert_frame_equal(_kept(plain), _kept(spread))


def test_run_partitioned_concurrent_matches_sequential(tmp_path):
    """VERDICT #2: overlapped partitions (max_concurrent>1) produce
    byte-identical output + manifests vs the sequential path, and
    resume still works under concurrency."""
    d = tmp_path / "shards"
    d.mkdir()
    for s in range(4):
        pq.write_table(pages_table(s * 25, 25), str(d / f"s{s}.parquet"))
    files = sorted(glob.glob(str(d / "*.parquet")))

    seq_dir = str(tmp_path / "seq")
    con_dir = str(tmp_path / "con")
    # concurrency=1 actor per partition so the 4-CPU test session can
    # genuinely overlap two partitions (clamp: 4 // (1+1) = 2 workers)
    seq = run_partitioned(files, seq_dir, concurrency=1, max_concurrent=1)
    con = run_partitioned(files, con_dir, concurrency=1, max_concurrent=2)
    assert seq["totals"] == con["totals"]

    def records(out):
        fs = sorted(glob.glob(os.path.join(out, "part-*", "*.parquet")))
        df = pd.concat([pd.read_parquet(f, columns=["url", "text_fingerprint"]) for f in fs])
        return df.sort_values("url").reset_index(drop=True)

    pd.testing.assert_frame_equal(records(seq_dir), records(con_dir))

    # resume under concurrency: kill two partitions, re-run concurrent
    for pid in (1, 3):
        os.remove(os.path.join(con_dir, "manifest", f"part-{pid:05d}.json"))
        shutil.rmtree(os.path.join(con_dir, f"part-{pid:05d}"))
    again = run_partitioned(files, con_dir, concurrency=1, max_concurrent=2)
    assert again["ran"] == 2 and again["skipped"] == 2
    assert again["totals"] == seq["totals"]
    pd.testing.assert_frame_equal(records(seq_dir), records(con_dir))
