"""Resumable partitioned output: per-partition parquet + lineage manifest.

The reference's only run state is a display-only ``progress.json``
(``/root/reference/scripts/utils.py:22-31,48-66``); the north_rule
promotes it to durable lineage: every partition writes

    out_dir/part-{pid:05d}/*.parquet        (atomic: tmp dir + rename)
    out_dir/manifest/part-{pid:05d}.json    (atomic: tmp file + rename)

with counters (rows in/out, errors, dropped), an order-independent
checksum (XOR of per-record ``text_fingerprint``), and the input files.
A restart skips every partition whose manifest validates — resume ≡
fresh run byte-identically (tested in tests/test_manifest.py).

Partition = input shard(s). Exact global url-dedup composes with resume
when input shards are url-disjoint (the normal WARC layout: one url
appears in one crawl shard); otherwise run ``compact()`` afterwards for
a cross-partition keep-latest pass. ``compact()`` keeps a driver-side
url->winner dict and is therefore bounded by ``COMPACT_URL_LIMIT``
(analogous to the broadcast winner-map guard); larger url populations
must dedup in-pipeline (``stages.extract.dedup_keep_latest_records``)
before writing instead.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Sequence

from .. import ENGINE_VERSION

COMPACT_URL_LIMIT = 50_000_000  # driver-side url dict guard (see docstring)


def _manifest_path(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, "manifest", f"part-{pid:05d}.json")


def _part_dir(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, f"part-{pid:05d}")


def partition_inputs(input_files: Sequence[str], files_per_partition: int = 1) -> list[list[str]]:
    files = sorted(input_files)
    return [
        files[i : i + files_per_partition]
        for i in range(0, len(files), files_per_partition)
    ]


def manifest_is_valid(out_dir: str, pid: int, input_files: list[str]) -> bool:
    path = _manifest_path(out_dir, pid)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return (
        m.get("input_files") == sorted(input_files)
        and os.path.isdir(_part_dir(out_dir, pid))
        and m.get("engine_version") == ENGINE_VERSION
    )


def _counters_of_written(part_dir: str) -> dict:
    """Aggregate counters by re-reading ONLY the narrow columns of the
    partition just written (no second extraction pass)."""
    import pyarrow.dataset as pads

    dset = pads.dataset(part_dir, format="parquet")
    rows = 0
    errors = 0
    tasks = 0
    checksum = 0
    for batch in dset.to_batches(columns=["text_fingerprint", "error", "n_tasks"]):
        rows += batch.num_rows
        for fp in batch.column("text_fingerprint"):
            checksum ^= fp.as_py()
        for e in batch.column("error"):
            if e.as_py():
                errors += 1
        for t in batch.column("n_tasks"):
            tasks += t.as_py()
    return {"rows_out": rows, "errors": errors, "tasks": tasks, "checksum": checksum}


def write_partition(pid: int, input_files: list[str], out_dir: str, **extract_kwargs) -> dict:
    """Run the extraction pipeline over one partition's input files and
    commit output + manifest atomically."""
    from .extraction import extract_records, read_pages

    part_dir = _part_dir(out_dir, pid)
    tmp_dir = part_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    shutil.rmtree(part_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)

    pages = read_pages(input_files)
    rows_in = pages.count()
    records = extract_records(read_pages(input_files), **extract_kwargs)
    records.write_parquet(tmp_dir)
    os.rename(tmp_dir, part_dir)

    counters = _counters_of_written(part_dir)
    manifest = {
        "partition_id": pid,
        "input_files": sorted(input_files),
        "rows_in": rows_in,
        "rows_deduped": rows_in - counters["rows_out"],
        "engine_version": ENGINE_VERSION,
        "output_dir": part_dir,
        **counters,
    }
    mpath = _manifest_path(out_dir, pid)
    os.makedirs(os.path.dirname(mpath), exist_ok=True)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.rename(tmp, mpath)
    return manifest


def run_partitioned(
    input_files: Sequence[str],
    out_dir: str,
    files_per_partition: int = 1,
    **extract_kwargs,
) -> dict:
    """Resumable run: skip partitions with valid manifests, (re)run the
    rest. Returns the run summary (manifests + skipped/ran counts)."""
    os.makedirs(out_dir, exist_ok=True)
    parts = partition_inputs(input_files, files_per_partition)
    ran, skipped, manifests = 0, 0, []
    for pid, files in enumerate(parts):
        if manifest_is_valid(out_dir, pid, files):
            with open(_manifest_path(out_dir, pid)) as f:
                manifests.append(json.load(f))
            skipped += 1
            continue
        manifests.append(write_partition(pid, files, out_dir, **extract_kwargs))
        ran += 1
    totals = {
        "rows_in": sum(m["rows_in"] for m in manifests),
        "rows_out": sum(m["rows_out"] for m in manifests),
        "errors": sum(m["errors"] for m in manifests),
        "tasks": sum(m["tasks"] for m in manifests),
        "checksum": _xor_all(m["checksum"] for m in manifests),
    }
    return {"partitions": len(parts), "ran": ran, "skipped": skipped,
            "totals": totals, "manifests": manifests}


def _xor_all(vals) -> int:
    out = 0
    for v in vals:
        out ^= v
    return out


def compact_distributed(out_dir: str) -> dict:
    """Cross-partition keep-latest dedup with NO driver-side url state.

    The scale form of ``compact()``: per-partition key projections
    (url, warc_ts, text_fingerprint, partition) are read as a Dataset,
    hash-grouped by url (the only shuffle — keys, never records), and
    each group emits its LOSERS (every copy except the winner:
    max (warc_ts, fingerprint), exact ties resolved to the
    lexically-first partition — identical rule to ``compact``). Losers
    spill to ``out_dir/_compact_losers`` parquet; each affected
    partition is then rewritten against ITS loser set only. Driver
    memory: partition paths + per-partition loser frames (bounded by
    that partition's dup copies)."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    part_re = re.compile(r"part-\d{5}$")
    part_dirs = sorted(
        d
        for d in _glob.glob(os.path.join(out_dir, "part-*"))
        if os.path.isdir(d) and part_re.search(os.path.basename(d))
    )
    if not part_dirs:
        return {"rewritten_partitions": 0, "dropped_rows": 0}

    key_sets = []
    for pd_ in part_dirs:
        ds = rd.read_parquet(pd_, columns=["url", "warc_ts", "text_fingerprint"])
        part_name = os.path.basename(pd_)
        ds = ds.map_batches(
            lambda t, _p=part_name: t.append_column(
                "part", pa.array([_p] * t.num_rows, pa.string())
            ),
            batch_format="pyarrow",
        )
        key_sets.append(ds)
    keys = key_sets[0]
    for other in key_sets[1:]:
        keys = keys.union(other)

    def losers_of(group: pa.Table) -> pa.Table:
        if group.num_rows <= 1:
            return group.slice(0, 0)
        order = group.sort_by(
            [("warc_ts", "descending"), ("text_fingerprint", "descending"),
             ("part", "ascending")]
        )
        return order.slice(1)  # everything but the winner

    losers_dir = os.path.join(out_dir, "_compact_losers")
    shutil.rmtree(losers_dir, ignore_errors=True)
    losers = keys.groupby("url").map_groups(losers_of, batch_format="pyarrow")
    n_losers = losers.count()
    if n_losers == 0:
        return {"rewritten_partitions": 0, "dropped_rows": 0}
    losers.write_parquet(losers_dir)

    import pandas as _pd

    loser_df = _pd.concat(
        [_pd.read_parquet(f) for f in sorted(_glob.glob(os.path.join(losers_dir, "*.parquet")))]
    )
    dropped = 0
    rewritten = 0
    for pd_ in part_dirs:
        mine = loser_df[loser_df["part"] == os.path.basename(pd_)]
        if mine.empty:
            continue
        bad = set(zip(mine["url"], mine["warc_ts"], mine["text_fingerprint"]))
        files = sorted(_glob.glob(os.path.join(pd_, "*.parquet")))
        tmp = pd_ + ".compact.tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        for i, f in enumerate(files):
            t = pq.read_table(f)
            mask = [
                (u, ts, fp) not in bad
                for u, ts, fp in zip(
                    t["url"].to_pylist(),
                    _pd.to_datetime(t["warc_ts"].to_pylist()),
                    t["text_fingerprint"].to_pylist(),
                )
            ]
            dropped += mask.count(False)
            pq.write_table(t.filter(pa.array(mask)), os.path.join(tmp, f"part-{i:05d}.parquet"))
        backup = pd_ + ".old"
        shutil.rmtree(backup, ignore_errors=True)
        os.rename(pd_, backup)
        os.rename(tmp, pd_)
        shutil.rmtree(backup)
        rewritten += 1
        pid = int(os.path.basename(pd_).split("-")[1])
        mpath = _manifest_path(out_dir, pid)
        if os.path.exists(mpath):
            with open(mpath) as fh:
                m = json.load(fh)
            m.update(_counters_of_written(pd_))
            m["compacted"] = True
            with open(mpath + ".tmp", "w") as fh:
                json.dump(m, fh, indent=1, sort_keys=True)
            os.rename(mpath + ".tmp", mpath)
    shutil.rmtree(losers_dir, ignore_errors=True)
    return {"rewritten_partitions": rewritten, "dropped_rows": dropped}


def compact(out_dir: str) -> dict:
    """Cross-partition keep-latest url dedup over an already-written run.

    ``run_partitioned`` dedups within each partition; when input shards
    are NOT url-disjoint the same url can win in two partitions. This
    pass reads ONLY the key projection (url, warc_ts, text_fingerprint)
    of every partition, finds cross-partition conflicts, and rewrites
    just the affected partitions (atomic tmp+rename, manifests
    refreshed). Unconflicted partitions are untouched — at design scale
    this touches O(conflicts), not O(data)."""
    import glob

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    import pyarrow as pa

    # crash recovery BEFORE scanning: a kill between compact()'s two
    # renames can leave part-NNNNN.old (data!) and/or *.tmp dirs that
    # would otherwise match the part glob and double-count urls
    for stale in glob.glob(os.path.join(out_dir, "part-*.old")):
        live = stale[: -len(".old")]
        if not os.path.isdir(live):
            os.rename(stale, live)  # restore the partition lost mid-swap
        else:
            shutil.rmtree(stale)
    for stale in glob.glob(os.path.join(out_dir, "part-*.tmp")):
        shutil.rmtree(stale, ignore_errors=True)

    part_re = re.compile(r"part-\d{5}$")
    part_dirs = sorted(
        d
        for d in glob.glob(os.path.join(out_dir, "part-*"))
        if os.path.isdir(d) and part_re.search(os.path.basename(d))
    )
    # 1. key scan
    best: dict[str, tuple] = {}  # url -> (warc_ts, fp, part_dir)
    counts: dict[str, int] = {}
    for pd_ in part_dirs:
        if len(best) > COMPACT_URL_LIMIT:
            raise RuntimeError(
                f"compact(): url population exceeds COMPACT_URL_LIMIT "
                f"({COMPACT_URL_LIMIT}); dedup in-pipeline with "
                f"stages.extract.dedup_keep_latest_records before writing "
                f"instead of compacting after"
            )
        dset = pads.dataset(pd_, format="parquet")
        for b in dset.to_batches(columns=["url", "warc_ts", "text_fingerprint"]):
            for u, ts, fp in zip(
                b.column("url").to_pylist(),
                b.column("warc_ts").to_pylist(),
                b.column("text_fingerprint").to_pylist(),
            ):
                counts[u] = counts.get(u, 0) + 1
                cur = best.get(u)
                if (
                    cur is None
                    or (ts, fp) > cur[:2]
                    # exact tie (same ts+fingerprint in two partitions):
                    # the lexically-first partition keeps the copy
                    or ((ts, fp) == cur[:2] and pd_ < cur[2])
                ):
                    best[u] = (ts, fp, pd_)
    conflicted = {u for u, c in counts.items() if c > 1}
    if not conflicted:
        return {"rewritten_partitions": 0, "dropped_rows": 0}

    # 2. rewrite only partitions holding a losing copy
    dropped = 0
    rewritten = 0
    for pd_ in part_dirs:
        # pid from the directory name, NOT enumerate — part dirs can be
        # non-contiguous after a crashed write_partition
        pid = int(os.path.basename(pd_).split("-")[1])
        files = sorted(glob.glob(os.path.join(pd_, "*.parquet")))
        needs = False
        tables = []
        for f in files:
            t = pq.read_table(f)
            mask = []
            for u, ts, fp in zip(
                t["url"].to_pylist(),
                t["warc_ts"].to_pylist(),
                t["text_fingerprint"].to_pylist(),
            ):
                win = u not in conflicted or best[u] == (ts, fp, pd_)
                mask.append(win)
                if not win:
                    dropped += 1
                    needs = True
            tables.append(t.filter(pa.array(mask)))
        if not needs:
            continue
        tmp = pd_ + ".compact.tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        for i, t in enumerate(tables):
            pq.write_table(t, os.path.join(tmp, f"part-{i:05d}.parquet"))
        backup = pd_ + ".old"
        shutil.rmtree(backup, ignore_errors=True)
        os.rename(pd_, backup)
        os.rename(tmp, pd_)
        shutil.rmtree(backup)
        rewritten += 1
        # refresh this partition's manifest counters
        mpath = _manifest_path(out_dir, pid)
        if os.path.exists(mpath):
            with open(mpath) as f:
                m = json.load(f)
            m.update(_counters_of_written(pd_))
            m["compacted"] = True
            with open(mpath + ".tmp", "w") as f:
                json.dump(m, f, indent=1, sort_keys=True)
            os.rename(mpath + ".tmp", mpath)
    return {"rewritten_partitions": rewritten, "dropped_rows": dropped}
