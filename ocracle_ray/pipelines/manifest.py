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
    partition just written (no second extraction pass). Vectorized:
    XOR-reduce over the fingerprint array, pyarrow kernels for the
    error/task counters — no per-row Python."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    dset = pads.dataset(part_dir, format="parquet")
    rows = 0
    errors = 0
    tasks = 0
    checksum = np.uint64(0)
    for batch in dset.to_batches(columns=["text_fingerprint", "error", "n_tasks"]):
        if batch.num_rows == 0:
            continue
        rows += batch.num_rows
        fps = batch.column("text_fingerprint").to_numpy(zero_copy_only=False)
        checksum ^= np.bitwise_xor.reduce(fps.astype(np.int64).view(np.uint64))
        errors += pc.sum(
            pc.cast(pc.not_equal(batch.column("error"), ""), pa.int64())
        ).as_py() or 0
        tasks += pc.sum(batch.column("n_tasks")).as_py() or 0
    return {
        "rows_out": rows,
        "errors": errors,
        "tasks": int(tasks),
        "checksum": int(checksum.view(np.int64)),
    }


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


def _harden_fs_probe_for_threads() -> None:
    """Make Ray's http-filesystem probe safe under concurrent Dataset
    construction. ``path_util._is_http_filesystem`` does ``from
    fsspec.implementations.http import HTTPFileSystem`` on EVERY
    read/write-path resolution and catches only ModuleNotFoundError;
    when aiohttp is absent (this container) the failed import is
    retried each call, and two threads resolving paths at once can race
    the import machinery into a bare ImportError ("cannot import name
    'HTTPFileSystem'") that Ray does not catch. Treat any ImportError
    as "not an http filesystem" — semantically identical to Ray's own
    ModuleNotFoundError branch. Idempotent, and best-effort: the symbol
    is Ray-private, so a Ray that moved it just skips the hardening
    (sequential runs never needed it)."""
    try:
        from ray.data.datasource import path_util

        orig = path_util._is_http_filesystem
    except (ImportError, AttributeError):
        return
    if getattr(orig, "_ocracle_hardened", False):
        return

    def safe(fs):
        try:
            return orig(fs)
        except ImportError:
            return False

    safe._ocracle_hardened = True
    path_util._is_http_filesystem = safe


def run_partitioned(
    input_files: Sequence[str],
    out_dir: str,
    files_per_partition: int = 1,
    max_concurrent: int = 4,
    **extract_kwargs,
) -> dict:
    """Resumable run: skip partitions with valid manifests, (re)run the
    rest. Returns the run summary (manifests + skipped/ran counts).

    ``max_concurrent`` partitions run at once (driver threads, each
    owning its own streaming Dataset execution): one 1–4 GB shard
    cannot fill a cluster, so partition pipelines must overlap — wall
    ≈ max(shard) not sum(shards). Per-partition atomic commit (tmp dir
    + rename) and manifest semantics are unchanged; partitions never
    share output paths so concurrency cannot interleave their files.

    The worker count is clamped to the cluster CPU budget: each
    in-flight partition needs its minimum actor-pool CPUs PLUS a free
    CPU for its read/write tasks — without the clamp, N concurrent
    actor pools can hold every CPU and starve all N reads (observed
    resource deadlock on a 4-CPU session)."""
    from concurrent.futures import ThreadPoolExecutor

    _harden_fs_probe_for_threads()
    os.makedirs(out_dir, exist_ok=True)
    parts = partition_inputs(input_files, files_per_partition)
    ran, skipped = 0, 0
    manifests: list = [None] * len(parts)
    todo: list[tuple[int, list[str]]] = []
    for pid, files in enumerate(parts):
        if manifest_is_valid(out_dir, pid, files):
            with open(_manifest_path(out_dir, pid)) as f:
                manifests[pid] = json.load(f)
            skipped += 1
            continue
        todo.append((pid, files))
    if todo:
        import ray

        if ray.is_initialized():
            total_cpus = int(ray.cluster_resources().get("CPU", 0)) or 1
        else:
            total_cpus = os.cpu_count() or 1
        conc = extract_kwargs.get("concurrency", (2, 8))
        min_actors = conc[0] if isinstance(conc, (tuple, list)) else conc
        cpus_per_part = int(min_actors) + 1  # actor pool + task headroom
        workers = max(1, min(max_concurrent, len(todo), total_cpus // cpus_per_part))
        if workers == 1:
            for pid, files in todo:
                manifests[pid] = write_partition(pid, files, out_dir, **extract_kwargs)
                ran += 1
        else:
            with ThreadPoolExecutor(max_workers=workers) as pool:
                futs = {
                    pid: pool.submit(write_partition, pid, files, out_dir, **extract_kwargs)
                    for pid, files in todo
                }
                for pid, fut in futs.items():
                    manifests[pid] = fut.result()
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


def _recover_partitions(out_dir: str) -> None:
    """Crash recovery for the rename(part->old); rename(tmp->part) swap
    used by both compact passes: a kill between the two renames leaves
    the live data as ``part-NNNNN.old`` (excluded by the part glob) —
    restore it; stale ``*.tmp`` / ``*.compact.tmp`` dirs are partial
    writes — remove them. MUST run before any part-glob scan or a
    crashed partition's rows silently vanish from the winner scan."""
    import glob

    for stale in glob.glob(os.path.join(out_dir, "part-*.old")):
        live = stale[: -len(".old")]
        if not os.path.isdir(live):
            os.rename(stale, live)  # restore the partition lost mid-swap
        else:
            shutil.rmtree(stale)
    for stale in glob.glob(os.path.join(out_dir, "part-*.tmp")):
        shutil.rmtree(stale, ignore_errors=True)


_EPOCH0_DT = None  # lazily-built datetime(1970,1,1); see _ts_or_epoch0


def _ts_or_epoch0(ts):
    """Null warc_ts ≡ epoch 0 (always-loser) — the same convention as
    ``dup_winner_map``'s fill_null; keeps None out of tuple comparisons
    (None vs datetime raises TypeError)."""
    global _EPOCH0_DT
    if _EPOCH0_DT is None:
        import datetime

        _EPOCH0_DT = datetime.datetime(1970, 1, 1)
    return ts if ts is not None else _EPOCH0_DT


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
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data as rd

    _recover_partitions(out_dir)  # same swap as compact(): restore first

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

    _EPOCH0 = pa.scalar(0, pa.timestamp("us"))

    def losers_of(group: pa.Table) -> pa.Table:
        if group.num_rows <= 1:
            return group.slice(0, 0)
        # null warc_ts ≡ epoch 0 (always-loser) — sort on a filled temp
        # key; pyarrow's default null_placement would otherwise rank a
        # null-ts copy inconsistently with compact()/broadcast mode
        filled = pc.fill_null(pc.cast(group["warc_ts"], pa.timestamp("us")), _EPOCH0)
        order = group.append_column("_ts_filled", filled).sort_by(
            [("_ts_filled", "descending"), ("text_fingerprint", "descending"),
             ("part", "ascending")]
        )
        return order.drop_columns(["_ts_filled"]).slice(1)  # all but the winner

    losers_dir = os.path.join(out_dir, "_compact_losers")
    shutil.rmtree(losers_dir, ignore_errors=True)
    losers = keys.groupby("url").map_groups(losers_of, batch_format="pyarrow")
    n_losers = losers.count()
    if n_losers == 0:
        return {"rewritten_partitions": 0, "dropped_rows": 0}
    # hive-partition the spill by source partition: the rewrite loop
    # below reads ONLY its own partition's loser subdir — driver memory
    # is bounded by ONE partition's dup copies, never the global set
    losers.write_parquet(losers_dir, partition_cols=["part"])

    dropped = 0
    rewritten = 0
    for pd_ in part_dirs:
        my_losers = os.path.join(losers_dir, f"part={os.path.basename(pd_)}")
        if not os.path.isdir(my_losers):
            continue  # no losing copy lives in this partition
        mine = pads.dataset(my_losers, format="parquet").to_table(
            columns=["url", "warc_ts", "text_fingerprint"]
        )
        bad = set(
            zip(
                mine["url"].to_pylist(),
                (_ts_or_epoch0(x) for x in mine["warc_ts"].to_pylist()),
                mine["text_fingerprint"].to_pylist(),
            )
        )
        files = sorted(_glob.glob(os.path.join(pd_, "*.parquet")))
        tmp = pd_ + ".compact.tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        for i, f in enumerate(files):
            t = pq.read_table(f)
            mask = [
                (u, _ts_or_epoch0(ts), fp) not in bad
                for u, ts, fp in zip(
                    t["url"].to_pylist(),
                    t["warc_ts"].to_pylist(),
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
    _recover_partitions(out_dir)

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
                ts = _ts_or_epoch0(ts)  # None vs datetime is unorderable
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
                win = u not in conflicted or best[u] == (_ts_or_epoch0(ts), fp, pd_)
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
