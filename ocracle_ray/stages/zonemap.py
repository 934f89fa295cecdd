"""Zone-map data skipping — the min/max file-statistics index every
lakehouse scan uses (Parquet row-group stats, Delta/Iceberg file
pruning): lay events out as day-partitioned parquet, record each
file's (min_ts, max_ts) zone in a manifest, and answer a time-range
query by reading ONLY the overlapping files. The inverted index prunes
by term bucket; this prunes by RANGE — together they cover the two
data-skipping axes a 100-TB store lives on (a range scan that opens
every file is the single most common full-scan bug at scale).

Build shape: one streaming pass — ``write_parquet`` with a day
partition column fans rows into ``day=.../`` directories per block
(exactly how a 256-node build lands, resumable per shard); the zone
manifest is then built FROM THE FILES' parquet footer statistics
(O(files) metadata reads, no data read — what a real table format
does), so zones are correct even when a file's rows straddle whatever
the partition key claims. Marker-guarded rebuild (the IVF rule:
refuse to clobber a directory that isn't ours).

Query shape: prune zones on the driver (the manifest is O(files) —
KBs per thousand files), then ``read_parquet(pruned_paths,
columns=[...])`` + an exact residual ``ts`` filter per batch (zones
admit whole files; the filter trims the boundary files' rows). Tests
prove the pruning by corrupting every non-overlapping file.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MARKER = "_ZONE_MAP.json"


def build_time_partitioned(ds, store_dir: str, *, ts_col: str = "ts"):
    """Write ``ds`` day-partitioned under ``store_dir`` and a zone map
    from the written files' parquet footer stats."""
    import pyarrow.parquet as pq

    marker = os.path.join(store_dir, _MARKER)
    if os.path.exists(store_dir):
        if not os.path.exists(marker):
            raise ValueError(
                f"build_time_partitioned: {store_dir} exists without a "
                f"{_MARKER} marker; refusing to delete foreign data"
            )
        shutil.rmtree(store_dir)

    def add_day(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(t[ts_col], unit="day"),
                          "%Y-%m-%d")
        return t.append_column("day", day)

    ds.map_batches(add_day, batch_format="pyarrow").write_parquet(
        store_dir, partition_cols=["day"])

    zones = []
    for root, _dirs, files in os.walk(store_dir):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            path = os.path.join(root, f)
            md = pq.read_metadata(path)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(
                    [md.schema.column(i).name
                     for i in range(md.num_columns)].index(ts_col))
                st = col.statistics
                if st is None or not st.has_min_max:
                    raise ValueError(
                        f"build_time_partitioned: {path} lacks {ts_col} "
                        f"footer statistics — zone map would be unsound")
                mins.append(st.min.isoformat())
                maxs.append(st.max.isoformat())
            zones.append({"path": os.path.relpath(path, store_dir),
                          "min_ts": min(mins), "max_ts": max(maxs)})
    with open(os.path.join(store_dir, _MARKER), "w") as f:
        json.dump({"ts_col": ts_col, "zones": zones}, f)
    return zones


def pruned_paths(store_dir: str, lo: str, hi: str) -> tuple[list, int]:
    """(overlapping file paths, total file count) for [lo, hi) —
    half-open, ISO timestamps. Zone overlap: min_ts < hi and
    max_ts >= lo (footer max is inclusive)."""
    with open(os.path.join(store_dir, _MARKER)) as f:
        zm = json.load(f)
    keep = [os.path.join(store_dir, z["path"]) for z in zm["zones"]
            if z["min_ts"] < hi and z["max_ts"] >= lo]
    return keep, len(zm["zones"])


def range_aggregate(store_dir: str, lo: str, hi: str, *,
                    key_col: str = "event_type",
                    value_col: str = "value") -> pd.DataFrame:
    """Per-key (n_events, cents) over [lo, hi), reading ONLY the
    zone-overlapping files plus an exact residual filter."""
    import ray.data as rd

    from ..pipelines.queries import driver_grouped_agg
    from .running import _cents

    paths, _total = pruned_paths(store_dir, lo, hi)
    if not paths:
        return pd.DataFrame(columns=[key_col, "n_events", "cents"])
    ds = rd.read_parquet(paths, columns=["ts", key_col, value_col])
    lo_ts = pa.scalar(np.datetime64(lo, "us"), pa.timestamp("us"))
    hi_ts = pa.scalar(np.datetime64(hi, "us"), pa.timestamp("us"))

    def residual(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["ts"], lo_ts),
                    pc.less(t["ts"], hi_ts))
        t = t.filter(m)
        cents = _cents(t[value_col].to_numpy(zero_copy_only=False), 100)
        return pa.table({key_col: t[key_col],
                         "cents": pa.array(cents, pa.int64())})

    out = driver_grouped_agg(
        ds.map_batches(residual, batch_format="pyarrow"),
        [key_col],
        {"n_events": ("cents", "count"), "cents": ("cents", "sum")},
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["cents"] = out["cents"].astype("int64")
    return out.sort_values(key_col).reset_index(drop=True)


_ZMARKER = "_ZORDER_MAP.json"


def _spread16(x: np.ndarray) -> np.ndarray:
    """Spread 16 bits into the even positions of 32 (Morton helper)."""
    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def morton2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Interleave the low 16 bits of two keys — the Z-order curve.
    Locality-only: zone stats come from REAL values, so clamping to 16
    bits can never make pruning unsound, only less effective."""
    return (_spread16(a) | (_spread16(b) << np.uint64(1))).astype(np.int64)


def build_zordered(ds, store_dir: str, *, ts_col: str = "ts",
                   key_col: str = "user_id",
                   target_rows_per_file: int = 4096):
    """Z-order clustering (Delta/Iceberg OPTIMIZE ZORDER): sort rows
    along the Morton curve of (key bucket, day ordinal) and write
    bounded files, so zone maps prune on BOTH dimensions — a day
    layout answers time ranges but opens every file for a key range;
    the curve gives each file a tight bounding BOX. Manifest stats are
    read from the written parquet footers (the 1-D builder's rule)."""
    import pyarrow.parquet as pq

    marker = os.path.join(store_dir, _ZMARKER)
    if os.path.exists(store_dir):
        if not os.path.exists(marker):
            raise ValueError(
                f"build_zordered: {store_dir} exists without a "
                f"{_ZMARKER} marker; refusing to delete foreign data"
            )
        shutil.rmtree(store_dir)

    def add_z(t: pa.Table) -> pa.Table:
        day = (t[ts_col].to_numpy(zero_copy_only=False)
               .astype("datetime64[D]").astype(np.int64))
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_z", pa.array(morton2(key, day)))

    z = ds.map_batches(add_z, batch_format="pyarrow").sort("_z").materialize()
    n_files = max(1, z.count() // target_rows_per_file)
    (
        z.repartition(n_files)  # order-preserving split
        .map_batches(lambda t: t.drop_columns(["_z"]),
                     batch_format="pyarrow")
        .write_parquet(store_dir)
    )

    zones = []
    for root, _dirs, files in os.walk(store_dir):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            path = os.path.join(root, f)
            md = pq.read_metadata(path)
            names = [md.schema.column(i).name
                     for i in range(md.num_columns)]
            stats: dict = {}
            for col in (ts_col, key_col):
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(names.index(col)).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(
                            f"build_zordered: {path} lacks {col} footer "
                            f"statistics — zone map would be unsound")
                    mins.append(st.min)
                    maxs.append(st.max)
                lo, hi = min(mins), max(maxs)
                stats[col] = [lo.isoformat() if hasattr(lo, "isoformat")
                              else int(lo),
                              hi.isoformat() if hasattr(hi, "isoformat")
                              else int(hi)]
            zones.append({"path": os.path.relpath(path, store_dir),
                          "stats": stats})
    with open(marker, "w") as f:
        json.dump({"cols": [ts_col, key_col], "zones": zones}, f)
    return zones


def pruned_paths_box(store_dir: str, preds: dict) -> tuple[list, int]:
    """Files whose bounding box overlaps EVERY [lo, hi) predicate in
    ``preds`` (col -> (lo, hi); footer max is inclusive)."""
    with open(os.path.join(store_dir, _ZMARKER)) as f:
        zm = json.load(f)
    keep = []
    for z in zm["zones"]:
        ok = True
        for col, (lo, hi) in preds.items():
            zlo, zhi = z["stats"][col]
            if not (zlo < hi and zhi >= lo):
                ok = False
                break
        if ok:
            keep.append(os.path.join(store_dir, z["path"]))
    return keep, len(zm["zones"])


def box_aggregate(store_dir: str, *, ts_lo: str, ts_hi: str,
                  key_lo: int, key_hi: int,
                  key_col: str = "user_id",
                  group_col: str = "event_type",
                  value_col: str = "value") -> pd.DataFrame:
    """Per-group (n_events, cents) over the 2-D box, reading ONLY the
    box-overlapping files plus an exact residual filter."""
    import ray.data as rd

    from ..pipelines.queries import driver_grouped_agg
    from .running import _cents

    paths, _total = pruned_paths_box(
        store_dir, {"ts": (ts_lo, ts_hi), key_col: (key_lo, key_hi)})
    if not paths:
        return pd.DataFrame(columns=[group_col, "n_events", "cents"])
    ds = rd.read_parquet(paths,
                         columns=["ts", key_col, group_col, value_col])
    lo_ts = pa.scalar(np.datetime64(ts_lo, "us"), pa.timestamp("us"))
    hi_ts = pa.scalar(np.datetime64(ts_hi, "us"), pa.timestamp("us"))

    def residual(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(t["ts"], lo_ts),
                    pc.less(t["ts"], hi_ts)),
            pc.and_(pc.greater_equal(t[key_col], pa.scalar(key_lo)),
                    pc.less(t[key_col], pa.scalar(key_hi))),
        )
        t = t.filter(m)
        cents = _cents(t[value_col].to_numpy(zero_copy_only=False), 100)
        return pa.table({group_col: t[group_col],
                         "cents": pa.array(cents, pa.int64())})

    out = driver_grouped_agg(
        ds.map_batches(residual, batch_format="pyarrow"),
        [group_col],
        {"n_events": ("cents", "count"), "cents": ("cents", "sum")},
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["cents"] = out["cents"].astype("int64")
    return out.sort_values(group_col).reset_index(drop=True)
