"""Watermark late-event accounting — the streaming-ingestion op every
event pipeline runs (Flink/Beam semantics): with events processed in
ARRIVAL order, the watermark before event i is ``max(ts of events
0..i-1) − delay``; an event is LATE when its own timestamp is behind
that watermark, and its lateness is the gap.

Scale shape: one sort by the arrival key (the only all-to-all), then
the GLOBAL-prefix boundary carry — per-block ``(first_key, max_ts)``
rows fold on the driver (O(blocks), loud-guarded), the exclusive
prefix max across blocks broadcasts as a dict, and pass 2 scans each
block with ``np.maximum.accumulate`` against its carry-in. Lateness
sums stay int64 microseconds end to end (the stages/running.py
exact-integer rule); the float division happens once per group on
both sides.

The sf events corpus arrives exactly in timestamp order (zero late
events — measured), so the driver query simulates a shuffled
ingestion with the Knuth-hash arrival key the docs_split oracle
established (``(id % 2^31) * 2654435761 % 2^32``, event_id
tie-break) — shared verbatim with SQL. Engineered out-of-order
fixtures pin the semantics in tests/test_watermark.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..broadcast import cached_get

BLOCK_INFO_LIMIT = 1_000_000  # O(blocks) driver rows — loud, not hoped
_NEG_SENTINEL = -(2 ** 62)  # "no events yet": far past, overflow-safe

KNUTH = 2654435761


def knuth_arrival(ids: np.ndarray) -> np.ndarray:
    """The docs_split hash as an arrival key: int64-safe, identical to
    SQL ``((id % 2147483648) * 2654435761) % 4294967296``."""
    return ((ids % 2 ** 31) * KNUTH) % 2 ** 32


def late_event_census(ds, *, delay: pd.Timedelta = pd.Timedelta(hours=2),
                      id_col: str = "event_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      arrival: str = "knuth") -> pd.DataFrame:
    """(event_type, n_events, n_late, avg_late_sec) under the
    watermark rule. ``arrival='knuth'`` sorts by the simulated-shuffle
    key (hash, id); ``arrival='id'`` uses plain ingestion order."""
    import ray

    from ..pipelines.queries import driver_grouped_agg

    delay_us = np.int64(delay.value // 1000)

    def add_key(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = knuth_arrival(ids) if arrival == "knuth" else ids
        return t.append_column("arr", pa.array(key.astype(np.int64)))

    # materialize: the sorted blocks are consumed TWICE (info pass +
    # scan pass) and the carry map is keyed by block-first rows — a
    # re-executed sort could re-cut block boundaries between passes
    # (the dedup staged-boundary lesson)
    s = ds.map_batches(add_key, batch_format="pyarrow").sort(
        ["arr", id_col]).materialize()

    def block_info(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first_arr": pa.array([], pa.int64()),
                             "first_id": pa.array([], pa.int64()),
                             "max_ts": pa.array([], pa.int64())})
        ts = (t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        return pa.table({
            "first_arr": t["arr"].slice(0, 1),
            "first_id": t[id_col].slice(0, 1).cast(pa.int64()),
            "max_ts": pa.array([int(ts.max())], pa.int64()),
        })

    info = s.map_batches(block_info, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    if len(info) > BLOCK_INFO_LIMIT:
        raise RuntimeError(
            f"late_event_census: {len(info)} block-info rows exceed "
            f"{BLOCK_INFO_LIMIT} — repartition coarser before the scan")
    info = info.sort_values(["first_arr", "first_id"]).reset_index(drop=True)
    inc = np.maximum.accumulate(info["max_ts"].to_numpy(np.int64))
    carry = np.concatenate(([_NEG_SENTINEL], inc[:-1]))
    carry_map = {(int(a), int(i)): int(c) for a, i, c in
                 zip(info["first_arr"], info["first_id"], carry)}
    ref = ray.put(carry_map)

    def scan(t: pa.Table) -> pa.Table:
        empty = pa.table({type_col: pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "n_late": pa.array([], pa.int64()),
                          "late_us": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        cm = cached_get(ref)
        arr0 = int(t["arr"][0].as_py())
        id0 = int(t[id_col][0].as_py())
        c0 = cm[(arr0, id0)]
        ts = (t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        inc_max = np.maximum.accumulate(ts)
        prev_max = np.empty(len(ts), np.int64)
        prev_max[0] = c0
        np.maximum(inc_max[:-1], c0, out=prev_max[1:])
        wm = prev_max - delay_us
        late = ts < wm
        lateness = np.where(late, wm - ts, 0)
        g = pa.table({
            type_col: t[type_col],
            "one": pa.array(np.ones(len(ts), np.int64)),
            "is_late": pa.array(late.astype(np.int64)),
            "late_us": pa.array(lateness.astype(np.int64)),
        }).group_by([type_col]).aggregate(
            [("one", "sum"), ("is_late", "sum"), ("late_us", "sum")])
        return g.rename_columns([type_col, "n", "n_late", "late_us"])

    agg = driver_grouped_agg(
        s.map_batches(scan, batch_format="pyarrow", batch_size=None),
        [type_col],
        {"n_events": ("n", "sum"), "n_late": ("n_late", "sum"),
         "late_us": ("late_us", "sum")},
    )
    agg["n_events"] = agg["n_events"].astype("int64")
    agg["n_late"] = agg["n_late"].astype("int64")
    with np.errstate(invalid="ignore"):
        avg = np.where(
            agg["n_late"] > 0,
            agg["late_us"].astype(np.float64)
            / np.maximum(agg["n_late"], 1) / 1_000_000.0,
            0.0,
        )
    agg["avg_late_sec"] = np.round(avg, 2)
    return (agg[[type_col, "n_events", "n_late", "avg_late_sec"]]
            .sort_values(type_col).reset_index(drop=True))
