"""Crawl-recrawl snapshot delta (CDC): given two crawls of the same
url space, classify every url as added / removed / changed / unchanged
and emit a per-status census — the change-data-capture pass an
incremental 100-TB pipeline runs before spending extraction compute on
pages that did not change (reference analogue: OCRacle re-runs only
tasks missing from its store, ``scripts/object_handling.py`` resume
semantics — this is the same idea lifted to crawl snapshots).

Scale shape, stage by stage:
- Content fingerprints are computed per batch from the html bytes
  (C-speed blake2b via ``core.textstats.hash64``); the html payload
  never travels past this map.
- Keep-latest per (side, url) reuses ``dedup_keep_latest_records``
  (crc32-bucketed shuffle, vectorized in-bucket sort — the flagship's
  G4 path) per side, so a url recrawled twice within one snapshot
  resolves by the SAME (max warc_ts, max fingerprint tie-break,
  null≡epoch-0 always-loser) rule as every other dedup path in this
  repo.
- The diff itself is ONE url groupby over the two deduped sides
  (each side now has at most one row per url, so per-url sums are
  exact selects — no join, no driver url table), followed by a
  vectorized status classification and a tiny per-status
  (count, fp-XOR) fold streamed to the driver (4 statuses x blocks
  partial rows; XOR is associative — the tree-fold shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..core.textstats import hash64

STATUSES = ("added", "changed", "removed", "unchanged")


def fingerprint_pages(pages_ds, side: str):
    """(side, url, warc_ts, fp) rows — fp = signed-int64 blake2b of the
    raw html bytes. Column-pruned: html is dropped right here."""

    def fp_batch(t: pa.Table) -> pa.Table:
        fps = np.array(
            [hash64(h) for h in t["html"].to_pylist()], np.uint64
        ).astype(np.int64)
        return pa.table({
            "side": pa.array([side] * t.num_rows, pa.string()),
            "url": t["url"],
            "warc_ts": t["warc_ts"],
            "text_fingerprint": pa.array(fps, pa.int64()),
        })

    return pages_ds.map_batches(fp_batch, batch_format="pyarrow")


def snapshot_delta_rows(side_a, side_b, *, n_buckets: int = 16):
    """Per-url classified diff of two fingerprinted snapshots (outputs
    of ``fingerprint_pages``): a Dataset of (url, status, fp_latest)
    rows — the surface an INCREMENTAL pipeline consumes (re-extract
    only added/changed urls, carry unchanged results forward; pinned
    by the incremental≡full test)."""
    from .extract import dedup_keep_latest_records

    def tag(side_flag: int):
        def fn(t: pa.Table) -> pa.Table:
            fp = t["text_fingerprint"].to_numpy(zero_copy_only=False)
            zero = np.zeros(t.num_rows, np.int64)
            one = np.ones(t.num_rows, np.int64)
            return pa.table({
                "url": t["url"],
                "in_a": pa.array(one if side_flag == 0 else zero),
                "in_b": pa.array(zero if side_flag == 0 else one),
                "fp_a": pa.array(fp if side_flag == 0 else zero),
                "fp_b": pa.array(zero if side_flag == 0 else fp),
            })
        return fn

    a = dedup_keep_latest_records(side_a, n_buckets=n_buckets)
    b = dedup_keep_latest_records(side_b, n_buckets=n_buckets)
    from ray.data.aggregate import Sum

    per_url = (
        a.map_batches(tag(0), batch_format="pyarrow")
        .union(b.map_batches(tag(1), batch_format="pyarrow"))
        .groupby("url")
        .aggregate(
            Sum("in_a", alias_name="in_a"), Sum("in_b", alias_name="in_b"),
            Sum("fp_a", alias_name="fp_a"), Sum("fp_b", alias_name="fp_b"),
        )
    )

    _EMPTY_ROWS = pa.table({"url": pa.array([], pa.string()),
                            "status": pa.array([], pa.string()),
                            "fp_latest": pa.array([], pa.int64())})

    def classify(t: pa.Table) -> pa.Table:
        # zero-row blocks from union/aggregate can arrive with a
        # degenerate schema (NOTES_r4 contraction hazard) — coalesce
        if t.num_rows == 0 or "in_a" not in t.column_names:
            return _EMPTY_ROWS
        in_a = t["in_a"].to_numpy(zero_copy_only=False)
        in_b = t["in_b"].to_numpy(zero_copy_only=False)
        fp_a = t["fp_a"].to_numpy(zero_copy_only=False)
        fp_b = t["fp_b"].to_numpy(zero_copy_only=False)
        status = np.where(
            in_a == 0, "added",
            np.where(in_b == 0, "removed",
                     np.where(fp_a == fp_b, "unchanged", "changed")),
        )
        fp_latest = np.where(in_b == 1, fp_b, fp_a)
        return pa.table({
            "url": t["url"],
            "status": pa.array(status.astype(str), pa.string()),
            "fp_latest": pa.array(fp_latest, pa.int64()),
        })

    return per_url.map_batches(classify, batch_format="pyarrow")


def snapshot_delta_census(side_a, side_b, *, n_buckets: int = 16) -> pd.DataFrame:
    """Census over ``snapshot_delta_rows``: (status, n_urls, fp_xor)
    with fp_xor the XOR of each url's LATEST fingerprint (side b where
    present, else a) — one flipped content byte anywhere moves a url
    between statuses or flips its group's XOR."""
    rows_ds = snapshot_delta_rows(side_a, side_b, n_buckets=n_buckets)

    _EMPTY = pa.table({"status": pa.array([], pa.string()),
                       "n": pa.array([], pa.int64()),
                       "x": pa.array([], pa.int64())})

    def census(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "status" not in t.column_names:
            return _EMPTY
        status = t["status"].to_numpy(zero_copy_only=False)
        fp_latest = t["fp_latest"].to_numpy(zero_copy_only=False)
        # per-batch partial: (status, n, xor) — XOR folds associatively
        rows = []
        for s in STATUSES:
            m = status == s
            if m.any():
                rows.append((s, int(m.sum()),
                             int(np.bitwise_xor.reduce(fp_latest[m]))))
        if not rows:
            return _EMPTY
        return pa.table({
            "status": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "x": pa.array([r[2] for r in rows], pa.int64()),
        })

    acc: dict[str, tuple[int, int]] = {}
    for block in rows_ds.map_batches(
        census, batch_format="pyarrow"
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for s, n, x in zip(block["status"].to_pylist(),
                           block["n"].to_pylist(), block["x"].to_pylist()):
            pn, px = acc.get(s, (0, 0))
            acc[s] = (pn + n, px ^ x)
    out = pd.DataFrame(
        [(s, n, x) for s, (n, x) in sorted(acc.items())],
        columns=["status", "n_urls", "fp_xor"],
    )
    out["n_urls"] = out["n_urls"].astype("int64")
    out["fp_xor"] = out["fp_xor"].astype("int64")
    return out
