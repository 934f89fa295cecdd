"""Explicit skew handling: size-bucketed repartition + salted groupby.

north_rule requirements made concrete:

- ``size_bucket`` tags every page with a payload-size bucket
  (p50/p95/p99-style powers of four) so a ``repartition`` can spread
  giant DOMs / scanned PDFs instead of letting them serialize one
  worker (SURVEY.md §4 skew row).
- ``salted_groupby_sum`` demonstrates hot-key protection: a two-stage
  aggregate where stage 1 groups on ``(key, salt)`` — splitting any hot
  key across ``n_salt`` reducers — and stage 2 folds the salted
  partials. Results are EXACTLY equal to a plain groupby sum (tested);
  only the shuffle layout changes.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


def size_bucket_of(n_bytes: int) -> int:
    """0: <=16KiB, 1: <=64KiB, 2: <=256KiB, 3: bigger (powers of 4)."""
    if n_bytes <= 16 * 1024:
        return 0
    if n_bytes <= 64 * 1024:
        return 1
    if n_bytes <= 256 * 1024:
        return 2
    return 3


def add_size_bucket(pages_ds, payload_col: str = "html"):
    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sizes = pc.binary_length(t[payload_col])
        buckets = pa.array(
            [size_bucket_of(s) for s in sizes.to_pylist()], pa.int32()
        )
        return t.append_column("size_bucket", buckets)

    return pages_ds.map_batches(tag, batch_format="pyarrow")


def spread_giants(pages_ds, *, payload_col: str = "html", giant_bucket: int = 2,
                  num_blocks: int = 64):
    """Union of (normal pages, giant pages repartitioned into many small
    blocks). Giant rows land one-to-a-block so the actor pool interleaves
    them with cheap rows instead of convoying behind a giant-heavy block."""
    import pyarrow.compute as pc

    tagged = add_size_bucket(pages_ds, payload_col)
    normal = tagged.map_batches(
        lambda t: t.filter(pc.less(t["size_bucket"], giant_bucket)),
        batch_format="pyarrow",
    )
    giants = tagged.map_batches(
        lambda t: t.filter(pc.greater_equal(t["size_bucket"], giant_bucket)),
        batch_format="pyarrow",
    ).repartition(num_blocks)
    return normal.union(giants)


def salted_groupby_sum(ds, key: str, value: str, *, n_salt: int = 8,
                       alias: str = "total"):
    """Exact grouped sum with salted two-stage shuffle (hot-key safe).

    stage 1: groupby((key, salt)) partial sums — a key with k rows fans
    across min(k, n_salt) reducers; stage 2: groupby(key) folds the
    ≤ n_salt partials per key."""
    from ray.data.aggregate import Sum

    def add_salt(t: pa.Table) -> pa.Table:
        # deterministic per-row salt (row content, not RNG): crc of the
        # value bytes mixed with row position within the batch
        vals = t[value].to_pylist()
        salts = np.fromiter(
            ((zlib.crc32(repr(v).encode()) + i) % n_salt for i, v in enumerate(vals)),
            dtype=np.int32,
            count=len(vals),
        )
        return t.append_column("_salt", pa.array(salts, pa.int32()))

    partial = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key, "_salt"])
        .aggregate(Sum(value, alias_name="_partial"))
    )
    return (
        partial.groupby(key)
        .aggregate(Sum("_partial", alias_name=alias))
    )
