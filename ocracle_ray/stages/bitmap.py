"""Bitmap index over a bounded integer key domain — the Druid/Pinot
audience-segmentation primitive: one bit per key, boolean algebra
(AND/OR/ANDNOT) in whole 64-bit words, popcount for counts.

Build shape: per-batch DISTINCT (set_value, key) combiner rows fold
into driver-side packed bitmaps (the bitmap is the INDEX STRUCTURE the
algebra runs on — the build pass is the same distinct-pair combiner the
retention/division queries use, guarded). The key domain must be
bounded and declared (``domain`` = max key + 1, loud guard): at 100 TB
the domain partitions into fixed ranges with one bitmap per range —
the roaring-container shape — and the algebra distributes per range
because every operation is word-local.

Popcount is exact and vectorized (uint64 view → uint8 → unpackbits
sum); set bits past ``n`` (the packing slack of the last word) never
exist because build masks keys to the domain with a loud raise.

Reference scope: pure scale addendum (the reference has no audience
surface); the operator is the standard bitmap-index algebra per
O'Neil/Quass (SIGMOD 1997) and the roaring-bitmap container model.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BITMAP_DOMAIN_LIMIT = 16_777_216  # 2 MiB of words per bitmap


class Bitmap:
    """Fixed-domain packed bitset with whole-word boolean algebra."""

    __slots__ = ("domain", "words")

    def __init__(self, domain: int, words: np.ndarray | None = None):
        if domain <= 0 or domain > BITMAP_DOMAIN_LIMIT:
            raise ValueError(
                f"Bitmap: domain {domain} outside (0, "
                f"{BITMAP_DOMAIN_LIMIT}] — partition the key space "
                f"into roaring-style ranges instead")
        self.domain = int(domain)
        n_words = (self.domain + 63) // 64
        self.words = (np.zeros(n_words, np.uint64)
                      if words is None else words)

    def set_keys(self, keys: np.ndarray) -> "Bitmap":
        k = np.asarray(keys, np.int64)
        if len(k) and (k.min() < 0 or k.max() >= self.domain):
            raise ValueError(
                f"Bitmap: key outside [0, {self.domain}) — the domain "
                f"must be declared to cover every key")
        np.bitwise_or.at(self.words, k // 64,
                         np.uint64(1) << (k % 64).astype(np.uint64))
        return self

    def _check(self, other: "Bitmap") -> None:
        if self.domain != other.domain:
            raise ValueError("Bitmap: mismatched domains")

    def and_(self, other: "Bitmap") -> "Bitmap":
        self._check(other)
        return Bitmap(self.domain, self.words & other.words)

    def or_(self, other: "Bitmap") -> "Bitmap":
        self._check(other)
        return Bitmap(self.domain, self.words | other.words)

    def andnot(self, other: "Bitmap") -> "Bitmap":
        self._check(other)
        return Bitmap(self.domain, self.words & ~other.words)

    def popcount(self) -> int:
        return int(np.unpackbits(self.words.view(np.uint8)).sum())


def build_bitmaps(ds, *, set_col: str, key_col: str,
                  domain: int) -> dict:
    """One streaming pass → ``{set_value: Bitmap}`` over the declared
    key domain. Per-batch combiner emits DISTINCT (set_value, key)
    rows (bounded by the batch's own distincts); the driver sets bits
    — O(distinct pairs) traffic, no shuffle."""
    def partial(t: pa.Table) -> pa.Table:
        g = t.select([set_col, key_col]).group_by(
            [set_col, key_col]).aggregate([])
        return g

    out: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=65536):
        sv = b[set_col].to_numpy(zero_copy_only=False)
        kv = b[key_col].to_numpy(zero_copy_only=False)
        for v in np.unique(sv):
            key = v.item() if hasattr(v, "item") else v
            bm = out.get(key)
            if bm is None:
                bm = out[key] = Bitmap(domain)
            bm.set_keys(kv[sv == v])
    return out
