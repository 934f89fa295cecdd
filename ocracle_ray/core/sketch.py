"""KMV (k-minimum-values) distinct-count sketch — mergeable.

The scale path for ``COUNT(DISTINCT x)`` when an exact shuffle is too
expensive (ray_guide "Aggregation at scale": emit one serialized sketch
per batch, merge in a tiny second stage). Deterministic: hashing is
FNV-1a, so the same input always yields the same estimate.

Estimator: with the k smallest 64-bit hash values h_(1..k) of the
distinct set, E[distinct] ≈ (k - 1) / (h_(k) / 2^64)  (classic KMV).
"""

from __future__ import annotations

import math

import numpy as np

from .textstats import hash64

_MAX64 = float(1 << 64)


class KMV:
    def __init__(self, k: int = 1024):
        self.k = k
        self._hashes: set[int] = set()
        self._max_kept: int | None = None

    def add(self, value) -> None:
        h = hash64(repr(value).encode("utf-8"))  # blake2b: already uniform
        self._insert(h)

    def add_hashes(self, hashes) -> None:
        for h in hashes:
            self._insert(int(h))

    def _insert(self, h: int) -> None:
        if self._max_kept is not None and h >= self._max_kept and len(self._hashes) >= self.k:
            return
        self._hashes.add(h)
        if len(self._hashes) > self.k:
            self._hashes.discard(max(self._hashes))
        if len(self._hashes) >= self.k:
            self._max_kept = max(self._hashes)

    def merge(self, other: "KMV") -> "KMV":
        out = KMV(self.k)
        out.add_hashes(self._hashes)
        out.add_hashes(other._hashes)
        return out

    def estimate(self) -> float:
        n = len(self._hashes)
        if n < self.k:
            return float(n)  # exact while true distinct < k (not <=)
        kth = max(self._hashes)
        return (self.k - 1) / (kth / _MAX64)

    def serialize(self) -> bytes:
        return np.array(sorted(self._hashes), dtype=np.uint64).tobytes()

    @classmethod
    def deserialize(cls, data: bytes, k: int = 1024) -> "KMV":
        out = cls(k)
        out.add_hashes(np.frombuffer(data, dtype=np.uint64))
        return out


class MisraGries:
    """Mergeable heavy-hitters sketch (Misra-Gries summary, merge rule
    from Agarwal et al., "Mergeable Summaries", PODS 2012): keep at
    most ``k`` counters; reducing past k subtracts the (k+1)-th largest
    count from every counter and drops the non-positive ones.

    Guarantee: any value with true count > n/(k+1) is ALWAYS among the
    surviving counters (each prune subtracts at most its pivot from
    every element, and the pivots sum to ≤ n/(k+1)); counter values
    underestimate by at most n/(k+1). Exact heavy hitters = recount the
    candidate set in a second pass and threshold — which is what
    ``pipelines.queries.q_events_heavy_hitters`` does, making the
    operator DuckDB-oracled despite being sketch-based."""

    def __init__(self, k: int = 64):
        self.k = k
        self.counts: dict = {}
        self.n = 0

    def _prune(self) -> None:
        if len(self.counts) <= self.k:
            return
        pivot = sorted(self.counts.values(), reverse=True)[self.k]
        self.counts = {v: c - pivot for v, c in self.counts.items() if c > pivot}

    def add_many(self, values) -> None:
        from collections import Counter

        batch = Counter(values)
        self.add_counts(batch.keys(), batch.values())

    def add_counts(self, values, counts) -> None:
        """Bulk add pre-aggregated (value, count) pairs — e.g. a
        batch's ``pyarrow.compute.value_counts`` — one dict op per
        DISTINCT value instead of one per row. Semantics identical to
        ``add_many`` over the expanded multiset (one prune at the
        end)."""
        total = 0
        for v, c in zip(values, counts):
            c = int(c)
            total += c
            self.counts[v] = self.counts.get(v, 0) + c
        self.n += total
        self._prune()

    def merge(self, other: "MisraGries") -> "MisraGries":
        out = MisraGries(self.k)
        out.n = self.n + other.n
        out.counts = dict(self.counts)
        for v, c in other.counts.items():
            out.counts[v] = out.counts.get(v, 0) + c
        out._prune()
        return out

    def candidates(self) -> list:
        """Every possible heavy hitter (superset of the truth).
        Sorted by repr so heterogeneous key sets (e.g. strings plus a
        NULL from the source column) never TypeError (review r2);
        values must be JSON-serializable (str/int/float/bool/None)."""
        return sorted(self.counts, key=repr)

    def serialize(self) -> bytes:
        import json

        return json.dumps(
            {
                "k": self.k,
                "n": self.n,
                "counts": sorted(self.counts.items(), key=lambda kv: repr(kv[0])),
            }
        ).encode()

    @classmethod
    def deserialize(cls, data: bytes) -> "MisraGries":
        import json

        d = json.loads(data)
        out = cls(d["k"])
        out.n = d["n"]
        out.counts = {v: c for v, c in d["counts"]}
        return out


def kmv_distinct_estimate(ds, column: str, *, k: int = 1024) -> float:
    """Distributed distinct-count estimate: one serialized sketch per
    batch (map), merged on the driver (sketches are tiny: ≤ 8k bytes).

    Fully VECTORIZED (round 3): per-batch hashing is
    ``pd.util.hash_array`` (C-speed SipHash, deterministic) and a
    sketch is just the sorted k smallest distinct hashes as a uint64
    array — ``np.unique`` is ascending, so ``[:k]`` IS the sketch.
    The old per-row ``KMV.add`` loop (blake2b per value + an O(k)
    max() per insert once full) made the key pre-pass the bottleneck
    on high-cardinality columns — exactly where this estimator is
    supposed to be cheap. Estimator semantics unchanged: exact while
    true distinct < k, (k-1)/(h_(k)/2^64) beyond."""
    import pandas as pd
    import pyarrow as pa

    def sketch_batch(t: pa.Table) -> pa.Table:
        # SQL-parity rule (same as kmv_distinct_by): COUNT(DISTINCT x)
        # skips NULLs, so a null must not hash to a distinct value
        vals = t[column].drop_null().to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(vals)  # uint64, vectorized, deterministic
        h = np.unique(h)[:k]  # unique sorts ascending -> k smallest
        return pa.table(
            {"sketch": pa.array([h.astype(np.uint64).tobytes()], pa.large_binary())}
        )

    def merge_batch(t: pa.Table) -> pa.Table:
        m = np.array([], dtype=np.uint64)
        for blob in t["sketch"].to_pylist():
            m = np.unique(
                np.concatenate([m, np.frombuffer(blob, dtype=np.uint64)])
            )[:k]
        return pa.table(
            {"sketch": pa.array([m.tobytes()], pa.large_binary())}
        )

    # tree reduce: one 8·k-byte sketch per input block would pull
    # O(blocks) sketches to the driver (at k=65536 that is ~512 KB per
    # block — hundreds of GB on a 10^6-block read); coalesce to ~16
    # partitions and merge within each first so the driver folds O(16)
    # sketches. KMV merge (union + truncate) is associative and
    # commutative, so the tree shape cannot change the result.
    sketches = (
        ds.map_batches(sketch_batch, batch_format="pyarrow")
        .repartition(16)
        .map_batches(merge_batch, batch_format="pyarrow", batch_size=None)
    )
    merged = np.array([], dtype=np.uint64)
    for b in sketches.iter_batches(batch_format="pyarrow"):
        for blob in b["sketch"].to_pylist():
            arr = np.frombuffer(blob, dtype=np.uint64)
            merged = np.unique(np.concatenate([merged, arr]))[:k]
    if len(merged) < k:
        return float(len(merged))
    return (k - 1) / (float(merged[-1]) / _MAX64)


def kmv_distinct_by(ds, key: str, column: str, *, k: int = 1024):
    """Grouped ``COUNT(DISTINCT column) GROUP BY key`` at scale.

    A naive grouped distinct shuffles every (key, value) pair — at
    100 TB that's the full column through the exchange. Here each
    batch emits ONE sorted-k-smallest-hash KMV partial per group
    present in it (same vectorized form as
    :func:`kmv_distinct_estimate`), so the shuffle moves <= 8k bytes
    per (group, block) — never the values — and a tiny groupby folds
    the partials per key. The fold's group size is bounded by the
    BLOCK count, not by group cardinality (the boundary-carry
    discipline). Exact while a group's true distinct < k; classic KMV
    estimate beyond. Returns a Dataset of (key, n_distinct: double).

    SQL parity on nulls (the quantile-stage rule): null VALUES are
    excluded from the distinct count (``COUNT(DISTINCT x)`` skips
    NULLs), while a null GROUP key is its own group."""
    import pandas as pd
    import pyarrow as pa

    def sketch_batch(t: pa.Table) -> pa.Table:
        df = t.select([key, column]).to_pandas()
        h = pd.util.hash_array(df[column].to_numpy())
        val_ok = df[column].notna().to_numpy()
        # the null group can't ride the shuffle as an actual null —
        # Ray's sort-based groupby can't order None against real keys
        # (TypeError) — so encode it as (type-zero fill, _knull flag)
        # and restore None in the fold
        fill = "" if df[key].dtype == object else df[key].dtype.type(0)
        keys, knulls, blobs = [], [], []
        for g, idx in df.groupby(key, sort=False, dropna=False).indices.items():
            sel = idx[val_ok[idx]]
            u = np.unique(h[sel])[:k]
            isna = pd.isna(g)
            keys.append(fill if isna else g)
            knulls.append(bool(isna))
            blobs.append(u.astype(np.uint64).tobytes())
        return pa.table(
            {
                key: pa.array(keys),
                "_knull": pa.array(knulls, pa.bool_()),
                "sketch": pa.array(blobs, pa.large_binary()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        merged = np.array([], dtype=np.uint64)
        for blob in df["sketch"]:
            merged = np.unique(
                np.concatenate([merged, np.frombuffer(blob, dtype=np.uint64)])
            )[:k]
        est = (
            float(len(merged))
            if len(merged) < k
            else (k - 1) / (float(merged[-1]) / _MAX64)
        )
        key_out = None if bool(df["_knull"].iloc[0]) else df[key].iloc[0]
        return pd.DataFrame({key: [key_out], "n_distinct": [est]})

    return (
        ds.map_batches(sketch_batch, batch_format="pyarrow")
        .groupby([key, "_knull"])
        .map_groups(fold, batch_format="pandas")
    )


# ---------------------------------------------------------------- Bloom


class BloomFilter:
    """Mergeable Bloom filter over 64-bit key hashes — the exact-dedup
    SHUFFLE PREFILTER at corpus scale: build per-partition filters in
    one streaming pass (map partials, OR-merge — associative and
    commutative, so tree-merge at 100 TB), then a negative lookup
    PROVES a key was never seen anywhere, so only Bloom-positive keys
    (true duplicates + ~fp_rate false positives) need to enter the
    dedup exchange at all. For a mostly-unique corpus that removes
    almost the whole all-to-all.

    Deterministic double hashing (Kirsch–Mitzenmacher): bit positions
    ``(h1 + i*h2) mod m`` for ``i < k`` with ``h1``/``h2`` splitmix64
    finalizers of the input hash (``h2`` forced odd). Parameters from
    the standard sizing ``m = -n ln p / (ln 2)^2``, ``k = (m/n) ln 2``.
    No false negatives ever; the numpy bit array is vectorized for
    both add and lookup (``np.bitwise_or.at`` scatter, gather + AND)."""

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        import math

        if capacity < 1 or not (0.0 < fp_rate < 1.0):
            raise ValueError(f"bad Bloom sizing: {capacity=} {fp_rate=}")
        m_bits = int(round(-capacity * math.log(fp_rate) / math.log(2) ** 2))
        self.m = max(64, (m_bits + 63) // 64 * 64)  # whole uint64 words
        self.k = max(1, int(round(self.m / capacity * math.log(2))))
        self.capacity = capacity
        self.fp_rate = fp_rate
        self.words = np.zeros(self.m // 64, np.uint64)

    def _positions(self, hashes) -> np.ndarray:
        h = np.asarray(hashes, np.uint64)
        from .dedup import _splitmix64

        h1 = _splitmix64(h)
        h2 = _splitmix64(h ^ np.uint64(0xA076_1D64_78BD_642F)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.m)

    def add_hashes(self, hashes) -> None:
        if len(hashes) == 0:
            return
        pos = self._positions(hashes).reshape(-1)
        np.bitwise_or.at(
            self.words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains_hashes(self, hashes) -> np.ndarray:
        """Boolean mask; False is a PROOF the key was never added."""
        if len(hashes) == 0:
            return np.zeros(0, bool)
        pos = self._positions(hashes)
        bits = (
            self.words[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))
        ) & np.uint64(1)
        return bits.all(axis=1)

    def _check_same(self, other: "BloomFilter") -> None:
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError(
                f"Bloom merge needs identical sizing: "
                f"(m={self.m}, k={self.k}) vs (m={other.m}, k={other.k})"
            )

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        self._check_same(other)
        out = BloomFilter(self.capacity, self.fp_rate)
        out.words = self.words | other.words
        return out

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.words.view(np.uint8)).mean())

    def serialize(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, capacity: int,
                    fp_rate: float = 0.01) -> "BloomFilter":
        out = cls(capacity, fp_rate)
        words = np.frombuffer(data, np.uint64)
        if len(words) != len(out.words):
            raise ValueError(
                f"Bloom blob has {len(words)} words, sizing expects "
                f"{len(out.words)}"
            )
        out.words = words.copy()
        return out


# --------------------------------------------------------------------------
# HyperLogLog — constant-size mergeable distinct-count sketch
# --------------------------------------------------------------------------

HLL_P = 12                      # 4096 registers, std err ~1.04/sqrt(m) = 1.6%
HLL_M = 1 << HLL_P
_HLL_W_BITS = 64 - HLL_P        # 52 suffix bits feed rho
_HLL_W_MASK = np.uint64((1 << _HLL_W_BITS) - 1)
_SM64_C1 = 0xBF58476D1CE4E5B9
_SM64_C2 = 0x94D049BB133111EB


def splitmix64(values: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (Steele et al., public domain
    constants) — the well-mixed 64-bit hash HLL needs. uint64 wrap
    semantics on purpose; kept xor/shift/multiply-only so the DuckDB
    oracle re-derives it exactly over HUGEINT (`hll_oracle_sql`)."""
    x = values.astype(np.uint64, copy=False)
    x = x ^ (x >> np.uint64(30))
    x = x * np.uint64(_SM64_C1)
    x = x ^ (x >> np.uint64(27))
    x = x * np.uint64(_SM64_C2)
    x = x ^ (x >> np.uint64(31))
    return x


class HyperLogLog:
    """Flajolet et al. 2007 HLL over int64 keys: register j = top-p
    hash bits, rho = leading zeros of the 52-bit suffix + 1, register
    keeps max(rho). Merge = elementwise max (associative/commutative:
    tree-merge freely at 100 TB; 4 KB per sketch regardless of
    cardinality — the KMV sibling is exact below k but grows with k).

    The estimate is DETERMINISTIC given the key set: the denominator
    sum(2^-M_j) is computed exactly in integer space scaled by 2^53
    (max 4096·2^53 < 2^65 — Python int / DuckDB HUGEINT), so engine
    and oracle divide the same two numbers; the small-range linear
    count m·ln(m/V) fires on the identical integer V on both sides.
    """

    def __init__(self):
        self.regs = np.zeros(HLL_M, np.uint8)

    def add_int64(self, values: np.ndarray) -> None:
        h = splitmix64(values)
        j = (h >> np.uint64(_HLL_W_BITS)).astype(np.int64)
        w = h & _HLL_W_MASK
        # bit_length via frexp: w < 2^52 is exact in float64, and
        # frexp(w) = (m, e) with w = m·2^e, 0.5 <= m < 1 → e = bit_length
        _, e = np.frexp(w.astype(np.float64))
        rho = np.where(w == 0, _HLL_W_BITS + 1, _HLL_W_BITS + 1 - e).astype(
            np.uint8
        )
        np.maximum.at(self.regs, j, rho)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        out = HyperLogLog()
        out.regs = np.maximum(self.regs, other.regs)
        return out

    def estimate(self) -> float:
        m = HLL_M
        counts = np.bincount(self.regs, minlength=_HLL_W_BITS + 2)
        # exact integer denominator, scaled by 2^53
        denom = sum(
            int(c) << (_HLL_W_BITS + 1 - r)
            for r, c in enumerate(counts.tolist())
            if c
        )
        alpha = 0.7213 / (1.0 + 1.079 / float(m))
        est = alpha * float(m) * float(m) * float(1 << (_HLL_W_BITS + 1)) / float(denom)
        v = int(counts[0])
        if est <= 2.5 * m and v > 0:
            est = float(m) * math.log(float(m) / float(v))
        return est

    def serialize(self) -> bytes:
        return self.regs.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HyperLogLog":
        out = cls()
        regs = np.frombuffer(data, np.uint8)
        if len(regs) != HLL_M:
            raise ValueError(f"HLL blob has {len(regs)} registers, want {HLL_M}")
        out.regs = regs.copy()
        return out


def hll_distinct_by(ds, key: str, column: str):
    """Grouped HLL distinct-count: per batch, ONE 4 KB register row per
    group present in it (values never shuffle); partials tree-merge by
    elementwise max — first within ~16 coalesced partitions, then an
    O(16·groups) driver fold (same scale shape as ``kmv_distinct_by``;
    unlike KMV the partial size is constant in both k and cardinality).

    Returns ``{group_value: HyperLogLog}`` — callers merge across
    groups for a grand total (register max IS the union sketch).
    NULL column values are dropped (COUNT(DISTINCT x) parity)."""
    import pyarrow as pa

    def sketch_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys_np = t[key].to_numpy(zero_copy_only=False)
        # fill_null BEFORE to_numpy: a null would force the int64
        # column to float64 and silently round keys past 2^53
        vals = pc.fill_null(t[column], 0).to_numpy(zero_copy_only=False)
        null_mask = t[column].is_null().to_numpy(zero_copy_only=False)
        out_k, out_s = [], []
        for g in pd_unique_stable(keys_np):
            m = (keys_np == g) & ~null_mask
            if not m.any():
                continue
            h = HyperLogLog()
            h.add_int64(vals[m].astype(np.int64))
            out_k.append(g)
            out_s.append(h.serialize())
        return pa.table(
            {
                key: pa.array(out_k),
                "sketch": pa.array(out_s, pa.large_binary()),
            }
        )

    def merge_partition(t: pa.Table) -> pa.Table:
        acc: dict = {}
        ks = t[key].to_pylist()
        for g, blob in zip(ks, t["sketch"].to_pylist()):
            h = HyperLogLog.deserialize(blob)
            acc[g] = acc[g].merge(h) if g in acc else h
        return pa.table(
            {
                key: pa.array(list(acc.keys())),
                "sketch": pa.array(
                    [h.serialize() for h in acc.values()], pa.large_binary()
                ),
            }
        )

    parts = (
        ds.map_batches(sketch_batch, batch_format="pyarrow")
        .repartition(16)
        .map_batches(merge_partition, batch_format="pyarrow", batch_size=None)
    )
    final: dict = {}
    for b in parts.iter_batches(batch_format="pyarrow"):
        for g, blob in zip(b[key].to_pylist(), b["sketch"].to_pylist()):
            h = HyperLogLog.deserialize(blob)
            final[g] = final[g].merge(h) if g in final else h
    return final


def pd_unique_stable(arr: np.ndarray) -> np.ndarray:
    """First-appearance-order unique (np.unique sorts, which breaks on
    mixed-type object keys; pandas preserves order and handles objects)."""
    import pandas as pd

    return pd.unique(arr)


class QuantileSketch:
    """Deterministic mergeable quantile sketch — an MRL/KLL compactor
    hierarchy (Manku-Rajagopalan-Lindsay 1998; Karnin-Lall-Liberty
    2016) with ALTERNATING-PARITY compaction instead of coin flips, so
    there is no randomness anywhere: a fixed fold order reproduces
    bit-identical estimates, and the parity alternation cancels the
    systematic rank drift a fixed offset would accumulate.

    Level i holds values of weight 2^i. When a level exceeds ``k``
    items it is sorted and every other element (starting at the
    level's parity offset, which then flips) is promoted one level up
    at doubled weight. Size is O(k log(n/k)); worst-case rank error is
    O(n log(n/k) / k) — at k=512 that is well under 1% of n for any
    corpus this engine folds on a driver, and the consuming query
    EXPOSES the realized error per quantile (true_rank columns) rather
    than asserting the bound blindly.

    Merging = concatenate levels pairwise + recompress: associative up
    to the documented error bound (the tree-merge shape at 100 TB —
    per-batch sketches are ~k·log(n) rows, so the driver fold carries
    sketch-sized, not corpus-sized, traffic).
    """

    def __init__(self, k: int = 512):
        if k < 8:
            raise ValueError(f"QuantileSketch: k={k} too small")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.parity: list[int] = [0]
        self.n = 0

    def add(self, values: np.ndarray) -> "QuantileSketch":
        v = np.asarray(values, np.float64)
        if len(v) and not np.all(np.isfinite(v)):
            raise ValueError(
                "QuantileSketch: non-finite values (drop nulls before "
                "sketching — the COUNT(DISTINCT)-parity rule)"
            )
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def add_level(self, level: int, values: np.ndarray) -> None:
        """Fold pre-weighted rows (level i = weight 2^i) from another
        sketch's flattened representation; call compress() after."""
        while len(self.levels) <= level:
            self.levels.append(np.empty(0, np.float64))
            self.parity.append(0)
        self.levels[level] = np.concatenate(
            [self.levels[level], np.asarray(values, np.float64)]
        )

    def compress(self) -> None:
        self._compress()

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                buf = np.sort(self.levels[i], kind="stable")
                off = self.parity[i]
                self.parity[i] ^= 1
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, np.float64))
                    self.parity.append(0)
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], buf[off::2]]
                )
                self.levels[i] = np.empty(0, np.float64)
            i += 1

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        if other.k != self.k:
            raise ValueError("QuantileSketch.merge: mismatched k")
        for i, arr in enumerate(other.levels):
            if len(arr):
                self.add_level(i, arr)
        self.n += other.n
        self._compress()
        return self

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for i, arr in enumerate(self.levels):
            if len(arr):
                vals.append(arr)
                wts.append(np.full(len(arr), 1 << i, np.int64))
        if not vals:
            return np.empty(0, np.float64), np.empty(0, np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def rank_value(self, target_rank: int) -> float:
        """Smallest stored value whose cumulative weight reaches
        ``target_rank`` (clamped to the last value if compaction left
        total weight just under n)."""
        v, w = self._weighted()
        if len(v) == 0:
            raise ValueError("QuantileSketch: empty")
        cum = np.cumsum(w)
        idx = int(np.searchsorted(cum, max(1, int(target_rank))))
        return float(v[min(idx, len(v) - 1)])


CMS_D = 4
CMS_W = 1024


class CountMin:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over int64
    keys: d hash rows x w counters, estimate = min over rows — never
    an underestimate, overestimate bounded by collisions (~n/w per
    row). Merge = elementwise ADD (associative/commutative — the
    tree-merge shape; constant (d·w)·8 bytes per sketch).

    Hashing is Kirsch-Mitzenmacher double hashing on two chained
    ``splitmix64`` applications (a; b = splitmix64(a) | 1; col_i =
    (a + i·b) mod 2^64 mod w) — xor/shift/multiply only, so the DuckDB
    oracle re-derives every counter AND every estimate exactly over
    UHUGEINT (the HLL precedent).
    """

    def __init__(self, d: int = CMS_D, w: int = CMS_W):
        self.d, self.w = int(d), int(w)
        self.counters = np.zeros((self.d, self.w), np.int64)
        self.n = 0

    def _cols(self, keys: np.ndarray) -> np.ndarray:
        """(d, len(keys)) column indices."""
        a = splitmix64(keys.astype(np.int64).view(np.uint64))
        b = splitmix64(a) | np.uint64(1)
        i = np.arange(self.d, dtype=np.uint64)[:, None]
        return ((a[None, :] + i * b[None, :]) % np.uint64(self.w)).astype(
            np.int64)

    def add(self, keys: np.ndarray) -> "CountMin":
        keys = np.asarray(keys, np.int64)
        cols = self._cols(keys)
        for i in range(self.d):
            np.add.at(self.counters[i], cols[i], 1)
        self.n += len(keys)
        return self

    def merge(self, other: "CountMin") -> "CountMin":
        if (other.d, other.w) != (self.d, self.w):
            raise ValueError("CountMin.merge: mismatched dimensions")
        self.counters += other.counters
        self.n += other.n
        return self

    def estimate(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, np.int64)
        cols = self._cols(keys)
        ests = np.stack([self.counters[i, cols[i]] for i in range(self.d)])
        return ests.min(axis=0)
