"""Edit-distance-1 similarity self-join — FastSS (Bocek et al. 2007)
deletion-neighborhood blocking + exact verify: the fuzzy-key join a
crawl pipeline runs to merge near-identical urls/titles that exact
and shingle dedup both miss (one-char typos, off-by-one ids).

Why deletion neighborhoods: ed(s,t) ≤ 1 ⇒ s and t share a member of
N(x) = {x} ∪ {x minus one char} (substitution: delete the differing
position from both; insert/delete: delete the inserted char; equality:
trivial) — so grouping by variant finds EVERY qualifying pair, and a
cheap exact verify kills the false candidates (variant sharing does
not imply ed ≤ 1: "ab"/"ba" share both "a" and "b" at distance 2).

Scale shape: the variant expansion multiplies rows by ~|key|+1 — the
documented cost of the method (FastSS trades space for avoiding the
quadratic all-pairs scan); variants hash-bucket by crc32 and ONE
groupby(bucket) co-locates them (the dedup_keep_latest bucketing
pattern — hot variants cannot concentrate past the hash). In-bucket
candidate emission is a vectorized sort + run scan (pairs only within
equal-variant runs, which are near-singleton for url-like keys);
unique pairs come from one more groupby; verify is an embarrassingly
parallel map. The census folds (count, XOR) partials — nothing
corpus-sized ever reaches the driver.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

MAX_RUN_PAIRS = 1_000_000  # per-variant-run quadratic guard


def _ed_le1(a: str, b: str) -> bool:
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return False
                seen = True
        return True
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def pair_checksum(a: str, b: str) -> int:
    """60-bit md5 prefix of 'a|b' — mirrored by the SQL oracle's
    ('0x' || substr(md5(ua || '|' || ub), 1, 15))::BIGINT."""
    return int(hashlib.md5(f"{a}|{b}".encode()).hexdigest()[:15], 16)


def edit1_pairs(ds, *, col: str = "url", n_buckets: int = 32):
    """Dataset of unique (a, b) pairs (a < b) at edit distance ≤ 1
    over the DISTINCT values of ``col``."""
    from ray.data.aggregate import Count

    distinct = ds.select_columns([col]).groupby(col).aggregate(
        Count(alias_name="_n"))

    def variants(t: pa.Table) -> pa.Table:
        vs, ks, bs = [], [], []
        for k in t[col].to_pylist():
            neigh = [k] + [k[:i] + k[i + 1:] for i in range(len(k))]
            for v in neigh:
                vs.append(v)
                ks.append(k)
                bs.append(zlib.crc32(v.encode()) % n_buckets)
        return pa.table({
            "v": pa.array(vs, pa.string()),
            "k": pa.array(ks, pa.string()),
            "_bucket": pa.array(bs, pa.int32()),
        })

    def bucket_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string())})
        s = g.sort_by([("v", "ascending"), ("k", "ascending")])
        v = s["v"].to_numpy(zero_copy_only=False)
        k = s["k"].to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(
            np.concatenate(([True], v[1:] != v[:-1], [True])))
        out_a, out_b = [], []
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            run = k[s0:s1]
            if len(run) < 2:
                continue
            if (len(run) * (len(run) - 1)) // 2 > MAX_RUN_PAIRS:
                raise ValueError(
                    f"edit1_pairs: a variant run of {len(run)} keys "
                    f"would emit more than MAX_RUN_PAIRS candidate "
                    f"pairs — keys this degenerate need a coarser "
                    f"blocking scheme"
                )
            uniq = np.unique(run)
            for i in range(len(uniq)):
                for j in range(i + 1, len(uniq)):
                    out_a.append(uniq[i])
                    out_b.append(uniq[j])
        return pa.table({"a": pa.array(out_a, pa.string()),
                         "b": pa.array(out_b, pa.string())})

    cand = (
        distinct.map_batches(variants, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_c"))
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string())})
        a = t["a"].to_pylist()
        b = t["b"].to_pylist()
        keep = pa.array([_ed_le1(x, y) for x, y in zip(a, b)], pa.bool_())
        return t.select(["a", "b"]).filter(keep)

    return cand.map_batches(verify, batch_format="pyarrow")


def edit1_join_census(ds, *, col: str = "url",
                      n_buckets: int = 32) -> pd.DataFrame:
    """(n_keys, n_pairs, pair_ck): distinct-key count, matched-pair
    count, and the XOR of each pair's 60-bit md5 checksum — one
    wrong/missing pair anywhere flips pair_ck."""
    from ray.data.aggregate import Count

    n_keys = int(ds.select_columns([col]).groupby(col).aggregate(
        Count(alias_name="_n")).count())
    pairs = edit1_pairs(ds, col=col, n_buckets=n_buckets)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"n": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64())})
        cks = [pair_checksum(x, y)
               for x, y in zip(t["a"].to_pylist(), t["b"].to_pylist())]
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "x": pa.array([int(np.bitwise_xor.reduce(
                np.array(cks, np.int64)))], pa.int64()),
        })

    n_pairs, ck = 0, 0
    for block in pairs.map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for n, x in zip(block["n"].to_pylist(), block["x"].to_pylist()):
            n_pairs += n
            ck ^= x
    return pd.DataFrame({
        "n_keys": pd.array([n_keys], dtype="int64"),
        "n_pairs": pd.array([n_pairs], dtype="int64"),
        "pair_ck": pd.array([ck], dtype="int64"),
    })
