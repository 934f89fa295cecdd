"""Corpus-scale deduplication stages (SURVEY.md scale addenda).

Five operators over any Dataset with a text column + int64 key column:

- ``exact_dedup``          hash-partition on normalized-text hash, keep
                           min key per group (vectorized, bucketed).
- ``minhash_lsh_pairs``    shingle -> MinHash -> banded LSH buckets ->
                           candidate pairs -> exact-Jaccard verify.
                           Shuffle moves ONLY (band_id, band_hash, key)
                           projections — never document text; verification
                           joins text back via a bucketed exchange.
- ``simhash_dups``         64-bit SimHash, duplicates = identical hash
                           (hamming-0 buckets).
- ``simhash_neardup_pairs`` hamming<=k SimHash pairs via the pigeonhole
                           band trick: k+1 bit-bands, exact-match each
                           band, verify hamming in-bucket (EXACT up to
                           mega-bucket star degradation).
- ``ngram_jaccard_pairs``  exact all-pairs Jaccard within small hash
                           buckets (brute force verifier / tiny-corpus
                           path).
- ``embedding_neardup_pairs`` cosine near-dups over an embedding column
                           via LSH sign-bucketing + in-bucket matmul.

Partitioning assumption (documented per the custom-operator rule): a
candidate *bucket* fits in one worker's heap. Band count / bucket bits
control bucket size; buckets larger than ``max_bucket`` (mega-clusters
of near-identical docs) degrade to a STAR against the bucket's min key
— O(n) pairs that preserve cluster connectivity — instead of the full
O(n²) pair set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.dedup import (
    jaccard_hashed,
    lsh_band_hashes,
    minhash_signature,
    shingle_hashes,
    simhash,
)
from ..core.textstats import fingerprint
from ..pool import (
    clamp_join_partitions,
    default_pool_size,
    join_cpu_reservation_guard,
    pin_join_cpu_reservation,
)


def _text_col(t: pa.Table, col: str) -> list[str]:
    return [x if x is not None else "" for x in t[col].to_pylist()]


# Driver-side guards (mirror manifest.COMPACT_URL_LIMIT).
# CANDIDATE_PAIR_LIMIT is a DISPATCH threshold since round 4: below it
# the unique pair set may ride the driver as pandas (fast lane); above
# it the plumbing stays a Dataset end-to-end (banding → unique →
# verify → cluster) and the driver never holds a pair frame — a >20M
# pair corpus runs to completion instead of raising (VERDICT r3 #1).
# GATHER_TEXT_LIMIT still RAISES: the broadcast text gather is
# driver-resident by construction, so past the cap callers must be on
# the distributed verify already.
CANDIDATE_PAIR_LIMIT = 20_000_000
GATHER_TEXT_LIMIT = 2_000_000


def _empty_pairs_df(score_col: str):
    import pandas as pd

    return pd.DataFrame(
        {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
         score_col: pd.Series(dtype="float64")}
    )


# ---------------------------------------------------------------- exact

def exact_dedup(ds, key: str, text: str, n_buckets: int = 64):
    """Keep min(key) per distinct normalized text. Returns Dataset with
    columns (key, n_copies) — G4's global form."""

    def add_fp(t: pa.Table) -> pa.Table:
        fps = pa.array([fingerprint(x) for x in _text_col(t, text)], pa.int64())
        bucket = pa.array([f % n_buckets for f in fps.to_pylist()], pa.int32())
        return pa.table({key: t[key], "_fp": fps, "_bucket": bucket})

    def keep_min(group: pa.Table) -> pa.Table:
        order = group.sort_by([("_fp", "ascending"), (key, "ascending")])
        fps = order["_fp"].to_numpy()
        first = np.ones(len(fps), dtype=bool)
        first[1:] = fps[1:] != fps[:-1]
        counts = np.diff(np.append(np.flatnonzero(first), len(fps)))
        kept = order.filter(pa.array(first))
        return pa.table(
            {key: kept[key], "n_copies": pa.array(counts, pa.int64())}
        )

    return (
        ds.map_batches(add_fp, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(keep_min, batch_format="pyarrow")
    )


def build_hash_bloom(ds, col: str, *, capacity: int, fp_rate: float = 0.01):
    """One streaming pass -> a merged ``core.sketch.BloomFilter`` over
    the uint64/int64 hash column ``col`` — the exact-dedup SHUFFLE
    PREFILTER: a negative ``contains_hashes`` lookup PROVES a key never
    occurred in ``ds``, so a second corpus (or a later partition of the
    same job) can drop provably-unseen keys before any dedup exchange;
    only Bloom-positive keys (true dups + ~fp_rate false positives)
    shuffle. Per-batch partial filters ride back as m/8-byte blobs and
    OR-fold on the driver — the merge is associative and commutative,
    so at 100 TB the fold becomes a per-partition tree-merge instead."""
    from ..core.sketch import BloomFilter

    proto = BloomFilter(capacity, fp_rate)

    def partial(t: pa.Table) -> pa.Table:
        b = BloomFilter(capacity, fp_rate)
        b.add_hashes(
            t[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        return pa.table({"blob": pa.array([b.serialize()], pa.large_binary())})

    merged = proto
    for part in ds.map_batches(partial, batch_format="pyarrow").to_pandas()[
        "blob"
    ]:
        merged = merged.merge(
            BloomFilter.deserialize(part, capacity, fp_rate)
        )
    return merged


# ------------------------------------------------------------- minhash

class MinHasher:
    """Actor-pool stage: seeds/permutation tables built once per actor."""

    def __init__(self, key: str, text: str, n_perm: int = 128, k_shingle: int = 3,
                 n_bands: int = 16):
        self.key = key
        self.text = text
        self.n_perm = n_perm
        self.k = k_shingle
        self.n_bands = n_bands
        # warm the seed cache once per actor
        minhash_signature("warm", n_perm=n_perm, k=k_shingle)

    def __call__(self, t: pa.Table) -> pa.Table:
        keys, bands, bhashes = [], [], []
        for key_val, txt in zip(t[self.key].to_pylist(), _text_col(t, self.text)):
            sig = minhash_signature(txt, n_perm=self.n_perm, k=self.k)
            for band_id, band_hash in lsh_band_hashes(sig, n_bands=self.n_bands):
                keys.append(key_val)
                bands.append(band_id)
                bhashes.append(band_hash)
        return pa.table(
            {
                self.key: pa.array(keys, pa.int64()),
                "band_id": pa.array(bands, pa.int32()),
                "band_hash": pa.array(bhashes, pa.int64()),
            }
        )


def make_bucket_pairs_fn(key: str, max_bucket: int):
    """Per-LSH-bucket candidate pair emitter — the REFERENCE
    implementation (one ``map_groups`` call per (band_id, band_hash)
    group): all pairs within a bucket; buckets larger than
    ``max_bucket`` (mega-clusters of near-identical docs) degrade to an
    O(n) STAR against the min key — connectivity for clustering is
    preserved. Production paths use ``band_candidate_pairs`` (identical
    semantics, hash-bucketed + vectorized — band groups are tiny and
    numerous, so per-group dispatch paid Ray group overhead per band
    hash: 10.9 s for 80k groups at 16 CPUs where the bucketed form is
    ~1 s); this per-group form stays as the equivalence-test oracle."""

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ks = sorted(set(group[key].to_pylist()))
        if len(ks) < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        out_a, out_b = [], []
        if len(ks) > max_bucket:
            rep = ks[0]
            for other in ks[1:]:
                out_a.append(rep)
                out_b.append(other)
        else:
            for i in range(len(ks)):
                for j in range(i + 1, len(ks)):
                    out_a.append(ks[i])
                    out_b.append(ks[j])
        return pa.table({"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64())})

    return bucket_pairs


# triu index cache shared across tasks in a worker process; only small
# segment sizes are cached (a mega-segment's triu would pin O(n²) ints)
_TRIU_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}
_TRIU_CACHE_MAX_N = 512


def _triu(n: int) -> tuple[np.ndarray, np.ndarray]:
    got = _TRIU_CACHE.get(n)
    if got is None:
        got = np.triu_indices(n, 1)
        if n <= _TRIU_CACHE_MAX_N:
            _TRIU_CACHE[n] = got
    return got


def band_candidate_pairs(band_rows, key: str, max_bucket: int, *,
                         n_buckets: int | None = None):
    """Candidate pair Dataset from (key, band_id, band_hash) rows —
    the production form of ``make_bucket_pairs_fn``'s per-group
    dispatch, with identical semantics (equivalence-tested).

    Band groups are tiny (tens of rows) and numerous (one per distinct
    band hash), so grouping BY band hash pays per-group overhead for
    every one of them. Instead each band group is routed to one of
    ``n_buckets`` hash buckets (the exact_dedup pattern) and a bucket's
    block emits ALL its groups' pairs in one vectorized sweep: lexsort
    by (band_id, band_hash, key), segment boundaries via flatnonzero,
    cached triu indices per segment size, the same ``max_bucket`` star
    degradation. Pairs are pre-deduped within the emitting block
    (lexsort mask) so the downstream global dedup shuffles less —
    band-duplicate pairs mostly collapse at the source."""
    if n_buckets is None:
        n_buckets = max(64, default_pool_size() * 8)

    def tag(t: pa.Table) -> pa.Table:
        bh = t["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bi = t["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mixed = (bh + bi * np.uint64(0x9E3779B97F4A7C15)) & np.uint64((1 << 64) - 1)
        mixed ^= mixed >> np.uint64(33)
        return t.append_column(
            "_bucket", pa.array((mixed % np.uint64(n_buckets)).astype(np.int32))
        )

    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})

    def bucket_pairs_vec(group: pa.Table) -> pa.Table:
        bi = group["band_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bh = group["band_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
        ks = group[key].to_numpy(zero_copy_only=False).astype(np.int64)
        if ks.size == 0:
            return empty
        order = np.lexsort((ks, bh, bi))
        bi, bh, ks = bi[order], bh[order], ks[order]
        seg_start = np.r_[True, (bi[1:] != bi[:-1]) | (bh[1:] != bh[:-1])]
        starts = np.flatnonzero(seg_start)
        ends = np.r_[starts[1:], ks.size]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            seg = ks[s:e]
            seg = seg[np.r_[True, seg[1:] != seg[:-1]]]  # unique (sorted)
            n = seg.size
            if n < 2:
                continue
            if n > max_bucket:
                out_a.append(np.full(n - 1, seg[0], np.int64))
                out_b.append(seg[1:])
            else:
                ii, jj = _triu(n)
                out_a.append(seg[ii])
                out_b.append(seg[jj])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        # block-local pair dedup (cross-band duplicates that landed in
        # the same bucket collapse here; global dedup still runs after)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pa.table(
            {"a": pa.array(a[first], pa.int64()), "b": pa.array(b[first], pa.int64())}
        )

    # reduce-partition count stays at the sort shuffle's default (one
    # per input block): an explicit 2x-pool num_partitions was A/B
    # measured (round 4) — shuffle-machinery-only it looked ~2x
    # cheaper, but with the emitter included the coarser layout LOST
    # at 16 CPUs (4.6-5.5 s vs 3.9-4.1 s; fewer, bigger map_groups
    # tasks balance worse) and was noise-neutral at 4.
    return (
        band_rows.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_pairs_vec, batch_format="pyarrow")
    )


def minhash_lsh_pairs(
    ds,
    key: str,
    text: str,
    *,
    n_perm: int = 128,
    n_bands: int = 16,
    k_shingle: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 64,
    verify_mode: str = "auto",
):
    """MinHash+LSH near-dup candidate pairs, verified by exact Jaccard.

    Returns a pandas DataFrame (a, b, jaccard) with a < b, jaccard >=
    threshold. The LSH shuffle moves (key, band_id, band_hash) rows
    only. Three-way dispatch by candidate volume:

    - pair count <= ``GATHER_TEXT_LIMIT`` and referenced keys fit the
      gather cap: zero-exchange broadcast verify
      (:func:`_verify_pairs_broadcast_ds`) over the distributed unique
      pairs — the fast lane for ordinary corpora (round 4: removing
      the two-join exchange was worth ~2-4.5 s of all-to-all floor at
      every CPU level);
    - up to ``CANDIDATE_PAIR_LIMIT``: driver pandas unique + the
      gather/distributed verify dispatch (VERDICT r3 #1 fast lane);
    - above it: the ENTIRE plumbing stays a Dataset
      (:func:`minhash_lsh_pairs_ds`) and the driver only ever pulls
      the verified, post-threshold output — a >20M-pair corpus runs
      to completion instead of raising.

    All lanes are equivalence-tested.
    """
    band_rows = _lsh_band_rows(
        ds, key, text, n_perm=n_perm, k_shingle=k_shingle, n_bands=n_bands
    )
    cand_ds = band_candidate_pairs(band_rows, key, max_bucket).materialize()
    # blocks stay in the object store; count() is then free
    n_cand = cand_ds.count()
    if n_cand > CANDIDATE_PAIR_LIMIT:
        out = _verify_pairs_distributed_ds(
            ds, key, text, _dedup_candidates_ds(cand_ds, n_cand), n_cand,
            k_shingle=k_shingle, threshold=threshold,
        ).to_pandas()
        return _normalize_pairs_df(out)
    if verify_mode in ("auto", "driver") and n_cand <= GATHER_TEXT_LIMIT:
        # key pull is bounded by 2 * n_cand ints; the pair rows stay
        # in the object store (unique runs lazily into the scorer)
        needed = _candidate_keys(cand_ds)
        if len(needed) <= GATHER_TEXT_LIMIT:
            out = _verify_pairs_broadcast_ds(
                ds, key, text, _dedup_candidates_ds(cand_ds, n_cand), needed,
                k_shingle=k_shingle, threshold=threshold,
            ).to_pandas()
            return _normalize_pairs_df(out)
    cand = _dedup_candidates(cand_ds, n_cand)
    return verify_candidate_pairs(
        ds, key, text, cand, k_shingle=k_shingle, threshold=threshold,
        verify_mode=verify_mode,
    )


def minhash_lsh_pairs_ds(
    ds,
    key: str,
    text: str,
    *,
    n_perm: int = 128,
    n_bands: int = 16,
    k_shingle: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 64,
):
    """Fully Dataset-native MinHash+LSH near-dup pairs: banding →
    vectorized bucket pair emission → distributed pair-unique →
    distributed pair-side verify, with the candidate pair set NEVER
    leaving the object store (round-4 de-drivering). Returns a lazy
    Dataset of verified (a, b, jaccard) rows; a < b holds per row but
    global order is unspecified — sort on consumption if needed.

    Execution shape: STAGED, deliberately. A round-4 experiment fused
    pair emission + pair-unique + the two verify joins into one lazy
    DAG to overlap their fixed costs — measured 86 s where the staged
    form takes ~17 s on the same x64 corpus (two chained sort-groupbys
    feeding two hash joins in one streaming plan thrash the scheduler:
    138 workers spawned, tiny-block churn at every boundary). The
    candidate materialize also gives the EXACT pair count, which sizes
    the verify partitions correctly where the fused lane's band-row
    upper bound oversized them 26x."""
    band_rows = _lsh_band_rows(
        ds, key, text, n_perm=n_perm, k_shingle=k_shingle, n_bands=n_bands
    )
    cand_ds = band_candidate_pairs(band_rows, key, max_bucket).materialize()
    n_cand = cand_ds.count()
    return _verify_pairs_distributed_ds(
        ds, key, text, _dedup_candidates_ds(cand_ds, n_cand), n_cand,
        k_shingle=k_shingle, threshold=threshold,
    )


def _lsh_band_rows(ds, key: str, text: str, *, n_perm: int, k_shingle: int,
                   n_bands: int):
    """(key, band_id, band_hash) rows via the actor-pool MinHasher.

    MEASURED DEAD END (round 5): a stateless-TASK variant (plain
    function map_batches, seed cache per worker process, zero actor
    spinup) was neutral at 16 CPUs (13-14 s on the x64 bench corpus)
    but a 2x REGRESSION at 4 CPUs — 69-71 s vs the actor pool's
    34.8 s, back-to-back A/B on a quiet host. Task maps are fusible
    into the downstream sort-groupby's map phase, which strangles the
    banding stage's parallelism exactly when CPUs are scarce; the
    actor pool forms its own fusion barrier with a dedicated fixed
    pool. Keep the pool.

    Pool history: a constant concurrency=2 silently capped the
    banding stage at 2 CPUs (0.29 scaling efficiency pre-round-3).
    batch_size splits single-block inputs (one parquet row group ->
    one block) across the pool; 2048 (was 512) quarters the task
    count — 625 actor round-trips were the visible overhead on the
    x64 bench corpus (round 4, ~0.5 s at 16 CPUs)."""
    return ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            key=key, text=text, n_perm=n_perm, k_shingle=k_shingle, n_bands=n_bands
        ),
        batch_format="pyarrow",
        concurrency=default_pool_size(),
        batch_size=2048,
    )


def _normalize_pairs_df(out):
    """Driver-side normalization of a verified-pairs frame: stable
    (a, b) order, pinned dtypes, zero-column-empty safe."""
    import pandas as pd

    if out is None or out.empty or "a" not in out.columns:
        return _empty_pairs_df("jaccard")
    out = pd.DataFrame(
        {"a": out["a"].astype("int64"), "b": out["b"].astype("int64"),
         "jaccard": out["jaccard"].astype("float64")}
    )
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def _dedup_candidates_ds(cand_ds, n_cand: int):
    """Unique (a, b) pairs as a DATASET — no driver hop anywhere.
    Tags each pair with a hash bucket and dedups vectorized per bucket:
    a ``groupby(["a", "b"]).aggregate(Count)`` pair-key sort shuffle
    measured 16.3 s on the same 2.45M candidates at 16 CPUs where this
    shape takes 2.2 s — a low-cardinality single-int sort key plus
    Arrow hash ``group_by`` inside the groups is an order of magnitude
    cheaper than sorting on the pair key itself."""
    # bucket count: scale with candidate volume so one bucket's pairs
    # stay well inside a worker's heap (the module's documented
    # partitioning assumption), never below the session's parallelism
    n_buckets = max(default_pool_size() * 4, n_cand // 1_000_000)

    def _tag(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy().astype(np.uint64)
        b = t["b"].to_numpy().astype(np.uint64)
        h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ (
            b * np.uint64(0xC2B2AE3D27D4EB4F)
        )
        return t.append_column(
            "_h", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    def _uniq(t: pa.Table) -> pa.Table:
        return t.group_by(["a", "b"]).aggregate([]).select(["a", "b"])

    return (
        cand_ds.map_batches(_tag, batch_format="pyarrow")
        .groupby("_h")
        .map_groups(_uniq, batch_format="pyarrow")
    )


def _dedup_candidates(cand_ds, n_cand: int):
    """Unique (a, b) pairs as a driver pandas frame. Small sets dedup
    on the driver (a 2.45M-row drop_duplicates cost 5 s of serial
    driver time in the round-3 dedup bench); larger ones collapse via
    :func:`_dedup_candidates_ds` so the driver only ever pulls the
    UNIQUE pairs. Round 4: this is now only the driver FAST LANE —
    past ``CANDIDATE_PAIR_LIMIT`` callers stay on the Dataset form
    end-to-end and never call this."""
    if n_cand <= 500_000:
        return cand_ds.to_pandas().drop_duplicates()
    return _dedup_candidates_ds(cand_ds, n_cand).to_pandas()


def verify_candidate_pairs(ds, key: str, text: str, cand, *, k_shingle: int = 3,
                           threshold: float = 0.8, verify_mode: str = "auto"):
    """Exact-Jaccard verification of candidate pairs with the volume
    dispatch shared by every candidate producer (one-shot LSH AND the
    incremental ``BandIndex``): the zero-exchange broadcast lane under
    ``GATHER_TEXT_LIMIT`` (texts broadcast as object-store blocks,
    scoring distributed over the pair set — round 4; the pre-round-4
    driver scoring loop was a serial Amdahl tail), the fully
    distributed pair-side join above it. ``verify_mode`` pins a path
    ("driver" = the broadcast lane, kept under its historical name /
    "distributed" = the join lane). Returns (a, b, jaccard) with
    jaccard >= threshold, a < b.

    ``cand`` may be a pandas frame or a DATASET (round 4): a Dataset
    under ``CANDIDATE_PAIR_LIMIT`` is pulled into the fast lane; above
    it the pairs stay distributed end-to-end and only the verified
    output lands on the driver."""
    import pandas as pd

    if verify_mode not in ("auto", "driver", "distributed"):
        # a typo ("dist") must not silently fall into the driver-gather
        # branch and bypass the GATHER_TEXT_LIMIT guard (advice r3)
        raise ValueError(
            f"verify_mode must be 'auto', 'driver' or 'distributed', "
            f"got {verify_mode!r}"
        )
    if not isinstance(cand, pd.DataFrame):
        n_cand = cand.count()
        if verify_mode == "distributed" or n_cand > CANDIDATE_PAIR_LIMIT:
            # unique-ify first: a duplicated candidate would be scored
            # twice and emit duplicate verified rows
            uniq = _dedup_candidates_ds(cand, n_cand)
            out = _verify_pairs_distributed_ds(
                ds, key, text, uniq, n_cand,
                k_shingle=k_shingle, threshold=threshold,
            ).to_pandas()
            return _normalize_pairs_df(out)
        cand = cand.to_pandas()
        if cand.empty or "a" not in cand.columns:
            cand = _empty_pairs_df("jaccard")[["a", "b"]]
        else:
            cand = cand[["a", "b"]].astype("int64").drop_duplicates()
    if cand.empty:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []}).astype(
            {"a": "int64", "b": "int64", "jaccard": "float64"}
        )
    needed = sorted(set(cand["a"]) | set(cand["b"]))
    if verify_mode == "distributed" or (
        verify_mode == "auto" and len(needed) > GATHER_TEXT_LIMIT
    ):
        # scale path: distributed pair-side join, no driver text state
        out = _verify_pairs_distributed(
            ds, key, text, cand, k_shingle=k_shingle, threshold=threshold
        )
    else:
        # broadcast-gather lane (round 4): the referenced texts stay
        # in the object store and scoring is DISTRIBUTED over the pair
        # set — the old driver dict + scoring loop was a serial Amdahl
        # tail (~21 s at 156k pairs even with per-doc shingle caching)
        # that forced scaling-sensitive callers onto the join lane.
        # Missing-key semantics are unchanged: both-sides-missing
        # pairs drop (join parity), one-side-missing scores against ""
        # (kept only below any positive threshold).
        import ray.data as rd

        pairs_tbl = pa.table(
            {
                "a": pa.array(cand["a"].to_numpy(dtype=np.int64), pa.int64()),
                "b": pa.array(cand["b"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )
        out = _verify_pairs_broadcast_ds(
            ds, key, text, rd.from_arrow(pairs_tbl), np.asarray(needed, np.int64),
            k_shingle=k_shingle, threshold=threshold,
        ).to_pandas()
        if out.empty or "a" not in out.columns:
            out = _empty_pairs_df("jaccard")
        else:
            out = pd.DataFrame(
                {"a": out["a"].astype("int64"), "b": out["b"].astype("int64"),
                 "jaccard": out["jaccard"].astype("float64")}
            )
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def _verify_pairs_distributed(ds, key: str, text: str, cand, *, k_shingle: int,
                              threshold: float):
    """Pandas-frame wrapper over :func:`_verify_pairs_distributed_ds`
    (kept for the small-input callers and the path-equivalence tests):
    lifts the driver frame into a single-block Dataset, runs the
    distributed exchange, pulls back only the verified output."""
    import pandas as pd
    import ray.data as rd

    cand = cand.sort_values(["a", "b"]).reset_index(drop=True)
    pairs_tbl = pa.table(
        {
            "a": pa.array(cand["a"].to_numpy(dtype=np.int64), pa.int64()),
            "b": pa.array(cand["b"].to_numpy(dtype=np.int64), pa.int64()),
        }
    )
    out = _verify_pairs_distributed_ds(
        ds, key, text, rd.from_arrow(pairs_tbl), len(cand),
        k_shingle=k_shingle, threshold=threshold,
    ).to_pandas()
    if out.empty:
        return _empty_pairs_df("jaccard")
    return pd.DataFrame(
        {"a": out["a"].astype("int64"), "b": out["b"].astype("int64"),
         "jaccard": out["jaccard"].astype("float64")}
    )


def _verify_pairs_distributed_ds(ds, key: str, text: str, cand_ds, n_cand: int,
                                 *, k_shingle: int, threshold: float):
    """Exact-Jaccard verification as a DISTRIBUTED exchange — the
    10^12-scale form of the driver gather. Candidate pairs arrive AND
    leave as a Dataset; no driver-side pair frame, text or key dict at
    any point (round-4 de-drivering, VERDICT r3 #1):

    1. pairs ⋈ docs on a (hash join) attaches text_a to each pair;
    2. the result ⋈ docs on b attaches text_b — two bounded
       all-to-alls total, each O(candidate texts), never O(corpus);
    3. a per-batch vectorized sweep scores exact Jaccard over the two
       co-located texts and drops sub-threshold rows at the source.

    Partition count scales with candidate volume (~50k pairs per
    partition, floor 8) so per-partition text blocks stay worker-heap
    sized at any candidate count (review r2: a hardcoded 8 squeezed
    the whole candidate text set into 8 blocks).

    Semantics identical to the driver path for any threshold > 0
    (missing keys: a one-side-missing pair scores 0 against "" on the
    driver path and is dropped by the inner join here — both below any
    positive threshold; both-sides-missing pairs are dropped by both
    paths); equivalence is asserted in tests by running both paths."""
    import pyarrow.compute as pc

    # ~50k pairs per partition keeps text blocks worker-heap sized,
    # CLAMPED to the session's CPU budget (round 4): n_cand may be an
    # upper-bound ESTIMATE (the fused lane sizes from band rows), and
    # an unclamped 5.1M-row estimate spawned two 102-partition joins —
    # 204 aggregator actors whose spinup alone blew past the previous
    # total. On a real cluster CPUs scale with data, so the per-
    # partition heap target still holds at 4*cpus/n_joins partitions;
    # the pinned reservation keeps the fleets <= half the session
    # either way.
    n_parts = clamp_join_partitions(max(8, n_cand // 50_000), n_joins=2)

    def side(col: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({col: t[key], f"text_{col}": t[text]})

        return fn

    def batch_jaccard(t: pa.Table) -> pa.Table:
        ta = t["text_a"].to_pylist()
        tb = t["text_b"].to_pylist()
        # per-batch shingle memo keyed by text value: a candidate doc
        # appears in many pairs of its partition, and shingling (not
        # the set intersection) dominates. Capped so a pathological
        # all-distinct batch cannot pin unbounded arrays.
        memo: dict[str, np.ndarray] = {}

        def sh(x: str) -> np.ndarray:
            got = memo.get(x)
            if got is None:
                got = shingle_hashes(x, k=k_shingle)
                if len(memo) < 65_536:
                    memo[x] = got
            return got

        j = [
            round(jaccard_hashed(sh(x or ""), sh(y or "")), 6)
            for x, y in zip(ta, tb)
        ]
        out = pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "jaccard": pa.array(j, pa.float64()),
            }
        )
        # threshold applied AT THE SOURCE: only verified pairs ever
        # leave the worker (the pre-round-4 shape shipped every scored
        # candidate back to the driver and filtered there)
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    # NOTE round 4: the scope guard binds only to roots created inside
    # its scope; here BOTH roots (cand_ds and ds) are the caller's, so
    # the cap must be pinned onto the final dataset itself instead
    # (pool.pin_join_cpu_reservation) — unpinned, the two joins'
    # aggregators reserve 0.125 CPU x n_parts x 2 and can livelock a
    # small session.
    docs_a = ds.map_batches(side("a"), batch_format="pyarrow")
    docs_b = ds.map_batches(side("b"), batch_format="pyarrow")
    # two hash joins move each side's text to its pair's partition —
    # two bounded all-to-alls, each O(candidate texts), never
    # O(corpus). The jaccard itself is then a PER-BATCH row sweep:
    # the old per-pair groupby paid Ray group overhead per candidate
    # (measured 17 s for 156k pairs at 16 CPUs; this form is the
    # same exchanges without the 156k tiny pandas groups).
    # the repartition between the two joins is load-bearing: a
    # join-1 partition holding ZERO pairs finalizes to a
    # zero-column empty block, and when such a block is all that
    # reaches one of join-2's aggregators the join raises
    # ArrowInvalid ('no match for key field b') — FLAKY, since it
    # depends on which bundles land where (caught once in ~12 full
    # suite runs). The distributed coalesce folds the empties into
    # schema-bearing blocks (same fix as running/asof map_groups
    # outputs).
    joined = (
        cand_ds.select_columns(["a", "b"])
        .join(docs_a, join_type="inner", num_partitions=n_parts, on=("a",))
        .repartition(max(2, n_parts // 2))
        .join(docs_b, join_type="inner", num_partitions=n_parts, on=("b",))
    )
    # execution stays lazy — the caller decides whether the result
    # ever leaves the object store; the pinned context rides along
    return pin_join_cpu_reservation(
        joined.map_batches(batch_jaccard, batch_format="pyarrow"),
        n_parts,
        n_joins=2,
    )


def _gather_texts(ds, key: str, text: str, needed: list[int]) -> dict[int, str]:
    """Fetch texts for a (small) candidate key set via a semi-join
    filter inside map_batches (broadcast key set, C-speed ``pc.is_in``).

    Guarded by ``GATHER_TEXT_LIMIT``: the gather is driver-side by
    design (candidate set ≪ corpus); past the cap the caller must use a
    bucketed text exchange instead — raising here beats an OOM."""
    import ray
    import pyarrow.compute as pc

    if len(needed) > GATHER_TEXT_LIMIT:
        raise RuntimeError(
            f"_gather_texts: candidate key count {len(needed)} exceeds "
            f"GATHER_TEXT_LIMIT ({GATHER_TEXT_LIMIT}); verify near-dups via "
            f"a bucketed exchange instead of the driver gather"
        )
    from ..broadcast import cached_get

    need_ref = ray.put(pa.array(needed, pa.int64()))

    def pick(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_in(t[key], value_set=cached_get(need_ref)))
        return pa.table({key: sub[key], text: sub[text]})

    rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    return {r[key]: r[text] for r in rows}


def _candidate_keys(cand_ds) -> np.ndarray:
    """Distinct doc keys referenced by a (materialized) candidate-pair
    Dataset — driver INTS only (16 bytes/pair upper bound), never the
    pair rows themselves; callers gate on the pair count before
    pulling. Zero-column empty blocks (groupby map_groups residue) are
    skipped."""
    import ray

    arrs = []
    for ref in cand_ds.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0 or "a" not in t.schema.names:
            continue
        arrs.append(np.concatenate([t["a"].to_numpy(), t["b"].to_numpy()]))
    if not arrs:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(arrs).astype(np.int64))


# Per-worker cache of broadcast candidate-text maps: broadcast-object
# hex id -> (key->text dict, shingle memo). Worker processes are
# long-lived within a session, so the first scoring task per worker
# pays the dict build and every later task reuses it (the cached_get
# discipline, one level up). Bounded: a new broadcast evicts old ones.
_TEXT_MAP_CACHE: dict = {}


def _text_map(refs_obj):
    import ray

    kid = refs_obj.hex()
    got = _TEXT_MAP_CACHE.get(kid)
    if got is None:
        texts: dict = {}
        for r in ray.get(refs_obj):
            t = ray.get(r)
            if t.num_rows:
                texts.update(zip(t["k"].to_pylist(), t["txt"].to_pylist()))
        if len(_TEXT_MAP_CACHE) >= 4:
            _TEXT_MAP_CACHE.clear()
        got = (texts, {})
        _TEXT_MAP_CACHE[kid] = got
    return got


def _verify_pairs_broadcast_ds(ds, key: str, text: str, pairs_ds, needed,
                               *, k_shingle: int, threshold: float):
    """Zero-exchange exact-Jaccard verify — the dispatch winner when
    the candidate set's REFERENCED KEY count fits the gather cap.

    The referenced texts are collected by a broadcast semi-join filter
    (``pc.is_in`` over a ``ray.put`` key set) into object-store blocks
    that never touch the driver; scoring is then an embarrassingly
    parallel map over the pair Dataset, each worker building (and
    caching per process, :func:`_text_map`) a key->text dict from the
    broadcast block refs. No joins, no groupbys: on the x64 bench
    corpus this replaced the two-hash-join exchange's 4.7 s with
    ~3.0 s at 16 CPUs and 7.0 s with ~2.5 s at 4 CPUs (round 4) —
    all-to-all FLOORS, not data volume, dominated the verify leg, so
    removing the exchanges outright beat reshaping them (a groupby-zip
    rewrite of the same exchange measured 5.9 s at 16 CPUs; hash-
    shuffle repartition 8.7 s — both dead ends, aggregator/sample
    machinery).

    Scale guard: every scoring worker holds ALL candidate texts, so
    this lane requires ``len(needed) <= GATHER_TEXT_LIMIT`` (raises
    loud past it); ``_verify_pairs_distributed_ds`` remains the
    unbounded path. Semantics: one-side-missing pairs score against
    ``""`` (driver-gather parity); both-sides-missing pairs are
    dropped (join parity); for any threshold > 0 all paths agree."""
    import ray
    import pyarrow.compute as pc

    from ..broadcast import cached_get

    if len(needed) > GATHER_TEXT_LIMIT:
        raise RuntimeError(
            f"_verify_pairs_broadcast_ds: candidate key count "
            f"{len(needed)} exceeds GATHER_TEXT_LIMIT "
            f"({GATHER_TEXT_LIMIT}); use the distributed pair-side join"
        )

    need_ref = ray.put(pa.array(np.asarray(needed, np.int64), pa.int64()))

    def pick(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_in(t[key], value_set=cached_get(need_ref)))
        return pa.table(
            {
                "k": pc.cast(sub[key], pa.int64()),
                "txt": pc.cast(sub[text], pa.large_string()),
            }
        )

    blocks = (
        ds.map_batches(pick, batch_format="pyarrow").materialize().to_arrow_refs()
    )
    refs_obj = ray.put(list(blocks))

    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.schema.names:
            return empty
        texts, memo = _text_map(refs_obj)

        def sh(kk: int) -> np.ndarray:
            got = memo.get((kk, k_shingle))
            if got is None:
                got = shingle_hashes(texts.get(kk) or "", k=k_shingle)
                if len(memo) < 200_000:
                    memo[(kk, k_shingle)] = got
            return got

        oa, ob, oj = [], [], []
        for x, y in zip(t["a"].to_pylist(), t["b"].to_pylist()):
            if x not in texts and y not in texts:
                continue
            j = round(jaccard_hashed(sh(x), sh(y)), 6)
            if j >= threshold:
                oa.append(x)
                ob.append(y)
                oj.append(j)
        if not oa:
            return empty
        return pa.table(
            {
                "a": pa.array(oa, pa.int64()),
                "b": pa.array(ob, pa.int64()),
                "jaccard": pa.array(oj, pa.float64()),
            }
        )

    return pairs_ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------- clustering (CC)

# above this many verified pairs the driver union-find hands off to
# the distributed groupby-rounds clusterer
CLUSTER_DRIVER_LIMIT = 2_000_000


def cluster_pairs_groupby_rounds(pairs, *, max_rounds: int = 30,
                                 num_partitions: int = 16) -> "pd.DataFrame":  # noqa: F821
    """Driver-frame wrapper over :func:`cluster_pairs_ds`: same
    distributed contraction, result pulled to pandas (one row per node
    appearing in ``pairs`` — the cluster MAP, never the pair set)."""
    import pandas as pd

    out = cluster_pairs_ds(
        pairs, max_rounds=max_rounds, num_partitions=num_partitions
    ).to_pandas()
    if out.empty or "key" not in out.columns:
        return _empty_clusters_df()
    return (
        out[["key", "cluster_id"]]
        .sort_values("key")
        .reset_index(drop=True)
        .astype("int64")
    )


def cluster_pairs_ds(pairs, *, max_rounds: int = 30, num_partitions: int = 16):
    """Distributed connected components over (a, b) pairs:
    min-label contraction with pointer doubling. ``pairs`` may be a
    Dataset (round-4 scale lane: nothing ever lands on the driver) or
    a pandas frame (lifted into a single-block Dataset). Returns a
    Dataset of (key, cluster_id) rows. Every step is a
    scalar groupby-min or a hash join — no per-component set or pandas
    group ever materializes, so a duplicate cluster of ANY size (one
    boilerplate page copied 10^7 times) is safe.

    Per outer round:

    1. ``L(u) = min(u, min neighbor of u)`` over the live edge set
       (symmetrize map + groupby-min);
    2. ``L*`` = pointer-doubled fixpoint of ``L`` — each doubling is
       one left-outer hash join, so a chain of pointer depth d
       resolves in ceil(log2 d) joins (full path compression; a pure
       relabel loop would need O(d) rounds on chains);
    3. the key->rep mapping composes with ``L*`` (left-outer join),
       edges relabel to ``(L*(u), L*(v))``, self-loops drop,
       duplicates collapse (groupby).

    The per-round label/edge state is ``materialize()``d — it is the
    algorithm's working set (O(nodes), spillable), and without it each
    round's ``count()`` would re-execute the whole lineage chain.
    Raises past ``max_rounds`` (guard-don't-hope). Output equals the
    driver union-find exactly: one (key, cluster_id=min key in
    component) row per node appearing in ``pairs``."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    _EMPTY_CLUSTERS = pa.table(
        {"key": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
    )

    if isinstance(pairs, pd.DataFrame):
        if pairs.empty:
            return rd.from_arrow(_EMPTY_CLUSTERS)
        edges_src = rd.from_arrow(
            pa.table(
                {
                    "u": pa.array(pairs["a"].to_numpy(dtype=np.int64), pa.int64()),
                    "v": pa.array(pairs["b"].to_numpy(dtype=np.int64), pa.int64()),
                }
            )
        )
    else:
        # Dataset lane: pairs never touch the driver (round 4)
        edges_src = pairs.select_columns(["a", "b"]).map_batches(
            lambda t: pa.table(
                {
                    "u": t["a"].cast(pa.int64()),
                    "v": t["b"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    def symmetrize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.concat_arrays(
                    [t["u"].combine_chunks(), t["v"].combine_chunks()]
                ),
                "v": pa.concat_arrays(
                    [t["v"].combine_chunks(), t["u"].combine_chunks()]
                ),
            }
        )

    def _safe(out_names, fn=None):
        """Zero-row/zero-column block normalizer for join & aggregate
        consumers: Ray's hash-join finalize can emit an EMPTY block
        with a degenerate schema for an empty partition; referencing a
        column on it raises, and letting it flow into a chained join's
        left side raises ArrowInvalid ('No match ... FieldRef') inside
        acero — the round-4 flake. Empty blocks become
        empty-with-the-declared-schema; real blocks pass to ``fn``."""
        empty = pa.schema(
            [(n, pa.int64()) for n in out_names]
        ).empty_table()

        def g(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return empty
            return fn(t) if fn is not None else t

        return g

    with join_cpu_reservation_guard(num_partitions, n_joins=2):
        edges = edges_src.materialize()
        if edges.count() == 0:
            return rd.from_arrow(_EMPTY_CLUSTERS)
        # mapping key -> rep for every ORIGINAL node; identity to
        # start. Built DISTRIBUTED (groupby over the symmetrized edge
        # endpoints) — the pre-round-4 np.unique over a driver pandas
        # frame was the last place the pair set landed on the driver.
        m = (
            edges.map_batches(symmetrize, batch_format="pyarrow")
            .groupby("u")
            .aggregate(Count(alias_name="_c"))
            .map_batches(
                _safe(
                    ("key", "rep"),
                    lambda t: pa.table({"key": t["u"], "rep": t["u"]}),
                ),
                batch_format="pyarrow",
            )
            # coalesce: aggregate outputs can include zero-column empty
            # blocks that poison a later hash join's build side (the
            # running/asof map_groups hazard)
            .repartition(max(2, num_partitions // 2))
            .materialize()
        )

        for _ in range(max_rounds):
            if edges.count() == 0:
                return m.map_batches(
                    lambda t: pa.table(
                        {"key": t["key"], "cluster_id": t["rep"]}
                    ),
                    batch_format="pyarrow",
                )

            # 1. L(u) = min(u, min neighbor)
            lab = (
                edges.map_batches(symmetrize, batch_format="pyarrow")
                .groupby("u")
                .aggregate(Min("v", alias_name="lab"))
                .map_batches(
                    _safe(
                        ("key", "lab"),
                        lambda t: pa.table(
                            {
                                "key": t["u"],
                                "lab": pc.min_element_wise(
                                    t["lab"], t["u"].combine_chunks()
                                ),
                            }
                        ),
                    ),
                    batch_format="pyarrow",
                )
                # coalesce zero-column empties before they can
                # reach a join side (the repo-wide ArrowInvalid hazard)
                .repartition(max(2, num_partitions // 2))
                .materialize()
            )

            # 2. pointer doubling to the fixpoint L*
            for _i in range(40):
                step = lab.map_batches(
                    lambda t: pa.table({"k2": t["key"], "lab2": t["lab"]}),
                    batch_format="pyarrow",
                )
                # pin the join CPU cap ON the dataset: in the
                # Dataset lane the roots are the CALLER's (built
                # outside any guard scope), so the scope guard never
                # binds — unpinned, 16-partition joins reserved the
                # whole 4-CPU test session and livelocked (round 4)
                doubled = pin_join_cpu_reservation(
                    lab.join(
                        step,
                        join_type="left_outer",
                        num_partitions=num_partitions,
                        on=("lab",),
                        right_on=("k2",),
                    )
                    .map_batches(
                        _safe(
                            ("key", "lab", "_chg"),
                            lambda t: pa.table(
                                {
                                    "key": t["key"],
                                    "lab": pc.coalesce(t["lab2"], t["lab"]),
                                    "_chg": pc.cast(
                                        pc.and_(
                                            pc.is_valid(t["lab2"]),
                                            pc.not_equal(t["lab2"], t["lab"]),
                                        ),
                                        pa.int64(),
                                    ),
                                }
                            ),
                        ),
                        batch_format="pyarrow",
                    )
                    # coalesce: this table is the next doubling's JOIN
                    # left side — fold join-finalize empties first
                    .repartition(max(2, num_partitions // 2)),
                    num_partitions,
                ).materialize()
                changed = doubled.sum("_chg") or 0
                # lazy projection over the already-materialized blocks —
                # a second materialize would copy the O(nodes) label
                # table again just to drop one int64 column
                lab = doubled.select_columns(["key", "lab"])
                if changed == 0:
                    break
            else:  # pragma: no cover — 2^40 pointer depth is unreachable
                raise RuntimeError("cluster_pairs_ds: pointer "
                                   "doubling did not converge")

            # 3a. compose mapping: rep' = L*(rep) where defined
            lstar_m = lab.map_batches(
                lambda t: pa.table({"k2": t["key"], "lab2": t["lab"]}),
                batch_format="pyarrow",
            )
            m = pin_join_cpu_reservation(
                m.join(
                    lstar_m,
                    join_type="left_outer",
                    num_partitions=num_partitions,
                    on=("rep",),
                    right_on=("k2",),
                )
                .map_batches(
                    _safe(
                        ("key", "rep"),
                        lambda t: pa.table(
                            {
                                "key": t["key"],
                                "rep": pc.coalesce(t["lab2"], t["rep"]),
                            }
                        ),
                    ),
                    batch_format="pyarrow",
                )
                # m is the next round's join left side — coalesce
                .repartition(max(2, num_partitions // 2)),
                num_partitions,
            ).materialize()

            # 3b. relabel edges, drop self-loops, collapse duplicates
            lu = lab.map_batches(
                lambda t: pa.table({"u": t["key"], "lu": t["lab"]}),
                batch_format="pyarrow",
            )
            lv = lab.map_batches(
                lambda t: pa.table({"v": t["key"], "lv": t["lab"]}),
                batch_format="pyarrow",
            )
            def relabel(t: pa.Table) -> pa.Table:
                lo = pc.min_element_wise(
                    t["lu"].combine_chunks(), t["lv"].combine_chunks()
                )
                hi = pc.max_element_wise(
                    t["lu"].combine_chunks(), t["lv"].combine_chunks()
                )
                return pa.table({"u": lo, "v": hi}).filter(pc.not_equal(lo, hi))

            edges = (
                pin_join_cpu_reservation(
                    edges.join(lu, join_type="inner",
                               num_partitions=num_partitions, on=("u",))
                    # normalize join-finalize empties BEFORE they hit
                    # the chained join's left side (the observed
                    # ArrowInvalid: an empty degenerate-schema block
                    # has no 'v' for acero to key on). A map, not a
                    # repartition — an AllToAll inside this pinned
                    # two-join plan deadlocked a 4-CPU session.
                    .map_batches(_safe(("u", "v", "lu")),
                                 batch_format="pyarrow")
                    .join(lv, join_type="inner",
                          num_partitions=num_partitions, on=("v",))
                    .map_batches(_safe(("u", "v"), relabel),
                                 batch_format="pyarrow")
                    .groupby(["u", "v"])
                    .aggregate(Count(alias_name="_c"))
                    .select_columns(["u", "v"]),
                    num_partitions,
                    n_joins=2,
                )
                .materialize()
                # next round joins FROM edges — coalesce empties, but
                # in a plan of its OWN: adding this AllToAll to the
                # two-join plan above starved a 4-CPU session into a
                # deadlock ("cluster does not have any available CPUs")
                .repartition(max(2, num_partitions // 2))
                .materialize()
            )

    raise RuntimeError(
        f"cluster_pairs_ds: not converged after {max_rounds} "
        f"rounds — raise max_rounds (components contract toward their min "
        f"key every round, so this indicates an adversarial graph)"
    )


def _empty_clusters_df() -> "pd.DataFrame":  # noqa: F821
    import pandas as pd

    return pd.DataFrame(
        {"key": pd.Series(dtype="int64"), "cluster_id": pd.Series(dtype="int64")}
    )


def neardup_clusters_from_pairs(pairs, *, mode: str = "auto") -> "pd.DataFrame":  # noqa: F821
    """Connected components over verified near-dup pairs -> (key,
    cluster_id=min key in component).

    ``mode='driver'``: union-find on the driver — the verified pair
    set is orders of magnitude smaller than the corpus (ray_guide
    dedup note: union-find on the driver only when the candidate set
    is provably small — here it is the POST-verification set).
    ``mode='groupby_rounds'``: the distributed contraction
    (:func:`cluster_pairs_groupby_rounds`). ``mode='auto'`` dispatches
    on ``CLUSTER_DRIVER_LIMIT`` (equivalence of the two paths is
    tested). ``pairs`` may be a Dataset (round 4): auto-mode counts it
    without pulling it, and the driver lane pulls it only when the
    count is under the limit."""
    import pandas as pd

    is_ds = not isinstance(pairs, pd.DataFrame)
    n_pairs = pairs.count() if is_ds else len(pairs)
    if mode == "auto":
        mode = "driver" if n_pairs <= CLUSTER_DRIVER_LIMIT else "groupby_rounds"
    if mode == "groupby_rounds":
        return cluster_pairs_groupby_rounds(pairs)
    if mode != "driver":
        raise ValueError(f"unknown mode {mode!r}")
    if is_ds:
        pairs = pairs.to_pandas()  # small by the dispatch above
        if pairs.empty or "a" not in pairs.columns:
            return _empty_clusters_df()

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            # min root wins -> deterministic representative
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for a, b in sorted(zip(pairs["a"], pairs["b"])):
        union(int(a), int(b))
    rows = sorted((k, find(k)) for k in parent)
    return pd.DataFrame(rows, columns=["key", "cluster_id"]).astype("int64")


def neardup_dedup(ds, key: str, text: str, **lsh_kwargs):
    """Near-dup removal: keep each cluster's min-key representative.
    Returns (clusters_df, dataset filtered of non-representatives)."""
    import ray

    import pyarrow.compute as pc

    pairs = minhash_lsh_pairs(ds, key, text, **lsh_kwargs)
    clusters = neardup_clusters_from_pairs(pairs)
    losers = [
        int(k) for k, c in zip(clusters["key"], clusters["cluster_id"]) if k != c
    ]
    from ..broadcast import cached_get

    losers_ref = ray.put(pa.array(losers, pa.int64()))

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t[key], value_set=cached_get(losers_ref))))

    return clusters, ds.map_batches(keep, batch_format="pyarrow")


# ------------------------------------------------------------- simhash

def simhash_dups(ds, key: str, text: str):
    """Exact-SimHash duplicate groups: returns Dataset (simhash,
    n_docs, min_key) for hashes shared by >1 doc."""
    from ray.data.aggregate import Count, Min

    def add_sh(t: pa.Table) -> pa.Table:
        sh = pa.array([simhash(x) for x in _text_col(t, text)], pa.int64())
        return pa.table({key: t[key], "simhash": sh})

    import pyarrow.compute as pc

    agg = (
        ds.map_batches(add_sh, batch_format="pyarrow")
        .groupby("simhash")
        .aggregate(Count(alias_name="n_docs"), Min(key, alias_name="min_key"))
    )
    return agg.map_batches(
        lambda t: t.filter(pc.greater(t["n_docs"], 1)), batch_format="pyarrow"
    )


def popcount64(v: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR; numpy<2 has no bitwise_count)."""
    v = v.astype(np.uint64, copy=True)
    v -= (v >> np.uint64(1)) & np.uint64(0x5555555555555555)
    v = (v & np.uint64(0x3333333333333333)) + (
        (v >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((v * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def simhash_neardup_pairs(
    ds,
    key: str,
    text: str,
    *,
    max_hamming: int = 3,
    max_bucket: int = 2048,
):
    """Hamming<=k SimHash near-dup pairs via the PIGEONHOLE band trick
    (VERDICT r2 next-round #6): split the 64-bit hash into ``k+1``
    bit-bands — two hashes within hamming distance k must agree EXACTLY
    on at least one band (k flipped bits cannot touch all k+1 bands) —
    so candidate generation is k+1 exact-match groupbys and the method
    is EXACT, not probabilistic (unlike MinHash-LSH), up to the
    mega-bucket star degradation.

    Shuffle moves only (key, band_id, band_val, simhash) projections
    (~28 bytes/row x k+1); verification is a vectorized in-bucket
    popcount — document text NEVER moves. Returns a pandas DataFrame
    (a, b, hamming) with a < b, deduped across bands; candidate volume
    is guarded by ``CANDIDATE_PAIR_LIMIT`` before the driver pull."""
    import pandas as pd
    import pyarrow.compute as pc

    n_bands = max_hamming + 1
    # band bit-offsets: split 64 bits as evenly as possible
    widths = [64 // n_bands + (1 if i < 64 % n_bands else 0) for i in range(n_bands)]
    offsets = np.cumsum([0] + widths[:-1])
    masks = [(1 << w) - 1 for w in widths]

    def band_rows(t: pa.Table) -> pa.Table:
        sh = np.array(
            [simhash(x) for x in _text_col(t, text)], dtype=np.uint64
        )
        keys = t[key].to_numpy(zero_copy_only=False)
        parts = []
        for b in range(n_bands):
            bv = (sh >> np.uint64(offsets[b])) & np.uint64(masks[b])
            parts.append(
                pa.table(
                    {
                        key: pa.array(keys, pa.int64()),
                        "band_id": pa.array(np.full(len(sh), b, np.int32)),
                        "band_val": pa.array(bv.astype(np.int64)),
                        "simhash": pa.array(sh.astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        df = (
            group.select([key, "simhash"])
            .to_pandas()
            .drop_duplicates(subset=[key])
            .sort_values(key)
        )
        ks = df[key].to_numpy(dtype=np.int64)
        sh = df["simhash"].to_numpy().astype(np.uint64)
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
        if len(ks) < 2:
            return empty
        out_a, out_b, out_h = [], [], []
        if len(ks) > max_bucket:
            # mega-bucket: star vs the min key (connectivity preserved,
            # O(n) — the shared discipline with make_bucket_pairs_fn)
            h = popcount64(sh[1:] ^ sh[0])
            keep = h <= max_hamming
            out_a.append(np.full(int(keep.sum()), ks[0]))
            out_b.append(ks[1:][keep])
            out_h.append(h[keep])
        else:
            for i in range(len(ks) - 1):
                h = popcount64(sh[i + 1 :] ^ sh[i])
                keep = h <= max_hamming
                if keep.any():
                    out_a.append(np.full(int(keep.sum()), ks[i]))
                    out_b.append(ks[i + 1 :][keep])
                    out_h.append(h[keep])
        if not out_a:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a), pa.int64()),
                "b": pa.array(np.concatenate(out_b), pa.int64()),
                "hamming": pa.array(np.concatenate(out_h), pa.int64()),
            }
        )

    cand_ds = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band_id", "band_val"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .materialize()
    )
    n_cand = cand_ds.count()
    if n_cand > CANDIDATE_PAIR_LIMIT:
        raise RuntimeError(
            f"simhash_neardup_pairs: candidate pair count {n_cand} exceeds "
            f"CANDIDATE_PAIR_LIMIT ({CANDIDATE_PAIR_LIMIT}); shrink "
            f"max_bucket or dedup pairs via a distributed groupby"
        )
    cand = cand_ds.to_pandas().drop_duplicates(subset=["a", "b"])
    return cand.sort_values(["a", "b"]).reset_index(drop=True)


# ------------------------------------------- n-gram jaccard brute force

def ngram_jaccard_pairs(ds, key: str, text: str, *, threshold: float = 0.8,
                        k_shingle: int = 3, n_buckets: int = 8, max_bucket: int = 2048,
                        metric: str = "jaccard"):
    """All-pairs exact set similarity within key-hash buckets — the
    brute-force baseline (only pairs whose keys hash to the same bucket
    are compared; with n_buckets=1 it is a true all-pairs pass for
    small corpora).

    ``metric='jaccard'`` scores |A∩B| / |A∪B|; ``metric='containment'``
    scores |A∩B| / min(|A|, |B|) — the asymmetric wrapper-dedup rule
    (doc B = doc A + boilerplate shell has containment ~1 while its
    jaccard shrinks with the shell), i.e. Broder's containment
    coefficient. Same inverted-index kernel either way; only the
    keep rule and the score column name change."""
    import pandas as pd

    if metric not in ("jaccard", "containment"):
        raise ValueError(f"metric {metric!r} (jaccard/containment)")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pa.array([int(k) % n_buckets for k in t[key].to_pylist()], pa.int32())
        return pa.table({key: t[key], text: t[text], "_bucket": b})

    def pairs(group: pa.Table) -> pa.Table:
        """Vectorized inverted-index all-pairs Jaccard within a bucket.

        Semantics = SQL shared-shingle join: pairs with zero shared
        shingles have jaccard 0 and can never pass threshold > 0, so
        only co-occurring docs are compared. Candidate pair counting is
        a numpy unique over encoded (a, b) keys — no per-pair Python.
        """
        ks_all = np.asarray(group[key].to_pylist(), dtype=np.int64)
        order0 = np.argsort(ks_all, kind="stable")[:max_bucket]  # deterministic cap
        ks = ks_all[order0]
        ts_all = _text_col(group, text)
        ts = [ts_all[i] for i in order0]
        n = len(ks)
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                metric: pa.array([], pa.float64()),
            }
        )
        if n < 2:
            return empty
        sets = [shingle_hashes(t, k=k_shingle) for t in ts]
        sizes = np.array([s.size for s in sets], dtype=np.int64)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), sizes)
        sh = np.concatenate([s for s in sets if s.size]) if sizes.sum() else np.array([], dtype=np.uint64)
        if sh.size == 0:
            return empty
        order = np.argsort(sh, kind="stable")
        sh, doc_idx = sh[order], doc_idx[order]
        # group boundaries per distinct shingle
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        ends = np.r_[starts[1:], sh.size]
        pair_keys = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            docs = np.sort(doc_idx[s:e])
            ii, jj = np.triu_indices(docs.size, k=1)
            pair_keys.append(docs[ii] * n + docs[jj])
        if not pair_keys:
            return empty
        enc, counts = np.unique(np.concatenate(pair_keys), return_counts=True)
        ai, bi = enc // n, enc % n
        if metric == "containment":
            denom = np.minimum(sizes[ai], sizes[bi])
        else:
            denom = sizes[ai] + sizes[bi] - counts
        score = counts / np.maximum(denom, 1)
        keep = score >= threshold
        a_keys, b_keys = ks[ai[keep]], ks[bi[keep]]
        swap = a_keys > b_keys
        a_keys[swap], b_keys[swap] = b_keys[swap], a_keys[swap].copy()
        return pa.table(
            {
                "a": pa.array(a_keys, pa.int64()),
                "b": pa.array(b_keys, pa.int64()),
                metric: pa.array(np.round(score[keep], 6), pa.float64()),
            }
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs, batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty:  # empty input -> column-less frame from to_pandas
        return _empty_pairs_df(metric)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def ngram_containment_pairs(ds, key: str, text: str, *,
                            threshold: float = 0.9, **kw):
    """Asymmetric wrapper-dedup: pairs whose smaller shingle set is
    ``threshold``-contained in the other (|A∩B| / min(|A|,|B|)). The
    case jaccard misses: page B = page A + a boilerplate shell."""
    return ngram_jaccard_pairs(
        ds, key, text, threshold=threshold, metric="containment", **kw
    )


# --------------------------------------------------- embedding near-dup

def embedding_neardup_pairs(ds, key: str, emb: str, *, threshold: float = 0.95,
                            n_planes: int = 8, seed: int = 42, max_bucket: int = 4096):
    """Cosine near-dup pairs via random-hyperplane LSH sign buckets +
    in-bucket vectorized matmul verification.

    Deterministic: hyperplanes from a seeded RNG. A near-dup pair is
    reported only if it shares a sign-bucket — recall < 1 by design
    (the scale path); brute force over all pairs is
    ``ngram_jaccard``'s embedding analogue with n_buckets=1.
    """
    import pandas as pd

    rng = np.random.RandomState(seed)
    planes_by_dim: dict[int, np.ndarray] = {}

    def add_bucket(t: pa.Table) -> pa.Table:
        mat = np.stack(t[emb].to_pandas().to_numpy()).astype(np.float64)
        dim = mat.shape[1]
        if dim not in planes_by_dim:
            local_rng = np.random.RandomState(seed)
            planes_by_dim[dim] = local_rng.randn(dim, n_planes)
        signs = (mat @ planes_by_dim[dim]) > 0
        bucket = signs @ (1 << np.arange(n_planes))
        return pa.table(
            {
                key: t[key],
                emb: t[emb],
                "_bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if n < 2:
            return empty
        ks = np.asarray(group[key].to_pylist(), dtype=np.int64)
        order = np.argsort(ks)
        ks = ks[order]
        mat = np.stack(group[emb].to_pandas().to_numpy()).astype(np.float64)[order]
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        if n > max_bucket:
            # oversized bucket: star vs the min-key row (O(n), keeps
            # cluster connectivity; see minhash bucket_pairs note)
            cos0 = unit[1:] @ unit[0]
            mask0 = cos0 >= threshold
            return pa.table(
                {
                    "a": pa.array(np.full(mask0.sum(), ks[0]), pa.int64()),
                    "b": pa.array(ks[1:][mask0], pa.int64()),
                    "cosine": pa.array(np.round(cos0[mask0], 6), pa.float64()),
                }
            )
        cos = unit @ unit.T
        ii, jj = np.triu_indices(n, k=1)
        mask = cos[ii, jj] >= threshold
        return pa.table(
            {
                "a": pa.array(ks[ii[mask]], pa.int64()),
                "b": pa.array(ks[jj[mask]], pa.int64()),
                "cosine": pa.array(np.round(cos[ii, jj][mask], 6), pa.float64()),
            }
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs, batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty:
        return _empty_pairs_df("cosine")
    out = out.drop_duplicates(subset=["a", "b"])
    return out.sort_values(["a", "b"]).reset_index(drop=True)
