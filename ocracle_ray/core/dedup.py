"""Deduplication primitives: shingles, MinHash, SimHash, Jaccard.

The reference's only near-dup operator is per-document template matching
(``/root/reference/scripts/extract_images.py:266-274``, G13); corpus-level
dedup is the scale addendum (SURVEY.md §2 addendum). All hashes are
derived from blake2b-64 (``textstats.hash64``) and splitmix64 perms —
deterministic across processes (never Python's salted ``hash``). Vectorized with numpy where it matters; the
Ray stages fan these out per batch and shuffle only the tiny
(band_id, band_hash, key) projections.
"""

from __future__ import annotations

import numpy as np

from .textstats import fnv1a64, hash64, normalize_for_fingerprint

_MASK64 = (1 << 64) - 1


def word_shingles(text: str, k: int = 3) -> list[str]:
    """k-word shingles over the normalized text; short docs yield the
    whole text as one shingle."""
    words = normalize_for_fingerprint(text).split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 FNV-1a hash per distinct shingle (sorted, deduped)."""
    hs = {hash64(s.encode("utf-8")) for s in word_shingles(text, k)}
    return np.fromiter(sorted(hs), dtype=np.uint64, count=len(hs))


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a cheap vectorizable universal-ish hash."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_MASK64)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(_MASK64)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(_MASK64)
    return x ^ (x >> np.uint64(31))


# Fixed per-permutation seeds (deterministic, derived once from FNV of
# the permutation index).
def _perm_seeds(n_perm: int) -> np.ndarray:
    return np.array(
        [fnv1a64(f"ocracle-minhash-{i}".encode()) for i in range(n_perm)],
        dtype=np.uint64,
    )


_SEED_CACHE: dict[int, np.ndarray] = {}


def minhash_signature(text: str, n_perm: int = 128, k: int = 3) -> np.ndarray:
    """MinHash signature (uint64[n_perm]) via seeded splitmix64 perms,
    fully vectorized: outer xor of shingle hashes with per-perm seeds."""
    # NOT setdefault(n_perm, _perm_seeds(n_perm)): setdefault evaluates
    # its default eagerly, so that form re-derives all 128 seeds (pure-
    # Python FNV each) on EVERY signature — measured 62% of the banding
    # stage's per-doc cost before round 3 caught it
    seeds = _SEED_CACHE.get(n_perm)
    if seeds is None:
        seeds = _SEED_CACHE.setdefault(n_perm, _perm_seeds(n_perm))
    hs = shingle_hashes(text, k)
    if hs.size == 0:
        return np.full(n_perm, _MASK64, dtype=np.uint64)
    # (n_shingles, n_perm) mix then column-min
    mixed = _splitmix64(hs[:, None] ^ seeds[None, :])
    return mixed.min(axis=0)


def lsh_band_hashes(sig: np.ndarray, n_bands: int = 16) -> list[tuple[int, int]]:
    """Split a signature into bands; returns (band_id, band_hash) pairs.
    Docs sharing any pair are LSH candidates (shuffle key downstream)."""
    rows = sig.size // n_bands
    out: list[tuple[int, int]] = []
    for b in range(n_bands):
        band = sig[b * rows : (b + 1) * rows]
        h = hash64(band.tobytes())
        out.append((b, h & 0x7FFFFFFFFFFFFFFF))
    return out


def jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact word-shingle Jaccard similarity (candidate verification)."""
    sa, sb = set(word_shingles(a, k)), set(word_shingles(b, k))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def jaccard_hashed(sa: np.ndarray, sb: np.ndarray) -> float:
    """Jaccard over pre-hashed shingle arrays (``shingle_hashes``
    output: sorted unique uint64). Equals ``jaccard`` up to 64-bit
    shingle-hash collisions (probability ~n²/2⁶⁴ per pair — nil at any
    real shingle count). Exists so verification can shingle each
    DISTINCT document once and score its pairs from the cached array:
    a candidate doc participates in many pairs, and re-shingling per
    pair (normalize + split + join + blake2b per shingle, ~1 ms/doc)
    was the dominant verification cost (round-3 dedup profile)."""
    if sa.size == 0 and sb.size == 0:
        return 1.0
    if sa.size == 0 or sb.size == 0:
        return 0.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    return inter / (sa.size + sb.size - inter)


def minhash_jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def simhash(text: str, n_bits: int = 64) -> int:
    """64-bit SimHash over word tokens (unit weights): sum of ±1 per bit
    of each token hash, sign -> bit. Deterministic; hamming distance on
    the result approximates cosine token similarity."""
    words = normalize_for_fingerprint(text).split()
    if not words:
        return 0
    hs = np.fromiter(
        (hash64(w.encode("utf-8")) for w in words), dtype=np.uint64, count=len(words)
    )
    bits = ((hs[:, None] >> np.arange(n_bits, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int32
    )
    sums = (2 * bits - 1).sum(axis=0)
    out = 0
    for i in range(n_bits):
        if sums[i] > 0:
            out |= 1 << i
    return out & 0x7FFFFFFFFFFFFFFF  # keep int64-friendly


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
