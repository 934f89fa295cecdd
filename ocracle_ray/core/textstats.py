"""Text-analysis primitives: lang-id, quality, token counts, fingerprints.

Large-scale training-data-pipeline operators (SURVEY.md addendum). All
pure and deterministic; the Ray stages vectorize them per batch.

Quality-score components deliberately reuse the reference's text-shape
heuristics: ``line_ratio = len/(newlines+1)`` and squeezed average word
length (``/root/reference/scripts/extract_images.py:297-311``,
``scripts/avglen.py:1-4``).
"""

from __future__ import annotations

import hashlib
import re

# BPE-ish pre-tokenizer: ASCII word runs | single non-word-non-space
# chars. Deliberately ASCII classes (like _PUNCT_RE below) so the SQL
# oracle (RE2, ASCII \w) mirrors it exactly; a non-ASCII letter counts
# as its own token on BOTH sides.
_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]")
# ASCII punctuation ranges !-/ :-@ [-` {-~ — deliberately ASCII-only so
# the SQL oracle (RE2, whose \w is ASCII) can mirror it exactly;
# non-ASCII letters (æøå, umlauts, CJK) count as punctuation on NEITHER
# side (review finding: the previous unicode [^\w\s] diverged from the
# oracle on non-ASCII text)
_PUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")

# Tiny stopword profiles for deterministic n-gram/stopword lang-id.
# Covers the langs present in the fixtures (documents.parquet: en de es
# fr zh; pages: nb nn en).
_STOPWORDS: tuple[tuple[str, frozenset[str]], ...] = (
    ("en", frozenset("the and of to a in is it you that for on with as".split())),
    ("de", frozenset("der die das und ist nicht ein eine zu den von mit für".split())),
    ("es", frozenset("el la los las y es de que en un una por con para".split())),
    ("fr", frozenset("le la les et est de que un une pour dans sur avec".split())),
    ("nb", frozenset("og i det er en til av på som med ikke for den".split())),
    ("nn", frozenset("og i det er ein til av på som med ikkje for eit".split())),
)


def round_half_away(x, decimals: int):
    """DuckDB-parity rounding: round() in DuckDB is half-AWAY-from-zero
    while numpy/pandas round half-even — 0.00625 must become 0.0063 on
    both sides of every oracle. Vectorized, sign-aware."""
    import numpy as np

    f = 10.0 ** decimals
    a = np.asarray(x, np.float64)
    return np.sign(a) * np.floor(np.abs(a) * f + 0.5) / f


def whitespace_token_count(text: str) -> int:
    """Whitespace tokenization count (matches DuckDB oracle:
    ``len(list_filter(regexp_split_to_array(text,'\\s+'), x -> x != ''))``)."""
    return len(text.split())


def bpe_ish_token_count(text: str) -> int:
    """Word/punct pre-tokenizer count — the BPE-ish upper bound."""
    return len(_TOKEN_RE.findall(text))


def punct_ratio(text: str) -> float:
    if not text:
        return 0.0
    return len(_PUNCT_RE.findall(text)) / len(text)


def stopword_ratio(text: str, lang: str = "en") -> float:
    words = text.lower().split()
    if not words:
        return 0.0
    table = dict(_STOPWORDS).get(lang, dict(_STOPWORDS)["en"])
    return sum(1 for w in words if w in table) / len(words)


def quality_score(text: str) -> float:
    """Deterministic [0,1] quality score from length, punctuation and
    word-shape signals. SQL-expressible (see __ray_entry__ oracle):

        0.25*(len between 50 and 10000)
      + 0.25*(mean word len between 3 and 12)
      + 0.25*(punct ratio < 0.2)
      + 0.25*(token count >= 10)
    """
    n = len(text)
    words = text.split()
    n_words = len(words)
    mean_wl = (sum(len(w) for w in words) / n_words) if n_words else 0.0
    score = 0.0
    if 50 <= n <= 10000:
        score += 0.25
    if 3.0 <= mean_wl <= 12.0:
        score += 0.25
    if punct_ratio(text) < 0.2:
        score += 0.25
    if n_words >= 10:
        score += 0.25
    return score


def quality_scores_vec(texts) -> "np.ndarray":
    """Vectorized ``quality_score`` over an Arrow string array — RE2
    ``count_substring_regex`` kernels, the exact ASCII classes the
    DuckDB oracle runs (the hot-path form q_docs_quality and the
    filter funnel share)."""
    import numpy as np
    import pyarrow.compute as pc

    n = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float64)
    n_words = (
        pc.count_substring_regex(texts, r"[^ \t\n\r\f]+")
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    n_ws = (
        pc.count_substring_regex(texts, r"[ \t\n\r\f]")
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    n_punct = (
        pc.count_substring_regex(texts, r"[!-/:-@\[-`{-~]")
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_wl = np.where(n_words > 0, (n - n_ws) / np.maximum(n_words, 1), 0.0)
        pr = np.where(n > 0, n_punct / np.maximum(n, 1), 0.0)
    return (
        0.25 * ((n >= 50) & (n <= 10000))
        + 0.25 * ((n_words > 0) & (mean_wl >= 3.0) & (mean_wl <= 12.0))
        + 0.25 * ((n == 0) | (pr < 0.2))
        + 0.25 * (n_words >= 10)
    )


# ASCII whitespace tokenizer for lang-id — deliberately ASCII (like
# _TOKEN_RE/_PUNCT_RE above) so the DuckDB oracle's RE2 '\s+' mirrors
# it exactly; NBSP/U+3000-joined words count as one token on BOTH
# sides (review finding r2: Python str.split() splits on Unicode
# whitespace and diverged from the SQL on &nbsp;-bearing text).
# No \v: RE2's '\s' is [\t\n\f\r ] and vertical tab is not in it
# (review finding r3).
_WS_ASCII_RE = re.compile(r"[ \t\n\r\f]+")


def detect_lang(text: str) -> str:
    """Stopword/charclass lang-id. CJK-ratio shortcut for zh; otherwise
    argmax stopword hits with fixed table-order tiebreak; no hits -> 'und'."""
    if not text:
        return "und"
    sample = text[:2000]
    cjk = sum(1 for c in sample if "一" <= c <= "鿿")
    if 10 * cjk >= len(sample):
        return "zh"
    words = [w for w in _WS_ASCII_RE.split(sample.lower()) if w]
    if not words:
        return "und"
    best_lang, best_hits = "und", 0
    for lang, table in _STOPWORDS:
        hits = sum(1 for w in words if w in table)
        if hits > best_hits:
            best_hits = hits
            best_lang = lang
    return best_lang


_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def fnv1a64(data: bytes) -> int:
    """64-bit FNV-1a — deterministic across processes (Python's ``hash``
    is salted and MUST NOT be used for content keys). Pure-Python byte
    loop: use only for SHORT keys (seeds, ids); content-sized inputs go
    through ``hash64`` (C-speed blake2b, measured 3.5x faster per doc)."""
    h = _FNV_OFFSET
    for byte in data:
        h ^= byte
        h = (h * _FNV_PRIME) & _MASK64
    return h


def hash64(data: bytes) -> int:
    """Deterministic 64-bit content hash (blake2b/8 — C speed, uniform
    across the full range). The standard hash for fingerprints,
    shingles, simhash tokens and sketches."""
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def normalize_for_fingerprint(text: str) -> str:
    """lower + whitespace collapse — matches the SQL oracle
    ``regexp_replace(lower(text), '\\s+', ' ', 'g')`` exactly."""
    return re.sub(r"\s+", " ", text.lower()).strip()


def fingerprint(text: str) -> int:
    """Document fingerprint: hash64 over the normalized text, as a
    non-negative int64 (top bit cleared for Arrow/SQL friendliness)."""
    return hash64(normalize_for_fingerprint(text).encode("utf-8")) & 0x7FFFFFFFFFFFFFFF


_ROLL_BASE = 1_000_003
_ROLL_MASK = (1 << 61) - 1


def winnowing_gram_hashes(text: str, k: int = 8) -> tuple[str, list[int]]:
    """``(kind, hashes)`` — the raw Rabin-Karp gram-hash sequence the
    winnowing selection runs over, exposed so the oracle artifact and
    ``winnowing_fingerprints`` provably share one sequence:

    - ``('gram', [h0, h1, ...])`` — one rolling hash per k-char gram of
      the normalized text (all values < 2**61, int64-safe);
    - ``('fallback', [fingerprint(text)])`` — normalized text shorter
      than ``k`` (whole-doc fingerprint, non-negative int64);
    - ``('empty', [])`` — normalizes to the empty string.
    """
    s = normalize_for_fingerprint(text)
    if len(s) < k:
        return ("fallback", [fingerprint(text)]) if s else ("empty", [])
    pow_k = pow(_ROLL_BASE, k - 1, _ROLL_MASK + 1)
    h = 0
    hashes = []
    for i, ch in enumerate(s):
        h = (h * _ROLL_BASE + ord(ch)) & _ROLL_MASK
        if i >= k - 1:
            hashes.append(h)
            h = (h - ord(s[i - k + 1]) * pow_k) & _ROLL_MASK
    return ("gram", hashes)


def winnowing_fingerprints(text: str, k: int = 8, w: int = 16) -> list[int]:
    """Rolling-hash document fingerprints via winnowing (the classic
    MOSS scheme): Rabin-Karp rolling hashes of every k-char gram of the
    normalized text, then the minimum hash of each w-gram window, deduped
    in order. Deterministic; two documents sharing substrings of length
    >= k + w - 1 are guaranteed to share a fingerprint — the local
    (partial-overlap) complement to the whole-document ``fingerprint``.
    """
    kind, hashes = winnowing_gram_hashes(text, k)
    if kind != "gram":
        return hashes
    # winnow: min per window, rightmost-min rule, dedup consecutive —
    # fully vectorized (sliding_window_view + one argmin pass; the
    # per-window python loop was O(n*w) with 3 numpy calls per char)
    import numpy as np

    arr = np.asarray(hashes, dtype=np.uint64)
    if arr.size <= w:
        return [int(arr.min())]
    sw = np.lib.stride_tricks.sliding_window_view(arr, w)
    # rightmost minimum (standard winnowing tie rule)
    rev_off = (w - 1) - np.argmin(sw[:, ::-1], axis=1)
    abs_idx = np.arange(sw.shape[0]) + rev_off
    keep = np.r_[True, abs_idx[1:] != abs_idx[:-1]]
    return [int(v) for v in arr[abs_idx[keep]]]
