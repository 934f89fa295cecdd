"""Subject-code utilities: normalize, parse, wildcard, alias resolve.

Deterministic re-expressions of the reference's subject-code handling:

- ``normalize_subject_code``  strip+upper (``object_handling.py:10-12``, M4)
- ``parse_subject_codes``     split on ``,;\\n|/`` and whitespace,
  normalize, dedup preserving order (``task_processing.py:201-224``, M5)
- ``wildcard_match``          pattern with ``X`` jokers vs catalog
  (``old/checkmatch.py:1-16``, M22)
- ``build_alias_map`` / ``resolve_subject_code``  canonical-code lookup
  over known codes + alternates (``object_handling.py:32-51``, J1) —
  built once on the driver, broadcast into UDF closures
- ``lookup_subject``          exact + prefix matching (M23; the
  reference used difflib ≥0.6 — fragile, replaced by exact-then-prefix
  as documented in SURVEY.md M23)
"""

from __future__ import annotations

import re

_SPLIT_RE = re.compile(r"[,;\n|/\s]+")


def normalize_subject_code(code: str) -> str:
    """strip + upper (object_handling.py:10-12)."""
    return str(code).strip().upper()


def parse_subject_codes(raw: str) -> list[str]:
    """Split a free-text code list; normalize; dedup preserving order
    (task_processing.py:201-224)."""
    out: list[str] = []
    seen: set[str] = set()
    for piece in _SPLIT_RE.split(str(raw)):
        code = normalize_subject_code(piece)
        if code and code not in seen:
            seen.add(code)
            out.append(code)
    return out


def wildcard_match(pattern: str, code: str) -> bool:
    """'X' jokers match any single character; otherwise exact
    (old/checkmatch.py:1-16). Both sides normalized."""
    p = normalize_subject_code(pattern)
    c = normalize_subject_code(code)
    if len(p) != len(c):
        return False
    return all(pc == "X" or pc == cc for pc, cc in zip(p, c))


def build_alias_map(catalog: dict[str, list[str]]) -> dict[str, str]:
    """canonical -> [alternates] catalog to a flat alias->canonical map
    (object_handling.py:32-51). Canonical entries map to themselves;
    first-writer wins on conflicting alternates (dict order = input
    order, deterministic)."""
    alias: dict[str, str] = {}
    for canonical, alternates in catalog.items():
        canon = normalize_subject_code(canonical)
        alias.setdefault(canon, canon)
        for alt in alternates:
            alias.setdefault(normalize_subject_code(alt), canon)
    return alias


def resolve_subject_code(code: str, alias_map: dict[str, str]) -> str:
    """Resolve through the alias map; unknown codes pass through
    normalized (object_handling.py:44-51)."""
    norm = normalize_subject_code(code)
    return alias_map.get(norm, norm)


def lookup_subject(query: str, catalog: list[str], *, fuzzy: bool = False) -> str | None:
    """Exact match, else unique-prefix match, else None (deterministic
    stand-in for old/checkempty.py:12-44's difflib lookup).

    ``fuzzy=True`` restores the reference's behavior verbatim —
    ``difflib.get_close_matches(q, catalog, n=1, cutoff=0.6)`` — as a
    last resort after exact/prefix miss. difflib is stdlib and
    deterministic (stable tie-break by catalog order), so parity costs
    nothing; it stays opt-in because SURVEY.md M23 documents the
    0.6-ratio rule as fragile for short codes (e.g. one edit away from
    a different real course code)."""
    q = normalize_subject_code(query)
    norm = [normalize_subject_code(c) for c in catalog]
    if q in norm:
        return q
    prefixed = [c for c in norm if c.startswith(q)] if q else []
    if len(prefixed) == 1:
        return prefixed[0]
    if fuzzy and q:
        import difflib

        close = difflib.get_close_matches(q, norm, n=1, cutoff=0.6)
        if close:
            return close[0]
    return None
