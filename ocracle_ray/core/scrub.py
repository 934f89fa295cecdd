"""PII / contact-info scrubbing — the redaction pass every
Common-Crawl-style training-data pipeline runs before releasing text
(emails, phone numbers, IPv4 addresses -> fixed placeholder tokens).

Pure and Ray-free (the core/ contract): a pattern table + one
vectorized entry point (``scrub_pii``) the stage wraps with
``map_batches``. Patterns are RE2-safe (no lookarounds/backrefs in the
MATCH side) so pyarrow's ``replace_substring_regex`` executes them as
C kernels, Python's ``re`` reproduces them verbatim for the test
reference, and a DuckDB ``regexp_replace`` mirror stays possible.

Scope notes (precision choices, each deliberate and documented):

- EMAIL: RFC-ish ``local@domain.tld``.
- IPV4: four 1-3 digit octets with non-digit/dot boundaries; octet
  VALUES are not range-checked (999.1.1.1 redacts — cheap and safe).
- PHONE: optional ``+``/``(`` head, then 2-5 separator-joined digit
  groups — i.e. a SEPARATOR IS REQUIRED, so plain integer runs
  (ids, math, years) never redact. Date-shaped strings
  (``12.03.2024``) DO match — the same recall-over-precision
  trade-off the public CC PII pipelines make; callers who can't
  accept it should drop the 'phone' row from ``PII_PATTERNS``.

Counts are exact even for adjacent matches: each kind's count is the
placeholder-insertion delta of its own redaction pass, not a separate
regex count (a boundary-guarded scan undercounts matches whose guard
chars touch). Redaction order is EMAIL -> IPV4 -> PHONE: emails
contain digit runs, and IPv4 must not chew dotted digits first.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# ordered: (kind, pattern, RE2 rewrite). Boundary groups are restored
# by the rewrite's backreferences.
PII_PATTERNS: tuple[tuple[str, str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"(^|[^0-9.])([0-9]{1,3}\.){3}[0-9]{1,3}($|[^0-9.])",
        r"\1<IP>\3",
        "<IP>",
    ),
    (
        "phone",
        r"(^|[^0-9])\+?\(?[0-9]{1,4}([ ()./\-]{1,2}[0-9]{2,4}){2,5}($|[^0-9])",
        r"\1<PHONE>\3",
        "<PHONE>",
    ),
)
_BOUNDED = {"ipv4", "phone"}  # guard chars consumed: run the pass twice


def scrub_pii(texts) -> tuple[pa.Array, dict[str, pa.Array]]:
    """``(redacted, {n_email, n_ipv4, n_phone})`` — redacted text plus
    exact per-row insertion counts (int64), all Arrow kernels.

    Boundary-guarded kinds run their kernel twice: the first pass
    consumes the shared guard char between two adjacent matches, the
    second catches the survivor; a third pass cannot match (every pass
    strictly removes digit runs)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    out = texts
    counts: dict[str, pa.Array] = {}
    for kind, pattern, rewrite, placeholder in PII_PATTERNS:
        before = pc.count_substring(out, placeholder)
        out = pc.replace_substring_regex(out, pattern, rewrite)
        if kind in _BOUNDED:
            out = pc.replace_substring_regex(out, pattern, rewrite)
        after = pc.count_substring(out, placeholder)
        counts[f"n_{kind}"] = pc.cast(
            pc.subtract(after, before), pa.int64()
        )
    return out, counts
