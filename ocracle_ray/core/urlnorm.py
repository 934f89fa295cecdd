"""URL canonicalization — the normalization step in front of any
url-keyed dedup of a web crawl (the flagship dedups by exact url;
a crawl's raw urls hide duplicates behind case, default ports,
fragments, tracking params and parameter order).

Pure stdlib (``urllib.parse``), Ray-free, deterministic, idempotent
(``canonical_url(canonical_url(u)) == canonical_url(u)`` — property-
tested). The rules, each standard and conservative:

- scheme and host lowercased; a trailing dot on the host dropped;
- default ports stripped (``:80`` http, ``:443`` https);
- the fragment dropped (never reaches the server);
- tracking parameters dropped (``utm_*``, ``gclid``, ``fbclid``,
  ``msclkid``, ``ref``, ``ref_src``, ``mc_cid``, ``mc_eid``);
- remaining query parameters SORTED by (key, value) — order is
  almost never significant and unordered dup-hiding is rampant;
  blank values are kept (``?a`` and ``?a=`` both normalize to
  ``a=``);
- an empty path on an authority-bearing url becomes ``/``; a
  trailing slash on a non-root path is dropped (one rule for the
  ``/contact`` vs ``/contact/`` split — pick EITHER consistently and
  dups merge; dropping matches the shorter canonical form);
- userinfo, path percent-encoding and the path's internal structure
  are left untouched (rewriting them risks changing what the server
  resolves).

Non-http(s) or unparseable inputs are returned unchanged — the
canonicalizer must never lose rows, only merge them.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

_TRACKING = {"gclid", "fbclid", "msclkid", "ref", "ref_src", "mc_cid",
             "mc_eid"}
_DEFAULT_PORT = {"http": "80", "https": "443"}


def canonical_url(url: str) -> str:
    try:
        return _canonical_url(url)
    except ValueError:
        # urlsplit parses LAZILY: .port/.hostname raise on garbage
        # (hypothesis-found) — unparseable means pass through
        return url


def _canonical_url(url: str) -> str:
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return url
    host = (parts.hostname or "").lower().rstrip(".")
    if not host:
        return url
    netloc = host
    if parts.username is not None:
        cred = parts.username + (
            f":{parts.password}" if parts.password is not None else ""
        )
        netloc = f"{cred}@{host}"
    if parts.port is not None and str(parts.port) != _DEFAULT_PORT[scheme]:
        netloc = f"{netloc}:{parts.port}"

    pairs = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not (k in _TRACKING or k.startswith("utm_"))
    ]
    query = urlencode(sorted(pairs))

    path = parts.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"
    return urlunsplit((scheme, netloc, path, query, ""))


def canonicalize_urls(urls) -> "pa.Array":
    """Vectorized-enough batch form: one C-backed list comprehension
    per batch (url parsing is inherently per-string, like fingerprints
    and minhash; the loop is per-ROW, never per-char in Python)."""
    import pyarrow as pa

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    return pa.array(
        [canonical_url(u) if u is not None else None for u in urls.to_pylist()],
        pa.string(),
    )
