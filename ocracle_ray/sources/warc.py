"""WARC reader — the canonical web-crawl delivery format (ISO 28500 /
WARC 1.0-1.1; what Common Crawl ships), parsed with the stdlib so the
extraction engine can ingest real crawl archives directly.

Coverage: plain and member-gzipped ``.warc`` files (each record its
own gzip member, the CC layout — decompressed sequentially via
``zlib.decompressobj(wbits=31)`` and ``unused_data``), ``response``
records (HTTP status+headers stripped, chunked transfer-encoding
decoded) and ``conversion`` records (WET extracts, payload used
as-is). Other record types (warcinfo, request, metadata, revisit) are
skipped by design — they carry no page body.

Scale shape: one task per WARC file (``ray.data.read_binary_files`` →
``map_batches`` parse). Crawl deliveries are many ~1 GB files (Common
Crawl: ~72k files per monthly crawl), so file-per-task parallelism
saturates any cluster; records inside a member-gzipped file cannot be
random-accessed anyway (the format's own property, not this reader's).
Output is normalized to the SAME pages schema as the Parquet/JSONL/CSV
readers (``sources/readers.py``), so every downstream stage is
format-agnostic.

A deterministic fixture encoder (``encode_warc``) keeps tests
self-contained — warcinfo + response records, optional per-record
gzip members, optional chunked bodies.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members -> concatenated plaintext."""
    out = []
    rest = data
    while rest:
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(rest))
        except zlib.error as exc:
            raise ValueError(f"WARC: bad gzip member: {exc}") from exc
        out.append(d.flush())
        if not d.eof:
            raise ValueError("WARC: truncated gzip member")
        rest = d.unused_data
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    """WARC/HTTP header block (after the first line) -> lowercase-key
    dict. Folded continuation lines (obs-fold) are appended."""
    headers: dict[str, str] = {}
    last = None
    for line in block.split(_CRLF):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        if b":" not in line:
            raise ValueError(f"WARC: malformed header line {line[:40]!r}")
        k, v = line.split(b":", 1)
        last = k.strip().lower().decode("latin-1")
        headers[last] = v.strip().decode("latin-1")
    return headers


def _dechunk(body: bytes) -> bytes:
    """HTTP/1.1 chunked transfer-encoding -> raw body."""
    out = []
    pos = 0
    while True:
        eol = body.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("WARC: truncated chunked body")
        size_token = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError as exc:
            raise ValueError(
                f"WARC: bad chunk size {size_token[:16]!r}"
            ) from exc
        pos = eol + 2
        if size == 0:
            break
        if pos + size > len(body):
            raise ValueError("WARC: chunk overruns body")
        out.append(body[pos:pos + size])
        pos += size + 2  # chunk data + CRLF
    return b"".join(out)


def _http_body(payload: bytes) -> bytes:
    """HTTP response record payload -> body bytes (headers stripped,
    chunked decoded)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("WARC: HTTP payload missing header terminator")
    head = payload[:sep]
    body = payload[sep + 4:]
    first, _, rest = head.partition(_CRLF)
    if not first.startswith(b"HTTP/"):
        raise ValueError(f"WARC: not an HTTP response: {first[:20]!r}")
    h = _parse_headers(rest)
    if "chunked" in h.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    return body


def _warc_date_us(value: str) -> int:
    """WARC-Date (ISO 8601, Z or offset) -> microseconds since epoch."""
    try:
        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
    except ValueError as exc:
        raise ValueError(f"WARC: bad WARC-Date {value!r}") from exc
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def iter_warc_records(data: bytes):
    """Yield ``(headers, payload)`` per WARC record. Accepts plain or
    member-gzipped bytes."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        eol = data.find(_CRLF, pos)
        if eol < 0 or not data[pos:eol].startswith(b"WARC/"):
            raise ValueError(
                f"WARC: expected record version line at offset {pos}"
            )
        hdr_end = data.find(b"\r\n\r\n", eol)
        if hdr_end < 0:
            raise ValueError("WARC: truncated record headers")
        headers = _parse_headers(data[eol + 2:hdr_end])
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("WARC: missing/bad Content-Length") from exc
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise ValueError("WARC: record payload overruns file")
        yield headers, data[body_start:body_start + clen]
        pos = body_start + clen


def warc_pages_table(data: bytes) -> pa.Table:
    """One WARC file's bytes -> pages rows ``(url, warc_ts, html,
    lang)``. ``response`` records contribute their HTTP body,
    ``conversion`` records their payload; everything else is skipped
    (no page body by definition)."""
    urls, tss, htmls = [], [], []
    for headers, payload in iter_warc_records(data):
        rtype = headers.get("warc-type", "").lower()
        if rtype == "response":
            body = _http_body(payload)
        elif rtype == "conversion":
            body = payload
        else:
            continue
        url = headers.get("warc-target-uri", "")
        if not url:
            raise ValueError("WARC: response record missing Target-URI")
        urls.append(url)
        tss.append(_warc_date_us(headers.get("warc-date", "")))
        htmls.append(body)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                np.asarray(tss, np.int64), pa.timestamp("us")
            ),
            "html": pa.array(htmls, pa.large_binary()),
            "lang": pa.array([""] * len(urls), pa.string()),
        }
    )


def read_pages_warc(paths, **kwargs):
    """Pages Dataset from WARC file(s): one parse task per file (the
    format's natural parallelism; see module docstring), normalized to
    the canonical pages schema."""
    import ray.data as rd

    from .readers import _normalize_pages

    ds = rd.read_binary_files(paths, **kwargs)

    def parse(t: pa.Table) -> pa.Table:
        tables = [warc_pages_table(b.as_py()) for b in t["bytes"]]
        return pa.concat_tables(tables) if tables else warc_pages_table(b"")

    return ds.map_batches(parse, batch_format="pyarrow").map_batches(
        _normalize_pages, batch_format="pyarrow"
    )


# ------------------------------------------------------------ fixture


def encode_warc(records, *, gzip_members: bool = True,
                chunked: bool = False) -> bytes:
    """Deterministic fixture WARC: a warcinfo record then one
    ``response`` record per ``(url, iso_date, body_bytes)``. With
    ``chunked`` the HTTP bodies use chunked transfer-encoding (8-byte
    chunks) to exercise the dechunker."""
    from ..core.textstats import fnv1a64

    def record(rtype: str, headers: list[tuple[str, str]],
               payload: bytes) -> bytes:
        rid = fnv1a64(f"{rtype}:{headers}:{len(payload)}".encode())
        lines = [b"WARC/1.0"]
        lines.append(f"WARC-Type: {rtype}".encode())
        for k, v in headers:
            lines.append(f"{k}: {v}".encode())
        lines.append(
            f"WARC-Record-ID: <urn:uuid:{rid:032x}>".encode()
        )
        lines.append(f"Content-Length: {len(payload)}".encode())
        raw = _CRLF.join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"
        if gzip_members:
            c = zlib.compressobj(6, zlib.DEFLATED, 31)
            return c.compress(raw) + c.flush()
        return raw

    out = [
        record(
            "warcinfo",
            [("WARC-Date", "2024-01-01T00:00:00Z"),
             ("Content-Type", "application/warc-fields")],
            b"software: ocracle-ray-fixture\r\n",
        )
    ]
    for url, iso_date, body in records:
        if chunked:
            chunks = []
            for i in range(0, len(body), 8):
                part = body[i:i + 8]
                chunks.append(f"{len(part):x}".encode() + _CRLF + part
                              + _CRLF)
            chunks.append(b"0" + _CRLF + _CRLF)
            http_body = b"".join(chunks)
            te = b"Transfer-Encoding: chunked\r\n"
        else:
            http_body = body
            te = b"Content-Length: %d\r\n" % len(body)
        payload = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n" + te + b"\r\n"
            + http_body
        )
        out.append(
            record(
                "response",
                [("WARC-Target-URI", url), ("WARC-Date", iso_date),
                 ("Content-Type", "application/http; msgtype=response")],
                payload,
            )
        )
    return b"".join(out)
