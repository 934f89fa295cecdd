"""Apache Avro Object Container File reader (+ fixture encoder) —
stdlib only; pyarrow/Ray ship no Avro reader, so this closes the last
common crawl-delivery format after Parquet/JSONL/CSV/ORC/WARC.

Format per the public Avro 1.11 spec:
- magic ``Obj\\x01``; file-metadata map<string,bytes> (zigzag-varint
  block counts, 0-terminated) carrying ``avro.schema`` (JSON) and
  ``avro.codec`` (``null`` | ``deflate`` = raw RFC-1951);
  a 16-byte sync marker.
- data blocks: long record-count, long byte-size, codec-compressed
  record bytes, sync marker (validated — a mismatch is corruption).
- primitives: int/long zigzag varints; string/bytes length-prefixed;
  double 8-byte LE IEEE; boolean 1 byte; null empty; union = branch
  index (long) then the branch's encoding; record = fields in schema
  order. ``timestamp-micros`` logical longs map to timestamp[us].

Shape: the WARC pattern — one decode task per FILE (blocks are the
format's split unit; a custom datasource could split at sync markers,
documented trade-off), normalized to the canonical pages schema.
Record decode is a Python loop: Avro's inline varints make columnar
vectorization impossible without a compiled decoder — the nature of
the format, not of this engine (same note as the JSONL/CSV readers).

Supported type subset (loudly enforced): null, boolean, int, long
(incl. timestamp-micros), float, double, string, bytes, and 2-branch
``["null", X]`` unions. Anything else raises ValueError at schema
parse, never a misparse.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

import pyarrow as pa

_MAGIC = b"Obj\x01"
_SIMPLE = {"null", "boolean", "int", "long", "float", "double",
           "string", "bytes"}


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n < 0 else (n << 1)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("avro: truncated input")
        self.pos += n
        return b

    def long(self) -> int:
        z, shift = 0, 0
        while True:
            if self.pos >= len(self.buf):
                raise ValueError("avro: truncated varint")
            b = self.buf[self.pos]
            self.pos += 1
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("avro: varint too long")
        return (z >> 1) ^ -(z & 1)

    def lstr(self) -> bytes:
        n = self.long()
        if n < 0:
            raise ValueError("avro: negative length")
        return self.read(n)


def _norm_type(t) -> tuple[str, bool]:
    """-> (base_type, nullable). Loud on anything outside the subset."""
    if isinstance(t, dict):
        lt = t.get("logicalType")
        base = t.get("type")
        if base == "long" and lt == "timestamp-micros":
            return "timestamp-micros", False
        if base in _SIMPLE and lt is None:
            return base, False
        raise ValueError(f"avro: unsupported complex type {t!r}")
    if isinstance(t, list):
        if len(t) == 2 and "null" in t:
            other = t[0] if t[1] == "null" else t[1]
            base, _ = _norm_type(other)
            return base, True
        raise ValueError(f"avro: unsupported union {t!r}")
    if t in _SIMPLE:
        return t, False
    raise ValueError(f"avro: unsupported type {t!r}")


def _decode_value(r: _Reader, base: str):
    if base == "null":
        return None
    if base == "boolean":
        return r.read(1) != b"\x00"
    if base in ("int", "long", "timestamp-micros"):
        return r.long()
    if base == "float":
        return struct.unpack("<f", r.read(4))[0]
    if base == "double":
        return struct.unpack("<d", r.read(8))[0]
    if base == "string":
        return r.lstr().decode("utf-8")
    if base == "bytes":
        return r.lstr()
    raise ValueError(f"avro: unhandled base {base}")


def parse_avro(data: bytes) -> pa.Table:
    """One container file -> Arrow table (schema-ordered columns)."""
    r = _Reader(data)
    if r.read(4) != _MAGIC:
        raise ValueError("avro: bad magic")
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:  # negative block count: abs(count) + byte size
            n = -n
            r.long()
        for _ in range(n):
            k = r.lstr().decode("utf-8")
            meta[k] = r.lstr()
    if "avro.schema" not in meta:
        raise ValueError("avro: missing avro.schema metadata")
    try:
        schema = json.loads(meta["avro.schema"].decode("utf-8"))
        codec = meta.get("avro.codec", b"null").decode("utf-8")
        if codec not in ("null", "deflate"):
            raise ValueError(f"avro: unsupported codec {codec!r}")
        if not isinstance(schema, dict) or schema.get("type") != "record":
            raise ValueError("avro: top-level schema must be a record")
        fields = [(f["name"], *_norm_type(f["type"]))
                  for f in schema["fields"]]
    except (KeyError, TypeError, AttributeError) as exc:
        # hostile-bytes contract: a corrupted schema JSON must surface
        # as ValueError, never a KeyError/TypeError mid-parse
        raise ValueError(f"avro: malformed schema metadata: {exc!r}")
    sync = r.read(16)

    cols: dict[str, list] = {name: [] for name, _, _ in fields}
    while r.pos < len(r.buf):
        n_rec = r.long()
        n_bytes = r.long()
        payload = r.read(n_bytes)
        if codec == "deflate":
            try:
                payload = zlib.decompress(payload, wbits=-15)
            except zlib.error as exc:  # hostile-bytes contract:
                raise ValueError(f"avro: bad deflate block: {exc}")
        br = _Reader(payload)
        for _ in range(n_rec):
            for name, base, nullable in fields:
                if nullable:
                    idx = br.long()
                    if idx == 0:
                        cols[name].append(None)
                        continue
                cols[name].append(_decode_value(br, base))
        if br.pos != len(payload):
            raise ValueError("avro: trailing bytes in block")
        if r.read(16) != sync:
            raise ValueError("avro: sync marker mismatch")

    _ARROW = {"null": pa.null(), "boolean": pa.bool_(),
              "int": pa.int32(), "long": pa.int64(),
              "timestamp-micros": pa.timestamp("us"),
              "float": pa.float32(), "double": pa.float64(),
              "string": pa.string(), "bytes": pa.large_binary()}
    return pa.table({name: pa.array(cols[name], _ARROW[base])
                     for name, base, _ in fields})


def write_avro(path: str, schema: dict, rows: list[dict], *,
               codec: str = "null", block_records: int = 200) -> str:
    """Fixture encoder (tests/bench only): the same subset, blocked,
    deterministic sync marker derived from the schema JSON."""
    import hashlib

    fields = [(f["name"], *_norm_type(f["type"]))
              for f in schema["fields"]]
    sync = hashlib.blake2s(
        json.dumps(schema, sort_keys=True).encode(), digest_size=16
    ).digest()

    def enc_value(base: str, v) -> bytes:
        if base == "null":
            return b""
        if base == "boolean":
            return b"\x01" if v else b"\x00"
        if base in ("int", "long", "timestamp-micros"):
            return _zigzag_encode(int(v))
        if base == "float":
            return struct.pack("<f", v)
        if base == "double":
            return struct.pack("<d", v)
        if base == "string":
            b = v.encode("utf-8")
            return _zigzag_encode(len(b)) + b
        if base == "bytes":
            return _zigzag_encode(len(v)) + bytes(v)
        raise ValueError(base)

    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    out.write(_zigzag_encode(len(meta)))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out.write(_zigzag_encode(len(kb)) + kb)
        out.write(_zigzag_encode(len(v)) + v)
    out.write(_zigzag_encode(0))
    out.write(sync)
    for lo in range(0, len(rows), block_records):
        chunk = rows[lo:lo + block_records]
        body = bytearray()
        for row in chunk:
            for name, base, nullable in fields:
                v = row.get(name)
                if nullable:
                    if v is None:
                        body += _zigzag_encode(0)
                        continue
                    body += _zigzag_encode(1)
                body += enc_value(base, v)
        payload = bytes(body)
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        out.write(_zigzag_encode(len(chunk)))
        out.write(_zigzag_encode(len(payload)))
        out.write(payload)
        out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())
    return path


PAGES_AVRO_SCHEMA = {
    "type": "record", "name": "Page",
    "fields": [
        {"name": "url", "type": "string"},
        {"name": "warc_ts", "type": {"type": "long",
                                     "logicalType": "timestamp-micros"}},
        {"name": "html", "type": "bytes"},
        {"name": "lang", "type": "string"},
    ],
}


def read_pages_avro(paths, **kwargs):
    """Avro pages Dataset: one parse task per file (WARC pattern),
    normalized to the canonical pruned pages schema."""
    import ray.data as rd

    from .readers import _normalize_pages

    ds = rd.read_binary_files(list(paths), **kwargs)

    def parse(t: pa.Table) -> pa.Table:
        from .readers import _PAGES_ARROW_SCHEMA

        tables = [_normalize_pages(parse_avro(b.as_py()))
                  for b in t["bytes"]]
        return (pa.concat_tables(tables) if tables
                else _PAGES_ARROW_SCHEMA.empty_table())

    return ds.map_batches(parse, batch_format="pyarrow")
