"""TFRecord / tf.Example pages reader (+ fixture encoder) — stdlib
only; the ML-ecosystem delivery container beside the crawl formats
(Parquet/JSONL/CSV/ORC/WARC/Avro/Arrow-IPC).

Format per the public TFRecord framing and protobuf wire specs:
- framing: ``[length u64le][masked crc32c(length) u32le][payload]
  [masked crc32c(payload) u32le]`` per record; crc32c is the
  Castagnoli CRC (poly 0x1EDC6F41 reflected = 0x82F63B78), and the
  mask is ``rotr15(crc) + 0xa282ead8`` — both VALIDATED per record
  (a mismatch is corruption → ValueError, the skip/abort contract).
- payload: a ``tf.train.Example`` protobuf parsed with a minimal
  wire-format reader (varints, length-delimited fields, the
  Features map entries, Feature's bytes_list/int64_list/float_list
  oneof; packed and unpacked repeated scalars both accepted). No
  protobuf library — the wire format is small and public.

Pages mapping (the fixture encoder's layout, loudly enforced on
read): features ``url`` (bytes), ``warc_ts`` (int64 epoch-µs, −1 =
null), ``html`` (bytes), ``lang`` (bytes). Unknown feature names are
ignored (forward-compatible, the proto norm); a missing required
feature raises.

Shape: the WARC/Avro pattern — one decode task per file (TFRecord
has no sync markers, so files ARE the split unit), normalized to the
canonical pages schema. Record decode is a Python loop: inline
varints are not columnar-vectorizable — the nature of the format
(same note as the Avro reader).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_CRC_POLY = np.uint32(0x82F63B78)


def _crc32c_tables() -> np.ndarray:
    """Slice-by-8 tables: T[0] is the classic byte table; T[k][b] =
    the CRC update of byte b seen k positions earlier in an 8-byte
    chunk. CRC is a linear map over GF(2), so the eight per-byte
    contributions XOR together — one python step per 8 bytes."""
    t0 = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t0 = np.where(t0 & 1, (t0 >> np.uint32(1)) ^ _CRC_POLY,
                      t0 >> np.uint32(1))
    tables = [t0]
    for _ in range(7):
        prev = tables[-1]
        tables.append(t0[prev & np.uint32(0xFF)]
                      ^ (prev >> np.uint32(8)))
    return np.stack(tables)


_T = [t.tolist() for t in _crc32c_tables()]  # python ints: the
# slice-by-8 loop is ~8x faster on list tables than numpy scalar
# indexing (measured 4.2 s -> 0.5 s per 4 MB)


def crc32c(data: bytes) -> int:
    """Castagnoli CRC-32, slice-by-8 (the framing checksum)."""
    crc = 0xFFFFFFFF
    n8 = len(data) // 8
    t0, t1, t2, t3, t4, t5, t6, t7 = _T
    pos = 0
    for _ in range(n8):
        x0 = crc ^ data[pos] ^ (data[pos + 1] << 8) \
            ^ (data[pos + 2] << 16) ^ (data[pos + 3] << 24)
        crc = (t7[x0 & 0xFF] ^ t6[(x0 >> 8) & 0xFF]
               ^ t5[(x0 >> 16) & 0xFF] ^ t4[(x0 >> 24) & 0xFF]
               ^ t3[data[pos + 4]] ^ t2[data[pos + 5]]
               ^ t1[data[pos + 6]] ^ t0[data[pos + 7]])
        pos += 8
    for b in data[pos:]:
        crc = t0[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------- proto

def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("tfrecord: truncated varint")
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            # Protobuf wire format is 64-bit: a 10-byte varint carries
            # bits above 2^64 that a C decoder would drop — mask so
            # _signed64 sees the same value (ADVICE r4).
            return out & 0xFFFFFFFFFFFFFFFF, pos
        shift += 7
        if shift > 70:
            raise ValueError("tfrecord: varint too long")


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message body.
    value: int for varint(0)/fixed(1,5), bytes for len-delim(2)."""
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = _read_varint(buf, pos)
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("tfrecord: truncated field")
            v = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            if pos + 4 > len(buf):
                raise ValueError("tfrecord: truncated fixed32")
            v = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        elif wt == 1:
            if pos + 8 > len(buf):
                raise ValueError("tfrecord: truncated fixed64")
            v = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        else:
            raise ValueError(f"tfrecord: unsupported wire type {wt}")
        yield fn, wt, v


def _parse_feature(buf: bytes):
    """Feature oneof -> ('bytes'|'int64'|'float', list)."""
    for fn, wt, v in _fields(buf):
        if fn == 1 and wt == 2:      # BytesList
            vals = [x for f, w, x in _fields(v) if f == 1 and w == 2]
            return "bytes", vals
        if fn == 3 and wt == 2:      # Int64List (packed or repeated)
            out = []
            for f, w, x in _fields(v):
                if f != 1:
                    continue
                if w == 0:
                    out.append(_signed64(x))
                elif w == 2:         # packed
                    p = 0
                    while p < len(x):
                        n, p = _read_varint(x, p)
                        out.append(_signed64(n))
            return "int64", out
        if fn == 2 and wt == 2:      # FloatList
            out = []
            for f, w, x in _fields(v):
                if f != 1:
                    continue
                if w == 5:
                    out.append(struct.unpack("<f", struct.pack(
                        "<I", x))[0])
                elif w == 2:
                    out.extend(np.frombuffer(x, "<f4").tolist())
            return "float", out
    return "bytes", []


def _signed64(u: int) -> int:
    return u - (1 << 64) if u >= 1 << 63 else u


def parse_example(buf: bytes) -> dict:
    """tf.train.Example bytes -> {name: (kind, values)}."""
    feats: dict[str, tuple[str, list]] = {}
    for fn, wt, v in _fields(buf):
        if fn != 1 or wt != 2:
            continue  # unknown top-level field: ignore (proto norm)
        for f2, w2, entry in _fields(v):
            if f2 != 1 or w2 != 2:
                continue
            name = None
            feat = ("bytes", [])
            for f3, w3, v3 in _fields(entry):
                if f3 == 1 and w3 == 2:
                    name = v3.decode("utf-8")
                elif f3 == 2 and w3 == 2:
                    feat = _parse_feature(v3)
            if name is not None:
                feats[name] = feat
    return feats


def iter_tfrecords(data: bytes):
    """Yield validated record payloads; corruption raises ValueError."""
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("tfrecord: truncated header")
        (ln,) = struct.unpack_from("<Q", data, pos)
        (lcrc,) = struct.unpack_from("<I", data, pos + 8)
        hdr = data[pos:pos + 8]
        if _masked(crc32c(hdr)) != lcrc:
            raise ValueError("tfrecord: length crc mismatch")
        if ln > n - pos - 16:
            raise ValueError("tfrecord: record length exceeds file")
        payload = data[pos + 12:pos + 12 + ln]
        (pcrc,) = struct.unpack_from("<I", data, pos + 12 + ln)
        if _masked(crc32c(payload)) != pcrc:
            raise ValueError("tfrecord: payload crc mismatch")
        yield payload
        pos += 16 + ln


def parse_tfrecord_pages(data: bytes) -> pa.Table:
    """TFRecord bytes -> raw pages-shaped Arrow table."""
    urls, tss, htmls, langs = [], [], [], []
    for payload in iter_tfrecords(data):
        feats = parse_example(payload)
        for req in ("url", "html"):
            if req not in feats:
                raise ValueError(f"tfrecord: missing feature {req!r}")
            if not feats[req][1]:
                raise ValueError(f"tfrecord: empty feature {req!r}")
        urls.append(feats["url"][1][0].decode("utf-8"))
        htmls.append(feats["html"][1][0])
        ts = feats.get("warc_ts", ("int64", [-1]))[1]
        tss.append(None if not ts or ts[0] < 0 else int(ts[0]))
        lg = feats.get("lang", ("bytes", [b""]))[1]
        langs.append((lg[0] if lg else b"").decode("utf-8"))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.large_binary()),
        "lang": pa.array(langs, pa.string()),
    })


# -------------------------------------------------------------- encoder

def _varint(u: int) -> bytes:
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(fn: int, body: bytes) -> bytes:
    return _varint((fn << 3) | 2) + _varint(len(body)) + body


def _feature_bytes(vals: list[bytes]) -> bytes:
    body = b"".join(_ld(1, v) for v in vals)
    return _ld(1, body)  # bytes_list = field 1


def _feature_int64(vals: list[int]) -> bytes:
    body = b"".join(
        _varint(1 << 3) + _varint(v & ((1 << 64) - 1)) for v in vals)
    return _ld(3, body)  # int64_list = field 3 (unpacked)


def encode_example(feats: dict[str, tuple[str, list]]) -> bytes:
    entries = b""
    for name, (kind, vals) in sorted(feats.items()):
        fbody = (_feature_bytes(vals) if kind == "bytes"
                 else _feature_int64(vals))
        entry = _ld(1, name.encode()) + _ld(2, fbody)
        entries += _ld(1, entry)
    return _ld(1, entries)  # Example.features = field 1


def write_tfrecord(path: str, rows: list[dict]) -> str:
    """Fixture writer: rows of {url, warc_ts (µs int or None), html
    (bytes), lang} -> a framed TFRecord file."""
    with open(path, "wb") as f:
        for r in rows:
            ex = encode_example({
                "url": ("bytes", [r["url"].encode()]),
                "warc_ts": ("int64", [-1 if r.get("warc_ts") is None
                                      else int(r["warc_ts"])]),
                "html": ("bytes", [r["html"]]),
                "lang": ("bytes", [r.get("lang", "").encode()]),
            })
            hdr = struct.pack("<Q", len(ex))
            f.write(hdr + struct.pack("<I", _masked(crc32c(hdr)))
                    + ex + struct.pack("<I", _masked(crc32c(ex))))
    return path


def read_pages_tfrecord(paths, **kwargs):
    """TFRecord pages Dataset: one parse task per file (the
    WARC/Avro pattern — no sync markers, so files are the split
    unit), normalized to the canonical pruned pages schema."""
    import ray.data as rd

    from .readers import _normalize_pages

    ds = rd.read_binary_files(list(paths), **kwargs)

    def parse(t: pa.Table) -> pa.Table:
        from .readers import _PAGES_ARROW_SCHEMA

        tables = [_normalize_pages(parse_tfrecord_pages(b.as_py()))
                  for b in t["bytes"]]
        return (pa.concat_tables(tables) if tables
                else _PAGES_ARROW_SCHEMA.empty_table())

    return ds.map_batches(parse, batch_format="pyarrow")
