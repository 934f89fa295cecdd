"""TFRecord / tf.Example reader: crc32c known answers, framing and
protobuf round trips, hostile-input contracts, and
extraction-fingerprint parity with the Parquet twin (the Avro/ORC
reader test model)."""

from __future__ import annotations

import struct

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ocracle_ray.sources.pages import pages_table
from ocracle_ray.sources.tfrecord import (crc32c, encode_example,
                                          iter_tfrecords,
                                          parse_example,
                                          parse_tfrecord_pages,
                                          write_tfrecord)


def _page_rows(n=25):
    t = pages_table(0, n)
    return [
        {
            "url": t["url"][i].as_py(),
            "warc_ts": int(t["warc_ts"][i].value),
            "html": t["html"][i].as_py(),
            "lang": t["lang"][i].as_py(),
        }
        for i in range(n)
    ]


def test_crc32c_known_answers():
    # public Castagnoli vectors (RFC 3720 appendix / kernel tests)
    assert crc32c(b"") == 0
    assert crc32c(b"a") == 0xC1D04330
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA
    assert crc32c(bytes([0xFF] * 32)) == 0x62A8AB43
    # slice-by-8 == bytewise on an awkward length
    assert crc32c(b"hello world!!!" * 3 + b"tail") == crc32c(
        bytes(b"hello world!!!" * 3 + b"tail"))


def test_roundtrip_pages(tmp_path):
    rows = _page_rows(25)
    rows[3]["warc_ts"] = None  # null timestamp survives as -1
    p = str(tmp_path / "p.tfrecord")
    write_tfrecord(p, rows)
    with open(p, "rb") as f:
        t = parse_tfrecord_pages(f.read())
    assert t.num_rows == 25
    assert t["url"].to_pylist() == [r["url"] for r in rows]
    assert t["html"].to_pylist() == [r["html"] for r in rows]
    got_ts = t["warc_ts"].combine_chunks().cast("int64").to_pylist()
    want = [r["warc_ts"] for r in rows]
    assert got_ts == want


def test_example_wire_roundtrip():
    feats = {
        "url": ("bytes", [b"http://x.test/1"]),
        "warc_ts": ("int64", [123456789, -1]),
        "html": ("bytes", [b"<p>\x00\xffbinary</p>"]),
    }
    got = parse_example(encode_example(feats))
    assert got["url"] == ("bytes", [b"http://x.test/1"])
    assert got["warc_ts"] == ("int64", [123456789, -1])
    assert got["html"][1][0] == b"<p>\x00\xffbinary</p>"


def test_hostile_inputs(tmp_path):
    rows = _page_rows(4)
    p = str(tmp_path / "p.tfrecord")
    write_tfrecord(p, rows)
    data = open(p, "rb").read()
    # flipped payload byte -> payload crc mismatch
    b = bytearray(data)
    b[30] ^= 0x10
    with pytest.raises(ValueError):
        list(iter_tfrecords(bytes(b)))
    # flipped length byte -> length crc mismatch or bounds error
    b = bytearray(data)
    b[0] ^= 0x01
    with pytest.raises(ValueError):
        list(iter_tfrecords(bytes(b)))
    # truncation mid-record
    with pytest.raises(ValueError):
        list(iter_tfrecords(data[: len(data) // 2 + 3]))
    # absurd declared length
    hdr = struct.pack("<Q", 1 << 60)
    with pytest.raises(ValueError):
        list(iter_tfrecords(hdr + data[8:]))
    # missing required feature
    ex = encode_example({"url": ("bytes", [b"u"])})
    from ocracle_ray.sources.tfrecord import _masked
    framed = (struct.pack("<Q", len(ex))
              + struct.pack("<I", _masked(crc32c(struct.pack(
                  "<Q", len(ex)))))
              + ex + struct.pack("<I", _masked(crc32c(ex))))
    with pytest.raises(ValueError):
        parse_tfrecord_pages(framed)


def _frame(ex: bytes) -> bytes:
    from ocracle_ray.sources.tfrecord import _masked

    hdr = struct.pack("<Q", len(ex))
    return (hdr + struct.pack("<I", _masked(crc32c(hdr)))
            + ex + struct.pack("<I", _masked(crc32c(ex))))


def test_empty_required_feature_is_valueerror():
    """ADVICE r4: a crc-valid record whose required feature carries an
    EMPTY bytes_list must hit the corruption contract (ValueError), not
    IndexError."""
    ex = encode_example({"url": ("bytes", []), "html": ("bytes", [b"<p>"])})
    with pytest.raises(ValueError, match="empty feature"):
        parse_tfrecord_pages(_frame(ex))
    ex = encode_example({"url": ("bytes", [b"u"]), "html": ("bytes", [])})
    with pytest.raises(ValueError, match="empty feature"):
        parse_tfrecord_pages(_frame(ex))


def test_varint_masks_to_64_bits():
    """ADVICE r4: protobuf varints are 64-bit on the wire; a 10-byte
    varint carrying bits >= 2^64 must decode to the masked value a C
    decoder would produce (not a Python big int that breaks _signed64)."""
    from ocracle_ray.sources.tfrecord import _read_varint, _signed64

    def enc(u: int) -> bytes:
        out = bytearray()
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    # canonical encodings round-trip unchanged
    for v in (0, 1, 127, 128, (1 << 63) - 1, (1 << 64) - 1):
        got, pos = _read_varint(enc(v), 0)
        assert got == v and pos == len(enc(v))
    # over-long encoding of 2^64 + 5 -> masked to 5
    got, _ = _read_varint(enc((1 << 64) + 5), 0)
    assert got == 5
    # -1 zigzag-free two's-complement (all 10 bytes set) -> signed -1
    got, _ = _read_varint(enc((1 << 64) - 1), 0)
    assert _signed64(got) == -1
    # masked value stays in uint64 range so _signed64 never overflows
    got, _ = _read_varint(enc((1 << 70) - 1), 0)
    assert 0 <= got < (1 << 64)


def test_tfrecord_extraction_matches_parquet(ray_session, tmp_path):
    from ocracle_ray.pipelines.extraction import extract_records
    from ocracle_ray.sources.readers import read_pages_any

    pq_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages_table(0, 25), pq_path)
    tf_path = str(tmp_path / "pages.tfrecord")
    write_tfrecord(tf_path, _page_rows(25))

    def fps(ds):
        df = extract_records(ds, concurrency=2).to_pandas()
        return (df[["url", "text_fingerprint"]]
                .sort_values("url").reset_index(drop=True))

    want = fps(read_pages_any(pq_path))
    got = fps(read_pages_any(tf_path))
    pd.testing.assert_frame_equal(want, got)
