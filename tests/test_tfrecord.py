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
