"""Avro container reader: round-trips (both codecs, multi-block,
nullable unions), hostile-input contracts, and extraction-fingerprint
parity with the Parquet twin."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ocracle_ray.sources.avro import (PAGES_AVRO_SCHEMA, parse_avro,
                                      write_avro)
from ocracle_ray.sources.pages import pages_table


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


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_pages(tmp_path, codec):
    rows = _page_rows(25)
    p = str(tmp_path / f"p_{codec}.avro")
    write_avro(p, PAGES_AVRO_SCHEMA, rows, codec=codec,
               block_records=7)  # forces multiple blocks
    with open(p, "rb") as f:
        t = parse_avro(f.read())
    assert t.num_rows == 25
    assert t["url"].to_pylist() == [r["url"] for r in rows]
    assert t["html"].to_pylist() == [r["html"] for r in rows]
    assert [v.value for v in t["warc_ts"]] == [r["warc_ts"] for r in rows]


def test_nullable_union_and_scalars(tmp_path):
    schema = {
        "type": "record", "name": "T",
        "fields": [
            {"name": "a", "type": ["null", "string"]},
            {"name": "b", "type": "double"},
            {"name": "c", "type": "boolean"},
            {"name": "d", "type": ["null", "long"]},
        ],
    }
    rows = [
        {"a": "x", "b": 1.5, "c": True, "d": None},
        {"a": None, "b": -2.25, "c": False, "d": -7},
    ]
    p = str(tmp_path / "u.avro")
    write_avro(p, schema, rows)
    with open(p, "rb") as f:
        t = parse_avro(f.read())
    assert t["a"].to_pylist() == ["x", None]
    assert t["b"].to_pylist() == [1.5, -2.25]
    assert t["c"].to_pylist() == [True, False]
    assert t["d"].to_pylist() == [None, -7]


def test_hostile_inputs(tmp_path):
    rows = _page_rows(3)
    p = str(tmp_path / "h.avro")
    write_avro(p, PAGES_AVRO_SCHEMA, rows)
    with open(p, "rb") as f:
        data = f.read()
    with pytest.raises(ValueError, match="magic"):
        parse_avro(b"NOPE" + data[4:])
    with pytest.raises(ValueError):
        parse_avro(data[: len(data) // 2])  # truncated
    # flip a byte inside the trailing sync marker
    bad = bytearray(data)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        parse_avro(bytes(bad))
    # unsupported schema types are loud at parse, never a misparse
    with pytest.raises(ValueError, match="unsupported"):
        write_avro(str(tmp_path / "x.avro"),
                   {"type": "record", "name": "X",
                    "fields": [{"name": "m",
                                "type": {"type": "map",
                                         "values": "long"}}]},
                   [])


def test_avro_extraction_matches_parquet(ray_session, tmp_path):
    from ocracle_ray.pipelines.extraction import extract_records
    from ocracle_ray.sources.readers import read_pages_any

    pq_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages_table(0, 25), pq_path)
    av_path = str(tmp_path / "pages.avro")
    write_avro(av_path, PAGES_AVRO_SCHEMA, _page_rows(25),
               codec="deflate")

    def fps(ds):
        df = extract_records(ds, concurrency=2).to_pandas()
        return (df[["url", "text_fingerprint"]]
                .sort_values("url").reset_index(drop=True))

    want = fps(read_pages_any(pq_path))
    got = fps(read_pages_any(av_path))
    pd.testing.assert_frame_equal(want, got)
