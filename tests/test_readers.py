"""Format-agnostic pages readers: JSONL and CSV inputs produce
byte-identical extraction output to the canonical Parquet path."""

import json
import os

import pandas as pd
import pyarrow.parquet as pq

from ocracle_ray.pipelines.extraction import extract_records
from ocracle_ray.sources.pages import pages_table
from ocracle_ray.sources.readers import read_pages_any


def _rows(n=25):
    t = pages_table(0, n)
    return [
        {
            "url": t["url"][i].as_py(),
            "warc_ts": t["warc_ts"][i].as_py().isoformat(),
            "html": t["html"][i].as_py().decode("utf-8"),
            "lang": t["lang"][i].as_py(),
        }
        for i in range(n)
    ]


def _fps(ds) -> pd.DataFrame:
    df = extract_records(ds, concurrency=2).to_pandas()
    return df[["url", "text_fingerprint"]].sort_values("url").reset_index(drop=True)


def test_jsonl_and_csv_match_parquet(tmp_path):
    rows = _rows()
    pq_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages_table(0, 25), pq_path)

    jl_path = str(tmp_path / "pages.jsonl")
    with open(jl_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")

    csv_path = str(tmp_path / "pages.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)

    want = _fps(read_pages_any(pq_path))
    got_jl = _fps(read_pages_any(jl_path))
    got_csv = _fps(read_pages_any(csv_path))
    pd.testing.assert_frame_equal(want, got_jl)
    pd.testing.assert_frame_equal(want, got_csv)


def test_reader_schema_identical_across_formats(tmp_path):
    rows = _rows(6)
    jl = str(tmp_path / "p.jsonl")
    with open(jl, "w") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    pqp = str(tmp_path / "p.parquet")
    pq.write_table(pages_table(0, 6), pqp)

    sa = read_pages_any(pqp).schema()
    sb = read_pages_any(jl).schema()
    assert sa.names == sb.names
    assert [str(t) for t in sa.types] == [str(t) for t in sb.types]
    assert os.path.exists(jl)


def test_mixed_formats_rejected_and_gz_sniffed(tmp_path):
    import gzip
    import json as _json

    import pytest

    from ocracle_ray.sources.readers import _format_of

    assert _format_of("a/pages.jsonl.gz") == "json"
    assert _format_of("a/pages.csv.zst") == "csv"
    assert _format_of("a/pages.parquet") == "parquet"
    with pytest.raises(ValueError, match="mixed input formats"):
        read_pages_any(["a.csv", "b.jsonl"])

    # gz-compressed jsonl reads identically to plain
    rows = _rows(6)
    jl_gz = str(tmp_path / "p.jsonl.gz")
    with gzip.open(jl_gz, "wt") as f:
        for r in rows:
            f.write(_json.dumps(r, ensure_ascii=False) + "\n")
    pq_path = str(tmp_path / "p.parquet")
    pq.write_table(pages_table(0, 6), pq_path)
    pd.testing.assert_frame_equal(
        _fps(read_pages_any(pq_path)), _fps(read_pages_any(jl_gz))
    )


def _warc_records(n=25):
    t = pages_table(0, n)
    return [
        (
            t["url"][i].as_py(),
            t["warc_ts"][i].as_py().isoformat() + "Z",
            t["html"][i].as_py(),
        )
        for i in range(n)
    ]


def test_warc_matches_parquet(tmp_path):
    """WARC input (gzip members AND plain, chunked AND plain HTTP
    bodies) produces byte-identical extraction output to Parquet."""
    from ocracle_ray.sources.warc import encode_warc

    pq_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages_table(0, 25), pq_path)
    want = _fps(read_pages_any(pq_path))

    recs = _warc_records(25)
    for name, kw in (
        ("a.warc.gz", dict(gzip_members=True)),
        ("b.warc", dict(gzip_members=False)),
        ("c.warc.gz", dict(gzip_members=True, chunked=True)),
    ):
        p = str(tmp_path / name)
        with open(p, "wb") as f:
            f.write(encode_warc(recs, **kw))
        got = _fps(read_pages_any(p))
        pd.testing.assert_frame_equal(want, got, check_dtype=False)


def test_warc_record_parsing_details():
    """Non-page record types are skipped; conversion records pass
    their payload through; timestamps parse to us."""
    from ocracle_ray.sources.warc import encode_warc, warc_pages_table

    data = encode_warc(
        [("http://x.test/a", "2023-06-05T12:34:56Z", b"<html>hi</html>")]
    )
    t = warc_pages_table(data)
    assert t.num_rows == 1  # warcinfo skipped
    assert t["url"][0].as_py() == "http://x.test/a"
    assert t["html"][0].as_py() == b"<html>hi</html>"
    assert str(t["warc_ts"][0]) == "2023-06-05 12:34:56"


def test_warc_malformed_is_loud():
    import pytest

    from ocracle_ray.sources.warc import warc_pages_table

    with pytest.raises(ValueError, match="version line"):
        warc_pages_table(b"NOTWARC/1.0\r\n\r\n")
    with pytest.raises(ValueError, match="gzip"):
        warc_pages_table(b"\x1f\x8b" + b"\x00" * 20)
    # truncated payload
    bad = (b"WARC/1.0\r\nWARC-Type: conversion\r\n"
           b"WARC-Target-URI: http://t\r\n"
           b"WARC-Date: 2023-01-01T00:00:00Z\r\n"
           b"Content-Length: 999\r\n\r\nshort")
    with pytest.raises(ValueError, match="overruns"):
        warc_pages_table(bad)


def test_orc_matches_parquet(tmp_path):
    from pyarrow import orc as paorc

    pq_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages_table(0, 25), pq_path)
    orc_path = str(tmp_path / "pages.orc")
    paorc.write_table(pages_table(0, 25), orc_path)

    want = _fps(read_pages_any(pq_path))
    got = _fps(read_pages_any(orc_path))
    pd.testing.assert_frame_equal(want, got)


def test_orc_schema_identical(tmp_path):
    from pyarrow import orc as paorc

    orc_path = str(tmp_path / "p.orc")
    paorc.write_table(pages_table(0, 4), orc_path)
    pqp = str(tmp_path / "p.parquet")
    pq.write_table(pages_table(0, 4), pqp)
    a = read_pages_any(orc_path).schema()
    b = read_pages_any(pqp).schema()
    assert {f for f in a.names} == {f for f in b.names}
    got = read_pages_any(orc_path).to_pandas()
    assert len(got) == 4 and got["html"].map(bytes).str.len().gt(0).all()


def test_ipc_matches_parquet(tmp_path):
    from pyarrow import feather

    pq_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages_table(0, 25), pq_path)
    for ext in ("arrow", "feather"):
        ipc_path = str(tmp_path / f"pages.{ext}")
        feather.write_feather(pages_table(0, 25), ipc_path,
                              compression="uncompressed")
        want = _fps(read_pages_any(pq_path))
        got = _fps(read_pages_any(ipc_path))
        pd.testing.assert_frame_equal(want, got)


def test_ipc_schema_identical_and_pruned(tmp_path):
    import pyarrow as pa
    from pyarrow import feather

    # an extra column must be pruned by the read, not carried through
    t = pages_table(0, 4).append_column(
        "extra", pa.array([b"x" * 10_000] * 4, pa.large_binary()))
    ipc_path = str(tmp_path / "p.arrow")
    feather.write_feather(t, ipc_path, compression="uncompressed")
    got = read_pages_any(ipc_path)
    assert "extra" not in got.schema().names
    df = got.to_pandas()
    assert len(df) == 4 and df["html"].map(bytes).str.len().gt(0).all()
