"""End-to-end Ray pipeline tests: schema stability, dedup, byte identity.

The byte-identity invariant (FIXTURES.md invariant #1) across
parallelism levels is proven here at the block level: the same input at
1 block vs 8 blocks must yield identical per-url extracted text (fresh
``ray.init`` at 8 vs 32 CPUs is covered by ``bench.py --scaling``, which
runs fresh processes).
"""

import pyarrow as pa
import pytest

from ocracle_ray.core.extract import extract_document
from ocracle_ray.pipelines.extraction import extract_records, summarize_records
from ocracle_ray.sources.pages import gen_page, generate_pages_dataset

N_DOCS = 120


@pytest.fixture(scope="module")
def records_df():
    ds = generate_pages_dataset(N_DOCS)
    return extract_records(ds, concurrency=2).to_pandas()


def test_schema_and_counts(records_df):
    df = records_df
    expected_urls = {gen_page(i)["url"] for i in range(N_DOCS)}
    assert set(df["url"]) == expected_urls       # dedup: one row per url
    assert len(df) == len(expected_urls)
    assert (df["error"] == "").all()
    assert (df["n_tasks"] > 0).mean() > 0.9


def test_pdf_branch_present(records_df):
    branches = set(records_df["branch"])
    assert "html" in branches and "pdf" in branches


def test_matches_single_process_oracle(records_df):
    """Ray output == pure single-process oracle, byte for byte."""
    got = dict(zip(records_df["url"], records_df["extracted_text"]))
    # oracle: keep-latest per url (max warc_ts) then extract directly
    best = {}
    for i in range(N_DOCS):
        p = gen_page(i)
        if p["url"] not in best or p["warc_ts"] > best[p["url"]]["warc_ts"]:
            best[p["url"]] = p
    for url, p in best.items():
        expect = extract_document(url, p["html"], p["lang"])["extracted_text"]
        assert got[url] == expect, f"byte mismatch for {url}"


def test_identity_across_parallelism():
    """Same input, 1 block vs 8 blocks -> identical extracted text."""
    outs = []
    for nblocks in (1, 8):
        ds = generate_pages_dataset(60, override_num_blocks=nblocks)
        df = extract_records(ds, concurrency=2).to_pandas()
        outs.append(dict(zip(df["url"], df["extracted_text"])))
    assert outs[0] == outs[1]


def test_summarize_records():
    ds = generate_pages_dataset(80)
    recs = extract_records(ds, concurrency=2)
    summary = summarize_records(recs).to_pandas()
    assert set(summary.columns) == {"lang", "docs", "tasks", "points", "errors"}
    assert summary["docs"].sum() == len({gen_page(i)["url"] for i in range(80)})
    assert summary["errors"].sum() == 0


def test_records_arrow_types(records_df):
    # nested tasks survive Arrow round-trip
    row = records_df.iloc[0]
    assert isinstance(row["tasks"], (list, tuple)) or hasattr(row["tasks"], "__len__")


def test_giant_doc_handled(records_df):
    giant_url = gen_page(13)["url"]
    row = records_df[records_df["url"] == giant_url].iloc[0]
    assert row["n_blocks"] > 1000
    assert row["n_tasks"] >= 25


def test_extract_records_from_paths_auto_dedup(tmp_path):
    import glob
    import os

    import pyarrow.parquet as pq

    from ocracle_ray.pipelines.extraction import extract_records_from_paths
    from ocracle_ray.sources.pages import pages_table

    d = tmp_path / "pages"
    d.mkdir()
    pq.write_table(pages_table(0, 60), str(d / "p0.parquet"))
    files = sorted(glob.glob(os.path.join(str(d), "*.parquet")))
    df = extract_records_from_paths(files, concurrency=2).to_pandas()
    expect_urls = {gen_page(i)["url"] for i in range(60)}
    assert set(df["url"]) == expect_urls
    assert len(df) == len(expect_urls)  # winners only


def test_identity_across_batch_sizes():
    """Same input at batch_size 16 vs 256 -> identical records
    (a second parallelism axis beyond block count)."""
    outs = []
    for bs in (16, 256):
        ds = generate_pages_dataset(60, override_num_blocks=4)
        df = extract_records(ds, batch_size=bs, concurrency=2).to_pandas()
        outs.append(dict(zip(df["url"], df["text_fingerprint"])))
    assert outs[0] == outs[1]
