"""Regression tests for the round-1 code-review findings."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocracle_ray.core.assemble import render_task_html
from ocracle_ray.core.html_tokenizer import tokenize


def test_unquoted_href_trailing_slash_not_self_closing():
    # <a href=http://x/> must open a link (browsers ignore the slash)
    blocks = tokenize(b'<p><a href=http://x/>linked words here</a> tail</p>')
    b = blocks[0]
    assert b.link_chars == len("linked words here")


def test_true_self_closing_still_detected():
    blocks = tokenize(b'<p>before</p><img src="x.png" alt="fig"/><p>after</p>')
    assert [x.kind for x in blocks] == ["text", "figure", "text"]
    blocks2 = tokenize(b"<p>a b c</p><br/><p>d e f</p>")
    assert [x.text for x in blocks2] == ["a b c", "d e f"]


def test_katex_html_escaped():
    html = render_task_html("1", "Vis at 2<3=5 stemmer", [(7, 12, "2<3 = 5")])
    assert "<3" not in html.replace("&lt;3", "")
    assert "&lt;" in html


def test_broadcast_shuffle_tie_consistency(tmp_path):
    """Exact warc_ts ties must route to the shuffle path (auto mode)."""
    import ray.data as rd

    from ocracle_ray.pipelines.extraction import (
        dup_winner_map,
        extract_records_from_paths,
    )

    ts = 1_700_000_000_000_000
    t = pa.table(
        {
            "url": ["https://e/a", "https://e/a", "https://e/b"],
            "warc_ts": pa.array([ts, ts, ts + 1], pa.timestamp("us")),
            "html": pa.array(
                [b"<p>versjon en av siden her</p>",
                 b"<p>versjon to av siden her</p>",
                 b"<p>helt annen side</p>"],
                pa.large_binary(),
            ),
            "text": pa.array(["", "", ""], pa.large_string()),
            "lang": ["nb", "nb", "nb"],
        }
    )
    p = str(tmp_path / "tie.parquet")
    pq.write_table(t, p)

    winners, ambiguous = dup_winner_map([p])
    assert "https://e/a" in ambiguous  # tie detected

    df = extract_records_from_paths([p], concurrency=2).to_pandas()
    # exactly ONE row per url even under ties (shuffle path tiebreak)
    assert sorted(df["url"]) == ["https://e/a", "https://e/b"]


def test_short_doc_shingle_pairs_match_oracle():
    """<3-word duplicate docs pair in BOTH the engine and the SQL oracle."""
    import duckdb
    import ray.data as rd

    from ocracle_ray.pipelines.queries import _SHINGLE_JACCARD_SQL
    from ocracle_ray.stages.dedup import ngram_jaccard_pairs

    t = pa.table(
        {"doc_id": pa.array([1, 2, 3], pa.int64()),
         "text": ["kort tekst", "kort tekst", "lang nok tekst til shingler her"]}
    )
    pairs = ngram_jaccard_pairs(rd.from_arrow(t), "doc_id", "text",
                                threshold=0.8, n_buckets=1)
    con = duckdb.connect()
    con.register("documents", t)
    oracle = con.sql(_SHINGLE_JACCARD_SQL).df()
    assert set(zip(pairs["a"], pairs["b"])) == set(zip(oracle["a"], oracle["b"])) == {(1, 2)}


def test_mega_bucket_star_fallback():
    """Buckets beyond max_bucket emit a star, not silence."""
    import ray.data as rd

    from ocracle_ray.stages.dedup import minhash_lsh_pairs, neardup_clusters_from_pairs

    base = ("en helt identisk tekst som gjentas i mange dokumenter "
            "for å lage en megaklynge av nesten like sider")
    n = 12
    t = pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "text": [base] * n}
    )
    pairs = minhash_lsh_pairs(
        rd.from_arrow(t), "doc_id", "text", threshold=0.8, n_bands=32, max_bucket=4
    )
    assert len(pairs) > 0  # previously: silently empty
    clusters = neardup_clusters_from_pairs(pairs)
    # star keeps connectivity: all docs in ONE cluster rooted at 0
    assert set(clusters["cluster_id"]) == {0}
    assert set(clusters["key"]) == set(range(n))


def test_figures_dedup_across_batches():
    """Duplicate figures in ONE url must collapse regardless of batch
    layout (review: per-batch seen-set missed cross-batch dups)."""
    import ray.data as rd

    from ocracle_ray.stages.blocks import figures_of_blocks, pages_to_blocks

    body = b"".join(
        b'<p>avsnitt nummer %d med litt tekst</p>' % i for i in range(50)
    )
    html = (
        b'<img src="a.png" alt="figur en">' + body + b'<img src="b.png" alt="figur en">'
    )
    t = pa.table({"url": ["u1"], "html": pa.array([html], pa.large_binary())})
    blocks = pages_to_blocks(rd.from_arrow(t), concurrency=1)
    # force a tiny batch size downstream by repartitioning blocks
    figs = figures_of_blocks(blocks.repartition(8)).to_pandas()
    assert len(figs) == 1
    assert figs["block_id"].iloc[0] == 0  # min block_id wins
