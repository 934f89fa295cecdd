"""Snapshot CDC (stages/snapshot.py): status semantics, in-snapshot
keep-latest with the (ts, fp) tie-break, and the null-ts loser rule."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages.snapshot import (fingerprint_pages,
                                         snapshot_delta_census)


def _rows(spec):
    """spec: (url, ts_us_or_None, fp)."""
    return rd.from_arrow(pa.table({
        "side": pa.array(["x"] * len(spec), pa.string()),
        "url": pa.array([s[0] for s in spec], pa.string()),
        "warc_ts": pa.array([s[1] for s in spec], pa.timestamp("us")),
        "text_fingerprint": pa.array([s[2] for s in spec], pa.int64()),
    })).repartition(2)


def test_census_all_four_statuses(ray_session):
    a = _rows([
        ("u/gone", 100, 11),
        ("u/same", 100, 22),
        ("u/diff", 100, 33),
        # recrawled within snapshot A: later ts wins -> fp 44
        ("u/dup", 100, 99),
        ("u/dup", 200, 44),
        # tie on ts: larger fp wins -> 77
        ("u/tie", 100, 5),
        ("u/tie", 100, 77),
        # null ts always loses to any real ts -> 66
        ("u/null", None, 1),
        ("u/null", 50, 66),
    ])
    b = _rows([
        ("u/new", 300, 88),
        ("u/same", 300, 22),
        ("u/diff", 300, 333),
        ("u/dup", 300, 44),
        ("u/tie", 300, 77),
        ("u/null", 300, 66),
    ])
    out = snapshot_delta_census(a, b, n_buckets=4).set_index("status")
    assert int(out.loc["added", "n_urls"]) == 1
    assert int(out.loc["removed", "n_urls"]) == 1
    assert int(out.loc["changed", "n_urls"]) == 1
    assert int(out.loc["unchanged", "n_urls"]) == 4
    assert int(out.loc["added", "fp_xor"]) == 88
    assert int(out.loc["removed", "fp_xor"]) == 11
    assert int(out.loc["changed", "fp_xor"]) == 333  # latest side wins
    assert int(out.loc["unchanged", "fp_xor"]) == 22 ^ 44 ^ 77 ^ 66


def test_fingerprint_pages_drops_html_and_is_stable(ray_session):
    pages = rd.from_arrow(pa.table({
        "url": pa.array(["u1", "u2"], pa.string()),
        "warc_ts": pa.array([1, 2], pa.timestamp("us")),
        "html": pa.array([b"<html>x</html>", b"<html>y</html>"],
                         pa.large_binary()),
    }))
    t1 = fingerprint_pages(pages, "a").to_pandas()
    t2 = fingerprint_pages(pages, "a").to_pandas()
    assert "html" not in t1.columns
    pd.testing.assert_frame_equal(t1, t2)  # deterministic fp
    assert t1["text_fingerprint"].nunique() == 2


def test_identical_snapshots_are_all_unchanged(ray_session):
    a = _rows([("u1", 1, 10), ("u2", 2, 20)])
    b = _rows([("u1", 9, 10), ("u2", 9, 20)])  # recrawl, same content
    out = snapshot_delta_census(a, b, n_buckets=2)
    assert list(out["status"]) == ["unchanged"]
    assert int(out["n_urls"].iloc[0]) == 2


def test_incremental_extraction_equals_full(ray_session):
    """The CDC payoff: re-extracting ONLY added+changed urls and
    carrying unchanged records forward reproduces the full snapshot-B
    extraction exactly (per-url extracted-text fingerprints)."""
    import pyarrow.compute as pc

    from ocracle_ray.pipelines.extraction import extract_records
    from ocracle_ray.sources.pages import pages_table
    from ocracle_ray.stages.snapshot import snapshot_delta_rows

    n, ofs = 60, 6
    note, bump = b"<!-- recrawl -->", 30 * 86_400 * 1_000_000

    def mutate(t):
        urls = t["url"].to_pylist()
        html = t["html"].to_pylist()
        ts = t["warc_ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype("int64")
        changed = [int(u[-6:]) % 7 == 3 for u in urls]
        html = [h + note if c else h for h, c in zip(html, changed)]
        ts = [t_ + bump if c else t_ for t_, c in zip(ts, changed)]
        import numpy as np
        return pa.table({
            "url": t["url"],
            "warc_ts": pa.array(np.array(ts, "int64").astype(
                "datetime64[us]"), pa.timestamp("us")),
            "html": pa.array(html, pa.large_binary()),
            "text": t["text"], "lang": t["lang"],
        })

    snap_a = rd.from_arrow(pages_table(0, n)).repartition(3)
    snap_b = rd.from_arrow(mutate(pages_table(ofs, n))).repartition(3)

    from ocracle_ray.stages.snapshot import fingerprint_pages

    delta = snapshot_delta_rows(
        fingerprint_pages(snap_a, "a"), fingerprint_pages(snap_b, "b"),
        n_buckets=4,
    ).to_pandas()
    todo = set(delta[delta["status"].isin(["added", "changed"])]["url"])
    keep = set(delta[delta["status"] == "unchanged"]["url"])

    def fp_map(recs):
        df = recs.to_pandas()
        return dict(zip(df["url"], df["text_fingerprint"]))

    full = fp_map(extract_records(snap_b, concurrency=2))

    todo_arr = pa.array(sorted(todo), pa.string())
    inc_new = fp_map(extract_records(
        snap_b.map_batches(
            lambda t: t.filter(pc.is_in(t["url"], value_set=todo_arr)),
            batch_format="pyarrow"),
        concurrency=2))
    base = fp_map(extract_records(snap_a, concurrency=2))
    carried = {u: base[u] for u in keep}
    merged = {**carried, **inc_new}

    assert set(delta[delta["status"] == "changed"]["url"])  # non-trivial
    assert merged == full
    # and the carried set really skipped re-extraction work
    assert keep and todo and not (keep & todo)
