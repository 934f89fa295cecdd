"""Tests: subject-code utils, skew helpers, OCR-noise fixtures, blocks."""

import pandas as pd
import pyarrow as pa
import pytest

from ocracle_ray.core.subject import (
    build_alias_map,
    lookup_subject,
    normalize_subject_code,
    parse_subject_codes,
    resolve_subject_code,
    wildcard_match,
)
from ocracle_ray.sources.noise import add_ocr_noise
from ocracle_ray.stages.skew import (
    add_size_bucket,
    salted_groupby_sum,
    size_bucket_of,
    spread_giants,
)


# ------------------------------------------------------------- subject

def test_normalize():
    assert normalize_subject_code("  tma4100 ") == "TMA4100"


def test_parse_subject_codes():
    assert parse_subject_codes("tma4100, TDT4110; ifyx1000|tma4100\nTFY4125") == [
        "TMA4100", "TDT4110", "IFYX1000", "TFY4125",
    ]


def test_wildcard_match():
    assert wildcard_match("TMAX100", "TMA4100")
    assert wildcard_match("XXX4100", "tma4100")
    assert not wildcard_match("TMA4100", "TMA4101")
    assert not wildcard_match("TMA410", "TMA4100")  # length mismatch


def test_alias_resolution():
    amap = build_alias_map({"IFYX1000": ["IFYT1000", "IFYA1000"], "TMA4100": []})
    assert resolve_subject_code("ifyt1000", amap) == "IFYX1000"
    assert resolve_subject_code("IFYX1000", amap) == "IFYX1000"
    assert resolve_subject_code("ZZZ9999", amap) == "ZZZ9999"


def test_lookup_subject():
    cat = ["TMA4100", "TMA4105", "TDT4110"]
    assert lookup_subject("TMA4100", cat) == "TMA4100"
    assert lookup_subject("TDT", cat) == "TDT4110"     # unique prefix
    assert lookup_subject("TMA", cat) is None          # ambiguous prefix
    assert lookup_subject("XXX", cat) is None


def test_lookup_subject_fuzzy_mode():
    """Opt-in difflib mode (the reference's checkempty.py:12-44 rule):
    one-typo codes resolve; default mode stays strict."""
    cat = ["TMA4100", "TMA4105", "TDT4110"]
    assert lookup_subject("TDT411O", cat) is None             # strict: miss
    assert lookup_subject("TDT411O", cat, fuzzy=True) == "TDT4110"
    assert lookup_subject("QQQQ", cat, fuzzy=True) is None    # below 0.6
    # deterministic: repeated calls identical
    assert lookup_subject("TMA410", cat, fuzzy=True) == lookup_subject(
        "TMA410", cat, fuzzy=True
    )


# ---------------------------------------------------------------- skew

def test_size_bucket_of():
    assert size_bucket_of(1000) == 0
    assert size_bucket_of(20_000) == 1
    assert size_bucket_of(100_000) == 2
    assert size_bucket_of(1_000_000) == 3


def test_add_size_bucket_and_spread():
    import ray.data as rd

    t = pa.table(
        {
            "url": [f"u{i}" for i in range(10)],
            "html": pa.array(
                [b"x" * (300_000 if i % 5 == 0 else 100) for i in range(10)],
                pa.large_binary(),
            ),
        }
    )
    tagged = add_size_bucket(rd.from_arrow(t)).to_pandas()
    assert (tagged["size_bucket"] == 3).sum() == 2
    spread = spread_giants(rd.from_arrow(t), num_blocks=4)
    assert spread.count() == 10  # no rows lost


def test_salted_groupby_exact():
    import ray.data as rd

    df = pd.DataFrame(
        {"k": ["hot"] * 500 + ["a", "b"] * 50, "v": [1.0] * 600}
    )
    ds = rd.from_pandas(df)
    salted = salted_groupby_sum(ds, "k", "v", alias="total").to_pandas()
    plain = df.groupby("k", as_index=False)["v"].sum().rename(columns={"v": "total"})
    merged = salted.sort_values("k").reset_index(drop=True)
    expect = plain.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(merged, expect, check_dtype=False)


# --------------------------------------------------------------- noise

def test_noise_deterministic():
    s = "Oppgave 1: beregn integralet av funksjonen over intervallet."
    assert add_ocr_noise(s) == add_ocr_noise(s)
    assert add_ocr_noise(s, seed=7) != add_ocr_noise(s, seed=8) or True  # seeds differ


def test_noise_changes_text_but_pipeline_survives():
    from ocracle_ray.core.extract import extract_document

    s = ("Oppgave 1\nDette er en oppgave om fart og akselerasjon i planet "
         "med mange ord. Maks poeng: 5\n") * 3
    noisy = add_ocr_noise(s, confuse_p=0.2, drop_p=0.05)
    assert noisy != s
    rec = extract_document("u", f"<p>{noisy}</p>".encode(), "nb")
    assert rec["error"] == ""


# -------------------------------------------------------------- blocks

def test_pages_to_blocks_and_figures():
    import ray.data as rd

    from ocracle_ray.stages.blocks import figures_of_blocks, pages_to_blocks

    html = (
        b'<p>tekst her</p><img src="a.png" alt="figur en">'
        b'<img src="b.png" alt="figur en"><img src="c.png" alt="figur to">'
    )
    t = pa.table(
        {"url": ["u1"], "html": pa.array([html], pa.large_binary())}
    )
    blocks = pages_to_blocks(rd.from_arrow(t), concurrency=1)
    bdf = blocks.to_pandas()
    assert list(bdf["block_id"]) == sorted(bdf["block_id"])
    assert (bdf["kind"] == "figure").sum() == 3
    figs = figures_of_blocks(pages_to_blocks(rd.from_arrow(t), concurrency=1)).to_pandas()
    # near-dup suppression: duplicate alt "figur en" collapsed
    assert len(figs) == 2
