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
    hot_key_candidates,
    salted_groupby_sum,
    size_bucket_of,
    skew_safe_join,
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


def _skewed_join_fixture():
    """Fact table with one hot key (60% of rows), plus keys missing on
    each side so inner-join drops are exercised."""
    import numpy as np

    n = 1200
    keys = ["hot"] * 720 + [f"k{i % 40}" for i in range(470)] + ["only_left"] * 10
    left = pd.DataFrame(
        {"k": keys, "lv": np.arange(n, dtype="int64")}
    )
    right = pd.DataFrame(
        {
            "k": ["hot"] + [f"k{i}" for i in range(40)] + ["only_right"],
            "rv": np.arange(42, dtype="int64") * 100,
        }
    )
    return left, right


def test_hot_key_candidates_guarantee():
    import ray.data as rd

    left, _ = _skewed_join_fixture()
    # "hot" holds 60% of rows — far above n/(mg_k+1), so Misra-Gries
    # GUARANTEES it appears among the candidates
    cands = hot_key_candidates(rd.from_pandas(left), "k", mg_k=8)
    assert "hot" in cands
    assert len(cands) <= 8


def test_skew_safe_join_exact():
    import ray.data as rd

    left, right = _skewed_join_fixture()
    got = (
        skew_safe_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="k", mg_k=8, num_partitions=8,
        )
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    expect = (
        left.merge(right, on="k", how="inner")[["k", "lv", "rv"]]
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def _assert_join_matches_pandas(left, right, **kw):
    import ray.data as rd

    got = (
        skew_safe_join(rd.from_pandas(left), rd.from_pandas(right), on="k", **kw)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    expect = (
        left.merge(right, on="k", how="inner")[["k", "lv", "rv"]]
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_skew_safe_join_exhaustive_candidates():
    """Distinct keys <= mg_k: the sketch is exact, the candidate set
    covers every key, and the whole join rides the broadcast (the cold
    side is provably empty — an all-empty hash-join side would raise
    ArrowInvalid in ray 2.49)."""
    left = pd.DataFrame({"k": ["a", "b", "c"] * 50, "lv": range(150)})
    right = pd.DataFrame({"k": ["a", "b", "d"], "rv": [1, 2, 3]})
    _assert_join_matches_pandas(left, right, mg_k=8, num_partitions=4)


def test_skew_safe_join_uniform_keys_plain_path():
    """Every key distinct with a tiny mg_k: pruning wipes all counters
    (no hot key exists) — the plain hash-join path must be taken and
    still match."""
    left = pd.DataFrame({"k": [f"k{i}" for i in range(200)], "lv": range(200)})
    right = pd.DataFrame(
        {"k": [f"k{i}" for i in range(0, 200, 2)], "rv": range(100)}
    )
    _assert_join_matches_pandas(left, right, mg_k=4, num_partitions=4)


def test_skew_safe_join_hot_orphan_key_absent_from_right():
    """The canonical skew shape: a sentinel/unknown FK holding most of
    the fact table with NO dim row. The hot-filtered right side comes
    back as zero blocks (a column-less DataFrame), which must not
    KeyError the broadcast merge — and the empty merge results must
    stay schema-stable through the union."""
    import ray.data as rd

    left = pd.DataFrame(
        {
            "k": ["orphan"] * 2000 + [f"k{i % 30}" for i in range(600)],
            "lv": range(2600),
        }
    )
    right = pd.DataFrame(
        {"k": [f"k{i}" for i in range(30)], "rv": range(30)}
    )
    _assert_join_matches_pandas(left, right, mg_k=8, num_partitions=4)


def test_add_size_bucket_null_payload_raises():
    import ray.data as rd

    t = pa.table(
        {
            "url": ["a", "b"],
            "html": pa.array([b"x", None], pa.large_binary()),
        }
    )
    with pytest.raises(Exception, match="null payload"):
        add_size_bucket(rd.from_arrow(t)).to_pandas()


def test_skew_safe_join_duplicate_right_keys_multiplicity():
    """Join multiplicity: duplicate right rows per key must fan out
    left rows on BOTH the broadcast and hash-join paths (inner-join
    cartesian per key)."""
    import ray.data as rd

    left, _ = _skewed_join_fixture()
    right = pd.DataFrame(
        {
            "k": ["hot", "hot", "hot", "k0", "k0", "k1"],
            "rv": [1, 2, 3, 10, 20, 30],
        }
    )
    got = (
        skew_safe_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="k", mg_k=8, num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    expect = (
        left.merge(right, on="k", how="inner")[["k", "lv", "rv"]]
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_skew_safe_join_null_keys_match_plain_join():
    """Null join keys must match NOTHING (SQL semantics, what ray's
    hash join does) on every path — including when nulls are frequent
    enough that an unfiltered sketch would make null a hot candidate
    and route it down the pandas broadcast merge (which WOULD match
    NaN==NaN)."""
    import ray.data as rd

    left = pd.DataFrame(
        {"k": ([None] * 600 + ["a", "b"] * 300), "lv": range(1200)}
    )
    right = pd.DataFrame({"k": ["a", "b", None], "rv": [1, 2, 3]})
    got = (
        skew_safe_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="k", mg_k=8, num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    expect = (
        left.dropna(subset=["k"])
        .merge(right.dropna(subset=["k"]), on="k", how="inner")[["k", "lv", "rv"]]
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_skew_safe_join_left_outer_matches_pandas():
    """left_outer: unmatched left rows — hot orphans, cold misses, and
    null keys — are emitted with typed null right columns on every
    path."""
    import ray.data as rd

    left = pd.DataFrame(
        {
            # hot orphan (no dim row), cold hits, cold misses, nulls
            "k": ["orphan"] * 700
            + [f"k{i % 20}" for i in range(400)]
            + ["only_left"] * 30
            + [None] * 70,
            "lv": range(1200),
        }
    )
    right = pd.DataFrame({"k": [f"k{i}" for i in range(10)], "rv": range(10)})
    got = (
        skew_safe_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="k", join_type="left_outer", mg_k=8, num_partitions=4,
        )
        .to_pandas()
        .sort_values(["lv"])
        .reset_index(drop=True)
    )
    expect = (
        left.merge(right, on="k", how="left")[["k", "lv", "rv"]]
        .sort_values(["lv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)
    # the emitted null right columns are typed, not null-typed
    assert got["rv"].isna().sum() == (700 + 30 + 70 + 400 - 200)


def test_skew_safe_join_right_on_renames():
    import ray.data as rd

    left, right = _skewed_join_fixture()
    right = right.rename(columns={"k": "dim_key"})
    got = (
        skew_safe_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="k", right_on="dim_key", mg_k=8, num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    expect = (
        left.merge(right, left_on="k", right_on="dim_key", how="inner")[
            ["k", "lv", "rv"]
        ]
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_skew_safe_join_right_limit_raises():
    import ray.data as rd

    left, right = _skewed_join_fixture()
    with pytest.raises(RuntimeError, match="hot_right_limit"):
        skew_safe_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="k", mg_k=8, num_partitions=8, hot_right_limit=0,
        )


def test_skew_safe_join_column_clash_raises():
    import ray.data as rd

    left, right = _skewed_join_fixture()
    with pytest.raises(ValueError, match="disjoint"):
        skew_safe_join(
            rd.from_pandas(left),
            rd.from_pandas(right.rename(columns={"rv": "lv"})),
            on="k",
        )


def test_pin_join_cpu_reservation_private_context():
    """The pinned override lives on the RETURNED dataset's private
    context copy — the caller's input datasets are untouched (a shared
    mutation would leak the cap into every pipeline built from the
    same root)."""
    import ray.data as rd

    left, right = _skewed_join_fixture()
    lds, rds = rd.from_pandas(left), rd.from_pandas(right)
    out = skew_safe_join(lds, rds, on="k", mg_k=8, num_partitions=8)
    assert (
        out._plan._context.join_operator_actor_num_cpus_per_partition_override
        is not None
    )
    # planner reads the executing dataset's logical-plan context —
    # both plan handles must carry the same pinned copy
    assert out._logical_plan._context is out._plan._context
    for src in (lds, rds):
        assert (
            src._plan._context.join_operator_actor_num_cpus_per_partition_override
            is None
        )


def test_skew_safe_join_property_random_distributions(ray_session):
    """Property sweep: random key distributions (varying skew, right
    coverage, mg_k) must all equal the pandas inner merge. Seeded
    numpy instead of hypothesis: each example pays several Ray
    executions, so a fixed 8-case sweep keeps the suite bounded."""
    import numpy as np
    import ray.data as rd

    for seed in range(8):
        rng = np.random.RandomState(seed)
        n = int(rng.randint(50, 600))
        n_keys = int(rng.randint(1, 40))
        # zipf-ish skew: a few keys dominate
        weights = 1.0 / np.arange(1, n_keys + 1) ** float(rng.uniform(0.0, 2.0))
        weights /= weights.sum()
        left = pd.DataFrame(
            {
                "k": rng.choice(
                    [f"key{i}" for i in range(n_keys)], size=n, p=weights
                ),
                "lv": np.arange(n, dtype="int64"),
            }
        )
        cover = rng.choice([f"key{i}" for i in range(n_keys)],
                           size=max(1, n_keys // 2), replace=False)
        right = pd.DataFrame(
            {"k": cover, "rv": np.arange(len(cover), dtype="int64")}
        )
        mg_k = int(rng.randint(2, 12))
        got = (
            skew_safe_join(
                rd.from_pandas(left), rd.from_pandas(right),
                on="k", mg_k=mg_k, num_partitions=4,
            )
            .to_pandas()
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )
        expect = (
            left.merge(right, on="k", how="inner")[["k", "lv", "rv"]]
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got, expect, check_dtype=False,
            obj=f"seed={seed} n={n} n_keys={n_keys} mg_k={mg_k}",
        )


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
