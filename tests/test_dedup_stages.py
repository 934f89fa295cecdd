"""Dedup stage tests: exact, MinHash-LSH, SimHash, Jaccard, embeddings."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocracle_ray.core.dedup import (
    hamming64,
    jaccard,
    minhash_jaccard_estimate,
    minhash_signature,
    simhash,
    word_shingles,
)
from ocracle_ray.stages.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_dups,
)

BASE = (
    "en bil kjører med konstant fart langs en rett vei og vi måler posisjonen "
    "hvert sekund for å beregne akselerasjonen i forsøket som gjentas mange ganger"
)
NEAR = BASE.replace("konstant", "jevn")  # one word differs -> high jaccard
FAR = "helt annerledes innhold om statistikk og sannsynlighet i fordelinger her"


def _docs_ds():
    import ray.data as rd

    rows = {
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [BASE, BASE, NEAR, FAR, FAR.upper(), "kort tekst"],
    }
    return rd.from_arrow(pa.Table.from_pydict(rows))


# ------------------------------------------------------------- core fns

def test_jaccard_identical():
    assert jaccard(BASE, BASE) == 1.0


def test_jaccard_near_vs_far():
    assert jaccard(BASE, NEAR) > 0.7 > jaccard(BASE, FAR)


def test_minhash_estimates_jaccard():
    sa = minhash_signature(BASE)
    sb = minhash_signature(NEAR)
    est = minhash_jaccard_estimate(sa, sb)
    true = jaccard(BASE, NEAR)
    assert abs(est - true) < 0.15


def test_minhash_deterministic():
    assert (minhash_signature(BASE) == minhash_signature(BASE)).all()


def test_simhash_properties():
    a, b, c = simhash(BASE), simhash(NEAR), simhash(FAR)
    assert a == simhash(BASE)
    assert hamming64(a, b) < hamming64(a, c)


def test_word_shingles_short_text():
    assert word_shingles("en to", k=3) == ["en to"]
    assert word_shingles("", k=3) == []


# ------------------------------------------------------------- stages

def test_exact_dedup_stage():
    out = exact_dedup(_docs_ds(), "doc_id", "text").to_pandas()
    # BASE==BASE (1,2) and FAR==far-upper (4,5) after normalization
    m = dict(zip(out["doc_id"], out["n_copies"]))
    assert m[1] == 2 and m[4] == 2 and m[3] == 1 and m[6] == 1
    assert 2 not in m and 5 not in m
    assert len(out) == 4


def test_minhash_lsh_finds_near_dups():
    pairs = minhash_lsh_pairs(_docs_ds(), "doc_id", "text", threshold=0.7, n_bands=32)
    got = set(zip(pairs["a"], pairs["b"]))
    assert (1, 2) in got          # identical
    assert (1, 3) in got and (2, 3) in got  # near-dup
    assert (4, 5) in got          # case-normalized identical
    assert all(a < b for a, b in got)
    assert not any({a, b} & {6} for a, b in got)


def test_minhash_subset_of_bruteforce():
    lsh = minhash_lsh_pairs(_docs_ds(), "doc_id", "text", threshold=0.7, n_bands=32)
    bf = ngram_jaccard_pairs(_docs_ds(), "doc_id", "text", threshold=0.7, n_buckets=1)
    assert set(zip(lsh["a"], lsh["b"])) <= set(zip(bf["a"], bf["b"]))
    # identical pairs (jaccard 1.0) are ALWAYS recalled by LSH
    ones = set(zip(bf.loc[bf["jaccard"] == 1.0, "a"], bf.loc[bf["jaccard"] == 1.0, "b"]))
    assert ones <= set(zip(lsh["a"], lsh["b"]))


def test_ngram_containment_wrapper_dedup():
    """The asymmetric case jaccard misses: doc B = doc A inside a
    boilerplate shell — containment 1.0, jaccard well below 0.8."""
    import ray.data as rd

    from ocracle_ray.core.dedup import word_shingles
    from ocracle_ray.stages.dedup import ngram_containment_pairs

    core = "alpha beta gamma delta epsilon zeta eta theta"
    shell = ("nav home login search " + core
             + " footer contact privacy terms copyright sitemap")
    other = "one two three four five six seven eight nine ten"
    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [core, shell, other],
        }
    )
    ds = rd.from_arrow(t)
    out = ngram_containment_pairs(ds, "doc_id", "text",
                                  threshold=0.9, n_buckets=1)
    assert list(zip(out["a"], out["b"])) == [(1, 2)]
    # reference: |A∩B| / min(|A|,|B|) over word-3-gram sets
    sa, sb = set(word_shingles(core)), set(word_shingles(shell.lower()))
    ref = len(sa & sb) / min(len(sa), len(sb))
    assert out["containment"].iloc[0] == round(ref, 6)
    # jaccard would NOT pair them at the usual threshold
    jac = len(sa & sb) / len(sa | sb)
    assert jac < 0.8 and ref >= 0.9
    from ocracle_ray.stages.dedup import ngram_jaccard_pairs

    bf = ngram_jaccard_pairs(ds, "doc_id", "text", threshold=0.8, n_buckets=1)
    assert len(bf) == 0
    with pytest.raises(ValueError, match="metric"):
        ngram_jaccard_pairs(ds, "doc_id", "text", metric="cosine")


def test_simhash_dups_stage():
    out = simhash_dups(_docs_ds(), "doc_id", "text").to_pandas()
    assert (out["n_docs"] > 1).all()
    assert 1 in set(out["min_key"]) and 4 in set(out["min_key"])


def test_embedding_neardup():
    import ray.data as rd

    rng = np.random.RandomState(7)
    base = rng.randn(8, 16)
    vecs = list(base) + [base[0] + rng.randn(16) * 0.01, base[3]]  # 8=near0, 9=dup3
    t = pa.Table.from_pydict(
        {
            "vec_id": pa.array(range(10), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
        }
    )
    pairs = embedding_neardup_pairs(
        rd.from_arrow(t), "vec_id", "embedding", threshold=0.95, n_planes=4
    )
    got = set(zip(pairs["a"], pairs["b"]))
    assert (0, 8) in got and (3, 9) in got
    assert all(c >= 0.95 for c in pairs["cosine"])


# ----------------------------------------------- simhash hamming<=k

def _rand_word_docs(n, seed=13):
    """Random word-soup docs with injected near-identical variants so
    some (but not all) pairs land within hamming<=3."""
    rng = np.random.RandomState(seed)
    vocab = [f"ord{i}" for i in range(400)]
    texts = []
    for _ in range(n):
        texts.append(" ".join(rng.choice(vocab, size=40)))
    # variants: change ONE word of an existing doc (tiny hamming delta)
    for i in range(0, n, 5):
        w = texts[i].split()
        w[3] = "endret"
        texts.append(" ".join(w))
    return pd.DataFrame({"doc_id": range(len(texts)), "text": texts})


def _brute_hamming_pairs(df, k=3):
    from ocracle_ray.stages.dedup import popcount64

    ids = df["doc_id"].to_numpy(dtype=np.int64)
    sh = np.array([simhash(x) for x in df["text"]], dtype=np.uint64)
    order = np.argsort(ids)
    ids, sh = ids[order], sh[order]
    out = set()
    for i in range(len(ids) - 1):
        h = popcount64(sh[i + 1:] ^ sh[i])
        for j in np.flatnonzero(h <= k):
            out.add((int(ids[i]), int(ids[i + 1 + j])))
    return out


def test_popcount64_matches_bit_count():
    rng = np.random.RandomState(5)
    v = rng.randint(0, 2**63, size=1000, dtype=np.int64).astype(np.uint64)
    from ocracle_ray.stages.dedup import popcount64

    got = popcount64(v)
    expect = np.array([int(x).bit_count() for x in v])
    assert (got == expect).all()


def test_simhash_neardup_exact_vs_brute():
    """The pigeonhole band trick is EXACT: found pairs == brute-force
    hamming<=3 pairs, both directions (recall AND precision)."""
    import ray.data as rd

    from ocracle_ray.stages.dedup import simhash_neardup_pairs

    df = _rand_word_docs(60)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4)
    pairs = simhash_neardup_pairs(ds, "doc_id", "text", max_hamming=3)
    assert set(zip(pairs["a"], pairs["b"])) == _brute_hamming_pairs(df)
    assert (pairs["hamming"] <= 3).all()
    assert len(pairs) > 0  # fixture must actually exercise the operator


def test_simhash_neardup_megabucket_star():
    """Identical docs (one giant bucket) degrade to a star around the
    min key — connectivity preserved, O(n) pairs."""
    import ray.data as rd

    from ocracle_ray.stages.dedup import simhash_neardup_pairs

    df = pd.DataFrame({"doc_id": range(30), "text": ["samme tekst her"] * 30})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    pairs = simhash_neardup_pairs(ds, "doc_id", "text", max_hamming=3, max_bucket=10)
    got = set(zip(pairs["a"], pairs["b"]))
    assert got == {(0, i) for i in range(1, 30)}


def test_dedup_candidates_paths_agree():
    """The distributed hash-bucket dedup (> 500k threshold path) and
    the driver drop_duplicates path return the same unique pair set —
    including pairs whose ids exercise uint64 hash wraparound."""
    import ray.data as rd

    from ocracle_ray.stages.dedup import _dedup_candidates

    rng = np.random.default_rng(7)
    uniq = rng.integers(0, 2**62, size=(500, 2), dtype=np.int64)
    idx = rng.integers(0, 500, size=6_000)
    t = pa.table({"a": uniq[idx, 0], "b": uniq[idx, 1]})
    cand_ds = rd.from_arrow(t).repartition(8)

    drv = _dedup_candidates(cand_ds, n_cand=len(idx))  # <= 500k: driver path
    dist = _dedup_candidates(cand_ds, n_cand=600_000)  # forced distributed path
    key = lambda df: set(zip(df["a"].astype(np.int64), df["b"].astype(np.int64)))
    assert key(drv) == key(dist)
    assert len(dist) == len(pd.DataFrame({"a": uniq[:, 0], "b": uniq[:, 1]}).drop_duplicates())


# ---- round-3 perf rework: vectorized emitter / hashed jaccard parity


def test_band_candidate_pairs_equals_pergroup_reference():
    """The hash-bucketed vectorized pair emitter must produce exactly
    the per-(band_id, band_hash) reference emitter's pair set,
    including the max_bucket star degradation."""
    import ray.data as rd

    from ocracle_ray.stages.dedup import (
        MinHasher,
        band_candidate_pairs,
        make_bucket_pairs_fn,
    )

    rows = {
        "doc_id": list(range(40)),
        # 8 near-dup variants -> real multi-doc band buckets
        "text": [BASE + f" variant {i % 8}" for i in range(40)],
    }
    for max_bucket in (64, 3):  # 3 forces the star path on 5-doc buckets
        ds = rd.from_arrow(pa.Table.from_pydict(rows)).repartition(3)
        band_rows = ds.map_batches(
            MinHasher,
            fn_constructor_kwargs=dict(
                key="doc_id", text="text", n_perm=128, k_shingle=3, n_bands=16
            ),
            batch_format="pyarrow",
            concurrency=2,
        ).materialize()
        got = (
            band_candidate_pairs(band_rows, "doc_id", max_bucket, n_buckets=7)
            .to_pandas()
            .drop_duplicates()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        want = (
            band_rows.groupby(["band_id", "band_hash"])
            .map_groups(make_bucket_pairs_fn("doc_id", max_bucket),
                        batch_format="pyarrow")
            .to_pandas()
            .drop_duplicates()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


def test_jaccard_hashed_matches_string_jaccard():
    from ocracle_ray.core.dedup import jaccard_hashed, shingle_hashes

    cases = [
        (BASE, BASE),
        (BASE, NEAR),
        (BASE, FAR),
        ("", ""),
        (BASE, ""),
        ("kort", "kort"),
        ("to ord", "to ord her"),
    ]
    for a, b in cases:
        assert jaccard_hashed(shingle_hashes(a), shingle_hashes(b)) == pytest.approx(
            jaccard(a, b), abs=1e-12
        )
