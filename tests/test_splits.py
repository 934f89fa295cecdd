"""Holdout split + leakage audit (stages/splits.py): hash/split
semantics against a pure-Python reference, and an engineered corpus
that plants duplicates within and across splits (the sf corpora have
few cross-split dups, so the leak rule needs its own fixture)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ocracle_ray.stages.splits import (SPLIT_BOUNDS, assign_split,
                                       leaky_group_count, split_ppm,
                                       split_stats)

KNUTH = 2654435761


def _ref_ppm(doc_id: int) -> int:
    h1 = ((doc_id % 2**31) * KNUTH) % 2**32
    h2 = ((h1 % 2**31) * KNUTH) % 2**32
    return h2 % 1_000_000


def _ref_split(doc_id: int) -> str:
    p = _ref_ppm(doc_id)
    for label, bound in SPLIT_BOUNDS:
        if p < bound:
            return label
    raise AssertionError


def test_split_hash_matches_reference():
    ids = np.array([0, 1, 2, 7, 2**31 - 1, 2**31, 2**40 + 13, 999_999_937],
                   dtype=np.int64)
    got = split_ppm(ids)
    want = [_ref_ppm(int(i)) for i in ids]
    assert got.tolist() == want
    assert assign_split(ids).tolist() == [_ref_split(int(i)) for i in ids]


def test_split_fractions_roughly_90_5_5():
    ids = np.arange(20_000, dtype=np.int64)
    labels = assign_split(ids)
    frac = pd.Series(labels).value_counts(normalize=True)
    assert abs(frac["train"] - 0.90) < 0.01
    assert abs(frac["valid"] - 0.05) < 0.005
    assert abs(frac["test"] - 0.05) < 0.005


def _mk_docs(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    })).repartition(3)


def _ids_for(split: str, n: int, start: int = 0):
    out, i = [], start
    while len(out) < n:
        if _ref_split(i) == split:
            out.append(i)
        i += 1
    return out


def test_leakage_audit(ray_session):
    tr = _ids_for("train", 4)
    va = _ids_for("valid", 2)
    te = _ids_for("test", 2)
    rows = [
        # group A: duplicate text entirely inside train — NOT leaky
        (tr[0], "en", "alpha  beta"),
        (tr[1], "en", "Alpha beta"),          # same after normalize
        # group B: train + valid — leaky
        (tr[2], "en", "gamma delta"),
        (va[0], "de", "GAMMA   DELTA "),      # same after normalize+trim
        # group C: valid + test + train — leaky (counted once)
        (va[1], "fr", "epsilon"),
        (te[0], "fr", "epsilon"),
        (tr[3], "fr", " Epsilon"),
        # singletons
        (te[1], "en", "zeta eta"),
    ]
    ds = _mk_docs(rows)
    assert leaky_group_count(ds) == 2

    stats = split_stats(ds)
    # counts partition the corpus
    assert int(stats["n_docs"].sum()) == len(rows)
    ref = pd.Series([_ref_split(r[0]) for r in rows]).value_counts()
    got = stats.groupby("split")["n_docs"].sum()
    for s, n in ref.items():
        assert int(got[s]) == int(n)
    # token counts: lowercase [a-z0-9]+ runs
    en_train = stats[(stats["lang"] == "en") & (stats["split"] == "train")]
    # en∩train = tr[0], tr[1], tr[2] → alpha beta ×2 + gamma delta
    assert int(en_train["n_tokens"].iloc[0]) == 6


def test_no_leak_when_dups_stay_in_one_split(ray_session):
    tr = _ids_for("train", 3)
    rows = [(i, "en", "same text") for i in tr]
    assert leaky_group_count(_mk_docs(rows)) == 0
