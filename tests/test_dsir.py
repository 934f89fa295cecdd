"""stages.dsir — the vectorized FNV kernel vs the scalar reference,
and engineered-corpus discrimination semantics (the sf corpus is
random-soup degenerate: target and raw unigram distributions coincide,
so the driver oracle can't see the sign of the weights)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ocracle_ray.core.textstats import fnv1a64
from ocracle_ray.stages.dsir import (
    N_BUCKETS,
    DsirScorer,
    dsir_bucket_counts,
    dsir_lambda,
    dsir_score_by_lang,
    fnv1a64_bucket_vec,
)

TOKENS = ["a", "abc", "vector", "0", "zz9", "x" * 40, "merge", "abc"]


def test_vectorized_fnv_matches_scalar():
    got = fnv1a64_bucket_vec(pa.array(TOKENS), N_BUCKETS)
    want = [fnv1a64(t.encode()) % N_BUCKETS for t in TOKENS]
    assert got.tolist() == want


def test_vectorized_fnv_sliced_array():
    """Array offsets (a sliced batch) must not shift the byte view."""
    arr = pa.array(["pad1", "pad2"] + TOKENS).slice(2)
    got = fnv1a64_bucket_vec(arr, N_BUCKETS)
    want = [fnv1a64(t.encode()) % N_BUCKETS for t in TOKENS]
    assert got.tolist() == want


# add-1 smoothing over the bucket space means discrimination needs
# counts comparable to the bucket count — production uses 4096 over a
# web corpus; the engineered fixture shrinks the space instead
NB_TEST = 16


def _corpus():
    # target (en) speaks alpha/beta; raw others speak gamma/delta;
    # doc 6 is an es doc written in the target dialect -> the one
    # DSIR is built to surface (positive weight, wrong-lang source)
    rows = [
        (0, "alpha beta alpha beta " * 25, "en"),
        (1, "alpha alpha beta " * 25, "en"),
        (2, "beta alpha " * 25, "en"),
        (3, "gamma delta gamma " * 25, "es"),
        (4, "delta gamma delta delta " * 25, "es"),
        (5, "gamma gamma delta " * 25, "de"),
        (6, "alpha beta beta " * 25, "es"),
        (7, "", "de"),  # empty doc: logw = 0, counted, not positive
    ]
    return rows, rd.from_pandas(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    ).repartition(3)


def _reference(rows):
    ct = np.zeros(NB_TEST)
    cr = np.zeros(NB_TEST)
    for _i, text, lang in rows:
        for tok in text.split():
            b = fnv1a64(tok.encode()) % NB_TEST
            cr[b] += 1
            if lang == "en":
                ct[b] += 1
    lam = np.log((ct + 1) / (ct.sum() + NB_TEST)) - np.log(
        (cr + 1) / (cr.sum() + NB_TEST)
    )
    out = {}
    for _i, text, lang in rows:
        w = round(
            sum(lam[fnv1a64(t.encode()) % NB_TEST] for t in text.split()),
            6,
        )
        out.setdefault(lang, []).append(w)
    return lam, out


def test_engineered_corpus_discriminates(ray_session):
    rows, ds = _corpus()
    model = dsir_bucket_counts(ds, n_buckets=NB_TEST)
    lam = dsir_lambda(model)
    ref_lam, ref_w = _reference(rows)
    np.testing.assert_allclose(lam, ref_lam, atol=1e-12)

    got = dsir_score_by_lang(ds, lam, n_buckets=NB_TEST)
    for lang, weights in ref_w.items():
        row = got[got["lang"] == lang].iloc[0]
        assert row["n_docs"] == len(weights)
        assert row["avg_logw"] == round(sum(weights) / len(weights), 4)
        assert row["n_pos"] == sum(w > 0 for w in weights)
    # the semantics DSIR exists for: every target-dialect doc scores
    # positive (incl. the es doc written in it), off-dialect negative
    assert got.set_index("lang").loc["en", "n_pos"] == 3
    assert got.set_index("lang").loc["es", "n_pos"] == 1  # doc 6
    assert got.set_index("lang").loc["de", "n_pos"] == 0


def test_scorer_empty_doc_rounds_to_zero(ray_session):
    lam = np.full(N_BUCKETS, -1.0)
    import ray

    scorer = DsirScorer(ray.put(lam))
    out = scorer(pa.table({"text": ["", "alpha"], "lang": ["en", "en"]}))
    w = out["logw"].to_pylist()
    assert w[0] == 0.0 and w[1] == -1.0
