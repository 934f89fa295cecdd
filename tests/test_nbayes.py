"""Naive Bayes classifier (stages/nbayes.py): separable engineered
corpus pinning training counts, prediction, the smallest-class
tie-break, and the feature guard — against a pure-Python reference."""

import math

import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages import nbayes


def _ds(rows):
    return rd.from_arrow(pa.table({
        "lang": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


ROWS = [
    ("cats", "meow purr whiskers meow"),
    ("cats", "purr meow nap whiskers"),
    ("dogs", "woof bark fetch woof"),
    ("dogs", "bark woof tail fetch"),
]


def test_train_counts_and_prediction(ray_session):
    ds = _ds(ROWS)
    model = nbayes.nb_train(ds)
    assert model["classes"] == ["cats", "dogs"]
    assert model["doc_counts"] == [2, 2]
    # vocab: meow purr whiskers nap woof bark fetch tail = 8
    assert model["vocab_size"] == 8
    cat = dict(zip(model["tok"]["cats"], model["n"]["cats"]))
    assert cat == {"meow": 3, "purr": 2, "whiskers": 2, "nap": 1}

    out = nbayes.nb_confusion(ds, model)
    # self-classification is perfect on a separable corpus
    assert dict(
        zip(zip(out["lang"], out["pred_lang"]), out["n_docs"])
    ) == {("cats", "cats"): 2, ("dogs", "dogs"): 2}

    # pin one score against a hand computation: doc "meow purr
    # whiskers meow" under class cats
    tot_c = 8.0  # cats token total
    v = 8.0
    lp = (math.log(0.5)
          + 2 * math.log((3 + 1) / (tot_c + v))
          + math.log((2 + 1) / (tot_c + v))
          + math.log((2 + 1) / (tot_c + v)))
    got = out[(out["lang"] == "cats")]["avg_score"].iloc[0]
    # avg over the two cat docs; second doc has same count profile
    # (meow x1 purr x1 nap x1 whiskers x1):
    lp2 = (math.log(0.5)
           + math.log((3 + 1) / (tot_c + v))
           + math.log((2 + 1) / (tot_c + v))
           + math.log((1 + 1) / (tot_c + v))
           + math.log((2 + 1) / (tot_c + v)))
    want = round((round(lp, 6) + round(lp2, 6)) / 2, 4)
    assert got == pytest.approx(want, abs=1e-4)


def test_unseen_tokens_and_tie_break(ray_session):
    ds = _ds(ROWS)
    model = nbayes.nb_train(ds)
    # a doc of only unseen tokens: equal priors and equal totals ->
    # identical scores -> smallest class wins
    test = _ds([("dogs", "zebra quagga")])
    out = nbayes.nb_confusion(test, model)
    assert list(out["pred_lang"]) == ["cats"]


def test_zero_token_doc_gets_prior_argmax(ray_session):
    rows = ROWS + [("cats", "third cat doc meow")]  # cats prior larger
    model = nbayes.nb_train(_ds(rows))
    out = nbayes.nb_confusion(_ds([("dogs", "!!! ???")]), model)
    assert list(out["pred_lang"]) == ["cats"]


def test_feature_guard_is_loud(ray_session, monkeypatch):
    monkeypatch.setattr(nbayes, "MAX_NB_FEATURES", 3)
    with pytest.raises(ValueError, match="MAX_NB_FEATURES"):
        nbayes.nb_train(_ds(ROWS))
