"""Bigram-LM perplexity (stages/ngram_lm.py): model counts and scores
vs a pure-Python reference, the empty-doc rule, and the model-size
guard."""

import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from ocracle_ray.stages import ngram_lm
from ocracle_ray.stages.ngram_lm import (
    BOS,
    bigram_counts,
    perplexity_by_lang,
)


def _toks(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _docs(n=50, seed=9):
    rng = np.random.RandomState(seed)
    vocab = ["dup", "vector", "merge", "scan", "row", "hash"]
    texts = [
        " ".join(rng.choice(vocab, rng.randint(0, 25))) for i in range(n)
    ]
    texts[7] = ""  # zero-token doc: excluded from n_docs/avg
    texts[8] = ";;; !!!"  # punctuation-only: also zero tokens
    langs = [("nb", "en", "nn")[i % 3] for i in range(n)]
    return langs, texts


def _reference(langs, texts, k=0.5):
    bg = Counter()
    for t in texts:
        toks = _toks(t)
        for p, w in zip([BOS] + toks[:-1], toks):
            bg[(p, w)] += 1
    ctx = Counter()
    for (p, _w), n in bg.items():
        ctx[p] += n
    v1 = len({w for _p, w in bg}) + 1
    per_lang = {}
    for lang, t in zip(langs, texts):
        toks = _toks(t)
        if not toks:
            continue
        lp = sum(
            math.log((bg[(p, w)] + k) / (ctx[p] + k * v1))
            for p, w in zip([BOS] + toks[:-1], toks)
        )
        per_lang.setdefault(lang, []).append(math.exp(-lp / len(toks)))
    return {
        lang: (len(v), round(sum(v) / len(v), 4))
        for lang, v in per_lang.items()
    }


def test_bigram_model_and_scores_match_reference(ray_session):
    import ray.data as rd

    langs, texts = _docs()
    ds = rd.from_arrow(
        pa.table({"lang": langs, "text": texts})
    ).repartition(4)
    model = bigram_counts(ds)
    # model counts == the reference counter
    ref_bg = Counter()
    for t in texts:
        toks = _toks(t)
        for p, w in zip([BOS] + toks[:-1], toks):
            ref_bg[(p, w)] += 1
    got_bg = {
        tuple(key.split("\x01")): n
        for key, n in zip(model["bg_keys"], model["bg_n"])
    }
    assert got_bg == dict(ref_bg)
    assert model["vocab_size"] == len({w for _p, w in ref_bg})

    out = perplexity_by_lang(ds, model)
    ref = _reference(langs, texts)
    assert list(out["lang"]) == sorted(ref)
    for _, row in out.iterrows():
        n_docs, avg = ref[row["lang"]]
        assert row["n_docs"] == n_docs
        assert abs(row["avg_ppl"] - avg) < 1e-9, row["lang"]


def test_model_size_guard(ray_session, monkeypatch):
    import ray.data as rd

    monkeypatch.setattr(ngram_lm, "MAX_VOCAB_BIGRAMS", 3)
    ds = rd.from_items(
        [{"lang": "en", "text": "a b c d e f"}]
    )
    with pytest.raises(ValueError, match="MAX_VOCAB_BIGRAMS"):
        bigram_counts(ds)


def test_pruned_trainer_min_count_1_equals_driver_fold(ray_session):
    """min_count=1 prunes nothing — the shuffle path must produce the
    SAME model (as a set; block order differs) and identical scores."""
    import ray.data as rd

    from ocracle_ray.stages.ngram_lm import bigram_counts_pruned

    langs, texts = _docs()
    ds = rd.from_arrow(
        pa.table({"lang": langs, "text": texts})
    ).repartition(4)
    base = bigram_counts(ds)
    pruned = bigram_counts_pruned(ds, min_count=1)
    assert dict(zip(pruned["bg_keys"], pruned["bg_n"])) == dict(
        zip(base["bg_keys"], base["bg_n"])
    )
    assert dict(zip(pruned["ctx_keys"], pruned["ctx_n"])) == dict(
        zip(base["ctx_keys"], base["ctx_n"])
    )
    assert pruned["vocab_size"] == base["vocab_size"]
    a = perplexity_by_lang(ds, base)
    b = perplexity_by_lang(ds, pruned)
    assert a.equals(b)


def test_pruned_trainer_semantics(ray_session):
    """Hand corpus: pruning drops count-1 bigrams from the numerator
    set but keeps FULL context/vocab counts."""
    import ray.data as rd

    from ocracle_ray.stages.ngram_lm import bigram_counts_pruned

    ds = rd.from_items(
        [
            {"lang": "en", "text": "a b a b"},
            {"lang": "en", "text": "a c"},
        ]
    ).repartition(2)
    m = bigram_counts_pruned(ds, min_count=2)
    got = dict(zip(m["bg_keys"], m["bg_n"]))
    # full counts: (BOS,a)=2 (a,b)=2 (b,a)=1 (a,c)=1 -> pruned keeps 2s
    assert got == {BOS + "\x01a": 2, "a\x01b": 2}
    ctx = dict(zip(m["ctx_keys"], m["ctx_n"]))
    assert ctx == {BOS: 2, "a": 3, "b": 1}  # FULL totals survive pruning
    assert m["vocab_size"] == 3  # {a, b, c} — c counted though pruned


def test_pruned_survivor_guard(ray_session, monkeypatch):
    import ray.data as rd

    from ocracle_ray.stages import ngram_lm as mod

    monkeypatch.setattr(mod, "PRUNED_BG_LIMIT", 2)
    ds = rd.from_items([{"lang": "en", "text": "a b c d e a b c d e"}])
    with pytest.raises(ValueError, match="PRUNED_BG_LIMIT"):
        mod.bigram_counts_pruned(ds, min_count=1)
