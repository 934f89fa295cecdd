"""PMI collocations (stages/colloc.py): fixed-phrase ranking, the
min-count floor, and the bigram-table guard."""

import math

import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages import colloc


def _ds(texts, nparts=3):
    return rd.from_arrow(pa.table({
        "text": pa.array(texts, pa.string()),
    })).repartition(nparts)


def test_fixed_phrase_outranks_chance(ray_session):
    # "new york" always adjacent; "the"+X pairs frequent but diffuse
    docs = ["we flew to new york %d times the trip the cost the fun" % i
            for i in range(8)]
    out = colloc.collocations(_ds(docs), k=10, min_count=5)
    by_pair = out.set_index(["term_a", "term_b"])
    # the fixed phrase scores strictly above the diffuse "the"+X pairs
    assert (by_pair.loc[("new", "york"), "pmi"]
            > by_pair.loc[("the", "cost"), "pmi"])
    assert int(by_pair.loc[("new", "york"), "n_pair"]) == 8
    # top rank holds the maximal PMI tier
    assert out.loc[0, "pmi"] == out["pmi"].max()


def test_pmi_value_exact(ray_session):
    docs = ["a b"] * 6  # only bigram: (a,b) n=6, N=6, cl=6, cr=6
    out = colloc.collocations(_ds(docs, 2), k=5, min_count=5)
    assert len(out) == 1
    assert out.loc[0, "pmi"] == round(math.log((6.0 * 6.0) / (6.0 * 6.0)), 6)


def test_min_count_floor(ray_session):
    docs = ["x y"] * 4 + ["p q"] * 5
    out = colloc.collocations(_ds(docs), k=10, min_count=5)
    assert set(zip(out["term_a"], out["term_b"])) == {("p", "q")}


def test_bigram_guard(ray_session, monkeypatch):
    monkeypatch.setattr(colloc, "MAX_VOCAB_BIGRAMS", 3)
    docs = ["alpha beta gamma delta epsilon zeta eta theta"]
    with pytest.raises(ValueError, match="MAX_VOCAB_BIGRAMS"):
        colloc.collocations(_ds(docs), k=3, min_count=1)
