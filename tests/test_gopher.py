"""Gopher repetition signals (stages/gopher.py) vs a pure-Python
reference, on fixtures engineered to separate the two signals:
degenerate phrase repetition, short docs, empty docs."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa

from ocracle_ray.stages.gopher import repetition_by_lang


def _toks(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _ref_doc(text):
    toks = _toks(text)
    tc = sum(len(t) for t in toks)
    big = 0.0
    if len(toks) >= 2 and tc:
        c = Counter(zip(toks, toks[1:]))
        # max count, tie-break smallest \x01-joined key
        (w1, w2), n = min(c.items(), key=lambda kv: (-kv[1], kv[0][0] + "\x01" + kv[0][1]))
        big = n * (len(w1) + len(w2)) / tc
    dup5 = 0.0
    grams = list(zip(*(toks[i:] for i in range(5))))
    if grams:
        dup5 = 1.0 - len(set(grams)) / len(grams)
    return big, dup5


def test_repetition_matches_reference(ray_session):
    import ray.data as rd

    docs = [
        ("en", "buy now buy now buy now buy now limited offer"),
        ("en", "the quick brown fox jumps over the lazy dog again and again"),
        ("en", "spam spam spam spam spam spam spam spam spam spam"),
        ("nb", "a b c d e a b c d e a b c d e a b c d e"),
        ("nb", "one two"),          # < 5 tokens: dup5 = 0
        ("nb", "single"),           # < 2 tokens: both 0
        ("zh", ""),                 # empty: both 0, still counted
        ("zh", ";;; !!!"),          # punctuation-only
        ("zh", "xx yy xx yy zz xx yy"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "lang": [d[0] for d in docs],
                "text": [d[1] for d in docs],
            }
        )
    ).repartition(3)
    out = repetition_by_lang(ds)
    for lang in ("en", "nb", "zh"):
        rows = [_ref_doc(t) for lg, t in docs if lg == lang]
        exp_big = round(sum(r[0] for r in rows) / len(rows), 4)
        exp_dup = round(sum(r[1] for r in rows) / len(rows), 4)
        got = out[out["lang"] == lang].iloc[0]
        assert got["n_docs"] == len(rows)
        assert abs(got["avg_top_bigram_char_frac"] - exp_big) < 1e-9, lang
        assert abs(got["avg_dup_5gram_frac"] - exp_dup) < 1e-9, lang
    # sanity: the spam doc family scores high, normal prose low
    en = out[out["lang"] == "en"].iloc[0]
    assert en["avg_top_bigram_char_frac"] > 0.3
    assert en["avg_dup_5gram_frac"] > 0.2


def test_tiny_batch_below_window_is_total():
    """A batch whose TOTAL token count is below the 5-gram window used
    to crash _shifted with a negative slice (found by the decontam
    stage reusing it); it must instead score zeros."""
    import pyarrow as pa

    from ocracle_ray.stages.gopher import _doc_gram_stats

    s = _doc_gram_stats(pa.array(["one two three"]))
    assert s["total5"].tolist() == [0]
    # bigrams "one two" (6 chars) and "two three" (8) tie at count 1;
    # smallest-key tie-break picks "one two" -> cover 6
    assert s["top_cover"].tolist() == [6.0]


def test_tiny_batch_bigram_cover_value():
    import pyarrow as pa

    from ocracle_ray.stages.gopher import _doc_gram_stats

    s = _doc_gram_stats(pa.array(["aa bb aa bb"]))
    # bigrams: aa|bb x2, bb|aa x1 -> top is "aa bb" covering 2*(2+2)=8
    assert s["top_cover"].tolist() == [8.0]
