"""Log-odds keyword extraction (stages/tfidf.py): engineered
lang-specific vocabulary (the sf corpus shares one vocab, so the
over-representation semantics need their own fixture) + a pure-Python
reference model."""

import math

import pyarrow as pa
import ray.data as rd

from ocracle_ray.stages.tfidf import top_terms_by_lang


def _ds(rows, parts=3):
    return rd.from_arrow(pa.table({
        "lang": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })).repartition(parts)


def _ref(rows, k):
    tf, tl, tw = {}, {}, {}
    for lang, text in rows:
        import re
        for w in re.split(r"[^a-z0-9]+", text.lower()):
            if not w:
                continue
            tf[(lang, w)] = tf.get((lang, w), 0) + 1
            tl[lang] = tl.get(lang, 0) + 1
            tw[w] = tw.get(w, 0) + 1
    g, v = sum(tl.values()), len(tw)
    scored = [
        (lang, w, n,
         round(math.log(((n + 1) / (tl[lang] + v))
                        / ((tw[w] - n + 1) / (g - tl[lang] + v))), 6))
        for (lang, w), n in tf.items()
    ]
    out = {}
    for lang in tl:
        rows_l = sorted(
            [s for s in scored if s[0] == lang],
            key=lambda s: (-s[3], s[1]),
        )[:k]
        out[lang] = [(w, n, sc) for _, w, n, sc in rows_l]
    return out


def test_lang_specific_term_ranks_first(ray_session):
    rows = [
        ("en", "shared words here plus unicorn unicorn unicorn"),
        ("en", "shared words here again"),
        ("de", "shared words here plus zeppelin zeppelin"),
        ("de", "shared words here"),
    ]
    out = top_terms_by_lang(_ds(rows), k=3)
    en = out[out["lang"] == "en"]
    de = out[out["lang"] == "de"]
    assert en.iloc[0]["term"] == "unicorn"
    assert de.iloc[0]["term"] == "zeppelin"
    ref = _ref(rows, 3)
    for lang, grp in out.groupby("lang"):
        got = list(zip(grp["term"], grp["tf"].astype(int),
                       grp["score"].astype(float)))
        assert got == ref[lang], lang


def test_rank_is_dense_and_scores_sorted(ray_session):
    rows = [("en", "a b c a b a"), ("de", "c c d d e")]
    out = top_terms_by_lang(_ds(rows, parts=2), k=10)
    for _, grp in out.groupby("lang"):
        assert list(grp["rk"]) == list(range(1, len(grp) + 1))
        assert list(grp["score"]) == sorted(grp["score"], reverse=True)
