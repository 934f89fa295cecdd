"""Composite filter funnel (stages/funnel.py): per-gate attribution vs
a pure-Python reference implementing the same five gates in the same
order, fixtures engineered so EVERY gate fires at least once, and the
partition invariant (outcome counts sum to n_docs)."""

import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa

from ocracle_ray.stages.funnel import (
    GATES,
    MAX_PPL,
    MAX_TOP_BIGRAM_FRAC,
    MIN_QUALITY,
    MIN_TOKENS,
    filter_funnel_by_lang,
)


def _toks(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _reference(docs):
    """(doc_id, lang, text) -> {doc_id: outcome}, the same gates."""
    from ocracle_ray.core.textstats import (
        fingerprint,
        quality_score,
    )

    # dup winners
    by_fp = {}
    for i, _l, t in docs:
        fp = fingerprint(t)
        by_fp.setdefault(fp, []).append(i)
    dup = {i for ids in by_fp.values() if len(ids) > 1 for i in ids[1:]
           } | {i for ids in by_fp.values() if len(ids) > 1
                for i in [min(ids)] if False}
    # bigram model (self-fit, BOS per doc)
    bg, ctx = Counter(), Counter()
    for _i, _l, t in docs:
        tk = _toks(t)
        for p, w in zip(["\x02"] + tk[:-1], tk):
            bg[(p, w)] += 1
            ctx[p] += 1
    v1 = len({w for _p, w in bg}) + 1
    out = {}
    for i, _l, t in docs:
        tk = _toks(t)
        if i in dup:
            out[i] = "dup"
            continue
        if len(tk) < MIN_TOKENS:
            out[i] = "short"
            continue
        if quality_score(t) < MIN_QUALITY:
            out[i] = "quality"
            continue
        lp = sum(
            math.log((bg[(p, w)] + 0.5) / (ctx[p] + 0.5 * v1))
            for p, w in zip(["\x02"] + tk[:-1], tk)
        )
        if round(math.exp(-lp / len(tk)), 6) > MAX_PPL:
            out[i] = "ppl"
            continue
        tc = sum(len(x) for x in tk)
        c = Counter(zip(tk, tk[1:]))
        (w1, w2), n = min(
            c.items(), key=lambda kv: (-kv[1], kv[0][0] + "\x01" + kv[0][1])
        )
        if n * (len(w1) + len(w2)) / tc > MAX_TOP_BIGRAM_FRAC:
            out[i] = "repetition"
            continue
        out[i] = "kept"
    return out


def _corpus():
    # a base of well-formed prose sharing vocabulary (low ppl, low rep)
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    # each non-base doc adds 6 unique filler words: a big vocabulary V
    # is what pushes an all-unseen-bigram doc's add-k ppl past MAX_PPL
    docs = [
        (i, "en", base) if i == 0
        else (i, "en", base + " " + " ".join(f"w{i}a{j}" for j in range(6)))
        for i in range(8)
    ]
    nid = 100
    docs.append((nid, "en", base))              # exact dup of doc 0
    docs.append((101, "nb", "one two three"))   # short
    docs.append((102, "nb", "a b c d e f g h i j k l"))  # low quality
    # unique-vocab doc: every bigram near-unseen -> high ppl (needs the
    # corpus vocab above to push V up); words shaped to pass quality
    docs.append((103, "nb", " ".join(f"qq{i}xx{i * 7}" for i in range(14))))
    # degenerate repetition, but high quality + low ppl
    docs.append((104, "zh", "buy now " * 30 + "please"))
    docs.append((105, "zh", ""))                # empty -> short
    return docs


def test_conflicted_winners_lane_parity(ray_session, monkeypatch):
    """Driver stream-fold vs the distributed conflicted-only groupby
    (forced by a tiny DUP_MAP_LIMIT) return identical winner maps, and
    the funnel output is byte-identical across lanes."""
    import ray.data as rd

    from ocracle_ray.stages import funnel as fmod

    docs = _corpus()
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "lang": [d[1] for d in docs],
                "text": [d[2] for d in docs],
            }
        )
    ).repartition(4)
    fast = fmod.conflicted_winners(ds)
    monkeypatch.setattr(fmod, "DUP_MAP_LIMIT", 3)
    slow = fmod.conflicted_winners(ds)
    assert fast == slow and len(fast) == 1  # exactly the base-text dup
    out = filter_funnel_by_lang(ds)
    monkeypatch.undo()
    assert out.equals(filter_funnel_by_lang(ds))


def test_funnel_matches_reference(ray_session):
    import ray.data as rd

    docs = _corpus()
    ref = _reference(docs)
    # the fixtures exercise every gate
    assert set(ref.values()) == set(GATES) | {"kept"}, Counter(ref.values())
    assert ref[100] == "dup" and ref[101] == "short"
    assert ref[102] == "quality" and ref[103] == "ppl"
    assert ref[104] == "repetition" and ref[105] == "short"

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "lang": [d[1] for d in docs],
                "text": [d[2] for d in docs],
            }
        )
    ).repartition(4)
    out = filter_funnel_by_lang(ds)
    exp = {}
    for i, lang, _t in docs:
        exp.setdefault(lang, Counter())[ref[i]] += 1
    assert list(out["lang"]) == sorted(exp)
    for _, row in out.iterrows():
        c = exp[row["lang"]]
        assert row["n_docs"] == sum(c.values())
        assert row["n_kept"] == c["kept"]
        for g in GATES:
            assert row[f"n_{g}"] == c[g], (row["lang"], g)
        # partition invariant
        assert row["n_kept"] + sum(row[f"n_{g}"] for g in GATES) == row["n_docs"]
