"""Group-characterizing keyword extraction — add-1-smoothed log-odds
rate ratio per (lang, term), the "Fightin' Words" family (Monroe et
al. 2008, uninformative prior; c-TF-IDF's presence-based idf is
DEGENERATE on a corpus whose slices share one vocabulary — every df
equals n_langs — while rate ratios rank by OVER-representation and
stay informative):

    score(l, w) = ln( ((tf + 1) / (T_l + V))
                    / ((TF_w - tf + 1) / (G - T_l + V)) )

with tf = count of w in lang l, T_l = lang token total, TF_w = corpus
count of w, G = corpus token total, V = vocabulary size. Only terms
OCCURRING in the lang are ranked (documented rule, mirrored by the
oracle's tf table which contains present pairs only).

Scale shape: ONE corpus pass emits per-batch Arrow-grouped (lang,
term) count partials into a single pre-combined groupby; everything
downstream runs on the AGGREGATE (vocab × n_langs rows,
corpus-independent): T_l/G fold on the driver (lang count rows), V is
a distributed groupby-count scalar, per-term scoring rides
groupby(term).map_groups with groups ≤ n_langs rows by construction,
and top-k per lang is per-batch candidates + a tiny driver resolve
(the top_orders_by_revenue pattern — no per-lang group
materialization).

Scores round to 6 BEFORE ranking on both sides (the stages/nbayes.py
rule) so float noise can never flip a rank against the SQL oracle;
ties break on term ASC.
"""

from __future__ import annotations

import math

import pandas as pd
import pyarrow as pa

from ..core.textstats import round_half_away
from .ngram_lm import _doc_token_stream


def top_terms_by_lang(ds, *, k: int = 5, lang_col: str = "lang",
                      text_col: str = "text") -> pd.DataFrame:
    from ray.data.aggregate import Count, Sum

    from ..pipelines.queries import driver_grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        parents, _prev, tok = _doc_token_stream(t[text_col])
        langs = t[lang_col].combine_chunks().take(pa.array(parents))
        g = (
            pa.table({"lang": langs, "term": tok})
            .group_by(["lang", "term"])
            .aggregate([("term", "count")])
        )
        return g.rename_columns(["lang", "term", "cnt"])

    lt = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .aggregate(Sum("cnt", alias_name="tf"))
        .materialize()  # three consumers below; staged boundary on purpose
    )
    tl_df = driver_grouped_agg(lt, ["lang"], {"tl": ("tf", "sum")})
    t_lang = dict(zip(tl_df["lang"], tl_df["tl"].astype(int)))
    g_total = int(sum(t_lang.values()))
    v_vocab = int(lt.groupby("term").aggregate(Count(alias_name="df")).count())

    def score_term(g: pd.DataFrame) -> pd.DataFrame:
        # one group per term; rows = langs containing it (<= n_langs)
        tw = int(g["tf"].sum())
        g = g.copy()
        scores = []
        for lang, tf in zip(g["lang"], g["tf"]):
            tl = t_lang[lang]
            rate_in = (int(tf) + 1) / (tl + v_vocab)
            rate_out = (tw - int(tf) + 1) / (g_total - tl + v_vocab)
            scores.append(math.log(rate_in / rate_out))
        g["score"] = round_half_away(scores, 6)
        return g

    scored = lt.groupby("term").map_groups(score_term, batch_format="pandas")

    def candidates(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.sort_values(["lang", "score", "term"],
                          ascending=[True, False, True])
            .groupby("lang", as_index=False)
            .head(k)
        )

    cand = scored.map_batches(candidates, batch_format="pandas").to_pandas()
    out = (
        cand.sort_values(["lang", "score", "term"],
                         ascending=[True, False, True])
        .groupby("lang", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["rk"] = out.groupby("lang").cumcount() + 1
    out["tf"] = out["tf"].astype("int64")
    out["rk"] = out["rk"].astype("int64")
    return out[["lang", "rk", "term", "tf", "score"]]
