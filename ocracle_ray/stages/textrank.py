"""TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
the adjacent-token co-occurrence graph, per lang — the unsupervised
keyword ranker (docs_top_terms' log-odds ranking needs contrasting
slices; TextRank ranks WITHIN one slice by graph centrality).

Exactness design: the power iteration runs in FIXED-POINT INTEGER
arithmetic so the DuckDB oracle can re-execute every iteration
bit-for-bit (the stages/bpe.py generated-unrolled-SQL precedent —
float PageRank would accumulate summation-order noise across
iterations that no end rounding can hide). Ranks are int64 scaled by
SCALE=1e6; one update is

    r'(v) = (1-d)*SCALE  +  (85 * SUM_u floor(w_uv * r(u) / W_u)) // 100

with floor division at exactly those two points on BOTH sides (numpy
int64 ``//`` == DuckDB ``//`` on positive ints). d = 0.85, the
canonical damping. The final score column IS the fixed-point integer —
no float ever exists, so the oracle match is exact equality.

Scale shape: ONE corpus pass emits per-batch in-Arrow-grouped
(lang, a, b) adjacency partials (canonical undirected pairs, self
loops dropped, BOS pairs dropped) into a single distributed groupby;
the power iteration then runs on the AGGREGATE edge list — vocabulary-
squared-sparse, corpus-size-independent — on the driver, guarded LOUD
at TEXTRANK_EDGE_LIMIT (a web-scale vocabulary graph needs a
distributed contraction loop — a different op; the guard makes that
boundary explicit instead of OOMing). Tokenization = lowercase
[a-z0-9]+ runs, shared verbatim with the oracle (stages/bm25.py rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .ngram_lm import BOS, _doc_token_stream

TEXTRANK_EDGE_LIMIT = 2_000_000
SCALE = 1_000_000
D_NUM, D_DEN = 85, 100
BASE = (D_DEN - D_NUM) * SCALE // D_DEN  # (1-d)*SCALE = 150000 exactly


def _edge_partial(t: pa.Table, lang_col: str, text_col: str) -> pa.Table:
    parents, prev, tok = _doc_token_stream(t[text_col])
    if len(tok) == 0:
        return pa.table({"lang": pa.array([], pa.string()),
                         "a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "w": pa.array([], pa.int64())})
    langs = t[lang_col].combine_chunks().take(pa.array(parents))
    keep = pc.and_(pc.not_equal(prev, BOS), pc.not_equal(prev, tok))
    p, q, lg = prev.filter(keep), tok.filter(keep), langs.filter(keep)
    lt = pc.less(p, q)
    g = (
        pa.table({"lang": lg, "a": pc.if_else(lt, p, q),
                  "b": pc.if_else(lt, q, p)})
        .group_by(["lang", "a", "b"])
        .aggregate([("a", "count")])
    )
    return g.rename_columns(["lang", "a", "b", "w"])


def textrank_terms(ds, *, n_iters: int = 8, k: int = 5,
                   lang_col: str = "lang",
                   text_col: str = "text") -> pd.DataFrame:
    """Top-k terms per lang by fixed-point TextRank score.

    Returns (lang, rk, term, score_fp) with score_fp the exact int64
    fixed-point rank after ``n_iters`` damped iterations.
    """
    from ray.data.aggregate import Sum

    edges_ds = (
        ds.map_batches(lambda t: _edge_partial(t, lang_col, text_col),
                       batch_format="pyarrow")
        .groupby(["lang", "a", "b"])
        .aggregate(Sum("w", alias_name="w"))
        .materialize()
    )
    n_edges = edges_ds.count()
    if n_edges > TEXTRANK_EDGE_LIMIT:
        raise ValueError(
            f"textrank_terms: {n_edges} co-occurrence edges exceed "
            f"TEXTRANK_EDGE_LIMIT={TEXTRANK_EDGE_LIMIT}; a vocabulary "
            f"graph this size needs a distributed PageRank loop, not a "
            f"driver fold"
        )
    ed = edges_ds.to_pandas()

    out_rows = []
    for lang, g in ed.groupby("lang"):
        # directed edge arrays, both directions of each undirected edge
        terms, codes_ab = np.unique(
            np.concatenate([g["a"].to_numpy(), g["b"].to_numpy()]),
            return_inverse=True,
        )
        n = len(g)
        src = np.concatenate([codes_ab[:n], codes_ab[n:]])
        dst = np.concatenate([codes_ab[n:], codes_ab[:n]])
        w = np.tile(g["w"].to_numpy().astype(np.int64), 2)
        wu = np.zeros(len(terms), np.int64)
        np.add.at(wu, src, w)
        r = np.full(len(terms), SCALE, np.int64)
        for _ in range(n_iters):
            contrib = (w * r[src]) // wu[src]
            s = np.zeros(len(terms), np.int64)
            np.add.at(s, dst, contrib)
            r = BASE + (D_NUM * s) // D_DEN
        order = np.lexsort((terms, -r))[:k]
        for rk, i in enumerate(order, 1):
            out_rows.append((lang, rk, terms[i], int(r[i])))
    out = pd.DataFrame(out_rows, columns=["lang", "rk", "term", "score_fp"])
    out["rk"] = out["rk"].astype("int64")
    out["score_fp"] = out["score_fp"].astype("int64")
    return out.sort_values(["lang", "rk"]).reset_index(drop=True)


def textrank_oracle_sql(n_iters: int = 8, k: int = 5) -> str:
    """Generated unrolled DuckDB mirror: rebuilds the co-occurrence
    graph from raw text and re-executes every fixed-point iteration
    with the identical integer expression (``//`` floor division)."""
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(f"""
        r{i} AS (
            SELECT e.lang, e.dst AS node,
                   ({BASE} + ({D_NUM} * sum((e.w * r.r) // d.wu))
                    // {D_DEN})::BIGINT AS r
            FROM edges e
            JOIN r{i - 1} r ON r.lang = e.lang AND r.node = e.src
            JOIN deg d ON d.lang = e.lang AND d.node = e.src
            GROUP BY e.lang, e.dst
        )""")
    return f"""
        -- TextRank: fixed-point integer PageRank over the adjacent-
        -- token graph, every iteration re-executed (floor division at
        -- the engine's exact two points); tokenization = lowercase
        -- [a-z0-9]+ runs (stages/textrank.py)
        WITH docs AS (
            SELECT doc_id, lang,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> '') AS arr
            FROM documents
        ),
        toks AS (
            SELECT doc_id, lang, unnest(arr) AS tok,
                   unnest(range(1, len(arr) + 1)) AS pos
            FROM docs WHERE len(arr) > 0
        ),
        pairs AS (
            SELECT lang, tok,
                   lag(tok) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS prev
            FROM toks
        ),
        cp AS (
            SELECT lang, least(prev, tok) AS a, greatest(prev, tok) AS b
            FROM pairs WHERE prev IS NOT NULL AND prev <> tok
        ),
        ew AS (SELECT lang, a, b, count(*)::BIGINT AS w
               FROM cp GROUP BY lang, a, b),
        edges AS (
            SELECT lang, a AS src, b AS dst, w FROM ew
            UNION ALL
            SELECT lang, b AS src, a AS dst, w FROM ew
        ),
        deg AS (SELECT lang, src AS node, sum(w)::BIGINT AS wu
                FROM edges GROUP BY lang, src),
        r0 AS (SELECT lang, node, {SCALE}::BIGINT AS r FROM deg),
        {",".join(iters)},
        ranked AS (
            SELECT lang, node AS term, r AS score_fp,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY r DESC, node) AS rk
            FROM r{n_iters}
        )
        SELECT lang, rk, term, score_fp
        FROM ranked WHERE rk <= {k} ORDER BY lang, rk
    """
