"""BPE merge discovery — the tokenizer-training pass of an LLM data
pipeline (Sennrich et al. 2016; what sentencepiece/HF-tokenizers run).

BPE trains on the WORD-FREQUENCY dictionary, not the raw corpus: the
corpus-scale part is exactly one streaming pass folding per-batch
(word, count) partials (the stages/ngram_lm.py shape, loud-guarded at
``MAX_BPE_VOCAB`` — the natural-language vocabulary is the long tail
at 100 TB, and a bigger dict needs a count-shuffle pruning pass, a
different op). Training itself then runs on the folded dictionary —
closed-form greedy rounds, cheap by construction (vocabulary-sized),
and exactly reproducible:

- words are the shared stages/bm25.py tokens; symbols start as single
  characters; no end-of-word marker (documented deviation from the
  paper's </w>, irrelevant for merge RANKS within words);
- each round counts adjacent symbol pairs weighted by word frequency,
  merges the (count DESC, pair ASC) winner in every word
  left-to-right non-overlapping, and records (rank, left, right,
  support);
- ties and the left-to-right rule are pinned against the DuckDB
  oracle, which re-derives the word counts AND re-executes every
  round in SQL (rounds unrolled by a generator — replace() on
  space-joined symbols is exactly the left-to-right non-overlapping
  merge rule).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .ngram_lm import _doc_token_stream

MAX_BPE_VOCAB = 2_000_000  # loud ceiling on the driver-folded word dict


def word_counts(ds, *, text_col: str = "text") -> dict[str, int]:
    """Pass 1: the corpus word-frequency dictionary via per-batch
    Arrow group_by partials, stream-folded behind the loud guard."""

    def partial(t: pa.Table) -> pa.Table:
        _parents, _prev, tok = _doc_token_stream(t[text_col])
        g = pa.table({"w": tok}).group_by(["w"]).aggregate([("w", "count")])
        return g.rename_columns(["w", "n"])

    merged: dict[str, int] = {}
    for bt in ds.map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for w, n in zip(bt["w"].to_pylist(), bt["n"].to_pylist()):
            merged[w] = merged.get(w, 0) + n
        if len(merged) > MAX_BPE_VOCAB:
            raise ValueError(
                f"word dictionary exceeds MAX_BPE_VOCAB={MAX_BPE_VOCAB}: "
                "prune with a distributed count-shuffle pass first "
                "(different op)"
            )
    return merged


def _merge_word(syms: tuple[str, ...], left: str,
                right: str) -> tuple[str, ...]:
    """Left-to-right non-overlapping merge of (left, right) in one
    word — the published BPE application rule."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_merges(counts: dict[str, int], n_merges: int) -> pd.DataFrame:
    """Greedy BPE rounds over the word dict: ``(rank, lft, rgt,
    merged, support)`` rows (lft/rgt, not left/right — SQL keywords),
    ``support`` = weighted pair count at merge time. Stops early when
    no pair remains (tiny corpora)."""
    words = {tuple(w): int(n) for w, n in counts.items() if w}
    rows = []
    for rank in range(1, n_merges + 1):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, n in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        # max count, tie-break lexicographically smallest (left, right)
        (left, right), support = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        rows.append(
            {"rank": rank, "lft": left, "rgt": right,
             "merged": left + right, "support": int(support)}
        )
        words = {
            _merge_word(syms, left, right): n
            for syms, n in words.items()
        }
    df = pd.DataFrame(
        rows, columns=["rank", "lft", "rgt", "merged", "support"]
    )
    if len(df):
        df = df.astype({"rank": "int64", "support": "int64"})
    return df


def bpe_apply(words, merges: pd.DataFrame) -> dict[str, int]:
    """The ENCODE side of BPE: apply a shipped ranked merge table to a
    word vocabulary, returning word → token count. Runs once per
    DISTINCT word (vocabulary-sized, like training itself) — per-doc
    encoding then reduces to a broadcast dict probe, never a per-doc
    merge loop."""
    ranked = list(zip(merges["lft"], merges["rgt"]))
    out: dict[str, int] = {}
    for w in words:
        if not w:
            continue
        syms = tuple(w)
        for left, right in ranked:
            if len(syms) == 1:
                break
            syms = _merge_word(syms, left, right)
        out[w] = len(syms)
    return out


def bpe_encode_stats(ds, word_ntok: dict[str, int], *,
                     lang_col: str = "lang", text_col: str = "text"):
    """One streaming map pass: per-doc BPE token counts via broadcast
    word→ntok probes (``pc.index_in`` against the ray.put value-set —
    the stages/ngram_lm.py scoring shape), folded to per-lang
    (n_docs, n_word_chars, n_bpe_tokens) on the driver. A token absent
    from the map raises loud (the map must come from the same corpus,
    or encoding needs an UNK rule — a semantic choice, not a default)."""
    import numpy as np
    import ray

    from ..pipelines.queries import driver_grouped_agg

    keys = pa.array(list(word_ntok.keys()), pa.string())
    vals = np.fromiter(word_ntok.values(), np.int64, len(word_ntok))
    ref = ray.put((keys, vals))

    def stats(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..broadcast import cached_get

        k, v = cached_get(ref)
        parents, _prev, tok = _doc_token_stream(t[text_col])
        idx = pc.index_in(tok, value_set=k)
        if idx.null_count:
            raise ValueError(
                "bpe_encode_stats: token missing from the vocab map "
                "(encode needs an UNK rule for out-of-corpus words)"
            )
        ntok = v[idx.to_numpy(zero_copy_only=False)]
        chars = pc.utf8_length(tok).to_numpy(zero_copy_only=False)
        n_docs = len(t)
        bpe_doc = np.bincount(parents, weights=ntok, minlength=n_docs)
        chr_doc = np.bincount(parents, weights=chars, minlength=n_docs)
        return pa.table(
            {
                "lang": t[lang_col],
                "n_bpe": pa.array(bpe_doc.astype(np.int64), pa.int64()),
                "n_chars": pa.array(chr_doc.astype(np.int64), pa.int64()),
            }
        )

    out = driver_grouped_agg(
        ds.map_batches(stats, batch_format="pyarrow"),
        ["lang"],
        {
            "n_docs": ("n_bpe", "count"),
            "n_word_chars": ("n_chars", "sum"),
            "n_bpe_tokens": ("n_bpe", "sum"),
        },
    )
    for c in ("n_word_chars", "n_bpe_tokens"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


def bpe_oracle_sql(n_merges: int) -> str:
    """Generated DuckDB mirror: word counts from the raw documents,
    then ``n_merges`` unrolled rounds — pair counts via lead() over the
    split symbol stream, the (count DESC, pair ASC) winner, and a
    string ``replace`` as the left-to-right non-overlapping merge.

    Symbols are joined by TWO spaces and the replace pattern carries
    single-space edges: a single-space join would let one match consume
    the delimiter the next adjacent match needs (' a b a b ' merges
    only once), while with double separators ' a  b ' resumes exactly
    one space into the following double gap, so back-to-back pairs all
    merge — byte-for-byte the engine's rule (tested on aaaa/abab
    words)."""
    parts = _bpe_chain_parts(n_merges)
    selects = " UNION ALL ".join(
        f"SELECT rank, l AS lft, r AS rgt, l || r AS merged, support "
        f"FROM m{r}" for r in range(1, n_merges + 1)
    )
    parts.append(f"\n        {selects} ORDER BY rank")
    return "".join(parts)


def bpe_encode_oracle_sql(n_merges: int) -> str:
    """Generated DuckDB mirror of the ENCODE pass: the same unrolled
    merge chain (carrying each word key through every round), then the
    final per-word symbol count joined back onto the raw documents'
    token stream for per-lang totals."""
    parts = _bpe_chain_parts(n_merges)
    parts.append(f""",
        vocab AS (
            SELECT w, len(str_split(s, '  '))::BIGINT AS ntok
            FROM v{n_merges}
        ),
        docw AS (
            SELECT lang, unnest(list_filter(
                regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                x -> x <> '')) AS w
            FROM documents
        ),
        per_lang AS (
            SELECT d.lang, sum(v.ntok)::BIGINT AS n_bpe_tokens,
                   sum(length(d.w))::BIGINT AS n_word_chars
            FROM docw d JOIN vocab v USING (w) GROUP BY d.lang
        ),
        nd AS (SELECT lang, count(*) AS n_docs FROM documents
               GROUP BY lang)
        SELECT nd.lang, nd.n_docs,
               coalesce(per_lang.n_word_chars, 0)::BIGINT AS n_word_chars,
               coalesce(per_lang.n_bpe_tokens, 0)::BIGINT AS n_bpe_tokens
        FROM nd LEFT JOIN per_lang USING (lang) ORDER BY nd.lang
    """)
    return "".join(parts)


def _bpe_chain_parts(n_merges: int) -> list[str]:
    """The shared unrolled CTE chain: wc0 (word counts), v0..vN (word
    key + double-space symbol string + count per round), m1..mN (the
    round's winning merge). v_r carries ``w`` so consumers can map
    final symbol states back to words; m_r ignores it."""
    parts = ["""
        WITH wc0 AS (
            SELECT w, count(*)::BIGINT AS n FROM (
                SELECT unnest(list_filter(
                    regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                    x -> x <> '')) AS w
                FROM documents
            ) GROUP BY w
        ),
        -- symbols joined by DOUBLE spaces; single chars to start
        v0 AS (
            SELECT w,
                   array_to_string(
                       list_transform(range(1, length(w) + 1),
                                      i -> w[i]), '  ') AS s,
                   n
            FROM wc0
        )"""]
    for r in range(1, n_merges + 1):
        prev = f"v{r - 1}"
        parts.append(f""",
        p{r} AS (
            SELECT sym AS l, lead(sym) OVER
                       (PARTITION BY rid ORDER BY pos) AS r,
                   n
            FROM (
                SELECT rid, n, unnest(syms) AS sym,
                       unnest(range(1, len(syms) + 1)) AS pos
                FROM (
                    SELECT row_number() OVER () AS rid, n,
                           str_split(s, '  ') AS syms
                    FROM {prev}
                )
            )
        ),
        m{r} AS (
            SELECT l, r, sum(n)::BIGINT AS support, {r}::BIGINT AS rank
            FROM p{r} WHERE r IS NOT NULL
            GROUP BY l, r ORDER BY support DESC, l, r LIMIT 1
        ),
        v{r} AS (
            SELECT v.w,
                   trim(replace(' ' || v.s || ' ',
                                ' ' || m.l || '  ' || m.r || ' ',
                                ' ' || m.l || m.r || ' ')) AS s,
                   v.n
            FROM {prev} v, m{r} m
        )""")
    return parts
