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
            SELECT array_to_string(
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
            SELECT trim(replace(' ' || v.s || ' ',
                                ' ' || m.l || '  ' || m.r || ' ',
                                ' ' || m.l || m.r || ' ')) AS s,
                   v.n
            FROM {prev} v, m{r} m
        )""")
    selects = " UNION ALL ".join(
        f"SELECT rank, l AS lft, r AS rgt, l || r AS merged, support "
        f"FROM m{r}" for r in range(1, n_merges + 1)
    )
    parts.append(f"\n        {selects} ORDER BY rank")
    return "".join(parts)
