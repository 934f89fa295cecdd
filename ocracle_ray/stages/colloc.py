"""PMI collocation extraction — the phrase-mining op (Church & Hanks
1990): rank adjacent-token pairs by pointwise mutual information
computed over the bigram event space, so "new york"-style fixed
phrases outrank chance co-occurrences of frequent words. Upstream use
in a training-data pipeline: phrase vocabularies for tokenizer
pre-merge lists and stopword-phrase filters.

The event space is the BIGRAM table itself: P(a,·) = a's count as a
left element, P(·,b) = b's count as a right element, P(a,b) = the pair
count — all three derive from ONE corpus pass of in-Arrow-grouped
bigram partials (stages/ngram_lm.py's `_batch_bigrams`, BOS rows
dropped), so the SQL oracle re-derives the entire contingency table
relationally with no second tokenization pass.

Scale shape: the corpus pass is the only data-sized stage; the bigram
aggregate stream-folds on the driver behind the SAME loud guard as the
perplexity model (MAX_VOCAB_BIGRAMS — a vocabulary too big to fold is
the signal to prune by count in a shuffle first, a different op), and
scoring/ranking are vocab-sized numpy work. PMI floats follow the
repo's parity rule: the exact SQL expression shape
(n·N as double / cl·cr as double, ln, round to 6) BEFORE ranking, ties
on (term_a, term_b) ASC.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ..core.textstats import round_half_away
from .ngram_lm import BOS, MAX_VOCAB_BIGRAMS, _batch_bigrams


def collocations(ds, *, k: int = 10, min_count: int = 5,
                 text_col: str = "text") -> pd.DataFrame:
    """Top-k PMI collocations: (rk, term_a, term_b, n_pair, pmi)."""
    part_ds = ds.map_batches(
        lambda t: _batch_bigrams(t[text_col]), batch_format="pyarrow"
    )
    counts: dict[tuple[str, str], int] = {}
    for block in part_ds.iter_batches(batch_size=None,
                                      batch_format="pyarrow"):
        for p, q, n in zip(block["prev"].to_pylist(),
                           block["tok"].to_pylist(),
                           block["n"].to_pylist()):
            if p == BOS:
                continue
            key = (p, q)
            counts[key] = counts.get(key, 0) + n
        if len(counts) > MAX_VOCAB_BIGRAMS:
            raise ValueError(
                f"collocations: bigram table exceeded "
                f"MAX_VOCAB_BIGRAMS={MAX_VOCAB_BIGRAMS}; prune by "
                f"count in a distributed pass first"
            )
    if not counts:
        return pd.DataFrame(columns=["rk", "term_a", "term_b",
                                     "n_pair", "pmi"])
    total = sum(counts.values())
    left: dict[str, int] = {}
    right: dict[str, int] = {}
    for (a, b), n in counts.items():
        left[a] = left.get(a, 0) + n
        right[b] = right.get(b, 0) + n
    rows = []
    for (a, b), n in counts.items():
        if n < min_count:
            continue
        # EXACT oracle expression shape: (n·N as double)/(cl·cr as
        # double), ln, round-6 — see ORACLE_SQL["docs_collocations"]
        pmi = math.log((float(n) * float(total))
                       / (float(left[a]) * float(right[b])))
        rows.append((a, b, n, pmi))
    if not rows:
        return pd.DataFrame(columns=["rk", "term_a", "term_b",
                                     "n_pair", "pmi"])
    out = pd.DataFrame(rows, columns=["term_a", "term_b", "n_pair", "pmi"])
    out["pmi"] = round_half_away(out["pmi"].to_numpy(), 6)
    out = out.sort_values(["pmi", "term_a", "term_b"],
                          ascending=[False, True, True]).head(k)
    out.insert(0, "rk", np.arange(1, len(out) + 1, dtype=np.int64))
    out["n_pair"] = out["n_pair"].astype("int64")
    return out.reset_index(drop=True)
