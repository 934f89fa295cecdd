"""First-order Markov transition matrix over per-user event sequences
— the session-modeling aggregate (what follows a click?) and the
second consumer of ``stages.pagerank.consecutive_pairs``' exact
sort-plus-seam pair builder (directed, self-transitions kept: a
click→click loop is real signal here, unlike a PageRank self-edge).

Scale shape: the pair build is one sort + O(blocks) seam rows; the
matrix itself is state-space-sized (|states|² rows), so counting is
per-batch in-Arrow-grouped partials folded by ``driver_grouped_agg``
(guarded). Probabilities are integer ppm with floor division —
``(n * 1e6) // row_total`` — shared verbatim with the SQL mirror, so
the matrix matches by exact integer equality (the mixture/splits ppm
rule; no float normalization to drift).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .pagerank import consecutive_pairs


def transition_matrix(ds, *, group_col: str, order_cols: list[str],
                      item_col: str) -> pd.DataFrame:
    """(prev_state, next_state, n_trans, p_ppm) per observed directed
    transition, ordered by (prev_state, next_state)."""
    from ..pipelines.queries import driver_grouped_agg

    pairs = consecutive_pairs(ds, group_col=group_col,
                              order_cols=order_cols, item_col=item_col)

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "p" not in t.column_names:
            return pa.table({"p": pa.array([], pa.string()),
                             "q": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = t.group_by(["p", "q"]).aggregate([("p", "count")])
        return g.rename_columns(["p", "q", "n"])

    agg = driver_grouped_agg(
        pairs.map_batches(combine, batch_format="pyarrow"),
        ["p", "q"], {"n_trans": ("n", "sum")},
    )
    if agg.empty:
        return pd.DataFrame(columns=["prev_state", "next_state",
                                     "n_trans", "p_ppm"])
    agg = agg.rename(columns={"p": "prev_state", "q": "next_state"})
    agg["n_trans"] = agg["n_trans"].astype("int64")
    totals = agg.groupby("prev_state")["n_trans"].transform("sum")
    agg["p_ppm"] = (agg["n_trans"] * 1_000_000) // totals
    agg["p_ppm"] = agg["p_ppm"].astype("int64")
    return agg.sort_values(["prev_state", "next_state"]).reset_index(
        drop=True)
