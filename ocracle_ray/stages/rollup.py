"""Hierarchical rollup aggregate — every prefix level of a key list
(SQL ``GROUP BY ROLLUP``) computed from ONE pass over the data.

The scale rule: aggregate the DATA once at the finest grain (per-batch
combiners + driver fold — the finest result is small by definition of
"aggregate"), then derive every coarser level from the finest RESULT,
never from a second scan. With integer measures (cents — the
``stages/running.py`` rule) the derivation is exact at every level, so
the engine's level-from-level sums and the oracle's level-from-raw-rows
ROLLUP agree bit-for-bit with no float-order caveat.

Rolled-up key positions carry the ``'(all)'`` sentinel (the SQL side
coalesces its ROLLUP NULLs to the same token; a genuinely-null data key
would need a distinct sentinel — guarded loud)."""

from __future__ import annotations

import pandas as pd

ALL = "(all)"


def rollup_agg(prepped_ds, keys: list[str], cents_col: str = "cents"):
    """``prepped_ds``: a Dataset already mapped to (keys..., cents).
    Returns one frame with len(keys)+1 prefix levels: (k1..kn),
    (k1..kn-1, '(all)'), ..., ('(all)', ...)."""
    from ..pipelines.queries import driver_grouped_agg

    finest = driver_grouped_agg(
        prepped_ds,
        keys,
        {"n_events": (cents_col, "count"), "total_cents": (cents_col, "sum")},
    )
    for k in keys:
        if finest[k].isna().any():
            raise ValueError(
                f"rollup_agg: null values in key column {k!r} would "
                f"collide with the {ALL!r} sentinel; map them to a "
                "distinct token first"
            )
    finest["n_events"] = finest["n_events"].astype("int64")
    finest["total_cents"] = finest["total_cents"].astype("int64")

    levels = [finest]
    for k in range(len(keys) - 1, -1, -1):
        head = list(keys[:k])
        if head:
            g = finest.groupby(head, as_index=False)[
                ["n_events", "total_cents"]
            ].sum()
        else:
            g = pd.DataFrame(
                {
                    "n_events": [int(finest["n_events"].sum())],
                    "total_cents": [int(finest["total_cents"].sum())],
                }
            )
        for missing in keys[k:]:
            g[missing] = ALL
        levels.append(g[list(keys) + ["n_events", "total_cents"]])

    out = pd.concat(levels, ignore_index=True)
    out["n_events"] = out["n_events"].astype("int64")
    out["total_cents"] = out["total_cents"].astype("int64")
    return out.sort_values(list(keys)).reset_index(drop=True)
