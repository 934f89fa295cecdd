"""Character-entropy quality gate — the compression-ratio proxy.

CCNet / RedPajama-style corpus filters use a compressibility signal to
drop degenerate pages (binary soup scores high-entropy, keyboard-mash
and template spam score low). zlib ratios aren't oracle-expressible;
their exact information-theoretic core is: per-doc Shannon entropy over
raw codepoints, H = ln L − (Σ c·ln c)/L nats.

Scale shape: ONE streaming pass, zero shuffle. The per-batch kernel is
fully vectorized — codepoints via one UTF-32 reinterpretation of the
batch's joined text, per-(doc, codepoint) counts via one ``np.unique``
over packed ``doc<<21 | cp`` keys (codepoints < 2^21 by Unicode), the
per-doc Σ c·ln c via ``np.add.reduceat``. Only per-lang integer
partials (n_docs, Σ micro-nats) leave the worker; the driver folds
O(batches · langs) rows.

Parity rule: per-doc entropy rounds half-away to INTEGER MICRO-NATS at
exactly one documented point (``floor(h·1e6 + 0.5)``, h ≥ 0), so the
per-lang sums are exact int64 on both sides — the DuckDB oracle
re-derives every count and both aggregate columns by integer equality
(the events_decayed_revenue fixed-point precedent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Unicode codepoints are < 0x110000 < 2^21: the packed (doc, cp) key
# is collision-free for any batch under 2^42 rows.
_CP_BITS = 21


def char_entropy_micro(texts: list[str]) -> np.ndarray:
    """Per-doc Shannon codepoint entropy in integer micro-nats
    (half-away rounding; empty docs are 0). Vectorized across the
    whole list — no per-doc Python beyond the one join."""
    n = len(texts)
    if n == 0:
        return np.zeros(0, np.int64)
    lens = np.array([len(s) for s in texts], np.int64)
    joined = "".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), np.uint32).astype(np.int64)
    doc = np.repeat(np.arange(n, dtype=np.int64), lens)
    uniq, counts = np.unique((doc << _CP_BITS) | cp, return_counts=True)
    d = uniq >> _CP_BITS
    sums = np.zeros(n, np.float64)
    if len(uniq):
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        sums[d[starts]] = np.add.reduceat(
            counts * np.log(counts), starts)
    lf = lens.astype(np.float64)
    safe = np.maximum(lf, 1.0)
    h = np.where(lens > 0, np.log(safe) - sums / safe, 0.0)
    # one documented rounding point: h >= 0 (up to fp dust), half-away
    return np.floor(h * 1e6 + 0.5).astype(np.int64)


def char_entropy_by_lang(ds, *, text_col: str = "text",
                         lang_col: str = "lang") -> pd.DataFrame:
    """Per-lang ``(n_docs, sum_ent_micro, mean_ent_micro)`` — exact
    integer micro-nat aggregates of the per-doc codepoint entropy."""

    def partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        em = char_entropy_micro(
            [s if s is not None else "" for s in texts.to_pylist()])
        g = pa.table({
            "lang": t[lang_col],
            "em": pa.array(em, pa.int64()),
        }).group_by(["lang"]).aggregate([("em", "sum"), ("em", "count")])
        return g.rename_columns(["lang", "sum_em", "n_docs"])

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("lang", as_index=False).agg(
        sum_em=("sum_em", "sum"), n_docs=("n_docs", "sum"))
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_ent_micro"] = out["sum_em"].astype("int64")
    out["mean_ent_micro"] = (
        out["sum_ent_micro"] // out["n_docs"]).astype("int64")
    return (out[["lang", "n_docs", "sum_ent_micro", "mean_ent_micro"]]
            .sort_values("lang").reset_index(drop=True))
