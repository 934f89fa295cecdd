"""Driver-checkable query surface: Ray pipelines + DuckDB oracle SQL.

Each ``q_*`` function takes ``sf_dir`` (e.g. ``/root/testdata/sf0.01``)
and returns a small result (Dataset/pandas/Arrow). ``ORACLE_SQL`` holds
the ANSI-SQL equivalent DuckDB runs on the same parquet views; column
names match EXACTLY (the driver hashes values after sorting columns by
name). Aggregates over doubles are rounded on BOTH sides so float
summation order can't flip the hash.

Operator coverage mapping (SURVEY.md §2): groupby aggregates (G2/G6/
G10), broadcast small-side joins (J1/J4), numeric-aware sort (G5),
exact dedup (G4), filters/projections (M-family scalar kernels),
windowed/sessionized event aggregates and top-k (engine addenda),
brute-force cosine kNN over embeddings (similarity-search addendum).
"""

from __future__ import annotations

import os

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..core.assemble import task_sort_key
from ..core.textstats import normalize_for_fingerprint


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _lookup_int64(keys: np.ndarray, mapping: dict) -> np.ndarray:
    """Vectorized per-row int64 lookup of a driver-side broadcast map,
    failing LOUD on any key absent from the map (ADVICE r4: the
    np.empty fill pattern would silently read uninitialized memory if a
    group ever missed the map)."""
    out = np.full(len(keys), np.iinfo(np.int64).min, np.int64)
    hit = np.zeros(len(keys), bool)
    for k, v in mapping.items():
        m = keys == k
        out[m] = v
        hit |= m
    if not hit.all():
        missing = sorted(set(np.asarray(keys)[~hit].tolist()))[:5]
        raise KeyError(f"group keys missing from driver map: {missing}")
    return out


def _lookup_float64(keys: np.ndarray, mapping: dict) -> np.ndarray:
    """Float twin of :func:`_lookup_int64` — NaN sentinel + loud
    KeyError on any key absent from the driver-side map."""
    out = np.full(len(keys), np.nan, np.float64)
    hit = np.zeros(len(keys), bool)
    for k, v in mapping.items():
        m = keys == k
        out[m] = v
        hit |= m
    if not hit.all():
        missing = sorted(set(np.asarray(keys)[~hit].tolist()))[:5]
        raise KeyError(f"group keys missing from driver map: {missing}")
    return out


def driver_grouped_agg(ds, group_cols: list[str], named_aggs: dict, *,
                       batch_format: str = "pyarrow",
                       max_partial_rows: int = 2_000_000):
    """LOW-CARDINALITY grouped aggregate: per-batch pandas partials,
    folded on the driver — no distributed shuffle at all.

    The sort-based groupby's fixed shuffle latency (~3-7 s/session)
    dwarfs these tiny-result aggregates; partials are ≤ n_groups rows
    per block, so the driver folds KBs. Only for group keys with SMALL
    cardinality (correctness is unaffected, driver memory is O(groups ×
    blocks)); high-cardinality keys keep the real shuffle
    (e.g. top_orders_by_revenue, exact dedup).

    Determinism: partial rows are sorted by (group keys, values) before
    the final fold so float addition order never depends on block
    arrival order.

    ``named_aggs``: out_col -> (in_col, how) with how ∈
    'sum'|'count'|'count_nonnull'|'max'|'min' — 'count' counts ROWS
    (SQL COUNT(*)), 'count_nonnull' counts non-null values (COUNT(col),
    the AVG divisor).

    Null group keys are KEPT (``dropna=False``) to match SQL GROUP BY
    and the distributed groupby this replaces.

    Guard-don't-hope: the stream ABORTS past ``max_partial_rows``
    (default 2M) — a silently-mistaken high-cardinality key must fail
    loudly with the fix named (use the distributed groupby), never
    flood the driver.

    Deliberately NOT tree-merged (unlike the sketch passes and the
    quantile histogram): float partials are summed in ONE globally
    sorted order, which keeps outputs byte-identical across block
    layouts and parallelism levels; a tree fold would make float
    addition order depend on which blocks coalesce together. Integer
    and sketch folds are exact under any tree shape, so they do
    tree-merge.
    """
    _ARROW_HOW = {"sum": "sum", "count_nonnull": "count",
                  "max": "max", "min": "min"}

    def partial(t) -> pa.Table:
        # Arrow-native per-batch combiner (VERDICT r4 wrong#3: the
        # pandas hop here measured 3-4 s at sf0.1 on the identical
        # dup_winner_map pattern). use_threads=False so in-block float
        # accumulation order is fixed — byte-identical partials across
        # runs; this pyarrow puts the group keys FIRST, aggregates
        # after, in the order given.
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t, preserve_index=False)
        aggs = [(([] if how == "count" else col),
                 ("count_all" if how == "count" else _ARROW_HOW[how]))
                for out, (col, how) in named_aggs.items()]
        g = t.group_by(group_cols, use_threads=False).aggregate(aggs)
        return g.rename_columns(group_cols + list(named_aggs))

    parts = []
    n_partial = 0
    for b in ds.map_batches(partial, batch_format=batch_format).iter_batches(
        batch_format="pandas", batch_size=65536
    ):
        n_partial += len(b)
        if n_partial > max_partial_rows:
            raise RuntimeError(
                f"driver_grouped_agg: partial rows exceeded "
                f"{max_partial_rows} — the group key's cardinality is "
                f"too high for the driver-fold path; use the "
                f"distributed groupby().aggregate() instead"
            )
        parts.append(b)
    if not parts:
        return pd.DataFrame(columns=group_cols + list(named_aggs))
    allp = pd.concat(parts, ignore_index=True)
    allp = allp.sort_values(group_cols + list(named_aggs)).reset_index(drop=True)
    final = {
        out: (out, "sum" if how in ("count", "count_nonnull") else how)
        for out, (col, how) in named_aggs.items()
    }
    return allp.groupby(group_cols, as_index=False, dropna=False).agg(**final)


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(_p(sf_dir, table), columns=columns)


def _topk_batch(t: pa.Table, sort_keys, k: int) -> pa.Table:
    """Arrow-native per-batch top-k (VERDICT r3 wrong#4: no pandas
    round trip per batch): ``sort_keys`` as for ``pc.sort_indices``."""
    return t.take(pc.sort_indices(t, sort_keys=sort_keys)[:k])


def _group_first_batch(t: pa.Table, group_col: str, sort_keys) -> pa.Table:
    """Arrow-native per-batch argmax/argmin: the first row per
    ``group_col`` under ``sort_keys`` (adjacent-diff over the sorted
    group column — no per-group Python, no pandas)."""
    order = pc.sort_indices(
        t, sort_keys=[(group_col, "ascending")] + list(sort_keys)
    )
    s = t.take(order)
    if s.num_rows == 0:
        return s
    g = s[group_col]
    neq = pc.not_equal(g.slice(1), g.slice(0, len(g) - 1)).to_numpy(
        zero_copy_only=False
    )
    first = np.flatnonzero(np.concatenate(([True], neq)))
    return s.take(pa.array(first, pa.int64()))


from ..broadcast import cached_get as _cached_broadcast  # noqa: E402


# --------------------------------------------------------------------------
# TPC-H-ish relational surface
# --------------------------------------------------------------------------

def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-style grouped aggregate: per-batch partials folded on
    the driver (6 groups — `driver_grouped_agg` low-cardinality path)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def add_disc(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("disc_price", disc)

    out = driver_grouped_agg(
        ds.map_batches(add_disc, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "sum_base_price": ("l_extendedprice", "sum"),
            "sum_disc_price": ("disc_price", "sum"),
            "count_order": ("l_quantity", "count"),
        },
    )
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        out[c] = out[c].round(2)
    return out


def q_order_priority_count(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderdate"])
    lo = pa.scalar(pd.Timestamp("1994-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))
    ds = ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi))
        ),
        batch_format="pyarrow",
    )
    return driver_grouped_agg(
        ds, ["o_orderpriority"], {"order_count": ("o_orderdate", "count")}
    )


def q_mktsegment_revenue(sf_dir: str):
    """Broadcast small-side hash join (J1 pattern): customer segment map
    shipped once via ray.put, looked up per batch — no shuffle join."""
    import ray

    cust = pd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    seg_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        seg = _cached_broadcast(seg_ref)  # unpickled once per worker
        df["c_mktsegment"] = df["o_custkey"].map(seg).fillna("UNKNOWN")
        return df[["c_mktsegment", "o_totalprice"]]

    out = driver_grouped_agg(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
            attach, batch_format="pandas"
        ),
        ["c_mktsegment"],
        {"revenue": ("o_totalprice", "sum"), "order_count": ("o_totalprice", "count")},
        batch_format="pandas",
    )
    out["revenue"] = out["revenue"].round(2)
    return out


def q_nation_region_counts(sf_dir: str):
    import ray

    region = pd.read_parquet(_p(sf_dir, "region"))
    rmap_ref = ray.put(dict(zip(region["r_regionkey"], region["r_name"])))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        rmap = _ray.get(rmap_ref)
        df["r_name"] = df["n_regionkey"].map(rmap)
        return df[["r_name"]]

    return driver_grouped_agg(
        _read(sf_dir, "nation", ["n_regionkey"]).map_batches(
            attach, batch_format="pandas"
        ),
        ["r_name"],
        {"nation_count": ("r_name", "count")},
        batch_format="pandas",
    )


def q_top_orders_by_revenue(sf_dir: str):
    """Top-10 orders by summed revenue. Primary lane (round 5, VERDICT
    r4 wrong#5): combiner-fed guarded DRIVER fold — lineitem rows
    cluster by orderkey, so per-block arrow group_by partials are
    ≈ one row per (order, block) and the fold is ~n_orders rows,
    skipping the ~5 s/session sort-shuffle floor the 150k-key groupby
    was paying. If the partial stream blows the guard (cardinality ≫
    expected — the 100-TB case), fall back to the distributed
    sort-groupby + per-batch top-k lane (stream-abort fallback, the
    extraction-dedup dispatch pattern)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def add_rev(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "revenue": rev})

    with_rev = ds.map_batches(add_rev, batch_format="pyarrow")
    try:
        g = driver_grouped_agg(with_rev, ["l_orderkey"],
                               {"revenue": ("revenue", "sum")},
                               max_partial_rows=4_000_000)
        cand = g
    except RuntimeError:
        from ray.data.aggregate import Sum

        def partial_rev(t: pa.Table) -> pa.Table:
            g = pa.TableGroupBy(t, "l_orderkey") \
                .aggregate([("revenue", "sum")])
            return g.rename_columns(["l_orderkey", "revenue"])

        grouped = (
            with_rev.map_batches(partial_rev, batch_format="pyarrow")
            .groupby("l_orderkey")
            .aggregate(Sum("revenue", alias_name="revenue"))
        )

        def batch_topk(t: pa.Table) -> pa.Table:
            # per-batch candidates: global top-10 ⊆ union of batch top-10s
            return _topk_batch(
                t, [("revenue", "descending"), ("l_orderkey", "ascending")], 10
            )

        cand = grouped.map_batches(batch_topk,
                                   batch_format="pyarrow").to_pandas()
    # key tiebreak mirrors the oracle's ORDER BY — float-sum ties at the
    # top-10 boundary must resolve identically on both sides
    out = (
        cand.sort_values(["revenue", "l_orderkey"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    out["revenue"] = out["revenue"].round(2)
    return out


def q_revenue_forecast(sf_dir: str):
    """TPC-H-Q6-style scan-filter-sum: one output row."""
    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"])
    lo = pa.scalar(pd.Timestamp("1994-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)),
            pc.and_(
                pc.and_(
                    pc.greater_equal(t["l_discount"], pa.scalar(0.02)),
                    pc.less_equal(t["l_discount"], pa.scalar(0.08)),
                ),
                pc.less(t["l_quantity"], pa.scalar(25.0)),
            ),
        )
        sub = t.filter(mask)
        rev = pc.sum(pc.multiply(sub["l_extendedprice"], sub["l_discount"])).as_py() or 0.0
        return pa.table({"revenue": pa.array([rev], pa.float64())})

    from ray.data.aggregate import Sum

    ds2 = ds.map_batches(partial, batch_format="pyarrow")
    total = ds2.aggregate(Sum("revenue", alias_name="revenue"))
    return pd.DataFrame({"revenue": [round(total["revenue"], 2)]})


def q_supplier_positive_acctbal(sf_dir: str):
    ds = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_acctbal"])
    out = ds.map_batches(
        lambda t: t.filter(pc.greater(t["s_acctbal"], pa.scalar(0.0))),
        batch_format="pyarrow",
    ).to_pandas()
    out["s_acctbal"] = out["s_acctbal"].round(2)
    return out


def q_part_brand_stats(sf_dir: str):
    out = driver_grouped_agg(
        _read(sf_dir, "part", ["p_brand", "p_retailprice", "p_size"]),
        ["p_brand"],
        {
            "part_count": ("p_retailprice", "count"),
            # AVG's divisor is the NON-NULL count (COUNT(col)), not rows
            "price_n": ("p_retailprice", "count_nonnull"),
            "sum_price": ("p_retailprice", "sum"),
            "max_size": ("p_size", "max"),
        },
    )
    out["avg_price"] = (out["sum_price"] / out["price_n"]).round(2)
    return out[["p_brand", "part_count", "avg_price", "max_size"]]


# --------------------------------------------------------------------------
# events: windowed aggregate, top-k, sessionization
# --------------------------------------------------------------------------

def q_events_hourly(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def add_hour(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table({"hour": hour, "event_type": t["event_type"], "value": t["value"]})

    out = driver_grouped_agg(
        ds.map_batches(add_hour, batch_format="pyarrow"),
        ["hour", "event_type"],
        {"n_events": ("value", "count"), "sum_value": ("value", "sum")},
    )
    out["sum_value"] = out["sum_value"].round(4)
    return out


def q_events_user_totals(sf_dir: str):
    from ray.data.aggregate import Sum

    # user_id cardinality scales with sf (unlike the fixed-cardinality
    # keys on the driver-fold path), so keep the distributed groupby:
    # per-batch partials -> shuffle -> per-batch top-k candidates ->
    # driver resolve (same shape as top_orders_by_revenue)
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["user_id", "value"]), "user_id"
        ).aggregate(
            # mode="all" = COUNT(*) row-count semantics, not non-null
            [("value", "sum"), ("value", "count", pc.CountOptions(mode="all"))]
        )  # -> [user_id, value_sum, value_count]
        return g.rename_columns(["user_id", "total_value", "n_events"])

    grouped = (
        _read(sf_dir, "events", ["user_id", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Sum("total_value", alias_name="total_value"),
            Sum("n_events", alias_name="n_events"),
        )
    )

    def batch_topk(t: pa.Table) -> pa.Table:
        return _topk_batch(
            t, [("total_value", "descending"), ("user_id", "ascending")], 10
        )

    cand = grouped.map_batches(batch_topk, batch_format="pyarrow").to_pandas()
    out = (
        cand.sort_values(["total_value", "user_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    out["total_value"] = out["total_value"].round(4)
    return out


def q_events_value_quantiles(sf_dir: str):
    """EXACT per-type p50/p95 via two-pass histogram-refinement
    selection (stages/quantile.py): histogram partials locate the
    buckets holding each order statistic, a pruned second pass pulls
    only those buckets' values (guarded). Replaces the per-group
    map_groups percentile whose 'one group fits a worker' assumption
    dies on a hot event_type (VERDICT r2 #3). Interpolation is numpy
    'linear' == DuckDB quantile_cont, so the oracle stays exact."""
    from ..stages.quantile import grouped_exact_quantiles

    ds = _read(sf_dir, "events", ["event_type", "value"])
    out = grouped_exact_quantiles(
        ds, "event_type", "value", probs=(0.5, 0.95), bin_width=1.0
    )
    out["p50"] = out["p50"].round(4)
    out["p95"] = out["p95"].round(4)
    return out.reset_index(drop=True)


def q_events_value_histogram(sf_dir: str):
    """Fixed-width value histogram (bucket = floor(value/50)*50) with
    per-batch partial counts before the tiny groupby."""

    ds = _read(sf_dir, "events", ["value"])

    def partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        v = t["value"].to_numpy(zero_copy_only=False)
        buckets = (_np.floor(v / 50.0) * 50.0).astype(_np.int64)
        uniq, counts = _np.unique(buckets, return_counts=True)
        return pa.table(
            {"bucket": pa.array(uniq, pa.int64()), "c": pa.array(counts, pa.int64())}
        )

    return driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["bucket"],
        {"n_events": ("c", "sum")},
    )


def q_events_sliding_1h(sf_dir: str):
    """SLIDING window (1 h width, 30 min slide): each event lands in
    exactly two windows — emitted per batch as (window_start, type)
    partials, folded on the driver. Oracle: UNION ALL of the two
    half-hour-aligned assignments."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    HALF_H = 1_800_000_000  # 30 min in µs

    def assign(t: pa.Table) -> pa.Table:
        # numpy floor_divide (pyarrow divide truncates toward zero,
        # which diverges from the oracle's date_trunc for pre-epoch ts)
        ts_np = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        w0_np = (ts_np // HALF_H) * HALF_H
        w0 = pa.array(w0_np, pa.int64())
        w1 = pa.array(w0_np - HALF_H, pa.int64())
        t0 = pa.table(
            {"window_start": w0.cast(pa.timestamp("us")),
             "event_type": t["event_type"], "value": t["value"]}
        )
        t1 = pa.table(
            {"window_start": w1.cast(pa.timestamp("us")),
             "event_type": t["event_type"], "value": t["value"]}
        )
        return pa.concat_tables([t0, t1])

    out = driver_grouped_agg(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["window_start", "event_type"],
        {"n_events": ("value", "count"), "sum_value": ("value", "sum")},
    )
    out["sum_value"] = out["sum_value"].round(4)
    return out


def q_events_running_sum(sf_dir: str):
    """Per-user running (cumulative) value sum in ts order — the window
    function surface, reworked scale-safe (VERDICT r2 #9 + #4):
    boundary-carry segments over a (user, ts, id)-sorted dataset, the
    per-event result written to PARTITIONED PARQUET (never through the
    driver), and the driver row is a per-user summary aggregated from
    the written files. Integer-cent arithmetic keeps engine == oracle
    exact; sum-of-prefix-sums is order-sensitive, so the summary still
    verifies the sort order."""
    import shutil
    import tempfile

    from ..stages.running import running_sum_to_parquet

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out_dir = tempfile.mkdtemp(prefix="running_sum_", dir="/tmp")
    try:
        out = running_sum_to_parquet(ds, out_dir)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return out.sort_values("user_id").reset_index(drop=True)


def q_events_argmax(sf_dir: str):
    """Arg-max per group: the event carrying each type's maximum value
    (per-batch candidates -> driver resolve; ties break on min
    event_id, mirrored in the oracle's row_number ordering)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def cand(t: pa.Table) -> pa.Table:
        return _group_first_batch(
            t, "event_type", [("value", "descending"), ("event_id", "ascending")]
        )

    c = ds.map_batches(cand, batch_format="pyarrow").to_pandas()
    out = (
        c.sort_values(["value", "event_id"], ascending=[False, True])
        .groupby("event_type", as_index=False)
        .head(1)
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return out[["event_type", "event_id", "value"]]


def q_events_sessions(sf_dir: str):
    """Sessionization (30-min inactivity gap) via BOUNDARY-CARRY
    repartition-sort (stages/sessions.py): sort by (user, ts), emit one
    segment row per (block, user), stitch segments in a groupby whose
    group size is bounded by the BLOCK count — no 'one user's events
    fit a group' assumption, so a bot user with 10^8 events cannot OOM
    a worker (VERDICT r2 #4)."""
    from ..stages.sessions import count_sessions

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return count_sessions(ds, "user_id", "ts").to_pandas()


# --------------------------------------------------------------------------
# documents: dedup, token/quality stats, numeric-aware sort
# --------------------------------------------------------------------------

def _add_tnorm(t: pa.Table) -> pa.Table:
    tnorm = pa.array(
        [normalize_for_fingerprint(x) for x in t["text"].to_pylist()], pa.string()
    )
    return t.append_column("tnorm", tnorm)


def q_docs_exact_dedup(sf_dir: str):
    """Exact dedup (G4 global form): hash-partition by normalized text,
    keep min(doc_id) per group + copy count."""
    from ray.data.aggregate import Count, Min

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return (
        ds.map_batches(_add_tnorm, batch_format="pyarrow")
        .groupby("tnorm")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies"))
        .drop_columns(["tnorm"])
        .to_pandas()
    )


def q_docs_dup_count(sf_dir: str):
    """Document-fingerprint dup stat: how many docs share their
    normalized text with another doc (single row)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    counts = (
        ds.map_batches(_add_tnorm, batch_format="pyarrow")
        .groupby("tnorm")
        .aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    n = int(counts.loc[counts["c"] > 1, "c"].sum())
    return pd.DataFrame({"n_dup_docs": [n]})


def q_docs_token_stats(sf_dir: str):
    """Per-lang token stats: whitespace tokens AND BPE-ish pre-tokenizer
    counts in ONE pass (registry consolidation, VERDICT r2 #1 — the old
    docs_bpe_tokens entry shared this read and group key).

    Counts are pyarrow ``count_substring_regex`` kernels (round 3): the
    old per-row ``len(x.split())`` / ``findall`` Python loops were the
    hot path of a full-corpus scan. RE2 is also what the DuckDB oracle
    runs, so engine and oracle now share regex SEMANTICS exactly
    (ASCII ``\\s``), not just the pattern text."""
    ds = _read(sf_dir, "documents", ["lang", "text", "n_chars"])

    def add_tokens(t: pa.Table) -> pa.Table:
        toks = pc.cast(
            pc.count_substring_regex(t["text"], r"[^ \t\n\r\f]+"), pa.int64()
        )
        bpe = pc.cast(
            pc.count_substring_regex(t["text"], r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"),
            pa.int64(),
        )
        return pa.table(
            {
                "lang": t["lang"],
                "n_tokens": toks,
                "n_chars": t["n_chars"],
                "n_bpe": bpe,
            }
        )

    return driver_grouped_agg(
        ds.map_batches(add_tokens, batch_format="pyarrow"),
        ["lang"],
        {
            "n_docs": ("n_tokens", "count"),
            "total_tokens": ("n_tokens", "sum"),
            "total_chars": ("n_chars", "sum"),
            "total_bpe_tokens": ("n_bpe", "sum"),
        },
    )


def q_docs_quality(sf_dir: str):
    """Quality scoring (SQL-mirrorable formula; see
    textstats.quality_score for the scalar reference implementation).
    Vectorized (round 3): all four signals are pyarrow/numpy kernels —
    token count and punctuation via RE2 ``count_substring_regex``
    (mean word length = non-whitespace chars / tokens, since split
    tokens partition exactly the non-whitespace characters)."""
    from ..core.textstats import quality_scores_vec

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def add_q(t: pa.Table) -> pa.Table:
        q = quality_scores_vec(t["text"])
        return pa.table({"lang": t["lang"], "q": pa.array(q, pa.float64())})

    out = driver_grouped_agg(
        ds.map_batches(add_q, batch_format="pyarrow"),
        ["lang"],
        {"sum_q": ("q", "sum"), "n_docs": ("q", "count")},
    )
    out["avg_quality"] = (out["sum_q"] / out["n_docs"]).round(4)
    return out[["lang", "n_docs", "avg_quality"]]


BM25_TERMS = ["dup", "vector", "merge", "window"]  # df spread: rare..common


def q_docs_bm25_topk(sf_dir: str):
    """BM25 keyword top-k over documents (stages.bm25): the
    retrieval-filtering op of a training-data pipeline. Two streaming
    passes, no shuffle: pass 1 folds one tiny per-batch partial row
    into (N, avgdl, per-term df); pass 2 scores against the broadcast
    constants and ships only a local top-k per batch. Tokenization is
    lowercase [a-z0-9]+ runs, chosen so the DuckDB oracle reproduces
    it verbatim with regexp_split_to_array."""
    from ..stages.bm25 import bm25_topk, corpus_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    stats = corpus_stats(ds, BM25_TERMS)
    return bm25_topk(ds, BM25_TERMS, stats, k=10)


def q_docs_perplexity(sf_dir: str):
    """Bigram-LM self-perplexity per lang (stages.ngram_lm): the
    KenLM-style quality-filter shape. Pass 1 folds per-batch bigram
    partials into a loud-guarded model; pass 2 scores in an actor pool
    against the broadcast model (pc.index_in hash probes, no Python
    per token) and folds per-lang partials — per-doc rows never reach
    the driver. The DuckDB oracle re-derives the identical model and
    scores from the same tokenization (lag() over ordered unnest)."""
    from ..stages.ngram_lm import bigram_counts, perplexity_by_lang

    ds = _read(sf_dir, "documents", ["lang", "text"])
    model = bigram_counts(ds)
    return perplexity_by_lang(ds, model, k=0.5)


def q_docs_perplexity_pruned(sf_dir: str):
    """Min-count-pruned bigram perplexity — the COUNT-SHUFFLE training
    path that `bigram_counts` documents as the different-op escape
    hatch for vocabularies past MAX_VOCAB_BIGRAMS (closing that gate):
    per-batch combiner partials → ONE groupby(key).sum exchange →
    count>=2 pruning INSIDE the cluster, so the driver folds only the
    survivors plus O(vocab) context rows (stages.ngram_lm
    .bigram_counts_pruned). Standard KenLM-style count pruning: pruned
    numerators score as unseen (+k mass), denominators keep the FULL
    counts. Scoring reuses PerplexityScorer unchanged. The oracle
    re-derives the pruned model and every score from the same
    tokenization (HAVING n >= 2 + LEFT JOIN for the pruned probes)."""
    from ..stages.ngram_lm import bigram_counts_pruned, perplexity_by_lang

    ds = _read(sf_dir, "documents", ["lang", "text"])
    model = bigram_counts_pruned(ds, min_count=2)
    return perplexity_by_lang(ds, model, k=0.5)


def q_docs_repetition(sf_dir: str):
    """Gopher-style repetition quality signals per lang
    (stages.gopher): top-bigram char coverage + duplicate-5-gram
    occurrence fraction — the degenerate-repetition gate docs_quality's
    length/punct signals can't see. One streaming pass, no shuffle:
    in-batch Arrow group_by per (doc, gram), per-lang partials folded
    on the driver. The DuckDB oracle re-derives both signals from the
    same tokenization (lag() windows over ordered unnest), including
    the smallest-key tie-break for the top bigram."""
    from ..stages.gopher import repetition_by_lang

    ds = _read(sf_dir, "documents", ["lang", "text"])
    return repetition_by_lang(ds)


def q_docs_filter_funnel(sf_dir: str):
    """The composite training-data filter funnel (stages.funnel): all
    five gates — exact-dup, min-tokens, quality, perplexity,
    repetition — in ONE scoring pass with first-failing-gate
    attribution; per-lang outcome counts partition n_docs exactly.
    Two loud-guarded prep passes (bigram model + conflicted-fp winner
    map) broadcast once; per-doc rows never reach the driver. The
    DuckDB oracle re-derives every gate AND the attribution order from
    the same tokenization and thresholds."""
    from ..stages.funnel import filter_funnel_by_lang

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    return filter_funnel_by_lang(ds)


DECONTAM_BENCH_MOD = 7  # eval set = docs with doc_id % 7 == 0


def q_docs_decontaminate(sf_dir: str):
    """Benchmark decontamination (stages.decontam): flag training docs
    sharing any complete token 8-gram with a held-out eval slice
    (doc_id % 7 == 0 — deterministic, no external data). The classic
    broadcast shape: the eval gram set folds on the driver behind a
    loud guard, ships once via ray.put, and the 100-TB training side
    streams through one pc.is_in map pass — no shuffle, no join. The
    DuckDB oracle re-derives the gram sets from the same tokenization
    (lag() windows over ordered unnest) and semi-joins them."""
    import numpy as np

    from ..stages.decontam import benchmark_gram_set, contamination_by_lang

    def side(is_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            m = t["doc_id"].to_numpy(zero_copy_only=False) % \
                DECONTAM_BENCH_MOD == 0
            return t.filter(pa.array(m if is_bench else ~m))

        return _read(sf_dir, "documents", ["doc_id", "lang", "text"]) \
            .map_batches(f, batch_format="pyarrow")

    grams = benchmark_gram_set(side(True), n=8)
    return contamination_by_lang(side(False), grams, n=8)


def q_docs_substring_dedup(sf_dir: str):
    """Exact substring dedup (stages.substring_dedup): per-lang stats
    of token spans occurring >= 2 times in the corpus (Lee et al. /
    RefinedWeb ExactSubstr, in its distributable n-gram form). ONE
    exchange: per-batch combiner partials -> distributed
    groupby(gram).sum -> only the dup set leaves the cluster (loud
    guard), broadcasts, and scoring is a map-only pc.is_in + numpy
    diff-array cover. The DuckDB oracle re-derives dup grams and the
    distinct-covered-position count from the same tokenization."""
    from ..stages.substring_dedup import (duplicated_gram_set,
                                          span_coverage_by_lang)

    ds = _read(sf_dir, "documents", ["lang", "text"])
    grams = duplicated_gram_set(ds, n=8)
    return span_coverage_by_lang(ds, grams, n=8)


def q_docs_source_mixture(sf_dir: str):
    """Source-mixture balancing (stages.mixture): uniform-cap token
    budgets per source, all-integer weights (ppm) and Knuth-hash
    deterministic doc sampling — the data-mixing pass of a corpus
    release. Two map-only passes, no shuffle: per-source token stats
    fold on the driver (sources are few by definition), thresholds
    broadcast in the scorer closure. The DuckDB oracle re-derives the
    budgets, the ppm thresholds and every per-doc hash decision."""
    from ..stages.mixture import (mixture_sample_stats, mixture_thresholds,
                                  source_token_stats)

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    stats = source_token_stats(ds)
    return mixture_sample_stats(ds, mixture_thresholds(stats))


def q_docs_nb_classifier(sf_dir: str):
    """Trained model-based classification (stages.nbayes): multinomial
    Naive Bayes self-trained on the corpus labels — the GPT-3-style
    model-based filtering shape (closed-form training so the oracle
    can re-derive it; docs_langid is the rule-table sibling). Pass 1
    folds per-batch (class, token) count partials behind a loud guard;
    pass 2 scores in an actor pool against the broadcast model
    (pc.index_in probes) and folds per-(label, prediction) partials.
    Per-doc scores round to 6 BEFORE the argmax on both sides so float
    summation order can't flip a prediction."""
    from ..stages.nbayes import nb_confusion, nb_train

    ds = _read(sf_dir, "documents", ["lang", "text"])
    model = nb_train(ds)
    return nb_confusion(ds, model)


def q_docs_chunking(sf_dir: str):
    """Context-window chunking stats (stages.chunking): 64-token
    windows, stride 48 (overlap 16) — the packing pass in front of a
    tokenizer/embedder. Pure map, vectorized window arithmetic; the
    DuckDB oracle re-derives every window INDEPENDENTLY of the
    engine's closed form via generate_series starts."""
    from ..stages.chunking import chunk_stats_by_lang

    ds = _read(sf_dir, "documents", ["lang", "text"])
    return chunk_stats_by_lang(ds, size=64, stride=48)


def q_docs_profile(sf_dir: str):
    """Table profiling (stages.profile): per-column nulls + distincts
    for ALL columns in ONE streaming pass (one partial row per column
    per block: null count + KMV sketch, exact below k=65536 — the
    distinct_counts contract). A 100 TB profile costs one read, not
    one scan per column."""
    from ..stages.profile import profile_table

    cols = ["doc_id", "lang", "n_chars", "source", "text"]
    return profile_table(_read(sf_dir, "documents", cols), cols)


def q_events_outliers(sf_dir: str):
    """Grouped moments + z-score anomaly gate, zero shuffle: per-type
    (n, Σc, Σc²) integer-cent sufficient statistics fold on the driver
    (mergeable — the tree-fold shape at 100 TB), then one broadcast
    re-scan counts |c - mean| > 3σ events. Float parity is EXACT, not
    rounded: both sides build mean/σ from the identical integers with
    the identical double expression (σ² = (Σc² - (Σc·Σc)/n)/n, Σc
    rounded to double BEFORE squaring — mirroring SQL's ::DOUBLE — so
    the unrounded 3σ boundary comparison cannot flip an outlier count
    between engine and oracle). σ = 0 groups gate to zero outliers."""
    from ..core.textstats import round_half_away
    from ..stages.running import _cents

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        c = _cents(t["value"].to_numpy(zero_copy_only=False), 100)
        return pa.table(
            {
                "event_type": t["event_type"],
                "c": pa.array(c, pa.int64()),
                "c2": pa.array(c * c, pa.int64()),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    st = driver_grouped_agg(
        prepped,
        ["event_type"],
        {"n_events": ("c", "count"), "s": ("c", "sum"), "s2": ("c2", "sum")},
    )
    stats = {}
    for _, r in st.iterrows():
        n, sf_, s2f = int(r["n_events"]), float(int(r["s"])), float(int(r["s2"]))
        mean = sf_ / n
        var = (s2f - (sf_ * sf_) / n) / n
        std = math.sqrt(var) if var > 0 else 0.0
        stats[r["event_type"]] = (mean, std)

    def outliers(t: pa.Table) -> pa.Table:
        types = t["event_type"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        flag = np.zeros(len(t), np.int64)
        for et, (mean, std) in stats.items():
            if std > 0:
                m = types == et
                flag[m] = (np.abs(c[m] - mean) > 3.0 * std).astype(np.int64)
        return pa.table({"event_type": t["event_type"],
                         "o": pa.array(flag, pa.int64())})

    out = driver_grouped_agg(
        prepped.map_batches(outliers, batch_format="pyarrow"),
        ["event_type"],
        {"n_outliers": ("o", "sum")},
    )
    res = st.merge(out, on="event_type")
    res["mean_cents"] = round_half_away(
        [stats[e][0] for e in res["event_type"]], 6)
    res["std_cents"] = round_half_away(
        [stats[e][1] for e in res["event_type"]], 6)
    res["n_outliers"] = res["n_outliers"].astype("int64")
    return (
        res[["event_type", "n_events", "mean_cents", "std_cents",
             "n_outliers"]]
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def q_docs_top_terms(sf_dir: str):
    """Characterizing keywords per lang (stages.tfidf): add-1-smoothed
    log-odds rate ratio, the Fightin'-Words family — presence-idf
    (c-TF-IDF) is degenerate on this corpus's shared vocabulary, rate
    ratios rank by OVER-representation. One pre-combined corpus pass;
    totals/score/top-k all run on the vocab-sized aggregate; scores
    round to 6 BEFORE ranking on both sides, ties on term ASC."""
    from ..stages.tfidf import top_terms_by_lang

    ds = _read(sf_dir, "documents", ["lang", "text"])
    return top_terms_by_lang(ds, k=5)


def q_docs_bpe_encode(sf_dir: str):
    """BPE ENCODE (stages.bpe.bpe_apply/bpe_encode_stats): apply the
    trained merge table to the corpus — docs_bpe_merges' consumer
    half. The merge loop runs once per DISTINCT word (vocabulary-
    sized, exactly like training); per-doc encoding is then a
    broadcast word→token-count probe (pc.index_in), one streaming
    pass, per-lang partials only. The oracle re-runs the full unrolled
    merge chain carrying each word key and joins the final symbol
    counts back onto the raw token stream."""
    from ..stages.bpe import (bpe_apply, bpe_encode_stats, bpe_merges,
                              word_counts)

    ds = _read(sf_dir, "documents", ["lang", "text"])
    counts = word_counts(ds)
    merges = bpe_merges(counts, BPE_N_MERGES)
    return bpe_encode_stats(ds, bpe_apply(counts.keys(), merges))


def q_events_rollup(sf_dir: str):
    """Hierarchical rollup (stages.rollup): (event_type, day) →
    (event_type) → grand total from ONE finest-grain pass — coarser
    levels derive from the finest RESULT, never a second scan; integer
    cents keep every level bit-exact vs the oracle's ROLLUP over raw
    rows (no float-order caveat)."""
    from ..stages.rollup import rollup_agg
    from ..stages.running import _cents

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(t["ts"], unit="day"), "%Y-%m-%d")
        cents = _cents(t["value"].to_numpy(zero_copy_only=False), 100)
        return pa.table(
            {
                "event_type": t["event_type"],
                "day": day,
                "cents": pa.array(cents, pa.int64()),
            }
        )

    return rollup_agg(
        ds.map_batches(prep, batch_format="pyarrow"), ["event_type", "day"]
    )


def q_docs_textrank(sf_dir: str):
    """TextRank keywords per lang (stages.textrank): PageRank over the
    adjacent-token co-occurrence graph in FIXED-POINT INTEGER
    arithmetic — every damped iteration floor-divides at the same two
    points as the generated unrolled SQL oracle, so the score column
    matches by exact int64 equality (no float ever exists). One corpus
    pass of in-Arrow-grouped edge partials; the iteration runs on the
    vocabulary-sized aggregate, loud-guarded at TEXTRANK_EDGE_LIMIT."""
    from ..stages.textrank import textrank_terms

    ds = _read(sf_dir, "documents", ["lang", "text"])
    return textrank_terms(ds, n_iters=TEXTRANK_ITERS, k=5)


TEXTRANK_ITERS = 8
EVENT_TYPE_DOMAIN = ["click", "error", "purchase", "signup", "view"]
QSKETCH_ORACLE_DIR = "/tmp/ocracle_qsketch_oracle"
QSKETCH_QPMS = [10, 100, 250, 500, 750, 900, 990]
SNAPDELTA_ORACLE_DIR = "/tmp/ocracle_snapdelta_oracle"
BOILER_ORACLE_DIR = "/tmp/ocracle_boiler_oracle"
PAGERANK_ITERS = 8
SIMJOIN_ORACLE_DIR = "/tmp/ocracle_simjoin_oracle"


def q_pages_url_simjoin(sf_dir: str):
    """Edit-distance-1 similarity self-join (stages.simjoin): FastSS
    deletion-neighborhood blocking + exact verify over the crawl's
    distinct urls. Strong artifact oracle: the distinct url list is
    written and DuckDB re-derives the FULL pair set by brute-force
    all-pairs levenshtein (length-blocked) — verifying the blocking
    trick's exactness externally, the docs_simhash_dups precedent.
    pair_ck XORs a 60-bit md5 per pair so one wrong/missing pair
    anywhere flips the row."""
    import shutil

    import ray.data as rd

    from ..sources.pages import generate_pages_dataset, n_docs_for_sf, sf_of_dir
    from ..stages.simjoin import edit1_join_census

    sf = sf_of_dir(sf_dir)
    n = min(2000, n_docs_for_sf(sf))
    pages = generate_pages_dataset(n)

    def urls_only(t: pa.Table) -> pa.Table:
        return t.select(["url"])

    from ray.data.aggregate import Count

    distinct = (
        pages.map_batches(urls_only, batch_format="pyarrow")
        .groupby("url").aggregate(Count(alias_name="_n"))
    )
    out_dir = f"{SIMJOIN_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    distinct.map_batches(
        lambda t: t.select(["url"]), batch_format="pyarrow"
    ).write_parquet(out_dir)
    return edit1_join_census(rd.read_parquet(out_dir), col="url")


def q_docs_collocations(sf_dir: str):
    """PMI collocations (stages.colloc): rank adjacent-token pairs by
    pointwise mutual information over the bigram event space — one
    corpus pass of Arrow-grouped bigram partials, model-sized driver
    scoring behind the perplexity model's loud guard. PMI floats use
    the repo's ln/round-6-before-rank parity rule; ties on terms ASC."""
    from ..stages.colloc import collocations

    ds = _read(sf_dir, "documents", ["text"])
    return collocations(ds, k=10, min_count=5)


def q_events_user_cms(sf_dir: str):
    """Count-Min frequency sketch (core.sketch.CountMin): constant
    (d·w)-cell counters, mergeable by elementwise ADD — the frequency
    sibling of HLL/KMV for per-key counts too numerous to shuffle.
    Values never leave the workers: each batch emits its sparse
    counter cells (≤ d·w rows), the driver tree-folds dense matrices.
    The query reports the sketch estimate vs the exact count for the
    top-10 users — the ESTIMATE itself is oracled (the HLL precedent):
    SQL re-derives both chained splitmix64 applications, every counter
    cell and every min-over-rows estimate over UHUGEINT."""
    from ..core.sketch import CountMin

    ds = _read(sf_dir, "events", ["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        sk = CountMin().add(t["user_id"].to_numpy(zero_copy_only=False))
        i, col = np.nonzero(sk.counters)
        return pa.table({
            "i": pa.array(i.astype(np.int64)),
            "col": pa.array(col.astype(np.int64)),
            "cnt": pa.array(sk.counters[i, col], pa.int64()),
        })

    acc = CountMin()
    for block in ds.map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        acc.counters[block["i"].to_numpy(zero_copy_only=False),
                     block["col"].to_numpy(zero_copy_only=False)] += (
            block["cnt"].to_numpy(zero_copy_only=False))

    # exact top-10 by count: distributed groupby + per-batch top-k
    # candidates + tiny driver resolve (the user_totals pattern)
    from ray.data.aggregate import Sum

    def cpartial(t: pa.Table) -> pa.Table:
        g = t.select(["user_id"]).group_by("user_id").aggregate(
            [("user_id", "count")])
        return g.rename_columns(["user_id", "n_exact"])

    grouped = (
        ds.map_batches(cpartial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n_exact", alias_name="n_exact"))
    )
    cand = grouped.map_batches(
        lambda t: _topk_batch(t, [("n_exact", "descending"),
                                  ("user_id", "ascending")], 10),
        batch_format="pyarrow",
    ).to_pandas()
    top = (
        cand.sort_values(["n_exact", "user_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    ests = acc.estimate(top["user_id"].to_numpy())
    top["n_exact"] = top["n_exact"].astype("int64")
    top["n_cms"] = ests.astype("int64")
    top["overest"] = (top["n_cms"] - top["n_exact"]).astype("int64")
    return top[["user_id", "n_exact", "n_cms", "overest"]]


def q_events_transitions(sf_dir: str):
    """First-order Markov transition matrix (stages.markov) over
    per-user event sequences ordered by (ts, event_id) — a total
    order, so the lag() mirror is unambiguous. Directed pairs from the
    exact sort+seam builder (self-transitions kept); integer-ppm
    probabilities with floor division shared verbatim with SQL."""
    from ..stages.markov import transition_matrix

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])
    out = transition_matrix(ds, group_col="user_id",
                            order_cols=["ts", "event_id"],
                            item_col="event_type")
    return out.rename(columns={"prev_state": "prev_type",
                               "next_state": "next_type"})


def q_orders_basket_rank(sf_dir: str):
    """DISTRIBUTED PageRank (stages.pagerank) over the basket
    co-purchase graph: consecutive lineitem parts per order are edges
    (exact across block boundaries via the sort + seam two-pass), then
    every damped iteration streams the edge Dataset once against a
    broadcast rank vector — edges never fold to the driver, only
    |V|-sized contribution partials do (loud-guarded). Same int64
    fixed-point as docs_textrank, so the generated unrolled oracle
    matches by exact integer equality."""
    from ..stages.pagerank import consecutive_pair_edges, pagerank

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_partkey"])
    edges = consecutive_pair_edges(
        ds, group_col="l_orderkey", order_col="l_linenumber",
        item_col="l_partkey")
    out = pagerank(edges, n_iters=PAGERANK_ITERS, k=10)
    return out.rename(columns={"node": "part_key"})


PPR_SEED_BRAND = "Brand#1"


def q_orders_ppr(sf_dir: str):
    """PERSONALIZED PageRank (stages.pagerank seed mode) — the
    recommender form: random walk with restart to the seed set (all
    parts of one brand), ranking parts by proximity to that brand in
    the basket co-purchase graph ("customers who buy this brand also
    buy…"). Same zero-shuffle broadcast-vector iterations as
    orders_basket_rank; teleport mass lands only on seeds (base and r0
    seed-gated, unnormalized — rescaling the teleport vector rescales
    every score identically, so the ranking is the classic
    |S|-normalized one). Generated unrolled oracle, exact integer
    equality."""
    from ..stages.pagerank import consecutive_pair_edges, pagerank

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_partkey"])
    edges = consecutive_pair_edges(
        ds, group_col="l_orderkey", order_col="l_linenumber",
        item_col="l_partkey")
    seeds = driver_grouped_agg(
        _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
            lambda t: t.filter(pc.equal(t["p_brand"], PPR_SEED_BRAND))
                       .select(["p_partkey"]),
            batch_format="pyarrow"),
        ["p_partkey"], {"_n": ("p_partkey", "count")})
    out = pagerank(edges, n_iters=PAGERANK_ITERS, k=10,
                   seed_nodes=seeds["p_partkey"].to_numpy())
    return out.rename(columns={"node": "part_key"})


def q_pages_boilerplate(sf_dir: str):
    """CCNet-style frequent-block suppression (stages.boiler): blocks
    whose normalized-text hash repeats ≥5 times corpus-wide are
    template boilerplate; the census reports per-branch drop counts
    and a kept-hash XOR. Strong artifact oracle: the per-block hash
    rows are written BEFORE any frequency logic runs and both engine
    passes re-read them, so SQL re-derives the counts, the frequent
    set, the drop rule and the census from the identical surface —
    only the blake2b text hash is trusted."""
    import shutil

    import ray.data as rd

    from ..sources.pages import generate_pages_dataset, n_docs_for_sf, sf_of_dir
    from ..stages.blocks import pages_to_blocks
    from ..stages.boiler import block_hash_rows, boilerplate_census

    sf = sf_of_dir(sf_dir)
    n = min(2000, n_docs_for_sf(sf))
    blocks = pages_to_blocks(generate_pages_dataset(n), concurrency=2)
    out_dir = f"{BOILER_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    block_hash_rows(blocks).write_parquet(out_dir)
    return boilerplate_census(rd.read_parquet(out_dir))
_RECRAWL_NOTE = b"<!-- recrawl-delta -->"
_RECRAWL_TS_BUMP_US = 30 * 86_400 * 1_000_000


def q_pages_snapshot_delta(sf_dir: str):
    """Crawl-recrawl CDC (stages.snapshot): classify every url across
    two snapshots as added/removed/changed/unchanged and census each
    class with a fingerprint XOR. Snapshot B shifts the crawl window
    by 10% (adds+removes) and deterministically mutates every 7th doc
    (trailing url digits % 7 == 3 — the pdf_branch dispatch trick) with
    a content note + 30-day ts bump (changes). Artifact oracle of the
    STRONG kind (webview_tasks pattern): the raw pre-dedup fingerprint
    rows of BOTH sides are written, and SQL re-derives keep-latest
    (row_number over ts DESC, fp DESC — the engine's exact tie-break),
    the full-outer diff, the status rule and the census; only the
    blake2b fingerprint itself is trusted from the artifact."""
    import shutil

    import ray.data as rd

    from ..sources.pages import (PAGES_SCHEMA, gen_page, n_docs_for_sf,
                                 sf_of_dir)
    from ..stages.snapshot import fingerprint_pages, snapshot_delta_census

    sf = sf_of_dir(sf_dir)
    n = min(2000, n_docs_for_sf(sf))
    ofs = n // 10

    def gen_window(start: int):
        def gen(batch: pa.Table) -> pa.Table:
            ids = batch["id"].to_pylist()
            if not ids:
                return PAGES_SCHEMA.empty_table()
            rows = [gen_page(i + start) for i in ids]
            return pa.Table.from_pydict(
                {
                    "url": [r["url"] for r in rows],
                    "warc_ts": pa.array([r["warc_ts"] for r in rows],
                                        pa.timestamp("us")),
                    "html": pa.array([r["html"] for r in rows],
                                     pa.large_binary()),
                    "text": pa.array([r["text"] for r in rows],
                                     pa.large_string()),
                    "lang": [r["lang"] for r in rows],
                },
                schema=PAGES_SCHEMA,
            )
        return gen

    def recrawl_mutate(t: pa.Table) -> pa.Table:
        """Deterministic content drift: urls whose trailing doc number
        is ≡3 (mod 7) changed since the last crawl."""
        urls = t["url"].to_pylist()
        html = t["html"].to_pylist()
        ts = t["warc_ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        changed = np.array([int(u[-6:]) % 7 == 3 for u in urls], bool)
        html = [h + _RECRAWL_NOTE if c else h
                for h, c in zip(html, changed)]
        ts = np.where(changed, ts + _RECRAWL_TS_BUMP_US, ts)
        return pa.table({
            "url": t["url"],
            "warc_ts": pa.array(ts.astype("datetime64[us]"),
                                pa.timestamp("us")),
            "html": pa.array(html, pa.large_binary()),
            "text": t["text"],
            "lang": t["lang"],
        })

    snap_a = rd.range(n).map_batches(
        gen_window(0), batch_format="pyarrow", batch_size=256)
    snap_b = rd.range(n).map_batches(
        gen_window(ofs), batch_format="pyarrow", batch_size=256
    ).map_batches(recrawl_mutate, batch_format="pyarrow")

    rows = fingerprint_pages(snap_a, "a").union(
        fingerprint_pages(snap_b, "b"))
    out_dir = f"{SNAPDELTA_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    rows.map_batches(
        lambda t: t.rename_columns(["side", "url", "warc_ts", "fp"]),
        batch_format="pyarrow",
    ).write_parquet(out_dir)

    back = rd.read_parquet(out_dir)

    def unrename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["side", "url", "warc_ts",
                                 "text_fingerprint"])

    back = back.map_batches(unrename, batch_format="pyarrow")
    side_a = back.filter(expr="side == 'a'")
    side_b = back.filter(expr="side == 'b'")
    return snapshot_delta_census(side_a, side_b)


def q_events_quantile_sketch(sf_dir: str):
    """Mergeable-sketch quantiles (stages.qsketch): the one-pass
    shuffle-free sibling of events_value_quantiles' exact two-pass.
    Hybrid artifact oracle (the knn_ivf pattern): the sketch estimates
    are written to parquet — only the compaction itself is trusted —
    and BOTH sides independently re-derive each estimate's TRUE rank
    from raw rows plus the integer target rank ((q_pm*n+999)//1000),
    so the within_1pct column verifies the sketch's error bound
    externally instead of self-reporting it."""
    import shutil

    import pyarrow.parquet as _pq

    from ..stages.qsketch import quantile_estimates

    ds = _read(sf_dir, "events", ["value"])
    ests = quantile_estimates(ds, "value", QSKETCH_QPMS)

    out_dir = f"{QSKETCH_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    _pq.write_table(
        pa.table({
            "q_pm": pa.array([q for q, _, _ in ests], pa.int64()),
            "est": pa.array([e for _, e, _ in ests], pa.float64()),
        }),
        f"{out_dir}/part-0.parquet",
    )

    est_arr = np.array([e for _, e, _ in ests], np.float64)
    q_arr = np.array([q for q, _, _ in ests], np.int64)

    def counts(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        le = np.array([(v <= e).sum() for e in est_arr], np.int64)
        return pa.table({
            "q_pm": pa.array(q_arr, pa.int64()),
            "le": pa.array(le, pa.int64()),
            "nb": pa.array(np.full(len(q_arr), len(v), np.int64)),
        })

    agg = driver_grouped_agg(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["q_pm"],
        {"true_rank": ("le", "sum"), "n": ("nb", "sum")},
    ).set_index("q_pm")

    rows = []
    for q_pm, est, target in ests:
        true_rank = int(agg.loc[q_pm, "true_rank"])
        n = int(agg.loc[q_pm, "n"])
        rows.append((q_pm, est, target, true_rank, n,
                     abs(true_rank - target) * 100 <= n))
    out = pd.DataFrame(rows, columns=["q_pm", "est", "target_rank",
                                      "true_rank", "n", "within_1pct"])
    for c in ("q_pm", "target_rank", "true_rank", "n"):
        out[c] = out[c].astype("int64")
    return out.sort_values("q_pm").reset_index(drop=True)


def q_events_pivot(sf_dir: str):
    """Crosstab reshape (stages.pivot): day x event_type long rows to
    ONE wide row per day with (count, int64-cent sum) column pairs per
    type — SQL PIVOT / pandas crosstab. The key domain is declared
    (EVENT_TYPE_DOMAIN) so the wide schema is a plan-time constant; an
    unexpected key raises loud. One streaming pass of in-Arrow-grouped
    partials, driver folds only 30 x 5 aggregate rows, cents stay
    integer end to end (bit-exact vs the FILTER-aggregate oracle)."""
    from ..stages.pivot import pivot_counts

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    out = pivot_counts(
        ds,
        time_col="ts",
        key_col="event_type",
        value_col="value",
        expected_keys=EVENT_TYPE_DOMAIN,
        unit="day",
    )
    return out.rename(columns={"bucket": "day"})


def q_docs_seq_packing(sf_dir: str):
    """GPT-style sequence packing (stages.packing): concatenate every
    doc's tokens + EOS in doc_id order, chunk the stream into 256-token
    training sequences — the cross-doc packing op (docs_chunking is the
    per-doc sibling). Global ordered prefix sum via the running-sum
    two-pass pattern: sort+materialize, per-block stream totals to the
    driver (O(blocks) rows), broadcast exclusive offsets, second map
    over the SAME blocks; per-doc spans stream as a Dataset. The
    oracle re-derives every span from a window cumsum."""
    from ..stages.packing import packing_stats_by_lang

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    return packing_stats_by_lang(ds, seq_len=256)


def q_events_distinct_hll(sf_dir: str):
    """HyperLogLog distinct users per event_type + a merged '(all)'
    row (core.sketch.HyperLogLog): the CONSTANT-size (4 KB) mergeable
    distinct sketch — KMV's sibling for cardinalities where exact-
    below-k stops being exact. Values never shuffle: one register row
    per (batch, group), tree-merged (register max IS the union
    sketch — the '(all)' row is literally the per-type sketches
    merged). The n_exact lane (distinct-pair groupby) exists to EXPOSE
    the sketch's error in the row; at 100 TB you would run the sketch
    alone. The DuckDB oracle re-derives the splitmix64 hash (HUGEINT
    modular arithmetic), every register, the integer-exact scaled
    denominator and both estimator branches — the estimate itself is
    oracled, not just the exact count."""
    from functools import reduce

    from ray.data.aggregate import Count

    from ..core.sketch import HyperLogLog, hll_distinct_by
    from ..core.textstats import round_half_away

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    sketches = hll_distinct_by(ds, "event_type", "user_id")
    merged = reduce(lambda a, b: a.merge(b), sketches.values(), HyperLogLog())

    # exact lane: distinct (type, user) pairs via in-batch combiner +
    # one groupby; global = distinct user over the SAME pair set
    pairs = ds.map_batches(
        lambda t: t.group_by(["event_type", "user_id"]).aggregate([]),
        batch_format="pyarrow",
    ).groupby(["event_type", "user_id"]).aggregate(Count(alias_name="c"))
    per_type = driver_grouped_agg(
        pairs, ["event_type"], {"n_exact": ("user_id", "count")}
    )
    exact = dict(zip(per_type["event_type"], per_type["n_exact"].astype(int)))
    exact["(all)"] = int(
        pairs.groupby("user_id").aggregate(Count(alias_name="c2")).count()
    )

    items = sorted(sketches.items()) + [("(all)", merged)]
    return pd.DataFrame(
        {
            "event_type": [k for k, _ in items],
            "n_exact": pd.array([exact[k] for k, _ in items], dtype="int64"),
            "hll_est": [float(round_half_away(h.estimate(), 6)) for _, h in items],
        }
    ).sort_values("event_type").reset_index(drop=True)


def q_docs_split(sf_dir: str):
    """Deterministic train/valid/test holdout split (stages.splits):
    90/5/5 by a double-round Knuth hash on doc_id (second round
    decorrelates the split from mixture's sampling hash), per-(lang,
    split) doc/token stats via a driver fold, plus a cross-split
    duplicate-LEAKAGE audit — normalized-text groups spanning >1 split
    (the eval-contamination bug a corpus release must catch). The
    audit shuffles only distinct (tnorm, split-bitmask) pairs; a group
    leaks iff min(mask) != max(mask). The oracle re-derives every hash
    decision and the leak count (count(DISTINCT split) > 1)."""
    from ..stages.splits import leaky_group_count, split_stats

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    out = split_stats(ds)
    out["n_leaky_groups"] = leaky_group_count(ds)
    return out


INV_INDEX_DIR = "/tmp/ocracle_invindex"


def q_docs_search_index(sf_dir: str):
    """Disk-backed inverted index (stages.invindex): build the
    bucket-partitioned posting store in one streaming pass, then
    answer a conjunctive term query reading ONLY the buckets the
    terms hash to (the IVF pruned-read pattern for text). The DuckDB
    oracle re-answers the same AND query over the RAW documents
    table, verifying the build + pruned read end-to-end."""
    from ..stages.invindex import build_inverted_index, query_index_and

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    idx = build_inverted_index(ds, f"{INV_INDEX_DIR}/current")
    return query_index_and(idx, ["dup", "merge"])


ZONEMAP_DIR = "/tmp/ocracle_zonemap"
ZONEMAP_LO, ZONEMAP_HI = "2024-01-10T00:00:00", "2024-01-12T12:00:00"


def q_events_timerange_pruned(sf_dir: str):
    """Zone-map data skipping (stages.zonemap): day-partitioned store
    with a (min_ts, max_ts) file manifest built FROM parquet footer
    statistics; a time-range aggregate reads ONLY the overlapping
    files plus an exact residual filter. The invindex/IVF pruned-read
    pattern on the RANGE axis. The DuckDB oracle re-answers the range
    aggregate over the RAW events table, verifying layout + zone map +
    pruned read + residual end-to-end."""
    from ..stages.zonemap import build_time_partitioned, range_aggregate

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    store = f"{ZONEMAP_DIR}/current"
    build_time_partitioned(ds, store)
    return range_aggregate(store, ZONEMAP_LO, ZONEMAP_HI)


def q_events_value_mad(sf_dir: str):
    """Median absolute deviation per event_type — the robust
    dispersion stat (events_outliers' 3σ gate breaks on heavy tails;
    MAD does not). Composes the exact two-pass histogram-refinement
    quantile machinery TWICE: per-type median, broadcast (5 floats),
    then the exact median of |value − med| over a derived column —
    four streaming passes total, zero shuffle, no group ever
    materializes. Both medians are quantile_cont-exact so the oracle
    is DuckDB median() directly."""
    from ..stages.quantile import grouped_exact_quantiles

    ds = _read(sf_dir, "events", ["event_type", "value"])
    med_df = grouped_exact_quantiles(ds, "event_type", "value",
                                     probs=(0.5,))
    med = dict(zip(med_df["event_type"], med_df["p50"]))

    def absdev(t: pa.Table) -> pa.Table:
        types = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        m = _lookup_float64(types, med)
        return pa.table({"event_type": t["event_type"],
                         "dev": pa.array(np.abs(v - m), pa.float64())})

    mad_df = grouped_exact_quantiles(
        ds.map_batches(absdev, batch_format="pyarrow"),
        "event_type", "dev", probs=(0.5,))
    out = med_df.merge(mad_df, on="event_type",
                       suffixes=("_med", "_mad"))
    out = out.rename(columns={"p50_med": "med_value", "p50_mad": "mad"})
    out["med_value"] = out["med_value"].round(4)
    out["mad"] = out["mad"].round(4)
    return (out[["event_type", "med_value", "mad"]]
            .sort_values("event_type").reset_index(drop=True))


def q_events_anomaly_mad(sf_dir: str):
    """Robust anomaly census — the MAD-z outlier gate (flag when
    2·|2c − med2| > 5·mad4, i.e. |v − median| > 5·MAD) composed from
    the exact quantile machinery, ENTIRELY in integers: medians of
    integer cents are half-integers, so doubling (med2 = 2·median(c),
    mad4 = 2·median(|2c − med2|)) keeps every quantity an exactly-
    representable int64 on both sides — unlike a float z-score there
    is NO boundary ulp to argue about. Five streaming passes (two per
    median + one census), zero shuffle; census = per-type counts,
    ppm, and XOR of anomalous event_ids (0 is the XOR identity, so
    the CASE-gated bit_xor pins membership exactly)."""
    from ..stages.quantile import grouped_exact_quantiles

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def cents_t(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(
            np.int64)
        return pa.table({
            "event_id": t["event_id"].cast(pa.int64()),
            "event_type": t["event_type"],
            "c": pa.array(c.astype(np.float64), pa.float64()),
        })

    cents = ds.map_batches(cents_t, batch_format="pyarrow")
    med_df = grouped_exact_quantiles(cents, "event_type", "c",
                                     probs=(0.5,))
    med2 = {k: int(np.rint(2 * v)) for k, v in
            zip(med_df["event_type"], med_df["p50"])}

    def dev_t(t: pa.Table) -> pa.Table:
        types = t["event_type"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _lookup_int64(types, med2)
        return pa.table({
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "c": t["c"],
            "dev2": pa.array(np.abs(2 * c - m).astype(np.float64),
                             pa.float64()),
        })

    dev = cents.map_batches(dev_t, batch_format="pyarrow")
    mad_df = grouped_exact_quantiles(dev, "event_type", "dev2",
                                     probs=(0.5,))
    mad4 = {k: int(np.rint(2 * v)) for k, v in
            zip(mad_df["event_type"], mad_df["p50"])}

    def census(t: pa.Table) -> pa.Table:
        types = t["event_type"].to_numpy(zero_copy_only=False)
        dev2 = t["dev2"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        m4 = _lookup_int64(types, mad4)
        flag = (2 * dev2 > 5 * m4).astype(np.int64)
        df = pd.DataFrame({"event_type": types, "flag": flag,
                           "x": np.where(flag == 1, eid, 0)})
        g = df.groupby("event_type").agg(
            n=("flag", "size"), n_anom=("flag", "sum"),
            id_xor=("x", lambda s: int(np.bitwise_xor.reduce(
                s.to_numpy(np.int64)))))
        return pa.table({
            "event_type": pa.array(g.index.tolist(), pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "n_anom": pa.array(g["n_anom"].to_numpy(np.int64)),
            "id_xor": pa.array(g["id_xor"].to_numpy(np.int64)),
        })

    parts = dev.map_batches(census, batch_format="pyarrow").to_pandas()
    out = parts.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), n_anom=("n_anom", "sum"),
        id_xor=("id_xor", lambda s: int(np.bitwise_xor.reduce(
            s.to_numpy(np.int64)))))
    out["anom_ppm"] = out["n_anom"] * 1_000_000 // out["n"]
    out = out.sort_values("event_type").reset_index(drop=True)
    for c in ("n", "n_anom", "anom_ppm", "id_xor"):
        out[c] = out[c].astype("int64")
    return out[["event_type", "n", "n_anom", "anom_ppm", "id_xor"]]


DAY_US = 86_400_000_000


def q_events_streaks(sf_dir: str):
    """Gaps-and-islands: each user's LONGEST run of consecutive active
    days, histogrammed. Reuses the retention machinery — per-batch
    distinct (user, day) combiner, ONE guarded groupby whose groups
    are calendar-bounded; the max-streak is a numpy diff/split inside
    the group (the SQL mirror is the classic row_number-difference
    islands trick). Zero joins; the histogram is streak-length-sized
    so the fold is driver-safe by construction."""
    from ..stages.retention import user_week_pairs
    from ..stages.sessions import guarded_map_groups

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    pairs = user_week_pairs(ds, week_us=DAY_US)  # (user_id, week)=day

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        d = np.unique(g["week"].to_numpy())
        runs = np.split(d, np.flatnonzero(np.diff(d) > 1) + 1)
        return pd.DataFrame({"streak": [max(len(r) for r in runs)]})

    streaks = guarded_map_groups(pairs, "user_id", per_user,
                                 max_group_rows=100_000)

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "streak" not in t.column_names:
            return pa.table({"streak": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        g = t.group_by(["streak"]).aggregate([("streak", "count")])
        return g.rename_columns(["streak", "n"])

    agg = driver_grouped_agg(
        streaks.map_batches(combine, batch_format="pyarrow"),
        ["streak"], {"n_users": ("n", "sum")},
    )
    agg["streak_len"] = agg["streak"].astype("int64")
    agg["n_users"] = agg["n_users"].astype("int64")
    return (agg[["streak_len", "n_users"]]
            .sort_values("streak_len").reset_index(drop=True))


BLOCKLIST = ("dup", "contraband", "forbidden")


def q_docs_blocklist(sf_dir: str):
    """C4-style blocklist gate (Raffel et al. 2020 §2.2's badwords
    filter — the one canonical corpus-release gate the funnel doesn't
    model): a doc is flagged when ANY token hits the list. Tokens via
    the shared [a-z0-9]+ kernel, membership via one pc.is_in probe
    (C kernel, no Python per token), per-lang partials fold on the
    driver; the rate is integer ppm with floor division (the mixture
    rule). The list is tiny by nature — it rides in the closure; only
    'dup' occurs in the synthetic corpus (~5% of docs), the other
    entries pin the zero-hit path."""
    from ..stages.dsir import _doc_tokens

    bl = pa.array(list(BLOCKLIST), pa.string())

    def flags(t: pa.Table) -> pa.Table:
        parents, tok = _doc_tokens(t["text"])
        flagged = np.zeros(t.num_rows, np.int64)
        if len(tok):
            hit = pc.is_in(tok, value_set=bl).to_numpy(
                zero_copy_only=False)
            flagged[np.unique(parents[hit])] = 1
        g = pa.table({
            "lang": t["lang"],
            "one": pa.array(np.ones(t.num_rows, np.int64)),
            "flagged": pa.array(flagged),
        }).group_by(["lang"]).aggregate(
            [("one", "sum"), ("flagged", "sum")])
        return g.rename_columns(["lang", "n", "n_flagged"])

    ds = _read(sf_dir, "documents", ["text", "lang"])
    agg = driver_grouped_agg(
        ds.map_batches(flags, batch_format="pyarrow"),
        ["lang"], {"n_docs": ("n", "sum"),
                   "n_flagged": ("n_flagged", "sum")},
    )
    agg["n_docs"] = agg["n_docs"].astype("int64")
    agg["n_flagged"] = agg["n_flagged"].astype("int64")
    agg["flag_ppm"] = (agg["n_flagged"] * 1_000_000
                       // agg["n_docs"]).astype("int64")
    return agg.sort_values("lang").reset_index(drop=True)


def q_parts_pareto(sf_dir: str):
    """Ranked cumulative-share (Pareto/ABC) analysis: how many parts
    cover 50/80/95% of revenue, and the top-10 parts' share. Per-part
    revenue is a distributed groupby (per-line integer cents via
    round-half-away — DuckDB round() parity, int64-exact thereafter);
    the ranked cumulative sum is the stages/prefix.py GLOBAL prefix
    scan (sort + O(blocks) boundary carry, the watermark pattern with
    SUM); thresholds compare pure int64 products so the oracle matches
    by exact integer equality."""
    from ray.data.aggregate import Sum

    from ..core.textstats import round_half_away
    from ..stages.prefix import global_prefix_sum

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount"])

    def cents(t: pa.Table) -> pa.Table:
        rev = (t["l_extendedprice"].to_numpy(zero_copy_only=False)
               * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)))
        return pa.table({
            "l_partkey": t["l_partkey"],
            "c": pa.array(round_half_away(rev * 100.0, 0).astype(np.int64)),
        })

    part_rev = (li.map_batches(cents, batch_format="pyarrow")
                .groupby("l_partkey").aggregate(Sum("c", alias_name="c")))
    scanned, total = global_prefix_sum(
        part_rev,
        order_cols=[("c", "descending"), ("l_partkey", "ascending")],
        val_col="c")

    top10 = scanned.limit(10).to_pandas()
    top10_ppm = int(top10["c"].sum()) * 1_000_000 // total

    def counts(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        prev = t["cum"].to_numpy(zero_copy_only=False).astype(np.int64) - c
        row = {"n_parts": len(c)}
        for k in (50, 80, 95):
            row[f"n_p{k}"] = int((prev * 100 < k * total).sum())
        return pa.table({kk: pa.array([vv], pa.int64())
                         for kk, vv in row.items()})

    parts = scanned.map_batches(
        counts, batch_format="pyarrow", batch_size=None).to_pandas()
    agg = parts.sum()
    return pd.DataFrame([{
        "n_parts": int(agg["n_parts"]),
        "n_p50": int(agg["n_p50"]),
        "n_p80": int(agg["n_p80"]),
        "n_p95": int(agg["n_p95"]),
        "top10_share_ppm": int(top10_ppm),
        "total_cents": int(total),
    }])


CDC_ORACLE_DIR = "/tmp/ocracle_cdc_oracle"


def q_docs_cdc_chunks(sf_dir: str):
    """Content-defined chunking census (stages.cdc, LBFS/FastCDC gear
    hash): chunk every doc at content-determined boundaries, md5 each
    chunk, report per-lang chunk counts / distinct chunks / mean
    length. The distinct-chunk census folds (lang, fp) rows on the
    driver behind driver_grouped_agg's loud 2M guard — the sf-scale
    census tool; at 100 TB distinct-counting is a groupby(fp) or the
    KMV estimator (chunking itself streams at any scale). Artifact
    oracle of the winnowing hybrid kind: the BOUNDARY
    policy is the trusted non-SQL part; everything downstream is
    re-derived — SQL re-computes every chunk's md5 from
    ``substr(text, start+1, len)`` (n_fp_match pins the engine's
    content fingerprints) and checks the exact tiling invariant per
    doc (contiguous from 0, lengths within [MIN, MAX] except a short
    final chunk, ends at len(text)) via n_tiled."""
    import shutil

    import ray.data as rd

    from ..stages.cdc import cdc_chunks

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    out_dir = f"{CDC_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    cdc_chunks(ds, keep_col="lang").write_parquet(out_dir)

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "fp"]).aggregate(
            [("fp", "count"), ("len", "sum")])
        return g.rename_columns(["lang", "fp", "n", "len_sum"])

    agg = driver_grouped_agg(
        rd.read_parquet(out_dir).map_batches(
            combine, batch_format="pyarrow"),
        ["lang", "fp"], {"n": ("n", "sum"), "len_sum": ("len_sum", "sum")},
    )
    n_docs = driver_grouped_agg(
        ds.select_columns(["lang", "doc_id"]),
        ["lang"], {"n_docs": ("doc_id", "count")},
    ).set_index("lang")["n_docs"]
    g = agg.groupby("lang")
    out = pd.DataFrame({
        "lang": np.sort(agg["lang"].unique()),
        "n_chunks": g["n"].sum().sort_index().to_numpy(np.int64),
        "n_unique_chunks": g.size().sort_index().to_numpy(np.int64),
        "avg_chunk_len": (g["len_sum"].sum() / g["n"].sum()
                          ).sort_index().round(2).to_numpy(),
    })
    out["n_docs"] = out["lang"].map(n_docs).astype("int64")
    out["n_fp_match"] = out["n_chunks"]  # SQL recomputes from substr
    out["n_tiled"] = out["n_docs"]       # SQL checks the invariant
    return (out[["lang", "n_docs", "n_chunks", "n_unique_chunks",
                 "n_fp_match", "n_tiled", "avg_chunk_len"]]
            .sort_values("lang").reset_index(drop=True))


PQSEARCH_ORACLE_DIR = "/tmp/ocracle_pqsearch_oracle"
PQ_NQ, PQ_TOPK = 4, 10


def q_emb_pq_search(sf_dir: str):
    """ADC top-k search over PQ codes (stages.pq.adc_search) — the
    query side of product quantization: per-query M-lookup distances,
    top-10 by ADC, and measured recall@10 against the exact ranking,
    all in ONE corpus scan with per-batch top-k candidates. Oracle
    trusts ONLY the trained codebook (written artifact): SQL
    re-derives code assignments, ADC tables, both rankings (tie-break
    (distance, vec_id)) and the recall from raw embeddings."""
    import shutil

    import pyarrow.parquet as _pq

    from ..stages.pq import adc_search, codebook_table, train_pq

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cb = train_pq(ds, m=PQ_M, k=PQ_K, n_iters=PQ_ITERS)
    out_dir = f"{PQSEARCH_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    _pq.write_table(codebook_table(cb), f"{out_dir}/part-0.parquet")

    qdf = ds.sort("vec_id").limit(PQ_NQ).to_pandas()
    queries = np.stack([np.asarray(v, np.float64)
                        for v in qdf["embedding"]])
    return adc_search(ds, cb, queries, k=PQ_TOPK)


def q_orders_monthly_growth(sf_dir: str):
    """Month-over-month revenue growth in integer ppm — the KPI-table
    window aggregate. Per-batch combiners -> a months-sized driver
    fold; growth = (cur − prev)·10^6 // prev in PYTHON INTEGER cents
    (exact, no float drift for the oracle's lag() to disagree with)."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def combine(t: pa.Table) -> pa.Table:
        ts = (t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        d = pd.to_datetime(ts, unit="us")
        month = (d.year * 100 + d.month).astype(np.int64)
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        g = pa.table({"month": pa.array(month),
                      "c": pa.array(cents)}).group_by(["month"]).aggregate(
            [("c", "sum")])
        return g.rename_columns(["month", "c"])

    agg = driver_grouped_agg(
        ds.map_batches(combine, batch_format="pyarrow"),
        ["month"], {"revenue_cents": ("c", "sum")},
    ).sort_values("month").reset_index(drop=True)
    agg["month"] = agg["month"].astype("int64")
    agg["revenue_cents"] = agg["revenue_cents"].astype("int64")
    prev = agg["revenue_cents"].shift(1)
    growth = []
    for cur, pv in zip(agg["revenue_cents"], prev):
        if pd.isna(pv):
            growth.append(0)
            continue
        delta = (int(cur) - int(pv)) * 1_000_000
        # DuckDB // truncates toward zero; Python // floors — match
        # the oracle on negative months
        growth.append(delta // int(pv) if delta >= 0
                      else -((-delta) // int(pv)))
    agg["growth_ppm"] = np.array(growth, np.int64)
    return agg[["month", "revenue_cents", "growth_ppm"]]


def q_events_dau_wau(sf_dir: str):
    """Stickiness (DAU/WAU): per day, distinct active users that day
    vs distinct users over the trailing 7 days, ratio in integer ppm.
    One distinct-(user, day) combiner pass; the per-day fold is
    days x users-per-day bounded... no: the trailing-7-day distinct
    union cannot be pre-aggregated per day (distinct doesn't sum), so
    the day-level resolve happens on the DEDUPED pair frame
    (users x days rows, the retention bound), guarded by
    driver_grouped_agg's 2M ceiling — the sf-scale census tool; at
    100 TB the trailing distinct becomes per-day KMV sketch merges."""
    from ..stages.retention import user_week_pairs

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    pairs = user_week_pairs(ds, week_us=DAY_US)  # (user_id, week)=day

    dd = driver_grouped_agg(
        pairs.map_batches(
            lambda t: t.append_column(
                "one", pa.array(np.ones(t.num_rows, np.int64))),
            batch_format="pyarrow"),
        ["user_id", "week"], {"n": ("one", "sum")},
    )
    days = np.sort(dd["week"].unique()).astype(np.int64)
    by_day = {int(d): set(g["user_id"])
              for d, g in dd.groupby("week")}
    rows = []
    for d in days:
        dau = len(by_day[int(d)])
        wau_set = set()
        for k in range(7):
            wau_set |= by_day.get(int(d) - k, set())
        wau = len(wau_set)
        rows.append({"day": int(d), "dau": dau, "wau": wau,
                     "stickiness_ppm": dau * 1_000_000 // wau})
    return pd.DataFrame(rows)


EMBOUT_ORACLE_DIR = "/tmp/ocracle_embout_oracle"
EMBOUT_CELLS, EMBOUT_MULT = 8, 1.1


def q_emb_outliers(sf_dir: str):
    """Embedding quality control: per k-means cell, how many vectors
    sit beyond 1.1x the cell's mean squared distance to its centroid
    (the sf embeddings are unit-normalized, so distances concentrate
    hard in 64 dims — a 2x cut can never fire; 1.1x is the live tail) —
    the mislabeled/garbage-vector screen a 100-TB embedding corpus
    runs before indexing. Two zero-shuffle passes over the broadcast
    centroids (assign+accumulate, then threshold-count); round-6 at
    every decision (distance before argmin, mean before the
    threshold). Trusted-training artifact oracle: SQL re-derives every
    assignment, mean and outlier count from raw embeddings + the
    written centroids."""
    import shutil

    import pyarrow.parquet as _pq
    import ray

    from ..stages.ivfpq import _assign_cells
    from ..stages.kmeans import lloyd_kmeans
    from ..stages.pq import _stack64

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents, _ = lloyd_kmeans(ds, k=EMBOUT_CELLS, n_iters=PQ_ITERS)
    out_dir = f"{EMBOUT_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    cc, jj = np.meshgrid(np.arange(EMBOUT_CELLS),
                         np.arange(cents.shape[1]), indexing="ij")
    _pq.write_table(pa.table({
        "cell": pa.array(cc.reshape(-1).astype(np.int64)),
        "j": pa.array(jj.reshape(-1).astype(np.int64)),
        "value": pa.array(cents.reshape(-1), pa.float64()),
    }), f"{out_dir}/part-0.parquet")
    cents_ref = ray.put(cents)

    from ..core.textstats import round_half_away

    def pass1(t: pa.Table) -> pa.Table:
        c = _cached_broadcast(cents_ref)
        v = _stack64(t["embedding"])
        d2 = round_half_away(
            ((v[:, None, :] - c[None, :, :]) ** 2).sum(-1), 6)
        cell = np.argmin(d2, axis=1)
        chosen = np.take_along_axis(d2, cell[:, None], 1)[:, 0]
        g = pa.table({
            "cell": pa.array(cell.astype(np.int64)),
            "one": pa.array(np.ones(len(v), np.int64)),
            "d2": pa.array(chosen, pa.float64()),
        }).group_by(["cell"]).aggregate([("one", "sum"), ("d2", "sum")])
        return g.rename_columns(["cell", "n", "d2_sum"])

    agg = driver_grouped_agg(
        ds.map_batches(pass1, batch_format="pyarrow"),
        ["cell"], {"n": ("n", "sum"), "d2_sum": ("d2_sum", "sum")},
    ).set_index("cell")
    thr = {int(c): round(EMBOUT_MULT * float(agg.loc[c, "d2_sum"])
                         / int(agg.loc[c, "n"]), 6)
           for c in agg.index}
    thr_ref = ray.put(thr)

    def pass2(t: pa.Table) -> pa.Table:
        c = _cached_broadcast(cents_ref)
        th = _cached_broadcast(thr_ref)
        v = _stack64(t["embedding"])
        d2 = round_half_away(
            ((v[:, None, :] - c[None, :, :]) ** 2).sum(-1), 6)
        cell = np.argmin(d2, axis=1)
        chosen = np.take_along_axis(d2, cell[:, None], 1)[:, 0]
        lim = np.array([th[int(x)] for x in cell])
        g = pa.table({
            "cell": pa.array(cell.astype(np.int64)),
            "out": pa.array((chosen > lim).astype(np.int64)),
        }).group_by(["cell"]).aggregate([("out", "sum"), ("cell", "count")])
        return g.rename_columns(["cell", "n_out", "n"])

    agg2 = driver_grouped_agg(
        ds.map_batches(pass2, batch_format="pyarrow"),
        ["cell"], {"n_out": ("n_out", "sum"), "n": ("n", "sum")},
    )
    agg2["avg_d2"] = agg2["cell"].map(
        lambda c: round(float(agg.loc[c, "d2_sum"])
                        / int(agg.loc[c, "n"]), 4))
    agg2["n_vecs"] = agg2["n"].astype("int64")
    agg2["n_outliers"] = agg2["n_out"].astype("int64")
    agg2["cell"] = agg2["cell"].astype("int64")
    return (agg2[["cell", "n_vecs", "avg_d2", "n_outliers"]]
            .sort_values("cell").reset_index(drop=True))


DIVISION_BRAND, DIVISION_SIZE_CAP = "Brand#4", 5
DIVISOR_LIMIT = 100_000  # broadcast divisor guard


def q_supplier_part_division(sf_dir: str):
    """Relational DIVISION (universal quantification — "suppliers
    that shipped EVERY small Brand#4 part"): the one classic SQL
    semantic the surface lacked. Engine shape: the divisor part set
    broadcasts (small by construction, loud-guarded); one filtered
    scan emits per-batch distinct (supplier, part) pairs; the driver
    fold dedups pairs (≤ suppliers x divisor, guarded) and ranks
    coverage. The quotient is EMPTY at every sf (best coverage 6/10 —
    measured), which both sides must derive identically; engineered
    full-coverage fixtures pin the non-empty case in tests."""
    import ray

    part = pd.read_parquet(_p(sf_dir, "part"),
                           columns=["p_partkey", "p_brand", "p_size"])
    div = part.loc[(part["p_brand"] == DIVISION_BRAND)
                   & (part["p_size"] <= DIVISION_SIZE_CAP), "p_partkey"]
    if len(div) > DIVISOR_LIMIT:
        raise RuntimeError(
            f"division: divisor has {len(div)} parts "
            f"(> {DIVISOR_LIMIT}); broadcast no longer safe")
    n_div = len(div)
    div_set = pa.array(div.astype("int64"), pa.int64())

    def pairs(t: pa.Table) -> pa.Table:
        keep = pc.is_in(pc.cast(t["l_partkey"], pa.int64()),
                        value_set=div_set)
        f = t.filter(keep)
        g = pa.table({
            "s": pc.cast(f["l_suppkey"], pa.int64()),
            "p": pc.cast(f["l_partkey"], pa.int64()),
        }).group_by(["s", "p"]).aggregate([])
        return g.append_column("one", pa.array(
            np.ones(g.num_rows, np.int64)))

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
    agg = driver_grouped_agg(
        li.map_batches(pairs, batch_format="pyarrow"),
        ["s", "p"], {"n": ("one", "sum")},
    )
    cov = (agg.groupby("s").size().rename("n_covered").reset_index()
           if not agg.empty
           else pd.DataFrame(columns=["s", "n_covered"]))
    cov["n_covered"] = cov["n_covered"].astype("int64")
    cov["s"] = cov["s"].astype("int64")
    cov["full"] = (cov["n_covered"] == n_div).astype("int64")
    out = cov.sort_values(["n_covered", "s"],
                          ascending=[False, True]).head(10)
    out = out.rename(columns={"s": "s_suppkey"})
    out["n_divisor"] = np.int64(n_div)
    return out[["s_suppkey", "n_covered", "n_divisor", "full"]
               ].reset_index(drop=True)


IVFPQ_ORACLE_DIR = "/tmp/ocracle_ivfpq_oracle"
IVFPQ_CELLS, IVFPQ_PROBE = 8, 3


def q_knn_ivfpq(sf_dir: str):
    """IVF-PQ / IVFADC (stages.ivfpq, Jégou et al. 2011 §IV): coarse
    k-means cells + PQ over RESIDUALS, search probes the 3 closest
    cells and ranks by asymmetric distance; recall@10 measured against
    the exact ranking over ALL vectors (probe misses count — that is
    the tradeoff the number reports). Trusted-training artifact
    oracle: given only the written centroids + residual codebook, SQL
    re-derives every cell assignment, residual code, probe set, ADC
    table, both rankings and the recall."""
    import shutil

    import pyarrow.parquet as _pq

    from ..stages.ivfpq import build_ivfpq, ivfpq_search
    from ..stages.pq import codebook_table

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents, cb = build_ivfpq(ds, n_cells=IVFPQ_CELLS, m=PQ_M, k=PQ_K,
                            n_iters=PQ_ITERS)
    out_dir = f"{IVFPQ_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(f"{out_dir}/cents")
    os.makedirs(f"{out_dir}/cb")
    cc, jj = np.meshgrid(np.arange(IVFPQ_CELLS), np.arange(cents.shape[1]),
                         indexing="ij")
    _pq.write_table(pa.table({
        "cell": pa.array(cc.reshape(-1).astype(np.int64)),
        "j": pa.array(jj.reshape(-1).astype(np.int64)),
        "value": pa.array(cents.reshape(-1), pa.float64()),
    }), f"{out_dir}/cents/part-0.parquet")
    _pq.write_table(codebook_table(cb), f"{out_dir}/cb/part-0.parquet")

    qdf = ds.sort("vec_id").limit(PQ_NQ).to_pandas()
    queries = np.stack([np.asarray(v, np.float64)
                        for v in qdf["embedding"]])
    return ivfpq_search(ds, cents, cb, queries,
                        n_probe=IVFPQ_PROBE, k=PQ_TOPK)


def q_events_watermark_late(sf_dir: str):
    """Watermark late-event census (stages.watermark, Flink/Beam
    semantics): events processed in arrival order, watermark =
    running-max ts − 2h, late events counted + average lateness per
    type. Arrival order is the Knuth-hash simulated shuffle (the sf
    corpus arrives exactly ts-ordered — zero late — so plain ingestion
    order would be an all-zeros oracle; engineered out-of-order
    fixtures pin the semantics in tests). One sort + a global-prefix
    boundary carry (O(blocks) driver rows, loud-guarded); lateness
    sums are int64 microseconds end to end."""
    from ..stages.watermark import late_event_census

    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type"])
    return late_event_census(ds)


PQ_ORACLE_DIR = "/tmp/ocracle_pq_oracle"
PQ_M, PQ_K, PQ_ITERS, PQ_DSUB = 8, 16, 3, 8


def q_emb_pq(sf_dir: str):
    """Product quantization (stages.pq, Jégou et al. 2011): train an
    8x16 codebook over the 64-dim embeddings (3 Lloyd iterations per
    subspace, all in ONE streaming pass per iteration), encode every
    vector to 8 codes, and report per-subspace vector counts, codes
    used, assignment matches and reconstruction error. Artifact oracle
    of the trusted-training kind (knn_ivf): codes + codebook are
    written; SQL re-derives EVERY assignment and error from the raw
    embeddings + the written codebook, so only the training itself is
    trusted."""
    import shutil

    import pyarrow.parquet as _pq
    import ray.data as rd

    from ..stages.pq import codebook_table, encode_pq, train_pq

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cb = train_pq(ds, m=PQ_M, k=PQ_K, n_iters=PQ_ITERS)

    out_dir = f"{PQ_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(f"{out_dir}/cb")
    encode_pq(ds, cb).write_parquet(f"{out_dir}/codes")
    _pq.write_table(codebook_table(cb), f"{out_dir}/cb/part-0.parquet")

    # driver row re-aggregated FROM the written files (running-sum
    # pattern): per-batch (m, code) combiners -> an m*k-bounded fold
    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["m", "code"]).aggregate(
            [("code", "count"), ("d2", "sum")])
        return g.rename_columns(["m", "code", "n", "d2_sum"])

    agg = driver_grouped_agg(
        rd.read_parquet(f"{out_dir}/codes").map_batches(
            combine, batch_format="pyarrow"),
        ["m", "code"], {"n": ("n", "sum"), "d2_sum": ("d2_sum", "sum")},
    )
    g = agg.groupby("m")
    out = pd.DataFrame({
        "m": np.sort(agg["m"].unique()).astype(np.int64),
        "n_vectors": g["n"].sum().sort_index().to_numpy(np.int64),
        "k_used": g.size().sort_index().to_numpy(np.int64),
        "sq_err": g["d2_sum"].sum().sort_index().round(4).to_numpy(),
    })
    out["n_match"] = out["n_vectors"]  # engine codes ARE its argmin;
    # the oracle recomputes the argmin externally and diverges here if
    # the engine kernel is wrong
    return out[["m", "n_vectors", "k_used", "n_match",
                "sq_err"]].reset_index(drop=True)


SUPPLIER_BROADCAST_LIMIT = 5_000_000  # rows; ~80MB of (key, nation) int64
Q5_REGION = "ASIA"
Q5_LO, Q5_HI = pd.Timestamp("1995-01-01"), pd.Timestamp("1997-01-01")


def q_local_supplier_revenue(sf_dir: str):
    """TPC-H Q5 shape — the canonical multi-way join: revenue by
    nation where the CUSTOMER and the SUPPLIER share the nation, one
    region, two-year order window.

    Plan (the 100-TB decomposition): region/nation and the supplier
    nation map ride as broadcasts (supplier is TPC-H's 600x-smaller-
    than-lineitem dimension; loud-guarded at SUPPLIER_BROADCAST_LIMIT
    — past it the local-supplier probe becomes a third hash join); the
    two genuinely large sides meet in TWO chained hash joins (orders
    filtered to the window ⋈ region-filtered customers on custkey,
    then lineitem ⋈ that on orderkey), partition count clamped and the
    aggregator CPU reservation pinned on the dataset
    (pool.clamp_join_partitions / pin_join_cpu_reservation — two
    chained 13-way joins livelocked a 4-CPU session in round 3). The
    local-supplier predicate is a zero-exchange pc.index_in probe per
    batch, and the nation aggregate folds per-batch partials."""
    import ray

    from ..pool import clamp_join_partitions, pin_join_cpu_reservation

    region = pd.read_parquet(_p(sf_dir, "region"))
    nation = pd.read_parquet(_p(sf_dir, "nation"))
    rkey = region.loc[region["r_name"] == Q5_REGION, "r_regionkey"].iloc[0]
    nat = nation[nation["n_regionkey"] == rkey]
    nat_name = dict(zip(nat["n_nationkey"].astype("int64"), nat["n_name"]))
    nat_set = pa.array(sorted(nat_name), pa.int64())

    supp = pd.read_parquet(_p(sf_dir, "supplier"),
                           columns=["s_suppkey", "s_nationkey"])
    if len(supp) > SUPPLIER_BROADCAST_LIMIT:
        raise RuntimeError(
            f"q_local_supplier_revenue: supplier has {len(supp)} rows "
            f"(> {SUPPLIER_BROADCAST_LIMIT}); broadcast probe no longer "
            f"safe — add a third hash join on l_suppkey instead"
        )
    supp_ref = ray.put((
        pa.array(supp["s_suppkey"].astype("int64"), pa.int64()),
        supp["s_nationkey"].to_numpy(np.int64),
    ))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cust = cust.map_batches(
        lambda t: t.filter(
            pc.is_in(pc.cast(t["c_nationkey"], pa.int64()), value_set=nat_set)
        ),
        batch_format="pyarrow",
    )

    lo = pa.scalar(Q5_LO, pa.timestamp("us"))
    hi = pa.scalar(Q5_HI, pa.timestamp("us"))
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                    pc.less(t["o_orderdate"], hi))
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )

    n_parts = clamp_join_partitions(8, n_joins=2)
    ord_cust = orders.join(
        cust, join_type="inner", num_partitions=n_parts,
        on=("o_custkey",), right_on=("c_custkey",),
    )
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    joined = li.join(
        ord_cust, join_type="inner", num_partitions=n_parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    joined = pin_join_cpu_reservation(joined, n_parts, n_joins=2)

    def local_rev(t: pa.Table) -> pa.Table:
        keys, s_nat = _cached_broadcast(supp_ref)
        idx = pc.index_in(pc.cast(t["l_suppkey"], pa.int64()),
                          value_set=keys).to_numpy(zero_copy_only=False)
        miss = np.isnan(idx) if idx.dtype.kind == "f" else np.zeros(
            len(idx), bool)
        safe = np.where(miss, 0, idx).astype(np.int64)
        sn = np.where(miss, -1, s_nat[safe])
        cn = pc.cast(t["c_nationkey"], pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = sn == cn
        rev = pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"]),
        ).to_numpy(zero_copy_only=False)
        return pa.table({
            "nationkey": pa.array(cn[keep], pa.int64()),
            "rev": pa.array(rev[keep], pa.float64()),
        })

    out = driver_grouped_agg(
        joined.map_batches(local_rev, batch_format="pyarrow"),
        ["nationkey"], {"revenue": ("rev", "sum")},
    )
    out["n_name"] = out["nationkey"].map(nat_name)
    out["revenue"] = out["revenue"].round(2)
    return (out[["n_name", "revenue"]]
            .sort_values(["revenue", "n_name"], ascending=[False, True])
            .reset_index(drop=True))


def q_docs_dsir(sf_dir: str):
    """DSIR importance weights (stages.dsir, Xie et al. 2023): hashed
    bag-of-words importance of every doc against the lang='en' target
    slice. The FNV-1a bucket space is FIXED (4096), so the model fold
    is bounded by construction — the published hashing trick replacing
    the explicit-vocab guards of the LM ops; the oracle re-derives
    every hash, both smoothed distributions and every per-doc weight
    in SQL."""
    from ..stages.dsir import (dsir_bucket_counts, dsir_lambda,
                               dsir_score_by_lang)

    ds = _read(sf_dir, "documents", ["text", "lang"])
    model = dsir_bucket_counts(ds)
    return dsir_score_by_lang(ds, dsir_lambda(model))


def q_events_retention(sf_dir: str):
    """Weekly cohort retention matrix (stages.retention): users
    bucketed by first-seen week; n_users = distinct users of that
    cohort active k weeks later. Zero joins — the per-user cohort min
    is local to the one guarded groupby group (bounded by
    blocks x calendar-weeks, not events); the matrix is weeks²-sized
    so the final fold is driver-safe by construction."""
    from ..stages.retention import retention_matrix

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return retention_matrix(ds)


KMEANS_K, KMEANS_ITERS = 8, 4


def q_emb_kmeans(sf_dir: str):
    """Distributed Lloyd k-means (stages.kmeans) — the trainer that
    knn_ivf/emb_semantic_dedup previously TRUSTED is now itself
    oracled: a generated unrolled SQL re-executes every iteration
    (round-6 distances before argmin with lowest-cell ties, round-6
    centroid means, empty-cell coalesce), so the assignment map is
    verified, not assumed. One streaming pass per iteration against
    broadcast centroids; k·(dim+1) partials only."""
    from ..stages.kmeans import kmeans_cells

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_cells(ds, k=KMEANS_K, n_iters=KMEANS_ITERS)


ZORDER_DIR = "/tmp/ocracle_zorder"
ZBOX = dict(ts_lo="2024-01-08T00:00:00", ts_hi="2024-01-20T00:00:00",
            key_lo=100, key_hi=300)


def q_events_box_pruned(sf_dir: str):
    """Z-order clustering + 2-D zone-map pruning (stages.zonemap):
    rows sorted along the Morton curve of (user_id, day) into bounded
    files whose footer-stat bounding BOXES prune a (time × user) box
    predicate on BOTH dimensions — the Delta/Iceberg OPTIMIZE ZORDER
    technique (a day layout opens every file for the user range). The
    oracle re-answers the box aggregate over RAW events: layout,
    curve, manifest, pruning and residual verified end-to-end."""
    from ..stages.zonemap import box_aggregate, build_zordered

    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type", "value"])
    store = f"{ZORDER_DIR}/current"
    build_zordered(ds, store, target_rows_per_file=1024)
    return box_aggregate(store, **ZBOX)


SEMDEDUP_ORACLE_DIR = "/tmp/ocracle_semdedup_oracle"


def q_emb_semantic_dedup(sf_dir: str):
    """SemDeDup (stages.semdedup): k-means cells + within-cell cosine
    dedup — the published semantic-dedup recipe (cells bound the
    quadratic pair search; cross-cell misses are the paper's stated
    approximation). Artifact-oracled the knn_ivf way: the (vec_id,
    cell) assignment is written before returning, and DuckDB
    re-derives the within-cell pairs from the raw embeddings, the
    components (recursive CTE) and the per-cell stats — only the
    k-means assignment is trusted."""
    from ..stages.semdedup import semantic_dedup_stats

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semantic_dedup_stats(
        ds, n_cells=8, threshold=0.35,
        artifact_dir=f"{SEMDEDUP_ORACLE_DIR}/current",
    )


def q_events_conversion_funnel(sf_dir: str):
    """Ordered-sequence funnel (stages.sequence): users completing
    view -> click -> purchase IN ORDER (each step strictly after the
    user's earliest completion of the previous one) — CEP-lite, a
    different operator from sessions/as-of because the predicate
    chains across rows per key. One filtered combiner-fed groupby-min
    per step against the broadcast previous-step thresholds; the
    oracle chains the same mins in SQL."""
    from ..stages.sequence import conversion_steps

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    return conversion_steps(ds)


BPE_N_MERGES = 8


def q_docs_bpe_merges(sf_dir: str):
    """BPE merge discovery (stages.bpe): the tokenizer-training pass.
    The corpus-scale part is ONE streaming word-count fold (per-batch
    combiners, loud MAX_BPE_VOCAB guard — BPE trains on the word dict,
    per the published algorithm); the greedy merge rounds then run
    closed-form on the folded dict. The DuckDB oracle re-derives the
    word counts AND re-executes every round (generated, unrolled SQL —
    double-space symbol joins make replace() exactly the left-to-right
    non-overlapping merge rule)."""
    from ..stages.bpe import bpe_merges, word_counts

    ds = _read(sf_dir, "documents", ["text"])
    return bpe_merges(word_counts(ds), BPE_N_MERGES)


def q_docs_langid(sf_dir: str):
    """Lang-id stage over documents: predicted-vs-labelled confusion
    counts. ORACLED since round 2: the DuckDB mirror is generated from
    the same stopword tables (``_langid_oracle_sql``), including the
    CJK shortcut and the argmax table-order tiebreak."""
    from ray.data.aggregate import Count

    from ..stages.text import annotate_text

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    return (
        annotate_text(ds)
        .groupby(["lang", "lang_pred"])
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas()
    )


WINNOW_ORACLE_DIR = "/tmp/ocracle_winnow_oracle"


def q_docs_winnowing(sf_dir: str):
    """Rolling-hash (winnowing/MOSS) fingerprint stats per lang.

    Oracled since round 4 (hybrid artifact oracle): the query writes
    the per-doc Rabin-Karp GRAM-HASH SEQUENCE — the input the winnowing
    selection runs over, via the same ``winnowing_gram_hashes`` call —
    to a deterministic parquet path, and the oracle SQL INDEPENDENTLY
    re-implements the selection itself (rightmost-min per w-window via
    a combined ``h*2^22 + (2^22-1-pos)`` MIN over a window frame,
    consecutive-position dedup via lag) plus both small-doc branches.
    Only the rolling-hash arithmetic (no SQL mirror) is trusted from
    the artifact; the window-min algorithm is verified every round."""
    import shutil

    from ..core.textstats import winnowing_fingerprints, winnowing_gram_hashes

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def gram_rows(t: pa.Table) -> pa.Table:
        doc_ids, langs, poss, hs, kinds = [], [], [], [], []
        for did, lang, text in zip(
            t["doc_id"].to_pylist(), t["lang"].to_pylist(), t["text"].to_pylist()
        ):
            kind, hashes = winnowing_gram_hashes(text or "")
            if kind == "empty":
                doc_ids.append(did); langs.append(lang)
                poss.append(-2); hs.append(None); kinds.append("empty")
            elif kind == "fallback":
                doc_ids.append(did); langs.append(lang)
                poss.append(-1); hs.append(hashes[0]); kinds.append("fallback")
            else:
                doc_ids.extend([did] * len(hashes))
                langs.extend([lang] * len(hashes))
                poss.extend(range(len(hashes)))
                hs.extend(hashes)
                kinds.extend(["gram"] * len(hashes))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "pos": pa.array(poss, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
            }
        )

    out_dir = f"{WINNOW_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.map_batches(gram_rows, batch_format="pyarrow").write_parquet(out_dir)

    def add(t: pa.Table) -> pa.Table:
        fps = [winnowing_fingerprints(x) for x in t["text"].to_pylist()]
        return pa.table(
            {
                "lang": t["lang"],
                "n_fp": pa.array([len(f) for f in fps], pa.int64()),
                "n_fp_distinct": pa.array([len(set(f)) for f in fps], pa.int64()),
            }
        )

    return driver_grouped_agg(
        ds.map_batches(add, batch_format="pyarrow"),
        ["lang"],
        {
            "n_docs": ("n_fp", "count"),
            "total_fp": ("n_fp", "sum"),
            "total_fp_distinct": ("n_fp_distinct", "sum"),
        },
    )


def q_docs_wildcard_sources(sf_dir: str):
    """M22 wildcard matching in-pipeline: docs whose source matches the
    'SRCX' joker pattern (X = any single char), counted per source."""
    from ray.data.aggregate import Count

    from ..core.subject import wildcard_match

    ds = _read(sf_dir, "documents", ["source"])

    def pick(t: pa.Table) -> pa.Table:
        mask = pa.array([wildcard_match("SRCX", s) for s in t["source"].to_pylist()])
        return t.filter(mask)

    return (
        ds.map_batches(pick, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas()
    )


def q_docs_samples(sf_dir: str):
    """Both deterministic samplers in ONE driver row (registry
    consolidation, VERDICT r2 #1):

    - ``hash_mod10``: keep docs whose id hashes into bucket 0 of 10 —
      reproducible at any parallelism, unlike random_sample;
    - ``stratified10pct``: EXACT-QUOTA stratified sampling — each
      language stratum keeps exactly ceil(10% of its size) members,
      the ones ranking smallest by a Knuth multiplicative hash of
      doc_id (uint64 wraparound arithmetic, mirrored by an
      overflow-free mod-2^31 form in SQL; ties by doc_id — assumes
      non-negative doc_ids), so the DuckDB oracle reproduces the
      exact member set and small strata are never under-represented.
      groupby(lang).map_groups is the Ray form of SQL's per-partition
      window rank; parallelism-independent.

    Output: (method, lang, n_sampled, chars_sampled) per-stratum
    aggregates of each sampler's kept set, oracled via UNION ALL."""
    import numpy as np

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def pick_hash(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        mod = _pc.subtract(
            t["doc_id"], _pc.multiply(_pc.divide(t["doc_id"], 10), 10)
        )
        return t.filter(_pc.equal(mod, 0))

    hash_agg = driver_grouped_agg(
        ds.map_batches(pick_hash, batch_format="pyarrow"),
        ["lang"],
        {"n_sampled": ("doc_id", "count"), "chars_sampled": ("n_chars", "sum")},
    )
    hash_agg.insert(0, "method", "hash_mod10")

    def pick_stratum(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # uint64 wraparound multiply, mirrored by UBIGINT in the oracle:
        # int64 would wrap differently (and BIGINT SQL would overflow)
        # once doc_id exceeds ~3.5e9 (review r3)
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2147483648)
        quota = int(np.ceil(0.1 * len(ids)))
        order = np.lexsort((ids, h))
        keep = np.zeros(len(ids), dtype=bool)
        keep[order[:quota]] = True
        return g.filter(pa.array(keep))

    strat = ds.groupby("lang").map_groups(pick_stratum, batch_format="pyarrow")
    strat_agg = driver_grouped_agg(
        strat,
        ["lang"],
        {"n_sampled": ("doc_id", "count"), "chars_sampled": ("n_chars", "sum")},
    )
    strat_agg.insert(0, "method", "stratified10pct")

    out = pd.concat([hash_agg, strat_agg], ignore_index=True)
    return out.sort_values(["method", "lang"]).reset_index(drop=True)


def q_docs_numeric_sort(sf_dir: str):
    """Numeric-aware sort (G5, object_handling.py:241-246 key) over the
    distinct sources; rank materialized so the order is hash-visible."""
    ds = _read(sf_dir, "documents", ["source"])
    values = ds.unique("source")  # distinct (shuffle); small result
    distinct = sorted(values, key=task_sort_key)
    return pd.DataFrame({"source": distinct, "rk": range(1, len(distinct) + 1)})


# --------------------------------------------------------------------------
# embeddings: similarity search
# --------------------------------------------------------------------------


def _query_vec(sf_dir: str) -> np.ndarray:
    """Query vector (vec_id 0) via a column- and row-filtered read —
    never load the whole embeddings table onto the driver."""
    import pyarrow.parquet as _pq

    t = _pq.read_table(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", 0)],
    )
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


def q_knn_bruteforce(sf_dir: str):
    """Brute-force cosine top-k (similarity-search baseline): query
    vector broadcast once, per-batch numpy matmul, per-batch top-k
    candidates, tiny global resolve on the driver."""
    import ray

    q = _query_vec(sf_dir)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)
    K = 10

    class TopK:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            cos = (mat @ self.q) / norms
            keep = np.argsort(-cos)[: K + 1]  # +1 in case self is in batch
            return pa.table(
                {"vec_id": pa.array(ids[keep], pa.int64()),
                 "cosine": pa.array(cos[keep], pa.float64())}
            )

    cand = (
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(TopK, batch_format="pyarrow", batch_size=512, concurrency=2)
        .to_pandas()
    )
    cand = cand[cand["vec_id"] != 0].sort_values(
        ["cosine", "vec_id"], ascending=[False, True]
    ).head(K)
    cand["cosine"] = cand["cosine"].round(6)
    return cand.reset_index(drop=True)


IVF_ORACLE_DIR = "/tmp/ocracle_ivf_oracle"


def q_knn_ivf(sf_dir: str):
    """IVF search, both probe regimes on ONE index (registry
    consolidation, VERDICT r2 next-round #1 — the old knn_ivf_fullprobe
    entry duplicated knn_bruteforce's oracle):

    - full probe (n_probe = n_cells) is exhaustive and must EQUAL brute
      force — asserted in-query, so a violation turns this driver row
      into an error instead of silently passing;
    - partial probe (the scale path) returns the rows with the recall
      vs brute force carried on every row.

    Artifact-oracled since round 4: the query writes the per-vector
    (cell, probed) assignment to parquet, and the oracle SQL
    re-executes the PARTIAL-PROBE SEARCH itself — cosine scoring over
    the real ``embeddings`` view restricted to probed cells, top-k
    with the (cosine DESC, vec_id ASC) tie-break, rank, and the recall
    against an in-SQL brute force — independently of the Ray search
    path. Only the k-means cell assignment (no SQL mirror) is trusted
    from the artifact."""
    import shutil

    from ..stages.knn import IvfIndex, _unit

    q = _query_vec(sf_dir)
    n_cells, n_probe, K = 8, 2, 10
    idx = IvfIndex(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), n_cells=n_cells
    )
    brute = q_knn_bruteforce(sf_dir)

    full = idx.search(q, k=K + 1, n_probe=n_cells)  # k+1: self is included
    full = full[full["vec_id"] != 0].head(K).reset_index(drop=True)
    if list(full["vec_id"]) != list(brute["vec_id"]) or not np.allclose(
        full["cosine"], brute["cosine"], atol=1e-9
    ):
        raise RuntimeError(
            "knn_ivf: full-probe IVF diverged from brute force — the "
            "exhaustive path must be exact"
        )

    # cell-assignment artifact: probe derived with the same expression
    # search() uses, so the oracle probes the same cells
    qn = _unit(np.atleast_2d(q))[0]
    probe = np.argsort(-(idx.centroids @ qn))[:n_probe].astype(np.int32)

    def cellmap(t: pa.Table) -> pa.Table:
        cells = t["cell"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vec_id": pc.cast(t["vec_id"], pa.int64()),
                "cell": pa.array(cells.astype(np.int64), pa.int64()),
                "probed": pa.array(np.isin(cells, probe)),
            }
        )

    out_dir = f"{IVF_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    idx.tagged.map_batches(cellmap, batch_format="pyarrow").write_parquet(out_dir)

    out = idx.search(q, k=K + 1, n_probe=n_probe)
    out = out[out["vec_id"] != 0].head(K).reset_index(drop=True)
    exact = set(brute["vec_id"])
    recall = round(len(set(out["vec_id"]) & exact) / max(len(exact), 1), 4)
    out["rank"] = (out.index + 1).astype("int64")
    out["n_probe"] = np.int64(n_probe)
    out["recall_vs_brute"] = recall
    return out


def q_events_heavy_hitters(sf_dir: str):
    """Heavy hitters over events.event_type via the mergeable
    Misra-Gries sketch (core.sketch.MisraGries): one k-counter sketch
    per batch (map), driver merge (sketches are ≤ k entries), then an
    EXACT recount of the candidate set in a second pruned pass. The MG
    guarantee (candidates ⊇ every value with count > n/(k+1)) makes
    the final thresholded output exactly SQL's HAVING count(*) >
    n/(k+1) — sketch-discovered, oracle-verified. (Pruning/merge under
    adversarial streams is exercised in tests/test_sketch.py; the
    fixture's key distribution is too flat to force it here.)"""
    import ray

    from ..broadcast import cached_get
    from ..stages.skew import hot_key_sketch

    K = 7  # threshold n/8: every ≥12.5% event_type is a heavy hitter
    ds = _read(sf_dir, "events", ["event_type"])

    # shared sketch pass (stages.skew.hot_key_sketch): vectorized
    # value_counts per batch, tree-merged so the driver folds O(16)
    # summaries, not one per block; drop_nulls=False keeps a null
    # event_type as its own value (SQL groups NULL too). Merge order
    # can vary counter VALUES but never the superset guarantee, and
    # the exact recount below makes the final output order-invariant.
    merged = hot_key_sketch(ds, "event_type", mg_k=K, drop_nulls=False)
    n_total = merged.n
    cand_ref = ray.put(pa.array(merged.candidates(), pa.string()))

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["event_type"], value_set=cached_get(cand_ref)))

    counts = driver_grouped_agg(
        ds.map_batches(pick, batch_format="pyarrow"),
        ["event_type"],
        {"n_events": ("event_type", "count")},
    )
    out = counts[counts["n_events"] > n_total / (K + 1)]
    return out.sort_values(["n_events", "event_type"], ascending=[False, True]).reset_index(
        drop=True
    )


def q_embeddings_label_stats(sf_dir: str):

    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def first_dim(t: pa.Table) -> pa.Table:
        mat = t["embedding"].to_pandas()
        first = pa.array([float(v[0]) for v in mat], pa.float64())
        return pa.table({"label": t["label"], "dim0": first})

    out = driver_grouped_agg(
        ds.map_batches(first_dim, batch_format="pyarrow"),
        ["label"],
        {"n_vecs": ("dim0", "count"), "sum_dim0": ("dim0", "sum")},
    )
    out["sum_dim0"] = out["sum_dim0"].round(4)
    return out


# --------------------------------------------------------------------------
# join family: hash join (both sides large), semi/anti, as-of, top-k/group
# --------------------------------------------------------------------------

def q_orders_lineitem_revenue(sf_dir: str):
    """Both-sides-large hash join (Dataset.join, hash-partitioned on the
    key) -> grouped aggregate. The lineitem side is pre-aggregated to
    one row per orderkey BEFORE the join (combiner pattern) so the join
    moves |orders| + |distinct orderkeys| rows, not raw lineitems."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def add_rev(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev": rev})

    li_agg = (
        li.map_batches(add_rev, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rev", alias_name="rev"))
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = orders.join(
        li_agg,
        join_type="inner",
        num_partitions=8,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )
    out = (
        joined.groupby("o_orderpriority")
        .aggregate(Sum("rev", alias_name="revenue"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(2)
    return out


def q_customers_without_big_orders(sf_dir: str):
    """Anti join (left_anti, hash-partitioned): customers with no order
    above 400k (threshold keeps the result non-empty at every sf)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    big = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.select(["o_custkey"]).filter(
            pc.greater(t["o_totalprice"], pa.scalar(400000.0))
        ),
        batch_format="pyarrow",
    )
    out = cust.join(
        big,
        join_type="left_anti",
        num_partitions=8,
        on=("c_custkey",),
        right_on=("o_custkey",),
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"c_custkey": pd.Series(dtype="int64"), "c_name": pd.Series(dtype="object")}
        )
    return out.sort_values("c_custkey").reset_index(drop=True)


def q_parts_in_lineitem(sf_dir: str):
    """Semi join via broadcast key set (ray_guide semi-join pattern):
    parts that appear in lineitem, counted per brand."""
    import ray

    used = _read(sf_dir, "lineitem", ["l_partkey"]).unique("l_partkey")
    used_ref = ray.put(pa.array(sorted(used), pa.int64()))

    def pick(t: pa.Table) -> pa.Table:
        keys = _cached_broadcast(used_ref)
        return t.filter(pc.is_in(t["p_partkey"], value_set=keys))

    return driver_grouped_agg(
        _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
            pick, batch_format="pyarrow"
        ),
        ["p_brand"],
        {"n_parts": ("p_partkey", "count")},
    )


def q_events_asof_prev_click(sf_dir: str):
    """As-of join (SURVEY.md custom-operator rule (a)): for each
    purchase, the most recent STRICTLY-prior click by the same user.
    BOUNDARY-CARRY form (stages/asof.py, round 3): per-block resolution
    + segment (c1, c0) click carries + a hash join for
    boundary-crossing purchases — no per-user group materialization
    anywhere, so the old 'one user's events fit a worker' guard is
    gone rather than merely loud. Round 4 (VERDICT r3 #4): the
    per-purchase result streams to PARTITIONED PARQUET (never through
    the driver, the running_sum pattern); the driver row is a per-user
    summary (count + id checksums) aggregated FROM the written files,
    and the oracle aggregates DuckDB's ASOF JOIN the same way."""
    import shutil
    import tempfile

    from ..stages.asof import asof_to_parquet

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    out_dir = tempfile.mkdtemp(prefix="asof_", dir="/tmp")
    try:
        out = asof_to_parquet(ds, out_dir)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return out.sort_values("user_id").reset_index(drop=True)


def q_events_props_k(sf_dir: str):
    """JSON property extraction (scalar parser kernel) + grouped stats."""
    import json

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def parse(t: pa.Table) -> pa.Table:
        ks = pa.array(
            [int(json.loads(p)["k"]) for p in t["props"].to_pylist()], pa.int64()
        )
        return pa.table({"event_type": t["event_type"], "k": ks})

    return driver_grouped_agg(
        ds.map_batches(parse, batch_format="pyarrow"),
        ["event_type"],
        {"sum_k": ("k", "sum"), "n_events": ("k", "count")},
    )


def q_distinct_counts(sf_dir: str):
    """Two distinct-count operators in one driver row (merged from
    ``union_distinct_keys`` + ``events_distinct_users_kmv`` to keep the
    registry at the driver's 50-entry correctness cap while adding the
    range join, round 3 — both computations and both checks survive):

    - ``n_keys``: union + distinct set-op — distinct count of order
      custkeys ∪ customer keys (exact, ``Dataset.union().unique()``);
    - ``n_users``: KMV sketch distinct-count of event user_ids. The
      sketch is EXACT while true distinct < k, so k=65536 keeps this
      oracled against COUNT(DISTINCT) at every fixture sf (users scale
      ~15k/sf-unit; a k=1024 first cut diverged at sf0.1, caught by
      review). Beyond k it degrades gracefully (rows-only territory;
      memory stays ≤ 8·k bytes per sketch);
    - ``n_users_type``: GROUPED distinct (``kmv_distinct_by``) —
      per-batch per-group KMV partials are the only thing shuffled
      (<= 8·k bytes per (group, block), never the values), folded by a
      tiny groupby whose group size is bounded by the block count.
      Same exact-below-k contract, so oracled against
      COUNT(DISTINCT) GROUP BY.

    One row per event_type; the two global counts ride every row as
    constant columns (the driver hashes all values either way)."""
    from ..core.sketch import kmv_distinct_by, kmv_distinct_estimate

    a = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        lambda t: pa.table({"key": t["o_custkey"]}), batch_format="pyarrow"
    )
    b = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: pa.table({"key": t["c_custkey"]}), batch_format="pyarrow"
    )
    n = len(a.union(b).unique("key"))
    est = kmv_distinct_estimate(_read(sf_dir, "events", ["user_id"]), "user_id", k=65536)
    per_type = (
        kmv_distinct_by(
            _read(sf_dir, "events", ["event_type", "user_id"]),
            "event_type",
            "user_id",
            k=65536,
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out = pd.DataFrame(
        {
            "event_type": per_type["event_type"],
            "n_users_type": per_type["n_distinct"].round().astype("int64"),
        }
    )
    out["n_keys"] = n
    out["n_users"] = int(round(est))
    return out


def q_events_range_join_views(sf_dir: str):
    """Range join (interval predicate): for every click, the number of
    views by the same user in the trailing hour (inclusive both ends).
    Time-bucket co-partitioned — rights replicated to exactly two
    window-width buckets, one groupby shuffle (`stages/range_join.py`);
    no per-user history materialization."""
    from ..stages.range_join import range_join_count

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return range_join_count(
        ds,
        left_type="click",
        right_type="view",
        window=pd.Timedelta(hours=1),
        out_col="n_views_1h",
    )


def q_top_users_per_event_type(sf_dir: str):
    """Top-3 users per event_type by summed value (windowed top-k per
    group: grouped agg then per-group head)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "user_id", "value"])
    per_user = (
        ds.groupby(["event_type", "user_id"])
        .aggregate(Sum("value", alias_name="total_value"))
    )

    def top3(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["total_value", "user_id"], ascending=[False, True]).head(3)
        g["rk"] = range(1, len(g) + 1)
        return g

    out = (
        per_user.groupby("event_type")
        .map_groups(top3, batch_format="pandas")
        .to_pandas()
    )
    out["total_value"] = out["total_value"].round(4)
    return out


# --------------------------------------------------------------------------
# dedup family (scale addenda)
# --------------------------------------------------------------------------

def q_docs_ngram_neardup(sf_dir: str):
    """Brute-force n-gram Jaccard near-dup pairs (threshold 0.8) — the
    exact baseline the MinHash path approximates."""
    from ..stages.dedup import ngram_jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_pairs(ds, "doc_id", "text", threshold=0.8, n_buckets=1)


def q_docs_minhash_neardup(sf_dir: str):
    """MinHash+LSH near-dup pairs (128 perms, 32 bands -> recall for
    j>=0.8 is 1 - (1-0.8^4)^32 ≈ 1-3e-14: equal to the exact oracle in
    practice), verified by exact Jaccard."""
    from ..stages.dedup import minhash_lsh_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_lsh_pairs(
        ds, "doc_id", "text", threshold=0.8, n_perm=128, n_bands=32
    )


def q_docs_incremental_neardup(sf_dir: str):
    """STREAMING near-dup: documents arrive as two partitions appended
    to a persistent LSH ``BandIndex`` (new docs are banded once and
    joined against the index's key-only band rows — old texts never
    re-read); the union of per-step candidates is then exact-Jaccard
    verified. Must equal the one-shot ``docs_minhash_neardup`` result,
    so it shares that query's shingle-join ORACLE — the incremental
    path is correctness-gated every round."""
    import shutil
    import tempfile

    from ..stages.dedup import verify_candidate_pairs
    from ..stages.dedup_index import BandIndex

    # one object-store copy: ds is consumed by both splits AND the
    # verifier's text pass (three scans of the lazy read otherwise)
    ds = _read(sf_dir, "documents", ["doc_id", "text"]).materialize()
    mid = ds.count() // 2

    def split(lo: bool):
        op = (lambda c: pc.less(c, mid)) if lo else (lambda c: pc.greater_equal(c, mid))
        return ds.map_batches(
            lambda t, _op=op: t.filter(_op(t["doc_id"])), batch_format="pyarrow"
        )

    tmp = tempfile.mkdtemp(prefix="ocr_bandindex_")
    try:
        idx = BandIndex(tmp, n_perm=128, n_bands=32, max_bucket=64)
        # Dataset lane (round 4): per-step candidates stay in the
        # object store; both steps' materialized pair Datasets union
        # without ever landing on the driver
        p1 = idx.add_partition_ds(split(True), key="doc_id", text="text")
        p2 = idx.add_partition_ds(split(False), key="doc_id", text="text")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    cand = p1.union(p2)
    # the shared verifier: same gather/distributed dispatch, rounding
    # and threshold as the one-shot query — parity by construction
    return verify_candidate_pairs(ds, "doc_id", "text", cand, k_shingle=3, threshold=0.8)


SIMHASH_ORACLE_DIR = "/tmp/ocracle_simhash_oracle"


def q_docs_simhash_dups(sf_dir: str):
    """SimHash near-dup pairs at hamming<=3 via the pigeonhole band
    trick (VERDICT r2 #6). Oracled since round 4: the query writes each
    doc's simhash64 (as int64) to a deterministic parquet path, and the
    oracle SQL INDEPENDENTLY re-derives the full pair set as an exact
    all-pairs ``bit_count(xor(...)) <= 3`` self-join over the written
    hashes — DuckDB's brute force verifies the band trick's exactness
    claim every round (this replaces the old self-measured
    ``recall_vs_brute`` column, which trusted the same process that
    made the claim). Only the token-multiset hashing itself (no SQL
    mirror) is trusted from the artifact.

    ``max_bucket`` is raised past any driver-scale bucket so the exact
    all-pairs path always runs here; the production default keeps the
    star degradation for mega-buckets at 100-TB scale, which is a
    documented completeness tradeoff this oracle intentionally does
    not model."""
    import shutil

    from ..core.dedup import simhash
    from ..stages.dedup import simhash_neardup_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = simhash_neardup_pairs(
        ds, "doc_id", "text", max_hamming=3, max_bucket=1_000_000_000
    )

    # per-doc hash artifact for the oracle: text never leaves the
    # workers; only (doc_id, simhash) is written
    def hash_rows(t: pa.Table) -> pa.Table:
        hs = np.array(
            [simhash(x or "") for x in t["text"].to_pylist()], dtype=np.uint64
        )
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "simhash": pa.array(hs.astype(np.int64), pa.int64()),
            }
        )

    out_dir = f"{SIMHASH_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.map_batches(hash_rows, batch_format="pyarrow").write_parquet(out_dir)

    out = pairs[["a", "b", "hamming"]].astype("int64")
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_docs_neardup_clusters(sf_dir: str):
    """Near-dup clustering: MinHash-LSH pairs -> connected components;
    each doc in a cluster mapped to its min-doc_id representative."""
    from ..stages.dedup import minhash_lsh_pairs, neardup_clusters_from_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_lsh_pairs(ds, "doc_id", "text", threshold=0.8, n_bands=32)
    out = neardup_clusters_from_pairs(pairs)
    return out.rename(columns={"key": "doc_id"})


def q_emb_label_neardup(sf_dir: str):
    """Same-label cosine pairs >= 0.4 via co-partitioned (groupby label)
    in-group vectorized matmul — the 'both sides large, co-located key'
    join pattern."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def pairs(group: pa.Table) -> pa.Table:
        ids = np.asarray(group["vec_id"].to_pylist(), dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        # float64 compute; the oracle casts to DOUBLE[] so both sides
        # agree to ~1e-15 (DuckDB's native list<float> path accumulates
        # in f32 sequentially and cannot match blocked numpy sums)
        mat = np.stack(group["embedding"].to_pandas().to_numpy()).astype(np.float64)[order]
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        cos = unit @ unit.T
        ii, jj = np.triu_indices(len(ids), k=1)
        vals = cos[ii, jj]
        mask = vals >= 0.4
        return pa.table(
            {
                "a": pa.array(ids[ii[mask]], pa.int64()),
                "b": pa.array(ids[jj[mask]], pa.int64()),
                "cosine": pa.array(np.round(vals[mask], 6), pa.float64()),
            }
        )

    return (
        ds.groupby("label").map_groups(pairs, batch_format="pyarrow").to_pandas()
    )


# --------------------------------------------------------------------------
# flagship extraction (rows-only check — pages table is synthesized)
# --------------------------------------------------------------------------

FLAGSHIP_ORACLE_DIR = "/tmp/ocracle_flagship_oracle"


def q_extract_flagship(sf_dir: str):
    """Flagship pages->records pipeline at the sf matching ``sf_dir``.

    The pages table is synthesized deterministically (FIXTURES.md T1),
    so no driver view can mirror the EXTRACTION itself — but the
    ARTIFACT can be oracled (VERDICT r3 #6, round 4): the per-record
    summary is written to parquet at a deterministic path, the driver
    row is per-(lang, branch) aggregate invariants (record count,
    block/task/points/char sums, fingerprint XOR) computed BY RAY from
    the WRITTEN files, and ``oracle_sql`` computes the same aggregates
    in DuckDB via ``read_parquet`` over that path — rows+schema+hash
    now verify the artifact instead of a rows-only check. XOR of the
    per-record text fingerprints pins the extracted bytes: one flipped
    character anywhere changes the group's fp_xor."""
    import shutil

    import ray.data as rd

    from ..sources.pages import n_docs_for_sf, sf_of_dir, generate_pages_dataset
    from .extraction import extract_records

    sf = sf_of_dir(sf_dir)
    n = min(2000, n_docs_for_sf(sf))
    recs = extract_records(generate_pages_dataset(n), concurrency=2)

    def summarize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "lang": t["lang"],
                "branch": t["branch"],
                "n_blocks": t["n_blocks"],
                "n_tasks": t["n_tasks"],
                "points_total": t["points_total"],
                "text_fingerprint": t["text_fingerprint"],
                "n_chars": pa.array(
                    [len(x) for x in t["extracted_text"].to_pylist()], pa.int64()
                ),
            }
        )

    # FIXED path (not sf-keyed): oracle_sql is a static string, and
    # the query always runs before its oracle reads — the artifact on
    # disk is whatever sf the current comparison is running at
    out_dir = f"{FLAGSHIP_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    recs.map_batches(summarize, batch_format="pyarrow").write_parquet(out_dir)

    # aggregate FROM the written artifact (what the oracle reads)
    written = rd.read_parquet(out_dir)
    base = driver_grouped_agg(
        written,
        ["lang", "branch"],
        {
            "n_records": ("url", "count"),
            "n_blocks_sum": ("n_blocks", "sum"),
            "n_tasks_sum": ("n_tasks", "sum"),
            "points_sum": ("points_total", "sum"),
            "n_chars_sum": ("n_chars", "sum"),
        },
    )

    # fingerprint XOR per group: per-batch partials, exact+associative
    # fold on the driver (≤ groups x blocks partial rows)
    def fp_partial(t: pa.Table) -> pa.Table:
        df = t.select(["lang", "branch", "text_fingerprint"]).to_pandas()
        part = (
            df.groupby(["lang", "branch"], dropna=False)["text_fingerprint"]
            .agg(lambda s: np.bitwise_xor.reduce(s.to_numpy(dtype=np.int64)))
            .reset_index(name="fp_xor")
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    parts = written.map_batches(fp_partial, batch_format="pyarrow").to_pandas()
    fp = (
        parts.groupby(["lang", "branch"], dropna=False)["fp_xor"]
        .agg(lambda s: int(np.bitwise_xor.reduce(s.to_numpy(dtype=np.int64))))
        .reset_index()
    )
    out = base.merge(fp, on=["lang", "branch"], how="left")
    # int32 partial sums widen to BIGINT like the oracle's CASTs
    for c in ("n_records", "n_blocks_sum", "n_tasks_sum", "points_sum",
              "n_chars_sum", "fp_xor"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["lang", "branch"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# registry + oracle SQL
# --------------------------------------------------------------------------

MEDIA_ORACLE_DIR = "/tmp/ocracle_media_oracle"


def q_media_features(sf_dir: str):
    """All three multimodal actor-pool stages over one media Dataset
    that mixes SYNTHETIC payloads (IMG1/AUD1/VID1) with REAL codec
    bytes (stdlib-encoded PNG, baseline AND progressive JPEG,
    interlaced/transparent GIF, 24-bit BMP, LZW/uncompressed TIFF and
    CCITT G4/MH fax TIFF images; PCM, G.711 mu-law/A-law and IMA-ADPCM
    WAV plus FLAC (fixed/LPC/mid-side/left-side) and Ogg Vorbis
    (mono/stereo/noise/dual-tone) clips; animated GIFs
    AND animated lossless WebPs through the video frame sampler) — so the stdlib decode branches are
    driver-checked every round, not only unit-tested. ALL decodable
    rows decode (no skip-rows for any appended codec — the per-kind
    row counts pin that).

    Artifact-oracled since round 4 (flagship pattern): each stage's
    per-row metric is written to parquet and DuckDB re-aggregates the
    files independently — the decode row counts and metric sums are
    verified; the codecs themselves are unit-tested (no SQL mirror).
    One summary row per kind, stable across runs/parallelism."""
    import shutil

    import numpy as np
    from ray.data import from_arrow

    from ..core.bmp import encode_bmp
    from ..core.gif import encode_gif
    from ..core.jpeg import encode_jpeg, encode_jpeg_progressive
    from ..core.png import encode_png
    from ..core.tiff import encode_tiff
    from ..core.wav import encode_wav, encode_wav_g711, encode_wav_ima_adpcm
    from ..sources.pages import sf_of_dir
    from ..stages.multimodal import (
        AudioFeatures,
        FrameSample,
        ImageFeatures,
        synth_media_table,
    )

    n = max(30, min(300, int(3000 * sf_of_dir(sf_dir))))
    base = synth_media_table(n)
    # append real-codec rows, deterministic: 4 PNGs + 4 baseline JPEGs
    # + 4 progressive JPEGs + 4 GIFs + 4 BMPs + 4 TIFFs + 4 CCITT fax
    # TIFFs + 4 tiled/deflate/JPEG-in-TIFF + 4 old-style (tag-513)
    # JPEG-in-TIFFs + 4 lossless WebPs + 4 PCM
    # WAVs + 4 G.711 WAVs + 4 IMA-ADPCM WAVs + 4 FLACs + 4 animated
    # GIFs and 4 animated WebPs (video)
    ids, kinds, payloads = [], [], []
    for j in range(4):
        rng = np.random.RandomState(1000 + j)
        ids.append(n + j)
        kinds.append("image")
        payloads.append(encode_png(rng.randint(0, 256, (24, 16, 3), dtype=np.uint8)))
        # baseline JPEG (round 3): gray for even j, RGB for odd j — both
        # stdlib jpeg-decoder shapes exercised in-pipeline
        shape = (20, 28) if j % 2 == 0 else (20, 28, 3)
        ids.append(n + 4 + j)
        kinds.append("image")
        payloads.append(
            encode_jpeg(rng.randint(0, 256, shape, dtype=np.uint8), quality=85)
        )
        tone = 0.25 * np.sin(2 * np.pi * (220 + 110 * j) * np.arange(2000) / 8000.0)
        ids.append(n + 8 + j)
        kinds.append("audio")
        payloads.append(encode_wav(tone, 8000))
        # PROGRESSIVE JPEG (round 4, VERDICT r3 #3): both scan scripts
        # (successive approximation and spectral-selection-only), gray
        # and RGB — decoded in-pipeline with NO skip-rows
        ids.append(n + 12 + j)
        kinds.append("image")
        payloads.append(
            encode_jpeg_progressive(
                rng.randint(0, 256, shape, dtype=np.uint8),
                quality=85,
                successive=j % 2 == 0,
            )
        )
        # GIF (round 4, late): interlaced for even j, transparent for
        # odd j — both stdlib decoder branches in-pipeline
        pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
        ids.append(n + 16 + j)
        kinds.append("image")
        payloads.append(
            encode_gif(
                rng.randint(0, 16, (18, 22), dtype=np.uint8).astype(np.uint8),
                pal,
                interlace=j % 2 == 0,
                transparent=None if j % 2 == 0 else 3,
            )
        )
        # BMP (round 4, late): 24-bit RGB
        ids.append(n + 20 + j)
        kinds.append("image")
        payloads.append(encode_bmp(rng.randint(0, 256, (14, 26, 3), dtype=np.uint8)))
        # TIFF (round 4, late): LZW+predictor / uncompressed, gray/RGB
        tshape = (16, 19) if j % 2 == 0 else (16, 19, 3)
        ids.append(n + 36 + j)
        kinds.append("image")
        payloads.append(
            encode_tiff(
                rng.randint(0, 256, tshape, dtype=np.uint8),
                compression="lzw" if j < 2 else "none",
                predictor=j == 0,
                rows_per_strip=5,
            )
        )
        # CCITT fax TIFF (round 4, late): G4 even j, MH odd j — the
        # scanned-page shape (bilevel text-like strokes)
        fax = np.full((20, 30), 255, np.uint8)
        fax[3 + j : 6 + j, 2 : 28 : 2 + j] = 0
        ids.append(n + 40 + j)
        kinds.append("image")
        payloads.append(
            encode_tiff(
                fax, compression="g4" if j % 2 == 0 else "mh", rows_per_strip=7
            )
        )
        # Tiled / Deflate / JPEG-in-TIFF (round 4, late): the tile
        # grid deliberately does not divide the dims (edge-tile crop
        # path); j==3 uses the shared JPEGTables tag-347 splice
        y, x = np.mgrid[0:18, 0:21]
        grad = ((x * 5 + y * 3) % 256).astype(np.uint8)
        ids.append(n + 44 + j)
        kinds.append("image")
        if j == 0:
            t4 = encode_tiff(
                rng.randint(0, 256, (18, 21, 3), dtype=np.uint8), tile=(8, 8)
            )
        elif j == 1:
            t4 = encode_tiff(
                rng.randint(0, 256, (18, 21), dtype=np.uint8),
                compression="deflate", predictor=True, rows_per_strip=5,
            )
        elif j == 2:
            t4 = encode_tiff(grad, compression="jpeg", rows_per_strip=8)
        else:
            t4 = encode_tiff(
                np.stack([grad, 255 - grad, grad], axis=2),
                compression="jpeg", tile=(16, 16), jpeg_tables=True,
            )
        payloads.append(t4)
        # OLD-style JPEG-in-TIFF (round 4, late): compression 6, one
        # interchange stream at tag 513 — gray even j, RGB odd j
        ids.append(n + 56 + j)
        kinds.append("image")
        payloads.append(
            encode_tiff(
                grad if j % 2 == 0 else np.stack([grad, grad, 255 - grad], axis=2),
                compression="jpeg", old_style_jpeg=True,
            )
        )
        # WebP lossless / VP8L (round 4, late): plain, subtract-green,
        # bundled palette, RGBA with LZ77 runs — the four encoder
        # knobs, all exact-roundtrip
        from ..core.webp import encode_webp
        ids.append(n + 48 + j)
        kinds.append("image")
        if j == 0:
            t5 = encode_webp(rng.randint(0, 256, (15, 22, 3), dtype=np.uint8))
        elif j == 1:
            t5 = encode_webp(
                rng.randint(0, 256, (12, 18, 3), dtype=np.uint8),
                subtract_green=True,
            )
        elif j == 2:
            lut = rng.randint(0, 256, (7, 3), dtype=np.uint8)
            t5 = encode_webp(lut[rng.randint(0, 7, (16, 20))], palette=True)
        else:
            rgba = rng.randint(0, 256, (10, 14, 4), dtype=np.uint8)
            t5 = encode_webp(np.repeat(rgba[:, :7], 2, axis=1))
        payloads.append(t5)
        # G.711 WAVs (round 4, late): mu-law even j, A-law odd j
        tone2 = 0.3 * np.sin(2 * np.pi * (330 + 55 * j) * np.arange(1600) / 8000.0)
        ids.append(n + 24 + j)
        kinds.append("audio")
        payloads.append(encode_wav_g711(tone2, 8000, law="mu" if j % 2 == 0 else "a"))
        # IMA ADPCM WAV (round 4, late): mono even j, stereo odd j
        clip = 0.35 * np.sin(2 * np.pi * (262 + 66 * j) * np.arange(1500) / 8000.0)
        ids.append(n + 32 + j)
        kinds.append("audio")
        payloads.append(
            encode_wav_ima_adpcm(
                clip if j % 2 == 0 else np.stack([clip, 0.5 * clip], axis=1), 8000
            )
        )
        # FLAC (round 4, late): fixed-predictor mono, LPC mono, and the
        # two stereo-decorrelation fixtures — all decoded in-pipeline
        from ..core.flac import encode_flac
        ids.append(n + 60 + j)
        kinds.append("audio")
        fclip = 0.4 * np.sin(2 * np.pi * (196 + 98 * j) * np.arange(1800) / 8000.0)
        if j == 0:
            f5 = encode_flac(fclip, 8000, subframe="fixed")
        elif j == 1:
            f5 = encode_flac(fclip, 8000, subframe="lpc")
        elif j == 2:
            f5 = encode_flac(
                np.stack([fclip, 0.6 * fclip], axis=1), 8000,
                subframe="fixed", stereo="mid_side",
            )
        else:
            f5 = encode_flac(
                np.stack([fclip, -0.5 * fclip], axis=1), 8000,
                subframe="auto", stereo="left_side",
            )
        payloads.append(f5)
        # Ogg Vorbis (round 4, session 5): the lossy branch — mono
        # sine, stereo, clipped noise and a dual-tone clip through the
        # stdlib MDCT decoder (core.vorbis); closes the r3 "mp3/ogg"
        # gap for the self-describing half of it
        from ..core.vorbis import encode_vorbis
        ids.append(n + 64 + j)
        kinds.append("audio")
        vclip = 0.4 * np.sin(2 * np.pi * (185 + 77 * j)
                             * np.arange(1700) / 8000.0)
        if j == 0:
            v6 = encode_vorbis(vclip, 8000)
        elif j == 1:
            v6 = encode_vorbis(np.stack([vclip, -0.5 * vclip], axis=1),
                               8000)
        elif j == 2:
            v6 = encode_vorbis(
                np.clip(rng.randn(1700) * 0.3, -1, 1), 16000)
        else:
            # mixed 256/1024 blocks: the general unequal-window lap
            v6 = encode_vorbis(
                vclip + 0.2 * np.sin(2 * np.pi * 55
                                     * np.arange(1700) / 8000.0), 8000,
                mixed_blocks=True)
        payloads.append(v6)
        # MPEG-1 audio (round 5): Layer I mono/stereo and Layer II on
        # the table-a profile with two scfsi modes — the lossy-audio
        # gap's derivable half closed (core.mpeg1audio; Layer III
        # stays gated). Decoded in-pipeline with NO skip rows.
        from ..core.mpeg1audio import (encode_mpeg1_layer1,
                                       encode_mpeg1_layer2)

        mt = np.arange(12000)
        mclip = 0.35 * np.sin(2 * np.pi * (330 + 95 * j) * mt / 48000.0)
        ids.append(n + 68 + j)
        kinds.append("audio")
        if j % 2 == 0:
            payloads.append(encode_mpeg1_layer1(mclip, 48000))
        else:
            # j==3: Layer I intensity joint stereo in-pipeline
            payloads.append(encode_mpeg1_layer1(
                np.stack([mclip, -0.6 * mclip], axis=1), 48000,
                joint_bound=8 if j == 3 else None))
        ids.append(n + 72 + j)
        kinds.append("audio")
        if j < 2:
            payloads.append(encode_mpeg1_layer2(mclip, 48000,
                                                scfsi_mode=j))
        else:
            # j==3: intensity joint stereo — the shared-subband
            # decoder path in-pipeline
            payloads.append(encode_mpeg1_layer2(
                np.stack([mclip, 0.5 * mclip], axis=1), 48000,
                scfsi_mode=j, joint_bound=8 if j == 3 else None))
        # animated GIF as VIDEO (round 4, late): FrameSample's real-
        # codec branch — 6 frames, sampled every 2nd -> 3 rows each
        ids.append(n + 28 + j)
        kinds.append("video")
        payloads.append(
            encode_gif(
                [rng.randint(0, 16, (10, 12), dtype=np.uint8) for _ in range(6)],
                pal,
            )
        )
        # animated WebP as VIDEO (round 4, late): the ANMF compositor
        # in-pipeline — full-canvas base + offset sub-rect frames with
        # blend (odd j) / dispose (j>=2), 5 frames -> 3 sampled rows
        from ..core.webp import encode_webp_animated
        ids.append(n + 52 + j)
        kinds.append("video")
        wf = [rng.randint(0, 256, (12, 16, 3), dtype=np.uint8)]
        offs = [(0, 0)]
        for k in range(4):
            fr = rng.randint(0, 256, (4, 6, 3 if j % 2 == 0 else 4),
                             dtype=np.uint8)
            wf.append(fr)
            offs.append(((2 * k) % 10, (2 * k) % 8))
        payloads.append(
            encode_webp_animated(
                wf, offsets=offs,
                blend=[False] + [j % 2 == 1] * 4,
                dispose=[False] + [j >= 2] * 4,
                bg=(j * 40, 255 - j * 30, 128, 255),
            )
        )
    extra = pa.Table.from_pydict(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array([0] * len(ids), pa.int32()),
            "height": pa.array([0] * len(ids), pa.int32()),
        },
        schema=base.schema,
    )
    ds = from_arrow(pa.concat_tables([base, extra])).repartition(4)

    # artifact oracle (round 4): each stage's per-row metric is written
    # to its own parquet subdir (sequential consumption — a lazy union
    # would instantiate all three actor pools at once on a 4-CPU
    # session); Ray and DuckDB then aggregate the SAME files
    # independently. metric_sum is double for all three sinks (the
    # video frame-index sum was int before round 4).
    out_root = f"{MEDIA_ORACLE_DIR}/current"
    shutil.rmtree(out_root, ignore_errors=True)

    def metric_rows(sink: str, col: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "sink": pa.array([sink] * t.num_rows, pa.string()),
                    "metric": pc.cast(t[col], pa.float64()),
                }
            )

        return fn

    for sink, cls, col in (
        ("audio", AudioFeatures, "rms"),
        ("image", ImageFeatures, "mean_intensity"),
        ("video_frames", FrameSample, "frame_index"),
    ):
        ds.map_batches(cls, batch_format="pyarrow", concurrency=2).map_batches(
            metric_rows(sink, col), batch_format="pyarrow"
        ).write_parquet(f"{out_root}/{sink}")

    import ray.data as rd

    written = pd.concat(
        [
            rd.read_parquet(f"{out_root}/{s}").to_pandas()
            for s in ("audio", "image", "video_frames")
        ],
        ignore_index=True,
    )
    out = (
        written.groupby("sink", as_index=False)
        .agg(n_rows=("metric", "size"), metric_sum=("metric", "sum"))
        .rename(columns={"sink": "kind"})
    )
    out["n_rows"] = out["n_rows"].astype("int64")
    out["metric_sum"] = out["metric_sum"].round(4)
    return out.sort_values("kind").reset_index(drop=True)


PDF_ORACLE_DIR = "/tmp/ocracle_pdf_oracle"


def _real_pdf_variant(i: int) -> str:
    """Mirrors ``sources.realpdf.real_pdf_pages_table``'s builder
    dispatch; the oracle SQL re-derives the same mapping from the url's
    trailing digits, so a doc routed to the wrong codec branch shows up
    as a group-count mismatch."""
    if i % 3 == 2:
        return "xrefstm"
    if i % 5 == 4:
        return "encrypted"
    if i % 5 == 2:
        return "scanned"
    return "plain"


def q_pdf_branch(sf_dir: str):
    """The WHOLE PDF branch in one driver row (registry consolidation —
    the old pages_pdf_branch entry was a subset of pdf_real_branch):

    - ``src='real'``: deterministic minimal REAL PDF bytes
      (``sources.realpdf``) parsed by the stdlib extractor inside the
      Extract actor pool — PDF 1.4, 1.5 xref-stream/ObjStm,
      RC4-encrypted and images-only SCANNED (OCR branch) variants;
    - ``src='ocrsyn'``: every %PDF-sniffed page of the synthetic corpus
      through the same pipeline.

    Artifact-oracled since round 4 (flagship pattern): the per-doc
    rows are written to parquet, the driver row is per-(src, variant)
    aggregates — doc/error counts, block/task/points sums, and the
    fingerprint XOR that pins extracted-text byte identity per codec
    branch — and DuckDB re-aggregates the files independently,
    re-deriving the variant from the url's trailing digits with the
    same modular dispatch the fixture builder uses. The extraction
    itself is fixture-synthesized (no SQL mirror); parity of the
    scanned/encrypted twins with their plain counterparts is asserted
    in tests/test_pdf_minimal.py."""
    import shutil

    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq
    from ray.data import from_arrow

    from ..pipelines.extraction import extract_records
    from ..sources.pages import generate_pages_dataset, n_docs_for_sf, sf_of_dir
    from ..sources.realpdf import real_pdf_pages_table

    cols = ["url", "branch", "n_blocks", "n_tasks", "points_total",
            "text_fingerprint", "error"]

    def pick(src: str, flt=None):
        def fn(t: pa.Table) -> pa.Table:
            if flt is not None:
                t = t.filter(flt(t))
            t = t.select(cols)
            return t.append_column("src", pa.array([src] * t.num_rows, pa.string()))

        return fn

    # floor 40 (round 4, AES): ids 0..39 cover all four encryption
    # schemes (rc4-40 @4, rc4-128 @9, aesv3 @19/39, aesv2 @34), so the
    # driver row pins every decrypt branch at every sf
    n_real = max(40, min(200, int(1000 * sf_of_dir(sf_dir))))
    real_pages = from_arrow(real_pdf_pages_table(n_real)).repartition(
        max(2, n_real // 8)
    )
    # the two branches run SEQUENTIALLY (.to_pandas() each), not as a
    # lazy union: a union would instantiate both fixed-size actor pools
    # at once (2+2 actors) and deadlock a 4-CPU session
    real = (
        extract_records(real_pages, concurrency=2)
        .map_batches(pick("real"), batch_format="pyarrow")
        .to_pandas()
    )

    n_syn = min(2000, n_docs_for_sf(sf_of_dir(sf_dir)))
    syn = (
        extract_records(generate_pages_dataset(n_syn), concurrency=2)
        .map_batches(
            pick("ocrsyn", flt=lambda t: _pc.equal(t["branch"], "pdf")),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    perdoc = pd.concat([real, syn], ignore_index=True).sort_values(
        ["src", "url"]
    ).reset_index(drop=True)

    # per-doc artifact (driver-resident already — both branches are
    # sf-bounded fixture corpora); variant is NOT written: Ray and the
    # oracle each derive it from the url independently
    out_dir = f"{PDF_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    _pq.write_table(
        pa.Table.from_pandas(perdoc, preserve_index=False),
        f"{out_dir}/part-0.parquet",
    )

    df = perdoc.copy()
    df["variant"] = [
        "synthetic" if s == "ocrsyn" else _real_pdf_variant(int(u.rsplit("realpdf", 1)[1]))
        for s, u in zip(df["src"], df["url"])
    ]
    grp = df.groupby(["src", "variant"], as_index=False)
    out = grp.agg(
        n_docs=("url", "size"),
        # error is '' (empty string) for ok rows, never null
        n_err=("error", lambda s: int((s.fillna("") != "").sum())),
        n_blocks_sum=("n_blocks", "sum"),
        n_tasks_sum=("n_tasks", "sum"),
        points_sum=("points_total", "sum"),
    )
    fp = grp["text_fingerprint"].agg(
        lambda s: int(
            np.bitwise_xor.reduce(
                s.fillna(0).to_numpy(dtype=np.int64), initial=np.int64(0)
            )
        )
    ).rename(columns={"text_fingerprint": "fp_xor"})
    out = out.merge(fp, on=["src", "variant"])
    for c in ("n_docs", "n_err", "n_blocks_sum", "n_tasks_sum", "points_sum", "fp_xor"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["src", "variant"]).reset_index(drop=True)


CENSUS_ORACLE_DIR = "/tmp/ocracle_census_oracle"


def q_pages_census(sf_dir: str):
    """Block AND figure census over the exploded ``blocks`` table in
    ONE driver row (registry consolidation, VERDICT r2 #1 — the old
    pages_block_kinds and pages_figures entries shared the same
    pages→blocks pipeline):

    - ``section='block_kind'``: per-kind block histogram (SURVEY.md
      §1.2 central intermediate), key = kind;
    - ``section='figures_per_url'``: figure spans after per-url
      near-dup suppression (F5 analogue), key = url, total_chars = 0.

    Artifact-oracled since round 4 (flagship pattern): the exploded
    block rows and suppressed figure rows are written to parquet, Ray
    aggregates the driver row FROM the written files (distributed
    groupbys), and DuckDB independently re-aggregates the same files —
    the census arithmetic and the sink are verified, while the
    extraction itself stays fixture-synthesized (no SQL mirror)."""
    import shutil

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..sources.pages import generate_pages_dataset, n_docs_for_sf, sf_of_dir
    from ..stages.blocks import figures_of_blocks, pages_to_blocks

    n = min(1000, n_docs_for_sf(sf_of_dir(sf_dir)))
    # materialize: both sections consume the same blocks; without it the
    # lazy pipeline would re-run page extraction twice (bounded: n<=1000)
    blocks = pages_to_blocks(generate_pages_dataset(n), concurrency=2).materialize()

    blocks_dir = f"{CENSUS_ORACLE_DIR}/blocks"
    figs_dir = f"{CENSUS_ORACLE_DIR}/figures"
    shutil.rmtree(CENSUS_ORACLE_DIR, ignore_errors=True)
    blocks.map_batches(
        lambda t: t.select(["url", "kind", "n_chars"]), batch_format="pyarrow"
    ).write_parquet(blocks_dir)
    figures_of_blocks(blocks).map_batches(
        lambda t: t.select(["url"]), batch_format="pyarrow"
    ).write_parquet(figs_dir)

    kinds = (
        rd.read_parquet(blocks_dir)
        .groupby("kind")
        .aggregate(Count(alias_name="n"), Sum("n_chars", alias_name="total_chars"))
        .to_pandas()
        .rename(columns={"kind": "key"})
    )
    kinds.insert(0, "section", "block_kind")

    figs = (
        rd.read_parquet(figs_dir)
        .groupby("url")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .rename(columns={"url": "key"})
    )
    figs.insert(0, "section", "figures_per_url")
    figs["total_chars"] = 0

    out = pd.concat([kinds, figs], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    out["total_chars"] = out["total_chars"].astype("int64")
    return out.sort_values(["section", "key"]).reset_index(drop=True)


FIGURES_ORACLE_DIR = "/tmp/ocracle_figures_oracle"


def q_figure_pixel_crops(sf_dir: str):
    """Pixel-domain figure pipeline F1-F5/F8 (stages/figures.py):
    synthetic PNG page renders -> contour crops -> keep/skip heuristics
    -> near-dup suppression -> PNG render.

    Artifact-oracled since round 4 (flagship pattern): the per-crop
    (action, reason, saved_bytes) rows are written to parquet; Ray
    aggregates the census FROM the written files and DuckDB
    re-aggregates them independently — the census arithmetic and the
    sink are verified; the pixel pipeline itself is unit-tested
    against synthetic truth boxes (no SQL mirror). Stable across runs
    and parallelism."""
    import shutil

    import ray.data as rd
    from ray.data import from_arrow

    from ..sources.figures import synth_figures_table
    from ..sources.pages import sf_of_dir
    from ..stages.figures import figure_crops

    n = max(24, min(500, int(2000 * sf_of_dir(sf_dir))))
    # from_arrow yields ONE block; split so the actor pool parallelizes
    figs = from_arrow(synth_figures_table(n)).repartition(max(2, n // 16))
    crops = figure_crops(figs)

    def census(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "action": t["action"],
                "reason": t["reason"],
                "n": pa.array([1] * t.num_rows, pa.int64()),
                "saved_bytes": pc.cast(
                    pc.binary_length(t["crop_png"]), pa.int64()
                ),
            }
        )

    out_dir = f"{FIGURES_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    crops.map_batches(census, batch_format="pyarrow").write_parquet(out_dir)

    out = driver_grouped_agg(
        rd.read_parquet(out_dir),
        ["action", "reason"],
        {"n_crops": ("n", "sum"), "saved_bytes": ("saved_bytes", "sum")},
    )
    for c in ("n_crops", "saved_bytes"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["action", "reason"]).reset_index(drop=True)


WEBVIEW_ORACLE_DIR = "/tmp/ocracle_webview_oracle"


def q_webview_tasks(sf_dir: str):
    """The web-viewer consumer surface (E3/G12,
    ``/root/reference/web/OCRacle.html:227-237``): filter records by
    exam version, explode tasks, numeric-aware sort within
    (subject, version).

    Artifact-oracled since round 4: the UNFILTERED exploded task rows
    (with a per-url ``seq`` position as the sort tiebreak) are written
    to parquet; the query applies the viewer's version filter, the
    numeric-aware sort and the rank on the driver, and DuckDB
    independently reproduces filter + numeric sort + row_number from
    the written files — the consumer-surface semantics are verified,
    only the extraction itself (synthesized pages) is trusted."""
    import shutil

    import ray.data as rd

    from ..core.assemble import task_sort_key
    from ..pipelines.extraction import extract_records
    from ..sources.pages import generate_pages_dataset, n_docs_for_sf, sf_of_dir

    n = min(1000, n_docs_for_sf(sf_of_dir(sf_dir)))
    recs = extract_records(generate_pages_dataset(n), concurrency=2)

    def explode(t: pa.Table) -> pa.Table:
        rows: dict[str, list] = {
            "subject": [], "exam_version": [], "url": [],
            "task_number": [], "points": [], "topic": [], "seq": [],
        }
        for url, tasks in zip(t["url"].to_pylist(), t["tasks"].to_pylist()):
            parts = url.split("/")
            subject, version = parts[-3], parts[-2]
            for j, task in enumerate(tasks):
                rows["subject"].append(subject)
                rows["exam_version"].append(version)
                rows["url"].append(url)
                rows["task_number"].append(task["task_number"])
                rows["points"].append(task["points"])
                rows["topic"].append(task["topic"])
                rows["seq"].append(j)
        out = pa.Table.from_pydict(rows)
        return out.set_column(
            out.schema.get_field_index("seq"), "seq",
            pc.cast(out["seq"], pa.int64()),
        )

    out_dir = f"{WEBVIEW_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    recs.map_batches(explode, batch_format="pyarrow").write_parquet(out_dir)

    df = rd.read_parquet(out_dir).to_pandas()
    df = df[df["exam_version"].isin(("V23", "H24"))]  # the viewer's filter
    if df.empty:
        return df.drop(columns="seq")
    # numeric-aware sort; seq breaks ties the way the viewer's stable
    # sort over extraction order did (and row order is now file order)
    df["_key"] = df["task_number"].map(task_sort_key)
    df = df.sort_values(
        ["subject", "exam_version", "url", "_key", "seq"]
    ).drop(columns=["_key", "seq"])
    df["rk"] = range(1, len(df) + 1)
    return df.reset_index(drop=True)


def q_salted_events_value(sf_dir: str):
    """Both hot-key shuffle protections (north_rule) under one driver
    row, each exactly equal to its plain counterpart:

    - ``salted_groupby_sum``: two-stage salted aggregate ==
      plain groupby sum (total_value);
    - ``skew_safe_join``: temperature-split join — Misra-Gries hot
      keys ride a broadcast map-side join, the cold remainder a hash
      join — == plain inner join (joined_rows / acctbal_sum via
      events JOIN customer ON user_id = c_custkey).

    The final merge is 5 rows (one per event_type) on the driver."""
    from ray.data.aggregate import Count, Sum

    from ..stages.skew import salted_groupby_sum, skew_safe_join

    ds = _read(sf_dir, "events", ["event_type", "value"])
    salted = salted_groupby_sum(
        ds, "event_type", "value", alias="total_value"
    ).to_pandas()

    fact = _read(sf_dir, "events", ["user_id", "event_type"])
    dim = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    # mg_k=32 over 150 uniform users: some keys land in the candidate
    # set (broadcast path), the rest hash-join — both paths exercised
    jr = (
        skew_safe_join(fact, dim, on="user_id", right_on="c_custkey",
                       mg_k=32, num_partitions=8)
        .groupby("event_type")
        .aggregate(
            Count(alias_name="joined_rows"),
            Sum("c_acctbal", alias_name="acctbal_sum"),
        )
        .to_pandas()
    )
    out = salted.merge(jr, on="event_type", how="left")
    out["total_value"] = out["total_value"].round(4)
    out["joined_rows"] = out["joined_rows"].fillna(0).astype("int64")
    out["acctbal_sum"] = out["acctbal_sum"].fillna(0.0).round(2)
    return out


def q_parts_skyline(sf_dir: str):
    """Skyline / Pareto frontier (Borzsony et al., ICDE 2001): the
    parts no other part beats on BOTH (cheaper price, larger size) —
    the multi-criteria shortlist no single ORDER BY can express.
    Per-block local frontiers (dominance pruning is sound under any
    block layout) fold on the driver behind a loud guard; one final
    local pass is exact. Integer cents so the oracle's NOT EXISTS
    compares identical values."""
    from ..stages.skyline import skyline_2d

    ds = _read(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])

    def cents(t: pa.Table) -> pa.Table:
        price = np.rint(
            t["p_retailprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "p_partkey": t["p_partkey"],
            "price_cents": pa.array(price),
            "p_size": t["p_size"].cast(pa.int64()),
        })

    sky = skyline_2d(
        ds.map_batches(cents, batch_format="pyarrow"),
        "price_cents", "p_size",
    )
    return (sky.to_pandas()
            .sort_values("p_partkey").reset_index(drop=True))


def q_events_value_corr(sf_dir: str):
    """Grouped Pearson correlation + OLS slope of value vs hour-of-day
    per event type from ONE streaming pass of integer sufficient
    statistics (n, Σx, Σy, Σxy, Σx², Σy² — all int64-exact cents x
    hours), folded on the driver (groups = event types). The float
    work happens ONCE on the exact integer sums with the identical
    expression shape on both sides, so round-6 parity is exact. The
    100-TB shape: partials are 6 numbers per (type, block) — values
    never shuffle."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = (ts % DAY_US) // 3_600_000_000
        v = t["value"].to_numpy(zero_copy_only=False)
        c = np.rint(v * 100.0)
        if len(c) and not np.all(np.abs(v * 100.0 - c) <= 1e-4):
            raise ValueError("events.value is not exact at cent scale")
        c = c.astype(np.int64)
        return pa.table({
            "event_type": t["event_type"],
            "x": pa.array(hour.astype(np.int64)),
            "y": pa.array(c),
            "xy": pa.array(hour * c),
            "xx": pa.array(hour * hour),
            "yy": pa.array(c * c),
        })

    agg = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"],
        {"n": ("x", "count"), "sx": ("x", "sum"), "sy": ("y", "sum"),
         "sxy": ("xy", "sum"), "sxx": ("xx", "sum"),
         "syy": ("yy", "sum")},
    ).sort_values("event_type").reset_index(drop=True)
    n = agg["n"].to_numpy(np.float64)
    sx = agg["sx"].to_numpy(np.float64)
    sy = agg["sy"].to_numpy(np.float64)
    sxy = agg["sxy"].to_numpy(np.float64)
    sxx = agg["sxx"].to_numpy(np.float64)
    syy = agg["syy"].to_numpy(np.float64)
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return pd.DataFrame({
        "event_type": agg["event_type"],
        "n": agg["n"].astype("int64"),
        "slope_cents_per_hour": np.round(cov_n / var_x, 6),
        "pearson_r": np.round(cov_n / np.sqrt(var_x * var_y), 6),
    })


def q_customer_fuzzy_join(sf_dir: str):
    """Edit-distance-1 record-linkage self-join over customer names
    (stages.editjoin — FastSS/SymSpell deletion neighborhoods): the
    data-cleaning op the token-set joins can't express (a one-char typo
    changes every shingle). Variants emit via POSITION-vectorized Arrow
    kernels (L+1 passes per batch, the algorithm's documented O(L)
    blow-up), candidates from ONE groupby(variant) exchange with a
    loud hot-bucket guard, pair-distinct via a second keyed groupby,
    exact ed ≤ 1 verification on padded numpy byte matrices. The
    result set is pinned compactly: pair count + ORDER-FREE XOR of
    60-bit md5 pair keys (the merkle idiom — one wrong/missing pair
    flips the XOR); at 100 TB the XOR partials tree-fold. Oracle:
    brute-force levenshtein()=1 over the name cross join + identical
    bit_xor."""
    import hashlib
    from functools import reduce
    from operator import xor

    from ..stages.editjoin import ed1_self_join

    ds = _read(sf_dir, "customer", ["c_name"])
    pairs = ed1_self_join(ds, name_col="c_name")

    def partial(t: pa.Table) -> pa.Table:
        x = 0
        for a, b in zip(t["a"].to_pylist(), t["b"].to_pylist()):
            x ^= int(hashlib.md5(
                f"{a}\x01{b}".encode()).hexdigest()[:15], 16)
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "x": pa.array([x], pa.int64())})

    parts = pairs.map_batches(partial, batch_format="pyarrow").to_pandas()
    n_names = _read(sf_dir, "customer", ["c_custkey"]).count()
    return pd.DataFrame([{
        "n_names": int(n_names),
        "n_pairs_d1": int(parts["n"].sum()),
        "pair_xor": int(reduce(xor, (int(v) for v in parts["x"]), 0)),
    }]).astype("int64")


def q_docs_ndcg(sf_dir: str):
    """NDCG@10 of the BM25 ranking against graded relevance — the
    ranking-quality readout (Järvelin & Kekäläinen 2002) a retrieval
    stack reports next to the ranking itself (the AUC precedent, for
    rankers). Gold relevance is DEFINED as the total query-term
    occurrence count per doc (integer, fully SQL-re-derivable);
    ideal ranking = (rel desc, doc_id). One extra streaming pass: per
    batch, rel for the 10 BM25-ranked docs (closure-captured, ≤10 ids)
    plus local top-10 rel candidates — the driver resolves both DCG
    legs from ≤20 rows per batch. log2 discounts on exact integer
    gains, round 6. The oracle re-derives the full BM25 ranking, the
    gains and both DCG sums."""
    from ..stages.bm25 import _term_hits, bm25_topk, corpus_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).materialize()
    stats = corpus_stats(ds, BM25_TERMS)
    lex = bm25_topk(ds, BM25_TERMS, stats, k=10)
    ranked = [int(d) for d in lex["doc_id"]]
    ranked_arr = np.array(ranked, np.int64)

    def rel_batch(t: pa.Table) -> pa.Table:
        _dl, tf = _term_hits(t["text"], BM25_TERMS)
        rel = tf.sum(axis=1).astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(ids, ranked_arr)
        hit = np.flatnonzero(rel > 0)
        top = hit[np.lexsort((ids[hit], -rel[hit]))[:10]]
        sel = np.union1d(np.flatnonzero(keep), top)
        return pa.table({"doc_id": pa.array(ids[sel]),
                         "rel": pa.array(rel[sel])})

    cand = ds.map_batches(rel_batch, batch_format="pyarrow").to_pandas()
    rel_map = dict(zip(cand["doc_id"].astype(int), cand["rel"].astype(int)))
    gold = cand[cand["rel"] > 0].sort_values(
        ["rel", "doc_id"], ascending=[False, True]).head(10)
    dcg = sum(rel_map[d] / np.log2(r + 2.0)
              for r, d in enumerate(ranked))
    idcg = sum(int(g) / np.log2(r + 2.0)
               for r, g in enumerate(gold["rel"]))
    return pd.DataFrame([{
        "k": 10,
        "dcg": round(float(dcg), 6),
        "idcg": round(float(idcg), 6),
        "ndcg": round(float(dcg / idcg), 6),
    }]).astype({"k": "int64"})


def q_events_spearman(sf_dir: str):
    """Grouped Spearman rank correlation of value vs hour-of-day — the
    monotone-association probe next to q_events_value_corr's Pearson
    (which assumes linearity). Values are near-continuous so the ranks
    are computed DISTRIBUTED (stages.spearman): ONE sort exchange +
    O(blocks) edge-run corrections give every row its tie-aware doubled
    average rank (2·minrank + cnt − 1, the AUC doubling trick — .5 tie
    ranks stay integer); hour ranks derive from per-(type, hour)
    counts. Sufficient statistics fold in Python ints (Σ(2R)² ~ n³);
    ρ is scale-invariant so doubled ranks feed the Pearson closed form
    unchanged, one float division, round 6. The rank-sum invariant
    Σ2R = n(n+1) is asserted per group in-engine. The oracle re-derives
    both doubled ranks via rank()/count() windows and the identical
    closed form."""
    from ..stages.spearman import grouped_spearman_stats, spearman_rho

    ds = _read(sf_dir, "events", ["event_id", "event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = (ts % DAY_US) // 3_600_000_000
        v = t["value"].to_numpy(zero_copy_only=False)
        c = np.rint(v * 100.0)
        if len(c) and not np.all(np.abs(v * 100.0 - c) <= 1e-4):
            raise ValueError("events.value is not exact at cent scale")
        return pa.table({
            "event_type": t["event_type"],
            "c": pa.array(c.astype(np.int64)),
            "h": pa.array(hour.astype(np.int64)),
            "event_id": t["event_id"],
        })

    stats = grouped_spearman_stats(
        ds.map_batches(prep, batch_format="pyarrow"),
        group_col="event_type", val_col="c", x_col="h",
        uid_col="event_id",
    )
    rows = spearman_rho(stats)
    return pd.DataFrame(rows, columns=["event_type", "n", "spearman_rho"])


BRAND_PAIR_TOPK = 15


def q_orders_brand_affinity(sf_dir: str):
    """Market-basket association rules (Agrawal/Srikant's Apriori at
    k=2) over order baskets: brand pairs co-purchased in one order,
    with support, directional confidence and lift in INTEGER ppm
    (floor division shared with SQL — no float in any ranked column).
    Shape: part→brand map broadcast once (ray.put + cached_get);
    per-batch DISTINCT (order, brand) combiners; the basket resolve
    happens on the deduped pair frame (orders x brands-per-order,
    guarded) — at 100 TB the in-batch distinct stays and the resolve
    becomes ONE groupby(order) exchange."""
    import ray

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    brand_ref = ray.put(dict(zip(part["p_partkey"], part["p_brand"])))

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def to_pairs(t: pa.Table) -> pa.Table:
        bmap = _cached_broadcast(brand_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        # vectorized map via pandas (25 brands; dict probe is C-level)
        brand = pd.Series(pk).map(bmap).to_numpy()
        df = pd.DataFrame({
            "order": t["l_orderkey"].to_numpy(zero_copy_only=False),
            "brand": brand,
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    ob = driver_grouped_agg(
        ds.map_batches(to_pairs, batch_format="pyarrow"),
        ["order", "brand"], {"n": ("brand", "count")},
    )[["order", "brand"]]
    n_orders = int(ob["order"].nunique())
    marg = ob.groupby("brand").size()
    pairs = ob.merge(ob, on="order")
    pairs = pairs[pairs["brand_x"] < pairs["brand_y"]]
    cnt = (pairs.groupby(["brand_x", "brand_y"]).size()
           .reset_index(name="n_orders_both"))
    rows = []
    for a, b, nb in cnt.itertuples(index=False):
        ca, cb = int(marg[a]), int(marg[b])
        rows.append({
            "brand_a": a, "brand_b": b,
            "n_orders_both": int(nb),
            "support_ppm": int(nb) * 1_000_000 // n_orders,
            "conf_a_to_b_ppm": int(nb) * 1_000_000 // ca,
            "lift_ppm": int(nb) * n_orders * 1_000_000 // (ca * cb),
        })
    out = pd.DataFrame(rows).sort_values(
        ["lift_ppm", "brand_a", "brand_b"],
        ascending=[False, True, True]).head(BRAND_PAIR_TOPK)
    for c in out.columns[2:]:
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def q_events_cusum(sf_dir: str):
    """CUSUM change-point detection on the daily purchase-revenue
    series — the level-shift alarm of a pipeline-health monitor (the
    KL drift monitor's sibling for a single metric). EXACT integer
    form: against the global mean, the cumulative deviation at day t
    scaled by T is S'_t = T·Σ_{i≤t} cents_i − t·total (the mean never
    becomes a float); the change point is the earliest day maximizing
    |S'_t|. Scale shape: the day series is bounded by the CALENDAR, so
    per-(day) cent totals fold via the combiner pass and the CUSUM
    walk is an O(days) Python-int driver fold (the products overflow
    int64 at 100 TB). The oracle re-derives S' via a window cumsum in
    HUGEINT and the identical (|S'| desc, day) pick."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["event_type"], "purchase"))
        day = (f["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // DAY_US)
        c = np.rint(f["value"].to_numpy(zero_copy_only=False) * 100.0
                    ).astype(np.int64)
        return pa.table({"day": pa.array(day), "c": pa.array(c)})

    agg = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], {"cents": ("c", "sum")},
    ).sort_values("day").reset_index(drop=True)
    days = [int(d) for d in agg["day"]]
    cents = [int(c) for c in agg["cents"]]
    T = len(days)
    total = sum(cents)
    cum = 0
    best_day, best_dev = None, -1
    for t_, (d, c) in enumerate(zip(days, cents), start=1):
        cum += c
        dev = abs(T * cum - t_ * total)
        if dev > best_dev:
            best_day, best_dev = d, dev
    return pd.DataFrame([{
        "n_days": T, "total_cents": total,
        "cp_day": best_day, "max_abs_dev_scaled": best_dev,
    }]).astype("int64")


def q_customer_rfm(sf_dir: str):
    """RFM segmentation — the warehouse classic: per customer
    (recency = last order day, frequency = order count, monetary =
    lifetime cents), each ranked into quintiles by the EXACT integer
    rule bucket = (rank-1)*5 // n over the (metric, custkey) total
    order, then segment census. One combiner pass; the per-customer
    fold is guarded (at 100 TB the rank becomes the global-prefix sort
    — stages/prefix.py — over the customer aggregate)."""
    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = (t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
               .to_numpy(zero_copy_only=False)) // DAY_US
        cents = np.rint(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "cust": t["o_custkey"],
            "day": pa.array(day),
            "cents": pa.array(cents),
        })

    cust = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["cust"],
        {"last_day": ("day", "max"), "freq": ("day", "count"),
         "monetary": ("cents", "sum")},
    ).sort_values("cust").reset_index(drop=True)
    n = len(cust)

    def quintile(metric: np.ndarray) -> np.ndarray:
        order = np.lexsort((cust["cust"].to_numpy(np.int64), metric))
        rank = np.empty(n, np.int64)
        rank[order] = np.arange(n, dtype=np.int64)
        return rank * 5 // n

    out = pd.DataFrame({
        "r_bucket": quintile(cust["last_day"].to_numpy(np.int64)),
        "f_bucket": quintile(cust["freq"].to_numpy(np.int64)),
        "m_bucket": quintile(cust["monetary"].to_numpy(np.int64)),
        "monetary": cust["monetary"].to_numpy(np.int64),
    })
    g = out.groupby(["r_bucket", "f_bucket", "m_bucket"], as_index=False)
    res = g.agg(n_customers=("monetary", "size"),
                monetary_cents=("monetary", "sum"))
    for c in res.columns:
        res[c] = res[c].astype("int64")
    return res.sort_values(
        ["r_bucket", "f_bucket", "m_bucket"]).reset_index(drop=True)


def q_events_dau_wau_hll(sf_dir: str):
    """The sketch form of q_events_dau_wau — the 100-TB path that
    query's docstring names: per-day HyperLogLog registers (4 KB per
    day regardless of users), trailing-7-day WAU = the 7 sketches
    MERGED (register max IS the union sketch — the whole point of
    using a mergeable sketch for windowed distinct: no re-scan per
    window, no users x days frame). Values never shuffle; the driver
    folds one register row per (day, block). The DuckDB oracle
    re-derives the splitmix64 hash, every per-day register, the
    windowed register max and both estimator branches — the ESTIMATES
    are oracled, not just plumbing."""
    from functools import reduce

    from ..core.sketch import HyperLogLog, hll_distinct_by
    from ..core.textstats import round_half_away

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def add_day(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // DAY_US)
        return pa.table({"day": pa.array(day.astype(np.int64)),
                         "user_id": t["user_id"]})

    sketches = hll_distinct_by(
        ds.map_batches(add_day, batch_format="pyarrow"), "day", "user_id")
    rows = []
    for d in sorted(sketches):
        window = [sketches[d - k] for k in range(7)
                  if (d - k) in sketches]
        wau = reduce(lambda a, b: a.merge(b), window, HyperLogLog())
        rows.append({
            "day": int(d),
            "dau_hll": float(round_half_away(sketches[d].estimate(), 6)),
            "wau_hll": float(round_half_away(wau.estimate(), 6)),
        })
    return pd.DataFrame(rows)


EMB_TRI_TAU = 0.3
EMB_TRI_NODE_LIMIT = 4_000
# raised 10x in round 5: with the broadcast corpus matrix gone, the
# edge fold is the ONLY driver materialization left in this family —
# 20M (a, b) int64 pairs is 320 MB against the 128 GB driver heap,
# and the peel/census algorithms are O(edges) numpy. The distributed
# escape hatch (node-iterator MapReduce census / degree-filter
# iterations) stays documented in each consumer.
EMB_TRI_EDGE_LIMIT = 20_000_000
EMB_TRI_CHUNKS = 8


def _emb_threshold_edges(sf_dir: str):
    """Shared edge builder for the similarity-graph queries: all
    (a < b) pairs with round-6 cosine ≥ EMB_TRI_TAU — EXACT, fully
    distributed (round 5): the blocked chunk-pair all-pairs join in
    ``stages/simgraph.py`` replaces the r3/r4 broadcast-corpus-matrix
    builder (which gathered the corpus to the driver behind a
    200k-vector guard). Nothing is broadcast; per-task memory is two
    chunks of the corpus; raise EMB_TRI_CHUNKS for bigger corpora.
    Only the resulting EDGES fold to the driver (the census/peel
    algorithms downstream are driver folds behind node guards), still
    behind the loud edge guard."""
    from ..stages.simgraph import blocked_cosine_edges

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    edges = blocked_cosine_edges(
        ds, "vec_id", "embedding", tau=EMB_TRI_TAU,
        n_chunks=EMB_TRI_CHUNKS)
    parts, n = [], 0
    for b in edges.iter_batches(batch_format="pyarrow",
                                batch_size=65536):
        n += b.num_rows
        if n > EMB_TRI_EDGE_LIMIT:
            raise RuntimeError(
                f"similarity edges: edge fold exceeded "
                f"{EMB_TRI_EDGE_LIMIT}; lower tau or move the census to "
                f"the node-iterator MapReduce form"
            )
        parts.append(b.select(["a", "b"]))
    e = pa.concat_tables(parts)
    return (e["a"].to_numpy(zero_copy_only=False),
            e["b"].to_numpy(zero_copy_only=False))


def q_emb_similarity_triangles(sf_dir: str):
    """Triangle census of the embedding similarity graph (cosine ≥
    0.3, round-6 before the threshold on BOTH sides so an ULP of
    accumulation order can't flip an edge): n_nodes/n_edges/
    n_triangles/n_wedges and the global clustering coefficient in
    integer ppm — the transitivity QC a near-dup graph gets before
    clustering ("are my similarity edges cliquey or hairball?").
    Shape: corpus matrix broadcast once (ray.put, loud-guarded — at
    100 TB edges come from the LSH bucket machinery instead), each
    batch emits its rows' edges vs the full matrix (a < b exactly
    once, one matmul per batch); the edge fold and the A@A*A triangle
    count are driver-side behind node/edge guards (the scale path is
    the node-iterator MapReduce algorithm — Suri/Vassilvitskii 2011).
    Past the node/edge guards — or under GRAFT_GRAPH_DISTRIBUTED=1 —
    the census dispatches to the node-iterator MapReduce form
    (`stages.simgraph.triangle_census_distributed`, Suri &
    Vassilvitskii 2011; round 5 implemented the documented escape
    hatch — equivalence in tests/test_simgraph.py)."""
    def _distributed():
        from ..stages.simgraph import (blocked_cosine_edges,
                                       triangle_census_distributed)

        edges = blocked_cosine_edges(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
            "vec_id", "embedding", tau=EMB_TRI_TAU,
            n_chunks=EMB_TRI_CHUNKS)
        return triangle_census_distributed(edges)

    if os.environ.get("GRAFT_GRAPH_DISTRIBUTED") == "1":
        return _distributed()
    try:
        a, b = _emb_threshold_edges(sf_dir)
    except RuntimeError:
        return _distributed()
    nodes = np.unique(np.concatenate([a, b]))
    if len(nodes) > EMB_TRI_NODE_LIMIT:
        return _distributed()
    m = len(nodes)
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    # packed-bitset adjacency: per-edge triangle support is
    # popcount(row[a] AND row[b]) — word ops, no O(n^3) integer
    # matmul (int32 A@A has no BLAS kernel; it cost 20+ s at 5k nodes)
    n_words = (m + 63) // 64
    adjw = np.zeros((m, n_words), np.uint64)
    for u, v in ((ai, bi), (bi, ai)):
        np.bitwise_or.at(adjw, (u, v // 64),
                         np.uint64(1) << (v % 64).astype(np.uint64))
    common = 0
    for lo in range(0, len(ai), 65536):
        sl = slice(lo, lo + 65536)
        both = adjw[ai[sl]] & adjw[bi[sl]]
        common += int(np.unpackbits(both.view(np.uint8)).sum())
    # every triangle contributes its third vertex to exactly 3 edges
    tri = common // 3
    deg = np.zeros(m, np.int64)
    np.add.at(deg, ai, 1)
    np.add.at(deg, bi, 1)
    wedges = int((deg * (deg - 1) // 2).sum())
    return pd.DataFrame([{
        "n_nodes": m, "n_edges": len(a), "n_triangles": tri,
        "n_wedges": wedges,
        "global_cc_ppm": 3 * tri * 1_000_000 // wedges if wedges else 0,
    }]).astype("int64")


WS_N_SAMPLES = 20


def q_docs_weighted_sample(sf_dir: str):
    """Probability-proportional-to-size (PPS) systematic sampling —
    the weighted sampling a data-mixing pass runs ("sample docs
    proportional to length/quality weight"), in EXACT integer
    arithmetic: docs ordered by the shared Knuth hash (deterministic
    shuffle), global inclusive prefix sum of the weights
    (stages/prefix.py — one sort + O(blocks) carry), doc picked with
    multiplicity cum//step − (cum−w)//step (a doc heavier than the
    step gets >1 pick, the true PPS-with-replacement semantic; no
    float, no rejection loop). Unlike the Efraimidis-Spirakis
    exponential-key reservoir there is NO libm call anywhere, so the
    oracle matches by exact integer equality."""
    from ..stages.prefix import global_prefix_sum
    from ..stages.watermark import knuth_arrival

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "w": t["n_chars"].cast(pa.int64()),
            "h": pa.array(knuth_arrival(d).astype(np.int64)),
        })

    scanned, total = global_prefix_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        order_cols=[("h", "ascending"), ("doc_id", "ascending")],
        val_col="w", out_col="cum",
    )
    step = total // WS_N_SAMPLES
    if step <= 0:
        raise RuntimeError(
            f"docs_weighted_sample: total weight {total} below "
            f"{WS_N_SAMPLES} samples — corpus too small for PPS")

    def pick(t: pa.Table) -> pa.Table:
        cum = t["cum"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        n_picks = cum // step - (cum - w) // step
        keep = np.flatnonzero(n_picks >= 1)
        out = t.take(pa.array(keep, pa.int64()))
        return out.append_column(
            "n_picks", pa.array(n_picks[keep], pa.int64()))

    out = (scanned.map_batches(pick, batch_format="pyarrow")
           .select_columns(["doc_id", "lang", "w", "n_picks"])
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_events_join_size_cms(sf_dir: str):
    """Join-cardinality estimation by Count-Min inner product
    (Cormode & Muthukrishnan 2005 §4.3 — the optimizer's sketch): the
    size of the per-user click x purchase join is Σ_u f_click(u) ·
    f_purchase(u); both frequency vectors compress to constant-size
    CMS counters built in ONE streaming pass (values never shuffle),
    and the estimate is min over hash rows of the row inner product —
    never an underestimate. The row reports estimate vs exact; the
    oracle re-derives both counter matrices, every row dot product and
    the min (the generated-hash precedent), plus the exact join size
    relationally."""
    from ..core.sketch import CountMin

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        sides, iis, cols, cnts = [], [], [], []
        for side in ("click", "purchase"):
            sk = CountMin().add(u[et == side])
            i, col = np.nonzero(sk.counters)
            sides.append(np.full(len(i), side == "purchase"))
            iis.append(i)
            cols.append(col)
            cnts.append(sk.counters[i, col])
        return pa.table({
            "s": pa.array(np.concatenate(sides)),
            "i": pa.array(np.concatenate(iis).astype(np.int64)),
            "col": pa.array(np.concatenate(cols).astype(np.int64)),
            "cnt": pa.array(np.concatenate(cnts).astype(np.int64)),
        })

    from ..core.sketch import CountMin as _CM
    acc = {False: _CM(), True: _CM()}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        s = b["s"].to_numpy(zero_copy_only=False)
        i = b["i"].to_numpy(zero_copy_only=False)
        col = b["col"].to_numpy(zero_copy_only=False)
        cnt = b["cnt"].to_numpy(zero_copy_only=False)
        for side in (False, True):
            m = s == side
            acc[side].counters[i[m], col[m]] += cnt[m]
    # estimate: min over rows of the row inner product (int64 exact)
    dots = (acc[False].counters.astype(object)
            * acc[True].counters.astype(object)).sum(axis=1)
    est = int(min(dots))

    # exact: per-user (clicks, purchases) partials -> driver fold
    def cpartial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "c": (et == "click").astype(np.int64),
            "p": (et == "purchase").astype(np.int64),
        })
        g = df.groupby("user_id", as_index=False).agg(
            c=("c", "sum"), p=("p", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    per_user = driver_grouped_agg(
        ds.map_batches(cpartial, batch_format="pyarrow"),
        ["user_id"], {"c": ("c", "sum"), "p": ("p", "sum")},
    )
    exact = int((per_user["c"].astype("int64")
                 * per_user["p"].astype("int64")).sum())
    return pd.DataFrame([{
        "n_exact": exact, "n_cms_est": est,
        "overest": est - exact,
    }]).astype("int64")


def q_events_autocorr(sf_dir: str):
    """Lag-1 serial correlation of the value stream per event type —
    the time-series stationarity probe. One sort on (event_type, ts,
    event_id) (a total order: event_id is unique), then per-block
    consecutive-pair sufficient statistics (int64-exact cents) with
    the O(blocks) SEAM pairs folded on the driver (the
    consecutive_pairs boundary trick applied to regression stats —
    no pair row ever materializes beyond the block edge rows). The
    float expression shape matches q_events_value_corr's oracle rule."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "event_id",
                                  "value"])

    def prep(t: pa.Table) -> pa.Table:
        c = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100.0)
        return pa.table({
            "event_type": t["event_type"], "ts": t["ts"],
            "event_id": t["event_id"],
            "c": pa.array(c.astype(np.int64)),
        })

    s = (ds.map_batches(prep, batch_format="pyarrow")
         .sort(["event_type", "ts", "event_id"]).materialize())

    def partial(t: pa.Table) -> pa.Table:
        g = t["event_type"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        if len(g) < 2:
            return pa.table({"event_type": pa.array([], pa.string()),
                             **{k: pa.array([], pa.int64())
                                for k in ("n", "sx", "sy", "sxy",
                                          "sxx", "syy")}})
        same = g[1:] == g[:-1]
        x, y, gg = c[:-1][same], c[1:][same], g[:-1][same]
        df = pd.DataFrame({"event_type": gg, "x": x, "y": y,
                           "xy": x * y, "xx": x * x, "yy": y * y})
        agg = df.groupby("event_type", as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum"), syy=("yy", "sum"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    def seam(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "ts": pa.array([], pa.timestamp("us")),
                             "eid": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.string())})
        idx = pa.array([0, t.num_rows - 1], pa.int64())
        return pa.table({"g": t["event_type"].take(idx),
                         "ts": t["ts"].take(idx),
                         "eid": t["event_id"].take(idx),
                         "c": t["c"].take(idx),
                         "pos": pa.array(["first", "last"])})

    parts = s.map_batches(partial, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    seams = (s.map_batches(seam, batch_format="pyarrow",
                           batch_size=None).to_pandas()
             .sort_values(["g", "ts", "eid", "pos"])
             .reset_index(drop=True))
    lasts = seams[seams["pos"] == "last"].reset_index(drop=True)
    firsts = seams[seams["pos"] == "first"].reset_index(drop=True)
    extra = []
    for i in range(len(lasts) - 1):
        if lasts.loc[i, "g"] == firsts.loc[i + 1, "g"]:
            x, y = int(lasts.loc[i, "c"]), int(firsts.loc[i + 1, "c"])
            extra.append({"event_type": lasts.loc[i, "g"], "n": 1,
                          "sx": x, "sy": y, "sxy": x * y,
                          "sxx": x * x, "syy": y * y})
    if extra:
        parts = pd.concat([parts, pd.DataFrame(extra)],
                          ignore_index=True)
    agg = (parts.sort_values(["event_type", "n", "sx", "sy"])
           .groupby("event_type", as_index=False)
           .agg({k: "sum" for k in ("n", "sx", "sy", "sxy",
                                    "sxx", "syy")})
           .sort_values("event_type").reset_index(drop=True))
    n = agg["n"].to_numpy(np.float64)
    sx = agg["sx"].to_numpy(np.float64)
    sy = agg["sy"].to_numpy(np.float64)
    sxy = agg["sxy"].to_numpy(np.float64)
    sxx = agg["sxx"].to_numpy(np.float64)
    syy = agg["syy"].to_numpy(np.float64)
    cov_n = n * sxy - sx * sy
    return pd.DataFrame({
        "event_type": agg["event_type"],
        "n_pairs": agg["n"].astype("int64"),
        "lag1_r": np.round(
            cov_n / np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6),
    })


def q_events_user_gini(sf_dir: str):
    """Gini coefficient of per-user spend — the Lorenz-curve skew
    diagnostic ("how hot are my keys?") that decides whether a
    pipeline needs the salted/hot-key machinery at all. EXACT integer
    form: per-user cent totals (one combiner pass + guarded fold;
    at 100 TB the rank is stages/prefix.py's sorted scan), rank-
    weighted sum, G = (2·Σi·w − (n+1)·Σw)·10^6 // (n·Σw) — no float
    anywhere, so the oracle matches by integer equality."""
    ds = _read(sf_dir, "events", ["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        c = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100.0)
        return pa.table({"user_id": t["user_id"],
                         "c": pa.array(c.astype(np.int64))})

    per_user = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id"], {"w": ("c", "sum")},
    )
    w = per_user.sort_values(["w", "user_id"])["w"].to_numpy(np.int64)
    n = len(w)
    total = int(w.sum())
    iw = int((np.arange(1, n + 1, dtype=np.int64) * w).sum())
    gini_ppm = (2 * iw - (n + 1) * total) * 1_000_000 // (n * total)
    return pd.DataFrame([{
        "n_users": n, "total_cents": total, "gini_ppm": gini_ppm,
    }]).astype("int64")


def q_events_type_drift(sf_dir: str):
    """Distribution-drift monitor: per day, KL(day's event-type mix ‖
    the corpus-wide mix) — the canary a streaming ingest runs to catch
    upstream behavior shifts. Counts come from ONE combiner pass
    (days × types partial rows); the float KL happens once on the
    driver over exact integer counts, terms summed in event_type order
    (5 doubles — round-6 immune to the oracle's unpinned sum order)."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // DAY_US)
        g = pa.table({"day": pa.array(day.astype(np.int64)),
                      "event_type": t["event_type"]}).group_by(
            ["day", "event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["day", "event_type", "n"])

    cnt = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day", "event_type"], {"n": ("n", "sum")},
    ).sort_values(["day", "event_type"]).reset_index(drop=True)
    overall = cnt.groupby("event_type")["n"].sum()
    big_n = int(overall.sum())
    rows = []
    for day, g in cnt.groupby("day"):
        nd = int(g["n"].sum())
        kl = 0.0
        for _, r in g.iterrows():
            c_dt, c_t = int(r["n"]), int(overall[r["event_type"]])
            # float-product shape mirrors the SQL ::DOUBLE expression
            kl += (c_dt / nd) * math.log(
                (float(c_dt) * float(big_n))
                / (float(nd) * float(c_t)))
        rows.append({"day": int(day), "n_events": nd,
                     "kl_nats": round(kl, 6)})
    return pd.DataFrame(rows)


DECAY_SCALE_BITS = 20


def q_events_decayed_revenue(sf_dir: str):
    """Exponentially-decayed revenue counters per event type (1-day
    half-life) — the streaming freshness-weighted metric — made
    INTEGER-EXACT by dyadic scaling: weight(age d days) = 2^(20−d)
    (a left shift; ages past 20 days decay below the scale and
    contribute exactly 0 — the documented truncation), so the decayed
    sum is Σ cents·2^(20−d), an int64 both engines compute
    identically — no pow(), no libm, none of the float-decay drift
    real decayed counters fight. One combiner pass; (type × day)
    partials fold on the driver; reference day = the corpus max."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // DAY_US)
        c = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100.0)
        g = pa.table({
            "event_type": t["event_type"],
            "day": pa.array(day.astype(np.int64)),
            "c": pa.array(c.astype(np.int64)),
        }).group_by(["event_type", "day"]).aggregate([("c", "sum")])
        return g.rename_columns(["event_type", "day", "c"])

    cnt = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "day"], {"c": ("c", "sum")},
    )
    t_day = int(cnt["day"].max())
    age = t_day - cnt["day"].to_numpy(np.int64)
    c = cnt["c"].to_numpy(np.int64)
    live = age <= DECAY_SCALE_BITS
    shift = (DECAY_SCALE_BITS - age[live]).astype(np.int64)
    scaled = c[live] * (np.int64(1) << shift)
    df = pd.DataFrame({"event_type": cnt["event_type"].to_numpy()[live],
                       "s": scaled})
    out = (df.groupby("event_type", as_index=False)["s"].sum()
           .rename(columns={"s": "decayed_scaled"})
           .sort_values("event_type").reset_index(drop=True))
    out["decayed_scaled"] = out["decayed_scaled"].astype("int64")
    # half-AWAY rounding, not pandas' half-even: the scaled values are
    # dyadic rationals, which CAN land exactly on a .00005 boundary
    # (p ≡ 0 mod 2^15) — the one family where the usual measure-zero
    # tie argument does not hold
    from ..core.textstats import round_half_away
    out["decayed_cents"] = [
        float(round_half_away(v / float(1 << DECAY_SCALE_BITS), 4))
        for v in out["decayed_scaled"]
    ]
    return out


TIMETRAVEL_ORACLE_DIR = "/tmp/ocracle_timetravel_oracle"
_TT_V2_NOTE = b"<!-- recrawl v2 -->"
_TT_V3_NOTE = b"<!-- recrawl v3 -->"


def q_pages_time_travel(sf_dir: str):
    """Time-travel read (the Delta/Iceberg ``AS OF`` semantic) over a
    multi-version crawl history: three observation generations (base
    crawl; urls ≡3 mod 7 re-observed at +30 d; urls ≡2 mod 5 at
    +60 d — each generation stores ONLY its new observations, the CDC
    storage shape), reconstructed at three as-of timestamps by
    filter(ts ≤ T) → the flagship's bucketed keep-latest dedup. The
    census per as-of pins which generation WINS per url (counts by
    version + fingerprint XOR). Strong artifact oracle: the raw
    version rows AND the as-of cut list are written; SQL re-derives
    every reconstruction via row_number over (ts DESC, fp DESC) per
    (as_of, url) and the full census — only the blake2b fingerprint is
    trusted."""
    import shutil

    import pyarrow.parquet as _pq
    import ray.data as rd

    from ..sources.pages import PAGES_SCHEMA, gen_page, n_docs_for_sf, \
        sf_of_dir
    from ..stages.extract import dedup_keep_latest_records
    from ..stages.snapshot import fingerprint_pages

    sf = sf_of_dir(sf_dir)
    n = min(1500, n_docs_for_sf(sf))

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        if not ids:
            return PAGES_SCHEMA.empty_table()
        rows = [gen_page(i) for i in ids]
        return pa.Table.from_pydict(
            {
                "url": [r["url"] for r in rows],
                "warc_ts": pa.array([r["warc_ts"] for r in rows],
                                    pa.timestamp("us")),
                "html": pa.array([r["html"] for r in rows],
                                 pa.large_binary()),
                "text": pa.array([r["text"] for r in rows],
                                 pa.large_string()),
                "lang": [r["lang"] for r in rows],
            },
            schema=PAGES_SCHEMA,
        )

    base = rd.range(n).map_batches(gen, batch_format="pyarrow",
                                   batch_size=256)
    # anchor: generations get CONSTANT absolute timestamps derived from
    # the base crawl's max ts, so the as-of cuts separate cleanly no
    # matter how wide the base ts spread is
    max_ts = int(base.map_batches(
        lambda t: pa.table({"m": pa.array(
            [int(t["warc_ts"].cast(pa.int64()).to_numpy(
                zero_copy_only=False).max())] if t.num_rows else [],
            pa.int64())}),
        batch_format="pyarrow").max("m"))
    d30 = 30 * DAY_US

    def regen(mod: int, rem: int, note: bytes, ts_us: int):
        def fn(t: pa.Table) -> pa.Table:
            urls = t["url"].to_pylist()
            keep = [i for i, u in enumerate(urls)
                    if int(u[-6:]) % mod == rem]
            s = t.take(pa.array(keep, pa.int64()))
            html = [h + note for h in s["html"].to_pylist()]
            return pa.table({
                "url": s["url"],
                "warc_ts": pa.array(
                    np.full(s.num_rows, ts_us, np.int64)
                    .astype("datetime64[us]"), pa.timestamp("us")),
                "html": pa.array(html, pa.large_binary()),
                "text": s["text"], "lang": s["lang"],
            }, schema=PAGES_SCHEMA)
        return fn

    v2 = base.map_batches(regen(7, 3, _TT_V2_NOTE, max_ts + d30),
                          batch_format="pyarrow")
    v3 = base.map_batches(regen(5, 2, _TT_V3_NOTE, max_ts + 2 * d30),
                          batch_format="pyarrow")
    hist = (fingerprint_pages(base, "v1")
            .union(fingerprint_pages(v2, "v2"))
            .union(fingerprint_pages(v3, "v3"))).materialize()

    out_dir = f"{TIMETRAVEL_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(f"{out_dir}/asof")
    hist.map_batches(
        lambda t: pa.table({
            "side": t["side"], "url": t["url"],
            "ts_us": t["warc_ts"].cast(pa.int64()),
            "fp": t["text_fingerprint"],
        }), batch_format="pyarrow",
    ).write_parquet(f"{out_dir}/rows")
    cuts = [("t0", max_ts), ("t1", max_ts + d30 + d30 // 2),
            ("latest", max_ts + 3 * d30)]
    _pq.write_table(
        pa.table({"as_of": pa.array([c for c, _ in cuts]),
                  "as_of_us": pa.array([t for _, t in cuts],
                                       pa.int64())}),
        f"{out_dir}/asof/part-0.parquet")

    def census(t: pa.Table) -> pa.Table:
        s = t["side"].to_numpy(zero_copy_only=False)
        fp = t["text_fingerprint"].to_numpy(zero_copy_only=False)
        fpx = (int(np.bitwise_xor.reduce(fp.astype(np.int64)
                                         .view(np.uint64)))
               if t.num_rows else 0)
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "fpx": pa.array([int(np.int64(np.uint64(fpx)))], pa.int64()),
            **{f"n_{v}": pa.array([int((s == v).sum())], pa.int64())
               for v in ("v1", "v2", "v3")},
        })

    res = []
    for label, t_us in cuts:
        cut = hist.map_batches(
            lambda t, _t=t_us: t.filter(
                pc.less_equal(t["warc_ts"].cast(pa.int64()),
                              pa.scalar(_t, pa.int64()))),
            batch_format="pyarrow")
        state = dedup_keep_latest_records(cut, n_buckets=16)
        parts = state.map_batches(
            census, batch_format="pyarrow", batch_size=None).to_pandas()
        fpx = 0
        for v in parts["fpx"]:
            fpx ^= int(np.uint64(np.int64(v)))
        res.append({
            "as_of": label,
            "n_urls": int(parts["n"].sum()),
            "fp_xor": int(np.int64(np.uint64(fpx))),
            "n_v1": int(parts["n_v1"].sum()),
            "n_v2": int(parts["n_v2"].sum()),
            "n_v3": int(parts["n_v3"].sum()),
        })
    out = pd.DataFrame(res).sort_values("as_of").reset_index(drop=True)
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def _user_domain(ds) -> int:
    from ..stages.bitmap import BITMAP_DOMAIN_LIMIT

    mx = int(ds.max("user_id"))
    if mx + 1 > BITMAP_DOMAIN_LIMIT:
        raise RuntimeError(
            f"user_id domain {mx + 1} exceeds the single-bitmap limit "
            f"{BITMAP_DOMAIN_LIMIT}; partition the key space into "
            f"roaring-style ranges (stages/bitmap.py docstring)")
    return mx + 1


def q_events_audience_bitmap(sf_dir: str):
    """Audience segmentation on a bitmap index (stages.bitmap — the
    Druid/Pinot primitive): one distinct-pair pass builds a per-
    event-type bitmap over the declared user domain, then every
    boolean segment (engaged-and-converted, engaged-without-errors,
    any-engagement) is whole-word AND/OR/ANDNOT + popcount — no
    re-scan per segment, which is the entire point of the index."""
    from ..stages.bitmap import Bitmap, build_bitmaps

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    domain = _user_domain(ds)
    bms = build_bitmaps(ds, set_col="event_type", key_col="user_id",
                        domain=domain)
    empty = Bitmap(domain)
    c = bms.get("click", empty)
    p = bms.get("purchase", empty)
    e = bms.get("error", empty)
    s = bms.get("signup", empty)
    segs = [
        ("any_engaged", c.or_(p).or_(s).popcount()),
        ("click_and_purchase", c.and_(p).popcount()),
        ("click_not_error", c.andnot(e).popcount()),
    ]
    return pd.DataFrame(
        {"segment": [k for k, _ in segs],
         "n_users": pd.array([v for _, v in segs], dtype="int64")}
    ).sort_values("segment").reset_index(drop=True)


def q_events_audience_churn(sf_dir: str):
    """Day-over-day audience churn from per-day bitmaps: for every
    consecutive day pair, retained users = popcount(AND) and Jaccard
    overlap in integer ppm — the cohort-stability monitor, each day
    pair answered by two word-wise ops instead of a self-join."""
    from ..stages.bitmap import build_bitmaps

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    domain = _user_domain(ds)

    def add_day(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // DAY_US)
        return pa.table({"day": pa.array(day.astype(np.int64)),
                         "user_id": t["user_id"]})

    bms = build_bitmaps(ds.map_batches(add_day, batch_format="pyarrow"),
                        set_col="day", key_col="user_id", domain=domain)
    rows = []
    for d in sorted(bms):
        if (d - 1) not in bms:
            continue
        cur, prev = bms[d], bms[d - 1]
        inter = cur.and_(prev).popcount()
        union = cur.or_(prev).popcount()
        rows.append({
            "day": int(d), "n_prev": prev.popcount(),
            "n_cur": cur.popcount(), "n_retained": inter,
            "jaccard_ppm": inter * 1_000_000 // union,
        })
    return pd.DataFrame(rows).astype("int64")


PHRASE_INDEX_DIR = "/tmp/ocracle_pos_index"


def q_docs_phrase_search(sf_dir: str):
    """Exact phrase search on a POSITIONAL inverted index
    (stages.invindex.build_positional_index — the Lucene model):
    postings carry (term, doc, pos), so a phrase resolves by position
    adjacency over ONLY the buckets its terms hash to, never a corpus
    re-scan. The phrase is the corpus's top bigram (count desc, then
    lexicographic — re-derived identically in SQL), so the query is
    live at every sf. Returns the top-10 matching docs by match
    count."""
    from ..stages.invindex import build_positional_index, \
        query_index_phrase
    from ..stages.ngram_lm import BOS, SEP, bigram_counts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    model = bigram_counts(ds)
    best = None
    for k, n in zip(model["bg_keys"], model["bg_n"]):
        w1, w2 = k.split(SEP, 1)
        if w1 == BOS:
            continue
        cand = (-n, w1, w2)
        if best is None or cand < best:
            best = cand
    w1, w2 = best[1], best[2]

    idx_dir = f"{PHRASE_INDEX_DIR}/current"
    build_positional_index(ds, idx_dir)
    m = query_index_phrase(idx_dir, [w1, w2])
    m["w1"], m["w2"] = w1, w2
    out = (m.sort_values(["n_matches", "doc_id"],
                         ascending=[False, True]).head(10)
           .reset_index(drop=True))
    return out[["w1", "w2", "doc_id", "n_matches"]]


def q_events_audience_overlap_hll(sf_dir: str):
    """Sketched audience overlap — HLL set algebra by inclusion-
    exclusion: |click ∩ purchase| ≈ est(A) + est(B) − est(A∪B) with
    the union sketch being the register MAX (no third scan, no key
    exchange — the sketch-algebra sibling of the exact bitmap
    intersection). The oracle re-derives ALL THREE register sets and
    estimates plus the exact intersection, so the inclusion-exclusion
    estimate itself is verified."""
    from ..core.sketch import hll_distinct_by
    from ..core.textstats import round_half_away

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    two = ds.map_batches(
        lambda t: t.filter(pc.is_in(
            t["event_type"],
            value_set=pa.array(["click", "purchase"]))),
        batch_format="pyarrow")
    sketches = hll_distinct_by(two, "event_type", "user_id")
    a, b = sketches["click"], sketches["purchase"]
    ea, eb = a.estimate(), b.estimate()
    eu = a.merge(b).estimate()

    # exact intersection: distinct-pair combiner + tiny driver fold
    pairs = driver_grouped_agg(
        two.map_batches(
            lambda t: t.select(["user_id", "event_type"]).group_by(
                ["user_id", "event_type"]).aggregate([]),
            batch_format="pyarrow"),
        ["user_id", "event_type"], {"n": ("event_type", "count")},
    )
    per_user = pairs.groupby("user_id")["event_type"].nunique()
    n_exact = int((per_user == 2).sum())
    return pd.DataFrame([{
        "n_exact": n_exact,
        "est_click": float(round_half_away(ea, 6)),
        "est_purchase": float(round_half_away(eb, 6)),
        "est_union": float(round_half_away(eu, 6)),
        "est_inter": float(round_half_away(ea + eb - eu, 6)),
    }])


def q_events_funnel_delay(sf_dir: str):
    """Time-to-convert distribution: per user, first signup → first
    purchase AT OR AFTER it, delay quantiles as EXACT order statistics
    (value at 1 + q·(n−1)//1000 in the (delay, user) total order — no
    float interpolation to disagree on). Two broadcast passes, zero
    shuffle: pass 1 folds min-signup-ts per user (guarded), pass 2
    folds min qualifying purchase per user against the ray.put map."""
    import ray

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "event_type": t["event_type"],
            "ts_us": t["ts"].cast(pa.int64()),
        })

    p = ds.map_batches(prep, batch_format="pyarrow").materialize()

    def signup_partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["event_type"], "signup"))
        return pa.table({"user_id": f["user_id"], "ts_us": f["ts_us"]})

    signup = driver_grouped_agg(
        p.map_batches(signup_partial, batch_format="pyarrow"),
        ["user_id"], {"s_ts": ("ts_us", "min")},
    )
    s_map = dict(zip(signup["user_id"].astype(int),
                     signup["s_ts"].astype(int)))
    ref = ray.put(s_map)

    def purchase_partial(t: pa.Table) -> pa.Table:
        sm = _cached_broadcast(ref)
        f = t.filter(pc.equal(t["event_type"], "purchase"))
        u = f["user_id"].to_numpy(zero_copy_only=False)
        ts = f["ts_us"].to_numpy(zero_copy_only=False)
        # sentinel 2^62: exactly float64-representable (int64 max is
        # not — the map's fillna round-trips through float)
        s = (pd.Series(u).map(sm)
             .fillna(float(1 << 62)).to_numpy(np.int64))
        keep = ts >= s
        return pa.table({
            "user_id": pa.array(u[keep]),
            "d_us": pa.array(ts[keep] - s[keep]),
        })

    conv = driver_grouped_agg(
        p.map_batches(purchase_partial, batch_format="pyarrow"),
        ["user_id"], {"d_us": ("d_us", "min")},
    )
    d_min = (conv["d_us"].astype("int64") // 60_000_000).to_numpy(
        np.int64)
    order = np.lexsort((conv["user_id"].to_numpy(np.int64), d_min))
    d_sorted = d_min[order]
    n = len(d_sorted)

    def q_at(q_pm: int) -> int:
        return int(d_sorted[(q_pm * (n - 1)) // 1000])

    return pd.DataFrame([{
        "n_signup": len(signup), "n_converted": n,
        "p50_delay_min": q_at(500),
        "p90_delay_min": q_at(900),
        "p99_delay_min": q_at(990),
    }]).astype("int64")


BFS_HOPS = 3


def q_emb_graph_bfs(sf_dir: str):
    """Hop-census BFS on the cosine≥0.3 similarity graph from its
    max-degree node (tie: smallest vec_id) — the reachability probe
    ("how much of the near-dup graph does one hub touch in k hops?").
    Edges come from the shared `_emb_threshold_edges` distributed
    pass; each BFS level is ONE packed-bitword OR/ANDNOT over the
    frontier rows — no per-node Python. Past the node/edge guards (or
    under GRAFT_GRAPH_DISTRIBUTED=1) it dispatches to the distributed
    frontier-join lane (`stages.simgraph.bfs_hop_census_distributed`
    — broadcast frontier, per-hop map over the edge Dataset, driver
    holds O(visited) ids; round 5 implemented the documented escape
    hatch, equivalence in tests/test_simgraph.py). Oracle: seed +
    every level re-derived relationally from the identical edge
    rule."""
    def _distributed():
        from ..stages.simgraph import (blocked_cosine_edges,
                                       bfs_hop_census_distributed)

        edges = blocked_cosine_edges(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
            "vec_id", "embedding", tau=EMB_TRI_TAU,
            n_chunks=EMB_TRI_CHUNKS)
        return bfs_hop_census_distributed(edges, hops=BFS_HOPS)

    if os.environ.get("GRAFT_GRAPH_DISTRIBUTED") == "1":
        return _distributed()
    try:
        a, b = _emb_threshold_edges(sf_dir)
    except RuntimeError:
        return _distributed()
    nodes = np.unique(np.concatenate([a, b]))
    if len(nodes) > EMB_TRI_NODE_LIMIT:
        return _distributed()
    m = len(nodes)
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    deg = np.zeros(m, np.int64)
    np.add.at(deg, ai, 1)
    np.add.at(deg, bi, 1)
    # seed: max degree, tie-break smallest vec_id (nodes is sorted)
    seed = int(np.argmax(deg))
    n_words = (m + 63) // 64
    adjw = np.zeros((m, n_words), np.uint64)
    for u, v in ((ai, bi), (bi, ai)):
        np.bitwise_or.at(adjw, (u, v // 64),
                         np.uint64(1) << (v % 64).astype(np.uint64))
    visited = np.zeros(n_words, np.uint64)
    frontier = np.zeros(n_words, np.uint64)
    frontier[seed // 64] |= np.uint64(1) << np.uint64(seed % 64)
    visited |= frontier
    rows = []
    for hop in range(1, BFS_HOPS + 1):
        idx = np.flatnonzero(
            np.unpackbits(frontier.view(np.uint8)).astype(bool))
        # bit i of word w ↔ node w*64 + i; unpackbits is MSB-first per
        # byte, so recover node ids via byte/bit arithmetic
        byte_i = idx // 8
        bit_i = 7 - (idx % 8)
        node_ids = byte_i * 8 + bit_i
        node_ids = node_ids[node_ids < m]
        nxt = (np.bitwise_or.reduce(adjw[node_ids], axis=0)
               if len(node_ids) else np.zeros(n_words, np.uint64))
        frontier = nxt & ~visited
        visited |= frontier
        rows.append({
            "hop": hop,
            "n_new": int(np.unpackbits(
                frontier.view(np.uint8)).sum()),
            "n_reached": int(np.unpackbits(
                visited.view(np.uint8)).sum()) - 1,  # minus the seed
        })
    out = pd.DataFrame(rows)
    out["seed_vec_id"] = int(nodes[seed])
    return out[["hop", "seed_vec_id", "n_new", "n_reached"]].astype(
        "int64")


def q_events_ab_test(sf_dir: str):
    """Welch's t-test between two event cohorts (click vs view spend)
    — the experimentation readout: ONE streaming pass of int64-exact
    (n, Σc, Σc²) per cohort, then the t statistic computed once on
    the driver with the identical ::DOUBLE expression shape as the
    oracle (unequal variances, no pooled assumption)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_in(t["event_type"],
                              value_set=pa.array(["click", "view"])))
        c = np.rint(f["value"].to_numpy(zero_copy_only=False) * 100.0
                    ).astype(np.int64)
        return pa.table({"event_type": f["event_type"],
                         "c": pa.array(c),
                         "cc": pa.array(c * c)})

    agg = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"],
        {"n": ("c", "count"), "s": ("c", "sum"), "q": ("cc", "sum")},
    ).set_index("event_type")

    def stats(g: str):
        n = float(agg.loc[g, "n"])
        s = float(agg.loc[g, "s"])
        q = float(agg.loc[g, "q"])
        mean = s / n
        var = (q - s * s / n) / (n - 1.0)
        return n, mean, var

    na, ma, va = stats("click")
    nb, mb, vb = stats("view")
    t_stat = (ma - mb) / math.sqrt(va / na + vb / nb)
    return pd.DataFrame([{
        "n_click": int(na), "n_view": int(nb),
        "mean_click": round(ma, 4), "mean_view": round(mb, 4),
        "t_welch": round(t_stat, 6),
    }])


def q_events_cube(sf_dir: str):
    """CUBE grouping sets over (event_type, weekday) from ONE
    finest-grain pass: every coarser set derives from the finest
    RESULT (integer cents keep all four levels bit-exact — the rollup
    trick extended to the full lattice), never a second scan.
    Sentinels: '(all)' / -1 (no null keys exist by construction)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // DAY_US)
        c = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100.0
                    ).astype(np.int64)
        g = pa.table({
            "event_type": t["event_type"],
            "weekday": pa.array((day % 7).astype(np.int64)),
            "c": pa.array(c),
        }).group_by(["event_type", "weekday"]).aggregate(
            [("c", "sum"), ("c", "count")])
        return g.rename_columns(["event_type", "weekday", "c", "n"])

    fin = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "weekday"],
        {"n": ("n", "sum"), "cents": ("c", "sum")},
    )
    fin["weekday"] = fin["weekday"].astype("int64")
    levels = [fin]
    by_t = fin.groupby("event_type", as_index=False)[["n", "cents"]].sum()
    by_t["weekday"] = np.int64(-1)
    by_w = fin.groupby("weekday", as_index=False)[["n", "cents"]].sum()
    by_w["event_type"] = "(all)"
    allr = pd.DataFrame([{
        "event_type": "(all)", "weekday": np.int64(-1),
        "n": fin["n"].sum(), "cents": fin["cents"].sum()}])
    out = pd.concat(
        [lv[["event_type", "weekday", "n", "cents"]]
         for lv in (fin, by_t, by_w, allr)], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    out["cents"] = out["cents"].astype("int64")
    return out.sort_values(["event_type", "weekday"]).reset_index(
        drop=True)


COVER_STEPS = 3


def q_docs_greedy_cover(sf_dir: str):
    """Greedy max-coverage data selection (the submodular coreset
    pick: "which k docs add the most lexical diversity?") over the
    BIGRAM universe (916 distinct bigrams here — unigrams are
    degenerate: one doc covers all 31): one distinct-(doc, bigram)
    combiner pass, driver-side packed bitmaps per doc
    (stages.bitmap), then k greedy steps — each step ONE vectorized
    popcount(doc_words AND NOT covered) over all docs, tie-break
    (gain desc, doc_id asc). The classic 1−1/e-approximation
    (Nemhauser et al. 1978); at 100 TB each step is one broadcast
    re-scan of the doc-bigram pairs."""
    from ..stages.bitmap import Bitmap
    from ..stages.ngram_lm import BOS, SEP, _doc_token_stream

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        parents, prev, tok = _doc_token_stream(t["text"])
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = pc.not_equal(prev, BOS)
        key = pc.binary_join_element_wise(
            prev.filter(keep), tok.filter(keep), SEP)
        doc = pa.array(ids[parents[keep.to_numpy(zero_copy_only=False)]],
                       pa.int64())
        return pa.table({"doc_id": doc, "key": key}).group_by(
            ["doc_id", "key"]).aggregate([])

    pairs = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["doc_id", "key"], {"n": ("key", "count")},
    )[["doc_id", "key"]]
    vocab = {k: i for i, k in enumerate(sorted(pairs["key"].unique()))}
    domain = len(vocab)
    doc_ids = np.sort(pairs["doc_id"].unique()).astype(np.int64)
    n_words = (domain + 63) // 64
    W = np.zeros((len(doc_ids), n_words), np.uint64)
    row_of = {int(d): i for i, d in enumerate(doc_ids)}
    ki = pairs["key"].map(vocab).to_numpy(np.int64)
    ri = pairs["doc_id"].map(row_of).to_numpy(np.int64)
    np.bitwise_or.at(W, (ri, ki // 64),
                     np.uint64(1) << (ki % 64).astype(np.uint64))

    covered = np.zeros(n_words, np.uint64)
    picked: list[int] = []
    rows = []
    alive = np.ones(len(doc_ids), bool)
    for step in range(1, COVER_STEPS + 1):
        gains = np.unpackbits(
            (W & ~covered[None, :]).view(np.uint8), axis=1).sum(axis=1)
        gains = np.where(alive, gains, -1)
        best = int(np.argmax(gains))  # first max = smallest doc_id
        covered |= W[best]
        alive[best] = False
        picked.append(int(doc_ids[best]))
        rows.append({
            "step": step, "doc_id": int(doc_ids[best]),
            "n_new": int(gains[best]),
            "n_covered": int(np.unpackbits(
                covered.view(np.uint8)).sum()),
        })
    return pd.DataFrame(rows).astype("int64")


def q_events_trimmed_mean(sf_dir: str):
    """Rank-windowed robust statistics: the exact 10–90% trimmed mean
    per event type — ranks, not value cuts, so boundary TIES are
    handled by arithmetic (overlap of each value's rank span with the
    window), never by row order. One combiner pass folds the
    (type, cents) histogram (bounded value domain — the guard names
    the two-pass histogram refinement as the unbounded-domain path);
    every sum is int64 cents, the one float division mirrors SQL."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        c = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100.0
                    ).astype(np.int64)
        g = pa.table({"event_type": t["event_type"],
                      "c": pa.array(c)}).group_by(
            ["event_type", "c"]).aggregate([("c", "count")])
        return g.rename_columns(["event_type", "c", "n"])

    hist = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "c"], {"n": ("n", "sum")},
    ).sort_values(["event_type", "c"]).reset_index(drop=True)
    rows = []
    for et, g in hist.groupby("event_type"):
        c = g["c"].to_numpy(np.int64)
        cnt = g["n"].to_numpy(np.int64)
        n = int(cnt.sum())
        lo = (100 * (n - 1)) // 1000
        hi = (900 * (n - 1)) // 1000
        ends = np.cumsum(cnt)            # exclusive end rank per value
        starts = ends - cnt              # start rank per value
        inc = np.minimum(ends - 1, hi) - np.maximum(starts, lo) + 1
        inc = np.maximum(inc, 0)
        s_trim = int((inc * c).sum())
        n_trim = hi - lo + 1
        rows.append({
            "event_type": et, "n_trim": n_trim,
            "sum_trim_cents": s_trim,
            "trimmed_mean": round(
                float(s_trim) / float(n_trim) / 100.0, 4),
        })
    return pd.DataFrame(rows).sort_values("event_type").reset_index(
        drop=True)


def q_events_value_emd(sf_dir: str):
    """Distribution drift as EXACT optimal transport: Wasserstein-1
    (earth-mover) distance between the first-week and last-week value
    distributions — EMD_1 in 1-D is the area between CDFs, computed
    EXACTLY in integers on the common denominator n_a·n_b:
    Σ_v |cumA(v)·n_b − cumB(v)·n_a| · gap(v), then ONE floor division
    to millicents. The KL drift monitor's metric sibling: KL needs
    shared support, EMD doesn't. One (day, cents) combiner pass
    (30 days × bounded cents domain; an unbounded domain needs the
    two-pass histogram refinement — same note as trimmed-mean)."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // DAY_US)
        c = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100.0
                    ).astype(np.int64)
        g = pa.table({"day": pa.array(day.astype(np.int64)),
                      "c": pa.array(c)}).group_by(
            ["day", "c"]).aggregate([("c", "count")])
        return g.rename_columns(["day", "c", "n"])

    hist = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day", "c"], {"n": ("n", "sum")},
    )
    d0, d1 = int(hist["day"].min()), int(hist["day"].max())
    a = (hist[hist["day"] < d0 + 7].groupby("c")["n"].sum()
         .sort_index())
    b = (hist[hist["day"] > d1 - 7].groupby("c")["n"].sum()
         .sort_index())
    merged = pd.DataFrame({"na": a, "nb": b}).fillna(0).sort_index()
    vals = merged.index.to_numpy(np.int64)
    ta = int(merged["na"].sum())
    tb = int(merged["nb"].sum())
    ca = merged["na"].cumsum().to_numpy(np.int64)
    cb = merged["nb"].cumsum().to_numpy(np.int64)
    gaps = np.diff(vals)
    # Python-int fold: |ca·tb − cb·ta|·gap overflows int64 at scale
    emd_scaled = sum(
        abs(int(ca[i]) * tb - int(cb[i]) * ta) * int(gaps[i])
        for i in range(len(gaps))
    )
    return pd.DataFrame([{
        "n_first": ta, "n_last": tb,
        "emd_millicents": emd_scaled * 1000 // (ta * tb),
    }]).astype("int64")


def q_orders_benford(sf_dir: str):
    """Benford first-digit audit of order totals — the fraud/synthetic
    -data forensic: observed leading-digit counts vs Benford's law
    n·log10(1+1/d), with per-digit chi² contributions. Digit
    extraction is EXACT integer repeated-division (no log10 floor at
    power-of-ten boundaries); one 9-cell combiner pass; the float
    expectation/chi² mirror the SQL expression shape."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = np.rint(t["o_totalprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
        c = c[c > 0]
        while np.any(c >= 10):  # ≤ 9 vectorized passes for int64
            big = c >= 10
            c[big] //= 10
        dig, cnt = np.unique(c, return_counts=True)
        return pa.table({"digit": pa.array(dig),
                         "n_obs": pa.array(cnt.astype(np.int64))})

    agg = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["digit"], {"n_obs": ("n_obs", "sum")},
    ).sort_values("digit").reset_index(drop=True)
    n = int(agg["n_obs"].sum())
    digit = agg["digit"].to_numpy(np.int64)
    obs = agg["n_obs"].to_numpy(np.int64).astype(np.float64)
    exp = float(n) * np.log10(1.0 + 1.0 / digit.astype(np.float64))
    return pd.DataFrame({
        "digit": agg["digit"].astype("int64"),
        "n_obs": agg["n_obs"].astype("int64"),
        "expected_n": np.round(exp, 4),
        "chi2_contrib": np.round((obs - exp) * (obs - exp) / exp, 6),
    })


def q_events_value_mode(sf_dir: str):
    """Exact grouped MODE (most frequent cents value per event type,
    tie-break smallest value) — the one central-tendency statistic
    mean/median machinery can't derive; same (type, cents) histogram
    combiner as trimmed-mean/EMD, argmax on the driver."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        c = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100.0
                    ).astype(np.int64)
        g = pa.table({"event_type": t["event_type"],
                      "c": pa.array(c)}).group_by(
            ["event_type", "c"]).aggregate([("c", "count")])
        return g.rename_columns(["event_type", "c", "n"])

    hist = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "c"], {"n": ("n", "sum")},
    ).sort_values(["event_type", "n", "c"],
                  ascending=[True, False, True])
    top = hist.groupby("event_type", as_index=False).first()
    top["mode_cents"] = top["c"].astype("int64")
    top["n_mode"] = top["n"].astype("int64")
    return (top[["event_type", "mode_cents", "n_mode"]]
            .sort_values("event_type").reset_index(drop=True))


def q_events_top_trigrams(sf_dir: str):
    """Top behavioral paths: the 10 most common per-user event-type
    TRIGRAMS — sequence mining one order above the Markov pair
    builder, on stages/ngrams_seq.py's k-row boundary carry (a window
    can span three tiny blocks, so blocks with ≤ 2(n−1) rows are
    carried whole; the pair seam's single-edge stitch can't express
    that). Tie-break (count desc, then lexicographic path)."""
    from ..stages.ngrams_seq import SEP, consecutive_ngram_counts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])
    counts = consecutive_ngram_counts(
        ds, group_col="user_id", order_cols=["ts", "event_id"],
        item_col="event_type", n=3)
    top = counts.head(10).copy()
    split = top["gram"].str.split(SEP, expand=True)
    top["t0"], top["t1"], top["t2"] = split[0], split[1], split[2]
    top["n_occurrences"] = top["cnt"].astype("int64")
    return top[["t0", "t1", "t2", "n_occurrences"]].reset_index(
        drop=True)


def q_events_hhi(sf_dir: str):
    """Herfindahl–Hirschman concentration of daily activity across
    event types (Simpson's index) — Gini's concentration sibling and
    the mix-collapse alarm ("did one event type swallow the day?").
    INTEGER-EXACT: hhi_ppm = Σ n_t² · 10^6 // n² per day, from the
    same (day, type) combiner pass as the KL drift monitor."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // DAY_US)
        g = pa.table({"day": pa.array(day.astype(np.int64)),
                      "event_type": t["event_type"]}).group_by(
            ["day", "event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["day", "event_type", "n"])

    cnt = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day", "event_type"], {"n": ("n", "sum")},
    )
    rows = []
    for day, g in cnt.groupby("day"):
        n = int(g["n"].sum())
        ssq = int((g["n"].astype("int64") ** 2).sum())
        rows.append({"day": int(day), "n_events": n,
                     "hhi_ppm": ssq * 1_000_000 // (n * n)})
    return (pd.DataFrame(rows).astype("int64")
            .sort_values("day").reset_index(drop=True))


def q_events_burstiness(sf_dir: str):
    """Inter-arrival burstiness per event type (Goh & Barabási 2008:
    B = (σ−μ)/(σ+μ) of the gap distribution; −1 periodic, 0 Poisson,
    →1 bursty) — the temporal-structure probe behind rate-limiter and
    capacity sizing. Gaps are INTEGER SECONDS of the consecutive-pair
    differences over the (type, ts, event_id) total order (floor of
    the DIFFERENCE, mirrored in SQL); per-block gap sufficient stats +
    the O(blocks) seam pairs — the autocorr machinery with the pair
    collapsed to its difference."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "event_id"])

    s = (ds.map_batches(
        lambda t: pa.table({"event_type": t["event_type"],
                            "ts": t["ts"], "event_id": t["event_id"],
                            "us": t["ts"].cast(pa.int64())}),
        batch_format="pyarrow")
        .sort(["event_type", "ts", "event_id"]).materialize())

    def partial(t: pa.Table) -> pa.Table:
        g = t["event_type"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        if len(g) < 2:
            return pa.table({"event_type": pa.array([], pa.string()),
                             **{k: pa.array([], pa.int64())
                                for k in ("n", "sg", "sgg")}})
        same = g[1:] == g[:-1]
        gap = (us[1:] - us[:-1])[same] // 1_000_000
        gg = g[:-1][same]
        df = pd.DataFrame({"event_type": gg, "gap": gap,
                           "gap2": gap * gap})
        agg = df.groupby("event_type", as_index=False).agg(
            n=("gap", "size"), sg=("gap", "sum"), sgg=("gap2", "sum"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    def seam(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "ts": pa.array([], pa.timestamp("us")),
                             "eid": pa.array([], pa.int64()),
                             "us": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.string())})
        idx = pa.array([0, t.num_rows - 1], pa.int64())
        return pa.table({"g": t["event_type"].take(idx),
                         "ts": t["ts"].take(idx),
                         "eid": t["event_id"].take(idx),
                         "us": t["us"].take(idx),
                         "pos": pa.array(["first", "last"])})

    parts = s.map_batches(partial, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    seams = (s.map_batches(seam, batch_format="pyarrow",
                           batch_size=None).to_pandas()
             .sort_values(["g", "ts", "eid", "pos"])
             .reset_index(drop=True))
    lasts = seams[seams["pos"] == "last"].reset_index(drop=True)
    firsts = seams[seams["pos"] == "first"].reset_index(drop=True)
    extra = []
    for i in range(len(lasts) - 1):
        if lasts.loc[i, "g"] == firsts.loc[i + 1, "g"]:
            gap = (int(firsts.loc[i + 1, "us"])
                   - int(lasts.loc[i, "us"])) // 1_000_000
            extra.append({"event_type": lasts.loc[i, "g"],
                          "n": 1, "sg": gap, "sgg": gap * gap})
    if extra:
        parts = pd.concat([parts, pd.DataFrame(extra)],
                          ignore_index=True)
    agg = (parts.groupby("event_type", as_index=False)
           [["n", "sg", "sgg"]].sum()
           .sort_values("event_type").reset_index(drop=True))
    n = agg["n"].to_numpy(np.float64)
    sg = agg["sg"].to_numpy(np.float64)
    sgg = agg["sgg"].to_numpy(np.float64)
    mu = sg / n
    sigma = np.sqrt(n * sgg - sg * sg) / n
    return pd.DataFrame({
        "event_type": agg["event_type"],
        "n_gaps": agg["n"].astype("int64"),
        "mean_gap_s": np.round(mu, 4),
        "burstiness": np.round((sigma - mu) / (sigma + mu), 6),
    })


MERKLE_BUCKETS = 16


def q_docs_merkle_manifest(sf_dir: str):
    """Integrity manifest for replica/re-run comparison: per-bucket
    ORDER-FREE leaf = XOR of the 128-bit md5 of every (doc_id, text)
    record, plus a Merkle-style root over the bucket leaves — two
    stores compare O(buckets) and a corrupted bucket localizes without
    re-reading the other side. XOR leaves are mergeable under any
    block layout / arrival order (why XOR and not a hash chain); at
    100 TB buckets become file-range leaves and the root a log-depth
    tree. Leaves ride as two int64 halves (Arrow has no int128);
    DuckDB's bit_xor lives in SIGNED HUGEINT space, mirrored here."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        bucket = ids % MERKLE_BUCKETS
        lo = np.zeros(MERKLE_BUCKETS, np.uint64)
        hi = np.zeros(MERKLE_BUCKETS, np.uint64)
        cnt = np.zeros(MERKLE_BUCKETS, np.int64)
        for i, (d, x) in enumerate(zip(ids, texts)):
            h = int.from_bytes(
                hashlib.md5(f"{d}:{x}".encode()).digest(), "little")
            b = int(bucket[i])
            lo[b] ^= np.uint64(h & 0xFFFFFFFFFFFFFFFF)
            hi[b] ^= np.uint64(h >> 64)
            cnt[b] += 1
        keep = cnt > 0
        return pa.table({
            "bucket": pa.array(np.arange(MERKLE_BUCKETS)[keep]),
            "lo": pa.array(lo[keep].view(np.int64)),
            "hi": pa.array(hi[keep].view(np.int64)),
            "n": pa.array(cnt[keep]),
        })

    acc_lo = [0] * MERKLE_BUCKETS
    acc_hi = [0] * MERKLE_BUCKETS
    acc_n = [0] * MERKLE_BUCKETS
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for bk, lo, hi, n in zip(b["bucket"].to_pylist(),
                                 b["lo"].to_pylist(),
                                 b["hi"].to_pylist(),
                                 b["n"].to_pylist()):
            acc_lo[bk] ^= lo & 0xFFFFFFFFFFFFFFFF
            acc_hi[bk] ^= hi & 0xFFFFFFFFFFFFFFFF
            acc_n[bk] += n
    leaves, rows = [], []
    for bk in range(MERKLE_BUCKETS):
        if acc_n[bk] == 0:
            continue
        v = ((acc_hi[bk] & 0xFFFFFFFFFFFFFFFF) << 64) | (
            acc_lo[bk] & 0xFFFFFFFFFFFFFFFF)
        if v >= 1 << 127:  # DuckDB bit_xor is signed HUGEINT
            v -= 1 << 128
        leaves.append(str(v))
        rows.append({"bucket": bk, "n_docs": acc_n[bk],
                     "leaf": str(v)})
    root = hashlib.md5("|".join(leaves).encode()).hexdigest()
    out = pd.DataFrame(rows)
    out["root"] = root
    out["bucket"] = out["bucket"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return out


HOUR_US = 3_600_000_000


def q_events_interval_overlap(sf_dir: str):
    """Interval x interval OVERLAP join with duration arithmetic —
    the join shape range_join (point-in-interval) can't express:
    per-(user, day) activity intervals [min ts, max ts] overlap-joined
    against the corpus's busy hours (hourly count strictly above the
    hourly mean — integer cross-multiplication, no float threshold).
    Shape: intervals stay a DATASET (one distributed (user, day)
    min/max groupby); busy hours broadcast (≤ hours-in-range); each
    batch explodes its intervals over the ≤ 25 hours they span
    (bounded by construction — intervals live inside one calendar
    day), filters to busy hours and emits per-hour (pairs,
    overlap_us) partials. Zero exchange beyond the one groupby."""
    import ray

    from ray.data.aggregate import Max, Min

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"],
            "day": pa.array((us // DAY_US).astype(np.int64)),
            "us": pa.array(us),
        })

    p = ds.map_batches(prep, batch_format="pyarrow").materialize()

    # busy hours: count per hour folded on the driver (≤ hours in
    # range), busy ⟺ n_h · n_hours > total (strictly above mean)
    hourly = driver_grouped_agg(
        p.map_batches(
            lambda t: pa.table(
                {"hour": pc.divide(t["us"], HOUR_US)}).group_by(
                ["hour"]).aggregate([([], "count_all")])
            .rename_columns(["hour", "n"]),
            batch_format="pyarrow"),
        ["hour"], {"n": ("n", "sum")},
    )
    total = int(hourly["n"].sum())
    nh = len(hourly)
    busy = np.sort(hourly[hourly["n"].astype(int) * nh > total]
                   ["hour"].to_numpy(np.int64))
    busy_ref = ray.put(busy)

    def cmb(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "day"]).aggregate(
            [("us", "min"), ("us", "max")])
        return g.rename_columns(["user_id", "day", "s", "e"])

    iv = (p.map_batches(cmb, batch_format="pyarrow")
          .groupby(["user_id", "day"])
          .aggregate(Min("s", alias_name="s"),
                     Max("e", alias_name="e")))

    def overlap(t: pa.Table) -> pa.Table:
        bz = _cached_broadcast(busy_ref)
        s = t["s"].to_numpy(zero_copy_only=False)
        e = t["e"].to_numpy(zero_copy_only=False)
        h0 = s // HOUR_US
        h1 = e // HOUR_US
        span = (h1 - h0 + 1).astype(np.int64)
        row = np.repeat(np.arange(len(s)), span)
        hour = (np.repeat(h0, span)
                + (np.arange(len(row))
                   - np.repeat(np.cumsum(span) - span, span)))
        keep = np.isin(hour, bz)
        row, hour = row[keep], hour[keep]
        hs, he = hour * HOUR_US, (hour + 1) * HOUR_US
        ov = np.minimum(e[row], he) - np.maximum(s[row], hs)
        m = (s[row] < he) & (e[row] >= hs)
        df = pd.DataFrame({"hour": hour[m], "ov": ov[m]})
        agg = df.groupby("hour", as_index=False).agg(
            n_pairs=("ov", "size"), ov_us=("ov", "sum"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    out = driver_grouped_agg(
        iv.map_batches(overlap, batch_format="pyarrow"),
        ["hour"], {"n_pairs": ("n_pairs", "sum"),
                   "ov_us": ("ov_us", "sum")},
    ).sort_values("hour").reset_index(drop=True)
    out["hour"] = out["hour"].astype("int64")
    out["n_pairs"] = out["n_pairs"].astype("int64")
    out["overlap_s"] = (out["ov_us"].astype("int64")
                        // 1_000_000).astype("int64")
    return out[["hour", "n_pairs", "overlap_s"]]


KCENTER_K = 5


def q_emb_kcenter(sf_dir: str):
    """k-center greedy diverse selection (Gonzalez 1985 max-min — the
    2-approximation): pick 5 vectors, each maximizing its cosine
    DISTANCE to the nearest already-picked center — the
    diversity-coreset op a curation pipeline runs where greedy-cover
    maximizes coverage. Each step is ONE streaming pass: per-batch
    distance to the broadcast picked set (matmul), round-6 BEFORE the
    argmax (ULP immunity), per-batch top-1 candidates, tiny driver
    resolve with (dist desc, vec_id) tie-break. Seed = min vec_id
    (dist 0 by convention)."""
    import ray

    ds = _read(sf_dir, "embeddings",
               ["vec_id", "embedding"]).materialize()

    picked_ids: list[int] = []
    rows = []
    seed = int(ds.min("vec_id"))
    picked_ids.append(seed)
    rows.append({"step": 1, "vec_id": seed, "dist": 0.0})
    full = ds.to_pandas().set_index("vec_id")
    for step in range(2, KCENTER_K + 1):
        pm = np.stack([np.asarray(full.loc[i, "embedding"], np.float64)
                       for i in picked_ids])
        pm = pm / np.linalg.norm(pm, axis=1, keepdims=True)
        ref = ray.put((np.array(picked_ids, np.int64), pm))

        def cand(t: pa.Table) -> pa.Table:
            pids, m = _cached_broadcast(ref)
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            av = np.stack([np.asarray(v, np.float64)
                           for v in t["embedding"].to_pylist()])
            av = av / np.linalg.norm(av, axis=1, keepdims=True)
            d = np.round(1.0 - (av @ m.T).max(axis=1), 6)
            keep = ~np.isin(ids, pids)
            out = pa.table({"vec_id": pa.array(ids[keep]),
                            "dist": pa.array(d[keep])})
            return _topk_batch(out, [("dist", "descending"),
                                     ("vec_id", "ascending")], 1)

        c = (ds.map_batches(cand, batch_format="pyarrow").to_pandas()
             .sort_values(["dist", "vec_id"],
                          ascending=[False, True]))
        best = c.iloc[0]
        picked_ids.append(int(best["vec_id"]))
        rows.append({"step": step, "vec_id": int(best["vec_id"]),
                     "dist": float(best["dist"])})
    out = pd.DataFrame(rows)
    out["step"] = out["step"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    return out


def q_events_entropy_rate(sf_dir: str):
    """Entropy rate of the per-user behavior chain: H = −Σ_i π(i)
    Σ_j p(j|i)·ln p(j|i) over the observed first-order transitions
    (π = empirical prev-state marginal) — the predictability ceiling
    of the event stream, the information-theory sibling of the KL
    drift monitor. Counts come from the Markov machinery's one
    exact-pair pass; the float entropy happens once on the driver
    with the nested-sum shape mirrored in SQL (round 6)."""
    from ..stages.markov import transition_matrix

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])
    tm = transition_matrix(ds, group_col="user_id",
                           order_cols=["ts", "event_id"],
                           item_col="event_type")
    total = int(tm["n_trans"].sum())
    h = 0.0
    for prev, g in tm.sort_values(
            ["prev_state", "next_state"]).groupby("prev_state"):
        n_i = int(g["n_trans"].sum())
        h_i = 0.0
        for n_ij in g["n_trans"]:
            p = float(int(n_ij)) / float(n_i)
            h_i += p * math.log(p)
        h -= (float(n_i) / float(total)) * h_i
    from ..core.textstats import round_half_away

    return pd.DataFrame([{
        "n_transitions": total,
        "n_states": int(tm["prev_state"].nunique()),
        "entropy_rate_nats": float(round_half_away(h, 6)),
    }])


ZORDER_N_FILES = 16
ZORDER_PROBE_UB = 7


def q_events_zorder_layout(sf_dir: str):
    """Z-order (Morton) data layout vs time-linear layout — the
    Delta/Iceberg ``OPTIMIZE ZORDER BY`` storage op, measured by the
    zone-map statistics it exists to improve: rows get a 16-bit Morton
    code interleaving user-bucket (user_id % 256) and hour-bucket
    (epoch_us//3600e6 % 256) bits, are ranked in each layout's total
    order by the distributed prefix-scan primitive (one sort +
    O(blocks) carry — no driver rank loop), split into 16 equal files,
    and each file reports min/max zone maps for BOTH dimensions plus
    whether a point probe on user-bucket 7 must scan it. The z-order
    layout prunes files the time-sorted layout cannot — that delta is
    the query's point. Exact integer arithmetic throughout; file
    assignment ``(rank-1)*F // n`` mirrored verbatim in SQL."""
    from ray.data.aggregate import Count, Max, Min

    from ..stages.prefix import global_prefix_sum

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_keys(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ub = (t["user_id"].to_numpy(zero_copy_only=False)
              .astype(np.int64) % 256)
        tb = (us // 3_600_000_000) % 256
        z = np.zeros(len(ub), np.int64)
        for i in range(8):
            z |= ((ub >> i) & 1) << (2 * i)
            z |= ((tb >> i) & 1) << (2 * i + 1)
        return pa.table({
            "event_id": t["event_id"], "us": pa.array(us, pa.int64()),
            "ub": pa.array(ub, pa.int64()), "tb": pa.array(tb, pa.int64()),
            "zv": pa.array(z, pa.int64()),
            "one": pa.array(np.ones(len(ub), np.int64)),
        })

    keyed = ds.map_batches(add_keys, batch_format="pyarrow").materialize()

    def layout_stats(order_cols) -> pd.DataFrame:
        ranked, total = global_prefix_sum(
            keyed, order_cols=order_cols, val_col="one", out_col="rk")

        def add_file(t: pa.Table) -> pa.Table:
            rk = t["rk"].to_numpy(zero_copy_only=False)
            f = (rk - 1) * ZORDER_N_FILES // total
            return t.append_column("file", pa.array(f, pa.int64()))

        return (
            ranked.map_batches(add_file, batch_format="pyarrow")
            .groupby("file")
            .aggregate(Count(alias_name="n_rows"),
                       Min("ub", alias_name="ub_min"),
                       Max("ub", alias_name="ub_max"),
                       Min("tb", alias_name="tb_min"),
                       Max("tb", alias_name="tb_max"))
            .to_pandas()
        )

    zo = layout_stats([("zv", "ascending"), ("us", "ascending"),
                       ("event_id", "ascending")])
    zo.insert(0, "layout", "zorder")
    li = layout_stats([("tb", "ascending"), ("us", "ascending"),
                       ("event_id", "ascending")])
    li.insert(0, "layout", "linear")
    out = pd.concat([li, zo], ignore_index=True)
    out["scan_ub7"] = ((out["ub_min"] <= ZORDER_PROBE_UB)
                       & (out["ub_max"] >= ZORDER_PROBE_UB))
    for c in ("file", "n_rows", "ub_min", "ub_max", "tb_min", "tb_max"):
        out[c] = out[c].astype("int64")
    return (out[["layout", "file", "n_rows", "ub_min", "ub_max",
                 "tb_min", "tb_max", "scan_ub7"]]
            .sort_values(["layout", "file"]).reset_index(drop=True))


LPA_ROUNDS = 2


def q_emb_label_propagation(sf_dir: str):
    """Semi-supervised label propagation (Zhu/Ghahramani; the
    community-detection LPA with seed clamping) over the cosine ≥ 0.3
    similarity graph: every 5th vector keeps its true label as a seed,
    everything else starts unlabeled; two SYNCHRONOUS rounds where
    each non-seed takes the mode of its neighbors' current labels
    (unlabeled neighbors abstain, ties break to the smallest label,
    no labeled neighbor ⇒ stays −1). Edges come from the shared
    `_emb_threshold_edges` distributed builder (blocked chunk-pair
    all-pairs, loud-guarded fold); past the guard — or under
    GRAFT_GRAPH_DISTRIBUTED=1 — the rounds run as the distributed
    groupby-mode form (`stages.simgraph.lpa_rounds_distributed`,
    round 5: the documented escape hatch implemented; identical vote
    rule, equivalence in tests/test_simgraph.py). Rounds are numpy
    run-length modes over the guarded edge arrays; the oracle unrolls
    both rounds relationally."""
    emb = (_read(sf_dir, "embeddings", ["vec_id", "label"])
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    vids = emb["vec_id"].to_numpy(np.int64)
    labs = emb["label"].to_numpy(np.int64)
    seed = (vids % 5) == 0

    def _distributed():
        from ..stages.simgraph import (blocked_cosine_edges,
                                       lpa_rounds_distributed)

        edges = blocked_cosine_edges(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
            "vec_id", "embedding", tau=EMB_TRI_TAU,
            n_chunks=EMB_TRI_CHUNKS)
        return lpa_rounds_distributed(
            vids, np.where(seed, labs, np.int64(-1)), seed, edges,
            rounds=LPA_ROUNDS)

    if os.environ.get("GRAFT_GRAPH_DISTRIBUTED") == "1":
        cur = _distributed()
    else:
        try:
            a, b = _emb_threshold_edges(sf_dir)
            cur = _lpa_propagate(
                vids, np.where(seed, labs, np.int64(-1)), seed, a, b,
                LPA_ROUNDS)
        except RuntimeError:
            cur = _distributed()
    lab_u, lab_n = np.unique(cur, return_counts=True)
    return pd.DataFrame({"label": lab_u.astype("int64"),
                         "n_nodes": lab_n.astype("int64")})


def _lpa_propagate(vids, init_labels, seed_mask, a, b,
                   rounds: int) -> np.ndarray:
    """Synchronous seed-clamped LPA rounds over undirected edges
    (a, b) between the sorted-unique node ids ``vids``: each round a
    non-seed takes the mode of its neighbors' current labels
    (unlabeled −1 neighbors abstain, ties break to the smallest
    label, no labeled neighbor ⇒ −1). Factored out so engineered
    tie/chain fixtures can pin the vote semantics directly."""
    n = len(vids)
    cur = np.asarray(init_labels, np.int64).copy()
    seed = np.asarray(seed_mask, bool)
    si = np.concatenate([np.searchsorted(vids, a),
                         np.searchsorted(vids, b)])
    ti = np.concatenate([np.searchsorted(vids, b),
                         np.searchsorted(vids, a)])
    for _ in range(rounds):
        sl = cur[si]
        m = sl != -1
        tt, ll = ti[m], sl[m]
        upd = np.full(n, -1, np.int64)
        if len(tt):
            o = np.lexsort((ll, tt))
            tt, ll = tt[o], ll[o]
            run = np.ones(len(tt), bool)
            run[1:] = (tt[1:] != tt[:-1]) | (ll[1:] != ll[:-1])
            starts = np.flatnonzero(run)
            counts = np.diff(np.append(starts, len(tt)))
            rt, rl = tt[starts], ll[starts]
            o2 = np.lexsort((rl, -counts, rt))
            rt2, rl2 = rt[o2], rl[o2]
            first = np.ones(len(rt2), bool)
            first[1:] = rt2[1:] != rt2[:-1]
            upd[rt2[first]] = rl2[first]
        nxt = cur.copy()
        nxt[~seed] = upd[~seed]
        cur = nxt
    return cur


ZIPF_TOP_K = 100


def _batch_bigram_rows(t: pa.Table) -> tuple:
    """(grams, doc_ids) Arrow arrays of consecutive-token bigrams per
    document — stages/bm25.py tokenization, gram key joined with \\x01
    (the stages/substring_dedup.py key idiom). Bigrams, not unigrams:
    this corpus's unigram vocabulary is 31 tokens (the
    docs_greedy_cover finding), which saturates any vocabulary curve
    instantly."""
    texts = t["text"].combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), r"[^a-z0-9]+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    mask = pc.not_equal(flat, "")
    flat, parents = flat.filter(mask), parents.filter(mask)
    m = len(flat)
    if m < 2:
        return (pa.array([], pa.string()), pa.array([], pa.int64()))
    a, b = flat.slice(0, m - 1), flat.slice(1)
    same = pc.equal(parents.slice(0, m - 1), parents.slice(1))
    grams = pc.binary_join_element_wise(a, b, "\x01").filter(same)
    rows = parents.slice(0, m - 1).filter(same)
    dids = t["doc_id"].combine_chunks().take(rows)
    return (grams, dids.cast(pa.int64()))


def q_docs_zipf_slope(sf_dir: str):
    """Zipf's-law exponent of the corpus BIGRAM distribution: OLS
    slope of ln(freq) on ln(rank) over the top-100 bigrams — the
    vocabulary health probe a tokenizer-training pass runs (natural
    text ≈ −1; templated/spam corpora flatten). Bigrams because the
    synthetic corpus's unigram vocabulary is 31 tokens (the
    docs_greedy_cover precedent). Counts via the per-batch Arrow
    group_by combiner → one distributed groupby(gram).sum (the only
    exchange; shuffle volume is distinct-grams-per-batch), then the
    established per-batch top-k candidate fold; the 100-point
    regression happens once on the driver with the identical closed
    form in SQL. Tokenization is stages/bm25.py TOKEN_SPLIT_RE,
    shared verbatim with the oracle."""
    from ray.data.aggregate import Sum

    from ..core.textstats import round_half_away

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def gram_counts(t: pa.Table) -> pa.Table:
        grams, _ = _batch_bigram_rows(t)
        g = pa.table({"gram": grams}).group_by("gram").aggregate(
            [("gram", "count")])
        return pa.table({"gram": g["gram"],
                         "n": g["gram_count"].cast(pa.int64())})

    counts = (ds.map_batches(gram_counts, batch_format="pyarrow")
              .groupby("gram").aggregate(Sum("n", alias_name="n"))
              .materialize())
    n_distinct = counts.count()
    cand = (counts.map_batches(
        lambda t: _topk_batch(t, [("n", "descending"),
                                  ("gram", "ascending")], ZIPF_TOP_K),
        batch_format="pyarrow").to_pandas())
    top = (cand.sort_values(["n", "gram"], ascending=[False, True])
           .head(ZIPF_TOP_K).reset_index(drop=True))
    k = float(len(top))
    x = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    y = np.log(top["n"].to_numpy(np.float64))
    slope = ((k * float((x * y).sum()) - float(x.sum()) * float(y.sum()))
             / (k * float((x * x).sum()) - float(x.sum()) ** 2))
    return pd.DataFrame([{
        "n_distinct_bigrams": int(n_distinct),
        "top_k": int(len(top)),
        "zipf_slope": float(round_half_away(slope, 6)),
    }])


HEAPS_CUTS = (20, 40, 60, 80, 100)


def q_docs_heaps_law(sf_dir: str):
    """Heaps'-law vocabulary growth: distinct-BIGRAM count after the
    first 20/40/60/80/100 % of documents (by doc_id order) — the
    "is my corpus still adding vocabulary?" curve a data-mixing pass
    reads before adding another shard (bigrams per the
    docs_greedy_cover finding: the unigram vocabulary saturates at 31
    tokens). ONE exchange: per-batch (gram, min doc_id) Arrow
    combiner → groupby(gram).min — a gram's first document decides
    every cut it counts toward — then a 5-counter per-batch fold (no
    gram list ever reaches the driver). Cut thresholds are exact
    order statistics of the distinct doc_id set (k = n·pct//100-th
    smallest; the doc_id pull is the one driver fold, loud-guarded —
    the quantile stage is the 100 TB form)."""
    from ray.data.aggregate import Min

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    doc_ids = np.unique(_read(sf_dir, "documents", ["doc_id"])
                        .to_pandas()["doc_id"].to_numpy(np.int64))
    if len(doc_ids) > 10_000_000:
        raise RuntimeError(
            "heaps_law: distinct doc_id pull exceeds 10M — compute the "
            "cut thresholds with stages/quantile.py instead")
    n = len(doc_ids)
    cuts = [(p, int(n * p) // 100) for p in HEAPS_CUTS]
    thrs = np.array([doc_ids[k - 1] for _, k in cuts], np.int64)

    def gram_first(t: pa.Table) -> pa.Table:
        grams, dids = _batch_bigram_rows(t)
        g = (pa.table({"gram": grams, "doc_id": dids})
             .group_by("gram").aggregate([("doc_id", "min")]))
        return pa.table({"gram": g["gram"],
                         "first_doc": g["doc_id_min"].cast(pa.int64())})

    first = (ds.map_batches(gram_first, batch_format="pyarrow")
             .groupby("gram").aggregate(Min("first_doc",
                                            alias_name="first_doc")))

    def cut_counts(t: pa.Table) -> pa.Table:
        fd = t["first_doc"].to_numpy(zero_copy_only=False)
        return pa.table({
            "ci": pa.array(np.arange(len(thrs)), pa.int64()),
            "v": pa.array([(fd <= th).sum() for th in thrs], pa.int64()),
        })

    vocab = np.zeros(len(thrs), np.int64)
    for blk in (first.map_batches(cut_counts, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow", batch_size=None)):
        np.add.at(vocab, blk["ci"].to_numpy(zero_copy_only=False),
                  blk["v"].to_numpy(zero_copy_only=False))
    return pd.DataFrame({
        "cut_pct": pd.array([p for p, _ in cuts], "int64"),
        "n_docs_cut": pd.array([k for _, k in cuts], "int64"),
        "vocab_size": pd.array(vocab, "int64"),
    })


def q_events_value_auc(sf_dir: str):
    """Exact tie-aware ROC-AUC (Mann-Whitney U) of spend value as a
    purchase-vs-click classifier — the ranking-metric readout a
    quality-scoring pass gets before its threshold is trusted. The
    midrank/trapezoid form over the value HISTOGRAM: AUC·2PN =
    Σ_c pos_c·(2·neg_below_c + neg_c), every term integer — the same
    bounded-cents-domain combiner pass as the quantile/mode family
    (unbounded domain → the two-pass histogram refinement), cumsum +
    fold on the driver in PYTHON ints (the EMD precedent: the
    products overflow int64 at 100 TB), ONE floor division to ppm.
    Ties contribute exactly ½ via the 2× scaling — no float
    anywhere."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_in(t["event_type"],
                              value_set=pa.array(["purchase", "click"])))
        c = np.rint(f["value"].to_numpy(zero_copy_only=False) * 100.0
                    ).astype(np.int64)
        pos = pc.equal(f["event_type"], "purchase").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"c": pa.array(c), "p": pa.array(pos),
                         "g": pa.array(1 - pos)})

    h = driver_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["c"], {"np": ("p", "sum"), "nn": ("g", "sum")},
    ).sort_values("c").reset_index(drop=True)
    npos, nneg, auc_ppm = _auc_ppm_from_hist(h["np"], h["nn"])
    return pd.DataFrame([{
        "n_pos": npos, "n_neg": nneg, "auc_ppm": auc_ppm,
    }]).astype("int64")


def _auc_ppm_from_hist(pos_counts, neg_counts) -> tuple[int, int, int]:
    """(P, N, auc_ppm) from per-score histogram rows ORDERED BY
    ascending score: AUC·2PN = Σ_c pos_c·(2·neg_below + neg_c) —
    Python-int fold so the products never overflow. Factored out for
    the brute-force property test (tie handling is the classic AUC
    bug)."""
    npos = sum(int(x) for x in pos_counts)
    nneg = sum(int(x) for x in neg_counts)
    num2 = 0
    neg_below = 0
    for p_c, n_c in zip(pos_counts, neg_counts):
        num2 += int(p_c) * (2 * neg_below + int(n_c))
        neg_below += int(n_c)
    return npos, nneg, num2 * 1_000_000 // (2 * npos * nneg)


RRF_K = 60
RRF_LEG_K = 20
RRF_N_BUCKETS = 64


def _rrf_bucket(tok: str) -> int:
    """Feature-hash bucket: 60-bit md5 prefix mod 64 — the
    stages/simjoin.py md5 idiom, mirrored in SQL as
    ``('0x' || substr(md5(tok), 1, 15))::BIGINT % 64``."""
    import hashlib

    return int(hashlib.md5(tok.encode()).hexdigest()[:15],
               16) % RRF_N_BUCKETS


def q_docs_hybrid_rrf(sf_dir: str):
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    2009 — the BM25 ⊕ dense fusion every modern RAG/retrieval stack
    runs): the lexical leg is the existing BM25 two-pass streaming
    ranker (top-20), the dense leg is a 64-bucket hashed-TF cosine
    against the query's hashed vector (one streaming pass: per-batch
    dictionary-encode → md5-bucket the DISTINCT tokens only → bincount
    weights → integer dot/v² partials, per-batch top-k candidates),
    and RRF = Σ 1/(60+rank) over the legs a doc appears in. Cosine is
    round-6 BEFORE ranking on both sides (the ULP-immunity rule);
    dot/v²/q² are exact int64 so only the final division is float.
    No shuffle anywhere — two passes over a materialized input plus
    driver fusion of ≤40 rows."""
    from ..core.textstats import round_half_away
    from ..stages.bm25 import bm25_topk, corpus_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).materialize()
    stats = corpus_stats(ds, BM25_TERMS)
    lex = bm25_topk(ds, BM25_TERMS, stats, k=RRF_LEG_K)
    lex_rank = {int(d): i + 1 for i, d in enumerate(lex["doc_id"])}

    qv = np.zeros(RRF_N_BUCKETS, np.int64)
    for term in BM25_TERMS:
        qv[_rrf_bucket(term)] += 1
    q2 = int((qv * qv).sum())

    def dense_partials(t: pa.Table) -> pa.Table:
        texts = t["text"].combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(texts),
                                      r"[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        mask = pc.not_equal(flat, "")
        flat, parents = flat.filter(mask), parents.filter(mask)
        dd = flat.dictionary_encode()
        vocab = dd.dictionary.to_pylist()
        n = len(texts)
        if vocab:
            bks = np.array([_rrf_bucket(v) for v in vocab], np.int64)
            bkt = bks[dd.indices.to_numpy(zero_copy_only=False)]
            p = parents.to_numpy(zero_copy_only=False).astype(np.int64)
            w = np.bincount(p * RRF_N_BUCKETS + bkt,
                            minlength=n * RRF_N_BUCKETS
                            ).reshape(n, RRF_N_BUCKETS)
        else:
            w = np.zeros((n, RRF_N_BUCKETS), np.int64)
        dot = (w * qv).sum(1)
        v2 = (w * w).sum(1)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = dot > 0
        cos = round_half_away(
            dot[keep] / np.sqrt((v2[keep] * q2).astype(np.float64)), 6)
        out = pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                        "cos": pa.array(cos, pa.float64())})
        return _topk_batch(out, [("cos", "descending"),
                                 ("doc_id", "ascending")], RRF_LEG_K)

    dense = (ds.map_batches(dense_partials, batch_format="pyarrow")
             .to_pandas()
             .sort_values(["cos", "doc_id"], ascending=[False, True])
             .head(RRF_LEG_K).reset_index(drop=True))
    dense_rank = {int(d): i + 1 for i, d in enumerate(dense["doc_id"])}

    rows = []
    for d in sorted(set(lex_rank) | set(dense_rank)):
        rb = lex_rank.get(d, 0)
        rd = dense_rank.get(d, 0)
        rrf = ((1.0 / (RRF_K + rb) if rb else 0.0)
               + (1.0 / (RRF_K + rd) if rd else 0.0))
        rows.append((d, rb, rd, rrf))
    out = pd.DataFrame(rows, columns=["doc_id", "bm25_rank",
                                      "dense_rank", "rrf_score"])
    out = (out.sort_values(["rrf_score", "doc_id"],
                           ascending=[False, True])
           .head(10).reset_index(drop=True))
    out["rrf_score"] = round_half_away(out["rrf_score"].to_numpy(), 6)
    for c in ("doc_id", "bm25_rank", "dense_rank"):
        out[c] = out[c].astype("int64")
    return out


def _zorder_oracle_sql() -> str:
    """Generated mirror of q_events_zorder_layout: the 16-bit Morton
    interleave is emitted as an explicit fully-parenthesized bit
    expression (the kmeans/kcenter generated-SQL precedent); rank →
    file uses the identical (rn-1)*F // n integer rule."""
    bits = " | ".join(
        f"((((ub >> {i}) & 1) << {2 * i}) | "
        f"(((tb >> {i}) & 1) << {2 * i + 1}))"
        for i in range(8))
    return f"""
        -- z-order vs time-linear layout zone maps; Morton interleave
        -- generated bit-by-bit; file = (rank-1)*{ZORDER_N_FILES} // n
        WITH base AS (
            SELECT event_id, epoch_us(ts) AS us,
                   user_id % 256 AS ub,
                   (epoch_us(ts) // 3600000000) % 256 AS tb
            FROM events
        ),
        z AS (SELECT *, ({bits}) AS zv FROM base),
        n AS (SELECT count(*)::BIGINT AS c FROM base),
        zr AS (SELECT ub, tb,
                      ((row_number() OVER (ORDER BY zv, us, event_id)
                        - 1) * {ZORDER_N_FILES}) // (SELECT c FROM n)
                        AS file
               FROM z),
        lr AS (SELECT ub, tb,
                      ((row_number() OVER (ORDER BY tb, us, event_id)
                        - 1) * {ZORDER_N_FILES}) // (SELECT c FROM n)
                        AS file
               FROM z),
        u AS (SELECT 'zorder' AS layout, * FROM zr
              UNION ALL SELECT 'linear', * FROM lr)
        SELECT layout, CAST(file AS BIGINT) AS file,
               count(*)::BIGINT AS n_rows,
               min(ub)::BIGINT AS ub_min, max(ub)::BIGINT AS ub_max,
               min(tb)::BIGINT AS tb_min, max(tb)::BIGINT AS tb_max,
               (min(ub) <= {ZORDER_PROBE_UB}
                AND max(ub) >= {ZORDER_PROBE_UB}) AS scan_ub7
        FROM u GROUP BY layout, file ORDER BY layout, file
    """


def _kcenter_oracle_sql() -> str:
    """Generated k-step-unrolled Gonzalez mirror (the kmeans/BPE
    precedent): every step's argmax of round-6 min-distance with the
    identical (dist desc, vec_id) tie-break, re-derived from raw
    embeddings."""
    steps = ["p1 AS (SELECT min(vec_id) AS v FROM embeddings)"]
    sel = ["SELECT CAST(1 AS BIGINT) AS step, (SELECT v FROM p1) "
           "AS vec_id, 0.0 AS dist"]
    for k in range(2, KCENTER_K + 1):
        prev = ", ".join(f"(SELECT v FROM p{j})" for j in range(1, k))
        coss = ", ".join(
            f"""list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                 WHERE vec_id = (SELECT v FROM p{j})))"""
            for j in range(1, k))
        greatest = coss if k == 2 else f"GREATEST({coss})"
        steps.append(f"""d{k} AS (
            SELECT e.vec_id, round(1.0 - {greatest}, 6) AS dist
            FROM embeddings e
            WHERE e.vec_id NOT IN ({prev})
        ),
        p{k} AS (SELECT vec_id AS v, dist FROM d{k}
                 ORDER BY dist DESC, vec_id LIMIT 1)""")
        sel.append(f"SELECT {k}, (SELECT v FROM p{k}), "
                   f"(SELECT dist FROM p{k})")
    return ("WITH " + ",\n".join(steps) + "\n"
            + "\nUNION ALL\n".join(sel) + "\nORDER BY step")


LTV_MAX_OFFSET = 3


def q_orders_cohort_ltv(sf_dir: str):
    """Cohort LTV curves — the revenue-weighted sibling of
    events_retention: customers cohorted by FIRST-order month, each
    cohort's cumulative order revenue (exact integer cents) at month
    offsets 0..3. One guarded driver-fold groupby for the per-customer
    first month (broadcast as a sorted-key array), then ONE streaming
    orders pass emitting per-(cohort, offset) integer partials — no
    join, no second exchange. Month arithmetic is integer
    year·12+month on both sides."""
    import ray

    from ..broadcast import cached_get

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_totalprice"])
    first = driver_grouped_agg(
        orders, ["o_custkey"], {"first_dt": ("o_orderdate", "min")})
    fd = pd.to_datetime(first["first_dt"])
    cust = first["o_custkey"].to_numpy().astype(np.int64)
    ym = (fd.dt.year * 12 + (fd.dt.month - 1)).to_numpy().astype(np.int64)
    order_c = np.argsort(cust)
    cust, ym = cust[order_c], ym[order_c]
    cohort_sizes = pd.Series(ym).value_counts().sort_index()
    cust_ref = ray.put(cust)
    ym_ref = ray.put(ym)

    def partial(t: pa.Table) -> pa.Table:
        cu = cached_get(cust_ref)
        yv = cached_get(ym_ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(cu, ck)
        oy = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False)
        om = pc.month(t["o_orderdate"]).to_numpy(zero_copy_only=False)
        md = (oy * 12 + (om - 1)) - yv[idx]
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(
            np.int64)
        keep = md <= LTV_MAX_OFFSET
        g = pa.table({
            "cym": pa.array(yv[idx][keep], pa.int64()),
            "md": pa.array(md[keep], pa.int64()),
            "cents": pa.array(cents[keep], pa.int64()),
        }).group_by(["cym", "md"]).aggregate([("cents", "sum")])
        return g.rename_columns(["cym", "md", "cents"])

    acc: dict[tuple[int, int], int] = {}
    for b in orders.map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for cym, md, c in zip(b["cym"].to_pylist(), b["md"].to_pylist(),
                              b["cents"].to_pylist()):
            acc[(cym, md)] = acc.get((cym, md), 0) + c

    rows = []
    for cym in sorted(cohort_sizes.index):
        cum, cells = 0, {}
        for k in range(LTV_MAX_OFFSET + 1):
            cum += acc.get((cym, k), 0)
            cells[f"m{k}_cents"] = cum
        rows.append({
            "cohort_month": f"{cym // 12:04d}-{cym % 12 + 1:02d}",
            "n_customers": int(cohort_sizes[cym]),
            **cells,
        })
    out = pd.DataFrame(rows)
    for c in out.columns:
        if c != "cohort_month":
            out[c] = out[c].astype("int64")
    return out.sort_values("cohort_month").reset_index(drop=True)


INCREX_ORACLE_DIR = "/tmp/ocracle_increx_oracle"
INCREX_MOD = 3  # new corpus = doc_id % 3 == 0, old = the rest
INCREX_FP_LIMIT = 50_000_000  # old-fp broadcast guard (verify lane)


def q_docs_incremental_exact(sf_dir: str):
    """Bloom-prefiltered incremental exact dedup — the op
    core.sketch.BloomFilter exists FOR, driver-pinned end to end: an
    existing corpus (doc_id % 3 != 0) is summarized once into a Bloom
    filter over text fingerprints; the incoming corpus (doc_id % 3
    == 0) then drops provably-unseen keys with ONE map pass (a
    negative lookup is a proof — no false negatives), and only
    Bloom-positive keys (true dups + ~fp_rate false positives) need
    the exact verify. At 100 TB the verify is a semi-join of just the
    Bloom-positive slice; here the old-fp set broadcasts behind a loud
    guard. Census: sizes, provably-new, true dups, and the OBSERVED
    false-positive count/rate.

    STRONG artifact oracle: per-doc (side, fp) rows AND the filter's
    words/params are written; DuckDB re-derives h1/h2 (the
    splitmix64 chain incl. the golden-gamma add, mirrored from
    core.dedup._splitmix64), all k Kirsch-Mitzenmacher positions, every
    word-bit lookup, every membership verdict, AND the true-dup count
    independently from RAW text (normalized-text semi-join — no hash
    trust), so a single false negative or a wrong fp count breaks the
    row. Only the FNV fingerprint map itself is trusted (collision-free
    at these scales; a collision would show as a true-dup mismatch)."""
    import shutil

    import pyarrow.parquet as pq
    import ray

    from ..broadcast import cached_get
    from ..core.textstats import fingerprint
    from ..stages.dedup import build_hash_bloom

    base = f"{INCREX_ORACLE_DIR}/current"
    shutil.rmtree(base, ignore_errors=True)

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        fps = np.array(
            [fingerprint(x if x is not None else "")
             for x in t["text"].to_pylist()], np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "side": pa.array(
                np.where(ids % INCREX_MOD == 0, "new", "old"),
                pa.string()),
            "fp": pa.array(fps, pa.int64()),
        })

    fps = ds.map_batches(fp_rows, batch_format="pyarrow").materialize()
    fps.write_parquet(f"{base}/fps")

    # old-fp set: gathered ONCE for both capacity sizing and the
    # verify broadcast (the 100-TB note above); loud-guarded
    old_list = []
    n_old = 0
    for b in fps.iter_batches(batch_size=None, batch_format="pyarrow"):
        m = pc.equal(b["side"], "old")
        vals = b["fp"].filter(m).to_numpy(zero_copy_only=False)
        n_old += len(vals)
        old_list.append(vals)
        if n_old > INCREX_FP_LIMIT:
            raise ValueError(
                f"incremental_exact: > {INCREX_FP_LIMIT} old fps — "
                "verify via the bloom-positive semi-join lane instead "
                "of the broadcast")
    old_fps = np.unique(np.concatenate(old_list)) if old_list else \
        np.array([], np.int64)

    def old_side(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["side"], "old")).select(["fp"])

    bloom = build_hash_bloom(
        fps.map_batches(old_side, batch_format="pyarrow"), "fp",
        capacity=max(1024, n_old), fp_rate=0.01)
    pq.write_table(pa.table({
        "i": pa.array(np.arange(len(bloom.words)), pa.int64()),
        "w": pa.array(bloom.words.view(np.int64), pa.int64()),
    }), f"{base}/bloom_words.parquet")
    pq.write_table(pa.table({
        "m": pa.array([bloom.m], pa.int64()),
        "k": pa.array([bloom.k], pa.int64()),
    }), f"{base}/bloom_params.parquet")

    bloom_ref = ray.put(bloom)
    old_ref = ray.put(pa.array(old_fps, pa.int64()))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["side"], "new"))
        f = t["fp"].to_numpy(zero_copy_only=False)
        bl = cached_get(bloom_ref)
        pos = bl.contains_hashes(f.astype(np.uint64))
        dup = pc.is_in(pa.array(f[pos], pa.int64()),
                       value_set=cached_get(old_ref)).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "n_new": pa.array([len(f)], pa.int64()),
            "n_pos": pa.array([int(pos.sum())], pa.int64()),
            "n_dup": pa.array([int(dup.sum())], pa.int64()),
        })

    tot = {"n_new": 0, "n_pos": 0, "n_dup": 0}
    for b in fps.map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for k in tot:
            tot[k] += int(pc.sum(b[k]).as_py() or 0)

    n_actually_new = tot["n_new"] - tot["n_dup"]
    out = pd.DataFrame([{
        "n_old": n_old,
        "n_new": tot["n_new"],
        "n_bloom_pos": tot["n_pos"],
        "n_provably_new": tot["n_new"] - tot["n_pos"],
        "n_true_dup": tot["n_dup"],
        "n_bloom_fp": tot["n_pos"] - tot["n_dup"],
        "bloom_fp_ppm": ((tot["n_pos"] - tot["n_dup"]) * 1_000_000
                         // n_actually_new) if n_actually_new else 0,
    }])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _increx_oracle_sql() -> str:
    """Generated mirror of the Bloom membership decision
    (core.sketch.BloomFilter._positions over core.dedup._splitmix64,
    golden-gamma add included) + an independent raw-text true-dup
    count; every constant comes from the same hex literals."""
    gamma = 0x9E3779B97F4A7C15
    c1 = 0xBF58476D1CE4E5B9
    c2 = 0x94D049BB133111EB
    h2x = 0xA076_1D64_78BD_642F
    m64 = "(1::UHUGEINT << 64)"
    base = f"{INCREX_ORACLE_DIR}/current"
    return f"""
        WITH params AS (
            SELECT m::UHUGEINT AS m, k
            FROM read_parquet('{base}/bloom_params.parquet')),
        words AS (
            SELECT i, CASE WHEN w < 0
                 THEN (w::HUGEINT + (1::HUGEINT << 64))::UHUGEINT
                 ELSE w::UHUGEINT END AS uw
            FROM read_parquet('{base}/bloom_words.parquet')),
        fps AS (SELECT doc_id, side, fp
                FROM read_parquet('{base}/fps/*.parquet')),
        newfp AS (SELECT doc_id, fp::UHUGEINT AS u FROM fps
                  WHERE side = 'new'),
        a0 AS (SELECT doc_id, u,
                      (u + {gamma}::UHUGEINT) % {m64} AS x FROM newfp),
        a1 AS (SELECT doc_id, u,
                      (xor(x, x >> 30) * {c1}::UHUGEINT) % {m64} AS x
               FROM a0),
        a2 AS (SELECT doc_id, u,
                      (xor(x, x >> 27) * {c2}::UHUGEINT) % {m64} AS x
               FROM a1),
        h1t AS (SELECT doc_id, u, xor(x, x >> 31) AS h1 FROM a2),
        b0 AS (SELECT doc_id, h1,
                      (xor(u, {h2x}::UHUGEINT) + {gamma}::UHUGEINT)
                        % {m64} AS x FROM h1t),
        b1 AS (SELECT doc_id, h1,
                      (xor(x, x >> 30) * {c1}::UHUGEINT) % {m64} AS x
               FROM b0),
        b2 AS (SELECT doc_id, h1,
                      (xor(x, x >> 27) * {c2}::UHUGEINT) % {m64} AS x
               FROM b1),
        h2t AS (SELECT doc_id, h1,
                       xor(x, x >> 31) // 2 * 2 + 1 AS h2 FROM b2),
        ks AS (SELECT unnest(range(0,
                   (SELECT k FROM params))) AS i),
        posn AS (
            SELECT doc_id,
                   ((h1 + ks.i::UHUGEINT * h2) % {m64})
                     % (SELECT m FROM params) AS pos
            FROM h2t CROSS JOIN ks
        ),
        hits AS (
            SELECT p.doc_id,
                   min(CASE WHEN
                       (w.uw // (1::UHUGEINT << (p.pos % 64)))
                            % 2 = 1 THEN 1 ELSE 0 END) AS hit
            FROM posn p JOIN words w ON w.i = (p.pos // 64)::BIGINT
            GROUP BY p.doc_id
        ),
        old_t AS (SELECT DISTINCT {_TNORM} AS tn FROM documents
                  WHERE doc_id % {INCREX_MOD} <> 0),
        dupn AS (SELECT count(*)::BIGINT AS n FROM documents
                 WHERE doc_id % {INCREX_MOD} = 0
                   AND {_TNORM} IN (SELECT tn FROM old_t)),
        c AS (
            SELECT (SELECT count(*) FROM fps
                    WHERE side = 'old')::BIGINT AS n_old,
                   (SELECT count(*) FROM newfp)::BIGINT AS n_new,
                   (SELECT coalesce(sum(hit), 0) FROM hits)::BIGINT
                     AS n_bloom_pos,
                   (SELECT n FROM dupn) AS n_true_dup
        )
        SELECT n_old, n_new, n_bloom_pos,
               n_new - n_bloom_pos AS n_provably_new, n_true_dup,
               n_bloom_pos - n_true_dup AS n_bloom_fp,
               CASE WHEN n_new - n_true_dup > 0
                    THEN (n_bloom_pos - n_true_dup) * 1000000
                         // (n_new - n_true_dup)
                    ELSE 0 END AS bloom_fp_ppm
        FROM c
    """


BLOOMJOIN_ORACLE_DIR = "/tmp/ocracle_bloomjoin_oracle"


def q_lineitem_bloom_join(sf_dir: str):
    """Bloom semi-join pushdown — the classic distributed-join
    optimization (a bits-only summary of the build side ships to
    every probe task, pruning provable non-matches BEFORE the join
    exchange; at scale the build side may exceed the broadcast limit
    while its Bloom still fits): lineitem probes a Bloom of the
    supplier subset s_nationkey < 5, rows surviving the filter are
    exactly verified, and the census measures what the optimization
    delivered — rows pruned, false-positive rate vs nominal 1%, and
    the (invariant!) revenue over true matches in exact per-row
    integer cents. No false negatives by construction, so the join
    RESULT is provably unchanged — the self-verifying property that
    makes the pushdown safe.
    STRONG artifact oracle (the docs_incremental_exact machinery):
    the filter words + sizing are the only artifact; SQL re-derives
    the splitmix64 double-hash chain, all k Kirsch–Mitzenmacher
    positions and every word-bit lookup for every DISTINCT probe
    key, the subset and truth from the raw views, and the census."""
    import shutil

    import pyarrow.parquet as _pq

    import ray

    from ..core.sketch import BloomFilter

    supp = pd.read_parquet(_p(sf_dir, "supplier"),
                           columns=["s_suppkey", "s_nationkey"])
    sub = supp.loc[supp["s_nationkey"] < 5, "s_suppkey"] \
        .to_numpy(np.int64)
    if len(sub) == 0:
        raise RuntimeError("lineitem_bloom_join: empty build side")
    bloom = BloomFilter(capacity=len(sub), fp_rate=0.01)
    bloom.add_hashes(sub.astype(np.uint64))

    out_dir = f"{BLOOMJOIN_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    import os
    os.makedirs(out_dir, exist_ok=True)
    _pq.write_table(pa.table({
        "m": pa.array([bloom.m], pa.int64()),
        "k": pa.array([bloom.k], pa.int64()),
    }), f"{out_dir}/bloom_params.parquet")
    _pq.write_table(pa.table({
        "i": pa.array(np.arange(len(bloom.words), dtype=np.int64)),
        "w": pa.array(bloom.words.astype(np.int64)),
    }), f"{out_dir}/bloom_words.parquet")

    ref = ray.put((bloom, pa.array(np.unique(sub), pa.int64())))

    def probe(t: pa.Table) -> pa.Table:
        bf, exact = _cached_broadcast(ref)
        keys = t["l_suppkey"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        kept = bf.contains_hashes(keys.astype(np.uint64))
        true = pc.is_in(pa.array(keys, pa.int64()),
                        value_set=exact).to_numpy(
            zero_copy_only=False)
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = ep * (1.0 - dc) * 100.0
        cents = (np.sign(rev) * np.floor(np.abs(rev) + 0.5)) \
            .astype(np.int64)
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "n_kept": pa.array([int(kept.sum())], pa.int64()),
            "n_true": pa.array([int(true.sum())], pa.int64()),
            "cents": pa.array([int(cents[true].sum())], pa.int64()),
        })

    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount"])
    parts = li.map_batches(probe, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    n_kept = int(parts["n_kept"].sum())
    n_true = int(parts["n_true"].sum())
    out = pd.DataFrame([{
        "n_lineitem": n,
        "n_subset": int(len(sub)),
        "n_bloom_kept": n_kept,
        "n_true_match": n_true,
        "n_bloom_fp": n_kept - n_true,
        "fp_ppm": (n_kept - n_true) * 1_000_000
                  // max(n - n_true, 1),
        "revenue_cents": int(parts["cents"].sum()),
    }])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _bloomjoin_oracle_sql() -> str:
    """Generated mirror: the incremental-exact Bloom SQL machinery
    applied to DISTINCT probe keys (u = l_suppkey raw — the filter
    hashes via its own splitmix chain), truth/subset/revenue from the
    raw views."""
    gamma = 0x9E3779B97F4A7C15
    c1 = 0xBF58476D1CE4E5B9
    c2 = 0x94D049BB133111EB
    h2x = 0xA076_1D64_78BD_642F
    m64 = "(1::UHUGEINT << 64)"
    base = f"{BLOOMJOIN_ORACLE_DIR}/current"
    return f"""
        WITH params AS (
            SELECT m::UHUGEINT AS m, k
            FROM read_parquet('{base}/bloom_params.parquet')),
        words AS (
            SELECT i, CASE WHEN w < 0
                 THEN (w::HUGEINT + (1::HUGEINT << 64))::UHUGEINT
                 ELSE w::UHUGEINT END AS uw
            FROM read_parquet('{base}/bloom_words.parquet')),
        keys AS (SELECT DISTINCT l_suppkey AS key FROM lineitem),
        ku AS (SELECT key, key::UHUGEINT AS u FROM keys),
        a0 AS (SELECT key, u,
                      (u + {gamma}::UHUGEINT) % {m64} AS x FROM ku),
        a1 AS (SELECT key, u,
                      (xor(x, x >> 30) * {c1}::UHUGEINT) % {m64} AS x
               FROM a0),
        a2 AS (SELECT key, u,
                      (xor(x, x >> 27) * {c2}::UHUGEINT) % {m64} AS x
               FROM a1),
        h1t AS (SELECT key, u, xor(x, x >> 31) AS h1 FROM a2),
        b0 AS (SELECT key, h1,
                      (xor(u, {h2x}::UHUGEINT) + {gamma}::UHUGEINT)
                        % {m64} AS x FROM h1t),
        b1 AS (SELECT key, h1,
                      (xor(x, x >> 30) * {c1}::UHUGEINT) % {m64} AS x
               FROM b0),
        b2 AS (SELECT key, h1,
                      (xor(x, x >> 27) * {c2}::UHUGEINT) % {m64} AS x
               FROM b1),
        h2t AS (SELECT key, h1,
                       xor(x, x >> 31) // 2 * 2 + 1 AS h2 FROM b2),
        ks AS (SELECT unnest(range(0, (SELECT k FROM params))) AS i),
        posn AS (
            SELECT key,
                   ((h1 + ks.i::UHUGEINT * h2) % {m64})
                     % (SELECT m FROM params) AS pos
            FROM h2t CROSS JOIN ks
        ),
        hits AS (
            SELECT p.key,
                   min(CASE WHEN
                       (w.uw // (1::UHUGEINT << (p.pos % 64)))
                            % 2 = 1 THEN 1 ELSE 0 END) AS hit
            FROM posn p JOIN words w ON w.i = (p.pos // 64)::BIGINT
            GROUP BY p.key
        ),
        sub AS (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5),
        rows AS (
            SELECT l.l_suppkey AS key,
                   CAST(round(l.l_extendedprice * (1 - l.l_discount)
                              * 100) AS BIGINT) AS cents,
                   (l.l_suppkey IN (SELECT s_suppkey FROM sub))
                       AS is_true
            FROM lineitem l
        ),
        j AS (SELECT r.key, r.cents, r.is_true, h.hit
              FROM rows r JOIN hits h ON r.key = h.key)
        SELECT count(*)::BIGINT AS n_lineitem,
               (SELECT count(*) FROM sub)::BIGINT AS n_subset,
               sum(hit)::BIGINT AS n_bloom_kept,
               sum(CASE WHEN is_true THEN 1 ELSE 0 END)::BIGINT
                   AS n_true_match,
               (sum(hit) - sum(CASE WHEN is_true THEN 1 ELSE 0 END))
                   ::BIGINT AS n_bloom_fp,
               ((sum(hit) - sum(CASE WHEN is_true THEN 1 ELSE 0 END))
                * 1000000
                // greatest(count(*) - sum(CASE WHEN is_true
                                           THEN 1 ELSE 0 END), 1))
                   ::BIGINT AS fp_ppm,
               sum(CASE WHEN is_true THEN cents ELSE 0 END)::BIGINT
                   AS revenue_cents
        FROM j
    """


URLDEDUP_ORACLE_DIR = "/tmp/ocracle_urldedup_oracle"


def q_pages_urlnorm_dedup(sf_dir: str):
    """Canonical-URL deduplication — the crawl-frontier merge in
    front of url-keyed dedup (core.urlnorm: case/default-port/
    fragment/tracking-param/param-order/trailing-slash variants all
    canonicalize to one key): a deterministic variant corpus (five
    surface forms per base url, each with its own crawl ts) collapses
    under keep-latest-per-canonical; output = one row per canonical
    group (FNV fingerprint of the canonical url, variant count,
    winning ts). Canonicalization itself is the trusted step
    (unit+hypothesis-tested: idempotent and total); everything
    downstream — grouping, keep-latest, fingerprints, census — is
    SQL-re-derived from the written (url, ts_us, canon) rows, incl.
    the FNV via list_reduce (urls are ASCII)."""
    import shutil

    from ray.data import from_arrow

    from ..core.urlnorm import canonical_url
    from ..sources.pages import sf_of_dir

    n_base = max(20, min(300, int(3000 * sf_of_dir(sf_dir))))
    urls, tss = [], []
    for b in range(n_base):
        path = f"p{b:05d}"
        variants = [
            f"https://exam.example/{path}?a=1&b=2",
            f"https://Exam.Example:443/{path}?b=2&a=1",
            f"https://exam.example/{path}/?a=1&b=2&utm_source=mail",
            f"https://exam.example/{path}?a=1&b=2#frag",
            f"https://exam.example:443/{path}/?utm_campaign=x&a=1&b=2",
        ]
        for v, u in enumerate(variants):
            urls.append(u)
            tss.append(1_700_000_000_000_000 + b * 1000 + v * 7)

    def canon(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t["url"],
            "ts_us": t["ts_us"],
            "canon": pa.array([canonical_url(u)
                               for u in t["url"].to_pylist()],
                              pa.string()),
        })

    ds = from_arrow(pa.table({
        "url": pa.array(urls, pa.string()),
        "ts_us": pa.array(tss, pa.int64()),
    })).map_batches(canon, batch_format="pyarrow").materialize()

    out_dir = f"{URLDEDUP_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.write_parquet(out_dir)

    from ..core.textstats import fnv1a64

    def group_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "canon": t["canon"].to_pylist(),
            "ts": t["ts_us"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby("canon").agg(n=("ts", "size"),
                                    win=("ts", "max"))
        fps = []
        for c in g.index:
            fp = fnv1a64(c.encode())
            fps.append(fp - (1 << 64) if fp >= 1 << 63 else fp)
        return pa.table({
            "canon_fp": pa.array(fps, pa.int64()),
            "n_variants": pa.array(g["n"].to_numpy(np.int64)),
            "winner_ts_us": pa.array(g["win"].to_numpy(np.int64)),
        })

    parts = ds.map_batches(group_partial,
                           batch_format="pyarrow").to_pandas()
    out = parts.groupby("canon_fp", as_index=False).agg(
        n_variants=("n_variants", "sum"),
        winner_ts_us=("winner_ts_us", "max"))
    out = out.sort_values("canon_fp").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def q_events_daily_quantiles(sf_dir: str):
    """Per-day p50/p95 value trend — the ops-dashboard gauge (daily
    latency/size percentiles), on the exact two-pass histogram-
    refinement quantile machinery GROUPED BY DAY (~100+ groups vs
    the 5-type precedent — per-group state is two histogram partials,
    bounded by groups × bins, never by rows; no group materializes).
    quantile_cont-exact, so the oracle is DuckDB's quantile_cont
    directly; floats round to 4 on both sides (the events_value_mad
    rule)."""
    from ..stages.quantile import grouped_exact_quantiles

    ds = _read(sf_dir, "events", ["ts", "value"])

    def keyed(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        return pa.table({
            "day": pa.array(day, pa.int64()),
            "value": t["value"],
        })

    out = grouped_exact_quantiles(
        ds.map_batches(keyed, batch_format="pyarrow"),
        "day", "value", probs=(0.5, 0.95))
    out["p50"] = out["p50"].round(4)
    out["p95"] = out["p95"].round(4)
    out = out.sort_values("day").reset_index(drop=True)
    out["day"] = out["day"].astype("int64")
    return out[["day", "p50", "p95"]]


def q_orders_open_concurrency(sf_dir: str):
    """Sweep-line interval concurrency — the occupancy/backlog curve
    ("how many orders were open on day d"): each order spans
    [orderdate, max lineitem shipdate] (clamped non-negative), and
    the daily open count is the prefix sum of a DIFF ARRAY (+1 at
    the open day, −1 after the close day) — the classic O(n + days)
    sweep that replaces an O(n·span) interval explosion. Shape: one
    hash join (spans need both tables; partitions clamped + CPU
    reservation pinned) → per-batch diff-array combiners over the
    bounded day domain → driver prefix sum over O(days) rows.
    Output: the top-10 peak days by (n_open DESC, day ASC).
    The oracle pays the explosion on purpose (generate_series per
    order) — the naive form the sweep provably equals."""
    from ray.data.aggregate import Max

    from ..pool import clamp_join_partitions, pin_join_cpu_reservation

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    n_parts = clamp_join_partitions(8, n_joins=1)
    j = li.join(orders, join_type="inner", num_partitions=n_parts,
                on=("l_orderkey",), right_on=("o_orderkey",))
    j = pin_join_cpu_reservation(j, n_parts, n_joins=1)

    def span_flag(t: pa.Table) -> pa.Table:
        open_d = (t["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 86_400_000_000)
        ship_d = (t["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 86_400_000_000)
        return pa.table({
            "okey": t["l_orderkey"].cast(pa.int64()),
            "open_day": pa.array(open_d, pa.int64()),
            "ship_day": pa.array(ship_d, pa.int64()),
        })

    spans = j.map_batches(span_flag, batch_format="pyarrow") \
        .materialize() \
        .groupby("okey").aggregate(
            Max("open_day", alias_name="open_day"),
            Max("ship_day", alias_name="close_day")).materialize()

    def diff_partial(t: pa.Table) -> pa.Table:
        o = t["open_day"].to_numpy(zero_copy_only=False)
        c = np.maximum(t["close_day"].to_numpy(zero_copy_only=False),
                       o)
        days = np.concatenate([o, c + 1])
        deltas = np.concatenate([np.ones(len(o), np.int64),
                                 -np.ones(len(c), np.int64)])
        df = pd.DataFrame({"day": days, "delta": deltas})
        g = df.groupby("day", as_index=False)["delta"].sum()
        return pa.table({
            "day": pa.array(g["day"].to_numpy(np.int64)),
            "delta": pa.array(g["delta"].to_numpy(np.int64)),
        })

    diffs = driver_grouped_agg(
        spans.map_batches(diff_partial, batch_format="pyarrow"),
        ["day"], {"delta": ("delta", "sum")})
    diffs = diffs.sort_values("day").reset_index(drop=True)
    # the step function only CHANGES at delta days — expand to every
    # day so plateau ties rank identically to the per-day oracle
    # (a peak spanning days 10..13 must list all four)
    ddays = diffs["day"].to_numpy(np.int64)
    steps = diffs["delta"].to_numpy(np.int64).cumsum()
    full = np.arange(ddays.min(), ddays.max() + 1, dtype=np.int64)
    n_open = steps[np.searchsorted(ddays, full, side="right") - 1]
    curve = pd.DataFrame({"day": full, "n_open": n_open})
    curve = curve[curve["n_open"] > 0]  # only days with open orders
    out = curve.sort_values(["n_open", "day"],
                            ascending=[False, True]).head(10) \
        .reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def q_events_dict_advisor(sf_dir: str):
    """Dictionary-encoding advisor — the categorical sibling of the
    varint storage advisor: for the event_type column, the dictionary
    cardinality, the fixed-width code size ceil(log2 k), exact
    integer byte estimates (raw 8-byte vs dictionary-coded
    (n·bits+7)//8), and the Shannon lower bound as integer micro-nats
    (the docs_char_entropy rule — one half-away rounding point over
    H = ln n − Σc·ln c / n). One bounded grouped count; everything
    else is O(k) arithmetic."""
    ds = _read(sf_dir, "events", ["event_type"])
    g = driver_grouped_agg(ds, ["event_type"],
                           {"c": ("event_type", "count")})
    c = g["c"].to_numpy(np.int64)
    n = int(c.sum())
    k = int(len(c))
    fixed_bits = (k - 1).bit_length() if k > 1 else 0
    h = float(np.log(n) - (c * np.log(c)).sum() / n)
    out = pd.DataFrame([{
        "n_rows": n,
        "n_distinct": k,
        "fixed_bits": fixed_bits,
        "raw_bytes": 8 * n,
        "dict_bytes": (n * fixed_bits + 7) // 8,
        "entropy_micro_nats": int(np.floor(h * 1_000_000 + 0.5)),
    }])
    for col in out.columns:
        out[col] = out[col].astype("int64")
    return out


REDIR_ORACLE_DIR = "/tmp/ocracle_redir_oracle"


def q_pages_redirects(sf_dir: str):
    """Redirect-chain resolution — the crawl-frontier canonicalizer
    (every 301/302 chain resolves to its terminal page; loops are
    flagged, not followed forever): a capped walk over the broadcast
    edge map with EXACT hop accounting — the in-repo form when the
    redirect map fits a broadcast; at 100 TB the same semantics run
    as pointer doubling (f ← f∘f, d ← d + d∘f — the
    distributed-components contraction's sibling, O(log chain)
    rounds of (key, target) projections). A node is RESOLVED when
    its walk ends at a url with no outgoing edge; a walk still
    redirecting at the cap sits on/behind a loop. Fixture:
    deterministic chains of length 1..6 plus planted 3-cycles (and a
    self-loop). Census per kind: n, total hops (resolved only), and
    an FNV XOR over terminal targets (resolved) / member urls
    (loop) — membership and targets pinned.
    Oracle: a recursive CTE walks the written edge rows from every
    url with a depth cap (loop ⇔ the cap is hit before a terminal),
    re-deriving hops, every terminal, both fingerprint XORs and the
    census; the engine's log-round doubling must agree with the
    step-by-step walk exactly."""
    import shutil

    import pyarrow.parquet as _pq

    from ..core.textstats import fnv1a64
    from ..sources.pages import sf_of_dir

    n_chain = max(10, min(150, int(1500 * sf_of_dir(sf_dir))))
    edges = {}
    urls = []
    for c in range(n_chain):
        ln = 1 + (c * 7 + 3) % 6  # deterministic 1..6
        names = [f"https://r.example/c{c:04d}/h{i}"
                 for i in range(ln + 1)]
        urls.extend(names)
        for i in range(ln):
            edges[names[i]] = names[i + 1]
    for c in range(max(2, n_chain // 10)):  # planted 3-cycles
        names = [f"https://r.example/loop{c:03d}/n{i}"
                 for i in range(3)]
        urls.extend(names)
        for i in range(3):
            edges[names[i]] = names[(i + 1) % 3]
    urls.append("https://r.example/self")
    edges["https://r.example/self"] = "https://r.example/self"

    out_dir = f"{REDIR_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    import os
    os.makedirs(out_dir, exist_ok=True)
    _pq.write_table(pa.table({
        "src": pa.array(sorted(edges), pa.string()),
        "dst": pa.array([edges[k] for k in sorted(edges)],
                        pa.string()),
    }), f"{out_dir}/edges.parquet")
    _pq.write_table(pa.table({"url": pa.array(sorted(set(urls)),
                                              pa.string())}),
                    f"{out_dir}/urls.parquet")

    import ray
    ref = ray.put(edges)

    CAP = 64  # > any real chain; a walk still redirecting at the
    # cap sits on/behind a loop (identical rule in the oracle CTE)

    def resolve(t: pa.Table) -> pa.Table:
        e = _cached_broadcast(ref)
        us = t["url"].to_pylist()
        kinds, hops, fps = [], [], []
        for u in us:
            cur, h = u, 0
            while cur in e and h < CAP:
                cur = e[cur]
                h += 1
            if cur in e:  # cap hit while still redirecting → loop
                kinds.append("loop")
                hops.append(0)
                fp = fnv1a64(u.encode())
            else:
                kinds.append("resolved")
                hops.append(h)
                fp = fnv1a64(cur.encode())
            fps.append(fp - (1 << 64) if fp >= 1 << 63 else fp)
        df = pd.DataFrame({"kind": kinds, "h": hops, "x": fps})
        g = df.groupby("kind").agg(
            n=("h", "size"), sum_hops=("h", "sum"),
            fp_xor=("x", lambda s: int(np.bitwise_xor.reduce(
                s.to_numpy(np.int64)))))
        return pa.table({
            "kind": pa.array(g.index.tolist(), pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "sum_hops": pa.array(g["sum_hops"].to_numpy(np.int64)),
            "fp_xor": pa.array(g["fp_xor"].to_numpy(np.int64)),
        })

    import ray.data as rd
    parts = rd.read_parquet(f"{out_dir}/urls.parquet").map_batches(
        resolve, batch_format="pyarrow").to_pandas()
    out = parts.groupby("kind", as_index=False).agg(
        n=("n", "sum"), sum_hops=("sum_hops", "sum"),
        fp_xor=("fp_xor", lambda s: int(np.bitwise_xor.reduce(
            s.to_numpy(np.int64)))))
    out = out.sort_values("kind").reset_index(drop=True)
    for c in ("n", "sum_hops", "fp_xor"):
        out[c] = out[c].astype("int64")
    return out


ROBOTS_ORACLE_DIR = "/tmp/ocracle_robots_oracle"
# (verdict, rule-path) in robots.txt syntax: '*' any-span, trailing
# '$' end-anchor; precedence = rule-string length, tie → allow
# (RFC 9309 longest-match; the length metric is the declared one)
ROBOTS_RULES = [
    ("disallow", "/TMA"),
    ("allow", "/TMA4100/V24"),
    ("disallow", "/*/K24/"),
    ("disallow", "/*0$"),
    ("allow", "/ING*0$"),
]


def _robots_regex(rule: str) -> str:
    """robots path rule -> the RE2 pattern BOTH engines run
    (pyarrow and DuckDB share the RE2 engine, so one literal string
    guarantees one semantics)."""
    import re as _re

    anchor = ""
    body = rule
    if body.endswith("$"):
        body = body[:-1]
        anchor = "$"
    return "^" + _re.escape(body).replace(r"\*", ".*") + anchor


def q_pages_robots_txt(sf_dir: str):
    """robots.txt evaluation (RFC 9309) — the REAL crawl-scope
    component behind the url_filter's declared gates: a rule group
    with wildcard '*' spans and '$' end anchors, applied with
    LONGEST-MATCH precedence (rule-string length; ties → Allow —
    the subtle REP semantics worth pinning: here the len-7 Allow
    '/ING*0$' overrides the len-4 Disallow '/*0$' for ING pages
    ending in 0, while '/TMA4100/V24' re-allows a subtree inside
    the '/TMA' disallow). Vectorized: one pc.match_substring_regex
    pass per rule (the rule count is the robots-file size, not the
    corpus), priority argmax in numpy, census per (winning rule,
    verdict) with doc-number XOR membership.
    STRONG artifact oracle: raw (url, path) rows are written; SQL
    re-runs the IDENTICAL generated RE2 patterns with
    regexp_matches, the same length/tie precedence via row_number,
    and the census — the regex strings are shared literals, so
    engine and oracle cannot drift."""
    import shutil

    from ..sources.pages import generate_pages_dataset, n_docs_for_sf, \
        sf_of_dir

    n = min(1000, n_docs_for_sf(sf_of_dir(sf_dir)))
    pages = generate_pages_dataset(n)
    host = "https://exam.example"

    def rows(t: pa.Table) -> pa.Table:
        u = pc.cast(t["url"], pa.string())
        path = pc.replace_substring(u, host, "")
        return pa.table({"url": u, "path": path})

    ds = pages.map_batches(rows, batch_format="pyarrow").materialize()
    out_dir = f"{ROBOTS_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.write_parquet(out_dir)

    def census(t: pa.Table) -> pa.Table:
        path = t["path"]
        doc = pc.struct_field(
            pc.extract_regex(t["url"], r"doc(?P<d>\d+)$"), "d")
        docn = np.array([int(x) for x in doc.to_pylist()], np.int64)
        best_rule = np.full(t.num_rows, -1, np.int64)
        best_pri = np.full(t.num_rows, -1, np.int64)
        for idx, (verdict, rule) in enumerate(ROBOTS_RULES):
            m = pc.match_substring_regex(
                path, _robots_regex(rule)).to_numpy(
                zero_copy_only=False)
            # priority: length first, allow beats disallow on ties,
            # lowest rule index on full ties (deterministic)
            pri = (len(rule) * 100
                   + (10 if verdict == "allow" else 0)
                   + (len(ROBOTS_RULES) - idx))
            upd = m & (pri > best_pri)
            best_pri[upd] = pri
            best_rule[upd] = idx
        verdicts = np.where(
            best_rule < 0, "allow",
            np.array([v for v, _ in ROBOTS_RULES])[
                np.clip(best_rule, 0, None)])
        df = pd.DataFrame({"rule_idx": best_rule, "verdict": verdicts,
                           "d": docn})
        g = df.groupby(["rule_idx", "verdict"]).agg(
            n=("d", "size"),
            doc_xor=("d", lambda s: int(np.bitwise_xor.reduce(
                s.to_numpy(np.int64)))))
        g = g.reset_index()
        return pa.table({
            "rule_idx": pa.array(g["rule_idx"].to_numpy(np.int64)),
            "verdict": pa.array(g["verdict"].tolist(), pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "doc_xor": pa.array(g["doc_xor"].to_numpy(np.int64)),
        })

    parts = ds.map_batches(census, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["rule_idx", "verdict"], as_index=False).agg(
        n=("n", "sum"),
        doc_xor=("doc_xor", lambda s: int(np.bitwise_xor.reduce(
            s.to_numpy(np.int64)))))
    out = out.sort_values(["rule_idx", "verdict"]).reset_index(
        drop=True)
    for c in ("rule_idx", "n", "doc_xor"):
        out[c] = out[c].astype("int64")
    return out[["rule_idx", "verdict", "n", "doc_xor"]]


def _robots_oracle_sql() -> str:
    """Generated mirror: the same RE2 pattern literals, the same
    (length, allow, index) precedence via row_number, default-allow
    for unmatched paths."""
    rows = []
    for idx, (verdict, rule) in enumerate(ROBOTS_RULES):
        pri = (len(rule) * 100 + (10 if verdict == "allow" else 0)
               + (len(ROBOTS_RULES) - idx))
        # DuckDB single-quoted literals do NOT process backslash
        # escapes, so ONLY quotes double — doubling backslashes would
        # corrupt any re.escape-d metachar (r5 property sweep: '\.'
        # became '\\.' = literal-backslash-any; latent only while the
        # rule table is alnum+'/'+'*'+'$')
        pat = _robots_regex(rule).replace("'", "''")
        rows.append(f"({idx}, '{verdict}', '{pat}', {pri})")
    values = ",\n               ".join(rows)
    return f"""
        WITH src AS (
            SELECT url, path,
                   CAST(regexp_extract(url, 'doc(\\d+)$', 1)
                        AS BIGINT) AS d
            FROM read_parquet('{ROBOTS_ORACLE_DIR}/current/*.parquet')
        ),
        rules(rule_idx, verdict, pat, pri) AS (
            VALUES {values}
        ),
        m AS (
            SELECT s.url, s.d, r.rule_idx, r.verdict, r.pri
            FROM src s JOIN rules r
              ON regexp_matches(s.path, r.pat)
        ),
        win AS (
            SELECT url, d, rule_idx, verdict FROM (
                SELECT url, d, rule_idx, verdict,
                       row_number() OVER (PARTITION BY url
                                          ORDER BY pri DESC) AS rn
                FROM m
            ) WHERE rn = 1
        ),
        allrows AS (
            SELECT coalesce(w.rule_idx, -1) AS rule_idx,
                   coalesce(w.verdict, 'allow') AS verdict, s.d
            FROM src s LEFT JOIN win w ON s.url = w.url
        )
        SELECT rule_idx::BIGINT AS rule_idx, verdict,
               count(*)::BIGINT AS n,
               bit_xor(d)::BIGINT AS doc_xor
        FROM allrows GROUP BY 1, 2 ORDER BY rule_idx, verdict
    """


K_ANON_K = 10


def q_customer_k_anonymity(sf_dir: str):
    """k-anonymity audit (Sweeney 2002) — the privacy gate a release
    runs before publishing quasi-identifiable rows: group customers by
    the quasi-identifier (nation, market segment, acctbal rounded down
    to $5000 bands) and report how many equivalence classes — and how
    many ROWS — fall below k=10 (re-identification risk). One
    low-cardinality grouped aggregate (driver-fold combiner; the class
    count is bounded by the quasi-id domain, not by rows) + an O(classes)
    census. Band arithmetic is integer cents with TRUNCATING division
    (DuckDB ``//`` truncates toward zero; Python floors — the
    orders_monthly_growth lesson), so negative balances band
    identically on both sides. At sf0.001 the 150-customer table
    fragments completely (every class below k — the honest small-
    corpus answer); the census is mixed from sf0.01 up, and the mixed
    semantics are pinned by an engineered fixture in tests."""
    ds = _read(sf_dir, "customer",
               ["c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"])

    def qid(t: pa.Table) -> pa.Table:
        v = t["c_acctbal"].to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(
            np.int64)
        band = np.sign(cents) * (np.abs(cents) // 500_000)
        return pa.table({
            "nat": t["c_nationkey"].cast(pa.int64()),
            "seg": t["c_mktsegment"],
            "band": pa.array(band, pa.int64()),
        })

    g = driver_grouped_agg(
        ds.map_batches(qid, batch_format="pyarrow"),
        ["nat", "seg", "band"], {"n": ("nat", "count")})
    sizes = g["n"].to_numpy().astype(np.int64)
    n_rows = int(sizes.sum())
    below = sizes < K_ANON_K
    out = pd.DataFrame([{
        "k": K_ANON_K,
        "n_rows": n_rows,
        "n_classes": int(len(sizes)),
        "min_class_size": int(sizes.min()) if len(sizes) else 0,
        "classes_below_k": int(below.sum()),
        "rows_at_risk": int(sizes[below].sum()),
        "risk_ppm": int(sizes[below].sum()) * 1_000_000 // n_rows
                    if n_rows else 0,
    }])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


L_DIV_L = 3


def q_customer_l_diversity(sf_dir: str):
    """Distinct l-diversity audit (Machanavajjhala 2007) — the
    homogeneity gate k-anonymity misses: a class can be large yet
    leak the sensitive value when every member shares it. Quasi-id =
    (nation, $5000 truncating acctbal band) — the k-anonymity rule
    minus the segment — with c_mktsegment as the SENSITIVE attribute;
    a class fails when it holds fewer than l=3 distinct segments.
    One low-cardinality grouped count over (nat, band, seg) (combiner
    + driver fold, bounded by the quasi-id × segment domain, not by
    rows), then an O(classes) census: classes/rows below l, the
    minimum diversity, and risk ppm. All integer; same truncating
    band arithmetic as customer_k_anonymity."""
    ds = _read(sf_dir, "customer",
               ["c_nationkey", "c_mktsegment", "c_acctbal"])

    def qid(t: pa.Table) -> pa.Table:
        v = t["c_acctbal"].to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(
            np.int64)
        band = np.sign(cents) * (np.abs(cents) // 500_000)
        return pa.table({
            "nat": t["c_nationkey"].cast(pa.int64()),
            "band": pa.array(band, pa.int64()),
            "seg": t["c_mktsegment"],
        })

    g = driver_grouped_agg(
        ds.map_batches(qid, batch_format="pyarrow"),
        ["nat", "band", "seg"], {"n": ("nat", "count")})
    cls = g.groupby(["nat", "band"], as_index=False).agg(
        diversity=("seg", "size"), size=("n", "sum"))
    n_rows = int(cls["size"].sum())
    div = cls["diversity"].to_numpy().astype(np.int64)
    size = cls["size"].to_numpy().astype(np.int64)
    below = div < L_DIV_L
    out = pd.DataFrame([{
        "l": L_DIV_L,
        "n_rows": n_rows,
        "n_classes": int(len(cls)),
        "min_diversity": int(div.min()) if len(div) else 0,
        "classes_below_l": int(below.sum()),
        "rows_at_risk": int(size[below].sum()),
        "risk_ppm": int(size[below].sum()) * 1_000_000 // n_rows
                    if n_rows else 0,
    }])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def q_events_expectations(sf_dir: str):
    """Declarative data-quality expectations (stages.expect, the
    Deequ/Great-Expectations CI gate): seven declared checks over the
    events table — uniqueness, domain membership, timestamp range,
    referential integrity vs customer, value bounds/sign/null-rate —
    with exact-integer observed metrics and pass/fail verdicts. All
    row-local checks share ONE combiner pass; referential is a
    broadcast is_in in that same pass; uniqueness is the single
    genuine exchange (groupby count). The oracle re-derives every
    metric and verdict by integer equality."""
    from ..stages.expect import events_expectations

    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])
    cust = _read(sf_dir, "customer", ["c_custkey"])
    return events_expectations(ev, cust)


def q_docs_canonical(sf_dir: str):
    """Canonical-document selection — the step AFTER near-dup
    clustering in a corpus release: each cluster keeps its best member
    (quality DESC, doc_id ASC; quality is the shared RE2 kernel whose
    0.25-step values are float-exact, so the argmax is tie-safe).
    Composition of the engine's own primitives: MinHash-LSH pairs →
    distributed connected components → ONE is_in-filtered quality pass
    over only member docs (no second corpus scan). The oracle
    re-derives clusters via the recursive-CTE walk AND every quality
    score, then the same row_number pick."""
    from ..core.textstats import quality_scores_vec
    from ..stages.dedup import minhash_lsh_pairs, neardup_clusters_from_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_lsh_pairs(ds, "doc_id", "text", threshold=0.8,
                              n_bands=32)
    members = neardup_clusters_from_pairs(pairs).rename(
        columns={"key": "doc_id"})
    member_ids = pa.array(
        sorted(int(x) for x in members["doc_id"]), pa.int64())

    def qual(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["doc_id"], value_set=member_ids))
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "q": pa.array([], pa.float64())})
        return pa.table({"doc_id": t["doc_id"],
                         "q": pa.array(quality_scores_vec(t["text"]),
                                       pa.float64())})

    qmap = (ds.map_batches(qual, batch_format="pyarrow")
            .to_pandas().set_index("doc_id")["q"])
    df = members.copy()
    df["q"] = df["doc_id"].map(qmap)
    df = df.sort_values(["cluster_id", "q", "doc_id"],
                        ascending=[True, False, True])
    heads = df.groupby("cluster_id", as_index=False).agg(
        canonical_doc=("doc_id", "first"), n_members=("doc_id", "count"))
    heads["cluster_id"] = heads["cluster_id"].astype("int64")
    heads["canonical_doc"] = heads["canonical_doc"].astype("int64")
    heads["n_members"] = heads["n_members"].astype("int64")
    return heads.sort_values("cluster_id").reset_index(drop=True)


def q_events_attribution(sf_dir: str):
    """Multi-touch revenue attribution (stages.attribution): every
    purchase's cents split EXACTLY (largest-remainder in integer
    cents, (ts, event_id) order) across the user's click/view touches
    in the trailing hour — linear attribution, the ad-tech sibling of
    the as-of (last-touch) join. Range-join co-partitioning (touches
    replicate to 2 buckets, ONE groupby exchange); only (kind, cents,
    n) integer partials leave each group. attributed + unattributed
    == total purchase cents by construction; the oracle re-derives
    every share via window functions."""
    from ..stages.attribution import attribution_by_type

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])
    return attribution_by_type(ds)


HITS_ROUNDS = 2


def q_orders_hits(sf_dir: str):
    """HITS hubs & authorities (stages.hits, Kleinberg 1999) over the
    bipartite customer→part purchase graph: customers are hubs, parts
    authorities, mutually reinforcing h = W·a, a = Wᵀ·h. Edges from a
    both-sides-large hash join + ONE groupby; every half-iteration is
    one zero-shuffle edges pass against a broadcast score vector
    (the pagerank machinery on a bipartite structure). Int64 fixed
    point with max-normalization (L2 needs a sqrt; ranking fixed point
    is the same) — the generated unrolled oracle matches by exact
    integer equality."""
    from ray.data.aggregate import Sum

    from ..stages.hits import hits

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = li.join(orders, join_type="inner", num_partitions=8,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return pa.table({"c": pa.array([], pa.int64()),
                             "p": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        g = t.select(["o_custkey", "l_partkey"]).group_by(
            ["o_custkey", "l_partkey"]).aggregate([("l_partkey", "count")])
        return g.rename_columns(["c", "p", "w"])

    edges = (joined.map_batches(combine, batch_format="pyarrow")
             .groupby(["c", "p"]).aggregate(Sum("w", alias_name="w")))
    return hits(edges, n_rounds=HITS_ROUNDS, k=10)


def q_docs_setsim_join(sf_dir: str):
    """Exact set-similarity self-join (stages.setsim): every doc pair
    with Jaccard ≥ 0.5 over distinct word-bigram sets, via All-Pairs /
    PPJoin prefix filtering (Bayardo WWW'07, Xiao WWW'08) — the EXACT
    sibling of the MinHash-LSH path (no banding recall loss). Global
    rare-first rank map broadcast once; map-only prefix emission; ONE
    groupby(rank) exchange with the PPJoin length filter; distinct
    pairs stay a Dataset; verify is a zero-exchange broadcast-map
    pass. Integer-ppm Jaccard end to end; the DuckDB oracle re-derives
    the FULL pair set by brute-force all-pairs list_intersect."""
    from ..stages.setsim import setsim_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return setsim_join(ds)


PHASH_ORACLE_DIR = "/tmp/ocracle_phash_oracle"
PHASH_HAMMING = 10


def q_media_phash_dedup(sf_dir: str):
    """Perceptual image near-dup detection (stages.multimodal
    ImageDHash) — the image side of corpus dedup: dHash survives
    re-encoding (PNG vs JPEG q85) and small pixel noise that byte
    hashing can't see. Fixtures: deterministic smoothed-noise bases,
    each shipped as PNG (exact), JPEG (lossy twin) and noisy BMP —
    every pair inside a base family must land under the hamming
    threshold, cross-family pairs far above (asserted in tests).
    Actor-pool decode+hash; pairs here fold on the driver behind the
    corpus size (at scale: the simhash pigeonhole banding path).
    STRONG artifact oracle: per-image 72 luma samples are written;
    SQL re-derives all 64 comparison bits, the packed signed hash,
    and every hamming pair — only the codec decode is trusted."""
    import shutil

    from ray.data import from_arrow

    from ..core.bmp import encode_bmp
    from ..core.jpeg import encode_jpeg
    from ..core.png import encode_png
    from ..sources.pages import sf_of_dir
    from ..stages.multimodal import ImageDHash

    n_base = max(8, min(60, int(600 * sf_of_dir(sf_dir))))
    ids, payloads = [], []
    for b in range(n_base):
        rng = np.random.RandomState(90_000 + b)
        raw = rng.randint(0, 256, (34, 34)).astype(np.int64)
        # 3x3 integer box smooth -> structure dHash can key on
        g = np.zeros((32, 32), np.int64)
        for dy in range(3):
            for dx in range(3):
                g += raw[dy:dy + 32, dx:dx + 32]
        g = (g // 9).astype(np.uint8)
        noise = (np.random.RandomState(91_000 + b)
                 .randint(-2, 3, (32, 32)))
        noisy = np.clip(g.astype(np.int64) + noise, 0, 255).astype(
            np.uint8)
        for v, payload in ((0, encode_png(g)),
                           (1, encode_jpeg(g, quality=85)),
                           (2, encode_bmp(np.stack([noisy] * 3,
                                                   axis=2)))):
            ids.append(b * 10 + v)
            payloads.append(payload)

    ds = from_arrow(pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.large_binary()),
    }))
    hashed = ds.map_batches(
        ImageDHash, batch_format="pyarrow", batch_size=16,
        concurrency=2).materialize()

    out_dir = f"{PHASH_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    hashed.write_parquet(out_dir)

    hp = hashed.select_columns(["media_id", "dhash"]).to_pandas()
    mid = hp["media_id"].to_numpy().astype(np.int64)
    dh = hp["dhash"].to_numpy().astype(np.int64).astype(np.uint64)
    order = np.argsort(mid)
    mid, dh = mid[order], dh[order]
    ii, jj = np.triu_indices(len(mid), k=1)
    x = dh[ii] ^ dh[jj]
    ham = np.zeros(len(x), np.int64)
    for k in range(64):
        ham += ((x >> np.uint64(k)) & np.uint64(1)).astype(np.int64)
    keep = ham <= PHASH_HAMMING
    out = pd.DataFrame({
        "a": mid[ii[keep]], "b": mid[jj[keep]],
        "hamming": ham[keep],
    }).sort_values(["a", "b"]).reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _phash_oracle_sql() -> str:
    """Generated mirror: the 64 dHash comparison bits from the written
    luma samples (row-major 8×9, 1-based list indexing), MSB-first
    packing, signed-int64 wrap, then every hamming pair."""
    terms = []
    for r in range(8):
        for c in range(8):
            i = r * 9 + c + 1
            shift = 63 - (r * 8 + c)
            terms.append(
                f"CASE WHEN gray[{i}] < gray[{i + 1}] THEN "
                f"(1::HUGEINT << {shift}) ELSE 0::HUGEINT END")
    hsum = " + ".join(terms)
    return f"""
        WITH calc AS (
            SELECT media_id,
                   (CASE WHEN ({hsum}) >= (1::HUGEINT << 63)
                         THEN ({hsum}) - (1::HUGEINT << 64)
                         ELSE ({hsum}) END)::BIGINT AS dh
            FROM read_parquet('{PHASH_ORACLE_DIR}/current/*.parquet')
        )
        SELECT a.media_id AS a, b.media_id AS b,
               CAST(bit_count(xor(a.dh, b.dh)) AS BIGINT) AS hamming
        FROM calc a JOIN calc b ON a.media_id < b.media_id
        WHERE bit_count(xor(a.dh, b.dh)) <= {PHASH_HAMMING}
        ORDER BY a, b
    """


AFP_ORACLE_DIR = "/tmp/ocracle_afp_oracle"
AFP_HAMMING = 12


def q_media_audio_fingerprint(sf_dir: str):
    """Spectral audio near-dup detection (stages.multimodal
    AudioFingerprint) — the Haitsma–Kalker fingerprint next to
    ImageDHash: the key survives lossless re-encode EXACTLY (FLAC ≡
    PCM, asserted hamming 0 in tests), G.711 mu-law companding and
    small additive noise, where byte hashing sees four unrelated
    files. Fixtures: per-family 9-band sinusoid mixes with random
    per-segment amplitudes, pre-quantized to the grid where WAV
    (×32767 encode) and FLAC (×32768 encode) round-trip to identical
    ints (|q| < 16384 — the two scale factors agree there); shipped
    as PCM WAV, FLAC twin, mu-law WAV and noisy WAV. Measured
    separation: within-family hamming ≤ 1, cross-family ≥ 52 of 128.
    Actor-pool decode+fingerprint; pairs fold on the driver behind
    the corpus size (at scale: the simhash pigeonhole banding path
    over the two packed words).
    STRONG artifact oracle: the per-clip 17×9 int64 energy matrix is
    written; SQL re-derives all 128 time×band second-difference sign
    bits, both packed signed words, and every hamming pair — only the
    codec decode + rfft are trusted (codecs unit-tested)."""
    import shutil

    from ray.data import from_arrow

    from ..core.flac import encode_flac
    from ..core.wav import encode_wav, encode_wav_g711
    from ..sources.pages import sf_of_dir
    from ..stages.multimodal import AudioFingerprint

    n_seg, n_bands, seg_len = (AudioFingerprint.N_SEG,
                               AudioFingerprint.N_BANDS, 360)
    rate, n = 8000, n_seg * 360
    per = (seg_len // 2) // n_bands
    t = np.arange(seg_len)
    n_base = max(6, min(40, int(400 * sf_of_dir(sf_dir))))
    ids, payloads = [], []
    for b in range(n_base):
        amps = np.random.RandomState(95_000 + b).uniform(
            0.02, 0.045, (n_seg, n_bands))
        sig = np.zeros(n)
        for seg in range(n_seg):
            s = np.zeros(seg_len)
            for band in range(n_bands):
                kbin = 1 + band * per + per // 2
                s += amps[seg, band] * np.sin(2 * np.pi * kbin * t
                                              / seg_len)
            sig[seg * seg_len:(seg + 1) * seg_len] = s
        # shared-grid quantization: round(q*32767/32768) == q and
        # round(q*32768/32768) == q for |q| < 16384, so the WAV and
        # FLAC payloads decode to IDENTICAL float64 samples
        q = np.round(sig * 32767.0)
        assert np.abs(q).max() < 16384
        x = q / 32768.0
        noisy = np.clip(
            x + np.random.RandomState(96_000 + b)
                  .randint(-16, 17, n) / 32768.0, -0.5, 0.5)
        for v, payload in ((0, encode_wav(x, rate)),
                           (1, encode_flac(x, rate)),
                           (2, encode_wav_g711(x, rate, law="mu")),
                           (3, encode_wav(noisy, rate))):
            ids.append(b * 10 + v)
            payloads.append(payload)

    ds = from_arrow(pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.large_binary()),
    }))
    hashed = ds.map_batches(
        AudioFingerprint, batch_format="pyarrow", batch_size=16,
        concurrency=2).materialize()

    out_dir = f"{AFP_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    hashed.write_parquet(out_dir)

    hp = hashed.select_columns(
        ["media_id", "hash_hi", "hash_lo"]).to_pandas()
    mid = hp["media_id"].to_numpy().astype(np.int64)
    order = np.argsort(mid)
    mid = mid[order]
    hi = hp["hash_hi"].to_numpy().astype(np.int64)[order].astype(
        np.uint64)
    lo = hp["hash_lo"].to_numpy().astype(np.int64)[order].astype(
        np.uint64)
    ii, jj = np.triu_indices(len(mid), k=1)
    ham = np.zeros(len(ii), np.int64)
    for x in (hi[ii] ^ hi[jj], lo[ii] ^ lo[jj]):
        for k in range(64):
            ham += ((x >> np.uint64(k)) & np.uint64(1)).astype(
                np.int64)
    keep = ham <= AFP_HAMMING
    out = pd.DataFrame({
        "a": mid[ii[keep]], "b": mid[jj[keep]],
        "hamming": ham[keep],
    }).sort_values(["a", "b"]).reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _afp_oracle_sql() -> str:
    """Generated mirror: the 128 sign bits of the time×band second
    difference from the written 17×9 energy matrix (row-major,
    1-based list indexing: e[t*9+b+1]), MSB-first packing into two
    signed words, then every hamming pair."""
    hi_terms, lo_terms = [], []
    for tt in range(16):
        for c in range(8):
            i0, i1 = tt * 9 + c + 1, (tt + 1) * 9 + c + 1
            k = tt * 8 + c
            cond = (f"(e[{i1}] - e[{i0}]) > (e[{i1 + 1}] - e[{i0 + 1}])")
            if k < 64:
                hi_terms.append(
                    f"CASE WHEN {cond} THEN (1::HUGEINT << {63 - k}) "
                    f"ELSE 0::HUGEINT END")
            else:
                lo_terms.append(
                    f"CASE WHEN {cond} THEN (1::HUGEINT << {127 - k}) "
                    f"ELSE 0::HUGEINT END")
    hi_sum = " + ".join(hi_terms)
    lo_sum = " + ".join(lo_terms)
    return f"""
        WITH raw AS (
            SELECT media_id, ({hi_sum}) AS hraw, ({lo_sum}) AS lraw
            FROM read_parquet('{AFP_ORACLE_DIR}/current/*.parquet')
        ), calc AS (
            SELECT media_id,
                   (CASE WHEN hraw >= (1::HUGEINT << 63)
                         THEN hraw - (1::HUGEINT << 64)
                         ELSE hraw END)::BIGINT AS hi,
                   (CASE WHEN lraw >= (1::HUGEINT << 63)
                         THEN lraw - (1::HUGEINT << 64)
                         ELSE lraw END)::BIGINT AS lo
            FROM raw
        )
        SELECT a.media_id AS a, b.media_id AS b,
               CAST(bit_count(xor(a.hi, b.hi))
                    + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
        FROM calc a JOIN calc b ON a.media_id < b.media_id
        WHERE bit_count(xor(a.hi, b.hi))
              + bit_count(xor(a.lo, b.lo)) <= {AFP_HAMMING}
        ORDER BY a, b
    """


VFH_ORACLE_DIR = "/tmp/ocracle_vfh_oracle"
VFH_HAMMING_TOTAL = 40


def q_media_video_neardup(sf_dir: str):
    """Video near-dup detection (stages.multimodal.VideoFrameHash) —
    completes the near-dup key trio (image dHash / audio fingerprint /
    this): sampled-frame dHash sequences over the repo's two REAL
    animation branches. Fixtures: per-family 8-frame grayscale
    smoothed-noise animations with luma kept in [30, 220], shipped as
    (0) indexed GIF, (1) animated lossless WebP of the SAME canvases
    (exact twin — both codecs round-trip grayscale exactly, total
    hamming 0), (2) ±2-noise GIF (small hamming), (3) +10-brightness
    GIF (hamming 0 EXACTLY — dHash compares adjacent samples, so a
    uniform unclipped shift preserves every bit; the luma range is
    chosen so no pixel clips). Videos pair on common sampled frame
    indices; total hamming ≤ {VFH_HAMMING_TOTAL} over 4 sampled
    frames (cross-family ≈ 128).
    STRONG artifact oracle: per-(video, frame) 72 luma samples are
    written; SQL re-derives all 64 bits per frame, every frame hash,
    the frame-aligned pair join and both aggregate columns — only the
    codec decode is trusted."""
    import shutil

    from ray.data import from_arrow

    from ..core.gif import encode_gif
    from ..core.webp import encode_webp_animated
    from ..sources.pages import sf_of_dir
    from ..stages.multimodal import VideoFrameHash

    n_base = max(6, min(30, int(300 * sf_of_dir(sf_dir))))
    gray_pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    ids, payloads = [], []
    for b in range(n_base):
        frames = []
        for f in range(8):
            raw = np.random.RandomState(97_000 + b * 100 + f).randint(
                0, 256, (26, 26)).astype(np.int64)
            g = np.zeros((24, 24), np.int64)
            for dy in range(3):
                for dx in range(3):
                    g += raw[dy:dy + 24, dx:dx + 24]
            # 3x3 box smooth, then squeeze into [30, 220] so the
            # +10 brightness variant can never clip
            frames.append((30 + (g // 9) * 190 // 255).astype(np.uint8))
        noisy = [np.clip(fr.astype(np.int64)
                         + np.random.RandomState(98_000 + b * 100 + i)
                             .randint(-2, 3, fr.shape), 0, 255)
                 .astype(np.uint8) for i, fr in enumerate(frames)]
        bright = [(fr + 10).astype(np.uint8) for fr in frames]
        rgb = [np.stack([fr] * 3, axis=2) for fr in frames]
        for v, payload in ((0, encode_gif(frames, gray_pal)),
                           (1, encode_webp_animated(rgb)),
                           (2, encode_gif(noisy, gray_pal)),
                           (3, encode_gif(bright, gray_pal))):
            ids.append(b * 10 + v)
            payloads.append(payload)

    ds = from_arrow(pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.large_binary()),
    }))
    hashed = ds.map_batches(
        VideoFrameHash, batch_format="pyarrow", batch_size=16,
        concurrency=2).materialize()

    out_dir = f"{VFH_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    hashed.write_parquet(out_dir)

    hp = hashed.select_columns(
        ["media_id", "frame_index", "dhash"]).to_pandas()
    m = hp.merge(hp, on="frame_index", suffixes=("_a", "_b"))
    m = m[m["media_id_a"] < m["media_id_b"]]
    x = (m["dhash_a"].to_numpy().astype(np.int64).astype(np.uint64)
         ^ m["dhash_b"].to_numpy().astype(np.int64).astype(np.uint64))
    ham = np.zeros(len(x), np.int64)
    for k in range(64):
        ham += ((x >> np.uint64(k)) & np.uint64(1)).astype(np.int64)
    m = pd.DataFrame({"a": m["media_id_a"].to_numpy(),
                      "b": m["media_id_b"].to_numpy(),
                      "h": ham})
    g = m.groupby(["a", "b"], as_index=False).agg(
        n_frames=("h", "size"), hamming=("h", "sum"))
    out = g[g["hamming"] <= VFH_HAMMING_TOTAL].sort_values(
        ["a", "b"]).reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _vfh_oracle_sql() -> str:
    """Generated mirror: per-frame dHash bits from the written luma
    samples (the phash rule), then the frame-aligned pair join and
    the total-hamming gate."""
    terms = []
    for r in range(8):
        for c in range(8):
            i = r * 9 + c + 1
            shift = 63 - (r * 8 + c)
            terms.append(
                f"CASE WHEN gray[{i}] < gray[{i + 1}] THEN "
                f"(1::HUGEINT << {shift}) ELSE 0::HUGEINT END")
    hsum = " + ".join(terms)
    return f"""
        WITH calc AS (
            SELECT media_id, frame_index,
                   (CASE WHEN ({hsum}) >= (1::HUGEINT << 63)
                         THEN ({hsum}) - (1::HUGEINT << 64)
                         ELSE ({hsum}) END)::BIGINT AS dh
            FROM read_parquet('{VFH_ORACLE_DIR}/current/*.parquet')
        )
        SELECT a.media_id AS a, b.media_id AS b,
               CAST(COUNT(*) AS BIGINT) AS n_frames,
               CAST(SUM(bit_count(xor(a.dh, b.dh))) AS BIGINT)
                   AS hamming
        FROM calc a JOIN calc b
          ON a.media_id < b.media_id
         AND a.frame_index = b.frame_index
        GROUP BY a.media_id, b.media_id
        HAVING SUM(bit_count(xor(a.dh, b.dh))) <= {VFH_HAMMING_TOTAL}
        ORDER BY a, b
    """


KCORE_K = 3
KCORE_ROUNDS = 24


def q_emb_kcore(sf_dir: str):
    """k-core decomposition of the embedding similarity graph
    (cosine ≥ 0.3, round-6 — the triangles/BFS/LPA edge rule): the
    degeneracy peel a similarity graph gets before clustering —
    each round simultaneously removes every node whose degree AMONG
    SURVIVORS is < KCORE_K=3, until fixpoint. Output is the full
    peeling trajectory: one census row per round 0..KCORE_ROUNDS
    (n_alive + XOR of surviving vec_ids, so membership — not just
    counts — is pinned per round). The engine asserts fixpoint by
    round KCORE_ROUNDS=24 (loud failure otherwise; measured
    convergence is ≤ 11 rounds at sf0.001/0.01/0.1), and rounds past
    convergence are no-ops on BOTH sides, so the fixed unroll is
    exact (the textrank/HITS generated-oracle precedent applied to
    an iterate-to-fixpoint).
    Shape: edges from the shared `_emb_threshold_edges` distributed
    builder (blocked chunk-pair all-pairs); the peel itself is a
    driver fold behind the node/edge guards, and past them it
    DISPATCHES to the fully distributed degree-filter lane
    (`stages.simgraph.kcore_census_distributed` — one degree groupby
    per round over the materialized edge Dataset, broadcast alive
    set, driver holds O(alive) ids; round 5 implemented the escape
    hatch the r4 docstring only documented). `GRAFT_KCORE_DISTRIBUTED=1`
    forces the distributed lane; equivalence pinned in
    tests/test_simgraph.py."""
    from ..stages.simgraph import blocked_cosine_edges, \
        kcore_census_distributed

    if os.environ.get("GRAFT_KCORE_DISTRIBUTED") == "1":
        edges = blocked_cosine_edges(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
            "vec_id", "embedding", tau=EMB_TRI_TAU,
            n_chunks=EMB_TRI_CHUNKS)
        return kcore_census_distributed(edges, k=KCORE_K,
                                        rounds=KCORE_ROUNDS)
    try:
        a, b = _emb_threshold_edges(sf_dir)
    except RuntimeError:
        # edge fold past the guard: the 100-TB distributed peel
        edges = blocked_cosine_edges(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
            "vec_id", "embedding", tau=EMB_TRI_TAU,
            n_chunks=EMB_TRI_CHUNKS)
        return kcore_census_distributed(edges, k=KCORE_K,
                                        rounds=KCORE_ROUNDS)
    nodes = np.unique(np.concatenate([a, b]))
    if len(nodes) > EMB_TRI_NODE_LIMIT:
        raise RuntimeError(
            f"emb_kcore: {len(nodes)} touched nodes exceed "
            f"{EMB_TRI_NODE_LIMIT}; run the distributed "
            f"degree-filter form"
        )
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    alive = np.ones(len(nodes), bool)

    def census(rnd, mask):
        ids = nodes[mask]
        x = int(np.bitwise_xor.reduce(ids)) if len(ids) else 0
        return {"rnd": rnd, "n_alive": int(mask.sum()), "id_xor": x}

    rows = [census(0, alive)]
    for r in range(1, KCORE_ROUNDS + 1):
        keep = alive[ai] & alive[bi]
        deg = np.zeros(len(nodes), np.int64)
        np.add.at(deg, ai[keep], 1)
        np.add.at(deg, bi[keep], 1)
        new_alive = alive & (deg >= KCORE_K)
        rows.append(census(r, new_alive))
        converged = bool((new_alive == alive).all())
        alive = new_alive
    if not converged:
        raise RuntimeError(
            f"emb_kcore: peeling did not converge within "
            f"{KCORE_ROUNDS} rounds — raise KCORE_ROUNDS (the oracle "
            f"unroll must grow with it)"
        )
    return pd.DataFrame(rows).astype("int64")


def _kcore_oracle_sql() -> str:
    """Generated mirror: the cosine-threshold edge rule (shared with
    triangles/BFS/LPA), then KCORE_ROUNDS unrolled simultaneous-peel
    rounds, each a degree-among-survivors HAVING filter. The edge
    CTEs are MATERIALIZED — an inlined `u` re-scans the embeddings
    parquet in every round and exhausts the process fd budget."""
    parts = ["""
        WITH e AS MATERIALIZED (
            SELECT e1.vec_id AS a, e2.vec_id AS b
            FROM embeddings e1
            JOIN embeddings e2 ON e1.vec_id < e2.vec_id
            WHERE round(list_cosine_similarity(
                      CAST(e1.embedding AS DOUBLE[]),
                      CAST(e2.embedding AS DOUBLE[])), 6) >= 0.3
        ),
        u AS MATERIALIZED (SELECT a AS s, b AS t FROM e
              UNION ALL SELECT b, a FROM e),
        a0 AS (SELECT DISTINCT s AS v FROM u)"""]
    for r in range(1, KCORE_ROUNDS + 1):
        p = r - 1
        # each round CTE is referenced twice by the next round — left
        # non-materialized, CTE inlining doubles the plan per round
        # (2^ROUNDS blowup)
        parts.append(f""",
        a{r} AS MATERIALIZED (
            SELECT u.s AS v FROM u
            JOIN a{p} x ON u.s = x.v
            JOIN a{p} y ON u.t = y.v
            GROUP BY u.s HAVING count(*) >= {KCORE_K}
        )""")
    sel = []
    for r in range(KCORE_ROUNDS + 1):
        sel.append(
            f"SELECT CAST({r} AS BIGINT) AS rnd, "
            f"count(*)::BIGINT AS n_alive, "
            f"coalesce(bit_xor(v), 0)::BIGINT AS id_xor FROM a{r}")
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(sel) \
        + "\nORDER BY rnd"


PCA_SCALE_Q = 1_000_000     # embedding quantization (micro-units)
PCA_SCALE_V = 10_000        # iterate fixed point
PCA_ROUNDS = 40


def q_emb_pca_power(sf_dir: str):
    """Dominant principal component of the embedding corpus via
    EXACT INTEGER power iteration — the drift/QC direction a corpus
    release monitors ("which way does this batch of embeddings
    point?"). Entirely shuffle-free: embeddings quantize to micro-unit
    int64 (sign·floor(|x|·1e6 + 0.5), the shared half-away rule over
    the f32→DOUBLE cast), each batch emits ONE partial row holding its
    64×64 Gram contribution (q·qᵀ summed — permutation-invariant, so
    no ordering or exchange anywhere; the 4097-int partial is the
    mergeable sufficient statistic, tree-merged at 100 TB); the driver
    folds O(n_batches) partials and runs PCA_ROUNDS max-normalized
    power-iteration rounds in int64 with TRUNCATING division at the
    two documented points (Gram mean-scaling, iterate rescale), so the
    generated round-unrolled oracle matches every component by exact
    integer equality (the HITS/textrank precedent applied to PCA).
    Overflow discipline (asserted loud): |q| ≤ 1e6 ⇒ Gram-mean entries
    ≤ 1e12 ⇒ matvec ≤ 64·1e12·SCALE_V = 6.4e17 < 2^63.
    Convergence honesty: the output IS the exact 40-round iterate;
    its alignment with the true top eigenvector is bounded by the
    corpus eigengap, and the synthetic embeddings are nearly
    isotropic (measured λ2/λ1 = 0.984 at sf0.01 ⇒ cos 0.92 vs
    numpy.eigh after 40 rounds; 6 rounds gave 0.52) — weak
    identification here is itself the QC finding ("no dominant drift
    direction"), while the distributed machinery (one-pass mergeable
    Gram, integer matvec rounds) is what the oracle pins exactly."""
    ds = _read(sf_dir, "embeddings", ["embedding"])

    def gram_partial(t: pa.Table) -> pa.Table:
        m = np.array([np.asarray(v, np.float64)
                      for v in t["embedding"].to_pylist()])
        q = (np.sign(m) * np.floor(np.abs(m) * PCA_SCALE_Q + 0.5)) \
            .astype(np.int64)
        c = q.T @ q  # (64, 64) int64 — exact (|terms| ≤ 1e12·rows)
        return pa.table({
            "n": pa.array([len(q)], pa.int64()),
            "c": pa.array([c.reshape(-1).tolist()],
                          pa.list_(pa.int64())),
        })

    n_rows, c = 0, np.zeros(64 * 64, np.int64)
    for b in ds.map_batches(gram_partial,
                            batch_format="pyarrow").iter_batches(
                                batch_format="pyarrow"):
        n_rows += int(b["n"].to_numpy(zero_copy_only=False).sum())
        for row in b["c"].to_pylist():
            c += np.asarray(row, np.int64)
    if n_rows <= 0:
        raise RuntimeError("emb_pca_power: empty embeddings table")
    if n_rows > 4_000_000:
        raise RuntimeError(
            f"emb_pca_power: {n_rows} rows exceed the int64 Gram "
            f"bound (rows·1e12 must stay < 2^62); raise the "
            f"quantization to a wider accumulator first")
    c = c.reshape(64, 64)

    def tdiv(x, d):
        return np.sign(x) * (np.abs(x) // d)

    cn = tdiv(c, n_rows)
    v = np.full(64, PCA_SCALE_V, np.int64)
    for _ in range(PCA_ROUNDS):
        w = cn @ v
        m = int(np.abs(w).max())
        v = tdiv(w, (m // PCA_SCALE_V) + 1)
    return pd.DataFrame({
        "dim": np.arange(64, dtype=np.int64),
        "v": v.astype(np.int64),
    })


def _pca_oracle_sql() -> str:
    """Generated mirror: quantize, Gram via the per-vector dim×dim
    self-join, mean-scale with truncating //, then PCA_ROUNDS
    unrolled max-normalized matvec rounds (CTEs MATERIALIZED — the
    kcore lesson)."""
    parts = [f"""
        WITH q AS MATERIALIZED (
            SELECT vec_id, i.i AS dim,
                   CAST(sign(emb[i.i + 1])
                        * floor(abs(emb[i.i + 1]) * {PCA_SCALE_Q}
                                + 0.5) AS BIGINT) AS qv
            FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                  FROM embeddings)
            CROSS JOIN (SELECT unnest(range(64)) AS i) i
        ),
        cn AS MATERIALIZED (
            SELECT a.dim AS da, b.dim AS db,
                   CAST(sum(a.qv * b.qv)
                        // (SELECT count(*) FROM embeddings)
                        AS BIGINT) AS cnv
            FROM q a JOIN q b ON a.vec_id = b.vec_id
            GROUP BY 1, 2
        ),
        v0 AS (SELECT unnest(range(64)) AS dim,
                      CAST({PCA_SCALE_V} AS BIGINT) AS v)"""]
    for r in range(1, PCA_ROUNDS + 1):
        p = r - 1
        parts.append(f""",
        w{r} AS MATERIALIZED (
            SELECT cn.da AS dim,
                   CAST(sum(cn.cnv * v.v) AS BIGINT) AS w
            FROM cn JOIN v{p} v ON cn.db = v.dim
            GROUP BY 1
        ),
        v{r} AS MATERIALIZED (
            SELECT dim, CAST(w // ((SELECT max(abs(w)) FROM w{r})
                                   // {PCA_SCALE_V} + 1)
                             AS BIGINT) AS v
            FROM w{r}
        )""")
    parts.append(f"""
        SELECT dim::BIGINT AS dim, v::BIGINT AS v
        FROM v{PCA_ROUNDS} ORDER BY dim
    """)
    return "".join(parts)


LINKS_ORACLE_DIR = "/tmp/ocracle_links_oracle"
LINK_TARGET_LIMIT = 100_000
LINK_TOP_K = 15


def _extract_links_partial(t: pa.Table) -> pa.Table:
    """Per-batch href extraction + census combiner for
    q_pages_link_census (module-level so tests can drive the hazard
    strings through the REAL kernel). Semantics == non-overlapping
    left-to-right scan of href="([^"]*)" — the vectorized split path
    covers terminated hrefs; any page with an unterminated href
    (prefix capture fails past position 0) routes through python-re,
    which has the scan semantics natively."""
    import re as _re

    sp = pc.split_pattern(t["html"], 'href="')
    lens = pc.list_value_length(sp).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = pc.list_flatten(sp)
    ex = pc.extract_regex(flat, '^(?P<t>[^"]*)"')
    valid = np.zeros(len(flat), bool)
    valid[: len(flat)] = np.asarray(ex.is_valid())
    targets = pc.struct_field(ex, "t").to_pylist()
    starts = np.cumsum(np.concatenate([[0], lens[:-1]])).astype(np.int64)
    pos_ok = np.ones(int(lens.sum()), bool)
    pos_ok[starts[lens > 0]] = False
    row_idx = np.repeat(np.arange(len(lens)), lens)
    # unterminated piece past position 0 → exact python-re fallback
    # for THAT page (non-overlapping scan semantics)
    bad_rows = np.unique(row_idx[pos_ok & ~valid])
    keep = pos_ok & valid
    if len(bad_rows):
        keep &= ~np.isin(row_idx, bad_rows)
    urls = t["url"].to_pylist()
    tss = t["ts_us"].to_numpy(zero_copy_only=False)
    recs_u, recs_t, recs_g = [], [], []
    for i in np.nonzero(keep)[0]:
        r = int(row_idx[i])
        recs_u.append(urls[r])
        recs_t.append(int(tss[r]))
        recs_g.append(targets[i])
    htmls = None
    for r in bad_rows:
        if htmls is None:
            htmls = t["html"].to_pylist()
        for g in _re.findall(r'href="([^"]*)"', htmls[int(r)]):
            recs_u.append(urls[int(r)])
            recs_t.append(int(tss[int(r)]))
            recs_g.append(g)
    df = pd.DataFrame({"u": recs_u, "s": recs_t, "g": recs_g})
    n_links = df.groupby("g").size()
    n_docs = df.drop_duplicates().groupby("g").size()
    return pa.table({
        "target": pa.array(n_links.index.tolist(), pa.string()),
        "n_links": pa.array(n_links.to_numpy(), pa.int64()),
        "n_docs": pa.array(
            n_docs.reindex(n_links.index).to_numpy(), pa.int64()),
    })


def q_pages_link_census(sf_dir: str):
    """Outlink extraction + link-target census over the crawl pages —
    the web-graph construction step of a crawl pipeline: every
    href=\"...\" target across the HTML pages, ranked by total link
    count with per-target document reach. Extraction is vectorized
    Arrow (literal split on 'href=\"' → list-flatten →
    ^([^\"]*)\" prefix capture; the first piece per page is masked
    out — it precedes any href and a stray quote there would
    fabricate a link). One documented edge: an UNTERMINATED href (no
    closing quote before the next 'href=\"') makes a left-to-right
    regex scan consume the next separator; pieces that fail the
    prefix capture route those (rare) pages through a python-re
    fallback with byte-identical non-overlapping-scan semantics, so
    the engine matches regexp_extract_all exactly on ANY input.
    Shape: per-batch combiner partials (in-batch (url, ts, target)
    dedup — a page row lives in exactly one batch, so doc-reach
    partials sum exactly) → ONE groupby(target) exchange → guarded
    driver top-k.
    STRONG artifact oracle: the raw (url, ts_us, html) page rows are
    written; SQL re-derives the ENTIRE extraction with
    regexp_extract_all plus the same dedup/census/top-k — only
    written-equals-read is trusted."""
    import shutil

    from ray.data.aggregate import Sum

    from ..sources.pages import generate_pages_dataset, n_docs_for_sf, \
        sf_of_dir

    n = min(1000, n_docs_for_sf(sf_of_dir(sf_dir)))
    pages = generate_pages_dataset(n)

    def html_rows(t: pa.Table) -> pa.Table:
        urls, tss, htmls = [], [], []
        ts_col = t["warc_ts"].cast(pa.int64()).to_pylist()
        for u, ts, h in zip(t["url"].to_pylist(), ts_col,
                            t["html"].to_pylist()):
            if h.startswith(b"%PDF"):
                continue
            urls.append(u)
            tss.append(-1 if ts is None else int(ts))
            htmls.append(h.decode("utf-8"))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "ts_us": pa.array(tss, pa.int64()),
            "html": pa.array(htmls, pa.string()),
        })

    hp = pages.map_batches(html_rows,
                           batch_format="pyarrow").materialize()
    out_dir = f"{LINKS_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    hp.write_parquet(out_dir)

    agg = hp.map_batches(_extract_links_partial, batch_format="pyarrow") \
        .groupby("target").aggregate(Sum("n_links", alias_name="n_links"),
                                     Sum("n_docs", alias_name="n_docs"))
    if agg.count() > LINK_TARGET_LIMIT:
        raise RuntimeError(
            f"pages_link_census: >{LINK_TARGET_LIMIT} distinct targets"
            f" — switch the top-k to per-batch candidate folding")
    g = agg.to_pandas()
    g = g.sort_values(["n_links", "target"],
                      ascending=[False, True]).head(LINK_TOP_K)
    out = g.reset_index(drop=True)
    for c in ("n_links", "n_docs"):
        out[c] = out[c].astype("int64")
    return out[["target", "n_links", "n_docs"]]


SOLE_LATE_US = 60 * 86_400 * 1_000_000  # ship > orderdate + 60 days


def q_supplier_sole_late(sf_dir: str):
    """TPC-H Q21 shape — the hardest classic join pattern (correlated
    EXISTS + NOT EXISTS), adapted to this schema's columns: suppliers
    who were the SOLE late shipper (l_shipdate > o_orderdate + 60
    days) on a multi-supplier order, top 10 by such orders. The
    correlated subqueries become distributed aggregates: lineitem ⋈
    orders hash join (partitions clamped, CPU reservation pinned),
    groupby(order, supplier) max(late) — the per-supplier EXISTS —
    then groupby(order) count/sum — the ≥2-suppliers and
    exactly-one-late-supplier conditions — with the sole supplier
    recovered as sum(supplier·late) (exact when the late count is 1).
    Materialize boundaries sit between the join and each groupby (the
    round-4 lesson: fusing chained sort-groupbys + hash joins into
    one lazy DAG thrashed the streaming scheduler 5×). Driver sees
    only the per-winner counts (bounded by the supplier table).
    Measured profile at sf0.1/32 CPUs: join 4 s, the two sort-groupby
    exchanges ~17 s (the session sort-shuffle floor ×2 — the
    structural cost of the two distinct-aware grouping levels; the
    in-batch pre-combiner in late_flag reduces exchanged rows only
    when the layout is orderkey-clustered — post-hash-join it catches
    0.2%, measured, and is kept for clustered/raw-read inputs)."""
    from ray.data.aggregate import Count, Max, Sum

    from ..pool import clamp_join_partitions, pin_join_cpu_reservation

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    n_parts = clamp_join_partitions(8, n_joins=1)
    j = li.join(orders, join_type="inner", num_partitions=n_parts,
                on=("l_orderkey",), right_on=("o_orderkey",))
    j = pin_join_cpu_reservation(j, n_parts, n_joins=1)

    def late_flag(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        od = t["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        # in-batch (okey, skey) max-combine BEFORE the exchange:
        # lineitem arrives orderkey-clustered, so an order's ~6 lines
        # collapse to its ~4 distinct suppliers here, not post-shuffle
        df = pd.DataFrame({
            "okey": t["l_orderkey"].cast(pa.int64()).to_numpy(
                zero_copy_only=False),
            "skey": t["l_suppkey"].cast(pa.int64()).to_numpy(
                zero_copy_only=False),
            "late": (ship > od + SOLE_LATE_US).astype(np.int64),
        })
        g = df.groupby(["okey", "skey"], as_index=False)["late"].max()
        return pa.table({
            "okey": pa.array(g["okey"].to_numpy(np.int64)),
            "skey": pa.array(g["skey"].to_numpy(np.int64)),
            "late": pa.array(g["late"].to_numpy(np.int64)),
        })

    flagged = j.map_batches(late_flag,
                            batch_format="pyarrow").materialize()
    lo = flagged.groupby(["okey", "skey"]).aggregate(
        Max("late", alias_name="late")).materialize()

    def weight(t: pa.Table) -> pa.Table:
        skey = t["skey"].to_numpy(zero_copy_only=False)
        late = t["late"].to_numpy(zero_copy_only=False)
        return pa.table({
            "okey": t["okey"],
            "late": t["late"],
            "w": pa.array(skey * late, pa.int64()),
        })

    po = lo.map_batches(weight, batch_format="pyarrow") \
        .groupby("okey").aggregate(
            Count(alias_name="n_supp"),
            Sum("late", alias_name="n_late"),
            Sum("w", alias_name="w")).materialize()

    def winners(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t["n_supp"], pa.scalar(2)),
                       pc.equal(t["n_late"], pa.scalar(1)))
        return pa.table({"s_suppkey": t.filter(keep)["w"]})

    per_supp = po.map_batches(winners, batch_format="pyarrow") \
        .groupby("s_suppkey").aggregate(Count(alias_name="n_orders")) \
        .to_pandas()  # bounded by the supplier table
    out = per_supp.sort_values(["n_orders", "s_suppkey"],
                               ascending=[False, True]).head(10) \
        .reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out[["s_suppkey", "n_orders"]]


def q_emb_feature_profile(sf_dir: str):
    """Per-dimension feature profile of the embedding corpus — the
    drift/QC table a feature store publishes per batch (which
    dimensions moved, died, or blew up): for each of the 64
    dimensions, count, sum, sum-of-squares, min and max over the
    micro-unit quantized values (the emb_pca_power rule), all int64
    so the oracle matches by exact equality with no float-mean
    round-off contract. One streaming pass of per-batch (64 × 5)
    partials — the mergeable sufficient statistic; no exchange, no
    driver guard needed (the fold is O(n_batches · 64))."""
    ds = _read(sf_dir, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = np.array([np.asarray(v, np.float64)
                      for v in t["embedding"].to_pylist()])
        q = (np.sign(m) * np.floor(np.abs(m) * PCA_SCALE_Q + 0.5)) \
            .astype(np.int64)
        return pa.table({
            "n": pa.array([len(q)], pa.int64()),
            "s": pa.array([q.sum(axis=0).tolist()],
                          pa.list_(pa.int64())),
            "ss": pa.array([(q * q).sum(axis=0).tolist()],
                           pa.list_(pa.int64())),
            "mn": pa.array([q.min(axis=0).tolist()],
                           pa.list_(pa.int64())),
            "mx": pa.array([q.max(axis=0).tolist()],
                           pa.list_(pa.int64())),
        })

    n = 0
    s = np.zeros(64, np.int64)
    ss = np.zeros(64, np.int64)
    mn = np.full(64, np.iinfo(np.int64).max)
    mx = np.full(64, np.iinfo(np.int64).min)
    for b in ds.map_batches(partial,
                            batch_format="pyarrow").iter_batches(
                                batch_format="pyarrow"):
        for i in range(b.num_rows):
            n += int(b["n"][i].as_py())
            s += np.asarray(b["s"][i].as_py(), np.int64)
            ss += np.asarray(b["ss"][i].as_py(), np.int64)
            mn = np.minimum(mn, np.asarray(b["mn"][i].as_py(),
                                           np.int64))
            mx = np.maximum(mx, np.asarray(b["mx"][i].as_py(),
                                           np.int64))
    if n == 0:
        raise RuntimeError("emb_feature_profile: empty table")
    return pd.DataFrame({
        "dim": np.arange(64, dtype=np.int64),
        "n": np.full(64, n, dtype=np.int64),
        "s": s, "ss": ss, "mn": mn, "mx": mx,
    }).astype("int64")


SIL_ORACLE_DIR = "/tmp/ocracle_silhouette_oracle"


def q_emb_silhouette(sf_dir: str):
    """Simplified silhouette (Hruschka 2004) of the k-means
    clustering — the cluster-quality score an embedding-store QC
    publishes: per vector, a = squared distance to OWN centroid,
    b = min over OTHER centroids, s = (b−a)/max(a,b) ∈ [0, 1)
    (centroid-based, so a ≤ b by the argmin — the full
    pairwise-silhouette's negative branch cannot occur). All
    comparisons in integer micro-units (floor(d²·1e6 + 0.5)) and
    integer ppm with truncating division, so per-cell sums are exact
    on both sides. Trains via the SAME oracled lloyd_kmeans the IVF
    family uses; centroids are the written artifact, and SQL
    re-derives every distance, assignment (ties → lowest cell),
    every per-vector score and the per-cell census from raw
    embeddings + the 8 written centroid rows — only the training is
    trusted (and it is itself oracled by emb_kmeans). One streaming
    scoring pass; per-batch per-cell (n, Σs) partials."""
    import shutil

    from ray.data import from_arrow

    from ..stages.kmeans import lloyd_kmeans

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents, _counts = lloyd_kmeans(ds, k=KMEANS_K, n_iters=KMEANS_ITERS)

    out_dir = f"{SIL_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    from_arrow(pa.table({
        "cell": pa.array(np.arange(len(cents), dtype=np.int64)),
        "v": pa.array([c.tolist() for c in cents],
                      pa.list_(pa.float64())),
    })).repartition(1).write_parquet(out_dir)

    import ray
    ref = ray.put(cents)

    def score_partial(t: pa.Table) -> pa.Table:
        c = _cached_broadcast(ref)
        v = np.stack([np.asarray(x, np.float64)
                      for x in t["embedding"].to_pylist()])
        d2 = ((v[:, None, :] - c[None, :, :]) ** 2).sum(axis=-1)
        d_us = np.floor(d2 * 1_000_000 + 0.5).astype(np.int64)
        own = np.argmin(d_us, axis=1)  # ties → lowest cell
        rows = np.arange(len(v))
        a = d_us[rows, own]
        masked = d_us.copy()
        masked[rows, own] = np.iinfo(np.int64).max
        b = masked.min(axis=1)
        s_ppm = ((b - a) * 1_000_000
                 // np.maximum(np.maximum(a, b), 1))
        df = pd.DataFrame({"cell": own.astype(np.int64),
                           "s": s_ppm.astype(np.int64)})
        g = df.groupby("cell")["s"].agg(["count", "sum"])
        return pa.table({
            "cell": pa.array(g.index.to_numpy(np.int64)),
            "n": pa.array(g["count"].to_numpy(np.int64)),
            "sum_s_ppm": pa.array(g["sum"].to_numpy(np.int64)),
        })

    g = driver_grouped_agg(
        ds.map_batches(score_partial, batch_format="pyarrow"),
        ["cell"], {"n": ("n", "sum"), "sum_s_ppm": ("sum_s_ppm", "sum")})
    g = g.sort_values("cell").reset_index(drop=True)
    g["silhouette_ppm"] = g["sum_s_ppm"] // g["n"]
    for c in g.columns:
        g[c] = g[c].astype("int64")
    return g[["cell", "n", "sum_s_ppm", "silhouette_ppm"]]


def q_emb_mutual_nn(sf_dir: str):
    """Mutual nearest-neighbor pairs over the embedding corpus — the
    reciprocal-best-match rule bitext mining / cross-modal alignment
    uses (a pair counts only when EACH side is the other's top-1):
    EXACT global top-1 per vector from the distributed chunk-pair
    machinery (``stages/simgraph.blocked_top1`` — per-group local
    best, round-6 cosine, ties → lowest vec_id, folded to the global
    best under the same rule; round 5 replaced the broadcast corpus
    matrix), then the mutuality check on the O(n) (vec, nn) map.
    Driver holds one int64 pair per vector — O(nodes), never the
    matrix. Output: the mutual pairs with their round-6 cosine in
    integer micro-units."""
    from ..stages.simgraph import blocked_top1

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    nn = blocked_top1(ds, "vec_id", "embedding",
                      n_chunks=EMB_TRI_CHUNKS).to_pandas()
    nn_map = dict(zip(nn["a"].astype("int64"),
                      nn["nn"].astype("int64")))
    cos_map = dict(zip(nn["a"].astype("int64"),
                       nn["cos_us"].astype("int64")))
    rows = []
    for a, b in nn_map.items():
        if a < b and nn_map.get(int(b)) == a:
            rows.append({"a": int(a), "b": int(b),
                         "cos_us": int(cos_map[a])})
    out = pd.DataFrame(rows, columns=["a", "b", "cos_us"]) \
        .sort_values("a").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


MHCAL_ORACLE_DIR = "/tmp/ocracle_mhcal_oracle"
MHCAL_WORDS = 120
MHCAL_LEVELS = (25, 50, 75, 100)


def q_docs_minhash_calibration(sf_dir: str):
    """MinHash estimator calibration audit — the measurement a dedup
    pipeline owes its threshold: how far does the 128-perm signature
    estimate sit from TRUE shingle Jaccard, across the similarity
    range? Controlled pairs per audited doc (base = first 120 words;
    variant = first 25/50/75/100% of them — a deterministic overlap
    ladder, p=100 pinning the degenerate exact case), scored both
    ways in integer ppm and aggregated per level.
    Shape: one pass over the guarded audit slice (lowest doc_ids);
    everything per-doc, zero shuffle.
    STRONG artifact oracle: the per-pair distinct shingle-hash lists
    are written; SQL re-derives the 128 permutation seeds (FNV-1a
    over the literal seed strings via list_reduce — the docs_dsir
    rule), the FULL splitmix64 mixing (golden-gamma add + the shared
    _sm64_ctes finalizer chain), every signature component via
    min-per-perm, every estimate, every true Jaccard
    (list_intersect) and the per-level sums — only blake2b shingle
    hashing is trusted (unit-tested separately)."""
    import shutil

    from ..core.dedup import _perm_seeds, _splitmix64, shingle_hashes
    from ..sources.pages import sf_of_dir

    n_audit = max(20, min(100, int(1000 * sf_of_dir(sf_dir))))
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    lim = pa.scalar(n_audit, pa.int64())
    ds = ds.map_batches(
        lambda t: t.filter(pc.less(pc.cast(t["doc_id"], pa.int64()),
                                   lim)),
        batch_format="pyarrow")
    seeds = _perm_seeds(128)

    def pairs(t: pa.Table) -> pa.Table:
        out = {"doc_id": [], "p": [], "sh_a": [], "sh_b": [],
               "est_ppm": [], "true_ppm": []}
        for did, text in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist()):
            words = text.split()
            if len(words) < 12:
                continue  # variants need >= 3 meaningful words
            base_words = words[:MHCAL_WORDS]
            ha = shingle_hashes(" ".join(base_words))
            if ha.size == 0:
                continue
            sig_a = _splitmix64(ha[:, None] ^ seeds[None, :]).min(
                axis=0)
            for p in MHCAL_LEVELS:
                nb = max(3, len(base_words) * p // 100)
                hb = shingle_hashes(" ".join(base_words[:nb]))
                if hb.size == 0:
                    continue
                sig_b = _splitmix64(hb[:, None] ^ seeds[None, :]) \
                    .min(axis=0)
                inter = np.intersect1d(ha, hb,
                                       assume_unique=True).size
                uni = ha.size + hb.size - inter
                out["doc_id"].append(did)
                out["p"].append(p)
                out["sh_a"].append(
                    ha.astype(np.int64).tolist())  # two's-complement
                out["sh_b"].append(hb.astype(np.int64).tolist())
                out["est_ppm"].append(
                    int((sig_a == sig_b).sum()) * 1_000_000 // 128)
                out["true_ppm"].append(
                    int(inter) * 1_000_000 // int(uni))
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "p": pa.array(out["p"], pa.int64()),
            "sh_a": pa.array(out["sh_a"], pa.list_(pa.int64())),
            "sh_b": pa.array(out["sh_b"], pa.list_(pa.int64())),
            "est_ppm": pa.array(out["est_ppm"], pa.int64()),
            "true_ppm": pa.array(out["true_ppm"], pa.int64()),
        })

    scored = ds.map_batches(pairs, batch_format="pyarrow") \
        .materialize()
    out_dir = f"{MHCAL_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    scored.write_parquet(out_dir)

    sp = scored.select_columns(
        ["p", "est_ppm", "true_ppm"]).to_pandas()
    sp["abs_err_ppm"] = (sp["est_ppm"] - sp["true_ppm"]).abs()
    g = sp.groupby("p", as_index=False).agg(
        n_pairs=("p", "size"), sum_true_ppm=("true_ppm", "sum"),
        sum_est_ppm=("est_ppm", "sum"),
        sum_abs_err_ppm=("abs_err_ppm", "sum"))
    g = g.sort_values("p").reset_index(drop=True)
    for c in g.columns:
        g[c] = g[c].astype("int64")
    return g


def _mhcal_oracle_sql() -> str:
    """Generated mirror over the written shingle lists: FNV seeds,
    golden-gamma splitmix64 mixing (the shared _sm64_ctes chain),
    min-per-perm signatures, estimates, true Jaccard, level sums."""
    gamma = 0x9E3779B97F4A7C15
    m64 = 1 << 64
    sm, last = _sm64_ctes("mh", "mix0", ["doc_id", "p", "side", "i"])
    return f"""
        WITH src AS MATERIALIZED (
            SELECT doc_id, p, sh_a, sh_b
            FROM read_parquet('{MHCAL_ORACLE_DIR}/current/*.parquet')
        ),
        tj AS (
            SELECT doc_id, p,
                   len(list_intersect(sh_a, sh_b))::BIGINT AS inter,
                   (len(sh_a) + len(sh_b)
                    - len(list_intersect(sh_a, sh_b)))::BIGINT AS uni
            FROM src
        ),
        seeds AS MATERIALIZED (
            SELECT i, CAST(list_reduce(
                list_prepend(CAST(14695981039346656037 AS UHUGEINT),
                    list_transform(
                        string_split('ocracle-minhash-' || i, ''),
                        c -> CAST(unicode(c) AS UHUGEINT))),
                (h, c) -> (xor(CAST(h AS UBIGINT),
                               CAST(c AS UBIGINT))::UHUGEINT
                           * 1099511628211)
                          % {m64}::UHUGEINT
            ) AS UHUGEINT) AS seed
            FROM (SELECT unnest(range(128)) AS i)
        ),
        sh AS (
            SELECT doc_id, p, 0 AS side, unnest(sh_a) AS hs FROM src
            UNION ALL
            SELECT doc_id, p, 1, unnest(sh_b) FROM src
        ),
        shu AS (
            SELECT doc_id, p, side,
                   CASE WHEN hs < 0
                        THEN (hs::HUGEINT + {m64}::HUGEINT)::UHUGEINT
                        ELSE hs::UHUGEINT END AS h
            FROM sh
        ),
        mix0 AS (
            SELECT doc_id, p, side, s.i,
                   (xor(h::UBIGINT, seed::UBIGINT)::UHUGEINT
                    + {gamma}::UHUGEINT) % {m64}::UHUGEINT AS x
            FROM shu CROSS JOIN seeds s
        ),
        {sm},
        sig AS MATERIALIZED (
            SELECT doc_id, p, side, i, min(x) AS v
            FROM {last} GROUP BY 1, 2, 3, 4
        ),
        est AS (
            SELECT a.doc_id, a.p,
                   (sum(CASE WHEN a.v = b.v THEN 1 ELSE 0 END)
                    * 1000000 // 128)::BIGINT AS est_ppm
            FROM sig a JOIN sig b
              ON a.doc_id = b.doc_id AND a.p = b.p AND a.i = b.i
             AND a.side = 0 AND b.side = 1
            GROUP BY 1, 2
        )
        SELECT t.p::BIGINT AS p,
               count(*)::BIGINT AS n_pairs,
               sum(t.inter * 1000000 // t.uni)::BIGINT
                   AS sum_true_ppm,
               sum(e.est_ppm)::BIGINT AS sum_est_ppm,
               sum(abs(e.est_ppm
                       - t.inter * 1000000 // t.uni))::BIGINT
                   AS sum_abs_err_ppm
        FROM tj t JOIN est e USING (doc_id, p)
        GROUP BY 1 ORDER BY p
    """


def q_docs_quality_prune(sf_dir: str):
    """Stratified quality pruning — the FineWeb-style "keep the top
    quality slice per language" release gate, tie-exact: each doc
    scores the LEXICOGRAPHIC (gate count, length) composite
    score = q4·100000 + min(codepoints, 99999), where q4 counts the
    four shared quality gates (quality_scores_vec's 0.25 steps ×4 —
    the gate count alone is degenerate on this corpus: 99.6% of docs
    pass all four, measured, so length breaks the tie the way a real
    release ranks within a quality band). Per lang, the threshold t
    is the 80th-percentile ORDER STATISTIC at ascending rank
    ceil(0.8·n); the census reports strictly-above and at-threshold
    separately, so no tie-splitting rule is ever needed (the
    boundary mass is visible, not silently split). Two streaming
    passes, zero shuffle: (lang, score) histogram via driver-folded
    combiners (domain ≤ distinct scores, loud-guarded), then a
    census pass against the broadcast thresholds with kept-doc XOR
    membership."""
    from ..core.textstats import quality_scores_vec

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def q4_t(t: pa.Table) -> pa.Table:
        q = quality_scores_vec(t["text"])
        ln = pc.utf8_length(t["text"]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        score = (np.rint(4 * q).astype(np.int64) * 100_000
                 + np.minimum(ln, 99_999))
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "lang": t["lang"],
            "q4": pa.array(score, pa.int64()),
        })

    scored = ds.map_batches(q4_t, batch_format="pyarrow").materialize()
    hist = driver_grouped_agg(scored, ["lang", "q4"],
                              {"c": ("q4", "count")})
    if len(hist) > 2_000_000:
        raise RuntimeError(
            "docs_quality_prune: score histogram exceeds the driver "
            "fold guard; switch the threshold to the two-pass "
            "histogram-refinement quantile machinery")
    thr = {}
    n_by_lang = {}
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("q4")
        n = int(g["c"].sum())
        n_by_lang[lang] = n
        k = (4 * n + 4) // 5  # ceil(0.8 n)
        cum = g["c"].cumsum()
        thr[lang] = int(g["q4"].to_numpy()[
            np.searchsorted(cum.to_numpy(), k)])

    def census(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_numpy(zero_copy_only=False)
        q4 = t["q4"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        tt = _lookup_int64(langs, thr)
        above = q4 > tt
        df = pd.DataFrame({
            "lang": langs, "above": above.astype(np.int64),
            "at": (q4 == tt).astype(np.int64),
            "x": np.where(above, did, 0),
        })
        g = df.groupby("lang").agg(
            n_above=("above", "sum"), n_at=("at", "sum"),
            id_xor=("x", lambda s: int(np.bitwise_xor.reduce(
                s.to_numpy(np.int64)))))
        return pa.table({
            "lang": pa.array(g.index.tolist(), pa.string()),
            "n_above": pa.array(g["n_above"].to_numpy(np.int64)),
            "n_at": pa.array(g["n_at"].to_numpy(np.int64)),
            "id_xor": pa.array(g["id_xor"].to_numpy(np.int64)),
        })

    parts = scored.map_batches(census,
                               batch_format="pyarrow").to_pandas()
    out = parts.groupby("lang", as_index=False).agg(
        n_above=("n_above", "sum"), n_at=("n_at", "sum"),
        id_xor=("id_xor", lambda s: int(np.bitwise_xor.reduce(
            s.to_numpy(np.int64)))))
    out["n"] = out["lang"].map(n_by_lang)
    out["thr_score"] = out["lang"].map(thr)
    out = out.sort_values("lang").reset_index(drop=True)
    for c in ("n", "thr_score", "n_above", "n_at", "id_xor"):
        out[c] = out[c].astype("int64")
    return out[["lang", "n", "thr_score", "n_above", "n_at",
                "id_xor"]]


SCHEMA_EVO_DIR = "/tmp/ocracle_schema_evo"


def q_pages_schema_evolution(sf_dir: str):
    """Schema-evolution-tolerant reading (sources.readers.evolve_to —
    the Delta/Iceberg mergeSchema rule): a crawl store whose schema
    grew across generations (gen0: url/ts/n_chars int32; gen1 adds
    lang; gen2 adds fetch_status and widens n_chars to int64) reads
    as ONE unified dataset — missing columns null-fill, compatible
    types widen, dropped columns vanish, incompatible casts raise
    loud. Census per generation: rows, nulls per late column, an
    n_chars sum (proving the int32→int64 widen) and an English
    count. Deterministic fixture store under /tmp (seeded rows, one
    parquet per generation).
    Oracle: DuckDB re-reads the SAME files with
    ``read_parquet(union_by_name=true, filename=true)`` — the
    reference implementation of by-name unification — and re-derives
    the census; engine and oracle must agree on every fill/widen."""
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray.data as rd

    from ..sources.pages import sf_of_dir
    from ..sources.readers import evolve_to

    n_per = max(50, min(500, int(5000 * sf_of_dir(sf_dir))))
    root = f"{SCHEMA_EVO_DIR}/current"
    shutil.rmtree(root, ignore_errors=True)
    langs = ["en", "de", "fr", "es", "zh"]
    for gen in range(3):
        rng = np.random.RandomState(70_000 + gen)
        n = n_per + gen * 7
        cols = {
            "url": pa.array(
                [f"https://g{gen}.example.com/p{i}" for i in range(n)],
                pa.string()),
            "warc_ts": pa.array(
                (1_700_000_000_000_000
                 + rng.randint(0, 10**9, n)).tolist(),
                pa.timestamp("us")),
        }
        if gen < 2:
            cols["n_chars"] = pa.array(
                rng.randint(10, 5000, n).astype(np.int32), pa.int32())
        else:
            cols["n_chars"] = pa.array(
                rng.randint(10, 5000, n).astype(np.int64), pa.int64())
        if gen >= 1:
            cols["lang"] = pa.array(
                [langs[i] for i in rng.randint(0, 5, n)], pa.string())
        if gen >= 2:
            cols["fetch_status"] = pa.array(
                rng.choice([200, 301, 404], n).astype(np.int64),
                pa.int64())
        d = os.path.join(root, f"gen={gen}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table(cols), os.path.join(d, "part.parquet"))

    target = pa.schema([
        ("gen", pa.int64()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("n_chars", pa.int64()),
        ("lang", pa.string()),
        ("fetch_status", pa.int64()),
    ])

    parts = []
    for gen in range(3):
        ds = rd.read_parquet(os.path.join(root, f"gen={gen}"))

        def tag(t: pa.Table, g=gen) -> pa.Table:
            # Ray hive-infers the gen= dir as a STRING partition
            # column; replace it with the typed generation id
            if "gen" in t.column_names:
                t = t.drop_columns(["gen"])
            return evolve_to(
                t.append_column(
                    "gen", pa.array([g] * t.num_rows, pa.int64())),
                target)

        parts.append(ds.map_batches(tag, batch_format="pyarrow"))
    unified = parts[0].union(*parts[1:])

    def census(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "gen": t["gen"].to_numpy(zero_copy_only=False),
            "lang_null": pc.is_null(t["lang"]).to_numpy(
                zero_copy_only=False).astype(np.int64),
            "status_null": pc.is_null(t["fetch_status"]).to_numpy(
                zero_copy_only=False).astype(np.int64),
            "nc": t["n_chars"].to_numpy(zero_copy_only=False),
            "en": pc.fill_null(pc.equal(t["lang"], pa.scalar("en")),
                               False).to_numpy(
                zero_copy_only=False).astype(np.int64),
        })
        g = df.groupby("gen").agg(
            n=("gen", "size"), n_lang_null=("lang_null", "sum"),
            n_status_null=("status_null", "sum"),
            sum_n_chars=("nc", "sum"), n_en=("en", "sum"))
        return pa.table({
            "gen": pa.array(g.index.to_numpy(np.int64)),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "n_lang_null": pa.array(g["n_lang_null"].to_numpy(np.int64)),
            "n_status_null": pa.array(
                g["n_status_null"].to_numpy(np.int64)),
            "sum_n_chars": pa.array(g["sum_n_chars"].to_numpy(np.int64)),
            "n_en": pa.array(g["n_en"].to_numpy(np.int64)),
        })

    parts_df = unified.map_batches(census,
                                   batch_format="pyarrow").to_pandas()
    out = parts_df.groupby("gen", as_index=False).sum()
    out = out.sort_values("gen").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def q_events_hourly_ivm(sf_dir: str):
    """Incremental view maintenance (the Materialize/Flink IVM
    algebra): the hourly revenue view is built from a 90% BASE slice
    and a 10% DELTA slice (deterministic Knuth-hash split — the
    docs_split rule, shared verbatim with SQL), aggregated
    INDEPENDENTLY and then merged by groupby-sum of the view partials
    — proving the aggregate is self-mergeable (the property IVM rests
    on: view ⊕ delta-view = view-of-union). The oracle recomputes the
    view from the full table in one pass; engine merge ≡ oracle
    recompute is exactly the IVM correctness statement. Integer
    cents; per-slice aggregation via bounded driver-folded combiners
    (hour × type domain), merge associative."""
    from ..stages.watermark import knuth_arrival

    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type",
                                  "value"])

    def keyed(t: pa.Table) -> pa.Table:
        eid = t["event_id"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        part = (knuth_arrival(eid) % 10 == 0).astype(np.int64)
        hour = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                // 3_600_000_000)
        v = t["value"].to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        return pa.table({
            "part": pa.array(part, pa.int64()),
            "hour": pa.array(hour, pa.int64()),
            "event_type": t["event_type"],
            "cents": pa.array(cents, pa.int64()),
        })

    k = ds.map_batches(keyed, batch_format="pyarrow").materialize()
    views = []
    for p in (0, 1):
        s = pa.scalar(p, pa.int64())
        part_ds = k.map_batches(
            lambda t, s=s: t.filter(pc.equal(t["part"], s)),
            batch_format="pyarrow")
        views.append(driver_grouped_agg(
            part_ds, ["hour", "event_type"],
            {"n": ("cents", "count"), "cents": ("cents", "sum")}))
    merged = pd.concat(views, ignore_index=True).groupby(
        ["hour", "event_type"], as_index=False).sum()
    out = merged.sort_values(["hour", "event_type"]) \
        .reset_index(drop=True)
    for c in ("hour", "n", "cents"):
        out[c] = out[c].astype("int64")
    return out[["hour", "event_type", "n", "cents"]]


def q_docs_global_index(sf_dir: str):
    """Global contiguous index assignment (zipWithIndex) — the
    distributed primitive behind deterministic epoch ordering and
    record addressing: every doc gets a gap-free int64 position in
    the Knuth-hash shuffle order ((h, doc_id) — a total order, so
    the assignment is unique), via the global prefix-scan primitive
    with unit weights (one sort + materialized block boundaries +
    an O(blocks) offset carry — no per-row driver work, the
    watermark/Pareto machinery reused verbatim). Output is the full
    (doc_id, gidx) mapping; the oracle is row_number() over the same
    order."""
    from ..stages.prefix import global_prefix_sum
    from ..stages.watermark import knuth_arrival

    ds = _read(sf_dir, "documents", ["doc_id"])

    def keyed(t: pa.Table) -> pa.Table:
        d = t["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(d),
            "h": pa.array(knuth_arrival(d).astype(np.int64)),
            "one": pa.array(np.ones(len(d), np.int64)),
        })

    scanned, total = global_prefix_sum(
        ds.map_batches(keyed, batch_format="pyarrow"),
        order_cols=[("h", "ascending"), ("doc_id", "ascending")],
        val_col="one", out_col="cum")

    def emit(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "gidx": pa.array(
                t["cum"].to_numpy(zero_copy_only=False) - 1,
                pa.int64()),
        })

    if total > 2_000_000:
        raise RuntimeError(
            f"docs_global_index: {total} rows — return the mapping "
            f"as written parquet (write_parquet the emit stage) "
            f"instead of a driver DataFrame")
    out = scanned.map_batches(emit, batch_format="pyarrow") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(out) == total and out["gidx"].max() == total - 1
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def q_referential_audit(sf_dir: str):
    """Warehouse-wide referential-integrity audit — the
    expectations suite's FK check generalized to every relation in
    the star schema: orphan counts for lineitem→orders,
    lineitem→part, lineitem→supplier, orders→customer,
    customer→nation, nation→region. Dimension key sets broadcast
    (ray.put + cached_get, loud-guarded at the supplier precedent's
    limit); each fact side is ONE zero-exchange pc.is_in pass
    emitting per-batch (checked, orphans) partials. All clean at
    every sf BY CONSTRUCTION of the generator — the audit proves it
    rather than assuming it (the FAIL path is pinned by
    events_expectations' planted-violation machinery)."""
    import ray

    rels = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    rows = []
    for fact, fk, dim, pk in rels:
        keys = pd.read_parquet(_p(sf_dir, dim), columns=[pk])[pk] \
            .to_numpy(np.int64)
        if len(keys) > 20_000_000:
            raise RuntimeError(
                f"referential_audit: {dim} too large to broadcast — "
                f"switch this relation to the anti-join machinery")
        ref = ray.put(pa.array(np.unique(keys), pa.int64()))
        ds = _read(sf_dir, fact, [fk])

        def probe(t: pa.Table, ref=ref, fk=fk) -> pa.Table:
            vs = _cached_broadcast(ref)
            ok = pc.is_in(pc.cast(t[fk], pa.int64()), value_set=vs)
            n = t.num_rows
            orph = n - pc.sum(pc.cast(ok, pa.int64())).as_py()
            return pa.table({"n": pa.array([n], pa.int64()),
                             "orphans": pa.array([orph], pa.int64())})

        parts = ds.map_batches(probe, batch_format="pyarrow") \
            .to_pandas()
        rows.append({
            "relation": f"{fact}.{fk}->{dim}.{pk}",
            "n_rows": int(parts["n"].sum()),
            "n_orphans": int(parts["orphans"].sum()),
        })
    out = pd.DataFrame(rows).sort_values("relation") \
        .reset_index(drop=True)
    for c in ("n_rows", "n_orphans"):
        out[c] = out[c].astype("int64")
    return out


URLFILTER_ORACLE_DIR = "/tmp/ocracle_urlfilter_oracle"


def q_pages_url_filter(sf_dir: str):
    """Robots-style URL gating — the crawl-scope filter in front of
    every fetch/extract stage: a declared disallow list (one rule per
    matcher kind — prefix, substring, suffix) applied with FIRST-
    MATCHING-RULE attribution in fixed order (the filter-funnel
    trick), so per-outcome counts PARTITION the page rows exactly.
    Vectorized Arrow matchers (starts_with / match_substring /
    ends_with); census = per-outcome row count + XOR of the trailing
    doc numbers (membership pinned).
    STRONG artifact oracle: the raw url rows are written; SQL
    re-derives every rule match, the attribution order, the doc-
    number extraction and the census — only written-equals-read is
    trusted."""
    import shutil

    from ..sources.pages import generate_pages_dataset, n_docs_for_sf, \
        sf_of_dir

    n = min(1000, n_docs_for_sf(sf_of_dir(sf_dir)))
    pages = generate_pages_dataset(n)

    urls = pages.map_batches(
        lambda t: pa.table({"url": pc.cast(t["url"], pa.string())}),
        batch_format="pyarrow").materialize()
    out_dir = f"{URLFILTER_ORACLE_DIR}/current"
    shutil.rmtree(out_dir, ignore_errors=True)
    urls.write_parquet(out_dir)

    def census(t: pa.Table) -> pa.Table:
        u = t["url"]
        doc = pc.struct_field(
            pc.extract_regex(u, r"doc(?P<d>\d+)$"), "d")
        docn = np.array([int(x) for x in doc.to_pylist()], np.int64)
        m1 = pc.starts_with(
            u, "https://exam.example/TMA").to_numpy(
                zero_copy_only=False)
        m2 = pc.match_substring(u, "/V23/").to_numpy(
            zero_copy_only=False)
        m3 = pc.ends_with(u, "0").to_numpy(zero_copy_only=False)
        outcome = np.select(
            [m1, m2, m3],
            ["deny_prefix_tma", "deny_contains_v23", "deny_suffix_0"],
            "allowed")
        df = pd.DataFrame({"outcome": outcome, "d": docn})
        g = df.groupby("outcome").agg(
            n=("d", "size"),
            doc_xor=("d", lambda s: int(np.bitwise_xor.reduce(
                s.to_numpy(np.int64)))))
        return pa.table({
            "outcome": pa.array(g.index.tolist(), pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "doc_xor": pa.array(g["doc_xor"].to_numpy(np.int64)),
        })

    parts = urls.map_batches(census, batch_format="pyarrow").to_pandas()
    out = parts.groupby("outcome", as_index=False).agg(
        n=("n", "sum"),
        doc_xor=("doc_xor", lambda s: int(np.bitwise_xor.reduce(
            s.to_numpy(np.int64)))))
    out = out.sort_values("outcome").reset_index(drop=True)
    for c in ("n", "doc_xor"):
        out[c] = out[c].astype("int64")
    return out


AUG_DROP_PCT = 10


def q_docs_augmentation(sf_dir: str):
    """Deterministic data augmentation (EDA-style token dropout) —
    the training-data expansion pass, with the randomness replaced by
    the repo's seeded-hash discipline: token at position i of doc d
    drops iff ((d·1000003 + i) % 2^31 · 2654435761) % 2^32 % 100 <
    10 (the docs_split Knuth rule over a mixed key), so the
    augmented corpus is reproducible byte-for-byte across runs,
    engines and the oracle. Tokenization is the shared BM25/dsir
    lowercase [a-z0-9]+ rule. Census per lang: docs, tokens in/kept,
    drop ppm, and the XOR of per-doc FNV-1a fingerprints of the
    REBUILT augmented text — so the oracle pins the exact output
    strings, not just counts. One streaming pass, zero shuffle;
    fully SQL-re-derived (tokens, hash rule, kept set, string_agg
    rebuild, FNV via list_reduce — no artifact)."""
    from ..core.textstats import fnv1a64

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def aug(t: pa.Table) -> pa.Table:
        rows = {"lang": [], "n_docs": [], "tokens_in": [],
                "tokens_kept": [], "fp_xor": []}
        acc: dict[str, list[int]] = {}
        for did, lang, text in zip(t["doc_id"].to_pylist(),
                                   t["lang"].to_pylist(),
                                   t["text"].to_pylist()):
            toks = [w for w in __import__("re").split(
                r"[^a-z0-9]+", text.lower()) if w]
            if not toks:
                continue
            pos = np.arange(len(toks), dtype=np.int64)
            h = (((did * 1_000_003 + pos) % 2**31)
                 * 2654435761) % 2**32 % 100
            keep = h >= AUG_DROP_PCT
            kept = [w for w, k in zip(toks, keep) if k]
            a = acc.setdefault(lang, [0, 0, 0, 0])
            a[0] += 1
            a[1] += len(toks)
            a[2] += len(kept)
            if kept:
                fp = fnv1a64(" ".join(kept).encode())
                a[3] ^= int(np.uint64(fp).astype(np.int64))
        for lang, a in acc.items():
            rows["lang"].append(lang)
            rows["n_docs"].append(a[0])
            rows["tokens_in"].append(a[1])
            rows["tokens_kept"].append(a[2])
            rows["fp_xor"].append(a[3])
        return pa.table({
            "lang": pa.array(rows["lang"], pa.string()),
            "n_docs": pa.array(rows["n_docs"], pa.int64()),
            "tokens_in": pa.array(rows["tokens_in"], pa.int64()),
            "tokens_kept": pa.array(rows["tokens_kept"], pa.int64()),
            "fp_xor": pa.array(rows["fp_xor"], pa.int64()),
        })

    parts = ds.map_batches(aug, batch_format="pyarrow").to_pandas()
    out = parts.groupby("lang", as_index=False).agg(
        n_docs=("n_docs", "sum"), tokens_in=("tokens_in", "sum"),
        tokens_kept=("tokens_kept", "sum"),
        fp_xor=("fp_xor", lambda s: int(np.bitwise_xor.reduce(
            s.to_numpy(np.int64)))))
    out["drop_ppm"] = ((out["tokens_in"] - out["tokens_kept"])
                       * 1_000_000 // out["tokens_in"])
    out = out.sort_values("lang").reset_index(drop=True)
    for c in ("n_docs", "tokens_in", "tokens_kept", "drop_ppm",
              "fp_xor"):
        out[c] = out[c].astype("int64")
    return out[["lang", "n_docs", "tokens_in", "tokens_kept",
                "drop_ppm", "fp_xor"]]


NEG_N_ANCHORS = 20
NEG_K = 5


def q_emb_hard_negatives(sf_dir: str):
    """Hard negative mining — the contrastive-training-data op
    (DPR/SimCSE batch construction): for each anchor, the K closest
    vectors BELOW the positive threshold (cosine < 0.3, the
    similarity-graph rule) — similar-but-not-positive examples, the
    ones that actually train the margin. Deterministic end to end:
    cosine rounds to 6 then scales to integer micro-units, ranking
    is (cos_us DESC, vec_id ASC) — no float tie ambiguity. Anchors =
    the NEG_N_ANCHORS lowest vec_ids. Round 5 inverted the broadcast
    (the knn_bruteforce shape): the 20 tiny ANCHORS are the broadcast
    side (ray.put once, cached per worker) and the corpus STREAMS
    through map_batches, each batch emitting its local top-K per
    anchor; the driver folds ≤ anchors × K × blocks candidate rows —
    the corpus is never gathered or broadcast, so the r3/r4
    200k-vector guard is gone. Output: (anchor, rank, neg_id,
    cos_us) rows; the oracle re-derives every candidate, the
    threshold mask and the row_number pick."""
    import ray

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    # anchors = global NEG_N_ANCHORS lowest vec_ids: per-batch
    # bottom-k partials folded on the driver (≤ k × blocks rows)
    small = ds.map_batches(
        lambda t: _topk_batch(t, [("vec_id", "ascending")],
                              NEG_N_ANCHORS),
        batch_format="pyarrow",
    ).to_pandas().sort_values("vec_id").head(NEG_N_ANCHORS)
    a_ids = small["vec_id"].to_numpy(np.int64)
    av = np.stack([np.asarray(v, np.float64)
                   for v in small["embedding"]])
    av = av / np.linalg.norm(av, axis=1, keepdims=True)
    ref = ray.put((a_ids, av))

    def mine(t: pa.Table) -> pa.Table:
        anchor_ids, am = _cached_broadcast(ref)
        c_ids = t["vec_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cv = np.stack([np.asarray(v, np.float64)
                       for v in t["embedding"].to_pylist()])
        cv = cv / np.linalg.norm(cv, axis=1, keepdims=True)
        order = np.argsort(c_ids)
        c_ids, cv = c_ids[order], cv[order]
        cos_us = np.rint(np.round(am @ cv.T, 6) * 1_000_000) \
            .astype(np.int64)
        out = {"anchor": [], "neg_id": [], "cos_us": []}
        for r, aid in enumerate(anchor_ids):
            row = cos_us[r]
            mask = (row < 300_000) & (c_ids != aid)
            cand = np.nonzero(mask)[0]
            pick = cand[np.lexsort((c_ids[cand], -row[cand]))][:NEG_K]
            out["anchor"].extend([int(aid)] * len(pick))
            out["neg_id"].extend(c_ids[pick].tolist())
            out["cos_us"].extend(row[pick].tolist())
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in out.items()})

    res = ds.map_batches(mine, batch_format="pyarrow").to_pandas()
    # global fold: per anchor, top-K of the per-batch partials under
    # the same (cos_us DESC, neg_id ASC) rule
    res = res.sort_values(["anchor", "cos_us", "neg_id"],
                          ascending=[True, False, True])
    res = res.groupby("anchor", as_index=False).head(NEG_K)
    res["rank"] = res.groupby("anchor").cumcount() + 1
    out = res[["anchor", "rank", "neg_id", "cos_us"]] \
        .sort_values(["anchor", "rank"]).reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _varint_bytes(u: np.ndarray) -> np.ndarray:
    """LEB128 size of unsigned int64 values: 1 + Σ_{k=1..9} [u ≥ 128^k]
    — the closed form shared digit-for-digit with the SQL oracle.
    Thresholds are built with uint64 SHIFTS: ``np.uint64(128) ** 9``
    promotes to float64, whose 52-bit mantissa rounds the last 1024
    integers below 2^63 UP across the boundary — the property sweep
    caught the off-by-one at exactly 2^63 − 1."""
    size = np.ones(len(u), np.int64)
    for k in range(1, 10):
        size += (u >= (np.uint64(1) << np.uint64(7 * k))) \
            .astype(np.int64)
    return size


def q_events_storage_advisor(sf_dir: str):
    """Columnar storage advisor — the encoding-selection probe a
    table-format optimizer runs: estimated bytes per column under
    delta + zigzag + LEB128 varint in event_id order, vs raw 8-byte
    ints. Exact integer arithmetic end to end (delta in int64 with
    wraparound-safe uint64 zigzag, the varint size a closed-form
    comparison ladder). Shape: ONE global sort by event_id, then
    per-block partial sums with an O(blocks) boundary carry (each
    block's first delta needs the previous block's last value — the
    watermark/prefix boundary-fold pattern; blocks of a materialized
    sorted Dataset iterate in order). Measured at sf0.01: event_id
    deltas hit the 1-byte floor (8.0×), value_cents ≈ 2.2 bytes
    (3.7×), ts_us ≈ 4.6 bytes (1.7× — event_id order is NOT time
    order in this corpus, so timestamp deltas jump) — exactly the
    per-column decision the advisor exists to surface."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "value"])

    def keyed(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": t["event_id"].cast(pa.int64()),
            "ts_us": t["ts"].cast(pa.int64()),
            "value_cents": pa.array(
                (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5))
                .astype(np.int64), pa.int64()),
        })

    s = ds.map_batches(keyed, batch_format="pyarrow") \
        .sort("event_id").materialize()
    cols = ["event_id", "ts_us", "value_cents"]

    def zz(d: np.ndarray) -> np.ndarray:
        # standard zigzag: (d << 1) ^ (d >> 63) in uint64 space —
        # equals 2d for d ≥ 0, -2d-1 for d < 0 (the SQL form)
        return (d.astype(np.uint64) << np.uint64(1)) \
            ^ (d >> 63).astype(np.uint64)

    def block_partial(t: pa.Table) -> pa.Table:
        # one partial row per BLOCK (batch_size=None): in-block varint
        # sums with the block's first delta EXCLUDED (it needs the
        # previous block's last value — the driver boundary fold adds
        # it), plus the per-column first/last boundary values
        if t.num_rows == 0:
            return pa.table({
                "first_key": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                **{f"{c}_{k}": pa.array([], pa.int64())
                   for c in cols for k in ("sum", "first", "last")},
            })
        row = {"first_key": [int(t["event_id"][0].as_py())],
               "n": [t.num_rows]}
        for c in cols:
            v = t[c].to_numpy(zero_copy_only=False).astype(np.int64)
            d = v[1:] - v[:-1]
            row[f"{c}_sum"] = [int(_varint_bytes(zz(d)).sum())]
            row[f"{c}_first"] = [int(v[0])]
            row[f"{c}_last"] = [int(v[-1])]
        return pa.table({k: pa.array(vv, pa.int64())
                         for k, vv in row.items()})

    parts = s.map_batches(block_partial, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    parts = parts.sort_values("first_key")  # global key order ⇒
    n = int(parts["n"].sum())               # block order
    rows = []
    for c in cols:
        total = int(parts[f"{c}_sum"].sum())
        firsts = parts[f"{c}_first"].to_numpy(np.int64)
        lasts = parts[f"{c}_last"].to_numpy(np.int64)
        prev = np.concatenate([[0], lasts[:-1]])  # first delta vs 0
        total += int(_varint_bytes(zz(firsts - prev)).sum())
        rows.append({"column": c, "n": n, "raw_bytes": 8 * n,
                     "varint_bytes": total,
                     "ratio_ppm": total * 1_000_000 // (8 * n)})
    out = pd.DataFrame(rows).sort_values("column").reset_index(
        drop=True)
    for c in ("n", "raw_bytes", "varint_bytes", "ratio_ppm"):
        out[c] = out[c].astype("int64")
    return out


def q_customer_record_linkage(sf_dir: str):
    """Probabilistic record linkage (stages.linkage — Fellegi–Sunter
    1969): the entity-resolution op beside the ed-1 fuzzy join — a
    deterministically-dirtied registry twin of the customer table
    (every custkey % 3 != 2 record re-enters; % 3 == 0 names get one
    mid-digit typo) is linked back by blocked multi-field scoring:
    sorted-neighborhood blocks (nation × custkey//1000 ordinal
    bucket, ONE groupby exchange), per-block vectorized comparison
    (codepoint Levenshtein DP across the pair axis, market-segment
    equality, $2000 truncating acctbal bands), declared integer
    agreement weights, match/possible/non-match thresholds. Only the
    per-class census partial leaves each block (class, n, score_sum,
    XOR of a·1000003+b pair keys — membership pinned, pairs never
    ride the wire). The oracle re-derives the dirty side, every
    block, every levenshtein, every score and the census in SQL."""
    from ..stages.linkage import record_linkage

    ds = _read(sf_dir, "customer",
               ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                "c_mktsegment"])
    return record_linkage(ds)


def q_docs_containment_join(sf_dir: str):
    """Exact containment self-join (stages.setsim.containment_join):
    ordered pairs where ≥80% of doc a's word-3-gram set lies inside
    doc b's — the template/wrapper detector symmetric Jaccard hides
    when the container is much larger. Probe-prefix × full-index
    shape (the index side posts every token — the documented cost of
    an asymmetric predicate), one groupby(rank) exchange, the one
    valid length filter (|Sb| ≥ τ|Sa|), zero-exchange broadcast-map
    verify. Integer-ppm end to end; the oracle re-derives the FULL
    ordered pair set by brute force."""
    from ..stages.setsim import containment_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return containment_join(ds)


def q_docs_char_entropy(sf_dir: str):
    """Character-entropy quality gate (stages.entropy): per-doc
    Shannon codepoint entropy — the exact core of the zlib
    compression-ratio corpus filter — aggregated per lang in INTEGER
    micro-nats (one documented half-away rounding point, so both
    aggregate columns match the DuckDB oracle by integer equality).
    One streaming pass, zero shuffle; the kernel is one np.unique over
    packed (doc, codepoint) keys per batch."""
    from ..stages.entropy import char_entropy_by_lang

    ds = _read(sf_dir, "documents", ["lang", "text"])
    return char_entropy_by_lang(ds)


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "order_priority_count": q_order_priority_count,
    "mktsegment_revenue": q_mktsegment_revenue,
    "nation_region_counts": q_nation_region_counts,
    "top_orders_by_revenue": q_top_orders_by_revenue,
    "revenue_forecast": q_revenue_forecast,
    "supplier_positive_acctbal": q_supplier_positive_acctbal,
    "part_brand_stats": q_part_brand_stats,
    "events_hourly": q_events_hourly,
    "events_user_totals": q_events_user_totals,
    "events_sessions": q_events_sessions,
    "events_value_quantiles": q_events_value_quantiles,
    "events_value_histogram": q_events_value_histogram,
    "events_sliding_1h": q_events_sliding_1h,
    "events_running_sum": q_events_running_sum,
    "events_argmax": q_events_argmax,
    "docs_exact_dedup": q_docs_exact_dedup,
    "docs_dup_count": q_docs_dup_count,
    "docs_token_stats": q_docs_token_stats,
    "docs_quality": q_docs_quality,
    "docs_bm25_topk": q_docs_bm25_topk,
    "docs_perplexity": q_docs_perplexity,
    "docs_repetition": q_docs_repetition,
    "docs_filter_funnel": q_docs_filter_funnel,
    "docs_decontaminate": q_docs_decontaminate,
    "docs_substring_dedup": q_docs_substring_dedup,
    "docs_source_mixture": q_docs_source_mixture,
    "docs_nb_classifier": q_docs_nb_classifier,
    "docs_chunking": q_docs_chunking,
    "docs_split": q_docs_split,
    "docs_seq_packing": q_docs_seq_packing,
    "docs_profile": q_docs_profile,
    "events_outliers": q_events_outliers,
    "docs_top_terms": q_docs_top_terms,
    "docs_bpe_encode": q_docs_bpe_encode,
    "events_rollup": q_events_rollup,
    "events_distinct_hll": q_events_distinct_hll,
    "docs_search_index": q_docs_search_index,
    "docs_bpe_merges": q_docs_bpe_merges,
    "events_conversion_funnel": q_events_conversion_funnel,
    "emb_semantic_dedup": q_emb_semantic_dedup,
    "docs_langid": q_docs_langid,
    "docs_winnowing": q_docs_winnowing,
    "docs_wildcard_sources": q_docs_wildcard_sources,
    "docs_samples": q_docs_samples,
    "docs_numeric_sort": q_docs_numeric_sort,
    "knn_bruteforce": q_knn_bruteforce,
    # artifact-oracled r4: full probe asserted == brute force in-query;
    # partial probe re-executed in SQL over the written cell map
    "knn_ivf": q_knn_ivf,
    "events_heavy_hitters": q_events_heavy_hitters,
    "embeddings_label_stats": q_embeddings_label_stats,
    "orders_lineitem_revenue": q_orders_lineitem_revenue,
    "customers_without_big_orders": q_customers_without_big_orders,
    "parts_in_lineitem": q_parts_in_lineitem,
    "events_asof_prev_click": q_events_asof_prev_click,
    "events_props_k": q_events_props_k,
    # merged: union_distinct_keys + events_distinct_users_kmv (one row,
    # both values driver-hashed) — freed the slot for the range join
    "distinct_counts": q_distinct_counts,
    "events_range_join_views": q_events_range_join_views,
    "top_users_per_event_type": q_top_users_per_event_type,
    "docs_ngram_neardup": q_docs_ngram_neardup,
    "docs_minhash_neardup": q_docs_minhash_neardup,
    "docs_incremental_neardup": q_docs_incremental_neardup,
    "docs_simhash_dups": q_docs_simhash_dups,
    "docs_neardup_clusters": q_docs_neardup_clusters,
    "emb_label_neardup": q_emb_label_neardup,
    "extract_flagship": q_extract_flagship,
    # artifact-oracled r4 (flagship pattern): fixtures are synthesized,
    # so each query writes its per-row artifact and DuckDB re-derives
    # the aggregate/consumer semantics from the files independently
    "pages_census": q_pages_census,
    "figure_pixel_crops": q_figure_pixel_crops,
    "pdf_branch": q_pdf_branch,
    "media_features": q_media_features,
    "webview_tasks": q_webview_tasks,
    "salted_events_value": q_salted_events_value,
    # session-4 additions, in priority order (after all earlier
    # round-4 entries — the registry-order insurance note below)
    "events_pivot": q_events_pivot,
    "docs_textrank": q_docs_textrank,
    "events_quantile_sketch": q_events_quantile_sketch,
    "pages_snapshot_delta": q_pages_snapshot_delta,
    "pages_boilerplate": q_pages_boilerplate,
    "orders_basket_rank": q_orders_basket_rank,
    "docs_collocations": q_docs_collocations,
    "events_transitions": q_events_transitions,
    "events_user_cms": q_events_user_cms,
    "pages_url_simjoin": q_pages_url_simjoin,
    "events_timerange_pruned": q_events_timerange_pruned,
    "events_box_pruned": q_events_box_pruned,
    "emb_kmeans": q_emb_kmeans,
    "events_value_mad": q_events_value_mad,
    "events_retention": q_events_retention,
    "docs_dsir": q_docs_dsir,
    "local_supplier_revenue": q_local_supplier_revenue,
    "emb_pq": q_emb_pq,
    "events_watermark_late": q_events_watermark_late,
    "emb_pq_search": q_emb_pq_search,
    "docs_cdc_chunks": q_docs_cdc_chunks,
    "parts_pareto": q_parts_pareto,
    "docs_blocklist": q_docs_blocklist,
    "events_streaks": q_events_streaks,
    "knn_ivfpq": q_knn_ivfpq,
    "supplier_part_division": q_supplier_part_division,
    "emb_outliers": q_emb_outliers,
    "orders_monthly_growth": q_orders_monthly_growth,
    "events_dau_wau": q_events_dau_wau,
    "parts_skyline": q_parts_skyline,
    "events_value_corr": q_events_value_corr,
    "orders_brand_affinity": q_orders_brand_affinity,
    "customer_rfm": q_customer_rfm,
    "events_dau_wau_hll": q_events_dau_wau_hll,
    "emb_similarity_triangles": q_emb_similarity_triangles,
    "docs_weighted_sample": q_docs_weighted_sample,
    "events_join_size_cms": q_events_join_size_cms,
    "events_autocorr": q_events_autocorr,
    "events_user_gini": q_events_user_gini,
    "events_type_drift": q_events_type_drift,
    "events_decayed_revenue": q_events_decayed_revenue,
    "pages_time_travel": q_pages_time_travel,
    "events_audience_bitmap": q_events_audience_bitmap,
    "events_audience_churn": q_events_audience_churn,
    "docs_phrase_search": q_docs_phrase_search,
    "events_audience_overlap_hll": q_events_audience_overlap_hll,
    "events_funnel_delay": q_events_funnel_delay,
    "emb_graph_bfs": q_emb_graph_bfs,
    "events_ab_test": q_events_ab_test,
    "events_cube": q_events_cube,
    "docs_greedy_cover": q_docs_greedy_cover,
    "events_trimmed_mean": q_events_trimmed_mean,
    "events_value_emd": q_events_value_emd,
    "orders_benford": q_orders_benford,
    "events_value_mode": q_events_value_mode,
    "events_top_trigrams": q_events_top_trigrams,
    "events_hhi": q_events_hhi,
    "events_burstiness": q_events_burstiness,
    "docs_merkle_manifest": q_docs_merkle_manifest,
    "events_interval_overlap": q_events_interval_overlap,
    "emb_kcenter": q_emb_kcenter,
    "events_entropy_rate": q_events_entropy_rate,
    "events_zorder_layout": q_events_zorder_layout,
    "emb_label_propagation": q_emb_label_propagation,
    "docs_zipf_slope": q_docs_zipf_slope,
    "docs_heaps_law": q_docs_heaps_law,
    "docs_hybrid_rrf": q_docs_hybrid_rrf,
    "events_value_auc": q_events_value_auc,
    "docs_perplexity_pruned": q_docs_perplexity_pruned,
    "events_spearman": q_events_spearman,
    "events_cusum": q_events_cusum,
    "docs_ndcg": q_docs_ndcg,
    "customer_fuzzy_join": q_customer_fuzzy_join,
    "docs_char_entropy": q_docs_char_entropy,
    "docs_setsim_join": q_docs_setsim_join,
    "orders_hits": q_orders_hits,
    "events_attribution": q_events_attribution,
    "docs_canonical": q_docs_canonical,
    "events_expectations": q_events_expectations,
    "customer_k_anonymity": q_customer_k_anonymity,
    "docs_incremental_exact": q_docs_incremental_exact,
    "orders_ppr": q_orders_ppr,
    "orders_cohort_ltv": q_orders_cohort_ltv,
    "docs_containment_join": q_docs_containment_join,
    "media_phash_dedup": q_media_phash_dedup,
    "media_audio_fingerprint": q_media_audio_fingerprint,
    "media_video_neardup": q_media_video_neardup,
    "emb_kcore": q_emb_kcore,
    "customer_record_linkage": q_customer_record_linkage,
    "customer_l_diversity": q_customer_l_diversity,
    "emb_pca_power": q_emb_pca_power,
    "pages_link_census": q_pages_link_census,
    "supplier_sole_late": q_supplier_sole_late,
    "emb_feature_profile": q_emb_feature_profile,
    "emb_silhouette": q_emb_silhouette,
    "emb_mutual_nn": q_emb_mutual_nn,
    "events_anomaly_mad": q_events_anomaly_mad,
    "docs_minhash_calibration": q_docs_minhash_calibration,
    "docs_quality_prune": q_docs_quality_prune,
    "pages_schema_evolution": q_pages_schema_evolution,
    "events_hourly_ivm": q_events_hourly_ivm,
    "docs_global_index": q_docs_global_index,
    "referential_audit": q_referential_audit,
    "pages_url_filter": q_pages_url_filter,
    "docs_augmentation": q_docs_augmentation,
    "emb_hard_negatives": q_emb_hard_negatives,
    "events_storage_advisor": q_events_storage_advisor,
    "lineitem_bloom_join": q_lineitem_bloom_join,
    "pages_urlnorm_dedup": q_pages_urlnorm_dedup,
    "pages_robots_txt": q_pages_robots_txt,
    "pages_redirects": q_pages_redirects,
    "events_daily_quantiles": q_events_daily_quantiles,
    "orders_open_concurrency": q_orders_open_concurrency,
    "events_dict_advisor": q_events_dict_advisor,
}

# Registry ORDER rotation: the driver verifies only the first ~50
# entries in insertion order, so each round the head is rotated to
# sample entries that have never had an independent driver check
# (VERDICT r4 "Next round" #1). Round-5 head = extract_flagship + the
# dedup/near-dup family (the always-on anchors) + ~40 entries drawn
# from the pool that rounds 3-4 never surfaced to the driver
# (perplexity, funnel, substring dedup, packing, PQ/IVF-PQ, semdedup,
# watermark, robots, attribution, the similarity-graph family, ...).
# Every entry regardless of position is oracle-checked in pytest
# (tests/test_queries_oracle.py parametrizes over ALL of them at
# sf0.001). Rounds verified by the driver so far: r3/r4 = _R3_ORDER
# below (kept for the record), r5 = _R5_HEAD.
_R3_ORDER = [
    "pricing_summary", "order_priority_count", "mktsegment_revenue",
    "nation_region_counts", "top_orders_by_revenue", "revenue_forecast",
    "supplier_positive_acctbal", "part_brand_stats", "events_hourly",
    "events_user_totals", "events_sessions", "events_value_quantiles",
    "events_value_histogram", "events_sliding_1h", "events_running_sum",
    "events_argmax", "docs_exact_dedup", "docs_dup_count",
    "docs_token_stats", "docs_quality", "docs_langid", "docs_winnowing",
    "docs_wildcard_sources", "docs_samples", "docs_numeric_sort",
    "knn_bruteforce", "knn_ivf", "events_heavy_hitters",
    "embeddings_label_stats", "orders_lineitem_revenue",
    "customers_without_big_orders", "parts_in_lineitem",
    "events_asof_prev_click", "events_props_k", "distinct_counts",
    "events_range_join_views", "top_users_per_event_type",
    "docs_ngram_neardup", "docs_minhash_neardup",
    "docs_incremental_neardup", "docs_simhash_dups",
    "docs_neardup_clusters", "emb_label_neardup", "extract_flagship",
    "pages_census", "figure_pixel_crops", "pdf_branch", "media_features",
    "webview_tasks", "salted_events_value",
]
_R5_HEAD = [
    # anchors (driver-green in r4, kept every round)
    "extract_flagship", "docs_exact_dedup", "docs_dup_count",
    "docs_ngram_neardup", "docs_minhash_neardup",
    "docs_incremental_neardup", "docs_simhash_dups",
    "docs_neardup_clusters", "emb_label_neardup",
    # never-driver-checked pool (41 entries)
    "docs_perplexity", "docs_filter_funnel", "docs_substring_dedup",
    "docs_seq_packing", "emb_semantic_dedup", "emb_pq", "emb_pq_search",
    "knn_ivfpq", "events_watermark_late", "pages_robots_txt",
    "events_attribution", "docs_repetition", "docs_decontaminate",
    "docs_source_mixture", "docs_nb_classifier", "docs_chunking",
    "docs_split", "docs_bm25_topk", "docs_bpe_merges", "docs_bpe_encode",
    "events_conversion_funnel", "events_distinct_hll", "events_user_cms",
    "events_quantile_sketch", "pages_snapshot_delta", "pages_boilerplate",
    "pages_url_simjoin", "pages_urlnorm_dedup", "pages_redirects",
    "pages_link_census", "emb_kmeans", "emb_kcore",
    "emb_similarity_triangles", "emb_graph_bfs", "emb_label_propagation",
    "emb_mutual_nn", "docs_dsir", "docs_blocklist", "docs_cdc_chunks",
    "media_phash_dedup", "media_audio_fingerprint",
]
QUERIES = {
    **{k: QUERIES[k] for k in _R5_HEAD},
    **{k: v for k, v in QUERIES.items() if k not in set(_R5_HEAD)},
}

_SHINGLE_JACCARD_SQL = """
    WITH words AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
      FROM documents
    ), shingles AS (
      -- docs with <3 words contribute their whole text as one shingle,
      -- mirroring core.dedup.word_shingles' short-doc rule
      SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
          FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
          WHERE len(ws) >= 3
          UNION ALL
          SELECT doc_id, array_to_string(ws, ' ') AS sh
          FROM words WHERE len(ws) BETWEEN 1 AND 2
      )
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id
    ), inter AS (
      SELECT s1.doc_id AS a, s2.doc_id AS b, count(*) AS c
      FROM shingles s1 JOIN shingles s2 ON s1.sh = s2.sh AND s1.doc_id < s2.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b, round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
    WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8
"""

_TNORM = "regexp_replace(lower(text), '\\s+', ' ', 'g')"


def _langid_oracle_sql() -> str:
    """DuckDB mirror of ``core.textstats.detect_lang`` (sample 2000
    chars → CJK-ratio shortcut → stopword-hit argmax with table-order
    tiebreak → 'und'), generated from the SAME stopword tables so the
    two sides cannot drift."""
    from ..core.textstats import _STOPWORDS

    values = ",\n              ".join(
        f"('{lang}', {i}, '{w}')"
        for i, (lang, table) in enumerate(_STOPWORDS)
        for w in sorted(table)
    )
    return f"""
    WITH sample AS (
      SELECT doc_id, lang, substr(coalesce(text, ''), 1, 2000) AS s FROM documents
    ), cjk AS (
      SELECT doc_id, lang, s, length(s) AS n,
             length(regexp_replace(s, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) AS n_cjk
      FROM sample
    ), words AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(s), '\\s+'),
                                x -> x != '')) AS w
      FROM cjk WHERE s != '' AND NOT (10 * n_cjk >= n)
    ), hits AS (
      SELECT doc_id, sw.lang_code, sw.ord, count(*) AS h
      FROM words
      JOIN (VALUES {values}) sw(lang_code, ord, word) ON words.w = sw.word
      GROUP BY doc_id, sw.lang_code, sw.ord
    ), best AS (
      SELECT doc_id, lang_code AS pred FROM (
        SELECT doc_id, lang_code,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY h DESC, ord ASC) AS rn
        FROM hits
      ) WHERE rn = 1
    ), pred AS (
      SELECT c.doc_id, c.lang,
             CASE WHEN c.s = '' THEN 'und'
                  WHEN 10 * c.n_cjk >= c.n THEN 'zh'
                  ELSE coalesce(b.pred, 'und') END AS lang_pred
      FROM cjk c LEFT JOIN best b USING (doc_id)
    )
    SELECT lang, lang_pred, count(*) AS n_docs
    FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred
"""


def _sm64_ctes(prefix: str, src: str, carry: list[str]) -> tuple[str, str]:
    """splitmix64 as a chain of CTEs over UHUGEINT column ``x``,
    carrying ``carry`` columns through; returns (sql_fragment,
    last_cte_name). Shared by the HLL and Count-Min oracles so the
    hash mirror cannot drift per consumer."""
    from ..core.sketch import _SM64_C1, _SM64_C2

    m64 = 1 << 64
    cc = ", ".join(carry) + (", " if carry else "")
    steps = [
        f"xor(x, x // {1 << 30})",
        f"(x * {_SM64_C1}::UHUGEINT) % {m64}::UHUGEINT",
        f"xor(x, x // {1 << 27})",
        f"(x * {_SM64_C2}::UHUGEINT) % {m64}::UHUGEINT",
        f"xor(x, x // {1 << 31})",
    ]
    out, cur = [], src
    for j, e in enumerate(steps, 1):
        name = f"{prefix}{j}"
        out.append(f"{name} AS (SELECT {cc}{e} AS x FROM {cur})")
        cur = name
    return ",\n    ".join(out), cur


def _cms_oracle_sql() -> str:
    """DuckDB re-derivation of the ENTIRE Count-Min pipeline
    (core.sketch.CountMin): both chained splitmix64 applications, the
    Kirsch-Mitzenmacher column schedule ((a + i·b) mod 2^64 mod w with
    b forced odd), every counter cell, and every min-over-rows
    estimate — generated from the same constants as the engine."""
    from ..core.sketch import CMS_D, CMS_W

    m64 = 1 << 64
    wrap = (f"CASE WHEN user_id < 0 THEN (user_id::HUGEINT + "
            f"{m64}::HUGEINT)::UHUGEINT ELSE user_id::UHUGEINT END")
    ev_a, ev_a_end = _sm64_ctes("eva", "ev0", [])
    ev_b, ev_b_end = _sm64_ctes("evb", "evmid", ["a"])
    tp_a, tp_a_end = _sm64_ctes("tpa", "tp0", ["user_id"])
    tp_b, tp_b_end = _sm64_ctes("tpb", "tpmid", ["user_id", "a"])
    return f"""
    WITH exact AS (
        SELECT user_id, count(*)::BIGINT AS n_exact
        FROM events GROUP BY user_id
    ),
    top AS (SELECT user_id, n_exact FROM exact
            ORDER BY n_exact DESC, user_id LIMIT 10),
    ev0 AS (SELECT {wrap} AS x FROM events),
    {ev_a},
    evmid AS (SELECT x AS a, x FROM {ev_a_end}),
    {ev_b},
    evh AS (SELECT a, x // 2 * 2 + 1 AS b FROM {ev_b_end}),
    cells AS (
        SELECT i.range AS i,
               (((a + i.range::UHUGEINT * b) % {m64}::UHUGEINT)
                % {CMS_W}::UHUGEINT)::BIGINT AS col
        FROM evh CROSS JOIN range({CMS_D}) i
    ),
    counters AS (SELECT i, col, count(*)::BIGINT AS cnt
                 FROM cells GROUP BY i, col),
    tp0 AS (SELECT user_id, {wrap} AS x FROM top),
    {tp_a},
    tpmid AS (SELECT user_id, x AS a, x FROM {tp_a_end}),
    {tp_b},
    tph AS (SELECT user_id, a, x // 2 * 2 + 1 AS b FROM {tp_b_end}),
    tcells AS (
        SELECT user_id, i.range AS i,
               (((a + i.range::UHUGEINT * b) % {m64}::UHUGEINT)
                % {CMS_W}::UHUGEINT)::BIGINT AS col
        FROM tph CROSS JOIN range({CMS_D}) i
    ),
    est AS (
        SELECT t.user_id, min(c.cnt)::BIGINT AS n_cms
        FROM tcells t JOIN counters c ON c.i = t.i AND c.col = t.col
        GROUP BY t.user_id
    )
    SELECT top.user_id, top.n_exact, est.n_cms,
           (est.n_cms - top.n_exact)::BIGINT AS overest
    FROM top JOIN est USING (user_id)
    ORDER BY top.n_exact DESC, top.user_id
    """


def _cms_join_oracle_sql() -> str:
    """q_events_join_size_cms mirror: BOTH Count-Min counter matrices
    (click / purchase frequency vectors over user_id) re-derived from
    the shared splitmix64 CTE chain, every per-row inner product
    (missing rows coalesce to 0), the min-over-rows estimate, and the
    exact join size Σ_u f_c(u)·f_p(u) — generated from the engine's
    constants like the CMS/HLL oracles."""
    from ..core.sketch import CMS_D, CMS_W

    m64 = 1 << 64
    wrap = (f"CASE WHEN user_id < 0 THEN (user_id::HUGEINT + "
            f"{m64}::HUGEINT)::UHUGEINT ELSE user_id::UHUGEINT END")
    a_ctes, a_end = _sm64_ctes("ja", "j0", ["side"])
    b_ctes, b_end = _sm64_ctes("jb", "jmid", ["side", "a"])
    return f"""
    WITH j0 AS (
        SELECT event_type AS side, {wrap} AS x FROM events
        WHERE event_type IN ('click', 'purchase')
    ),
    {a_ctes},
    jmid AS (SELECT side, x AS a, x FROM {a_end}),
    {b_ctes},
    jh AS (SELECT side, a, x // 2 * 2 + 1 AS b FROM {b_end}),
    cells AS (
        SELECT side, i.range AS i,
               (((a + i.range::UHUGEINT * b) % {m64}::UHUGEINT)
                % {CMS_W}::UHUGEINT)::BIGINT AS col
        FROM jh CROSS JOIN range({CMS_D}) i
    ),
    counters AS (SELECT side, i, col, count(*)::HUGEINT AS cnt
                 FROM cells GROUP BY 1, 2, 3),
    dots AS (
        SELECT r.range AS i,
               coalesce(sum(cc.cnt * cp.cnt), 0)::HUGEINT AS dot
        FROM range({CMS_D}) r
        LEFT JOIN counters cc ON cc.i = r.range AND cc.side = 'click'
        LEFT JOIN counters cp ON cp.i = cc.i AND cp.col = cc.col
                             AND cp.side = 'purchase'
        GROUP BY r.range
    ),
    est AS (SELECT min(dot)::BIGINT AS n_cms_est FROM dots),
    exact AS (
        SELECT coalesce(sum(c * p), 0)::BIGINT AS n_exact FROM (
            SELECT user_id,
                   count(*) FILTER (WHERE event_type = 'click') AS c,
                   count(*) FILTER (WHERE event_type = 'purchase') AS p
            FROM events GROUP BY user_id
        )
    )
    SELECT exact.n_exact, est.n_cms_est,
           (est.n_cms_est - exact.n_exact)::BIGINT AS overest
    FROM exact CROSS JOIN est
    """


def _hll_oracle_sql() -> str:
    """DuckDB re-derivation of the ENTIRE HyperLogLog pipeline
    (core.sketch.HyperLogLog), generated from the same constants so
    the two sides cannot drift: splitmix64 over HUGEINT (xor + //
    logical shifts + modular multiply; negative keys wrap by +2^64,
    matching numpy's uint64 view), register = top-p bits, rho =
    53 - bit_length(52-bit suffix) via bin(), integer-exact scaled
    denominator (sum of 2^(53-reg) + 2^53 per empty register), and
    both estimator branches with the float expression written in the
    engine's exact association order."""
    from ..core.sketch import _SM64_C1, _SM64_C2, _HLL_W_BITS, HLL_M

    m64 = 1 << 64
    wb1 = _HLL_W_BITS + 1                       # 53
    wpow = 1 << _HLL_W_BITS                     # 2^52
    pow2 = ", ".join(f"({r}, {1 << (wb1 - r)})" for r in range(wb1 + 1))
    alpha = f"0.7213/(1.0 + 1.079/{HLL_M}.0)"
    return f"""
    WITH pairs AS (SELECT DISTINCT event_type, user_id FROM events),
    keys AS (
        SELECT event_type, user_id FROM pairs
        UNION ALL
        SELECT '(all)' AS event_type, user_id
        FROM (SELECT DISTINCT user_id FROM events)
    ),
    h0 AS (
        -- UHUGEINT (uint128): the 64x64-bit modular products below
        -- overflow signed INT128 but fit uint128 exactly
        SELECT event_type,
               CASE WHEN user_id < 0
                    THEN (user_id::HUGEINT + {m64}::HUGEINT)::UHUGEINT
                    ELSE user_id::UHUGEINT END AS x
        FROM keys
    ),
    s1 AS (SELECT event_type, xor(x, x // {1 << 30}) AS x FROM h0),
    s2 AS (SELECT event_type,
                  (x * {_SM64_C1}::UHUGEINT) % {m64}::UHUGEINT AS x FROM s1),
    s3 AS (SELECT event_type, xor(x, x // {1 << 27}) AS x FROM s2),
    s4 AS (SELECT event_type,
                  (x * {_SM64_C2}::UHUGEINT) % {m64}::UHUGEINT AS x FROM s3),
    s5 AS (SELECT event_type, xor(x, x // {1 << 31}) AS x FROM s4),
    jw AS (SELECT event_type, (x // {wpow})::BIGINT AS j,
                  (x % {wpow})::BIGINT AS w FROM s5),
    rho AS (
        SELECT event_type, j,
               CASE WHEN w = 0 THEN {wb1}
                    ELSE {wb1} - length(bin(w)) END AS r
        FROM jw
    ),
    regs AS (SELECT event_type, j, max(r) AS mr FROM rho GROUP BY 1, 2),
    den AS (
        SELECT regs.event_type,
               sum(p.v)::HUGEINT
                 + ({HLL_M} - count(*))::HUGEINT * {1 << wb1}::HUGEINT
                 AS denom,
               ({HLL_M} - count(*))::BIGINT AS v0
        FROM regs JOIN (VALUES {pow2}) p(r, v) ON p.r = regs.mr
        GROUP BY regs.event_type
    ),
    est AS (
        SELECT event_type, v0,
               {alpha} * {HLL_M}.0 * {HLL_M}.0 * {1 << wb1}.0
                 / denom::DOUBLE AS e_raw
        FROM den
    ),
    fin AS (
        SELECT event_type,
               CASE WHEN e_raw <= 2.5 * {HLL_M}.0 AND v0 > 0
                    THEN {HLL_M}.0 * ln({HLL_M}.0 / v0)
                    ELSE e_raw END AS e
        FROM est
    ),
    exact AS (SELECT event_type, count(*) AS n_exact FROM keys
              GROUP BY event_type)
    SELECT f.event_type, exact.n_exact, round(f.e, 6) AS hll_est
    FROM fin f JOIN exact USING (event_type)
    ORDER BY f.event_type
"""


def _hll_window_oracle_sql() -> str:
    """The windowed variant of ``_hll_oracle_sql`` for
    q_events_dau_wau_hll: per-DAY registers re-derived from the same
    splitmix64 chain, then the trailing-7-day WAU sketch re-built as
    the register MAX over the window (the merge IS elementwise max),
    and both estimator branches evaluated per day for DAU and WAU —
    so the windowed-union property itself is what the oracle checks."""
    from ..core.sketch import _SM64_C1, _SM64_C2, _HLL_W_BITS, HLL_M

    m64 = 1 << 64
    wb1 = _HLL_W_BITS + 1
    wpow = 1 << _HLL_W_BITS
    pow2 = ", ".join(f"({r}, {1 << (wb1 - r)})" for r in range(wb1 + 1))
    alpha = f"0.7213/(1.0 + 1.079/{HLL_M}.0)"

    def den_est(src: str) -> str:
        return f"""(
        SELECT r.day,
               CASE WHEN e_raw <= 2.5 * {HLL_M}.0 AND v0 > 0
                    THEN {HLL_M}.0 * ln({HLL_M}.0 / v0)
                    ELSE e_raw END AS e
        FROM (
            SELECT day, v0,
                   {alpha} * {HLL_M}.0 * {HLL_M}.0 * {1 << wb1}.0
                     / denom::DOUBLE AS e_raw
            FROM (
                SELECT s.day,
                       sum(p.v)::HUGEINT
                         + ({HLL_M} - count(*))::HUGEINT
                           * {1 << wb1}::HUGEINT AS denom,
                       ({HLL_M} - count(*))::BIGINT AS v0
                FROM {src} s JOIN (VALUES {pow2}) p(r, v) ON p.r = s.mr
                GROUP BY s.day
            )
        ) r
    )"""

    return f"""
    WITH keys AS (
        SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
        FROM events
    ),
    h0 AS (
        SELECT day,
               CASE WHEN user_id < 0
                    THEN (user_id::HUGEINT + {m64}::HUGEINT)::UHUGEINT
                    ELSE user_id::UHUGEINT END AS x
        FROM keys
    ),
    s1 AS (SELECT day, xor(x, x // {1 << 30}) AS x FROM h0),
    s2 AS (SELECT day,
                  (x * {_SM64_C1}::UHUGEINT) % {m64}::UHUGEINT AS x FROM s1),
    s3 AS (SELECT day, xor(x, x // {1 << 27}) AS x FROM s2),
    s4 AS (SELECT day,
                  (x * {_SM64_C2}::UHUGEINT) % {m64}::UHUGEINT AS x FROM s3),
    s5 AS (SELECT day, xor(x, x // {1 << 31}) AS x FROM s4),
    jw AS (SELECT day, (x // {wpow})::BIGINT AS j,
                  (x % {wpow})::BIGINT AS w FROM s5),
    rho AS (
        SELECT day, j,
               CASE WHEN w = 0 THEN {wb1}
                    ELSE {wb1} - length(bin(w)) END AS r
        FROM jw
    ),
    regs AS (SELECT day, j, max(r) AS mr FROM rho GROUP BY 1, 2),
    days AS (SELECT DISTINCT day FROM keys),
    wregs AS (
        SELECT d.day, r.j, max(r.mr) AS mr
        FROM days d JOIN regs r ON r.day BETWEEN d.day - 6 AND d.day
        GROUP BY 1, 2
    ),
    fd AS {den_est('regs')},
    fw AS {den_est('wregs')}
    SELECT CAST(fd.day AS BIGINT) AS day,
           round(fd.e, 6) AS dau_hll, round(fw.e, 6) AS wau_hll
    FROM fd JOIN fw USING (day)
    ORDER BY day
"""


def _hll_overlap_oracle_sql() -> str:
    """q_events_audience_overlap_hll mirror: three register sets
    (click, purchase, and the DISTINCT-union key set — whose registers
    equal the engine's register-max merge by construction), three
    estimates, the inclusion-exclusion difference, and the exact
    intersection — all re-derived."""
    from ..core.sketch import _HLL_W_BITS, HLL_M

    m64 = 1 << 64
    wb1 = _HLL_W_BITS + 1
    wpow = 1 << _HLL_W_BITS
    pow2 = ", ".join(f"({r}, {1 << (wb1 - r)})" for r in range(wb1 + 1))
    alpha = f"0.7213/(1.0 + 1.079/{HLL_M}.0)"
    sm, sm_end = _sm64_ctes("ov", "h0", ["side"])
    return f"""
    WITH keys AS (
        SELECT DISTINCT event_type AS side, user_id FROM events
        WHERE event_type IN ('click', 'purchase')
    ),
    allk AS (
        SELECT side, user_id FROM keys
        UNION ALL
        SELECT 'u' AS side, user_id
        FROM (SELECT DISTINCT user_id FROM keys)
    ),
    h0 AS (
        SELECT side,
               CASE WHEN user_id < 0
                    THEN (user_id::HUGEINT + {m64}::HUGEINT)::UHUGEINT
                    ELSE user_id::UHUGEINT END AS x
        FROM allk
    ),
    {sm},
    jw AS (SELECT side, (x // {wpow})::BIGINT AS j,
                  (x % {wpow})::BIGINT AS w FROM {sm_end}),
    rho AS (
        SELECT side, j,
               CASE WHEN w = 0 THEN {wb1}
                    ELSE {wb1} - length(bin(w)) END AS r
        FROM jw
    ),
    regs AS (SELECT side, j, max(r) AS mr FROM rho GROUP BY 1, 2),
    den AS (
        SELECT regs.side,
               sum(p.v)::HUGEINT
                 + ({HLL_M} - count(*))::HUGEINT * {1 << wb1}::HUGEINT
                 AS denom,
               ({HLL_M} - count(*))::BIGINT AS v0
        FROM regs JOIN (VALUES {pow2}) p(r, v) ON p.r = regs.mr
        GROUP BY regs.side
    ),
    fin AS (
        SELECT side,
               CASE WHEN e_raw <= 2.5 * {HLL_M}.0 AND v0 > 0
                    THEN {HLL_M}.0 * ln({HLL_M}.0 / v0)
                    ELSE e_raw END AS e
        FROM (
            SELECT side, v0,
                   {alpha} * {HLL_M}.0 * {HLL_M}.0 * {1 << wb1}.0
                     / denom::DOUBLE AS e_raw
            FROM den
        )
    ),
    exact AS (
        SELECT count(*)::BIGINT AS n_exact FROM (
            SELECT user_id FROM keys
            GROUP BY user_id HAVING count(DISTINCT side) = 2
        )
    )
    SELECT exact.n_exact,
           round(a.e, 6) AS est_click,
           round(b.e, 6) AS est_purchase,
           round(u.e, 6) AS est_union,
           round(a.e + b.e - u.e, 6) AS est_inter
    FROM exact
    CROSS JOIN (SELECT e FROM fin WHERE side = 'click') a
    CROSS JOIN (SELECT e FROM fin WHERE side = 'purchase') b
    CROSS JOIN (SELECT e FROM fin WHERE side = 'u') u
"""


ORACLE_SQL = {
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                         AS sum_qty,
               round(sum(l_extendedprice), 2)                    AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               count(*)                                          AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "order_priority_count": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1994-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY o_orderpriority
    """,
    "mktsegment_revenue": """
        SELECT c.c_mktsegment,
               round(sum(o.o_totalprice), 2) AS revenue,
               count(*)                      AS order_count
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    "nation_region_counts": """
        SELECT r.r_name, count(*) AS nation_count
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    "top_orders_by_revenue": """
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem GROUP BY l_orderkey
        ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, l_orderkey
        LIMIT 10
    """,
    "revenue_forecast": """
        SELECT round(coalesce(sum(l_extendedprice * l_discount), 0), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01'
          AND l_shipdate <  TIMESTAMP '1996-01-01'
          AND l_discount BETWEEN 0.02 AND 0.08
          AND l_quantity < 25
    """,
    "supplier_positive_acctbal": """
        SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
        FROM supplier WHERE s_acctbal > 0
    """,
    "part_brand_stats": """
        SELECT p_brand, count(*) AS part_count,
               round(avg(p_retailprice), 2) AS avg_price,
               max(p_size) AS max_size
        FROM part GROUP BY p_brand
    """,
    "events_hourly": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "events_user_totals": """
        SELECT user_id, round(sum(value), 4) AS total_value, count(*) AS n_events
        FROM events GROUP BY user_id
        ORDER BY sum(value) DESC, user_id LIMIT 10
    """,
    "events_sessions": """
        SELECT user_id, count(*) AS n_sessions
        FROM (
            SELECT user_id,
                   CASE WHEN prev_ts IS NULL
                             OR ts - prev_ts > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM (
                SELECT user_id, ts,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
                FROM events
            )
        ) WHERE new_session = 1
        GROUP BY user_id
    """,
    "events_sliding_1h": """
        WITH halfh AS (
            SELECT date_trunc('hour', ts)
                   + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                          ELSE INTERVAL 0 MINUTE END AS w0,
                   event_type, value
            FROM events
        ), assigned AS (
            SELECT w0 AS window_start, event_type, value FROM halfh
            UNION ALL
            SELECT w0 - INTERVAL 30 MINUTE AS window_start, event_type, value FROM halfh
        )
        SELECT window_start, event_type,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM assigned GROUP BY 1, 2
    """,
    "events_running_sum": """
        -- per-user summary of the parquet-streamed running sums:
        -- sum of prefix sums is order-sensitive, so this still
        -- verifies the (ts, event_id) ordering; integer cents keep
        -- both sides exact
        WITH rc AS (
            SELECT user_id,
                   sum(CAST(round(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS running_cents
            FROM events
        )
        SELECT user_id, count(*) AS n_events,
               CAST(sum(running_cents) AS BIGINT) AS total_running_cents
        FROM rc GROUP BY user_id ORDER BY user_id
    """,
    "events_argmax": """
        SELECT event_type, event_id, value FROM (
            SELECT event_type, event_id, value,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY value DESC, event_id
                   ) AS rk
            FROM events
        ) WHERE rk = 1
    """,
    "events_value_quantiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.50), 4) AS p50,
               round(quantile_cont(value, 0.95), 4) AS p95
        FROM events GROUP BY event_type
    """,
    "events_value_histogram": """
        SELECT CAST(floor(value / 50) * 50 AS BIGINT) AS bucket,
               count(*) AS n_events
        FROM events GROUP BY 1
    """,
    "docs_exact_dedup": f"""
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM (SELECT doc_id, {_TNORM} AS tnorm FROM documents)
        GROUP BY tnorm
    """,
    "docs_dup_count": f"""
        SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_dup_docs
        FROM (
            SELECT count(*) AS c
            FROM (SELECT {_TNORM} AS tnorm FROM documents)
            GROUP BY tnorm HAVING count(*) > 1
        )
    """,
    "docs_token_stats": """
        -- total_bpe_tokens mirrors textstats._TOKEN_RE (ASCII classes)
        SELECT lang, count(*) AS n_docs,
               CAST(sum(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                        x -> x <> ''))) AS BIGINT) AS total_tokens,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')))
                    AS BIGINT) AS total_bpe_tokens
        FROM documents GROUP BY lang
    """,
    "docs_bm25_topk": """
        -- BM25 (k1=1.2, b=0.75), tokenization = lowercase [a-z0-9]+
        -- runs (stages/bm25.py TOKEN_SPLIT_RE, shared verbatim)
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
            FROM documents
        ),
        tok2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok2 GROUP BY doc_id),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                     / (SELECT count(*) FROM documents) AS avgdl
        ),
        terms AS (SELECT * FROM (VALUES ('dup'), ('vector'), ('merge'),
                                        ('window')) t(term)),
        tf AS (SELECT doc_id, tok AS term, count(*)::DOUBLE AS tf
               FROM tok2 WHERE tok IN (SELECT term FROM terms)
               GROUP BY doc_id, tok),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        scored AS (
            SELECT tf.doc_id,
                   sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                        * tf.tf * 2.2
                        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) )
                     AS score
            FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
            CROSS JOIN stats s
            GROUP BY tf.doc_id
        )
        SELECT doc_id, round(score, 4) AS bm25
        FROM scored ORDER BY score DESC, doc_id LIMIT 10
    """,
    "docs_perplexity": """
        -- add-0.5-smoothed bigram self-perplexity; tokenization =
        -- lowercase [a-z0-9]+ runs (stages/bm25.py TOKEN_SPLIT_RE),
        -- BOS = chr(2) per document (stages/ngram_lm.py)
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
            SELECT doc_id, lang, tok, pos,
                   coalesce(lag(tok) OVER (PARTITION BY doc_id
                                           ORDER BY pos), chr(2)) AS prev
            FROM toks
        ),
        bg AS (SELECT prev, tok, count(*)::DOUBLE AS n
               FROM pairs GROUP BY prev, tok),
        ctx AS (SELECT prev, sum(n) AS cn FROM bg GROUP BY prev),
        vocab AS (SELECT count(DISTINCT tok)::DOUBLE AS v FROM bg),
        scored AS (
            SELECT p.doc_id, any_value(p.lang) AS lang,
                   count(*)::DOUBLE AS n_tok,
                   sum(ln((bg.n + 0.5) / (ctx.cn + 0.5 * (vocab.v + 1))))
                     AS logp
            FROM pairs p
            JOIN bg ON bg.prev = p.prev AND bg.tok = p.tok
            JOIN ctx ON ctx.prev = p.prev
            CROSS JOIN vocab
            GROUP BY p.doc_id
        )
        SELECT lang, count(*) AS n_docs,
               round(avg(exp(-logp / n_tok)), 4) AS avg_ppl
        FROM scored GROUP BY lang ORDER BY lang
    """,
    "docs_repetition": """
        -- Gopher-style repetition signals; tokenization = lowercase
        -- [a-z0-9]+ runs (stages/bm25.py TOKEN_SPLIT_RE); top-bigram
        -- ties break by the smallest chr(1)-joined key, the engine's
        -- rule (stages/gopher.py)
        WITH docs AS (
            SELECT doc_id, lang,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> '') AS arr
            FROM documents
        ),
        toks AS (
            SELECT doc_id, unnest(arr) AS tok,
                   unnest(range(1, len(arr) + 1)) AS pos
            FROM docs WHERE len(arr) > 0
        ),
        chars AS (
            SELECT doc_id, sum(length(tok))::DOUBLE AS tc
            FROM toks GROUP BY doc_id
        ),
        big AS (
            SELECT doc_id, lag(tok) OVER w AS w1, tok AS w2
            FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ),
        bigc AS (
            SELECT doc_id, w1, w2, count(*) AS c,
                   length(w1) + length(w2) AS cl
            FROM big WHERE w1 IS NOT NULL GROUP BY doc_id, w1, w2
        ),
        top AS (
            SELECT doc_id, (c * cl)::DOUBLE AS cover FROM (
                SELECT doc_id, c, cl,
                       row_number() OVER (
                           PARTITION BY doc_id
                           ORDER BY c DESC, w1 || chr(1) || w2
                       ) AS rn
                FROM bigc
            ) WHERE rn = 1
        ),
        five AS (
            SELECT doc_id,
                   lag(tok, 4) OVER w AS a, lag(tok, 3) OVER w AS b,
                   lag(tok, 2) OVER w AS c2, lag(tok, 1) OVER w AS d,
                   tok AS e
            FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ),
        fivec AS (
            SELECT doc_id, count(*)::DOUBLE AS total5,
                   count(DISTINCT a || chr(1) || b || chr(1) || c2
                         || chr(1) || d || chr(1) || e)::DOUBLE
                     AS distinct5
            FROM five WHERE a IS NOT NULL GROUP BY doc_id
        )
        SELECT d.lang, count(*) AS n_docs,
               round(avg(coalesce(t.cover / nullif(ch.tc, 0), 0)), 4)
                 AS avg_top_bigram_char_frac,
               round(avg(coalesce(1 - f.distinct5 / f.total5, 0)), 4)
                 AS avg_dup_5gram_frac
        FROM docs d
        LEFT JOIN chars ch USING (doc_id)
        LEFT JOIN top t USING (doc_id)
        LEFT JOIN fivec f USING (doc_id)
        GROUP BY d.lang ORDER BY d.lang
    """,
    "docs_filter_funnel": f"""
        -- composite funnel: first-failing gate in the fixed order
        -- dup -> short(<10 toks) -> quality(<0.75) -> ppl(>29.6 on
        -- round(.,6)) -> repetition(top-bigram frac > 0.2) -> kept;
        -- tokenization/model/signals shared verbatim with the
        -- docs_perplexity / docs_repetition / docs_quality oracles
        WITH dupr AS (
            SELECT doc_id,
                   row_number() OVER (PARTITION BY {_TNORM}
                                      ORDER BY doc_id) AS rn
            FROM documents
        ),
        docs AS (
            SELECT doc_id, lang,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> '') AS arr
            FROM documents
        ),
        toks AS (
            SELECT doc_id, unnest(arr) AS tok,
                   unnest(range(1, len(arr) + 1)) AS pos
            FROM docs WHERE len(arr) > 0
        ),
        pairs AS (
            SELECT doc_id, tok, pos,
                   coalesce(lag(tok) OVER (PARTITION BY doc_id
                                           ORDER BY pos), chr(2)) AS prev
            FROM toks
        ),
        bg AS (SELECT prev, tok, count(*)::DOUBLE AS n
               FROM pairs GROUP BY prev, tok),
        ctx AS (SELECT prev, sum(n) AS cn FROM bg GROUP BY prev),
        vocab AS (SELECT count(DISTINCT tok)::DOUBLE AS v FROM bg),
        scored AS (
            SELECT p.doc_id, count(*)::DOUBLE AS n_tok,
                   sum(ln((bg.n + 0.5) / (ctx.cn + 0.5 * (vocab.v + 1))))
                     AS logp
            FROM pairs p
            JOIN bg ON bg.prev = p.prev AND bg.tok = p.tok
            JOIN ctx ON ctx.prev = p.prev
            CROSS JOIN vocab
            GROUP BY p.doc_id
        ),
        chars AS (
            SELECT doc_id, sum(length(tok))::DOUBLE AS tc
            FROM toks GROUP BY doc_id
        ),
        big AS (
            SELECT doc_id, lag(tok) OVER w AS w1, tok AS w2
            FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ),
        bigc AS (
            SELECT doc_id, w1, w2, count(*) AS c,
                   length(w1) + length(w2) AS cl
            FROM big WHERE w1 IS NOT NULL GROUP BY doc_id, w1, w2
        ),
        top AS (
            SELECT doc_id, (c * cl)::DOUBLE AS cover FROM (
                SELECT doc_id, c, cl,
                       row_number() OVER (
                           PARTITION BY doc_id
                           ORDER BY c DESC, w1 || chr(1) || w2
                       ) AS rn
                FROM bigc
            ) WHERE rn = 1
        ),
        qual AS (
            SELECT doc_id,
                 (CASE WHEN length(text) BETWEEN 50 AND 10000
                       THEN 0.25 ELSE 0 END)
               + (CASE WHEN n_words > 0
                       AND (sum_wl * 1.0 / n_words) BETWEEN 3.0 AND 12.0
                       THEN 0.25 ELSE 0 END)
               + (CASE WHEN length(text) = 0
                       OR (n_punct * 1.0 / length(text)) < 0.2
                       THEN 0.25 ELSE 0 END)
               + (CASE WHEN n_words >= 10 THEN 0.25 ELSE 0 END) AS q
            FROM (
                SELECT doc_id, text,
                       len(list_filter(regexp_split_to_array(text, '\\s+'),
                                       x -> x <> '')) AS n_words,
                       coalesce(list_sum(list_transform(
                           list_filter(regexp_split_to_array(text, '\\s+'),
                                       x -> x <> ''),
                           x -> length(x))), 0) AS sum_wl,
                       length(regexp_extract_all(text, '[!-/:-@\\[-`{{-~]'))
                         AS n_punct
                FROM documents
            )
        ),
        per AS (
            SELECT d.lang,
                   CASE
                     WHEN dupr.rn > 1 THEN 'dup'
                     WHEN coalesce(s.n_tok, 0) < 10 THEN 'short'
                     WHEN qual.q < 0.75 THEN 'quality'
                     WHEN round(exp(-s.logp / s.n_tok), 6) > 29.6
                       THEN 'ppl'
                     WHEN coalesce(t.cover / nullif(ch.tc, 0), 0) > 0.2
                       THEN 'repetition'
                     ELSE 'kept'
                   END AS outcome
            FROM documents d
            JOIN dupr USING (doc_id)
            JOIN qual USING (doc_id)
            LEFT JOIN scored s USING (doc_id)
            LEFT JOIN chars ch USING (doc_id)
            LEFT JOIN top t USING (doc_id)
        )
        SELECT lang, count(*) AS n_docs,
               count(*) FILTER (outcome = 'kept') AS n_kept,
               count(*) FILTER (outcome = 'dup') AS n_dup,
               count(*) FILTER (outcome = 'short') AS n_short,
               count(*) FILTER (outcome = 'quality') AS n_quality,
               count(*) FILTER (outcome = 'ppl') AS n_ppl,
               count(*) FILTER (outcome = 'repetition') AS n_repetition
        FROM per GROUP BY lang ORDER BY lang
    """,
    "docs_decontaminate": """
        -- benchmark decontamination: eval set = docs with
        -- doc_id % 7 = 0; a training doc is contaminated when it
        -- shares ANY complete token 8-gram with the eval set
        -- (tokenization = lowercase [a-z0-9]+ runs, stages/bm25.py
        -- TOKEN_SPLIT_RE; gram keys join tokens with chr(1), the
        -- engine's rule). n_gram_hits counts gram OCCURRENCES.
        WITH docs AS (
            SELECT doc_id, lang,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> '') AS arr
            FROM documents
        ),
        toks AS (
            SELECT doc_id, unnest(arr) AS tok,
                   unnest(range(1, len(arr) + 1)) AS pos
            FROM docs WHERE len(arr) > 0
        ),
        grams AS (
            SELECT doc_id,
                   lag(tok, 7) OVER w || chr(1) || lag(tok, 6) OVER w
                   || chr(1) || lag(tok, 5) OVER w || chr(1)
                   || lag(tok, 4) OVER w || chr(1) || lag(tok, 3) OVER w
                   || chr(1) || lag(tok, 2) OVER w || chr(1)
                   || lag(tok, 1) OVER w || chr(1) || tok AS g
            FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ),
        bench AS (
            SELECT DISTINCT g FROM grams
            WHERE doc_id % 7 = 0 AND g IS NOT NULL
        ),
        hits AS (
            SELECT doc_id, count(*) AS nh
            FROM grams
            WHERE doc_id % 7 <> 0 AND g IN (SELECT g FROM bench)
            GROUP BY doc_id
        )
        SELECT d.lang, count(*) AS n_docs,
               count(h.doc_id) AS n_contaminated,
               coalesce(sum(h.nh), 0)::BIGINT AS n_gram_hits,
               round(count(h.doc_id)::DOUBLE / count(*), 4) AS contam_rate
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % 7 <> 0
        GROUP BY d.lang ORDER BY d.lang
    """,
    "docs_substring_dedup": """
        -- exact substring dedup: token 8-grams occurring >= 2 times
        -- corpus-wide (occurrences, incl. within-doc repeats) mark
        -- every token in their windows as covered; per-lang coverage
        -- stats. Tokenization = lowercase [a-z0-9]+ runs; gram keys
        -- join tokens with chr(1) (engine rules, stages/bm25.py +
        -- stages/substring_dedup.py).
        WITH docs AS (
            SELECT doc_id, lang,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> '') AS arr
            FROM documents
        ),
        toks AS (
            SELECT doc_id, unnest(arr) AS tok,
                   unnest(range(1, len(arr) + 1)) AS pos
            FROM docs WHERE len(arr) > 0
        ),
        gg AS (
            SELECT doc_id, pos, g FROM (
                SELECT doc_id, pos,
                       lag(tok, 7) OVER w || chr(1) || lag(tok, 6) OVER w
                       || chr(1) || lag(tok, 5) OVER w || chr(1)
                       || lag(tok, 4) OVER w || chr(1)
                       || lag(tok, 3) OVER w || chr(1)
                       || lag(tok, 2) OVER w || chr(1)
                       || lag(tok, 1) OVER w || chr(1) || tok AS g
                FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
            ) WHERE g IS NOT NULL
        ),
        dup AS (SELECT g FROM gg GROUP BY g HAVING count(*) >= 2),
        cov AS (
            SELECT t.doc_id, t.pos
            FROM toks t
            JOIN gg ON gg.doc_id = t.doc_id
                   AND t.pos BETWEEN gg.pos - 7 AND gg.pos
            WHERE gg.g IN (SELECT g FROM dup)
            GROUP BY t.doc_id, t.pos
        ),
        per AS (SELECT doc_id, count(*) AS cv FROM cov GROUP BY doc_id),
        tot AS (SELECT doc_id, count(*) AS nt FROM toks GROUP BY doc_id)
        SELECT d.lang, count(*) AS n_docs,
               count(per.doc_id) AS n_affected,
               coalesce(sum(tot.nt), 0)::BIGINT AS total_tokens,
               coalesce(sum(per.cv), 0)::BIGINT AS covered_tokens,
               round(coalesce(sum(per.cv), 0)::DOUBLE
                     / greatest(coalesce(sum(tot.nt), 0), 1), 4)
                 AS covered_rate
        FROM documents d
        LEFT JOIN tot USING (doc_id) LEFT JOIN per USING (doc_id)
        GROUP BY d.lang ORDER BY d.lang
    """,
    "docs_source_mixture": """
        -- source-mixture balancing: uniform token budget per source
        -- (budget = total // n_sources), weight_ppm = min(1e6,
        -- (1e6*budget) // tokens_s), doc kept when the Knuth hash
        -- ((doc_id % 2^31) * 2654435761) % 2^32 % 1e6 < weight_ppm —
        -- all integer arithmetic, shared verbatim with the engine
        -- (stages/mixture.py); tokenization = lowercase [a-z0-9]+ runs
        WITH docs AS (
            SELECT doc_id, source,
                   len(list_filter(regexp_split_to_array(lower(text),
                                                         '[^a-z0-9]+'),
                                   x -> x <> ''))::BIGINT AS n_tok
            FROM documents
        ),
        per_src AS (
            SELECT source, sum(n_tok) AS toks FROM docs GROUP BY source
        ),
        tot AS (SELECT sum(toks) AS total, count(*) AS ns FROM per_src),
        thr AS (
            SELECT source,
                   CASE WHEN toks = 0 THEN 1000000
                        ELSE least(1000000,
                                   (1000000 * (tot.total // tot.ns))
                                   // toks)
                   END AS weight_ppm
            FROM per_src, tot
        ),
        sampled AS (
            SELECT d.source, d.n_tok, t.weight_ppm,
                   (((d.doc_id % 2147483648) * 2654435761)
                    % 4294967296) % 1000000 < t.weight_ppm AS kept
            FROM docs d JOIN thr t USING (source)
        )
        SELECT source, count(*) AS n_docs,
               sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
               sum(n_tok)::BIGINT AS total_tokens,
               sum(CASE WHEN kept THEN n_tok ELSE 0 END)::BIGINT
                 AS sampled_tokens,
               any_value(weight_ppm)::BIGINT AS weight_ppm
        FROM sampled GROUP BY source ORDER BY source
    """,
    "docs_seq_packing": """
        -- GPT-style packing: stream position off_d = SUM over earlier
        -- doc_ids of (n_tok + 1 EOS); doc crosses a boundary when its
        -- first and last content token fall in different 256-token
        -- sequences; n_sequences = ceil(stream / 256). Tokenization =
        -- lowercase [a-z0-9]+ runs, shared with stages/packing.py
        WITH docs AS (
            SELECT doc_id, lang,
                   len(list_filter(regexp_split_to_array(lower(text),
                                                         '[^a-z0-9]+'),
                                   x -> x <> ''))::BIGINT AS n_tok
            FROM documents
        ),
        cum AS (
            SELECT doc_id, lang, n_tok,
                   coalesce(sum(n_tok + 1) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS strm
            FROM docs
        ),
        spans AS (
            SELECT lang, n_tok,
                   CASE WHEN n_tok > 0
                             AND strm // 256 <> (strm + n_tok - 1) // 256
                        THEN 1 ELSE 0 END AS crossing
            FROM cum
        ),
        tot AS (SELECT sum(n_tok) + count(*) AS stream FROM docs),
        seqs AS (
            SELECT ((stream + 255) // 256)::BIGINT AS n_sequences,
                   (((stream + 255) // 256) * 256 - stream)::BIGINT
                     AS n_pad_tokens
            FROM tot
        )
        SELECT lang, count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
               sum(crossing)::BIGINT AS n_crossing_docs,
               seqs.n_sequences, seqs.n_pad_tokens
        FROM spans, seqs
        GROUP BY lang, seqs.n_sequences, seqs.n_pad_tokens
        ORDER BY lang
    """,
    "docs_profile": """
        -- one row per column: COUNT(DISTINCT) skips NULLs, matching
        -- the engine's drop-null-before-hash KMV rule (exact below k)
        SELECT 'doc_id' AS col_name, (count(*) - count(doc_id))::BIGINT AS n_nulls,
               count(DISTINCT doc_id)::BIGINT AS n_distinct FROM documents
        UNION ALL SELECT 'lang' AS col_name, (count(*) - count(lang))::BIGINT AS n_nulls,
               count(DISTINCT lang)::BIGINT AS n_distinct FROM documents
        UNION ALL SELECT 'n_chars' AS col_name, (count(*) - count(n_chars))::BIGINT AS n_nulls,
               count(DISTINCT n_chars)::BIGINT AS n_distinct FROM documents
        UNION ALL SELECT 'source' AS col_name, (count(*) - count(source))::BIGINT AS n_nulls,
               count(DISTINCT source)::BIGINT AS n_distinct FROM documents
        UNION ALL SELECT 'text' AS col_name, (count(*) - count(text))::BIGINT AS n_nulls,
               count(DISTINCT text)::BIGINT AS n_distinct FROM documents
        ORDER BY col_name
    """,
    "events_outliers": """
        -- grouped moments + 3-sigma gate over integer cents; the
        -- double expression mirrors the engine exactly (s rounded to
        -- DOUBLE before squaring) so the unrounded boundary compare
        -- cannot flip a count; std=0 groups gate to zero
        WITH ev AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
            FROM events
        ),
        st AS (
            SELECT event_type, count(*) AS n_events,
                   sum(c)::BIGINT AS s, sum(c * c)::BIGINT AS s2
            FROM ev GROUP BY event_type
        ),
        mo AS (
            SELECT event_type, n_events, s::DOUBLE / n_events AS mean,
                   CASE WHEN (s2::DOUBLE - (s::DOUBLE * s::DOUBLE)
                              / n_events) / n_events > 0
                        THEN sqrt((s2::DOUBLE - (s::DOUBLE * s::DOUBLE)
                                   / n_events) / n_events)
                        ELSE 0.0 END AS std
            FROM st
        ),
        o AS (
            SELECT e.event_type,
                   sum(CASE WHEN mo.std > 0
                                 AND abs(e.c::DOUBLE - mo.mean)
                                     > 3.0 * mo.std
                            THEN 1 ELSE 0 END)::BIGINT AS n_outliers
            FROM ev e JOIN mo USING (event_type) GROUP BY e.event_type
        )
        SELECT mo.event_type, mo.n_events, round(mo.mean, 6) AS mean_cents,
               round(mo.std, 6) AS std_cents, o.n_outliers
        FROM mo JOIN o USING (event_type) ORDER BY mo.event_type
    """,
    "docs_top_terms": """
        -- add-1-smoothed log-odds rate ratio (Fightin' Words family):
        -- score = ln(((tf+1)/(T_l+V)) / ((TF_w-tf+1)/(G-T_l+V))),
        -- present (lang, term) pairs only; score rounded to 6 BEFORE
        -- ranking (engine rule); ties on term ASC. Tokenization =
        -- lowercase [a-z0-9]+ runs (stages/tfidf.py)
        WITH toks AS (
            SELECT lang, unnest(list_filter(
                regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                x -> x <> '')) AS term
            FROM documents
        ),
        tf AS (SELECT lang, term, count(*)::BIGINT AS tf
               FROM toks GROUP BY lang, term),
        tl AS (SELECT lang, sum(tf)::BIGINT AS tl FROM tf GROUP BY lang),
        gl AS (SELECT sum(tf)::BIGINT AS g,
                      count(DISTINCT term)::BIGINT AS v FROM tf),
        tw AS (SELECT term, sum(tf)::BIGINT AS tw FROM tf GROUP BY term),
        scored AS (
            SELECT tf.lang, tf.term, tf.tf,
                   round(ln(((tf.tf + 1)::DOUBLE / (tl.tl + gl.v))
                            / ((tw.tw - tf.tf + 1)::DOUBLE
                               / (gl.g - tl.tl + gl.v))), 6) AS score
            FROM tf JOIN tl USING (lang) JOIN tw USING (term), gl
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY lang
                      ORDER BY score DESC, term ASC) AS rk
            FROM scored
        )
        SELECT lang, rk, term, tf, score FROM ranked
        WHERE rk <= 5 ORDER BY lang, rk
    """,
    "events_rollup": """
        -- ROLLUP over (event_type, day): the oracle aggregates every
        -- level from RAW rows while the engine derives coarser levels
        -- from the finest result — integer cents make both exact.
        -- round(value*100) = the stages/running.py cent rule
        WITH ev AS (
            SELECT event_type,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT coalesce(event_type, '(all)') AS event_type,
               coalesce(day, '(all)') AS day,
               count(*) AS n_events,
               sum(cents)::BIGINT AS total_cents
        FROM ev GROUP BY ROLLUP(event_type, day)
        ORDER BY 1, 2
    """,
    "events_pivot": """
        -- wide crosstab over the declared 5-type domain; counts via
        -- FILTER, sums as integer cents (round(value*100) = the
        -- stages/running.py cent rule) so the wide columns are
        -- bit-exact with no float-order caveat
        SELECT date_trunc('day', ts) AS day,
               count(*) FILTER (WHERE event_type = 'click')::BIGINT AS n_click,
               coalesce(sum(CASE WHEN event_type = 'click'
                   THEN CAST(round(value * 100) AS BIGINT) END), 0)::BIGINT
                   AS cents_click,
               count(*) FILTER (WHERE event_type = 'error')::BIGINT AS n_error,
               coalesce(sum(CASE WHEN event_type = 'error'
                   THEN CAST(round(value * 100) AS BIGINT) END), 0)::BIGINT
                   AS cents_error,
               count(*) FILTER (WHERE event_type = 'purchase')::BIGINT
                   AS n_purchase,
               coalesce(sum(CASE WHEN event_type = 'purchase'
                   THEN CAST(round(value * 100) AS BIGINT) END), 0)::BIGINT
                   AS cents_purchase,
               count(*) FILTER (WHERE event_type = 'signup')::BIGINT
                   AS n_signup,
               coalesce(sum(CASE WHEN event_type = 'signup'
                   THEN CAST(round(value * 100) AS BIGINT) END), 0)::BIGINT
                   AS cents_signup,
               count(*) FILTER (WHERE event_type = 'view')::BIGINT AS n_view,
               coalesce(sum(CASE WHEN event_type = 'view'
                   THEN CAST(round(value * 100) AS BIGINT) END), 0)::BIGINT
                   AS cents_view
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "events_distinct_hll": _hll_oracle_sql(),
    # generated: full Count-Min mirror (hashes, counters, estimates)
    "events_user_cms": _cms_oracle_sql(),
    "pages_url_simjoin": """
        -- strong artifact oracle: the distinct url list is written;
        -- SQL re-derives the FULL ed<=1 pair set by brute-force
        -- all-pairs levenshtein (length-blocked), externally
        -- verifying the FastSS deletion-neighborhood blocking
        WITH urls AS (
            SELECT url FROM read_parquet(
                '/tmp/ocracle_simjoin_oracle/current/*.parquet')
        ),
        pairs AS (
            SELECT a.url AS ua, b.url AS ub
            FROM urls a JOIN urls b
              ON a.url < b.url
             AND abs(length(a.url) - length(b.url)) <= 1
             AND levenshtein(a.url, b.url) <= 1
        )
        SELECT (SELECT count(*) FROM urls)::BIGINT AS n_keys,
               count(*)::BIGINT AS n_pairs,
               coalesce(bit_xor(('0x' || substr(
                   md5(ua || '|' || ub), 1, 15))::BIGINT), 0)::BIGINT
                   AS pair_ck
        FROM pairs
    """,
    "events_timerange_pruned": """
        -- the pruned-read result must equal a first-principles range
        -- aggregate over RAW rows — layout, zone map, pruning and the
        -- residual filter all verified end to end
        SELECT event_type, count(*)::BIGINT AS n_events,
               sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
          AND ts <  TIMESTAMP '2024-01-12 12:00:00'
        GROUP BY event_type ORDER BY event_type
    """,
    "events_box_pruned": """
        -- 2-D (time x user) box over RAW rows must equal the
        -- Z-ordered store's pruned read + residual filter
        SELECT event_type, count(*)::BIGINT AS n_events,
               sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
          AND ts <  TIMESTAMP '2024-01-20 00:00:00'
          AND user_id >= 100 AND user_id < 300
        GROUP BY event_type ORDER BY event_type
    """,
    # generated: full Lloyd mirror (assignments, means, coalesce)
    "emb_kmeans": __import__(
        "ocracle_ray.stages.kmeans", fromlist=["kmeans_oracle_sql"]
    ).kmeans_oracle_sql(KMEANS_K, KMEANS_ITERS, 64),
    "events_value_mad": """
        -- MAD per type: both medians are quantile_cont-exact, so the
        -- engine's two exact-selection passes mirror median() directly
        WITH med AS (
            SELECT event_type, median(value) AS med
            FROM events GROUP BY event_type
        )
        SELECT e.event_type, round(any_value(m.med), 4) AS med_value,
               round(median(abs(e.value - m.med)), 4) AS mad
        FROM events e JOIN med m USING (event_type)
        GROUP BY e.event_type ORDER BY e.event_type
    """,
    "events_retention": """
        -- weekly cohort retention: week = floored epoch-us week index
        -- (integer // on post-1970 timestamps == the engine's int64
        -- floor division); the engine computes the cohort min inside
        -- the per-user group instead of this join
        WITH uw AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // 604800000000 AS week
            FROM events
        ), c AS (
            SELECT user_id, min(week) AS cohort FROM uw GROUP BY user_id
        )
        SELECT c.cohort AS cohort_week,
               uw.week - c.cohort AS week_offset,
               count(*) AS n_users
        FROM uw JOIN c USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "docs_dsir": """
        -- DSIR (arXiv:2302.03169): hashed-unigram importance weights
        -- vs the lang='en' target slice. The FNV-1a/4096 bucket hash
        -- is re-derived byte-for-byte via list_reduce over codepoints
        -- (tokens are ASCII [a-z0-9]+ so codepoint == UTF-8 byte);
        -- add-1 smoothing over the bucket space on both sides; per-doc
        -- log-weights round to 6 before any aggregate (the
        -- nb_classifier summation-order rule)
        WITH toks AS (
            SELECT doc_id, lang,
                   unnest(regexp_split_to_array(lower(text),
                                                '[^a-z0-9]+')) AS tok
            FROM documents
        ),
        tok2 AS (SELECT doc_id, lang, tok FROM toks WHERE tok <> ''),
        dist AS (SELECT DISTINCT tok FROM tok2),
        hd AS (
            SELECT tok,
                   CAST(CAST(list_reduce(
                       list_prepend(
                           CAST(14695981039346656037 AS UHUGEINT),
                           list_transform(string_split(tok, ''),
                               c -> CAST(unicode(c) AS UHUGEINT))),
                       (h, c) -> (xor(CAST(h AS UBIGINT),
                                      CAST(c AS UBIGINT))::UHUGEINT
                                  * 1099511628211)
                                 % 18446744073709551616::UHUGEINT
                   ) AS UBIGINT) % 4096 AS BIGINT) AS bucket
            FROM dist
        ),
        hashed AS (
            SELECT doc_id, lang, bucket FROM tok2 JOIN hd USING (tok)
        ),
        counts AS (
            SELECT bucket,
                   count(*) FILTER (WHERE lang = 'en') AS n_t,
                   count(*) AS n_r
            FROM hashed GROUP BY bucket
        ),
        tot AS (SELECT sum(n_t)::DOUBLE AS ct, sum(n_r)::DOUBLE AS cr
                FROM counts),
        lam AS (
            SELECT bucket,
                   ln((n_t + 1.0) / (ct + 4096.0))
                   - ln((n_r + 1.0) / (cr + 4096.0)) AS lam
            FROM counts CROSS JOIN tot
        ),
        scores AS (
            SELECT h.doc_id, round(sum(l.lam), 6) AS logw
            FROM hashed h JOIN lam l USING (bucket)
            GROUP BY h.doc_id
        ),
        alldocs AS (
            SELECT d.lang, coalesce(s.logw, 0.0) AS logw
            FROM documents d LEFT JOIN scores s USING (doc_id)
        )
        SELECT lang, count(*) AS n_docs,
               round(sum(logw) / count(*), 4) AS avg_logw,
               count(*) FILTER (WHERE logw > 0) AS n_pos
        FROM alldocs GROUP BY lang ORDER BY lang
    """,
    "local_supplier_revenue": """
        -- TPC-H Q5: revenue by nation, customer and supplier in the
        -- SAME nation, one region, [1995-01-01, 1997-01-01) window
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2)
                 AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
                      AND c_nationkey = s_nationkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "emb_pq": f"""
        -- product quantization, trusted-training artifact oracle: the
        -- codebook is read from the written artifact; every ASSIGNMENT
        -- and reconstruction error is re-derived from raw embeddings
        -- (round-6 distance before argmin, lowest-cell ties — the
        -- emb_kmeans parity rules per subspace)
        WITH cb AS (
            SELECT m, cell, list(value ORDER BY j) AS c
            FROM read_parquet('{PQ_ORACLE_DIR}/current/cb/*.parquet')
            GROUP BY m, cell
        ),
        art AS (
            SELECT * FROM
            read_parquet('{PQ_ORACLE_DIR}/current/codes/*.parquet')
        ),
        d AS (
            SELECT e.vec_id, cb.m, cb.cell,
                   round(list_sum(list_transform(range(1, {PQ_DSUB + 1}),
                       j -> (CAST(e.embedding[CAST(cb.m * {PQ_DSUB} + j
                                                   AS INT)] AS DOUBLE)
                             - cb.c[j])
                            * (CAST(e.embedding[CAST(cb.m * {PQ_DSUB} + j
                                                     AS INT)] AS DOUBLE)
                               - cb.c[j]))), 6) AS d2
            FROM embeddings e CROSS JOIN cb
        ),
        asg AS (
            SELECT vec_id, m, cell AS code, d2 FROM (
                SELECT vec_id, m, cell, d2,
                       row_number() OVER (PARTITION BY vec_id, m
                                          ORDER BY d2, cell) AS rn
                FROM d
            ) WHERE rn = 1
        )
        SELECT a.m, count(*) AS n_vectors,
               count(DISTINCT t.code) AS k_used,
               count(*) FILTER (WHERE t.code = a.code) AS n_match,
               round(sum(a.d2), 4) AS sq_err
        FROM asg a JOIN art t ON t.vec_id = a.vec_id AND t.m = a.m
        GROUP BY a.m ORDER BY a.m
    """,
    "events_watermark_late": """
        -- watermark = running-max ts over the Knuth-hash arrival order
        -- (docs_split trick; (hash, event_id) is a total order) minus
        -- 2h; lateness summed in integer microseconds, ONE division
        -- per group (the engine's exact arithmetic)
        WITH w AS (
            SELECT event_type, epoch_us(ts) AS t,
                   max(epoch_us(ts)) OVER (
                       ORDER BY ((event_id % 2147483648) * 2654435761)
                                % 4294967296, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS pm
            FROM events
        )
        SELECT event_type, count(*) AS n_events,
               count(*) FILTER (WHERE pm IS NOT NULL
                                AND t < pm - 7200000000) AS n_late,
               round(coalesce(
                   CAST(sum(pm - 7200000000 - t)
                        FILTER (WHERE pm IS NOT NULL
                                AND t < pm - 7200000000) AS DOUBLE)
                   / nullif(count(*) FILTER (WHERE pm IS NOT NULL
                                             AND t < pm - 7200000000),
                            0) / 1000000.0, 0), 2) AS avg_late_sec
        FROM w GROUP BY event_type ORDER BY event_type
    """,
    "emb_pq_search": f"""
        -- ADC search, trusted-training oracle: codebook from the
        -- artifact; code ASSIGNMENTS, ADC tables, both rankings and
        -- recall@{PQ_TOPK} all re-derived from raw embeddings
        WITH cb AS (
            SELECT m, cell, list(value ORDER BY j) AS c
            FROM read_parquet('{PQSEARCH_ORACLE_DIR}/current/*.parquet')
            GROUP BY m, cell
        ),
        d AS (
            SELECT e.vec_id, cb.m, cb.cell,
                   round(list_sum(list_transform(range(1, {PQ_DSUB + 1}),
                       j -> (CAST(e.embedding[CAST(cb.m * {PQ_DSUB} + j
                                                   AS INT)] AS DOUBLE)
                             - cb.c[j])
                            * (CAST(e.embedding[CAST(cb.m * {PQ_DSUB} + j
                                                     AS INT)] AS DOUBLE)
                               - cb.c[j]))), 6) AS d2
            FROM embeddings e CROSS JOIN cb
        ),
        asg AS (
            SELECT vec_id, m, cell AS code FROM (
                SELECT vec_id, m, cell,
                       row_number() OVER (PARTITION BY vec_id, m
                                          ORDER BY d2, cell) AS rn
                FROM d
            ) WHERE rn = 1
        ),
        q AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS qid,
                   embedding
            FROM (SELECT * FROM embeddings ORDER BY vec_id
                  LIMIT {PQ_NQ})
        ),
        tab AS (
            SELECT q.qid, cb.m, cb.cell,
                   round(list_sum(list_transform(range(1, {PQ_DSUB + 1}),
                       j -> (CAST(q.embedding[CAST(cb.m * {PQ_DSUB} + j
                                                   AS INT)] AS DOUBLE)
                             - cb.c[j])
                            * (CAST(q.embedding[CAST(cb.m * {PQ_DSUB} + j
                                                     AS INT)] AS DOUBLE)
                               - cb.c[j]))), 6) AS td
            FROM q CROSS JOIN cb
        ),
        adc AS (
            SELECT t.qid, a.vec_id, round(sum(t.td), 6) AS adc
            FROM asg a JOIN tab t ON t.m = a.m AND t.cell = a.code
            GROUP BY t.qid, a.vec_id
        ),
        ex AS (
            SELECT q.qid, e.vec_id,
                   round(list_sum(list_transform(range(1, 65),
                       j -> (CAST(q.embedding[j] AS DOUBLE)
                             - CAST(e.embedding[j] AS DOUBLE))
                            * (CAST(q.embedding[j] AS DOUBLE)
                               - CAST(e.embedding[j] AS DOUBLE)))), 6)
                     AS exd
            FROM q CROSS JOIN embeddings e
        ),
        ra AS (SELECT qid, vec_id, adc,
                      row_number() OVER (PARTITION BY qid
                                         ORDER BY adc, vec_id) AS rk
               FROM adc),
        re AS (SELECT qid, vec_id,
                      row_number() OVER (PARTITION BY qid
                                         ORDER BY exd, vec_id) AS rk
               FROM ex),
        hits AS (
            SELECT ra.qid, count(*) AS h
            FROM ra JOIN re ON re.qid = ra.qid
                           AND re.vec_id = ra.vec_id
                           AND re.rk <= {PQ_TOPK}
            WHERE ra.rk <= {PQ_TOPK}
            GROUP BY ra.qid
        )
        SELECT r.qid,
               any_value(r.vec_id) FILTER (WHERE r.rk = 1) AS adc_top1,
               round(any_value(r.adc) FILTER (WHERE r.rk = 1), 4)
                 AS adc_d2,
               round(coalesce(any_value(h.h), 0) / {PQ_TOPK}.0, 4)
                 AS recall_at_k
        FROM ra r LEFT JOIN hits h USING (qid)
        WHERE r.rk <= {PQ_TOPK}
        GROUP BY r.qid ORDER BY r.qid
    """,
    "docs_cdc_chunks": f"""
        -- CDC hybrid oracle (the winnowing pattern): boundary policy
        -- trusted from the artifact; chunk CONTENT re-derived via
        -- md5(substr(...)) (char semantics — positions are
        -- codepoints) and the per-doc tiling invariant checked
        WITH art AS (
            SELECT doc_id, start, len, fp
            FROM read_parquet('{CDC_ORACLE_DIR}/current/*.parquet')
        ),
        chk AS (
            SELECT a.doc_id, d.lang, a.start, a.len, a.fp,
                   md5(substr(d.text, a.start + 1, a.len)) AS fp_sql,
                   lead(a.start) OVER (PARTITION BY a.doc_id
                                       ORDER BY a.start) AS nxt,
                   length(d.text) AS tl
            FROM art a JOIN documents d USING (doc_id)
        ),
        per_doc AS (
            SELECT doc_id, any_value(lang) AS lang,
                   (min(start) = 0
                    AND bool_and(nxt IS NULL OR nxt = start + len)
                    AND max(start + len) = max(tl)
                    AND bool_and(len >= 1 AND len <= 128)
                    AND bool_and(len >= 16 OR start + len = tl)
                   ) AS tiled
            FROM chk GROUP BY doc_id
        ),
        lang_docs AS (
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        ),
        lang_chunks AS (
            SELECT lang, count(*) AS n_chunks,
                   count(DISTINCT fp_sql) AS n_unique_chunks,
                   count(*) FILTER (WHERE fp = fp_sql) AS n_fp_match,
                   round(CAST(sum(len) AS DOUBLE) / count(*), 2)
                     AS avg_chunk_len
            FROM chk GROUP BY lang
        ),
        lang_tiled AS (
            SELECT lang, count(*) FILTER (WHERE tiled) AS n_tiled
            FROM per_doc GROUP BY lang
        )
        SELECT d.lang, d.n_docs, c.n_chunks, c.n_unique_chunks,
               c.n_fp_match, t.n_tiled, c.avg_chunk_len
        FROM lang_docs d JOIN lang_chunks c USING (lang)
        JOIN lang_tiled t USING (lang)
        ORDER BY d.lang
    """,
    "parts_pareto": """
        -- ranked cumulative revenue share in exact integer cents:
        -- per-line round-half-away cents, (revenue DESC, partkey)
        -- total order, pure-int64 threshold products
        WITH pr AS (
            SELECT l_partkey,
                   CAST(sum(CAST(round(l_extendedprice *
                                       (1 - l_discount) * 100)
                                 AS BIGINT)) AS BIGINT) AS c
            FROM lineitem GROUP BY l_partkey
        ),
        r AS (
            SELECT l_partkey, c,
                   sum(c) OVER (ORDER BY c DESC, l_partkey) AS cum,
                   row_number() OVER (ORDER BY c DESC, l_partkey) AS rk
            FROM pr
        ),
        t AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM pr)
        SELECT count(*) AS n_parts,
               count(*) FILTER (WHERE (cum - c) * 100 < 50 * t.total)
                 AS n_p50,
               count(*) FILTER (WHERE (cum - c) * 100 < 80 * t.total)
                 AS n_p80,
               count(*) FILTER (WHERE (cum - c) * 100 < 95 * t.total)
                 AS n_p95,
               CAST(sum(c) FILTER (WHERE rk <= 10) * 1000000 // t.total
                    AS BIGINT) AS top10_share_ppm,
               t.total AS total_cents
        FROM r CROSS JOIN t GROUP BY t.total
    """,
    "docs_blocklist": """
        -- C4 badwords gate: doc flagged when any [a-z0-9]+ token is
        -- in the list; integer-ppm rate with floor division
        WITH d AS (
            SELECT lang,
                   CAST(list_has_any(
                       list_filter(regexp_split_to_array(lower(text),
                                                         '[^a-z0-9]+'),
                                   x -> x <> ''),
                       ['dup', 'contraband', 'forbidden']) AS BIGINT)
                     AS flagged
            FROM documents
        )
        SELECT lang, count(*) AS n_docs,
               CAST(sum(flagged) AS BIGINT) AS n_flagged,
               CAST(sum(flagged) * 1000000 // count(*) AS BIGINT)
                 AS flag_ppm
        FROM d GROUP BY lang ORDER BY lang
    """,
    "events_streaks": """
        -- gaps-and-islands via the row_number difference trick; the
        -- engine computes the same runs with a numpy diff/split
        -- inside the per-user group
        WITH ud AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS day
            FROM events
        ),
        g AS (
            SELECT user_id, day,
                   day - row_number() OVER (PARTITION BY user_id
                                            ORDER BY day) AS grp
            FROM ud
        ),
        runs AS (
            SELECT user_id, count(*) AS len
            FROM g GROUP BY user_id, grp
        ),
        mx AS (SELECT user_id, max(len) AS streak FROM runs
               GROUP BY user_id)
        SELECT streak AS streak_len, count(*) AS n_users
        FROM mx GROUP BY streak ORDER BY streak
    """,
    "knn_ivfpq": f"""
        -- IVFADC, trusted-training oracle: only the written centroids
        -- and residual codebook are trusted; cell assignments,
        -- residual codes, probe sets, ADC tables, both rankings and
        -- recall@{PQ_TOPK} re-derived from raw embeddings (round-6
        -- before every argmin, lower index wins ties)
        WITH cents AS (
            SELECT cell, list(value ORDER BY j) AS c
            FROM read_parquet('{IVFPQ_ORACLE_DIR}/current/cents/*.parquet')
            GROUP BY cell
        ),
        cb AS (
            SELECT m, cell AS code, list(value ORDER BY j) AS c
            FROM read_parquet('{IVFPQ_ORACLE_DIR}/current/cb/*.parquet')
            GROUP BY m, cell
        ),
        vd AS (
            SELECT e.vec_id, ct.cell,
                   round(list_sum(list_transform(range(1, 65),
                       j -> (CAST(e.embedding[j] AS DOUBLE) - ct.c[j])
                            * (CAST(e.embedding[j] AS DOUBLE)
                               - ct.c[j]))), 6) AS d2
            FROM embeddings e CROSS JOIN cents ct
        ),
        vcell AS (
            SELECT vec_id, cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cell) AS rn
                FROM vd
            ) WHERE rn = 1
        ),
        rd AS (
            SELECT e.vec_id, cb.m, cb.code,
                   round(list_sum(list_transform(range(1, {PQ_DSUB + 1}),
                       j -> ((CAST(e.embedding[CAST(cb.m * {PQ_DSUB} + j
                                                    AS INT)] AS DOUBLE)
                              - ct.c[CAST(cb.m * {PQ_DSUB} + j AS INT)])
                             - cb.c[j])
                            * ((CAST(e.embedding[CAST(cb.m * {PQ_DSUB} + j
                                                      AS INT)] AS DOUBLE)
                                - ct.c[CAST(cb.m * {PQ_DSUB} + j AS INT)])
                               - cb.c[j]))), 6) AS d2
            FROM embeddings e
            JOIN vcell vc USING (vec_id)
            JOIN cents ct ON ct.cell = vc.cell
            CROSS JOIN cb
        ),
        vcode AS (
            SELECT vec_id, m, code FROM (
                SELECT vec_id, m, code,
                       row_number() OVER (PARTITION BY vec_id, m
                                          ORDER BY d2, code) AS rn
                FROM rd
            ) WHERE rn = 1
        ),
        q AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS qid,
                   embedding
            FROM (SELECT * FROM embeddings ORDER BY vec_id
                  LIMIT {PQ_NQ})
        ),
        qc AS (
            SELECT q.qid, ct.cell,
                   round(list_sum(list_transform(range(1, 65),
                       j -> (CAST(q.embedding[j] AS DOUBLE) - ct.c[j])
                            * (CAST(q.embedding[j] AS DOUBLE)
                               - ct.c[j]))), 6) AS d2
            FROM q CROSS JOIN cents ct
        ),
        probe AS (
            SELECT qid, cell FROM (
                SELECT qid, cell,
                       row_number() OVER (PARTITION BY qid
                                          ORDER BY d2, cell) AS rn
                FROM qc
            ) WHERE rn <= {IVFPQ_PROBE}
        ),
        probed_str AS (
            SELECT qid, string_agg(CAST(cell AS VARCHAR), ','
                                   ORDER BY cell) AS probed
            FROM probe GROUP BY qid
        ),
        tab AS (
            SELECT p.qid, p.cell, cb.m, cb.code,
                   round(list_sum(list_transform(range(1, {PQ_DSUB + 1}),
                       j -> ((CAST(q.embedding[CAST(cb.m * {PQ_DSUB} + j
                                                    AS INT)] AS DOUBLE)
                              - ct.c[CAST(cb.m * {PQ_DSUB} + j AS INT)])
                             - cb.c[j])
                            * ((CAST(q.embedding[CAST(cb.m * {PQ_DSUB} + j
                                                      AS INT)] AS DOUBLE)
                                - ct.c[CAST(cb.m * {PQ_DSUB} + j AS INT)])
                               - cb.c[j]))), 6) AS td
            FROM probe p
            JOIN q USING (qid)
            JOIN cents ct ON ct.cell = p.cell
            CROSS JOIN cb
        ),
        adc AS (
            SELECT t.qid, vc.vec_id, round(sum(t.td), 6) AS adc
            FROM vcode vc
            JOIN vcell vl USING (vec_id)
            JOIN tab t ON t.cell = vl.cell AND t.m = vc.m
                       AND t.code = vc.code
            GROUP BY t.qid, vc.vec_id
        ),
        ra AS (SELECT qid, vec_id, adc,
                      row_number() OVER (PARTITION BY qid
                                         ORDER BY adc, vec_id) AS rk
               FROM adc),
        ex AS (
            SELECT q.qid, e.vec_id,
                   round(list_sum(list_transform(range(1, 65),
                       j -> (CAST(q.embedding[j] AS DOUBLE)
                             - CAST(e.embedding[j] AS DOUBLE))
                            * (CAST(q.embedding[j] AS DOUBLE)
                               - CAST(e.embedding[j] AS DOUBLE)))), 6)
                     AS exd
            FROM q CROSS JOIN embeddings e
        ),
        re AS (SELECT qid, vec_id,
                      row_number() OVER (PARTITION BY qid
                                         ORDER BY exd, vec_id) AS rk
               FROM ex),
        hits AS (
            SELECT ra.qid, count(*) AS h
            FROM ra JOIN re ON re.qid = ra.qid
                           AND re.vec_id = ra.vec_id
                           AND re.rk <= {PQ_TOPK}
            WHERE ra.rk <= {PQ_TOPK}
            GROUP BY ra.qid
        )
        SELECT r.qid, ps.probed,
               any_value(r.vec_id) FILTER (WHERE r.rk = 1) AS adc_top1,
               round(any_value(r.adc) FILTER (WHERE r.rk = 1), 4)
                 AS adc_d2,
               round(coalesce(any_value(h.h), 0) / {PQ_TOPK}.0, 4)
                 AS recall_at_k
        FROM ra r JOIN probed_str ps USING (qid)
        LEFT JOIN hits h USING (qid)
        WHERE r.rk <= {PQ_TOPK}
        GROUP BY r.qid, ps.probed ORDER BY r.qid
    """,
    "supplier_part_division": f"""
        -- relational division: coverage of the small-{DIVISION_BRAND}
        -- divisor per supplier, top 10 by (coverage DESC, suppkey);
        -- full = the universal-quantification flag
        WITH divisor AS (
            SELECT p_partkey FROM part
            WHERE p_brand = '{DIVISION_BRAND}'
              AND p_size <= {DIVISION_SIZE_CAP}
        ),
        nd AS (SELECT count(*) AS n_divisor FROM divisor),
        cov AS (
            SELECT l_suppkey AS s_suppkey,
                   count(DISTINCT l_partkey) AS n_covered
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM divisor)
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, n_covered, nd.n_divisor,
               CAST(n_covered = nd.n_divisor AS BIGINT) AS "full"
        FROM cov CROSS JOIN nd
        ORDER BY n_covered DESC, s_suppkey LIMIT 10
    """,
    "emb_outliers": f"""
        -- embedding QC, trusted-training oracle: assignments, per-cell
        -- means and the 1.1x-mean outlier rule re-derived from raw
        -- embeddings + the written centroids (round-6 parity at the
        -- argmin, the mean and the threshold)
        WITH cents AS (
            SELECT cell, list(value ORDER BY j) AS c
            FROM read_parquet('{EMBOUT_ORACLE_DIR}/current/*.parquet')
            GROUP BY cell
        ),
        vd AS (
            SELECT e.vec_id, ct.cell,
                   round(list_sum(list_transform(range(1, 65),
                       j -> (CAST(e.embedding[j] AS DOUBLE) - ct.c[j])
                            * (CAST(e.embedding[j] AS DOUBLE)
                               - ct.c[j]))), 6) AS d2
            FROM embeddings e CROSS JOIN cents ct
        ),
        asg AS (
            SELECT vec_id, cell, d2 FROM (
                SELECT vec_id, cell, d2,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cell) AS rn
                FROM vd
            ) WHERE rn = 1
        ),
        stats AS (
            SELECT cell, count(*) AS n_vecs,
                   round(1.1 * sum(d2) / count(*), 6) AS thr,
                   round(sum(d2) / count(*), 4) AS avg_d2
            FROM asg GROUP BY cell
        )
        SELECT s.cell, s.n_vecs, s.avg_d2,
               count(*) FILTER (WHERE a.d2 > s.thr) AS n_outliers
        FROM asg a JOIN stats s USING (cell)
        GROUP BY s.cell, s.n_vecs, s.avg_d2
        ORDER BY s.cell
    """,
    "orders_monthly_growth": """
        -- MoM revenue growth, exact integer cents + ppm floor division
        WITH m AS (
            SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
                        AS BIGINT) AS month,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue_cents
            FROM orders GROUP BY 1
        )
        SELECT month, revenue_cents,
               CAST(coalesce(
                   (revenue_cents - lag(revenue_cents)
                                    OVER (ORDER BY month)) * 1000000
                   // lag(revenue_cents) OVER (ORDER BY month), 0)
                 AS BIGINT) AS growth_ppm
        FROM m ORDER BY month
    """,
    "events_dau_wau": """
        -- stickiness: distinct users per day vs the trailing-7-day
        -- distinct union; integer-ppm ratio
        WITH ud AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS day
            FROM events
        ),
        days AS (SELECT DISTINCT day FROM ud)
        SELECT d.day, count(DISTINCT u1.user_id) AS dau,
               (SELECT count(DISTINCT u7.user_id) FROM ud u7
                WHERE u7.day BETWEEN d.day - 6 AND d.day) AS wau,
               CAST(count(DISTINCT u1.user_id) * 1000000
                    // (SELECT count(DISTINCT u7.user_id) FROM ud u7
                        WHERE u7.day BETWEEN d.day - 6 AND d.day)
                 AS BIGINT) AS stickiness_ppm
        FROM days d JOIN ud u1 ON u1.day = d.day
        GROUP BY d.day ORDER BY d.day
    """,
    "docs_split": """
        -- train/valid/test holdout split: DOUBLE-round Knuth hash on
        -- doc_id (round = ((x % 2^31) * 2654435761) % 2^32; the second
        -- round decorrelates the split from mixture's sampling hash),
        -- ppm = h2 % 1e6, train < 900000 <= valid < 950000 <= test;
        -- leakage = trimmed-normalized-text groups spanning >1 split.
        -- Integer arithmetic shared verbatim with stages/splits.py;
        -- tokenization = lowercase [a-z0-9]+ runs
        WITH docs AS (
            SELECT lang,
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                     AS tnorm,
                   len(list_filter(regexp_split_to_array(lower(text),
                                                         '[^a-z0-9]+'),
                                   x -> x <> ''))::BIGINT AS n_tok,
                   ((((((doc_id % 2147483648) * 2654435761) % 4294967296)
                      % 2147483648) * 2654435761) % 4294967296) % 1000000
                     AS ppm
            FROM documents
        ),
        labeled AS (
            SELECT *, CASE WHEN ppm < 900000 THEN 'train'
                           WHEN ppm < 950000 THEN 'valid'
                           ELSE 'test' END AS split
            FROM docs
        ),
        leaky AS (
            SELECT count(*)::BIGINT AS n FROM (
                SELECT tnorm FROM labeled
                GROUP BY tnorm HAVING count(DISTINCT split) > 1
            )
        )
        SELECT lang, split, count(*) AS n_docs,
               sum(n_tok)::BIGINT AS n_tokens,
               leaky.n AS n_leaky_groups
        FROM labeled, leaky
        GROUP BY lang, split, leaky.n
        ORDER BY lang, split
    """,
    "docs_nb_classifier": """
        -- multinomial Naive Bayes, add-1 smoothing, self-trained:
        -- score(doc,c) = ln(prior_c) + sum_tok ln((cnt(c,tok)+1) /
        -- (total_c + V)) over token OCCURRENCES; per-doc scores round
        -- to 6 before the argmax (smallest-class tie-break), matching
        -- stages/nbayes.py; tokenization = lowercase [a-z0-9]+ runs
        WITH docs AS (
            SELECT doc_id, lang,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> '') AS arr
            FROM documents
        ),
        toks AS (
            SELECT doc_id, unnest(arr) AS tok
            FROM docs WHERE len(arr) > 0
        ),
        cls AS (
            SELECT d.lang AS c, t.tok, count(*)::DOUBLE AS cnt
            FROM toks t JOIN docs d USING (doc_id) GROUP BY 1, 2
        ),
        tot AS (SELECT c, sum(cnt) AS total FROM cls GROUP BY c),
        prior AS (
            SELECT lang AS c, count(*)::DOUBLE AS nd
            FROM docs GROUP BY lang
        ),
        nprior AS (SELECT sum(nd) AS n FROM prior),
        vocab AS (SELECT count(DISTINCT tok)::DOUBLE AS v FROM toks),
        doc_tok AS (
            SELECT doc_id, tok, count(*)::DOUBLE AS k
            FROM toks GROUP BY 1, 2
        ),
        tok_lp AS (
            SELECT dt.doc_id, p.c,
                   sum(dt.k * ln((coalesce(cls.cnt, 0) + 1)
                                 / (tot.total + vocab.v))) AS lp
            FROM doc_tok dt
            CROSS JOIN prior p
            JOIN tot ON tot.c = p.c
            CROSS JOIN vocab
            LEFT JOIN cls ON cls.c = p.c AND cls.tok = dt.tok
            GROUP BY 1, 2
        ),
        full_s AS (
            SELECT d.doc_id, d.lang, p.c,
                   round(ln(p.nd / np.n) + coalesce(s.lp, 0), 6) AS score
            FROM docs d
            CROSS JOIN prior p
            CROSS JOIN nprior np
            LEFT JOIN tok_lp s ON s.doc_id = d.doc_id AND s.c = p.c
        ),
        pred AS (
            SELECT lang, c AS pred_lang, score,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, c
                   ) AS rn
            FROM full_s
        )
        SELECT lang, pred_lang, count(*) AS n_docs,
               round(avg(score), 4) AS avg_score
        FROM pred WHERE rn = 1
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "docs_chunking": """
        -- context-window chunking: 64-token windows every 48 tokens;
        -- a start s is emitted while s == 0 or s < n_tok - overlap
        -- (every window adds new tokens) — realized INDEPENDENTLY of
        -- the engine's closed form via generate_series starts;
        -- tokenization = lowercase [a-z0-9]+ runs
        WITH per_doc AS (
            SELECT doc_id, lang,
                   len(list_filter(regexp_split_to_array(lower(text),
                                                         '[^a-z0-9]+'),
                                   x -> x <> ''))::BIGINT AS n_tok
            FROM documents
        ),
        chunks AS (
            SELECT doc_id,
                   unnest(range(0, greatest(n_tok - 16, 1)::BIGINT, 48))
                     AS s
            FROM per_doc WHERE n_tok > 0
        ),
        lens AS (
            SELECT c.doc_id, least(p.n_tok - c.s, 64) AS clen
            FROM chunks c JOIN per_doc p USING (doc_id)
        ),
        agg AS (
            SELECT doc_id, count(*)::BIGINT AS n_chunks,
                   sum(clen)::BIGINT AS chunk_toks,
                   max(CASE WHEN clen < 64 THEN 1 ELSE 0 END)::BIGINT
                     AS short_last
            FROM lens GROUP BY doc_id
        )
        SELECT p.lang, count(*) AS n_docs,
               coalesce(sum(a.n_chunks), 0)::BIGINT AS n_chunks,
               coalesce(sum(a.short_last), 0)::BIGINT AS n_short_last,
               sum(p.n_tok)::BIGINT AS total_tokens,
               coalesce(sum(a.chunk_toks), 0)::BIGINT
                 AS total_chunk_tokens
        FROM per_doc p LEFT JOIN agg a USING (doc_id)
        GROUP BY p.lang ORDER BY p.lang
    """,
    "events_conversion_funnel": """
        -- ordered funnel: step k = per-user min ts of step-k events
        -- STRICTLY AFTER the user's earliest step-(k-1) completion
        WITH m1 AS (
            SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        m2 AS (
            SELECT e.user_id, min(e.ts) AS t
            FROM events e JOIN m1 USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > m1.t
            GROUP BY e.user_id
        ),
        m3 AS (
            SELECT e.user_id, min(e.ts) AS t
            FROM events e JOIN m2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > m2.t
            GROUP BY e.user_id
        )
        SELECT * FROM (
            SELECT 1::BIGINT AS step_idx, 'view' AS step,
                   (SELECT count(*) FROM m1)::BIGINT AS n_users
            UNION ALL
            SELECT 2, 'click', (SELECT count(*) FROM m2)
            UNION ALL
            SELECT 3, 'purchase', (SELECT count(*) FROM m3)
        ) ORDER BY step_idx
    """,
    "docs_search_index": """
        -- conjunctive term query re-answered over the RAW documents
        -- (the engine answers it from its bucket-partitioned index
        -- with a pruned read); tokenization = lowercase [a-z0-9]+
        WITH toks AS (
            SELECT DISTINCT doc_id, unnest(
                list_filter(regexp_split_to_array(lower(text),
                                                  '[^a-z0-9]+'),
                            x -> x <> '')) AS tok
            FROM documents
        )
        SELECT a.doc_id
        FROM (SELECT doc_id FROM toks WHERE tok = 'dup') a
        JOIN (SELECT doc_id FROM toks WHERE tok = 'merge') b
          USING (doc_id)
        ORDER BY a.doc_id
    """,
    "docs_quality": """
        SELECT lang, count(*) AS n_docs,
               round(avg(
                 (CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 0.25 ELSE 0 END)
               + (CASE WHEN n_words > 0 AND (sum_wl * 1.0 / n_words) BETWEEN 3.0 AND 12.0
                       THEN 0.25 ELSE 0 END)
               + (CASE WHEN length(text) = 0
                       OR (n_punct * 1.0 / length(text)) < 0.2 THEN 0.25 ELSE 0 END)
               + (CASE WHEN n_words >= 10 THEN 0.25 ELSE 0 END)
               ), 4) AS avg_quality
        FROM (
            SELECT lang, text,
                   len(list_filter(regexp_split_to_array(text, '\\s+'),
                                   x -> x <> '')) AS n_words,
                   coalesce(list_sum(list_transform(
                       list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''),
                       x -> length(x))), 0) AS sum_wl,
                   length(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) AS n_punct
            FROM documents
        )
        GROUP BY lang
    """,
    "docs_wildcard_sources": """
        SELECT source, count(*) AS n_docs FROM documents
        WHERE regexp_matches(upper(source), '^SRC.$')
        GROUP BY source
    """,
    "docs_langid": _langid_oracle_sql(),
    # generated: n-round-unrolled BPE mirror (stages/bpe.py)
    "docs_bpe_merges": __import__(
        "ocracle_ray.stages.bpe", fromlist=["bpe_oracle_sql"]
    ).bpe_oracle_sql(BPE_N_MERGES),
    "docs_bpe_encode": __import__(
        "ocracle_ray.stages.bpe", fromlist=["bpe_encode_oracle_sql"]
    ).bpe_encode_oracle_sql(BPE_N_MERGES),
    # generated: n-iteration-unrolled fixed-point TextRank mirror
    "docs_textrank": __import__(
        "ocracle_ray.stages.textrank", fromlist=["textrank_oracle_sql"]
    ).textrank_oracle_sql(TEXTRANK_ITERS, 5),
    # generated: unrolled distributed-PageRank mirror; lag() over
    # (orderkey, linenumber) re-derives the consecutive-pair edges
    "orders_basket_rank": __import__(
        "ocracle_ray.stages.pagerank", fromlist=["pagerank_oracle_sql"]
    ).pagerank_oracle_sql(
        """li AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
                         l_partkey AS pk FROM lineitem),
        nxt AS (SELECT ok, pk,
                       lag(pk) OVER (PARTITION BY ok
                                     ORDER BY ln, pk) AS prev
                FROM li),
        cp AS (SELECT least(prev, pk) AS a, greatest(prev, pk) AS b
               FROM nxt WHERE prev IS NOT NULL AND prev <> pk),
        ew AS (SELECT a, b, count(*)::BIGINT AS w FROM cp GROUP BY a, b)""",
        PAGERANK_ITERS, 10, node_alias="part_key"),
    "docs_collocations": """
        -- PMI over the bigram event space: left/right marginals and
        -- the pair count all from ONE bigram table; expression shape
        -- (n·N double / cl·cr double, ln, round 6 BEFORE ranking)
        -- mirrors stages/colloc.py exactly; tokenization = lowercase
        -- [a-z0-9]+ runs; ties on (term_a, term_b) ASC
        WITH docs AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> '') AS arr
            FROM documents
        ),
        toks AS (
            SELECT doc_id, unnest(arr) AS tok,
                   unnest(range(1, len(arr) + 1)) AS pos
            FROM docs WHERE len(arr) > 0
        ),
        pairs AS (
            SELECT tok,
                   lag(tok) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS prev
            FROM toks
        ),
        bg AS (SELECT prev, tok, count(*)::BIGINT AS n FROM pairs
               WHERE prev IS NOT NULL GROUP BY prev, tok),
        lf AS (SELECT prev, sum(n)::BIGINT AS cl FROM bg GROUP BY prev),
        rf AS (SELECT tok, sum(n)::BIGINT AS cr FROM bg GROUP BY tok),
        nn AS (SELECT sum(n)::BIGINT AS total FROM bg),
        sc AS (
            SELECT b.prev AS term_a, b.tok AS term_b, b.n AS n_pair,
                   round(ln((b.n::DOUBLE * nn.total)
                            / (lf.cl::DOUBLE * rf.cr)), 6) AS pmi
            FROM bg b
            JOIN lf ON lf.prev = b.prev
            JOIN rf ON rf.tok = b.tok
            CROSS JOIN nn
            WHERE b.n >= 5
        ),
        ranked AS (
            SELECT term_a, term_b, n_pair, pmi,
                   row_number() OVER (ORDER BY pmi DESC, term_a, term_b)
                       AS rk
            FROM sc
        )
        SELECT rk, term_a, term_b, n_pair, pmi
        FROM ranked WHERE rk <= 10 ORDER BY rk
    """,
    "events_transitions": """
        -- first-order Markov matrix per user sequence; (ts, event_id)
        -- is a total order so lag() is unambiguous; p_ppm = integer
        -- floor (n·1e6 // row_total), shared verbatim with the engine
        WITH seq AS (
            SELECT event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events
        ),
        tr AS (
            SELECT prev AS prev_type, event_type AS next_type,
                   count(*)::BIGINT AS n_trans
            FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
        ),
        tot AS (SELECT prev_type, sum(n_trans)::BIGINT AS tot
                FROM tr GROUP BY prev_type)
        SELECT t.prev_type, t.next_type, t.n_trans,
               ((t.n_trans * 1000000) // tot.tot)::BIGINT AS p_ppm
        FROM tr t JOIN tot USING (prev_type)
        ORDER BY t.prev_type, t.next_type
    """,
    "events_quantile_sketch": """
        -- hybrid artifact oracle: the sketch ESTIMATES come from the
        -- written parquet (only the compaction is trusted); the true
        -- rank of each estimate, the integer target rank and the
        -- error gate are re-derived here from raw rows independently
        WITH est AS (
            SELECT q_pm, est FROM read_parquet(
                '/tmp/ocracle_qsketch_oracle/current/*.parquet')
        ),
        nn AS (SELECT count(*)::BIGINT AS n FROM events),
        tr AS (
            SELECT e.q_pm, e.est,
                   (SELECT count(*) FROM events ev
                    WHERE ev.value <= e.est)::BIGINT AS true_rank
            FROM est e
        )
        SELECT t.q_pm, t.est,
               ((t.q_pm * nn.n + 999) // 1000)::BIGINT AS target_rank,
               t.true_rank, nn.n AS n,
               (abs(t.true_rank - ((t.q_pm * nn.n + 999) // 1000)) * 100
                <= nn.n) AS within_1pct
        FROM tr t CROSS JOIN nn ORDER BY t.q_pm
    """,
    "pages_snapshot_delta": """
        -- strong artifact oracle: raw PRE-dedup fingerprint rows of
        -- both snapshots are written; SQL re-derives keep-latest (ts
        -- DESC, fp DESC — the engine's exact tie-break, null ts ≡
        -- epoch 0 always-loser), the full-outer url diff, the status
        -- rule and the per-status census. Only the blake2b content
        -- fingerprint is trusted from the artifact.
        WITH raw AS (
            SELECT side, url,
                   coalesce(warc_ts, TIMESTAMP '1970-01-01') AS ts, fp
            FROM read_parquet(
                '/tmp/ocracle_snapdelta_oracle/current/*.parquet')
        ),
        win AS (
            SELECT side, url, fp FROM (
                SELECT side, url, fp,
                       row_number() OVER (PARTITION BY side, url
                                          ORDER BY ts DESC, fp DESC)
                           AS rn
                FROM raw) WHERE rn = 1
        ),
        a AS (SELECT url, fp FROM win WHERE side = 'a'),
        b AS (SELECT url, fp FROM win WHERE side = 'b'),
        d AS (
            SELECT CASE WHEN a.url IS NULL THEN 'added'
                        WHEN b.url IS NULL THEN 'removed'
                        WHEN a.fp = b.fp THEN 'unchanged'
                        ELSE 'changed' END AS status,
                   coalesce(b.fp, a.fp) AS fp_latest
            FROM a FULL OUTER JOIN b ON a.url = b.url
        )
        SELECT status, count(*)::BIGINT AS n_urls,
               bit_xor(fp_latest)::BIGINT AS fp_xor
        FROM d GROUP BY status ORDER BY status
    """,
    "pages_boilerplate": """
        -- strong artifact oracle: per-block hash rows written before
        -- any frequency logic; SQL re-derives occurrence counts, the
        -- ≥5 frequent set, the drop rule and the per-branch census —
        -- only the blake2b text hash is trusted from the artifact
        WITH blk AS (
            SELECT url, branch, h, n_chars FROM read_parquet(
                '/tmp/ocracle_boiler_oracle/current/*.parquet')
        ),
        freq AS (
            SELECT h FROM (SELECT h, count(*) AS c FROM blk GROUP BY h)
            WHERE c >= 5
        ),
        marked AS (
            SELECT b.branch, b.h, b.n_chars,
                   (f.h IS NOT NULL) AS is_boiler
            FROM blk b LEFT JOIN freq f ON b.h = f.h
        )
        SELECT branch, count(*)::BIGINT AS n_blocks,
               sum(CASE WHEN is_boiler THEN 1 ELSE 0 END)::BIGINT
                   AS n_dropped,
               coalesce(sum(CASE WHEN NOT is_boiler THEN n_chars END),
                        0)::BIGINT AS kept_chars,
               coalesce(bit_xor(CASE WHEN NOT is_boiler THEN h END),
                        0)::BIGINT AS fp_xor_kept
        FROM marked GROUP BY branch ORDER BY branch
    """,
    "docs_samples": """
    WITH ranked AS (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY lang
               -- ((id % 2^31) * (2654435761 % 2^31)) % 2^31 equals the
               -- engine's uint64-wraparound (id*2654435761) % 2^31 for
               -- any non-negative id (2^31 divides 2^64), and the
               -- product stays < 2^63 so BIGINT never overflows
               ORDER BY ((doc_id % 2147483648) * 506952113) % 2147483648, doc_id
             ) AS rn,
             count(*) OVER (PARTITION BY lang) AS n_s
      FROM documents
    )
    SELECT 'hash_mod10' AS method, lang, count(*) AS n_sampled,
           CAST(sum(n_chars) AS BIGINT) AS chars_sampled
    FROM documents WHERE doc_id % 10 = 0
    GROUP BY lang
    UNION ALL
    SELECT 'stratified10pct' AS method, lang, count(*) AS n_sampled,
           CAST(sum(n_chars) AS BIGINT) AS chars_sampled
    FROM ranked WHERE rn <= ceil(0.1 * n_s)
    GROUP BY lang
    ORDER BY method, lang
""",
    "events_heavy_hitters": """
    SELECT event_type, count(*) AS n_events
    FROM events
    GROUP BY event_type
    HAVING count(*) > (SELECT count(*) FROM events) / 8.0
    ORDER BY n_events DESC, event_type
""",
    "docs_numeric_sort": """
        SELECT source,
               row_number() OVER (
                   ORDER BY CAST(coalesce(nullif(regexp_extract(source, '[0-9]+'), ''), '9223372036854775807') AS BIGINT),
                            source
               ) AS rk
        FROM (SELECT DISTINCT source FROM documents)
    """,
    "knn_bruteforce": """
        SELECT e.vec_id,
               round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            CAST(q.embedding AS DOUBLE[])), 6) AS cosine
        FROM embeddings e,
             (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        WHERE e.vec_id <> 0
        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id
        LIMIT 10
    """,
    "knn_ivf": """
        -- artifact oracle (round 4): the query writes the per-vector
        -- (cell, probed) assignment before returning; DuckDB
        -- re-executes the PARTIAL-PROBE SEARCH itself — cosine over
        -- the real embeddings view restricted to probed cells,
        -- (cosine DESC, vec_id ASC) top-k, rank — and re-measures the
        -- recall against an in-SQL brute force. Only the k-means cell
        -- assignment (no SQL mirror) is trusted from the artifact.
        WITH q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id = 0
        ), scored AS (
            SELECT e.vec_id,
                   list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS cos
            FROM embeddings e, q WHERE e.vec_id <> 0
        ), part AS (
            SELECT s.vec_id, s.cos,
                   row_number() OVER (ORDER BY s.cos DESC, s.vec_id) AS rk
            FROM scored s
            JOIN read_parquet('/tmp/ocracle_ivf_oracle/current/*.parquet') a
              ON s.vec_id = a.vec_id
            WHERE a.probed
        ), brute AS (
            SELECT vec_id FROM scored ORDER BY cos DESC, vec_id LIMIT 10
        ), rec AS (
            SELECT round(count(*) * 1.0 /
                         greatest((SELECT count(*) FROM brute), 1), 4) AS recall
            FROM part JOIN brute USING (vec_id) WHERE part.rk <= 10
        )
        SELECT p.vec_id, round(p.cos, 6) AS cosine,
               p.rk AS "rank", CAST(2 AS BIGINT) AS n_probe,
               rec.recall AS recall_vs_brute
        FROM part p, rec WHERE p.rk <= 10 ORDER BY "rank"
    """,
    "embeddings_label_stats": """
        SELECT label, count(*) AS n_vecs,
               round(sum(embedding[1]), 4) AS sum_dim0
        FROM embeddings GROUP BY label
    """,
    "orders_lineitem_revenue": """
        SELECT o.o_orderpriority,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderpriority
    """,
    "customers_without_big_orders": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
    """,
    "parts_in_lineitem": """
        SELECT p_brand, count(*) AS n_parts FROM part p
        WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
        GROUP BY p_brand
    """,
    "events_asof_prev_click": """
        -- per-user summary of the parquet-streamed as-of rows: count
        -- plus id checksums verify the per-purchase join exactly
        -- without the full result ever landing on the driver
        WITH pairs AS (
            SELECT a.user_id, a.event_id, b.event_id AS prev_click_id
            FROM (SELECT * FROM events WHERE event_type = 'purchase') a
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') b
              ON a.user_id = b.user_id AND a.ts > b.ts
        )
        SELECT user_id, count(*) AS n_resolved,
               CAST(sum(event_id) AS BIGINT) AS sum_event_id,
               CAST(sum(prev_click_id) AS BIGINT) AS sum_prev_click_id
        FROM pairs GROUP BY user_id ORDER BY user_id
    """,
    "events_props_k": """
        SELECT event_type,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               count(*) AS n_events
        FROM events GROUP BY event_type
    """,
    "distinct_counts": """
        SELECT
            event_type,
            count(DISTINCT user_id) AS n_users_type,
            (SELECT count(DISTINCT key) FROM (
                SELECT o_custkey AS key FROM orders
                UNION ALL SELECT c_custkey AS key FROM customer
            )) AS n_keys,
            (SELECT count(DISTINCT user_id) FROM events) AS n_users
        FROM events GROUP BY event_type
    """,
    "events_range_join_views": """
        SELECT c.event_id, c.user_id, c.ts,
               (SELECT count(*) FROM events v
                WHERE v.user_id = c.user_id AND v.event_type = 'view'
                  AND v.ts BETWEEN c.ts - INTERVAL 1 HOUR AND c.ts
               ) AS n_views_1h
        FROM events c
        WHERE c.event_type = 'click'
    """,
    "top_users_per_event_type": """
        SELECT event_type, user_id, round(total_value, 4) AS total_value, rk
        FROM (
            SELECT event_type, user_id, sum(value) AS total_value,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY sum(value) DESC, user_id
                   ) AS rk
            FROM events GROUP BY event_type, user_id
        ) WHERE rk <= 3
    """,
    "docs_ngram_neardup": _SHINGLE_JACCARD_SQL,
    # same oracle: the LSH parameters make recall indistinguishable from 1
    "docs_minhash_neardup": _SHINGLE_JACCARD_SQL,
    # the incremental BandIndex path must converge to the same pairs
    "docs_incremental_neardup": _SHINGLE_JACCARD_SQL,
    "docs_neardup_clusters": f"""
        WITH RECURSIVE pairs AS ({_SHINGLE_JACCARD_SQL}),
        nodes AS (SELECT DISTINCT x AS node FROM
                  (SELECT a AS x FROM pairs UNION SELECT b AS x FROM pairs)),
        edges AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
        walk(node, label) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.b AS node, w.label FROM walk w JOIN edges e ON e.a = w.node
            WHERE w.label < e.b
        )
        SELECT CAST(node AS BIGINT) AS doc_id,
               CAST(min(label) AS BIGINT) AS cluster_id
        FROM walk GROUP BY node
    """,
    "emb_semantic_dedup": """
        -- SemDeDup artifact oracle: the engine's (vec_id, cell) map
        -- is trusted (k-means); pairs, components and stats are
        -- re-derived from the RAW embeddings view
        WITH RECURSIVE cellmap AS (
            SELECT vec_id, cell FROM read_parquet(
                '/tmp/ocracle_semdedup_oracle/current/*.parquet')
        ),
        pairs AS (
            SELECT c1.cell, e1.vec_id AS a, e2.vec_id AS b
            FROM embeddings e1
            JOIN cellmap c1 ON c1.vec_id = e1.vec_id
            JOIN cellmap c2 ON c2.cell = c1.cell
                           AND c2.vec_id > c1.vec_id
            JOIN embeddings e2 ON e2.vec_id = c2.vec_id
            WHERE list_cosine_similarity(
                      CAST(e1.embedding AS DOUBLE[]),
                      CAST(e2.embedding AS DOUBLE[])) >= 0.35
        ),
        nodes AS (SELECT DISTINCT x AS node FROM
                  (SELECT a AS x FROM pairs UNION SELECT b FROM pairs)),
        edges AS (SELECT a, b FROM pairs
                  UNION SELECT b AS a, a AS b FROM pairs),
        walk(node, label) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.b AS node, w.label FROM walk w
            JOIN edges e ON e.a = w.node
            WHERE w.label < e.b
        ),
        comp AS (SELECT node, min(label) AS rep FROM walk GROUP BY node),
        rem AS (
            SELECT cm.cell, count(*)::BIGINT AS n_removed
            FROM comp JOIN cellmap cm ON cm.vec_id = comp.node
            WHERE comp.node <> comp.rep GROUP BY cm.cell
        ),
        pcnt AS (SELECT cell, count(*)::BIGINT AS n_pairs
                 FROM pairs GROUP BY cell)
        SELECT cm.cell::BIGINT AS cell, count(*)::BIGINT AS n_vecs,
               coalesce(any_value(pcnt.n_pairs), 0)::BIGINT AS n_pairs,
               coalesce(any_value(rem.n_removed), 0)::BIGINT AS n_removed
        FROM cellmap cm
        LEFT JOIN pcnt USING (cell) LEFT JOIN rem USING (cell)
        GROUP BY cm.cell ORDER BY cell
    """,
    "emb_label_neardup": """
        SELECT e1.vec_id AS a, e2.vec_id AS b,
               round(list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]),
                                            CAST(e2.embedding AS DOUBLE[])), 6) AS cosine
        FROM embeddings e1
        JOIN embeddings e2 ON e1.label = e2.label AND e1.vec_id < e2.vec_id
        WHERE list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]),
                                     CAST(e2.embedding AS DOUBLE[])) >= 0.4
    """,
    "salted_events_value": """
        WITH s AS (
            SELECT event_type, round(sum(value), 4) AS total_value
            FROM events GROUP BY event_type
        ), j AS (
            SELECT e.event_type,
                   count(*) AS joined_rows,
                   round(sum(c.c_acctbal), 2) AS acctbal_sum
            FROM events e JOIN customer c ON e.user_id = c.c_custkey
            GROUP BY e.event_type
        )
        SELECT s.event_type, s.total_value,
               coalesce(j.joined_rows, 0) AS joined_rows,
               coalesce(j.acctbal_sum, 0.0) AS acctbal_sum
        FROM s LEFT JOIN j USING (event_type)
    """,
    "docs_simhash_dups": """
        -- artifact-verified brute force (round 4): the query writes
        -- each doc's simhash64 before returning; DuckDB independently
        -- re-derives the FULL hamming<=3 pair set by exact all-pairs
        -- popcount over the written hashes, verifying the pigeonhole
        -- band trick's exactness claim. Only the token-multiset
        -- hashing itself (no SQL mirror) is trusted from the artifact.
        WITH h AS (
            SELECT doc_id, simhash
            FROM read_parquet('/tmp/ocracle_simhash_oracle/current/*.parquet')
        )
        SELECT x.doc_id AS a, y.doc_id AS b,
               CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
        FROM h x JOIN h y ON x.doc_id < y.doc_id
        WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
        ORDER BY a, b
    """,
    "pdf_branch": """
        -- artifact oracle (round 4): the query writes its per-doc rows
        -- before returning; DuckDB re-aggregates independently AND
        -- re-derives each real doc's codec variant from the url's
        -- trailing digits with the same modular dispatch the fixture
        -- builder uses (i%3==2 xrefstm, else i%5==4 encrypted, else
        -- i%5==2 scanned, else plain). fp_xor pins extracted-text byte
        -- identity per codec branch.
        WITH p AS (
            SELECT *,
                   CASE WHEN src = 'ocrsyn' THEN 'synthetic'
                        WHEN CAST(regexp_extract(url, '([0-9]+)$', 1) AS BIGINT) % 3 = 2 THEN 'xrefstm'
                        WHEN CAST(regexp_extract(url, '([0-9]+)$', 1) AS BIGINT) % 5 = 4 THEN 'encrypted'
                        WHEN CAST(regexp_extract(url, '([0-9]+)$', 1) AS BIGINT) % 5 = 2 THEN 'scanned'
                        ELSE 'plain' END AS variant
            FROM read_parquet('/tmp/ocracle_pdf_oracle/current/*.parquet')
        )
        SELECT src, variant, count(*) AS n_docs,
               CAST(count(*) FILTER (error <> '') AS BIGINT) AS n_err,
               CAST(sum(n_blocks) AS BIGINT) AS n_blocks_sum,
               CAST(sum(n_tasks) AS BIGINT) AS n_tasks_sum,
               CAST(sum(points_total) AS BIGINT) AS points_sum,
               CAST(bit_xor(coalesce(text_fingerprint, 0)) AS BIGINT) AS fp_xor
        FROM p GROUP BY src, variant ORDER BY src, variant
    """,
    "media_features": """
        -- artifact oracle (round 4): each multimodal stage writes its
        -- per-row metric before the query returns; DuckDB re-counts
        -- and re-sums the files independently (decode row counts pin
        -- the no-skip-rows claim for every appended real-codec fixture).
        SELECT sink AS kind, count(*) AS n_rows,
               round(sum(metric), 4) AS metric_sum
        FROM read_parquet('/tmp/ocracle_media_oracle/current/*/*.parquet')
        GROUP BY sink ORDER BY kind
    """,
    "figure_pixel_crops": """
        -- artifact oracle (round 4): per-crop census rows are written
        -- before the query returns; DuckDB re-aggregates independently.
        SELECT action, reason,
               CAST(sum(n) AS BIGINT) AS n_crops,
               CAST(sum(saved_bytes) AS BIGINT) AS saved_bytes
        FROM read_parquet('/tmp/ocracle_figures_oracle/current/*.parquet')
        GROUP BY action, reason ORDER BY action, reason
    """,
    "webview_tasks": """
        -- artifact oracle (round 4): the query writes the UNFILTERED
        -- exploded task rows (with per-url seq) before returning;
        -- DuckDB independently reproduces the viewer's version filter,
        -- the numeric-aware sort (first integer, then the raw string —
        -- same expression as docs_numeric_sort) and the rank.
        SELECT subject, exam_version, url, task_number, points, topic,
               row_number() OVER (ORDER BY
                   subject, exam_version, url,
                   CAST(coalesce(nullif(regexp_extract(task_number, '[0-9]+'), ''), '9223372036854775807') AS BIGINT),
                   task_number, seq) AS rk
        FROM read_parquet('/tmp/ocracle_webview_oracle/current/*.parquet')
        WHERE exam_version IN ('V23', 'H24')
    """,
    "pages_census": """
        -- artifact oracle (round 4, flagship pattern): the query
        -- writes the exploded block rows and the suppressed figure
        -- rows before returning; DuckDB re-aggregates both censuses
        -- independently of Ray's distributed groupbys.
        SELECT 'block_kind' AS section, kind AS key,
               count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM read_parquet('/tmp/ocracle_census_oracle/blocks/*.parquet')
        GROUP BY kind
        UNION ALL
        SELECT 'figures_per_url', url, count(*), 0
        FROM read_parquet('/tmp/ocracle_census_oracle/figures/*.parquet')
        GROUP BY url
        ORDER BY section, key
    """,
    "docs_winnowing": """
        -- hybrid artifact oracle (round 4): the query writes each
        -- doc's raw gram-hash sequence; the winnowing SELECTION itself
        -- (rightmost-min per 16-window, consecutive-position dedup) is
        -- re-implemented here independently of the numpy form. The
        -- combined key h*2^22 + (2^22-1-pos) makes MIN pick the min
        -- hash with the RIGHTMOST position on ties; h < 2^61 so the
        -- product needs HUGEINT. Winnowing's selected positions are
        -- non-decreasing, so the lag()-dedup equals the numpy
        -- consecutive-index dedup exactly.
        WITH g AS (
            SELECT doc_id, lang, pos, h, kind
            FROM read_parquet('/tmp/ocracle_winnow_oracle/current/*.parquet')
        ), counted AS (
            SELECT *, count(*) OVER (PARTITION BY doc_id) AS n_grams
            FROM g WHERE kind = 'gram'
        ), sel AS (
            SELECT doc_id, lang, pos AS win_end,
                   min(CAST(h AS HUGEINT) * 4194304 + (4194303 - pos)) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS skey
            FROM counted WHERE n_grams > 16
            QUALIFY pos >= 15
        ), kept AS (
            SELECT doc_id, lang, win_end,
                   CAST(skey // 4194304 AS BIGINT) AS sel_h,
                   CAST(4194303 - (skey % 4194304) AS BIGINT) AS sel_pos
            FROM sel
        ), dedup AS (
            SELECT doc_id, lang, sel_h FROM (
                SELECT *, lag(sel_pos) OVER (
                    PARTITION BY doc_id ORDER BY win_end) AS prev_pos
                FROM kept)
            WHERE prev_pos IS NULL OR sel_pos <> prev_pos
        ), perdoc AS (
            SELECT doc_id, lang, count(*) AS n_fp,
                   count(DISTINCT sel_h) AS n_fp_distinct
            FROM dedup GROUP BY doc_id, lang
            UNION ALL  -- 1 <= n_grams <= w: single min fingerprint
            SELECT doc_id, lang, 1, 1
            FROM counted WHERE n_grams <= 16 GROUP BY doc_id, lang
            UNION ALL  -- normalized text shorter than k: whole-doc fp
            SELECT doc_id, lang, 1, 1 FROM g WHERE kind = 'fallback'
            UNION ALL  -- empty normalized text: doc counts, zero fps
            SELECT doc_id, lang, 0, 0 FROM g WHERE kind = 'empty'
        )
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_fp) AS BIGINT) AS total_fp,
               CAST(sum(n_fp_distinct) AS BIGINT) AS total_fp_distinct
        FROM perdoc GROUP BY lang ORDER BY lang
    """,
    "extract_flagship": """
        -- artifact oracle (round 4): the query WRITES its per-record
        -- summary to this deterministic path before returning; DuckDB
        -- re-aggregates the written parquet independently of Ray's
        -- aggregation. The extraction itself has no SQL mirror (pages
        -- are synthesized, FIXTURES.md T1) — this verifies the sink:
        -- counts, block/task/points/char sums and the fingerprint XOR
        -- that pins extracted-text byte identity per group.
        SELECT lang, branch,
               count(*) AS n_records,
               CAST(sum(n_blocks) AS BIGINT) AS n_blocks_sum,
               CAST(sum(n_tasks) AS BIGINT) AS n_tasks_sum,
               CAST(sum(points_total) AS BIGINT) AS points_sum,
               CAST(sum(n_chars) AS BIGINT) AS n_chars_sum,
               CAST(bit_xor(text_fingerprint) AS BIGINT) AS fp_xor
        FROM read_parquet('/tmp/ocracle_flagship_oracle/current/*.parquet')
        GROUP BY lang, branch ORDER BY lang, branch
    """,
    "parts_skyline": """
        -- skyline / Pareto frontier: parts no other part dominates on
        -- (price low, size high); ties on both axes survive
        WITH p AS (
            SELECT p_partkey,
                   CAST(round(p_retailprice * 100) AS BIGINT)
                     AS price_cents,
                   CAST(p_size AS BIGINT) AS p_size
            FROM part
        )
        SELECT p_partkey, price_cents, p_size
        FROM p a
        WHERE NOT EXISTS (
            SELECT 1 FROM p b
            WHERE b.price_cents <= a.price_cents
              AND b.p_size >= a.p_size
              AND (b.price_cents < a.price_cents
                   OR b.p_size > a.p_size)
        )
        ORDER BY p_partkey
    """,
    "events_value_corr": """
        -- grouped Pearson r + OLS slope from the SAME integer
        -- sufficient statistics the engine folds (cents x hour), with
        -- the identical float expression shape after the exact sums
        WITH s AS (
            SELECT event_type,
                   count(*)::BIGINT AS n,
                   sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                   sum(x * y)::BIGINT AS sxy,
                   sum(x * x)::BIGINT AS sxx,
                   sum(y * y)::BIGINT AS syy
            FROM (
                SELECT event_type,
                       (epoch_us(ts) % 86400000000) // 3600000000 AS x,
                       CAST(round(value * 100) AS BIGINT) AS y
                FROM events
            )
            GROUP BY event_type
        )
        SELECT event_type, n,
               round((n::DOUBLE * sxy - sx::DOUBLE * sy)
                     / (n::DOUBLE * sxx - sx::DOUBLE * sx), 6)
                 AS slope_cents_per_hour,
               round((n::DOUBLE * sxy - sx::DOUBLE * sy)
                     / sqrt((n::DOUBLE * sxx - sx::DOUBLE * sx)
                            * (n::DOUBLE * syy - sy::DOUBLE * sy)), 6)
                 AS pearson_r
        FROM s ORDER BY event_type
    """,
    "orders_brand_affinity": """
        -- market-basket association rules at k=2: brand pairs
        -- co-purchased in one order; support/confidence/lift in
        -- integer ppm (floor division; every operand positive)
        WITH ob AS (
            SELECT DISTINCT l_orderkey AS ord, p_brand AS brand
            FROM lineitem JOIN part ON l_partkey = p_partkey
        ),
        n AS (SELECT count(DISTINCT ord) AS n_orders FROM ob),
        marg AS (SELECT brand, count(*) AS c FROM ob GROUP BY brand),
        pairs AS (
            SELECT a.brand AS brand_a, b.brand AS brand_b,
                   count(*) AS n_both
            FROM ob a JOIN ob b
              ON a.ord = b.ord AND a.brand < b.brand
            GROUP BY 1, 2
        )
        SELECT brand_a, brand_b,
               CAST(n_both AS BIGINT) AS n_orders_both,
               CAST(n_both * 1000000 // n_orders AS BIGINT)
                 AS support_ppm,
               CAST(n_both * 1000000 // ma.c AS BIGINT)
                 AS conf_a_to_b_ppm,
               CAST(n_both * n_orders * 1000000 // (ma.c * mb.c)
                 AS BIGINT) AS lift_ppm
        FROM pairs
        JOIN marg ma ON ma.brand = brand_a
        JOIN marg mb ON mb.brand = brand_b
        CROSS JOIN n
        ORDER BY lift_ppm DESC, brand_a, brand_b
        LIMIT 15
    """,
    "customer_rfm": """
        -- RFM quintile segmentation: exact integer bucket rule
        -- (rank-1)*5 // n over the (metric, custkey) total order
        WITH c AS (
            SELECT o_custkey AS cust,
                   max(epoch_us(o_orderdate) // 86400000000)
                     AS last_day,
                   count(*) AS freq,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS monetary
            FROM orders GROUP BY 1
        ),
        b AS (
            SELECT monetary,
                   (row_number() OVER (ORDER BY last_day, cust) - 1)
                     * 5 // (SELECT count(*) FROM c) AS r_bucket,
                   (row_number() OVER (ORDER BY freq, cust) - 1)
                     * 5 // (SELECT count(*) FROM c) AS f_bucket,
                   (row_number() OVER (ORDER BY monetary, cust) - 1)
                     * 5 // (SELECT count(*) FROM c) AS m_bucket
            FROM c
        )
        SELECT CAST(r_bucket AS BIGINT) AS r_bucket,
               CAST(f_bucket AS BIGINT) AS f_bucket,
               CAST(m_bucket AS BIGINT) AS m_bucket,
               count(*) AS n_customers,
               CAST(sum(monetary) AS BIGINT) AS monetary_cents
        FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "events_dau_wau_hll": _hll_window_oracle_sql(),
    "emb_similarity_triangles": """
        -- triangle census of the cosine>=0.3 similarity graph;
        -- round-6 BEFORE the threshold on both sides (ULP immunity)
        WITH e AS (
            SELECT e1.vec_id AS a, e2.vec_id AS b
            FROM embeddings e1
            JOIN embeddings e2 ON e1.vec_id < e2.vec_id
            WHERE round(list_cosine_similarity(
                      CAST(e1.embedding AS DOUBLE[]),
                      CAST(e2.embedding AS DOUBLE[])), 6) >= 0.3
        ),
        deg AS (
            SELECT v, count(*) AS d FROM (
                SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e
            ) GROUP BY v
        ),
        tri AS (
            SELECT count(*)::BIGINT AS t FROM e e1
            JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        )
        SELECT count(*)::BIGINT AS n_nodes,
               (SELECT count(*) FROM e)::BIGINT AS n_edges,
               (SELECT t FROM tri) AS n_triangles,
               CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges,
               CASE WHEN sum(d * (d - 1) // 2) > 0
                    THEN CAST(3 * (SELECT t FROM tri) * 1000000
                              // sum(d * (d - 1) // 2) AS BIGINT)
                    ELSE 0 END AS global_cc_ppm
        FROM deg
    """,
    "docs_weighted_sample": """
        -- PPS systematic sample: Knuth-hash order, window cumsum,
        -- pick multiplicity cum//step - (cum-w)//step — all integer
        WITH d AS (
            SELECT doc_id, lang, n_chars::BIGINT AS w,
                   ((doc_id % 2147483648) * 2654435761) % 4294967296
                     AS h
            FROM documents
        ),
        c AS (
            SELECT doc_id, lang, w,
                   sum(w) OVER (ORDER BY h, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   (SELECT sum(w) // 20 FROM d) AS step
            FROM d
        )
        SELECT doc_id, lang, w,
               CAST(cum // step - (cum - w) // step AS BIGINT)
                 AS n_picks
        FROM c
        WHERE cum // step - (cum - w) // step >= 1
        ORDER BY doc_id
    """,
    "events_join_size_cms": _cms_join_oracle_sql(),
    "events_user_gini": """
        -- Gini of per-user spend, exact integer rank-weighted form;
        -- HUGEINT: 2·Σi·w · 10^6 overflows BIGINT at bench scale
        WITH u AS (
            SELECT user_id,
                   sum(CAST(round(value * 100) AS BIGINT)) AS w
            FROM events GROUP BY user_id
        ),
        r AS (
            SELECT w, row_number() OVER (ORDER BY w, user_id) AS i
            FROM u
        ),
        s AS (
            SELECT count(*)::HUGEINT AS n, sum(w)::HUGEINT AS total,
                   sum(i::HUGEINT * w::HUGEINT) AS iw
            FROM r
        )
        SELECT n::BIGINT AS n_users, total::BIGINT AS total_cents,
               CAST((2 * iw - (n + 1) * total) * 1000000
                    // (n * total) AS BIGINT) AS gini_ppm
        FROM s
    """,
    "events_type_drift": """
        -- per-day KL(day mix || corpus mix) from exact integer counts
        WITH c AS (
            SELECT epoch_us(ts) // 86400000000 AS day, event_type,
                   count(*)::BIGINT AS n
            FROM events GROUP BY 1, 2
        ),
        tot AS (SELECT event_type, sum(n)::BIGINT AS ct FROM c
                GROUP BY 1),
        bign AS (SELECT sum(n)::BIGINT AS bn FROM c),
        d AS (SELECT day, sum(n)::BIGINT AS nd FROM c GROUP BY 1)
        SELECT CAST(c.day AS BIGINT) AS day, d.nd AS n_events,
               round(sum((c.n::DOUBLE / d.nd::DOUBLE)
                         * ln(c.n::DOUBLE * bn::DOUBLE
                              / (d.nd::DOUBLE * tot.ct::DOUBLE))), 6)
                 AS kl_nats
        FROM c JOIN d USING (day) JOIN tot USING (event_type)
        CROSS JOIN bign
        GROUP BY c.day, d.nd ORDER BY day
    """,
    "events_decayed_revenue": """
        -- dyadic-exact decayed counters: weight(age d) = 2^(20-d) as
        -- a BIGINT shift; ages > 20 days contribute exactly 0
        WITH c AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   sum(CAST(round(value * 100) AS BIGINT)) AS c
            FROM events GROUP BY 1, 2
        ),
        t AS (SELECT max(day) AS td FROM c)
        SELECT event_type,
               sum(c * (1::BIGINT << (20 - (td - day))))::BIGINT
                 AS decayed_scaled,
               round(sum(c * (1::BIGINT << (20 - (td - day))))::DOUBLE
                     / 1048576.0, 4) AS decayed_cents
        FROM c CROSS JOIN t
        WHERE td - day <= 20
        GROUP BY event_type ORDER BY event_type
    """,
    "pages_time_travel": """
        -- strong artifact oracle (snapshot_delta pattern): the raw
        -- multi-version observation rows AND the as-of cut list are
        -- written; SQL re-derives every reconstruction (keep-latest
        -- per url at each cut, the engine's (ts DESC, fp DESC)
        -- tie-break) and the per-generation census — only the blake2b
        -- fingerprint is trusted from the artifact
        WITH rows AS (
            SELECT * FROM read_parquet(
                '/tmp/ocracle_timetravel_oracle/current/rows/*.parquet')
        ),
        cuts AS (
            SELECT * FROM read_parquet(
                '/tmp/ocracle_timetravel_oracle/current/asof/*.parquet')
        ),
        ranked AS (
            SELECT c.as_of, r.url, r.side, r.fp,
                   row_number() OVER (
                       PARTITION BY c.as_of, r.url
                       ORDER BY r.ts_us DESC, r.fp DESC) AS rn
            FROM cuts c JOIN rows r ON r.ts_us <= c.as_of_us
        )
        SELECT as_of, count(*) AS n_urls,
               CAST(bit_xor(fp) AS BIGINT) AS fp_xor,
               count(*) FILTER (WHERE side = 'v1') AS n_v1,
               count(*) FILTER (WHERE side = 'v2') AS n_v2,
               count(*) FILTER (WHERE side = 'v3') AS n_v3
        FROM ranked WHERE rn = 1
        GROUP BY as_of ORDER BY as_of
    """,
    "events_audience_bitmap": """
        -- boolean audience segments re-derived as relational set
        -- algebra over the identical distinct user sets
        WITH c AS (SELECT DISTINCT user_id FROM events
                   WHERE event_type = 'click'),
        p AS (SELECT DISTINCT user_id FROM events
              WHERE event_type = 'purchase'),
        e AS (SELECT DISTINCT user_id FROM events
              WHERE event_type = 'error'),
        s AS (SELECT DISTINCT user_id FROM events
              WHERE event_type = 'signup')
        SELECT 'any_engaged' AS segment,
               (SELECT count(*) FROM (SELECT * FROM c UNION
                                      SELECT * FROM p UNION
                                      SELECT * FROM s))::BIGINT
                 AS n_users
        UNION ALL
        SELECT 'click_and_purchase',
               (SELECT count(*) FROM (SELECT * FROM c INTERSECT
                                      SELECT * FROM p))::BIGINT
        UNION ALL
        SELECT 'click_not_error',
               (SELECT count(*) FROM (SELECT * FROM c EXCEPT
                                      SELECT * FROM e))::BIGINT
        ORDER BY segment
    """,
    "events_audience_churn": """
        -- consecutive-day retained users + Jaccard in integer ppm
        WITH ud AS (
            SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
            FROM events
        ),
        cnt AS (SELECT day, count(*)::BIGINT AS n FROM ud GROUP BY day),
        ret AS (
            SELECT a.day AS day, count(*)::BIGINT AS r
            FROM ud a JOIN ud b ON b.user_id = a.user_id
                              AND b.day = a.day - 1
            GROUP BY a.day
        )
        SELECT CAST(c.day AS BIGINT) AS day, p.n AS n_prev,
               c.n AS n_cur, coalesce(r.r, 0)::BIGINT AS n_retained,
               CAST(coalesce(r.r, 0) * 1000000
                    // (p.n + c.n - coalesce(r.r, 0)) AS BIGINT)
                 AS jaccard_ppm
        FROM cnt c JOIN cnt p ON p.day = c.day - 1
        LEFT JOIN ret r ON r.day = c.day
        ORDER BY c.day
    """,
    "docs_phrase_search": """
        -- positional phrase search: the corpus's top bigram (same
        -- tie-break as the engine), matches via position adjacency
        WITH docs AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> '') AS arr
            FROM documents
        ),
        toks AS (
            SELECT doc_id, unnest(arr) AS tok,
                   unnest(range(1, len(arr) + 1)) AS pos
            FROM docs
        ),
        big AS (
            SELECT a.tok AS w1, b.tok AS w2, count(*) AS n
            FROM toks a JOIN toks b
              ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
            GROUP BY 1, 2
        ),
        ph AS (SELECT w1, w2 FROM big ORDER BY n DESC, w1, w2 LIMIT 1),
        m AS (
            SELECT a.doc_id, count(*)::BIGINT AS n_matches
            FROM toks a JOIN toks b
              ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
            CROSS JOIN ph
            WHERE a.tok = ph.w1 AND b.tok = ph.w2
            GROUP BY a.doc_id
        )
        SELECT (SELECT w1 FROM ph) AS w1, (SELECT w2 FROM ph) AS w2,
               doc_id, n_matches
        FROM m ORDER BY n_matches DESC, doc_id LIMIT 10
    """,
    "events_audience_overlap_hll": _hll_overlap_oracle_sql(),
    "events_funnel_delay": """
        -- signup -> first qualifying purchase; exact order-statistic
        -- quantiles at 1 + q*(n-1)//1000 in the (delay, user) order
        WITH s AS (
            SELECT user_id, min(epoch_us(ts)) AS s_ts FROM events
            WHERE event_type = 'signup' GROUP BY 1
        ),
        p AS (
            SELECT e.user_id, min(epoch_us(e.ts) - s.s_ts) AS d_us
            FROM events e JOIN s ON s.user_id = e.user_id
            WHERE e.event_type = 'purchase'
              AND epoch_us(e.ts) >= s.s_ts
            GROUP BY 1
        ),
        d AS (SELECT user_id, d_us // 60000000 AS d_min FROM p),
        r AS (
            SELECT d_min,
                   row_number() OVER (ORDER BY d_min, user_id) AS i,
                   count(*) OVER () AS n
            FROM d
        )
        SELECT (SELECT count(*) FROM s)::BIGINT AS n_signup,
               (SELECT count(*) FROM d)::BIGINT AS n_converted,
               max(CASE WHEN i = 1 + (500 * (n - 1)) // 1000
                        THEN d_min END)::BIGINT AS p50_delay_min,
               max(CASE WHEN i = 1 + (900 * (n - 1)) // 1000
                        THEN d_min END)::BIGINT AS p90_delay_min,
               max(CASE WHEN i = 1 + (990 * (n - 1)) // 1000
                        THEN d_min END)::BIGINT AS p99_delay_min
        FROM r
    """,
    "emb_graph_bfs": """
        -- 3-hop BFS census from the max-degree node of the cosine
        -- >= 0.3 graph; levels unrolled relationally
        WITH e AS (
            SELECT e1.vec_id AS a, e2.vec_id AS b
            FROM embeddings e1
            JOIN embeddings e2 ON e1.vec_id < e2.vec_id
            WHERE round(list_cosine_similarity(
                      CAST(e1.embedding AS DOUBLE[]),
                      CAST(e2.embedding AS DOUBLE[])), 6) >= 0.3
        ),
        u AS (SELECT a AS s, b AS t FROM e
              UNION ALL SELECT b, a FROM e),
        deg AS (SELECT s AS v, count(*) AS d FROM u GROUP BY s),
        seed AS (SELECT v FROM deg ORDER BY d DESC, v LIMIT 1),
        r1 AS (SELECT DISTINCT u.t AS v FROM u
               JOIN seed ON u.s = seed.v),
        v1 AS (SELECT v FROM r1 UNION SELECT v FROM seed),
        r2 AS (SELECT DISTINCT u.t AS v FROM u JOIN r1 ON u.s = r1.v
               EXCEPT SELECT v FROM v1),
        v2 AS (SELECT v FROM v1 UNION SELECT v FROM r2),
        r3 AS (SELECT DISTINCT u.t AS v FROM u JOIN r2 ON u.s = r2.v
               EXCEPT SELECT v FROM v2),
        v3 AS (SELECT v FROM v2 UNION SELECT v FROM r3)
        SELECT CAST(1 AS BIGINT) AS hop,
               (SELECT v FROM seed) AS seed_vec_id,
               (SELECT count(*) FROM r1)::BIGINT AS n_new,
               (SELECT count(*) FROM v1)::BIGINT - 1 AS n_reached
        UNION ALL
        SELECT 2, (SELECT v FROM seed),
               (SELECT count(*) FROM r2)::BIGINT,
               (SELECT count(*) FROM v2)::BIGINT - 1
        UNION ALL
        SELECT 3, (SELECT v FROM seed),
               (SELECT count(*) FROM r3)::BIGINT,
               (SELECT count(*) FROM v3)::BIGINT - 1
        ORDER BY hop
    """,
    "events_ab_test": """
        -- Welch t from the identical integer sufficient statistics
        WITH s AS (
            SELECT event_type, count(*)::BIGINT AS n,
                   sum(c)::BIGINT AS s, sum(c * c)::BIGINT AS q
            FROM (
                SELECT event_type,
                       CAST(round(value * 100) AS BIGINT) AS c
                FROM events WHERE event_type IN ('click', 'view')
            )
            GROUP BY event_type
        ),
        a AS (SELECT * FROM s WHERE event_type = 'click'),
        b AS (SELECT * FROM s WHERE event_type = 'view')
        SELECT a.n AS n_click, b.n AS n_view,
               round(a.s::DOUBLE / a.n::DOUBLE, 4) AS mean_click,
               round(b.s::DOUBLE / b.n::DOUBLE, 4) AS mean_view,
               round((a.s::DOUBLE / a.n::DOUBLE
                      - b.s::DOUBLE / b.n::DOUBLE)
                     / sqrt(((a.q::DOUBLE - a.s::DOUBLE * a.s::DOUBLE
                                            / a.n::DOUBLE)
                             / (a.n::DOUBLE - 1.0)) / a.n::DOUBLE
                            + ((b.q::DOUBLE - b.s::DOUBLE * b.s::DOUBLE
                                              / b.n::DOUBLE)
                               / (b.n::DOUBLE - 1.0)) / b.n::DOUBLE),
                     6) AS t_welch
        FROM a CROSS JOIN b
    """,
    "events_cube": """
        -- full 2-D CUBE with '(all)'/-1 sentinels (no null keys
        -- exist, so COALESCE is unambiguous)
        SELECT coalesce(event_type, '(all)') AS event_type,
               coalesce(weekday, -1)::BIGINT AS weekday,
               count(*)::BIGINT AS n,
               sum(c)::BIGINT AS cents
        FROM (
            SELECT event_type,
                   (epoch_us(ts) // 86400000000) % 7 AS weekday,
                   CAST(round(value * 100) AS BIGINT) AS c
            FROM events
        )
        GROUP BY CUBE (event_type, weekday)
        ORDER BY 1, 2
    """,
    "docs_greedy_cover": """
        -- greedy max-coverage over the bigram universe, 3 unrolled
        -- steps; zero-gain docs stay candidates (count FILTER), tie
        -- (gain desc, doc_id asc)
        WITH docs AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> '') AS arr
            FROM documents
        ),
        toks AS (
            SELECT doc_id, unnest(arr) AS tok,
                   unnest(range(1, len(arr) + 1)) AS pos
            FROM docs
        ),
        db AS (
            SELECT DISTINCT a.doc_id, a.tok AS w1, b.tok AS w2
            FROM toks a JOIN toks b
              ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        ),
        c1 AS (SELECT doc_id, count(*) AS g FROM db GROUP BY doc_id),
        p1 AS (SELECT doc_id, g FROM c1 ORDER BY g DESC, doc_id
               LIMIT 1),
        cov1 AS (SELECT DISTINCT w1, w2 FROM db JOIN p1
                 USING (doc_id)),
        c2 AS (
            SELECT d.doc_id, count(*) FILTER (WHERE c.w1 IS NULL) AS g
            FROM db d LEFT JOIN cov1 c
              ON c.w1 = d.w1 AND c.w2 = d.w2
            WHERE d.doc_id != (SELECT doc_id FROM p1)
            GROUP BY d.doc_id
        ),
        p2 AS (SELECT doc_id, g FROM c2 ORDER BY g DESC, doc_id
               LIMIT 1),
        cov2 AS (SELECT w1, w2 FROM cov1
                 UNION SELECT w1, w2 FROM db JOIN p2 USING (doc_id)),
        c3 AS (
            SELECT d.doc_id, count(*) FILTER (WHERE c.w1 IS NULL) AS g
            FROM db d LEFT JOIN cov2 c
              ON c.w1 = d.w1 AND c.w2 = d.w2
            WHERE d.doc_id NOT IN ((SELECT doc_id FROM p1),
                                   (SELECT doc_id FROM p2))
            GROUP BY d.doc_id
        ),
        p3 AS (SELECT doc_id, g FROM c3 ORDER BY g DESC, doc_id
               LIMIT 1),
        cov3 AS (SELECT w1, w2 FROM cov2
                 UNION SELECT w1, w2 FROM db JOIN p3 USING (doc_id))
        SELECT CAST(1 AS BIGINT) AS step,
               (SELECT doc_id FROM p1) AS doc_id,
               (SELECT g FROM p1)::BIGINT AS n_new,
               (SELECT count(*) FROM cov1)::BIGINT AS n_covered
        UNION ALL
        SELECT 2, (SELECT doc_id FROM p2), (SELECT g FROM p2)::BIGINT,
               (SELECT count(*) FROM cov2)::BIGINT
        UNION ALL
        SELECT 3, (SELECT doc_id FROM p3), (SELECT g FROM p3)::BIGINT,
               (SELECT count(*) FROM cov3)::BIGINT
        ORDER BY step
    """,
    "events_trimmed_mean": """
        -- exact 10-90% trimmed mean per type, RANK-windowed (ties at
        -- the window boundary resolved by rank arithmetic, so the
        -- tie-break column cannot change the sum)
        WITH v AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS c, event_id
            FROM events
        ),
        r AS (
            SELECT event_type, c,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY c, event_id) - 1 AS rk,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM v
        )
        SELECT event_type, count(*)::BIGINT AS n_trim,
               sum(c)::BIGINT AS sum_trim_cents,
               round(sum(c)::DOUBLE / count(*)::DOUBLE / 100.0, 4)
                 AS trimmed_mean
        FROM r
        WHERE rk BETWEEN (100 * (n - 1)) // 1000
                     AND (900 * (n - 1)) // 1000
        GROUP BY event_type ORDER BY event_type
    """,
    "events_value_emd": """
        -- exact 1-D Wasserstein-1 between first/last-week value
        -- histograms: area between CDFs on the n_a*n_b common
        -- denominator, one floor division at the end (HUGEINT)
        WITH e AS (
            SELECT epoch_us(ts) // 86400000000 AS day,
                   CAST(round(value * 100) AS BIGINT) AS c
            FROM events
        ),
        bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        a AS (SELECT c, count(*)::BIGINT AS na FROM e, bounds
              WHERE day < d0 + 7 GROUP BY c),
        b AS (SELECT c, count(*)::BIGINT AS nb FROM e, bounds
              WHERE day > d1 - 7 GROUP BY c),
        v AS (SELECT c FROM a UNION SELECT c FROM b),
        j AS (
            SELECT v.c, coalesce(a.na, 0) AS na,
                   coalesce(b.nb, 0) AS nb
            FROM v LEFT JOIN a USING (c) LEFT JOIN b USING (c)
        ),
        cum AS (
            SELECT c,
                   sum(na) OVER (ORDER BY c
                                 ROWS UNBOUNDED PRECEDING) AS ca,
                   sum(nb) OVER (ORDER BY c
                                 ROWS UNBOUNDED PRECEDING) AS cb,
                   lead(c) OVER (ORDER BY c) AS nxt
            FROM j
        ),
        tot AS (SELECT sum(na)::HUGEINT AS ta, sum(nb)::HUGEINT AS tb
                FROM j)
        SELECT ta::BIGINT AS n_first, tb::BIGINT AS n_last,
               CAST(sum(abs(ca::HUGEINT * tb - cb::HUGEINT * ta)
                        * (nxt - c)::HUGEINT) * 1000
                    // (ta * tb) AS BIGINT) AS emd_millicents
        FROM cum CROSS JOIN tot
        WHERE nxt IS NOT NULL
        GROUP BY ta, tb
    """,
    "orders_benford": """
        -- Benford first-digit audit: exact string leading digit,
        -- n·log10(1+1/d) expectation, per-digit chi² contribution
        WITH c AS (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
            FROM orders
            WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0
        ),
        d AS (
            SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT)
                     AS digit
            FROM c
        ),
        o AS (SELECT digit, count(*)::BIGINT AS n_obs FROM d
              GROUP BY digit),
        t AS (SELECT sum(n_obs)::BIGINT AS n FROM o)
        SELECT digit, n_obs,
               round(n::DOUBLE * log10(1.0 + 1.0 / digit::DOUBLE), 4)
                 AS expected_n,
               round((n_obs::DOUBLE
                      - n::DOUBLE * log10(1.0 + 1.0 / digit::DOUBLE))
                     * (n_obs::DOUBLE
                        - n::DOUBLE * log10(1.0 + 1.0 / digit::DOUBLE))
                     / (n::DOUBLE * log10(1.0 + 1.0 / digit::DOUBLE)),
                     6) AS chi2_contrib
        FROM o CROSS JOIN t
        ORDER BY digit
    """,
    "events_value_mode": """
        -- exact grouped mode, tie-break smallest value
        WITH h AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS c,
                   count(*)::BIGINT AS n
            FROM events GROUP BY 1, 2
        ),
        r AS (
            SELECT event_type, c, n,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY n DESC, c) AS rk
            FROM h
        )
        SELECT event_type, c AS mode_cents, n AS n_mode
        FROM r WHERE rk = 1 ORDER BY event_type
    """,
    "events_top_trigrams": """
        -- per-user event-type trigrams over the (ts, event_id) total
        -- order; top 10 by (count desc, path)
        WITH s AS (
            SELECT user_id, event_type AS t2,
                   lag(event_type, 1) OVER w AS t1,
                   lag(event_type, 2) OVER w AS t0
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT t0, t1, t2, count(*)::BIGINT AS n_occurrences
        FROM s WHERE t0 IS NOT NULL
        GROUP BY 1, 2, 3
        ORDER BY n_occurrences DESC, t0, t1, t2
        LIMIT 10
    """,
    "events_hhi": """
        -- Herfindahl concentration per day, integer ppm
        WITH c AS (
            SELECT epoch_us(ts) // 86400000000 AS day, event_type,
                   count(*)::BIGINT AS n
            FROM events GROUP BY 1, 2
        )
        SELECT CAST(day AS BIGINT) AS day,
               sum(n)::BIGINT AS n_events,
               CAST(sum(n * n) * 1000000 // (sum(n) * sum(n))
                 AS BIGINT) AS hhi_ppm
        FROM c GROUP BY day ORDER BY day
    """,
    "events_burstiness": """
        -- Goh-Barabási burstiness of inter-arrival gaps (integer
        -- seconds, floor of the DIFFERENCE) per event type
        WITH p AS (
            SELECT event_type,
                   (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY event_type
                        ORDER BY ts, event_id)) // 1000000 AS gap
            FROM events
        ),
        s AS (
            SELECT event_type, count(*)::BIGINT AS n,
                   sum(gap)::BIGINT AS sg,
                   sum(gap * gap)::BIGINT AS sgg
            FROM p WHERE gap IS NOT NULL GROUP BY event_type
        )
        SELECT event_type, n AS n_gaps,
               round(sg::DOUBLE / n::DOUBLE, 4) AS mean_gap_s,
               round((sqrt(n::DOUBLE * sgg - sg::DOUBLE * sg)
                          / n::DOUBLE
                      - sg::DOUBLE / n::DOUBLE)
                     / (sqrt(n::DOUBLE * sgg - sg::DOUBLE * sg)
                            / n::DOUBLE
                        + sg::DOUBLE / n::DOUBLE), 6) AS burstiness
        FROM s ORDER BY event_type
    """,
    "docs_merkle_manifest": """
        -- order-free XOR leaves per bucket + md5 root over leaves;
        -- bit_xor works in SIGNED HUGEINT space (engine mirrors)
        WITH d AS (
            SELECT doc_id % 16 AS bucket,
                   md5_number(CAST(doc_id AS VARCHAR) || ':' || text)
                     AS h
            FROM documents
        ),
        l AS (
            SELECT bucket, count(*)::BIGINT AS n_docs,
                   CAST(bit_xor(h) AS VARCHAR) AS leaf
            FROM d GROUP BY bucket
        ),
        r AS (SELECT md5(string_agg(leaf, '|' ORDER BY bucket))
                AS root FROM l)
        SELECT CAST(bucket AS BIGINT) AS bucket, n_docs, leaf,
               (SELECT root FROM r) AS root
        FROM l ORDER BY bucket
    """,
    "events_interval_overlap": """
        -- interval x interval overlap join: per-(user, day) activity
        -- intervals vs busy hours (count strictly above hourly mean);
        -- duration via LEAST/GREATEST, all integer µs
        WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        h AS (SELECT us // 3600000000 AS hour, count(*)::BIGINT AS n
              FROM e GROUP BY 1),
        t AS (SELECT sum(n)::BIGINT AS total, count(*)::BIGINT AS nh
              FROM h),
        busy AS (SELECT hour FROM h CROSS JOIN t
                 WHERE n * nh > total),
        iv AS (SELECT user_id, us // 86400000000 AS day,
                      min(us) AS s, max(us) AS e
               FROM e GROUP BY 1, 2),
        p AS (
            SELECT b.hour,
                   LEAST(iv.e, (b.hour + 1) * 3600000000)
                     - GREATEST(iv.s, b.hour * 3600000000) AS ov
            FROM iv JOIN busy b
              ON iv.s < (b.hour + 1) * 3600000000
             AND iv.e >= b.hour * 3600000000
        )
        SELECT CAST(hour AS BIGINT) AS hour,
               count(*)::BIGINT AS n_pairs,
               CAST(sum(ov) // 1000000 AS BIGINT) AS overlap_s
        FROM p GROUP BY hour ORDER BY hour
    """,
    "emb_kcenter": _kcenter_oracle_sql(),
    "events_zorder_layout": _zorder_oracle_sql(),
    "emb_label_propagation": """
        -- 2-round seed-clamped synchronous LPA over the cosine >= 0.3
        -- graph, unrolled relationally; vote = mode of labeled
        -- neighbors' current labels, tie -> smallest label, no labeled
        -- neighbor -> -1; seeds (vec_id % 5 = 0) never change
        WITH e AS (
            SELECT e1.vec_id AS a, e2.vec_id AS b
            FROM embeddings e1
            JOIN embeddings e2 ON e1.vec_id < e2.vec_id
            WHERE round(list_cosine_similarity(
                      CAST(e1.embedding AS DOUBLE[]),
                      CAST(e2.embedding AS DOUBLE[])), 6) >= 0.3
        ),
        u AS (SELECT a AS s, b AS t FROM e
              UNION ALL SELECT b, a FROM e),
        l0 AS (SELECT vec_id AS v,
                      CASE WHEN vec_id % 5 = 0 THEN CAST(label AS BIGINT)
                           ELSE -1 END AS lab,
                      (vec_id % 5 = 0) AS seed
               FROM embeddings),
        v1 AS (SELECT u.t, l0.lab, count(*)::BIGINT AS c
               FROM u JOIN l0 ON u.s = l0.v
               WHERE l0.lab <> -1 GROUP BY u.t, l0.lab),
        w1 AS (SELECT t, lab FROM (
                 SELECT t, lab, row_number() OVER (
                     PARTITION BY t ORDER BY c DESC, lab) AS rn FROM v1)
               WHERE rn = 1),
        l1 AS (SELECT l0.v,
                      CASE WHEN l0.seed THEN l0.lab
                           ELSE coalesce(w1.lab, -1) END AS lab,
                      l0.seed
               FROM l0 LEFT JOIN w1 ON l0.v = w1.t),
        v2 AS (SELECT u.t, l1.lab, count(*)::BIGINT AS c
               FROM u JOIN l1 ON u.s = l1.v
               WHERE l1.lab <> -1 GROUP BY u.t, l1.lab),
        w2 AS (SELECT t, lab FROM (
                 SELECT t, lab, row_number() OVER (
                     PARTITION BY t ORDER BY c DESC, lab) AS rn FROM v2)
               WHERE rn = 1),
        l2 AS (SELECT l1.v,
                      CASE WHEN l1.seed THEN l1.lab
                           ELSE coalesce(w2.lab, -1) END AS lab
               FROM l1 LEFT JOIN w2 ON l1.v = w2.t)
        SELECT lab AS label, count(*)::BIGINT AS n_nodes
        FROM l2 GROUP BY lab ORDER BY lab
    """,
    "docs_zipf_slope": """
        -- Zipf exponent: OLS slope of ln(freq) on ln(rank) over the
        -- top-100 BIGRAMS (freq DESC, gram ASC); tokens are the
        -- stages/bm25.py lowercase [a-z0-9]+ rule, gram key = prev ||
        -- chr(1) || tok (the substring_dedup idiom), shared verbatim
        WITH docs AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> '') AS arr
            FROM documents
        ),
        toks AS (
            SELECT doc_id, unnest(arr) AS tok,
                   unnest(range(1, len(arr) + 1)) AS pos
            FROM docs WHERE len(arr) > 0
        ),
        grams AS (
            SELECT prev || chr(1) || tok AS gram FROM (
                SELECT tok, lag(tok) OVER (PARTITION BY doc_id
                                           ORDER BY pos) AS prev
                FROM toks)
            WHERE prev IS NOT NULL
        ),
        c AS (SELECT gram, count(*)::BIGINT AS n
              FROM grams GROUP BY gram),
        top AS (SELECT n, row_number() OVER (ORDER BY n DESC, gram)
                  AS rk
                FROM c ORDER BY n DESC, gram LIMIT 100),
        s AS (SELECT count(*)::BIGINT AS k,
                     sum(ln(rk)) AS sx, sum(ln(n)) AS sy,
                     sum(ln(rk) * ln(n)) AS sxy,
                     sum(ln(rk) * ln(rk)) AS sxx
              FROM top)
        SELECT (SELECT count(*) FROM c)::BIGINT AS n_distinct_bigrams,
               k AS top_k,
               round((k::DOUBLE * sxy - sx * sy)
                     / (k::DOUBLE * sxx - sx * sx), 6) AS zipf_slope
        FROM s
    """,
    "docs_heaps_law": """
        -- Heaps'-law vocabulary growth: distinct BIGRAMS among the
        -- first n*pct//100 documents by doc_id order; a gram counts
        -- toward every cut at or past its first document
        WITH docs AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> '') AS arr
            FROM documents
        ),
        toks AS (
            SELECT doc_id, unnest(arr) AS tok,
                   unnest(range(1, len(arr) + 1)) AS pos
            FROM docs WHERE len(arr) > 0
        ),
        grams AS (
            SELECT doc_id, prev || chr(1) || tok AS gram FROM (
                SELECT doc_id, tok,
                       lag(tok) OVER (PARTITION BY doc_id
                                      ORDER BY pos) AS prev
                FROM toks)
            WHERE prev IS NOT NULL
        ),
        f AS (SELECT gram, min(doc_id) AS fd FROM grams GROUP BY gram),
        d AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn
              FROM (SELECT DISTINCT doc_id FROM documents)),
        n AS (SELECT count(*)::BIGINT AS nd FROM d),
        cuts AS (SELECT * FROM (VALUES (20), (40), (60), (80), (100))
                 AS v(p)),
        thr AS (SELECT c.p, (c.p * n.nd) // 100 AS k
                FROM cuts c CROSS JOIN n),
        t2 AS (SELECT p, k,
                      (SELECT max(doc_id) FROM d WHERE d.rn <= thr.k)
                        AS th
               FROM thr)
        SELECT CAST(p AS BIGINT) AS cut_pct,
               CAST(k AS BIGINT) AS n_docs_cut,
               (SELECT count(*) FROM f
                WHERE f.fd <= t2.th)::BIGINT AS vocab_size
        FROM t2 ORDER BY p
    """,
    "events_value_auc": """
        -- exact tie-aware ROC-AUC via the histogram Mann-Whitney
        -- form: AUC·2PN = Σ_c pos_c·(2·neg_below + neg_c), HUGEINT
        -- throughout, one floor division to ppm
        WITH p AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS c,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                     AS pos
            FROM events WHERE event_type IN ('purchase', 'click')
        ),
        h AS (SELECT c, sum(pos)::BIGINT AS np,
                     (count(*) - sum(pos))::BIGINT AS nn
              FROM p GROUP BY c),
        s AS (SELECT c, np, nn,
                     coalesce(sum(nn) OVER (ORDER BY c
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS nlt
              FROM h),
        t AS (SELECT sum(np)::BIGINT AS p_tot, sum(nn)::BIGINT AS n_tot,
                     sum(np * (2 * nlt + nn)) AS num2
              FROM s)
        SELECT p_tot AS n_pos, n_tot AS n_neg,
               CAST((num2 * 1000000) // (2 * p_tot * n_tot) AS BIGINT)
                 AS auc_ppm
        FROM t
    """,
    "docs_hybrid_rrf": """
        -- reciprocal-rank fusion of BM25 top-20 and 64-bucket
        -- hashed-TF cosine top-20; bucket = 60-bit md5 prefix % 64
        -- (the simjoin idiom); cosine round-6 BEFORE ranking on both
        -- sides; rrf = sum of 1/(60+rank) over present legs, rank 0
        -- recorded when a doc misses a leg
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text),
                                                '[^a-z0-9]+')) AS tok
            FROM documents
        ),
        tok2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl
               FROM tok2 GROUP BY doc_id),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                     / (SELECT count(*) FROM documents) AS avgdl
        ),
        terms AS (SELECT * FROM (VALUES ('dup'), ('vector'), ('merge'),
                                        ('window')) t(term)),
        tf AS (SELECT doc_id, tok AS term, count(*)::DOUBLE AS tf
               FROM tok2 WHERE tok IN (SELECT term FROM terms)
               GROUP BY doc_id, tok),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        scored AS (
            SELECT tf.doc_id,
                   sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                        * tf.tf * 2.2
                        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) )
                     AS score
            FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
            CROSS JOIN stats s
            GROUP BY tf.doc_id
        ),
        brank AS (SELECT doc_id,
                         row_number() OVER (ORDER BY score DESC, doc_id)
                           AS rnk
                  FROM scored ORDER BY score DESC, doc_id LIMIT 20),
        dv AS (SELECT doc_id,
                      ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS b,
                      count(*)::BIGINT AS w
               FROM tok2 GROUP BY doc_id, b),
        qv AS (SELECT ('0x' || substr(md5(term), 1, 15))::BIGINT % 64
                        AS b,
                      count(*)::BIGINT AS w
               FROM terms GROUP BY 1),
        dots AS (SELECT dv.doc_id, sum(dv.w * qv.w)::BIGINT AS dot
                 FROM dv JOIN qv USING (b) GROUP BY dv.doc_id),
        vnorm AS (SELECT doc_id, sum(w * w)::BIGINT AS v2
                  FROM dv GROUP BY doc_id),
        qnorm AS (SELECT sum(w * w)::BIGINT AS q2 FROM qv),
        dcos AS (SELECT d.doc_id,
                        round(d.dot::DOUBLE
                              / sqrt((v.v2 * (SELECT q2 FROM qnorm))
                                     ::DOUBLE), 6) AS cos
                 FROM dots d JOIN vnorm v USING (doc_id)
                 WHERE d.dot > 0),
        drank AS (SELECT doc_id,
                         row_number() OVER (ORDER BY cos DESC, doc_id)
                           AS rnk
                  FROM dcos ORDER BY cos DESC, doc_id LIMIT 20),
        fused AS (
            SELECT coalesce(b.doc_id, d.doc_id) AS doc_id,
                   coalesce(b.rnk, 0) AS bm25_rank,
                   coalesce(d.rnk, 0) AS dense_rank,
                   coalesce(1.0 / (60 + b.rnk), 0)
                     + coalesce(1.0 / (60 + d.rnk), 0) AS rrf
            FROM brank b FULL OUTER JOIN drank d
              ON b.doc_id = d.doc_id
        )
        SELECT doc_id, CAST(bm25_rank AS BIGINT) AS bm25_rank,
               CAST(dense_rank AS BIGINT) AS dense_rank,
               round(rrf, 6) AS rrf_score
        FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
    """,
    "events_entropy_rate": """
        -- entropy rate of the per-user first-order behavior chain:
        -- H = −Σ_i π(i) Σ_j p(j|i)·ln p(j|i) with π the empirical
        -- prev-state marginal; transition counts re-derived from raw
        -- rows via the lag() mirror of the engine's sort+seam pass.
        -- O(1) states → round-6 double summation is ULP-safe.
        WITH seq AS (
            SELECT event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events
        ),
        tr AS (
            SELECT prev AS prev_state, event_type AS next_state,
                   count(*)::BIGINT AS n_trans
            FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
        ),
        per AS (
            SELECT prev_state, sum(n_trans)::BIGINT AS n_i
            FROM tr GROUP BY prev_state
        ),
        hi AS (
            SELECT t.prev_state, p.n_i,
                   sum((t.n_trans::DOUBLE / p.n_i)
                       * ln(t.n_trans::DOUBLE / p.n_i)) AS h_i
            FROM tr t JOIN per p USING (prev_state)
            GROUP BY t.prev_state, p.n_i
        ),
        tot AS (SELECT sum(n_i)::BIGINT AS total FROM per)
        SELECT (SELECT total FROM tot) AS n_transitions,
               count(*)::BIGINT AS n_states,
               round(-sum((h.n_i::DOUBLE / (SELECT total FROM tot))
                          * h.h_i), 6) AS entropy_rate_nats
        FROM hi h
    """,
    "docs_perplexity_pruned": """
        -- count-pruned (min_count=2) bigram perplexity: same
        -- tokenization/model algebra as docs_perplexity, but pruned
        -- bigrams score as unseen (LEFT JOIN, coalesce 0) while
        -- context denominators and the vocabulary keep FULL counts
        -- (standard KenLM-style count pruning)
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
            SELECT doc_id, lang, tok, pos,
                   coalesce(lag(tok) OVER (PARTITION BY doc_id
                                           ORDER BY pos), chr(2)) AS prev
            FROM toks
        ),
        bg_all AS (SELECT prev, tok, count(*)::DOUBLE AS n
                   FROM pairs GROUP BY prev, tok),
        bg AS (SELECT * FROM bg_all WHERE n >= 2),
        ctx AS (SELECT prev, sum(n) AS cn FROM bg_all GROUP BY prev),
        vocab AS (SELECT count(DISTINCT tok)::DOUBLE AS v FROM bg_all),
        scored AS (
            SELECT p.doc_id, any_value(p.lang) AS lang,
                   count(*)::DOUBLE AS n_tok,
                   sum(ln((coalesce(bg.n, 0) + 0.5)
                          / (ctx.cn + 0.5 * (vocab.v + 1)))) AS logp
            FROM pairs p
            LEFT JOIN bg ON bg.prev = p.prev AND bg.tok = p.tok
            JOIN ctx ON ctx.prev = p.prev
            CROSS JOIN vocab
            GROUP BY p.doc_id
        )
        SELECT lang, count(*) AS n_docs,
               round(avg(exp(-logp / n_tok)), 4) AS avg_ppl
        FROM scored GROUP BY lang ORDER BY lang
    """,
    "customer_fuzzy_join": """
        -- brute-force re-derivation of the deletion-neighborhood
        -- join: every unordered name pair at levenshtein distance
        -- exactly 1, pinned by count + order-free bit_xor of 60-bit
        -- md5 pair keys (chr(1)-joined, the engine's key)
        WITH p AS (
            SELECT a.c_name AS na, b.c_name AS nb
            FROM customer a JOIN customer b
              ON a.c_name < b.c_name
             AND levenshtein(a.c_name, b.c_name) = 1
        )
        SELECT (SELECT count(*) FROM customer)::BIGINT AS n_names,
               count(*)::BIGINT AS n_pairs_d1,
               coalesce(bit_xor(('0x' || substr(md5(na || chr(1) || nb),
                                                1, 15))::BIGINT),
                        0) AS pair_xor
        FROM p
    """,
    "docs_ndcg": """
        -- NDCG@10 of the BM25 ranking (identical scoring CTE to
        -- docs_hybrid_rrf's lexical leg) against graded relevance =
        -- total query-term occurrences; ideal order (rel desc,
        -- doc_id); discounts log2(rank+1); round 6
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text),
                                                '[^a-z0-9]+')) AS tok
            FROM documents
        ),
        tok2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl
               FROM tok2 GROUP BY doc_id),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                     / (SELECT count(*) FROM documents) AS avgdl
        ),
        terms AS (SELECT * FROM (VALUES ('dup'), ('vector'), ('merge'),
                                        ('window')) t(term)),
        tf AS (SELECT doc_id, tok AS term, count(*)::DOUBLE AS tf
               FROM tok2 WHERE tok IN (SELECT term FROM terms)
               GROUP BY doc_id, tok),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        scored AS (
            SELECT tf.doc_id,
                   sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                        * tf.tf * 2.2
                        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) )
                     AS score
            FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
            CROSS JOIN stats s
            GROUP BY tf.doc_id
        ),
        brank AS (SELECT doc_id,
                         row_number() OVER (ORDER BY score DESC, doc_id)
                           AS rnk
                  FROM scored ORDER BY score DESC, doc_id LIMIT 10),
        rel AS (SELECT doc_id, sum(tf)::BIGINT AS rel
                FROM tf GROUP BY doc_id),
        gold AS (SELECT rel,
                        row_number() OVER (ORDER BY rel DESC, doc_id)
                          AS rnk
                 FROM rel ORDER BY rel DESC, doc_id LIMIT 10),
        d AS (SELECT sum(r.rel::DOUBLE / log2(b.rnk + 1)) AS dcg
              FROM brank b JOIN rel r USING (doc_id)),
        i AS (SELECT sum(rel::DOUBLE / log2(rnk + 1)) AS idcg
              FROM gold)
        SELECT CAST(10 AS BIGINT) AS k,
               round(d.dcg, 6) AS dcg,
               round(i.idcg, 6) AS idcg,
               round(d.dcg / i.idcg, 6) AS ndcg
        FROM d, i
    """,
    "events_cusum": """
        -- exact integer CUSUM: S'_t = T·cum_t − t·total (mean scaled
        -- away), earliest day maximizing |S'_t|; HUGEINT throughout
        WITH d AS (
            SELECT epoch_us(ts) // 86400000000 AS day,
                   sum(CAST(round(value * 100) AS BIGINT))::BIGINT
                     AS cents
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        t AS (SELECT count(*)::BIGINT AS nd, sum(cents)::BIGINT AS tot
              FROM d),
        c AS (
            SELECT day,
                   (SELECT nd FROM t)
                     * sum(cents) OVER (ORDER BY day)
                     - row_number() OVER (ORDER BY day)
                       * (SELECT tot FROM t) AS s
            FROM d
        )
        SELECT (SELECT nd FROM t) AS n_days,
               (SELECT tot FROM t) AS total_cents,
               CAST(day AS BIGINT) AS cp_day,
               CAST(abs(s) AS BIGINT) AS max_abs_dev_scaled
        FROM c ORDER BY abs(s) DESC, day LIMIT 1
    """,
    "events_spearman": """
        -- grouped Spearman: tie-aware DOUBLED average ranks
        -- (2·minrank + cnt − 1 keeps .5 tie ranks integer) for value
        -- cents and hour-of-day, HUGEINT sufficient statistics, the
        -- Pearson closed form (ρ is scale-invariant), round 6
        WITH p AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS c,
                   date_part('hour', ts)::BIGINT AS h
            FROM events
        ),
        r AS (
            SELECT event_type,
                   2 * rank() OVER (PARTITION BY event_type ORDER BY c)
                     + count(*) OVER (PARTITION BY event_type, c) - 1
                     AS a,
                   2 * rank() OVER (PARTITION BY event_type ORDER BY h)
                     + count(*) OVER (PARTITION BY event_type, h) - 1
                     AS b
            FROM p
        ),
        s AS (
            SELECT event_type, count(*)::BIGINT AS n,
                   sum(a) AS sa, sum(b) AS sb, sum(a * b) AS sab,
                   sum(a * a) AS saa, sum(b * b) AS sbb
            FROM r GROUP BY event_type
        )
        SELECT event_type, n,
               round((n * sab - sa * sb)::DOUBLE
                     / sqrt((n * saa - sa * sa)::DOUBLE
                            * (n * sbb - sb * sb)::DOUBLE), 6)
                 AS spearman_rho
        FROM s ORDER BY event_type
    """,
    "events_autocorr": """
        -- lag-1 serial correlation per event type: the identical
        -- integer sufficient statistics over lag() pairs, then the
        -- same float closed form as events_value_corr
        WITH p AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS y,
                   lag(CAST(round(value * 100) AS BIGINT)) OVER (
                       PARTITION BY event_type
                       ORDER BY ts, event_id) AS x
            FROM events
        ),
        s AS (
            SELECT event_type, count(*)::BIGINT AS n,
                   sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                   sum(x * y)::BIGINT AS sxy,
                   sum(x * x)::BIGINT AS sxx,
                   sum(y * y)::BIGINT AS syy
            FROM p WHERE x IS NOT NULL GROUP BY event_type
        )
        SELECT event_type, n AS n_pairs,
               round((n::DOUBLE * sxy - sx::DOUBLE * sy)
                     / sqrt((n::DOUBLE * sxx - sx::DOUBLE * sx)
                            * (n::DOUBLE * syy - sy::DOUBLE * sy)), 6)
                 AS lag1_r
        FROM s ORDER BY event_type
    """,
    "docs_char_entropy": """
        -- per-doc Shannon codepoint entropy H = ln L - sum(c ln c)/L,
        -- rounded half-away to integer micro-nats at exactly one
        -- point (the engine's stages/entropy.py rule), then EXACT
        -- int64 per-lang aggregates; empty docs are 0 and still count
        WITH chars AS (
            SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS ch
            FROM documents WHERE length(text) > 0
        ),
        cc AS (
            SELECT doc_id, ch, count(*)::BIGINT AS c
            FROM chars GROUP BY doc_id, ch
        ),
        ent AS (
            SELECT doc_id,
                   ln(sum(c)::DOUBLE)
                     - sum(c::DOUBLE * ln(c::DOUBLE)) / sum(c)::DOUBLE
                     AS h
            FROM cc GROUP BY doc_id
        ),
        per AS (
            SELECT d.lang,
                   CAST(floor(coalesce(e.h, 0.0) * 1000000 + 0.5)
                        AS BIGINT) AS em
            FROM documents d LEFT JOIN ent e USING (doc_id)
        )
        SELECT lang, count(*)::BIGINT AS n_docs,
               sum(em)::BIGINT AS sum_ent_micro,
               sum(em)::BIGINT // count(*)::BIGINT AS mean_ent_micro
        FROM per GROUP BY lang ORDER BY lang
    """,
    "docs_setsim_join": """
        -- brute-force all-pairs Jaccard >= 0.5 over per-doc DISTINCT
        -- word-3-gram sets (tokenization = the shared lowercase
        -- [a-z0-9]+ rule; gram keys chr(1)-joined like the engine's
        -- SEP) — verifying the prefix filter's exactness externally;
        -- integer-ppm gate and floor division, no float thresholds
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> '') AS arr
            FROM documents
        ),
        pos AS (
            SELECT doc_id, unnest(arr) AS tok,
                   unnest(range(1, len(arr) + 1)) AS p
            FROM toks WHERE len(arr) >= 3
        ),
        big AS (
            SELECT doc_id,
                   lag(tok, 2) OVER w || chr(1)
                     || lag(tok, 1) OVER w || chr(1) || tok AS g
            FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY p)
        ),
        sets AS (
            SELECT doc_id, count(DISTINCT g)::BIGINT AS sz,
                   list(DISTINCT g) AS s
            FROM big WHERE g IS NOT NULL GROUP BY doc_id
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_intersect(a.s, b.s))::BIGINT AS i,
                   (a.sz + b.sz
                    - len(list_intersect(a.s, b.s)))::BIGINT AS u
            FROM sets a JOIN sets b ON a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, i * 1000000 // u AS jaccard_ppm
        FROM pairs WHERE i * 1000000 >= 500000 * u
        ORDER BY doc_a, doc_b
    """,
    "orders_cohort_ltv": """
        -- cohort = first-order month (integer y*12+m-1 arithmetic on
        -- both sides); cumulative cents per offset via FILTER sums;
        -- half-away cents
        WITH f AS (
            SELECT o_custkey,
                   min(date_part('year', o_orderdate) * 12
                       + date_part('month', o_orderdate) - 1)::BIGINT
                     AS cym
            FROM orders GROUP BY o_custkey
        ),
        o AS (
            SELECT f.cym,
                   (date_part('year', o.o_orderdate) * 12
                    + date_part('month', o.o_orderdate) - 1)::BIGINT
                     - f.cym AS md,
                   CAST(round(o.o_totalprice * 100) AS BIGINT) AS c
            FROM orders o JOIN f USING (o_custkey)
        )
        SELECT printf('%04d-%02d', cym // 12, cym % 12 + 1)
                 AS cohort_month,
               (SELECT count(*) FROM f f2
                WHERE f2.cym = o.cym)::BIGINT AS n_customers,
               coalesce(sum(c) FILTER (WHERE md <= 0), 0)::BIGINT
                 AS m0_cents,
               coalesce(sum(c) FILTER (WHERE md <= 1), 0)::BIGINT
                 AS m1_cents,
               coalesce(sum(c) FILTER (WHERE md <= 2), 0)::BIGINT
                 AS m2_cents,
               coalesce(sum(c) FILTER (WHERE md <= 3), 0)::BIGINT
                 AS m3_cents
        FROM o GROUP BY cym ORDER BY cohort_month
    """,
    "orders_ppr": __import__(
        "ocracle_ray.stages.pagerank", fromlist=["ppr_oracle_sql"]
    ).ppr_oracle_sql(
        """li AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
                         l_partkey AS pk FROM lineitem),
        nxt AS (SELECT ok, pk,
                       lag(pk) OVER (PARTITION BY ok
                                     ORDER BY ln, pk) AS prev
                FROM li),
        cp AS (SELECT least(prev, pk) AS a, greatest(prev, pk) AS b
               FROM nxt WHERE prev IS NOT NULL AND prev <> pk),
        ew AS (SELECT a, b, count(*)::BIGINT AS w FROM cp GROUP BY a, b)""",
        "SELECT p_partkey AS node FROM part WHERE p_brand = 'Brand#1'",
        PAGERANK_ITERS, 10, node_alias="part_key"),
    "docs_incremental_exact": _increx_oracle_sql(),
    "customer_k_anonymity": """
        -- quasi-id = (nation, segment, $5000 acctbal band); cents by
        -- half-away rounding, band by TRUNCATING division (DuckDB //
        -- truncates toward zero — matched in-engine); k = 10
        WITH q AS (
            SELECT c_nationkey AS nat, c_mktsegment AS seg,
                   CAST(round(c_acctbal * 100) AS BIGINT) // 500000
                     AS band
            FROM customer
        ),
        cls AS (
            SELECT nat, seg, band, count(*)::BIGINT AS n
            FROM q GROUP BY nat, seg, band
        )
        SELECT 10::BIGINT AS k,
               sum(n)::BIGINT AS n_rows,
               count(*)::BIGINT AS n_classes,
               min(n)::BIGINT AS min_class_size,
               sum(CASE WHEN n < 10 THEN 1 ELSE 0 END)::BIGINT
                 AS classes_below_k,
               coalesce(sum(CASE WHEN n < 10 THEN n END), 0)::BIGINT
                 AS rows_at_risk,
               (coalesce(sum(CASE WHEN n < 10 THEN n END), 0)::BIGINT
                * 1000000 // sum(n)::BIGINT)::BIGINT AS risk_ppm
        FROM cls
    """,
    "events_expectations": """
        -- the declared suite re-derived: every observed metric is an
        -- exact integer (counts; null rate by ppm floor division),
        -- cents = half-away CAST(round(v*100) AS BIGINT), verdicts
        -- observed <= threshold
        WITH m AS (
            SELECT count(*)::BIGINT AS n,
                   (count(*) - count(DISTINCT event_id))::BIGINT
                     AS dup_keys,
                   sum(CASE WHEN event_type NOT IN
                       ('click','error','purchase','signup','view')
                       THEN 1 ELSE 0 END)::BIGINT AS bad_type,
                   sum(CASE WHEN ts < TIMESTAMP '2020-01-01'
                       OR ts >= TIMESTAMP '2030-01-01'
                       THEN 1 ELSE 0 END)::BIGINT AS n_ts_out,
                   sum(CASE WHEN user_id NOT IN
                       (SELECT c_custkey FROM customer)
                       THEN 1 ELSE 0 END)::BIGINT AS orphan,
                   sum(CASE WHEN value IS NOT NULL
                       AND CAST(round(value * 100) AS BIGINT)
                           > 10000000
                       THEN 1 ELSE 0 END)::BIGINT AS n_val_big,
                   sum(CASE WHEN value IS NOT NULL
                       AND CAST(round(value * 100) AS BIGINT) < 0
                       THEN 1 ELSE 0 END)::BIGINT AS n_val_neg,
                   (sum(CASE WHEN value IS NULL THEN 1 ELSE 0
                        END)::BIGINT * 1000000 // count(*))::BIGINT
                     AS null_rate_ppm
            FROM events
        )
        SELECT "check", observed, threshold,
               CASE WHEN observed <= threshold THEN 1 ELSE 0
               END::BIGINT AS passed
        FROM (
            SELECT 'event_id_unique' AS "check", dup_keys AS observed,
                   0::BIGINT AS threshold FROM m
            UNION ALL SELECT 'event_type_in_domain', bad_type, 0 FROM m
            UNION ALL SELECT 'ts_in_range', n_ts_out, 0 FROM m
            UNION ALL SELECT 'user_id_references_customer', orphan, 0
                      FROM m
            UNION ALL SELECT 'value_cents_at_most_max', n_val_big, 0
                      FROM m
            UNION ALL SELECT 'value_non_negative', n_val_neg, 0 FROM m
            UNION ALL SELECT 'value_null_rate_ppm', null_rate_ppm,
                      10000 FROM m
        ) ORDER BY "check"
    """,
    "docs_canonical": f"""
        -- canonical per near-dup cluster: clusters re-derived via the
        -- recursive walk over the same shingle-jaccard >= 0.8 pair
        -- set the engine's MinHash-LSH verifies against; quality =
        -- the docs_quality expression per doc (0.25-step values are
        -- float-exact, tie-safe); pick row_number() = 1 over
        -- (q DESC, doc_id)
        WITH RECURSIVE pairs AS ({_SHINGLE_JACCARD_SQL}),
        nodes AS (SELECT DISTINCT x AS node FROM
                  (SELECT a AS x FROM pairs
                   UNION SELECT b AS x FROM pairs)),
        edges AS (SELECT a, b FROM pairs
                  UNION SELECT b AS a, a AS b FROM pairs),
        walk(node, label) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.b AS node, w.label FROM walk w
            JOIN edges e ON e.a = w.node
            WHERE w.label < e.b
        ),
        comp AS (SELECT CAST(node AS BIGINT) AS doc_id,
                        CAST(min(label) AS BIGINT) AS cluster_id
                 FROM walk GROUP BY node),
        q AS (
            SELECT doc_id,
                 (CASE WHEN length(text) BETWEEN 50 AND 10000
                       THEN 0.25 ELSE 0 END)
               + (CASE WHEN n_words > 0 AND (sum_wl * 1.0 / n_words)
                            BETWEEN 3.0 AND 12.0 THEN 0.25 ELSE 0 END)
               + (CASE WHEN length(text) = 0
                       OR (n_punct * 1.0 / length(text)) < 0.2
                       THEN 0.25 ELSE 0 END)
               + (CASE WHEN n_words >= 10 THEN 0.25 ELSE 0 END) AS q
            FROM (
                SELECT doc_id, text,
                       len(list_filter(regexp_split_to_array(text,
                           '\\s+'), x -> x <> '')) AS n_words,
                       coalesce(list_sum(list_transform(
                           list_filter(regexp_split_to_array(text,
                               '\\s+'), x -> x <> ''),
                           x -> length(x))), 0) AS sum_wl,
                       length(regexp_extract_all(text,
                           '[!-/:-@\\[-`{{-~]')) AS n_punct
                FROM documents
            )
        ),
        ranked AS (
            SELECT c.cluster_id, c.doc_id,
                   row_number() OVER (PARTITION BY c.cluster_id
                                      ORDER BY q.q DESC, c.doc_id)
                     AS rn,
                   count(*) OVER (PARTITION BY c.cluster_id)
                     AS n_members
            FROM comp c JOIN q USING (doc_id)
        )
        SELECT cluster_id, doc_id AS canonical_doc,
               n_members::BIGINT AS n_members
        FROM ranked WHERE rn = 1 ORDER BY cluster_id
    """,
    "events_attribution": """
        -- linear multi-touch attribution, exact integer cents:
        -- share = cents//k + 1 for the first cents%k touches in
        -- (ts, event_id) order; window = trailing hour, touch
        -- STRICTLY before the purchase; purchases with no touches
        -- report whole as 'unattributed'
        WITH p AS (
            SELECT event_id AS pid, user_id, ts,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ),
        t AS (
            SELECT event_id AS tid, user_id, ts AS tts, event_type
            FROM events WHERE event_type IN ('click', 'view')
        ),
        pairs AS (
            SELECT p.pid, p.cents, t.event_type,
                   row_number() OVER (PARTITION BY p.pid
                                      ORDER BY t.tts, t.tid) AS rk,
                   count(*) OVER (PARTITION BY p.pid) AS k
            FROM p JOIN t ON p.user_id = t.user_id
             AND t.tts >= p.ts - INTERVAL 1 HOUR AND t.tts < p.ts
        ),
        shares AS (
            SELECT event_type,
                   cents // k
                     + CASE WHEN rk <= cents % k THEN 1 ELSE 0 END
                     AS share
            FROM pairs
        ),
        unatt AS (
            SELECT count(*)::BIGINT AS n,
                   coalesce(sum(cents), 0)::BIGINT AS cents
            FROM p WHERE pid NOT IN (SELECT DISTINCT pid FROM pairs)
        )
        SELECT kind, cents, n FROM (
            SELECT event_type AS kind, sum(share)::BIGINT AS cents,
                   count(*)::BIGINT AS n
            FROM shares GROUP BY event_type
            UNION ALL
            SELECT 'unattributed', cents, n FROM unatt
        ) ORDER BY kind
    """,
    "media_phash_dedup": _phash_oracle_sql(),
    "media_audio_fingerprint": _afp_oracle_sql(),
    "media_video_neardup": _vfh_oracle_sql(),
    "emb_kcore": _kcore_oracle_sql(),
    "emb_pca_power": _pca_oracle_sql(),
    "docs_minhash_calibration": _mhcal_oracle_sql(),
    "lineitem_bloom_join": _bloomjoin_oracle_sql(),
    "pages_robots_txt": _robots_oracle_sql(),
    "events_dict_advisor": """
        -- dictionary advisor: grouped counts -> ceil(log2 k) code
        -- width, exact byte estimates, micro-nat Shannon bound
        WITH cc AS (
            SELECT event_type, count(*)::BIGINT AS c
            FROM events GROUP BY 1
        ),
        s AS (
            SELECT sum(c)::BIGINT AS n, count(*)::BIGINT AS k,
                   ln(sum(c)::DOUBLE)
                     - sum(c::DOUBLE * ln(c::DOUBLE))
                       / sum(c)::DOUBLE AS h
            FROM cc
        )
        SELECT n AS n_rows, k AS n_distinct,
               CASE WHEN k > 1
                    THEN CAST(ceil(log2((k)::DOUBLE)) AS BIGINT)
                    ELSE 0 END AS fixed_bits,
               (8 * n)::BIGINT AS raw_bytes,
               ((n * (CASE WHEN k > 1
                           THEN CAST(ceil(log2((k)::DOUBLE))
                                     AS BIGINT)
                           ELSE 0 END) + 7) // 8)::BIGINT
                   AS dict_bytes,
               CAST(floor(h * 1000000 + 0.5) AS BIGINT)
                   AS entropy_micro_nats
        FROM s
    """,
    "orders_open_concurrency": """
        -- the naive per-day interval explosion the sweep must equal:
        -- one row per (order, open day), count per day, top-10
        WITH spans AS (
            SELECT o.o_orderkey,
                   epoch_us(o.o_orderdate) // 86400000000 AS open_day,
                   greatest(max(epoch_us(l.l_shipdate))
                            // 86400000000,
                            epoch_us(o.o_orderdate) // 86400000000)
                       AS close_day
            FROM orders o JOIN lineitem l
              ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2
        ),
        expl AS (
            SELECT unnest(range(open_day, close_day + 1)) AS day
            FROM spans
        )
        SELECT day::BIGINT AS day, count(*)::BIGINT AS n_open
        FROM expl GROUP BY 1
        ORDER BY n_open DESC, day LIMIT 10
    """,
    "events_daily_quantiles": """
        -- per-day exact quantile_cont, round-4 (the value_mad rule)
        SELECT epoch_us(ts) // 86400000000 AS day,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.95), 4) AS p95
        FROM events GROUP BY 1 ORDER BY day
    """,
    "pages_redirects": f"""
        -- capped recursive walk per url; loop ⇔ still redirecting at
        -- the cap; FNV fingerprints over terminal (resolved) or the
        -- url itself (loop); census by kind
        WITH RECURSIVE
        e AS (SELECT src, dst
              FROM read_parquet('{REDIR_ORACLE_DIR}/current/edges.parquet')),
        u AS (SELECT url
              FROM read_parquet('{REDIR_ORACLE_DIR}/current/urls.parquet')),
        walk(url, cur, h) AS (
            SELECT url, url, 0 FROM u
            UNION ALL
            SELECT w.url, e.dst, w.h + 1
            FROM walk w JOIN e ON w.cur = e.src
            WHERE w.h < 64
        ),
        fin AS (
            SELECT url, cur, h FROM (
                SELECT url, cur, h,
                       row_number() OVER (PARTITION BY url
                                          ORDER BY h DESC) AS rn
                FROM walk
            ) WHERE rn = 1
        ),
        cls AS (
            SELECT f.url,
                   CASE WHEN EXISTS (SELECT 1 FROM e
                                     WHERE e.src = f.cur)
                        THEN 'loop' ELSE 'resolved' END AS kind,
                   f.h,
                   CASE WHEN EXISTS (SELECT 1 FROM e
                                     WHERE e.src = f.cur)
                        THEN f.url ELSE f.cur END AS fpkey
            FROM fin f
        ),
        fp AS (
            SELECT kind, h,
                   CAST(list_reduce(
                       list_prepend(
                           CAST(14695981039346656037 AS UHUGEINT),
                           list_transform(string_split(fpkey, ''),
                               c -> CAST(unicode(c) AS UHUGEINT))),
                       (hh, c) -> (xor(CAST(hh AS UBIGINT),
                                       CAST(c AS UBIGINT))::UHUGEINT
                                   * 1099511628211)
                                  % 18446744073709551616::UHUGEINT
                   ) AS UHUGEINT) AS f
            FROM cls
        )
        SELECT kind, count(*)::BIGINT AS n,
               sum(CASE WHEN kind = 'resolved' THEN h
                        ELSE 0 END)::BIGINT AS sum_hops,
               bit_xor(CAST(CASE WHEN f >= 9223372036854775808
                                 THEN f::HUGEINT
                                      - 18446744073709551616::HUGEINT
                                 ELSE f::HUGEINT END
                            AS BIGINT))::BIGINT AS fp_xor
        FROM fp GROUP BY 1 ORDER BY kind
    """,
    "pages_urlnorm_dedup": f"""
        -- keep-latest per canonical url over the written rows; the
        -- canonicalization map is the trusted (unit-tested) step,
        -- the FNV group fingerprints are re-derived in SQL
        WITH src AS (
            SELECT url, ts_us, canon
            FROM read_parquet('{URLDEDUP_ORACLE_DIR}/current/*.parquet')
        ),
        g AS (
            SELECT canon, count(*)::BIGINT AS n_variants,
                   max(ts_us)::BIGINT AS winner_ts_us
            FROM src GROUP BY canon
        ),
        fp AS (
            SELECT CAST(list_reduce(
                       list_prepend(
                           CAST(14695981039346656037 AS UHUGEINT),
                           list_transform(string_split(canon, ''),
                               c -> CAST(unicode(c) AS UHUGEINT))),
                       (h, c) -> (xor(CAST(h AS UBIGINT),
                                      CAST(c AS UBIGINT))::UHUGEINT
                                  * 1099511628211)
                                 % 18446744073709551616::UHUGEINT
                   ) AS UHUGEINT) AS f,
                   n_variants, winner_ts_us
            FROM g
        )
        SELECT CAST(CASE WHEN f >= 9223372036854775808
                         THEN f::HUGEINT
                              - 18446744073709551616::HUGEINT
                         ELSE f::HUGEINT END AS BIGINT) AS canon_fp,
               n_variants, winner_ts_us
        FROM fp ORDER BY canon_fp
    """,
    "events_storage_advisor": """
        -- delta+zigzag+varint size per column in event_id order;
        -- first delta vs 0 (lag default); varint size = 1 + the
        -- 128^k comparison ladder; pure integers
        WITH s AS (
            SELECT event_id,
                   epoch_us(ts) AS ts_us,
                   CAST(round(value * 100) AS BIGINT) AS value_cents
            FROM events
        ),
        d AS (
            SELECT 'event_id' AS col,
                   event_id - lag(event_id, 1, 0)
                       OVER (ORDER BY event_id) AS dv
            FROM s
            UNION ALL
            SELECT 'ts_us',
                   ts_us - lag(ts_us, 1, 0) OVER (ORDER BY event_id)
            FROM s
            UNION ALL
            SELECT 'value_cents',
                   value_cents - lag(value_cents, 1, 0)
                       OVER (ORDER BY event_id)
            FROM s
        ),
        z AS (
            SELECT col,
                   CASE WHEN dv >= 0 THEN 2 * dv::HUGEINT
                        ELSE -2 * dv::HUGEINT - 1 END AS u
            FROM d
        ),
        sz AS (
            SELECT col,
                   1 + (CASE WHEN u >= 128::HUGEINT THEN 1 ELSE 0 END)
                     + (CASE WHEN u >= 16384::HUGEINT THEN 1 ELSE 0 END)
                     + (CASE WHEN u >= 2097152::HUGEINT THEN 1 ELSE 0 END)
                     + (CASE WHEN u >= 268435456::HUGEINT THEN 1 ELSE 0 END)
                     + (CASE WHEN u >= 34359738368::HUGEINT THEN 1 ELSE 0 END)
                     + (CASE WHEN u >= 4398046511104::HUGEINT THEN 1 ELSE 0 END)
                     + (CASE WHEN u >= 562949953421312::HUGEINT THEN 1 ELSE 0 END)
                     + (CASE WHEN u >= 72057594037927936::HUGEINT THEN 1 ELSE 0 END)
                     + (CASE WHEN u >= 9223372036854775808::HUGEINT THEN 1 ELSE 0 END)
                       AS b
            FROM z
        )
        SELECT col AS "column", count(*)::BIGINT AS n,
               (count(*) * 8)::BIGINT AS raw_bytes,
               sum(b)::BIGINT AS varint_bytes,
               (sum(b) * 1000000 // (count(*) * 8))::BIGINT
                   AS ratio_ppm
        FROM sz GROUP BY 1 ORDER BY "column"
    """,
    "emb_hard_negatives": f"""
        -- hardest negatives below the positive threshold: integer
        -- micro-unit cosine, (cos_us DESC, vec_id) row_number pick
        WITH anchors AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings ORDER BY vec_id LIMIT {NEG_N_ANCHORS}
        ),
        cand AS (
            SELECT a.vec_id AS anchor, b.vec_id AS neg_id,
                   CAST(round(round(list_cosine_similarity(
                       a.v, CAST(b.embedding AS DOUBLE[])), 6)
                       * 1000000) AS BIGINT) AS cos_us
            FROM anchors a JOIN embeddings b
              ON a.vec_id <> b.vec_id
        ),
        ranked AS (
            SELECT anchor, neg_id, cos_us,
                   row_number() OVER (PARTITION BY anchor
                       ORDER BY cos_us DESC, neg_id) AS rank
            FROM cand WHERE cos_us < 300000
        )
        SELECT anchor, rank::BIGINT AS rank, neg_id, cos_us
        FROM ranked WHERE rank <= {NEG_K}
        ORDER BY anchor, rank
    """,
    "docs_augmentation": """
        -- deterministic token dropout fully re-derived: shared
        -- tokenizer, the mixed-key Knuth drop rule, string_agg
        -- rebuild, FNV-1a via list_reduce (ASCII: codepoint == byte)
        WITH toks AS (
            SELECT doc_id, lang, unnest(ts) AS tok,
                   unnest(range(len(ts))) AS i
            FROM (
                SELECT doc_id, lang,
                       list_filter(regexp_split_to_array(lower(text),
                           '[^a-z0-9]+'), x -> x <> '') AS ts
                FROM documents
            ) WHERE len(ts) > 0
        ),
        kept AS (
            SELECT doc_id, lang, tok, i FROM toks
            WHERE (((doc_id * 1000003 + i) % 2147483648)
                   * 2654435761) % 4294967296 % 100 >= 10
        ),
        built AS (
            SELECT doc_id, any_value(lang) AS lang,
                   string_agg(tok, ' ' ORDER BY i) AS aug
            FROM kept GROUP BY doc_id
        ),
        fp AS (
            SELECT lang,
                   CAST(list_reduce(
                       list_prepend(
                           CAST(14695981039346656037 AS UHUGEINT),
                           list_transform(string_split(aug, ''),
                               c -> CAST(unicode(c) AS UHUGEINT))),
                       (h, c) -> (xor(CAST(h AS UBIGINT),
                                      CAST(c AS UBIGINT))::UHUGEINT
                                  * 1099511628211)
                                 % 18446744073709551616::UHUGEINT
                   ) AS UHUGEINT) AS f
            FROM built
        ),
        fx AS (
            SELECT lang,
                   bit_xor(CAST(CASE WHEN f >= 9223372036854775808
                                     THEN f::HUGEINT
                                          - 18446744073709551616::HUGEINT
                                     ELSE f::HUGEINT END
                                AS BIGINT)) AS fp_xor
            FROM fp GROUP BY lang
        ),
        cin AS (
            SELECT lang, count(DISTINCT doc_id)::BIGINT AS n_docs,
                   count(*)::BIGINT AS tokens_in
            FROM toks GROUP BY lang
        ),
        ck AS (
            SELECT lang, count(*)::BIGINT AS tokens_kept
            FROM kept GROUP BY lang
        )
        SELECT cin.lang, cin.n_docs, cin.tokens_in, ck.tokens_kept,
               ((cin.tokens_in - ck.tokens_kept) * 1000000
                // cin.tokens_in)::BIGINT AS drop_ppm,
               fx.fp_xor::BIGINT AS fp_xor
        FROM cin JOIN ck USING (lang) JOIN fx USING (lang)
        ORDER BY cin.lang
    """,
    "pages_url_filter": f"""
        -- robots-style gate re-derived from written urls: same three
        -- matchers, same first-match attribution order
        WITH r AS (
            SELECT url,
                   CAST(regexp_extract(url, 'doc(\\d+)$', 1)
                        AS BIGINT) AS d,
                   CASE
                     WHEN starts_with(url,
                          'https://exam.example/TMA')
                          THEN 'deny_prefix_tma'
                     WHEN contains(url, '/V23/')
                          THEN 'deny_contains_v23'
                     WHEN ends_with(url, '0')
                          THEN 'deny_suffix_0'
                     ELSE 'allowed' END AS outcome
            FROM read_parquet(
                '{URLFILTER_ORACLE_DIR}/current/*.parquet')
        )
        SELECT outcome, count(*)::BIGINT AS n,
               bit_xor(d)::BIGINT AS doc_xor
        FROM r GROUP BY 1 ORDER BY outcome
    """,
    "docs_global_index": """
        -- zipWithIndex: row_number over the shared Knuth-hash total
        -- order, returned keyed by doc_id
        SELECT doc_id,
               (row_number() OVER (
                   ORDER BY ((doc_id % 2147483648) * 2654435761)
                            % 4294967296, doc_id) - 1)::BIGINT
                   AS gidx
        FROM documents ORDER BY doc_id
    """,
    "referential_audit": """
        -- star-schema FK orphan census (clean by construction —
        -- the audit proves it)
        SELECT * FROM (
            SELECT 'customer.c_nationkey->nation.n_nationkey'
                       AS relation,
                   count(*)::BIGINT AS n_rows,
                   sum(CASE WHEN n.n_nationkey IS NULL
                            THEN 1 ELSE 0 END)::BIGINT AS n_orphans
            FROM customer c LEFT JOIN nation n
              ON c.c_nationkey = n.n_nationkey
            UNION ALL
            SELECT 'lineitem.l_orderkey->orders.o_orderkey',
                   count(*)::BIGINT,
                   sum(CASE WHEN o.o_orderkey IS NULL
                            THEN 1 ELSE 0 END)::BIGINT
            FROM lineitem l LEFT JOIN orders o
              ON l.l_orderkey = o.o_orderkey
            UNION ALL
            SELECT 'lineitem.l_partkey->part.p_partkey',
                   count(*)::BIGINT,
                   sum(CASE WHEN p.p_partkey IS NULL
                            THEN 1 ELSE 0 END)::BIGINT
            FROM lineitem l LEFT JOIN part p
              ON l.l_partkey = p.p_partkey
            UNION ALL
            SELECT 'lineitem.l_suppkey->supplier.s_suppkey',
                   count(*)::BIGINT,
                   sum(CASE WHEN s.s_suppkey IS NULL
                            THEN 1 ELSE 0 END)::BIGINT
            FROM lineitem l LEFT JOIN supplier s
              ON l.l_suppkey = s.s_suppkey
            UNION ALL
            SELECT 'nation.n_regionkey->region.r_regionkey',
                   count(*)::BIGINT,
                   sum(CASE WHEN r.r_regionkey IS NULL
                            THEN 1 ELSE 0 END)::BIGINT
            FROM nation n LEFT JOIN region r
              ON n.n_regionkey = r.r_regionkey
            UNION ALL
            SELECT 'orders.o_custkey->customer.c_custkey',
                   count(*)::BIGINT,
                   sum(CASE WHEN c.c_custkey IS NULL
                            THEN 1 ELSE 0 END)::BIGINT
            FROM orders o LEFT JOIN customer c
              ON o.o_custkey = c.c_custkey
        ) ORDER BY relation
    """,
    "events_hourly_ivm": """
        -- IVM correctness statement: the engine's base⊕delta merged
        -- view must equal the one-pass full recompute
        SELECT epoch_us(ts) // 3600000000 AS hour, event_type,
               count(*)::BIGINT AS n,
               sum(CAST(round(value * 100) AS BIGINT))::BIGINT
                   AS cents
        FROM events
        GROUP BY 1, 2 ORDER BY hour, event_type
    """,
    "pages_schema_evolution": f"""
        -- DuckDB's union_by_name IS the reference semantics for
        -- by-name schema unification; filename recovers the gen
        SELECT CAST(regexp_extract(filename, 'gen=(\\d+)', 1)
                    AS BIGINT) AS gen,
               count(*)::BIGINT AS n,
               sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT
                   AS n_lang_null,
               sum(CASE WHEN fetch_status IS NULL
                        THEN 1 ELSE 0 END)::BIGINT AS n_status_null,
               sum(n_chars)::BIGINT AS sum_n_chars,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT
                   AS n_en
        FROM read_parquet('{SCHEMA_EVO_DIR}/current/gen=*/*.parquet',
                          union_by_name=true, filename=true)
        GROUP BY 1 ORDER BY gen
    """,
    "docs_quality_prune": """
        -- stratified 80th-percentile quality prune: lexicographic
        -- (gate count, length) composite score, order-statistic
        -- threshold at ceil(0.8 n), above/at split (no tie rule),
        -- kept-id XOR membership
        WITH scored AS (
            SELECT doc_id, lang,
                   ((CASE WHEN length(text) BETWEEN 50 AND 10000
                          THEN 1 ELSE 0 END)
                  + (CASE WHEN n_words > 0 AND (sum_wl * 1.0 / n_words)
                               BETWEEN 3.0 AND 12.0 THEN 1 ELSE 0 END)
                  + (CASE WHEN length(text) = 0
                          OR (n_punct * 1.0 / length(text)) < 0.2
                          THEN 1 ELSE 0 END)
                  + (CASE WHEN n_words >= 10 THEN 1 ELSE 0 END))
                   * 100000 + least(length(text), 99999) AS q4
            FROM (
                SELECT doc_id, lang, text,
                       len(list_filter(regexp_split_to_array(text,
                           '\\s+'), x -> x <> '')) AS n_words,
                       coalesce(list_sum(list_transform(
                           list_filter(regexp_split_to_array(text,
                               '\\s+'), x -> x <> ''),
                           x -> length(x))), 0) AS sum_wl,
                       length(regexp_extract_all(text,
                           '[!-/:-@\\[-`{-~]')) AS n_punct
                FROM documents
            )
        ),
        cum AS (
            SELECT lang, q4,
                   sum(count(*)) OVER (PARTITION BY lang
                                       ORDER BY q4) AS cc,
                   sum(count(*)) OVER (PARTITION BY lang) AS n
            FROM scored GROUP BY lang, q4
        ),
        thr AS (
            SELECT lang, min(q4) AS t, any_value(n) AS n
            FROM cum WHERE cc >= (4 * n + 4) // 5 GROUP BY lang
        )
        SELECT s.lang, any_value(t2.n)::BIGINT AS n,
               any_value(t2.t)::BIGINT AS thr_score,
               sum(CASE WHEN s.q4 > t2.t THEN 1 ELSE 0 END)::BIGINT
                   AS n_above,
               sum(CASE WHEN s.q4 = t2.t THEN 1 ELSE 0 END)::BIGINT
                   AS n_at,
               bit_xor(CASE WHEN s.q4 > t2.t THEN s.doc_id
                            ELSE 0 END)::BIGINT AS id_xor
        FROM scored s JOIN thr t2 USING (lang)
        GROUP BY s.lang ORDER BY s.lang
    """,
    "events_anomaly_mad": """
        -- MAD-z anomaly census in doubled integer cents: med2/mad4
        -- are exact (medians of ints are half-integers; 2x keeps
        -- int64); flag 2*dev2 > 5*mad4; XOR pins membership
        WITH c AS (
            SELECT event_id, event_type,
                   CAST(round(value * 100) AS BIGINT) AS c
            FROM events
        ),
        med AS (
            SELECT event_type,
                   CAST(round(2 * median(c)) AS BIGINT) AS med2
            FROM c GROUP BY 1
        ),
        dev AS (
            SELECT c.event_id, c.event_type,
                   abs(2 * c.c - m.med2) AS dev2
            FROM c JOIN med m USING (event_type)
        ),
        mad AS (
            SELECT event_type,
                   CAST(round(2 * median(dev2)) AS BIGINT) AS mad4
            FROM dev GROUP BY 1
        )
        SELECT d.event_type,
               count(*)::BIGINT AS n,
               sum(CASE WHEN 2 * d.dev2 > 5 * m.mad4
                        THEN 1 ELSE 0 END)::BIGINT AS n_anom,
               (sum(CASE WHEN 2 * d.dev2 > 5 * m.mad4
                         THEN 1 ELSE 0 END) * 1000000
                // count(*))::BIGINT AS anom_ppm,
               bit_xor(CASE WHEN 2 * d.dev2 > 5 * m.mad4
                            THEN d.event_id ELSE 0 END)::BIGINT
                   AS id_xor
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY 1 ORDER BY event_type
    """,
    "emb_mutual_nn": """
        -- reciprocal best match: per-vector top-1 (round-6 cosine,
        -- ties -> lowest vec_id), pairs where each is the other's
        WITH e AS MATERIALIZED (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        p AS MATERIALIZED (
            SELECT a.vec_id AS a, b.vec_id AS b,
                   round(list_cosine_similarity(a.v, b.v), 6) AS c
            FROM e a JOIN e b ON a.vec_id <> b.vec_id
        ),
        top AS MATERIALIZED (
            SELECT a, b, c FROM (
                SELECT a, b, c, row_number() OVER (
                    PARTITION BY a ORDER BY c DESC, b) AS rn
                FROM p
            ) WHERE rn = 1
        )
        SELECT t1.a AS a, t1.b AS b,
               CAST(round(t1.c * 1000000) AS BIGINT) AS cos_us
        FROM top t1 JOIN top t2
          ON t1.b = t2.a AND t2.b = t1.a AND t1.a < t1.b
        ORDER BY a
    """,
    "emb_silhouette": f"""
        -- simplified silhouette from raw embeddings + the written
        -- trained centroids: micro-unit distances, lowest-cell ties,
        -- integer-ppm scores, per-cell census
        WITH c AS (SELECT cell, v
                   FROM read_parquet('{SIL_ORACLE_DIR}/current/*.parquet')),
        d AS (
            SELECT e.vec_id, c.cell,
                   CAST(floor(list_sum(list_transform(range(1, 65),
                        i -> (e.emb[i] - c.v[i]) * (e.emb[i] - c.v[i])))
                        * 1000000 + 0.5) AS BIGINT) AS d_us
            FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                  FROM embeddings) e
            CROSS JOIN c
        ),
        asg AS (SELECT vec_id, cell, d_us,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d_us, cell) AS rn
                FROM d),
        own AS (SELECT vec_id, cell AS own_cell, d_us AS a_us
                FROM asg WHERE rn = 1),
        bb AS (SELECT d.vec_id, min(d.d_us) AS b_us
               FROM d JOIN own o ON d.vec_id = o.vec_id
                                AND d.cell <> o.own_cell
               GROUP BY 1),
        s AS (SELECT o.own_cell AS cell,
                     ((bb.b_us - o.a_us) * 1000000)
                     // greatest(o.a_us, bb.b_us, 1) AS s_ppm
              FROM own o JOIN bb USING (vec_id))
        SELECT cell::BIGINT AS cell, count(*)::BIGINT AS n,
               sum(s_ppm)::BIGINT AS sum_s_ppm,
               (sum(s_ppm) // count(*))::BIGINT AS silhouette_ppm
        FROM s GROUP BY 1 ORDER BY cell
    """,
    "emb_feature_profile": f"""
        -- per-dimension integer sufficient stats over the micro-unit
        -- quantization (sign·floor(|x|·1e6+0.5) of the DOUBLE cast)
        SELECT q.i::BIGINT AS dim,
               count(*)::BIGINT AS n,
               sum(qv)::BIGINT AS s,
               sum(qv * qv)::BIGINT AS ss,
               min(qv)::BIGINT AS mn,
               max(qv)::BIGINT AS mx
        FROM (
            SELECT i.i,
                   CAST(sign(emb[i.i + 1])
                        * floor(abs(emb[i.i + 1]) * {PCA_SCALE_Q}
                                + 0.5) AS BIGINT) AS qv
            FROM (SELECT CAST(embedding AS DOUBLE[]) AS emb
                  FROM embeddings)
            CROSS JOIN (SELECT unnest(range(64)) AS i) i
        ) q(i, qv)
        GROUP BY 1 ORDER BY dim
    """,
    "supplier_sole_late": """
        -- Q21 shape: sole late shipper on multi-supplier orders;
        -- EXISTS/NOT-EXISTS as grouped aggregates, winner recovered
        -- via sum(skey*late) under the n_late=1 condition
        WITH lo AS (
            SELECT l.l_orderkey AS okey, l.l_suppkey AS skey,
                   max(CASE WHEN epoch_us(l.l_shipdate)
                             > epoch_us(o.o_orderdate) + 5184000000000
                            THEN 1 ELSE 0 END) AS late
            FROM lineitem l JOIN orders o
              ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2
        ),
        po AS (
            SELECT okey, count(*) AS n_supp, sum(late) AS n_late,
                   sum(skey * late) AS w
            FROM lo GROUP BY 1
        )
        SELECT w::BIGINT AS s_suppkey, count(*)::BIGINT AS n_orders
        FROM po WHERE n_supp >= 2 AND n_late = 1
        GROUP BY 1 ORDER BY n_orders DESC, s_suppkey
        LIMIT 10
    """,
    "pages_link_census": f"""
        -- outlink census re-derived ENTIRELY in SQL from the written
        -- raw page rows: regexp_extract_all == the engine's
        -- split+prefix-capture (w/ python-re fallback) by construction
        WITH links AS (
            SELECT url, ts_us,
                   unnest(regexp_extract_all(html,
                          'href="([^"]*)"', 1)) AS target
            FROM read_parquet('{LINKS_ORACLE_DIR}/current/*.parquet')
        ),
        agg AS (
            SELECT target, count(*)::BIGINT AS n_links
            FROM links GROUP BY 1
        ),
        docs AS (
            SELECT target, count(*)::BIGINT AS n_docs
            FROM (SELECT DISTINCT url, ts_us, target FROM links)
            GROUP BY 1
        )
        SELECT a.target, a.n_links, d.n_docs
        FROM agg a JOIN docs d USING (target)
        ORDER BY a.n_links DESC, a.target
        LIMIT {LINK_TOP_K}
    """,
    "customer_l_diversity": """
        -- distinct l-diversity census over (nation, $5000 band)
        -- classes with c_mktsegment sensitive; truncating band
        WITH cls AS (
            SELECT c_nationkey AS nat,
                   CAST(round(c_acctbal * 100) AS BIGINT) // 500000
                       AS band,
                   count(DISTINCT c_mktsegment)::BIGINT AS diversity,
                   count(*)::BIGINT AS sz
            FROM customer GROUP BY 1, 2
        )
        SELECT CAST(3 AS BIGINT) AS l,
               sum(sz)::BIGINT AS n_rows,
               count(*)::BIGINT AS n_classes,
               min(diversity)::BIGINT AS min_diversity,
               sum(CASE WHEN diversity < 3 THEN 1 ELSE 0 END)::BIGINT
                   AS classes_below_l,
               sum(CASE WHEN diversity < 3 THEN sz ELSE 0 END)::BIGINT
                   AS rows_at_risk,
               (sum(CASE WHEN diversity < 3 THEN sz ELSE 0 END)
                * 1000000 // sum(sz))::BIGINT AS risk_ppm
        FROM cls
    """,
    "customer_record_linkage": """
        -- Fellegi–Sunter blocked linkage census: dirty side re-derived
        -- from customer by the same deterministic rule, blocked on
        -- (nation, custkey//1000), scored with the declared integer
        -- weights; same class thresholds; pair XOR pins membership
        WITH dirty AS (
            SELECT c_custkey + 1000000 AS rid, c_custkey AS src_key,
                   CASE WHEN c_custkey % 3 = 0
                        THEN substr(c_name, 1, 11) || 'X'
                             || substr(c_name, 13)
                        ELSE c_name END AS name,
                   c_nationkey AS nation, c_mktsegment AS segment,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS cents
            FROM customer WHERE c_custkey % 3 != 2
        ),
        cand AS (
            SELECT c.c_custkey AS a, d.rid AS b,
                   levenshtein(c.c_name, d.name) AS lev,
                   (c.c_mktsegment = d.segment) AS seg_eq,
                   (CAST(round(c.c_acctbal * 100) AS BIGINT) // 200000
                    = d.cents // 200000) AS band_eq
            FROM customer c JOIN dirty d
              ON c.c_nationkey = d.nation
             AND c.c_custkey // 1000 = d.src_key // 1000
        ),
        scored AS (
            SELECT a, b,
                   (CASE WHEN lev = 0 THEN 40
                         WHEN lev <= 2 THEN 25 ELSE -30 END
                    + CASE WHEN seg_eq THEN 15 ELSE -10 END
                    + CASE WHEN band_eq THEN 10 ELSE -5 END) AS score
            FROM cand
        )
        SELECT CASE WHEN score >= 50 THEN 'match'
                    WHEN score >= 20 THEN 'possible'
                    ELSE 'non_match' END AS class,
               count(*)::BIGINT AS n_pairs,
               sum(score)::BIGINT AS score_sum,
               bit_xor(a * 1000003 + b)::BIGINT AS pair_xor
        FROM scored
        GROUP BY 1 ORDER BY class
    """,
    "docs_containment_join": """
        -- brute-force ordered containment pairs over per-doc DISTINCT
        -- word-3-gram sets: |Sa ∩ Sb| / |Sa| >= 0.8, a <> b;
        -- integer-ppm gate and floor division, same tokenization as
        -- docs_setsim_join
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> '') AS arr
            FROM documents
        ),
        pos AS (
            SELECT doc_id, unnest(arr) AS tok,
                   unnest(range(1, len(arr) + 1)) AS p
            FROM toks WHERE len(arr) >= 3
        ),
        big AS (
            SELECT doc_id,
                   lag(tok, 2) OVER w || chr(1)
                     || lag(tok, 1) OVER w || chr(1) || tok AS g
            FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY p)
        ),
        sets AS (
            SELECT doc_id, count(DISTINCT g)::BIGINT AS sz,
                   list(DISTINCT g) AS s
            FROM big WHERE g IS NOT NULL GROUP BY doc_id
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_intersect(a.s, b.s))::BIGINT AS i,
                   a.sz AS sz_a
            FROM sets a JOIN sets b ON a.doc_id <> b.doc_id
        )
        SELECT doc_a, doc_b, i * 1000000 // sz_a AS containment_ppm
        FROM pairs WHERE i * 1000000 >= 800000 * sz_a
        ORDER BY doc_a, doc_b
    """,
    "orders_hits": __import__(
        "ocracle_ray.stages.hits", fromlist=["hits_oracle_sql"]
    ).hits_oracle_sql(
        """SELECT o.o_custkey AS c, l.l_partkey AS p,
                  count(*)::BIGINT AS w
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
           GROUP BY 1, 2""",
        n_rounds=2, k=10),
}
