"""Declarative data-quality expectations (Deequ / Great-Expectations
style) — the CI gate of a data pipeline: a declared check suite
evaluated in as few passes as the checks allow, each check reporting
(observed metric, threshold, passed) so a release can assert on the
frame instead of eyeballing profiles (stages/profile.py measures;
this JUDGES against declared contracts).

Pass structure, by check class:
- row-local predicates (null rate, bounds, domain membership,
  timestamp range) — ALL evaluated in ONE streaming combiner pass:
  each batch emits one small integer partial row, the driver folds
  O(batches) rows. Adding a check adds a column, not a pass.
- referential integrity (fk ⊆ pk) — the pk side folds/broadcasts
  behind a loud guard (the flagship winner-map shape), the fk side
  joins the SAME single pass via one ``pc.is_in`` kernel (no join).
- key uniqueness — the one check that genuinely needs an exchange
  (duplicates live across blocks): ONE groupby(key).count, metric =
  n_rows − n_groups. At 100 TB, prefilter with the Bloom pass
  (stages/dedup.build_hash_bloom) to shrink the exchange.

All metrics are exact integers (counts, or ppm rates by floor
division) so the DuckDB oracle re-derives every observed value and
every pass/fail verdict by integer equality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

PK_BROADCAST_LIMIT = 50_000_000  # referential pk side must broadcast

# the declared suite for the events table: (check, threshold) —
# thresholds are ppm for rates, 0 for "no violating rows"
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
TS_LO = "2020-01-01"
TS_HI = "2030-01-01"
NULL_RATE_LIMIT_PPM = 10_000  # value col may be <=1% null
VALUE_MAX_CENTS = 10_000_000  # 100k dollars: bound, not a guess


def events_expectations(events_ds, customer_ds) -> pd.DataFrame:
    """(check, observed, threshold, passed) for the declared events
    suite; observed/threshold int64, passed 0/1."""
    import ray

    from ..broadcast import cached_get
    from ..pipelines.queries import driver_grouped_agg

    pk = driver_grouped_agg(customer_ds, ["c_custkey"],
                            {"_n": ("c_custkey", "count")})
    if len(pk) > PK_BROADCAST_LIMIT:
        raise ValueError(
            f"expectations: pk side {len(pk)} > {PK_BROADCAST_LIMIT} "
            "— referential check needs the join lane, not broadcast")
    pk_arr = pa.array(np.sort(pk["c_custkey"].to_numpy().astype(np.int64)),
                      pa.int64())
    pk_ref = ray.put(pk_arr)
    types_arr = pa.array(list(EVENT_TYPES), pa.string())
    ts_lo = pd.Timestamp(TS_LO).value // 1000
    ts_hi = pd.Timestamp(TS_HI).value // 1000

    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        val = t["value"]
        n_val_null = val.null_count
        v = val.drop_null().to_numpy(zero_copy_only=False)
        # DuckDB-parity half-away rounding (CAST(round(v*100) AS BIGINT))
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(
            np.int64)
        n_val_neg = int((c < 0).sum())
        n_val_big = int((c > VALUE_MAX_CENTS).sum())
        bad_type = int(pc.sum(pc.invert(pc.is_in(
            t["event_type"], value_set=types_arr))).as_py() or 0)
        ts_us = (t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
                 .to_numpy(zero_copy_only=False))
        n_ts_null = t["ts"].null_count
        if n_ts_null:
            raise ValueError("expectations: null ts rows — the range "
                             "check assumes non-null timestamps")
        n_ts_out = int(((ts_us < ts_lo) | (ts_us >= ts_hi)).sum())
        orphan = int(pc.sum(pc.invert(pc.is_in(
            t["user_id"], value_set=cached_get(pk_ref)))).as_py() or 0)
        return pa.table({k: pa.array([v], pa.int64()) for k, v in {
            "n": n, "n_val_null": n_val_null, "n_val_neg": n_val_neg,
            "n_val_big": n_val_big, "bad_type": bad_type,
            "n_ts_out": n_ts_out, "orphan": orphan,
        }.items()})

    tot = {k: 0 for k in ("n", "n_val_null", "n_val_neg", "n_val_big",
                          "bad_type", "n_ts_out", "orphan")}
    for b in events_ds.map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for k in tot:
            tot[k] += int(pc.sum(b[k]).as_py() or 0)

    # uniqueness: the one exchange — n_rows minus distinct keys
    from ray.data.aggregate import Count

    n_distinct = (events_ds.select_columns(["event_id"])
                  .groupby("event_id")
                  .aggregate(Count(alias_name="_c")).count())
    dup_keys = tot["n"] - int(n_distinct)

    null_rate_ppm = (tot["n_val_null"] * 1_000_000 // tot["n"]
                     if tot["n"] else 0)
    rows = [
        ("event_id_unique", dup_keys, 0, int(dup_keys <= 0)),
        ("event_type_in_domain", tot["bad_type"], 0,
         int(tot["bad_type"] <= 0)),
        ("ts_in_range", tot["n_ts_out"], 0, int(tot["n_ts_out"] <= 0)),
        ("user_id_references_customer", tot["orphan"], 0,
         int(tot["orphan"] <= 0)),
        ("value_cents_at_most_max", tot["n_val_big"], 0,
         int(tot["n_val_big"] <= 0)),
        ("value_non_negative", tot["n_val_neg"], 0,
         int(tot["n_val_neg"] <= 0)),
        ("value_null_rate_ppm", null_rate_ppm, NULL_RATE_LIMIT_PPM,
         int(null_rate_ppm <= NULL_RATE_LIMIT_PPM)),
    ]
    out = pd.DataFrame(rows, columns=["check", "observed",
                                      "threshold", "passed"])
    for c in ("observed", "threshold", "passed"):
        out[c] = out[c].astype("int64")
    return out.sort_values("check").reset_index(drop=True)
