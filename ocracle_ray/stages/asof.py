"""Boundary-carry distributed as-of join (strictly-prior match).

Round 3 removed the last guarded per-group operator: the as-of join
("for each purchase, the most recent STRICTLY-prior click by the same
user") previously ran as ``groupby(user).map_groups(merge_asof)`` under
``guarded_map_groups`` — correct, but a bot user still meant a raised
guard instead of an answer. This is the ``stages/running.py`` shape
applied to as-of semantics:

1. filter to the two event types AT THE READ (nothing else moves),
   ``sort((user, ts, id))``, ``materialize()`` (two passes must see
   identical blocks).
2. per-BLOCK Arrow-native scan emits three row kinds in one pass
   (round 4: pyarrow batches + numpy views end to end — the old
   pandas round trip copied every block twice, and its ``int()``
   coercion silently required integer user keys; the user column now
   rides in its NATIVE dtype, advice r3):
   - ``res``: purchases resolved IN-BLOCK (a prior same-run click with
     ``ts < ts_p`` exists — ``searchsorted(..., 'left') - 1`` gives the
     last strictly-earlier click, exact under ts ties);
   - ``unres``: purchases whose run has no strictly-earlier in-block
     click, tagged with their segment key (run's first event);
   - ``seg``: one row per (block, user-run) carrying the run's last
     click ``c1`` and its last click with ``ts < c1.ts`` (``c0``) —
     the pair needed to answer any later "strictly before ts_p" query
     across a boundary, because earlier segments only contain events
     with ts <= ts_p: if ``c1.ts == ts_p`` the strict answer is
     ``c0``.
3. ``groupby(user)`` over SEGMENT rows (group size bounded by the
   number of blocks the user spans, independent of event count)
   computes each segment's cumulative CARRY-IN (c1, c0 over all
   earlier segments).
4. unresolved purchases hash-join their segment's carry-in and resolve
   vectorized per batch; purchases with no strictly-prior click
   anywhere drop (inner-join semantics of the oracle's ASOF JOIN).

Round 4 (VERDICT r3 #4): the full per-purchase result no longer lands
on the driver — :func:`asof_to_parquet` streams (user, purchase,
prev click) rows to partitioned parquet, exactly like
``running_sum_to_parquet``, and returns a per-user summary aggregated
FROM the written files. :func:`asof_prev_event` stays as the
driver-frame API for small inputs / tests.

Tie rule among equal-ts clicks: max (ts, event_id) — deterministic;
the fixture has no (user, ts) click ties so this matches any ASOF
implementation's choice there.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SENT = np.int64(-1)  # "no click" sentinel for (ts, id) carries

_K_RES, _K_UNRES, _K_SEG = np.int8(0), np.int8(1), np.int8(2)

_I64_COLS = ("seg_ts", "seg_id", "event_id_o", "ts_p", "prev_click_id",
             "c1_ts", "c1_id", "c0_ts", "c0_id")


def _runs(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    new = np.empty(len(u), dtype=bool)
    if len(u):
        new[0] = True
        new[1:] = u[1:] != u[:-1]
    return np.flatnonzero(new), np.cumsum(new) - 1


def _asof_pipeline(
    ds,
    *,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    target: str,
    source: str,
    num_join_partitions: int,
):
    """The shared lazy pipeline: returns (resolved, boundary) Datasets,
    each with columns (user_col, id_col, prev_click_id) — one row per
    resolvable target event. Arrow-native throughout."""
    import pyarrow.compute as pc
    import ray.data as rd  # noqa: F401 — documents the Dataset surface

    def prune(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[type_col], value_set=pa.array([target, source])))

    s = (
        ds.map_batches(prune, batch_format="pyarrow")
        .sort([user_col, ts_col, id_col])
        .materialize()
    )

    def block_scan(t: pa.Table) -> pa.Table:
        # numpy views over the Arrow block; the user column keeps its
        # native dtype (object for strings) — never forced through int
        u = t[user_col].to_numpy(zero_copy_only=False)
        ts = (
            t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        typ = t[type_col].to_numpy(zero_copy_only=False)

        kinds: list[np.ndarray] = []
        users: list[np.ndarray] = []
        parts: dict[str, list[np.ndarray]] = {c: [] for c in _I64_COLS}

        def emit(kind: np.int8, n: int, user_vals: np.ndarray, **kw) -> None:
            kinds.append(np.full(n, kind, np.int8))
            users.append(user_vals)
            for c in _I64_COLS:
                v = kw.get(c)
                parts[c].append(
                    v if v is not None else np.full(n, _SENT, np.int64)
                )

        starts, _ = _runs(u)
        ends = np.append(starts[1:], len(u))
        for st, en in zip(starts, ends):
            tss, idd, tp = ts[st:en], ids[st:en], typ[st:en]
            seg_ts = np.full(1, tss[0], np.int64)
            seg_id = np.full(1, idd[0], np.int64)
            uval = u[st:st + 1]
            clicks = np.flatnonzero(tp == source)
            buys = np.flatnonzero(tp == target)
            ct, ci = tss[clicks], idd[clicks]
            if len(buys):
                pos = np.searchsorted(ct, tss[buys], side="left") - 1
                res = pos >= 0
                n_res = int(res.sum())
                if n_res:
                    emit(
                        _K_RES, n_res,
                        np.broadcast_to(uval, (n_res,)).copy(),
                        event_id_o=idd[buys[res]],
                        prev_click_id=ci[pos[res]],
                    )
                n_un = len(buys) - n_res
                if n_un:
                    emit(
                        _K_UNRES, n_un,
                        np.broadcast_to(uval, (n_un,)).copy(),
                        seg_ts=np.broadcast_to(seg_ts, (n_un,)).copy(),
                        seg_id=np.broadcast_to(seg_id, (n_un,)).copy(),
                        event_id_o=idd[buys[~res]],
                        ts_p=tss[buys[~res]],
                    )
            if len(clicks):
                c1_ts, c1_id = ct[-1], ci[-1]
                p0 = np.searchsorted(ct, c1_ts, side="left") - 1
                emit(
                    _K_SEG, 1, uval.copy(),
                    seg_ts=seg_ts, seg_id=seg_id,
                    c1_ts=np.full(1, c1_ts, np.int64),
                    c1_id=np.full(1, c1_id, np.int64),
                    c0_ts=np.full(1, ct[p0] if p0 >= 0 else _SENT, np.int64),
                    c0_id=np.full(1, ci[p0] if p0 >= 0 else _SENT, np.int64),
                )
            else:
                emit(_K_SEG, 1, uval.copy(), seg_ts=seg_ts, seg_id=seg_id)

        if not kinds:
            cols = {"kind": pa.array([], pa.int8()),
                    user_col: t[user_col].slice(0, 0)}
            for c in _I64_COLS:
                cols[c] = pa.array([], pa.int64())
            return pa.table(cols)
        cols = {
            "kind": pa.array(np.concatenate(kinds)),
            user_col: pa.array(np.concatenate(users), type=t[user_col].type),
        }
        for c in _I64_COLS:
            cols[c] = pa.array(np.concatenate(parts[c]))
        return pa.table(cols)

    scanned = s.map_batches(
        block_scan, batch_format="pyarrow", batch_size=None
    ).materialize()

    def pick(kind: np.int8, keep: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["kind"], kind)).select(keep)

        return fn

    resolved = scanned.map_batches(
        pick(_K_RES, [user_col, "event_id_o", "prev_click_id"]),
        batch_format="pyarrow",
    )

    segs = scanned.map_batches(
        pick(_K_SEG, [user_col, "seg_ts", "seg_id",
                      "c1_ts", "c1_id", "c0_ts", "c0_id"]),
        batch_format="pyarrow",
    )

    def carry_in(g: pa.Table) -> pa.Table:
        seg_ts = g["seg_ts"].to_numpy()
        seg_id = g["seg_id"].to_numpy()
        order = np.lexsort((seg_id, seg_ts))
        c1_ts = g["c1_ts"].to_numpy()[order]
        c1_id = g["c1_id"].to_numpy()[order]
        c0_ts = g["c0_ts"].to_numpy()[order]
        c0_id = g["c0_id"].to_numpy()[order]
        n = len(order)
        in1 = np.empty((n, 2), np.int64)
        in0 = np.empty((n, 2), np.int64)
        c1 = (int(_SENT), int(_SENT))
        c0 = (int(_SENT), int(_SENT))
        for i in range(n):
            in1[i] = c1
            in0[i] = c0
            if c1_ts[i] >= 0:
                cands = [c for c in (c1, c0, (int(c1_ts[i]), int(c1_id[i])),
                                     (int(c0_ts[i]), int(c0_id[i])))
                         if c[0] >= 0]
                c1 = max(cands)
                lower = [c for c in cands if c[0] < c1[0]]
                c0 = max(lower) if lower else (int(_SENT), int(_SENT))
        return pa.table(
            {
                user_col: g[user_col].take(pa.array(order, pa.int64())),
                "seg_ts": pa.array(seg_ts[order]),
                "seg_id": pa.array(seg_id[order]),
                "in1_ts": pa.array(in1[:, 0]),
                "in1_id": pa.array(in1[:, 1]),
                "in0_ts": pa.array(in0[:, 0]),
                "in0_id": pa.array(in0[:, 1]),
            }
        )

    carries = (
        segs.groupby(user_col)
        .map_groups(carry_in, batch_format="pyarrow")
        # map_groups emits zero-column empty blocks that poison the
        # hash join's build side (see stages/running.py) — coalesce
        .repartition(max(2, num_join_partitions // 2))
    )

    unresolved = scanned.map_batches(
        pick(_K_UNRES, [user_col, "seg_ts", "seg_id", "event_id_o", "ts_p"]),
        batch_format="pyarrow",
        # an empty sorted block skips block_scan AND pick, surviving as
        # a zero-column block that poisons the hash join (see
        # stages/running.py) — coalesce it away
    ).repartition(max(2, num_join_partitions // 2))

    joined = unresolved.join(
        carries,
        join_type="inner",
        num_partitions=num_join_partitions,
        on=(user_col, "seg_ts", "seg_id"),
    )

    def resolve(t: pa.Table) -> pa.Table:
        ts_p = t["ts_p"].to_numpy()
        in1_ts = t["in1_ts"].to_numpy()
        in0_ts = t["in0_ts"].to_numpy()
        use1 = (in1_ts < ts_p) & (in1_ts >= 0)
        use0 = (~use1) & (in0_ts >= 0) & (in0_ts < ts_p)
        prev = np.where(use1, t["in1_id"].to_numpy(),
                        np.where(use0, t["in0_id"].to_numpy(), _SENT))
        keep = prev >= 0
        idx = pa.array(np.flatnonzero(keep), pa.int64())
        return pa.table(
            {
                user_col: t[user_col].take(idx),
                "event_id_o": t["event_id_o"].take(idx),
                "prev_click_id": pa.array(prev[keep]),
            }
        )

    boundary = joined.map_batches(resolve, batch_format="pyarrow")
    return resolved, boundary


def asof_prev_event(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    target: str = "purchase",
    source: str = "click",
    num_join_partitions: int = 8,
) -> pd.DataFrame:
    """(id_col, prev_click_id) for every target event with a
    strictly-prior source event by the same user — the DRIVER-FRAME
    form (small inputs / tests). At scale use :func:`asof_to_parquet`,
    which never materializes the per-event result on the driver."""
    resolved, boundary = _asof_pipeline(
        ds, user_col=user_col, ts_col=ts_col, id_col=id_col,
        type_col=type_col, target=target, source=source,
        num_join_partitions=num_join_partitions,
    )

    def typed(df: pd.DataFrame) -> pd.DataFrame:
        # an all-empty dataset can arrive column-less (every block was
        # an untouched empty); rebuild the frame shape
        if "event_id_o" not in df.columns:
            return pd.DataFrame(
                {id_col: pd.Series(dtype="int64"),
                 "prev_click_id": pd.Series(dtype="int64")}
            )
        return df.rename(columns={"event_id_o": id_col})[
            [id_col, "prev_click_id"]
        ]

    out = pd.concat(
        [typed(resolved.to_pandas()), typed(boundary.to_pandas())],
        ignore_index=True,
    )
    return (
        out.astype({id_col: "int64", "prev_click_id": "int64"})
        .sort_values(id_col)
        .reset_index(drop=True)
    )


def asof_to_parquet(
    ds,
    out_dir: str,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    target: str = "purchase",
    source: str = "click",
    num_join_partitions: int = 8,
) -> pd.DataFrame:
    """Write the per-target as-of rows (user, id, prev_click_id) to
    ``out_dir`` as parquet — the result NEVER transits the driver —
    and return a per-user summary aggregated FROM the written files
    (count + id checksums), mirroring ``running_sum_to_parquet``
    (VERDICT r3 #4)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    resolved, boundary = _asof_pipeline(
        ds, user_col=user_col, ts_col=ts_col, id_col=id_col,
        type_col=type_col, target=target, source=source,
        num_join_partitions=num_join_partitions,
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [id_col if c == "event_id_o" else c for c in t.column_names]
        )

    resolved.map_batches(rename, batch_format="pyarrow").union(
        boundary.map_batches(rename, batch_format="pyarrow")
    ).write_parquet(out_dir)

    # summarize FROM the written artifact (the driver verifies what the
    # sink actually holds, not an in-memory sibling)
    written = rd.read_parquet(out_dir)
    return (
        written.groupby(user_col)
        .aggregate(
            Count(alias_name="n_resolved"),
            Sum(id_col, alias_name="sum_event_id"),
            Sum("prev_click_id", alias_name="sum_prev_click_id"),
        )
        .to_pandas()
    )
