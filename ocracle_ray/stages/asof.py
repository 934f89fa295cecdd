"""Boundary-carry distributed as-of join (strictly-prior match).

Round 3 removes the last guarded per-group operator: the as-of join
("for each purchase, the most recent STRICTLY-prior click by the same
user") previously ran as ``groupby(user).map_groups(merge_asof)`` under
``guarded_map_groups`` — correct, but a bot user still meant a raised
guard instead of an answer. This is the ``stages/running.py`` shape
applied to as-of semantics:

1. filter to the two event types AT THE READ (nothing else moves),
   ``sort((user, ts, id))``, ``materialize()`` (two passes must see
   identical blocks).
2. per-BLOCK scan emits three row kinds in one pass:
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

Tie rule among equal-ts clicks: max (ts, event_id) — deterministic;
the fixture has no (user, ts) click ties so this matches any ASOF
implementation's choice there.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .running import _runs

_SENT = np.int64(-1)  # "no click" sentinel for (ts, id) carries


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
    strictly-prior source event by the same user."""
    import pyarrow as pa
    import ray.data as rd

    def prune(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t[type_col], value_set=pa.array([target, source])))

    s = (
        ds.map_batches(prune, batch_format="pyarrow")
        .sort([user_col, ts_col, id_col])
        .materialize()
    )

    KINDS = ("res", "unres", "seg")

    def block_scan(df: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "kind": [], user_col: [], "seg_ts": [], "seg_id": [],
            id_col: [], "ts_p": [], "prev_click_id": [],
            "c1_ts": [], "c1_id": [], "c0_ts": [], "c0_id": [],
        }
        if len(df) == 0:
            out = pd.DataFrame(cols)
            return out.astype({c: "int64" for c in out.columns if c != "kind"})
        u = df[user_col].to_numpy()
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        ids = df[id_col].to_numpy().astype(np.int64)
        typ = df[type_col].to_numpy()
        starts, _ = _runs(u)
        ends = np.append(starts[1:], len(df))

        def emit(kind, **kw):
            cols["kind"].append(kind)
            for c in cols:
                if c == "kind":
                    continue
                cols[c].append(int(kw.get(c, _SENT)))

        for st, en in zip(starts, ends):
            tss, idd, tp = ts[st:en], ids[st:en], typ[st:en]
            user, seg_ts, seg_id = u[st], int(tss[0]), int(idd[0])
            clicks = np.flatnonzero(tp == source)
            buys = np.flatnonzero(tp == target)
            ct, ci = tss[clicks], idd[clicks]
            if len(buys):
                pos = np.searchsorted(ct, tss[buys], side="left") - 1
                for bi, p in zip(buys, pos):
                    if p >= 0:
                        emit("res", **{user_col: user, id_col: idd[bi],
                                       "prev_click_id": ci[p]})
                    else:
                        emit("unres", **{user_col: user, "seg_ts": seg_ts,
                                         "seg_id": seg_id, id_col: idd[bi],
                                         "ts_p": tss[bi]})
            if len(clicks):
                c1_ts, c1_id = int(ct[-1]), int(ci[-1])
                p0 = np.searchsorted(ct, c1_ts, side="left") - 1
                c0_ts = int(ct[p0]) if p0 >= 0 else int(_SENT)
                c0_id = int(ci[p0]) if p0 >= 0 else int(_SENT)
                emit("seg", **{user_col: user, "seg_ts": seg_ts, "seg_id": seg_id,
                               "c1_ts": c1_ts, "c1_id": c1_id,
                               "c0_ts": c0_ts, "c0_id": c0_id})
            else:
                emit("seg", **{user_col: user, "seg_ts": seg_ts, "seg_id": seg_id})
        out = pd.DataFrame(cols)
        return out.astype({c: "int64" for c in out.columns if c != "kind"})

    scanned = s.map_batches(block_scan, batch_format="pandas", batch_size=None).materialize()

    def pick(kind: str, keep: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df.loc[df["kind"] == kind, keep]

        return fn

    resolved = scanned.map_batches(
        pick("res", [id_col, "prev_click_id"]), batch_format="pandas"
    )

    segs = scanned.map_batches(
        pick("seg", [user_col, "seg_ts", "seg_id", "c1_ts", "c1_id", "c0_ts", "c0_id"]),
        batch_format="pandas",
    )

    def carry_in(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["seg_ts", "seg_id"]).reset_index(drop=True)
        c1 = (int(_SENT), int(_SENT))
        c0 = (int(_SENT), int(_SENT))
        rows = []
        for r in g.itertuples(index=False):
            rows.append((getattr(r, user_col), r.seg_ts, r.seg_id,
                         c1[0], c1[1], c0[0], c0[1]))
            if r.c1_ts >= 0:
                cands = [c for c in (c1, c0, (r.c1_ts, r.c1_id), (r.c0_ts, r.c0_id))
                         if c[0] >= 0]
                c1 = max(cands)
                lower = [c for c in cands if c[0] < c1[0]]
                c0 = max(lower) if lower else (int(_SENT), int(_SENT))
        return pd.DataFrame(
            rows,
            columns=[user_col, "seg_ts", "seg_id",
                     "in1_ts", "in1_id", "in0_ts", "in0_id"],
        ).astype("int64")

    carries = (
        segs.groupby(user_col)
        .map_groups(carry_in, batch_format="pandas")
        # map_groups emits zero-column empty blocks that poison the
        # hash join's build side (see stages/running.py) — coalesce
        .repartition(max(2, num_join_partitions // 2))
    )

    unresolved = scanned.map_batches(
        pick("unres", [user_col, "seg_ts", "seg_id", id_col, "ts_p"]),
        batch_format="pandas",
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

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        ts_p = df["ts_p"].to_numpy()
        use1 = df["in1_ts"].to_numpy() < ts_p  # sentinel -1 < any real ts
        use1 &= df["in1_ts"].to_numpy() >= 0
        use0 = (~use1) & (df["in0_ts"].to_numpy() >= 0) & (
            df["in0_ts"].to_numpy() < ts_p
        )
        prev = np.where(use1, df["in1_id"].to_numpy(),
                        np.where(use0, df["in0_id"].to_numpy(), _SENT))
        out = pd.DataFrame({id_col: df[id_col].to_numpy(), "prev_click_id": prev})
        return out[out["prev_click_id"] >= 0].astype("int64")

    boundary = joined.map_batches(resolve, batch_format="pandas")

    def typed(df: pd.DataFrame) -> pd.DataFrame:
        # an all-empty dataset can arrive column-less (every block was
        # an untouched empty); rebuild the frame shape
        if id_col not in df.columns:
            return pd.DataFrame(
                {id_col: pd.Series(dtype="int64"),
                 "prev_click_id": pd.Series(dtype="int64")}
            )
        return df[[id_col, "prev_click_id"]]

    out = pd.concat(
        [typed(resolved.to_pandas()), typed(boundary.to_pandas())],
        ignore_index=True,
    )
    return (
        out.astype({id_col: "int64", "prev_click_id": "int64"})
        .sort_values(id_col)
        .reset_index(drop=True)
    )
