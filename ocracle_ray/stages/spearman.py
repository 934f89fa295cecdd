"""Grouped Spearman rank correlation — tie-aware average ranks
computed DISTRIBUTED, the rank-based sibling of the Pearson pass in
``q_events_value_corr`` (which is exact only if the value→metric map
is linear; Spearman is the monotone-association probe).

The hard part at scale is the tie-aware rank itself: with
near-continuous values every distinct value is its own rank, so a
driver-side histogram fold (the AUC/quantile trick) would pull O(rows)
cells.  Instead ranks are computed with ONE sort exchange plus an
O(blocks) seam correction:

1. ``sort`` by ``(group, value, uid)`` (uid makes the total order — and
   every block's first-row key — unique, the ``stages/prefix.py``
   carry-map precondition) and MATERIALIZE, so both passes see the same
   block boundaries (the stages/watermark.py rule).
2. Pass A folds per-block rows on the driver: row count, per-group row
   counts, and the block's FIRST/LAST tie runs (a tie run can only
   cross a block boundary at an edge — under a sort each (group, value)
   key occupies a contiguous range, so interior runs never need
   correction and a crossing run appears only as first/last/whole-block
   edge runs in the blocks it touches).  Edge runs grouped by
   (group, value) give each crossing run's true global extent; all of
   it is O(blocks) driver state, loud-guarded.
3. Pass B re-walks the sorted blocks with the broadcast corrections:
   each row's tie-aware DOUBLED average rank within its group is
   ``2·min_rank + run_cnt − 1`` (doubling keeps .5-tie ranks integer —
   the AUC trick), interior runs from local arithmetic + the block's
   start offset, edge runs from the correction dict.  The pass emits
   per-(group, x) integer partials — never per-row output — so the
   driver folds O(groups × |x| × blocks) numbers.

The x side (small declared cardinality, e.g. hour-of-day) gets its
doubled average ranks from the per-(group, x) counts directly.  All
sufficient statistics fold in PYTHON ints (Σ(2R)² ~ n³ overflows int64
at 100 TB); Spearman ρ is scale-invariant so the doubled ranks feed the
Pearson closed form unchanged, one float division at the end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BLOCK_INFO_LIMIT = 1_000_000


def _block_runs(g: np.ndarray, v: np.ndarray):
    """Start indices of (group, value) tie runs in a sorted block."""
    n = len(g)
    if n == 0:
        return np.empty(0, np.int64)
    brk = np.empty(n, bool)
    brk[0] = True
    brk[1:] = (g[1:] != g[:-1]) | (v[1:] != v[:-1])
    return np.flatnonzero(brk)


def grouped_spearman_stats(ds, *, group_col: str, val_col: str,
                           x_col: str, uid_col: str):
    """Integer Spearman sufficient statistics per group.

    Returns a dict: group -> (n, sa, saa, per_x) where ``per_x`` maps
    x -> (n_x, sum_a) with ``a`` the DOUBLED tie-aware average rank of
    ``val_col`` within the group.  ``val_col``/``x_col``/``uid_col``
    must be int64-like; ``x_col`` must have small cardinality (its
    ranks derive from the per-(group, x) counts).
    """
    import ray

    from ..broadcast import cached_get

    s = ds.sort([group_col, val_col, uid_col]).materialize()

    def block_info(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "fg": pa.array([], pa.string()),
                "fv": pa.array([], pa.int64()),
                "fu": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "groups": pa.array([], pa.string()),
                "gcounts": pa.array([], pa.string()),
                "f_cnt": pa.array([], pa.int64()),
                "lg": pa.array([], pa.string()),
                "lv": pa.array([], pa.int64()),
                "l_cnt": pa.array([], pa.int64()),
            })
        g = np.asarray(t[group_col].to_pylist())
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = _block_runs(g, v)
        n = len(g)
        first_cnt = int((starts[1] if len(starts) > 1 else n) - 0)
        last_start = int(starts[-1])
        ug, uc = np.unique(g, return_counts=True)
        return pa.table({
            "fg": pa.array([str(g[0])]),
            "fv": pa.array([int(v[0])], pa.int64()),
            "fu": pa.array([int(t[uid_col][0].as_py())], pa.int64()),
            "n": pa.array([n], pa.int64()),
            "groups": pa.array(["\x01".join(ug.tolist())]),
            "gcounts": pa.array(["\x01".join(str(int(c)) for c in uc)]),
            "f_cnt": pa.array([first_cnt], pa.int64()),
            "lg": pa.array([str(g[-1])]),
            "lv": pa.array([int(v[-1])], pa.int64()),
            "l_cnt": pa.array([n - last_start], pa.int64()),
        })

    info = s.map_batches(block_info, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    if len(info) > BLOCK_INFO_LIMIT:
        raise RuntimeError(
            f"grouped_spearman_stats: {len(info)} block-info rows "
            f"exceed {BLOCK_INFO_LIMIT} — repartition coarser first")
    info = info.sort_values(["fg", "fv", "fu"]).reset_index(drop=True)

    # global block start offsets + per-group rows-before map
    n_rows = info["n"].to_numpy(np.int64)
    block_start = np.concatenate(([0], np.cumsum(n_rows)[:-1]))
    group_total: dict[str, int] = {}
    for gs, cs in zip(info["groups"], info["gcounts"]):
        for gname, cnt in zip(gs.split("\x01"), cs.split("\x01")):
            group_total[gname] = group_total.get(gname, 0) + int(cnt)
    rows_before: dict[str, int] = {}
    acc = 0
    for gname in sorted(group_total):
        rows_before[gname] = acc
        acc += group_total[gname]

    # edge-run records grouped by (group, value) -> true global extent.
    # A key's rows are contiguous under the sort, so any run that
    # crosses a boundary is visible ONLY as first/last(/whole) edge
    # runs of the blocks it touches; summing those gives its extent.
    edge: dict[tuple[str, int], list[tuple[int, int]]] = {}
    for i in range(len(info)):
        st = int(block_start[i])
        nb = int(n_rows[i])
        fk = (str(info.loc[i, "fg"]), int(info.loc[i, "fv"]))
        f_cnt = int(info.loc[i, "f_cnt"])
        lk = (str(info.loc[i, "lg"]), int(info.loc[i, "lv"]))
        l_cnt = int(info.loc[i, "l_cnt"])
        if fk == lk and f_cnt == nb:  # whole-block run
            edge.setdefault(fk, []).append((st, nb))
        else:
            edge.setdefault(fk, []).append((st, f_cnt))
            edge.setdefault(lk, []).append((st + nb - l_cnt, l_cnt))
    corrections = {
        k: (min(p for p, _ in recs), sum(c for _, c in recs))
        for k, recs in edge.items()
    }

    start_map = {
        (str(info.loc[i, "fg"]), int(info.loc[i, "fv"]),
         int(info.loc[i, "fu"])): int(block_start[i])
        for i in range(len(info))
    }
    ref = ray.put({"start": start_map, "corr": corrections,
                   "before": rows_before})

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "x": pa.array([], pa.int64()),
                             "nx": pa.array([], pa.int64()),
                             "sa": pa.array([], pa.int64()),
                             "saa": pa.array([], pa.int64())})
        bc = cached_get(ref)
        g = np.asarray(t[group_col].to_pylist())
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key0 = (str(g[0]), int(v[0]), int(t[uid_col][0].as_py()))
        st = bc["start"][key0]
        n = len(g)
        starts = _block_runs(g, v)
        ends = np.concatenate((starts[1:], [n]))
        a2 = np.empty(n, np.int64)
        for ri, (rs, re) in enumerate(zip(starts, ends)):
            gname = str(g[rs])
            if ri == 0 or ri == len(starts) - 1:
                min_p, cnt = bc["corr"][(gname, int(v[rs]))]
            else:
                min_p, cnt = st + int(rs), int(re - rs)
            min_rank = min_p - bc["before"][gname] + 1
            a2[rs:re] = 2 * min_rank + cnt - 1
        # per-(group, x) integer partials — Σ(2R)² per run would be
        # fine too, but a2 ≤ 2n so a2² fits int64 per element; fold the
        # big sums in Python ints on the driver
        gi = {gn: j for j, gn in enumerate(np.unique(g))}
        gidx = np.array([gi[gn] for gn in g], np.int64)
        nx_ = len(gi)
        xmax = int(x.max()) + 1
        cell = gidx * xmax + x
        cnts = np.bincount(cell, minlength=nx_ * xmax)
        # int64 np.add.at folds, not float bincount weights: per-cell
        # Σ2R and Σ(2R)² stay EXACT (float53 clips past ~2^26-row
        # groups; int64 holds to ~9e18, loudly overflowing after)
        sa = np.zeros(nx_ * xmax, np.int64)
        np.add.at(sa, cell, a2)
        saa = np.zeros(nx_ * xmax, np.int64)
        np.add.at(saa, cell, a2 * a2)
        nz = np.flatnonzero(cnts)
        names = {j: gn for gn, j in gi.items()}
        return pa.table({
            "g": pa.array([names[int(c) // xmax] for c in nz]),
            "x": pa.array([int(c) % xmax for c in nz], pa.int64()),
            "nx": pa.array(cnts[nz].astype(np.int64)),
            "sa": pa.array(sa[nz]),
            "saa": pa.array(saa[nz]),
        })

    out: dict[str, dict] = {}
    for bt in s.map_batches(partials, batch_format="pyarrow",
                            batch_size=None).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for gn, xv, nx_, sa_, saa_ in zip(
            bt["g"].to_pylist(), bt["x"].to_pylist(),
            bt["nx"].to_pylist(), bt["sa"].to_pylist(),
            bt["saa"].to_pylist(),
        ):
            d = out.setdefault(gn, {"n": 0, "sa": 0, "saa": 0,
                                    "per_x": {}})
            d["n"] += int(nx_)
            d["sa"] += int(sa_)
            d["saa"] += int(saa_)
            px = d["per_x"].setdefault(int(xv), [0, 0])
            px[0] += int(nx_)
            px[1] += int(sa_)
    for gn, d in out.items():
        if d["sa"] != d["n"] * (d["n"] + 1):
            raise AssertionError(
                f"grouped_spearman_stats: rank-sum invariant broken "
                f"for group {gn!r}: Σ2R={d['sa']} != n(n+1)="
                f"{d['n'] * (d['n'] + 1)}")
    return out


def spearman_rho(stats: dict) -> list[tuple[str, int, float]]:
    """(group, n, rho) rows from ``grouped_spearman_stats`` output —
    doubled x-ranks from the per-x counts, Pearson closed form over
    Python ints, ONE float division, round 6."""
    import math

    rows = []
    for gn in sorted(stats):
        d = stats[gn]
        n, sa, saa = d["n"], d["sa"], d["saa"]
        sb = sbb = sab = 0
        cum = 0
        for xv in sorted(d["per_x"]):
            n_x, sa_x = d["per_x"][xv]
            b2 = 2 * cum + n_x + 1  # doubled avg rank of this x level
            cum += n_x
            sb += n_x * b2
            sbb += n_x * b2 * b2
            sab += b2 * sa_x
        if sb != n * (n + 1):
            raise AssertionError(
                f"spearman_rho: x rank-sum invariant broken for {gn!r}")
        num = n * sab - sa * sb
        den = (n * saa - sa * sa) * (n * sbb - sb * sb)
        rho = float("nan") if den == 0 else num / math.sqrt(den)
        rows.append((gn, n, round(rho, 6)))
    return rows
