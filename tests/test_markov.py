"""Markov transitions (stages/markov.py): interleaved-user sequences,
string-dtype pairs through the seam builder, and the integer-ppm rule."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages.markov import transition_matrix


def _ds(rows, nparts=4):
    """rows: (user, ts, eid, state) — intentionally shuffled input."""
    return rd.from_arrow(pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "eid": pa.array([r[2] for r in rows], pa.int64()),
        "st": pa.array([r[3] for r in rows], pa.string()),
    })).repartition(nparts)


def test_transitions_interleaved_users(ray_session):
    # user 1: a b b a ; user 2: b a ; user 3: a (no transition)
    rows = [
        (2, 10, 20, "b"), (1, 1, 1, "a"), (1, 2, 2, "b"),
        (3, 5, 30, "a"), (1, 3, 3, "b"), (2, 11, 21, "a"),
        (1, 4, 4, "a"),
    ]
    out = transition_matrix(_ds(rows), group_col="u",
                            order_cols=["ts", "eid"], item_col="st")
    got = {(r["prev_state"], r["next_state"]): int(r["n_trans"])
           for _, r in out.iterrows()}
    assert got == {("a", "b"): 1, ("b", "b"): 1, ("b", "a"): 2}
    by = out.set_index(["prev_state", "next_state"])
    # ppm: from "b" there are 3 transitions: b->a 2, b->b 1
    assert int(by.loc[("b", "a"), "p_ppm"]) == (2 * 1_000_000) // 3
    assert int(by.loc[("b", "b"), "p_ppm"]) == (1 * 1_000_000) // 3
    assert int(by.loc[("a", "b"), "p_ppm"]) == 1_000_000


def test_row_ppm_never_exceeds_million(ray_session):
    rows = [(1, i, i, s) for i, s in enumerate("abcabcaab")]
    out = transition_matrix(_ds(rows, 3), group_col="u",
                            order_cols=["ts", "eid"], item_col="st")
    sums = out.groupby("prev_state")["p_ppm"].sum()
    assert (sums <= 1_000_000).all()
    assert int(out["n_trans"].sum()) == 8


def test_empty_input(ray_session):
    out = transition_matrix(_ds([(1, 1, 1, "a")]), group_col="u",
                            order_cols=["ts", "eid"], item_col="st")
    assert len(out) == 0
