"""stages.watermark — hand-built out-of-order streams (the sf corpus
arrives ts-ordered, so the driver oracle only sees the simulated
Knuth-shuffle; these pin the raw semantics in ingestion order)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ocracle_ray.stages.watermark import knuth_arrival, late_event_census

T0 = pd.Timestamp("2024-01-01")


def _stream(rows):
    """rows: (event_id, minutes_offset, event_type) in ARRIVAL order =
    event_id order."""
    return rd.from_pandas(pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "ts": [T0 + pd.Timedelta(minutes=r[1]) for r in rows],
        "event_type": [r[2] for r in rows],
    })).repartition(3)


def test_engineered_lateness_exact(ray_session):
    # arrival order: ts 0, 200, then a straggler at 10 (watermark is
    # 200min - 120min = 80min -> 70min late), an in-window late-ish
    # event at 100 (not late: 100 >= 80), another straggler at 19
    # (61min late), and a new max
    rows = [
        (1, 0, "a"),
        (2, 200, "a"),
        (3, 10, "a"),    # late by 70 min
        (4, 100, "b"),   # not late
        (5, 19, "b"),    # late by 61 min
        (6, 300, "b"),
    ]
    out = late_event_census(_stream(rows),
                            delay=pd.Timedelta(hours=2), arrival="id")
    a = out[out.event_type == "a"].iloc[0]
    b = out[out.event_type == "b"].iloc[0]
    assert (a.n_events, a.n_late) == (3, 1)
    assert a.avg_late_sec == 70 * 60.0
    assert (b.n_events, b.n_late) == (3, 1)
    assert b.avg_late_sec == 61 * 60.0


def test_first_event_never_late(ray_session):
    rows = [(1, 500, "a"), (2, 501, "a")]
    out = late_event_census(_stream(rows), arrival="id")
    assert out.n_late.sum() == 0
    assert (out.avg_late_sec == 0).all()


def test_ordered_stream_zero_late(ray_session):
    rows = [(i, i * 10, "a") for i in range(1, 30)]
    out = late_event_census(_stream(rows), arrival="id")
    assert out.n_late.tolist() == [0]
    assert out.n_events.tolist() == [29]


def test_knuth_arrival_matches_sql_formula():
    ids = np.array([0, 1, 2, 2 ** 31 - 1, 2 ** 40 + 7], np.int64)
    got = knuth_arrival(ids)
    want = [((int(i) % 2 ** 31) * 2654435761) % 2 ** 32 for i in ids]
    assert got.tolist() == want


def test_block_layout_independent(ray_session):
    rng = np.random.RandomState(5)
    offs = rng.permutation(400)
    rows = [(i + 1, int(offs[i]), "t") for i in range(400)]
    out1 = late_event_census(_stream(rows), arrival="id")
    ds2 = _stream(rows).repartition(11)
    out2 = late_event_census(ds2, arrival="id")
    pd.testing.assert_frame_equal(out1, out2)
