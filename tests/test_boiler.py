"""Frequent-block boilerplate suppression (stages/boiler.py):
threshold edge, census accounting, guard, and empty-set path."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.core.textstats import fingerprint
from ocracle_ray.stages import boiler


def _blocks(rows):
    """rows: (url, branch, text)."""
    return rd.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "branch": pa.array([r[1] for r in rows], pa.string()),
        "block_id": pa.array(range(len(rows)), pa.int32()),
        "text": pa.array([r[2] for r in rows], pa.large_string()),
        "n_chars": pa.array([len(r[2]) for r in rows], pa.int32()),
    })).repartition(3)


BOILER = "Accept all cookies to continue"
RARE = ["unique prose %d" % i for i in range(6)]
ROWS = (
    [("u%d" % i, "html", BOILER) for i in range(5)]  # exactly 5 = frequent
    + [("u%d" % i, "html", RARE[i]) for i in range(4)]
    + [("u9", "pdf", RARE[4]), ("u9", "pdf", RARE[5])]
    + [("u10", "html", "four times only")] * 4  # 4 < 5 = kept
)


def test_frequent_set_threshold_edge(ray_session):
    rows = boiler.block_hash_rows(_blocks(ROWS)).materialize()
    freq = boiler.frequent_hashes(rows, min_occurrences=5)
    assert list(freq) == [fingerprint(BOILER)]
    # at threshold 4 the 4-occurrence block joins the set
    freq4 = boiler.frequent_hashes(rows, min_occurrences=4)
    assert set(freq4) == {fingerprint(BOILER), fingerprint("four times only")}


def test_census_accounting(ray_session):
    rows = boiler.block_hash_rows(_blocks(ROWS)).materialize()
    out = boiler.boilerplate_census(rows, min_occurrences=5).set_index("branch")
    assert int(out.loc["html", "n_blocks"]) == 13
    assert int(out.loc["html", "n_dropped"]) == 5
    assert int(out.loc["html", "kept_chars"]) == (
        sum(len(t) for t in RARE[:4]) + 4 * len("four times only"))
    assert int(out.loc["pdf", "n_dropped"]) == 0
    kept_html = [fingerprint(t) for t in RARE[:4]] + [
        fingerprint("four times only")] * 4
    assert int(out.loc["html", "fp_xor_kept"]) == int(
        np.bitwise_xor.reduce(np.array(kept_html, np.int64)))


def test_freq_set_guard_raises(ray_session):
    rows = boiler.block_hash_rows(_blocks(ROWS)).materialize()
    with pytest.raises(ValueError, match="FREQ_SET_LIMIT"):
        boiler.frequent_hashes(rows, min_occurrences=1, limit=2)


def test_no_frequent_blocks_drops_nothing(ray_session):
    rows = boiler.block_hash_rows(
        _blocks([("u1", "html", "a"), ("u2", "html", "b")])).materialize()
    out = boiler.boilerplate_census(rows, min_occurrences=5)
    assert int(out["n_dropped"].sum()) == 0
    assert int(out["n_blocks"].sum()) == 2
