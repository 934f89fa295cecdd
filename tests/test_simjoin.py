"""Edit-distance-1 similarity join (stages/simjoin.py): the verify
kernel, the FastSS candidate property, false-candidate kills, and the
quadratic-run guard."""

import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages import simjoin
from ocracle_ray.stages.simjoin import _ed_le1, edit1_join_census, edit1_pairs


def _ds(keys, nparts=3):
    return rd.from_arrow(pa.table({
        "url": pa.array(keys, pa.string()),
    })).repartition(nparts)


def test_ed_le1_kernel():
    assert _ed_le1("abc", "abc")
    assert _ed_le1("abc", "abd")      # substitution
    assert _ed_le1("abc", "ab")       # deletion
    assert _ed_le1("abc", "xabc")     # insertion at front
    assert _ed_le1("abc", "abcx")     # insertion at end
    assert not _ed_le1("abc", "adx")  # two substitutions
    assert not _ed_le1("ab", "ba")    # transposition = distance 2
    assert not _ed_le1("abc", "a")    # length gap 2


def test_pairs_match_bruteforce(ray_session):
    keys = ["doc001", "doc002", "doc01", "dpc001", "zz", "zx", "ab", "ba",
            "doc001", "q"]  # includes a duplicate key and distance-2 traps
    got = edit1_pairs(_ds(keys), col="url").to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))
    uniq = sorted(set(keys))
    want = {(a, b) for i, a in enumerate(uniq) for b in uniq[i + 1:]
            if _ed_le1(a, b)}
    assert got_pairs == want
    assert ("ab", "ba") not in got_pairs  # false candidate killed


def test_census_counts_and_duplicate_keys(ray_session):
    out = edit1_join_census(_ds(["aaa", "aab", "aaa", "bbb"]), col="url")
    assert int(out["n_keys"].iloc[0]) == 3   # distinct keys
    assert int(out["n_pairs"].iloc[0]) == 1  # (aaa, aab)
    assert int(out["pair_ck"].iloc[0]) == simjoin.pair_checksum("aaa", "aab")


def test_degenerate_run_guard(ray_session, monkeypatch):
    monkeypatch.setattr(simjoin, "MAX_RUN_PAIRS", 3)
    # 4 keys sharing the variant "x" (all single-char ± deletions)
    with pytest.raises(ValueError, match="MAX_RUN_PAIRS"):
        edit1_pairs(_ds(["x", "xa", "xb", "xc", "xd"]),
                    col="url").materialize()
