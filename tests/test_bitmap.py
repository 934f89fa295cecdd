"""Bitmap index: algebra against Python-set reference, domain guards,
and build equivalence across block layouts."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ocracle_ray.stages.bitmap import BITMAP_DOMAIN_LIMIT, Bitmap, \
    build_bitmaps


def test_algebra_matches_set_reference():
    rng = np.random.RandomState(3)
    dom = 1000
    a_keys = rng.choice(dom, 200, replace=False)
    b_keys = rng.choice(dom, 300, replace=False)
    a = Bitmap(dom).set_keys(a_keys)
    b = Bitmap(dom).set_keys(b_keys)
    sa, sb = set(a_keys.tolist()), set(b_keys.tolist())
    assert a.popcount() == len(sa)
    assert a.and_(b).popcount() == len(sa & sb)
    assert a.or_(b).popcount() == len(sa | sb)
    assert a.andnot(b).popcount() == len(sa - sb)


def test_idempotent_set_and_word_edges():
    # keys straddling word boundaries, set twice — bits are idempotent
    dom = 130
    keys = np.array([0, 63, 64, 65, 127, 128, 129])
    bm = Bitmap(dom).set_keys(keys).set_keys(keys)
    assert bm.popcount() == len(keys)


def test_domain_guards():
    with pytest.raises(ValueError, match="roaring"):
        Bitmap(BITMAP_DOMAIN_LIMIT + 1)
    bm = Bitmap(100)
    with pytest.raises(ValueError, match="domain"):
        bm.set_keys(np.array([100]))
    with pytest.raises(ValueError, match="domain"):
        bm.set_keys(np.array([-1]))
    with pytest.raises(ValueError, match="mismatched"):
        bm.and_(Bitmap(200))


def test_build_bitmaps_layout_invariant(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(11)
    n, dom = 5000, 400
    t = pa.table({
        "grp": pa.array(rng.choice(["a", "b", "c"], n).tolist()),
        "k": pa.array(rng.randint(0, dom, n), pa.int64()),
    })
    want = {
        g: set(t.filter(pa.compute.equal(t["grp"], g))["k"].to_pylist())
        for g in ("a", "b", "c")
    }
    for parts in (1, 4, 13):
        ds = rd.from_arrow(t).repartition(parts)
        bms = build_bitmaps(ds, set_col="grp", key_col="k", domain=dom)
        assert set(bms) == set(want)
        for g, bm in bms.items():
            assert bm.popcount() == len(want[g]), (parts, g)
            # exact membership, not just counts
            got = {k for k in range(dom)
                   if bm.words[k // 64] >> np.uint64(k % 64)
                   & np.uint64(1)}
            assert got == want[g]
