"""BloomFilter sketch + the build_hash_bloom shuffle-prefilter stage:
no false negatives ever, measured fp near nominal, OR-merge algebra,
and the cross-partition prefilter semantics exact dedup would rely on."""

import numpy as np
import pyarrow as pa
import pytest

from ocracle_ray.core.sketch import BloomFilter


def _hashes(n, seed):
    return (
        np.arange(n, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        + np.uint64(seed)
    )


def test_bloom_no_false_negatives_and_fp_rate():
    b = BloomFilter(10_000, 0.01)
    keys = _hashes(10_000, 1)
    b.add_hashes(keys)
    assert b.contains_hashes(keys).all()
    other = _hashes(100_000, 2**50)
    fp = b.contains_hashes(other).mean()
    assert fp < 0.03, fp  # nominal 0.01; allow slack
    assert 0.3 < b.fill_ratio() < 0.7  # standard sizing fills ~50%


def test_bloom_merge_algebra_and_serialize():
    a, b, c = (BloomFilter(1000, 0.01) for _ in range(3))
    ka, kb, kc = _hashes(300, 3), _hashes(300, 4), _hashes(300, 5)
    a.add_hashes(ka)
    b.add_hashes(kb)
    c.add_hashes(kc)
    ab_c = a.merge(b).merge(c)
    a_bc = a.merge(b.merge(c))
    assert (ab_c.words == a_bc.words).all()
    assert (a.merge(b).words == b.merge(a).words).all()
    for ks in (ka, kb, kc):
        assert ab_c.contains_hashes(ks).all()
    rt = BloomFilter.deserialize(ab_c.serialize(), 1000, 0.01)
    assert (rt.words == ab_c.words).all()
    with pytest.raises(ValueError, match="sizing"):
        a.merge(BloomFilter(5000, 0.01))
    with pytest.raises(ValueError, match="sizing"):
        BloomFilter.deserialize(a.serialize(), 9999, 0.01)
    with pytest.raises(ValueError, match="sizing"):
        BloomFilter(0, 0.01)


def test_build_hash_bloom_prefilter(ray_session):
    import ray.data as rd

    # partition A's fingerprints, built through the Ray pass
    part_a = _hashes(5_000, 7)
    ds = rd.from_arrow(
        pa.table({"fp": pa.array(part_a.astype(np.int64), pa.int64())})
    ).repartition(4)
    from ocracle_ray.stages.dedup import build_hash_bloom

    bloom = build_hash_bloom(ds, "fp", capacity=5_000, fp_rate=0.01)
    # partition B: half overlaps A, half is new
    overlap, fresh = _hashes(2_500, 7), _hashes(50_000, 2**52)
    mask_overlap = bloom.contains_hashes(overlap)
    assert mask_overlap.all()  # every real dup MUST survive the prefilter
    # provably-unseen keys can skip the dedup exchange entirely
    skipped = 1.0 - bloom.contains_hashes(fresh).mean()
    assert skipped > 0.95, skipped
