"""KMV sketch + M2 container-string builder tests."""

import numpy as np
import pytest

from ocracle_ray.core.sketch import KMV, kmv_distinct_estimate
from ocracle_ray.core.html_tokenizer import tokenize
from ocracle_ray.stages.blocks import build_container_string


def test_kmv_exact_below_k():
    s = KMV(k=64)
    for i in range(50):
        s.add(i)
        s.add(i)  # duplicates ignored
    assert s.estimate() == 50


def test_kmv_estimate_accuracy():
    s = KMV(k=512)
    n = 20_000
    for i in range(n):
        s.add(f"value-{i}")
    est = s.estimate()
    assert abs(est - n) / n < 0.15  # KMV with k=512: ~4.4% stddev


def test_kmv_merge_equals_union():
    a, b = KMV(k=256), KMV(k=256)
    for i in range(0, 3000):
        a.add(i)
    for i in range(1500, 4500):
        b.add(i)
    merged = a.merge(b)
    whole = KMV(k=256)
    for i in range(0, 4500):
        whole.add(i)
    assert merged.estimate() == whole.estimate()  # deterministic, same hashes


def test_kmv_serialize_roundtrip():
    s = KMV(k=128)
    for i in range(500):
        s.add(i)
    r = KMV.deserialize(s.serialize(), k=128)
    assert r.estimate() == s.estimate()


def test_kmv_distributed(ray_session):
    import ray.data as rd

    ds = rd.range(5000)
    est = kmv_distinct_estimate(ds, "id", k=256)
    assert abs(est - 5000) / 5000 < 0.2


def test_kmv_distinct_by_exact_below_k(ray_session):
    """Grouped distinct: exact per group while true distinct < k, with
    groups spread across many blocks (the fold merges cross-block
    partials)."""
    import pandas as pd
    import ray.data as rd

    from ocracle_ray.core.sketch import kmv_distinct_by

    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], size=3000),
            "v": rng.randint(0, 400, size=3000),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    got = (
        kmv_distinct_by(ds, "g", "v", k=1024)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    expect = (
        df.groupby("g")["v"].nunique().rename("n_distinct").reset_index()
    )
    assert list(got["g"]) == list(expect["g"])
    assert [int(x) for x in got["n_distinct"]] == list(expect["n_distinct"])


def test_kmv_distinct_by_null_semantics(ray_session):
    """SQL parity: null VALUES are excluded from the distinct count,
    a null GROUP key is its own group (GROUP BY groups NULLs)."""
    import pandas as pd
    import ray.data as rd

    from ocracle_ray.core.sketch import kmv_distinct_by

    df = pd.DataFrame(
        {
            "g": ["a", "a", "a", None, None, None],
            "v": [1.0, 2.0, None, 7.0, 7.0, None],
        }
    )
    got = kmv_distinct_by(rd.from_pandas(df).repartition(3), "g", "v", k=64).to_pandas()
    by_key = {
        (None if pd.isna(k) else k): int(v)
        for k, v in zip(got["g"], got["n_distinct"])
    }
    assert by_key == {"a": 2, None: 1}


def test_kmv_distinct_by_estimate_above_k(ray_session):
    import pandas as pd
    import ray.data as rd

    from ocracle_ray.core.sketch import kmv_distinct_by

    df = pd.DataFrame({"g": ["x"] * 8000, "v": np.arange(8000)})
    ds = rd.from_pandas(df).repartition(4)
    got = kmv_distinct_by(ds, "g", "v", k=256).to_pandas()
    est = float(got["n_distinct"].iloc[0])
    assert abs(est - 8000) / 8000 < 0.2


def test_container_string_builder():
    blocks = tokenize(b"<p>first block</p><img src='x' alt='fig'><p>second block</p>")
    plain = build_container_string(blocks)
    assert plain == "first block\n\nfig\n\nsecond block"
    marked = build_container_string(blocks, with_identifier=True)
    assert "=== CONTAINER 0 (text) ===" in marked
    assert "=== CONTAINER 1 (figure) ===" in marked


def test_winnowing_fingerprints():
    from ocracle_ray.core.textstats import winnowing_fingerprints

    a = "helt unik innledning her. " + "felles midtparti som er langt nok til å garantere deling av vindu. " + "slutt a"
    b = "annen start på teksten nå. " + "felles midtparti som er langt nok til å garantere deling av vindu. " + "slutt b"
    c = "totalt urelatert innhold om noe helt annet uten felles delstrenger i det hele tatt"
    fa, fb, fc = (winnowing_fingerprints(x) for x in (a, b, c))
    assert fa == winnowing_fingerprints(a)          # deterministic
    assert set(fa) & set(fb)                        # shared substring -> shared fp
    assert not (set(fa) & set(fc))                  # unrelated -> disjoint
    assert winnowing_fingerprints("") == []
    assert len(winnowing_fingerprints("kort")) == 1  # < k chars -> whole-doc fp


# ------------------------------------------------------- Misra-Gries

def test_misra_gries_superset_guarantee_adversarial():
    """Any value with count > n/(k+1) must survive, for an adversarial
    split of a zipf-ish stream across many sketches merged pairwise."""
    import random

    from ocracle_ray.core.sketch import MisraGries

    rng = random.Random(7)
    # zipf-ish: value v appears ~ 4000/v times
    stream = [v for v in range(1, 200) for _ in range(4000 // v)]
    rng.shuffle(stream)
    n = len(stream)
    k = 15

    from collections import Counter

    truth = Counter(stream)
    heavy = {v for v, c in truth.items() if c > n / (k + 1)}
    assert heavy  # non-vacuous

    merged = MisraGries(k)
    for i in range(0, n, 997):  # uneven chunks
        s = MisraGries(k)
        s.add_many(stream[i : i + 997])
        merged = merged.merge(MisraGries.deserialize(s.serialize()))
    assert merged.n == n
    assert heavy <= set(merged.candidates())
    # candidate count bounded by k
    assert len(merged.candidates()) <= k


def test_misra_gries_exact_when_few_values():
    from ocracle_ray.core.sketch import MisraGries

    s = MisraGries(8)
    s.add_many([1, 1, 2, 3, 3, 3])
    assert s.counts == {1: 2, 2: 1, 3: 3}
    assert s.n == 6


def test_events_heavy_hitters_query_matches_bruteforce():
    import duckdb

    from ocracle_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = QUERIES["events_heavy_hitters"]("/root/testdata/sf0.001")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    want = con.sql(ORACLE_SQL["events_heavy_hitters"]).df()
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype({"n_events": "int64"}).reset_index(drop=True),
    )


def test_misra_gries_heterogeneous_keys():
    """Review r2: None/mixed keys survive serialize/candidates."""
    from ocracle_ray.core.sketch import MisraGries

    s = MisraGries(4)
    s.add_many(["click", None, "click", None, None, 7])
    out = MisraGries.deserialize(s.serialize())
    assert out.counts == s.counts
    assert None in out.candidates() and "click" in out.candidates()


# ---------------------------------------------------------------- HLL


def _sm64_ref(v: int) -> int:
    m = (1 << 64) - 1
    v &= m
    v ^= v >> 30
    v = (v * 0xBF58476D1CE4E5B9) & m
    v ^= v >> 27
    v = (v * 0x94D049BB133111EB) & m
    v ^= v >> 31
    return v


def test_splitmix64_matches_reference():
    import numpy as np

    from ocracle_ray.core.sketch import splitmix64

    ids = np.array([0, 1, 2, -1, -12345, 2**63 - 1, -(2**63)], dtype=np.int64)
    got = splitmix64(ids)
    want = [_sm64_ref(int(v)) for v in ids]
    assert [int(x) for x in got] == want


def test_hll_register_semantics_vs_reference():
    """Registers equal a pure-Python HLL over the same keys (pins the
    top-12/suffix-52 split, rho via frexp, max-merge semantics)."""
    import numpy as np

    from ocracle_ray.core.sketch import HLL_M, HyperLogLog

    keys = np.arange(-500, 500, dtype=np.int64)
    h = HyperLogLog()
    h.add_int64(keys)

    regs = [0] * HLL_M
    for v in keys:
        x = _sm64_ref(int(v))
        j, w = x >> 52, x & ((1 << 52) - 1)
        rho = 53 if w == 0 else 53 - w.bit_length()
        regs[j] = max(regs[j], rho)
    assert h.regs.tolist() == regs


def test_hll_accuracy_both_branches():
    import numpy as np

    from ocracle_ray.core.sketch import HyperLogLog

    # raw-estimator branch: 100k distinct >> 2.5*m
    big = HyperLogLog()
    big.add_int64(np.arange(100_000, dtype=np.int64))
    est = big.estimate()
    assert abs(est - 100_000) / 100_000 < 0.05
    # linear-counting branch: 100 distinct
    small = HyperLogLog()
    small.add_int64(np.arange(100, dtype=np.int64))
    assert abs(small.estimate() - 100) / 100 < 0.05
    # duplicates don't move the estimate
    dup = HyperLogLog()
    dup.add_int64(np.arange(100, dtype=np.int64))
    dup.add_int64(np.arange(100, dtype=np.int64))
    assert dup.estimate() == small.estimate()


def test_hll_merge_is_union_and_roundtrips():
    import numpy as np

    from ocracle_ray.core.sketch import HyperLogLog

    a, b, u = HyperLogLog(), HyperLogLog(), HyperLogLog()
    ka = np.arange(0, 6000, dtype=np.int64)
    kb = np.arange(4000, 11000, dtype=np.int64)
    a.add_int64(ka)
    b.add_int64(kb)
    u.add_int64(np.arange(0, 11000, dtype=np.int64))
    m = a.merge(b)
    assert m.regs.tolist() == u.regs.tolist()  # max-merge IS the union
    rt = HyperLogLog.deserialize(m.serialize())
    assert rt.regs.tolist() == m.regs.tolist()
    import pytest

    with pytest.raises(ValueError):
        HyperLogLog.deserialize(b"\x00" * 7)


def test_hll_distinct_by_grouped(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ocracle_ray.core.sketch import HyperLogLog, hll_distinct_by

    rng_keys = np.arange(3000, dtype=np.int64)
    groups = np.where(rng_keys % 3 == 0, "a", np.where(rng_keys % 3 == 1, "b", "c"))
    ds = rd.from_arrow(pa.table({
        "g": pa.array(groups.tolist(), pa.string()),
        "k": pa.array(rng_keys, pa.int64()),
    })).repartition(5)
    got = hll_distinct_by(ds, "g", "k")
    for g in "abc":
        direct = HyperLogLog()
        direct.add_int64(rng_keys[groups == g])
        assert got[g].regs.tolist() == direct.regs.tolist()


def test_hll_distinct_by_drops_nulls(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ocracle_ray.core.sketch import HyperLogLog, hll_distinct_by

    ds = rd.from_arrow(pa.table({
        "g": pa.array(["a", "a", "a"], pa.string()),
        "k": pa.array([1, None, 2], pa.int64()),
    }))
    got = hll_distinct_by(ds, "g", "k")
    direct = HyperLogLog()
    import numpy as np

    direct.add_int64(np.array([1, 2], dtype=np.int64))
    assert got["a"].regs.tolist() == direct.regs.tolist()


# ---------------------------------------------------------------- CountMin


def test_cms_never_underestimates_and_merges():
    import numpy as np

    from ocracle_ray.core.sketch import CountMin

    rng = np.random.default_rng(9)
    keys = rng.integers(-50, 50, 5000)  # heavy collisions at w=64
    whole = CountMin(d=4, w=64).add(keys)
    merged = CountMin(d=4, w=64)
    for i in range(0, len(keys), 700):
        merged.merge(CountMin(d=4, w=64).add(keys[i:i + 700]))
    # merge == single-pass (elementwise-add associativity)
    np.testing.assert_array_equal(whole.counters, merged.counters)
    assert whole.n == merged.n == len(keys)
    uniq, counts = np.unique(keys, return_counts=True)
    est = whole.estimate(uniq)
    assert (est >= counts).all()  # the CMS one-sided guarantee
    # error bound (loose, e*n/w per Cormode-Muthukrishnan at d=4)
    assert (est - counts).max() <= 3 * len(keys) / 64


def test_cms_negative_keys_and_mismatch():
    import numpy as np
    import pytest as _pytest

    from ocracle_ray.core.sketch import CountMin

    sk = CountMin(d=2, w=32).add(np.array([-7, -7, 3]))
    assert int(sk.estimate(np.array([-7]))[0]) >= 2
    with _pytest.raises(ValueError, match="mismatched"):
        CountMin(d=2, w=32).merge(CountMin(d=2, w=16))
