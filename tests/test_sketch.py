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
