"""stages.cdc — vectorized gear CDC vs a naive per-codepoint
reference, tiling/size invariants, and the realignment property the
operator exists for."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ocracle_ray.stages.cdc import (
    _GEAR,
    CDC_MASK,
    CDC_MAX,
    CDC_MIN,
    cdc_chunks,
    chunk_batch,
)


def _naive_chunks(text: str):
    """Per-codepoint scalar mirror of the documented semantics."""
    cps = [ord(c) & 0xFF for c in text]
    n = len(cps)
    hist = []
    h = np.uint64(0)
    with np.errstate(over="ignore"):
        for i, b in enumerate(cps):
            window = cps[max(0, i - 63): i + 1]
            hh = np.uint64(0)
            for k, bb in enumerate(reversed(window)):
                hh += _GEAR[bb] << np.uint64(k)
            hist.append(hh)
    chunks, prev = [], -1
    while prev < n - 1:
        cut = min(prev + CDC_MAX, n - 1)
        for p in range(prev + CDC_MIN, prev + CDC_MAX):
            if p >= n - 1:
                break
            if (hist[p] & CDC_MASK) == 0:
                cut = p
                break
        chunks.append((prev + 1, cut - prev))
        prev = cut
    return chunks


def _rng_text(seed, n=700):
    rng = np.random.RandomState(seed)
    return "".join(chr(int(c)) for c in rng.randint(97, 123, n))


def test_matches_naive_reference():
    for seed in (1, 2, 3):
        text = _rng_text(seed)
        got = chunk_batch(pa.array([text]), np.array([7]))
        pairs = list(zip(got["start"].to_pylist(), got["len"].to_pylist()))
        assert pairs == _naive_chunks(text)
        for s, ln, fp in zip(got["start"].to_pylist(),
                             got["len"].to_pylist(),
                             got["fp"].to_pylist()):
            assert fp == hashlib.md5(text[s: s + ln].encode()).hexdigest()


def test_tiling_and_size_invariants():
    texts = [_rng_text(s, n) for s, n in
             [(4, 5), (5, 16), (6, 128), (7, 129), (8, 1000)]]
    t = chunk_batch(pa.array(texts), np.arange(len(texts)))
    df = t.to_pandas()
    for i, text in enumerate(texts):
        g = df[df.doc_id == i].sort_values("start")
        assert g["start"].iloc[0] == 0
        assert (g["start"].to_numpy()[1:]
                == (g["start"] + g["len"]).to_numpy()[:-1]).all()
        assert g["len"].sum() == len(text)
        assert (g["len"] <= CDC_MAX).all()
        assert (g["len"].to_numpy()[:-1] >= CDC_MIN).all()


def test_insertion_realigns_chunks():
    """The CDC property: an insertion near the front changes O(1)
    chunks; fixed-size blocking would shift every later chunk."""
    base = _rng_text(11, 2000)
    edited = base[:10] + "XYZ" + base[10:]
    fps_a = set(chunk_batch(pa.array([base]),
                            np.array([0]))["fp"].to_pylist())
    fps_b = set(chunk_batch(pa.array([edited]),
                            np.array([0]))["fp"].to_pylist())
    shared = len(fps_a & fps_b)
    assert shared >= 0.8 * len(fps_a)


def test_multibyte_positions_are_codepoints():
    text = "héllo wörld " * 8 + "中文内容测试 " * 6
    t = chunk_batch(pa.array([text]), np.array([3]))
    assert sum(t["len"].to_pylist()) == len(text)
    for s, ln, fp in zip(t["start"].to_pylist(), t["len"].to_pylist(),
                         t["fp"].to_pylist()):
        assert fp == hashlib.md5(text[s: s + ln].encode()).hexdigest()


def test_dataset_pass_with_keep_col(ray_session):
    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": [_rng_text(20), _rng_text(21)],
        "lang": ["en", "de"],
    })
    out = cdc_chunks(rd.from_pandas(df), keep_col="lang").to_pandas()
    assert set(out[out.doc_id == 1]["lang"]) == {"en"}
    assert set(out[out.doc_id == 2]["lang"]) == {"de"}
