"""Document chunking (stages/chunking.py): the vectorized window
counts must equal the emitted chunks exactly, against a pure-Python
window reference, across the size/stride edge cases."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages import chunking


def _py_chunks(words, size, stride):
    n = len(words)
    out = []
    s = 0
    while s == 0 or s < n - (size - stride):
        if n == 0:
            break
        out.append(words[s:s + size])
        s += stride
    return out


def _ds(texts, langs=None):
    langs = langs or ["en"] * len(texts)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "lang": pa.array(langs, pa.string()),
        "text": pa.array(texts, pa.string()),
    }))


@pytest.mark.parametrize("n_tok", [0, 1, 15, 16, 17, 47, 48, 49, 63, 64,
                                   65, 111, 112, 113, 200])
def test_counts_match_reference(n_tok):
    words = [f"w{i}" for i in range(n_tok)]
    ref = _py_chunks(words, 64, 48)
    n, short = chunking._chunk_counts(np.array([n_tok]), 64, 48)
    assert n[0] == len(ref)
    if ref:
        assert bool(short[0]) == (len(ref[-1]) < 64)
        # every non-last window is full
        assert all(len(c) == 64 for c in ref[:-1])


def test_emitted_chunks_match_reference(ray_session):
    texts = [
        " ".join(f"t{i}" for i in range(n))
        for n in (0, 5, 64, 65, 112, 113, 150)
    ]
    got = chunking.chunk_documents(_ds(texts), size=64,
                                   stride=48).to_pandas()
    for d, text in enumerate(texts):
        words = [w for w in text.split() if w]
        ref = _py_chunks(words, 64, 48)
        rows = got[got["doc_id"] == d].sort_values("chunk_index")
        assert list(rows["chunk_text"]) == [" ".join(c) for c in ref]
        assert list(rows["n_chunk_tokens"]) == [len(c) for c in ref]


def test_stats_consistency(ray_session):
    texts = [" ".join(f"x{i}" for i in range(n)) for n in (10, 70, 130)]
    stats = chunking.chunk_stats_by_lang(_ds(texts), size=64, stride=48)
    chunks = chunking.chunk_documents(_ds(texts), size=64,
                                      stride=48).to_pandas()
    assert stats["n_chunks"].sum() == len(chunks)
    assert stats["total_chunk_tokens"].sum() == chunks["n_chunk_tokens"].sum()


def test_bad_stride_is_loud(ray_session):
    with pytest.raises(ValueError, match="stride"):
        chunking.chunk_stats_by_lang(_ds(["a b"]), size=8, stride=0)
    with pytest.raises(ValueError, match="stride"):
        chunking.chunk_documents(_ds(["a b"]), size=8, stride=9)
