"""Sequence packing (stages/packing.py): span semantics against a
pure-Python stream simulation, boundary crossing, zero-token docs,
and block-layout invariance of the two-pass offset scheme."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ocracle_ray.stages.packing import pack_doc_spans, packing_stats_by_lang


def _ds(rows, parts=3):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    })).repartition(parts)


def _ref_spans(rows, seq_len):
    """Python stream simulation: tokens + EOS per doc in doc_id order."""
    out = {}
    pos = 0
    for doc_id, lang, text in sorted(rows):
        toks = [w for w in __import__("re").split(r"[^a-z0-9]+", text.lower()) if w]
        t = len(toks)
        if t == 0:
            out[doc_id] = (t, -1, -1, False)
        else:
            first, last = pos // seq_len, (pos + t - 1) // seq_len
            out[doc_id] = (t, first, last, first != last)
        pos += t + 1
    return out, pos


def test_spans_match_stream_simulation(ray_session):
    words = lambda n, w: " ".join(f"{w}{i}" for i in range(n))
    rows = [
        (1, "en", words(5, "a")),
        (2, "en", ""),                      # zero-token doc: EOS only
        (3, "de", words(9, "b")),           # crosses the 8-boundary
        (7, "de", words(3, "c")),
        (10, "en", words(20, "d")),         # spans 3 sequences
        (11, "zh", words(1, "e")),
    ]
    seq_len = 8
    got = pack_doc_spans(_ds(rows), seq_len=seq_len).to_pandas()
    got = got.set_index("doc_id").sort_index()
    ref, stream = _ref_spans(rows, seq_len)
    for doc_id, (t, first, last, crosses) in ref.items():
        r = got.loc[doc_id]
        assert (r["n_tok"], r["first_seq"], r["last_seq"], r["crosses"]) == \
            (t, first, last, crosses), doc_id

    stats = packing_stats_by_lang(_ds(rows), seq_len=seq_len)
    n_seq = (stream + seq_len - 1) // seq_len
    assert int(stats["n_sequences"].iloc[0]) == n_seq
    assert int(stats["n_pad_tokens"].iloc[0]) == n_seq * seq_len - stream
    assert int(stats["n_docs"].sum()) == len(rows)
    assert int(stats["n_crossing_docs"].sum()) == sum(
        c for _, _, _, c in ref.values()
    )


def test_block_layout_invariance(ray_session):
    """The two-pass offset scheme must give identical spans however the
    input blocks are laid out (the offsets key on sorted-block min ids)."""
    rows = [(i, "en", " ".join(f"w{j}" for j in range(i % 7)))
            for i in range(60)]
    a = pack_doc_spans(_ds(rows, parts=1), seq_len=16).to_pandas()
    b = pack_doc_spans(_ds(rows, parts=7), seq_len=16).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_eos_only_stream_positions(ray_session):
    """Back-to-back empty docs shift later docs by exactly one EOS each."""
    rows = [(1, "en", ""), (2, "en", ""), (3, "en", "x y z")]
    got = pack_doc_spans(_ds(rows), seq_len=4).to_pandas().set_index("doc_id")
    # doc 3 starts at position 2 (two EOS) -> tokens at 2,3,4 -> seqs 0..1
    assert got.loc[3, "first_seq"] == 0
    assert got.loc[3, "last_seq"] == 1
    assert bool(got.loc[3, "crosses"])
