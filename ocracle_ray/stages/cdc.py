"""Content-defined chunking (the gear-hash CDC of LBFS/FastCDC,
Muthitacharoen et al. 2001 / Xia et al. 2016) — the storage-dedup
primitive: cut documents at content-determined boundaries so shared
passages land in IDENTICAL chunks regardless of surrounding edits,
then fingerprint chunks and measure cross-document duplication. An
insertion shifts fixed-size blocks forever; CDC boundaries re-align
within one chunk.

Semantics (exactly mirrored by the oracle):
- positions are CODEPOINTS, not bytes — DuckDB ``substr`` is
  character-based, so chunk content re-derivation (``md5(substr(text,
  start+1, len))``) is exact for non-ASCII docs too;
- gear hash ``h_i = (h_{i-1} << 1 + gear[cp_i & 0xFF]) mod 2^64``
  (the 64-codepoint effective window), gear table derived from
  blake2b of the byte value — computed, not pasted;
- cut AFTER position i when ``h_i & MASK == 0`` and the chunk has
  reached MIN_LEN; force a cut at MAX_LEN; the final chunk may be
  short.

Scale shape: chunking is one streaming pass. The per-batch kernel is
vectorized across ALL bytes of the batch — the rolling hash's
shift-add recurrence has the closed form ``h_i = Σ_{k<64}
gear[cp_{i-k}] << k``, so it computes as 64 numpy passes over the
batch's concatenated codepoints (docs separated by 64 PAD symbols
whose gear value is 0, so windows never bleed across docs — the
stages/dsir.py position-sweep trick). Python runs only over boundary
CANDIDATES (sparse: one per ~2^mask_bits positions) and forced max
cuts, the ccitt per-run-work rule. Only (doc_id, start, len, fp)
chunk rows leave the worker.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

CDC_MIN, CDC_MAX = 16, 128
CDC_MASK = np.uint64(0x1F)  # 5 bits -> ~32-codepoint average chunks
_WINDOW = 64
_PAD = 256  # out-of-alphabet gear index with gear value 0

_GEAR = np.zeros(257, np.uint64)
for _b in range(256):
    _GEAR[_b] = np.uint64(int.from_bytes(
        hashlib.blake2b(bytes([_b]), digest_size=8).digest(), "big"))


def _gear_hashes(idx: np.ndarray) -> np.ndarray:
    """Closed-form rolling gear hash over an index array (PAD entries
    contribute 0): h[i] = Σ_{k<64} gear[idx[i-k]] << k, mod 2^64."""
    g = _GEAR[idx]
    h = g.copy()
    with np.errstate(over="ignore"):
        for k in range(1, _WINDOW):
            h[k:] += g[:-k] << np.uint64(k)
    return h


def chunk_batch(texts, doc_ids) -> pa.Table:
    """(doc_id, start, len, fp) chunk rows for a batch of documents."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    docs = texts.to_pylist()
    ids = (doc_ids.to_numpy(zero_copy_only=False)
           if not isinstance(doc_ids, np.ndarray) else doc_ids)
    cps = [np.frombuffer(t.encode("utf-32-le"), np.uint32) for t in docs]
    pad = np.full(_WINDOW, _PAD, np.int64)
    parts, offsets, pos = [], [], 0
    for c in cps:
        offsets.append(pos)
        parts.append((c & 0xFF).astype(np.int64))
        parts.append(pad)
        pos += len(c) + _WINDOW
    if not parts:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "start": pa.array([], pa.int64()),
                         "len": pa.array([], pa.int64()),
                         "fp": pa.array([], pa.string())})
    h = _gear_hashes(np.concatenate(parts))
    is_cand = (h & CDC_MASK) == 0

    out = {"doc_id": [], "start": [], "len": [], "fp": []}
    for di, (c, text) in enumerate(zip(cps, docs)):
        n = len(c)
        if n == 0:
            continue
        base = offsets[di]
        cand = np.flatnonzero(is_cand[base: base + n])  # cut AFTER these
        cuts = []
        prev = -1  # last cut position (chunk = prev+1 .. cut)
        ci = 0
        while True:
            forced = prev + CDC_MAX
            nxt = None
            while ci < len(cand):
                p = int(cand[ci])
                if p <= prev + CDC_MIN - 1:
                    ci += 1
                    continue
                if p >= forced:
                    break
                nxt = p
                ci += 1
                break
            cut = nxt if nxt is not None else min(forced, n - 1)
            if cut >= n - 1:
                cut = n - 1
            cuts.append(cut)
            if cut == n - 1:
                break
            prev = cut
        prev = -1
        for cut in cuts:
            s, ln = prev + 1, cut - prev
            out["doc_id"].append(int(ids[di]))
            out["start"].append(s)
            out["len"].append(ln)
            out["fp"].append(
                hashlib.md5(text[s: s + ln].encode()).hexdigest())
            prev = cut
    return pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "start": pa.array(out["start"], pa.int64()),
        "len": pa.array(out["len"], pa.int64()),
        "fp": pa.array(out["fp"], pa.string()),
    })


def cdc_chunks(ds, *, text_col: str = "text", id_col: str = "doc_id",
               keep_col: str | None = None):
    """Dataset of chunk rows — one streaming pass. ``keep_col``
    (e.g. lang) is repeated onto each chunk row when given."""

    def fn(t: pa.Table) -> pa.Table:
        chunks = chunk_batch(t[text_col], t[id_col])
        if keep_col is None:
            return chunks
        ids = t[id_col].to_numpy(zero_copy_only=False)
        lut = dict(zip(ids.tolist(),
                       t[keep_col].to_pylist()))
        vals = [lut[d] for d in chunks["doc_id"].to_pylist()]
        return chunks.append_column(keep_col, pa.array(vals, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")
