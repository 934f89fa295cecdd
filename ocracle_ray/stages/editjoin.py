"""Edit-distance-1 similarity self-join via deletion neighborhoods —
the record-linkage / data-cleaning op (typo'd keys, OCR'd names) next
to the token-set joins (MinHash, n-gram Jaccard) which can't see
single-character edits.

Algorithm (FastSS / SymSpell, Bocek et al. 2007): ed(a, b) ≤ 1 ⟺ a and
b share a string in D(s) = {s} ∪ {s with one char deleted} — deletion
variants cover substitution (both delete position i), insertion (the
shorter string IS a variant of the longer) and equality. Sharing a
variant is necessary but NOT sufficient (e.g. "ab"/"ba" share "b" at
distance 2), so candidates verify with an exact ed ≤ 1 kernel.

Distributed shape (the MinHash-LSH banding architecture):

1. Variant emission is vectorized BY POSITION, not by row — for each
   deletion position i ≤ max_len the whole column does
   ``utf8_slice(0,i) ++ utf8_slice(i+1)`` (L+1 Arrow kernel passes per
   batch; the O(L) row blow-up is the algorithm's documented cost and
   the reason it's a k=1..2 tool, not a general-k one).
2. ONE groupby(variant) exchange; per-group a<b pair emission with a
   loud hot-variant guard (a variant bucket of size g emits g(g−1)/2
   candidates — a skewed key must fail loudly, never silently flood).
3. Distinct pairs via a second (pair-key) groupby — candidate
   multiplicity is bounded by |D(s)| so this exchange is ≤ (L+1)× the
   true pair volume.
4. Exact verification per batch: equal lengths → ≤1 positional
   mismatch; lengths off by one → the one-gap alignment check; both
   numpy over padded byte matrices (no Python per pair).

The strings ride the exchanges (short keys by contract — names, urls,
titles); a long-text variant join would hash first.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SEP = "\x01"
MAX_VARIANT_BUCKET = 100_000  # g(g-1)/2 pairs per bucket — guard hot keys


def deletion_variants(ds, *, name_col: str):
    """(variant, name) rows: the string itself plus every
    one-char-deleted form, emitted by POSITION-vectorized kernels."""

    def emit(t: pa.Table) -> pa.Table:
        names = t[name_col]
        if isinstance(names, pa.ChunkedArray):
            names = names.combine_chunks()
        lens = pc.utf8_length(names).to_numpy(zero_copy_only=False)
        max_len = int(lens.max()) if len(lens) else 0
        var_cols = [names]  # identity variant
        name_cols = [names]
        for i in range(max_len):
            mask = pa.array(lens > i)
            sub = names.filter(mask)
            var = pc.binary_join_element_wise(
                pc.utf8_slice_codeunits(sub, 0, i),
                pc.utf8_slice_codeunits(sub, i + 1, 2**31 - 1), "")
            var_cols.append(var)
            name_cols.append(sub)
        return pa.table({
            "variant": pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                 else c for c in var_cols]),
            "name": pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                 else c for c in name_cols]),
        })

    return ds.map_batches(emit, batch_format="pyarrow")


def _pairs_from_group(g: pa.Table) -> pa.Table:
    names = sorted(set(g["name"].to_pylist()))
    n = len(names)
    if n * (n - 1) // 2 > MAX_VARIANT_BUCKET:
        raise ValueError(
            f"editjoin: variant bucket of {n} names would emit "
            f"{n * (n - 1) // 2} candidates (> {MAX_VARIANT_BUCKET}) — "
            "a degenerate hot variant; pre-filter or raise the guard")
    a, b = [], []
    for i in range(n):
        for j in range(i + 1, n):
            a.append(names[i])
            b.append(names[j])
    return pa.table({"a": pa.array(a, pa.string()),
                     "b": pa.array(b, pa.string())})


def _pad_bytes(strs: list[str], width: int) -> np.ndarray:
    buf = np.zeros((len(strs), width), np.uint8)
    for i, s in enumerate(strs):
        bs = s.encode()
        buf[i, :len(bs)] = np.frombuffer(bs, np.uint8)
    return buf


def ed1_mask(a_list: list[str], b_list: list[str]) -> np.ndarray:
    """Exact edit-distance ≤ 1 (and ≠ 0) per pair, vectorized over
    padded byte matrices."""
    n = len(a_list)
    if n == 0:
        return np.zeros(0, bool)
    la = np.array([len(s.encode()) for s in a_list], np.int64)
    lb = np.array([len(s.encode()) for s in b_list], np.int64)
    width = int(max(la.max(), lb.max())) + 1
    A = _pad_bytes(a_list, width)
    B = _pad_bytes(b_list, width)
    out = np.zeros(n, bool)

    eq = la == lb
    if eq.any():
        mism = (A[eq] != B[eq]).sum(axis=1)
        out[np.flatnonzero(eq)] = mism == 1  # ==0 would be identity

    d1 = np.abs(la - lb) == 1
    if d1.any():
        idx = np.flatnonzero(d1)
        # S = shorter, L = longer; match iff L with one char removed
        # at the FIRST mismatch equals S: prefix equal up to j, and
        # L[j+1:] == S[j:]
        swap = la[idx] > lb[idx]
        S = np.where(swap[:, None], B[idx], A[idx])
        L = np.where(swap[:, None], A[idx], B[idx])
        ls = np.minimum(la, lb)[idx]
        neq = S != L
        # first mismatch position (ls if none within the short span)
        big = neq | (np.arange(width) >= ls[:, None])
        j = big.argmax(axis=1)
        pos = np.arange(width)
        # tail check: L[p+1] == S[p] for p in [j, ls). Positions < j
        # are equal by j's first-mismatch definition; j == ls means L
        # is S plus one trailing char (trivially true). The roll never
        # wraps into range: p < ls ≤ width−2 so p+1 ≤ width−1.
        Lshift = np.roll(L, -1, axis=1)
        tail_ok = np.where((pos >= j[:, None]) & (pos < ls[:, None]),
                           Lshift == S, True)
        out[idx] = tail_ok.all(axis=1)
    return out


def ed1_self_join(ds, *, name_col: str):
    """Distinct verified edit-distance-1 pairs as a Dataset with
    columns (a, b), a < b."""
    cand = (
        deletion_variants(ds, name_col=name_col)
        .groupby("variant")
        .map_groups(_pairs_from_group, batch_format="pyarrow")
    )

    def keyed(t: pa.Table) -> pa.Table:
        return t.append_column(
            "k", pc.binary_join_element_wise(t["a"], t["b"], SEP))

    def first_row(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    distinct = (
        cand.map_batches(keyed, batch_format="pyarrow")
        .groupby("k")
        .map_groups(first_row, batch_format="pyarrow")
    )

    def verify(t: pa.Table) -> pa.Table:
        a = t["a"].to_pylist()
        b = t["b"].to_pylist()
        mask = ed1_mask(a, b)
        return t.select(["a", "b"]).filter(pa.array(mask))

    return distinct.map_batches(verify, batch_format="pyarrow")
