"""Probabilistic record linkage (Fellegi–Sunter 1969) — the entity
resolution pass a registry merge runs: block candidate pairs, compare
fields, sum per-field agreement log-weights, classify match /
possible / non-match.

Shape: both record sides ride ONE dataset (side-tagged), blocked by a
sorted-neighborhood key (nation × record-ordinal bucket) through a
single groupby exchange; each block scores its cross pairs with
vectorized kernels (byte-matrix Levenshtein DP, integer band
arithmetic) and emits only a per-class census partial (class, n,
score_sum, pair_xor), so pairs never leave the worker and the driver
folds O(blocks × 3) rows. At 100 TB the block window bounds per-group
pair volume by construction (window²), and the census fold is
associative.

Weights are DECLARED integer constants (the trained-m/u estimation is
a separate EM op); the whole decision rule is therefore
SQL-expressible and the oracle re-derives every pair, every score and
the census with DuckDB's levenshtein().
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# declared Fellegi–Sunter agreement weights (integer log-odds units)
W_NAME_EXACT = 40
W_NAME_CLOSE = 25   # levenshtein 1..2
W_NAME_FAR = -30
W_SEG_EQ = 15
W_SEG_NE = -10
W_BAND_EQ = 10
W_BAND_NE = -5
T_MATCH = 50
T_POSSIBLE = 20
BAND_CENTS = 200_000          # $2000 balance bands (truncating div)
BLOCK_WINDOW = 1_000          # sorted-neighborhood ordinal bucket
PAIR_MIX = 1_000_003          # pair checksum key: a*PAIR_MIX + b


def batch_levenshtein(a_list, b_list) -> np.ndarray:
    """Exact unit-cost Levenshtein for each aligned pair, vectorized
    ACROSS the pair axis (the classic DP runs once over the padded
    max-shape byte matrices; each pair's answer is read at its own
    (len_a, len_b) cell, which only ever depended on real bytes).
    O(La·Lb) python steps of O(n_pairs) vector work — built for many
    short strings, the record-linkage regime."""
    n = len(a_list)
    if n != len(b_list):
        raise ValueError("batch_levenshtein: length mismatch")
    if n == 0:
        return np.zeros(0, np.int64)
    # codepoint-level (DuckDB levenshtein parity), via utf-32 views
    ab = [np.frombuffer(s.encode("utf-32-le"), np.uint32)
          for s in a_list]
    bb = [np.frombuffer(s.encode("utf-32-le"), np.uint32)
          for s in b_list]
    la = np.array([len(s) for s in ab], np.int64)
    lb = np.array([len(s) for s in bb], np.int64)
    La, Lb = int(la.max()), int(lb.max())
    ma = np.full((n, La), 0xFFFFFFFF, np.uint32)
    mb = np.full((n, Lb), 0xFFFFFFFE, np.uint32)
    for i, s in enumerate(ab):
        ma[i, : len(s)] = s
    for i, s in enumerate(bb):
        mb[i, : len(s)] = s
    dp = np.tile(np.arange(Lb + 1, dtype=np.int64), (n, 1))
    ans = np.where(la == 0, lb, -1)
    for i in range(1, La + 1):
        prev_diag = dp[:, 0].copy()
        dp[:, 0] = i
        for j in range(1, Lb + 1):
            cost = (ma[:, i - 1] != mb[:, j - 1]).astype(np.int64)
            cur = np.minimum(np.minimum(dp[:, j], dp[:, j - 1]) + 1,
                             prev_diag + cost)
            prev_diag = dp[:, j].copy()
            dp[:, j] = cur
        done = la == i
        if done.any():
            ans[done] = dp[done, lb[done]]
    return ans


def _lev_class(a_list, b_list) -> np.ndarray:
    """0 = identical, 1 = levenshtein in 1..2, 2 = farther. Exact:
    identical pairs short-circuit, |Δlen| > 2 is provably > 2
    (lev ≥ |Δlen|); the full DP decides everything else. (A hamming
    prefilter is NOT sound here — shift pairs like 'ababab'/'bababa'
    have hamming 6 but levenshtein 2.)"""
    n = len(a_list)
    cls = np.full(n, 2, np.int8)
    if n == 0:
        return cls
    la = np.array([len(s) for s in a_list], np.int64)
    lb = np.array([len(s) for s in b_list], np.int64)
    same = np.array([a == b for a, b in zip(a_list, b_list)])
    cls[same] = 0
    idx = np.nonzero(~same & (np.abs(la - lb) <= 2))[0]
    if len(idx):
        lev = batch_levenshtein([a_list[i] for i in idx],
                                [b_list[i] for i in idx])
        cls[idx[lev <= 2]] = 1
    return cls


def truncdiv(x: np.ndarray, d: int) -> np.ndarray:
    """Truncate-toward-zero integer division — DuckDB's // (numpy //
    floors; the monthly_growth lesson)."""
    return np.sign(x) * (np.abs(x) // d)


def score_pairs(a_name, b_name, a_seg, b_seg, a_cents, b_cents):
    """Integer FS score per aligned candidate pair."""
    lev_cls = _lev_class(list(a_name), list(b_name))
    name_w = np.select([lev_cls == 0, lev_cls == 1],
                       [W_NAME_EXACT, W_NAME_CLOSE], W_NAME_FAR)
    seg_w = np.where(np.asarray(a_seg) == np.asarray(b_seg),
                     W_SEG_EQ, W_SEG_NE)
    band_w = np.where(truncdiv(np.asarray(a_cents), BAND_CENTS)
                      == truncdiv(np.asarray(b_cents), BAND_CENTS),
                      W_BAND_EQ, W_BAND_NE)
    return name_w + seg_w + band_w


def classify(score: np.ndarray) -> np.ndarray:
    return np.select([score >= T_MATCH, score >= T_POSSIBLE],
                     ["match", "possible"], "non_match")


def _score_block(g: pa.Table) -> pa.Table:
    """All cross pairs of one block → per-class census partial."""
    side = g["side"].to_numpy(zero_copy_only=False)
    rid = g["rid"].to_numpy(zero_copy_only=False)
    names = np.array(g["name"].to_pylist(), object)
    segs = np.array(g["segment"].to_pylist(), object)
    cents = g["cents"].to_numpy(zero_copy_only=False)
    ai = np.nonzero(side == 0)[0]
    bi = np.nonzero(side == 1)[0]
    if not len(ai) or not len(bi):
        return pa.table({"class": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "score_sum": pa.array([], pa.int64()),
                         "pair_xor": pa.array([], pa.int64())})
    ii, jj = np.meshgrid(ai, bi, indexing="ij")
    ii, jj = ii.ravel(), jj.ravel()
    score = score_pairs(names[ii], names[jj], segs[ii], segs[jj],
                        cents[ii], cents[jj])
    cls = classify(score)
    key = rid[ii] * PAIR_MIX + rid[jj]
    out = {"class": [], "n": [], "score_sum": [], "pair_xor": []}
    for c in np.unique(cls):
        m = cls == c
        out["class"].append(str(c))
        out["n"].append(int(m.sum()))
        out["score_sum"].append(int(score[m].sum()))
        out["pair_xor"].append(int(np.bitwise_xor.reduce(key[m])))
    return pa.table({
        "class": pa.array(out["class"], pa.string()),
        "n": pa.array(out["n"], pa.int64()),
        "score_sum": pa.array(out["score_sum"], pa.int64()),
        "pair_xor": pa.array(out["pair_xor"], pa.int64()),
    })


def record_linkage(customer_ds) -> pd.DataFrame:
    """Link the customer table against its deterministically-dirtied
    registry twin (see q_customer_record_linkage for the fixture
    rule) and return the per-class census."""
    def emit_sides(t: pa.Table) -> pa.Table:
        key = t["c_custkey"].to_numpy(zero_copy_only=False)
        nation = t["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        names = t["c_name"].to_pylist()
        segs = t["c_mktsegment"].to_pylist()
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        cents = (np.sign(bal)
                 * np.floor(np.abs(bal) * 100.0 + 0.5)).astype(np.int64)
        blk = nation * 1_000_000 + key // BLOCK_WINDOW
        rows = {
            "blk": list(blk), "side": [0] * len(key),
            "rid": list(key), "name": list(names),
            "segment": list(segs), "cents": list(cents),
        }
        dirty = key % 3 != 2
        for i in np.nonzero(dirty)[0]:
            nm = names[i]
            if key[i] % 3 == 0:
                nm = nm[:11] + "X" + nm[12:]
            rows["blk"].append(int(blk[i]))
            rows["side"].append(1)
            rows["rid"].append(int(key[i]) + 1_000_000)
            rows["name"].append(nm)
            rows["segment"].append(segs[i])
            rows["cents"].append(int(cents[i]))
        return pa.table({
            "blk": pa.array(rows["blk"], pa.int64()),
            "side": pa.array(rows["side"], pa.int64()),
            "rid": pa.array(rows["rid"], pa.int64()),
            "name": pa.array(rows["name"], pa.string()),
            "segment": pa.array(rows["segment"], pa.string()),
            "cents": pa.array(rows["cents"], pa.int64()),
        })

    tagged = customer_ds.map_batches(emit_sides, batch_format="pyarrow")
    partials = tagged.groupby("blk").map_groups(
        _score_block, batch_format="pyarrow")
    folded: dict[str, list[int]] = {}
    for b in partials.iter_batches(batch_format="pyarrow",
                                   batch_size=65536):
        for c, n, s, x in zip(b["class"].to_pylist(),
                              b["n"].to_pylist(),
                              b["score_sum"].to_pylist(),
                              b["pair_xor"].to_pylist()):
            cur = folded.setdefault(c, [0, 0, 0])
            cur[0] += n
            cur[1] += s
            cur[2] ^= x
    out = pd.DataFrame(
        [{"class": c, "n_pairs": v[0], "score_sum": v[1],
          "pair_xor": v[2]} for c, v in sorted(folded.items())])
    for c in ("n_pairs", "score_sum", "pair_xor"):
        out[c] = out[c].astype("int64")
    return out
