"""CCNet-style frequent-block (boilerplate) suppression over the
blocks surface — the corpus-level complement of the per-page
link/text-density classifier (`core.classify`): a block whose
normalized text repeats across the corpus ≥ ``min_occurrences`` times
is template boilerplate (cookie banners, nav headers, exam-admin
preambles) no density heuristic can catch page-locally, because on its
own page it looks like prose. CCNet (Wenzek et al. 2020) runs exactly
this pass with paragraph hashes before its LM filtering; the
reference's analogue is the fixed admin-text marker list
(``prompts/remove_exam_admin.txt``) — this operator LEARNS the marker
set from corpus frequency instead of hard-coding it.

Scale shape:
- Block hashes are ``core.textstats.fingerprint`` (blake2b over
  normalized text, non-negative int64) computed once per block in the
  hash-rows map; raw text never enters the frequency exchange.
- Occurrence counts: per-batch in-Arrow-grouped (h, cnt) partials →
  ONE distributed groupby(h).sum — the only shuffle, carrying one row
  per distinct block text.
- The frequent set is small BY CONSTRUCTION (≤ n_blocks /
  min_occurrences, and real boilerplate is a few thousand distinct
  strings), so it folds to the driver behind a LOUD guard and
  broadcasts once via ``ray.put`` + ``broadcast.cached_get``; the
  suppression pass is then a zero-exchange vectorized ``pc.is_in``
  map. Occurrence count (not distinct-page count) is the documented
  frequency measure — one exchange instead of two; a page repeating
  its own nav N times contributes N, which is still boilerplate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..broadcast import cached_get
from ..core.textstats import fingerprint

BOILER_MIN_OCCURRENCES = 5
FREQ_SET_LIMIT = 5_000_000  # driver guard: distinct frequent hashes


def block_hash_rows(blocks_ds):
    """(url, branch, block_id, h, n_chars) per block — the CDC-style
    reduced surface the frequency pass and the artifact oracle share."""

    def hash_batch(t: pa.Table) -> pa.Table:
        hs = np.fromiter(
            (fingerprint(x) for x in t["text"].to_pylist()),
            np.int64, count=t.num_rows,
        )
        return pa.table({
            "url": t["url"],
            "branch": t["branch"],
            "block_id": pc.cast(t["block_id"], pa.int64()),
            "h": pa.array(hs, pa.int64()),
            "n_chars": pc.cast(t["n_chars"], pa.int64()),
        })

    return blocks_ds.map_batches(hash_batch, batch_format="pyarrow")


def frequent_hashes(rows_ds, *, min_occurrences: int = BOILER_MIN_OCCURRENCES,
                    limit: int = FREQ_SET_LIMIT) -> np.ndarray:
    """Distinct hashes occurring ≥ min_occurrences times, as a sorted
    int64 array (deterministic broadcast payload)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["h"]).group_by("h").aggregate([("h", "count")])
        return g.rename_columns(["h", "cnt"])

    counts = (
        rows_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    freq = counts.filter(expr=f"cnt >= {int(min_occurrences)}")
    out: list[np.ndarray] = []
    total = 0
    for block in freq.iter_batches(batch_size=None, batch_format="pyarrow"):
        arr = block["h"].to_numpy(zero_copy_only=False)
        total += len(arr)
        if total > limit:
            raise ValueError(
                f"frequent_hashes: frequent set exceeded "
                f"FREQ_SET_LIMIT={limit} — this corpus's 'boilerplate' "
                f"is not rare enough to broadcast; raise "
                f"min_occurrences or shuffle-join the suppression"
            )
        out.append(arr)
    if not out:
        return np.empty(0, np.int64)
    return np.sort(np.concatenate(out))


def boilerplate_census(rows_ds, *,
                       min_occurrences: int = BOILER_MIN_OCCURRENCES,
                       limit: int = FREQ_SET_LIMIT) -> pd.DataFrame:
    """Per-branch census after suppression: (branch, n_blocks,
    n_dropped, kept_chars, fp_xor_kept). fp_xor_kept pins exactly WHICH
    blocks survived — one wrong drop anywhere flips the XOR."""
    import ray

    freq_ref = ray.put(pa.array(frequent_hashes(
        rows_ds, min_occurrences=min_occurrences, limit=limit),
        pa.int64()))

    def census(t: pa.Table) -> pa.Table:
        freq = cached_get(freq_ref)  # Arrow value-set, unpickled once
        h = t["h"].to_numpy(zero_copy_only=False)
        boiler = pc.is_in(t["h"], value_set=freq)
        boiler = boiler.to_numpy(zero_copy_only=False)
        branch = t["branch"].to_numpy(zero_copy_only=False)
        nc = t["n_chars"].to_numpy(zero_copy_only=False)
        rows = []
        for b in np.unique(branch):
            m = branch == b
            kept = m & ~boiler
            rows.append((
                str(b), int(m.sum()), int((m & boiler).sum()),
                int(nc[kept].sum()),
                int(np.bitwise_xor.reduce(h[kept])) if kept.any() else 0,
            ))
        return pa.table({
            "branch": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "nd": pa.array([r[2] for r in rows], pa.int64()),
            "kc": pa.array([r[3] for r in rows], pa.int64()),
            "x": pa.array([r[4] for r in rows], pa.int64()),
        })

    acc: dict[str, list[int]] = {}
    for block in rows_ds.map_batches(
        census, batch_format="pyarrow"
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for b, n, nd, kc, x in zip(
            block["branch"].to_pylist(), block["n"].to_pylist(),
            block["nd"].to_pylist(), block["kc"].to_pylist(),
            block["x"].to_pylist(),
        ):
            cur = acc.setdefault(b, [0, 0, 0, 0])
            cur[0] += n
            cur[1] += nd
            cur[2] += kc
            cur[3] ^= x
    out = pd.DataFrame(
        [(b, *v) for b, v in sorted(acc.items())],
        columns=["branch", "n_blocks", "n_dropped", "kept_chars",
                 "fp_xor_kept"],
    )
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out
