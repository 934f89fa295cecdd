"""Exact set-similarity self-join via prefix filtering — All-Pairs /
PPJoin (Bayardo et al. WWW'07; Xiao et al. WWW'08): every pair of
documents whose DISTINCT word-3-gram sets have Jaccard ≥ τ, found
EXACTLY (no LSH recall loss) without the quadratic all-pairs scan.

Where it sits in the dedup family: MinHash-LSH (stages/dedup.py) is
the probabilistic 100-TB path with a documented per-pair banding miss
(~1.7e-4 measured at the margin); n-gram Jaccard (inverted-index
all-pairs) is exact but explodes on frequent grams. Prefix filtering
is the exact middle: order every set by GLOBAL ascending document
frequency and only the first |s| − ceil(τ·|s|) + 1 tokens of each set
(its "prefix") can witness a qualifying pair — a pair with J ≥ τ must
share at least one token in both prefixes under any single global
total order (the prefix-filter theorem; property-swept against brute
force in tests). Rare-first ordering makes prefix buckets near-empty
exactly where frequency would explode them.

Scale shape:
1. Rank map: per-batch per-doc-distinct (gram → partial df) combiners
   fold on the driver behind a loud VOCAB_RANK_LIMIT (the perplexity
   trainer's contract; past the guard the rank map comes from the
   count-shuffle pruning pass, stages/ngram_lm.bigram_counts_pruned),
   sorted (df ASC, gram ASC), broadcast ONCE via ray.put.
2. Prefix emission is map-only: each document's whole text sits in one
   row, so distinct-(doc, rank) sets, set sizes, and the per-doc
   prefix cut are one np.unique + bincount per batch — no exchange.
3. ONE groupby(rank) co-locates prefix tokens; in-bucket a<b pair
   emission applies the PPJoin LENGTH filter (J ≥ τ ⟹ τ·max ≤ min
   size, in exact ppm integers) behind a loud hot-bucket guard.
4. Distinct pairs via one more groupby; verification is an
   embarrassingly parallel map over the pair Dataset against a
   broadcast {doc → sorted rank array} built from ONE semi-join-
   filtered documents pass (only candidate docs ship; loud-guarded) —
   the dedup gather-lane pattern, zero further exchanges, no driver
   pair frame.

Jaccard is exact integer arithmetic end-to-end: the τ gate is
``inter·1e6 ≥ tau_ppm·union`` and the reported value is
``inter·1e6 // union`` ppm — the DuckDB oracle re-derives the FULL
pair set by brute-force all-pairs ``list_intersect`` and matches by
integer equality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..broadcast import cached_get
from .gopher import _shifted
from .ngram_lm import _doc_token_stream

TAU_PPM = 500_000
VOCAB_RANK_LIMIT = 2_000_000   # driver-folded rank map (df per gram)
MAX_PREFIX_BUCKET = 100_000    # g(g-1)/2 candidates per prefix bucket
CAND_DOC_LIMIT = 2_000_000     # distinct docs referenced by candidates
GATHER_SET_LIMIT = 50_000_000  # total rank ints in the broadcast map


def _doc_distinct_grams(texts):
    """(parents, grams): batch-local doc index + word-3-gram key per
    OCCURRENCE (callers dedup); shared tokenization with gopher/LM.
    3-grams, not bigrams, by measurement: this synthetic corpus has a
    ~1k-key bigram vocabulary (31 unigrams — the greedy-cover
    finding), which floods every prefix bucket and makes the filter
    WORSE than brute force (86 s at sf0.1); the 3-gram vocabulary is
    16k+ with max df 7, so prefix buckets are near-singletons. On a
    real crawl the unigram space is already sparse and n is a
    tuning knob, not a correctness one."""
    parents, _prev, tok = _doc_token_stream(texts)
    keys, valid = _shifted(tok, parents, 2)
    sel = pa.array(valid)
    return parents[valid], keys.filter(sel)


def gram_rank_map(ds, *, text_col: str = "text"):
    """Global rare-first total order: gram -> rank (df ASC, gram ASC).
    Per-batch per-doc-distinct combiners, driver fold behind a loud
    guard; returns the ordered vocab as a pyarrow StringArray whose
    POSITION is the rank."""

    def partial(t: pa.Table) -> pa.Table:
        d, g = _doc_distinct_grams(t[text_col])
        if len(d) == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        tbl = pa.table({"d": pa.array(d, pa.int64()), "gram": g})
        u = tbl.group_by(["d", "gram"]).aggregate([])
        out = u.group_by(["gram"]).aggregate([("d", "count")])
        return out.rename_columns(["gram", "df"])

    df: dict[str, int] = {}
    for block in ds.map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for g, n in zip(block["gram"].to_pylist(),
                        block["df"].to_pylist()):
            df[g] = df.get(g, 0) + n
            if len(df) > VOCAB_RANK_LIMIT:
                raise ValueError(
                    f"setsim: > {VOCAB_RANK_LIMIT} distinct grams — "
                    "build the rank map with the count-shuffle pruned "
                    "pass (stages/ngram_lm.bigram_counts_pruned) "
                    "instead of the driver fold")
    vocab = sorted(df, key=lambda g: (df[g], g))
    return pa.array(vocab, pa.string())


def _ceil_ppm(sizes: np.ndarray, tau_ppm: int) -> np.ndarray:
    return (sizes * tau_ppm + 999_999) // 1_000_000


def prefix_rows(ds, vocab_ref, *, text_col: str = "text",
                doc_col: str = "doc_id", tau_ppm: int = TAU_PPM):
    """Map-only prefix emission: (rank, doc, sz) rows for the first
    |s| − ceil(τ|s|) + 1 rare-first tokens of each doc's set."""

    def emit(t: pa.Table) -> pa.Table:
        empty = pa.table({"rank": pa.array([], pa.int64()),
                          "doc": pa.array([], pa.int64()),
                          "sz": pa.array([], pa.int64())})
        d, g = _doc_distinct_grams(t[text_col])
        if len(d) == 0:
            return empty
        vocab = cached_get(vocab_ref)
        ranks = pc.index_in(g, value_set=vocab)
        if ranks.null_count:
            raise ValueError("setsim: gram missing from the rank map — "
                             "the map must be built over the same input")
        rr = ranks.to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.unique((d.astype(np.int64) << 32) | rr)
        dd = (u >> 32).astype(np.int64)
        rank = (u & 0xFFFFFFFF).astype(np.int64)
        n = t.num_rows
        sizes = np.bincount(dd, minlength=n).astype(np.int64)
        plen = np.where(sizes > 0,
                        sizes - _ceil_ppm(sizes, tau_ppm) + 1, 0)
        cum = np.concatenate([[0], np.cumsum(sizes)])
        pos = np.arange(len(u), dtype=np.int64) - cum[dd]
        keep = pos < plen[dd]
        doc_ids = t[doc_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "rank": pa.array(rank[keep], pa.int64()),
            "doc": pa.array(doc_ids[dd[keep]], pa.int64()),
            "sz": pa.array(sizes[dd[keep]], pa.int64()),
        })

    return ds.map_batches(emit, batch_format="pyarrow")


def candidate_pairs(prefix_ds, *, tau_ppm: int = TAU_PPM):
    """Distinct (a, b, sz_a, sz_b) candidate pairs (a < b) sharing a
    prefix token, pre-pruned by the PPJoin length filter."""
    from ray.data.aggregate import Count

    def bucket_pairs(g: pa.Table) -> pa.Table:
        docs = g["doc"].to_numpy(zero_copy_only=False)
        szs = g["sz"].to_numpy(zero_copy_only=False)
        order = np.argsort(docs, kind="stable")
        docs, szs = docs[order], szs[order]
        n = len(docs)
        if n * (n - 1) // 2 > MAX_PREFIX_BUCKET:
            raise ValueError(
                f"setsim: prefix bucket of {n} docs would emit "
                f"{n * (n - 1) // 2} candidates (> {MAX_PREFIX_BUCKET})"
                " — a degenerate hot token survived rare-first "
                "ordering; lower tau or pre-prune the vocabulary")
        ia, ib = np.triu_indices(n, k=1)
        a, b = docs[ia], docs[ib]
        sa, sb = szs[ia], szs[ib]
        # length filter: J >= tau  ⟹  tau·max(|a|,|b|) <= min(|a|,|b|)
        keep = (np.minimum(sa, sb) * 1_000_000
                >= tau_ppm * np.maximum(sa, sb)) & (a != b)
        return pa.table({
            "a": pa.array(a[keep], pa.int64()),
            "b": pa.array(b[keep], pa.int64()),
            "sz_a": pa.array(sa[keep], pa.int64()),
            "sz_b": pa.array(sb[keep], pa.int64()),
        })

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def _safe(t: pa.Table) -> pa.Table:
        # aggregates can emit zero-row degenerate-schema blocks that
        # would KeyError downstream consumers (the cluster_pairs_ds
        # hazard) — normalize them to the declared pair schema
        if t.num_rows == 0:
            return pair_schema.empty_table()
        return t.select(["a", "b"])

    return (prefix_ds.groupby("rank")
            .map_groups(bucket_pairs, batch_format="pyarrow")
            .groupby(["a", "b"])
            .aggregate(Count(alias_name="_c"))
            .map_batches(_safe, batch_format="pyarrow"))


def setsim_join(ds, *, text_col: str = "text", doc_col: str = "doc_id",
                tau_ppm: int = TAU_PPM):
    """Exact Jaccard ≥ τ self-join over per-doc distinct word-3-gram
    sets. Returns a pandas frame (doc_a, doc_b, jaccard_ppm) sorted by
    (doc_a, doc_b) — integer ppm, floor division."""
    import pandas as pd
    import ray

    vocab = gram_rank_map(ds, text_col=text_col)
    vocab_ref = ray.put(vocab)
    pref = prefix_rows(ds, vocab_ref, text_col=text_col,
                       doc_col=doc_col, tau_ppm=tau_ppm)
    cand = candidate_pairs(pref, tau_ppm=tau_ppm).materialize()

    # candidate doc ids (ints only) — bounded driver pull, loud
    cand_ids: set[int] = set()
    for block in cand.select_columns(["a", "b"]).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        cand_ids.update(block["a"].to_pylist())
        cand_ids.update(block["b"].to_pylist())
        if len(cand_ids) > CAND_DOC_LIMIT:
            raise ValueError(
                f"setsim: > {CAND_DOC_LIMIT} candidate docs — switch "
                "the verify to the dedup two-join Dataset lane "
                "(stages/dedup._verify_pairs_distributed pattern)")
    if not cand_ids:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "jaccard_ppm": pd.Series([], dtype="int64")})

    ids_arr = pa.array(sorted(cand_ids), pa.int64())

    def set_rows(t: pa.Table) -> pa.Table:
        m = pc.is_in(t[doc_col], value_set=ids_arr)
        t = t.filter(m)
        d, g = _doc_distinct_grams(t[text_col])
        vocab_l = cached_get(vocab_ref)
        rr = pc.index_in(g, value_set=vocab_l).to_numpy(
            zero_copy_only=False).astype(np.int64)
        u = np.unique((d.astype(np.int64) << 32) | rr)
        doc_ids = t[doc_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc": pa.array(doc_ids[(u >> 32)], pa.int64()),
            "rank": pa.array(u & 0xFFFFFFFF, pa.int64()),
        })

    sets: dict[int, list[int]] = {}
    total = 0
    for block in ds.map_batches(
            set_rows, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for doc, rank in zip(block["doc"].to_pylist(),
                             block["rank"].to_pylist()):
            sets.setdefault(doc, []).append(rank)
            total += 1
            if total > GATHER_SET_LIMIT:
                raise ValueError(
                    f"setsim: > {GATHER_SET_LIMIT} gathered set "
                    "elements — switch verify to the Dataset lane")
    set_map = {k: np.array(sorted(v), np.int64) for k, v in sets.items()}
    map_ref = ray.put(set_map)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.schema([("doc_a", pa.int64()),
                              ("doc_b", pa.int64()),
                              ("jaccard_ppm", pa.int64())]).empty_table()
        m = cached_get(map_ref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        n = len(a)
        inter = np.zeros(n, np.int64)
        union = np.zeros(n, np.int64)
        for i in range(n):
            sa, sb = m[int(a[i])], m[int(b[i])]
            ii = len(np.intersect1d(sa, sb, assume_unique=True))
            inter[i] = ii
            union[i] = len(sa) + len(sb) - ii
        keep = inter * 1_000_000 >= tau_ppm * union
        return pa.table({
            "doc_a": pa.array(a[keep], pa.int64()),
            "doc_b": pa.array(b[keep], pa.int64()),
            "jaccard_ppm": pa.array(
                inter[keep] * 1_000_000 // union[keep], pa.int64()),
        })

    out = cand.map_batches(verify, batch_format="pyarrow").to_pandas()
    return (out.sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True).astype("int64"))


def containment_join(ds, *, text_col: str = "text",
                     doc_col: str = "doc_id",
                     tau_ppm: int = 800_000):
    """Exact CONTAINMENT self-join: ordered pairs (a, b) with
    |Sa ∩ Sb| / |Sa| ≥ τ over distinct word-3-gram sets — the
    template/wrapper detector (a page whose content is a near-subset
    of another's) that symmetric Jaccard hides when the container is
    much larger. Classic probe-prefix × full-index shape (Chaudhuri
    SSJoin): the INDEX side posts every token (the documented cost of
    an asymmetric predicate — no length upper bound can exist on the
    container), the PROBE side posts only its |Sa| − ceil(τ|Sa|) + 1
    rare-first prefix; the pigeonhole theorem holds per side under any
    single global order (property-swept in tests). One groupby(rank)
    exchange with the one VALID length filter (|Sb| ≥ τ|Sa|, in exact
    ppm integers) + hot-bucket guard; distinct ordered pairs stay a
    Dataset; verify is the same zero-exchange broadcast-map pass.
    containment_ppm = inter·1e6 // |Sa| (floor), gate
    inter·1e6 ≥ τ·|Sa| — the DuckDB oracle re-derives the FULL ordered
    pair set by brute force."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Count

    vocab = gram_rank_map(ds, text_col=text_col)
    vocab_ref = ray.put(vocab)

    def emit(t: pa.Table) -> pa.Table:
        empty = pa.schema([("rank", pa.int64()), ("doc", pa.int64()),
                           ("sz", pa.int64()),
                           ("probe", pa.int8())]).empty_table()
        d, g = _doc_distinct_grams(t[text_col])
        if len(d) == 0:
            return empty
        vocab_l = cached_get(vocab_ref)
        rr = pc.index_in(g, value_set=vocab_l).to_numpy(
            zero_copy_only=False).astype(np.int64)
        u = np.unique((d.astype(np.int64) << 32) | rr)
        dd = (u >> 32).astype(np.int64)
        rank = (u & 0xFFFFFFFF).astype(np.int64)
        sizes = np.bincount(dd, minlength=t.num_rows).astype(np.int64)
        plen = np.where(sizes > 0,
                        sizes - _ceil_ppm(sizes, tau_ppm) + 1, 0)
        cum = np.concatenate([[0], np.cumsum(sizes)])
        pos = np.arange(len(u), dtype=np.int64) - cum[dd]
        probe = pos < plen[dd]
        doc_ids = t[doc_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "rank": pa.array(np.concatenate([rank, rank[probe]]),
                             pa.int64()),
            "doc": pa.array(np.concatenate(
                [doc_ids[dd], doc_ids[dd[probe]]]), pa.int64()),
            "sz": pa.array(np.concatenate(
                [sizes[dd], sizes[dd[probe]]]), pa.int64()),
            "probe": pa.array(np.concatenate(
                [np.zeros(len(u), np.int8),
                 np.ones(int(probe.sum()), np.int8)]), pa.int8()),
        })

    def bucket_pairs(g: pa.Table) -> pa.Table:
        pm = g["probe"].to_numpy(zero_copy_only=False) == 1
        docs = g["doc"].to_numpy(zero_copy_only=False)
        szs = g["sz"].to_numpy(zero_copy_only=False)
        pa_d, pa_s = docs[pm], szs[pm]
        ix_d, ix_s = docs[~pm], szs[~pm]
        n_pairs = len(pa_d) * len(ix_d)
        if n_pairs > MAX_PREFIX_BUCKET:
            raise ValueError(
                f"containment_join: prefix bucket would emit {n_pairs}"
                f" candidates (> {MAX_PREFIX_BUCKET}) — degenerate hot"
                " token; lower tau or pre-prune the vocabulary")
        ii, jj = np.meshgrid(np.arange(len(pa_d)),
                             np.arange(len(ix_d)), indexing="ij")
        a, b = pa_d[ii.ravel()], ix_d[jj.ravel()]
        sa, sb = pa_s[ii.ravel()], ix_s[jj.ravel()]
        keep = (a != b) & (sb * 1_000_000 >= tau_ppm * sa)
        return pa.table({
            "a": pa.array(a[keep], pa.int64()),
            "b": pa.array(b[keep], pa.int64()),
        })

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def _safe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        return t.select(["a", "b"])

    cand = (ds.map_batches(emit, batch_format="pyarrow")
            .groupby("rank")
            .map_groups(bucket_pairs, batch_format="pyarrow")
            .groupby(["a", "b"])
            .aggregate(Count(alias_name="_c"))
            .map_batches(_safe, batch_format="pyarrow")
            .materialize())

    cand_ids: set[int] = set()
    for block in cand.iter_batches(batch_size=None,
                                   batch_format="pyarrow"):
        cand_ids.update(block["a"].to_pylist())
        cand_ids.update(block["b"].to_pylist())
        if len(cand_ids) > CAND_DOC_LIMIT:
            raise ValueError(
                f"containment_join: > {CAND_DOC_LIMIT} candidate docs"
                " — switch verify to the Dataset lane")
    out_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                            ("containment_ppm", pa.int64())])
    if not cand_ids:
        import pandas as pd

        return out_schema.empty_table().to_pandas()

    ids_arr = pa.array(sorted(cand_ids), pa.int64())

    def set_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t[doc_col], value_set=ids_arr))
        d, g = _doc_distinct_grams(t[text_col])
        vocab_l = cached_get(vocab_ref)
        rr = pc.index_in(g, value_set=vocab_l).to_numpy(
            zero_copy_only=False).astype(np.int64)
        u = np.unique((d.astype(np.int64) << 32) | rr)
        doc_ids = t[doc_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc": pa.array(doc_ids[(u >> 32)], pa.int64()),
            "rank": pa.array(u & 0xFFFFFFFF, pa.int64()),
        })

    sets: dict[int, list[int]] = {}
    total = 0
    for block in ds.map_batches(
            set_rows, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for doc, rank in zip(block["doc"].to_pylist(),
                             block["rank"].to_pylist()):
            sets.setdefault(doc, []).append(rank)
            total += 1
            if total > GATHER_SET_LIMIT:
                raise ValueError("containment_join: gather guard hit —"
                                 " switch verify to the Dataset lane")
    set_map = {k: np.array(sorted(v), np.int64) for k, v in sets.items()}
    map_ref = ray.put(set_map)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return out_schema.empty_table()
        m = cached_get(map_ref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        n = len(a)
        inter = np.zeros(n, np.int64)
        sz_a = np.zeros(n, np.int64)
        for i in range(n):
            s_a, s_b = m[int(a[i])], m[int(b[i])]
            inter[i] = len(np.intersect1d(s_a, s_b, assume_unique=True))
            sz_a[i] = len(s_a)
        keep = inter * 1_000_000 >= tau_ppm * sz_a
        return pa.table({
            "doc_a": pa.array(a[keep], pa.int64()),
            "doc_b": pa.array(b[keep], pa.int64()),
            "containment_ppm": pa.array(
                inter[keep] * 1_000_000 // sz_a[keep], pa.int64()),
        })

    out = cand.map_batches(verify, batch_format="pyarrow").to_pandas()
    return (out.sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True).astype("int64"))
