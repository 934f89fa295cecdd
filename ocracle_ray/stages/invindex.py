"""Disk-backed inverted index — build a term -> doc posting store as
hive-partitioned parquet (bucketed by term hash) and answer conjunctive
term queries by reading ONLY the buckets the query terms hash to (the
stages/knn.py IVF pruned-read pattern, applied to text search).

Build shape: one streaming pass — per-batch DISTINCT (term, doc_id)
pairs via an in-batch Arrow ``group_by`` (the combiner: a term
repeated in a doc emits ONE posting), a crc32 bucket column, then
``write_parquet(partition_cols=['bucket'])``. No shuffle: parquet
partitioning fans rows into bucket directories per block; a bucket
directory holds many files, which is exactly how a 256-node build
lands (resumable, appendable per input shard).

Query shape: a k-term AND reads <= k of ``n_buckets`` directories,
filters to the query terms (``pc.is_in``) and keeps docs whose
distinct-term count equals k — a groupby over postings of the query
terms only, never over the corpus.

Tokenization is the shared stages/bm25.py rule; the DuckDB oracle for
the driver query re-answers the conjunctive query over the RAW
documents table, so the index build + pruned read are verified
end-to-end against first principles.
"""

from __future__ import annotations

import json
import os
import shutil
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .ngram_lm import _doc_token_stream

N_BUCKETS = 16
_MARKER = "_INV_INDEX.json"


def term_bucket(term: str, n_buckets: int = N_BUCKETS) -> int:
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def build_inverted_index(ds, index_dir: str, *, text_col: str = "text",
                         id_col: str = "doc_id",
                         n_buckets: int = N_BUCKETS) -> str:
    """One streaming pass -> ``index_dir/bucket=N/*.parquet`` posting
    files plus a marker. Refuses to clobber a non-index directory
    (the IVF marker rule)."""
    marker = os.path.join(index_dir, _MARKER)
    if os.path.isdir(index_dir) and os.listdir(index_dir):
        if not os.path.exists(marker):
            raise ValueError(
                f"index_dir {index_dir!r} is a non-empty directory "
                "without an _INV_INDEX.json marker; refusing to delete "
                "it. Point index_dir at a fresh path."
            )
        shutil.rmtree(index_dir)

    def postings(t: pa.Table) -> pa.Table:
        parents, _prev, tok = _doc_token_stream(t[text_col])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        pairs = pa.table(
            {
                "term": tok,
                "doc_id": pa.array(ids[parents], pa.int64()),
            }
        ).group_by(["term", "doc_id"]).aggregate([])
        uniq = pairs["term"].to_pylist()
        bucket = np.fromiter(
            (term_bucket(w, n_buckets) for w in uniq),
            np.int32, count=len(uniq),
        )
        return pairs.append_column("bucket", pa.array(bucket, pa.int32()))

    ds.map_batches(postings, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"]
    )
    with open(marker, "w") as f:
        json.dump({"n_buckets": n_buckets, "id_col": id_col}, f)
    return index_dir


def query_index_and(index_dir: str, terms: list[str]) -> pd.DataFrame:
    """Conjunctive (AND) term query answered FROM the index files:
    reads only the <= len(terms) bucket directories the terms hash to.
    Returns ``(doc_id,)`` rows sorted ascending."""
    import ray.data as rd

    marker = os.path.join(index_dir, _MARKER)
    with open(marker) as f:
        meta = json.load(f)
    n_buckets = int(meta["n_buckets"])
    terms = sorted(set(terms))
    if not terms:
        raise ValueError("query_index_and: need at least one term")
    import glob as _glob

    files = sorted(
        f
        for b in {term_bucket(w, n_buckets) for w in terms}
        for f in _glob.glob(
            os.path.join(index_dir, f"bucket={b}", "*.parquet")
        )
    )
    if not files:  # none of the terms' buckets exist -> no matches
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    value_set = pa.array(terms, pa.string())
    k = len(terms)

    def narrow(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["term"], value_set=value_set)
        f = t.filter(keep)
        return pa.table({"doc_id": f["doc_id"]})

    hits = (
        rd.read_parquet(files, columns=["term", "doc_id"])
        .map_batches(narrow, batch_format="pyarrow")
        .groupby("doc_id")
        .count()
    )

    _empty = pa.schema([("doc_id", pa.int64())]).empty_table()

    def conj(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty aggregate blocks lose the schema
            return _empty
        f = t.filter(pc.equal(t["count()"], k))
        return pa.table({"doc_id": f["doc_id"]})

    out = hits.map_batches(conj, batch_format="pyarrow").to_pandas()
    if "doc_id" not in out.columns:  # zero matching postings anywhere
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True).astype("int64")


_POS_MARKER = "_POS_INDEX.json"


def build_positional_index(ds, index_dir: str, *,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           n_buckets: int = N_BUCKETS) -> str:
    """Positional sibling of ``build_inverted_index``: postings are
    (term, doc_id, pos) with pos = the token's 1-based offset among
    the doc's non-empty tokens (the shared tokenization rule), so
    PHRASE queries resolve by position adjacency instead of a
    re-scan — the Lucene positional-index model. Same bucket layout,
    same one-pass no-shuffle build; postings are raw occurrences
    (every position is a row), no dedup needed or wanted."""
    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    marker = os.path.join(index_dir, _POS_MARKER)

    def postings(t: pa.Table) -> pa.Table:
        parents, _prev, tok = _doc_token_stream(t[text_col])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = len(parents)
        if n == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32())})
        firsts = np.flatnonzero(
            np.concatenate(([True], parents[1:] != parents[:-1])))
        start_of = np.repeat(firsts,
                             np.diff(np.append(firsts, n)))
        pos = np.arange(n, dtype=np.int64) - start_of + 1
        terms = tok.to_pylist()
        bucket = np.fromiter(
            (term_bucket(w, n_buckets) for w in terms),
            np.int32, count=n)
        return pa.table({
            "term": tok,
            "doc_id": pa.array(ids[parents], pa.int64()),
            "pos": pa.array(pos),
            "bucket": pa.array(bucket, pa.int32()),
        })

    ds.map_batches(postings, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"]
    )
    with open(marker, "w") as f:
        json.dump({"n_buckets": n_buckets, "id_col": id_col}, f)
    return index_dir


def query_index_phrase(index_dir: str, phrase: list[str]) -> pd.DataFrame:
    """Exact phrase query FROM the positional index: reads ONLY the
    buckets the phrase terms hash to, then intersects position sets
    shifted by each term's offset (a match at p means term_i sits at
    p+i for every i). Returns (doc_id, n_matches) for matching docs."""
    marker = os.path.join(index_dir, _POS_MARKER)
    with open(marker) as f:
        meta = json.load(f)
    n_buckets = int(meta["n_buckets"])
    if not phrase:
        raise ValueError("query_index_phrase: empty phrase")
    import glob as _glob

    import ray.data as rd

    files = sorted(
        f
        for b in {term_bucket(w, n_buckets) for w in phrase}
        for f in _glob.glob(
            os.path.join(index_dir, f"bucket={b}", "*.parquet"))
    )
    if not files:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_matches": pd.Series(dtype="int64")})
    value_set = pa.array(sorted(set(phrase)), pa.string())

    def narrow(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["term"], value_set=value_set)) \
                .select(["term", "doc_id", "pos"])

    post = (rd.read_parquet(files, columns=["term", "doc_id", "pos"])
            .map_batches(narrow, batch_format="pyarrow").to_pandas())
    # anchor-position sets per phrase offset, intersected
    cur = None
    for i, w in enumerate(phrase):
        pw = post[post["term"] == w]
        anchors = set(zip(pw["doc_id"].astype(int),
                          (pw["pos"].astype(int) - i)))
        cur = anchors if cur is None else (cur & anchors)
    if not cur:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_matches": pd.Series(dtype="int64")})
    df = pd.DataFrame(sorted(cur), columns=["doc_id", "p"])
    out = (df.groupby("doc_id", as_index=False).size()
           .rename(columns={"size": "n_matches"}))
    return out.astype("int64").sort_values("doc_id").reset_index(
        drop=True)
