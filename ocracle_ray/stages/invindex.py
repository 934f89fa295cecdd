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
