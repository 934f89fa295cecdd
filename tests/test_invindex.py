"""Inverted index (stages/invindex.py): build/query correctness vs a
Python reference, the pruned-read guarantee (unneeded buckets are
never opened), marker safety, and empty-result edges."""

import os

import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages import invindex

DOCS = [
    (0, "alpha beta gamma"),
    (1, "alpha beta beta alpha"),     # duplicates collapse to postings
    (2, "beta gamma delta"),
    (3, "alpha delta"),
    (4, "omega"),
    (5, "??? !!!"),                   # zero tokens
]


def _ds():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
        "text": pa.array([d[1] for d in DOCS], pa.string()),
    }))


def _ref_and(terms):
    out = []
    for did, text in DOCS:
        toks = set(text.lower().split())
        if all(t in toks for t in terms):
            out.append(did)
    return out


def test_build_and_conjunctive_queries(tmp_path, ray_session):
    idx = invindex.build_inverted_index(_ds(), str(tmp_path / "idx"))
    for terms in (["alpha"], ["alpha", "beta"], ["beta", "gamma"],
                  ["alpha", "omega"], ["nosuchterm"]):
        got = invindex.query_index_and(idx, terms)["doc_id"].tolist()
        assert got == _ref_and(terms), terms


def test_pruned_read_never_touches_other_buckets(tmp_path, ray_session):
    """Corrupt every bucket the query terms do NOT hash to; the lookup
    must still succeed — proof the read is pruned, not filtered."""
    idx = invindex.build_inverted_index(_ds(), str(tmp_path / "idx"))
    needed = {invindex.term_bucket(t) for t in ("alpha", "beta")}
    for b in range(invindex.N_BUCKETS):
        d = os.path.join(idx, f"bucket={b}")
        if b not in needed and os.path.isdir(d):
            for f in os.listdir(d):
                with open(os.path.join(d, f), "wb") as fh:
                    fh.write(b"NOT A PARQUET FILE")
    got = invindex.query_index_and(idx, ["alpha", "beta"])
    assert got["doc_id"].tolist() == _ref_and(["alpha", "beta"])


def test_rebuild_replaces_and_marker_protects(tmp_path, ray_session):
    idx = invindex.build_inverted_index(_ds(), str(tmp_path / "idx"))
    # rebuild must not double postings
    invindex.build_inverted_index(_ds(), idx)
    got = invindex.query_index_and(idx, ["alpha"])
    assert got["doc_id"].tolist() == _ref_and(["alpha"])
    # refuse to clobber a non-index directory
    other = tmp_path / "notindex"
    other.mkdir()
    (other / "data.txt").write_text("precious")
    with pytest.raises(ValueError, match="marker"):
        invindex.build_inverted_index(_ds(), str(other))


def test_empty_inputs(tmp_path, ray_session):
    idx = invindex.build_inverted_index(_ds(), str(tmp_path / "idx"))
    with pytest.raises(ValueError, match="at least one term"):
        invindex.query_index_and(idx, [])
