"""Every queries() entry with an oracle must match DuckDB on sf0.001.

This mirrors the driver's correctness gate (row-count + sorted-column
value comparison) so mismatches surface in pytest before the driver
runs at sf0.01.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(4)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


ORACLED = sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, con):
    ray_df = _canon(_to_pandas(entrymod.queries()[name](SF_DIR)))
    sql_df = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert len(ray_df) == len(sql_df), f"{name}: row count {len(ray_df)} != {len(sql_df)}"
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(sql_df.columns)}"
    )
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, atol=1e-6)


def test_entry_smoke():
    res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert "extracted_text" in df.columns


def test_flagship_deterministic():
    """Round 4: extract_flagship is oracled against its written
    artifact (per-group invariants incl. fingerprint XOR); the
    determinism contract moves to the group summary."""
    df = _to_pandas(entrymod.queries()["extract_flagship"](SF_DIR))
    assert len(df) > 0
    df2 = _to_pandas(entrymod.queries()["extract_flagship"](SF_DIR))
    pd.testing.assert_frame_equal(df, df2)
    assert sorted(df["fp_xor"]) == sorted(df2["fp_xor"])


ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()) - {"extract_flagship"})


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run_and_determine(name):
    """Every rows-only entry must at least run, return rows, and be
    deterministic across executions (the driver's weaker check)."""
    q = entrymod.queries()[name]
    a = _to_pandas(q(SF_DIR))
    b = _to_pandas(q(SF_DIR))
    assert len(a) > 0
    pd.testing.assert_frame_equal(
        a.sort_values(list(a.columns)).reset_index(drop=True),
        b.sort_values(list(b.columns)).reset_index(drop=True),
    )
