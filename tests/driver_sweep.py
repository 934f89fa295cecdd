"""Driver-emulation sweep: run queries() vs oracle_sql() at sf0.01.

Mirrors the harness driver's correctness gate (row count + sorted-column
canonical value compare) in one process. Usage:

    python tests/driver_sweep.py                 # the driver head (first 50)
    python tests/driver_sweep.py name1 name2 ... # specific queries
    python tests/driver_sweep.py --all           # entire registry
    SWEEP_SF_DIR=/root/testdata/sf0.001 python tests/driver_sweep.py ...

Prints one line per query and a trailing summary; exit code 1 on any
mismatch. Owns its Ray session (scripts may init per CLAUDE.md).
"""

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


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


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if "--all" in sys.argv:
        names = list(qs)
    elif args:
        names = args
    else:
        names = list(qs)[:50]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    failures = []
    for name in names:
        t0 = time.time()
        try:
            ray_df = _canon(_to_pandas(qs[name](SF_DIR)))
            if name in osql:
                sql_df = _canon(con.sql(osql[name]).df())
                assert len(ray_df) == len(sql_df), (
                    f"rows {len(ray_df)} != {len(sql_df)}"
                )
                assert list(ray_df.columns) == list(sql_df.columns), (
                    f"cols {list(ray_df.columns)} != {list(sql_df.columns)}"
                )
                pd.testing.assert_frame_equal(
                    ray_df, sql_df, check_dtype=False, atol=1e-6
                )
                status = "ok"
            else:
                assert len(ray_df) > 0
                status = "rows-only ok"
        except Exception as e:  # noqa: BLE001 - report and continue
            status = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
            failures.append(name)
        print(f"{name:36s} {time.time() - t0:7.1f}s  {status}", flush=True)

    print(f"\n{len(names) - len(failures)}/{len(names)} green", flush=True)
    if failures:
        print("failures:", failures)
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
