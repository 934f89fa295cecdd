"""CLI entry point: resumable extraction job over pages parquet.

    python -m ocracle_ray --input '/data/pages/*.parquet' --out /data/records
    python -m ocracle_ray --input ... --out ... --compact     # cross-shard dedup
    python -m ocracle_ray --demo /tmp/ocracle_demo            # self-contained demo

This is the ONE place in the package allowed to own a Ray session
(guarded — the driver/bench/tests own their own)."""

from __future__ import annotations

import argparse
import glob
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ocracle_ray")
    ap.add_argument("--input", help="glob of pages parquet files")
    ap.add_argument("--out", help="output directory (records + manifests)")
    ap.add_argument("--files-per-partition", type=int, default=1)
    ap.add_argument("--max-concurrent", type=int, default=4,
                    help="partitions in flight at once (clamped to the "
                         "CPU budget; 1 = strictly sequential)")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--compact", action="store_true",
                    help="run cross-partition keep-latest dedup after the job")
    ap.add_argument("--compact-mode", choices=["local", "distributed"],
                    default="local",
                    help="local: driver-dict scan (guarded by COMPACT_URL_LIMIT); "
                         "distributed: key-only shuffle + per-partition loser lists")
    ap.add_argument("--demo", metavar="DIR",
                    help="generate a small synthetic pages corpus under DIR "
                         "and run the job against it")
    ap.add_argument("--query", metavar="NAME",
                    help="run one registry query against --sf-dir and "
                         "print its result as JSON")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="table directory for --query")
    ap.add_argument("--list-queries", action="store_true",
                    help="print the registry query names and exit")
    args = ap.parse_args(argv)

    if args.list_queries:
        from .pipelines.queries import QUERIES

        for name in QUERIES:
            print(name)
        return 0

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    try:
        if args.query:
            from .pipelines.queries import QUERIES

            if args.query not in QUERIES:
                print(f"unknown query {args.query!r} "
                      f"(see --list-queries)", file=sys.stderr)
                return 2
            res = QUERIES[args.query](args.sf_dir)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            print(json.dumps({
                "query": args.query,
                "sf_dir": args.sf_dir,
                "rows": len(df),
                "result": json.loads(
                    df.head(1000).to_json(orient="records")),
            }))
            return 0
        if args.demo:
            import os

            import pyarrow.parquet as pq

            from .sources.pages import pages_table

            in_dir = os.path.join(args.demo, "pages")
            out_dir = args.out or os.path.join(args.demo, "records")
            os.makedirs(in_dir, exist_ok=True)
            for s in range(4):
                pq.write_table(pages_table(s * 100, 100),
                               os.path.join(in_dir, f"shard-{s:02d}.parquet"))
            files = sorted(glob.glob(os.path.join(in_dir, "*.parquet")))
        else:
            if not args.input or not args.out:
                ap.error("--input and --out are required (or use --demo)")
            files = sorted(glob.glob(args.input))
            if not files:
                print(f"no input files match {args.input}", file=sys.stderr)
                return 2
            out_dir = args.out

        from .pipelines.manifest import compact, compact_distributed, run_partitioned

        summary = run_partitioned(
            files,
            out_dir,
            files_per_partition=args.files_per_partition,
            max_concurrent=args.max_concurrent,
            batch_size=args.batch_size,
            concurrency=args.concurrency,
        )
        result = {
            "out_dir": out_dir,
            "partitions": summary["partitions"],
            "ran": summary["ran"],
            "skipped": summary["skipped"],
            **summary["totals"],
        }
        if args.compact:
            fn = compact_distributed if args.compact_mode == "distributed" else compact
            result["compact"] = fn(out_dir)
        print(json.dumps(result))
        return 0
    finally:
        if owns_session:  # never tear down a caller-owned session
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
