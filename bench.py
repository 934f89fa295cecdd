"""Benchmark harness — prints ONE JSON line with the headline metric.

Default: run the flagship extraction pipeline + headline queries over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32).

``--scaling``: run the headline pipeline twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input and report throughput at
both plus scaling efficiency — the in-sandbox evidence for the
north_rule's N vs 4N cluster criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Headline queries benchmarked per round (subset: one per operator family).
BENCH_QUERIES = (
    "pricing_summary",
    "mktsegment_revenue",
    "top_orders_by_revenue",
    "events_hourly",
    "events_sessions",
    "docs_exact_dedup",
    "docs_token_stats",
    "knn_bruteforce",
)


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from ocracle_ray.pipelines.extraction import extract_records, read_pages
    from ocracle_ray.pipelines.queries import QUERIES
    from ocracle_ray.sources.pages import ensure_pages_parquet, sf_of_dir

    sf = sf_of_dir(SF_DIR)
    pages_dir = ensure_pages_parquet(sf)

    # warm the page cache so we measure compute+shuffle, not first disk read
    read_pages(pages_dir).count()

    results: dict[str, float] = {}

    t0 = time.perf_counter()
    recs = extract_records(
        read_pages(pages_dir),
        batch_size=64,
        concurrency=(2, max(2, NUM_CPUS // 2)),
    )
    n_docs = recs.count()
    flagship_sec = time.perf_counter() - t0
    results["extract_flagship"] = round(flagship_sec, 3)

    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        res = QUERIES[name](SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        results[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(results.values()), 3)
    out = {
        "metric": "docs/sec end-to-end extraction throughput (flagship) + headline query secs",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "flagship_docs": int(n_docs),
        "flagship_docs_per_sec": round(n_docs / flagship_sec, 2),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """Fresh-process runs at 8 and 32 CPUs (north_rule N vs 4N evidence)."""

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = one(8), one(32)
    t_lo = lo["queries"]["extract_flagship"]
    t_hi = hi["queries"]["extract_flagship"]
    eff = (t_lo / t_hi) / (32 / 8)
    return {
        "metric": "scaling efficiency, flagship extraction, num_cpus 8 vs 32",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "docs_per_sec_8": lo["flagship_docs_per_sec"],
        "docs_per_sec_32": hi["flagship_docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
