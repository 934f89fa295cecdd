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

    from ocracle_ray.pipelines.extraction import (
        dup_winner_map,
        extract_records,
        read_pages,
    )
    from ocracle_ray.pipelines.queries import QUERIES
    from ocracle_ray.sources.pages import ensure_pages_parquet, sf_of_dir

    sf = sf_of_dir(SF_DIR)
    bench_only = os.environ.get("GRAFT_BENCH_ONLY")

    results: dict[str, float] = {}

    if bench_only == "dedup":
        # shuffle-bearing dedup pipeline in isolation (VERDICT r2 #8:
        # measure the LSH family's scaling, don't argue it). The
        # documents fixture is REPLICATED with offset doc_ids AND a
        # per-replica bijective rotation of the UPPERCASE-FREE printable
        # alphabet (33..126 minus A-Z, 68 chars) over pre-lowercased
        # text: the pipeline's shingle normalization lowercases, so the
        # rotation must commute with lower() to stay injective — a naive
        # 94-char rotation maps some lowercase letters INTO A-Z at
        # higher shifts, and lower() then merges distinct shingles,
        # inflating within-replica jaccard (measured: pair volume grew
        # 6.69x for a 4x corpus instead of 4x). With the 68-char
        # alphabet each replica keeps the base corpus's EXACT near-dup
        # structure while cross-replica jaccard ~ 0, so total dedup
        # work is LINEAR in REPL (requires REPL <= 68 for distinct
        # shifts; asserted). The previous identical-text replication
        # made every doc a near-dup of its REPL-1 siblings — pair
        # volume grew quadratically (665k pairs at x16, ~90%
        # cross-replica identity pairs), measuring the replication
        # artifact, not the pipeline.
        # Warm run first on a small (x2) corpus: the session's first
        # shuffle pays one-time setup that would otherwise swamp the
        # high-CPU level; session warmup doesn't need the full corpus.
        import pyarrow as _pa
        import pyarrow.parquet as _pq
        import ray.data as _rd

        from ocracle_ray.stages.dedup import minhash_lsh_pairs

        REPL = int(os.environ.get("GRAFT_DEDUP_REPL", "16"))
        # past 68 replicas the pure rotation scheme would repeat, so
        # higher replicas COMPOSE a seeded Fisher-Yates permutation
        # (keyed by r // 68) with the rotation by r % 68. Any bijection
        # of this whitespace-free alphabet preserves tokenization and
        # shingle EQUALITY exactly (normalize_for_fingerprint is only
        # lower + whitespace collapse; the alphabet is lowercase-closed
        # and space maps to itself), so within-replica near-dup
        # structure is byte-for-byte isomorphic to the base corpus for
        # EVERY replica. Cross-replica identity would need the relative
        # permutation between two replicas to fix every char of >=80%
        # of a doc's shingles — rotations pairwise fix NOTHING, and the
        # seeded permutations make it astronomically unlikely; rather
        # than argue, the x2 warm run's pair count feeds an EXACT
        # linearity assert below (pairs_full * 2 == REPL * pairs_warm),
        # which any cross-replica contamination or structure change
        # breaks loudly.
        assert REPL <= 68 * 68, "replica maps repeat past 68*68"
        base = _pq.read_table(
            os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
        )
        base_ids = [int(x) for x in base["doc_id"].to_pylist()]
        # pre-lowercase so the rotation commutes with the pipeline's
        # lower()-normalization (identity on this alphabet's output)
        base_texts = [t.lower() for t in base["text"].to_pylist()]
        alphabet = [c for c in range(33, 127) if not (65 <= c <= 90)]

        def _fy_perm(q: int) -> list[int]:
            # deterministic Fisher-Yates over the alphabet, keyed by q
            # via blake2b (no Python hash salt, no RNG state)
            import hashlib

            idx = list(range(len(alphabet)))
            for i in range(len(idx) - 1, 0, -1):
                h = hashlib.blake2b(
                    f"ocracle-dedup-repl-{q}-{i}".encode(), digest_size=8
                ).digest()
                j = int.from_bytes(h, "big") % (i + 1)
                idx[i], idx[j] = idx[j], idx[i]
            return idx

        def replica(r: int, seen: set) -> "_pa.Table":
            ids = _pa.array([x + r * 100_000_000 for x in base_ids], _pa.int64())
            if r == 0:
                texts = base_texts
            else:
                n = len(alphabet)
                s, q = r % n, r // n
                perm = _fy_perm(q) if q else list(range(n))
                tbl = {
                    c: alphabet[(perm[i] + s) % n]
                    for i, c in enumerate(alphabet)
                }
                key = tuple(sorted(tbl.items()))
                assert key not in seen, f"replica map repeats at r={r}"
                seen.add(key)
                texts = [t.translate(tbl) for t in base_texts]
            return _pa.table({"doc_id": ids, "text": _pa.array(texts, _pa.string())})

        def build_corpus(n_repl: int) -> "_pa.Table":
            seen: set = set()
            return _pa.concat_tables(
                [replica(r, seen) for r in range(n_repl)])

        corpus = build_corpus(REPL)

        # verify dispatch: "auto" (default) is the PRODUCT path — since
        # round 4 the gather lane scores pairs DISTRIBUTED over
        # broadcast object-store texts (the old driver scoring loop,
        # whose serial tail forced this bench onto verify_mode=
        # "distributed", is gone), so auto's dispatch pick for this
        # corpus is what a user measures. GRAFT_DEDUP_VERIFY=
        # distributed pins the two-join shuffle lane — the 100 TB path
        # — which the scaling harness reports as a secondary number
        # (and the weak-scaling legs always use: Gustafson scaling of
        # the SHUFFLE path is the scale-relevant question).
        verify_mode = os.environ.get("GRAFT_DEDUP_VERIFY", "auto")

        def prep(tbl):
            # 4 blocks per CPU: a 2-per-CPU layout left 8 tasks for the
            # low level's 3-actor pool (ragged 2.7-wave schedule with a
            # full-block straggler tail); 4-per-CPU keeps ~5 waves per
            # actor at BOTH scaling levels. MATERIALIZED before the
            # timer (round 4): the from_arrow serialization +
            # repartition split is input prep — a driver-serial cost
            # identical at every CPU level — while at 100 TB the input
            # arrives as object-store/storage blocks; the timed window
            # is the dedup pipeline reading already-distributed blocks.
            # (Pre-written parquet was tried instead and measured 2x
            # slower here: 256 tiny files x multiple consumers.)
            return _rd.from_arrow(tbl).repartition(NUM_CPUS * 4).materialize()

        def run_once(ds):
            return minhash_lsh_pairs(
                ds, "doc_id", "text", threshold=0.8, verify_mode=verify_mode
            )

        warm_repl = min(REPL, 2)
        warm_pairs = run_once(prep(build_corpus(warm_repl)))  # warm
        corpus_ds = prep(corpus)
        t0 = time.perf_counter()
        pairs = run_once(corpus_ds)
        results["docs_minhash_neardup"] = round(time.perf_counter() - t0, 3)
        # pair-volume linearity vs the x2 warm corpus: cross-replica
        # contamination (quadratic blowup) or structure drift fails
        # loudly here. NOT exact — each replica's substitution changes
        # shingle BYTES, so its 128 minhash draws are independent and
        # LSH banding misses each borderline-jaccard pair with a small
        # per-replica probability (measured ~1.7e-4 at sf0.1: 65525 of
        # 65536 at x256; exact verify can't recover a never-banded
        # candidate). Same-corpus determinism stays EXACT and is
        # asserted across CPU levels by --scaling's checksum compare;
        # here only sub-0.1%-and-downward deviation is tolerated.
        expected = REPL * len(warm_pairs) // warm_repl
        deviation = expected - len(pairs)
        assert 0 <= deviation <= max(16, expected // 1000), (
            f"dedup workload not linear: {len(pairs)} pairs at x{REPL} "
            f"vs {len(warm_pairs)} at x{warm_repl} (expected {expected})"
        )
        # deterministic order-free checksum (builtin hash() is
        # PYTHONHASHSEED-randomized across the fresh processes)
        chk = 0
        for a, b, j in zip(pairs["a"], pairs["b"], pairs["jaccard"]):
            chk ^= (int(a) * 1000003 + int(b) * 8191 + int(round(float(j) * 1e6))) & (
                (1 << 63) - 1
            )
        out = {
            "metric": "minhash near-dup wall seconds (second run, warm session)",
            "value": results["docs_minhash_neardup"],
            "unit": "sec",
            "queries": results,
            "sf": sf,
            "num_cpus": NUM_CPUS,
            "dedup_pairs": int(len(pairs)),
            "dedup_pairs_expected_linear": int(expected),
            "dedup_docs": REPL * len(base_ids),
            "dedup_repl": REPL,
            "dedup_checksum": chk,
            "dedup_verify_mode": verify_mode,
            "loadavg_1m": round(os.getloadavg()[0], 1),
        }
        ray.shutdown()
        return out

    pages_dir = ensure_pages_parquet(sf)

    # warm the page cache so we measure compute+shuffle, not first disk read
    read_pages(pages_dir).count()

    # fixed-size actor pool (autoscaling ramp costs ~2x wall at this
    # scale), sized to leave headroom for read + filter tasks
    pool = max(2, NUM_CPUS * 3 // 4)

    if os.environ.get("GRAFT_FLAGSHIP_WARM") == "1":
        # optional warm pass (same protocol as the dedup leg's warm
        # run): drive a small slice through the REAL pipeline so the
        # session's first-execution fixed costs (worker process spinup,
        # per-actor imports, first shuffle) are paid before the timer.
        # A 100 TB job pays these once per cluster, not once per
        # measurement window. A/B-gated by env var; see BASELINE.md.
        w_, amb_ = dup_winner_map(pages_dir)
        extract_records(
            read_pages(pages_dir).limit(1024),
            batch_size=64,
            concurrency=pool,
            dup_winners=w_ if not amb_ else None,
            dedup=True,
        ).count()
    t0 = time.perf_counter()
    winners, ambiguous = dup_winner_map(pages_dir)  # broadcast keep-latest dedup
    recs = extract_records(
        read_pages(pages_dir),
        batch_size=64,
        concurrency=pool,
        # exact-ts ties would need the shuffle path's fingerprint
        # tiebreak; the generator's timestamps are unique per url
        dup_winners=winners if not ambiguous else None,
        dedup=True,
        # skew knob (stages/skew.spread_giants): identical output, only
        # the block layout of giant pages changes — A/B via env var
        spread_giant_pages=os.environ.get("GRAFT_SPREAD_GIANTS") == "1",
    )

    # consume with a per-batch (count, xor-of-fingerprints) projection:
    # one streaming pass yields both the row count and an order-
    # independent output checksum — the byte-identity evidence across
    # parallelism levels (asserted by --scaling).
    import pyarrow as pa

    def summarize(t: pa.Table) -> pa.Table:
        import numpy as np

        fps = t["text_fingerprint"].to_numpy(zero_copy_only=False)
        x = (
            int(np.bitwise_xor.reduce(fps.astype(np.int64).view(np.uint64)).view(np.int64))
            if len(fps)
            else 0
        )
        return pa.table({"n": pa.array([t.num_rows]), "x": pa.array([x])})

    n_docs, checksum = 0, 0
    for b in recs.map_batches(summarize, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        n_docs += sum(b["n"].to_pylist())
        for x in b["x"].to_pylist():
            checksum ^= x
    flagship_sec = time.perf_counter() - t0
    results["extract_flagship"] = round(flagship_sec, 3)

    if os.environ.get("GRAFT_BENCH_ONLY") != "flagship":
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
        "flagship_checksum": checksum,  # XOR of per-record fingerprints
        # co-tenant load on this shared host when the run started —
        # context for run-to-run variance (see BASELINE.md)
        "loadavg_1m": round(os.getloadavg()[0], 1),
    }
    ray.shutdown()
    return out


SCALE_LO = int(os.environ.get("GRAFT_SCALE_LO", "4"))
SCALE_HI = int(os.environ.get("GRAFT_SCALE_HI", "16"))
SCALE_TRIALS = int(os.environ.get("GRAFT_SCALE_TRIALS", "2"))


def run_scaling() -> dict:
    """Fresh-process runs at N and 4N CPUs (north_rule N-vs-4N-node
    evidence; BASELINE.md protocol). Defaults N=4 so that even 4N actors
    plus read/filter tasks stay below the host's 32 logical CPUs —
    beyond ~24 reserved CPUs, system contention (not the pipeline)
    dominates and the measurement stops being about scaling. Min of
    SCALE_TRIALS fresh runs per level to suppress co-tenant noise."""

    def one(ncpu: int, trials: int) -> dict:
        best = None
        for _ in range(trials):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       GRAFT_BENCH_ONLY="flagship")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout
            res = json.loads(out.strip().splitlines()[-1])
            if best is None or res["queries"]["extract_flagship"] < best["queries"]["extract_flagship"]:
                best = res
        return best

    def one_dedup(ncpu: int, trials: int, repl: int,
                  verify: str = "auto") -> dict:
        best = None
        for _ in range(trials):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       GRAFT_BENCH_ONLY="dedup",
                       GRAFT_DEDUP_REPL=str(repl),
                       GRAFT_DEDUP_VERIFY=verify)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout
            res = json.loads(out.strip().splitlines()[-1])
            if best is None or res["value"] < best["value"]:
                best = res
        return best

    # min of SCALE_TRIALS at BOTH levels (round 4: the earlier
    # 1-trial-low protocol let a single slow/fast 4-CPU draw swing the
    # reported efficiency 0.77-0.89 on identical code — min-of-N at
    # both levels estimates the quiet-host time symmetrically)
    lo, hi = one(SCALE_LO, SCALE_TRIALS), one(SCALE_HI, SCALE_TRIALS)
    t_lo = lo["queries"]["extract_flagship"]
    t_hi = hi["queries"]["extract_flagship"]
    eff = (t_lo / t_hi) / (SCALE_HI / SCALE_LO)
    identical = (
        lo["flagship_docs"] == hi["flagship_docs"]
        and lo["flagship_checksum"] == hi["flagship_checksum"]
    )
    # second measured pipeline (VERDICT r2 #8): the shuffle-bearing
    # MinHash-LSH dedup — its all-to-all is the part of the engine the
    # flagship's map-heavy pipeline does not stress.
    #
    # STRONG scaling (same corpus, 4x CPUs): on the small bench corpus
    # this is fixed-cost-dominated — per-session join-aggregator /
    # actor-pool spinup is ~13 s (Amdahl fit across levels, BASELINE.md)
    # while the round-3 optimizations cut the parallel work 3x, so the
    # ratio measures the session floor, not the pipeline. Reported with
    # the larger DEDUP_REPL_STRONG corpus plus the S+W/c fit.
    #
    # WEAK scaling (corpus grows with the CPU ratio — Gustafson): the
    # 100 TB question is "4x the nodes, 4x the data, same wall?", which
    # is exactly t_lo/t_hi here and cancels the fixed session floor a
    # real long-running job amortizes anyway.
    ratio = SCALE_HI // SCALE_LO
    repl_strong = int(os.environ.get("GRAFT_SCALE_DEDUP_REPL", "64"))
    repl_weak_lo = int(os.environ.get("GRAFT_SCALE_DEDUP_REPL_WEAK", "16"))
    # official strong leg: verify_mode=auto — the engine's real
    # dispatch for this corpus (round 4: the broadcast lane's
    # distributed scoring removed the serial gather tail that used to
    # force the join lane here). The join-lane strong number is kept
    # as a SECONDARY metric; the weak legs below always pin the join
    # lane, which is the 100 TB shuffle path.
    dlo = one_dedup(SCALE_LO, SCALE_TRIALS, repl_strong)
    dhi = one_dedup(SCALE_HI, SCALE_TRIALS, repl_strong)
    d_lo, d_hi = dlo["value"], dhi["value"]
    d_eff = (d_lo / d_hi) / (SCALE_HI / SCALE_LO)
    d_identical = (
        dlo["dedup_pairs"] == dhi["dedup_pairs"]
        and dlo["dedup_checksum"] == dhi["dedup_checksum"]
    )
    jlo = one_dedup(SCALE_LO, SCALE_TRIALS, repl_strong, verify="distributed")
    jhi = one_dedup(SCALE_HI, SCALE_TRIALS, repl_strong, verify="distributed")
    j_eff = (jlo["value"] / jhi["value"]) / (SCALE_HI / SCALE_LO)
    j_identical = (
        jlo["dedup_pairs"] == jhi["dedup_pairs"]
        and jlo["dedup_checksum"] == jhi["dedup_checksum"]
        and jlo["dedup_checksum"] == dlo["dedup_checksum"]
    )
    wlo = one_dedup(SCALE_LO, SCALE_TRIALS, repl_weak_lo, verify="distributed")
    whi = one_dedup(SCALE_HI, SCALE_TRIALS, repl_weak_lo * ratio,
                    verify="distributed")
    # throughput-based: (docs/s hi / docs/s lo) / cpu ratio == t_lo/t_hi
    # when the corpus ratio equals the cpu ratio
    w_eff = (whi["dedup_docs"] / whi["value"]) / (
        wlo["dedup_docs"] / wlo["value"]
    ) / ratio
    return {
        # byte-identity across parallelism levels (north_rule invariant):
        # same record count AND same XOR-of-fingerprints checksum
        "identical_outputs_across_levels": identical,
        "metric": f"scaling efficiency, flagship extraction, num_cpus {SCALE_LO} vs {SCALE_HI}",
        f"sec_{SCALE_LO}": t_lo,
        f"sec_{SCALE_HI}": t_hi,
        f"docs_per_sec_{SCALE_LO}": lo["flagship_docs_per_sec"],
        f"docs_per_sec_{SCALE_HI}": hi["flagship_docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "dedup_metric": (
            f"STRONG scaling, minhash near-dup (verify_mode=auto — the "
            f"product dispatch), corpus x{repl_strong}, num_cpus "
            f"{SCALE_LO} vs {SCALE_HI}"
        ),
        f"dedup_sec_{SCALE_LO}": d_lo,
        f"dedup_sec_{SCALE_HI}": d_hi,
        "dedup_scaling_efficiency": round(d_eff, 3),
        "dedup_identical_outputs_across_levels": d_identical,
        "dedup_docs": dlo["dedup_docs"],
        "dedup_join_metric": (
            f"STRONG scaling, minhash near-dup (verify_mode=distributed "
            f"— the forced two-join 100TB lane), corpus x{repl_strong}"
        ),
        f"dedup_join_sec_{SCALE_LO}": jlo["value"],
        f"dedup_join_sec_{SCALE_HI}": jhi["value"],
        "dedup_join_scaling_efficiency": round(j_eff, 3),
        "dedup_join_identical_outputs": j_identical,
        "dedup_weak_metric": (
            f"WEAK scaling (Gustafson), minhash near-dup: corpus "
            f"x{repl_weak_lo}@{SCALE_LO} cpus vs x{repl_weak_lo * ratio}@"
            f"{SCALE_HI} cpus, throughput ratio / cpu ratio"
        ),
        f"dedup_weak_sec_{SCALE_LO}": wlo["value"],
        f"dedup_weak_sec_{SCALE_HI}": whi["value"],
        f"dedup_weak_docs_{SCALE_LO}": wlo["dedup_docs"],
        f"dedup_weak_docs_{SCALE_HI}": whi["dedup_docs"],
        "dedup_weak_scaling_efficiency": round(w_eff, 3),
        # pair volume must scale ~linearly with the corpus (the
        # per-replica char rotation guarantees no cross-replica dups);
        # a quadratic blowup here means the workload is mis-constructed
        "dedup_weak_pairs_ratio": round(
            whi["dedup_pairs"] / max(1, wlo["dedup_pairs"]), 2
        ),
        "sf": lo["sf"],
        "trials_per_level": SCALE_TRIALS,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
