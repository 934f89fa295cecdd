"""Actor-pool sizing from the live session's CPU budget.

Fixed-size pools beat autoscaling here (measured: the ramp alone cost
2x wall at sf0.1 — CLAUDE.md), but a FIXED constant like
``concurrency=2`` silently caps a compute-heavy stage at 2 CPUs no
matter the cluster: the round-3 dedup scaling measurement found the
MinHash banding pool pinned at 2 actors while 16 CPUs idled. This
helper picks the pool size from the session's actual CPU count,
leaving headroom for read/shuffle tasks (the same 3/4 rule bench.py
uses for the flagship pool).

Never calls ``ray.init`` (sessions are owned by bench/tests/CLI —
CLAUDE.md invariant); outside a Ray session it falls back to
``os.cpu_count`` so pure-driver callers still get a sane number.
"""

from __future__ import annotations

import os


def default_pool_size(frac: float = 0.75, lo: int = 2, hi: int | None = None) -> int:
    """Pool size = ``frac`` of the session's CPUs, clamped to
    [``lo``, ``hi``]; ``hi=None`` means uncapped (scale with the
    cluster)."""
    cpus = 0
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:  # pragma: no cover — ray import/cluster hiccup
        cpus = 0
    if cpus <= 0:
        cpus = os.cpu_count() or 4
    size = max(lo, int(cpus * frac))
    return min(size, hi) if hi is not None else size
