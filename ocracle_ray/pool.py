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
from contextlib import contextmanager


def session_cpus() -> int:
    """The live session's CPU count (``os.cpu_count`` fallback outside
    a Ray session)."""
    cpus = 0
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:  # pragma: no cover — ray import/cluster hiccup
        cpus = 0
    if cpus <= 0:
        cpus = os.cpu_count() or 4
    return cpus


def default_pool_size(frac: float = 0.75, lo: int = 2, hi: int | None = None) -> int:
    """Pool size = ``frac`` of the session's CPUs, clamped to
    [``lo``, ``hi``]; ``hi=None`` means uncapped (scale with the
    cluster)."""
    size = max(lo, int(session_cpus() * frac))
    return min(size, hi) if hi is not None else size


def clamp_join_partitions(desired: int, *, n_joins: int = 1, floor: int = 8) -> int:
    """Cap a hash-join partition count to the session's CPU budget.

    Ray Data's ``Dataset.join`` spawns one aggregator actor pool that
    reserves 0.125 CPU per partition; a DAG with ``n_joins`` joins of
    ``n`` partitions each reserves ``0.125 * n * n_joins`` CPUs for
    the whole run. If that reservation eats most of a small session,
    the upstream map tasks feeding the joins can never schedule and
    the pipeline LIVELOCKS (reproduced round 3: two chained 13-way
    joins on a 4-CPU session — 3.25 CPUs reserved — hung forever,
    while 8-way joins, 2.0 CPUs, ran fine). Keep the reservation at or
    below half the session: ``0.125 * n * n_joins <= cpus / 2`` gives
    ``n <= 4 * cpus / n_joins``. The floor preserves the documented
    per-partition memory targets on sessions big enough to afford it.
    """
    cap = max(floor, (4 * session_cpus()) // max(1, n_joins))
    return min(desired, cap)


def _join_cpus_per_partition(n_parts: int, n_joins: int = 1) -> float:
    """Per-partition CPU reservation so ``n_joins`` joins of
    ``n_parts`` partitions reserve <= session_cpus/2 in total,
    leaving the other half for the map tasks that FEED the joins
    (reservation >= session CPUs livelocks — reproduced round 3 on a
    4-CPU session with two chained 13-way joins)."""
    return min(0.125, (session_cpus() / 2) / max(1, n_parts * n_joins))


@contextmanager
def join_cpu_reservation_guard(n_parts: int, n_joins: int = 1):
    """Scope in which hash-join aggregator actors reserve at most half
    the session's CPUs in total.

    Partition COUNT must be sized by data (per-partition heap is what
    breaks at scale), so it should not shrink on small sessions; the
    thing that must adapt to the session is the aggregators' CPU
    reservation. This guard lowers Ray's 0.125-CPU-per-partition
    default via ``DataContext.join_operator_actor_num_cpus_per_
    partition_override``.

    SCOPE SEMANTICS (measured on ray 2.49.2): the planner reads the
    EXECUTING dataset's snapshotted DataContext for the whole DAG.
    That snapshot is copied from the global context when a ROOT
    dataset (``read_*`` / ``from_*``) is created; derived datasets
    (map_batches, join, select_columns) SHARE their left parent's
    context object, while ``union`` takes a fresh copy. So the guard
    works when the executing dataset's root is created inside the
    ``with`` block (the dedup verify path: ``from_arrow`` in-scope);
    for a lazily-returned dataset whose roots the caller built, use
    :func:`pin_join_cpu_reservation` on the final dataset instead."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    old = ctx.join_operator_actor_num_cpus_per_partition_override
    ctx.join_operator_actor_num_cpus_per_partition_override = (
        _join_cpus_per_partition(n_parts, n_joins)
    )
    try:
        yield
    finally:
        ctx.join_operator_actor_num_cpus_per_partition_override = old


def pin_join_cpu_reservation(ds, n_parts: int, n_joins: int = 1):
    """Pin the join-aggregator CPU cap onto ``ds`` itself, so the cap
    holds whenever the caller executes it — no ``with`` scope needed.

    Gives ``ds`` a PRIVATE DataContext copy (deepcopy of its current
    snapshot) with ``join_operator_actor_num_cpus_per_partition_
    override`` set per :func:`_join_cpus_per_partition`, and swaps it
    into both plans. The copy is what makes this safe: a derived
    dataset's context object is shared with its ancestors (ray
    2.49.2), so mutating in place would leak the override into every
    other pipeline built from the same root. Uses the private
    ``_plan._context`` / ``_logical_plan._context`` fields — pinned to
    the vendored ray version and covered by a no-leak test."""
    import copy

    ctx = copy.deepcopy(ds._plan._context)
    ctx.join_operator_actor_num_cpus_per_partition_override = (
        _join_cpus_per_partition(n_parts, n_joins)
    )
    ds._plan._context = ctx
    ds._logical_plan._context = ctx
    return ds
