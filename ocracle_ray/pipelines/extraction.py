"""The flagship extraction pipeline: pages -> records.

    read_parquet(pages)                         # column-pruned at the read
      -> map_batches(Extract, pyarrow, actors)  # tokenize/classify/segment
      -> groupby(url).map_groups(keep_latest)   # exact dedup (only shuffle)
      -> write_parquet(out) + manifest          # resumable partitioned sink

Partitioning key is ``url`` throughout (SURVEY.md §4): all per-document
logic is url-local, so the whole extraction is one shuffle-free
map chain; the single all-to-all is the keep-latest dedup over already-
extracted records (html payloads never shuffle).
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa

from ..stages.extract import Extract, decode_tasks, dedup_keep_latest_records

PAGES_COLUMNS = ["url", "warc_ts", "html", "lang"]  # prune: `text` unused


def read_pages(paths: str | Sequence[str], **kwargs):
    """Column-pruned pages read (never load columns the pipeline ignores)."""
    import ray.data as rd

    return rd.read_parquet(paths, columns=PAGES_COLUMNS, **kwargs)


def dup_winner_map(paths, limit: int | None = None) -> tuple[dict | None, set | None]:
    """Winner timestamps for DUPLICATED urls only, from a column-pruned
    key read (url, warc_ts — the html payload never leaves storage).

    Each block emits a partial (url, max_ts, count) aggregate; the
    driver streams the partials and merges them (NOT a distributed
    groupby: at bench scale the groupby's fixed shuffle latency swamped
    the whole job, and broadcast-mode dedup already presumes the url
    population of a partition fits driver memory).

    ``limit`` is the driver-memory guard, enforced twice (VERDICT r2
    #7): a KMV distinct-url ESTIMATE from a url-only pre-pass skips
    straight to the shuffle path when the corpus is obviously too
    distinct — the driver then never streams a single partial — and
    the per-step stream-abort inside the merge loop remains the exact
    backstop for estimates near the boundary (KMV error ~0.4% at
    k=65536). A 10^10-url corpus costs one key-column scan + O(k)
    driver memory, not O(distinct urls) of merge-loop CPU."""
    import ray.data as rd

    if limit is not None:
        from ..core.sketch import kmv_distinct_estimate

        est = kmv_distinct_estimate(
            rd.read_parquet(paths, columns=["url"]), "url", k=65536
        )
        # 1.05 head-room: a slight KMV over-estimate near the boundary
        # must not force the shuffle path when broadcast would fit —
        # the in-loop abort still catches true overshoot exactly
        if est > limit * 1.05:
            return None, None

    keys = rd.read_parquet(paths, columns=["url", "warc_ts"])

    import pyarrow.compute as _pc

    _EPOCH0 = pa.scalar(0, pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        # pyarrow group_by (C-speed; the pandas version cost ~3-4 s of
        # the flagship wall at sf0.1). Null warc_ts is defined as epoch
        # 0 (always-loser) so count/max/tie logic never sees nulls —
        # keep_winners applies the same fill (review finding: the
        # rewrite had dropped the pandas null path).
        t = t.set_column(
            t.column_names.index("warc_ts"),
            "warc_ts",
            _pc.fill_null(t["warc_ts"], _EPOCH0),
        )
        g = t.group_by("url").aggregate([("warc_ts", "max"), ("warc_ts", "count")])
        # select by GENERATED name (aggregate column order varies across
        # pyarrow versions), then rename positionally on that order
        g = g.select(["url", "warc_ts_max", "warc_ts_count"]).rename_columns(
            ["url", "max_ts", "cnt"]
        )
        joined = t.join(g.select(["url", "max_ts"]), keys="url")
        at_max = joined.filter(_pc.equal(joined["warc_ts"], joined["max_ts"]))
        ties = at_max.group_by("url").aggregate([("warc_ts", "count")])
        ties = ties.select(["url", "warc_ts_count"]).rename_columns(["url", "max_ts_n"])
        return g.join(ties, keys="url")

    merged = _stream_merge_partials(
        keys.map_batches(partial, batch_format="pyarrow"), limit
    )
    if merged is None:
        return None, None
    winners = {u: ts for u, (ts, cnt, _) in merged.items() if cnt > 1}
    # urls whose winning timestamp occurs MORE THAN ONCE cannot be
    # resolved by a (url, ts) filter — the shuffle path's fingerprint
    # tiebreak is needed for them (see extract_records_from_paths)
    ambiguous = {u for u, (_, cnt, ts_n) in merged.items() if cnt > 1 and ts_n > 1}
    return winners, ambiguous


def _stream_merge_partials(partials_ds, limit: int | None) -> dict | None:
    """Driver-side fold of (url, max_ts, cnt, max_ts_n) partials;
    returns None on stream-abort (dict crossed ``limit``). Split out so
    tests can assert the KMV pre-check keeps high-cardinality inputs
    from ever entering this loop."""
    merged: dict = {}  # url -> (max_ts, total_cnt, max_ts_multiplicity)
    for batch in partials_ds.iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        if limit is not None and len(merged) > limit:
            return None  # stream-abort: caller takes the shuffle path
        for url, ts, cnt, ts_n in zip(
            batch["url"].to_pylist(),
            batch["max_ts"].to_pylist(),
            batch["cnt"].to_pylist(),
            batch["max_ts_n"].to_pylist(),
        ):
            prev = merged.get(url)
            if prev is None:
                merged[url] = (ts, cnt, ts_n)
            elif ts > prev[0]:
                merged[url] = (ts, prev[1] + cnt, ts_n)
            elif ts == prev[0]:
                merged[url] = (ts, prev[1] + cnt, prev[2] + ts_n)
            else:
                merged[url] = (prev[0], prev[1] + cnt, prev[2])
    if limit is not None and len(merged) > limit:
        return None
    return merged


DUP_BROADCAST_LIMIT = 5_000_000  # winner-map entries; beyond this, shuffle


def extract_records(
    pages_ds,
    *,
    batch_size: int = 64,
    concurrency=(2, 8),
    dedup: bool = True,
    dup_winners: dict | None = None,
    ignored_topics=frozenset(),
    translate_nn: bool = False,
    spread_giant_pages: bool = False,
):
    """pages Dataset -> records Dataset (lazy; caller consumes/streams).

    ``ignored_topics`` (M19) and ``translate_nn`` (M15) reach
    ``extract_document`` through the Extract actor constructor.

    ``spread_giant_pages`` routes >64KiB pages through
    ``stages.skew.spread_giants`` (one giant per block) so they
    interleave with cheap rows instead of convoying a giant-heavy
    block through one actor. Output is identical either way (the
    pipeline is order-independent); it is a scheduling knob only.

    Dedup modes (G4 keep-latest, ``object_handling.py:230-239``):

    - ``dup_winners`` given (broadcast mode): the winner map rides the
      object store once; a vectorized filter keeps a row iff its url is
      unconflicted or its warc_ts IS the winner. NO record shuffle.
    - otherwise (shuffle mode): block-level combiner + bucketed
      ``groupby`` keep-latest (`dedup_keep_latest_records`) — exact at
      any scale and any dup distribution.
    """
    if spread_giant_pages:
        from ..stages.skew import spread_giants

        pages_ds = spread_giants(pages_ds)
    records = pages_ds.map_batches(
        Extract,
        fn_constructor_kwargs=dict(
            ignored_topics=ignored_topics, translate_nn=translate_nn
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    if dedup and dup_winners is not None:
        import ray

        # ship the dict AND its url set as an Arrow array once: the hot
        # filter is then a C-speed pc.is_in; the Python dict lookup runs
        # only over the (rare) conflicted rows
        winners_ref = ray.put(
            (dup_winners, pa.array(list(dup_winners), pa.string()))
        )

        import numpy as np
        import pyarrow.compute as _pc

        from ..broadcast import cached_get

        _EPOCH0 = pa.scalar(0, pa.timestamp("us"))

        def keep_winners(t: pa.Table) -> pa.Table:
            winners, winner_urls = cached_get(winners_ref)
            if not winners:
                return t
            conflicted = _pc.is_in(t["url"], value_set=winner_urls)
            idx = np.flatnonzero(conflicted.to_numpy(zero_copy_only=False))
            if idx.size == 0:
                return t
            take = pa.array(idx)
            urls = t["url"].take(take).to_pylist()
            ts = _pc.fill_null(
                _pc.cast(t["warc_ts"].take(take), pa.timestamp("us")), _EPOCH0
            ).to_pylist()
            keep = np.ones(t.num_rows, dtype=bool)
            for i, u, x in zip(idx, urls, ts):
                keep[i] = winners[u] == x
            return t.filter(pa.array(keep))

        records = records.map_batches(keep_winners, batch_format="pyarrow")
    elif dedup:
        records = dedup_keep_latest_records(records)
    # restore the nested tasks column AFTER the shuffle (winners only)
    return records.map_batches(decode_tasks, batch_format="pyarrow")


def extract_records_from_paths(paths, **kwargs):
    """read + auto-dedup: broadcast mode when the winner map is small
    AND unambiguous; full shuffle otherwise.

    Ambiguous = some url's winning warc_ts occurs twice (exact tie).
    Broadcast filtering would keep BOTH tied rows while the shuffle
    path keeps exactly one (fingerprint tiebreak), so ties force the
    shuffle path to preserve output identity between modes.

    ``limit`` (driver guard, default ``DUP_BROADCAST_LIMIT``) is
    enforced INSIDE ``dup_winner_map``'s merge loop — the driver never
    holds more than ~limit urls before the shuffle fallback fires."""
    limit = kwargs.pop("limit", DUP_BROADCAST_LIMIT)
    winners, ambiguous = dup_winner_map(paths, limit=limit)
    if winners is not None and not ambiguous:
        return extract_records(read_pages(paths), dup_winners=winners, **kwargs)
    return extract_records(read_pages(paths), **kwargs)


def run_extraction(paths, out_dir: str, **kwargs) -> None:
    """Read -> extract -> dedup -> write (single partition, no resume)."""
    extract_records(read_pages(paths), **kwargs).write_parquet(out_dir)


def summarize_records(records_ds):
    """Small corpus summary (G8/G10 analogue): one row per lang with
    document/task/error counters. Pre-aggregated per batch before the
    tiny groupby — the partial/combiner pattern (SURVEY.md §4)."""
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        langs = batch["lang"]
        keys = pc.unique(langs)
        rows = {
            "lang": [],
            "docs": [],
            "tasks": [],
            "points": [],
            "errors": [],
        }
        for key in keys.to_pylist():
            mask = pc.equal(langs, key)
            sub = batch.filter(mask)
            rows["lang"].append(key)
            rows["docs"].append(sub.num_rows)
            rows["tasks"].append(pc.sum(sub["n_tasks"]).as_py() or 0)
            rows["points"].append(pc.sum(sub["points_total"]).as_py() or 0)
            rows["errors"].append(
                pc.sum(pc.cast(pc.not_equal(sub["error"], ""), pa.int64())).as_py() or 0
            )
        return pa.Table.from_pydict(rows)

    partials = records_ds.map_batches(partial, batch_format="pyarrow")
    return (
        partials.groupby("lang")
        .aggregate(
            Sum("docs", alias_name="docs"),
            Sum("tasks", alias_name="tasks"),
            Sum("points", alias_name="points"),
            Sum("errors", alias_name="errors"),
            Count(alias_name="partials"),
        )
        .drop_columns(["partials"])
        .sort("lang")
    )
