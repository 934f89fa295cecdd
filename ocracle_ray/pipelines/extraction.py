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

from ..stages.extract import Extract, dedup_keep_latest_records

PAGES_COLUMNS = ["url", "warc_ts", "html", "lang"]  # prune: `text` unused


def read_pages(paths: str | Sequence[str], **kwargs):
    """Column-pruned pages read (never load columns the pipeline ignores)."""
    import ray.data as rd

    return rd.read_parquet(paths, columns=PAGES_COLUMNS, **kwargs)


def extract_records(
    pages_ds,
    *,
    batch_size: int = 64,
    concurrency=(2, 8),
    dedup: bool = True,
):
    """pages Dataset -> records Dataset (lazy; caller consumes/streams)."""
    records = pages_ds.map_batches(
        Extract,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    if dedup:
        records = dedup_keep_latest_records(records)
    return records


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
