"""Extraction stages: Arrow batches of pages -> Arrow batches of records.

The per-document work is ``core.extract.extract_document`` (pure); this
module owns the Arrow schema and the actor-pool plumbing. Batches stay
``batch_format="pyarrow"`` end-to-end — the nested ``tasks``
``list<struct>`` column never round-trips through pandas (object dtype
would break the type, see ray_guide pitfalls).

``Extract`` is a callable CLASS (actor pool): per-actor state — compiled
regex tables, classifier constants — is built once in ``__init__``, the
per-batch ``__call__`` only loops documents. This mirrors the
reference's per-worker OCR-client setup (SURVEY.md A1/A3,
``/root/reference/scripts/ocr_pdf.py:18-24``) with the deterministic
parser in place of the cloud client.
"""

from __future__ import annotations

import pyarrow as pa

from ..core.extract import extract_document
from ..core.textstats import fingerprint

EQ_SPAN_STRUCT = pa.struct(
    [("start", pa.int32()), ("end", pa.int32()), ("katex", pa.string())]
)
TASK_STRUCT = pa.struct(
    [
        ("task_number", pa.string()),
        ("points", pa.int32()),
        ("topic", pa.string()),
        ("task_text", pa.large_string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("equation_spans", pa.list_(EQ_SPAN_STRUCT)),
    ]
)
_COMMON_FIELDS = [
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("lang", pa.string()),
    ("branch", pa.string()),
    ("extracted_text", pa.large_string()),
    ("text_fingerprint", pa.int64()),
    ("n_blocks", pa.int32()),
    ("n_body_blocks", pa.int32()),
    ("n_boilerplate_blocks", pa.int32()),
    ("n_figure_blocks", pa.int32()),
    ("n_code_blocks", pa.int32()),
    ("n_tasks", pa.int32()),
    ("n_invalid_segments", pa.int32()),
    ("points_total", pa.int32()),
]

# Final output schema (SURVEY.md §1.2 `records`): nested tasks.
RECORDS_SCHEMA = pa.schema(_COMMON_FIELDS + [("tasks", pa.list_(TASK_STRUCT)), ("error", pa.string())])

# In-flight schema: `tasks` serialized as JSON. Sort-based shuffles copy
# nested list<struct> columns pathologically (measured 4x the whole-
# pipeline cost at sf0.1); a flat large_string shuffles at string speed
# and a cheap post-dedup map decodes winners back to the nested schema.
INTERNAL_RECORDS_SCHEMA = pa.schema(
    _COMMON_FIELDS + [("tasks_json", pa.large_string()), ("error", pa.string())]
)


def records_batch_from_pages(
    batch: pa.Table,
    *,
    ignored_topics: frozenset = frozenset(),
    translate_nn: bool = False,
) -> pa.Table:
    """pages batch -> in-flight records batch (pure, deterministic).

    ``tasks`` is emitted as canonical JSON (sorted keys, compact
    separators) — byte-stable, shuffle-cheap; ``decode_tasks`` restores
    the nested Arrow column after the dedup shuffle. ``ignored_topics``
    and ``translate_nn`` pass through to ``extract_document`` (M19/M15)."""
    import json

    urls = batch["url"].to_pylist()
    langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [""] * len(urls)
    ts = batch["warc_ts"].to_pylist() if "warc_ts" in batch.column_names else [None] * len(urls)
    htmls = batch["html"].to_pylist()

    recs = [
        extract_document(
            u, h or b"", l or "",
            ignored_topics=ignored_topics, translate_nn=translate_nn,
        )
        for u, h, l in zip(urls, htmls, langs)
    ]
    cols: dict[str, list] = {name: [] for name in INTERNAL_RECORDS_SCHEMA.names}
    for r, t in zip(recs, ts):
        cols["url"].append(r["url"])
        cols["warc_ts"].append(t)
        cols["lang"].append(r["lang"])
        cols["branch"].append(r["branch"])
        cols["extracted_text"].append(r["extracted_text"])
        cols["text_fingerprint"].append(fingerprint(r["extracted_text"]))
        for k in (
            "n_blocks",
            "n_body_blocks",
            "n_boilerplate_blocks",
            "n_figure_blocks",
            "n_code_blocks",
            "n_tasks",
            "n_invalid_segments",
            "points_total",
        ):
            cols[k].append(r[k])
        cols["tasks_json"].append(
            json.dumps(r["tasks"], sort_keys=True, separators=(",", ":"), ensure_ascii=False)
        )
        cols["error"].append(r["error"])

    arrays = [pa.array(cols[f.name], type=f.type) for f in INTERNAL_RECORDS_SCHEMA]
    return pa.Table.from_arrays(arrays, schema=INTERNAL_RECORDS_SCHEMA)


def decode_tasks(batch: pa.Table) -> pa.Table:
    """tasks_json -> nested ``tasks`` column (final RECORDS_SCHEMA)."""
    import json

    tasks = [
        [
            {
                "task_number": t_["task_number"],
                "points": t_["points"],
                "topic": t_["topic"],
                "task_text": t_["task_text"],
                "start": t_["start"],
                "end": t_["end"],
                "equation_spans": t_["equation_spans"],
            }
            for t_ in json.loads(tj)
        ]
        for tj in batch["tasks_json"].to_pylist()
    ]
    idx = batch.column_names.index("tasks_json")
    out = batch.remove_column(idx)
    out = out.add_column(idx, "tasks", pa.array(tasks, pa.list_(TASK_STRUCT)))
    return out.select([f.name for f in RECORDS_SCHEMA])


class Extract:
    """Actor-pool extraction stage.

    Usage::

        pages.map_batches(Extract, batch_format="pyarrow",
                          batch_size=64, concurrency=(2, 8), num_cpus=1)

    ``batch_size`` stays small because ``html`` cells are wide
    (multi-MB skew rows — SURVEY.md §7.4); the streaming executor
    pipelines blocks through the pool with backpressure.
    """

    def __init__(self, ignored_topics=frozenset(), translate_nn: bool = False) -> None:
        # Touch the compiled-regex modules once per actor so all pattern
        # compilation cost is paid in __init__, not per batch.
        from ..core import boilerplate, classify, normalize, segment  # noqa: F401

        self.ignored_topics = frozenset(ignored_topics)
        self.translate_nn = translate_nn

    def __call__(self, batch: pa.Table) -> pa.Table:
        return records_batch_from_pages(
            batch,
            ignored_topics=self.ignored_topics,
            translate_nn=self.translate_nn,
        )


def dedup_keep_latest_records(records_ds, n_buckets: int = 64):
    """Exact per-url keep-latest dedup (G4), bucketed + vectorized.

    Grouping per-url would pay a Python call per group (millions at
    scale); instead rows are hash-bucketed by ``crc32(url) % n_buckets``
    and the shuffle groups by BUCKET. Inside each bucket one vectorized
    Arrow pass sorts by (url, warc_ts, text_fingerprint) and keeps the
    last row per url. The exchange moves records (html payloads were
    already dropped by extraction), and keep = max(warc_ts) with
    fingerprint tiebreak — the deterministic stand-in for the
    reference's temporal "last write wins"
    (``object_handling.py:230-239``; SURVEY.md §7.4 keep-LATEST note).

    ``n_buckets`` bounds per-group size: at cluster scale set it ≈ the
    desired output partition count (each bucket must fit in a worker's
    heap). Skewed/hot urls cannot concentrate: the bucket key is a hash
    of the full url.
    """
    import zlib

    import numpy as np
    import pyarrow.compute as pc

    _EPOCH0 = pa.scalar(0, pa.timestamp("us"))

    def _sort_latest(t: pa.Table) -> pa.Table:
        """Sort by (url, ts, fp) with null warc_ts counted as epoch 0 —
        the SAME always-loser convention as broadcast mode's
        ``dup_winner_map`` fill_null (pyarrow's default null_placement
        'at_end' would otherwise make a null-ts copy win here while it
        loses in broadcast mode, breaking mode byte-identity)."""
        filled = pc.fill_null(pc.cast(t["warc_ts"], pa.timestamp("us")), _EPOCH0)
        order = t.append_column("_ts_filled", filled).sort_by(
            [("url", "ascending"), ("_ts_filled", "ascending"),
             ("text_fingerprint", "ascending")]
        )
        return order.drop_columns(["_ts_filled"])

    def local_keep_latest(t: pa.Table) -> pa.Table:
        """Block-level combiner: drop same-url losers BEFORE the shuffle.
        Crawl inputs usually carry a url's recrawls near each other, so
        this eliminates most duplicates locally (partial-agg pattern)."""
        if t.num_rows <= 1:
            return t
        order = _sort_latest(t)
        urls = order["url"].to_numpy(zero_copy_only=False)
        is_last = np.ones(len(urls), dtype=bool)
        is_last[:-1] = urls[:-1] != urls[1:]
        return order.filter(pa.array(is_last))

    def add_bucket(t: pa.Table) -> pa.Table:
        buckets = np.fromiter(
            (zlib.crc32(u.encode("utf-8", "surrogatepass")) % n_buckets
             for u in t["url"].to_pylist()),
            dtype=np.int32,
            count=t.num_rows,
        )
        return t.append_column("_bucket", pa.array(buckets, pa.int32()))

    def keep_latest(group: pa.Table) -> pa.Table:
        if group.num_rows > 1:
            order = _sort_latest(group)
            urls = order["url"].to_numpy(zero_copy_only=False)
            # last row of each url run
            is_last = np.ones(len(urls), dtype=bool)
            is_last[:-1] = urls[:-1] != urls[1:]
            group = order.filter(pa.array(is_last))
        return group.drop_columns(["_bucket"])

    return (
        records_ds.map_batches(local_keep_latest, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(keep_latest, batch_format="pyarrow")
    )
