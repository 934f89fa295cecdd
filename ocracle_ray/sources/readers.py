"""Format-sniffing pages readers: Parquet (canonical), JSONL, CSV.

The engine's canonical input is the Parquet pages table
(BASELINE.json input_hint), read column-pruned by
``pipelines.extraction.read_pages``. Real crawl deliveries also arrive
as JSONL or CSV text dumps; these readers normalize either into the
SAME Arrow schema (html utf-8-encoded to ``large_binary``, warc_ts ISO
strings cast to ``timestamp[us]``) so every downstream stage is
format-agnostic. Parquet remains the only format with true column
pruning at the read — the text formats must parse whole records, which
is the nature of the format, not of this engine (documented trade-off).
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa

from ..pipelines.extraction import PAGES_COLUMNS

_PAGES_ARROW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.large_binary()),
        ("lang", pa.string()),
    ]
)


def _normalize_pages(t: pa.Table) -> pa.Table:
    """Any text-format pages batch -> the canonical pruned schema."""
    import pyarrow.compute as pc

    cols = {}
    cols["url"] = pc.cast(t["url"], pa.string())
    ts = t["warc_ts"]
    if not pa.types.is_timestamp(ts.type):
        ts = pc.cast(pc.cast(ts, pa.string()), pa.timestamp("us"))
    else:
        ts = pc.cast(ts, pa.timestamp("us"))
    cols["warc_ts"] = ts
    # string -> large_binary cast yields the utf-8 bytes; binary passes through
    cols["html"] = pc.cast(t["html"], pa.large_binary())
    cols["lang"] = pc.cast(t["lang"], pa.string()) if "lang" in t.column_names else pa.array(
        [""] * t.num_rows, pa.string()
    )
    return pa.Table.from_arrays(
        [cols[f.name] for f in _PAGES_ARROW_SCHEMA], schema=_PAGES_ARROW_SCHEMA
    )


def read_pages_any(paths: str | Sequence[str], **kwargs):
    """Pages Dataset from Parquet / JSONL / CSV, sniffed by extension.
    Output schema is identical across formats (tested); downstream
    pipelines don't care where the bytes came from."""
    import ray.data as rd

    first = (paths if isinstance(paths, str) else list(paths)[0]).lower()
    if first.endswith((".parquet", ".pq")) or not first.rsplit(".", 1)[-1] in (
        "json",
        "jsonl",
        "csv",
    ):
        return rd.read_parquet(paths, columns=PAGES_COLUMNS, **kwargs)
    if first.endswith((".json", ".jsonl")):
        ds = rd.read_json(paths, **kwargs)
    else:  # .csv
        from pyarrow import csv as pacsv

        ds = rd.read_csv(
            paths,
            parse_options=pacsv.ParseOptions(newlines_in_values=True),
            **kwargs,
        )
    return ds.map_batches(_normalize_pages, batch_format="pyarrow")
