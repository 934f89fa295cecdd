"""Format-sniffing pages readers: Parquet (canonical), JSONL, CSV,
WARC, ORC, Avro, Arrow IPC/Feather.

The engine's canonical input is the Parquet pages table
(BASELINE.json input_hint), read column-pruned by
``pipelines.extraction.read_pages``. Real crawl deliveries also arrive
as JSONL/CSV text dumps or WARC crawl archives (sources/warc.py);
these readers normalize each into the
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


_COMPRESSION_EXTS = (".gz", ".bz2", ".zst", ".zstd")


def _format_of(path: str) -> str:
    p = path.lower()
    for c in _COMPRESSION_EXTS:  # sniff the FORMAT under the compression
        if p.endswith(c):
            p = p[: -len(c)]
            break
    ext = p.rsplit(".", 1)[-1] if "." in p else ""
    if ext in ("parquet", "pq"):
        return "parquet"
    if ext in ("json", "jsonl"):
        return "json"
    if ext == "csv":
        return "csv"
    if ext in ("warc", "wet"):  # member-gzip handled inside the parser
        return "warc"
    if ext == "orc":
        return "orc"
    if ext == "avro":
        return "avro"
    if ext in ("arrow", "feather", "ipc"):
        return "ipc"
    if ext == "tfrecord":
        return "tfrecord"
    return "parquet"  # directories / extension-less: the canonical format


def read_pages_any(paths: str | Sequence[str], **kwargs):
    """Pages Dataset from Parquet / JSONL / CSV (optionally
    gz/bz2/zst-compressed — Ray's file reader decompresses by
    extension), sniffed per path. Mixed-format path lists are an
    explicit error, never a silent misparse. Output schema is identical
    across formats (tested)."""
    import ray.data as rd

    path_list = [paths] if isinstance(paths, str) else list(paths)
    formats = {_format_of(p) for p in path_list}
    if len(formats) > 1:
        raise ValueError(
            f"read_pages_any: mixed input formats {sorted(formats)} in one "
            f"call; split the read per format"
        )
    fmt = formats.pop()
    if fmt == "parquet":
        return rd.read_parquet(paths, columns=PAGES_COLUMNS, **kwargs)
    if fmt == "warc":
        from .warc import read_pages_warc

        return read_pages_warc(paths, **kwargs)
    if fmt == "orc":
        return read_pages_orc(path_list, **kwargs)
    if fmt == "avro":
        from .avro import read_pages_avro

        return read_pages_avro(path_list, **kwargs)
    if fmt == "tfrecord":
        from .tfrecord import read_pages_tfrecord

        return read_pages_tfrecord(path_list, **kwargs)
    if fmt == "ipc":
        return read_pages_ipc(path_list, **kwargs)
    if fmt == "json":
        ds = rd.read_json(paths, **kwargs)
    else:  # csv
        from pyarrow import csv as pacsv

        ds = rd.read_csv(
            paths,
            parse_options=pacsv.ParseOptions(newlines_in_values=True),
            **kwargs,
        )
    return ds.map_batches(_normalize_pages, batch_format="pyarrow")


def read_pages_orc(paths: Sequence[str], **kwargs):
    """ORC pages via pyarrow.orc — Ray Data ships no ORC reader, so
    this is the WARC pattern: read the file bytes, one decode task per
    FILE (the format's natural split here; stripe-level parallelism
    would need a custom datasource). Column pruning IS pushed down
    (pyarrow.orc materializes only the pages columns)."""
    import io

    import ray.data as rd

    ds = rd.read_binary_files(list(paths), **kwargs)

    def parse(t: pa.Table) -> pa.Table:
        from pyarrow import orc as paorc

        tables = [
            _normalize_pages(
                paorc.ORCFile(io.BytesIO(b.as_py())).read(
                    columns=PAGES_COLUMNS)
            )
            for b in t["bytes"]
        ]
        return (pa.concat_tables(tables) if tables
                else _PAGES_ARROW_SCHEMA.empty_table())

    return ds.map_batches(parse, batch_format="pyarrow")


def read_pages_ipc(paths: Sequence[str], **kwargs):
    """Arrow IPC file / Feather-V2 pages (.arrow/.feather/.ipc) — the
    zero-copy interchange dumps Arrow-native producers hand off. Same
    per-FILE decode-task shape as ORC; column pruning IS pushed down
    (the IPC file footer indexes record batches, and only the pages
    columns materialize from the buffers)."""
    import io

    import ray.data as rd

    ds = rd.read_binary_files(list(paths), **kwargs)

    def parse(t: pa.Table) -> pa.Table:
        from pyarrow import feather

        tables = [
            _normalize_pages(
                feather.read_table(io.BytesIO(b.as_py()),
                                   columns=PAGES_COLUMNS)
            )
            for b in t["bytes"]
        ]
        return (pa.concat_tables(tables) if tables
                else _PAGES_ARROW_SCHEMA.empty_table())

    return ds.map_batches(parse, batch_format="pyarrow")


def evolve_to(t: pa.Table, target: pa.Schema) -> pa.Table:
    """Schema-evolution unifier — the Delta/Iceberg mergeSchema read
    rule: project ANY batch onto ``target``, filling columns the file
    predates with nulls, dropping columns the target no longer
    carries, and casting compatible types (int widths, string ↔
    large_string, timestamp units). Raises loud on an incompatible
    cast (a schema change that silently coerces data is a pipeline
    bug, not an evolution). Semantics match DuckDB's
    ``read_parquet(..., union_by_name=true)`` restricted to the
    target's columns — pinned by the pages_schema_evolution oracle."""
    import pyarrow.compute as pc

    arrays = []
    for f in target:
        if f.name in t.column_names:
            arrays.append(pc.cast(t[f.name], f.type))
        else:
            arrays.append(pa.nulls(t.num_rows, f.type))
    return pa.Table.from_arrays(arrays, schema=target)
