"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in ``ocracle_ray``) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``     flagship extraction pipeline at sf0.001 (pages table is
                  synthesized deterministically per FIXTURES.md T1 — the
                  testdata dir has no pages-shaped table).
- ``queries()``   one entry per implemented operator/pipeline
                  (SURVEY.md §2 + scale addenda), each ``f(sf_dir)``.
- ``oracle_sql()``matching DuckDB SQL on the pre-registered views;
                  omitted for non-SQL-expressible entries (synthesized
                  pages, sketch-based dedup) → rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: synthesized sf0.001-scale pages -> records."""
    from ocracle_ray.pipelines.extraction import extract_records
    from ocracle_ray.sources.pages import generate_pages_dataset, n_docs_for_sf

    pages = generate_pages_dataset(n_docs_for_sf(0.001))
    return extract_records(pages, concurrency=2)


def queries() -> dict[str, Callable[[str], Any]]:
    from ocracle_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ocracle_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
