"""First-class ``blocks`` and ``figures`` surfaces (SURVEY.md §1.2).

``pages_to_blocks`` explodes each page into its ordered layout blocks —
the engine's central intermediate table — and ``figures_of_blocks``
filters the ``figure`` kind with per-url near-duplicate suppression
(the deterministic analogue of the reference's template-match dedup,
``/root/reference/scripts/extract_images.py:266-274``, F5/G13: the
reference suppresses a figure whose pixels near-match an already-saved
one within the same document; we suppress a figure whose alt-text
fingerprint repeats within the url).
"""

from __future__ import annotations

import pyarrow as pa

from ..core.classify import classify_blocks
from ..core.extract import extract_blocks
from ..core.textstats import fingerprint

BLOCKS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("block_id", pa.int32()),
        ("kind", pa.string()),
        ("tag", pa.string()),
        ("text", pa.large_string()),
        ("n_chars", pa.int32()),
        ("link_chars", pa.int32()),
        ("depth", pa.int32()),
        ("branch", pa.string()),
    ]
)


class ExplodeBlocks:
    """Actor-pool stage: one pages batch in, many block rows out."""

    def __init__(self) -> None:
        from ..core import boilerplate, classify  # noqa: F401 — compile once

    def __call__(self, t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {n: [] for n in BLOCKS_SCHEMA.names}
        for url, payload in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            try:
                blocks, kinds, branch = extract_blocks(payload or b"")
            except Exception:
                continue  # malformed rows are counted by the records path
            for b, k in zip(blocks, kinds):
                cols["url"].append(url)
                cols["block_id"].append(b.block_id)
                cols["kind"].append(k)
                cols["tag"].append(b.tag)
                cols["text"].append(b.text)
                cols["n_chars"].append(b.n_chars)
                cols["link_chars"].append(b.link_chars)
                cols["depth"].append(b.depth)
                cols["branch"].append(branch)
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in BLOCKS_SCHEMA],
            schema=BLOCKS_SCHEMA,
        )


def pages_to_blocks(pages_ds, *, batch_size: int = 64, concurrency=2):
    return pages_ds.map_batches(
        ExplodeBlocks,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def build_container_string(blocks: list, with_identifier: bool = False) -> str:
    """Debug/inspection formatter (M2): blocks -> one string, optionally
    with ``=== CONTAINER i (kind) ===`` markers — the reference's prompt
    builders (``task_boundaries.py:103-126``) minus the LLM consumer.
    The ≥95% full-page reclass the reference applies here lives in
    ``core.classify.classify_block`` instead."""
    if not with_identifier:
        return "\n\n".join(b.text for b in blocks)
    kinds = classify_blocks(blocks)
    parts = [
        f"\n\n=== CONTAINER {b.block_id} ({k}) ===\n{b.text}"
        for b, k in zip(blocks, kinds)
    ]
    return "".join(parts)


def figures_of_blocks(blocks_ds):
    """figure blocks with per-url near-dup suppression (F5 analogue).

    The figure subset is filtered vectorized per batch; the suppression
    itself groups by url so a giant document whose blocks straddle
    batch boundaries still dedups correctly (batch-layout independent —
    found by review: a per-batch ``seen`` set silently missed
    cross-batch duplicates). The shuffle moves only figure rows, a tiny
    fraction of blocks. First occurrence (min block_id) wins."""
    import pyarrow.compute as pc

    def only_figures(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["kind"], "figure")).select(
            ["url", "block_id", "text"]
        )

    def dedup_in_url(group: pa.Table) -> pa.Table:
        order = group.sort_by([("block_id", "ascending")])
        seen: set[int] = set()
        keep = []
        for text in order["text"].to_pylist():
            fp = fingerprint(text)
            keep.append(fp not in seen)
            seen.add(fp)
        return order.filter(pa.array(keep))

    return (
        blocks_ds.map_batches(only_figures, batch_format="pyarrow")
        .groupby("url")
        .map_groups(dedup_in_url, batch_format="pyarrow")
    )
