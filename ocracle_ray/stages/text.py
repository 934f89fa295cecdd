"""Text-analysis stage: lang-id, quality, token counts, fingerprints.

One actor-pool ``map_batches`` stage that annotates any Dataset's text
column with the ``core.textstats`` signals (SURVEY.md text-analysis
addendum). State (stopword tables, compiled regexes) loads once per
actor in ``__init__``.
"""

from __future__ import annotations

import pyarrow as pa

from ..core.textstats import (
    bpe_ish_token_count,
    detect_lang,
    fingerprint,
    punct_ratio,
    quality_score,
    whitespace_token_count,
)
from ..core.dedup import simhash


class TextStats:
    """Annotates ``text_col`` with lang_pred / quality / token counts /
    fingerprint / simhash columns.

    Usage::

        ds.map_batches(TextStats, fn_constructor_kwargs={"text_col": "text"},
                       batch_format="pyarrow", concurrency=4)
    """

    def __init__(self, text_col: str = "text", with_simhash: bool = False):
        self.text_col = text_col
        self.with_simhash = with_simhash
        # warm compiled tables once per actor
        detect_lang("warm up the tables")
        quality_score("warm")

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = [x if x is not None else "" for x in t[self.text_col].to_pylist()]
        t = t.append_column("lang_pred", pa.array([detect_lang(x) for x in texts], pa.string()))
        t = t.append_column("quality", pa.array([quality_score(x) for x in texts], pa.float64()))
        t = t.append_column(
            "tokens_ws", pa.array([whitespace_token_count(x) for x in texts], pa.int64())
        )
        t = t.append_column(
            "tokens_bpe", pa.array([bpe_ish_token_count(x) for x in texts], pa.int64())
        )
        t = t.append_column(
            "punct_ratio", pa.array([round(punct_ratio(x), 6) for x in texts], pa.float64())
        )
        t = t.append_column(
            "text_fingerprint", pa.array([fingerprint(x) for x in texts], pa.int64())
        )
        if self.with_simhash:
            t = t.append_column(
                "simhash", pa.array([simhash(x) for x in texts], pa.int64())
            )
        return t


def annotate_text(ds, text_col: str = "text", concurrency=2, **kwargs):
    return ds.map_batches(
        TextStats,
        fn_constructor_kwargs=dict(text_col=text_col, **kwargs),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def scrub_text(ds, text_col: str = "text"):
    """PII redaction over ``text_col`` (``core.scrub``): replaces the
    column with its redacted form and appends exact per-row
    ``n_email`` / ``n_ipv4`` / ``n_phone`` insertion counts. Pure
    Arrow kernels per batch (RE2 replace + substring counts) — a plain
    task map, no actor state to hold."""
    from ..core.scrub import scrub_pii

    def fn(t: pa.Table) -> pa.Table:
        redacted, counts = scrub_pii(t[text_col])
        t = t.set_column(
            t.schema.get_field_index(text_col), text_col, redacted
        )
        for name, arr in counts.items():
            t = t.append_column(name, arr)
        return t

    return ds.map_batches(fn, batch_format="pyarrow")
