"""Per-document extraction: html/pdf bytes -> structured record. PURE.

This is THE function whose output must be byte-identical per url across
runs, parallelism levels and resume (BASELINE.json ``input_hint``). The
Ray pipeline (``stages/extract.py``) only maps it over Arrow batches, so
identity across schedules is by construction.

Flow (reference parity per SURVEY.md §3 E1):

    sniff (%PDF- ?) -> tokenize (html FSM | OCRSYN layout parse)
    -> classify blocks -> extracted_text = body blocks joined by '\\n'
    -> segment (task FSM + repair + validity)
    -> per task: points (M17), topic (M18), math spans (M1), HTML (M14)
    -> assemble: per-task dedup keep-latest + numeric sort (G4, G5)
"""

from __future__ import annotations

from typing import Any

from . import pdf as pdfmod
from .assemble import assemble_tasks, render_task_html
from .classify import BODY_KINDS, classify_blocks
from .html_tokenizer import tokenize
from .normalize import find_math_spans
from .segment import segment_text
from .topics import classify_topic

BLOCK_JOINER = "\n"


def extract_blocks(payload: bytes) -> tuple[list, list[str], str]:
    """Tokenize + classify one payload; returns (blocks, kinds, branch)."""
    if pdfmod.is_pdf(payload):
        blocks = pdfmod.parse_pdf_blocks(payload)
        branch = "pdf"
    else:
        blocks = tokenize(payload)
        branch = "html"
    return blocks, classify_blocks(blocks), branch


def extracted_text_of(blocks: list, kinds: list[str]) -> str:
    """The byte-identity surface: body-block texts joined with '\\n' in
    block_id order (explicit order key — never executor order,
    SURVEY.md §7.4)."""
    return BLOCK_JOINER.join(
        b.text for b, k in zip(blocks, kinds) if k in BODY_KINDS
    )


def extract_document(
    url: str,
    payload: bytes,
    lang: str = "",
    ignored_topics: frozenset[str] = frozenset(),
    translate_nn: bool = False,
) -> dict[str, Any]:
    """Extract one document into the ``records`` row (SURVEY.md §1.2).

    ``ignored_topics`` is the M19 anti-join blacklist
    (``task_processing.py:453-476``): tasks classified into a
    blacklisted topic are dropped and counted in
    ``n_invalid_segments``. ``translate_nn=True`` applies the M15
    deterministic nynorsk->bokmål wordlist to TASK TEXT when
    ``lang == 'nn'`` (OFF by default: it rewrites the task_text surface;
    ``extracted_text`` — the byte-identity surface — is NEVER
    translated). COORDINATE CONTRACT: a task's ``equation_spans``
    offsets index the SEGMENT SOURCE TEXT that ``task_text`` was
    rendered from — the translated text when translation is on — while
    the task's ``start``/``end`` always index ``extracted_text``
    (segment bounds); the two systems coincide only when no translation
    rewrote the segment. Never raises on malformed input: failures
    land in ``error`` with an empty-but-schema-stable record (per-row
    try/except kept EXPLICIT, SURVEY.md §4 retries row).
    """
    try:
        blocks, kinds, branch = extract_blocks(payload)
    except NotImplementedError as exc:
        return _empty_record(url, lang, "pdf", f"unsupported: {exc}")
    except Exception as exc:  # malformed payload — keep the row, flag it
        return _empty_record(url, lang, "?", f"{type(exc).__name__}: {exc}")

    text = extracted_text_of(blocks, kinds)
    segments = segment_text(text) if text else []

    tasks: list[dict[str, Any]] = []
    n_invalid = 0
    for seg in segments:
        if not seg.valid:
            n_invalid += 1
            continue
        topic = classify_topic(seg.text)
        if topic in ignored_topics:  # M19 anti-join
            n_invalid += 1
            continue
        seg_text = seg.text
        if translate_nn and lang == "nn":
            from .translate import translate_nn_to_nb

            seg_text = translate_nn_to_nb(seg_text)
        spans = find_math_spans(seg_text)
        tasks.append(
            {
                "task_number": seg.task_number,
                "points": seg.points,
                "topic": topic,
                "task_text": render_task_html(seg.task_number, seg_text, spans),
                "start": seg.start,
                "end": seg.end,
                "equation_spans": [
                    {"start": s, "end": e, "katex": k} for s, e, k in spans
                ],
            }
        )
    tasks = assemble_tasks(tasks)

    kind_counts: dict[str, int] = {}
    for k in kinds:
        kind_counts[k] = kind_counts.get(k, 0) + 1

    return {
        "url": url,
        "lang": lang,
        "branch": branch,
        "extracted_text": text,
        "n_blocks": len(blocks),
        "n_body_blocks": sum(1 for k in kinds if k in BODY_KINDS),
        "n_boilerplate_blocks": kind_counts.get("boilerplate", 0),
        "n_figure_blocks": kind_counts.get("figure", 0),
        "n_code_blocks": kind_counts.get("code", 0),
        "n_tasks": len(tasks),
        "n_invalid_segments": n_invalid,
        "points_total": sum(t["points"] for t in tasks),
        "tasks": tasks,
        "error": "",
    }


def _empty_record(url: str, lang: str, branch: str, error: str) -> dict[str, Any]:
    return {
        "url": url,
        "lang": lang,
        "branch": branch,
        "extracted_text": "",
        "n_blocks": 0,
        "n_body_blocks": 0,
        "n_boilerplate_blocks": 0,
        "n_figure_blocks": 0,
        "n_code_blocks": 0,
        "n_tasks": 0,
        "n_invalid_segments": 0,
        "points_total": 0,
        "tasks": [],
        "error": error,
    }
