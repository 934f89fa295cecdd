"""Boilerplate phrase tables + first-task-start markers.

Deterministic replacement for the reference's LLM admin-text remover:
the phrase list is compiled from the explicit examples in
``/root/reference/prompts/remove_exam_admin.txt:1-21`` and the
first-task marker phrases in
``/root/reference/old/taskseparation.py:12-20`` (SURVEY.md M8/M13).
A block whose text contains any admin phrase (case-insensitive) is
classified boilerplate; the first-task markers cut everything before
``match.end()`` of the FIRST marker hit, exactly like
``detect_first_task_start`` (``old/taskseparation.py:10-28``).
"""

from __future__ import annotations

import re

# From prompts/remove_exam_admin.txt — exam-administration phrases.
ADMIN_PHRASES: tuple[str, ...] = (
    "skal besvares i inspera",
    "ikke legge ved utregninger",
    "i svarfeltet",
    "i hvert felt under",
    "skriv ditt svar her",
    "bruk av scantron",
    "scantronark",
    "scantron-ark",
    "sjusifret kode",
    "arkivet i inspera",
    "varslinger vil bli gitt via inspera",
    "kontaktinformasjon til fagl",
    "hjelpemiddelkoder",
    "kalkulatorliste",
    "eksamensdato",
    "kryss av for",
    "velg ett alternativ",
    "inspera",
)

# From old/taskseparation.py:12-20 — markers that END the exam header.
FIRST_TASK_MARKERS: tuple[str, ...] = (
    "prøvar».",
    "prøver».",
    "tilgjengelige i arkivet",
    "tekstverktøyet i inspera",
    "slike spørsmål",
    "eksamen er passert",
    "med insperascan",
)

_ADMIN_RE = re.compile(
    "|".join(re.escape(p) for p in ADMIN_PHRASES), re.IGNORECASE
)
_MARKER_RE = re.compile(
    "(" + "|".join(re.escape(m) for m in FIRST_TASK_MARKERS) + ")", re.IGNORECASE
)


def is_admin_text(text: str) -> bool:
    """True when the block text hits the admin-phrase blacklist."""
    return _ADMIN_RE.search(text) is not None


def first_task_start(text: str) -> int:
    """Offset where real content starts: ``end()`` of the first marker
    hit, else 0 (``old/taskseparation.py:10-28`` semantics)."""
    m = _MARKER_RE.search(text)
    return m.end() if m else 0
