"""Task segmentation FSM: extracted text -> ordered task segments.

Deterministic re-expression of the reference's three segmentation rules
plus its repair/validity passes (SURVEY.md M7-M12, M16, M17, G11):

- rule 1: split at ``(Oppgave|oppgave|Oppgåve|oppgåve)\\s*\\d*`` matches
  (``/root/reference/old/separateTasks.py:15-31``);
- rule 2: the exam header ends at the first marker-phrase hit
  (``old/taskseparation.py:10-28``), everything before it is dropped from
  segmentation (but NOT from extracted_text — byte identity of the
  extraction surface is upstream of segmentation);
- repair: a segment shorter than 100 chars is invalid; when the previous
  segment embeds a task pattern at offset ≥ 25, the tail of the previous
  segment from that match is moved into the invalid one
  (``old/taskseparation.py:30-70`` — including its swap semantics);
- validity: segments shorter than 50 chars are dropped
  (``scripts/task_boundaries.py:417-424``);
- screening: like the reference's CHECKED_TASKS=5 boundary screen
  (``scripts/task_boundaries.py:21,129-202``) only the first 5 and last 5
  segments get the "starts like a task" check;
- points: ``Maks poeng\\s*:\\s*(\\d+)`` first, then ``(\\d+)\\s*p(oeng)?\\b``,
  else 0 (``old/taskseparation.py:5``, ``prompts/extract_points.txt``
  semantics, M17).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .boilerplate import first_task_start

# The reference's bare pattern (old/separateTasks.py:15) also matches the
# substring inside inflected forms like "oppgaven"; we add a word
# boundary so only the standalone word anchors a task (documented
# deviation — deterministic and strictly fewer false splits).
TASK_START_RE = re.compile(r"(Oppgave|oppgave|Oppgåve|oppgåve)\b\s*(\d*)")
# old/taskseparation.py:44-48 embedded-task patterns (searched from char 25)
_EMBED_PATTERNS = (
    re.compile(r"oppgave\s*\d+", re.IGNORECASE),
    re.compile(r"oppgåve\s*\d+", re.IGNORECASE),
    re.compile(r"\d+\s*\(\s*[A-Z]\s*\)", re.IGNORECASE),
)
_POINTS_RE = re.compile(r"Maks poeng\s*:\s*(\d+)")
_POINTS_FALLBACK_RE = re.compile(r"(\d+)\s*p(?:oeng)?\b", re.IGNORECASE)

INVALID_MIN_CHARS = 100   # old/taskseparation.py:38
VALID_MIN_CHARS = 50      # scripts/task_boundaries.py:417
EMBED_SEARCH_FROM = 25    # old/taskseparation.py:50
CHECKED_TASKS = 5         # scripts/task_boundaries.py:21


@dataclass
class Segment:
    task_number: str
    start: int        # offset into the segmented text (absolute in input)
    end: int
    text: str
    points: int
    valid: bool


def extract_points(text: str) -> int:
    """M17: anchored 'Maks poeng: N', fallback '(N) p/poeng', else 0."""
    m = _POINTS_RE.search(text)
    if m:
        return int(m.group(1))
    m = _POINTS_FALLBACK_RE.search(text)
    if m:
        return int(m.group(1))
    return 0


def repair_segments(texts: list[str]) -> list[str]:
    """``old/taskseparation.py:30-70`` merge/repair, faithfully:
    for each invalid (<100 chars) segment j whose predecessor embeds a
    task pattern at ≥25, move the predecessor's tail into j."""
    texts = list(texts)
    invalid = [1 if len(t) < INVALID_MIN_CHARS else 0 for t in texts]
    match_pos = [0] * len(texts)
    for i, t in enumerate(texts):
        for pat in _EMBED_PATTERNS:
            m = pat.search(t[EMBED_SEARCH_FROM:])
            if m:
                match_pos[i] = m.start() + EMBED_SEARCH_FROM
                break
    for j in range(1, len(texts)):
        if invalid[j] != 0 and match_pos[j - 1] != 0:
            split = match_pos[j - 1]
            moved = texts[j - 1][split:]
            texts[j - 1] = texts[j - 1][:split] + texts[j]
            texts[j] = moved
    return texts


def _starts_like_task(text: str) -> bool:
    m = TASK_START_RE.search(text)
    return m is not None and m.start() < EMBED_SEARCH_FROM


def segment_text(text: str) -> list[Segment]:
    """Segment one document's extracted text into task segments.

    Returns ALL segments (valid and invalid) in document order; callers
    filter on ``valid``. Offsets refer to ``text`` before repair moves
    (repair rewrites segment *texts*, the span anchors keep the original
    split points — documented divergence: the reference operates on text
    lists only and has no offset concept).
    """
    body_from = first_task_start(text)
    matches = [m for m in TASK_START_RE.finditer(text, body_from)]
    if not matches:
        seg = text[body_from:].strip()
        return [
            Segment(
                task_number="",
                start=body_from,
                end=len(text),
                text=seg,
                points=extract_points(seg),
                valid=len(seg) >= VALID_MIN_CHARS,
            )
        ]

    starts = [m.start() for m in matches]
    numbers = [m.group(2) for m in matches]
    bounds = starts + [len(text)]
    texts = [text[bounds[i] : bounds[i + 1]].strip() for i in range(len(starts))]
    texts = repair_segments(texts)

    segs: list[Segment] = []
    for i, seg_text in enumerate(texts):
        num = numbers[i] if numbers[i] else str(i + 1)
        valid = len(seg_text) >= VALID_MIN_CHARS
        # G11 head/tail screening: first/last CHECKED_TASKS segments must
        # start like a task (cheap boundary screen).
        if valid and (i < CHECKED_TASKS or i >= len(texts) - CHECKED_TASKS):
            valid = _starts_like_task(seg_text)
        segs.append(
            Segment(
                task_number=num,
                start=bounds[i],
                end=bounds[i + 1],
                text=seg_text,
                points=extract_points(seg_text),
                valid=valid,
            )
        )
    return segs
