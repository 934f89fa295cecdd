"""Record assembly: dedup, numeric-aware sort, canonical HTML render.

Pure-function re-expression of the reference's sink-side record logic
(``/root/reference/scripts/object_handling.py:161-257``), minus the #1
anti-pattern we must NOT port — the per-task read-modify-write of a
global ``exams.json``. Assembly here is a fold over one url's tasks.
"""

from __future__ import annotations

import re
from typing import Any

_FIRST_INT_RE = re.compile(r"\d+")
_INF = float("inf")


def task_sort_key(task_number: Any) -> tuple[float, str]:
    """Numeric-aware sort key ``(first int, str)`` —
    ``object_handling.py:241-246`` exactly (no int -> +inf)."""
    s = str(task_number)
    m = _FIRST_INT_RE.search(s)
    return (int(m.group()) if m else _INF, s)


def dedup_keep_latest(tasks: list[dict]) -> list[dict]:
    """Keep the LATEST entry per ``task_number``: reversed-scan seen-set,
    then restore order (``object_handling.py:230-239`` verbatim
    semantics)."""
    seen: set = set()
    deduped: list[dict] = []
    for t in reversed(tasks):
        num = t.get("task_number")
        if num in seen:
            continue
        seen.add(num)
        deduped.append(t)
    return list(reversed(deduped))


def assemble_tasks(tasks: list[dict]) -> list[dict]:
    """Dedup keep-latest then numeric-aware sort (G4 + G5)."""
    out = dedup_keep_latest(tasks)
    out.sort(key=lambda t: task_sort_key(t.get("task_number", "")))
    return out


def exam_version_abbr(raw: str) -> str:
    """'Vår 2023' -> 'V23' etc.: first char ∈ {V,H,K} + last two chars,
    else passthrough (``scripts/task_processing.py:305-311``,
    ``scripts/_abbr_exam.py:1-11``)."""
    v = str(raw).strip().upper()
    if v and v[0] in ("V", "H", "K"):
        return v[0] + v[-2:]
    return v


def render_task_html(task_number: str, text: str, spans: list[tuple[int, int, str]]) -> str:
    """Canonical deterministic HTML for one task (M14 stand-in for the
    LLM formatter ``prompts/format_html_output.txt``): heading + one
    ``<p>`` per paragraph, math spans inlined as ``$katex$`` at their
    offsets. Snapshot-tested; byte-stable by construction."""
    pieces: list[str] = []
    pos = 0
    for start, end, katex in spans:
        if start < pos:
            continue
        pieces.append(_escape(text[pos:start]))
        pieces.append(f"${_escape(katex)}$")  # katex may carry <, >, &
        pos = end
    pieces.append(_escape(text[pos:]))
    body = "".join(pieces)
    paras = "".join(f"<p>{p.strip()}</p>" for p in body.split("\n") if p.strip())
    head = f"<h3>Oppgave {task_number}</h3>" if task_number else ""
    return head + paras


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def ordered_union(lists: list[list[str]]) -> list[str]:
    """Order-preserving set union (G6, ``object_handling.py:196-203``):
    append items not already present, first-seen order."""
    out: list[str] = []
    seen: set[str] = set()
    for lst in lists:
        for item in lst:
            if item not in seen:
                seen.add(item)
                out.append(item)
    return out


def sorted_union(lists: list[list[str]], drop: str | None = None) -> list[str]:
    """Normalized sorted set union (G7, ``object_handling.py:79-103``):
    strip+upper, drop the canonical value, sorted."""
    vals = {str(v).strip().upper() for lst in lists for v in lst if str(v).strip()}
    if drop is not None:
        vals.discard(str(drop).strip().upper())
    return sorted(vals)
