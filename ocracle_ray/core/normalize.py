"""KaTeX/LaTeX math normalization — the engine's M1 core.

Mirrors the reference's replacement table and pass order exactly
(``/root/reference/scripts/text_normalization.py:3-36``): whitespace
collapse → ordered symbol replacements → fraction regex → sub/superscript
regexes → operator spacing → final whitespace collapse.

Two deliberate deviations, documented per SURVEY.md §7.4:

- the reference writes its LaTeX replacements in non-raw strings, so
  ``'\\times'`` actually contains a TAB (``'\\t' + 'imes'``); we emit the
  *intended* LaTeX (raw strings).
- the reference replaces ``'^' -> '**'`` *before* its superscript regex,
  so ``\\^(\\w+)`` can never match; we keep the same pass order (the
  superscript pass is therefore a no-op after caret replacement, which we
  preserve for output parity with the intended pipeline shape).

Everything is pure ``str -> str``; the Ray stage applies it per batch.
"""

from __future__ import annotations

import re

# Ordered symbol table (text_normalization.py:10-25; insertion order matters).
REPLACEMENTS: tuple[tuple[str, str], ...] = (
    ("−", "-"),          # unicode minus -> hyphen
    ("×", r"\times"),
    ("÷", r"\div"),
    ("=", " = "),
    ("+", " + "),
    ("-", " - "),
    ("*", " * "),
    ("/", " / "),
    (";", ":"),
    ("∞", r"\infty"),
    ("∑", r"\sum"),
    ("√", r"\sqrt"),
    ("π", r"\pi"),
    ("^", "**"),
)

_WS_RE = re.compile(r"\s+")
_FRAC_RE = re.compile(r"(\d+)\s*/\s*(\d+)")
_SUB_RE = re.compile(r"_(\w+)")
_SUP_RE = re.compile(r"\^(\w+)")
_OPSPACE_RE = re.compile(r"(?<!\\)([+\-*/^=()])")


def normalize_math(text: str) -> str:
    """Normalize one math span to canonical KaTeX-ish text
    (text_normalization.py:3-36 pass order)."""
    text = _WS_RE.sub(" ", text.strip())
    for symbol, replacement in REPLACEMENTS:
        text = text.replace(symbol, replacement)
    text = _FRAC_RE.sub(r"\\frac{\1}{\2}", text)
    text = _SUB_RE.sub(r"_{\1}", text)
    text = _SUP_RE.sub(r"^{\1}", text)   # no-op after '^'->'**'; kept for pass parity
    text = _OPSPACE_RE.sub(r" \1 ", text)
    text = _WS_RE.sub(" ", text).strip()
    return text


_MATH_SPAN_RE = re.compile(
    r"[^\s]*(?:[−×÷∞∑√π]|\d\s*[=^]\s*\d|\d+\s*/\s*\d+|_\w|\^\w)[^\s]*"
    r"(?:\s+[^\s]*[−×÷∞∑√π=^/_][^\s]*)*"
)
# cheap pre-filter: a text without any of these chars cannot contain a
# math span, so the expensive span regex is skipped entirely
_MATH_HINT_RE = re.compile(r"[−×÷∞∑√π^_=/]")


def find_math_spans(text: str) -> list[tuple[int, int, str]]:
    """Detect math-ish spans in plain text and return
    ``(start, end, katex)`` with offsets into ``text`` and the
    normalized KaTeX for each span (SURVEY.md records schema:
    ``equation_spans: list<struct<start,end,katex>>``)."""
    if not _MATH_HINT_RE.search(text):
        return []
    spans: list[tuple[int, int, str]] = []
    for m in _MATH_SPAN_RE.finditer(text):
        raw = m.group(0)
        if len(raw) < 3:
            continue
        spans.append((m.start(), m.end(), normalize_math(raw)))
    return spans


def collapse_whitespace(text: str) -> str:
    """Plain whitespace collapse (the non-math half of M1)."""
    return _WS_RE.sub(" ", text.strip())
