"""Deterministic block classification: text | code | math | figure | boilerplate.

Rule set (fixed order, integer/ratio comparisons only — no float
accumulation order dependence, SURVEY.md §7.4):

1. tokenizer ``figure`` blocks stay ``figure`` — unless the block's alt
   text is ≥ 95% of the document's total text, in which case it is
   reclassified ``text`` (the full-page image→text reclass rule,
   ``/root/reference/scripts/task_boundaries.py:112-119``).
2. blocks shorter than ``MIN_BLOCK_CHARS`` are ``drop`` — the analogue of
   the reference's <20 px wide / <8 px tall container filter
   (``task_boundaries.py:73-75``).
3. ``title`` blocks and structural nav/footer/aside/header context →
   ``boilerplate``.
4. link density ≥ 1/2 (``2*link_chars >= n_chars``) → ``boilerplate``
   (Boilerpipe/Readability-style link-density heuristic).
5. admin-phrase blacklist hit → ``boilerplate`` (M13).
6. ``pre``/``code`` context, or code-token density — the deterministic
   stand-in for the reference's LLM code detector
   (``prompts/detect_code.txt``, used at ``extract_images.py:316-324``)
   and its text-shape heuristics ``ratio = len/(newlines+1)`` and
   squeezed avg word length (``extract_images.py:297-311``) → ``code``.
7. unicode math symbols or ≥ 2 TeX-ish operator hits → ``math``.
8. otherwise ``text``.
"""

from __future__ import annotations

import re

from .boilerplate import is_admin_text
from .html_tokenizer import Block

KIND_TEXT = "text"
KIND_CODE = "code"
KIND_MATH = "math"
KIND_FIGURE = "figure"
KIND_BOILER = "boilerplate"
KIND_DROP = "drop"

# Body kinds contribute to extracted_text.
BODY_KINDS = frozenset((KIND_TEXT, KIND_CODE, KIND_MATH))

MIN_BLOCK_CHARS = 2          # analogue of the 20×8 px rule (M3)
FULL_PAGE_RATIO = 0.95       # task_boundaries.py:117 full-page reclass
LINE_RATIO_MAX = 20          # extract_images.py:305 ratio_max
AVG_WORD_LEN_MAX = 3         # extract_images.py:306 avg_word_len_max

_WORD_RE = re.compile(r"\b[a-zA-ZæøåÆØÅ0-9]+\b")   # extract_images.py:299
_SQUEEZE_RE = re.compile(r"(.)\1{2,}")             # extract_images.py:300
_MATH_SYMS = "−×÷∞∑√π≤≥≠±∫"
_TEX_OP_RE = re.compile(r"(\\frac|\\sum|\\sqrt|\^|_\{|\d\s*[=+*/^]\s*\d|=)")

_CODE_TOKENS = frozenset(
    (
        "def return import for while if else elif class lambda print "
        "int float double void const static public private new null "
        "true false function var let fn match struct"
    ).split()
)
_CODE_PUNCT_RE = re.compile(r"[{};]|==|->|:=|\+\+|//|#include|</?\w+>")


def avg_word_len(text: str) -> float:
    """Squeezed average word length (``extract_images.py:299-302``):
    repeated runs of ≥3 identical chars collapse to one before measuring."""
    words = _WORD_RE.findall(text)
    words = [_SQUEEZE_RE.sub(r"\1", w) for w in words]
    if not words:
        return 0.0
    return sum(len(w) for w in words) / len(words)


def line_ratio(text: str) -> float:
    """chars per line, ``len(text)/(count('\\n')+1)`` (``extract_images.py:298``)."""
    return len(text) / (text.count("\n") + 1)


def looks_like_code(text: str) -> bool:
    words = text.split()
    if not words:
        return False
    hits = sum(1 for w in words if w in _CODE_TOKENS)
    punct = len(_CODE_PUNCT_RE.findall(text))
    # integer-ratio comparison: (keyword hits + punct hits) / words >= 1/4
    return 4 * (hits + punct) >= len(words) and (hits + punct) >= 2


def looks_like_math(text: str) -> bool:
    if any(c in text for c in _MATH_SYMS):
        return True
    return len(_TEX_OP_RE.findall(text)) >= 2


def classify_block(b: Block, total_chars: int) -> str:
    if b.kind == KIND_FIGURE:
        if total_chars > 0 and 100 * b.n_chars >= FULL_PAGE_RATIO * 100 * total_chars:
            return KIND_TEXT
        return KIND_FIGURE
    if b.n_chars < MIN_BLOCK_CHARS:
        return KIND_DROP
    if b.tag == "title" or b.boiler_ctx:
        return KIND_BOILER
    if 2 * b.link_chars >= b.n_chars:
        return KIND_BOILER
    if is_admin_text(b.text):
        return KIND_BOILER
    if b.pre_ctx or looks_like_code(b.text):
        return KIND_CODE
    if looks_like_math(b.text):
        return KIND_MATH
    return KIND_TEXT


def classify_blocks(blocks: list[Block]) -> list[str]:
    """Classify every block; ``total_chars`` feeds the full-page reclass."""
    total = sum(b.n_chars for b in blocks)
    return [classify_block(b, total) for b in blocks]
