"""Byte-stream HTML tokenizer: one document -> ordered layout blocks.

Re-expresses the reference's layout-container lister
(``/root/reference/scripts/task_boundaries.py:51-100``): where the
reference walks PyMuPDF layout blocks ordered by (page, y), we walk the
HTML character stream once and emit one block per block-level element
boundary.  ``block_id`` is the deterministic document-order key — the
analogue of the reference's (page, y) scan order (SURVEY.md §1.2) — and
every downstream concat sorts by it, never by executor order.

The tokenizer is a single forward scan (no DOM build, no backtracking):

- ``<script>/<style>/...`` subtree content is skipped entirely,
- text inside ``<a>`` accumulates ``link_chars`` (for link-density
  boilerplate classification, Boilerpipe/Readability-style),
- text inside ``<nav>/<footer>/<aside>/<header>`` is flagged
  ``boiler_ctx`` (structural boilerplate),
- ``<pre>/<code>`` subtrees keep their newlines (``pre_ctx``),
- ``<img>`` emits a ``figure`` placeholder block carrying its alt text
  (the analogue of the reference's image containers,
  ``task_boundaries.py:76-82``),
- all other text is whitespace-collapsed per block.

Entities are decoded with ``html.unescape`` (deterministic table).
Malformed HTML never raises: unclosed tags, stray ``<``, nested links
etc. degrade gracefully and deterministically.
"""

from __future__ import annotations

import html as _htmlmod
import re
from dataclasses import dataclass

# Tags whose open OR close flushes the current text run into a block.
BLOCK_TAGS = frozenset(
    (
        "p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd table thead tbody tfoot tr "
        "th td pre blockquote section article header footer nav aside main "
        "form fieldset figure figcaption hr br title body html head option "
        "select textarea caption address summary details"
    ).split()
)

# Subtree content skipped entirely.
SKIP_TAGS = frozenset("script style noscript template svg iframe object".split())

# Structural-boilerplate context tags (subtree flagged, not dropped here —
# classification decides; see classify.py).
BOILER_TAGS = frozenset("nav footer aside header".split())

# Preformatted context (newlines preserved).
PRE_TAGS = frozenset(("pre", "code"))

# Void elements (never pushed on the open-context stacks).
VOID_TAGS = frozenset("br hr img input meta link area base col embed source track wbr".split())

_WS_RE = re.compile(r"[ \t\r\f\v]+")
_NL_RE = re.compile(r"\n{3,}")

KIND_TEXT = "text"
KIND_FIGURE = "figure"


@dataclass
class Block:
    """One layout block. ``block_id`` is document order (≡ (page, y))."""

    block_id: int
    tag: str            # block-level tag context that opened this run
    text: str
    n_chars: int        # len(text)
    link_chars: int     # chars emitted while inside <a>
    depth: int          # element nesting depth at flush time
    boiler_ctx: bool    # inside nav/footer/aside/header subtree
    pre_ctx: bool       # inside pre/code subtree
    kind: str = KIND_TEXT  # tokenizer-level kind: text | figure


_ATTR_ALT_RE = re.compile(r"""\balt\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.I)


def _collapse(pieces: list[str], pre: bool) -> str:
    raw = "".join(pieces)
    if not raw:
        return ""
    txt = _htmlmod.unescape(raw)
    if pre:
        txt = _NL_RE.sub("\n\n", txt)
        return txt.strip("\n\r\t ")
    return " ".join(txt.split())


def tokenize(doc: bytes | str) -> list[Block]:
    """Scan one HTML document into ordered blocks.

    Accepts ``bytes`` (decoded utf-8, errors replaced — deterministic) or
    ``str``. Returns blocks in document order with contiguous
    ``block_id`` starting at 0; whitespace-only runs emit nothing.
    """
    if isinstance(doc, (bytes, bytearray, memoryview)):
        s = bytes(doc).decode("utf-8", errors="replace")
    else:
        s = doc

    blocks: list[Block] = []
    buf: list[str] = []
    buf_link_chars = 0
    depth = 0
    link_depth = 0
    boiler_depth = 0
    pre_depth = 0
    skip_tag: str | None = None  # inside a skipped subtree until </skip_tag>
    cur_tag = "body"
    i = 0
    n = len(s)

    def flush() -> None:
        nonlocal buf, buf_link_chars
        if buf:
            text = _collapse(buf, pre_depth > 0)
            if text:
                blocks.append(
                    Block(
                        block_id=len(blocks),
                        tag=cur_tag,
                        text=text,
                        n_chars=len(text),
                        link_chars=min(buf_link_chars, len(text)),
                        depth=depth,
                        boiler_ctx=boiler_depth > 0,
                        pre_ctx=pre_depth > 0,
                    )
                )
        buf = []
        buf_link_chars = 0

    while i < n:
        lt = s.find("<", i)
        if lt < 0:
            if skip_tag is None:
                piece = s[i:]
                buf.append(piece)
                if link_depth > 0:
                    buf_link_chars += len(piece)
            break
        if lt > i and skip_tag is None:
            piece = s[i:lt]
            buf.append(piece)
            if link_depth > 0:
                buf_link_chars += len(piece)

        # --- parse the markup starting at ``lt`` ---
        if s.startswith("<!--", lt):
            end = s.find("-->", lt + 4)
            i = n if end < 0 else end + 3
            continue
        if lt + 1 < n and s[lt + 1] in "!?":
            end = s.find(">", lt + 1)
            i = n if end < 0 else end + 1
            continue

        # tag name
        j = lt + 1
        closing = j < n and s[j] == "/"
        if closing:
            j += 1
        k = j
        while k < n and (s[k].isalnum() or s[k] in "-_:"):
            k += 1
        name = s[j:k].lower()
        if not name:
            # stray "<" — literal text
            if skip_tag is None:
                buf.append("<")
                if link_depth > 0:
                    buf_link_chars += 1
            i = lt + 1
            continue

        # find tag end, honouring quoted attribute values.
        # fast path: no quote chars before the next '>' (the common
        # case) — one C-level find + substring scan instead of a
        # per-character Python loop.
        p = s.find(">", k)
        if p < 0:
            p = n
        elif '"' in s[k:p] or "'" in s[k:p]:
            p = k
            quote: str | None = None
            while p < n:
                c = s[p]
                if quote is not None:
                    if c == quote:
                        quote = None
                elif c in "\"'":
                    quote = c
                elif c == ">":
                    break
                p += 1
        tag_src = s[lt : p + 1]
        # self-closing only when "/>" follows the tag name directly, a
        # quote, or whitespace — an UNQUOTED attribute value ending in
        # "/" (e.g. <a href=http://x/>) is NOT self-closing (browsers
        # ignore the slash there; found by review)
        self_closing = False
        if tag_src.endswith("/>") and len(tag_src) >= 3:
            prev = tag_src[-3]
            self_closing = prev in " \t\n\r\"'" or tag_src[1:-2].lower() == name
        i = p + 1 if p < n else n

        if skip_tag is not None:
            if closing and name == skip_tag:
                skip_tag = None
            continue

        if not closing and name in SKIP_TAGS:
            if not self_closing:
                skip_tag = name
            continue

        if name == "img":
            flush()
            m = _ATTR_ALT_RE.search(tag_src)
            alt = ""
            if m:
                alt = _htmlmod.unescape(m.group(2) or m.group(3) or m.group(4) or "")
                alt = " ".join(alt.split())
            blocks.append(
                Block(
                    block_id=len(blocks),
                    tag="img",
                    text=alt,
                    n_chars=len(alt),
                    link_chars=0,
                    depth=depth,
                    boiler_ctx=boiler_depth > 0,
                    pre_ctx=False,
                    kind=KIND_FIGURE,
                )
            )
            continue

        if name == "a":
            if closing:
                link_depth = max(0, link_depth - 1)
            elif not self_closing:
                link_depth += 1
            continue

        if name in BLOCK_TAGS:
            flush()
            if name == "br":
                continue
            if closing:
                depth = max(0, depth - 1)
                if name in BOILER_TAGS:
                    boiler_depth = max(0, boiler_depth - 1)
                if name in PRE_TAGS:
                    pre_depth = max(0, pre_depth - 1)
            elif not self_closing and name not in VOID_TAGS:
                depth += 1
                cur_tag = name
                if name in BOILER_TAGS:
                    boiler_depth += 1
                if name in PRE_TAGS:
                    pre_depth += 1
            continue

        if name in PRE_TAGS:  # inline <code>
            flush()
            if closing:
                pre_depth = max(0, pre_depth - 1)
            elif not self_closing:
                pre_depth += 1
            continue

        # inline tag (span, b, i, em, ...): transparent
        continue

    flush()
    return blocks
