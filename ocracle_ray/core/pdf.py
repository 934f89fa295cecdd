"""Deterministic PDF layout parsing — the engine's PDF branch.

The reference renders PDF pages with PyMuPDF and walks layout blocks in
(page, y) order, dropping containers narrower than 20 px or shorter than
8 px (``/root/reference/scripts/task_boundaries.py:51-100``). This
container has no PDF rasterizer (no PyMuPDF/OpenCV), so:

- real PDF bytes are parsed only when ``fitz`` is importable (it is not
  here) — gated behind an import-try, raising a clearly-marked
  ``NotImplementedError`` otherwise;
- the fixture generator (``sources/pages.py``) emits a synthetic
  ``%PDF-``-prefixed micro-format ("OCRSYN") that mimics PDF text runs
  with explicit layout, so the *Ray-side plumbing* — actor-pool stage,
  (page, y, x) reading-order sort, px drop rule, run→block merge — is
  real and tested even though the decoder is synthetic.

OCRSYN format (one text run per line, y grows downward like PyMuPDF)::

    %PDF-1.4
    %OCRSYN
    /Page 1
    BT <x> <y> <w> <h> (text with \\( \\) \\\\ escapes) ET
    IM <x> <y> <w> <h> (alt text) ET
    %%EOF
"""

from __future__ import annotations

import re

from .html_tokenizer import Block

try:  # pragma: no cover - not available in this container
    import fitz  # type: ignore
except ImportError:
    fitz = None

MIN_W = 20   # task_boundaries.py:73-75 drop rule
MIN_H = 8
MERGE_GAP = 16  # consecutive runs closer than this merge into one block

_PAGE_RE = re.compile(r"^/Page\s+(\d+)\s*$")
_RUN_RE = re.compile(r"^(BT|IM)\s+(-?\d+)\s+(-?\d+)\s+(\d+)\s+(\d+)\s+\((.*)\)\s+ET\s*$")
_UNESC_RE = re.compile(r"\\([()\\])")


def is_pdf(payload: bytes) -> bool:
    return payload[:5] == b"%PDF-"


def _unescape(s: str) -> str:
    return _UNESC_RE.sub(r"\1", s)


def parse_pdf_blocks(payload: bytes) -> list[Block]:
    """Parse a PDF payload into ordered layout blocks.

    Synthetic OCRSYN payloads are parsed natively; real PDFs require the
    (absent) PyMuPDF backend. Returns blocks in deterministic
    (page, y, x) reading order with contiguous ``block_id``.
    """
    text = payload.decode("utf-8", errors="replace")
    lines = text.split("\n")
    if len(lines) < 2 or lines[1].strip() != "%OCRSYN":
        if fitz is None:
            raise NotImplementedError(
                "real-PDF layout parsing needs PyMuPDF, which is not "
                "installed in this container; only OCRSYN synthetic "
                "payloads are supported (see module docstring)"
            )
        return _parse_real_pdf(payload)  # pragma: no cover

    runs: list[tuple[int, int, int, int, int, str, str]] = []
    page = 1
    for line in lines:
        line = line.strip()
        pm = _PAGE_RE.match(line)
        if pm:
            page = int(pm.group(1))
            continue
        rm = _RUN_RE.match(line)
        if not rm:
            continue
        op, xs, ys, ws, hs, raw = rm.groups()
        x, y, w, h = int(xs), int(ys), int(ws), int(hs)
        if w < MIN_W or h < MIN_H:   # px drop rule
            continue
        runs.append((page, y, x, w, h, op, _unescape(raw)))

    runs.sort(key=lambda r: (r[0], r[1], r[2]))  # reading order

    blocks: list[Block] = []
    cur_texts: list[str] = []
    cur_page = cur_y = cur_h = None

    def flush() -> None:
        nonlocal cur_texts
        if cur_texts:
            txt = " ".join(" ".join(cur_texts).split())
            if txt:
                blocks.append(
                    Block(
                        block_id=len(blocks),
                        tag="pdf",
                        text=txt,
                        n_chars=len(txt),
                        link_chars=0,
                        depth=0,
                        boiler_ctx=False,
                        pre_ctx=False,
                    )
                )
        cur_texts = []

    for page, y, x, w, h, op, txt in runs:
        if op == "IM":
            flush()
            cur_page = cur_y = None
            alt = " ".join(txt.split())
            blocks.append(
                Block(
                    block_id=len(blocks),
                    tag="img",
                    text=alt,
                    n_chars=len(alt),
                    link_chars=0,
                    depth=0,
                    boiler_ctx=False,
                    pre_ctx=False,
                    kind="figure",
                )
            )
            continue
        if (
            cur_page is not None
            and page == cur_page
            and cur_y is not None
            and y - (cur_y + (cur_h or 0)) <= MERGE_GAP
        ):
            cur_texts.append(txt)
        else:
            flush()
            cur_texts = [txt]
        cur_page, cur_y, cur_h = page, y, h

    flush()
    return blocks


def _parse_real_pdf(payload: bytes) -> list[Block]:  # pragma: no cover
    """PyMuPDF path, mirroring task_boundaries.py:51-100 (unreachable in
    this container; kept for parity with the reference's backend)."""
    import io

    blocks: list[Block] = []
    with fitz.open(stream=io.BytesIO(payload), filetype="pdf") as doc:  # type: ignore
        for page_num, page in enumerate(doc):
            for block in page.get_text("dict")["blocks"]:
                x0, y0, x1, y1 = block["bbox"]
                if (x1 - x0) < MIN_W or (y1 - y0) < MIN_H:
                    continue
                if "lines" not in block:
                    continue
                txt = " ".join(
                    span["text"]
                    for line in block["lines"]
                    for span in line["spans"]
                )
                txt = " ".join(txt.split())
                if not txt:
                    continue
                blocks.append(
                    Block(
                        block_id=len(blocks),
                        tag="pdf",
                        text=txt,
                        n_chars=len(txt),
                        link_chars=0,
                        depth=0,
                        boiler_ctx=False,
                        pre_ctx=False,
                    )
                )
    return blocks
