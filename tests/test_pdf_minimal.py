"""Stdlib real-PDF text extraction (core/pdf.py _parse_minimal_pdf):
hand-built minimal PDF byte payloads — object scan, page-tree walk,
FlateDecode, BT/ET text ops, reading order, escapes, TJ kerning."""

import zlib

import pytest

from ocracle_ray.core.pdf import parse_pdf_blocks


def _pdf(pages: list[tuple[bytes, bool]]) -> bytes:
    """A minimal well-formed PDF: catalog -> pages -> kids, one content
    stream per page, optionally Flate-compressed. No xref table — the
    parser scans objects directly (and real readers rebuild xref too)."""
    n = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode(),
    }
    for i, (stream, comp) in enumerate(pages):
        data = zlib.compress(stream) if comp else stream
        filt = b"/Filter /FlateDecode " if comp else b""
        objs[3 + 2 * i] = (
            f"<< /Type /Page /Parent 2 0 R /Contents {4 + 2 * i} 0 R "
            f"/MediaBox [0 0 612 792] >>".encode()
        )
        objs[4 + 2 * i] = (
            b"<< " + filt + f"/Length {len(data)} >>".encode()
            + b"\nstream\n" + data + b"\nendstream"
        )
    body = b"".join(
        f"{oid} 0 obj\n".encode() + objs[oid] + b"\nendobj\n" for oid in sorted(objs)
    )
    return b"%PDF-1.4\n" + body + b"trailer\n<< /Root 1 0 R /Size 99 >>\n%%EOF\n"


def test_single_page_plain_stream():
    p = _pdf([(
        b"BT /F1 12 Tf 72 700 Td (Oppgave 1) Tj ET\n"
        b"BT /F1 12 Tf 72 650 Td (Hva er 2+2?) Tj ET\n",
        False,
    )])
    blocks = parse_pdf_blocks(p)
    assert [b.text for b in blocks] == ["Oppgave 1", "Hva er 2+2?"]


def test_reading_order_top_down_despite_stream_order():
    # PDF y grows UP: the LOWER y (400) appears first in the stream but
    # must come LAST in reading order
    p = _pdf([(
        b"BT 72 400 Td (nederst) Tj ET\n"
        b"BT 72 700 Td (oeverst) Tj ET\n",
        False,
    )])
    assert [b.text for b in parse_pdf_blocks(p)] == ["oeverst", "nederst"]


def test_flate_stream_and_multi_page_order():
    p1 = b"BT 72 700 Td (side en) Tj ET\n"
    p2 = b"BT 72 700 Td (side to) Tj ET\n"
    p = _pdf([(p1, True), (p2, True)])
    assert [b.text for b in parse_pdf_blocks(p)] == ["side en", "side to"]


def test_tj_array_kerning():
    # kern -50 is sub-threshold (no space); -250 renders as a space
    p = _pdf([(b"BT 72 700 Td [(Opp) -50 (gave) -250 (2)] TJ ET\n", False)])
    assert [b.text for b in parse_pdf_blocks(p)] == ["Oppgave 2"]


def test_string_escapes_and_octal():
    p = _pdf([(rb"BT 72 700 Td (caf\351 \(x\) = y \\ z) Tj ET" + b"\n", False)])
    assert [b.text for b in parse_pdf_blocks(p)] == ["café (x) = y \\ z"]


def test_hex_string():
    p = _pdf([(b"BT 72 700 Td <4F70 7067 6176 65> Tj ET\n", False)])
    assert [b.text for b in parse_pdf_blocks(p)] == ["Oppgave"]


def test_quote_operator_advances_line():
    # 30pt leading > MERGE_GAP: the two lines become separate blocks
    p = _pdf([(b"BT 30 TL 72 700 Td (linje en) Tj (linje to) ' ET\n", False)])
    assert [b.text for b in parse_pdf_blocks(p)] == ["linje en", "linje to"]


def test_close_lines_merge_into_one_block():
    # Td then T* with 14pt leading <= MERGE_GAP: one merged block
    p = _pdf([(
        b"BT 14 TL 72 700 Td (linje en) Tj T* (linje to) Tj ET\n",
        False,
    )])
    assert [b.text for b in parse_pdf_blocks(p)] == ["linje en linje to"]


def test_contents_without_space_is_parsed():
    """Review r2: '/Contents[4 0 R]' (no space — legal PDF syntax) must
    not silently drop the page's text."""
    raw = _pdf([
        (b"BT 72 700 Td (side en) Tj ET\n", False),
        (b"BT 72 700 Td (side to) Tj ET\n", False),
    ])
    squeezed = raw.replace(b"/Contents 6 0 R", b"/Contents[6 0 R]")
    assert squeezed != raw
    assert [b.text for b in parse_pdf_blocks(squeezed)] == ["side en", "side to"]


def test_images_only_pdf_raises():
    p = _pdf([(b"q 100 0 0 80 72 600 cm /Im1 Do Q\n", False)])
    with pytest.raises(NotImplementedError, match="images-only"):
        parse_pdf_blocks(p)


def test_encrypted_pdf_raises():
    raw = _pdf([(b"BT 72 700 Td (hemmelig) Tj ET\n", False)])
    enc = raw.replace(b"trailer\n<< /Root", b"trailer\n<< /Encrypt 9 0 R /Root")
    with pytest.raises(NotImplementedError, match="encrypted"):
        parse_pdf_blocks(enc)


def test_garbage_real_pdf_still_raises():
    with pytest.raises(NotImplementedError):
        parse_pdf_blocks(b"%PDF-1.7\nbinary pdf without objects")


def test_real_pdf_pipeline_query_stable_and_clean():
    """pdf_branch: real PDFs through the actor-pool pipeline —
    deterministic across runs, no extraction errors, tasks found."""
    import pandas as pd

    from ocracle_ray.pipelines.queries import QUERIES

    a = QUERIES["pdf_branch"]("/root/testdata/sf0.001")
    b = QUERIES["pdf_branch"]("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(a, b)
    assert (a["branch"] == "pdf").all()
    assert (a["error"] == "").all()
    assert (a["n_tasks"] >= 2).all()
