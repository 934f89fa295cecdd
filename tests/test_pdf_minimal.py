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


def test_images_only_pdf_without_ocrable_images_raises():
    """No text operators AND no DeviceGray image to OCR (round 4: the
    images-only raise now only covers files the glyph-OCR branch can't
    read either — e.g. a draw op referencing a missing/JPEG image)."""
    p = _pdf([(b"q 100 0 0 80 72 600 cm /Im1 Do Q\n", False)])
    with pytest.raises(NotImplementedError, match="no OCR-able"):
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
    deterministic across runs, no extraction errors, tasks found.
    Round 4: the driver row is per-(src, variant) aggregates; the
    per-doc invariants move to the written oracle artifact."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ocracle_ray.pipelines.queries import PDF_ORACLE_DIR, QUERIES

    a = QUERIES["pdf_branch"]("/root/testdata/sf0.001")
    b = QUERIES["pdf_branch"]("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(a, b)
    # every codec variant present, clean, and with tasks found
    assert set(a["variant"]) == {
        "synthetic", "plain", "xrefstm", "encrypted", "scanned"
    }
    assert (a["n_err"] == 0).all()
    assert (a["n_tasks_sum"] >= 2 * a["n_docs"]).all()
    # per-doc invariants live in the artifact the oracle reads
    perdoc = pq.read_table(f"{PDF_ORACLE_DIR}/current").to_pandas()
    assert (perdoc["branch"] == "pdf").all()
    assert (perdoc["error"] == "").all()
    assert (perdoc["n_tasks"] >= 2).all()
    assert len(perdoc) == int(a["n_docs"].sum())


# ------------------------------------------- PDF 1.5 xref-stream/ObjStm

def test_xrefstm_objstm_extraction_parity():
    """VERDICT r2 #5: a PDF 1.5 file (catalog/page tree inside a
    Flate ObjStm, real /Type /XRef stream, no classic trailer) must
    extract the SAME text as the 1.4 layout of the same content."""
    from ocracle_ray.core.pdf import parse_pdf_blocks
    from ocracle_ray.sources.realpdf import build_exam_pdf, build_exam_pdf_xrefstm

    for i in range(8):
        a = [b.text for b in parse_pdf_blocks(build_exam_pdf(i))]
        b = [b_.text for b_ in parse_pdf_blocks(build_exam_pdf_xrefstm(i))]
        assert a == b and len(a) > 0


def test_xrefstm_layout_is_really_15():
    """The fixture must actually exercise the new branch: no classic
    trailer, an ObjStm holding the catalog, a /Type /XRef stream."""
    from ocracle_ray.sources.realpdf import build_exam_pdf_xrefstm

    raw = build_exam_pdf_xrefstm(2)
    assert b"trailer" not in raw
    assert b"/Type /ObjStm" in raw and b"/Type /XRef" in raw
    assert raw.startswith(b"%PDF-1.5")
    assert b"/Type /Catalog" not in raw  # catalog only inside the ObjStm


def test_expand_object_streams_direct_wins_and_malformed_skipped():
    import zlib

    from ocracle_ray.core.pdf import _expand_object_streams

    inner = b"<< /Type /Page >>\n<< /Len 3 >>\n"
    header = b"5 0 7 18\n"
    data = zlib.compress(header + inner)
    objstm = (
        b"<< /Type /ObjStm /N 2 /First %d /Filter /FlateDecode /Length %d >>"
        b"\nstream\n" % (len(header), len(data)) + data + b"\nendstream"
    )
    objects = {9: objstm, 5: b"<< /Direct 1 >>"}
    out = _expand_object_streams(objects)
    assert out[5] == b"<< /Direct 1 >>"  # direct object wins
    assert b"/Len 3" in out[7]

    # malformed: header shorter than 2N ints -> skipped, no crash
    bad = zlib.compress(b"5\n<<>>")
    objects_bad = {
        1: b"<< /Type /ObjStm /N 2 /First 2 /Filter /FlateDecode /Length %d >>"
        b"\nstream\n" % len(bad) + bad + b"\nendstream"
    }
    assert _expand_object_streams(objects_bad) == objects_bad


def test_structural_streams_not_pages_in_fallback():
    """A file with ObjStm/XRef streams but no parseable page tree must
    not leak xref binary into the text via the every-stream fallback."""
    import zlib

    from ocracle_ray.core.pdf import _page_content_streams, _objects_of

    content = b"BT 72 720 Td (ekte innhold) Tj ET"
    xref_bin = zlib.compress(b"\x01\x00\x10\x00\x00" * 4)
    payload = (
        b"%PDF-1.5\n"
        + (b"1 0 obj\n<< /Length %d >>\nstream\n" % len(content))
        + content
        + b"\nendstream\nendobj\n"
        + (
            b"2 0 obj\n<< /Type /XRef /W [1 2 2] /Filter /FlateDecode "
            b"/Length %d >>\nstream\n" % len(xref_bin)
        )
        + xref_bin
        + b"\nendstream\nendobj\n"
    )
    objects = _objects_of(payload)
    streams = _page_content_streams(objects, payload)
    assert streams == [content]


def test_scanned_fax_twin_extracts_identically():
    """CCITT G4 fax pages (round 4, late) must extract byte-identical
    text to their Flate-gray scanned twins — the fax decode path
    (core.ccitt) slots into the same OCR branch."""
    from ocracle_ray.core.pdf import parse_pdf_blocks
    from ocracle_ray.sources.realpdf import (
        build_exam_pdf_scanned,
        build_exam_pdf_scanned_fax,
    )

    for i in (2, 7, 17):
        flate = parse_pdf_blocks(build_exam_pdf_scanned(i))
        fax_pdf = build_exam_pdf_scanned_fax(i)
        assert b"/CCITTFaxDecode" in fax_pdf and b"/FlateDecode" not in fax_pdf
        fax = parse_pdf_blocks(fax_pdf)
        assert [b.text for b in fax] == [b.text for b in flate]
        assert fax and all(b.text for b in fax)
