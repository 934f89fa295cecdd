"""OCRSYN PDF layout parser tests: px drop rule, reading order, merge."""

import pytest

from ocracle_ray.core.pdf import is_pdf, parse_pdf_blocks


def _payload(lines):
    return ("\n".join(["%PDF-1.4", "%OCRSYN"] + lines + ["%%EOF"])).encode()


def test_sniff():
    assert is_pdf(b"%PDF-1.4\nx")
    assert not is_pdf(b"<html>")


def test_reading_order_sorts_page_y_x():
    p = _payload(
        [
            "/Page 2",
            "BT 72 40 400 14 (second page) ET",
            "/Page 1",
            "BT 72 100 400 14 (first page low) ET",
            "BT 72 40 400 14 (first page top) ET",
        ]
    )
    blocks = parse_pdf_blocks(p)
    joined = " | ".join(b.text for b in blocks)
    assert joined.index("first page top") < joined.index("first page low")
    assert joined.index("first page low") < joined.index("second page")


def test_px_drop_rule():
    # <20 wide or <8 tall dropped (task_boundaries.py:73-75)
    p = _payload(
        [
            "BT 72 40 10 14 (narrow) ET",
            "BT 72 80 400 4 (short) ET",
            "BT 72 120 400 14 (kept) ET",
        ]
    )
    blocks = parse_pdf_blocks(p)
    assert [b.text for b in blocks] == ["kept"]


def test_run_merge_within_gap():
    p = _payload(
        [
            "BT 72 40 400 14 (line one) ET",
            "BT 72 56 400 14 (line two) ET",   # gap 2 <= 16: merged
            "BT 72 200 400 14 (far away) ET",  # gap large: new block
        ]
    )
    blocks = parse_pdf_blocks(p)
    assert blocks[0].text == "line one line two"
    assert blocks[1].text == "far away"


def test_image_run_is_figure():
    p = _payload(["BT 72 40 400 14 (text) ET", "IM 72 100 300 200 (en figur) ET"])
    blocks = parse_pdf_blocks(p)
    assert blocks[1].kind == "figure"
    assert blocks[1].text == "en figur"


def test_escapes():
    p = _payload([r"BT 72 40 400 14 (f\(x\) = y \\ z) ET"])
    blocks = parse_pdf_blocks(p)
    assert blocks[0].text == "f(x) = y \\ z"


def test_real_pdf_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        parse_pdf_blocks(b"%PDF-1.7\nbinary pdf without OCRSYN marker")


# ---------------------------------------------------------- encryption (r4)

def test_encrypted_empty_password_parity():
    """RC4 empty-user-password files (R2 and R3, plain and Flate) must
    extract byte-identical text to their unencrypted twins."""
    from ocracle_ray.core.pdf import parse_pdf_blocks
    from ocracle_ray.sources.realpdf import build_exam_pdf, build_exam_pdf_encrypted

    for i in range(8):
        plain = [b.text for b in parse_pdf_blocks(build_exam_pdf(i))]
        enc = [b.text for b in parse_pdf_blocks(build_exam_pdf_encrypted(i))]
        assert plain == enc and plain


def test_encrypted_locked_file_raises():
    """A NON-empty user password must stay a loud error row, not
    silently-garbled text."""
    import pytest

    from ocracle_ray.core.pdf import parse_pdf_blocks
    from ocracle_ray.sources.realpdf import build_exam_pdf_encrypted

    locked = build_exam_pdf_encrypted(1, user_pw=b"hunter2")
    with pytest.raises(NotImplementedError, match="password-locked"):
        parse_pdf_blocks(locked)


def test_encrypted_v4_without_crypt_filter_raises():
    """/V 4 with no recognizable /CFM must raise the
    unsupported-handler error, not decrypt garbage (real V4 support is
    crypt-filter-based — tests/test_pdf_aes.py)."""
    import pytest

    from ocracle_ray.core.pdf import parse_pdf_blocks
    from ocracle_ray.sources.realpdf import build_exam_pdf_encrypted

    doc = build_exam_pdf_encrypted(2, mode="rc4-128")
    doc = doc.replace(b"/V 2 /R 3", b"/V 4 /R 4")
    with pytest.raises(NotImplementedError, match="unsupported"):
        parse_pdf_blocks(doc)


def test_encrypted_in_pipeline(ray_session):
    """Encrypted fixtures flow through the Extract actor pool as
    non-error records with text parity to their unencrypted twins."""
    import pyarrow as pa
    import ray.data as rd

    from ocracle_ray.pipelines.extraction import extract_records
    from ocracle_ray.sources.realpdf import real_pdf_pages_table

    t = real_pdf_pages_table(20)
    recs = (
        extract_records(rd.from_arrow(t).repartition(2), concurrency=2)
        .to_pandas()
        .set_index("url")
    )
    # i%5==4 and i%3!=2 -> encrypted: 4, 9, 19 (14 is i%3==2)
    enc_urls = [u for j, u in enumerate(t["url"].to_pylist()) if j % 5 == 4 and j % 3 != 2]
    assert enc_urls
    for u in enc_urls:
        assert recs.loc[u, "error"] is None or recs.loc[u, "error"] == ""
        assert recs.loc[u, "n_blocks"] > 0


# ------------------------------------------------------- scanned OCR (r4)

def test_scanned_pdf_ocr_byte_identity():
    """Images-only scans extract BYTE-IDENTICAL blocks to their text
    twins — the product invariant, via glyph-template OCR under
    bounded deterministic speckle noise."""
    from ocracle_ray.core.pdf import parse_pdf_blocks
    from ocracle_ray.sources.realpdf import build_exam_pdf, build_exam_pdf_scanned

    for i in range(8):
        plain = [b.text for b in parse_pdf_blocks(build_exam_pdf(i))]
        scanned = [b.text for b in parse_pdf_blocks(build_exam_pdf_scanned(i))]
        assert plain == scanned and plain


def test_scanned_pdf_has_no_text_operators():
    """The scanned fixture must genuinely be images-only (no BT) — or
    the OCR test above would be vacuous."""
    from ocracle_ray.sources.realpdf import build_exam_pdf_scanned

    raw = build_exam_pdf_scanned(3)
    assert b"BT" not in raw.replace(b"ObjStm", b"")  # no text operators
    assert b"/Subtype /Image" in raw


def test_scanned_in_pipeline(ray_session):
    """Scanned fixtures flow through the Extract actor pool as
    non-error records whose fingerprints EQUAL the text twins'."""
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from ocracle_ray.pipelines.extraction import extract_records
    from ocracle_ray.sources.realpdf import build_exam_pdf, build_exam_pdf_scanned
    from ocracle_ray.sources.pages import EPOCH_2024_US

    rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    for i in range(6):
        for kind, builder in (("text", build_exam_pdf), ("scan", build_exam_pdf_scanned)):
            rows["url"].append(f"https://exam.example/{kind}/{i}")
            rows["warc_ts"].append(
                datetime.datetime.utcfromtimestamp(EPOCH_2024_US / 1e6)
            )
            rows["html"].append(builder(i))
            rows["text"].append("")
            rows["lang"].append("nb")
    t = pa.Table.from_pydict(
        rows,
        schema=pa.schema(
            [("url", pa.string()), ("warc_ts", pa.timestamp("us")),
             ("html", pa.large_binary()), ("text", pa.large_string()),
             ("lang", pa.string())]
        ),
    )
    recs = (
        extract_records(rd.from_arrow(t).repartition(2), concurrency=2)
        .to_pandas()
        .set_index("url")
    )
    for i in range(6):
        a = recs.loc[f"https://exam.example/text/{i}"]
        b = recs.loc[f"https://exam.example/scan/{i}"]
        assert not b["error"]
        assert a["text_fingerprint"] == b["text_fingerprint"]
        assert a["extracted_text"] == b["extracted_text"]
