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
