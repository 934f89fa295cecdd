"""Math normalizer goldens — pass order mirrors text_normalization.py."""

from ocracle_ray.core.normalize import collapse_whitespace, find_math_spans, normalize_math


def test_symbol_table():
    assert normalize_math("a−b") == "a - b"
    assert normalize_math("π") == "\\pi"
    assert normalize_math("∞") == "\\infty"
    assert normalize_math("∑") == "\\sum"
    assert normalize_math("√") == "\\sqrt"


def test_fraction():
    assert normalize_math("1/2") == "\\frac{1}{2}"


def test_subscript():
    assert normalize_math("x_i") == "x_{i}"


def test_caret_becomes_double_star():
    # '^' -> '**' happens before the superscript regex (reference pass
    # order), so no ^{...} can ever appear.
    out = normalize_math("x^2")
    assert "^{" not in out
    assert "*" in out


def test_operator_spacing_and_collapse():
    assert normalize_math("a=b") == "a = b"
    assert normalize_math("  a   =    b ") == "a = b"


def test_semicolon_to_colon():
    assert normalize_math("a;b") == "a:b"


def test_deterministic():
    s = "v = v_0 + a×t − 1/2"
    assert normalize_math(s) == normalize_math(s)


def test_find_math_spans_offsets():
    text = "Vi har at E = m×c^2 i dette tilfellet."
    spans = find_math_spans(text)
    assert spans, "math span must be detected"
    start, end, katex = spans[0]
    assert "×" in text[start:end] or "=" in text[start:end]
    assert "\\times" in katex


def test_collapse_whitespace():
    assert collapse_whitespace("  a\n\t b  ") == "a b"
