"""Block classifier branch coverage (FIXTURES.md T3 spirit)."""

from ocracle_ray.core.classify import (
    KIND_BOILER,
    KIND_CODE,
    KIND_DROP,
    KIND_FIGURE,
    KIND_MATH,
    KIND_TEXT,
    avg_word_len,
    classify_blocks,
    line_ratio,
)
from ocracle_ray.core.html_tokenizer import tokenize


def _kinds(html: bytes):
    blocks = tokenize(html)
    return list(zip([b.text for b in blocks], classify_blocks(blocks)))


def test_plain_text():
    out = _kinds(b"<p>En vanlig setning om fysikk og bevegelse i planet.</p>")
    assert out[0][1] == KIND_TEXT


def test_link_density_boiler():
    out = _kinds(b'<p><a href="/a">alle ordene er lenker her</a></p>')
    assert out[0][1] == KIND_BOILER


def test_admin_phrase_boiler():
    out = _kinds(b"<p>Denne oppgaven skal besvares i Inspera uten papir.</p>")
    assert out[0][1] == KIND_BOILER


def test_nav_context_boiler():
    out = _kinds(b"<nav><p>Hjem og arkiv og emner og kontakt</p></nav>")
    assert out[0][1] == KIND_BOILER


def test_title_boiler():
    out = _kinds(b"<title>IFYX1000 eksamen</title><p>body tekst her er fin</p>")
    assert out[0][1] == KIND_BOILER
    assert out[1][1] == KIND_TEXT


def test_pre_is_code():
    out = _kinds(b"<pre>def f():\n    return 1</pre>")
    assert out[0][1] == KIND_CODE


def test_code_token_density():
    out = _kinds(b"<p>def main(): import numpy return x { }</p>")
    assert out[0][1] == KIND_CODE


def test_math_symbols():
    out = _kinds("<p>E = m×c^2 gir oss π</p>".encode())
    assert out[0][1] == KIND_MATH


def test_short_block_dropped():
    out = _kinds(b"<p>a</p><p>lang nok tekst her</p>")
    assert out[0][1] == KIND_DROP


def test_figure_block():
    out = _kinds(b'<img src="x.png" alt="figur av graf"><p>omkringliggende tekst</p>')
    assert out[0][1] == KIND_FIGURE


def test_fullpage_figure_reclass_to_text():
    # alt text >= 95% of total text -> text (task_boundaries.py:112-119)
    big_alt = "mange ord " * 50
    html = f'<img src="x.png" alt="{big_alt}"><p>x y</p>'.encode()
    out = _kinds(html)
    assert out[0][1] == KIND_TEXT


def test_reference_shape_helpers():
    assert line_ratio("abc\ndef") == 3.5
    assert avg_word_len("aaa bb") < 3  # 'aaa' squeezed to 'a'
