"""HTML tokenizer unit tests (hand-written goldens, no Ray)."""

from ocracle_ray.core.html_tokenizer import tokenize


def test_basic_blocks():
    blocks = tokenize(b"<html><body><p>Hello world</p><p>Second para</p></body></html>")
    texts = [b.text for b in blocks]
    assert texts == ["Hello world", "Second para"]
    assert [b.block_id for b in blocks] == [0, 1]


def test_whitespace_collapse_and_entities():
    blocks = tokenize(b"<p>  a &amp; b\n\n   c&nbsp;d </p>")
    # &nbsp; decodes to \xa0 which whitespace-collapse folds to ' '
    assert blocks[0].text == "a & b c d"


def test_script_style_skipped():
    blocks = tokenize(b"<p>keep</p><script>var x = '<p>no</p>';</script><style>p{}</style><p>after</p>")
    assert [b.text for b in blocks] == ["keep", "after"]


def test_link_chars_counted():
    blocks = tokenize(b'<p>plain <a href="/x">linked text</a> tail</p>')
    b = blocks[0]
    assert b.text == "plain linked text tail"
    assert b.link_chars == len("linked text")


def test_nav_flagged_boiler_ctx():
    blocks = tokenize(b"<nav><ul><li><a href='/'>Home</a></li></ul></nav><p>body</p>")
    assert blocks[0].boiler_ctx is True
    assert blocks[-1].boiler_ctx is False


def test_pre_preserves_newlines():
    blocks = tokenize(b"<pre>def f():\n    return 1</pre>")
    assert blocks[0].text == "def f():\n    return 1"
    assert blocks[0].pre_ctx is True


def test_img_emits_figure_block():
    blocks = tokenize(b'<p>before</p><img src="x.png" alt="en figur"><p>after</p>')
    kinds = [b.kind for b in blocks]
    assert kinds == ["text", "figure", "text"]
    assert blocks[1].text == "en figur"


def test_malformed_never_raises():
    for payload in (b"", b"<", b"<p>unclosed", b"</p></p>>", b"<a><a><p>x</p>",
                    b"\xff\xfe garbage <p>ok</p>", b"<p attr='>'>quoted</p>"):
        blocks = tokenize(payload)
        assert isinstance(blocks, list)


def test_quoted_gt_in_attr():
    blocks = tokenize(b"<p title=\"a > b\">text</p>")
    assert blocks[0].text == "text"


def test_deterministic():
    payload = b"<div><p>a</p><nav>n</nav><pre>c</pre></div>"
    assert [vars(b) for b in tokenize(payload)] == [vars(b) for b in tokenize(payload)]
