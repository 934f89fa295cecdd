"""Hypothesis property tests: robustness + determinism of the pure core."""

from hypothesis import given, settings, strategies as st

from ocracle_ray.core.extract import extract_document
from ocracle_ray.core.html_tokenizer import tokenize
from ocracle_ray.core.normalize import find_math_spans, normalize_math
from ocracle_ray.core.segment import segment_text
from ocracle_ray.core.translate import translate_nn_to_nb
from ocracle_ray.core.textstats import detect_lang, fingerprint, quality_score


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2000))
def test_tokenizer_never_raises_and_is_deterministic(payload):
    a = tokenize(payload)
    b = tokenize(payload)
    assert [vars(x) for x in a] == [vars(x) for x in b]
    assert [x.block_id for x in a] == list(range(len(a)))


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2000))
def test_extract_document_never_raises(payload):
    rec = extract_document("u", payload, "nb")
    assert isinstance(rec["extracted_text"], str)
    assert rec["n_tasks"] == len(rec["tasks"])


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=500))
def test_segment_offsets_in_bounds(text):
    for seg in segment_text(text):
        assert 0 <= seg.start <= seg.end <= len(text)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_math_spans_ordered_and_bounded(text):
    spans = find_math_spans(text)
    last_end = 0
    for start, end, katex in spans:
        assert 0 <= start <= end <= len(text)
        assert start >= last_end  # non-overlapping, document order
        last_end = end
        assert isinstance(katex, str)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_normalize_math_deterministic_and_collapsed(text):
    out = normalize_math(text)
    assert out == normalize_math(text)
    assert "  " not in out


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_textstats_total_functions(text):
    assert 0.0 <= quality_score(text) <= 1.0
    assert detect_lang(text) in ("en", "de", "es", "fr", "nb", "nn", "zh", "und")
    assert 0 <= fingerprint(text) < 2 ** 63


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_translate_idempotent_on_bokmaal_output(text):
    once = translate_nn_to_nb(text)
    # wordlist maps nn->nb; nb output contains no nn keys, so stable
    assert translate_nn_to_nb(once) == once


def test_translate_examples():
    assert translate_nn_to_nb("Kva er ikkje eit svar?") == "Hva er ikke et svar?"
    assert translate_nn_to_nb("Oppgåve 1: rekne ut") == "Oppgave 1: regne ut"


def test_ignored_topics_filter():
    html = (
        "<p>Oppgave 1\nSkriv en funksjon i python med en løkke over en liste "
        "som gjør noe fint og langt nok her. Maks poeng: 5</p>"
        "<p>Oppgave 2\nFinn kraften som virker på klossen når friksjon og "
        "masse er oppgitt i systemet her. Maks poeng: 3</p>"
    ).encode()
    rec = extract_document("u", html, "nb")
    topics = {t["topic"] for t in rec["tasks"]}
    assert "Programmering" in topics and "Dynamikk" in topics
    rec2 = extract_document("u", html, "nb", ignored_topics=frozenset(["Programmering"]))
    topics2 = {t["topic"] for t in rec2["tasks"]}
    assert "Programmering" not in topics2 and "Dynamikk" in topics2
    assert rec2["n_invalid_segments"] == rec["n_invalid_segments"] + 1


def test_translate_nn_in_pipeline_opt_in():
    html = ("<p>Oppgåve 1\nKva er ikkje eit svar på dette? Forklar korleis "
            "du rekne ut verdien i systemet her. Maks poeng: 3</p>").encode()
    plain = extract_document("u", html, "nn")
    translated = extract_document("u", html, "nn", translate_nn=True)
    # extracted_text (byte-identity surface) is untouched
    assert plain["extracted_text"] == translated["extracted_text"]
    # task_text rewrites nn words
    assert "Kva" in plain["tasks"][0]["task_text"]
    assert "Hva" in translated["tasks"][0]["task_text"]
    # non-nn rows are never translated
    nb = extract_document("u", html, "nb", translate_nn=True)
    assert nb["tasks"][0]["task_text"] == plain["tasks"][0]["task_text"]


# ---------------------------------------------------------------- dedup

from hypothesis import HealthCheck
from ocracle_ray.core.dedup import (
    jaccard as _jaccard,
    lsh_band_hashes,
    minhash_signature,
)
from ocracle_ray.core.textstats import winnowing_fingerprints

_words = st.lists(st.sampled_from("en to tre fire fem seks sju åtte ni ti".split()),
                  min_size=0, max_size=40)


@settings(max_examples=100, deadline=None)
@given(_words)
def test_minhash_identical_text_identical_signature(ws):
    text = " ".join(ws)
    a = minhash_signature(text)
    b = minhash_signature(text)
    assert (a == b).all()
    assert _jaccard(text, text) == 1.0 or text == ""


@settings(max_examples=50, deadline=None)
@given(_words, _words)
def test_jaccard_symmetric_and_bounded(wa, wb):
    a, b = " ".join(wa), " ".join(wb)
    j = _jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == _jaccard(b, a)


@settings(max_examples=50, deadline=None)
@given(_words)
def test_lsh_bands_deterministic(ws):
    text = " ".join(ws)
    sig = minhash_signature(text, n_perm=64)
    assert lsh_band_hashes(sig, n_bands=16) == lsh_band_hashes(sig, n_bands=16)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=400))
def test_winnowing_total_and_deterministic(text):
    fps = winnowing_fingerprints(text)
    assert fps == winnowing_fingerprints(text)
    assert all(isinstance(f, int) and f >= 0 for f in fps)


def test_noise_robust_pipeline_end_to_end(ray_session):
    """OCR-noised corpus through the full Ray pipeline: no errors, and
    the noisy rows still segment into tasks (robustness, NOT identity —
    FIXTURES.md excludes noise rows from byte-identity goldens)."""
    import pyarrow as pa
    import ray.data as rd

    from ocracle_ray.pipelines.extraction import extract_records
    from ocracle_ray.sources.noise import add_ocr_noise
    from ocracle_ray.sources.pages import gen_page

    rows = []
    for i in range(30):
        p = gen_page(i)
        # OCR noise hits TEXT, not markup: noise the pre-extracted text
        # surface and re-wrap it (noising raw html corrupts tags, which
        # is malformed-input territory, already covered elsewhere)
        src = p["text"] or p["html"].decode("utf-8", "replace")
        noisy = add_ocr_noise(src, confuse_p=0.05, drop_p=0.01, space_p=0.01)
        # one <p> per task chunk — a single giant block would be
        # admin-phrase-classified boilerplate wholesale (header text
        # shares the block), which is correct classifier behavior but
        # not what this robustness test probes
        import re as _re

        chunks = [c for c in _re.split(r"(?=Oppgave \d)", noisy) if c.strip()]
        html = "".join(f"<p>{c}</p>" for c in chunks).encode("utf-8")
        rows.append({"url": p["url"], "warc_ts": p["warc_ts"], "html": html,
                     "text": "", "lang": p["lang"]})
    t = pa.Table.from_pydict(
        {k: [r[k] for r in rows] for k in ("url", "warc_ts", "html", "text", "lang")},
        schema=pa.schema([("url", pa.string()), ("warc_ts", pa.timestamp("us")),
                          ("html", pa.large_binary()), ("text", pa.large_string()),
                          ("lang", pa.string())]),
    )
    df = extract_records(rd.from_arrow(t), concurrency=2).to_pandas()
    assert (df["error"] == "").all()
    assert (df["n_tasks"] > 0).mean() > 0.8


# ---------------------------------------------------- round-2 codecs

@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.sampled_from([1, 3, 4]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_property(h, w, ch, seed):
    """encode_png ∘ decode_png is the identity for any u8 image."""
    import numpy as np

    from ocracle_ray.core.png import decode_png, encode_png

    rng = np.random.RandomState(seed % (2**31))
    px = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    w2, h2, ch2, out = decode_png(encode_png(px))
    assert (w2, h2, ch2) == (w, h, ch)
    np.testing.assert_array_equal(out, px)


@given(st.text(max_size=120))
@settings(max_examples=60, deadline=None)
def test_pdf_string_escape_roundtrip(s):
    """Any latin-1-encodable text survives PDF string escaping: write
    it as a (...) literal with \\-escapes, parse it back identically."""
    from ocracle_ray.core.pdf import _pdf_string

    try:
        s.encode("latin-1")
    except UnicodeEncodeError:
        return  # out of single-byte-font scope by design
    esc = s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    data = ("(" + esc + ")").encode("latin-1")
    out, end = _pdf_string(data, 0)
    assert out == s
    assert end == len(data)


@given(st.binary(max_size=4000))
@settings(max_examples=80, deadline=None)
def test_pdf_parser_total_on_arbitrary_bytes(data):
    """parse_pdf_blocks over arbitrary bytes (prefixed to sniff as PDF)
    either returns blocks or raises the documented NotImplementedError /
    ValueError — never hangs, never leaks another exception type."""
    from ocracle_ray.core.pdf import parse_pdf_blocks

    try:
        out = parse_pdf_blocks(b"%PDF-1.4\n" + data)
        assert isinstance(out, list)
    except (NotImplementedError, ValueError):
        pass


@given(st.binary(max_size=2000))
@settings(max_examples=80, deadline=None)
def test_png_decoder_total_on_arbitrary_bytes(data):
    """decode_png on arbitrary chunk bytes after a valid signature
    raises ONLY the documented error types (ValueError for malformed
    data, NotImplementedError for unsupported flavors) — the exact
    contract ImageFeatures' catch relies on."""
    from ocracle_ray.core.png import PNG_SIGNATURE, decode_png

    try:
        decode_png(PNG_SIGNATURE + data)
    except (NotImplementedError, ValueError):
        pass
