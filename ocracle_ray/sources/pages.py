"""Deterministic synthetic ``pages`` table generator (FIXTURES.md T1).

Schema mandated by BASELINE.json ``input_hint``::

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Every row is a pure function of ``(seed, row_index, n_docs)`` — a
counter-based RNG (``random.Random(fnv1a64(f"{seed}:{i}"))``) makes
generation order-independent, so it parallelizes over
``ray.data.range(n).map_batches`` and regenerates byte-identically at any
parallelism level. No wall clock, no external data.

Content mimics an OCRacle exam document (FIXTURES.md "HTML generator"):
Inspera-style header boilerplate
(``/root/reference/prompts/remove_exam_admin.txt``,
``old/taskseparation.py:12-20`` markers), N∈[3,25] tasks with
``Oppgave N`` headings (``old/separateTasks.py:15``), short invalid
bodies, ``Maks poeng: p`` lines (``old/taskseparation.py:5``), unicode
math spans (``scripts/text_normalization.py:10-34`` symbols), code
blocks, link-dense nav/footer lists; ~2% ``%PDF-`` OCRSYN payloads
(actor-pool branch), ~0.5% giant documents (~100× median — skew
bucketing), ~5% duplicate urls with later ``warc_ts`` (keep-latest
dedup, ``object_handling.py:230-239`` semantics).
"""

from __future__ import annotations

import os
import random

import numpy as np
import pyarrow as pa

from ..core.textstats import fnv1a64

DEFAULT_SEED = 42
PAGES_PER_SF = 500_000  # sf0.1 -> 50_000 docs (~250 MB) for the bench
EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in µs

SUBJECTS = ("IFYX1000", "IMAX2150", "INGX1002", "TDT4110", "TMA4100")
VERSIONS = ("V23", "H23", "V24", "H24", "K24")
_LANGS = ("nb", "nb", "nb", "nn", "en")  # 60/20/20

_HEADER_BOILER = (
    "Denne oppgaven skal besvares i Inspera. Du skal ikke legge ved utregninger på papir.",
    "Vi anbefaler bruk av Scantron-ark.",
    "Hjelpemiddelkoder og kalkulatorliste finner du nederst.",
    "Eksamensdato og klokkeslett: se forsiden.",
    "Etter eksamen finner du besvarelsen din i arkivet i Inspera.",
)
_MARKERS = (
    "Alle svar finnes tilgjengelige i arkivet etter sensur.",
    "Bruk tekstverktøyet i Inspera for å svare.",
    "Faglærer svarer ikke på slike spørsmål under eksamen.",
)
# Topic-flavoured sentence fragments (keywords align with core.topics.TOPIC_TABLE).
_TOPIC_SENTENCES = (
    ("Kinematikk", "En bil kjører med konstant fart og akselerasjon langs en rett vei."),
    ("Dynamikk", "Finn kraften som virker på klossen når friksjon og masse er oppgitt."),
    ("Energi og Arbeid", "Beregn arbeidet som utføres og den kinetiske energi til legemet."),
    ("Svingninger", "En pendel svinger med amplitude A og frekvens f i harmonisk bevegelse."),
    ("Programmering", "Skriv en funksjon i python som bruker en løkke over en liste."),
    ("Derivasjon", "Deriver funksjonen og finn tangent med stigningstall i punktet."),
    ("Integrasjon", "Beregn integralet numerisk med trapesmetoden over intervallet."),
    ("Statistikk", "Finn forventning og varians til fordelingen i forsøket."),
)
_FILLER_WORDS = (
    "legemet systemet verdien resultatet figuren tabellen målingen forsøket "
    "aksen retningen vinkelen flaten kurven punktet intervallet uttrykket"
).split()
_MATH_SNIPPETS = (
    "E = m×c^2",
    "a/b + 1/2 − 3",
    "∑ x_i ÷ n",
    "√2 × π",
    "v = v_0 + a×t",
    "x^2 − 4 = 0",
)
_CODE_LINES = (
    "def f(x):",
    "    return x ** 2",
    "for i in range(10):",
    "    print(i)",
    "import numpy as np",
    "x = np.zeros(10)",
)
_NAV_ITEMS = ("Hjem", "Emner", "Eksamen", "Arkiv", "Kontakt", "Logg inn", "Hjelp", "Om oss")


def _sentence(rng: random.Random, topic_sent: str) -> str:
    extra = " ".join(rng.choice(_FILLER_WORDS) for _ in range(rng.randint(4, 12)))
    return f"{topic_sent} Vurder {extra}."


def _task_html(rng: random.Random, n: int) -> tuple[str, str]:
    topic, tsent = rng.choice(_TOPIC_SENTENCES)
    parts = [f"<h2>Oppgave {n}</h2>"]
    n_paras = rng.randint(1, 3)
    for _ in range(n_paras):
        parts.append(f"<p>{_sentence(rng, tsent)}</p>")
    if rng.random() < 0.4:
        parts.append(f"<p>Vi har at {rng.choice(_MATH_SNIPPETS)} i dette tilfellet.</p>")
    if rng.random() < 0.15:
        lines = "\n".join(rng.choice(_CODE_LINES) for _ in range(rng.randint(2, 5)))
        parts.append(f"<pre>{lines}</pre>")
    if rng.random() < 0.1:
        parts.append("<p>Kort.</p>")  # sub-50-char invalid-segment bait
    if rng.random() < 0.15:
        parts.append(f'<img src="fig{n}.png" alt="figur {n}">')
    parts.append(f"<p>Maks poeng: {rng.randint(1, 12)}</p>")
    return "".join(parts), topic


def _nav_html(rng: random.Random) -> str:
    items = "".join(f'<li><a href="/{w.lower()}">{w}</a></li>' for w in _NAV_ITEMS)
    return f"<nav><ul>{items}</ul></nav>"


def _html_doc(rng: random.Random, subject: str, version: str, n_tasks: int) -> str:
    head = f"<html><head><title>{subject} {version} eksamen</title></head><body>"
    header = "<header><p>" + " ".join(rng.sample(_HEADER_BOILER, 3)) + "</p></header>"
    marker = f"<p>{rng.choice(_MARKERS)}</p>"
    tasks = "".join(_task_html(rng, i + 1)[0] for i in range(n_tasks))
    footer = (
        "<footer><p>"
        + " ".join(f'<a href="/f{i}">lenke {i}</a>' for i in range(6))
        + "</p></footer>"
    )
    return head + _nav_html(rng) + header + marker + tasks + footer + "</body></html>"


def _pdf_doc(rng: random.Random, subject: str, version: str, n_tasks: int) -> str:
    lines = ["%PDF-1.4", "%OCRSYN", "/Page 1"]
    y = 40
    page = 1
    lines.append(f"BT 72 {y} 400 14 ({subject} {version} eksamen. {rng.choice(_MARKERS)}) ET")
    y += 40
    for i in range(1, n_tasks + 1):
        topic, tsent = rng.choice(_TOPIC_SENTENCES)
        body = _sentence(rng, tsent).replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        lines.append(f"BT 72 {y} 420 14 (Oppgave {i}) ET")
        y += 18
        lines.append(f"BT 72 {y} 480 12 ({body}) ET")
        y += 16
        lines.append(f"BT 72 {y} 300 12 (Maks poeng: {rng.randint(1, 12)}) ET")
        y += 40
        if rng.random() < 0.2:  # sub-px-rule run, must be dropped
            lines.append(f"BT 72 {y} 10 4 (x) ET")
        if y > 760:
            page += 1
            lines.append(f"/Page {page}")
            y = 40
    lines.append("%%EOF")
    return "\n".join(lines)


def gen_page(i: int, seed: int = DEFAULT_SEED) -> dict:
    """Generate row ``i`` — pure function of (seed, i)."""
    rng = random.Random(fnv1a64(f"ocracle-pages-{seed}:{i}".encode()))
    subject = rng.choice(SUBJECTS)
    version = rng.choice(VERSIONS)
    lang = rng.choice(_LANGS)

    dup = i > 0 and i % 20 == 7  # ~5% duplicate urls (of the previous row)
    src = i - 1 if dup else i
    if dup:
        src_rng = random.Random(fnv1a64(f"ocracle-pages-{seed}:{src}".encode()))
        subject = src_rng.choice(SUBJECTS)
        version = src_rng.choice(VERSIONS)
    url = f"https://exam.example/{subject}/{version}/doc{src:06d}"

    r = rng.random()
    if i % 200 == 13:  # ~0.5% giant docs (~100x median) — skew exerciser
        n_tasks = 25
        html = _html_doc(rng, subject, version, n_tasks)
        html = html.replace("</body></html>", "")
        bulk = "".join(
            f"<p>{_sentence(rng, rng.choice(_TOPIC_SENTENCES)[1])}</p>" for _ in range(1200)
        )
        html += bulk + "</body></html>"
    elif r < 0.02:  # ~2% PDF branch
        n_tasks = rng.randint(3, 12)
        html = _pdf_doc(rng, subject, version, n_tasks)
    else:
        n_tasks = rng.randint(3, 25)
        html = _html_doc(rng, subject, version, n_tasks)

    payload = html.encode("utf-8")
    # crude pre-extracted text surface (quick-check only, not the oracle)
    import re as _re

    text = " ".join(_re.sub(r"<[^>]+>", " ", html).split()) if not html.startswith("%PDF") else ""
    ts = EPOCH_2024_US + i * 1_000_000 + rng.randint(0, 999_999)
    return {"url": url, "warc_ts": ts, "html": payload, "text": text, "lang": lang}


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.large_binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)


def pages_table(start: int, count: int, seed: int = DEFAULT_SEED) -> pa.Table:
    """Arrow table of rows [start, start+count) — the map_batches body."""
    rows = [gen_page(i, seed) for i in range(start, start + count)]
    return pa.Table.from_pydict(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.large_binary()),
            "text": pa.array([r["text"] for r in rows], pa.large_string()),
            "lang": [r["lang"] for r in rows],
        },
        schema=PAGES_SCHEMA,
    )


def n_docs_for_sf(sf: float) -> int:
    return max(50, int(round(sf * PAGES_PER_SF)))


def sf_of_dir(sf_dir: str) -> float:
    """Parse '.../sf0.01' -> 0.01 (defaults to 0.01)."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.01


def generate_pages_dataset(n_docs: int, seed: int = DEFAULT_SEED, override_num_blocks: int | None = None):
    """Distributed generation: ``ray.data.range(n).map_batches(gen)``.

    Stays a Dataset (streaming) — at 10^12-row design scale the generator
    is a stand-in for ``read_parquet`` of real WARC-derived shards.
    """
    import ray.data as rd

    ds = rd.range(n_docs, override_num_blocks=override_num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        if not ids:
            return PAGES_SCHEMA.empty_table()
        # ids within a range-block are contiguous; generate row-wise all the same
        rows = [gen_page(i, seed) for i in ids]
        return pa.Table.from_pydict(
            {
                "url": [r["url"] for r in rows],
                "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
                "html": pa.array([r["html"] for r in rows], pa.large_binary()),
                "text": pa.array([r["text"] for r in rows], pa.large_string()),
                "lang": [r["lang"] for r in rows],
            },
            schema=PAGES_SCHEMA,
        )

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=256)


def ensure_pages_parquet(sf: float, seed: int = DEFAULT_SEED, root: str = "/tmp/ocracle_pages") -> str:
    """Materialize (once) the pages table for ``sf`` as sharded parquet
    under /tmp; returns the directory. Used by bench + queries so repeat
    runs read parquet (the real input mode) instead of regenerating."""
    n = n_docs_for_sf(sf)
    out = os.path.join(root, f"sf{sf:g}-seed{seed}-n{n}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    try:
        import ray

        use_ray = ray.is_initialized()
    except ImportError:  # pragma: no cover
        use_ray = False
    if use_ray:
        # distributed generation + write (generation is order-independent)
        generate_pages_dataset(n, seed, override_num_blocks=max(8, n // 2000)).write_parquet(out)
    else:
        import pyarrow.parquet as pq

        shard = 2000
        for s, start in enumerate(range(0, n, shard)):
            t = pages_table(start, min(shard, n - start), seed)
            pq.write_table(t, os.path.join(out, f"part-{s:05d}.parquet"))
    with open(done, "w") as f:
        f.write(str(n))
    return out
