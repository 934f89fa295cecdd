"""Deterministic REAL-PDF page fixtures (stdlib-parser branch).

``sources/pages.py`` emits OCRSYN synthetic PDFs (kept frozen — the
flagship checksum depends on it); this module builds genuine minimal
PDF byte payloads (catalog → pages → Flate/plain content streams with
BT/ET text operators) so the ``core.pdf._parse_minimal_pdf`` branch is
exercised INSIDE the full extraction pipeline, not just unit tests.
Every payload is a pure function of ``(seed, i)``."""

from __future__ import annotations

import random
import zlib

import pyarrow as pa

from ..core.textstats import fnv1a64
from .pages import EPOCH_2024_US, SUBJECTS, VERSIONS

_TOPIC_LINES = (
    "Finn kraften som virker på klossen når friksjon og masse er oppgitt.",
    "Beregn arbeidet som utføres og den kinetiske energi til legemet.",
    "En pendel svinger med amplitude A og frekvens f i harmonisk bevegelse.",
    "Deriver funksjonen og finn tangent med stigningstall i punktet.",
    "Beregn integralet numerisk med trapesmetoden over intervallet.",
)


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_exam_pdf(i: int, seed: int = 42) -> bytes:
    """One minimal real PDF: an exam-style document with ``Oppgave N``
    headings and ``Maks poeng`` lines, 1-2 pages, Flate-compressed on
    odd ids (both decode paths exercised)."""
    rng = random.Random(fnv1a64(f"realpdf-{seed}:{i}".encode()))
    n_tasks = rng.randint(2, 5)
    pages: list[bytes] = []
    lines: list[str] = [f"Eksamen i {SUBJECTS[i % len(SUBJECTS)]}"]
    for t in range(1, n_tasks + 1):
        lines.append(f"Oppgave {t}")
        lines.append(rng.choice(_TOPIC_LINES))
        lines.append(f"Maks poeng: {rng.randint(2, 12)}")
    per_page = max(4, (len(lines) + 1) // 2)
    for start in range(0, len(lines), per_page):
        y = 720
        ops = []
        for ln in lines[start : start + per_page]:
            ops.append(f"BT /F1 12 Tf 72 {y} Td ({_esc(ln)}) Tj ET")
            y -= 40  # > MERGE_GAP: one block per line
        pages.append(("\n".join(ops) + "\n").encode("latin-1"))

    compress = i % 2 == 1
    n = len(pages)
    kids = " ".join(f"{3 + 2 * p} 0 R" for p in range(n))
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode(),
    }
    for p, stream in enumerate(pages):
        data = zlib.compress(stream) if compress else stream
        filt = b"/Filter /FlateDecode " if compress else b""
        objs[3 + 2 * p] = (
            f"<< /Type /Page /Parent 2 0 R /Contents {4 + 2 * p} 0 R "
            f"/MediaBox [0 0 612 792] >>".encode()
        )
        objs[4 + 2 * p] = (
            b"<< " + filt + f"/Length {len(data)} >>".encode()
            + b"\nstream\n" + data + b"\nendstream"
        )
    body = b"".join(
        f"{oid} 0 obj\n".encode() + objs[oid] + b"\nendobj\n" for oid in sorted(objs)
    )
    return b"%PDF-1.4\n" + body + b"trailer\n<< /Root 1 0 R /Size 99 >>\n%%EOF\n"


def real_pdf_pages_table(n: int, seed: int = 42) -> pa.Table:
    """pages-schema table whose html payloads are real PDFs."""
    import datetime

    rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    for i in range(n):
        subj = SUBJECTS[i % len(SUBJECTS)]
        ver = VERSIONS[i % len(VERSIONS)]
        rows["url"].append(f"https://exam.example/{subj}/{ver}/realpdf{i:06d}")
        rows["warc_ts"].append(
            datetime.datetime.utcfromtimestamp(EPOCH_2024_US / 1e6)
            + datetime.timedelta(hours=i)
        )
        rows["html"].append(build_exam_pdf(i, seed=seed))
        rows["text"].append("")
        rows["lang"].append("nb")
    return pa.Table.from_pydict(
        rows,
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us")),
                ("html", pa.large_binary()),
                ("text", pa.large_string()),
                ("lang", pa.string()),
            ]
        ),
    )
