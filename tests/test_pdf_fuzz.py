"""PDF-branch fuzz: ``extract_document`` must turn ANY corrupted PDF
into a schema-stable record (error rows, never an exception — the
per-row try/except contract in core/extract.py) and must TERMINATE
fast (a parse loop on hostile bytes would stall a whole actor).

Corruption families per fixture variant (plain / xref-stream /
encrypted / scanned / fax-scanned): truncations, single-byte flips —
which hit xref offsets, stream /Lengths, dict syntax, Flate bytes —
and random tails after the header.
"""

import time

import zlib

import numpy as np
import pytest

from ocracle_ray.core.extract import extract_document
from ocracle_ray.sources.realpdf import (
    build_exam_pdf,
    build_exam_pdf_encrypted,
    build_exam_pdf_scanned,
    build_exam_pdf_scanned_fax,
    build_exam_pdf_xrefstm,
)

RECORD_KEYS = None  # learned from the first clean extraction
PER_DOC_BUDGET_S = 10.0


def _variants():
    return {
        "plain": build_exam_pdf(3),
        "xrefstm": build_exam_pdf_xrefstm(5),
        "encrypted": build_exam_pdf_encrypted(7),
        "aesv2": build_exam_pdf_encrypted(7, mode="aesv2"),
        "aesv3": build_exam_pdf_encrypted(7, mode="aesv3"),
        "scanned": build_exam_pdf_scanned(2),
        "fax": build_exam_pdf_scanned_fax(4),
    }


def _mutations(data: bytes, rng):
    for ln in sorted(rng.choice(len(data), 40, replace=False)):
        yield data[:ln]
    for pos in sorted(rng.choice(len(data), 120, replace=False)):
        b = bytearray(data)
        b[pos] ^= 1 << int(rng.randint(8))
        yield bytes(b)
    for _ in range(16):
        b = bytearray(data)
        start = int(rng.randint(max(1, len(b) - 16)))
        b[start : start + 16] = rng.bytes(min(16, len(b) - start))
        yield bytes(b)
    for n in (8, 64, 1024):
        yield data[:8] + rng.bytes(n)


@pytest.mark.parametrize("variant", sorted(_variants()))
def test_pdf_fuzz_always_yields_a_record(variant):
    data = _variants()[variant]
    clean = extract_document("u://clean.pdf", data)
    keys = set(clean)
    assert clean["error"] == "", (variant, clean["error"])
    rng = np.random.RandomState(zlib.crc32(variant.encode()))
    for i, mut in enumerate(_mutations(data, rng)):
        t0 = time.perf_counter()
        rec = extract_document(f"u://{variant}/{i}.pdf", mut)
        dt = time.perf_counter() - t0
        assert set(rec) == keys, (variant, i)
        assert dt < PER_DOC_BUDGET_S, (
            f"{variant} mutation {i}: extract took {dt:.1f}s - "
            "hostile bytes must not stall an actor"
        )
