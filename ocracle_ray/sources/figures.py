"""Deterministic synthetic figure-page images for the pixel operators.

The reference's figure pipeline consumes 300-dpi page renders
(``/root/reference/scripts/extract_images.py``); this container cannot
rasterize, so fixtures are generated directly: a light page background
with 1-3 dark gradient-filled rectangles (the "figures" a contour pass
must find) and an optional low-contrast noise strip. Every image is a
pure function of ``(seed, i)`` — same counter-RNG discipline as
``sources/pages.py`` — and is carried as REAL PNG bytes (``core.png``
encoder), so the decode path in the stage is the production one.
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

from ..core.png import encode_png
from ..core.textstats import fnv1a64

FIGURES_SCHEMA = pa.schema(
    [
        ("fig_id", pa.int64()),
        ("subject", pa.string()),
        ("task_number", pa.string()),
        ("alt_text", pa.string()),
        ("payload", pa.large_binary()),
    ]
)

_ALT_TEXTS = (
    # keep: short multi-line caption (low chars-per-line ratio)
    "Figur 1\nkrefter på kloss\nlangs skråplan",
    # skip(code): code-like alt text (dense keywords + punctuation)
    "def main() { int x = 0; if (x == 0) { return x; } } // kommentar",
    # crop(admin): admin marker, low ratio so ONLY the admin rule fires
    "Maks poeng: 10\nformat\nwords: 120",
    # crop(text_contents): long texty alt
    (
        "Dette er en svært lang tekstlig beskrivelse av oppgavens innhold som "
        "fortsetter i samme linje uten linjeskift slik at forholdstallet blir "
        "høyt og gjennomsnittlig ordlengde er mer enn tre tegn for alle ordene "
        "i denne setningen om fysikkens lover og bevaring av energi i systemet"
    ),
)


def synth_figure_image(
    i: int, seed: int = 42, size: int = 160
) -> tuple[np.ndarray, list[tuple[int, int, int, int]]]:
    """One (size × size) gray page with 1-3 disjoint gradient rectangles.
    Returns (pixels, true figure boxes) — boxes are the ground truth the
    contour pass should recover."""
    rng = random.Random(fnv1a64(f"fig-{seed}:{i}".encode()))
    px = np.full((size, size), 245, np.uint8)
    boxes: list[tuple[int, int, int, int]] = []
    # disjoint thirds: up to 3 figures in separate horizontal bands
    n_figs = rng.randint(1, 3)
    band = size // 3
    for b in range(n_figs):
        fh = rng.randint(band // 2, band - 8)
        fw = rng.randint(size // 3, (2 * size) // 3)
        x = rng.randint(2, size - fw - 2)
        y = b * band + rng.randint(2, band - fh - 2)
        grad = (np.add.outer(np.arange(fh), np.arange(fw)) * 3 % 150 + 40).astype(
            np.uint8
        )
        px[y : y + fh, x : x + fw] = grad
        boxes.append((x, y, fw, fh))
    return px, boxes


def synth_figures_table(n: int, seed: int = 42, size: int = 160) -> pa.Table:
    ids, subjects, tasks, alts, payloads = [], [], [], [], []
    for i in range(n):
        px, _ = synth_figure_image(i, seed=seed, size=size)
        ids.append(i)
        subjects.append(("IFYX1000", "TMA4100", "TDT4110")[i % 3])
        tasks.append(str(i % 7 + 1))
        alts.append(_ALT_TEXTS[i % len(_ALT_TEXTS)])
        payloads.append(encode_png(px))
    return pa.Table.from_pydict(
        {
            "fig_id": ids,
            "subject": subjects,
            "task_number": tasks,
            "alt_text": alts,
            "payload": payloads,
        },
        schema=FIGURES_SCHEMA,
    )
