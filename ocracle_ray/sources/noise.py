"""OCR-noise fixture generator (M21, test fixtures only — not a stage).

Re-expresses the reference's artifact generator
(``/root/reference/old/artifact-generator.py:33-70``): per-character
drops, space injections, and confusable-character substitutions with a
seeded counter-based RNG. FIXTURES.md: noise rows test robustness, not
byte-identity — they are excluded from golden comparisons.
"""

from __future__ import annotations

import random

from ..core.textstats import fnv1a64

# Confusable table in the spirit of artifact-generator.py:52-60.
CONFUSABLES: dict[str, str] = {
    "o": "0", "O": "0", "0": "O",
    "l": "1", "I": "1", "1": "l",
    "s": "5", "S": "5", "5": "S",
    "b": "6", "B": "8", "8": "B",
    "g": "9", "q": "9", "9": "g",
    "e": "c", "a": "å", "å": "a",
    "rn": "m", "m": "rn", "vv": "w",
}


def add_ocr_noise(
    text: str,
    *,
    seed: int = 42,
    drop_p: float = 0.01,
    space_p: float = 0.01,
    confuse_p: float = 0.03,
) -> str:
    """Deterministic noisy copy of ``text`` (pure function of inputs)."""
    rng = random.Random(fnv1a64(f"ocr-noise-{seed}:{text[:64]}".encode()))
    out: list[str] = []
    i = 0
    while i < len(text):
        # multi-char confusables first
        for k in ("rn", "vv"):
            if text.startswith(k, i) and rng.random() < confuse_p:
                out.append(CONFUSABLES[k])
                i += len(k)
                break
        else:
            ch = text[i]
            r = rng.random()
            if r < drop_p:
                pass  # dropped char
            elif r < drop_p + space_p:
                out.append(ch + " ")
            elif r < drop_p + space_p + confuse_p and ch in CONFUSABLES:
                out.append(CONFUSABLES[ch])
            else:
                out.append(ch)
            i += 1
    return "".join(out)
