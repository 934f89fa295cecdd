"""Deterministic nynorsk -> bokmål wordlist substitution (M15).

The reference translates task text with an LLM
(``/root/reference/prompts/translate_to_bokmaal.txt``, applied at
``scripts/task_processing.py:520-541``). Free translation is not
deterministic, so per SURVEY.md M15 this engine reduces the operator to
a fixed high-confidence wordlist substitution over whole words; the
``lang`` column is otherwise passed through. Word case is preserved for
initial capitals.
"""

from __future__ import annotations

import re

# High-confidence nn -> nb pairs (function words + exam vocabulary).
WORDLIST: dict[str, str] = {
    "ikkje": "ikke",
    "eit": "et",
    "ein": "en",
    "oppgåve": "oppgave",
    "oppgåva": "oppgaven",
    "svar": "svar",
    "korleis": "hvordan",
    "kva": "hva",
    "kvifor": "hvorfor",
    "nokre": "noen",
    "fleire": "flere",
    "mykje": "mye",
    "sjå": "se",
    "gjere": "gjøre",
    "vere": "være",
    "blei": "ble",
    "frå": "fra",
    "berre": "bare",
    "held": "holder",
    "høgare": "høyere",
    "lågare": "lavere",
    "rekne": "regne",
    "prøvar": "prøver",
}

_WORD_RE = re.compile(r"\b[\wåæøÅÆØ]+\b", re.UNICODE)


def _sub(m: re.Match) -> str:
    w = m.group(0)
    low = w.lower()
    rep = WORDLIST.get(low)
    if rep is None:
        return w
    if w[:1].isupper():
        return rep[:1].upper() + rep[1:]
    return rep


def translate_nn_to_nb(text: str) -> str:
    """Whole-word wordlist substitution; everything else untouched."""
    return _WORD_RE.sub(_sub, text)
