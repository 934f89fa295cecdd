"""Deterministic keyword->topic classifier (M18) + ignored-topic filter (M19).

Replaces the reference's LLM topic picker
(``/root/reference/prompts/identify_topic.txt``, applied at
``scripts/task_processing.py:495-515``) with a static keyword-scoring
table whose vocabulary comes from the reference's own published topic
sets (``/root/reference/exams.json`` topics,
``prompts/exam_topics.txt:8-14`` exemplars). Scoring: one combined
longest-first alternation scan of the lowercased task text — each
NON-OVERLAPPING match scores 1 for the keyword's owning topic (so
"vinkelfart" scores Rotasjonsdynamikk, not also Kinematikk's "fart";
this longest-match-wins rule is this engine's deliberate spec, chosen
over independent per-keyword substring counting for single-pass
scanning). Argmax with ties broken by TOPIC_TABLE order (fixed); zero
hits -> "Unknown Topic" (the reference's enum index 0 fallback,
``task_processing.py:102-107``).

The ignored-topic filter is the reference's anti-join against a small
blacklist (``task_processing.py:453-476``) as a plain set lookup.
"""

from __future__ import annotations

UNKNOWN_TOPIC = "Unknown Topic"

# (topic, keyword tuple) — order is the deterministic tiebreak.
TOPIC_TABLE: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("Kinematikk", ("fart", "akselerasjon", "hastighet", "posisjon", "bevegelse", "kinematikk")),
    ("Dynamikk", ("kraft", "newton", "friksjon", "masse", "dynamikk")),
    ("Energi og Arbeid", ("energi", "arbeid", "effekt", "joule", "potensiell", "kinetisk")),
    ("Rotasjonsdynamikk", ("rotasjon", "treghetsmoment", "dreiemoment", "vinkelfart")),
    ("Svingninger", ("svingning", "pendel", "fjær", "harmonisk", "amplitude", "frekvens")),
    ("Bølgefysikk", ("bølge", "interferens", "lydbølge", "bølgelengde", "refleksjon")),
    ("Fluidmekanikk", ("fluid", "trykk", "bernoulli", "oppdrift", "strømning", "viskositet")),
    ("Programmering", ("python", "kode", "funksjon", "løkke", "programmer", "variabel", "numpy", "liste")),
    ("Derivasjon", ("deriver", "derivasjon", "gradient", "tangent", "stigningstall")),
    ("Integrasjon", ("integral", "integrasjon", "antiderivert", "trapesmetoden")),
    ("Differensialligninger", ("differensialligning", "eulers metode", "initialverdi")),
    ("Fourieranalyse", ("fourier", "dft", "frekvensspekter", "konvolusjon")),
    ("Statistikk", ("sannsynlighet", "forventning", "varians", "fordeling", "median", "statistikk")),
    ("Lineær Algebra", ("matrise", "vektor", "determinant", "egenverdi", "lineær")),
    ("Termodynamikk", ("temperatur", "varme", "entropi", "termodynamikk", "gass")),
    ("Elektromagnetisme", ("elektrisk", "magnetfelt", "spenning", "strøm", "ladning", "krets")),
)

DEFAULT_IGNORED_TOPICS: frozenset[str] = frozenset()


# One combined alternation (longest-first so overlapping keywords match
# their longest form) -> a single C-level scan instead of ~100
# str.count passes per call. keyword -> first owning topic (table order).
import re as _re

_KW_TO_TOPIC: dict[str, str] = {}
for _topic, _kws in TOPIC_TABLE:
    for _kw in _kws:
        _KW_TO_TOPIC.setdefault(_kw, _topic)
_TOPIC_ORDER = {t: i for i, (t, _) in enumerate(TOPIC_TABLE)}
_KW_RE = _re.compile(
    "|".join(_re.escape(k) for k in sorted(_KW_TO_TOPIC, key=len, reverse=True))
)


def classify_topic(text: str) -> str:
    """Argmax keyword-hit topic; fixed-order tiebreak; 0 hits -> Unknown."""
    low = text.lower()
    scores: dict[str, int] = {}
    for m in _KW_RE.finditer(low):
        t = _KW_TO_TOPIC[m.group(0)]
        scores[t] = scores.get(t, 0) + 1
    if not scores:
        return UNKNOWN_TOPIC
    return min(scores.items(), key=lambda kv: (-kv[1], _TOPIC_ORDER[kv[0]]))[0]


def is_ignored(topic: str, ignored: frozenset[str] = DEFAULT_IGNORED_TOPICS) -> bool:
    """M19 anti-join: drop tasks whose topic is blacklisted."""
    return topic in ignored


ALL_TOPICS: tuple[str, ...] = tuple(t for t, _ in TOPIC_TABLE)
