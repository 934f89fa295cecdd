"""PII scrubbing (core/scrub.py + stages.text.scrub_text): redaction
and exact counts vs a Python-re reference executing the SAME patterns,
the adjacency double-pass rule, and the documented precision choices
(no plain-integer phone matches; date-shaped strings do match)."""

import re

import pyarrow as pa
import pytest

from ocracle_ray.core.scrub import PII_PATTERNS, scrub_pii


def _reference(text: str) -> tuple[str, dict[str, int]]:
    out, counts = text, {}
    for kind, pattern, rewrite, placeholder in PII_PATTERNS:
        rew = re.sub(r"\\(\d)", r"\\g<\1>", rewrite)
        before = out.count(placeholder)
        out = re.sub(pattern, rew, out)
        if kind in ("ipv4", "phone"):
            out = re.sub(pattern, rew, out)
        counts[f"n_{kind}"] = out.count(placeholder) - before
    return out, counts


CASES = [
    "contact me at jane.doe+spam@example.co.uk for details",
    "two mails: a@b.io and c_d%x@sub.domain.org!",
    "server at 10.0.0.1 and backup at 192.168.255.3, ok?",
    "adjacent ips 1.2.3.4 5.6.7.8 share one space",
    "call +47 22 12 34 56 or (555) 123-4567 today",
    "dotted 555.123.4567 phone",
    "plain integer 123456789012 must survive",
    "version 1.2.3 stays; 1.2.3.4.5 is no clean ipv4",
    "date-shaped 12.03.2024 matches by documented choice",
    "mixed: root@10.1.2.3 mail x@y.zz then 77-88-99-00 end",
    "",
    "no pii here at all",
]


def test_scrub_matches_python_re_reference():
    redacted, counts = scrub_pii(pa.array(CASES))
    for i, text in enumerate(CASES):
        exp_text, exp_counts = _reference(text)
        assert redacted[i].as_py() == exp_text, (i, text)
        for k, v in exp_counts.items():
            assert counts[k][i].as_py() == v, (i, k, text)


def test_scrub_semantics_pinned():
    redacted, counts = scrub_pii(pa.array(CASES))
    r = [x.as_py() for x in redacted]
    # emails gone, both of them
    assert r[1] == "two mails: <EMAIL> and <EMAIL>!"
    assert counts["n_email"][1].as_py() == 2
    # adjacent IPs: the double pass catches the survivor
    assert r[3] == "adjacent ips <IP> <IP> share one space"
    assert counts["n_ipv4"][3].as_py() == 2
    # both phone formats redact
    assert r[4] == "call <PHONE> or <PHONE> today"
    # plain integer runs NEVER match the phone pattern
    assert r[6] == CASES[6]
    # 1.2.3 is not an ipv4; 1.2.3.4.5 has a dot boundary on both sides
    assert r[7] == CASES[7]
    # the documented date trade-off
    assert "<PHONE>" in r[8]
    # empty row flows through
    assert r[10] == "" and counts["n_email"][10].as_py() == 0


def test_scrub_text_stage(ray_session):
    import ray.data as rd

    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(CASES)]
    ).repartition(3)
    from ocracle_ray.stages.text import scrub_text

    out = scrub_text(ds).to_pandas().sort_values("doc_id")
    for i, text in enumerate(CASES):
        exp_text, exp_counts = _reference(text)
        row = out[out["doc_id"] == i].iloc[0]
        assert row["text"] == exp_text
        for k, v in exp_counts.items():
            assert row[k] == v
