"""External-fetch operators S12/S13 as Ray plumbing with injectable
transports.

The reference fetches NTNU course pages for learning goals
(``/root/reference/scripts/task_processing.py:109-128``) and runs a
DDG image search (``scripts/utils.py:77-88``). Both are inherently
nondeterministic external I/O, which SURVEY.md §2.1 drops from the
deterministic engine core — but the RAY side (actor-pool fetch stage,
per-actor connection state, bounded retries, per-actor cache, the url
construction and response-parsing rules) is deterministic and belongs
in the engine. This module implements exactly that with a pluggable
``transport`` callable:

- in this sandbox (no network) the default transport raises a
  clearly-marked error; tests inject deterministic fakes;
- in production, pass ``transport=urllib_transport`` (stdlib) or any
  ``url -> bytes`` callable.

Reference-parity details kept verbatim: the X→T course-code
substitution at position -5, the course-page url template, the
``learning-goal-toggler`` div extraction, and the reference's
Norwegian error-string contract ("Feil ved henting av ...").
``year`` is an explicit parameter instead of ``date.today()`` — wall
clock is banned in deterministic pipelines (engine invariant)."""

from __future__ import annotations

import re
from collections import OrderedDict

import pyarrow as pa

DEFAULT_RETRIES = 3
DEFAULT_CACHE_SIZE = 1024

_GOAL_OPEN_RE = re.compile(
    r"""<div[^>]*id=["']learning-goal-toggler["'][^>]*>""", re.IGNORECASE
)
_DIV_TOKEN_RE = re.compile(r"<div\b[^>]*>|</div\s*>", re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")


def no_network_transport(url: str) -> bytes:
    """Default transport for this sandbox: no network access exists, so
    make that explicit rather than time out."""
    raise NotImplementedError(
        f"no network in this environment (requested {url}); inject a "
        f"transport (e.g. stages.fetch.urllib_transport) in production"
    )


def urllib_transport(url: str, timeout: float = 10.0) -> bytes:  # pragma: no cover
    """Production transport (stdlib only). Not exercised in-sandbox."""
    from urllib.request import urlopen

    with urlopen(url, timeout=timeout) as resp:
        return resp.read()


def course_page_url(subject_code: str, year: int) -> str:
    """Reference url rule (task_processing.py:110-115): uppercase, the
    campus wildcard 'X' at position -5 maps to Trondheim 'T'."""
    code = subject_code.strip().upper()
    if len(code) >= 5 and code[-5] == "X":
        code = code[:-5] + "T" + code[-4:]
    return f"https://www.ntnu.no/studier/emner/{code}/{year}#tab=omEmnet"


def parse_learning_goals(html: str) -> str:
    """Extract the learning-goal-toggler div's text, tags stripped,
    whitespace collapsed with single-space separators
    (task_processing.py:121-125 BeautifulSoup .get_text contract).
    The close tag is found by BALANCED div counting, not the first
    </div> — nested inner divs stay inside the extracted text, and the
    id attribute may be single- or double-quoted (review finding r2)."""
    m = _GOAL_OPEN_RE.search(html)
    if not m:
        return ""
    depth = 1
    end = len(html)
    for tok in _DIV_TOKEN_RE.finditer(html, m.end()):
        depth += 1 if tok.group(0)[1] != "/" else -1
        if depth == 0:
            end = tok.start()
            break
    return " ".join(_TAG_RE.sub(" ", html[m.end() : end]).split())


class Fetcher:
    """Actor-pool fetch stage: per-actor transport + bounded retries +
    per-actor LRU response cache (the Ray analogue of the reference's
    requests.Session / result-cache pattern, S14).

    Usage::

        ds.map_batches(Fetcher, fn_constructor_kwargs=dict(
            url_col="url", transport=my_transport),
            batch_format="pyarrow", batch_size=32, concurrency=(2, 8))

    Emits the input columns plus ``body`` (large_binary, b"" on
    failure) and ``fetch_error`` (string, "" on success). Retries are
    attempt-bounded, never wall-clock-bounded, so behavior is
    deterministic given a deterministic transport."""

    def __init__(
        self,
        url_col: str = "url",
        transport=None,
        retries: int = DEFAULT_RETRIES,
        cache_size: int = DEFAULT_CACHE_SIZE,
    ):
        self.url_col = url_col
        self.transport = transport or no_network_transport
        # at least one attempt: retries=0 would otherwise produce a
        # (b"", "") row — a failure indistinguishable from success
        self.retries = max(1, retries)
        self.cache: OrderedDict[str, bytes] = OrderedDict()
        self.cache_size = cache_size
        self.stats = {"hits": 0, "fetches": 0, "failures": 0}

    def _fetch(self, url: str) -> tuple[bytes, str]:
        if url in self.cache:
            self.cache.move_to_end(url)
            self.stats["hits"] += 1
            return self.cache[url], ""
        err = ""
        for _ in range(self.retries):
            try:
                body = self.transport(url)
                self.stats["fetches"] += 1
                self.cache[url] = body
                if len(self.cache) > self.cache_size:
                    self.cache.popitem(last=False)
                return body, ""
            except Exception as e:  # transport failures are data, not crashes
                err = f"{type(e).__name__}: {e}"
        self.stats["failures"] += 1
        return b"", err

    def __call__(self, t: pa.Table) -> pa.Table:
        bodies, errs = [], []
        for url in t[self.url_col].to_pylist():
            body, err = self._fetch(url or "")
            bodies.append(body)
            errs.append(err)
        return t.append_column(
            "body", pa.array(bodies, pa.large_binary())
        ).append_column("fetch_error", pa.array(errs, pa.string()))


def learning_goals(ds, *, year: int, transport=None, concurrency=(2, 8)):
    """S12 as a Dataset stage: rows with a ``subject`` column gain
    ``learning_goals`` text (reference semantics incl. the error-string
    contract 'Feil ved henting av {code}: {err}')."""

    def add_url(t: pa.Table) -> pa.Table:
        urls = [course_page_url(s or "", year) for s in t["subject"].to_pylist()]
        return t.append_column("_goal_url", pa.array(urls, pa.string()))

    fetched = ds.map_batches(add_url, batch_format="pyarrow").map_batches(
        Fetcher,
        fn_constructor_kwargs=dict(url_col="_goal_url", transport=transport),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency,
    )

    def extract(t: pa.Table) -> pa.Table:
        goals = []
        for subj, body, err in zip(
            t["subject"].to_pylist(),
            t["body"].to_pylist(),
            t["fetch_error"].to_pylist(),
        ):
            if err:
                goals.append(f"Feil ved henting av {subj}: {err}")
            else:
                goals.append(parse_learning_goals(body.decode("utf-8", "replace")))
        out = t.drop_columns(["_goal_url", "body", "fetch_error"])
        return out.append_column("learning_goals", pa.array(goals, pa.string()))

    return fetched.map_batches(extract, batch_format="pyarrow")


def image_search_urls(ds, *, query_col: str = "alt_text", transport=None,
                      concurrency=(2, 8)):
    """S13 as a Dataset stage: per-row image search. The transport
    receives ``ddgs://{query} NTNU`` (the reference appends ' NTNU',
    utils.py:81) and must return a newline-separated url list; the
    first url wins, None-equivalent is ''. Failures yield ''."""

    def add_url(t: pa.Table) -> pa.Table:
        urls = [f"ddgs://{q or ''} NTNU" for q in t[query_col].to_pylist()]
        return t.append_column("_query_url", pa.array(urls, pa.string()))

    fetched = ds.map_batches(add_url, batch_format="pyarrow").map_batches(
        Fetcher,
        fn_constructor_kwargs=dict(url_col="_query_url", transport=transport),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency,
    )

    def first_url(t: pa.Table) -> pa.Table:
        firsts = []
        for body, err in zip(t["body"].to_pylist(), t["fetch_error"].to_pylist()):
            if err or not body:
                firsts.append("")
            else:
                lines = body.decode("utf-8", "replace").splitlines()
                firsts.append(lines[0] if lines else "")
        out = t.drop_columns(["_query_url", "body", "fetch_error"])
        return out.append_column("image_url", pa.array(firsts, pa.string()))

    return fetched.map_batches(first_url, batch_format="pyarrow")
