"""S12/S13 fetch plumbing (stages/fetch.py): url rules, div parsing,
retry/cache behavior, and the Dataset stages with deterministic fake
transports."""

import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages.fetch import (
    Fetcher,
    course_page_url,
    image_search_urls,
    learning_goals,
    no_network_transport,
    parse_learning_goals,
)


def test_course_page_url_x_substitution():
    # task_processing.py:110-115 — campus wildcard X -> Trondheim T
    assert (
        course_page_url("IFYX1000", 2024)
        == "https://www.ntnu.no/studier/emner/IFYT1000/2024#tab=omEmnet"
    )
    assert (
        course_page_url("tma4100", 2024)
        == "https://www.ntnu.no/studier/emner/TMA4100/2024#tab=omEmnet"
    )


def test_parse_learning_goals_div():
    html = (
        "<html><body><div id=\"other\">nei</div>"
        "<div class=\"x\" id=\"learning-goal-toggler\"><p>Kunnskap:</p>"
        "<ul><li>forstå  mekanikk</li></ul></div></body></html>"
    )
    assert parse_learning_goals(html) == "Kunnskap: forstå mekanikk"
    assert parse_learning_goals("<html>no div</html>") == ""


def test_no_network_default_raises():
    with pytest.raises(NotImplementedError, match="no network"):
        no_network_transport("https://example.org")


def test_fetcher_retries_cache_and_error_rows():
    calls = {"n": 0}

    def flaky(url: str) -> bytes:
        calls["n"] += 1
        if url.endswith("bad"):
            raise ConnectionError("nope")
        if calls["n"] % 2 == 1 and url.endswith("flaky"):
            raise TimeoutError("later")
        return f"body-of-{url}".encode()

    f = Fetcher(transport=flaky, retries=3)
    t = pa.table({"url": ["u/ok", "u/flaky", "u/bad", "u/ok"]})
    out = f(t)
    bodies = out["body"].to_pylist()
    errs = out["fetch_error"].to_pylist()
    assert bodies[0] == b"body-of-u/ok" and errs[0] == ""
    assert bodies[1] == b"body-of-u/flaky" and errs[1] == ""  # retried
    assert bodies[2] == b"" and "ConnectionError" in errs[2]
    # 4th url = cache hit, no new transport call for it
    assert f.stats["hits"] == 1
    assert f.stats["failures"] == 1


def test_learning_goals_stage():
    web = {
        course_page_url("IFYX1000", 2024): (
            b'<div id="learning-goal-toggler">Mekanikk og energi</div>'
        ),
        course_page_url("TMA4100", 2024): (
            b'<div id="learning-goal-toggler">Derivasjon, integrasjon</div>'
        ),
    }

    def transport(url: str) -> bytes:
        if url not in web:
            raise KeyError(url)
        return web[url]

    ds = rd.from_items(
        [{"subject": "IFYX1000"}, {"subject": "TMA4100"}, {"subject": "ZZZ9999"}]
    )
    out = (
        learning_goals(ds, year=2024, transport=transport, concurrency=1)
        .to_pandas()
        .sort_values("subject")
        .reset_index(drop=True)
    )
    got = dict(zip(out["subject"], out["learning_goals"]))
    assert got["IFYX1000"] == "Mekanikk og energi"
    assert got["TMA4100"] == "Derivasjon, integrasjon"
    # reference error-string contract (task_processing.py:127-128)
    assert got["ZZZ9999"].startswith("Feil ved henting av ZZZ9999:")


def test_image_search_stage():
    def transport(url: str) -> bytes:
        assert url.startswith("ddgs://") and url.endswith(" NTNU")
        if "tom" in url:
            return b""
        return f"https://img.example/{abs(hash(url)) % 1000}.png\nhttps://x".encode()

    ds = rd.from_items(
        [{"fig_id": 1, "alt_text": "pendel"}, {"fig_id": 2, "alt_text": "tom"}]
    )
    out = (
        image_search_urls(ds, transport=transport, concurrency=1)
        .to_pandas()
        .sort_values("fig_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "image_url"].startswith("https://img.example/")
    assert out.loc[1, "image_url"] == ""


def test_parse_learning_goals_nested_and_single_quotes():
    """Review r2: balanced-div close (nested inner divs included) and
    single-quoted id attributes — the BS4 .get_text() contract."""
    html = (
        "<div id='learning-goal-toggler'><div class=\"intro\">Kunnskap</div>"
        " Studenten kan analysere krefter</div><div>etterpå</div>"
    )
    assert (
        parse_learning_goals(html)
        == "Kunnskap Studenten kan analysere krefter"
    )


def test_fetcher_zero_retries_still_reports_error():
    f = Fetcher(transport=lambda u: (_ for _ in ()).throw(ConnectionError("x")),
                retries=0)
    out = f(pa.table({"url": ["u"]}))
    assert out["fetch_error"].to_pylist()[0] != ""
