"""URL canonicalization (core/urlnorm.py): rule table, idempotence
(property-tested over adversarial url soup), and the never-lose-rows
contract for non-http inputs."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from ocracle_ray.core.urlnorm import canonical_url, canonicalize_urls

CASES = [
    # scheme/host case, default port, fragment
    ("HTTP://ExAmple.COM:80/a#frag", "http://example.com/a"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    # trailing host dot, empty path
    ("http://example.com.", "http://example.com/"),
    ("http://example.com", "http://example.com/"),
    # tracking params go, the rest sort, blanks survive
    (
        "http://e.com/p?utm_source=x&b=2&a=1&gclid=zz&utm_medium=m",
        "http://e.com/p?a=1&b=2",
    ),
    ("http://e.com/p?b=&a=1", "http://e.com/p?a=1&b="),
    ("http://e.com/p?a", "http://e.com/p?a="),
    # trailing slash on non-root paths
    ("http://e.com/contact/", "http://e.com/contact"),
    ("http://e.com/a/b///", "http://e.com/a/b"),
    ("http://e.com/", "http://e.com/"),
    # userinfo preserved
    ("http://u:pw@E.com/x", "http://u:pw@e.com/x"),
    # non-http passes through untouched
    ("ftp://example.com/a", "ftp://example.com/a"),
    ("u://doc17/page", "u://doc17/page"),
    ("not a url at all", "not a url at all"),
    ("", ""),
]


def test_rule_table():
    for raw, want in CASES:
        assert canonical_url(raw) == want, raw


def test_known_dup_shapes_merge():
    variants = [
        "http://Example.com:80/news/today/?utm_campaign=x",
        "http://example.com/news/today?utm_source=y",
        "HTTP://EXAMPLE.COM/news/today/#section-2",
    ]
    forms = {canonical_url(v) for v in variants}
    assert forms == {"http://example.com/news/today"}


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet="abcXYZ019:/?#[]@!$&'()*+,;=%.-_~ ",
        max_size=60,
    )
)
def test_idempotent_and_total(raw):
    url = "http://" + raw
    once = canonical_url(url)
    assert canonical_url(once) == once  # idempotence
    assert isinstance(once, str)


def test_batch_form_and_nulls():
    arr = pa.array([c[0] for c in CASES] + [None], pa.string())
    out = canonicalize_urls(arr)
    assert out.to_pylist()[:-1] == [c[1] for c in CASES]
    assert out.to_pylist()[-1] is None
