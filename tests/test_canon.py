"""Canonicalizer properties (north rule: scheme/host lowercase, sorted
query params, fragment strip) — hypothesis-driven plus fixed cases."""

from __future__ import annotations

from urllib.parse import parse_qsl, urlsplit

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspider_spark.canon import canonicalize_url

FIXED = [
    ("HTTPS://Host0.Example:443/list/0/page/1#top", "https://host0.example/list/0/page/1"),
    ("http://A.B:80/x?b=2&a=1", "http://a.b/x?a=1&b=2"),
    ("http://a.b:8080/x", "http://a.b:8080/x"),
    ("https://a.b", "https://a.b/"),
    ("https://a.b/?z=&y=1", "https://a.b/?y=1&z="),
    ("https://a.b/p?k=2&k=1", "https://a.b/p?k=1&k=2"),  # dup keys sort by value
]


def test_fixed_cases():
    for raw, want in FIXED:
        assert canonicalize_url(raw) == want, raw


_hosts = st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,8}(\.[A-Za-z]{2,4}){1,2}", fullmatch=True)
_paths = st.from_regex(r"(/[A-Za-z0-9._~-]{0,6}){0,4}", fullmatch=True)
_params = st.lists(
    st.tuples(st.from_regex(r"[a-z]{1,5}", fullmatch=True), st.from_regex(r"[A-Za-z0-9]{0,5}", fullmatch=True)),
    max_size=4,
)


@given(
    scheme=st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    host=_hosts,
    path=_paths,
    params=_params,
    frag=st.from_regex(r"[a-z]{0,5}", fullmatch=True),
)
@settings(max_examples=200, deadline=None)
def test_properties(scheme, host, path, params, frag):
    q = "&".join(f"{k}={v}" for k, v in params)
    raw = f"{scheme}://{host}{path}" + (f"?{q}" if q else "") + (f"#{frag}" if frag else "")
    c = canonicalize_url(raw)
    # idempotent
    assert canonicalize_url(c) == c
    s = urlsplit(c)
    # lowercase scheme + host
    assert s.scheme == s.scheme.lower()
    assert s.netloc == s.netloc.lower()
    # no fragment
    assert s.fragment == ""
    # query params sorted by (key, value)
    kv = parse_qsl(s.query, keep_blank_values=True)
    assert kv == sorted(kv)
    # same multiset of params survives
    assert sorted(kv) == sorted(params)
    # non-empty path
    assert s.path.startswith("/")


def test_hostile_ports_never_raise():
    """s.port parses lazily and raises on garbage — one hostile link
    must not kill the Arrow batch (ValueError guards the whole parse)."""
    from pyspider_spark.canon import canonicalize_url as c

    assert c("http://example.com:99999/x") == "http://example.com:99999/x"
    assert c("http://h:8x/") == "http://h:8x/"


def test_ipv6_brackets_preserved_and_idempotent():
    from pyspider_spark.canon import canonicalize_url as c

    got = c("https://[::1]:8080/x")
    assert got == "https://[::1]:8080/x"
    assert c(got) == got
    assert c("https://[2001:DB8::1]/y") == "https://[2001:db8::1]/y"
