"""Hypothesis property tests for URL canonicalization (V1 in SURVEY §2.9) —
the function every frontier dedup decision hangs on. No Spark session needed
(pure Python; the JVM/pandas/DuckDB variants are value-parity-tested in
test_codecs/test_datagen via hash64 discipline).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from crawlspark.functions.urls import canonicalize_url, host_of, url_hash64

hosts = st.from_regex(r"[a-z]([a-z0-9\-]{0,8}[a-z0-9])?\.[a-z]{2,6}",
                      fullmatch=True)
segments = st.lists(st.from_regex(r"[A-Za-z0-9._~\-]{1,8}", fullmatch=True),
                    min_size=0, max_size=4)
queries = st.lists(st.from_regex(r"[a-z]{1,5}=[A-Za-z0-9]{0,6}",
                                 fullmatch=True), min_size=0, max_size=3)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https"]))
    host = draw(hosts)
    path = "/" + "/".join(draw(segments))
    q = draw(queries)
    return f"{scheme}://{host}{path}" + ("?" + "&".join(q) if q else "")


@settings(max_examples=200, deadline=None)
@given(urls())
def test_canonicalize_idempotent(u):
    c = canonicalize_url(u)
    assert canonicalize_url(c) == c


@settings(max_examples=200, deadline=None)
@given(urls())
def test_twins_collapse_to_one_hash(u):
    """All the dirty variants the datagen plants (uppercase host, explicit
    default port, fragment, ./.. segments, unsorted query) must hash to the
    same frontier key as the clean URL."""
    c = canonicalize_url(u)
    base = url_hash64(u)
    scheme, rest = u.split("://", 1)
    host = rest.split("/", 1)[0]
    tail = rest[len(host):] or "/"
    path, sep, query = tail.partition("?")

    variants = [
        f"{scheme}://{host.upper()}{tail}",
        f"{scheme}://{host}:{80 if scheme == 'http' else 443}{tail}",
        u + "#fragment",
        f"{scheme}://{host}{path}/." + (sep + query if sep else ""),
        f"{scheme}://{host}/x/..{path}" + (sep + query if sep else ""),
    ]
    if "&" in query:
        parts = query.split("&")
        variants.append(f"{scheme}://{host}{path}?" +
                        "&".join(reversed(parts)))
    for v in variants:
        assert url_hash64(v) == base, (u, v)
    assert canonicalize_url(u + "#fragment") == c


@settings(max_examples=200, deadline=None)
@given(urls())
def test_host_stable_under_canonicalization(u):
    assert host_of(canonicalize_url(u)) == host_of(u)


@settings(max_examples=100, deadline=None)
@given(urls(), urls())
def test_distinct_canonicals_distinct_hashes(a, b):
    """hash64 is injective in practice on distinct canonical forms (60-bit
    space; a generated collision would be a miracle worth failing on)."""
    ca, cb = canonicalize_url(a), canonicalize_url(b)
    if ca != cb:
        assert url_hash64(a) != url_hash64(b)
