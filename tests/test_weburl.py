"""URL kernels: parse (urllib parity), canonicalization rules,
registrable-domain extraction — all vectorized Arrow paths."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_diff_store_ray.functions.weburl import (
    canonical_query,
    canonicalize_urls,
    parse_urls,
    parse_urls_batch,
    registrable_domains,
)

URLS = [
    "HTTPS://user:pw@WWW.Site3.Example.CO.UK:443/docs/5?b=2&a=1&utm_source=x#f",
    "http://x.y.com:8080/p?gclid=abc",
    "http://x.y.com:80",
    "https://blog.github.io/a/b?z=1&y=2&y=1",
    "ftp://files.example.com/f.txt",
    "https://localhost/x",
    "http://h.io/p?utm_campaign=a&utm_source=b",
    "wss://h.example.net/sock",
]


def test_parse_matches_urllib():
    from urllib.parse import urlsplit

    t = parse_urls(pa.array(URLS)).to_pandas()
    for i, u in enumerate(URLS):
        s = urlsplit(u)
        # urllib lowercases scheme/host at access time; the kernel
        # preserves raw case (canonicalize_urls lowers later)
        assert t.loc[i, "scheme"].lower() == s.scheme
        assert t.loc[i, "host"].lower() == (s.hostname or "")
        assert t.loc[i, "port"] == (str(s.port) if s.port else "")
        assert t.loc[i, "path"] == s.path
        assert t.loc[i, "query"] == s.query
        assert t.loc[i, "fragment"] == s.fragment
        assert bool(t.loc[i, "valid"])


def test_parse_invalid_and_null():
    t = parse_urls(pa.array(["notaurl", None, "://x", "a b://c"]))
    assert t["valid"].to_pylist() == [False] * 4
    assert t["host"].to_pylist() == [None] * 4


def test_canonicalize_rules():
    c = canonicalize_urls(pa.array(URLS))["canonical"].to_pylist()
    assert c[0] == "https://site3.example.co.uk/docs/5?a=1&b=2"
    assert c[1] == "http://x.y.com:8080/p"     # non-default port kept
    assert c[2] == "http://x.y.com/"           # :80 stripped, path -> /
    assert c[3] == "https://blog.github.io/a/b?y=1&y=2&z=1"  # stable sort
    assert c[4] == "ftp://files.example.com/f.txt"
    assert c[6] == "http://h.io/p"             # tracking-only query drops ?
    assert c[7] == "wss://h.example.net/sock"


def test_canonicalize_idempotent():
    once = canonicalize_urls(pa.array(URLS))["canonical"]
    twice = canonicalize_urls(once)["canonical"]
    assert once.to_pylist() == twice.to_pylist()


def test_canonical_query_kernel():
    q = canonical_query(pa.array(
        ["b=2&a=1", "", "utm_source=x", "ref=1&refresh=2", "k", None]))
    assert q.to_pylist() == ["a=1&b=2", "", "", "refresh=2", "k", None]


def test_registrable_domains():
    hosts = ["a.b.example.com", "example.com", "x.co.uk", "a.x.co.uk",
             "blog.github.io", "sub.blog.github.io", "localhost", "", None]
    got = registrable_domains(pa.array(hosts)).to_pylist()
    assert got == ["example.com", "example.com", "x.co.uk", "x.co.uk",
                   "blog.github.io", "blog.github.io", None, None, None]


def test_parse_urls_batch_appends_columns():
    batch = pa.table({"doc_id": [1, 2],
                      "url": ["https://WWW.A.com/x?utm_source=1&k=v",
                              "bad"]})
    out = parse_urls_batch(batch)
    assert out["canonical"].to_pylist() == ["https://a.com/x?k=v", None]
    assert out["domain"].to_pylist() == ["a.com", None]
    assert out["valid"].to_pylist() == [True, False]
    assert out["doc_id"].to_pylist() == [1, 2]


@given(st.lists(
    st.tuples(
        st.sampled_from(["http", "https"]),
        st.sampled_from(["a.com", "WWW.b.co.uk", "x.y.z.org"]),
        st.sampled_from(["", "/p", "/p/q"]),
        st.lists(st.tuples(st.sampled_from("abcz"),
                           st.integers(0, 9)), max_size=4),
    ),
    min_size=1, max_size=20,
))
@settings(max_examples=30, deadline=None)
def test_canonicalize_matches_naive(cases):
    """Property: the vectorized canonicalizer equals a per-row Python
    reference implementation of the same rules."""
    urls, want = [], []
    for scheme, host, path, params in cases:
        q = "&".join(f"{k}={v}" for k, v in params)
        urls.append(f"{scheme}://{host}{path}" + (f"?{q}" if q else ""))
        h = host.lower()
        h = h[4:] if h.startswith("www.") else h
        toks = sorted(t for t in q.split("&") if t)
        qq = "&".join(toks)
        want.append(f"{scheme}://{h}{path or '/'}" + (f"?{qq}" if qq else ""))
    got = canonicalize_urls(pa.array(urls))["canonical"].to_pylist()
    assert got == want


def test_weburl_nul_and_hostile_bytes():
    """NUL bytes in paths/params survive the regroup (the pandas NUL
    pitfall does not apply — all grouping here is offset arithmetic)."""
    urls = ["https://a.com/p?x=\x001&b=2", "https://a.com/\x00q"]
    got = canonicalize_urls(pa.array(urls))["canonical"].to_pylist()
    assert got == ["https://a.com/p?b=2&x=\x001", "https://a.com/\x00q"]
