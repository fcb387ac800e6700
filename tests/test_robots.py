"""robots.txt politeness: RFC 9309 precedence/wildcards, stdlib
robotparser parity where semantics coincide, vectorized frontier
filtering."""

import urllib.robotparser

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_diff_store_ray.functions.robots import (
    allowed_mask,
    compile_rules,
    frontier_filter_batch,
    parse_robots,
)


def _allowed(robots_txt: str, path: str, agent: str = "mybot") -> bool:
    rules = compile_rules({"h.example": robots_txt}, agent)
    urls = pa.array([f"https://h.example{path}"])
    return bool(allowed_mask(urls, rules)[0])


def test_longest_match_wins_and_allow_breaks_ties():
    txt = "User-agent: *\nDisallow: /shop\nAllow: /shop/public\n"
    assert not _allowed(txt, "/shop/cart")
    assert _allowed(txt, "/shop/public/item")
    assert _allowed(txt, "/other")
    # equal-length rules: Allow wins (RFC 9309 §2.2.2)
    tie = "User-agent: *\nDisallow: /page\nAllow: /page\n"
    assert _allowed(tie, "/page")


def test_wildcards_and_end_anchor():
    txt = ("User-agent: *\n"
           "Disallow: /*.pdf$\n"
           "Disallow: /private*/data\n")
    assert not _allowed(txt, "/docs/report.pdf")
    assert _allowed(txt, "/docs/report.pdf.html")
    assert not _allowed(txt, "/private-area/data")
    assert _allowed(txt, "/private-area/datx")


def test_group_selection_specific_over_star():
    txt = ("User-agent: *\nDisallow: /\n"
           "User-agent: mybot\nDisallow: /only-this\n")
    assert _allowed(txt, "/anything", agent="mybot")
    assert not _allowed(txt, "/only-this/x", agent="mybot")
    assert not _allowed(txt, "/anything", agent="otherbot")


def test_multi_agent_group_and_empty_disallow():
    txt = ("User-agent: a\nUser-agent: mybot\nDisallow: /x\n"
           "User-agent: b\nDisallow:\n")
    assert not _allowed(txt, "/x/1", agent="mybot")
    assert _allowed(txt, "/y", agent="mybot")
    assert _allowed(txt, "/x/1", agent="b")  # empty Disallow = allow all


def test_no_robots_or_no_rules_allows():
    assert _allowed("", "/x")
    assert compile_rules({"h.example": "# only comments\n"}) == {}
    urls = pa.array(["https://unknown.example/p", "notaurl", None])
    assert allowed_mask(urls, {"h.example": [("^/", False, 1)]}).tolist() \
        == [True, True, True]


@given(
    st.lists(st.sampled_from(
        ["/a", "/a/b", "/static", "/cgi", "/a/b/c", "/q"]),
        min_size=1, max_size=4, unique=True),
    st.sampled_from(["/a", "/a/b", "/a/b/c/d", "/static/img.png",
                     "/q?x=1", "/unrelated", "/"]),
)
@settings(max_examples=120, deadline=None)
def test_parity_with_stdlib_robotparser_prefix_rules(disallows, path):
    """For plain prefix Disallow rules (no wildcards, no Allow),
    longest-match and robotparser's semantics coincide."""
    txt = "User-agent: *\n" + "".join(f"Disallow: {d}\n" for d in disallows)
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(txt.splitlines())
    assert _allowed(txt, path) == rp.can_fetch("mybot",
                                               f"https://h.example{path}")


def test_query_strings_match():
    txt = "User-agent: *\nDisallow: /search?*session=\n"
    assert not _allowed(txt, "/search?a=1&session=42")
    assert _allowed(txt, "/search?a=1")


def test_frontier_filter_in_ray(ray_session):
    import ray
    import ray.data as rd

    robots = {
        "site0.example": "User-agent: *\nDisallow: /page000\n",
        "site1.example": "User-agent: *\nDisallow: /\nAllow: /page0001\n",
    }
    rules = compile_rules(robots)
    urls = [f"https://site{i % 3}.example/page{i:04d}" for i in range(60)]
    ds = rd.from_arrow(pa.table({"resolved": urls}))
    ref = ray.put(rules)

    def stage(b):
        return frontier_filter_batch(b, ray.get(ref))

    out = ds.map_batches(stage, batch_format="pyarrow").to_pandas()
    out = out.set_index("resolved")["crawl_allowed"]
    assert not out["https://site0.example/page0000"]   # /page000 prefix
    assert out["https://site0.example/page0012"]
    assert out["https://site1.example/page0001"]       # Allow beats /
    assert not out["https://site1.example/page0004"]
    assert out["https://site2.example/page0002"]       # no robots


def test_schedule_frontier(ray_session):
    import ray.data as rd

    from rdf_diff_store_ray.functions.robots import schedule_frontier

    urls = ([f"https://a.example/p{i}" for i in range(5)]
            + [f"https://b.example/q{i}" for i in range(3)]
            + ["https://a.example/p0",  # duplicate → one slot
               "notaurl"])              # invalid host → dropped
    ds = rd.from_arrow(pa.table({"resolved": urls}))
    out = (schedule_frontier(ds, per_host_delay_s=2)
           .to_pandas().sort_values(["host", "slot"], ignore_index=True))
    assert len(out) == 8
    a = out[out["host"] == "a.example"]
    assert a["slot"].tolist() == [0, 1, 2, 3, 4]
    assert a["fetch_offset_s"].tolist() == [0, 2, 4, 6, 8]
    assert a["url"].tolist() == sorted(a["url"])  # canonical-sort slots
    assert out[out["host"] == "b.example"]["slot"].tolist() == [0, 1, 2]

    # arrival-order invariance: reversed input → identical schedule
    out2 = (schedule_frontier(
        rd.from_arrow(pa.table({"resolved": urls[::-1]})),
        per_host_delay_s=2)
        .to_pandas().sort_values(["host", "slot"], ignore_index=True))
    assert out.equals(out2)


def test_mixed_case_host_cannot_bypass_rules():
    """Hostnames are case-insensitive (RFC 4343): a fail-open politeness
    filter must treat Site0.EXAMPLE and site0.example as one host, on
    both the rule-index side and the frontier side."""
    import numpy as np
    import pyarrow as pa

    from rdf_diff_store_ray.functions.robots import (
        allowed_mask,
        compile_rules,
    )

    rules = compile_rules({"Site0.Example": "User-agent: *\nDisallow: /"})
    urls = pa.array([
        "https://site0.example/private",
        "https://SITE0.EXAMPLE/private",
        "https://Site0.Example/private",
        "https://other.example/ok",
    ])
    mask = allowed_mask(urls, rules)
    assert list(mask) == [False, False, False, True]
