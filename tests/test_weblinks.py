"""Link extraction + RFC 3986 resolution: HTMLParser/urljoin oracles,
corpus ground-truth parity, host-edge partials."""

from html.parser import HTMLParser
from urllib.parse import urljoin

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_diff_store_ray import corpus
from rdf_diff_store_ray.functions.weblinks import (
    extract_hrefs,
    host_edges,
    links_batch,
    resolve_refs,
)
from tests.test_graph import _dense_pagerank


class _Anchors(HTMLParser):
    def __init__(self):
        super().__init__()
        self.hrefs = []

    def handle_starttag(self, tag, attrs):
        for k, v in attrs:
            if k == "href" and v is not None:
                self.hrefs.append(v)


def _oracle(html: str) -> list:
    p = _Anchors()
    p.feed(html)
    return p.hrefs


def test_extract_matches_htmlparser_on_corpus_pages():
    c = corpus.generate(n_urls=18, n_snapshots=3, seed=9, n_links=4)
    htmls = [h.decode() for h in c.pages["html"].to_pylist()]
    rows, hrefs = extract_hrefs(pa.array(htmls))
    got = {}
    for r, h in zip(rows.tolist(), hrefs.to_pylist()):
        got.setdefault(r, []).append(h)
    for i, html in enumerate(htmls):
        assert sorted(got[i]) == sorted(_oracle(html)), f"page {i}"


def test_extract_quote_styles_and_entities():
    html = pa.array([
        '<a href="/a">x</a> <a href=\'/b?x=1&amp;y=2\'>y</a>'
        '<img src="i.png"><link href="/c.css">',
        "no links here",
        None,
    ])
    rows, hrefs = extract_hrefs(html)
    by_row = {}
    for r, h in zip(rows.tolist(), hrefs.to_pylist()):
        by_row.setdefault(r, []).append(h)
    assert sorted(by_row[0]) == ["/a", "/b?x=1&y=2", "/c.css"]
    assert 1 not in by_row and 2 not in by_row


def test_extract_non_utf8_html_is_tolerated():
    rows, hrefs = extract_hrefs(pa.array(
        [b'<a href="/ok">x</a>\xff\xfe', b"\xff"], pa.binary()))
    assert hrefs.to_pylist() == ["/ok"]
    assert rows.tolist() == [0]


RESOLVE_CASES = [
    ("https://h.example/a/b?q=1#f", "https://x.org/p"),
    ("https://h.example/a/b?q=1#f", "//x.org/p"),
    ("https://h.example/a/b?q=1#f", "/p/q"),
    ("https://h.example/a/b?q=1#f", "p"),
    ("https://h.example/a/b?q=1#f", "p/q#g"),
    ("https://h.example/a/b?q=1#f", "?x=2"),
    ("https://h.example/a/b?q=1#f", "#g"),
    ("https://h.example/a/b?q=1#f", ""),
    ("https://h.example/a/b/", "../c"),
    ("https://h.example/a/b/", "../../c"),
    ("https://h.example/a/b/", "../../../c"),
    ("https://h.example/a/b/c", "./d"),
    ("https://h.example/a/b/c", "."),
    ("https://h.example/a/b/c", ".."),
    ("https://h.example:8080/a", "/p"),
    ("https://h.example/", "a/./b/../c"),
    ("http://h.example/x", "ftp://f.example/z"),
]


def test_resolve_matches_urljoin_cases():
    bases = pa.array([b for b, _ in RESOLVE_CASES])
    refs = pa.array([r for _, r in RESOLVE_CASES])
    got = resolve_refs(bases, refs).to_pylist()
    for (b, r), g in zip(RESOLVE_CASES, got):
        assert g == urljoin(b, r), f"urljoin({b!r}, {r!r})"


@given(
    st.sampled_from(["https://h.example", "http://h.example:81"]),
    st.lists(st.sampled_from(["a", "b.html", ".", "..", "c-d"]),
             max_size=4),
    st.sampled_from(["", "?q=1", "#f", "?q=1#f"]),
    st.one_of(
        st.sampled_from(["", "#g", "?y=2", "/abs", "//other.org/p",
                         "https://abs.org/q"]),
        st.lists(st.sampled_from(["x", "..", ".", "y.png"]),
                 min_size=1, max_size=4).map("/".join),
    ),
)
@settings(max_examples=150, deadline=None)
def test_resolve_matches_urljoin_property(origin, segs, suffix, ref):
    base = origin + "/" + "/".join(segs) + suffix
    got = resolve_refs(pa.array([base]), pa.array([ref])).to_pylist()[0]
    assert got == urljoin(base, ref), f"urljoin({base!r}, {ref!r})"


def test_resolve_invalid_base_is_null():
    got = resolve_refs(pa.array(["notaurl", None]),
                       pa.array(["/p", "/p"]))
    assert got.to_pylist() == [None, None]


def test_links_batch_matches_corpus_ground_truth():
    """End-to-end: extract → resolve → canonicalize equals the corpus
    links table exactly (the nav's static '/' and '/about' anchors are
    accounted for separately)."""
    from rdf_diff_store_ray.functions.weburl import canonicalize_urls

    c = corpus.generate(n_urls=21, n_snapshots=3, seed=5, n_links=3)
    out = links_batch(c.pages.select(["url", "html"]))
    canon = canonicalize_urls(out["resolved"])["canonical"]
    df = out.to_pandas().assign(canonical=canon.to_pylist())
    static = df[df["href"].isin(["/", "/about"])]
    assert len(static) == 2 * c.pages.num_rows
    got = df[~df["href"].isin(["/", "/about"])]
    truth = c.links.to_pandas()
    assert len(got) == len(truth)
    g = got.sort_values(["url", "href", "canonical"], ignore_index=True)
    t = truth.sort_values(["url", "href", "resolved"], ignore_index=True)
    assert g["url"].tolist() == t["url"].tolist()
    assert g["href"].tolist() == t["href"].tolist()
    assert g["canonical"].tolist() == t["resolved"].tolist()


def test_kg_link_graph_matches_dense_oracle(ray_session):
    """The registry entry end-to-end vs an independent stack:
    HTMLParser extraction → urljoin resolution → urlsplit hosts →
    dense numpy PageRank."""
    from urllib.parse import urlsplit

    import pyarrow.parquet as pq

    from rdf_diff_store_ray.pipelines import queries as q

    sf_dir = "/root/testdata/sf0.001"
    got = q.kg_link_graph(sf_dir)

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    c = corpus.generate(
        n_urls=int(min(400, max(40, n_docs // 12))), n_snapshots=5,
        seed=42, n_links=5)
    edge_n: dict = {}
    for url, html in zip(c.pages["url"].to_pylist(),
                         c.pages["html"].to_pylist()):
        src = urlsplit(url).hostname
        for href in _oracle(html.decode()):
            dst = urlsplit(urljoin(url, href)).hostname
            if src and dst:
                edge_n[(src, dst)] = edge_n.get((src, dst), 0) + 1
    ranks = _dense_pagerank(list(edge_n))

    assert list(got.columns) == ["host", "rank", "out_links", "in_links",
                                 "rank_pos"]
    exp = sorted(ranks.items(), key=lambda kv: (-round(kv[1], 10), kv[0]))
    assert got["host"].tolist() == [h for h, _ in exp[: len(got)]]
    np.testing.assert_allclose(
        got["rank"].to_numpy(), [r for _, r in exp[: len(got)]], atol=1e-8)
    for _, row in got.iterrows():
        assert row["out_links"] == sum(
            n for (s, _), n in edge_n.items() if s == row["host"])
        assert row["in_links"] == sum(
            n for (_, d), n in edge_n.items() if d == row["host"])
    assert got["rank_pos"].tolist() == list(range(1, len(got) + 1))


def test_links_batch_classify_nofollow_and_internal():
    html = (
        '<a rel="nofollow" href="/a">pre</a>'
        '<a href="/b" rel="external nofollow">post</a>'
        '<a href="/c">plain</a>'
        "<a rel='nofollow' href='/d'>single</a>"
        '<a href="https://other.example/e">ext</a>'
    )
    out = links_batch(pa.table({
        "url": ["https://h.example/p"], "html": [html],
    }), classify=True).to_pandas().set_index("href")
    assert out.loc["/a", "nofollow"]
    assert out.loc["/b", "nofollow"]
    assert not out.loc["/c", "nofollow"]
    assert out.loc["/d", "nofollow"]
    assert not out.loc["https://other.example/e", "nofollow"]
    assert out.loc["/c", "internal"]
    assert not out.loc["https://other.example/e", "internal"]
    # default output shape unchanged
    plain = links_batch(pa.table({
        "url": ["https://h.example/p"], "html": [html]}))
    assert plain.column_names == ["url", "href", "resolved"]


SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://h.example/a?x=1&amp;y=2</loc>
       <lastmod>2024-01-02</lastmod></url>
  <url><loc> https://h.example/b </loc></url>
  <url><lastmod>2024-01-03</lastmod></url>
</urlset>"""

SITEMAP_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://h.example/sitemap1.xml</loc>
           <lastmod>2024-02-01</lastmod></sitemap>
  <sitemap><loc>https://h.example/sitemap2.xml</loc></sitemap>
</sitemapindex>"""


def test_sitemap_extraction_matches_etree():
    import xml.etree.ElementTree as ET

    from rdf_diff_store_ray.functions.weblinks import sitemap_batch

    out = sitemap_batch(pa.table({
        "url": ["https://h.example/sitemap.xml",
                "https://h.example/sitemap_index.xml"],
        "body": [SITEMAP, SITEMAP_INDEX],
    })).to_pandas()

    ns = "{http://www.sitemaps.org/schemas/sitemap/0.9}"
    want = []
    for src, xml, tag in ((
            "https://h.example/sitemap.xml", SITEMAP, "url"), (
            "https://h.example/sitemap_index.xml", SITEMAP_INDEX,
            "sitemap")):
        for el in ET.fromstring(xml).findall(f"{ns}{tag}"):
            loc = el.find(f"{ns}loc")
            if loc is None:
                continue
            lm = el.find(f"{ns}lastmod")
            want.append((src, tag, loc.text.strip(),
                         lm.text.strip() if lm is not None else None))
    got = list(out.itertuples(index=False, name=None))
    assert sorted(got, key=str) == sorted(want, key=str)
    assert "https://h.example/a?x=1&y=2" in out["loc"].tolist()


def test_host_edges_partials():
    rows = pa.table({
        "url": pa.array(["https://a.example/p1", "https://a.example/p2",
                         "https://b.example/p", "bad", None]),
        "href": pa.array(["x"] * 5),
        "resolved": pa.array(["https://b.example/q", "https://b.example/r",
                              "https://a.example/s", "https://a.example/t",
                              None]),
    })
    e = host_edges(rows).to_pandas()
    e = e.set_index(["src_host", "dst_host"])["n"]
    assert e[("a.example", "b.example")] == 2
    assert e[("b.example", "a.example")] == 1
    assert len(e) == 2  # invalid src/dst rows dropped


def test_anchor_texts_extraction():
    from rdf_diff_store_ray.functions.weblinks import anchor_text_batch

    html = (
        '<a href="/a">Read   the\n docs</a>'
        "<a class='x' href='/b'><img src='i.png'></a>"
        '<a href="/c">R&amp;D &lt;lab&gt;</a>'
        '<a name="no-href">skip</a>'
        '<p>not a link</p>'
    )
    out = anchor_text_batch(pa.table({
        "url": ["https://h.example/p"], "html": [html],
    })).to_pandas().set_index("href")
    assert out.loc["/a", "anchor_text"] == "Read the docs"
    assert out.loc["/b", "anchor_text"] == ""  # image link: first text node empty
    assert out.loc["/c", "anchor_text"] == "R&D <lab>"
    assert len(out) == 3  # href-less <a> skipped


def test_anchor_texts_on_corpus_nav():
    from rdf_diff_store_ray.functions.weblinks import anchor_text_batch

    c = corpus.generate(n_urls=6, n_snapshots=2, seed=8, n_links=2)
    out = anchor_text_batch(c.pages.select(["url", "html"])).to_pandas()
    by_href = out.groupby("href")["anchor_text"].agg(set)
    assert by_href["/"] == {"Home"}
    assert by_href["/about"] == {"About"}
    # planted n_links anchors render as "ref"
    planted = out[~out["href"].isin(["/", "/about"])]
    assert set(planted["anchor_text"]) == {"ref"}
    assert len(planted) == c.links.num_rows


def test_redirect_edges():
    from rdf_diff_store_ray.functions.weblinks import redirect_edges_batch

    batch = pa.table({
        "url": ["https://h.example/old", "https://h.example/rel",
                "https://h.example/ok", "https://h.example/no-loc"],
        "http_status": pa.array([301, 302, 200, 301], pa.int32()),
        "location": pa.array(["https://new.example/x", "../v2/page",
                              None, None]),
    })
    out = redirect_edges_batch(batch).to_pandas()
    assert len(out) == 2
    assert out.set_index("src").loc[
        "https://h.example/old", "dst"] == "https://new.example/x"
    assert out.set_index("src").loc[
        "https://h.example/rel", "dst"] == "https://h.example/v2/page"


def test_page_directives():
    from rdf_diff_store_ray.functions.weblinks import page_directives_batch

    pages = pa.table({
        "url": ["https://h.example/a?utm=1", "https://h.example/b",
                "https://h.example/c", "https://h.example/d"],
        "html": [
            '<head><link rel="canonical" href="/a"></head>ok',
            '<head><link href="https://h.example/B" rel=canonical>'
            '<meta name="robots" content="NOINDEX, nofollow"></head>',
            '<head><meta name="robots" content="index, follow"></head>',
            "no directives at all",
        ],
    })
    out = page_directives_batch(pages).to_pandas().set_index("url")
    assert out.loc["https://h.example/a?utm=1",
                   "canonical_url"] == "https://h.example/a"
    assert out.loc["https://h.example/b",
                   "canonical_url"] == "https://h.example/B"
    assert out.loc["https://h.example/b", "noindex"]
    assert out.loc["https://h.example/b", "nofollow"]
    assert not out.loc["https://h.example/c", "noindex"]
    assert out.loc["https://h.example/d", "canonical_url"] is None or \
        pd_isna(out.loc["https://h.example/d", "canonical_url"])


def pd_isna(v):
    import pandas as pd

    return pd.isna(v)


def test_link_diff_matches_naive_asof_replay(ray_session):
    """link_diff == a naive per-url as-of replay over the corpus's
    ground-truth links table (+ the static nav anchors every rendered
    page carries), at a mid/end instant pair where re-rendered pages
    genuinely change their anchor sets."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.corpus import EPOCH, SNAPSHOT_STEP
    from rdf_diff_store_ray.functions.weblinks import link_diff

    c = corpus.generate(n_urls=40, n_snapshots=5, seed=13, n_links=4)
    t1 = EPOCH + 2 * SNAPSHOT_STEP + 1
    t2 = EPOCH + 4 * SNAPSHOT_STEP + 1

    pages = c.pages.select(["url", "warc_ts", "html"]).to_pandas()
    pages["ts"] = pages["warc_ts"].astype("datetime64[s]").astype("int64")
    truth = c.links.to_pandas()
    truth["ts"] = truth["warc_ts"].astype("datetime64[s]").astype("int64")

    def linkset(url, ts):
        if ts is None:
            return set()
        s = set(truth.loc[
            (truth["url"] == url) & (truth["ts"] == ts), "resolved"])
        host = url.rsplit("/", 1)[0]
        return s | {host + "/", host + "/about"}

    want = set()
    for url, gp in pages.groupby("url"):
        tss = sorted(gp["ts"])
        v1 = max((t for t in tss if t <= t1), default=None)
        v2 = max((t for t in tss if t <= t2), default=None)
        s1, s2 = linkset(url, v1), linkset(url, v2)
        want |= {(url, d, "added") for d in s2 - s1}
        want |= {(url, d, "removed") for d in s1 - s2}

    out = link_diff(
        rd.from_arrow(c.pages.select(["url", "warc_ts", "html"])), t1, t2
    ).to_pandas()
    got = set(zip(out["src"], out["dst"], out["change"]))
    assert got == want
    assert len(want) > 0, "fixture must exercise real churn"
    assert {"added", "removed"} == set(out["change"].unique())


def test_edge_diff_matches_naive_on_random_streams(ray_session):
    """The factored generic operator (edge_diff over any (src, ts, dst)
    stream — the graded events_outlink_diff's engine) == a naive per-src
    as-of replay, on randomized streams with marker rows (empty
    versions), integer AND string srcs, NUL-bearing dsts, and cut
    instants before/inside/after history."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.functions.weblinks import edge_diff

    rng = np.random.default_rng(29)
    for trial, src_kind in ((0, "int"), (1, "str")):
        n = 600
        srcs = rng.integers(0, 25, size=n)
        if src_kind == "str":
            src_vals = np.array(
                [f"s{v}\x00{v % 3}" for v in srcs], dtype=object)
        else:
            src_vals = srcs.astype("int64")
        ts = rng.integers(0, 10, size=n) * 100
        dst_pool = ["a", "b\x00x", "b\x00y", "c", "d"]
        dsts = np.array(
            [None if rng.random() < 0.15
             else dst_pool[rng.integers(len(dst_pool))] for _ in range(n)],
            dtype=object)
        df = pd.DataFrame({"src": src_vals, "ts": ts, "dst": dsts})
        any_churn = False
        for t1, t2 in ((-50, 400), (300, 700), (500, 2000), (900, 901)):
            naive = set()
            for s, g in df.groupby("src", sort=False):
                tss = g["ts"].to_numpy()
                v1 = tss[tss <= t1].max() if (tss <= t1).any() else None
                v2 = tss[tss <= t2].max() if (tss <= t2).any() else None

                def edges(v):
                    if v is None:
                        return set()
                    d = g.loc[(g["ts"] == v) & g["dst"].notna(), "dst"]
                    return set(d)

                e1, e2 = edges(v1), edges(v2)
                naive |= {(s, d, "added") for d in e2 - e1}
                naive |= {(s, d, "removed") for d in e1 - e2}
            out = edge_diff(rd.from_pandas(df), t1, t2,
                            num_partitions=5).to_pandas()
            got = (set() if out.empty
                   else set(zip(out["src"], out["dst"], out["change"])))
            assert got == naive, (trial, t1, t2)
            any_churn = any_churn or bool(naive)
        assert any_churn  # the stream genuinely churns


def test_link_diff_zero_anchor_version_counts(ray_session):
    """A version that dropped every anchor diffs as all-removed (the
    marker row keeps version presence through the link explode)."""
    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.functions.weblinks import link_diff

    pages = pd.DataFrame({
        "url": ["https://a.com/p", "https://a.com/p"],
        "warc_ts": pd.to_datetime([100, 200], unit="s"),
        "html": [b'<a href="https://x.com/">x</a>', b"<html>bare</html>"],
    })
    out = link_diff(rd.from_pandas(pages), 100, 200).to_pandas()
    assert list(zip(out["src"], out["dst"], out["change"])) == [
        ("https://a.com/p", "https://x.com/", "removed")]
