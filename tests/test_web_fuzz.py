"""Crash-freedom fuzz for the crawl-family parsers: arbitrary bytes
must produce results or a clean ValueError — never hangs, never
unexpected exception types. Pure-kernel tests, no Ray."""

import io

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_diff_store_ray.functions.charset import decode_html, sniff_charsets
from rdf_diff_store_ray.functions.robots import compile_rules, parse_robots
from rdf_diff_store_ray.functions.weblinks import (
    anchor_texts,
    extract_hrefs,
    extract_sitemap_entries,
    links_batch,
    page_directives_batch,
)
from rdf_diff_store_ray.sources.warc import iter_warc_records


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_warc_parser_never_hangs_or_misraises(data):
    try:
        recs = list(iter_warc_records(io.BytesIO(data)))
    except ValueError:
        return  # malformed framing must raise exactly ValueError
    except (EOFError, OSError):  # truncated gzip member
        return
    for r in recs:
        assert isinstance(r["block"], bytes)


@given(st.lists(st.binary(max_size=300), min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_charset_sniff_decode_total(blobs):
    arr = pa.array(blobs, pa.binary())
    cs = sniff_charsets(arr)
    out = decode_html(arr, cs).to_pylist()
    assert len(out) == len(blobs)
    assert all(isinstance(t, str) for t in out)


@given(st.text(max_size=400))
@settings(max_examples=200, deadline=None)
def test_robots_parser_total(txt):
    rules = parse_robots(txt, agent="anybot")
    assert all(isinstance(spec, int) for _, _, spec in rules)
    compile_rules({"h.example": txt})  # regexes must compile


@given(st.text(max_size=400))
@settings(max_examples=200, deadline=None)
def test_html_extractors_total(html):
    arr = pa.array([html])
    rows, hrefs = extract_hrefs(arr)
    assert len(rows) == len(hrefs)
    anchor_texts(arr)
    extract_sitemap_entries(arr)
    page_directives_batch(pa.table({"url": ["https://h.example/p"],
                                    "html": arr}))
    links_batch(pa.table({"url": ["https://h.example/p"], "html": arr}),
                classify=True)
