"""Extraction: byte-identity invariant, determinism, boilerplate removal."""

import pyarrow as pa
import pytest

from rdf_diff_store_ray.html_extract import extract_text
from rdf_diff_store_ray.stages.extract import extract_batch


def test_byte_identity_on_corpus(small_corpus):
    pages = small_corpus.pages
    for html, text in zip(pages["html"].to_pylist(), pages["text"].to_pylist()):
        assert extract_text(html) == text


def test_extract_batch_digest_enforcement(small_corpus):
    out = extract_batch(small_corpus.pages.slice(0, 20), enforce="raise")
    assert out.num_rows == 20
    assert all(len(d) == 32 for d in out["digest"].to_pylist())


def test_extract_batch_raises_on_tamper(small_corpus):
    pages = small_corpus.pages.slice(0, 5)
    tampered = pages.set_column(
        pages.schema.get_field_index("text"),
        "text",
        pa.array(["WRONG"] * 5, pa.string()),
    )
    with pytest.raises(ValueError, match="byte-identical"):
        extract_batch(tampered, enforce="raise")


def test_boilerplate_stripped():
    html = (
        b"<html><head><script>alert(1)</script></head><body>"
        b"<nav>MENU</nav><main><h1>Title</h1><p>Body &amp; more</p></main>"
        b"<footer>FOOT</footer></body></html>"
    )
    assert extract_text(html) == "Title\nBody & more"


def test_whitespace_collapsed_and_entities():
    html = b"<html><body><main><p>a  b\t c</p><p>x &lt; y</p></main></body></html>"
    assert extract_text(html) == "a b c\nx < y"


def test_unicode_whitespace_trimmed_at_line_edges():
    """&nbsp; (\\xa0) and other Unicode whitespace at line boundaries is
    stripped and \\xa0-only lines are dropped — str.strip() semantics, not
    just the ASCII space class (ADVICE round-2 regression)."""
    assert extract_text(b"<p>a&nbsp;</p><p>&nbsp;b</p>") == "a\nb"
    assert extract_text(b"<p>&nbsp;</p><p>x</p>") == "x"
    assert extract_text("<p>　c　</p>".encode()) == "c"
    # interior \xa0 is content, not a separator — preserved
    assert extract_text(b"<p>a&nbsp;b</p>") == "a\xa0b"


def test_deterministic():
    html = b"<html><body><main><p>stable</p></main></body></html>"
    assert extract_text(html) == extract_text(html)
