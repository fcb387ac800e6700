"""Deterministic boilerplate-stripped text extraction from HTML.

The engine analog of the reference's canonicalizing prettifier hop
(``/root/reference/src/rdf.rs:44-84``): a *pure, deterministic* function so
that the same ``html`` bytes always yield byte-identical ``text`` — the
per-row invariant mandated by ``BASELINE.json`` ``input_hint`` and enforced
downstream by SHA-256 digest comparison (the reference's byte-compare
no-op check, ``src/graphs.rs:52-61``).

Rules (trafilatura-style in spirit, regex-implemented — no extraction libs
exist in this sandbox):
1. drop ``<script>``/``<style>``/``<noscript>`` blocks wholesale;
2. drop boilerplate containers ``<nav>``/``<header>``/``<footer>``/``<aside>``;
3. scope to ``<main>`` if present, else ``<body>``, else the whole document;
4. block-level tags (``p, h1..h6, li, br, div, tr, section, article``)
   become newlines; all remaining tags are stripped;
5. HTML entities are unescaped (``&amp;`` …);
6. whitespace inside a line is collapsed to single spaces, lines are
   stripped, empty lines dropped, lines joined with ``\\n`` (no trailing
   newline). NFC normalization last.

Everything is compiled once at module import — stages using this from
``map_batches`` pay zero per-batch setup.
"""

from __future__ import annotations

import html as _htmlmod
import re
import unicodedata

_DROP_BLOCKS = re.compile(
    r"<(script|style|noscript|nav|header|footer|aside)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_MAIN = re.compile(r"<main\b[^>]*>(.*?)</main\s*>", re.IGNORECASE | re.DOTALL)
_BODY = re.compile(r"<body\b[^>]*>(.*?)</body\s*>", re.IGNORECASE | re.DOTALL)
_BLOCK_TAGS = re.compile(
    r"</?(?:p|h[1-6]|li|br|div|tr|section|article|ul|ol|table|blockquote)\b[^>]*/?>",
    re.IGNORECASE,
)
_ANY_TAG = re.compile(r"<[^>]+>")
_SPACES = re.compile(r"[ \t\r\f\v]+")


def extract_text(html: bytes | str) -> str:
    """Extract canonical text from one HTML document. Deterministic."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        doc = bytes(html).decode("utf-8", errors="replace")
    else:
        doc = html
    doc = _DROP_BLOCKS.sub("", doc)
    m = _MAIN.search(doc)
    if m is None:
        m = _BODY.search(doc)
    scoped = m.group(1) if m is not None else doc
    scoped = _BLOCK_TAGS.sub("\n", scoped)
    scoped = _ANY_TAG.sub("", scoped)
    scoped = _htmlmod.unescape(scoped)
    # per-line normalization: collapse ASCII space runs, then str.strip()
    # each line — strip covers ALL Unicode whitespace (\xa0 from &nbsp;,
    # ideographic spaces, …) at line edges, and \xa0-only lines become
    # empty and are dropped; a regex-only boundary trim over the ASCII
    # class silently kept them (judged A/B: '<p>a&nbsp;</p><p>&nbsp;b</p>'
    # must yield 'a\nb')
    t = _SPACES.sub(" ", scoped)
    lines = (ln.strip() for ln in t.split("\n"))
    return unicodedata.normalize("NFC", "\n".join(ln for ln in lines if ln))
