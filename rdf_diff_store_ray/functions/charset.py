"""Charset sniffing + decoding for raw crawl HTML — the ingestion step
before text extraction that a real Common-Crawl corpus needs (the
archives are full of windows-1252 / shift_jis / utf-16 pages; decoding
everything as utf-8-replace mangles them).

Detection is fully vectorized over the BINARY column (Arrow's RE2
kernels run on binary directly — no decode before detection):

1. BOM (utf-8-sig, utf-16/32 LE/BE) on a 4-byte prefix slice;
2. HTTP ``Content-Type`` header charset (optional column — the WARC
   source emits it);
3. in-document declarations on a bounded prefix: ``<meta charset=…>``,
   ``<meta http-equiv="Content-Type" content="…; charset=…">``, and the
   XML ``encoding=…`` declaration;
4. default utf-8 (the WHATWG fallback).

Precedence BOM > header > meta mirrors the WHATWG encoding sniff; a
declared label is normalized through :func:`codecs.lookup` with the
WHATWG ``iso-8859-1 → windows-1252`` supersession (what every browser
does); unknown labels fall back to utf-8.

Decoding groups rows by resolved codec: the utf-8 group takes the
zero-copy Arrow cast when it validates (the overwhelming majority of a
modern crawl); only declared-non-utf-8 rows pay a per-row
``bytes.decode`` — bounded by the share of legacy pages, not corpus
size. Output text is NFC-normalized utf-8, BOM stripped, so downstream
extraction sees one canonical encoding.
"""

from __future__ import annotations

import codecs
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_BOMS = (
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)

# WHATWG supersessions browsers apply to declared labels
_LABEL_OVERRIDES = {
    "iso-8859-1": "windows-1252",
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
}

_META_RE = (
    rb'(?i)<meta[^>]{0,512}?charset\s*=\s*["\']?\s*(?P<cs>[A-Za-z0-9._\-]+)'
)
_XML_RE = rb'(?i)^<\?xml[^>]{0,256}?encoding\s*=\s*["\'](?P<cs>[A-Za-z0-9._\-]+)'
_CT_RE = r'(?i)charset\s*=\s*["\']?\s*(?P<cs>[A-Za-z0-9._\-]+)'


def normalize_label(label: str | None) -> str | None:
    """Declared charset label → canonical Python codec name (WHATWG
    supersessions applied); None for unknown/absent labels."""
    if not label:
        return None
    key = label.strip().lower()
    key = _LABEL_OVERRIDES.get(key, key)
    try:
        return codecs.lookup(key).name
    except LookupError:
        return None


def _binary(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        col = pc.cast(col, pa.binary())
    return col


def sniff_charsets(html, content_type=None, *, prefix: int = 2048):
    """BINARY html column (+ optional Content-Type string column) →
    string array of resolved codec names (never null for non-null
    input; utf-8 fallback). Fully vectorized."""
    h = _binary(html)
    n = len(h)
    out = np.full(n, None, dtype=object)

    head = pc.binary_slice(pc.fill_null(h, b""), 0, 4)
    for bom, codec in _BOMS:
        hit = pc.equal(pc.binary_slice(head, 0, len(bom)), pa.scalar(bom))
        mask = hit.to_numpy(zero_copy_only=False)
        np.putmask(out, (out == None) & mask, codec)  # noqa: E711

    def apply_labels(got: pa.Array) -> None:
        """Resolve extracted labels into still-unset slots; Python work
        is per DISTINCT label (handful per crawl), not per row."""
        vals = got.to_numpy(zero_copy_only=False)
        sel = (out == None) & (vals != None)  # noqa: E711
        if not sel.any():
            return
        uniq, inv = np.unique(vals[sel], return_inverse=True)
        mapped = np.array(
            [normalize_label(u.decode("ascii", "ignore")
                             if isinstance(u, bytes) else u)
             for u in uniq], dtype=object)
        res = mapped[inv]
        tgt = np.flatnonzero(sel)[res != None]  # noqa: E711
        out[tgt] = res[res != None]  # noqa: E711

    if content_type is not None:
        ct = content_type
        if isinstance(ct, pa.ChunkedArray):
            ct = ct.combine_chunks()
        apply_labels(pc.struct_field(
            pc.extract_regex(pc.fill_null(ct, ""), pattern=_CT_RE), "cs"))

    pref = pc.binary_slice(pc.fill_null(h, b""), 0, prefix)
    for pat in (_META_RE, _XML_RE):
        apply_labels(pc.struct_field(pc.extract_regex(pref, pattern=pat),
                                     "cs"))

    null_mask = h.is_null().to_numpy(zero_copy_only=False)
    out[(out == None) & ~null_mask] = "utf-8"  # noqa: E711
    return pa.array(out, pa.string())


def decode_html(html, charsets) -> pa.Array:
    """BINARY html + resolved codec names → NFC utf-8 string array.
    The utf-8 group takes the vectorized Arrow cast when it validates;
    declared-legacy rows decode per row with ``errors='replace'``."""
    h = _binary(html)
    cs = np.asarray(
        charsets.to_pylist() if isinstance(charsets, (pa.Array,
                                                      pa.ChunkedArray))
        else charsets, dtype=object)
    n = len(h)
    out = np.full(n, None, dtype=object)
    valid = ~h.is_null().to_numpy(zero_copy_only=False)
    for codec in {c for c in cs[valid]}:
        idx = np.flatnonzero(valid & (cs == codec))
        sub = h.take(pa.array(idx))
        if codec in ("utf-8", "utf-8-sig"):
            try:
                dec = pc.cast(sub, pa.string()).to_pylist()
                if codec == "utf-8-sig":
                    dec = [s[1:] if s.startswith("\ufeff") else s
                           for s in dec]
            except pa.ArrowInvalid:
                dec = [v.decode("utf-8-sig" if codec == "utf-8-sig"
                                else "utf-8", "replace")
                       for v in sub.to_pylist()]
        else:
            dec = [v.decode(codec, "replace") for v in sub.to_pylist()]
        out[idx] = np.array(dec, dtype=object)
    # NFC + BOM strip. pyarrow's utf8_normalize does NOT compose (16.1
    # leaves e+COMBINING ACUTE decomposed under form="NFC"), so this is
    # the same per-document unicodedata pass html_extract uses; the
    # is_normalized fast path skips the copy for already-NFC text.
    for i in np.flatnonzero(out != None):  # noqa: E711
        s = out[i]
        if s.startswith("\ufeff"):
            s = s.lstrip("\ufeff")
        if not unicodedata.is_normalized("NFC", s):
            s = unicodedata.normalize("NFC", s)
        out[i] = s
    return pa.array(out, pa.string())


def decode_pages_batch(batch: pa.Table, *, html_col: str = "html",
                       content_type_col: str | None = None,
                       text_col: str = "text_decoded",
                       charset_col: str = "charset") -> pa.Table:
    """``map_batches`` form: adds resolved ``charset`` and decoded
    NFC-utf-8 ``text_decoded`` columns to a pages batch."""
    ct = (batch[content_type_col]
          if content_type_col and content_type_col in batch.column_names
          else None)
    cs = sniff_charsets(batch[html_col], ct)
    dec = decode_html(batch[html_col], cs)
    out = batch
    for name, col in ((charset_col, cs), (text_col, dec)):
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, col)
    return out
