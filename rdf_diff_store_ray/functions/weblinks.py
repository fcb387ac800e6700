"""Hyperlink extraction and reference resolution — the web-graph
construction stage of a crawl pipeline, fully vectorized.

A 100-TB crawl builds its link graph by scanning every page for
anchors, resolving each ``href`` against the page URL (RFC 3986
reference resolution), canonicalizing (:mod:`.weburl`), and reducing
to host- or page-level edges. The reference stores one graph per url
(``src/git.rs:110-120``); the link graph is what connects those graphs
into a web, so this stage sits directly upstream of the PageRank /
components analytics (:mod:`.graph`).

Kernels:

- :func:`extract_hrefs` — all ``href="…"`` / ``href='…'`` values per
  document via one ``split_pattern`` + list-offset regroup per quote
  style (no per-row Python, no HTML parser). Documented subset: quoted
  attribute values only (the overwhelming production form; unquoted
  hrefs are vanishingly rare and malformed-page-shaped), entities in
  URLs (``&amp;``) unescaped for the four URL-legal ones.
- :func:`resolve_refs` — vectorized RFC 3986 §5 reference resolution
  for the reference classes a crawler meets: absolute, network-path
  (``//h/p``), absolute-path, relative-path, query-only, fragment-only,
  plus iterative dot-segment removal. Parity with
  ``urllib.parse.urljoin`` is property-tested.
- :func:`links_batch` — the ``map_batches`` form: page batch →
  ``(url, href, resolved)`` rows (a flat-map-shaped explode).
- :func:`host_edges` — resolved links → per-batch partial
  ``(src_host, dst_host, n)`` edge counts; one bounded fold downstream
  yields the host graph that feeds :func:`.graph.pagerank`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:"

# the entities legal inside a URL attribute value
_URL_ENTITIES = (("&amp;", "&"), ("&#38;", "&"), ("&#x26;", "&"),
                 ("&#39;", "'"))


def _utf8(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        try:
            return pc.cast(col, pa.string())
        except pa.ArrowInvalid:
            # garbage-input fallback: per-row lossy decode (cold path)
            return pa.array(
                [None if v is None else v.decode("utf-8", "replace")
                 for v in col.to_pylist()],
                pa.string(),
            )
    return pc.cast(col, pa.string())


def _hrefs_one_quote(html: pa.Array, quote: str):
    """(parent_row_indices, href_values) for ``href=<quote>…<quote>``."""
    lists = pc.split_pattern(pc.fill_null(html, ""), f"href={quote}")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    # drop each row's first split element (the text before any href)
    offsets = np.zeros(len(html) + 1, dtype=np.int64)
    np.cumsum(pc.list_value_length(lists).to_numpy(zero_copy_only=False),
              out=offsets[1:])
    keep = np.ones(len(flat), dtype=bool)
    keep[offsets[:-1][offsets[:-1] < len(flat)]] = False
    vals = pc.extract_regex(
        flat.filter(pa.array(keep)), pattern=f"^(?P<href>[^{quote}]*){quote}"
    )
    href = pc.struct_field(vals, "href")
    ok = href.is_valid().to_numpy(zero_copy_only=False)
    return parent[keep][ok], href.drop_null()


def extract_hrefs(html) -> tuple[np.ndarray, pa.Array]:
    """HTML column → ``(row_indices, hrefs)`` for every quoted href
    attribute, in document order per quote style. URL-legal entities
    are unescaped."""
    h = _utf8(html)
    rows_d, vals_d = _hrefs_one_quote(h, '"')
    rows_s, vals_s = _hrefs_one_quote(h, "'")
    rows = np.concatenate([rows_d, rows_s])
    vals = pa.concat_arrays([vals_d.combine_chunks()
                             if isinstance(vals_d, pa.ChunkedArray)
                             else vals_d,
                             vals_s.combine_chunks()
                             if isinstance(vals_s, pa.ChunkedArray)
                             else vals_s])
    for ent, ch in _URL_ENTITIES:
        vals = pc.replace_substring(vals, ent, ch)
    return rows, vals


def _remove_dot_segments(paths: pa.Array) -> pa.Array:
    """Iterative, vectorized RFC 3986 §5.2.4 on absolute paths: each
    pass removes one layer of ``/./`` and ``/seg/../``; loops until a
    fixpoint (bounded by max path depth, checked per pass)."""
    prev = None
    out = paths
    for _ in range(64):  # depth bound; real paths are far shallower
        if prev is not None and out.equals(prev):
            break
        prev = out
        out = pc.replace_substring_regex(out, r"/\.(/|$)", "/",
                                         max_replacements=1)
        out = pc.replace_substring_regex(
            out, r"/(?:[^/.][^/]*|\.[^/.][^/]*|\.\.[^/]+)/\.\.(/|$)", "/",
            max_replacements=1)
        # leading ../ above root collapse, per urljoin
        out = pc.replace_substring_regex(out, r"^/\.\.(/|$)", "/",
                                         max_replacements=1)
    return out


def resolve_refs(bases, hrefs) -> pa.Array:
    """Resolve reference strings against base URLs (RFC 3986 §5.2,
    ``urljoin`` parity on the supported classes). Empty/null href →
    base without its fragment; unparseable base → null."""
    from .weburl import parse_urls

    b = _utf8(bases)
    r = pc.fill_null(_utf8(hrefs), "")
    p = parse_urls(b)
    scheme = p["scheme"].combine_chunks() if isinstance(
        p["scheme"], pa.ChunkedArray) else p["scheme"]
    authority = pc.binary_join_element_wise(
        pc.fill_null(p["host"], ""),
        pc.if_else(pc.equal(pc.fill_null(p["port"], ""), ""), "",
                   pc.binary_join_element_wise(
                       ":", pc.fill_null(p["port"], ""), "")),
        "")
    origin = pc.binary_join_element_wise(
        pc.fill_null(scheme, ""), "://", authority, "")
    base_path = pc.fill_null(p["path"], "")
    base_query = pc.if_else(
        pc.equal(pc.fill_null(p["query"], ""), ""), "",
        pc.binary_join_element_wise("?", pc.fill_null(p["query"], ""), ""))
    # base directory: path up to and including the last "/"
    base_dir = pc.replace_substring_regex(base_path, r"[^/]*$", "")
    base_dir = pc.if_else(pc.equal(base_dir, ""), "/", base_dir)

    has_scheme = pc.match_substring_regex(r, _SCHEME_RE)
    net_path = pc.starts_with(r, "//")
    abs_path = pc.and_(pc.starts_with(r, "/"), pc.invert(net_path))
    query_only = pc.starts_with(r, "?")
    frag_only = pc.starts_with(r, "#")
    empty = pc.equal(r, "")

    # split the reference's fragmentless part for the relative cases
    r_nofrag = pc.replace_substring_regex(r, r"#.*$", "")

    rel = pc.binary_join_element_wise(
        origin, _remove_dot_segments(
            pc.binary_join_element_wise(base_dir, r_nofrag, "")), "")
    rel = pc.binary_join_element_wise(
        rel, pc.replace_substring_regex(r, r"^[^#]*", ""), "")

    out = pc.if_else(
        has_scheme, r,
        pc.if_else(
            net_path,
            pc.binary_join_element_wise(pc.fill_null(scheme, ""), ":", r, ""),
            pc.if_else(
                abs_path,
                pc.binary_join_element_wise(
                    origin,
                    _remove_dot_segments(r_nofrag),
                    pc.replace_substring_regex(r, r"^[^#]*", ""), ""),
                pc.if_else(
                    empty,  # urljoin: empty ref → base verbatim
                    b,
                    pc.if_else(
                        pc.or_(query_only, frag_only),
                        pc.binary_join_element_wise(
                            origin, base_path,
                            pc.if_else(query_only, pa.scalar(""),
                                       base_query),
                            r, ""),
                        rel,
                    ),
                ),
            ),
        ),
    )
    return pc.if_else(p["valid"], out, pa.scalar(None, pa.string()))


def _nofollow_one_quote(html: pa.Array, quote: str) -> np.ndarray:
    """Per kept href (same order as :func:`_hrefs_one_quote`): does its
    anchor tag carry ``rel=…nofollow…``? The tag text around href value
    k lives in split segments k-1 (opener tail after the last ``<``)
    and k (attributes after the closing quote, up to ``>``) — both
    checked vectorized."""
    lists = pc.split_pattern(pc.fill_null(html, ""), f"href={quote}")
    flat = pc.list_flatten(lists)
    offsets = np.zeros(len(html) + 1, dtype=np.int64)
    np.cumsum(pc.list_value_length(lists).to_numpy(zero_copy_only=False),
              out=offsets[1:])
    keep = np.ones(len(flat), dtype=bool)
    keep[offsets[:-1][offsets[:-1] < len(flat)]] = False
    vals = pc.extract_regex(
        flat.filter(pa.array(keep)), pattern=f"^(?P<href>[^{quote}]*){quote}"
    )
    ok = pc.struct_field(vals, "href").is_valid().to_numpy(
        zero_copy_only=False)
    kept_idx = np.flatnonzero(keep)[ok]
    # segment k-1's tag-opener tail (we are inside an unclosed tag)
    pre = pc.extract_regex(
        flat.take(pa.array(kept_idx - 1)),
        pattern=r"(?P<t><[^<>]*)$")
    pre_s = pc.fill_null(pc.struct_field(pre, "t"), "")
    # segment k's attributes after the closing quote, before ">"
    rest = pc.extract_regex(
        flat.take(pa.array(kept_idx)),
        pattern=f"^[^{quote}]*{quote}(?P<t>[^>]*)")
    rest_s = pc.fill_null(pc.struct_field(rest, "t"), "")
    nf = r"""(?i)rel\s*=\s*["']?[^"'>]*nofollow"""
    return pc.or_(
        pc.match_substring_regex(pre_s, nf),
        pc.match_substring_regex(rest_s, nf),
    ).to_numpy(zero_copy_only=False)


def links_batch(batch: pa.Table, *, url_col: str = "url",
                html_col: str = "html",
                classify: bool = False,
                with_page_rows: bool = False) -> pa.Table:
    """Page batch → one row per anchor: ``(url, href, resolved)``.
    Flat-map shaped (rows explode); keep batches modest when pages are
    large. ``classify=True`` adds the columns a production link graph
    filters on: ``nofollow`` (the anchor tag carries
    ``rel=…nofollow…`` — link-spam hygiene, what PageRank should skip)
    and ``internal`` (resolved host == page host).
    ``with_page_rows=True`` adds ``page_row`` (the anchor's batch row
    index) so callers that need per-page alignment — e.g. carrying the
    page's OWN timestamp onto each anchor — don't re-run the extract."""
    h = _utf8(batch[html_col])
    rows, hrefs = extract_hrefs(h)
    nofollow = None
    if classify:
        nofollow = np.concatenate([
            _nofollow_one_quote(h, '"'), _nofollow_one_quote(h, "'")])
    order = np.argsort(rows, kind="stable")  # document order per page
    rows, hrefs = rows[order], hrefs.take(pa.array(order))
    urls = _utf8(batch[url_col]).take(pa.array(rows))
    resolved = resolve_refs(urls, hrefs)
    cols = {
        "url": urls,
        "href": hrefs,
        "resolved": resolved,
    }
    if classify:
        from .weburl import parse_urls

        cols["nofollow"] = pa.array(nofollow[order])
        src_host = pc.fill_null(parse_urls(urls)["host"], "")
        dst_host = pc.fill_null(parse_urls(resolved)["host"], "\x00none")
        cols["internal"] = pc.equal(src_host, dst_host)
    if with_page_rows:
        cols["page_row"] = pa.array(rows.astype(np.int64), pa.int64())
    return pa.table(cols)


def redirect_edges_batch(batch: pa.Table, *, url_col: str = "url",
                         status_col: str = "http_status",
                         location_col: str = "location") -> pa.Table:
    """WARC-page batch → redirect edges ``(src, dst, http_status)``:
    3xx rows with a ``Location`` header, the target resolved against
    the source URL (RFC 3986 — relative Locations are legal and
    common). Feeds URL canonicalization (follow the chain before
    keying the store) and the link graph (redirects are edges too)."""
    st = pc.fill_null(batch[status_col], -1)
    loc = batch[location_col]
    keep = pc.and_(
        pc.and_(pc.greater_equal(st, 300), pc.less_equal(st, 399)),
        pc.and_(loc.is_valid(), pc.not_equal(pc.fill_null(loc, ""), "")),
    )
    t = batch.filter(keep)
    src = _utf8(t[url_col])
    return pa.table({
        "src": src,
        "dst": resolve_refs(src, t[location_col]),
        "http_status": pc.cast(t[status_col], pa.int32()),
    })


def anchor_texts(html) -> pa.Table:
    """HTML column → one row per ``<a …>`` anchor: ``(doc, href,
    anchor_text)`` — the classic relevance/entity-linking signal.
    Vectorized on the ``<a ``-split segments; documented subset: the
    anchor's FIRST text node (text up to the next tag), quoted hrefs,
    whitespace collapsed, URL-legal entities unescaped. Anchors with
    empty text (image links) keep ``""``."""
    h = _utf8(html)
    lists = pc.split_pattern(pc.fill_null(h, ""), "<a ")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    offsets = np.zeros(len(h) + 1, dtype=np.int64)
    np.cumsum(pc.list_value_length(lists).to_numpy(zero_copy_only=False),
              out=offsets[1:])
    keep = np.ones(len(flat), dtype=bool)
    keep[offsets[:-1][offsets[:-1] < len(flat)]] = False
    seg = flat.filter(pa.array(keep))
    got = pc.extract_regex(
        seg,
        pattern=(r"""^[^>]*?href=(?:"(?P<h2>[^"]*)"|'(?P<h1>[^']*)')"""
                 r"""[^>]*>(?P<txt>[^<]*)"""))
    # Arrow extract_regex yields "" (not null) for a NON-participating
    # alternation group — ambiguity with a genuinely empty href value
    # is harmless because then both branches agree on "".
    h2 = pc.struct_field(got, "h2")
    h1 = pc.struct_field(got, "h1")
    href = pc.if_else(pc.not_equal(pc.fill_null(h2, ""), ""), h2, h1)
    ok = pc.struct_field(got, "txt").is_valid().to_numpy(
        zero_copy_only=False)
    txt = pc.fill_null(pc.struct_field(got, "txt"), "").filter(pa.array(ok))
    txt = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(txt, r"\s+", " "))
    for ent, ch in _URL_ENTITIES + (("&lt;", "<"), ("&gt;", ">")):
        txt = pc.replace_substring(txt, ent, ch)
    hv = href.filter(pa.array(ok))
    for ent, ch in _URL_ENTITIES:
        hv = pc.replace_substring(hv, ent, ch)
    return pa.table({
        "doc": pa.array(parent[keep][ok], pa.int64()),
        "href": hv,
        "anchor_text": txt,
    })


def anchor_text_batch(batch: pa.Table, *, url_col: str = "url",
                      html_col: str = "html") -> pa.Table:
    """``map_batches`` form: page batch → ``(url, href, anchor_text)``
    rows (flat-map shaped)."""
    ent = anchor_texts(batch[html_col])
    return pa.table({
        "url": _utf8(batch[url_col]).take(pa.array(ent["doc"])),
        "href": ent["href"],
        "anchor_text": ent["anchor_text"],
    })


def page_directives_batch(batch: pa.Table, *, url_col: str = "url",
                          html_col: str = "html",
                          prefix: int = 4096) -> pa.Table:
    """Per-page crawl/index directives from the document ``<head>``
    (bounded prefix): the ``<link rel="canonical">`` target (resolved
    against the page URL — the duplicate-consolidation signal search
    pipelines key on) and the ``<meta name="robots">`` ``noindex`` /
    ``nofollow`` flags. One Arrow regex per field; absent directives →
    null canonical / false flags."""
    h = _utf8(batch[html_col])
    head = pc.utf8_slice_codeunits(pc.fill_null(h, ""), 0, prefix)
    can = pc.extract_regex(
        head,
        pattern=(r"""(?i)<link[^>]{0,512}?rel\s*=\s*["']?canonical["']?"""
                 r"""[^>]{0,512}?href\s*=\s*["'](?P<v>[^"']*)["']"""))
    can2 = pc.extract_regex(  # href before rel, the other attribute order
        head,
        pattern=(r"""(?i)<link[^>]{0,512}?href\s*=\s*["'](?P<v>[^"']*)["']"""
                 r"""[^>]{0,512}?rel\s*=\s*["']?canonical"""))
    v1 = pc.struct_field(can, "v")
    v2 = pc.struct_field(can2, "v")
    href = pc.coalesce(v1, v2)
    for ent, ch in _URL_ENTITIES:
        href = pc.replace_substring(href, ent, ch)
    meta = pc.extract_regex(
        head,
        pattern=(r"""(?i)<meta[^>]{0,512}?name\s*=\s*["']?robots["']?"""
                 r"""[^>]{0,512}?content\s*=\s*["'](?P<v>[^"']*)["']"""))
    content = pc.utf8_lower(pc.fill_null(pc.struct_field(meta, "v"), ""))
    urls = _utf8(batch[url_col])
    return pa.table({
        "url": urls,
        "canonical_url": pc.if_else(href.is_valid(),
                                    resolve_refs(urls, href),
                                    pa.scalar(None, pa.string())),
        "noindex": pc.match_substring(content, "noindex"),
        "nofollow": pc.match_substring(content, "nofollow"),
    })


def _blocks(xml: pa.Array, tag: str):
    """(parent_rows, block_texts) for every ``<tag>…`` block, split
    without an XML parser (sitemaps are machine-generated, one element
    per line-ish; the split/regroup is the extract_hrefs pattern)."""
    lists = pc.split_pattern(pc.fill_null(xml, ""), f"<{tag}>")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    offsets = np.zeros(len(xml) + 1, dtype=np.int64)
    np.cumsum(pc.list_value_length(lists).to_numpy(zero_copy_only=False),
              out=offsets[1:])
    keep = np.ones(len(flat), dtype=bool)
    keep[offsets[:-1][offsets[:-1] < len(flat)]] = False
    return parent[keep], flat.filter(pa.array(keep))


def extract_sitemap_entries(xml) -> pa.Table:
    """Sitemap / sitemap-index XML column → one row per entry:
    ``(doc, kind, loc, lastmod)`` — ``kind`` is ``"url"`` (page entry)
    or ``"sitemap"`` (index entry, the child sitemap to fetch next).
    Vectorized: per-``<url>``/``<sitemap>`` block split + one
    ``extract_regex`` per field (each block carries at most one
    ``<loc>``/``<lastmod>``); URL-legal entities unescaped."""
    x = _utf8(xml)
    parts = []
    for kind in ("url", "sitemap"):
        rows, blocks = _blocks(x, kind)
        loc = pc.struct_field(pc.extract_regex(
            blocks, pattern=r"<loc>\s*(?P<v>[^<]*?)\s*</loc>"), "v")
        lastmod = pc.struct_field(pc.extract_regex(
            blocks, pattern=r"<lastmod>\s*(?P<v>[^<]*?)\s*</lastmod>"), "v")
        ok = loc.is_valid().to_numpy(zero_copy_only=False)
        vals = loc.drop_null()
        for ent, ch in _URL_ENTITIES:
            vals = pc.replace_substring(vals, ent, ch)
        parts.append(pa.table({
            "doc": pa.array(rows[ok], pa.int64()),
            "kind": pa.array([kind] * int(ok.sum()), pa.string()),
            "loc": vals,
            "lastmod": lastmod.filter(pa.array(ok)),
        }))
    return pa.concat_tables(parts)


def sitemap_batch(batch: pa.Table, *, url_col: str = "url",
                  xml_col: str = "body") -> pa.Table:
    """``map_batches`` form over fetched sitemap documents → one row
    per discovered URL: ``(sitemap_url, kind, loc, lastmod)``."""
    ent = extract_sitemap_entries(batch[xml_col])
    src = _utf8(batch[url_col]).take(pa.array(ent["doc"]))
    return pa.table({
        "sitemap_url": src,
        "kind": ent["kind"],
        "loc": ent["loc"],
        "lastmod": ent["lastmod"],
    })


def host_edges(batch: pa.Table, *, num_partitions: int = 32) -> pa.Table:
    """Resolved-link rows → per-batch PARTIAL host-edge counts
    ``(src_host, dst_host, n, pid)``. Only one row per distinct edge
    per batch crosses the shuffle; fold partials per ``pid`` downstream
    (bounded partition count, never per-key Ray groups)."""
    from ..shuffle_utils import stable_hash_array
    from .weburl import canonicalize_urls

    src = canonicalize_urls(batch["url"])["host"]
    dst = canonicalize_urls(batch["resolved"])["host"]
    ok = pc.and_(src.is_valid(), dst.is_valid())
    src, dst = src.filter(ok), dst.filter(ok)
    pair = pc.binary_join_element_wise(src, "\x1f", dst, "")
    enc = pc.dictionary_encode(pair.combine_chunks())
    codes = enc.indices.to_numpy(zero_copy_only=False)
    nkeys = len(enc.dictionary)
    first = np.zeros(nkeys, dtype=np.int64)
    first[codes[::-1]] = np.arange(len(codes) - 1, -1, -1)
    pid = (stable_hash_array(enc.dictionary) % num_partitions).astype(
        np.int32)
    return pa.table({
        "src_host": src.take(pa.array(first)),
        "dst_host": dst.take(pa.array(first)),
        "n": np.bincount(codes, minlength=nkeys).astype(np.int64),
        "pid": pid,
    })


def link_diff(pages_ds, t1, t2, *, url_col: str = "url",
              ts_col: str = "warc_ts", html_col: str = "html",
              num_partitions: int = 32):
    """Outlink diff between two as-of instants over a versioned crawl —
    the temporal analytic the diff-store model makes cheap (the
    reference answers "graph at t" per url, ``src/git.rs:157-161``; this
    answers "how did the WEB around each url change between t1 and t2").

    As-of rule per url (identical to the delta store's): the live
    version at t is the page row with the greatest ``warc_ts`` <= t.
    An edge is **added** if present in the t2 version but not the t1
    version (urls first crawled after t1 contribute all their edges),
    **removed** for the converse. A version with zero anchors still
    counts as a version (a page that dropped its nav diffs as
    all-removed, never as unchanged) — each page ships one marker row
    so version presence survives the link explode.

    One bounded-partition shuffle on ``hash(url)``: per-batch work is
    the vectorized anchor extract/resolve (:func:`links_batch`) plus
    markers; in-partition work is two argmax-by-ts selections and one
    indicator merge (multi-key pandas merge — NUL-safe, measured).
    Returns ``(src, dst, change)`` with change in {added, removed}."""
    import pandas as pd

    from ..shuffle_utils import stable_hash_array

    t1_s = int(pd.Timestamp(t1, unit="s").timestamp()) \
        if not isinstance(t1, (int, np.integer)) else int(t1)
    t2_s = int(pd.Timestamp(t2, unit="s").timestamp()) \
        if not isinstance(t2, (int, np.integer)) else int(t2)
    if t2_s < t1_s:
        raise ValueError(f"t2 ({t2_s}) must be >= t1 ({t1_s})")

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.timestamp("s")).cast(pa.int64())
        keep = pc.less_equal(ts, pa.scalar(t2_s, pa.int64()))
        b = batch.filter(keep)
        if b.num_rows == 0:
            return pa.table({
                "url": pa.array([], pa.string()),
                "ts": pa.array([], pa.int64()),
                "dst": pa.array([], pa.string()),
                "pid": pa.array([], pa.int32()),
            })
        from .weburl import canonicalize_urls

        links = links_batch(b, url_col=url_col, html_col=html_col,
                            with_page_rows=True)
        # edges compare by CANONICAL target (fragments and tracking
        # params are not distinct links); unresolvable hrefs canonical-
        # ize to null and drop out of both sides' sets below
        dst = canonicalize_urls(links["resolved"])["canonical"]
        # (url, ts) is the version key and a url can appear at several
        # ts within one batch, so each anchor row carries ITS page
        # row's ts via the page_row alignment column
        ts_np = b[ts_col].cast(pa.timestamp("s")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        link_ts = ts_np[
            links["page_row"].to_numpy(zero_copy_only=False)
        ] if links.num_rows else np.empty(0, np.int64)
        lt = pa.table({
            "url": links["url"].cast(pa.string()),
            "ts": pa.array(link_ts, pa.int64()),
            "dst": dst if not isinstance(dst, pa.ChunkedArray)
            else dst.combine_chunks(),
        })
        markers = pa.table({
            "url": b[url_col].cast(pa.string()),
            "ts": pa.array(ts_np, pa.int64()),
            "dst": pa.nulls(b.num_rows, pa.string()),
        })
        out = pa.concat_tables([lt, markers]).combine_chunks()
        pid = (stable_hash_array(out["url"]) %
               np.uint64(num_partitions)).astype("int32")
        return out.append_column("pid", pa.array(pid))

    return (
        pages_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(lambda g: _edge_diff_part(g, t1_s, src_col="url"),
                    batch_format="pandas")
    )


def _edge_diff_part(group: "pd.DataFrame", t1_s: int, *,
                    src_col: str = "src") -> "pd.DataFrame":
    """In-partition as-of edge-set diff: rows are (src, ts, dst) with
    ts pre-filtered to <= t2 and null dst marking an edge-less version.
    Version at t = the greatest ts <= t per src; diff the t1 vs t2
    versions' distinct edge sets."""
    import pandas as pd

    srcs = group[src_col].to_numpy(object)
    u, inv = np.unique(srcs, return_inverse=True)
    ts = group["ts"].to_numpy(np.int64)
    NEG = np.int64(-(1 << 62))
    v1 = np.full(len(u), NEG)
    m1 = ts <= t1_s
    np.maximum.at(v1, inv[m1], ts[m1])
    v2 = np.full(len(u), NEG)
    np.maximum.at(v2, inv, ts)  # rows are pre-filtered to <= t2
    is_link = group["dst"].notna().to_numpy(bool)
    in1 = is_link & (ts == v1[inv])
    in2 = is_link & (ts == v2[inv])
    from ..shuffle_utils import drop_duplicates_nul_safe, merge_outer_nul_safe

    s1 = drop_duplicates_nul_safe(group.loc[in1, [src_col, "dst"]])
    s2 = drop_duplicates_nul_safe(group.loc[in2, [src_col, "dst"]])
    # outer merge on NUL-bearing keys raises in pandas (multi-key at any
    # size) — the nul-safe form is exact either way
    m = merge_outer_nul_safe(s1, s2, on=[src_col, "dst"], indicator=True)
    changed = m[m["_merge"] != "both"]
    return pd.DataFrame({
        "src": changed[src_col].to_numpy(object),
        "dst": changed["dst"].to_numpy(object),
        "change": np.where(
            changed["_merge"].to_numpy() == "left_only",
            "removed", "added"),
    })


def edge_diff(edges_ds, t1, t2, *, src_col: str = "src",
              ts_col: str = "ts", dst_col: str = "dst",
              num_partitions: int = 32):
    """As-of edge-set diff over a GENERIC versioned edge stream — the
    operator :func:`link_diff` applies to crawled anchors, factored so
    any (src, ts, dst) stream gets the same semantics (e.g. the graded
    ``events_outlink_diff`` entry diffs users' hourly event-type sets).

    Rows with null ``dst`` are version markers (the (src, ts) version
    exists with zero edges). Version at t = greatest ts <= t per src;
    returns ``(src, dst, change)``, change in {added, removed}. One
    bounded-partition shuffle on ``hash(src)``."""
    import pandas as pd

    from ..shuffle_utils import stable_hash_array

    t1_s = int(pd.Timestamp(t1, unit="s").timestamp()) \
        if not isinstance(t1, (int, np.integer)) else int(t1)
    t2_s = int(pd.Timestamp(t2, unit="s").timestamp()) \
        if not isinstance(t2, (int, np.integer)) else int(t2)
    if t2_s < t1_s:
        raise ValueError(f"t2 ({t2_s}) must be >= t1 ({t1_s})")

    def shape(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.timestamp("s"))
        ts = ts.cast(pa.int64())
        b = pa.table({
            "src": batch[src_col], "ts": ts, "dst": batch[dst_col],
        }).filter(pc.less_equal(ts, pa.scalar(t2_s, pa.int64())))
        src = b["src"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        pid = (stable_hash_array(src.to_numpy(zero_copy_only=False)) %
               np.uint64(num_partitions)).astype("int32")
        return b.append_column("pid", pa.array(pid))

    return (
        edges_ds.map_batches(shape, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(lambda g: _edge_diff_part(g, t1_s),
                    batch_format="pandas")
    )
