"""URL operators for web-corpus curation: parse, canonicalize,
registrable domain.

A crawl-scale pipeline dedups and groups pages by *canonical* URL —
the same document arrives as ``HTTP://WWW.Site.COM:80/p?b=2&a=1&utm_
source=feed#frag`` and ``http://site.com/p?a=1&b=2`` — and aggregates
per *registrable domain* (eTLD+1), not per raw hostname. The reference
keys its store by raw url string (``BASELINE.json input_hint``; one
graph per url, ``src/git.rs:110-120``), so canonicalization is the
natural pre-keying stage in front of it.

Everything here is a vectorized Arrow kernel, safe inside
``map_batches`` on the hot path:

- :func:`parse_urls` — one RE2 ``extract_regex`` pass (RFC-3986-shaped
  absolute URLs; no scheme-relative or relative refs, which a crawler
  resolves against the base before this stage).
- :func:`canonical_query` — drop tracking params, bytewise-sort the
  rest; list-offset numpy regroup + ``binary_join``, no Python loop.
- :func:`canonicalize_urls` — lowercase scheme/host, strip
  credentials, ``www.``, default ports and fragments, empty path →
  ``/``; composed from the two kernels above.
- :func:`registrable_domains` — eTLD+1 by suffix-list regex. The
  vendored suffix set is a documented SUBSET of the public-suffix
  list (publicsuffix.org); a deployment swaps in the full list by
  regenerating the alternation (it compiles to a DFA, so size is a
  build-time cost, not a per-row one).

The regexes are RE2-compatible and shared verbatim with the DuckDB
oracles (both engines run RE2-class matching), so the SQL parity check
exercises the same pattern text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_URL_PATTERN = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
    r"(?:(?P<userinfo>[^@/?#]*)@)?"
    r"(?P<host>[^:/?#]*)"
    r"(?::(?P<port>[0-9]+))?"
    r"(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#(?P<fragment>.*))?$"
)

# tracking tokens dropped at canonicalization: any utm_* key, plus the
# common click-id keys (matched as "key=" so e.g. "refresh=1" survives
# a "ref=" rule)
TRACKING_PREFIXES = ("utm_", "gclid=", "fbclid=", "msclkid=", "ref=")

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80",
                  "wss": "443"}

# Two-label public suffixes (publicsuffix.org subset — see module doc).
TWO_PART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "co.in", "co.nz",
    "co.za", "com.au", "net.au", "org.au", "com.br", "com.cn",
    "com.mx", "com.tr", "github.io", "blogspot.com",
)

# leftmost match = the earliest label whose tail is "label.suffix" or
# "label.tld"; matching is label-aligned because a mid-label start is
# never earlier than its label's start
REGISTRABLE_PATTERN = (
    r"(?P<reg>[^.]+\.(?:"
    + "|".join(s.replace(".", r"\.") for s in TWO_PART_SUFFIXES)
    + r"|[^.]+))$"
)


def _str(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pc.cast(arr, pa.string())


def parse_urls(urls) -> pa.Table:
    """URL strings → columns ``scheme userinfo host port path query
    fragment`` plus ``valid``. Absent components are ``""``; every
    component of an unparseable (or null) URL is null and ``valid`` is
    false."""
    parts = pc.extract_regex(_str(urls), pattern=_URL_PATTERN)
    cols = {
        name: pc.struct_field(parts, name)
        for name in ("scheme", "userinfo", "host", "port", "path",
                     "query", "fragment")
    }
    cols["valid"] = pc.fill_null(parts.is_valid()
                                 if isinstance(parts, pa.Array)
                                 else pa.array(parts.is_valid()), False)
    return pa.table(cols)


def canonical_query(query) -> pa.Array:
    """Query strings (no leading ``?``; ``""`` = none) → canonical
    form: ``&``-split, tracking params dropped, remaining ``k=v``
    tokens bytewise-sorted, re-joined. Null in → null out."""
    q = _str(query)
    tokens_list = pc.split_pattern(pc.fill_null(q, ""), "&")
    flat = pc.list_flatten(tokens_list)
    parent = pc.list_parent_indices(tokens_list).to_numpy(
        zero_copy_only=False)
    keep = pc.not_equal(flat, "")
    for prefix in TRACKING_PREFIXES:
        keep = pc.and_(keep, pc.invert(pc.starts_with(flat, prefix)))
    keep_np = keep.to_numpy(zero_copy_only=False)
    kept = flat.filter(keep)
    kept_parent = parent[keep_np]

    # bytewise sort within each URL's token run: factorize to sorted
    # codes (np.unique sorts), then one lexsort over (parent, code)
    toks_np = kept.to_numpy(zero_copy_only=False)
    _, codes = np.unique(toks_np, return_inverse=True)
    order = np.lexsort((codes, kept_parent))
    counts = np.bincount(kept_parent, minlength=len(q))
    offsets = np.zeros(len(q) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                 kept.take(pa.array(order))),
        "&",
    )
    return pc.if_else(q.is_valid(), joined, pa.scalar(None, pa.string()))


def canonicalize_urls(urls) -> pa.Table:
    """URL strings → ``{canonical, host, valid}``. Rules: scheme and
    host lowercased; credentials, fragment and a leading ``www.``
    dropped; scheme-default port dropped (other ports kept); empty
    path becomes ``/``; query canonicalized by :func:`canonical_query`
    (dropped entirely when nothing survives). Invalid URLs yield null
    canonical/host."""
    p = parse_urls(urls)
    scheme = pc.utf8_lower(p["scheme"])
    host = pc.utf8_lower(p["host"])
    host = pc.if_else(pc.starts_with(host, "www."),
                      pc.utf8_slice_codeunits(host, 4, np.iinfo(np.int32).max),
                      host)
    port = p["port"].combine_chunks() if isinstance(
        p["port"], pa.ChunkedArray) else p["port"]
    is_default = pa.array(np.zeros(len(p), dtype=bool))
    for sch, dport in _DEFAULT_PORTS.items():
        is_default = pc.or_(
            is_default,
            pc.and_(pc.equal(scheme, sch), pc.equal(port, dport)),
        )
    port_part = pc.if_else(
        pc.or_(pc.equal(port, ""), is_default),
        "",
        pc.binary_join_element_wise(":", port, ""),
    )
    path = pc.if_else(pc.equal(p["path"], ""), "/", p["path"])
    q = canonical_query(p["query"])
    q_part = pc.if_else(pc.equal(q, ""), "",
                        pc.binary_join_element_wise("?", q, ""))
    canonical = pc.binary_join_element_wise(
        scheme, "://", host, port_part, path, q_part, ""
    )
    return pa.table({"canonical": canonical, "host": host,
                     "valid": p["valid"]})


def registrable_domains(hosts) -> pa.Array:
    """Hostnames (lowercase, no port) → registrable domain (eTLD+1)
    under :data:`TWO_PART_SUFFIXES`. Single-label hosts (``localhost``)
    and null/empty input return null."""
    reg = pc.extract_regex(_str(hosts), pattern=REGISTRABLE_PATTERN)
    return pc.struct_field(reg, "reg")


def parse_urls_batch(batch: pa.Table, *, url_col: str = "url") -> pa.Table:
    """``map_batches`` form: append parse + canonical + domain columns
    to the batch (canonical pipeline in one pass per batch)."""
    c = canonicalize_urls(batch[url_col])
    out = batch
    for name in ("canonical", "host", "valid"):
        out = out.append_column(name, c[name])
    return out.append_column("domain", registrable_domains(c["host"]))
