"""WARC source / sink — the container format Common-Crawl-style web
pages actually arrive in (ISO 28500 / WARC 1.1; the ``input_hint``'s
``(url, warc_ts, html)`` columns are exactly a WARC response record's
``WARC-Target-URI`` / ``WARC-Date`` / HTTP payload).

- :func:`read_warc` — a streaming ``FileBasedDatasource``: records are
  parsed incrementally off the open file stream (plain or per-record
  gzip members, the Common Crawl layout) and yielded as bounded Arrow
  blocks — a 1 GB ``.warc.gz`` never materializes in worker memory, and
  Ray's file-level parallelism shards the corpus across tasks exactly
  like the parquet read path.
- :func:`write_warc` — the inverse sink: pages hash into bounded
  partitions, each writer task serializes its partition (sorted by
  ``(url, warc_ts)`` for determinism) into one ``part-NNNNN.warc[.gz]``
  published through the object-store shim (:mod:`..fs`) — resumable
  one-object-per-partition output, never one giant file.

Record ids are content-addressed (``urn:sha256:...`` over target +
date + payload): no wall clock, no randomness, so the sink is
byte-deterministic (gzip members carry ``mtime=0``) and re-runs
publish identical objects.

Scope (documented subset): ``response`` records with an
``application/http`` block are decoded to pages; other record types
(request/metadata/warcinfo/…) are skipped on read and not emitted on
write. Transfer-encoded payloads are kept verbatim (Common Crawl
strips chunking before archiving).
"""

from __future__ import annotations

import hashlib
import zlib
from datetime import datetime, timezone

import pyarrow as pa

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("s")),
        ("html", pa.binary()),
        ("http_status", pa.int32()),
        ("content_type", pa.string()),
        ("location", pa.string()),
    ]
)


class _RecordStream:
    """Buffered reader over a raw byte stream with transparent
    multi-member gzip decompression (one gzip member per record, the
    Common Crawl layout — plain concatenated-member files work too)."""

    def __init__(self, raw, chunk: int = 1 << 20):
        self._raw = raw
        self._chunk = chunk
        self._buf = bytearray()
        self._pos = 0
        head = raw.read(2)
        self._gzip = head == _GZIP_MAGIC
        self._carry = head  # compressed bytes not yet fed to the inflater
        self._z = None
        if self._gzip:
            self._z = zlib.decompressobj(16 + zlib.MAX_WBITS)

    def _pull(self) -> bool:
        """Decompress/read one more chunk into the buffer. False = EOF."""
        if self._pos:  # drop consumed prefix so the buffer stays bounded
            del self._buf[: self._pos]
            self._pos = 0
        if not self._gzip:
            data = self._carry or self._raw.read(self._chunk)
            self._carry = b""
            if not data:
                return False
            self._buf += data
            return True
        while True:
            comp = self._carry or self._raw.read(self._chunk)
            self._carry = b""
            try:
                if not comp:
                    tail = self._z.flush()
                    if tail:
                        self._buf += tail
                        return True
                    return False
                out = self._z.decompress(comp)
            except zlib.error as e:  # corrupt member → clean ValueError
                raise ValueError(f"corrupt gzip member in WARC: {e}") from e
            if self._z.eof:  # next gzip member begins in unused_data
                rest = self._z.unused_data
                self._z = zlib.decompressobj(16 + zlib.MAX_WBITS)
                self._carry = rest
            if out:
                self._buf += out
                return True

    def read_line(self) -> bytes | None:
        """One CRLF-terminated line (terminator stripped); None at EOF."""
        while True:
            i = self._buf.find(b"\n", self._pos)
            if i >= 0:
                line = bytes(self._buf[self._pos : i])
                self._pos = i + 1
                return line.rstrip(b"\r")
            if not self._pull():
                if self._pos < len(self._buf):
                    line = bytes(self._buf[self._pos :])
                    self._pos = len(self._buf)
                    return line
                return None

    def read_exact(self, n: int) -> bytes:
        while len(self._buf) - self._pos < n:
            if not self._pull():
                raise ValueError(
                    f"truncated WARC: wanted {n} block bytes, stream ended")
        out = bytes(self._buf[self._pos : self._pos + n])
        self._pos += n
        return out


def _hdr_str(b: bytes) -> str:
    """Header value bytes → str: UTF-8 per WARC 1.1 (ISO 28500 §4),
    falling back to latin-1 for the raw-byte headers real crawls
    contain — never an exception, never mojibake for spec-clean input."""
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def _parse_http_response(block: bytes):
    """(status, content_type, location, payload) from an HTTP response
    block; (None, None, None, block) when the block isn't parseable
    HTTP. ``location`` is the redirect target header (3xx records —
    the redirect-graph edge a crawler follows)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block.startswith(b"HTTP/"):
        return None, None, None, block
    head, payload = block[:sep], block[sep + 4 :]
    lines = head.split(_CRLF)
    parts = lines[0].split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, None, block
    ctype = location = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        key = k.strip().lower()
        if key == b"content-type" and ctype is None:
            ctype = _hdr_str(v.strip())
        elif key == b"location" and location is None:
            location = _hdr_str(v.strip())
    return status, ctype, location, payload


def _warc_ts_seconds(date: str) -> int:
    """``WARC-Date`` (ISO 8601, Z-suffixed) → unix seconds (the store's
    resolution, ``src/git.rs:82,157``)."""
    dt = datetime.fromisoformat(date.replace("Z", "+00:00"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp())


def iter_warc_records(raw):
    """Incremental record iterator over an open binary stream (plain or
    gzipped). Yields dicts with the WARC header fields (lower-cased
    keys, string values) plus ``block`` (bytes). Malformed framing
    raises — a corrupt archive must fail loudly, not drop records."""
    rs = _RecordStream(raw)
    while True:
        line = rs.read_line()
        while line == b"":  # inter-record blank lines
            line = rs.read_line()
        if line is None:
            return
        if not line.startswith(b"WARC/"):
            raise ValueError(f"not a WARC record boundary: {line[:40]!r}")
        hdr: dict = {"__version": _hdr_str(line)}
        while True:
            ln = rs.read_line()
            if ln is None:
                raise ValueError("truncated WARC: EOF inside record header")
            if ln == b"":
                break
            k, sep, v = ln.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header line: {ln[:60]!r}")
            hdr[_hdr_str(k.strip().lower())] = _hdr_str(v.strip())
        try:
            n = int(hdr["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record without a valid Content-Length")
        hdr["block"] = rs.read_exact(n)
        yield hdr


def records_to_pages(records) -> pa.Table:
    """``response`` records → a pages block (other types skipped)."""
    urls, tss, htmls, stats, ctypes, locs = [], [], [], [], [], []
    for rec in records:
        if rec.get("warc-type") != "response":
            continue
        url = rec.get("warc-target-uri")
        date = rec.get("warc-date")
        if not url or not date:
            continue
        status, ctype, location, payload = _parse_http_response(rec["block"])
        urls.append(url)
        tss.append(_warc_ts_seconds(date))
        htmls.append(payload)
        stats.append(status)
        ctypes.append(ctype)
        locs.append(location)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("s")),
            "html": pa.array(htmls, pa.binary()),
            "http_status": pa.array(stats, pa.int32()),
            "content_type": pa.array(ctypes, pa.string()),
            "location": pa.array(locs, pa.string()),
        }
    )


class WarcDatasource:
    """Streaming WARC → pages datasource. Implemented lazily (the class
    body imports Ray) via :func:`_datasource_cls`."""


def _datasource_cls():
    from ray.data.datasource import FileBasedDatasource

    class _WarcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["warc", "warc.gz"]

        def __init__(self, paths, *, records_per_block: int = 512, **kw):
            super().__init__(paths, **kw)
            self._records_per_block = records_per_block

        def _read_stream(self, f, path: str):
            batch: list = []
            for rec in iter_warc_records(f):
                batch.append(rec)
                if len(batch) >= self._records_per_block:
                    yield records_to_pages(batch)
                    batch = []
            if batch:
                yield records_to_pages(batch)

    return _WarcDatasource


def read_warc(paths, *, records_per_block: int = 512, **kw):
    """WARC file(s)/dir → streaming pages Dataset ``(url, warc_ts,
    html, http_status, content_type)``. Blocks are bounded at
    ``records_per_block`` records so a large archive streams."""
    import ray.data as rd

    return rd.read_datasource(
        _datasource_cls()(paths, records_per_block=records_per_block, **kw))


# ------------------------------------------------------------------ sink ---


def warc_record_bytes(url: str, ts_seconds: int, html: bytes,
                      *, status: int = 200,
                      content_type: str = "text/html",
                      location: str | None = None) -> bytes:
    """One deterministic ``response`` record (content-addressed id).
    ``location`` adds the redirect-target header (3xx records)."""
    html = html or b""
    date = datetime.fromtimestamp(int(ts_seconds), tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ")
    loc_hdr = f"Location: {location}\r\n" if location else ""
    # WARC 1.1 header values are UTF-8 (ISO 28500 §4); HTTP header
    # bytes ride along utf-8 too so a non-latin-1 Location/IRI can't
    # crash the sink (readers below decode the same way)
    http = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {content_type}\r\n{loc_hdr}"
        f"Content-Length: {len(html)}\r\n\r\n"
    ).encode("utf-8") + html
    rid = hashlib.sha256(
        url.encode() + b"\x1f" + date.encode() + b"\x1f" + html).hexdigest()
    hdr = (
        "WARC/1.1\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:sha256:{rid}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("utf-8")
    return hdr + http + b"\r\n\r\n"


def _gzip_member(data: bytes) -> bytes:
    """One deterministic gzip member (fixed header, mtime=0)."""
    co = zlib.compressobj(9, zlib.DEFLATED, -zlib.MAX_WBITS)
    body = co.compress(data) + co.flush()
    header = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
    trailer = (zlib.crc32(data) & 0xFFFFFFFF).to_bytes(4, "little") + (
        len(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return header + body + trailer


def write_warc(pages_ds, out_dir: str, *, num_partitions: int = 16,
               gzip: bool = True) -> int:
    """Pages Dataset → ``out_dir/part-NNNNN.warc[.gz]``, one object per
    hash partition of ``url`` (the store's partition key), rows sorted
    by ``(url, warc_ts)`` inside each — byte-deterministic under any
    batch/partition arrival order, resumable per object. Returns the
    number of records written."""
    import pandas as pd

    from .. import fs
    from ..shuffle_utils import add_partition_id, sort_values_nul_safe

    ext = "warc.gz" if gzip else "warc"

    def part(batch: pa.Table) -> pa.Table:
        return add_partition_id(batch, "url", num_partitions, col="pid")

    def write_group(df: pd.DataFrame) -> pd.DataFrame:
        pid = int(df["pid"].iloc[0])
        df = sort_values_nul_safe(df, ["url", "warc_ts"])
        out = bytearray()
        ts = (df["warc_ts"].astype("datetime64[s]").astype("int64")
              if df["warc_ts"].dtype.kind == "M" else df["warc_ts"])
        for url, t, html in zip(df["url"], ts, df["html"]):
            rec = warc_record_bytes(url, int(t), html)
            out += _gzip_member(rec) if gzip else rec
        fs.put_bytes(f"{out_dir}/part-{pid:05d}.{ext}", bytes(out))
        return pd.DataFrame({"pid": [pid], "n": [len(df)]})

    written = (
        pages_ds.select_columns(["url", "warc_ts", "html"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(write_group, batch_format="pandas")
    )
    return int(sum(r["n"] for r in written.take_all()))
