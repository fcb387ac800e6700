"""WARC source/sink: framing round-trips (plain + per-record gzip),
Common-Crawl-layout streaming reads, corruption handling, deterministic
distributed sink."""

import gzip
import io

import pyarrow as pa
import pytest

from rdf_diff_store_ray import corpus
from rdf_diff_store_ray.sources.warc import (
    iter_warc_records,
    read_warc,
    records_to_pages,
    warc_record_bytes,
    write_warc,
)

PAGE = ("https://h.example/p?q=1", 1_700_000_000, b"<html>hi \xf0\x9f\x8c\x90</html>")


def _records(data: bytes) -> list:
    return list(iter_warc_records(io.BytesIO(data)))


def test_record_roundtrip_plain():
    rec = warc_record_bytes(*PAGE)
    got = _records(rec)
    assert len(got) == 1
    pages = records_to_pages(got)
    assert pages["url"][0].as_py() == PAGE[0]
    assert int(pages["warc_ts"][0].cast(pa.int64()).as_py()) == PAGE[1]
    assert pages["html"][0].as_py() == PAGE[2]
    assert pages["http_status"][0].as_py() == 200


def test_record_roundtrip_gzip_members():
    """Common Crawl layout: one gzip member per record, concatenated."""
    recs = [warc_record_bytes(f"https://h.example/{i}", PAGE[1] + i,
                              f"<p>{i}</p>".encode()) for i in range(5)]
    data = b"".join(gzip.compress(r, mtime=0) for r in recs)
    pages = records_to_pages(_records(data))
    assert pages.num_rows == 5
    assert pages["url"].to_pylist() == [
        f"https://h.example/{i}" for i in range(5)]
    assert pages["html"].to_pylist() == [
        f"<p>{i}</p>".encode() for i in range(5)]


def test_non_response_records_are_skipped():
    info = (b"WARC/1.1\r\nWARC-Type: warcinfo\r\n"
            b"WARC-Record-ID: <urn:x:1>\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n"
            b"Content-Length: 4\r\n\r\nabcd\r\n\r\n")
    data = info + warc_record_bytes(*PAGE)
    pages = records_to_pages(_records(data))
    assert pages.num_rows == 1 and pages["url"][0].as_py() == PAGE[0]


def test_binary_payload_survives_verbatim():
    payload = bytes(range(256)) * 3 + b"\r\n\r\nWARC/1.1\r\n"  # framing bait
    rec = warc_record_bytes("https://h.example/bin", PAGE[1], payload)
    out = records_to_pages(_records(rec + warc_record_bytes(*PAGE)))
    assert out.num_rows == 2
    assert out["html"][0].as_py() == payload


def test_truncated_and_malformed_raise():
    rec = warc_record_bytes(*PAGE)
    with pytest.raises(ValueError, match="truncated"):
        _records(rec[: len(rec) // 2])
    with pytest.raises(ValueError, match="boundary"):
        _records(b"NOT A WARC\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        _records(b"WARC/1.1\r\nWARC-Type: response\r\n\r\nxx")


def test_record_bytes_are_deterministic():
    assert warc_record_bytes(*PAGE) == warc_record_bytes(*PAGE)
    assert gzip.compress(b"x", mtime=0)  # sanity: env gzip stable too


def test_write_read_roundtrip_distributed(ray_session, tmp_path):
    """Corpus pages → distributed WARC sink → streaming WARC source →
    identical (url, warc_ts, html) set; sink is re-run-deterministic."""
    import ray.data as rd

    c = corpus.generate(n_urls=13, n_snapshots=3, seed=21)
    pages = rd.from_arrow(c.pages.select(["url", "warc_ts", "html"]))
    out = str(tmp_path / "warcs")
    n = write_warc(pages, out, num_partitions=4)
    assert n == c.pages.num_rows

    got = (read_warc(out).select_columns(["url", "warc_ts", "html"])
           .to_pandas().sort_values(["url", "warc_ts"], ignore_index=True))
    exp = (c.pages.select(["url", "warc_ts", "html"]).to_pandas()
           .sort_values(["url", "warc_ts"], ignore_index=True))
    assert got["url"].tolist() == exp["url"].tolist()
    assert (got["warc_ts"].astype("datetime64[s]").tolist()
            == exp["warc_ts"].astype("datetime64[s]").tolist())
    assert got["html"].tolist() == exp["html"].tolist()

    # determinism: a second sink run publishes byte-identical objects
    out2 = str(tmp_path / "warcs2")
    write_warc(rd.from_arrow(c.pages.select(["url", "warc_ts", "html"])),
               out2, num_partitions=4)
    import os
    for name in sorted(os.listdir(out)):
        with open(f"{out}/{name}", "rb") as a, open(f"{out2}/{name}", "rb") as b:
            assert a.read() == b.read(), name


def test_read_warc_streams_bounded_blocks(tmp_path):
    """records_per_block bounds the tables the datasource yields (the
    1 GB-archive guard) — checked on the stream hook directly."""
    out = bytearray()
    for i in range(23):
        out += warc_record_bytes(f"https://h.example/{i}", PAGE[1] + i,
                                 b"<p>x</p>")
    p = tmp_path / "one.warc"
    p.write_bytes(bytes(out))
    from rdf_diff_store_ray.sources.warc import _datasource_cls

    ds_cls = _datasource_cls()
    ds = ds_cls([str(p)], records_per_block=7)
    with open(p, "rb") as f:
        tables = list(ds._read_stream(f, str(p)))
    assert [t.num_rows for t in tables] == [7, 7, 7, 2]
    assert sum(t.num_rows for t in tables) == 23


def test_write_warc_accepts_file_uri(ray_session, tmp_path):
    """The sink publishes through the fs shim, so object-store-style
    file:// URIs work like every other durable write in the repo."""
    import ray.data as rd

    c = corpus.generate(n_urls=6, n_snapshots=2, seed=4)
    n = write_warc(rd.from_arrow(c.pages.select(["url", "warc_ts", "html"])),
                   f"file://{tmp_path}/w", num_partitions=2)
    assert read_warc(f"{tmp_path}/w").count() == n == c.pages.num_rows


def test_corrupt_gzip_member_raises_valueerror():
    data = bytearray(gzip.compress(warc_record_bytes(*PAGE), mtime=0))
    data[len(data) // 2] ^= 0xFF
    with pytest.raises(ValueError, match="corrupt gzip"):
        _records(bytes(data))


def test_non_latin1_uri_roundtrips_utf8():
    """WARC 1.1 header values are UTF-8: an IRI with non-latin-1
    characters must survive a write/read round-trip byte-exactly (it
    previously crashed the sink with UnicodeEncodeError)."""
    import io

    from rdf_diff_store_ray.sources.warc import (
        iter_warc_records,
        warc_record_bytes,
    )

    url = "https://пример.example/päge/→"
    rec = warc_record_bytes(url, 1700000000, b"<html>ok</html>",
                            location="https://пример.example/nästa")
    got = list(iter_warc_records(io.BytesIO(rec)))
    assert len(got) == 1
    assert got[0]["warc-target-uri"] == url
