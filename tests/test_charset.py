"""Charset sniffing/decoding: WHATWG-ish precedence, codec parity with
python bytes.decode, NFC output, Ray stage integration."""

import codecs

import pyarrow as pa
import pytest

from rdf_diff_store_ray.functions.charset import (
    decode_html,
    decode_pages_batch,
    normalize_label,
    sniff_charsets,
)


def _sniff1(b: bytes, ct: str | None = None) -> str:
    arr = pa.array([b], pa.binary())
    ctarr = pa.array([ct]) if ct is not None else None
    return sniff_charsets(arr, ctarr).to_pylist()[0]


def _decode1(b: bytes, ct: str | None = None) -> str:
    arr = pa.array([b], pa.binary())
    ctarr = pa.array([ct]) if ct is not None else None
    return decode_html(arr, sniff_charsets(arr, ctarr)).to_pylist()[0]


def test_meta_charset_declarations():
    assert _sniff1(b'<meta charset="ISO-8859-1">x') == "cp1252"  # WHATWG
    assert _sniff1(b"<meta charset='KOI8-R'>x") == "koi8-r"
    assert _sniff1(b'<META CHARSET=WINDOWS-1251>x') == "cp1251"
    assert _sniff1(
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=Shift_JIS">') == "shift_jis"
    assert _sniff1(b'<?xml version="1.0" encoding="EUC-JP"?><d/>') == "euc_jp"


def test_precedence_bom_then_header_then_meta():
    utf16 = codecs.BOM_UTF16_LE + "x".encode("utf-16-le")
    assert _sniff1(utf16 + b"", ct="text/html; charset=latin-1") == "utf-16-le"
    assert _sniff1(b'<meta charset="koi8-r">',
                   ct="text/html; charset=windows-1251") == "cp1251"
    assert _sniff1(b'<meta charset="koi8-r">') == "koi8-r"
    assert _sniff1(b"no declaration") == "utf-8"
    assert _sniff1(b'<meta charset="not-a-codec">') == "utf-8"


def test_label_normalization():
    assert normalize_label(" UTF8 ") == "utf-8"
    assert normalize_label("iso-8859-1") == "cp1252"
    assert normalize_label("bogus") is None
    assert normalize_label(None) is None


DECODE_CASES = [
    ("café latin", "latin-1", b'<meta charset="latin-1">'),
    ("привет", "koi8-r",
     b'<meta charset="koi8-r">'),
    ("テスト sjis", "shift_jis",
     b'<meta charset="shift_jis">'),
    ("你好 gbk", "gbk", b'<meta charset="GBK">'),
]


def test_decode_parity_with_python_codecs():
    for text, codec, decl in DECODE_CASES:
        page = decl + text.encode(codec)
        assert _decode1(page) == (decl + text.encode(codec)).decode(codec)


def test_bom_encodings_decode_and_strip():
    for bom, codec in ((codecs.BOM_UTF8, "utf-8"),
                       (codecs.BOM_UTF16_LE, "utf-16-le"),
                       (codecs.BOM_UTF16_BE, "utf-16-be"),
                       (codecs.BOM_UTF32_LE, "utf-32-le"),
                       (codecs.BOM_UTF32_BE, "utf-32-be")):
        page = bom + "héllo bom".encode(codec)
        assert _decode1(page) == "héllo bom", codec


def test_invalid_utf8_replaces_like_python():
    junk = b"ok \xff\xfe\xfa bytes"
    assert _decode1(junk) == junk.decode("utf-8", "replace")


def test_output_is_nfc():
    page = "éclair".encode()  # decomposed
    assert _decode1(page) == "éclair"


def test_mixed_batch_and_nulls():
    rows = [
        b'<meta charset="latin-1">caf\xe9',
        "plain utf-8 ☕".encode(),
        None,
        codecs.BOM_UTF16_LE + "wide".encode("utf-16-le"),
    ]
    arr = pa.array(rows, pa.binary())
    cs = sniff_charsets(arr)
    assert cs.to_pylist() == ["cp1252", "utf-8", None, "utf-16-le"]
    dec = decode_html(arr, cs).to_pylist()
    assert dec[0].endswith("café")
    assert dec[1] == "plain utf-8 ☕"
    assert dec[2] is None
    assert dec[3] == "wide"


def test_decode_pages_batch_in_ray(ray_session):
    import ray.data as rd

    rows = [(f"https://h.example/{i}",
             b'<meta charset="latin-1">caf\xe9' if i % 2 else
             "utf ☕".encode()) for i in range(40)]
    ds = rd.from_arrow(pa.table({
        "url": [u for u, _ in rows],
        "html": pa.array([h for _, h in rows], pa.binary()),
    }))
    out = ds.map_batches(decode_pages_batch, batch_format="pyarrow").to_pandas()
    assert set(out["charset"]) == {"cp1252", "utf-8"}
    odd = out[out["charset"] == "cp1252"]["text_decoded"]
    assert all(t.endswith("café") for t in odd)
