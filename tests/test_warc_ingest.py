"""pages_from_warc: the raw-crawl front door — WARC → charset
transcode → lang-ID → KG build, end to end."""

import glob
import gzip

import pyarrow as pa
import pytest

from rdf_diff_store_ray import corpus
from rdf_diff_store_ray.pipelines.build import (
    _ingest_shape_batch,
    build,
    pages_from_warc,
)
from rdf_diff_store_ray.sources.warc import warc_record_bytes

T0 = 1_700_000_000

# one page per codec; the utf-16 page carries the RELATION sentence, so
# the triple can only appear if transcoding actually ran (utf-8-replace
# would shred every byte of a utf-16 body)
PAGES = [
    ("https://a.example/en",
     "<p>Willow Labs acquired Nordic Labs.</p>"
     "<p>the café is open and the food is good for the guests</p>",
     "utf-16", "en"),
    ("https://a.example/de",
     '<meta charset="latin-1">'
     "<p>der Gast und die Küche ist gut und das Essen ist nicht"
     " teuer</p>",
     "latin-1", "de"),
    ("https://a.example/fr",
     "<p>le café est dans la rue et les gens est pour une pause</p>",
     "utf-8", "fr"),
]


def _warc_bytes() -> bytes:
    out = bytearray()
    # one crawl instant: build's grid semantics tombstone graphs absent
    # from later instants, so a per-page fetch time would mean deletes
    for url, body, codec, _ in PAGES:
        out += gzip.compress(
            warc_record_bytes(url, T0, body.encode(codec)), mtime=0)
    rec = warc_record_bytes("https://a.example/gone", T0, b"nope",
                            status=404)
    out += gzip.compress(rec, mtime=0)  # a 404 that must be dropped
    return bytes(out)


def test_ingest_shape_transcodes_and_classifies():
    import unicodedata

    batch = pa.table({
        "url": [u for u, *_ in PAGES],
        "warc_ts": pa.array([T0] * 3, pa.timestamp("s")),
        "html": pa.array([b.encode(c) for _, b, c, _ in PAGES],
                         pa.binary()),
    })
    out = _ingest_shape_batch(batch)
    assert out.column_names == ["url", "warc_ts", "html", "lang", "charset"]
    # "utf-16" with codecs.encode emits a LE BOM → sniffed utf-16-le
    assert out["charset"].to_pylist() == ["utf-16-le", "cp1252", "utf-8"]
    assert out["lang"].to_pylist() == [lang for *_, lang in PAGES]
    texts = [h.decode("utf-8") for h in out["html"].to_pylist()]
    assert "café is open" in texts[0]
    assert "die Küche" in texts[1]
    assert all(unicodedata.is_normalized("NFC", t) for t in texts)


def test_pages_from_warc_to_build(ray_session, tmp_path):
    import pyarrow.dataset as pads

    (tmp_path / "crawl").mkdir()
    (tmp_path / "crawl" / "part-00000.warc.gz").write_bytes(_warc_bytes())

    pages = pages_from_warc(str(tmp_path / "crawl"))
    df = pages.to_pandas().sort_values("url", ignore_index=True)
    assert len(df) == 3  # 404 dropped
    assert set(df["lang"]) == {"en", "de", "fr"}

    gaz = corpus.generate(n_urls=5, n_snapshots=1, seed=3).gazetteer
    assert {"Willow Labs", "Nordic Labs"} <= set(gaz["alias_to_eid"])
    res = build(
        pages_from_warc(str(tmp_path / "crawl")),
        str(tmp_path / "kg"),
        gazetteer=gaz,
        num_partitions=2,
        resume=False,
    )
    files = sorted(glob.glob(f"{res.delta_dir}/partition=*/deltas*.parquet"))
    tbl = pads.dataset(files).to_table()
    assert tbl.num_rows == 3  # one version per fetched page
    joined = "\n".join(t or "" for t in tbl["delta_text"].to_pylist())
    # the relation lived on the UTF-16 page: it can only be here if the
    # charset transcode ran before extraction
    assert "https://kg.example/prop/acquired" in joined


def test_cli_build_from_warc(ray_session, tmp_path, capsys):
    import json

    from rdf_diff_store_ray.__main__ import main

    (tmp_path / "crawl").mkdir()
    (tmp_path / "crawl" / "part-00000.warc.gz").write_bytes(_warc_bytes())
    gaz = corpus.generate(n_urls=5, n_snapshots=1, seed=3).gazetteer
    (tmp_path / "gaz.json").write_text(json.dumps(gaz))

    rc = main([
        "build", "--from-warc",
        "--pages", str(tmp_path / "crawl"),
        "--out", str(tmp_path / "kg"),
        "--gazetteer", str(tmp_path / "gaz.json"),
        "--partitions", "2", "--no-resume",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["partitions"] == 2
