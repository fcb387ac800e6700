"""Compression-ratio quality signal: direct-zlib parity, planted
boilerplate separation, null/empty handling."""

import zlib

import pyarrow as pa

from rdf_diff_store_ray.functions.text import compression_stats_batch


def test_direct_zlib_parity():
    texts = ["the quick brown fox jumps over the lazy dog " * 3,
             "aaaa " * 200, "", None, "short"]
    batch = pa.table({"doc_id": list(range(5)),
                      "text": pa.array(texts, pa.string())})
    out = compression_stats_batch(batch).to_pandas().set_index("doc_id")
    for i, t in enumerate(texts):
        raw = (t or "").encode()
        comp = len(zlib.compress(raw, 6))
        assert out.loc[i, "raw_bytes"] == len(raw)
        assert out.loc[i, "compressed_bytes"] == comp
        want_ppm = (comp * 1_000_000 // len(raw)) if raw else 1_000_000
        assert out.loc[i, "ratio_ppm"] == want_ppm


def test_flags_separate_spam_from_prose():
    prose = ("Norwegian registries publish structured descriptions of "
             "public data services, and the catalogue harvester compares "
             "each new snapshot against the previous version before "
             "storing a diff. Municipal archives contribute quarterly "
             "exports, while private operators stream smaller updates "
             "whenever their metadata changes. Researchers then query "
             "historical states to measure how vocabulary adoption "
             "spread across counties during the migration period.")
    spam = "click here best price buy now\n" * 120
    batch = pa.table({"doc_id": [1, 2],
                      "text": pa.array([prose, spam])})
    out = compression_stats_batch(batch).to_pandas().set_index("doc_id")
    assert not out.loc[1, "too_compressible"]
    assert out.loc[2, "too_compressible"]
    assert out.loc[2, "ratio_ppm"] < out.loc[1, "ratio_ppm"]


def test_empty_and_null_never_flag():
    batch = pa.table({"doc_id": [1, 2],
                      "text": pa.array(["", None], pa.string())})
    out = compression_stats_batch(batch).to_pandas()
    assert (~out["too_compressible"]).all()
    assert (out["ratio_ppm"] == 1_000_000).all()


def test_registry_entry_runs(ray_session):
    from rdf_diff_store_ray.pipelines import queries as q

    df = q.compression_quality("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert set(df.columns) == {"doc_id", "raw_bytes", "compressed_bytes",
                               "ratio_ppm", "too_compressible"}
    assert (df["ratio_ppm"] > 0).all()
