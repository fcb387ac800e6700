"""Regression tests for the pandas nunique/pd.unique NUL-truncation
family: Series.nunique() and pd.unique() collapse strings that differ
only past a NUL byte (measured at EVERY size on pandas 2.2.2, unlike
the size-dependent categorize-hash pitfall), while
Series.drop_duplicates() is safe. Each test drives a public surface
that used one of the unsafe calls."""

import numpy as np
import pyarrow as pa
import pytest

A, B, C = "g\x00one", "g\x00two", "g\x00three"
TRIPLE = '<https://x/s> <https://x/p> "v" .\n'


def test_pandas_nunique_still_broken_upstream():
    """If this starts failing, pandas fixed the hashtable and the
    workarounds can be revisited."""
    import pandas as pd

    s = pd.Series([A, B, C], dtype=object)
    assert s.nunique() == 1          # the bug
    assert len(s.drop_duplicates()) == 3  # the safe path


def test_count_distinct_nul_twin_terms(ray_session, tmp_path):
    import glob

    import pyarrow.dataset as pads

    from rdf_diff_store_ray.query.bgp import DiffStoreReader
    from rdf_diff_store_ray.state.append import append_graphs, init_log

    store = str(tmp_path / "s")
    init_log(store, num_partitions=2)
    text = (
        '<https://x/s> <https://x/p> "m\\u0000k" .\n'
        '<https://x/s> <https://x/p> "m\\u0000n" .\n'
        '<https://x/s> <https://x/p> "m\\u0000o" .\n'
    )
    append_graphs(store, {"g": text}, 1_700_000_000)
    files = sorted(glob.glob(f"{store}/partition=*/deltas*.parquet"))
    reader = DiffStoreReader(pads.dataset(files).to_table())
    res = reader.query_at(
        1_700_000_100,
        "SELECT (COUNT(DISTINCT ?o) AS ?n) WHERE { ?s <https://x/p> ?o }")
    assert res["n"].tolist() == [3]


def test_fsck_counts_nul_twin_graphs(ray_session, tmp_path):
    from rdf_diff_store_ray.state.append import append_graphs, init_log
    from rdf_diff_store_ray.state.fsck import fsck_store

    store = str(tmp_path / "s")
    init_log(store, num_partitions=1)  # one partition: twins co-locate
    append_graphs(store, {A: TRIPLE, B: TRIPLE, C: TRIPLE}, 1_700_000_000)
    rep = fsck_store(store).to_pandas()
    assert int(rep["n_graphs"].sum()) == 3


def test_sparql_delete_hits_all_nul_twin_graphs(ray_session, tmp_path):
    from rdf_diff_store_ray.state.append import append_graphs, init_log
    from rdf_diff_store_ray.state.reconstruct import state_at_table
    from rdf_diff_store_ray.state.update import sparql_update

    store = str(tmp_path / "s")
    init_log(store, num_partitions=1)
    append_graphs(store, {A: TRIPLE, B: TRIPLE, C: TRIPLE}, 1_700_000_000)
    sparql_update(store, "DELETE { ?s ?p ?o } WHERE { ?s ?p ?o }",
                  ts=1_700_000_100)
    import glob

    import pyarrow.dataset as pads

    files = sorted(glob.glob(f"{store}/partition=*/deltas*.parquet"))
    live = state_at_table(pads.dataset(files).to_table(), 1_700_000_200)
    texts = [t for t in live["delta_text"].to_pylist() if t]
    assert texts == []  # every NUL-twin graph's triple deleted


def test_repetition_stats_nul_twin_tokens():
    from rdf_diff_store_ray.functions.text import repetition_stats_batch

    out = repetition_stats_batch(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([f"{A} {B} {C} {A}"]),
    })).to_pandas()
    assert out.loc[0, "n_tokens"] == 4
    assert out.loc[0, "n_distinct_tokens"] == 3
    assert out.loc[0, "top_token"] == A  # 2 occurrences


def test_bpe_tokens_per_doc_nul_twin_words(ray_session):
    import ray.data as rd

    from rdf_diff_store_ray.functions.bpe import (
        bpe_tokens_per_doc,
        bpe_train,
    )

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([f"{A} {B}", f"{C} {A} plain text here"]),
    }))
    merges = bpe_train(docs, n_merges=8)
    out = bpe_tokens_per_doc(docs, merges).to_pandas().set_index("doc_id")
    # before the fix a NUL-twin word missed its memo entry and the
    # int64 cast raised; counts must be finite and positive
    assert (out["n_tokens"] > 0).all()


def test_repetition_top_token_keeps_nul_twins_distinct():
    """The per-doc top-token counter groups on integer token codes, not
    object keys: NUL-twin tokens must not merge into one count."""
    import pyarrow as pa

    from rdf_diff_store_ray.functions.text import repetition_stats_batch

    t = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["a\x00x a\x00x a\x00x a\x00y a\x00y b"]),
    })
    out = repetition_stats_batch(t).to_pandas().iloc[0]
    assert out["n_tokens"] == 6
    assert out["n_distinct_tokens"] == 3
    assert out["top_token"] == "a\x00x" and out["top_token_count"] == 3
