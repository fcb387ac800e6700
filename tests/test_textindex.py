"""Persisted inverted text index: build/extend/compact/query, true
file-level pruning, and single-writer locking."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from rdf_diff_store_ray.functions.textindex import (
    build_text_index,
    compact_text_index,
    extend_text_index,
    query_text_index,
)

DOCS = pd.DataFrame({
    "doc_id": [0, 1, 2, 3],
    "text": [
        "alpha beta gamma alpha",
        "beta gamma",
        "alpha delta",
        "epsilon",
    ],
})


def _naive(docs: pd.DataFrame, terms, mode="and"):
    rows = []
    for _, r in docs.iterrows():
        toks = r["text"].lower().split()
        tfs = {t: toks.count(t) for t in terms if t in toks}
        if (mode == "and" and len(tfs) == len(terms)) or (
            mode == "or" and tfs
        ):
            rows.append((r["doc_id"], len(tfs), sum(tfs.values())))
    return pd.DataFrame(rows, columns=["doc_id", "n_matched", "total_tf"])


def test_build_query_and_or(ray_session, tmp_path):
    import ray.data as rd

    idx = str(tmp_path / "idx")
    acct = build_text_index(rd.from_pandas(DOCS), idx, num_partitions=8)
    assert acct["rows"].sum() == 8  # distinct (doc, token) pairs
    for mode in ("and", "or"):
        for terms in (["alpha"], ["alpha", "beta"], ["nosuch"]):
            got = query_text_index(idx, terms, mode=mode).to_pandas()
            want = _naive(DOCS, terms, mode)
            pd.testing.assert_frame_equal(
                got.reset_index(drop=True), want, check_dtype=False
            )
    with pytest.raises(ValueError):
        build_text_index(rd.from_pandas(DOCS), idx)  # refuses overwrite
    with pytest.raises(ValueError):
        query_text_index(idx, [])


def test_query_opens_only_matching_partitions(ray_session, tmp_path):
    """Pruning is at the FILE level: corrupting every partition the
    query terms do NOT hash to must not affect the query."""
    import ray.data as rd

    from rdf_diff_store_ray.functions.textindex import _term_pids

    idx = str(tmp_path / "idx")
    build_text_index(rd.from_pandas(DOCS), idx, num_partitions=8)
    keep = set(_term_pids(["alpha", "beta"], 8).values())
    for f in glob.glob(os.path.join(idx, "post-*-*.parquet")):
        pid = int(os.path.basename(f).split("-")[1])
        if pid not in keep:
            with open(f, "wb") as fh:
                fh.write(b"corrupt")
    got = query_text_index(idx, ["alpha", "beta"]).to_pandas()
    pd.testing.assert_frame_equal(
        got, _naive(DOCS, ["alpha", "beta"]), check_dtype=False
    )


def test_extend_and_compact(ray_session, tmp_path):
    """Extension appends segments without rewriting existing bytes;
    queries are correct before AND after compaction (a doc whose pair
    spans segments counts its term once); compaction shrinks files."""
    import ray.data as rd

    idx = str(tmp_path / "idx")
    build_text_index(rd.from_pandas(DOCS), idx, num_partitions=4)
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(idx, "post-*.parquet"))
    }
    extra = pd.DataFrame({
        "doc_id": [2, 4],
        "text": ["alpha alpha beta", "beta zeta"],
    })
    extend_text_index(rd.from_pandas(extra), idx)
    for f, m in before.items():  # old segments untouched
        assert os.path.getmtime(f) == m
    merged = pd.concat(
        [DOCS[DOCS["doc_id"] != 2], pd.DataFrame({
            "doc_id": [2, 4],
            "text": ["alpha delta alpha alpha beta", "beta zeta"],
        })],
        ignore_index=True,
    )  # doc 2's text is the concatenation across ingests
    want = _naive(merged, ["alpha", "beta"]).sort_values(
        "doc_id", ignore_index=True
    )
    got = query_text_index(idx, ["alpha", "beta"]).to_pandas()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    n_before = len(glob.glob(os.path.join(idx, "post-*.parquet")))
    acct = compact_text_index(idx)
    assert (acct["segments_merged"] >= 2).all()
    n_after = len(glob.glob(os.path.join(idx, "post-*.parquet")))
    assert n_after < n_before
    got2 = query_text_index(idx, ["alpha", "beta"]).to_pandas()
    pd.testing.assert_frame_equal(got2, want, check_dtype=False)


def test_extend_respects_write_lock(ray_session, tmp_path):
    import ray.data as rd

    from rdf_diff_store_ray.state.append import (
        LogLockedError,
        StoreWriteLock,
    )

    idx = str(tmp_path / "idx")
    build_text_index(rd.from_pandas(DOCS), idx, num_partitions=4)
    with StoreWriteLock(idx):
        with pytest.raises(LogLockedError):
            extend_text_index(rd.from_pandas(DOCS), idx)


def test_empty_ingest_and_missing_index(ray_session, tmp_path):
    import ray.data as rd

    idx = str(tmp_path / "idx")
    with pytest.raises(FileNotFoundError):
        query_text_index(idx, ["alpha"])
    build_text_index(rd.from_pandas(DOCS), idx, num_partitions=4)
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "text": pd.Series([], dtype=object)})
    acct = extend_text_index(rd.from_pandas(empty), idx)
    assert acct.empty


def test_text_index_cli(ray_session, tmp_path, capsys):
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from rdf_diff_store_ray.__main__ import main

    docs_path = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pandas(DOCS, preserve_index=False),
                   docs_path)
    idx = str(tmp_path / "idx")
    assert main(["text-index-build", "--docs", docs_path,
                 "--index", idx, "--partitions", "8"]) == 0
    assert main(["text-index-query", "--index", idx,
                 "alpha", "beta"]) == 0
    assert main(["text-index-build", "--docs", docs_path,
                 "--index", idx, "--extend"]) == 0
    assert main(["text-index-compact", "--index", idx]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    build = json.loads(lines[0])
    assert build["rows"] == 8
    q = json.loads(lines[1])
    assert q["rows"] == 1 and q["results"][0]["doc_id"] == 0
    comp = json.loads(lines[3])
    assert comp["segments_merged"] >= 2


def test_bm25_matches_naive(ray_session, tmp_path):
    """BM25 scores (integer micro-units) equal a dict-based Okapi
    implementation for AND and OR modes; ranking is score-desc with
    doc_id tie-break; limit bounds rows."""
    import math

    import ray.data as rd

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["alpha beta beta", "alpha alpha alpha gamma", "beta",
                 "alpha beta gamma delta epsilon zeta", "gamma gamma"],
    })
    idx = str(tmp_path / "idx")
    build_text_index(rd.from_pandas(docs), idx, num_partitions=8)
    k1, b = 1.2, 0.75
    toks = {r.doc_id: r.text.split() for r in docs.itertuples()}
    N = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / N
    terms = ("alpha", "beta")
    dft = {t: sum(1 for d in toks.values() if t in d) for t in terms}

    def naive(mode):
        want = {}
        for d, tk in toks.items():
            s, nm, tt = 0.0, 0, 0
            for t in terms:
                tf = tk.count(t)
                if not tf:
                    continue
                nm += 1
                tt += tf
                idf = math.log1p((N - dft[t] + 0.5) / (dft[t] + 0.5))
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(tk) / avgdl)
                )
            if (mode == "or" and nm) or (mode == "and" and nm == 2):
                want[d] = (nm, tt, round(s * 1e6))
        return want

    for mode in ("or", "and"):
        out = query_text_index(
            idx, list(terms), mode=mode, score="bm25"
        ).to_pandas()
        got = {r.doc_id: (r.n_matched, r.total_tf, r.score_micro)
               for r in out.itertuples()}
        assert got == naive(mode), mode
        assert (out["score_micro"].diff().dropna() <= 0).all()
    lim = query_text_index(idx, list(terms), mode="or", score="bm25",
                           limit=2).to_pandas()
    assert len(lim) == 2
    # no matches → empty with the scored schema
    none = query_text_index(idx, ["nosuch"], score="bm25").to_pandas()
    assert len(none) == 0
    with pytest.raises(ValueError):
        query_text_index(idx, ["alpha"], score="cosine")


def test_bm25_survives_extend_and_compact(ray_session, tmp_path):
    """Scores account for extension segments (new docs enter N/avgdl;
    split pairs merge) and are unchanged by compaction."""
    import ray.data as rd

    docs = pd.DataFrame({"doc_id": [0, 1],
                         "text": ["alpha beta", "alpha alpha"]})
    idx = str(tmp_path / "idx")
    build_text_index(rd.from_pandas(docs), idx, num_partitions=4)
    extend_text_index(
        rd.from_pandas(pd.DataFrame({"doc_id": [2],
                                     "text": ["beta beta gamma"]})),
        idx,
    )
    before = query_text_index(idx, ["alpha", "beta"], mode="or",
                              score="bm25").to_pandas()
    assert set(before["doc_id"]) == {0, 1, 2}
    compact_text_index(idx)
    after = query_text_index(idx, ["alpha", "beta"], mode="or",
                             score="bm25").to_pandas()
    pd.testing.assert_frame_equal(before, after)
