"""Skewed-corpus build: a power-law entity distribution (head entities
dominating mentions — the north rule's hot-key case) must not break
correctness, and the planted skew must be visible in the degree profile."""

import glob
import os

import pyarrow.dataset as pads
import pytest


@pytest.fixture(scope="module")
def skewed_built(ray_session, tmp_path_factory):
    from rdf_diff_store_ray import corpus
    from rdf_diff_store_ray.pipelines.build import build

    c = corpus.generate(n_urls=120, n_snapshots=4, seed=42, entity_skew=4.0)
    d = tmp_path_factory.mktemp("skew_corpus")
    c.write(str(d))
    out = str(tmp_path_factory.mktemp("skew_kg"))
    res = build(f"{d}/pages.parquet", out, gazetteer=c.gazetteer,
                num_partitions=8, resume=False)
    return c, res


def test_skewed_corpus_is_actually_skewed(skewed_built):
    c, _ = skewed_built
    exp = c.expected_triples
    import collections

    deg = collections.Counter(exp["subj"].to_pylist())
    for o, lit in zip(exp["obj"].to_pylist(), exp["obj_is_literal"].to_pylist()):
        if not lit:
            deg[o] += 1
    counts = sorted(deg.values(), reverse=True)
    # head entity carries far more mentions than the median entity
    assert counts[0] >= 5 * counts[len(counts) // 2]


def test_skewed_build_triple_pr(skewed_built):
    c, res = skewed_built
    tt = pads.dataset(
        sorted(glob.glob(os.path.join(res.triples_dir, "*.parquet")))
    ).to_table()
    got = set(zip(tt["subj"].to_pylist(), tt["pred"].to_pylist(),
                  tt["obj"].to_pylist()))
    exp = c.expected_triples
    want = set(zip(exp["subj"].to_pylist(), exp["pred"].to_pylist(),
                   exp["obj"].to_pylist()))
    tp = len(got & want)
    assert tp / max(1, len(got)) >= 0.95
    assert tp / max(1, len(want)) >= 0.95


def test_skewed_build_delta_log_matches_oracle(skewed_built):
    import pandas as pd

    from rdf_diff_store_ray import ntriples, oracle
    from collections import defaultdict

    c, res = skewed_built
    by_pv = defaultdict(set)
    for r in c.expected_triples.to_pylist():
        ts = int(pd.Timestamp(r["warc_ts"]).timestamp())
        by_pv[(r["graph_id"], ts)].add(
            (r["subj"], r["pred"], r["obj"], r["obj_is_literal"])
        )
    pv = [(u, ts, ntriples.serialize(tr)) for (u, ts), tr in by_pv.items()]
    store = oracle.replay_pages(pv, c.snapshot_times)
    want = {(g, ts, op) for g, ts, op, _, _ in store.deltas()}
    dt = res.delta_table()
    got = {
        (g, int(pd.Timestamp(t).timestamp()), op)
        for g, t, op in zip(dt["graph_id"].to_pylist(),
                            dt["warc_ts"].to_pylist(), dt["op"].to_pylist())
    }
    assert got == want


def test_drop_duplicates_nul_safe_vs_pandas_hazard():
    """pandas multi-column drop_duplicates factorizes object columns
    through the NUL-truncating C-string table: rows differing only past
    a NUL collapse (measured: 5,000 two-string-column rows dedup to 1).
    The safe helper is exact, order-preserving, and delegates to pandas
    on the NUL-free fast path."""
    import numpy as np
    import pandas as pd

    from rdf_diff_store_ray.shuffle_utils import drop_duplicates_nul_safe

    big = pd.DataFrame({
        "a": [f"x\x00{i}" for i in range(5000)],
        "b": [f"y\x00{i}" for i in range(5000)],
    })
    assert len(big.drop_duplicates()) == 1  # the pandas hazard, pinned
    assert len(drop_duplicates_nul_safe(big)) == 5000

    # keep semantics with NULs
    d = pd.DataFrame({"a": ["x\x00a", "x\x00a", "x\x00b"],
                      "b": [1, 1, 1], "i": [10, 20, 30]})
    assert drop_duplicates_nul_safe(
        d, subset=["a", "b"])["i"].tolist() == [10, 30]
    assert drop_duplicates_nul_safe(
        d, subset=["a", "b"], keep="last")["i"].tolist() == [20, 30]

    # NaN rows dedup like pandas; NUL-free path matches pandas exactly
    rng = np.random.default_rng(1)
    clean = pd.DataFrame({
        "a": rng.integers(0, 7, 200).astype(str),
        "b": rng.integers(0, 7, 200),
    })
    for keep in ("first", "last"):
        pd.testing.assert_frame_equal(
            drop_duplicates_nul_safe(clean, keep=keep),
            clean.drop_duplicates(keep=keep),
        )
    nan = pd.DataFrame({"a": [None, None, "x"], "b": ["y", "y", None]})
    assert len(drop_duplicates_nul_safe(nan)) == 2
    # Series passthrough (single-key is safe in pandas)
    s = pd.Series(["a\x00x", "a\x00y", "a\x00x"])
    assert drop_duplicates_nul_safe(s).tolist() == ["a\x00x", "a\x00y"]
