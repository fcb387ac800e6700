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
