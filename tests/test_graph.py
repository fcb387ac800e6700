"""Distributed PageRank: both execution paths against a dense numpy
reference, dangling-node handling, parallel-edge collapse."""

import numpy as np
import pyarrow as pa
import pytest


def _dense_pagerank(edges, n_iter=20, damping=0.85):
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    E = sorted({(idx[s], idx[d]) for s, d in edges})
    N = len(nodes)
    r = np.full(N, 1.0 / N)
    outdeg = np.zeros(N)
    for s, _ in E:
        outdeg[s] += 1
    for _ in range(n_iter):
        new = np.full(N, (1 - damping) / N)
        new += damping * r[outdeg == 0].sum() / N
        for s, d in E:
            new[d] += damping * r[s] / outdeg[s]
        r = new
    return {n: r[idx[n]] for n in nodes}


def _edges_ds(edges):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "src": [e[0] for e in edges],
        "dst": [e[1] for e in edges],
    }))


EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
         ("d", "c"), ("a", "b")]  # parallel edge + dangling node b? no: d


def test_pagerank_broadcast_matches_dense(ray_session):
    from rdf_diff_store_ray.functions.graph import pagerank

    out = pagerank(_edges_ds(EDGES), n_iter=30).to_pandas()
    got = dict(zip(out["node"], out["rank"]))
    want = _dense_pagerank(EDGES, n_iter=30)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_copartition_parity(ray_session):
    """The 100x-scale co-partition path must agree with the broadcast
    fold — same iterations, same corrections."""
    from rdf_diff_store_ray.functions.graph import pagerank

    a = pagerank(_edges_ds(EDGES), n_iter=4,
                 method="broadcast").to_pandas().sort_values("node")
    b = pagerank(_edges_ds(EDGES), n_iter=4, method="copartition",
                 num_partitions=4).to_pandas().sort_values("node")
    assert np.allclose(a["rank"].to_numpy(), b["rank"].to_numpy(),
                       atol=1e-9)


def test_pagerank_star_and_empty(ray_session):
    from rdf_diff_store_ray.functions.graph import pagerank

    # star: hub h pointed at by n spokes (all spokes dangling)
    star = [(f"s{i}", "h") for i in range(5)]
    out = pagerank(_edges_ds(star), n_iter=25).to_pandas()
    ranks = dict(zip(out["node"], out["rank"]))
    assert ranks["h"] == max(ranks.values())
    want = _dense_pagerank(star, n_iter=25)
    for n in want:
        assert ranks[n] == pytest.approx(want[n], abs=1e-9)
    empty = _edges_ds([]).filter(lambda r: False)
    assert pagerank(empty, n_iter=2).count() == 0
