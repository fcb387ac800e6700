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


def _walk_edges():
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(3)
    n = 40
    ed = pd.DataFrame({
        "src": [f"n{rng.integers(n)}" for _ in range(150)],
        "dst": [f"n{rng.integers(n)}" for _ in range(150)],
    })
    ed.loc[len(ed)] = ["n40", "n41"]  # n41 dangles
    return ed


def test_random_walks_paths_agree_and_are_valid(ray_session):
    """Broadcast CSR and copartitioned frontier paths emit IDENTICAL
    walks (the step choice is a pure content function), every transition
    is a real edge, and dangling nodes stop at step 0."""
    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.functions.graph import random_walks

    ed = _walk_edges()
    key = ["start", "walk", "step", "node"]
    b = random_walks(rd.from_pandas(ed), walk_len=5, walks_per_node=2,
                     seed=9, method="broadcast").to_pandas()
    c = random_walks(rd.from_pandas(ed), walk_len=5, walks_per_node=2,
                     seed=9, method="copartition",
                     num_partitions=8).to_pandas()
    pd.testing.assert_frame_equal(
        b[key].sort_values(key, ignore_index=True),
        c[key].sort_values(key, ignore_index=True),
    )
    # partition-pinned actors (the no-adjacency-reshuffle scale path)
    # emit the identical walk set
    p = random_walks(rd.from_pandas(ed), walk_len=5, walks_per_node=2,
                     seed=9, method="pinned",
                     num_partitions=4).to_pandas()
    pd.testing.assert_frame_equal(
        b[key].sort_values(key, ignore_index=True),
        p[key].sort_values(key, ignore_index=True),
    )
    eset = set(zip(ed["src"], ed["dst"]))
    for (_, _), g in b.groupby(["start", "walk"]):
        nodes = g.sort_values("step")["node"].tolist()
        assert all((a, z) in eset for a, z in zip(nodes[:-1], nodes[1:]))
    assert len(b[b["start"] == "n41"]) == 2  # step-0 rows only
    assert (b[b["start"] == "n41"]["step"] == 0).all()


def test_random_walks_deterministic_and_seed_sensitive(ray_session):
    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.functions.graph import random_walks

    ed = _walk_edges()
    key = ["start", "walk", "step", "node"]
    a = random_walks(rd.from_pandas(ed), walk_len=5, walks_per_node=2,
                     seed=9).to_pandas()[key].sort_values(
        key, ignore_index=True)
    b = random_walks(rd.from_pandas(ed), walk_len=5, walks_per_node=2,
                     seed=9).to_pandas()[key].sort_values(
        key, ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    c = random_walks(rd.from_pandas(ed), walk_len=5, walks_per_node=2,
                     seed=10).to_pandas()[key].sort_values(
        key, ignore_index=True)
    assert not a.equals(c)  # different seed, different walks


def test_random_walks_empty_edges(ray_session):
    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.functions.graph import random_walks

    out = random_walks(
        rd.from_pandas(pd.DataFrame({"src": pd.Series([], dtype=object),
                                     "dst": pd.Series([], dtype=object)})),
        walk_len=4,
    )
    assert out.count() == 0
    # Ray's to_pandas drops columns on an empty dataset; the schema
    # is the stable surface
    assert out.schema().names == ["start", "walk", "step", "node"]


def test_triangle_counts_both_paths_match_bruteforce(ray_session):
    """Per-node triangle counts: broadcast CSR and copartitioned
    wedge-join agree with an itertools brute force (this test also
    guards the NUL-safe hashing contract — the closure join
    co-partitions \\x00-composite keys)."""
    import itertools

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.functions.graph import triangle_counts

    rng = np.random.default_rng(5)
    ed = pd.DataFrame({
        "src": [f"n{rng.integers(30)}" for _ in range(160)],
        "dst": [f"n{rng.integers(30)}" for _ in range(160)],
    })
    und = {(min(s, d), max(s, d))
           for s, d in zip(ed["src"], ed["dst"]) if s != d}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want: dict = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                want[x] = want.get(x, 0) + 1
    want = pd.DataFrame(sorted(want.items()), columns=["node", "n_tri"])
    got_b = triangle_counts(
        rd.from_pandas(ed), method="broadcast"
    ).to_pandas().sort_values("node", ignore_index=True)
    got_c = triangle_counts(
        rd.from_pandas(ed), method="copartition", num_partitions=8
    ).to_pandas().sort_values("node", ignore_index=True)
    pd.testing.assert_frame_equal(got_b, want, check_dtype=False)
    pd.testing.assert_frame_equal(
        got_c[["node", "n_tri"]], want, check_dtype=False
    )


def test_triangle_counts_triangle_free_and_empty(ray_session):
    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.functions.graph import triangle_counts

    # star graph: no triangles
    star = pd.DataFrame({"src": ["c"] * 5,
                         "dst": [f"l{i}" for i in range(5)]})
    for method in ("broadcast", "copartition"):
        out = triangle_counts(rd.from_pandas(star), method=method)
        assert out.count() == 0
    empty = pd.DataFrame({"src": pd.Series([], dtype=object),
                          "dst": pd.Series([], dtype=object)})
    out = triangle_counts(rd.from_pandas(empty))
    assert out.count() == 0
    assert out.schema().names == ["node", "n_tri"]


def test_khop_neighborhood_paths_match_bfs(ray_session):
    """k-hop labels: both paths equal a dict BFS; absent seeds still
    appear at hop 0; hop is the MINIMAL distance."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.functions.graph import khop_neighborhood

    rng = np.random.default_rng(7)
    ed = pd.DataFrame({
        "src": [f"n{rng.integers(40)}" for _ in range(120)],
        "dst": [f"n{rng.integers(40)}" for _ in range(120)],
    })
    adj: dict = {}
    for s, d in zip(ed["src"], ed["dst"]):
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    seeds = ["n0", "n1", "nope"]
    want = {s: 0 for s in seeds}
    frontier = [s for s in seeds if s in adj]
    for h in (1, 2, 3):
        nxt = {v for u in frontier for v in adj.get(u, ())
               if v not in want}
        for v in nxt:
            want[v] = h
        frontier = list(nxt)
    wdf = pd.DataFrame(sorted(want.items()), columns=["node", "hop"])
    b = khop_neighborhood(
        rd.from_pandas(ed), seeds, 3, method="broadcast"
    ).to_pandas().sort_values("node", ignore_index=True)
    c = khop_neighborhood(
        rd.from_pandas(ed), seeds, 3, method="stream"
    ).to_pandas().sort_values("node", ignore_index=True)
    pd.testing.assert_frame_equal(b[["node", "hop"]], wdf,
                                  check_dtype=False)
    pd.testing.assert_frame_equal(c[["node", "hop"]], wdf,
                                  check_dtype=False)
    # k=0 → seeds only
    z = khop_neighborhood(rd.from_pandas(ed), ["n0"], 0).to_pandas()
    assert z.to_dict("records") == [{"node": "n0", "hop": 0}]


def _dense_ppr(edges, pers_map, n_iter=30, damping=0.85):
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    E = sorted({(idx[s], idx[d]) for s, d in edges})
    N = len(nodes)
    p = np.array([pers_map.get(n, 0.0) for n in nodes])
    p = p / p.sum()
    r = p.copy()
    outdeg = np.zeros(N)
    for s, _ in E:
        outdeg[s] += 1
    for _ in range(n_iter):
        new = (1 - damping) * p
        new += damping * r[outdeg == 0].sum() * p
        for s, d in E:
            new[d] += damping * r[s] / outdeg[s]
        r = new
    return {n: r[idx[n]] for n in nodes}


def test_personalized_pagerank_both_paths(ray_session):
    """PPR: teleport + dangling mass flow to the seed distribution;
    both paths match a dense reference; seeds absent from the graph
    raise only when none remain; uniform stays the classic result."""
    import pytest as _pytest

    from rdf_diff_store_ray.functions.graph import pagerank

    pers = {"a": 3.0, "d": 1.0, "ghost": 2.0}  # ghost: not in graph
    # broadcast at full depth; copartition parity at 4 iterations (it
    # pays ~8 Ray jobs per iteration — the pagerank test precedent)
    for method, iters in (("broadcast", 30), ("copartition", 4)):
        want = _dense_ppr(EDGES, {"a": 3.0, "d": 1.0}, n_iter=iters)
        out = pagerank(
            _edges_ds(EDGES), n_iter=iters, method=method,
            num_partitions=4, personalization=pers,
        ).to_pandas()
        got = dict(zip(out["node"], out["rank"]))
        assert set(got) == set(want)
        for n in want:
            assert got[n] == _pytest.approx(want[n], abs=1e-9), (method, n)
        assert sum(got.values()) == _pytest.approx(1.0, abs=1e-6)
    # the seed neighborhood outranks its uniform-pagerank standing
    uni = pagerank(_edges_ds(EDGES), n_iter=30).to_pandas()
    u = dict(zip(uni["node"], uni["rank"]))
    ppr = pagerank(_edges_ds(EDGES), n_iter=30,
                   personalization=pers).to_pandas()
    g = dict(zip(ppr["node"], ppr["rank"]))
    assert g["a"] > u["a"]
    with _pytest.raises(ValueError):
        pagerank(_edges_ds(EDGES), personalization={"nope": 1.0})


def test_graph_ops_with_hostile_node_ids(ray_session):
    """Node ids containing NUL and unit-separator bytes route correctly
    through every graph operator — the regression guard for the
    NUL-truncating pandas-hash fix (categorize=False everywhere): with
    the truncating hash, "a\\x00x" and "a\\x00y" collapse and
    co-partitioned joins silently drop matches."""
    import itertools

    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.functions.graph import (
        khop_neighborhood,
        pagerank,
        random_walks,
        triangle_counts,
    )

    nodes = ["a\x00x", "a\x00y", "a\x00z", "b\x1fq", "plain"]
    ed = pd.DataFrame({
        "src": ["a\x00x", "a\x00y", "a\x00z", "b\x1fq", "plain",
                "a\x00x"],
        "dst": ["a\x00y", "a\x00z", "a\x00x", "plain", "a\x00x",
                "b\x1fq"],
    })
    # triangle oracle
    und = {(min(s, d), max(s, d))
           for s, d in zip(ed["src"], ed["dst"]) if s != d}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want: dict = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                want[x] = want.get(x, 0) + 1
    want = pd.DataFrame(sorted(want.items()), columns=["node", "n_tri"])
    for method in ("broadcast", "copartition"):
        got = triangle_counts(
            rd.from_pandas(ed), method=method, num_partitions=4
        ).to_pandas().sort_values("node", ignore_index=True)
        pd.testing.assert_frame_equal(
            got[["node", "n_tri"]], want, check_dtype=False
        ), method
    # khop + walks + pagerank run and keep the distinct ids apart
    kh = khop_neighborhood(
        rd.from_pandas(ed), ["a\x00x"], 2, method="stream"
    ).to_pandas()
    assert "a\x00y" in set(kh["node"]) and "a\x00z" in set(kh["node"])
    w = random_walks(rd.from_pandas(ed), walk_len=3,
                     walks_per_node=1, seed=3).to_pandas()
    assert set(w["start"]) == set(nodes)
    pr = pagerank(rd.from_pandas(ed), n_iter=5).to_pandas()
    assert len(pr) == len(nodes)  # every distinct id keeps its row


def _cc_oracle(edge_pairs):
    """Brute-force components: dict BFS; label = min member."""
    adj: dict = {}
    for a, b in edge_pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen: set = set()
    out = {}
    for start in adj:
        if start in seen:
            continue
        comp, stack = [], [start]
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            comp.append(n)
            stack.extend(adj[n])
        lab = min(comp)
        for n in comp:
            out[n] = lab
    return out


def test_connected_components_paths_match_oracle(ray_session):
    import random

    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.functions.graph import connected_components

    rnd = random.Random(3)
    nodes = [f"n{i:03d}" for i in range(120)]
    pairs = [tuple(rnd.sample(nodes, 2)) for _ in range(140)]
    pairs += [("x1", "x1")]  # self-loop drops
    pairs += [(f"c{i}", f"c{i+1}") for i in range(25)]  # long chain
    ed = rd.from_pandas(pd.DataFrame(pairs, columns=["src", "dst"]))
    want = _cc_oracle(pairs)

    got_b = connected_components(ed, method="broadcast").to_pandas()
    got_c = connected_components(ed, method="copartition",
                                 num_partitions=8).to_pandas()
    for got in (got_b, got_c):
        assert dict(zip(got["node"], got["component"])) == want


def test_connected_components_hostile_ids_and_empty(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from rdf_diff_store_ray.functions.graph import connected_components

    pairs = [("a\x00x", "a\x00y"), ("a\x00z", "a\x00z"),
             ("b\x1fq", "plain"), ("a\x00y", "a\x00w")]
    ed = rd.from_pandas(pd.DataFrame(pairs, columns=["src", "dst"]))
    want = _cc_oracle(pairs)
    for method in ("broadcast", "copartition"):
        got = connected_components(ed, method=method,
                                   num_partitions=4).to_pandas()
        assert dict(zip(got["node"], got["component"])) == want

    empty = rd.from_pandas(pd.DataFrame({"src": ["s"], "dst": ["s"]}))
    assert connected_components(empty).count() == 0

    # a finite cap below the chain diameter raises instead of returning
    # unmerged components
    chain = [(f"c{i}", f"c{i+1}") for i in range(12)]
    ch = rd.from_pandas(pd.DataFrame(chain, columns=["src", "dst"]))
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(ch, method="copartition", max_iters=2,
                             num_partitions=4)


# ------------------------------------------------------------ node2vec ------
def test_node2vec_paths_agree_and_are_valid(ray_session):
    """Broadcast and partition-pinned node2vec emit IDENTICAL biased
    walks (shared weighted-pick kernel over dst-sorted candidates,
    content-hash randomness; the pinned frontier carries prev +
    prev-adjacency hashes), every transition is a real edge, and
    dangling nodes stop at step 0."""
    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.functions.graph import node2vec_walks

    ed = _walk_edges()
    key = ["start", "walk", "step", "node"]
    b = node2vec_walks(rd.from_pandas(ed), walk_len=5, walks_per_node=2,
                       p=0.5, q=2.0, seed=9,
                       method="broadcast").to_pandas()
    p = node2vec_walks(rd.from_pandas(ed), walk_len=5, walks_per_node=2,
                       p=0.5, q=2.0, seed=9, method="pinned",
                       num_partitions=4).to_pandas()
    pd.testing.assert_frame_equal(
        b[key].sort_values(key, ignore_index=True),
        p[key].sort_values(key, ignore_index=True),
    )
    eset = set(zip(ed["src"], ed["dst"]))
    for (_, _), g in b.groupby(["start", "walk"]):
        nodes = g.sort_values("step")["node"].tolist()
        assert all((a, z) in eset for a, z in zip(nodes[:-1], nodes[1:]))
    assert (b[b["start"] == "n41"]["step"] == 0).all()
    # deterministic across runs; seed-sensitive
    b2 = node2vec_walks(rd.from_pandas(ed), walk_len=5, walks_per_node=2,
                        p=0.5, q=2.0, seed=9,
                        method="broadcast").to_pandas()
    pd.testing.assert_frame_equal(
        b[key].sort_values(key, ignore_index=True),
        b2[key].sort_values(key, ignore_index=True),
    )
    b3 = node2vec_walks(rd.from_pandas(ed), walk_len=5, walks_per_node=2,
                        p=0.5, q=2.0, seed=10,
                        method="broadcast").to_pandas()
    assert not b[key].sort_values(key, ignore_index=True).equals(
        b3[key].sort_values(key, ignore_index=True))


def test_node2vec_bias_semantics(ray_session):
    """The return parameter p controls 2-hop returns (Grover & Leskovec
    2016): small p -> walks revisit the previous node often, large p ->
    almost never. Measured on a symmetric random graph."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.functions.graph import node2vec_walks

    rng = np.random.default_rng(11)
    n, m = 80, 900
    src = [f"n{int(i)}" for i in rng.integers(0, n, m)]
    dst = [f"n{int(i)}" for i in rng.integers(0, n, m)]
    ed = rd.from_pandas(
        pd.DataFrame({"src": src + dst, "dst": dst + src}))

    def return_rate(p):
        w = node2vec_walks(ed, walk_len=8, walks_per_node=3, p=p, q=1.0,
                           seed=9, method="broadcast").to_pandas()
        w = w.sort_values(["start", "walk", "step"], ignore_index=True)
        ret = tot = 0
        for (_s, _r), g in w.groupby(["start", "walk"]):
            ns = g["node"].tolist()
            for i in range(2, len(ns)):
                tot += 1
                ret += ns[i] == ns[i - 2]
        return ret / max(tot, 1)

    lo, hi = return_rate(0.05), return_rate(20.0)
    assert lo > 2.5 * hi, (lo, hi)


def test_node2vec_edges_and_validation(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from rdf_diff_store_ray.functions.graph import node2vec_walks

    empty = rd.from_pandas(pd.DataFrame({"src": [], "dst": []}).astype(
        {"src": object, "dst": object}))
    assert node2vec_walks(empty).count() == 0
    ed = rd.from_pandas(pd.DataFrame({"src": ["a"], "dst": ["b"]}))
    with pytest.raises(ValueError, match="p and q"):
        node2vec_walks(ed, p=0.0)
    with pytest.raises(ValueError, match="walk_len"):
        node2vec_walks(ed, walk_len=0)
    # walk_len=1 emits step-0 rows only
    w = node2vec_walks(ed, walk_len=1, walks_per_node=2).to_pandas()
    assert (w["step"] == 0).all() and len(w) == 4
    # hostile NUL-bearing node ids survive both paths identically
    pairs = [("a\x00x", "a\x00y"), ("a\x00y", "a\x00x"),
             ("a\x00x", "b"), ("b", "a\x00y")]
    hostile = rd.from_pandas(pd.DataFrame(pairs, columns=["src", "dst"]))
    key = ["start", "walk", "step", "node"]
    hb = node2vec_walks(hostile, walk_len=4, p=0.5, q=2.0,
                        method="broadcast").to_pandas()
    hp = node2vec_walks(hostile, walk_len=4, p=0.5, q=2.0,
                        method="pinned", num_partitions=4).to_pandas()
    # the comparison sort must itself be NUL-safe (pandas multi-column
    # sort interleaves NUL-distinct keys)
    from rdf_diff_store_ray.shuffle_utils import sort_values_nul_safe
    pd.testing.assert_frame_equal(
        sort_values_nul_safe(hb[key], key, ignore_index=True),
        sort_values_nul_safe(hp[key], key, ignore_index=True),
    )
    es = set(pairs)
    # pandas groupby on object keys is NUL-unsafe too — code the starts
    # through a Python dict (full-byte hashing) before grouping
    scode = {s: i for i, s in enumerate(set(hb["start"]))}
    for (_, _), g in hb.groupby([hb["start"].map(scode), "walk"]):
        ns = g.sort_values("step")["node"].tolist()
        assert all((a, z) in es for a, z in zip(ns[:-1], ns[1:]))
