"""RDFS materialization (functions/reasoning.py) vs the naive fixpoint
oracle, a DuckDB recursive-CTE closure oracle, and edge cases."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from rdf_diff_store_ray.functions.reasoning import (
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASS,
    RDFS_SUBPROP,
    materialize_rdfs,
    naive_rdfs_closure,
)

COLS = ["subj", "pred", "obj", "obj_is_literal"]


def _ds(ray, triples):
    df = pd.DataFrame(triples, columns=COLS)
    df["obj_is_literal"] = df["obj_is_literal"].astype(bool)
    import ray.data as rd

    return rd.from_pandas(df)


def _result_set(ds):
    out = ds.to_pandas()
    assert list(out.columns) == COLS
    return {tuple(r) for r in out.itertuples(index=False)}


def test_rdfs_matches_naive_fixpoint_random(ray_session):
    rnd = random.Random(7)
    classes = [f"http://ex/C{i}" for i in range(8)]
    props = [f"http://ex/p{i}" for i in range(6)]
    tbox = []
    # random subclass DAG edges plus one 2-cycle (entailment must not loop)
    for _ in range(10):
        a, b = rnd.sample(classes, 2)
        tbox.append((a, RDFS_SUBCLASS, b, False))
    tbox.append((classes[0], RDFS_SUBCLASS, classes[1], False))
    tbox.append((classes[1], RDFS_SUBCLASS, classes[0], False))
    for _ in range(5):
        a, b = rnd.sample(props, 2)
        tbox.append((a, RDFS_SUBPROP, b, False))
    for _ in range(4):
        tbox.append((rnd.choice(props), RDFS_DOMAIN,
                     rnd.choice(classes), False))
        tbox.append((rnd.choice(props), RDFS_RANGE,
                     rnd.choice(classes), False))
    abox = []
    nodes = [f"http://ex/n{i}" for i in range(20)]
    for _ in range(60):
        s = rnd.choice(nodes)
        p = rnd.choice(props)
        if rnd.random() < 0.3:
            abox.append((s, p, f"lit-{rnd.randrange(5)}", True))
        else:
            abox.append((s, p, rnd.choice(nodes), False))
    for _ in range(10):
        abox.append((rnd.choice(nodes), RDF_TYPE,
                     rnd.choice(classes), False))

    triples = tbox + abox
    expected = naive_rdfs_closure(triples)
    got = _result_set(materialize_rdfs(_ds(ray_session, triples),
                                       num_partitions=8))
    assert got == expected


def test_rdfs_chain_composition(ray_session):
    # (s p o), p sp q, q dom C, C sc D  ⊢  (s q o), (s type C), (s type D)
    p, q = "http://ex/p", "http://ex/q"
    c, d = "http://ex/C", "http://ex/D"
    triples = [
        (p, RDFS_SUBPROP, q, False),
        (q, RDFS_DOMAIN, c, False),
        (c, RDFS_SUBCLASS, d, False),
        (q, RDFS_RANGE, c, False),
        ("http://ex/s", p, "a literal", True),
    ]
    got = _result_set(materialize_rdfs(_ds(ray_session, triples)))
    assert ("http://ex/s", q, "a literal", True) in got
    assert ("http://ex/s", RDF_TYPE, c, False) in got
    assert ("http://ex/s", RDF_TYPE, d, False) in got
    # range typing must skip literal objects
    assert ("a literal", RDF_TYPE, c, False) not in got
    assert got == naive_rdfs_closure(triples)


def test_rdfs_no_schema_is_dedup_identity(ray_session):
    triples = [
        ("http://ex/s", "http://ex/p", "http://ex/o", False),
        ("http://ex/s", "http://ex/p", "http://ex/o", False),  # dup
        ("http://ex/s", "http://ex/p", "v", True),
    ]
    got = _result_set(materialize_rdfs(_ds(ray_session, triples)))
    assert got == set(triples[1:]) | {triples[0]}
    assert len(got) == 2


def test_rdfs_explicit_tbox_and_hostile_ids(ray_session):
    # out-of-band schema; node ids carrying NUL bytes must not fold
    a, b = "http://ex/A\x00x", "http://ex/A\x00y"
    tbox = [(a, RDFS_SUBCLASS, b, None), (b, RDFS_SUBCLASS,
                                          "http://ex/Top", None)]
    abox = [("http://ex/s", RDF_TYPE, a, False)]
    got = _result_set(materialize_rdfs(
        _ds(ray_session, abox),
        tbox=[(s, p, o) for s, p, o, _ in tbox]))
    assert ("http://ex/s", RDF_TYPE, b, False) in got
    assert ("http://ex/s", RDF_TYPE, "http://ex/Top", False) in got
    # the explicit tbox is schema input, not data — its arcs are not
    # asserted into the output unless they were in the dataset
    assert all(t[1] != RDFS_SUBCLASS for t in got)


def test_rdfs_subclass_closure_matches_duckdb_recursive_cte(ray_session):
    import duckdb

    rnd = random.Random(11)
    classes = [f"http://ex/K{i}" for i in range(30)]
    edges = set()
    while len(edges) < 45:
        i, j = sorted(rnd.sample(range(len(classes)), 2))
        edges.add((classes[i], classes[j]))  # i<j keeps it acyclic
    triples = [(s, RDFS_SUBCLASS, o, False) for s, o in sorted(edges)]
    got = _result_set(materialize_rdfs(_ds(ray_session, triples),
                                       num_partitions=4))
    got_pairs = {(s, o) for s, p, o, _ in got if p == RDFS_SUBCLASS}

    con = duckdb.connect()
    con.execute("CREATE TABLE e(src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?, ?)", sorted(edges))
    oracle = con.execute(
        """
        WITH RECURSIVE reach(src, dst) AS (
            SELECT src, dst FROM e
            UNION
            SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
        )
        SELECT DISTINCT src, dst FROM reach
        """
    ).fetchall()
    assert got_pairs == set(oracle)


def test_kg_rdfs_entailment_entry_matches_naive_closure(ray_session):
    """The registry entry's per-predicate counts equal a driver-side
    naive fixpoint over the same store end-state + the same TBox."""
    from rdf_diff_store_ray.ntriples import parse
    from rdf_diff_store_ray.pipelines import queries as q
    from rdf_diff_store_ray.state.reconstruct import state_at_table

    sf = "/root/testdata/sf0.001"
    got = q.kg_rdfs_entailment(sf).to_pandas()
    assert list(got.columns) == ["pred", "n"]
    rel = "https://kg.example/prop/relatedTo"
    type_n = dict(zip(got["pred"], got["n"])).get(RDF_TYPE, 0)
    assert rel in set(got["pred"]), "subPropertyOf inference missing"
    assert type_n > 0, "domain/range typing missing"

    res = q.kg_build_for(sf)
    live = state_at_table(res.delta_table(), q._store_end_ts(res))
    asserted = set()
    for text in live["delta_text"].to_pylist():
        asserted |= set(parse(text))
    prop = "https://kg.example/prop/"
    cls = "https://kg.example/class/"
    tbox4 = [(s, p, o, False) for (s, p, o) in [
        (prop + "acquired", RDFS_SUBPROP, prop + "relatedTo"),
        (prop + "partnersWith", RDFS_SUBPROP, prop + "relatedTo"),
        (prop + "acquired", RDFS_DOMAIN, cls + "Company"),
        (prop + "acquired", RDFS_RANGE, cls + "Company"),
        (prop + "partnersWith", RDFS_DOMAIN, cls + "Company"),
        (prop + "partnersWith", RDFS_RANGE, cls + "Company"),
        (prop + "headquarteredIn", RDFS_DOMAIN, cls + "Company"),
        (prop + "headquarteredIn", RDFS_RANGE, cls + "Place"),
        (prop + "foundedIn", RDFS_DOMAIN, cls + "Company"),
        (cls + "Company", RDFS_SUBCLASS, cls + "Organization"),
        (cls + "Organization", RDFS_SUBCLASS, cls + "Agent"),
    ]]
    closed = naive_rdfs_closure(sorted(asserted) + tbox4)
    # out-of-band schema: drop the TBox arcs (and their transitive
    # closure) exactly as materialize_rdfs(tbox=...) does
    schema_preds = {RDFS_SUBCLASS, RDFS_SUBPROP, RDFS_DOMAIN, RDFS_RANGE}
    closed = {t for t in closed if t[1] not in schema_preds}
    want = pd.Series([t[1] for t in closed]).value_counts()
    assert dict(zip(got["pred"], got["n"])) == want.to_dict()


def test_rdfs_tbox_cap(ray_session):
    triples = [(f"http://ex/C{i}", RDFS_SUBCLASS,
                f"http://ex/C{i+1}", False) for i in range(40)]
    with pytest.raises(ValueError, match="max_tbox"):
        materialize_rdfs(_ds(ray_session, triples), max_tbox=10)
