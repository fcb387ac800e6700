"""Distributed query service (per-partition reader actors + router) must
agree with the single-reader path over the same delta log."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def service(ray_session, built):
    from rdf_diff_store_ray.query.service import QueryService

    svc = QueryService(built.delta_dir)
    yield svc
    svc.shutdown()


@pytest.fixture(scope="module")
def single_reader(built):
    from rdf_diff_store_ray.query.bgp import DiffStoreReader

    return DiffStoreReader(built.delta_table())


def _end_ts(single_reader):
    _, hi = single_reader.metadata()
    return int(pd.Timestamp(hi).timestamp())


def test_metadata_matches(service, single_reader):
    assert service.metadata() == single_reader.metadata()


def test_graphs_at_matches(service, single_reader):
    ts = _end_ts(single_reader)
    assert service.graphs_at(ts) == single_reader.graphs_at(ts)
    lo, _ = single_reader.metadata()
    pre = int(pd.Timestamp(lo).timestamp()) - 10
    assert service.graphs_at(pre) == single_reader.graphs_at(pre) == ""


def test_query_at_matches(service, single_reader):
    from rdf_diff_store_ray.corpus import P_ACQUIRED

    ts = _end_ts(single_reader)
    q = f"?s <{P_ACQUIRED}> ?o"
    got = service.query_at(ts, q)
    want = single_reader.query_at(ts, q)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


def test_query_caches_warm(service, single_reader):
    """Layered caching: the ACTOR level warms on a repeat that reaches
    it (bypassing the router LRU, which would otherwise short-circuit)."""
    ts = _end_ts(single_reader)
    q = "?s <https://kg.example/prop/partnersWith> ?o"
    service.query_at(ts, q)
    service._query_at_uncached(ts, q)
    assert all(lv == "Query" for lv in service.cache_levels())


def test_point_lookup_partition_pruned(service, single_reader, built):
    from rdf_diff_store_ray.state.reconstruct import state_at_table

    ts = _end_ts(single_reader)
    live = state_at_table(built.delta_table(), ts)
    gid = live["graph_id"][0].as_py()
    want = live["delta_text"][0].as_py()
    assert service.graph_at(gid, ts) == want
    assert service.graph_at("https://never.example/x", ts) is None
    lo, _ = single_reader.metadata()
    pre = int(pd.Timestamp(lo).timestamp()) - 10
    assert service.graph_at(gid, pre) is None  # pre-history


def test_multi_pattern_gathers_and_matches(service, single_reader):
    """Multi-pattern BGPs can join across partitions; the router gathers
    the live state and must agree with the single-reader evaluation."""
    from rdf_diff_store_ray.corpus import P_ACQUIRED, P_HQ

    ts = _end_ts(single_reader)
    for q in (
        f"?s <{P_ACQUIRED}> ?o . ?s <{P_ACQUIRED}> ?o",  # always non-empty
        f"?s <{P_ACQUIRED}> ?o . ?s <{P_HQ}> ?c",        # cross-pattern join
    ):
        got = service.query_at(ts, q)
        want = single_reader.query_at(ts, q)
        pd.testing.assert_frame_equal(got, want)
    assert len(service.query_at(ts, f"?s <{P_ACQUIRED}> ?o . ?s <{P_ACQUIRED}> ?o")) > 0


def test_distributed_filter_optional_match_single_reader(service, single_reader):
    """The push-down path (per-pattern bindings joined on the router)
    must agree with the single-reader evaluator for FILTER/OPTIONAL
    queries too — and the router never requests live triple tables."""
    from rdf_diff_store_ray.corpus import P_ACQUIRED, P_FOUNDED, P_PARTNERS

    ts = _end_ts(single_reader)
    for q in (
        f"?s <{P_FOUNDED}> ?y . FILTER(?y >= 1995)",
        f"?s <{P_ACQUIRED}> ?o . OPTIONAL {{ ?s <{P_PARTNERS}> ?p }}",
        f"?s <{P_ACQUIRED}> ?o . ?o <{P_FOUNDED}> ?y . FILTER(?y < 2005)",
    ):
        got = service.query_at(ts, q)
        want = single_reader.query_at(ts, q)
        pd.testing.assert_frame_equal(got, want)


def test_graphs_at_to_streams_identical_bytes(service, single_reader, tmp_path):
    """The streamed sink (per-partition spill + k-way merge) must produce
    byte-identical output to the in-memory merged string, at an in-history
    instant and at an empty pre-history instant."""
    ts = _end_ts(single_reader)
    out = tmp_path / "merged.nt"
    n = service.graphs_at_to(ts, str(out))
    text = out.read_text(encoding="utf-8")
    assert text == service.graphs_at(ts)
    assert n == text.count("\n") > 0
    n0 = service.graphs_at_to(0, str(out))
    assert n0 == 0 and out.read_text(encoding="utf-8") == ""


def test_select_modifiers_routed_through_distributed(service, single_reader):
    """SELECT modifiers must apply after the cross-partition merge."""
    from rdf_diff_store_ray.corpus import P_ACQUIRED

    ts = _end_ts(single_reader)
    q = f"SELECT DISTINCT ?s WHERE {{ ?s <{P_ACQUIRED}> ?o }} ORDER BY ?s LIMIT 4"
    got = service.query_at(ts, q)
    want = single_reader.query_at(ts, q)
    pd.testing.assert_frame_equal(got, want)
    assert list(got.columns) == ["s"] and len(got) <= 4


def test_ask_construct_paths_distributed_match(service, single_reader):
    """ASK/CONSTRUCT/path query forms route through the router and match
    the single-reader evaluator."""
    from rdf_diff_store_ray.corpus import P_ACQUIRED, PROP_NS

    ts = _end_ts(single_reader)
    for q in (
        f"ASK {{ ?s <{P_ACQUIRED}> ?o }}",
        "ASK { ?s <https://nope> ?o }",
        f"CONSTRUCT {{ ?o <{PROP_NS}acquiredBy> ?s }} "
        f"WHERE {{ ?s <{P_ACQUIRED}>+ ?o }}",
    ):
        got = service.query_at(ts, q)
        want = single_reader.query_at(ts, q)
        pd.testing.assert_frame_equal(got, want)


def test_minus_values_bind_exists_distributed_match(service, single_reader):
    """The r3 group algebra additions (MINUS / VALUES / BIND / EXISTS)
    evaluate once on the router and must match the single reader."""
    from rdf_diff_store_ray.corpus import P_ACQUIRED, P_HQ

    ts = _end_ts(single_reader)
    acq = single_reader.query_at(ts, f"?s <{P_ACQUIRED}> ?o")
    subjects = sorted(set(acq["s"]))[:2]
    vals = " ".join(f"<{s}>" for s in subjects)
    for q in (
        f"?s <{P_ACQUIRED}> ?o . MINUS {{ ?s <{P_HQ}> ?h }}",
        f"?s <{P_ACQUIRED}> ?o . VALUES ?s {{ {vals} }}",
        f"?s <{P_ACQUIRED}> ?o . BIND(str(?s) AS ?name)",
        f"?s <{P_ACQUIRED}> ?o . FILTER EXISTS {{ ?s <{P_HQ}> ?h }}",
        f"?s <{P_ACQUIRED}> ?o . FILTER NOT EXISTS {{ ?s <{P_HQ}> ?h }}",
        f"SELECT ?s WHERE {{ ?s <{P_ACQUIRED}> ?o . "
        f"MINUS {{ ?s <{P_HQ}> ?h }} }} ORDER BY ?s LIMIT 5",
    ):
        got = service.query_at(ts, q)
        want = single_reader.query_at(ts, q)
        pd.testing.assert_frame_equal(got, want)


def test_star_ques_describe_concat_distributed_match(service, single_reader):
    """r3 additions with router-specific machinery: zero-length paths
    gather the partitions' node universes; DESCRIBE pushes one pattern
    per resource; GROUP_CONCAT/SAMPLE aggregate once on the router."""
    from rdf_diff_store_ray.corpus import P_ACQUIRED

    ts = _end_ts(single_reader)
    acq = single_reader.query_at(ts, f"?s <{P_ACQUIRED}> ?o")
    subj = sorted(set(acq["s"]))[0]
    for q in (
        f"<{subj}> <{P_ACQUIRED}>* ?o",
        f"<{subj}> <{P_ACQUIRED}>? ?o",
        f"SELECT ?s (GROUP_CONCAT(?o) AS ?os) (SAMPLE(?o) AS ?one) "
        f"WHERE {{ ?s <{P_ACQUIRED}> ?o }} GROUP BY ?s",
        f"DESCRIBE <{subj}>",
        f"DESCRIBE ?s WHERE {{ ?s <{P_ACQUIRED}> ?o }}",
    ):
        got = service.query_at(ts, q)
        want = single_reader.query_at(ts, q)
        pd.testing.assert_frame_equal(got, want)


def test_graph_clause_distributed_matches_single_reader(service, single_reader, built):
    """GRAPH queries (constant = partition-pruned, variable = fan-out)
    must agree with the single-reader quad evaluation."""
    from rdf_diff_store_ray.corpus import P_ACQUIRED
    from rdf_diff_store_ray.state.reconstruct import state_at_table

    ts = _end_ts(single_reader)
    live = state_at_table(built.delta_table(), ts)
    gid = live["graph_id"][0].as_py()
    for q in (
        f"GRAPH <{gid}> {{ ?s ?p ?o }}",
        f"GRAPH ?g {{ ?s <{P_ACQUIRED}> ?o }}",
        f"SELECT ?g WHERE {{ GRAPH ?g {{ ?s <{P_ACQUIRED}> ?o }} }}",
        f"?s <{P_ACQUIRED}> ?o . GRAPH ?g {{ ?s <{P_ACQUIRED}> ?o }}",
    ):
        got = service.query_at(ts, q)
        want = single_reader.query_at(ts, q)
        pd.testing.assert_frame_equal(got, want)
    assert len(service.query_at(ts, f"GRAPH ?g {{ ?s <{P_ACQUIRED}> ?o }}")) > 0


def test_from_clauses_distributed_match_single_reader(service, single_reader, built):
    """FROM / FROM NAMED through the router (FROM graphs fetched
    partition-pruned, GRAPH restricted to FROM NAMED) must agree with
    the single-reader dataset evaluation."""
    from rdf_diff_store_ray.corpus import P_ACQUIRED
    from rdf_diff_store_ray.state.reconstruct import state_at_table

    ts = _end_ts(single_reader)
    live = state_at_table(built.delta_table(), ts)
    gids = sorted(set(live["graph_id"].to_pylist()))[:3]
    froms = " ".join(f"FROM <{g}>" for g in gids)
    named = " ".join(f"FROM NAMED <{g}>" for g in gids[:2])
    for q in (
        f"SELECT ?s ?o {froms} WHERE {{ ?s ?p ?o }}",
        f"SELECT ?s {froms} WHERE {{ ?s <{P_ACQUIRED}> ?o }}",
        f"SELECT ?g ?s {named} WHERE {{ GRAPH ?g {{ ?s ?p ?o }} }}",
        f"SELECT ?s FROM NAMED <{gids[0]}> WHERE "
        f"{{ GRAPH <{gids[1]}> {{ ?s ?p ?o }} }}",
    ):
        got = service.query_at(ts, q)
        want = single_reader.query_at(ts, q)
        pd.testing.assert_frame_equal(got, want)
    # sanity: the first FROM query is non-empty
    assert len(service.query_at(ts, f"SELECT ?s ?o {froms} WHERE {{ ?s ?p ?o }}")) > 0


def test_subquery_distributed_matches_single_reader(service, single_reader):
    """Subqueries evaluate on the router over pushed-down pattern
    bindings; results must equal the single-reader evaluation."""
    from rdf_diff_store_ray.corpus import P_ACQUIRED

    ts = _end_ts(single_reader)
    for q in (
        f"SELECT ?s WHERE {{ ?s <{P_ACQUIRED}> ?o . "
        f"{{ SELECT ?s (COUNT(?x) AS ?c) WHERE {{ ?s <{P_ACQUIRED}> ?x }} "
        f"GROUP BY ?s ORDER BY DESC(?c) ?s LIMIT 5 }} }}",
        f"?s <{P_ACQUIRED}> ?o . {{ SELECT DISTINCT ?s WHERE "
        f"{{ ?s <{P_ACQUIRED}> ?x }} }}",
    ):
        got = service.query_at(ts, q)
        want = single_reader.query_at(ts, q)
        pd.testing.assert_frame_equal(got, want)


def test_negated_property_set_distributed_matches(service, single_reader):
    from rdf_diff_store_ray.corpus import P_ACQUIRED

    ts = _end_ts(single_reader)
    q = f"SELECT DISTINCT ?s ?o WHERE {{ ?s !<{P_ACQUIRED}> ?o }} LIMIT 50"
    got = service.query_at(ts, q)
    want = single_reader.query_at(ts, q)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


def test_graph_path_distributed_matches_single_reader(service, single_reader, built):
    from rdf_diff_store_ray.corpus import P_ACQUIRED
    from rdf_diff_store_ray.state.reconstruct import state_at_table

    ts = _end_ts(single_reader)
    live = state_at_table(built.delta_table(), ts)
    gid = sorted(set(live["graph_id"].to_pylist()))[0]
    for q in (
        f"SELECT ?g ?s ?o WHERE {{ GRAPH ?g {{ ?s <{P_ACQUIRED}>+ ?o }} }}",
        f"GRAPH <{gid}> {{ ?s <{P_ACQUIRED}>* ?o }}",
    ):
        got = service.query_at(ts, q)
        want = single_reader.query_at(ts, q)
        pd.testing.assert_frame_equal(got, want)


def test_router_query_cache_returns_identical_frame(service, single_reader):
    """A repeated query is served from the router LRU — the identical
    object comes back, no re-evaluation."""
    from rdf_diff_store_ray.corpus import P_ACQUIRED

    ts = _end_ts(single_reader)
    q = f"SELECT ?s ?o WHERE {{ ?s <{P_ACQUIRED}> ?o }} LIMIT 7"
    first = service.query_at(ts, q)
    second = service.query_at(ts, q)
    assert first is second
    pd.testing.assert_frame_equal(first, single_reader.query_at(ts, q))


def test_prefix_now_builtins_distributed_match(service, single_reader):
    """Round-3 grammar additions through the router: PREFIX expansion,
    NOW() (= the as-of instant on BOTH paths), term-constructor and
    hash builtins, and the `a` keyword must agree with the single
    reader — on the pushed-down single-pattern path AND the router-side
    algebra path."""
    from rdf_diff_store_ray.corpus import P_FOUNDED

    ts = _end_ts(single_reader)
    pre = ("PREFIX kg: <https://kg.example/prop/> "
           "PREFIX ent: <https://kg.example/entity/> ")
    for q in (
        # single-pattern pushdown with a builtin FILTER
        pre + "SELECT ?s ?y WHERE { ?s kg:foundedIn ?y . "
              "FILTER(STRLEN(SHA256(STR(?s))) = 64) }",
        # router-side algebra: BIND of NOW + STRAFTER + hash, multi-var
        pre + "SELECT ?s ?t ?loc WHERE { ?s kg:foundedIn ?y . "
              "BIND(NOW() AS ?t) . BIND(STRAFTER(STR(?s), STR(ent:)) AS ?loc) }",
        # modify-free sanity for `a` (no rdf:type triples -> empty both)
        "SELECT ?s WHERE { ?s a <https://kg.example/Type> }",
        pre + "SELECT ?s (ENCODE_FOR_URI(STRBEFORE(STR(?y), \"9\")) AS ?e) "
              "WHERE { ?s kg:foundedIn ?y } ORDER BY ?s ?e LIMIT 20",
    ):
        got = service.query_at(ts, q)
        want = single_reader.query_at(ts, q)
        pd.testing.assert_frame_equal(got, want)
    q = pre + "SELECT DISTINCT ?t WHERE { ?s kg:foundedIn ?y . BIND(NOW() AS ?t) }"
    out = service.query_at(ts, q)
    assert len(out) == 1 and "XMLSchema#dateTime" in out["t"].iloc[0]


def test_service_serializations_match_reader(service, single_reader):
    from rdf_diff_store_ray.corpus import P_FOUNDED

    ts = _end_ts(single_reader)
    q = f"SELECT ?s ?y WHERE {{ ?s <{P_FOUNDED}> ?y }} ORDER BY ?s ?y LIMIT 5"
    assert service.query_at_json(ts, q) == single_reader.query_at_json(ts, q)
    assert service.query_at_csv(ts, q) == single_reader.query_at_csv(ts, q)
    assert service.query_at_tsv(ts, q) == single_reader.query_at_tsv(ts, q)
