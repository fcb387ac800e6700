"""BGP evaluator + cached DiffStoreReader (query-at-timestamp)."""

import pandas as pd
import pyarrow as pa
import pytest

from rdf_diff_store_ray import ntriples
from rdf_diff_store_ray.corpus import P_ACQUIRED, P_FOUNDED
from rdf_diff_store_ray.query.bgp import DiffStoreReader, eval_bgp, parse_bgp


def _triples_table(rows):
    return pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred": pa.array([r[1] for r in rows], pa.string()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
            "obj_is_literal": pa.array([r[3] for r in rows], pa.bool_()),
        }
    )


BASE = _triples_table(
    [
        ("https://e/a", P_ACQUIRED, "https://e/b", False),
        ("https://e/b", P_ACQUIRED, "https://e/c", False),
        ("https://e/a", P_FOUNDED, "1999", True),
        ("https://e/c", P_FOUNDED, "1999", True),
    ]
)


def test_parse_bgp():
    pats = parse_bgp(f'?s <{P_ACQUIRED}> ?o . ?o <{P_FOUNDED}> "1999"')
    assert len(pats) == 2
    assert pats[0][0] == ("var", "s")
    assert pats[1][2] == ("lit", "1999")


def test_single_pattern():
    out = eval_bgp(BASE, f"?s <{P_ACQUIRED}> ?o")
    assert list(out.columns) == ["s", "o"]
    assert len(out) == 2


def test_join_on_shared_var():
    out = eval_bgp(BASE, f'?s <{P_ACQUIRED}> ?o . ?o <{P_FOUNDED}> "1999"')
    assert out.to_dict("records") == [{"s": "https://e/b", "o": "https://e/c"}]


def test_literal_vs_iri_distinction():
    # "1999" as IRI must not match the literal row
    out = eval_bgp(BASE, f"?s <{P_FOUNDED}> <1999>")
    assert len(out) == 0


def test_fixed_subject():
    out = eval_bgp(BASE, f"<https://e/a> <{P_FOUNDED}> ?y")
    assert out.to_dict("records") == [{"y": "1999"}]


def test_empty_result():
    out = eval_bgp(BASE, "?s <https://nope> ?o")
    assert len(out) == 0


def test_reader_cache_levels(built):
    reader = DiffStoreReader(built.delta_table())
    lo, hi = reader.metadata()
    ts = int(pd.Timestamp(hi).timestamp())
    q = f"?s <{P_ACQUIRED}> ?o"
    reader.query_at(ts, q)
    assert reader.last_cache_level == "Nothing"  # cold: full reconstruct
    reader.query_at(ts, q)
    assert reader.last_cache_level == "Query"  # exact query hit
    reader.query_at(ts, f"?s <{P_FOUNDED}> ?y")
    assert reader.last_cache_level == "Store"  # store reused, new query
    reader.graphs_at(ts)
    reader.graphs_at(ts)
    assert reader.last_cache_level == "Prettified"


def test_reader_query_matches_oracle_state(built, oracle_store):
    """Bindings at ts must match evaluating the same BGP over the oracle's
    combined graph."""
    reader = DiffStoreReader(built.delta_table())
    ts = oracle_store.version_times()[-1]
    engine = reader.query_at(ts, f"?s <{P_ACQUIRED}> ?o")
    want = sorted(
        (s, o)
        for (s, p, o, lit) in ntriples.parse(oracle_store.combined_graph(ts))
        if p == P_ACQUIRED and not lit
    )
    assert sorted(zip(engine["s"], engine["o"])) == want


def test_query_before_history_is_empty(built, oracle_store):
    reader = DiffStoreReader(built.delta_table())
    pre = oracle_store.version_times()[0] - 100
    out = reader.query_at(pre, "?s ?p ?o")
    assert len(out) == 0


def test_bindings_json_shape(built, oracle_store):
    reader = DiffStoreReader(built.delta_table())
    ts = oracle_store.version_times()[-1]
    import json

    js = json.loads(reader.query_at_json(ts, f"?s <{P_FOUNDED}> ?y"))
    assert set(js["head"]["vars"]) == {"s", "y"}
    assert all("value" in b["s"] for b in js["results"]["bindings"])


# ------------------------------------------------- extended query surface ---

SF_DIR = "/root/testdata/sf0.001"


def test_kg_bgp_filter_matches_pandas_oracle(ray_session):
    """kg_bgp_filter == filter the raw end-state triples in pandas."""
    from rdf_diff_store_ray.pipelines import queries as q
    from rdf_diff_store_ray.corpus import P_FOUNDED
    from rdf_diff_store_ray.state.reconstruct import metadata_table, triples_at_table

    got = q.kg_bgp_filter(SF_DIR).to_pandas()
    res = q.kg_build_for(SF_DIR)
    dt = res.delta_table()
    _, hi = metadata_table(dt)
    t = triples_at_table(dt, int(pd.Timestamp(hi).timestamp())).to_pandas()
    t = t[(t["pred"] == P_FOUNDED) & t["obj_is_literal"]]
    t = t[pd.to_numeric(t["obj"], errors="coerce") >= 1995]
    want = (
        t.rename(columns={"subj": "s", "obj": "y"})[["s", "y"]]
        .drop_duplicates()
        .sort_values(["s", "y"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_kg_bgp_optional_matches_pandas_oracle(ray_session):
    """kg_bgp_optional == left merge of acquired with partnersWith."""
    from rdf_diff_store_ray.pipelines import queries as q
    from rdf_diff_store_ray.corpus import P_ACQUIRED, P_PARTNERS
    from rdf_diff_store_ray.state.reconstruct import metadata_table, triples_at_table

    got = q.kg_bgp_optional(SF_DIR).to_pandas()
    res = q.kg_build_for(SF_DIR)
    dt = res.delta_table()
    _, hi = metadata_table(dt)
    t = triples_at_table(dt, int(pd.Timestamp(hi).timestamp())).to_pandas()
    acq = t[t["pred"] == P_ACQUIRED].rename(columns={"subj": "s", "obj": "o"})
    part = t[t["pred"] == P_PARTNERS].rename(
        columns={"subj": "s", "obj": "partner"}
    )
    want = (
        acq[["s", "o"]]
        .merge(part[["s", "partner"]], on="s", how="left")
        .drop_duplicates()
        .sort_values(["s", "o", "partner"], ignore_index=True, na_position="last")
    )
    want["partner"] = want["partner"].astype(object).where(
        pd.notna(want["partner"]), None
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_kg_bgp_typed_exact(ray_session):
    """Typed + lang-tagged literals through append → store → query."""
    from rdf_diff_store_ray.pipelines import queries as q

    got = q.kg_bgp_typed(SF_DIR).to_pandas()
    assert list(got.columns) == ["s", "n", "l"] or set(got.columns) == {"s", "n", "l"}
    assert len(got) == 1
    row = got.iloc[0]
    assert row["s"] == "https://e/b"
    assert row["n"] == '"12"^^<http://www.w3.org/2001/XMLSchema#integer>'
    assert row["l"] == '"beta"@en'


def test_union_merges_branches():
    t = _triples_table(
        [
            ("https://e/a", P_ACQUIRED, "https://e/b", False),
            ("https://e/b", "https://p/partner", "https://e/c", False),
            ("https://e/c", P_FOUNDED, "1999", True),
        ]
    )
    out = eval_bgp(
        t, f"{{ ?s <{P_ACQUIRED}> ?o }} UNION {{ ?s <https://p/partner> ?o }}"
    )
    assert out.values.tolist() == [
        ["https://e/a", "https://e/b"],
        ["https://e/b", "https://e/c"],
    ]


def test_union_as_conjunct_and_branch_filter():
    t = _triples_table(
        [
            ("https://e/a", P_ACQUIRED, "https://e/b", False),
            ("https://e/b", "https://p/p2", "https://e/c", False),
            ("https://e/a", P_FOUNDED, "1999", True),
            ("https://e/b", P_FOUNDED, "2005", True),
        ]
    )
    # branch filters see only the branch's own bindings (SPARQL group
    # scope): filter on an in-branch variable
    q = (f"?s <{P_FOUNDED}> ?y . "
         f"{{ ?s <{P_ACQUIRED}> ?o . FILTER(?s = <https://e/a>) }} "
         f"UNION {{ ?s <https://p/p2> ?o }}")
    out = eval_bgp(t, q)
    assert out[["s", "o"]].values.tolist() == [
        ["https://e/a", "https://e/b"],
        ["https://e/b", "https://e/c"],
    ]
    # an outer-scope variable is UNBOUND inside a branch filter → the
    # branch contributes nothing (filter error removes the row)
    q2 = (f"?s <{P_FOUNDED}> ?y . "
          f"{{ ?s <{P_ACQUIRED}> ?o . FILTER(?y < 2000) }} "
          f"UNION {{ ?s <https://p/p2> ?o }}")
    out2 = eval_bgp(t, q2)
    assert out2[["s", "o"]].values.tolist() == [["https://e/b", "https://e/c"]]


def test_union_disjoint_vars_unbound():
    t = _triples_table(
        [
            ("https://e/a", P_ACQUIRED, "https://e/b", False),
            ("https://e/b", P_FOUNDED, "1999", True),
        ]
    )
    out = eval_bgp(
        t, f"{{ ?s <{P_ACQUIRED}> ?x }} UNION {{ ?s <{P_FOUNDED}> ?y }}"
    )
    rows = out.to_dict("records")
    assert {r["s"] for r in rows} == {"https://e/a", "https://e/b"}
    assert any(r["x"] is None for r in rows) and any(r["y"] is None for r in rows)


def test_union_and_optional_nest():
    """Braced groups recurse: nested UNION flattens to the union of all
    branches; OPTIONAL inside OPTIONAL scopes correctly."""
    t = pa.table(
        {
            "subj": ["e1", "e2", "e3", "e1", "e2"],
            "pred": ["p", "q", "r", "x", "y"],
            "obj": ["o", "o", "o", "xo", "yo"],
            "obj_is_literal": [False] * 5,
        }
    )
    out = eval_bgp(t, "{ { ?a <p> ?b } UNION { ?a <q> ?b } } UNION { ?a <r> ?b }")
    assert out["a"].tolist() == ["e1", "e2", "e3"]
    out2 = eval_bgp(
        t, "?a ?pp <o> . OPTIONAL { ?a <x> ?v . OPTIONAL { ?a <y> ?w } }"
    )
    by_a = {r.a: (r.v, r.w) for r in out2.itertuples(index=False)}
    assert by_a["e1"] == ("xo", None)   # outer OPTIONAL bound, inner not
    assert by_a["e2"] == (None, None)   # outer OPTIONAL unbound
    assert by_a["e3"] == (None, None)


def test_union_distributed_matches_single_reader(ray_session):
    """The distributed router evaluates UNION via the same group algebra."""
    from rdf_diff_store_ray.pipelines import queries as q
    from rdf_diff_store_ray.query.service import QueryService
    from rdf_diff_store_ray.state.reconstruct import metadata_table
    from rdf_diff_store_ray.corpus import P_ACQUIRED, P_PARTNERS

    res = q.kg_build_for(SF_DIR)
    dt = res.delta_table()
    _, hi = metadata_table(dt)
    ts = int(pd.Timestamp(hi).timestamp())
    reader = DiffStoreReader(dt)
    query = (f"{{ ?s <{P_ACQUIRED}> ?o }} UNION {{ ?s <{P_PARTNERS}> ?o }}")
    svc = QueryService(res.delta_dir)
    try:
        got = svc.query_at(ts, query)
    finally:
        svc.shutdown()
    want = reader.query_at(ts, query)
    pd.testing.assert_frame_equal(got, want)
    assert len(want) > 0


# ---------------------------------------------------------------- SELECT ----
def _select_table():
    return pa.table(
        {
            "subj": ["e1", "e2", "e3", "e1", "e2"],
            "pred": ["p1", "p1", "p1", "p2", "p2"],
            "obj": ["10", "5", "x", "a", "b"],
            "obj_is_literal": [True, True, True, False, False],
        }
    )


def test_select_projection_and_limit():
    t = _select_table()
    out = eval_bgp(t, "SELECT ?s WHERE { ?s <p1> ?v } ORDER BY ?s LIMIT 2")
    assert list(out.columns) == ["s"]
    assert out["s"].tolist() == ["e1", "e2"]


def test_select_distinct_collapses_projection():
    t = _select_table()
    # without DISTINCT both (e1,10) and (e1,a-object) rows project to e1
    q = "SELECT ?s WHERE { ?s <p1> ?v . OPTIONAL { ?s <p2> ?w } }"
    plain = eval_bgp(t, q)
    distinct = eval_bgp(t, q.replace("SELECT", "SELECT DISTINCT"))
    assert distinct["s"].tolist() == ["e1", "e2", "e3"]
    assert len(plain) >= len(distinct)


def test_select_star_offset():
    t = _select_table()
    out = eval_bgp(t, "SELECT * WHERE { ?s <p1> ?v } OFFSET 1 LIMIT 2")
    assert list(out.columns) == ["s", "v"]
    assert len(out) == 2 and out["s"].tolist() == ["e2", "e3"]


def test_select_unbound_projected_var_is_none():
    t = _select_table()
    out = eval_bgp(t, "SELECT ?s ?nope WHERE { ?s <p2> ?o } LIMIT 3")
    assert list(out.columns) == ["s", "nope"]
    assert out["nope"].isna().all()


def test_select_matches_bare_group():
    t = _select_table()
    bare = eval_bgp(t, "?s <p1> ?v . FILTER(?v >= 1)")
    sel = eval_bgp(t, "SELECT * WHERE { ?s <p1> ?v . FILTER(?v >= 1) }")
    pd.testing.assert_frame_equal(bare, sel)


def test_select_bad_grammar_raises():
    t = _select_table()
    for bad in (
        "SELECT WHERE { ?s <p1> ?v }",
        "SELECT ?s { ?s <p1> ?v }",
        "SELECT ?s WHERE { ?s <p1> ?v } BOGUS 3",
    ):
        with pytest.raises(ValueError):
            eval_bgp(t, bad)


def test_union_unbound_shared_var_kept():
    """A branch that does not bind a shared variable stays compatible
    (the NaN-key merge used to drop its solutions entirely)."""
    t = pa.table(
        {
            "subj": ["e1", "e1", "e2"],
            "pred": ["p1", "p2", "p1"],
            "obj": ["o1", "o1", "o2"],
            "obj_is_literal": [False, False, False],
        }
    )
    out = eval_bgp(t, "?s <p1> ?o . { ?s <p2> ?o } UNION { ?s <p1> ?x }")
    rows = {tuple(r) for r in out.itertuples(index=False)}
    # branch 1 joins (e1, o1); branch 2 contributes every p1 edge with ?x
    assert ("e1", "o1", None) in rows or ("e1", "o1", "o1") in rows
    assert any(r[0] == "e2" for r in rows)


def test_select_distributed_matches_single_reader(ray_session):
    from rdf_diff_store_ray.pipelines import queries as q
    from rdf_diff_store_ray.query.service import QueryService

    res = q.kg_build_for(SF_DIR)
    ts = q._store_end_ts(res)
    reader = DiffStoreReader(res.delta_table())
    query = (
        "SELECT DISTINCT ?s WHERE { "
        f"?s <{P_ACQUIRED}> ?o . ?s <{P_FOUNDED}> ?y . FILTER(?y >= 1990)"
        " } ORDER BY ?s LIMIT 25"
    )
    svc = QueryService(res.delta_dir)
    try:
        got = svc.query_at(ts, query)
    finally:
        svc.shutdown()
    want = reader.query_at(ts, query)
    pd.testing.assert_frame_equal(got, want)
    assert list(want.columns) == ["s"] and 0 < len(want) <= 25


# ------------------------------------------------------- FILTER functions ---
def _func_table():
    xsd_int = "http://www.w3.org/2001/XMLSchema#integer"
    return pa.table(
        {
            "subj": ["e1", "e2", "e3", "e4", "e5"],
            "pred": ["p"] * 5,
            "obj": ["hello world", '"bonjour"@fr', f'"5"^^<{xsd_int}>',
                    "https://x/iri", "HELLO"],
            "obj_is_literal": [True, True, True, False, True],
        }
    )


def test_filter_regex_and_flags():
    t = _func_table()
    assert eval_bgp(t, '?s <p> ?o . FILTER(regex(?o, "hello"))')["s"].tolist() == ["e1"]
    got = eval_bgp(t, '?s <p> ?o . FILTER(regex(?o, "^hello", "i"))')["s"].tolist()
    assert got == ["e1", "e5"]
    # regex never matches IRIs (type error removes the row)
    assert eval_bgp(t, '?s <p> ?o . FILTER(regex(?o, "iri"))').empty


def test_filter_lang_and_datatype():
    t = _func_table()
    assert eval_bgp(t, '?s <p> ?o . FILTER(lang(?o) = "fr")')["s"].tolist() == ["e2"]
    # plain literals have the empty language tag
    got = eval_bgp(t, '?s <p> ?o . FILTER(lang(?o) = "")')["s"].tolist()
    assert got == ["e1", "e3", "e5"] or got == ["e1", "e5"]
    xsd = "http://www.w3.org/2001/XMLSchema#"
    assert eval_bgp(
        t, f'?s <p> ?o . FILTER(datatype(?o) = <{xsd}integer>)'
    )["s"].tolist() == ["e3"]
    assert eval_bgp(
        t, f'?s <p> ?o . FILTER(datatype(?o) = <{xsd}string>)'
    )["s"].tolist() == ["e1", "e5"]
    # datatype() of an IRI is an error -> row removed
    rdf_ls = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
    assert eval_bgp(
        t, f'?s <p> ?o . FILTER(datatype(?o) = <{rdf_ls}>)'
    )["s"].tolist() == ["e2"]


def test_filter_str_accessor():
    t = _func_table()
    # str() of an IRI is its string form (SPARQL semantics)
    assert eval_bgp(
        t, '?s <p> ?o . FILTER(str(?o) = "https://x/iri")'
    )["s"].tolist() == ["e4"]
    # str() unwraps decorated literals to the lexical form
    assert eval_bgp(t, '?s <p> ?o . FILTER(str(?o) = "bonjour")')["s"].tolist() == ["e2"]
    # lexical (codepoint) ordering through str(): every lexical form >= "5"
    got = set(eval_bgp(t, '?s <p> ?o . FILTER(str(?o) >= "5")')["s"])
    assert got == {"e1", "e2", "e3", "e4", "e5"}
    # numeric coercion still applies through str()
    assert eval_bgp(t, '?s <p> ?o . FILTER(str(?o) = 5)')["s"].tolist() == ["e3"]


def test_filter_bad_function_grammar_raises():
    t = _func_table()
    for bad in ('?s <p> ?o . FILTER(regex(?o, "a", "x"))',
                '?s <p> ?o . FILTER(regex(?o, "[unclosed"))',
                '?s <p> ?o . FILTER(nope(?o) = "a")'):
        with pytest.raises(ValueError):
            eval_bgp(t, bad)


# ------------------------------------------------------- property paths -----
def _path_table():
    return pa.table(
        {
            "subj": ["a", "b", "c", "a", "x", "d"],
            "pred": ["knows", "knows", "knows", "name", "near", "name"],
            "obj": ["b", "c", "d", "Ann", "a", "Dee"],
            "obj_is_literal": [False, False, False, True, False, True],
        }
    )


def test_path_transitive_plus():
    out = eval_bgp(_path_table(), "<a> <knows>+ ?o")
    assert out["o"].tolist() == ["b", "c", "d"]
    # cycles terminate: add d->a
    t = pa.table(
        {
            "subj": ["a", "b", "d"],
            "pred": ["k", "k", "k"],
            "obj": ["b", "d", "a"],
            "obj_is_literal": [False] * 3,
        }
    )
    out = eval_bgp(t, "?s <k>+ ?o")
    assert len(out) == 9  # full 3-cycle closure


def test_path_sequence_inverse_alternative():
    t = _path_table()
    # sequence ending at a literal
    out = eval_bgp(t, "?s <knows>/<name> ?n")
    assert [(r.s, r.n) for r in out.itertuples(index=False)] == [("c", "Dee")]
    # inverse
    assert eval_bgp(t, "?s ^<near> ?o").values.tolist() == [["a", "x"]]
    # alternative under closure, joined with FILTER
    out = eval_bgp(t, "?s (<near>|<knows>)+ ?o . FILTER(?o = <d>)")
    assert set(out["s"]) == {"a", "b", "c", "x"}
    # sequence of closures: who is two-or-more hops via knows then named
    out = eval_bgp(t, "<a> <knows>+/<name> ?n")
    assert out["n"].tolist() == ["Dee"]


def test_path_grammar_errors():
    t = _path_table()
    for bad in ("?s (<a>/<b> ?o", "<a>/<b> <p> ?o", "?s <p> <a>/<b>"):
        with pytest.raises(ValueError):
            eval_bgp(t, bad)
    # IRIs containing '?' or '*' are still plain IRIs
    t2 = pa.table(
        {
            "subj": ["s"], "pred": ["http://x?q=1*"], "obj": ["o"],
            "obj_is_literal": [False],
        }
    )
    assert len(eval_bgp(t2, "?a <http://x?q=1*> ?b")) == 1


def test_path_distributed_matches_single_reader(ray_session):
    """Transitive paths cross partitions: the router gathers base edges
    and closes over the union — must equal the single-reader result."""
    from rdf_diff_store_ray.pipelines import queries as q
    from rdf_diff_store_ray.query.service import QueryService
    from rdf_diff_store_ray.corpus import P_ACQUIRED, P_PARTNERS

    res = q.kg_build_for(SF_DIR)
    ts = q._store_end_ts(res)
    reader = DiffStoreReader(res.delta_table())
    svc = QueryService(res.delta_dir)
    try:
        for query in (
            f"?s <{P_ACQUIRED}>+ ?o",
            f"?s (<{P_ACQUIRED}>|<{P_PARTNERS}>)+ ?o",
            f"SELECT DISTINCT ?s WHERE {{ ?s <{P_ACQUIRED}>+/<{P_PARTNERS}> ?o }} LIMIT 10",
        ):
            got = svc.query_at(ts, query)
            want = reader.query_at(ts, query)
            pd.testing.assert_frame_equal(got, want)
    finally:
        svc.shutdown()
    assert len(reader.query_at(ts, f"?s <{P_ACQUIRED}>+ ?o")) >= len(
        reader.query_at(ts, f"?s <{P_ACQUIRED}> ?o")
    )


# ------------------------------------------------------- ASK / CONSTRUCT ----
def test_ask_form():
    t = _path_table()
    assert eval_bgp(t, "ASK { ?s <knows> ?o }")["ask"].tolist() == [True]
    assert eval_bgp(t, "ASK WHERE { <a> <knows>+ <d> }")["ask"].tolist() == [True]
    assert eval_bgp(t, "ASK { ?s <nope> ?o }")["ask"].tolist() == [False]
    assert eval_bgp(
        t, '?s <knows> ?o'
    ).shape[0] > 0  # bare groups unaffected


def test_construct_inverse_edges():
    t = _path_table()
    out = eval_bgp(
        t, "CONSTRUCT { ?o <knownBy> ?s } WHERE { ?s <knows> ?o }"
    )
    assert list(out.columns) == ["subj", "pred", "obj", "obj_is_literal"]
    assert out.values.tolist() == [
        ["b", "knownBy", "a", False],
        ["c", "knownBy", "b", False],
        ["d", "knownBy", "c", False],
    ]


def test_construct_multi_pattern_template_and_literals():
    t = _path_table()
    out = eval_bgp(
        t,
        'CONSTRUCT { ?s <hasName> ?n . ?s <type> "person" } '
        "WHERE { ?s <name> ?n }",
    )
    rows = {tuple(r) for r in out.itertuples(index=False)}
    assert ("a", "hasName", "Ann", True) in rows
    assert ("a", "type", "person", True) in rows
    assert len(rows) == 4
    # literal binding in subject position produces no triple
    out2 = eval_bgp(t, "CONSTRUCT { ?n <x> ?s } WHERE { ?s <name> ?n }")
    assert len(out2) == 0


def test_construct_feeds_canonical_serialization():
    """CONSTRUCT output is a valid triple frame: serialize it."""
    from rdf_diff_store_ray.ntriples import serialize

    t = _path_table()
    out = eval_bgp(
        t, "CONSTRUCT { ?s <k2> ?o } WHERE { ?s <knows>+ ?o }"
    )
    text = serialize(out.itertuples(index=False, name=None))
    assert text.count("\n") == 6  # closure of the 3-chain


def test_ask_construct_grammar_errors():
    t = _path_table()
    for bad in (
        "ASK ?s <p> ?o",
        "CONSTRUCT { ?s <p> ?o }",  # no WHERE
        'CONSTRUCT { "lit" <p> ?o } WHERE { ?s <p> ?o }',
        "CONSTRUCT { ?s <p> ?o . FILTER(?s = <a>) } WHERE { ?s <p> ?o }",
        "CONSTRUCT { } WHERE { ?s <p> ?o }",
    ):
        with pytest.raises(ValueError):
            eval_bgp(t, bad)


# ----------------------------------------------------------- aggregates -----
def _agg_table():
    xsd = "http://www.w3.org/2001/XMLSchema#integer"
    return pa.table(
        {
            "subj": ["a", "a", "b", "b", "b", "c"],
            "pred": ["p", "p", "p", "p", "q", "p"],
            "obj": ["1", "2", "3", f'"4"^^<{xsd}>', "x", "y"],
            "obj_is_literal": [True] * 6,
        }
    )


def test_count_group_by():
    out = eval_bgp(
        _agg_table(),
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s <p> ?o } GROUP BY ?s ORDER BY ?s",
    )
    assert list(out.columns) == ["s", "n"]
    assert out.values.tolist() == [["a", 2], ["b", 2], ["c", 1]]
    total = eval_bgp(_agg_table(), "SELECT (COUNT(*) AS ?n) WHERE { ?s <p> ?o }")
    assert total["n"].tolist() == [5]


def test_sum_avg_skip_non_numeric():
    out = eval_bgp(
        _agg_table(),
        "SELECT ?s (SUM(?o) AS ?total) (AVG(?o) AS ?mean) "
        "WHERE { ?s <p> ?o } GROUP BY ?s ORDER BY ?s",
    )
    # typed "4"^^xsd:integer counts; plain "y" (non-numeric) is skipped
    assert out[["total", "mean"]].iloc[0].tolist() == [3.0, 1.5]
    assert out[["total", "mean"]].iloc[1].tolist() == [7.0, 3.5]
    assert pd.isna(out["total"].iloc[2])  # group with no numeric values


def test_count_distinct_and_numeric_order():
    t = _agg_table()
    out = eval_bgp(t, "SELECT (COUNT(DISTINCT ?s) AS ?n) WHERE { ?s ?pp ?o }")
    assert out["n"].tolist() == [3]
    # ORDER BY an aggregate alias sorts numerically, not lexically
    t2 = pa.table(
        {
            "subj": ["a"] * 10 + ["b"] * 2,
            "pred": ["p"] * 12,
            "obj": [str(i) for i in range(10)] + ["x", "y"],
            "obj_is_literal": [True] * 12,
        }
    )
    out2 = eval_bgp(
        t2,
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s <p> ?o } GROUP BY ?s ORDER BY ?n",
    )
    assert out2["n"].tolist() == [2, 10]  # 10 after 2 (numeric order)


def test_aggregate_grammar_errors():
    t = _agg_table()
    for bad in (
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s <p> ?o }",
        "SELECT ?o WHERE { ?s <p> ?o } GROUP BY ?s",  # ?o not grouped
        "SELECT (SUM(*) AS ?x) WHERE { ?s <p> ?o }",
    ):
        with pytest.raises(ValueError):
            eval_bgp(t, bad)


def test_group_by_without_aggregates_is_one_row_per_group():
    # legal SPARQL 1.1: grouping with no aggregates projects group keys
    t = _agg_table()
    out = eval_bgp(t, "SELECT ?s WHERE { ?s <p> ?o } GROUP BY ?s "
                      "ORDER BY ?s")
    assert out["s"].tolist() == sorted(set(out["s"])) and len(out) >= 2


def test_group_by_expressions():
    t = _triples_table([
        ("https://e/a", "https://p/name", "apple", True),
        ("https://e/b", "https://p/name", "pear", True),
        ("https://e/c", "https://p/name", "melon", True),
        ("https://e/d", "https://p/name", "fig", True),
    ])
    XSD = "http://www.w3.org/2001/XMLSchema#"

    def ilit(n):  # aliased keys look like projection expressions
        return f'"{n}"^^<{XSD}integer>'

    # aliased condition: the alias is a projectable group variable
    out = eval_bgp(t, (
        "SELECT ?len (COUNT(?s) AS ?n) WHERE { ?s <https://p/name> ?m } "
        "GROUP BY (STRLEN(?m) AS ?len) ORDER BY ?len"))
    assert out.values.tolist() == [[ilit(3), 1], [ilit(4), 1],
                                   [ilit(5), 2]]
    # anonymous bracketed + bare-builtin-call conditions group the same
    # way but never project
    for q in (
        "SELECT (COUNT(?s) AS ?n) WHERE { ?s <https://p/name> ?m } "
        "GROUP BY (STRLEN(?m)) ORDER BY ?n",
        "SELECT (COUNT(?s) AS ?n) WHERE { ?s <https://p/name> ?m } "
        "GROUP BY STRLEN(?m) ORDER BY ?n",
    ):
        out2 = eval_bgp(t, q)
        assert list(out2.columns) == ["n"]
        assert sorted(out2["n"]) == [1, 1, 2]
    # mixed plain + aliased keys; HAVING over the alias, no aggregates
    out3 = eval_bgp(t, (
        "SELECT ?s ?len WHERE { ?s <https://p/name> ?m } "
        "GROUP BY ?s (STRLEN(?m) AS ?len) HAVING(?len > 3) ORDER BY ?s"))
    assert out3["s"].tolist() == ["https://e/a", "https://e/b",
                                  "https://e/c"]
    # subquery form
    out4 = eval_bgp(t, (
        "SELECT ?len WHERE { { SELECT ?len WHERE "
        "{ ?s <https://p/name> ?m } GROUP BY (STRLEN(?m) AS ?len) } } "
        "ORDER BY ?len"))
    assert out4["len"].tolist() == [ilit(3), ilit(4), ilit(5)]


def test_having_with_inline_aggregates():
    """Aggregate calls directly inside HAVING (no SELECT alias) —
    hoisted under hidden aliases per SPARQL 18.2.4.1."""
    t = _agg_table()
    out = eval_bgp(t, (
        "SELECT ?s WHERE { ?s <p> ?o } GROUP BY ?s "
        "HAVING(COUNT(?o) > 1) ORDER BY ?s"))
    assert list(out.columns) == ["s"]
    assert out["s"].tolist() == ["a", "b"]
    # expression aggregate + group-key condition in one HAVING
    out2 = eval_bgp(t, (
        "SELECT ?s WHERE { ?s <p> ?o } GROUP BY ?s "
        "HAVING(SUM(xsd:double(?o) * 2) >= 6 && ?s != <b>) ORDER BY ?s"))
    assert out2["s"].tolist() == ["a"]
    # aggregates in HAVING beside aggregates in SELECT
    out3 = eval_bgp(t, (
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s <p> ?o } GROUP BY ?s "
        "HAVING(MIN(xsd:double(?o)) >= 3) ORDER BY ?s"))
    # group c's only value is non-numeric -> the cast errors -> MIN is
    # unbound -> the HAVING expression errors -> the group drops
    assert out3.values.tolist() == [["b", 2]]
    # "COUNT(" inside a string literal is text, not an aggregate
    out4 = eval_bgp(t, (
        'SELECT ?s WHERE { ?s <p> ?o } GROUP BY ?s '
        'HAVING(COUNT(?o) > 1 && ?s != "COUNT(x") ORDER BY ?s'))
    assert out4["s"].tolist() == ["a", "b"]


def test_group_by_aggregate_nul_distinct_keys():
    """Aggregate grouping is NUL-safe: keys differing only past \\x00
    are distinct groups (pandas groupby factorizes object keys through
    the NUL-truncating C-string table — see shuffle_utils)."""
    t = _triples_table([
        ("https://e/a", "https://p/v", "k\x00x", True),
        ("https://e/b", "https://p/v", "k\x00x", True),
        ("https://e/c", "https://p/v", "k\x00y", True),
    ])
    out = eval_bgp(t, (
        "SELECT ?o (COUNT(?s) AS ?n) WHERE { ?s <https://p/v> ?o } "
        "GROUP BY ?o ORDER BY ?n"))
    assert sorted(out["n"]) == [1, 2]
    assert set(out["o"]) == {"k\x00x", "k\x00y"}


def test_aggregate_distributed_matches_single_reader(ray_session):
    from rdf_diff_store_ray.pipelines import queries as q
    from rdf_diff_store_ray.query.service import QueryService

    res = q.kg_build_for(SF_DIR)
    ts = q._store_end_ts(res)
    reader = DiffStoreReader(res.delta_table())
    query = (
        f"SELECT ?s (COUNT(?o) AS ?n) WHERE {{ ?s <{P_ACQUIRED}> ?o }} "
        "GROUP BY ?s ORDER BY ?s"
    )
    svc = QueryService(res.delta_dir)
    try:
        got = svc.query_at(ts, query)
    finally:
        svc.shutdown()
    want = reader.query_at(ts, query)
    pd.testing.assert_frame_equal(got, want)
    assert len(want) > 0 and want["n"].sum() > 0


def test_having_filters_groups():
    t = pa.table(
        {
            "subj": ["a"] * 3 + ["b"] * 2 + ["c"],
            "pred": ["p"] * 6,
            "obj": [str(i) for i in range(6)],
            "obj_is_literal": [True] * 6,
        }
    )
    out = eval_bgp(
        t,
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s <p> ?o } "
        "GROUP BY ?s HAVING(?n >= 2) ORDER BY ?s",
    )
    assert out.values.tolist() == [["a", 3], ["b", 2]]
    # multiple HAVING clauses AND together; group keys compare as terms
    out2 = eval_bgp(
        t,
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s <p> ?o } "
        "GROUP BY ?s HAVING(?n >= 2) HAVING(?s = <a>)",
    )
    assert out2.values.tolist() == [["a", 3]]
    with pytest.raises(ValueError, match="HAVING requires aggregates"):
        eval_bgp(t, "SELECT ?s WHERE { ?s <p> ?o } HAVING(?s = <a>)")


# ----------------------------------------------- review-finding regressions -
def test_order_by_non_projected_var():
    """SPARQL orders BEFORE projecting: a sort var outside the
    projection must still order the rows."""
    t = pa.table(
        {
            "subj": ["s1", "s2"],
            "pred": ["p", "p"],
            "obj": ["9", "1"],
            "obj_is_literal": [True, True],
        }
    )
    out = eval_bgp(t, "SELECT ?s WHERE { ?s <p> ?o } ORDER BY ?o LIMIT 1")
    assert out["s"].tolist() == ["s2"]  # smallest ?o, not smallest ?s


def test_subqueries_rejected_not_silently_ignored():
    t = _path_table()
    for bad in (
        "?s <knows> ?o . OPTIONAL { SELECT ?x WHERE { ?s <knows> ?x } LIMIT 1 }",
        "{ SELECT ?s WHERE { ?s <knows> ?o } } UNION { ?s <name> ?o }",
    ):
        with pytest.raises(ValueError, match="subquer"):
            eval_bgp(t, bad)


def test_construct_template_rejects_paths():
    t = _path_table()
    with pytest.raises(ValueError, match="paths are not valid"):
        eval_bgp(t, "CONSTRUCT { ?s <x>/<y> ?o } WHERE { ?s <knows> ?o }")


def test_filter_bound_and_logical_operators():
    t = pa.table(
        {
            "subj": ["a", "b", "c", "a"],
            "pred": ["p", "p", "p", "q"],
            "obj": ["1", "5", "x", "extra"],
            "obj_is_literal": [True] * 4,
        }
    )
    got = eval_bgp(t, "?s <p> ?o . OPTIONAL { ?s <q> ?e } . FILTER(bound(?e))")
    assert got["s"].tolist() == ["a"]
    got = eval_bgp(t, "?s <p> ?o . OPTIONAL { ?s <q> ?e } . FILTER(!bound(?e))")
    assert got["s"].tolist() == ["b", "c"]
    got = eval_bgp(t, '?s <p> ?o . FILTER(?o = "1" || ?o = "x")')
    assert got["s"].tolist() == ["a", "c"]
    got = eval_bgp(t, "?s <p> ?o . FILTER(?o >= 1 && ?o <= 4)")
    assert got["s"].tolist() == ["a"]
    got = eval_bgp(t, '?s <p> ?o . FILTER((?o = "1" || ?o = "5") && ?s != <b>)')
    assert got["s"].tolist() == ["a"]
    assert eval_bgp(t, '?s <p> ?o . FILTER(!regex(?o, "[0-9]"))')["s"].tolist() == ["c"]
    with pytest.raises(ValueError):
        eval_bgp(t, "?s <p> ?o . FILTER(bound(?o) ||)")


def test_values_undef_and_multi_var():
    t = pa.table(
        {
            "subj": ["a", "b", "c"],
            "pred": ["p", "p", "p"],
            "obj": ["1", "2", "3"],
            "obj_is_literal": [True] * 3,
        }
    )
    got = eval_bgp(t, "?s <p> ?o . VALUES ?s { <a> <c> }")
    assert got["s"].tolist() == ["a", "c"]
    # UNDEF leaves the var unconstrained in that row
    got = eval_bgp(t, '?s <p> ?o . VALUES (?s ?o) { (<a> "1") (UNDEF "3") }')
    assert sorted(zip(got["s"], got["o"])) == [("a", "1"), ("c", "3")]
    # VALUES over a fresh var cross-joins
    got = eval_bgp(t, "?s <p> ?o . VALUES ?tag { <t1> <t2> }")
    assert len(got) == 6 and sorted(set(got["tag"])) == ["t1", "t2"]
    with pytest.raises(ValueError, match="bare numbers"):
        eval_bgp(t, "?s <p> ?o . VALUES ?s { 5 }")
    with pytest.raises(ValueError, match="arity"):
        eval_bgp(t, "?s <p> ?o . VALUES (?s ?o) { (<a>) }")


def test_bind_accessors_and_errors():
    xsd_int = "http://www.w3.org/2001/XMLSchema#integer"
    t = pa.table(
        {
            "subj": ["a", "b"],
            "pred": ["p", "p"],
            "obj": [f'"5"^^<{xsd_int}>', "plain"],
            "obj_is_literal": [True, True],
        }
    )
    got = eval_bgp(t, "?s <p> ?o . BIND(datatype(?o) AS ?dt)")
    assert sorted(got["dt"]) == [
        xsd_int, "http://www.w3.org/2001/XMLSchema#string"
    ]
    got = eval_bgp(t, "?s <p> ?o . BIND(str(?s) AS ?n) . FILTER(?n = \"a\")")
    assert got["s"].tolist() == ["a"]
    # lang() of an IRI is a SPARQL error -> var stays unbound, row kept
    got = eval_bgp(t, "?s <p> ?o . BIND(lang(?s) AS ?l)")
    assert len(got) == 2 and got["l"].isna().all()
    with pytest.raises(ValueError, match="rebind"):
        eval_bgp(t, "?s <p> ?o . BIND(str(?s) AS ?o)")
    with pytest.raises(ValueError, match="AS"):
        eval_bgp(t, "?s <p> ?o . BIND(str(?s))")


def test_minus_semantics():
    t = pa.table(
        {
            "subj": ["a", "b", "c", "a"],
            "pred": ["p", "p", "p", "q"],
            "obj": ["1", "2", "3", "x"],
            "obj_is_literal": [True] * 4,
        }
    )
    got = eval_bgp(t, '?s <p> ?o . MINUS { ?s <q> "x" }')
    assert got["s"].tolist() == ["b", "c"]
    # disjoint domains remove nothing (the spec's dom() condition)
    got = eval_bgp(t, '?s <p> ?o . MINUS { ?z <q> "x" }')
    assert len(got) == 3
    # empty minus group removes nothing
    got = eval_bgp(t, "?s <p> ?o . MINUS { ?s <nope> ?w }")
    assert len(got) == 3


def test_filter_exists_and_not_exists():
    t = pa.table(
        {
            "subj": ["a", "b", "c", "a", "b"],
            "pred": ["p", "p", "p", "q", "q"],
            "obj": ["1", "2", "3", "x", "y"],
            "obj_is_literal": [True] * 5,
        }
    )
    got = eval_bgp(t, "?s <p> ?o . FILTER EXISTS { ?s <q> ?w }")
    assert got["s"].tolist() == ["a", "b"]
    got = eval_bgp(t, "?s <p> ?o . FILTER NOT EXISTS { ?s <q> ?w }")
    assert got["s"].tolist() == ["c"]
    # inner constants narrow the semi-join
    got = eval_bgp(t, '?s <p> ?o . FILTER EXISTS { ?s <q> "x" }')
    assert got["s"].tolist() == ["a"]
    # no shared vars: existential gate over the whole result
    got = eval_bgp(t, "?s <p> ?o . FILTER EXISTS { ?z <q> ?w }")
    assert len(got) == 3
    got = eval_bgp(t, "?s <p> ?o . FILTER NOT EXISTS { ?z <q> ?w }")
    assert len(got) == 0
    with pytest.raises(ValueError, match="EXISTS needs braces"):
        eval_bgp(t, "?s <p> ?o . FILTER EXISTS ?s")


# ------------------------------------------- zero-length paths (* / ?) ------
def test_path_star_includes_zero_length():
    t = _path_table()
    out = eval_bgp(t, "<a> <knows>* ?o")
    # a itself (zero steps) + the + closure
    assert out["o"].tolist() == ["a", "b", "c", "d"]


def test_path_ques_zero_or_one():
    t = _path_table()
    out = eval_bgp(t, "<a> <knows>? ?o")
    assert out["o"].tolist() == ["a", "b"]


def test_path_star_bound_start_absent_from_graph():
    """Per spec (ALP), a bound start matches itself even when it does
    not occur in the graph."""
    t = _path_table()
    out = eval_bgp(t, "<ghost> <knows>* ?o")
    assert out["o"].tolist() == ["ghost"]


def test_path_star_both_vars_pairs_every_term():
    t = pa.table(
        {"subj": ["a"], "pred": ["k"], "obj": ["b"],
         "obj_is_literal": [False]}
    )
    out = eval_bgp(t, "?s <k>* ?o")
    assert set(map(tuple, out.values.tolist())) == {
        ("a", "a"), ("b", "b"), ("a", "b")
    }


def test_path_star_in_sequence():
    t = _path_table()
    # zero-or-more knows then a name: includes a's OWN name (zero hops)
    out = eval_bgp(t, "<a> (<knows>*)/<name> ?n")
    assert sorted(out["n"]) == ["Ann", "Dee"]


# ----------------------------------------------- GROUP_CONCAT / SAMPLE ------
def test_group_concat_and_sample():
    t = _path_table()
    out = eval_bgp(
        t,
        'SELECT ?s (GROUP_CONCAT(?o ; SEPARATOR=", ") AS ?os) '
        "(SAMPLE(?o) AS ?one) WHERE { ?s <knows> ?o } GROUP BY ?s",
    )
    got = {r.s: (r.os, r.one) for r in out.itertuples(index=False)}
    assert got == {"a": ("b", "b"), "b": ("c", "c"), "c": ("d", "d")}
    # multiplicity comes from distinct solutions (RDF graphs are SETS of
    # triples — a repeated triple is one solution): two subjects share x
    t2 = pa.table(
        {"subj": ["g1", "g2", "g1"], "pred": ["p"] * 3,
         "obj": ["x", "x", "z"], "obj_is_literal": [True] * 3}
    )
    out = eval_bgp(
        t2,
        'SELECT (GROUP_CONCAT(?o ; SEPARATOR="|") AS ?all) '
        "(GROUP_CONCAT(DISTINCT ?o) AS ?uniq) WHERE { ?s <p> ?o }",
    )
    assert out["all"].tolist() == ["x|x|z"]
    assert out["uniq"].tolist() == ["x z"]


def test_group_concat_str_semantics_on_typed_literals():
    t = pa.table(
        {"subj": ["g", "g"], "pred": ["p"] * 2,
         "obj": ['"5"^^<http://www.w3.org/2001/XMLSchema#integer>', "plain"],
         "obj_is_literal": [True, True]}
    )
    out = eval_bgp(
        t, "SELECT (GROUP_CONCAT(?o) AS ?all) WHERE { <g> <p> ?o }"
    )
    assert out["all"].tolist() == ["5 plain"]  # lexical forms, sorted


def test_sample_separator_rejected_outside_group_concat():
    with pytest.raises(ValueError):
        eval_bgp(
            _path_table(),
            'SELECT (SAMPLE(?o ; SEPARATOR=",") AS ?x) WHERE { ?s <knows> ?o }',
        )


# ------------------------------------------------------------- DESCRIBE -----
def test_describe_iri():
    out = eval_bgp(_path_table(), "DESCRIBE <a>")
    assert out.values.tolist() == [
        ["a", "knows", "b", False],
        ["a", "name", "Ann", True],
    ]


def test_describe_var_with_where():
    out = eval_bgp(
        _path_table(), "DESCRIBE ?s WHERE { ?s <name> ?n }"
    )
    assert sorted(set(out["subj"])) == ["a", "d"]
    assert out[out["subj"] == "d"].values.tolist() == [
        ["d", "name", "Dee", True]
    ]


def test_describe_multiple_and_absent():
    out = eval_bgp(_path_table(), "DESCRIBE <a> <x> <missing>")
    assert sorted(set(out["subj"])) == ["a", "x"]


def test_describe_errors():
    t = _path_table()
    with pytest.raises(ValueError):
        eval_bgp(t, "DESCRIBE")
    with pytest.raises(ValueError):
        eval_bgp(t, "DESCRIBE ?s")  # var without a binding group


# ------------------------------------------------------------- GRAPH -------
def _quads_table():
    rows = [
        ("https://g/1", "https://e/a", P_ACQUIRED, "https://e/b", False),
        ("https://g/2", "https://e/b", P_ACQUIRED, "https://e/c", False),
        ("https://g/1", "https://e/a", P_FOUNDED, "1999", True),
        ("https://g/2", "https://e/c", P_FOUNDED, "1999", True),
    ]
    return pa.table(
        {
            "graph_id": pa.array([r[0] for r in rows], pa.string()),
            "subj": pa.array([r[1] for r in rows], pa.string()),
            "pred": pa.array([r[2] for r in rows], pa.string()),
            "obj": pa.array([r[3] for r in rows], pa.string()),
            "obj_is_literal": pa.array([r[4] for r in rows], pa.bool_()),
        }
    )


def test_graph_constant_scopes_to_named_graph():
    out = eval_bgp(BASE, f"GRAPH <https://g/1> {{ ?s <{P_ACQUIRED}> ?o }}",
                   quads=_quads_table())
    assert out.to_dict("records") == [
        {"s": "https://e/a", "o": "https://e/b"}
    ]


def test_graph_variable_binds_graph_id():
    out = eval_bgp(BASE, f"GRAPH ?g {{ ?s <{P_ACQUIRED}> ?o }}",
                   quads=_quads_table())
    assert sorted(map(tuple, out[["g", "s"]].values.tolist())) == [
        ("https://g/1", "https://e/a"),
        ("https://g/2", "https://e/b"),
    ]


def test_graph_block_joins_within_one_graph():
    # both patterns must match in the SAME graph: a acquired b AND
    # founded-1999 only co-occur in g/1
    q = (f"GRAPH ?g {{ ?s <{P_ACQUIRED}> ?o . "
         f'?s <{P_FOUNDED}> "1999" }}')
    out = eval_bgp(BASE, q, quads=_quads_table())
    assert out.to_dict("records") == [
        {"g": "https://g/1", "s": "https://e/a", "o": "https://e/b"}
    ]


def test_graph_joins_with_default_graph_pattern():
    q = (f"?s <{P_FOUNDED}> ?y . "
         f"GRAPH ?g {{ ?s <{P_ACQUIRED}> ?o }}")
    out = eval_bgp(BASE, q, quads=_quads_table())
    got = sorted(map(tuple, out[["g", "s"]].values.tolist()))
    assert got == [("https://g/1", "https://e/a")]


def test_graph_select_projection():
    q = f"SELECT ?g WHERE {{ GRAPH ?g {{ ?s <{P_FOUNDED}> ?o }} }}"
    out = eval_bgp(BASE, q, quads=_quads_table())
    assert sorted(out["g"]) == ["https://g/1", "https://g/2"]


def test_graph_path_nul_distinct_graph_ids():
    """Property paths inside GRAPH ?g evaluate per graph — NUL-distinct
    graph ids must stay distinct graphs (pandas object-key groupby
    folds them; the evaluator routes through groupby_nul_safe). The
    a->b->c chain spans the two NUL-twin graphs, so ?s path+ ?o inside
    one graph must NOT see the cross-graph composition."""
    rows = [
        ("g\x00p", "https://e/a", P_ACQUIRED, "https://e/b", False),
        ("g\x00q", "https://e/b", P_ACQUIRED, "https://e/c", False),
    ]
    quads = pa.table({
        "graph_id": pa.array([r[0] for r in rows], pa.string()),
        "subj": pa.array([r[1] for r in rows], pa.string()),
        "pred": pa.array([r[2] for r in rows], pa.string()),
        "obj": pa.array([r[3] for r in rows], pa.string()),
        "obj_is_literal": pa.array([r[4] for r in rows], pa.bool_()),
    })
    out = eval_bgp(BASE, f"GRAPH ?g {{ ?s <{P_ACQUIRED}>+ ?o }}",
                   quads=quads)
    got = {(r["g"], r["s"], r["o"]) for r in out.to_dict("records")}
    assert got == {
        ("g\x00p", "https://e/a", "https://e/b"),
        ("g\x00q", "https://e/b", "https://e/c"),
    }  # no a->c composition across the NUL-twin graphs


def test_graph_without_quads_raises():
    with pytest.raises(ValueError, match="quad table"):
        eval_bgp(BASE, "GRAPH ?g { ?s ?p ?o }")


def test_graph_grammar_errors():
    with pytest.raises(ValueError):
        parse_bgp("GRAPH { ?s ?p ?o }")  # missing term
    with pytest.raises(ValueError):
        parse_bgp('GRAPH "lit" { ?s ?p ?o }')  # literal term
    with pytest.raises(ValueError):
        parse_bgp("GRAPH ?g ?s ?p ?o")  # missing braces
    with pytest.raises(ValueError):
        parse_bgp("GRAPH ?g { GRAPH ?h { ?s ?p ?o } }")  # nested GRAPH


def test_reader_graph_query_matches_state(built):
    """GRAPH <gid> { ?s ?p ?o } through the reader equals the parsed
    triples of that graph's own live text."""
    from rdf_diff_store_ray import ntriples as nt
    from rdf_diff_store_ray.state.reconstruct import state_at_table

    reader = DiffStoreReader(built.delta_table())
    _, hi = reader.metadata()
    ts = int(pd.Timestamp(hi).timestamp())
    live = state_at_table(built.delta_table(), ts)
    gid = live["graph_id"][0].as_py()
    text = live["delta_text"][0].as_py()
    out = reader.query_at(ts, f"GRAPH <{gid}> {{ ?s ?p ?o }}")
    want = sorted((s, p, o) for s, p, o, _ in nt.parse(text))
    got = sorted(map(tuple, out[["s", "p", "o"]].values.tolist()))
    assert got == want


# ------------------------------------------- FILTER builtins round 3b ------
_XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def _builtin_table():
    rows = [
        ("http://e/a", "hello", True),
        ("http://e/b", f'"5"^^<{_XSD_INT}>', True),
        ("http://e/c", '"bonjour"@fr', True),
        ("http://e/d", "http://e/x", False),
        ("_:b1", "world", True),
    ]
    return _triples_table([(s, "http://e/p", o, lit) for s, o, lit in rows])


def _q(flt):
    return f"?s <http://e/p> ?o . FILTER({flt})"


def test_filter_type_tests():
    t = _builtin_table()
    assert sorted(eval_bgp(t, _q("isIRI(?o)"))["s"]) == ["http://e/d"]
    assert sorted(eval_bgp(t, _q("isBlank(?s)"))["s"]) == ["_:b1"]
    assert sorted(eval_bgp(t, _q("isNumeric(?o)"))["s"]) == ["http://e/b"]
    assert len(eval_bgp(t, _q("isLiteral(?o)"))) == 4
    # blank nodes are not IRIs
    assert "_:b1" not in set(eval_bgp(t, _q("isIRI(?s)"))["s"])


def test_filter_in_and_not_in():
    t = _builtin_table()
    assert sorted(eval_bgp(t, _q('?o IN ("hello", "world")'))["s"]) == [
        "_:b1", "http://e/a"
    ]
    assert len(eval_bgp(t, _q('?o NOT IN ("hello", "world")'))) == 3
    # IRI + typed-literal members, and numeric promotion via `=`
    assert sorted(eval_bgp(t, _q("?o IN (<http://e/x>, 5)"))["s"]) == [
        "http://e/b", "http://e/d"
    ]
    assert len(eval_bgp(t, _q("?o IN ()"))) == 0
    assert len(eval_bgp(t, _q("?o NOT IN ()"))) == 5
    # literal containing " in (" is NOT an IN clause
    assert len(eval_bgp(t, _q('?o = "log in (now)"'))) == 0


def test_filter_sameterm_and_langmatches():
    t = _builtin_table()
    assert len(eval_bgp(t, _q("sameTerm(?s, ?s)"))) == 5
    assert len(eval_bgp(t, _q("sameTerm(?s, ?o)"))) == 0
    got = eval_bgp(t, _q('LANGMATCHES(lang(?o), "fr")'))
    assert sorted(got["s"]) == ["http://e/c"]
    got = eval_bgp(t, _q('LANGMATCHES(lang(?o), "*")'))
    assert sorted(got["s"]) == ["http://e/c"]
    # range "en" does not match fr; plain literals have no tag
    assert len(eval_bgp(t, _q('LANGMATCHES(lang(?o), "en")'))) == 0


def test_filter_string_tests_and_operand_funcs():
    t = _builtin_table()
    assert sorted(eval_bgp(t, _q('STRSTARTS(?o, "hel")'))["s"]) == [
        "http://e/a"
    ]
    assert sorted(eval_bgp(t, _q('STRENDS(?o, "rld")'))["s"]) == ["_:b1"]
    assert sorted(eval_bgp(t, _q('CONTAINS(?o, "onjou")'))["s"]) == [
        "http://e/c"
    ]
    # strlen compares numerically; ucase/lcase yield simple literals
    assert sorted(eval_bgp(t, _q("strlen(?o) = 5"))["s"]) == [
        "_:b1", "http://e/a"
    ]
    assert sorted(eval_bgp(t, _q('ucase(?o) = "HELLO"'))["s"]) == [
        "http://e/a"
    ]
    assert sorted(eval_bgp(t, _q('lcase(?o) = "hello"'))["s"]) == [
        "http://e/a"
    ]
    # IRIs are not strings: string tests remove those rows
    assert "http://e/d" not in set(eval_bgp(t, _q('CONTAINS(?o, "e")'))["s"])


def test_filter_builtin_grammar_errors():
    t = _builtin_table()
    with pytest.raises(ValueError):
        eval_bgp(t, _q("isIRI(?o) extra"))
    with pytest.raises(ValueError):
        eval_bgp(t, _q("sameTerm(?s)"))
    with pytest.raises(ValueError):
        eval_bgp(t, _q("LANGMATCHES(lang(?o), ?v)"))
    with pytest.raises(ValueError):
        eval_bgp(t, _q("STRSTARTS(?o)"))


def test_order_by_desc_and_asc():
    t = _builtin_table()
    q = ("SELECT ?s WHERE { ?s <http://e/p> ?o . FILTER(isIRI(?s)) } "
         "ORDER BY DESC(?s)")
    assert eval_bgp(t, q)["s"].tolist() == [
        "http://e/d", "http://e/c", "http://e/b", "http://e/a"
    ]
    q = ("SELECT ?s WHERE { ?s <http://e/p> ?o . FILTER(isIRI(?s)) } "
         "ORDER BY ASC(?s) LIMIT 2")
    assert eval_bgp(t, q)["s"].tolist() == ["http://e/a", "http://e/b"]
    with pytest.raises(ValueError):
        eval_bgp(t, "SELECT ?s WHERE { ?s ?p ?o } ORDER BY DESC ?s")


# --------------------------------------------------- FROM / FROM NAMED -----
def test_from_restricts_default_graph():
    q = (f"SELECT ?s ?o FROM <https://g/1> WHERE "
         f"{{ ?s <{P_ACQUIRED}> ?o }}")
    out = eval_bgp(BASE, q, quads=_quads_table())
    assert out.to_dict("records") == [
        {"s": "https://e/a", "o": "https://e/b"}
    ]


def test_from_union_of_graphs_matches_unrestricted():
    q = (f"SELECT ?s FROM <https://g/1> FROM <https://g/2> WHERE "
         f"{{ ?s <{P_ACQUIRED}> ?o }}")
    out = eval_bgp(BASE, q, quads=_quads_table())
    want = eval_bgp(BASE, f"SELECT ?s WHERE {{ ?s <{P_ACQUIRED}> ?o }}")
    assert sorted(out["s"]) == sorted(want["s"])


def test_from_named_only_empties_default_graph():
    q = (f"SELECT ?s FROM NAMED <https://g/1> WHERE "
         f"{{ ?s <{P_ACQUIRED}> ?o }}")
    assert len(eval_bgp(BASE, q, quads=_quads_table())) == 0


def test_from_named_scopes_graph_clauses():
    q = (f"SELECT ?g ?s FROM NAMED <https://g/2> WHERE "
         f"{{ GRAPH ?g {{ ?s <{P_ACQUIRED}> ?o }} }}")
    out = eval_bgp(BASE, q, quads=_quads_table())
    assert out.values.tolist() == [["https://g/2", "https://e/b"]]
    # a constant GRAPH outside FROM NAMED matches nothing
    q = (f"SELECT ?s FROM NAMED <https://g/2> WHERE "
         f"{{ GRAPH <https://g/1> {{ ?s <{P_ACQUIRED}> ?o }} }}")
    assert len(eval_bgp(BASE, q, quads=_quads_table())) == 0


def test_from_without_quads_raises():
    with pytest.raises(ValueError, match="quad table"):
        eval_bgp(BASE, "SELECT ?s FROM <https://g/1> WHERE { ?s ?p ?o }")


# ------------------------------------------------------- subqueries --------
def _social_table():
    rows = [
        ("https://e/a", "https://e/knows", "https://e/b", False),
        ("https://e/a", "https://e/knows", "https://e/c", False),
        ("https://e/b", "https://e/knows", "https://e/c", False),
        ("https://e/b", "https://e/knows", "https://e/a", False),
        ("https://e/c", "https://e/knows", "https://e/a", False),
        ("https://e/a", "https://e/name", "Ann", True),
        ("https://e/b", "https://e/name", "Bob", True),
        ("https://e/c", "https://e/name", "Cyd", True),
    ]
    return _triples_table(rows)


def test_subquery_aggregate_top_k():
    q = """SELECT ?s ?n WHERE {
      ?s <https://e/name> ?n .
      { SELECT ?s (COUNT(?o) AS ?deg) WHERE { ?s <https://e/knows> ?o }
        GROUP BY ?s ORDER BY DESC(?deg) ?s LIMIT 2 }
    }"""
    out = eval_bgp(_social_table(), q)
    assert out.to_dict("records") == [
        {"s": "https://e/a", "n": "Ann"},
        {"s": "https://e/b", "n": "Bob"},
    ]


def test_subquery_projection_hides_inner_vars():
    q = ("?s <https://e/name> ?n . "
         "{ SELECT ?s WHERE { ?s <https://e/knows> ?o } }")
    out = eval_bgp(_social_table(), q)
    assert "o" not in out.columns
    assert len(out) == 3


def test_subquery_distinct_limit_deterministic():
    q = ("?s <https://e/name> ?n . "
         "{ SELECT DISTINCT ?s WHERE { ?s <https://e/knows> ?o } LIMIT 2 }")
    out = eval_bgp(_social_table(), q)
    # LIMIT without ORDER BY picks after an all-column sort: a, b
    assert sorted(out["s"]) == ["https://e/a", "https://e/b"]


def test_nested_group_joins_with_scoped_filter():
    q = ("?s <https://e/name> ?n . "
         "{ ?s <https://e/knows> ?o . FILTER(?o = <https://e/a>) }")
    out = eval_bgp(_social_table(), q)
    assert sorted(out["s"]) == ["https://e/b", "https://e/c"]


def test_subquery_from_rejected():
    with pytest.raises(ValueError, match="FROM"):
        eval_bgp(
            _social_table(),
            "?s ?p ?o . { SELECT ?s FROM <https://g/1> WHERE { ?s ?p2 ?o2 } }",
        )


# ------------------------------------------- negated property sets ---------
def test_negated_property_set_single_and_list():
    t = _triples_table([
        ("https://e/a", "https://e/p", "https://e/x", False),
        ("https://e/a", "https://e/q", "https://e/y", False),
        ("https://e/b", "https://e/p", "https://e/x", False),
        ("https://e/b", "https://e/r", "https://e/z", False),
    ])
    out = eval_bgp(t, "?s !<https://e/p> ?o")
    assert sorted(map(tuple, out.values.tolist())) == [
        ("https://e/a", "https://e/y"), ("https://e/b", "https://e/z")
    ]
    out = eval_bgp(t, "?s !(<https://e/p>|<https://e/q>) ?o")
    assert out.values.tolist() == [["https://e/b", "https://e/z"]]
    # composes with sequence/inverse
    out = eval_bgp(t, "?s !(<https://e/q>|<https://e/r>)/^<https://e/p> ?o")
    assert len(out) == 4  # {a,b} x {a,b} through the shared x


def test_negated_property_set_errors():
    t = _path_table()
    with pytest.raises(ValueError, match="inverse members"):
        eval_bgp(t, "?s !^<p> ?o")
    with pytest.raises(ValueError, match="inverse members"):
        eval_bgp(t, "?s !(<p>|^<q>) ?o")
    with pytest.raises(ValueError):
        eval_bgp(t, "?s !() ?o")


def test_construct_where_shorthand():
    """CONSTRUCT WHERE { patterns } == the longhand with the group as
    template; non-pattern clauses in the group are rejected."""
    t = _path_table()
    short = eval_bgp(t, "CONSTRUCT WHERE { ?s <knows> ?o }")
    full = eval_bgp(t, "CONSTRUCT { ?s <knows> ?o } WHERE { ?s <knows> ?o }")
    pd.testing.assert_frame_equal(short, full)
    assert len(short) > 0
    with pytest.raises(ValueError):
        eval_bgp(t, 'CONSTRUCT WHERE { ?s <knows> ?o . FILTER(?o = "x") }')


def test_order_by_numeric_values_not_lexical():
    """ORDER BY sorts all-numeric keys by VALUE (typed literals and
    plain numeric strings); mixed columns fall back to codepoint order."""
    xsd = "http://www.w3.org/2001/XMLSchema#integer"
    t = _triples_table([
        (f"https://e/{c}", "https://e/p", f'"{v}"^^<{xsd}>', True)
        for c, v in zip("abc", (9, 10, 2))
    ])
    out = eval_bgp(t, "SELECT ?o WHERE { ?s <https://e/p> ?o } ORDER BY DESC(?o)")
    assert [o.split('"')[1] for o in out["o"]] == ["10", "9", "2"]
    t2 = _triples_table([
        ("https://e/a", "https://e/p", "9", True),
        ("https://e/b", "https://e/p", "10", True),
        ("https://e/c", "https://e/p", "2", True),
    ])
    out = eval_bgp(t2, "SELECT ?o WHERE { ?s <https://e/p> ?o } ORDER BY ?o")
    assert out["o"].tolist() == ["2", "9", "10"]
    t3 = _triples_table([
        ("https://e/a", "https://e/p", "zz", True),
        ("https://e/b", "https://e/p", "9", True),
    ])
    out = eval_bgp(t3, "SELECT ?o WHERE { ?s <https://e/p> ?o } ORDER BY ?o")
    assert out["o"].tolist() == ["9", "zz"]


def test_graph_constant_scopes_property_paths():
    """A property path inside GRAPH <iri> closes over that graph's edges
    only — an edge in another graph must not extend the chain."""
    quads = pa.table({
        "graph_id": ["https://g/1", "https://g/1", "https://g/2"],
        "subj": ["https://e/a", "https://e/b", "https://e/b"],
        "pred": [P_ACQUIRED] * 3,
        "obj": ["https://e/b", "https://e/c", "https://e/d"],
        "obj_is_literal": [False] * 3,
    })
    triples = quads.drop_columns(["graph_id"])
    out = eval_bgp(
        triples, f"GRAPH <https://g/1> {{ ?s <{P_ACQUIRED}>+ ?o }}",
        quads=quads,
    )
    got = sorted(map(tuple, out.values.tolist()))
    assert got == [
        ("https://e/a", "https://e/b"),
        ("https://e/a", "https://e/c"),
        ("https://e/b", "https://e/c"),
    ]
    # the variable form evaluates per graph: g/2's lone edge cannot
    # extend g/1's chain
    out = eval_bgp(triples, f"GRAPH ?g {{ ?s <{P_ACQUIRED}>+ ?o }}",
                   quads=quads)
    assert ("https://e/a", "https://e/d") not in set(
        map(tuple, out[["s", "o"]].values.tolist())
    )


def test_trailing_values_joins_solutions():
    """Postfix VALUES (always last in the grammar) joins the group's
    solutions like the in-group form, including multi-var rows."""
    t = _triples_table([
        ("https://e/a", "https://e/p", "x", True),
        ("https://e/b", "https://e/p", "y", True),
        ("https://e/c", "https://e/p", "z", True),
    ])
    out = eval_bgp(
        t, 'SELECT ?s ?o WHERE { ?s <https://e/p> ?o } VALUES ?o { "x" "z" }'
    )
    assert sorted(out["s"]) == ["https://e/a", "https://e/c"]
    out = eval_bgp(
        t, "SELECT ?s WHERE { ?s <https://e/p> ?o } ORDER BY ?s LIMIT 5 "
           'VALUES (?s ?o) { (<https://e/a> "x") }'
    )
    assert out["s"].tolist() == ["https://e/a"]
    with pytest.raises(ValueError):
        # VALUES must be the last clause
        eval_bgp(t, "SELECT ?s WHERE { ?s ?p ?o } VALUES ?s { <a> } LIMIT 2")


def test_graph_var_property_path_binds_graph():
    """GRAPH ?g { path } evaluates per graph (chains never cross
    graphs) and binds the graph id; the shared-var form filters."""
    quads = pa.table({
        "graph_id": ["https://g/1", "https://g/1", "https://g/2"],
        "subj": ["https://e/a", "https://e/b", "https://e/b"],
        "pred": [P_ACQUIRED] * 3,
        "obj": ["https://e/b", "https://e/c", "https://e/d"],
        "obj_is_literal": [False] * 3,
    })
    triples = quads.drop_columns(["graph_id"])
    out = eval_bgp(
        triples, f"GRAPH ?g {{ ?s <{P_ACQUIRED}>+ ?o }}", quads=quads
    )
    got = sorted(map(tuple, out[["g", "s", "o"]].values.tolist()))
    assert got == [
        ("https://g/1", "https://e/a", "https://e/b"),
        ("https://g/1", "https://e/a", "https://e/c"),
        ("https://g/1", "https://e/b", "https://e/c"),
        ("https://g/2", "https://e/b", "https://e/d"),
    ]
    # no graph matches -> empty with both columns
    out = eval_bgp(
        triples, "GRAPH ?g { ?s <https://nope>+ ?o }", quads=quads
    )
    assert len(out) == 0 and set(out.columns) == {"g", "s", "o"}


# ------------------------------------------- expressions: arith/IF/COALESCE
def _num_table():
    xsd = "http://www.w3.org/2001/XMLSchema#integer"
    return _triples_table([
        (f"https://e/{c}", "https://e/p", f'"{v}"^^<{xsd}>', True)
        for c, v in zip("abc", (5, 10, 0))
    ])


def test_filter_arithmetic_expressions():
    t = _num_table()
    q = "?s <https://e/p> ?o"
    assert sorted(eval_bgp(t, q + " . FILTER(?o * 2 >= 10)")["s"]) == [
        "https://e/a", "https://e/b"
    ]
    assert sorted(eval_bgp(t, q + " . FILTER((?o + 5) * 2 = 20)")["s"]) == [
        "https://e/a"
    ]
    # division by zero is an expression error: the row drops
    assert sorted(eval_bgp(t, q + " . FILTER(10 / ?o >= 1)")["s"]) == [
        "https://e/a", "https://e/b"
    ]
    assert len(eval_bgp(t, q + " . FILTER(-?o < -4)")) == 2


def test_bind_arithmetic_renders_numeric_literals():
    t = _num_table()
    q = "?s <https://e/p> ?o"
    out = eval_bgp(t, q + " . BIND(?o * 2 + 1 AS ?d)")
    xsd = "http://www.w3.org/2001/XMLSchema#integer"
    assert sorted(out["d"]) == [
        f'"{v}"^^<{xsd}>' for v in (1, 11, 21)
    ]
    out = eval_bgp(t, q + " . BIND(?o / 4 AS ?q)")
    dbl = "http://www.w3.org/2001/XMLSchema#double"
    assert f'"1.25"^^<{dbl}>' in set(out["q"])
    out = eval_bgp(t, q + " . BIND(42 AS ?k)")
    assert set(out["k"]) == {f'"42"^^<{xsd}>'}


def test_if_and_coalesce():
    t = _num_table()
    q = "?s <https://e/p> ?o"
    out = eval_bgp(t, q + ' . BIND(IF(?o >= 5, "big", "small") AS ?c)')
    got = dict(zip(out["s"], out["c"]))
    assert got["https://e/a"] == "big" and got["https://e/c"] == "small"
    out = eval_bgp(
        t, q + " . OPTIONAL { ?s <https://e/q> ?m } . "
               "BIND(COALESCE(?m, ?o) AS ?v)"
    )
    assert out["v"].notna().all()


def test_expression_grammar_errors():
    t = _num_table()
    q = "?s <https://e/p> ?o . "
    for bad in ("FILTER(?o + )", "FILTER(IF(?o > 1, ?o) = 1)",
                "FILTER(?o ** 2 = 1)", "FILTER(COALESCE() = 1)"):
        with pytest.raises(ValueError):
            eval_bgp(t, q + bad)


def test_select_expression_projection():
    """(expr AS ?alias) projections, local + inside subqueries; rejected
    beside aggregates."""
    t = _num_table()
    out = eval_bgp(
        t, "SELECT ?s (?o * 2 AS ?d) WHERE { ?s <https://e/p> ?o }"
    )
    assert list(out.columns) == ["s", "d"]
    xsd = "http://www.w3.org/2001/XMLSchema#integer"
    assert f'"20"^^<{xsd}>' in set(out["d"])
    out = eval_bgp(
        t, 'SELECT (IF(?o > 6, "hi", "lo") AS ?c) '
           "WHERE { ?s <https://e/p> ?o }"
    )
    assert sorted(set(out["c"])) == ["hi", "lo"]
    out = eval_bgp(
        t, "?s <https://e/p> ?o . "
           "{ SELECT ?s (strlen(str(?s)) AS ?n) "
           "WHERE { ?s <https://e/p> ?x } }"
    )
    assert "n" in out.columns and out["n"].notna().all()
    with pytest.raises(ValueError, match="aggregates"):
        eval_bgp(t, "SELECT (COUNT(?o) AS ?c) (?o + 1 AS ?d) "
                    "WHERE { ?s <https://e/p> ?o }")


def test_aggregate_over_expression():
    """SUM/COUNT over expressions materialize a hidden pre-bound column
    and keep SPARQL's error-skipping; legacy forms unchanged."""
    xsd = "http://www.w3.org/2001/XMLSchema#integer"
    rows = []
    for s, p, q_ in (("a", 5, 3), ("b", 2, 10)):
        rows.append((f"https://e/{s}", "https://e/price", f'"{p}"^^<{xsd}>', True))
        rows.append((f"https://e/{s}", "https://e/qty", f'"{q_}"^^<{xsd}>', True))
    t = _triples_table(rows)
    out = eval_bgp(
        t, "SELECT ?s (SUM(?p * ?q) AS ?rev) WHERE "
           "{ ?s <https://e/price> ?p . ?s <https://e/qty> ?q } "
           "GROUP BY ?s ORDER BY ?s"
    )
    assert out["rev"].tolist() == [15.0, 20.0]
    out = eval_bgp(
        t, 'SELECT (GROUP_CONCAT(DISTINCT ?p; SEPARATOR="|") AS ?g) '
           "WHERE { ?s <https://e/price> ?p }"
    )
    assert out["g"].iloc[0] == "2|5"
    with pytest.raises(ValueError):
        eval_bgp(t, "SELECT (SUM(*) AS ?x) WHERE { ?s ?p ?o }")


def test_string_and_numeric_builtins_third_wave():
    """CONCAT / SUBSTR / REPLACE / ABS / CEIL / FLOOR / ROUND."""
    xsd = "http://www.w3.org/2001/XMLSchema#integer"
    t = _triples_table([
        ("https://e/a", "https://e/p", "hello world", True),
        ("https://e/b", "https://e/p", f'"-7"^^<{xsd}>', True),
    ])
    q = "?s <https://e/p> ?o . "
    out = eval_bgp(t, q + 'BIND(CONCAT(?o, "!") AS ?c)')
    assert sorted(out["c"]) == ["-7!", "hello world!"]
    out = eval_bgp(t, q + "BIND(SUBSTR(?o, 7) AS ?c)")  # 1-based
    assert sorted(out["c"]) == ["", "world"]
    out = eval_bgp(t, q + 'BIND(REPLACE(?o, "o", "0") AS ?c)')
    assert "hell0 w0rld" in set(out["c"])
    out = eval_bgp(t, q + "BIND(ABS(?o) AS ?c)")
    # non-numeric ABS is an expression error -> unbound
    vals = dict(zip(out["s"], out["c"]))
    assert vals["https://e/a"] is None
    assert vals["https://e/b"] == f'"7"^^<{xsd}>'
    assert eval_bgp(t, q + "FILTER(CEIL(?o / 2) = -3)")["s"].tolist() == [
        "https://e/b"
    ]
    assert len(eval_bgp(t, q + "FILTER(ROUND(2.5) = 3)")) == 2  # half-up
    assert len(eval_bgp(t, q + "FILTER(FLOOR(?o / 2) = -4)")) == 1
    with pytest.raises(ValueError):
        eval_bgp(t, q + 'BIND(REPLACE(?o, "(", "x") AS ?c)')
    with pytest.raises(ValueError):
        eval_bgp(t, q + "BIND(SUBSTR(?o) AS ?c)")


def test_string_builtins_fourth_wave():
    """STRBEFORE/STRAFTER, ENCODE_FOR_URI, STRDT/STRLANG, IRI(), hashes."""
    t = _triples_table([
        ("https://e/a", "https://e/p", "abc def", True),
    ])
    q = "?s <https://e/p> ?o . "
    out = eval_bgp(t, q + 'BIND(STRBEFORE(?o, " ") AS ?c)')
    assert out["c"].tolist() == ["abc"]
    out = eval_bgp(t, q + 'BIND(STRAFTER(?o, " ") AS ?c)')
    assert out["c"].tolist() == ["def"]
    # no match -> "", empty separator -> ""/whole string (spec)
    assert eval_bgp(t, q + 'BIND(STRBEFORE(?o, "x") AS ?c)')["c"].tolist() \
        == [""]
    assert eval_bgp(t, q + 'BIND(STRAFTER(?o, "") AS ?c)')["c"].tolist() \
        == ["abc def"]
    out = eval_bgp(t, q + "BIND(ENCODE_FOR_URI(?o) AS ?c)")
    assert out["c"].tolist() == ["abc%20def"]
    xsd = "http://www.w3.org/2001/XMLSchema#token"
    out = eval_bgp(t, q + f"BIND(STRDT(?o, <{xsd}>) AS ?c)")
    assert out["c"].tolist() == [f'"abc def"^^<{xsd}>']
    out = eval_bgp(t, q + 'BIND(STRLANG(?o, "en-US") AS ?c)')
    assert out["c"].tolist() == ['"abc def"@en-US']
    # STRDT/STRLANG over an already-decorated literal is an error
    t2 = _triples_table([("https://e/a", "https://e/p", '"x"@en', True)])
    out = eval_bgp(t2, q + f"BIND(STRDT(?o, <{xsd}>) AS ?c)")
    assert out["c"].tolist() == [None]
    # IRI() over a simple literal and over an IRI (identity)
    out = eval_bgp(t, q + 'BIND(IRI("https://e/x") AS ?c) . '
                          "FILTER(isIRI(?c))")
    assert len(out) == 1
    out = eval_bgp(t, q + "BIND(URI(?s) AS ?c)")
    assert out["c"].tolist() == ["https://e/a"]
    # hashes: deterministic hex of the UTF-8 lexical form
    import hashlib
    out = eval_bgp(t, q + "BIND(SHA256(?o) AS ?c)")
    assert out["c"].tolist() == [hashlib.sha256(b"abc def").hexdigest()]
    out = eval_bgp(t, q + "BIND(MD5(?o) AS ?c)")
    assert out["c"].tolist() == [hashlib.md5(b"abc def").hexdigest()]
    with pytest.raises(ValueError):
        eval_bgp(t, q + "BIND(RAND() AS ?c)")
    with pytest.raises(ValueError):
        eval_bgp(t, q + "BIND(UUID() AS ?c)")
    with pytest.raises(ValueError):
        eval_bgp(t, q + 'BIND(STRLANG(?o, "7bad") AS ?c)')
    with pytest.raises(ValueError):  # NOW() without a query-time context
        eval_bgp(t, q + "BIND(NOW() AS ?c)")


def test_now_binds_the_asof_timestamp(built):
    reader = DiffStoreReader(built.delta_table())
    _lo, hi = reader.metadata()
    out = reader.query_at(
        hi, "SELECT DISTINCT ?t WHERE { ?s ?p ?o . BIND(NOW() AS ?t) }"
    )
    k = int(pd.Timestamp(hi).timestamp())
    expect = (f'"{pd.Timestamp(k, unit="s").isoformat()}Z"'
              "^^<http://www.w3.org/2001/XMLSchema#dateTime>")
    assert out["t"].tolist() == [expect]
    # deterministic: asking the same instant again returns the same value
    assert reader.query_at(
        hi, "SELECT DISTINCT ?t WHERE { ?s ?p ?o . BIND(NOW() AS ?t) }"
    )["t"].tolist() == [expect]


def test_prefix_declarations():
    """PREFIX/BASE declarations expand everywhere a term can appear."""
    xsd = "http://www.w3.org/2001/XMLSchema#integer"
    t = _triples_table([
        ("https://e/a", P_ACQUIRED, "https://e/b", False),
        ("https://e/a", "https://e/n", f'"5"^^<{xsd}>', True),
    ])
    pre = "PREFIX e: <https://e/> PREFIX x: <https://kg.example/prop/> "
    out = eval_bgp(t, pre + "SELECT ?s WHERE { ?s x:acquired e:b }")
    assert out["s"].tolist() == ["https://e/a"]
    # ^^dt suffix, FILTER expression and property-path positions
    out = eval_bgp(
        t,
        "PREFIX e: <https://e/> PREFIX xsd: "
        "<http://www.w3.org/2001/XMLSchema#> "
        'SELECT ?v WHERE { ?s e:n ?v . FILTER(?v = "5"^^xsd:integer) }',
    )
    assert len(out) == 1
    out = eval_bgp(
        t, "PREFIX x: <https://kg.example/prop/> "
           "SELECT ?o WHERE { <https://e/a> x:acquired+ ?o }"
    )
    assert out["o"].tolist() == ["https://e/b"]
    # empty prefix and a colon inside a string literal stays untouched
    out = eval_bgp(
        t, "PREFIX : <https://kg.example/prop/> "
           'SELECT ?s WHERE { ?s :acquired ?o . FILTER(STR(?o) != "x:y") }'
    )
    assert out["s"].tolist() == ["https://e/a"]
    with pytest.raises(ValueError, match="undefined prefix"):
        eval_bgp(t, "PREFIX e: <https://e/> SELECT ?s WHERE { ?s nope:p ?o }")


def test_base_declaration_resolves_relative_iris():
    t = _triples_table([
        ("https://e/dir/a", "https://e/dir/p", "https://e/other", False),
    ])
    out = eval_bgp(
        t, "BASE <https://e/dir/> SELECT ?o WHERE { <a> <p> ?o }"
    )
    assert out["o"].tolist() == ["https://e/other"]
    # absolute IRIs pass through a BASE untouched
    out = eval_bgp(
        t, "BASE <https://e/dir/> SELECT ?o "
           "WHERE { <https://e/dir/a> <p> ?o }"
    )
    assert len(out) == 1


def test_rdf_type_keyword_a():
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    t = _triples_table([
        ("https://e/a", rdf_type, "https://e/Company", False),
        ("https://e/a", P_FOUNDED, "1999", True),
    ])
    out = eval_bgp(t, "SELECT ?s WHERE { ?s a <https://e/Company> }")
    assert out["s"].tolist() == ["https://e/a"]
    out = eval_bgp(
        t, "PREFIX e: <https://e/> ASK { e:a a e:Company }"
    )
    assert bool(out["ask"].iloc[0]) is True


def test_results_csv_tsv_serializations():
    from rdf_diff_store_ray.query.bgp import bindings_csv, bindings_tsv

    xsd = "http://www.w3.org/2001/XMLSchema#integer"
    df = pd.DataFrame(
        {
            "s": ["https://e/a", "https://e/b"],
            "o": ['say "hi", ok', None],
            "n": [f'"5"^^<{xsd}>', "plain"],
        }
    )
    csv_out = bindings_csv(df)
    lines = csv_out.split("\r\n")
    assert lines[0] == "s,o,n"
    assert lines[1] == 'https://e/a,"say ""hi"", ok","""5""^^<{}>"'.format(xsd)
    assert lines[2] == "https://e/b,,plain"  # unbound = empty field
    tsv_out = bindings_tsv(df)
    tl = tsv_out.splitlines()
    assert tl[0] == "?s\t?o\t?n"
    assert tl[1] == f'<https://e/a>\t"say \\"hi\\", ok"\t"5"^^<{xsd}>'
    assert tl[2] == '<https://e/b>\t\t"plain"'


def test_datetime_accessors(built):
    """YEAR/MONTH/DAY/HOURS over dateTime literals, composing with
    NOW() — the time-travel store's natural FILTER vocabulary."""
    xsd = "http://www.w3.org/2001/XMLSchema#dateTime"
    t = _triples_table([
        ("https://e/a", "https://e/at", f'"2024-03-05T07:08:09"^^<{xsd}>',
         True),
        ("https://e/b", "https://e/at", "not a date", True),
    ])
    q = "?s <https://e/at> ?d . "
    out = eval_bgp(t, q + "FILTER(YEAR(?d) = 2024 && MONTH(?d) = 3 && "
                          "DAY(?d) = 5 && HOURS(?d) = 7 && "
                          "MINUTES(?d) = 8 && SECONDS(?d) = 9)")
    assert out["s"].tolist() == ["https://e/a"]  # bad date = error row
    out = eval_bgp(t, q + "BIND(YEAR(?d) AS ?y)")
    vals = dict(zip(out["s"], out["y"]))
    assert vals["https://e/b"] is None
    # composes with NOW() through the reader
    reader = DiffStoreReader(built.delta_table())
    _lo, hi = reader.metadata()
    out = reader.query_at(
        hi, "SELECT DISTINCT ?y WHERE { ?s ?p ?o . "
            "BIND(YEAR(NOW()) AS ?y) }"
    )
    import pandas as pd
    want = pd.Timestamp(int(pd.Timestamp(hi).timestamp()), unit="s").year
    assert out["y"].tolist() == [
        f'"{want}"^^<http://www.w3.org/2001/XMLSchema#integer>'
    ]


# ----------------------------------------------------------- blank nodes ----
def test_bnode_pattern_terms_join_and_hide():
    """A ``_:label`` query term is a scoped variable (SPARQL 1.1
    §4.1.4): it joins across patterns like any var, never matches a
    stored ``_:label`` literally, and SELECT * omits it."""
    t = _triples_table([
        ("https://e/a", "https://e/knows", "https://e/m1", False),
        ("https://e/b", "https://e/knows", "https://e/m2", False),
        ("https://e/m1", "https://e/name", "Ann", True),
        ("https://e/m2", "https://e/name", "Bob", True),
        # a stored blank node named _:t must NOT be what _:t matches
        ("_:t", "https://e/name", "Sneaky", True),
    ])
    out = eval_bgp(
        t, "?s <https://e/knows> _:t . _:t <https://e/name> ?n"
    )
    assert sorted(out.columns) == ["n", "s"]
    assert dict(zip(out["s"], out["n"])) == {
        "https://e/a": "Ann", "https://e/b": "Bob"
    }
    out2 = eval_bgp(
        t, "SELECT * WHERE { ?s <https://e/knows> _:t . "
           "_:t <https://e/name> ?n } ORDER BY ?s"
    )
    assert sorted(out2.columns) == ["n", "s"]
    # explicit projection of the visible vars only
    out3 = eval_bgp(
        t, "SELECT ?n WHERE { _:w <https://e/name> ?n } ORDER BY ?n"
    )
    assert out3["n"].tolist() == ["Ann", "Bob", "Sneaky"]


def test_bnode_construct_fresh_per_solution():
    """A template-only blank-node label instantiates one FRESH node per
    solution row, shared across the template's triples for that row,
    and the labels are deterministic across evaluations."""
    t = _triples_table([
        ("https://e/a", "https://e/knows", "https://e/m1", False),
        ("https://e/b", "https://e/knows", "https://e/m2", False),
        ("https://e/m1", "https://e/name", "Ann", True),
        ("https://e/m2", "https://e/name", "Bob", True),
    ])
    q = ("CONSTRUCT { ?s <https://e/stmt> _:x . _:x <https://e/val> ?n } "
         "WHERE { ?s <https://e/knows> _:p . _:p <https://e/name> ?n }")
    out = eval_bgp(t, q)
    stmt = out[out["pred"] == "https://e/stmt"]
    val = out[out["pred"] == "https://e/val"]
    assert len(stmt) == 2 and len(val) == 2
    # one fresh node per solution, consistently linking the two triples
    links = dict(zip(stmt["obj"], stmt["subj"]))
    names = dict(zip(val["subj"], val["obj"]))
    assert len(links) == 2 and set(links) == set(names)
    pairs = {(links[b], names[b]) for b in links}
    assert pairs == {("https://e/a", "Ann"), ("https://e/b", "Bob")}
    assert all(b.startswith("_:") for b in links)
    pd.testing.assert_frame_equal(out, eval_bgp(t, q))  # deterministic


def test_bnode_rejects():
    """Bad labels and predicate-position template bnodes raise."""
    t = _triples_table([("https://e/a", "https://e/p", "o", True)])
    with pytest.raises(ValueError):
        eval_bgp(t, "?s <https://e/p> _:")
    with pytest.raises(ValueError):
        eval_bgp(t, "?s <https://e/p> _:a__b")
    with pytest.raises(ValueError):
        eval_bgp(
            t, "CONSTRUCT { ?s _:x ?o } WHERE { ?s <https://e/p> ?o }"
        )


def test_triple_pattern_sugar():
    """Predicate-object lists (;), object lists (,) and anonymous
    blank nodes ([ ... ], nested, glued punctuation) desugar to plain
    triples with fresh scoped labels."""
    t = _triples_table([
        ("https://e/1", "https://e/knows", "https://e/m1", False),
        ("https://e/2", "https://e/knows", "https://e/m2", False),
        ("https://e/m1", "https://e/name", "Ann", True),
        ("https://e/m2", "https://e/name", "Bob", True),
        ("https://e/m1", "https://e/age", "30", True),
        ("https://e/1", "https://e/likes", "https://e/m2", False),
    ])
    out = eval_bgp(t, "?s <https://e/knows> ?o ; <https://e/likes> ?l")
    assert out.to_dict("records") == [
        {"s": "https://e/1", "l": "https://e/m2", "o": "https://e/m1"}
    ]
    out = eval_bgp(t, "?s <https://e/knows> ?o , ?l")  # both must hold
    assert len(out) == 2 and (out["o"] == out["l"]).all()
    out = eval_bgp(
        t, "?s <https://e/knows> [ <https://e/name> ?n ; "
           "<https://e/age> ?a ]"
    )
    assert out.to_dict("records") == [
        {"a": "30", "n": "Ann", "s": "https://e/1"}
    ]
    out = eval_bgp(t, "[ <https://e/name> ?n ]")  # bracket as clause
    assert out["n"].tolist() == ["Ann", "Bob"]
    # glued punctuation tokenizes correctly
    out = eval_bgp(t, "?s <https://e/knows> ?o; <https://e/likes> ?l")
    assert len(out) == 1
    # CONSTRUCT template brackets mint fresh nodes per solution
    c = eval_bgp(
        t, "CONSTRUCT { ?s <https://e/stmt> [ <https://e/v> ?n ] } "
           "WHERE { ?s <https://e/knows> [ <https://e/name> ?n ] }"
    )
    assert (c["subj"].str.startswith("_:").sum() == 2
            and c["obj"].str.startswith("_:").sum() == 2)
    # same query parses identically twice (deterministic genid labels)
    q = "SELECT * WHERE { ?s <https://e/p> [ <https://e/q> ?x ] }"
    from rdf_diff_store_ray.query.bgp import parse_query
    assert parse_query(q) == parse_query(q)


def test_triple_pattern_sugar_rejects():
    t = _triples_table([("https://e/a", "https://e/p", "o", True)])
    for bad in ("?s <https://e/p> [", "?s <https://e/p> ] ?o", "[ ]",
                "?s <https://e/p> ?o ,", "?s ; <https://e/p> ?o"):
        with pytest.raises(ValueError):
            eval_bgp(t, bad)


def test_describe_cbd_blank_node_closure():
    """DESCRIBE serves the Concise Bounded Description: blank-node
    OBJECTS are followed recursively (cycle-safe), other resources'
    triples are not pulled in."""
    t = _triples_table([
        ("https://e/r", "https://e/p", "_:b1", False),
        ("_:b1", "https://e/q", "_:b2", False),
        ("_:b2", "https://e/v", "val", True),
        ("_:b2", "https://e/back", "_:b1", False),  # cycle
        ("https://e/other", "https://e/p", "zzz", True),
    ])
    out = eval_bgp(t, "DESCRIBE <https://e/r>")
    assert set(out["subj"]) == {"https://e/r", "_:b1", "_:b2"}
    assert len(out) == 4
    # an IRI object is NOT followed (CBD stops at non-blank nodes)
    t2 = _triples_table([
        ("https://e/r", "https://e/p", "https://e/other", False),
        ("https://e/other", "https://e/p", "zzz", True),
    ])
    out2 = eval_bgp(t2, "DESCRIBE <https://e/r>")
    assert set(out2["subj"]) == {"https://e/r"}


def test_bnode_sugar_distributed_matches_single_reader(ray_session):
    """Blank-node pattern terms and the ; , [ ] sugar route through the
    distributed service identically to the single reader (hidden vars
    join across per-partition pattern push-downs like any variable)."""
    from rdf_diff_store_ray.corpus import P_ACQUIRED, P_HQ
    from rdf_diff_store_ray.pipelines import queries as q
    from rdf_diff_store_ray.query.service import QueryService
    from rdf_diff_store_ray.state.reconstruct import metadata_table

    res = q.kg_build_for(SF_DIR)
    dt = res.delta_table()
    _, hi = metadata_table(dt)
    ts = int(pd.Timestamp(hi).timestamp())
    reader = DiffStoreReader(dt)
    queries = [
        f"SELECT * WHERE {{ ?a <{P_ACQUIRED}> _:t . "
        f"_:t <{P_HQ}> ?city }} ORDER BY ?a ?city",
        f"SELECT * WHERE {{ ?a <{P_ACQUIRED}> [ <{P_HQ}> ?city ] }} "
        "ORDER BY ?a ?city",
    ]
    svc = QueryService(res.delta_dir)
    try:
        for query in queries:
            got = svc.query_at(ts, query)
            want = reader.query_at(ts, query)
            pd.testing.assert_frame_equal(got, want)
            assert len(want) > 0
            assert not any(c.startswith("__bn_") for c in got.columns)
    finally:
        svc.shutdown()


def test_collection_sugar_matches_stored_chains():
    """( ... ) in patterns desugars to rdf:first/rest chains over
    fresh anon nodes — exact-length matching against stored lists
    (the Turtle ingestion layout); ( ) is rdf:nil; glued parens still
    parse as property paths."""
    ns = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    t = _triples_table([
        ("https://e/s", "https://e/p", "_:c0", False),
        ("_:c0", ns + "first", "a", True),
        ("_:c0", ns + "rest", "_:c1", False),
        ("_:c1", ns + "first", "b", True),
        ("_:c1", ns + "rest", ns + "nil", False),
        ("https://e/s2", "https://e/p", "_:d0", False),
        ("_:d0", ns + "first", "x", True),
        ("_:d0", ns + "rest", ns + "nil", False),
    ])
    out = eval_bgp(t, "?s <https://e/p> ( ?a ?b )")
    assert out.to_dict("records") == [
        {"a": "a", "b": "b", "s": "https://e/s"}
    ]
    out1 = eval_bgp(t, "?s <https://e/p> ( ?only )")
    assert out1.to_dict("records") == [
        {"only": "x", "s": "https://e/s2"}
    ]
    assert len(eval_bgp(t, "?s <https://e/p> ( )")) == 0
    # nested: ( ( ?x ) ) matches a list whose sole item is a list
    t2 = _triples_table([
        ("https://e/n", "https://e/p", "_:o0", False),
        ("_:o0", ns + "first", "_:i0", False),
        ("_:o0", ns + "rest", ns + "nil", False),
        ("_:i0", ns + "first", "inner", True),
        ("_:i0", ns + "rest", ns + "nil", False),
    ])
    out2 = eval_bgp(t2, "?s <https://e/p> ( ( ?x ) )")
    assert out2.to_dict("records") == [
        {"s": "https://e/n", "x": "inner"}
    ]
    with pytest.raises(ValueError):
        eval_bgp(t, "?s <https://e/p> ( ?a")  # unbalanced


class TestServiceFederation:
    """SPARQL 1.1 SERVICE: sub-groups evaluate against another store's
    registered endpoint at the same timestamp and join like any nested
    group; SILENT failures contribute the identity solution."""

    def _readers(self):
        import pyarrow as pa

        from rdf_diff_store_ray.query.bgp import DiffStoreReader

        def store(rows, ts):
            import pandas as pd

            return pa.Table.from_pandas(pd.DataFrame({
                "graph_id": ["g"] * 1,
                "warc_ts": [pd.Timestamp(ts, unit="s")],
                "op": ["update"],
                "delta_text": ["".join(rows)],
                "digest": ["x"],
                "seq": [0],
            }))

        local_rows = ['<https://x/a> <https://x/p> <https://x/b> .\n'
                      '<https://x/c> <https://x/p> <https://x/d> .\n']
        remote_rows = ['<https://x/b> <https://x/name> "Bee" .\n'
                       '<https://x/z> <https://x/name> "Zed" .\n']
        remote = DiffStoreReader(store(remote_rows, 1_700_000_000))
        local = DiffStoreReader(
            store(local_rows, 1_700_000_000),
            services={"https://svc/remote": remote},
        )
        return local

    def test_federated_join(self, ray_session):
        local = self._readers()
        res = local.query_at(1_700_000_100, """
            SELECT ?s ?n WHERE {
              ?s <https://x/p> ?o .
              SERVICE <https://svc/remote> { ?o <https://x/name> ?n }
            }""")
        assert res.to_dict("records") == [
            {"s": "https://x/a", "n": "Bee"}]

    def test_silent_unknown_endpoint_is_identity(self, ray_session):
        local = self._readers()
        res = local.query_at(1_700_000_100, """
            SELECT ?s WHERE {
              ?s <https://x/p> ?o .
              SERVICE SILENT <https://svc/nope> { ?o <https://x/name> ?n }
            }""")
        assert sorted(res["s"]) == ["https://x/a", "https://x/c"]

    def test_unknown_endpoint_raises(self, ray_session):
        import pytest

        local = self._readers()
        with pytest.raises(Exception, match="SERVICE endpoint"):
            local.query_at(1_700_000_100, """
                SELECT ?s WHERE {
                  ?s <https://x/p> ?o .
                  SERVICE <https://svc/nope> { ?o ?q ?n }
                }""")

    def test_service_inside_optional(self, ray_session):
        local = self._readers()
        res = local.query_at(1_700_000_100, """
            SELECT ?s ?n WHERE {
              ?s <https://x/p> ?o .
              OPTIONAL {
                SERVICE <https://svc/remote> { ?o <https://x/name> ?n }
              }
            }""")
        got = {r["s"]: r["n"] for r in res.to_dict("records")}
        assert got == {"https://x/a": "Bee", "https://x/c": None}

    def test_no_endpoints_registered_raises(self, ray_session):
        import pytest

        from rdf_diff_store_ray.query.bgp import eval_bgp
        import pyarrow as pa

        t = pa.table({
            "subj": ["https://x/a"], "pred": ["https://x/p"],
            "obj": ["https://x/b"], "obj_is_literal": [False],
        })
        with pytest.raises(ValueError, match="SERVICE"):
            eval_bgp(t, 'SELECT ?s WHERE { SERVICE <https://svc/r> '
                        '{ ?s ?p ?o } }')


def test_tsv_federation_wire_roundtrip():
    """The SPARQL-TSV writer/parser pair is the federation wire format:
    term KIND survives (IRI vs literal vs bnode), decorated literals
    stay decorated tokens, escaped tabs/newlines/NULs round-trip, and
    unbound cells come back as None — so a remote literal never joins a
    local IRI after the hop."""
    import pandas as pd

    from rdf_diff_store_ray.query.bgp import bindings_tsv, tagged_from_tsv

    df = pd.DataFrame({
        "s": ["https://x/a", "_:b0", "https://x/c"],
        "o": ["plain lit", '"5"^^<http://www.w3.org/2001/XMLSchema#int>',
              "tab\there\nand\x00nul"],
        "n": ["x", None, "y"],
    })
    back = tagged_from_tsv(bindings_tsv(df))
    assert list(back.columns) == ["s", "o", "n"]
    assert back["s"].tolist() == ["Ihttps://x/a", "I_:b0", "Ihttps://x/c"]
    assert back["o"].tolist() == [
        "Lplain lit",
        'L"5"^^<http://www.w3.org/2001/XMLSchema#int>',
        "Ltab\there\nand\x00nul",
    ]
    assert back["n"].tolist() == ["Lx", None, "Ly"]
    # empty result set (header only) and empty body both parse
    assert tagged_from_tsv("?a\n").empty
    assert tagged_from_tsv("").empty


def test_tagged_wire_roundtrip_exact():
    """The engine-to-engine federation wire (tagged_wire/
    tagged_from_wire) round-trips EVERYTHING the tagged representation
    carries: term kind for IRI-shaped plain literals (the case the W3C
    TSV heuristic cannot preserve), decorated literals, NULs/tabs/
    newlines, native BIND-arithmetic numbers, bnodes, unbound cells."""
    import numpy as np
    import pandas as pd

    from rdf_diff_store_ray.query.bgp import tagged_from_wire, tagged_wire

    df = pd.DataFrame({
        "a": pd.Series(["Ihttps://x/i", "Lhttps://x/i", "I_:b0"],
                       dtype=object),
        "b": pd.Series(['L"5"^^<http://www.w3.org/2001/XMLSchema#int>',
                        "Ltab\there\nand\x00nul\\backslash", None],
                       dtype=object),
        "c": pd.Series([np.int64(7), 2.5, None], dtype=object),
    })
    back = tagged_from_wire(tagged_wire(df))
    assert list(back.columns) == ["a", "b", "c"]
    for col in df.columns:
        for want, got in zip(df[col], back[col]):
            if want is None or (isinstance(want, float) and np.isnan(want)):
                assert got is None
            else:
                assert got == want and type(got) is not bool
    # the kind-flip case specifically: literal stays L, IRI stays I
    assert back["a"].tolist()[:2] == ["Ihttps://x/i", "Lhttps://x/i"]
    assert tagged_from_wire("").empty


def test_nul_distinct_bindings_survive_distinct_and_union():
    """Literals differing only past a NUL byte are distinct RDF terms;
    DISTINCT / UNION dedup must keep them apart (regression for the
    pandas multi-column drop_duplicates NUL collapse — see
    shuffle_utils.drop_duplicates_nul_safe)."""
    # same subject: the binding rows differ ONLY in the literal's
    # NUL-tail — exactly the shape pandas' multi-column dedup collapses
    t = _triples_table([
        ("https://e/a", P_FOUNDED, "v\x00w", True),
        ("https://e/a", P_FOUNDED, "v\x00x", True),
        ("https://e/a", P_ACQUIRED, "https://e/b", False),
    ])
    out = eval_bgp(t, f"SELECT DISTINCT ?s ?y WHERE {{ ?s <{P_FOUNDED}> ?y }}")
    assert len(out) == 2
    assert set(out["y"]) == {"v\x00w", "v\x00x"}

    out2 = eval_bgp(t, (
        f"SELECT DISTINCT ?s ?y WHERE {{ "
        f"{{ ?s <{P_FOUNDED}> ?y }} UNION {{ ?s <{P_FOUNDED}> ?y }} }}"
    ))
    assert len(out2) == 2


def test_timezone_tz_builtins():
    """TZ() returns the designator text ("" when absent... wait, absent
    gives ""), TIMEZONE() an xsd:dayTimeDuration (expression error when
    the dateTime carries no designator)."""
    XSD = "http://www.w3.org/2001/XMLSchema#"
    t = _triples_table([
        ("https://e/a", "https://p/w",
         f'"2024-03-01T10:00:00+05:30"^^<{XSD}dateTime>', True),
        ("https://e/b", "https://p/w",
         f'"2024-03-01T10:00:00Z"^^<{XSD}dateTime>', True),
        ("https://e/c", "https://p/w",
         f'"2024-03-01T10:00:00"^^<{XSD}dateTime>', True),
    ])
    out = eval_bgp(t, (
        "SELECT ?s (TZ(?w) AS ?tz) (TIMEZONE(?w) AS ?d) "
        "WHERE { ?s <https://p/w> ?w } ORDER BY ?s"))
    recs = out.to_dict("records")
    assert recs[0]["tz"] == "+05:30"
    assert recs[0]["d"] == f'"PT5H30M"^^<{XSD}dayTimeDuration>'
    assert recs[1]["tz"] == "Z" and recs[1]["d"] == \
        f'"PT0S"^^<{XSD}dayTimeDuration>'
    assert recs[2]["tz"] is None or recs[2]["tz"] == ""
    assert recs[2]["d"] is None  # no designator → expression error


def test_xsd_constructor_casts():
    XSD = "http://www.w3.org/2001/XMLSchema#"
    t = _triples_table([
        ("https://e/a", "https://p/n", "17.9", True),
        ("https://e/b", "https://p/n", "3", True),
        ("https://e/c", "https://p/n", "not-a-number", True),
    ])
    out = eval_bgp(t, (
        "SELECT ?s (xsd:integer(?n) AS ?i) (xsd:double(?n) AS ?f) "
        "(xsd:boolean(?n) AS ?b) WHERE { ?s <https://p/n> ?n } "
        "ORDER BY ?s"))
    recs = out.to_dict("records")
    assert recs[0]["i"] == f'"17"^^<{XSD}integer>'  # truncates toward 0
    assert recs[0]["f"] == f'"17.9"^^<{XSD}double>'
    assert recs[0]["b"] == f'"true"^^<{XSD}boolean>'
    assert recs[1]["i"] == f'"3"^^<{XSD}integer>'
    assert recs[2]["i"] is None and recs[2]["f"] is None  # cast error
    # casts compose with comparison + full-IRI constructor form
    out2 = eval_bgp(t, (
        f"SELECT ?s WHERE {{ ?s <https://p/n> ?n . "
        f"FILTER(<{XSD}double>(?n) > 10) }}"))
    assert list(out2["s"]) == ["https://e/a"]


def test_xsd_temporal_arithmetic():
    """XSD dateTime/dayTimeDuration arithmetic (oxigraph parity):
    dateTime - dateTime -> dayTimeDuration, dateTime ± duration ->
    dateTime, duration ± duration (negatives canonical), and duration
    comparisons order by VALUE, not lexical form."""
    XSD = "http://www.w3.org/2001/XMLSchema#"
    DUR = f"{XSD}dayTimeDuration"
    t = _triples_table([
        ("https://e/a", "https://p/b", f'"2024-03-01T10:00:00Z"^^<{XSD}dateTime>', True),
        ("https://e/a", "https://p/e", f'"2024-03-02T12:30:00Z"^^<{XSD}dateTime>', True),
        ("https://e/b", "https://p/b", f'"2024-03-01T00:00:00Z"^^<{XSD}dateTime>', True),
        ("https://e/b", "https://p/e", f'"2024-03-01T00:00:45.5Z"^^<{XSD}dateTime>', True),
    ])
    out = eval_bgp(t, (
        'SELECT ?s ((?e - ?b) AS ?dur) '
        f'((?b + "P1D"^^<{DUR}>) AS ?next) '
        "WHERE { ?s <https://p/b> ?b . ?s <https://p/e> ?e } ORDER BY ?s"))
    recs = out.to_dict("records")
    assert recs[0]["dur"] == f'"P1DT2H30M"^^<{DUR}>'
    assert recs[0]["next"] == f'"2024-03-02T10:00:00Z"^^<{XSD}dateTime>'
    assert recs[1]["dur"] == f'"PT45.5S"^^<{DUR}>'
    # duration ordering is by value ("P1D" > "PT2H" despite "P1" < "PT")
    out2 = eval_bgp(t, (
        "SELECT ?s WHERE { ?s <https://p/b> ?b . ?s <https://p/e> ?e . "
        f'FILTER((?e - ?b) > "PT1H"^^<{DUR}>) }}'))
    assert list(out2["s"]) == ["https://e/a"]
    # duration - duration, negative canonical form; + commutes with a
    # dateTime on the right
    out3 = eval_bgp(t, (
        f'SELECT ?s (("PT1H"^^<{DUR}> - "PT90M"^^<{DUR}>) AS ?d) '
        f'(("P1D"^^<{DUR}> + ?b) AS ?n) '
        "WHERE { ?s <https://p/b> ?b } ORDER BY ?s"))
    recs3 = out3.to_dict("records")
    assert recs3[0]["d"] == f'"-PT30M"^^<{DUR}>'
    assert recs3[0]["n"] == f'"2024-03-02T10:00:00Z"^^<{XSD}dateTime>'
    # invalid duration lexicals ("P"/"PT" have no component) error out
    out4 = eval_bgp(t, (
        f'SELECT ?s ((?b + "P"^^<{DUR}>) AS ?bad) '
        "WHERE { ?s <https://p/b> ?b } ORDER BY ?s"))
    assert out4["bad"].isna().all()


def test_exists_inside_expressions():
    """EXISTS as an operand of ||/&&/IF — not just the clause form."""
    t = _triples_table([
        ("https://e/a", "https://p/n", "1", True),
        ("https://e/b", "https://p/n", "2", True),
        ("https://e/a", "https://p/name", "x", True),
    ])
    out = eval_bgp(t, (
        "SELECT ?s WHERE { ?s <https://p/n> ?n . "
        "FILTER(?n > 100 || EXISTS { ?s <https://p/name> ?m }) }"))
    assert list(out["s"]) == ["https://e/a"]
    out2 = eval_bgp(t, (
        'SELECT ?s (IF(NOT EXISTS { ?s <https://p/name> ?m }, '
        '"anon", "named") AS ?k) '
        "WHERE { ?s <https://p/n> ?n } ORDER BY ?s"))
    assert out2.to_dict("records") == [
        {"s": "https://e/a", "k": "named"},
        {"s": "https://e/b", "k": "anon"},
    ]


def test_order_by_expressions():
    t = _triples_table([
        ("https://e/a", "https://p/name", "a-very-long-name", True),
        ("https://e/b", "https://p/name", "ab", True),
        ("https://e/c", "https://p/name", "medium", True),
        ("https://e/a", "https://p/n", "5", True),
        ("https://e/b", "https://p/n", "40", True),
    ])
    out = eval_bgp(t, (
        "SELECT ?s WHERE { ?s <https://p/name> ?m } "
        "ORDER BY DESC(STRLEN(?m))"))
    assert list(out["s"]) == ["https://e/a", "https://e/c", "https://e/b"]
    out2 = eval_bgp(t, (
        "SELECT ?s ?n WHERE { ?s <https://p/n> ?n } "
        "ORDER BY (0 - xsd:double(?n))"))
    assert list(out2["s"]) == ["https://e/b", "https://e/a"]
    # computed keys never leak into SELECT *
    out3 = eval_bgp(t, (
        "SELECT * WHERE { ?s <https://p/n> ?n } "
        "ORDER BY DESC(STRLEN(?n))"))
    assert sorted(out3.columns) == ["n", "s"]
    # ...and the subquery form applies the computed key before LIMIT
    # (all-numeric keys sort by value, the main-path rule)
    out4 = eval_bgp(t, (
        "SELECT ?s WHERE { { SELECT ?s ?m WHERE "
        "{ ?s <https://p/name> ?m } "
        "ORDER BY DESC(STRLEN(?m)) LIMIT 2 } }"))
    assert sorted(out4["s"]) == ["https://e/a", "https://e/c"]


def test_tz_and_accessors_on_mixed_precision_offsets():
    """Mixed-precision / mixed-offset dateTime columns must not coerce
    valid rows to NaT (pandas first-row format inference), and
    accessors return LEXICAL parts — not UTC-normalized ones."""
    XSD = "http://www.w3.org/2001/XMLSchema#"
    t = _triples_table([
        ("https://e/a", "https://p/w",
         f'"2024-03-01T10:00:00Z"^^<{XSD}dateTime>', True),
        ("https://e/b", "https://p/w",
         f'"2024-03-01T23:30:00.5+05:30"^^<{XSD}dateTime>', True),
        ("https://e/c", "https://p/w",
         f'"2024-03-01T07:00:00"^^<{XSD}dateTime>', True),
    ])
    out = eval_bgp(t, (
        "SELECT ?s (TZ(?w) AS ?tz) (HOURS(?w) AS ?h) "
        "(xsd:dateTime(?w) AS ?dt) "
        "WHERE { ?s <https://p/w> ?w } ORDER BY ?s"))
    recs = out.to_dict("records")
    assert recs[0]["tz"] == "Z"
    hours = [r["h"] for r in recs]
    assert "10" in str(hours[0])
    # lexical hours, not UTC-normalized (23:30+05:30 stays 23)
    assert all(h is not None for h in hours)
    assert "23" in str(hours[1])
    assert "7" in str(hours[2])
    # the cast keeps each input's own designator
    assert str(recs[0]["dt"]).startswith('"2024-03-01T10:00:00Z"')
    assert "+05:30" in str(recs[1]["dt"])
    assert str(recs[2]["dt"]).startswith('"2024-03-01T07:00:00"')


def test_expression_exists_is_thread_isolated():
    """Expression-level EXISTS keeps its group-evaluator context in
    thread-local storage: concurrent evaluations on DIFFERENT stores
    must never read each other's bindings source (the server's
    ThreadingHTTPServer shares one module)."""
    import threading

    XSD = "http://www.w3.org/2001/XMLSchema#"
    t_a = _triples_table([
        ("https://e/x", "https://p/q", "1", True),
        ("https://e/x", "https://p/mark", "yes", True),
    ])
    t_b = _triples_table([
        ("https://e/y", "https://p/q", "1", True),
        # no mark triples in store B
    ])
    q = ("SELECT ?s (IF(EXISTS { ?s <https://p/mark> ?m }, 1, 0) AS ?f) "
         "WHERE { ?s <https://p/q> ?v }")
    errors = []

    def run(table, want):
        try:
            for _ in range(25):
                out = eval_bgp(table, q)
                got = str(out.to_dict("records")[0]["f"])
                if f'"{want}"' not in got:
                    errors.append((want, got))
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e))

    th_a = threading.Thread(target=run, args=(t_a, 1))
    th_b = threading.Thread(target=run, args=(t_b, 0))
    th_a.start(); th_b.start(); th_a.join(); th_b.join()
    assert not errors, errors[:3]
