"""Turtle ingestion: prefix expansion, abbreviations, literal shorthands,
and interop with the canonical store (SURVEY gap: the reference's graphs
are Turtle, src/query.rs:148-169)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_diff_store_ray.ntriples import parse, serialize
from rdf_diff_store_ray.turtle import parse_turtle, turtle_to_canonical

XSD = "http://www.w3.org/2001/XMLSchema#"

DOC = """
@prefix ex: <https://kg.example/entity/> .
@prefix prop: <https://kg.example/prop/> .
@prefix xsd: <{xsd}> .
# comment line
ex:E1 a <https://kg.example/class/Org> ;
    prop:acquired ex:E2, ex:E3 ;
    prop:label "Alpha Corp"@en ;
    prop:foundedIn "1999"^^xsd:integer ;
    prop:employees 250 ;
    prop:rating 4.5 ;
    prop:active true .
ex:E2 prop:label "caf\\u00e9" .
""".format(xsd=XSD)


def test_prefix_expansion_and_abbreviations():
    triples = parse_turtle(DOC)
    assert (
        "https://kg.example/entity/E1",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "https://kg.example/class/Org",
        False,
    ) in triples
    acq = [t for t in triples if t[1] == "https://kg.example/prop/acquired"]
    assert {t[2] for t in acq} == {
        "https://kg.example/entity/E2",
        "https://kg.example/entity/E3",
    }


def test_literal_shorthands():
    objs = {t[1].rsplit("/", 1)[-1]: t[2] for t in parse_turtle(DOC)}
    assert objs["label"] in ('"Alpha Corp"@en', "café")  # two label triples
    assert objs["foundedIn"] == f'"1999"^^<{XSD}integer>'
    assert objs["employees"] == f'"250"^^<{XSD}integer>'
    assert objs["rating"] == f'"4.5"^^<{XSD}decimal>'
    assert objs["active"] == f'"true"^^<{XSD}boolean>'


def test_unicode_escape():
    t = [x for x in parse_turtle(DOC) if x[0].endswith("E2")]
    assert t == [("https://kg.example/entity/E2",
                  "https://kg.example/prop/label", "café", True)]


def test_xsd_string_is_plain():
    doc = f'<https://s> <https://p> "x"^^<{XSD}string> .'
    assert parse_turtle(doc) == [("https://s", "https://p", "x", True)]


def test_sparql_style_prefix_and_base():
    doc = """
    PREFIX ex: <https://kg.example/>
    BASE <https://base.example/>
    ex:a ex:p <rel> .
    """
    assert parse_turtle(doc) == [
        ("https://kg.example/a", "https://kg.example/p",
         "https://base.example/rel", False)
    ]


def test_blank_node_labels_parse_and_canonicalize():
    """``_:label`` terms parse; labels are rewritten to content-addressed
    canonical names, so renaming every label yields identical triples."""
    a = parse_turtle('_:x <https://p> "v" . <https://s> <https://q> _:x .')
    b = parse_turtle('_:zz <https://p> "v" . <https://s> <https://q> _:zz .')
    assert a == b
    (s0, _, o0, lit0), (s1, _, o1, _) = sorted(a)
    blanks = [t for t in (s0, o0, s1, o1) if t.startswith("_:")]
    assert blanks and all(t.startswith("_:c") for t in blanks)


def test_anonymous_property_lists_nested():
    """``[ ... ]`` nodes — the DCAT-catalog shape — desugar to fresh
    blank nodes; nesting works; statement-order renaming is invariant."""
    doc = """
    @prefix d: <https://d/> .
    d:cat d:contact [ d:name "Ann" ; d:addr [ d:city "Oslo" ] ] .
    """
    t = parse_turtle(doc)
    assert len(t) == 4
    contact = [o for (_, p, o, _) in t if p == "https://d/contact"][0]
    assert contact.startswith("_:c")
    names = {(p, o) for (s, p, o, _) in t if s == contact}
    assert ("https://d/name", "Ann") in names
    city = [o for (s, p, o, _) in t if p == "https://d/city"]
    assert city == ["Oslo"]
    # subject-position bare property list
    t2 = parse_turtle('[ <https://p> "v" ] .')
    assert t2 == [(t2[0][0], "https://p", "v", True)]
    assert t2[0][0].startswith("_:c")


def test_collections_desugar_to_first_rest():
    from rdf_diff_store_ray.turtle import RDF_FIRST, RDF_NIL, RDF_REST

    t = parse_turtle("<https://s> <https://p> (1 2) .")
    firsts = [(s, o) for (s, p, o, _) in t if p == RDF_FIRST]
    rests = [(s, o) for (s, p, o, _) in t if p == RDF_REST]
    assert len(firsts) == 2 and len(rests) == 2
    assert any(o == RDF_NIL for (_, o) in rests)
    assert parse_turtle("<https://s> <https://p> () .") == [
        ("https://s", "https://p", RDF_NIL, False)
    ]


def test_blank_node_ntriples_roundtrip_digest_stable():
    """Turtle with nested anonymous nodes → canonical NT → parse →
    re-serialize is a byte-level fixpoint (the VERDICT r2 'done' bar)."""
    doc = """
    @prefix d: <https://d/> .
    d:cat d:dist [ d:format "csv" ; d:of [ d:title "t" ] ], [ d:format "json" ] .
    """
    canon = turtle_to_canonical(doc)
    assert "_:c" in canon
    assert serialize(parse(canon)) == canon
    assert turtle_to_canonical(canon) == canon


def test_bad_language_tags_raise():
    for bad in ('"x"@e1', '"x"@', '"x"@-en', '"x"@en-'):
        with pytest.raises(ValueError, match="language tag"):
            parse_turtle(f"<https://s> <https://p> {bad} .")


def test_scheme_only_iris_not_base_prefixed():
    doc = """
    BASE <https://base.example/dir/>
    <mailto:a@b> <tel:+1-555> <rel> .
    """
    assert parse_turtle(doc) == [
        ("mailto:a@b", "tel:+1-555", "https://base.example/dir/rel", False)
    ]


def test_undefined_prefix_raises():
    with pytest.raises(ValueError, match="undefined prefix"):
        parse_turtle("nope:a <https://p> <https://o> .")


def test_canonicalization_fixpoint():
    canon = turtle_to_canonical(DOC)
    assert turtle_to_canonical(canon) == canon
    assert canon.endswith("\n") and canon == serialize(parse(canon))


_plain_lit = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters='"\\'),
    max_size=12,
)


@given(
    triples=st.lists(
        st.tuples(
            st.sampled_from(["https://s/1", "https://s/2"]),
            st.sampled_from(["https://p/1", "https://p/2"]),
            st.one_of(
                st.tuples(st.sampled_from(["https://o/1", "https://o/2"]),
                          st.just(False)),
                st.tuples(_plain_lit, st.just(True)),
            ),
        ),
        max_size=6,
    )
)
@settings(max_examples=100, deadline=None)
def test_canonical_ntriples_is_valid_turtle(triples):
    """Every canonical N-Triples document parses identically as Turtle."""
    doc = serialize((s, p, o, lit) for (s, p, (o, lit)) in triples)
    assert sorted(parse_turtle(doc)) == sorted(parse(doc))


def test_read_turtle_source(ray_session, tmp_path):
    """.ttl files → columnar triples Dataset with decoded graph ids."""
    from rdf_diff_store_ray.ntriples import graph_filename
    from rdf_diff_store_ray.sources import read_turtle

    doc1 = """@prefix p: <https://p/> .
<https://s/a> p:x "v" ; p:y 7 ."""
    doc2 = '<https://s/b> <https://p/x> "w"@en .'
    (tmp_path / graph_filename("graph one")).write_text(doc1, encoding="utf-8")
    (tmp_path / graph_filename("graph/two")).write_text(doc2, encoding="utf-8")
    rows = sorted(
        read_turtle(str(tmp_path)).take_all(),
        key=lambda r: (r["graph_id"], r["pred"]),
    )
    assert [r["graph_id"] for r in rows] == ["graph one", "graph one", "graph/two"]
    assert rows[0]["obj"] == "v" and rows[0]["obj_is_literal"]
    assert rows[1]["obj"] == f'"7"^^<{XSD}integer>'
    assert rows[2]["obj"] == '"w"@en'


def test_turtle_into_store_and_query(ray_session, tmp_path):
    """Reference-style .ttl content appended into a store, then queried
    back with a typed FILTER — full ingestion interop."""
    from rdf_diff_store_ray.query.bgp import DiffStoreReader
    from rdf_diff_store_ray.state.append import append_graphs, init_log
    from rdf_diff_store_ray.turtle import parse_turtle

    store = init_log(str(tmp_path / "deltas"), num_partitions=2)
    doc = """@prefix p: <https://p/> .
<https://s/a> p:size 5 .
<https://s/b> p:size 12 ."""
    append_graphs(store, {"g": parse_turtle(doc)}, 1_700_000_000)
    import glob
    import os

    import pyarrow.dataset as pads

    dt = pads.dataset(
        sorted(glob.glob(os.path.join(store, "partition=*", "*.parquet")))
    ).to_table()
    out = DiffStoreReader(dt).query_at(
        1_700_000_001, "?s <https://p/size> ?n . FILTER(?n > 10)"
    )
    assert list(out["s"]) == ["https://s/b"]


def test_kg_turtle_ingest_digests_match(ray_session):
    """Registry entry: KG → Turtle (with @prefix) → read_turtle →
    canonical digests identical for every graph."""
    from rdf_diff_store_ray.pipelines.queries import kg_turtle_ingest

    row = kg_turtle_ingest("/root/testdata/sf0.001").to_pydict()
    assert row["graphs"] == row["roundtripped"] == row["digest_matches"]
    assert row["graphs"][0] > 0


def test_serialize_turtle_roundtrip_fixed():
    """serialize_turtle is the inverse of parse_turtle: prettified output
    (prefix headers, 'a', ';' grouping) parses back to the same canonical
    bytes, including blank nodes and typed/lang literals."""
    from rdf_diff_store_ray.turtle import RDF_TYPE, serialize_turtle

    triples = [
        ("https://d/cat", RDF_TYPE, "https://d/Catalog", False),
        ("https://d/cat", "https://d/title", "Tittel æøå", True),
        ("https://d/cat", "https://d/size", '"5"^^<http://www.w3.org/2001/XMLSchema#integer>', True),
        ("https://d/cat", "https://d/label", '"x"@en', True),
        ("https://d/cat", "https://d/contact", "_:c1", False),
        ("_:c1", "https://d/name", 'quote " and \\ slash', True),
        ("https://other/x", "https://d/rel", "https://d/cat", False),
    ]
    ttl = serialize_turtle(triples, {"d": "https://d/"})
    assert "@prefix d: <https://d/> ." in ttl
    assert " a d:Catalog" in ttl and ";" in ttl
    assert turtle_to_canonical(ttl) == serialize(triples)


@given(
    st.lists(
        st.one_of(
            st.tuples(
                st.sampled_from(["https://d/a", "https://d/b", "_:n1", "_:n2"]),
                st.sampled_from(["https://d/p", "https://d/q",
                                 "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"]),
                st.sampled_from(["https://d/a", "https://other/z x", "_:n1", "_:n2"]),
                st.just(False),
            ),
            st.tuples(
                st.sampled_from(["https://d/a", "_:n1"]),
                st.sampled_from(["https://d/p", "https://d/q"]),
                st.sampled_from(["v", "tab\there", 'q"uote', '"5"^^<https://dt>',
                                 '"x"@en-GB', "5", "true"]),
                st.just(True),
            ),
        ),
        max_size=10,
    )
)
@settings(max_examples=150, deadline=None)
def test_serialize_turtle_roundtrip_property(triples):
    """serialize → parse → canonical NT equals the direct canonical NT
    for arbitrary mixes of IRIs, blank nodes and hostile literals."""
    from rdf_diff_store_ray.turtle import serialize_turtle

    ttl = serialize_turtle(triples, {"d": "https://d/"})
    assert turtle_to_canonical(ttl) == serialize(triples)
