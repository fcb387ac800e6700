"""N-Triples source/sink round-trip (the reference's one-file-per-graph
store layout, ``/root/reference/src/graphs.rs:42-45,114-135``)."""

import os

import pyarrow as pa
import pytest


@pytest.fixture()
def triples_table():
    return pa.table(
        {
            "subj": pa.array(["https://x/e1", "https://x/e2", "https://x/e1"]),
            "pred": pa.array(["https://x/p", "https://x/p", "https://x/q"]),
            "obj": pa.array(["https://x/e2", "lit \"quoted\"\nline", "1999"]),
            "obj_is_literal": pa.array([False, True, True]),
            "graph_id": pa.array(["<#/(%¤=:", "<#/(%¤=:", "https://g2"]),
        }
    )


def test_write_read_roundtrip(ray_session, triples_table, tmp_path):
    import ray.data as rd

    from rdf_diff_store_ray.sources import read_ntriples, write_ntriples

    out = str(tmp_path / "store")
    manifest = write_ntriples(rd.from_arrow(triples_table), out).take_all()
    assert len(manifest) == 2  # one file per graph
    files = sorted(os.listdir(out))
    assert all(f.endswith(".ttl") for f in files)

    back = read_ntriples(out)
    rows = sorted(
        (r["graph_id"], r["subj"], r["pred"], r["obj"], r["obj_is_literal"])
        for r in back.take_all()
    )
    want = sorted(
        (g, s, p, o, l)
        for s, p, o, l, g in zip(*[triples_table[c].to_pylist()
                                   for c in triples_table.column_names])
    )
    assert rows == want  # hostile graph ids and escaped literals round-trip


def test_hostile_graph_id_filename(ray_session, triples_table, tmp_path):
    from rdf_diff_store_ray.ntriples import graph_filename, graph_id_from_filename

    gid = "<#/(%¤=:"
    assert graph_id_from_filename(graph_filename(gid)) == gid


def test_nquads_codec_roundtrip():
    from rdf_diff_store_ray.nquads import (
        graph_id_from_iri,
        graph_iri,
        parse_nquads,
        serialize_nquads,
    )

    hostile = "<#/(%¤=:"  # the reference's hostile graph id
    quads = [
        ("https://g/1", "https://x/a", "https://x/p", "v 1", True),
        ("https://g/1", "https://x/a", "https://x/q", "https://x/b", False),
        (hostile, "https://x/c", "https://x/p",
         '"5"^^<http://www.w3.org/2001/XMLSchema#integer>', True),
    ]
    text = serialize_nquads(quads)
    assert text.endswith("\n") and len(text.splitlines()) == 3
    assert sorted(parse_nquads(text)) == sorted(quads)
    # hostile ids go through the graph: encoding, clean IRIs untouched
    assert graph_iri("https://g/1") == "https://g/1"
    enc = graph_iri(hostile)
    assert enc.startswith("graph:") and " " not in enc and "<" not in enc
    assert graph_id_from_iri(enc) == hostile
    # dedup + sort = canonical bytes
    assert serialize_nquads(quads + quads) == text
    assert serialize_nquads([]) == ""


def test_write_read_nquads_distributed(ray_session, tmp_path):
    import ray.data as rd

    from rdf_diff_store_ray.sources import read_nquads, write_nquads

    quads = [
        (f"https://g/{i % 5}", f"https://x/s{i}", "https://x/p",
         f"v{i}", True)
        for i in range(200)
    ]
    import pyarrow as pa

    ds = rd.from_arrow(pa.table({
        "graph_id": [q[0] for q in quads],
        "subj": [q[1] for q in quads],
        "pred": [q[2] for q in quads],
        "obj": [q[3] for q in quads],
        "obj_is_literal": [q[4] for q in quads],
    }))
    out = str(tmp_path / "nq")
    manifest = write_nquads(ds, out, num_partitions=8).to_pandas()
    assert manifest["n_quads"].sum() == 200
    back = read_nquads(out)
    rows = back.to_pandas()
    got = sorted(zip(rows["graph_id"], rows["subj"], rows["pred"],
                     rows["obj"], rows["obj_is_literal"]))
    assert got == sorted(quads)


def test_nquads_codec_property():
    """serialize ∘ parse is a fixpoint on random quads, blank nodes and
    decorated literals included."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rdf_diff_store_ray.nquads import parse_nquads, serialize_nquads

    xsd = "http://www.w3.org/2001/XMLSchema#integer"
    graphs = st.sampled_from(
        ["https://g/1", "hostile id <>%", "graph:prefixed", "urn:x"]
    )
    subjects = st.sampled_from(["https://x/a", "_:b0", "_:b1"])
    objs = st.one_of(
        st.tuples(st.sampled_from(["https://x/b", "_:b0"]), st.just(False)),
        st.tuples(st.sampled_from(
            ["plain value", 'quote " inside', f'"7"^^<{xsd}>', '"x"@en-US']
        ), st.just(True)),
    )
    quad = st.tuples(graphs, subjects, st.just("https://x/p"), objs)

    @given(st.lists(quad, max_size=12))
    @settings(max_examples=200, deadline=None)
    def check(qs):
        quads = [(g, s, p, o, lit) for (g, s, p, (o, lit)) in qs]
        text = serialize_nquads(quads)
        back = parse_nquads(text)
        assert sorted(set(back)) == sorted(set(quads))
        assert serialize_nquads(back) == text  # fixpoint

    check()
