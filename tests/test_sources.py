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
