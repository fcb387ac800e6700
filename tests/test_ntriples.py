"""Canonical N-Triples layer: round-trips, escaping, filename encoding."""

import pytest

from rdf_diff_store_ray import ntriples


def test_serialize_sorted_deduped():
    trips = [
        ("https://e/b", "https://p/x", "lit", True),
        ("https://e/a", "https://p/x", "https://e/c", False),
        ("https://e/b", "https://p/x", "lit", True),  # dup folds away
    ]
    text = ntriples.serialize(trips)
    lines = text.strip().split("\n")
    assert len(lines) == 2
    assert lines == sorted(lines)
    assert text.endswith("\n")


def test_empty_graph_is_empty_string():
    assert ntriples.serialize([]) == ""
    assert ntriples.parse("") == []


def test_roundtrip_with_hostile_literals():
    trips = [
        ("https://e/a", "https://p/x", 'quote " backslash \\ nl \n tab \t', True),
        ("https://e/a", "https://p/y", "plain", True),
        ("https://e/a", "https://p/z", "https://e/obj", False),
    ]
    text = ntriples.serialize(trips)
    assert set(ntriples.parse(text)) == set(trips)


def test_reserialization_is_byte_identical():
    trips = [("https://e/a", "https://p/x", "v1", True)]
    t1 = ntriples.serialize(trips)
    t2 = ntriples.serialize(ntriples.parse(t1))
    assert t1 == t2


def test_digest_stability():
    assert ntriples.sha256_text("abc") == ntriples.sha256_text("abc")
    assert ntriples.sha256_text("abc") != ntriples.sha256_text("abd")
    assert len(ntriples.sha256_text("abc")) == 32


def test_filename_encoding_hostile_id():
    # the reference's test id with special chars (tests/integration_test.rs:22)
    gid = "<#/(%¤=:"
    name = ntriples.graph_filename(gid)
    assert name.endswith(".ttl")
    assert "/" not in name[:-4] and "+" not in name[:-4]
    assert ntriples.graph_id_from_filename(name) == gid


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        ntriples.parse("this is not ntriples\n")


def test_bnode_cycle_canonicalization_order_invariant():
    """Automorphic blank-node cycles (all nodes WL-tied) must serialize
    byte-identically under every statement reordering and renaming —
    individualization-refinement, not an input-order counter."""
    import itertools

    from rdf_diff_store_ray.ntriples import parse, serialize

    cyc = [("_:a", "p", "_:b", False), ("_:b", "p", "_:c", False),
           ("_:c", "p", "_:d", False), ("_:d", "p", "_:a", False)]
    texts = {serialize(list(perm)) for perm in itertools.permutations(cyc)}
    assert len(texts) == 1
    t = texts.pop()
    assert serialize(parse(t)) == t
    ren = {"_:a": "_:z", "_:b": "_:q", "_:c": "_:m", "_:d": "_:k"}
    assert serialize(
        [(ren[s], p, ren[o], lit) for (s, p, o, lit) in cyc]
    ) == t
