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
