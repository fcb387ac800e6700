"""Reference-oracle semantics: ports of the reference's integration tests
(``/root/reference/tests/integration_test.rs``) onto the dict diff store."""

from rdf_diff_store_ray import ntriples
from rdf_diff_store_ray.oracle import RefDiffStore

G_A = ntriples.serialize([("https://e/a", "https://p/x", "A", True)])
G_A2 = ntriples.serialize([("https://e/a", "https://p/x", "A2", True)])
G_B = ntriples.serialize([("https://e/b", "https://p/x", "B", True)])


def test_timestamps_scenario():
    """Port of `timestamps` (integration_test.rs:16-94): store A, later B;
    read state at post (2 graphs), pre (0), mid (1) — deliberately queried
    out of order to prove time travel both directions."""
    s = RefDiffStore()
    t_a, t_b = 1000, 2000
    s.store("graph-a", t_a, G_A)
    s.store("graph-b", t_b, G_B)
    post, pre, mid = 3000, 500, 1500
    assert len(s.checkout(post)) == 2  # post first
    assert len(s.checkout(pre)) == 0  # then jump back before history
    assert len(s.checkout(mid)) == 1  # then mid
    assert s.checkout(mid) == {"graph-a": G_A}


def test_no_diff_scenario():
    """Port of `test_no_diff` (integration_test.rs:96-125): identical
    content stored twice → exactly one version."""
    s = RefDiffStore()
    assert s.store("g", 1000, G_A) is True
    assert s.store("g", 2000, G_A) is False  # suppressed
    assert len(s.version_times()) == 1
    assert s.store("g", 3000, G_A2) is True
    assert len(s.version_times()) == 2


def test_delete_is_first_class_delta():
    s = RefDiffStore()
    s.store("g", 1000, G_A)
    assert s.delete("g", 2000) is True
    assert s.checkout(1500) == {"g": G_A}  # present before delete
    assert s.checkout(2500) == {}  # absent at/after delete
    assert s.delete("g", 3000) is False  # already absent
    # reappear after delete: not suppressed even with identical content
    assert s.store("g", 4000, G_A) is True
    assert s.checkout(5000) == {"g": G_A}


def test_pre_history_is_empty_state():
    """Err(0) semantics (git.rs:157-159): ts before the first commit."""
    s = RefDiffStore()
    s.store("g", 1000, G_A)
    assert s.as_of_time(999) is None
    assert s.checkout(999) == {}


def test_metadata_min_max():
    s = RefDiffStore()
    assert s.metadata() == (None, None)
    s.store("a", 1200, G_A)
    s.store("b", 800, G_B)
    assert s.metadata() == (800, 1200)


def test_combined_graph_union_dedup():
    s = RefDiffStore()
    shared = ("https://e/s", "https://p/x", "dup", True)
    s.store("a", 1000, ntriples.serialize([shared]))
    s.store("b", 1000, ntriples.serialize([shared, ("https://e/t", "https://p/x", "u", True)]))
    combined = s.combined_graph(1500)
    assert combined.count("\n") == 2  # duplicate triple folded once
