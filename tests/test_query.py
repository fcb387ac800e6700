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
