"""Property test: the hash-join BGP evaluator must agree with a naive
backtracking evaluator on random small graphs and random patterns."""

import itertools

import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

_ENTS = ["e1", "e2", "e3"]
_PREDS = ["p1", "p2"]
_LITS = ["1999", "x"]

_triple = st.tuples(
    st.sampled_from(_ENTS),
    st.sampled_from(_PREDS),
    st.one_of(
        st.tuples(st.sampled_from(_ENTS), st.just(False)),
        st.tuples(st.sampled_from(_LITS), st.just(True)),
    ),
)

_VARS = ["?s", "?o", "?m"]


def _term(draw_entity, draw_var):
    return st.one_of(
        st.sampled_from(_VARS),
        st.sampled_from([f"<{e}>" for e in _ENTS]),
        st.sampled_from([f'"{v}"' for v in _LITS]),
    )


_pattern = st.tuples(
    st.sampled_from(_VARS + [f"<{e}>" for e in _ENTS]),
    st.sampled_from(_VARS + [f"<{p}>" for p in _PREDS]),
    st.sampled_from(_VARS + [f"<{e}>" for e in _ENTS] + [f'"{v}"' for v in _LITS]),
)


def _naive_eval(triples, patterns):
    """Enumerate variable bindings by brute force over all assignments."""
    results = set()

    def match(pattern, triple, binding):
        (s, p, o, lit) = triple
        # a variable binds a TERM (value + literal flag), not a string
        vals = {"subj": (s, False), "pred": (p, False), "obj": (o, lit)}
        b = dict(binding)
        for pos, term in zip(("subj", "pred", "obj"), pattern):
            val = vals[pos]
            if term.startswith("?"):
                var = term[1:]
                if var in b and b[var] != val:
                    return None
                b[var] = val
            elif term.startswith("<"):
                if val != (term[1:-1], False):
                    return None
            else:  # literal
                if pos != "obj" or val != (term[1:-1], True):
                    return None
        return b

    def rec(i, binding):
        if i == len(patterns):
            vars_sorted = tuple(sorted(binding))
            results.add(tuple(binding[v][0] for v in vars_sorted))
            return
        for t in triples:
            b = match(patterns[i], t, binding)
            if b is not None:
                rec(i + 1, b)

    rec(0, {})
    return results


@given(
    triples=st.lists(_triple, min_size=0, max_size=8),
    pats=st.lists(_pattern, min_size=1, max_size=2),
)
@settings(max_examples=300, deadline=None)
def test_eval_bgp_matches_naive(triples, pats):
    from rdf_diff_store_ray.query.bgp import eval_bgp

    rows = [(s, p, o, lit) for (s, p, (o, lit)) in triples]
    table = pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred": pa.array([r[1] for r in rows], pa.string()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
            "obj_is_literal": pa.array([r[3] for r in rows], pa.bool_()),
        }
    )
    query = " . ".join(" ".join(p) for p in pats)
    got_df = eval_bgp(table, query)
    got = {tuple(r[c] for c in sorted(got_df.columns)) for _, r in got_df.iterrows()}
    want = _naive_eval(rows, pats)
    # a pattern with no variables yields zero columns; both sides then
    # degenerate to "any match?" — compare non-emptiness instead
    if not any(t.startswith("?") for p in pats for t in p):
        assert bool(len(got_df)) == bool(want)
    else:
        assert got == want, (query, rows)
