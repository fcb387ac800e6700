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


# ---------------------------------------------------------------------------
# Extended grammar: FILTER / OPTIONAL / typed + lang-tagged literals
# ---------------------------------------------------------------------------

_XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
_DECORATED = [f'"5"^^<{_XSD_INT}>', f'"7"^^<{_XSD_INT}>', '"x"@en']
_ALL_LITS = _LITS + _DECORATED

_triple_ext = st.tuples(
    st.sampled_from(_ENTS),
    st.sampled_from(_PREDS),
    st.one_of(
        st.tuples(st.sampled_from(_ENTS), st.just(False)),
        st.tuples(st.sampled_from(_ALL_LITS), st.just(True)),
    ),
)

_pattern_ext = st.tuples(
    st.sampled_from(_VARS + [f"<{e}>" for e in _ENTS]),
    st.sampled_from(_VARS + [f"<{p}>" for p in _PREDS]),
    st.sampled_from(
        _VARS
        + [f"<{e}>" for e in _ENTS]
        + [f'"{v}"' for v in _LITS]
        + _DECORATED
    ),
)

_operand = st.sampled_from(
    _VARS + [f"<{_ENTS[0]}>", f'"{_LITS[0]}"', _DECORATED[0], "5", "1999"]
)
_filter = st.tuples(_operand, st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
                    _operand)


def _nv_lexical(val, lit):
    if lit and val.startswith('"'):
        j = val.rindex('"')
        return val[1:j]
    return val


def _nv_numeric(val, lit):
    if not lit:
        return None
    j = val.rindex('"') if val.startswith('"') else -1
    lex, suffix = (val[1:j], val[j + 1:]) if j > 0 else (val, "")
    if suffix.startswith("@"):
        return None
    if suffix.startswith("^^<") and "XMLSchema#int" not in suffix:
        return None
    try:
        return float(lex)
    except ValueError:
        return None


def _nv_operand(tok, binding):
    if tok.startswith("?"):
        return binding.get(tok[1:])
    if tok.startswith("<"):
        return (tok[1:-1], False)
    if tok.startswith('"'):
        return (tok, True) if not tok.endswith('"') or "^^" in tok or "@" in tok[tok.rindex('"'):] else (tok[1:-1], True)
    return ("__num__", float(tok))


def _nv_filter_true(f, binding):
    lt, op, rt = f
    lhs, rhs = _nv_operand(lt, binding), _nv_operand(rt, binding)
    if lhs is None or rhs is None:
        return False

    def num(x):
        if x[0] == "__num__":
            return x[1]
        return _nv_numeric(x[0], x[1])

    ln, rn = num(lhs), num(rhs)
    if ln is not None and rn is not None:
        a, b = ln, rn
    elif op in ("=", "!="):
        if lhs[0] == "__num__" or rhs[0] == "__num__":
            return False
        a, b = lhs, rhs
    else:
        if lhs[0] == "__num__" or rhs[0] == "__num__":
            return False
        a, b = _nv_lexical(*lhs), _nv_lexical(*rhs)
    return {"=": a == b, "!=": a != b, "<": a < b,
            "<=": a <= b, ">": a > b, ">=": a >= b}[op]


def _nv_extensions(triples, patterns, seed):
    """All bindings extending ``seed`` over the pattern conjunction."""
    out = []

    def match(pattern, triple, binding):
        (s, p, o, lit) = triple
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
            else:  # plain or decorated literal constant
                want = (term, True) if ("^^" in term or term.rindex('"') != len(term) - 1) else (term[1:-1], True)
                if pos != "obj" or val != want:
                    return None
        return b

    def rec(i, binding):
        if i == len(patterns):
            out.append(binding)
            return
        for t in triples:
            b = match(patterns[i], t, binding)
            if b is not None:
                rec(i + 1, b)

    rec(0, dict(seed))
    return out


@given(
    triples=st.lists(_triple_ext, min_size=0, max_size=8),
    pats=st.lists(_pattern_ext, min_size=1, max_size=2),
    opt=st.lists(_pattern_ext, min_size=0, max_size=1),
    filters=st.lists(_filter, min_size=0, max_size=2),
)
@settings(max_examples=250, deadline=None)
def test_eval_extended_matches_naive(triples, pats, opt, filters):
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
    parts = [" ".join(p) for p in pats]
    if opt:
        parts.append("OPTIONAL { " + " . ".join(" ".join(p) for p in opt) + " }")
    parts.extend(f"FILTER({l} {op} {r})" for (l, op, r) in filters)
    query = " . ".join(parts)
    if not any(t.startswith("?") for p in pats for t in p):
        return  # zero-column boolean frames covered by the base fuzz test
    got_df = eval_bgp(table, query)
    cols = sorted(got_df.columns)

    want = set()
    for b in _nv_extensions(rows, pats, {}):
        cands = [b]
        if opt:
            exts = _nv_extensions(rows, opt, b)
            cands = exts if exts else [b]
        for c in cands:
            if all(_nv_filter_true(f, c) for f in filters):
                want.add(tuple(c[v][0] if v in c else None for v in cols))
    got = {
        tuple(r[c] for c in cols) for _, r in got_df.iterrows()
    }
    assert got == want, (query, rows, got, want)


@given(
    triples=st.lists(_triple_ext, min_size=0, max_size=8),
    pats=st.lists(_pattern_ext, min_size=1, max_size=2),
    filters=st.lists(_filter, min_size=0, max_size=1),
    proj=st.lists(st.sampled_from(["s", "o", "m"]), min_size=1, max_size=3,
                  unique=True),
    distinct=st.booleans(),
    limit=st.integers(0, 5),
)
@settings(max_examples=200, deadline=None)
def test_select_wrapper_matches_postprocessed_group(
    triples, pats, filters, proj, distinct, limit
):
    """SELECT projection/DISTINCT/ORDER BY/LIMIT over a random group must
    equal the bare group's bindings post-processed the same way."""
    import pandas as pd

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
    body = " . ".join(
        [" ".join(p) for p in pats]
        + [f"FILTER({l} {op} {r})" for (l, op, r) in filters]
    )
    if not any(t.startswith("?") for p in pats for t in p):
        return  # zero-column boolean frames have no projection surface
    kw = "SELECT DISTINCT" if distinct else "SELECT"
    sel = " ".join("?" + v for v in proj)
    got = eval_bgp(
        table, f"{kw} {sel} WHERE {{ {body} }} ORDER BY {sel} LIMIT {limit}"
    )
    base = eval_bgp(table, body)
    want = base.reindex(columns=proj)
    for c in proj:
        if want[c].isna().all():
            want[c] = None
    if distinct:
        want = want.drop_duplicates(ignore_index=True)
    if len(want):
        want = want.sort_values(proj, ignore_index=True, na_position="last")
    want = want.head(limit).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


# ---------------------------------------------------------------------------
# Property paths: random path ASTs vs a naive set-semantics evaluator
# ---------------------------------------------------------------------------

_path_atom = st.sampled_from(
    [("pred", "p1"), ("pred", "p2"), ("inv", ("pred", "p1"))]
)
_path_ast = st.recursive(
    _path_atom,
    lambda children: st.one_of(
        st.tuples(st.just("seq"), st.lists(children, min_size=2, max_size=3)).map(tuple),
        st.tuples(st.just("alt"), st.lists(children, min_size=2, max_size=3)).map(tuple),
        st.tuples(st.just("plus"), children).map(tuple),
        st.tuples(st.just("star"), children).map(tuple),
        st.tuples(st.just("ques"), children).map(tuple),
    ),
    max_leaves=4,
)


def _nv_path_pairs(ast, rows):
    """Naive path semantics over term pairs ((val, lit), (val, lit))."""
    kind = ast[0]
    if kind == "pred":
        return {((s, False), (o, lit)) for (s, p, o, lit) in rows if p == ast[1]}
    if kind == "inv":
        return {(b, a) for (a, b) in _nv_path_pairs(ast[1], rows)}
    if kind == "seq":
        cur = _nv_path_pairs(ast[1][0], rows)
        for step in ast[1][1:]:
            nxt = _nv_path_pairs(step, rows)
            cur = {(a, d) for (a, b) in cur for (c, d) in nxt if b == c}
        return cur
    if kind == "alt":
        out = set()
        for b in ast[1]:
            out |= _nv_path_pairs(b, rows)
        return out
    if kind in ("star", "ques"):
        # zero-length: every graph term pairs with itself
        terms = {(s, False) for (s, _p, _o, _l) in rows} | {
            (o, lit) for (_s, _p, o, lit) in rows
        }
        zero = {(t, t) for t in terms}
        inner = _nv_path_pairs(ast[1], rows)
        if kind == "ques":
            return zero | inner
        return zero | _nv_path_pairs(("plus", ast[1]), rows)
    base = _nv_path_pairs(ast[1], rows)
    total = set(base)
    while True:
        step = {(a, d) for (a, b) in total for (c, d) in base if b == c}
        if step <= total:
            return total
        total |= step


@given(
    triples=st.lists(_triple, min_size=0, max_size=8),
    ast=_path_ast,
)
@settings(max_examples=250, deadline=None)
def test_path_eval_matches_naive(triples, ast):
    from rdf_diff_store_ray.query.bgp import eval_bgp, format_path

    rows = [(s, p, o, lit) for (s, p, (o, lit)) in triples]
    table = pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred": pa.array([r[1] for r in rows], pa.string()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
            "obj_is_literal": pa.array([r[3] for r in rows], pa.bool_()),
        }
    )
    got_df = eval_bgp(table, f"?s {format_path(ast)} ?o")
    got = set(zip(got_df["s"], got_df["o"]))
    want = {(a[0], b[0]) for (a, b) in _nv_path_pairs(ast, rows)}
    assert got == want, (format_path(ast), rows)


# ---------------------------------------------------------------------------
# MINUS / EXISTS / VALUES vs a naive set evaluator
# ---------------------------------------------------------------------------


def _nv_compatible(a: dict, b: dict) -> bool:
    return all(a[k] == b[k] for k in a.keys() & b.keys())


def _nv_minus(A, B):
    """SPARQL MINUS: drop a when some b is compatible AND shares ≥1 var."""
    return [
        a for a in A
        if not any((a.keys() & b.keys()) and _nv_compatible(a, b) for b in B)
    ]


def _nv_exists(A, B, positive):
    return [a for a in A
            if any(_nv_compatible(a, b) for b in B) == positive]


@given(
    triples=st.lists(_triple, min_size=0, max_size=8),
    pats=st.lists(_pattern, min_size=1, max_size=2),
    sub=st.lists(_pattern, min_size=1, max_size=2),
    mode=st.sampled_from(["minus", "exists", "notexists", "values"]),
    vals=st.lists(st.sampled_from(_ENTS), min_size=1, max_size=3,
                  unique=True),
    vvar=st.sampled_from(["s", "o", "m"]),
)
@settings(max_examples=250, deadline=None)
def test_minus_exists_values_match_naive(triples, pats, sub, mode, vals,
                                         vvar):
    from rdf_diff_store_ray.query.bgp import eval_bgp

    if not any(t.startswith("?") for p in pats for t in p):
        return  # zero-column boolean frames covered by the base fuzz test
    rows = [(s, p, o, lit) for (s, p, (o, lit)) in triples]
    table = pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred": pa.array([r[1] for r in rows], pa.string()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
            "obj_is_literal": pa.array([r[3] for r in rows], pa.bool_()),
        }
    )
    base = " . ".join(" ".join(p) for p in pats)
    subq = " . ".join(" ".join(p) for p in sub)
    A = _nv_extensions(rows, pats, {})
    B = _nv_extensions(rows, sub, {})
    if mode == "minus":
        query = f"{base} . MINUS {{ {subq} }}"
        want_solutions = _nv_minus(A, B)
    elif mode in ("exists", "notexists"):
        kw = "EXISTS" if mode == "exists" else "NOT EXISTS"
        query = f"{base} . FILTER {kw} {{ {subq} }}"
        want_solutions = _nv_exists(A, B, mode == "exists")
    else:  # values
        query = (f"{base} . VALUES ?{vvar} {{ "
                 + " ".join(f"<{e}>" for e in vals) + " }")
        V = [{vvar: (e, False)} for e in vals]
        want_solutions = [
            {**a, **v} for a in A for v in V if _nv_compatible(a, v)
        ]
    got_df = eval_bgp(table, query)
    cols = sorted(got_df.columns)
    got = {tuple(r[c] for c in cols) for _, r in got_df.iterrows()}
    want = {
        tuple(c[v][0] if v in c else None for v in cols)
        for c in want_solutions
    }
    assert got == want, (query, rows, got, want)


# ---------------------------------------------------------------------------
# GRAPH clauses: random quad stores vs a naive graph-scoped evaluator

_GIDS = ["g1", "g2"]

_quad = st.tuples(st.sampled_from(_GIDS), _triple)


def _nv_graph_eval(quads, def_pats, gterm, graph_pats):
    """Brute force: default patterns over ALL quads' triples, GRAPH
    patterns over one graph's triples, the graph term fixed per gid."""
    results = set()

    def match(pattern, triple, binding):
        s, p, (o, lit) = triple
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
            elif pos != "obj" or val != (term[1:-1], True):
                return None
        return b

    gids = sorted({g for g, _ in quads})
    all_triples = [t for _, t in quads]
    for gid in (gids if gterm.startswith("?") else [gterm[1:-1]]):
        sub = [t for g, t in quads if g == gid]
        binding0 = {gterm[1:]: (gid, False)} if gterm.startswith("?") else {}
        plan = [(p, all_triples) for p in def_pats] + \
               [(p, sub) for p in graph_pats]

        def rec(i, binding):
            if i == len(plan):
                vs = tuple(sorted(binding))
                results.add(tuple(binding[v][0] for v in vs))
                return
            pat, pool = plan[i]
            for t in pool:
                b = match(pat, t, binding)
                if b is not None:
                    rec(i + 1, b)

        rec(0, binding0)
    return results


@given(
    quads=st.lists(_quad, min_size=0, max_size=8),
    def_pats=st.lists(_pattern, min_size=0, max_size=1),
    graph_pats=st.lists(_pattern, min_size=1, max_size=2),
    gterm=st.sampled_from(["?g"] + [f"<{g}>" for g in _GIDS]),
)
@settings(max_examples=200, deadline=None)
def test_graph_clause_matches_naive(quads, def_pats, graph_pats, gterm):
    from rdf_diff_store_ray.query.bgp import eval_bgp

    rows = [(g, s, p, o, lit) for (g, (s, p, (o, lit))) in quads]
    qt = pa.table(
        {
            "graph_id": pa.array([r[0] for r in rows], pa.string()),
            "subj": pa.array([r[1] for r in rows], pa.string()),
            "pred": pa.array([r[2] for r in rows], pa.string()),
            "obj": pa.array([r[3] for r in rows], pa.string()),
            "obj_is_literal": pa.array([r[4] for r in rows], pa.bool_()),
        }
    )
    tt = qt.drop_columns(["graph_id"])
    inner = " . ".join(" ".join(p) for p in graph_pats)
    clauses = [" ".join(p) for p in def_pats] + [
        f"GRAPH {gterm} {{ {inner} }}"
    ]
    query = " . ".join(clauses)
    got_df = eval_bgp(tt, query, quads=qt)
    got = {
        tuple(r[c] for c in sorted(got_df.columns))
        for _, r in got_df.iterrows()
    }
    want = _nv_graph_eval(
        [(g, (s, p, (o, lit))) for g, s, p, o, lit in rows],
        def_pats, gterm, graph_pats,
    )
    has_vars = gterm.startswith("?") or any(
        t.startswith("?") for p in def_pats + graph_pats for t in p
    )
    if not has_vars:
        assert bool(len(got_df)) == bool(want)
    else:
        assert got == want, (query, rows)


@given(
    triples=st.lists(_triple, min_size=0, max_size=8),
    pats=st.lists(_pattern, min_size=1, max_size=3),
)
@settings(max_examples=200, deadline=None)
def test_prefix_expansion_matches_plain(triples, pats):
    """Rewriting every IRI as a prefixed name must not change results —
    the PREFIX pre-pass is a pure text identity."""
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
    plain = " . ".join(" ".join(t) for t in pats)

    def prefixed_term(t: str) -> str:
        if t.startswith("<e"):
            return "n:" + t[2:-1]
        if t.startswith("<p"):
            return "q:" + t[2:-1]
        return t

    pre = "PREFIX n: <e> PREFIX q: <p> " + " . ".join(
        " ".join(prefixed_term(x) for x in t) for t in pats
    )
    a = eval_bgp(table, plain)
    b = eval_bgp(table, pre)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# Blank-node pattern terms: scoped variables hidden from the results
# ---------------------------------------------------------------------------

_BNODES = ["_:b0", "_:b1"]
_pattern_bn = st.tuples(
    st.sampled_from(_VARS + _BNODES + [f"<{e}>" for e in _ENTS]),
    st.sampled_from(_VARS + [f"<{p}>" for p in _PREDS]),
    st.sampled_from(_VARS + _BNODES + [f"<{e}>" for e in _ENTS]
                    + [f'"{v}"' for v in _LITS]),
)


@given(
    triples=st.lists(_triple, min_size=0, max_size=8),
    pats=st.lists(_pattern_bn, min_size=1, max_size=2),
)
@settings(max_examples=200, deadline=None)
def test_bnode_patterns_match_naive_projection(triples, pats):
    """A `_:label` term behaves exactly like a variable during matching
    but is projected OUT of the solutions — fuzzed against the brute-
    force evaluator run with the labels rewritten to real variables and
    its solutions projected onto the visible vars."""
    from hypothesis import assume

    from rdf_diff_store_ray.query.bgp import eval_bgp

    flat = [t for p in pats for t in p]
    assume(any(t.startswith("_:") for t in flat))
    assume(any(t.startswith("?") for t in flat))
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
    assert not any(c.startswith("__bn_") for c in got_df.columns)
    visible = sorted({t[1:] for t in flat if t.startswith("?")})
    assert sorted(got_df.columns) == visible
    got = {tuple(r[c] for c in visible) for _, r in got_df.iterrows()}
    # naive: bnode labels become ordinary vars, then project
    rewritten = [tuple("?__h" + t[2:] if t.startswith("_:") else t
                       for t in p) for p in pats]
    want = set()

    def match(pattern, triple, binding):
        (s, p, o, lit) = triple
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
            else:
                if pos != "obj" or val != (term[1:-1], True):
                    return None
        return b

    def rec(i, binding):
        if i == len(rewritten):
            want.add(tuple(binding.get(v, (None,))[0] for v in visible))
            return
        for t in rows:
            b = match(rewritten[i], t, binding)
            if b is not None:
                rec(i + 1, b)

    rec(0, {})
    assert got == want, (query, rows)


# ---------------------------------------------------------------------------
# GROUP BY (plain var and computed condition) vs a pandas-side oracle
# ---------------------------------------------------------------------------
@given(
    triples=st.lists(_triple_ext, min_size=0, max_size=8),
    pats=st.lists(_pattern_ext, min_size=1, max_size=2),
    key=st.sampled_from(["s", "o"]),
    by_expr=st.booleans(),
)
@settings(max_examples=150, deadline=None)
def test_group_by_aggregate_matches_pandas(triples, pats, key, by_expr):
    """GROUP BY ?k (COUNT(*) AS ?n) — and the computed-condition form
    GROUP BY (STRLEN(?k) AS ?len) — must equal counting the bare
    group's bindings pandas-side (lexical-length key for the computed
    form; unbound keys form their own group / error out of STRLEN)."""
    import collections
    import re

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
    body = " . ".join(" ".join(p) for p in pats)
    if not any(t == "?" + key for p in pats for t in p):
        return
    base = eval_bgp(table, body)
    if by_expr:
        # STR() first: bare STRLEN over an IRI is a type error per spec
        got = eval_bgp(
            table,
            f"SELECT ?len (COUNT(*) AS ?n) WHERE {{ {body} }} "
            f"GROUP BY (STRLEN(STR(?{key})) AS ?len)",
        )
        from rdf_diff_store_ray.ntriples import _DECORATED_RE

        def lex(v):  # STR() = the lexical form of decorated literals
            if _DECORATED_RE.match(v):
                return v[1:v.rindex('"')]
            return v

        want = collections.Counter(
            len(lex(v)) for v in base[key] if v is not None
        )
        got_map = {}
        for _, r in got.iterrows():
            if r["len"] is None:
                continue  # unbound key -> STRLEN error -> null key group
            m = re.match(r'^"(\d+)"', r["len"])
            got_map[int(m.group(1))] = r["n"]
        assert got_map == dict(want)
    else:
        got = eval_bgp(
            table,
            f"SELECT ?{key} (COUNT(*) AS ?n) WHERE {{ {body} }} "
            f"GROUP BY ?{key}",
        )
        want = collections.Counter(base[key].tolist())
        got_map = dict(zip(got[key], got["n"]))
        assert got_map == dict(want)
