"""Basic-graph-pattern (SPARQL-subset) evaluator + cached diff-store reader.

The reference loads all live graphs at ``ts`` into an in-memory oxigraph
store and runs SPARQL (``/root/reference/src/query.rs:117-145``). This
engine holds the reconstructed state as an Arrow triple table and evaluates
BGPs — conjunctions of triple patterns with shared variables — via hash
joins (pandas merges) on the variable columns, plus ``FILTER``
(=, !=, numeric and lexical <, <=, >, >=), ``OPTIONAL`` (left-outer
merge), typed literals (``"5"^^<dt>``) and language tags (``"x"@en``).
Results are SPARQL-JSON-shaped bindings; unbound OPTIONAL variables are
omitted, as SPARQL does.

Query syntax::

    ?s <https://kg.example/prop/acquired> ?o
    ?s <p1> ?m . ?m <p2> "lit"
    ?s <p> ?v . FILTER(?v >= 10)
    ?s <p1> ?o . OPTIONAL { ?s <p2> ?label }
    { ?s <p1> ?o } UNION { ?s <p2> ?o }
    ?s <p> "name"@en . ?s <q> "5"^^<http://www.w3.org/2001/XMLSchema#integer>

:class:`DiffStoreReader` mirrors the reference's ``QueryCache`` —
three LRU caches (``store_cache: ts→store``, ``graphs_cache: ts→text``,
``query_cache: (ts,query)→result``, 1000 entries each,
``src/query.rs:28-43``) with the same ``CacheLevel`` reporting
(``src/query.rs:14-26``). At cluster scale one reader actor serves each
delta-log partition and a router merges bindings; in-sandbox a single
reader holds the (small) log.
"""

from __future__ import annotations

import json
from collections import OrderedDict

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state import reconstruct


class LRU:
    def __init__(self, cap: int = 1000):
        self.cap = cap
        self.d: OrderedDict = OrderedDict()

    def get(self, k):
        if k in self.d:
            self.d.move_to_end(k)
            return self.d[k]
        return None

    def put(self, k, v):
        self.d[k] = v
        self.d.move_to_end(k)
        while len(self.d) > self.cap:
            self.d.popitem(last=False)


def parse_bgp(query: str):
    """Parse ``pat ( . pat)*`` where pat = 3 terms — the base group's
    pattern list (legacy surface; :func:`parse_query` is the full
    grammar)."""
    return parse_query(query)["patterns"]


def parse_query(query: str) -> dict:
    """Parse the SPARQL-subset grammar into a group dict::

        group   := clause ( " . " clause )*
        clause  := pattern | FILTER( expr ) | OPTIONAL { group }
        pattern := term term term
        expr    := operand (= | != | < | <= | > | >=) operand
        operand := ?var | <iri> | "lit" | "lit"@lang | "lit"^^<dt> | number

    Returns ``{"patterns": [...], "filters": [...], "optionals":
    [group, ...], "unions": [[branch, ...], ...]}``. OPTIONAL groups may
    carry their own filters but not nested OPTIONALs (one level, like
    the reference tests exercise); UNION clauses are
    ``{ group } UNION { group } (UNION { group })*`` — branches may use
    FILTER/OPTIONAL but not nest further UNIONs. Evaluation order is
    patterns → unions → optionals → filters. Grows the oxigraph-subset
    surface of ``src/query.rs:102-114``."""
    group = {"patterns": [], "filters": [], "optionals": [], "unions": []}
    for clause in _split_clauses(query.strip()):
        up = clause.upper()
        if clause.startswith("{"):
            group["unions"].append(_parse_union(clause))
        elif up.startswith("FILTER"):
            inner = clause[len("FILTER"):].strip()
            if not (inner.startswith("(") and inner.endswith(")")):
                raise ValueError(f"FILTER needs parentheses: {clause!r}")
            group["filters"].append(_parse_filter(inner[1:-1].strip()))
        elif up.startswith("OPTIONAL"):
            inner = clause[len("OPTIONAL"):].strip()
            if not (inner.startswith("{") and inner.endswith("}")):
                raise ValueError(f"OPTIONAL needs braces: {clause!r}")
            sub = parse_query(inner[1:-1].strip())
            if sub["optionals"]:
                raise ValueError("nested OPTIONAL is not supported")
            group["optionals"].append(sub)
        else:
            terms = _split_terms(clause)
            if len(terms) != 3:
                raise ValueError(f"bad triple pattern: {clause!r}")
            group["patterns"].append(tuple(_parse_term(t) for t in terms))
    return group


def _match_brace(s: str, i: int) -> int:
    """Index of the ``}`` matching ``s[i] == '{'`` (quote/IRI aware)."""
    depth = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "<" and (j := _iri_end(s, i)) is not None:
            i = j + 1
        elif c == '"':
            i += 1
            while i < n:
                if s[i] == "\\":
                    i += 2
                    continue
                if s[i] == '"':
                    break
                i += 1
            i += 1
        elif c == "{":
            depth += 1
            i += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return i
            i += 1
        else:
            i += 1
    raise ValueError("unbalanced braces in query")


def _parse_union(clause: str) -> list:
    """``{ group } UNION { group } ...`` → list of parsed branch groups."""
    branches = []
    rest = clause
    while True:
        if not rest.startswith("{"):
            raise ValueError(f"expected '{{' in UNION clause: {rest!r}")
        j = _match_brace(rest, 0)
        sub = parse_query(rest[1:j].strip())
        if sub["unions"]:
            raise ValueError("nested UNION is not supported")
        branches.append(sub)
        rest = rest[j + 1 :].strip()
        if not rest:
            break
        if not rest.upper().startswith("UNION"):
            raise ValueError(f"expected UNION between groups: {rest!r}")
        rest = rest[5:].strip()
    if len(branches) < 2:
        raise ValueError("UNION needs at least two groups")
    return branches


def _split_clauses(s: str):
    """Split on top-level ``.`` separators, protecting ``<>``, quoted
    literals, ``{}`` groups and ``()`` filter expressions."""
    out, buf = [], []
    depth = 0
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "<" and (j := _iri_end(s, i)) is not None:
            buf.append(s[i : j + 1])
            i = j + 1
        elif c == '"':
            j = i + 1
            while j < n:
                if s[j] == "\\":
                    j += 2
                    continue
                if s[j] == '"':
                    break
                j += 1
            buf.append(s[i : j + 1])
            i = j + 1
        elif c in "{(":
            depth += 1
            buf.append(c)
            i += 1
        elif c in "})":
            depth -= 1
            buf.append(c)
            i += 1
        elif c == "." and depth == 0 and (i + 1 == n or s[i + 1].isspace()) \
                and (i == 0 or s[i - 1].isspace()):
            part = "".join(buf).strip()
            if part:
                out.append(part)
            buf = []
            i += 1
        else:
            buf.append(c)
            i += 1
    part = "".join(buf).strip()
    if part:
        out.append(part)
    return out


_FILTER_OPS = ("<=", ">=", "!=", "=", "<", ">")


def _parse_filter(s: str):
    toks = _split_terms(s)
    if len(toks) != 3 or toks[1] not in _FILTER_OPS:
        raise ValueError(f"bad FILTER expression: {s!r}")
    return (_parse_operand(toks[0]), toks[1], _parse_operand(toks[2]))


_NUM_RE = None


def _parse_operand(t: str):
    global _NUM_RE
    if _NUM_RE is None:
        import re

        _NUM_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
    if _NUM_RE.match(t):
        return ("num", float(t))
    return _parse_term(t)


def _iri_end(s: str, i: int):
    """``s[i] == '<'`` starts an IRI iff a ``>`` closes it before any
    whitespace (canonical IRIs contain no spaces); otherwise ``<`` is the
    comparison operator. Returns the index of ``>`` or None."""
    j = i + 1
    n = len(s)
    while j < n and not s[j].isspace():
        if s[j] == ">":
            return j
        j += 1
    return None


def _split_terms(s: str):
    out, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
        elif c == "<" and (j := _iri_end(s, i)) is not None:
            out.append(s[i : j + 1])
            i = j + 1
        elif c == '"':
            j = i + 1
            while j < n:
                if s[j] == "\\":
                    j += 2
                    continue
                if s[j] == '"':
                    break
                j += 1
            # consume a typed/lang suffix so the decorated literal stays
            # one token: "x"@en or "5"^^<iri>
            k = j + 1
            if k < n and s[k] == "@":
                while k < n and not s[k].isspace():
                    k += 1
            elif s[k : k + 3] == "^^<":
                k = s.index(">", k) + 1
            out.append(s[i:k])
            i = k
        else:
            j = i
            while j < n and not s[j].isspace():
                j += 1
            out.append(s[i:j])
            i = j
    return out


def _parse_term(t: str):
    from ..ntriples import is_decorated_literal, unescape_literal

    if t.startswith("?"):
        return ("var", t[1:])
    if t.startswith("<") and t.endswith(">"):
        return ("iri", t[1:-1])
    if t.startswith('"') and t.endswith('"'):
        return ("lit", unescape_literal(t[1:-1]))
    if is_decorated_literal(t):
        # typed / lang-tagged literal term == the decorated object form
        return ("lit", t)
    raise ValueError(f"bad term: {t!r}")


def eval_bgp(triples: pa.Table, query: str) -> pd.DataFrame:
    """Evaluate a SPARQL-subset query against a triple table
    (``subj, pred, obj, obj_is_literal``); returns distinct bindings, one
    column per variable, sorted for determinism. Unbound OPTIONAL
    variables are ``None`` (omitted in the SPARQL-JSON form).

    A variable binds an RDF *term*, not a lexical form: bindings are
    carried internally as tag-prefixed strings (see
    :func:`eval_one_pattern`) so that a
    literal ``"x"`` never joins the IRI ``<x>`` — across patterns AND for
    a variable repeated within one pattern (``?s <p> ?s`` = self-loops).
    """
    df = triples.to_pandas()
    group = parse_query(query)
    result = eval_group(group, lambda pat: eval_one_pattern(df, pat))
    return finalize_bindings(result)


def eval_group(group: dict, pattern_bindings) -> pd.DataFrame:
    """Evaluate a parsed group given ``pattern_bindings(pattern) →
    tagged df``. The bindings source is what varies between the local
    evaluator (one triple table) and the distributed service (union of
    per-partition pattern evaluations) — the join/OPTIONAL/FILTER
    algebra is identical."""
    result = _conjoin(group["patterns"], pattern_bindings)
    for branches in group["unions"]:
        parts = [eval_group(b, pattern_bindings) for b in branches]
        cols: list = []
        for p in parts:
            cols.extend(c for c in p.columns if c not in cols)
        udf = pd.concat(
            [p.reindex(columns=cols) for p in parts], ignore_index=True
        )
        # variables bound in only some branches are unbound (NaN → None
        # at finalize) elsewhere — SPARQL's UNION shape
        udf = udf.drop_duplicates(ignore_index=True)
        result = _merge_bindings(result, udf).drop_duplicates(ignore_index=True)
    for opt in group["optionals"]:
        ores = _conjoin(opt["patterns"], pattern_bindings)
        ores = _apply_filters(ores, opt["filters"])
        result = _merge_optional(result, ores)
    return _apply_filters(result, group["filters"])


def _conjoin(patterns, pattern_bindings) -> pd.DataFrame:
    result: pd.DataFrame | None = None
    for pat in patterns:
        cur = pattern_bindings(pat)
        result = cur if result is None else _merge_bindings(result, cur)
        result = result.drop_duplicates(ignore_index=True)
        if len(result) == 0:  # NOT .empty — a zero-column boolean frame
            break             # with rows still means "matched"
    if result is None:  # empty pattern list (pure-OPTIONAL/FILTER group)
        result = pd.DataFrame(index=[0])
    return result


def _merge_bindings(result: pd.DataFrame, cur: pd.DataFrame) -> pd.DataFrame:
    shared = [c for c in result.columns if c in cur.columns]
    if shared:
        return result.merge(cur, on=shared, how="inner")
    return result.merge(cur, how="cross")


def _merge_optional(result: pd.DataFrame, ores: pd.DataFrame) -> pd.DataFrame:
    shared = [c for c in result.columns if c in ores.columns]
    new_cols = [c for c in ores.columns if c not in result.columns]
    if len(ores) == 0:
        for c in new_cols:
            result[c] = None
    elif shared:
        result = result.merge(ores, on=shared, how="left")
    else:
        result = result.merge(ores, how="cross")
    return result.drop_duplicates(ignore_index=True)


def finalize_bindings(result: pd.DataFrame) -> pd.DataFrame:
    """Strip tag prefixes from tagged strings; unbound → None; distinct +
    deterministic sort."""
    out = pd.DataFrame(
        {
            c: [t[1:] if isinstance(t, str) else None for t in result[c]]
            for c in result.columns
        },
        index=result.index,
    )
    if len(out.columns):
        out = out.drop_duplicates(ignore_index=True)
        return out.sort_values(
            list(out.columns), ignore_index=True, na_position="last"
        )
    return out.reset_index(drop=True)


def format_term(term) -> str:
    """Inverse of :func:`_parse_term` (for shipping parsed patterns)."""
    from ..ntriples import escape_literal, is_decorated_literal

    kind, val = term
    if kind == "var":
        return "?" + val
    if kind == "iri":
        return f"<{val}>"
    if is_decorated_literal(val):
        return val
    return f'"{escape_literal(val)}"'


def format_pattern(pattern) -> str:
    return " ".join(format_term(t) for t in pattern)


def eval_one_pattern(df: pd.DataFrame, pattern) -> pd.DataFrame:
    """One triple pattern against a triple frame → frame of TAGGED
    bindings, one column per variable (a zero-column frame with 0/1
    rows for a variable-free pattern).

    A tagged binding is a plain string ``"I" + value`` (IRI) or
    ``"L" + value`` (literal; decorated token for typed/lang) — a
    vectorizable representation (string concat / equality / dedup are
    columnar) that also ships compactly between partition actors, while
    still making a literal ``"x"`` never join the IRI ``<x>``."""
    s, p, o = pattern
    cur = df
    var_positions: dict = {}  # var -> [position, ...]
    for pos, term, is_obj in (("subj", s, False), ("pred", p, False), ("obj", o, True)):
        kind, val = term
        if kind == "var":
            var_positions.setdefault(val, []).append(pos)
        elif kind == "iri":
            cur = cur[cur[pos] == val]
            if is_obj:
                cur = cur[~cur["obj_is_literal"]]
        else:  # literal — only matches the object position
            cur = cur[(cur[pos] == val) & cur["obj_is_literal"]]
    # tagged term per position, fully vectorized (subj/pred always IRIs)
    tagged = pd.DataFrame(index=cur.index)
    needed = {p for ps in var_positions.values() for p in ps}
    for pos in needed:
        if pos == "obj":
            tagged[pos] = np.where(
                cur["obj_is_literal"], "L" + cur["obj"], "I" + cur["obj"]
            )
        else:
            tagged[pos] = "I" + cur[pos]
    # a variable repeated WITHIN the pattern must bind one term
    mask = pd.Series(True, index=cur.index)
    for var, positions in var_positions.items():
        for extra in positions[1:]:
            mask &= tagged[positions[0]] == tagged[extra]
    proj = pd.DataFrame(index=cur.index)
    for var, positions in var_positions.items():
        proj[var] = tagged[positions[0]]
    if var_positions:
        return proj[mask].drop_duplicates()
    return proj.head(1) if len(cur) else proj  # boolean pattern


# ------------------------------------------------------------- FILTER ------

_XSD_NUMERIC = frozenset(
    f"http://www.w3.org/2001/XMLSchema#{t}"
    for t in ("integer", "int", "long", "short", "byte", "decimal", "float",
              "double", "nonNegativeInteger", "positiveInteger",
              "unsignedInt", "unsignedLong")
)


def _term_lexical(tagged: str) -> str:
    """Lexical form of a tagged binding (decorated literals unwrapped)."""
    from ..ntriples import literal_parts

    if tagged.startswith("L"):
        return literal_parts(tagged[1:])[0]
    return tagged[1:]


def _term_numeric(tagged: str):
    """Numeric value of a tagged binding, or None. Plain literals are
    coerced when they look numeric (the corpus stores numbers as plain
    literals); typed literals only for XSD numeric datatypes."""
    from ..ntriples import literal_parts

    if not tagged.startswith("L"):
        return None
    lex, suffix = literal_parts(tagged[1:])
    if suffix.startswith("^^<"):
        if suffix[3:-1] not in _XSD_NUMERIC:
            return None
    elif suffix:  # language-tagged — never numeric
        return None
    try:
        return float(lex)
    except ValueError:
        return None


def _operand_value(operand, row):
    """Resolve a filter operand against one result row → tagged term
    string, ("num", x) constant, or None (unbound)."""
    kind, val = operand
    if kind == "var":
        t = row.get(val)
        return t if isinstance(t, str) else None
    if kind == "iri":
        return "I" + val
    if kind == "lit":
        return "L" + val
    return ("__num__", val)  # sentinel handled in _filter_true


def _filter_true(lhs, op: str, rhs) -> bool:
    """SPARQL-style comparison; unbound/incomparable → False (a filter
    error removes the row)."""
    if lhs is None or rhs is None:
        return False

    def num(x):
        if isinstance(x, tuple):
            return x[1]
        return _term_numeric(x)

    ln, rn = num(lhs), num(rhs)
    if ln is not None and rn is not None:
        a, b = ln, rn
    elif op in ("=", "!="):
        if isinstance(lhs, tuple) or isinstance(rhs, tuple):
            return False  # numeric const vs non-numeric term
        a, b = lhs, rhs  # term equality on tagged strings
    else:
        # ordering on lexical forms (codepoint order), literals/IRIs alike
        if isinstance(lhs, tuple) or isinstance(rhs, tuple):
            return False
        a, b = _term_lexical(lhs), _term_lexical(rhs)
    if op == "=":
        return a == b
    if op == "!=":
        return a != b
    if op == "<":
        return a < b
    if op == "<=":
        return a <= b
    if op == ">":
        return a > b
    return a >= b


def _apply_filters(result: pd.DataFrame, filters) -> pd.DataFrame:
    for lhs, op, rhs in filters:
        if len(result) == 0:
            break
        mask = [
            _filter_true(_operand_value(lhs, row), op, _operand_value(rhs, row))
            for _, row in result.iterrows()
        ]
        result = result[pd.Series(mask, index=result.index)]
    return result


def bindings_json(df: pd.DataFrame) -> str:
    """SPARQL-JSON-shaped serialization (``src/query.rs:110-113`` analog)."""
    out = {
        "head": {"vars": list(df.columns)},
        "results": {
            "bindings": [
                {c: {"value": row[c]} for c in df.columns if row[c] is not None}
                for _, row in df.iterrows()
            ]
        },
    }
    return json.dumps(out, sort_keys=True)


class DiffStoreReader:
    """Cached reader over a delta-log table (one partition or a whole small
    store). Cache levels mirror the reference's ``CacheLevel``
    (``src/query.rs:14-26``): "Query"/"Prettified" > "Store"/"Graph" >
    "Nothing"."""

    def __init__(self, deltas: pa.Table, cache_capacity: int = 1000,
                 registry=None):
        from ..metrics import REGISTRY

        self.deltas = deltas
        self.store_cache = LRU(cache_capacity)  # ts -> triple table
        self.graphs_cache = LRU(cache_capacity)  # ts -> canonical text
        self.query_cache = LRU(cache_capacity)  # (ts, q) -> bindings df
        self.last_cache_level: str = "Nothing"
        self.registry = REGISTRY if registry is None else registry

    def _record(self, endpoint: str, level: str, wall_s: float) -> None:
        """Cache-level counters + latency histograms — the reference's
        HTTP middleware labels (``src/metrics/middleware.rs:50-89``) and
        query-time envelope (``src/metrics/mod.rs:29-36``)."""
        from ..metrics import BUCKETS_FAST

        self.registry.counter_inc(
            "cache_requests_total",
            f'endpoint="{endpoint}",cache_level="{level}"',
        )
        self.registry.observe("query_processing_time", wall_s,
                              "Query Processing Times", BUCKETS_FAST)

    def _key(self, ts) -> int:
        import numpy as np

        if isinstance(ts, (int, np.integer)):
            return int(ts)
        return int(pd.Timestamp(ts).timestamp())

    def _store_at(self, ts) -> pa.Table:
        k = self._key(ts)
        hit = self.store_cache.get(k)
        if hit is not None:
            return hit
        store = reconstruct.triples_at_table(self.deltas, k)
        self.store_cache.put(k, store)
        return store

    def graphs_at(self, ts) -> str:
        import time

        t0 = time.monotonic()
        k = self._key(ts)
        hit = self.graphs_cache.get(k)
        if hit is not None:
            self.last_cache_level = "Prettified"
            self._record("graphs", "Prettified", time.monotonic() - t0)
            return hit
        had_store = self.store_cache.get(k) is not None
        from ..ntriples import serialize

        store = self._store_at(k)
        text = serialize(
            (r["subj"], r["pred"], r["obj"], r["obj_is_literal"])
            for r in store.to_pylist()
        )
        self.graphs_cache.put(k, text)
        self.last_cache_level = "Graph" if had_store else "Nothing"
        self._record("graphs", self.last_cache_level, time.monotonic() - t0)
        return text

    def query_at(self, ts, query: str) -> pd.DataFrame:
        import time

        t0 = time.monotonic()
        k = self._key(ts)
        hit = self.query_cache.get((k, query))
        if hit is not None:
            self.last_cache_level = "Query"
            self._record("sparql", "Query", time.monotonic() - t0)
            return hit
        had_store = self.store_cache.get(k) is not None
        res = eval_bgp(self._store_at(k), query)
        self.query_cache.put((k, query), res)
        self.last_cache_level = "Store" if had_store else "Nothing"
        self._record("sparql", self.last_cache_level, time.monotonic() - t0)
        return res

    def query_at_json(self, ts, query: str) -> str:
        return bindings_json(self.query_at(ts, query))

    def metadata(self):
        return reconstruct.metadata_table(self.deltas)
