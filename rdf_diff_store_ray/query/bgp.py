"""Basic-graph-pattern (SPARQL-subset) evaluator + cached diff-store reader.

The reference loads all live graphs at ``ts`` into an in-memory oxigraph
store and runs SPARQL (``/root/reference/src/query.rs:117-145``). This
engine holds the reconstructed state as an Arrow triple table and evaluates
BGPs — conjunctions of triple patterns with shared variables — via hash
joins (pandas merges) on the variable columns. Scoped to the subset the
reference's observable tests exercise: triple patterns with ``?var``,
``<iri>`` and ``"literal"`` terms; results as SPARQL-JSON-shaped bindings.

Query syntax::

    ?s <https://kg.example/prop/acquired> ?o
    ?s <p1> ?m . ?m <p2> "lit"

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
    """Parse ``pat ( . pat)*`` where pat = 3 terms."""
    patterns = []
    for part in query.strip().split(" . "):
        terms = _split_terms(part.strip())
        if len(terms) != 3:
            raise ValueError(f"bad triple pattern: {part!r}")
        patterns.append(tuple(_parse_term(t) for t in terms))
    return patterns


def _split_terms(s: str):
    out, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
        elif c == "<":
            j = s.index(">", i)
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
            out.append(s[i : j + 1])
            i = j + 1
        else:
            j = i
            while j < n and not s[j].isspace():
                j += 1
            out.append(s[i:j])
            i = j
    return out


def _parse_term(t: str):
    from ..ntriples import unescape_literal

    if t.startswith("?"):
        return ("var", t[1:])
    if t.startswith("<") and t.endswith(">"):
        return ("iri", t[1:-1])
    if t.startswith('"') and t.endswith('"'):
        return ("lit", unescape_literal(t[1:-1]))
    raise ValueError(f"bad term: {t!r}")


def eval_bgp(triples: pa.Table, query: str) -> pd.DataFrame:
    """Evaluate a BGP against a triple table
    (``subj, pred, obj, obj_is_literal``); returns distinct bindings, one
    column per variable, sorted for determinism.

    A variable binds an RDF *term*, not a lexical form: bindings are
    carried internally as ``(value, is_literal)`` tuples so that a
    literal ``"x"`` never joins the IRI ``<x>`` — across patterns AND for
    a variable repeated within one pattern (``?s <p> ?s`` = self-loops).
    """
    df = triples.to_pandas()
    result: pd.DataFrame | None = None
    for s, p, o in parse_bgp(query):
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
        # tagged term per position (subj/pred are always IRIs)
        tagged = pd.DataFrame(index=cur.index)
        for pos in ("subj", "pred", "obj"):
            lit = cur["obj_is_literal"] if pos == "obj" else False
            tagged[pos] = list(zip(cur[pos], lit if pos == "obj" else [False] * len(cur)))
        # a variable repeated WITHIN the pattern must bind one term
        mask = pd.Series(True, index=cur.index)
        for var, positions in var_positions.items():
            for extra in positions[1:]:
                mask &= tagged[positions[0]] == tagged[extra]
        proj = pd.DataFrame(index=cur.index)
        for var, positions in var_positions.items():
            proj[var] = tagged[positions[0]]
        if var_positions:
            cur = proj[mask].drop_duplicates()
        else:
            cur = proj.head(1) if len(cur) else proj  # boolean pattern
        if result is None:
            result = cur
        else:
            shared = [c for c in result.columns if c in cur.columns]
            if shared:
                result = result.merge(cur, on=shared, how="inner")
            else:
                result = result.merge(cur, how="cross")
        result = result.drop_duplicates(ignore_index=True)
        if len(result) == 0:  # NOT .empty — a zero-column boolean frame
            break             # with rows still means "matched"
    assert result is not None
    # unwrap tagged tuples to lexical forms for the caller
    out = pd.DataFrame(
        {c: [t[0] for t in result[c]] for c in result.columns},
        index=result.index,
    )
    if len(out.columns):
        out = out.drop_duplicates(ignore_index=True)
        return out.sort_values(list(out.columns), ignore_index=True)
    return out.reset_index(drop=True)


def bindings_json(df: pd.DataFrame) -> str:
    """SPARQL-JSON-shaped serialization (``src/query.rs:110-113`` analog)."""
    out = {
        "head": {"vars": list(df.columns)},
        "results": {
            "bindings": [
                {c: {"value": row[c]} for c in df.columns}
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

    def __init__(self, deltas: pa.Table, cache_capacity: int = 1000):
        self.deltas = deltas
        self.store_cache = LRU(cache_capacity)  # ts -> triple table
        self.graphs_cache = LRU(cache_capacity)  # ts -> canonical text
        self.query_cache = LRU(cache_capacity)  # (ts, q) -> bindings df
        self.last_cache_level: str = "Nothing"

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
        k = self._key(ts)
        hit = self.graphs_cache.get(k)
        if hit is not None:
            self.last_cache_level = "Prettified"
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
        return text

    def query_at(self, ts, query: str) -> pd.DataFrame:
        k = self._key(ts)
        hit = self.query_cache.get((k, query))
        if hit is not None:
            self.last_cache_level = "Query"
            return hit
        had_store = self.store_cache.get(k) is not None
        res = eval_bgp(self._store_at(k), query)
        self.query_cache.put((k, query), res)
        self.last_cache_level = "Store" if had_store else "Nothing"
        return res

    def query_at_json(self, ts, query: str) -> str:
        return bindings_json(self.query_at(ts, query))

    def metadata(self):
        return reconstruct.metadata_table(self.deltas)
