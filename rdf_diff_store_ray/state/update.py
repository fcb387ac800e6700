"""SPARQL 1.1 Update over the versioned store.

The reference writes through REST (``POST/DELETE /api/graphs``,
``src/bin/rdf-diff-writer.rs``); this module adds the SPARQL-Update
spelling of the same write path, reusing the query grammar (PREFIX
expansion, term/group parsing) and the engine's append semantics
(canonicalization, no-op suppression, monotonic timestamps, the
single-writer lock):

- ``INSERT DATA { GRAPH <g> { ... } ... }`` — ground quads, upserted
  into their graphs. Every triple must sit in a ``GRAPH`` block: the
  engine's data model (one named graph per source id, like the
  reference's one-repo-file-per-graph, ``src/git.rs:110-120``) has no
  free-floating default graph to insert into.
- ``DELETE DATA { GRAPH <g> { ... } ... }`` — ground quads removed
  (absent triples are a no-op, per spec).
- ``DELETE WHERE { ... }`` — the pattern group is both the match and
  the deletion template. Bare patterns match the merged default-graph
  view and delete each matched triple from every source graph that
  holds it; ``GRAPH ?g/<g>`` blocks scope matches and deletions to
  named graphs.
- ``CLEAR GRAPH <g>`` — the graph becomes the empty graph (a new empty
  version; the id stays live). ``DROP GRAPH <g>`` — delete tombstone
  (the reference's ``DELETE /api/graphs?id=``).

Scale note: updates are the low-rate interactive write surface — the
same role the reference's pool-of-one writer plays — so the apply step
reads only the affected graphs' current text (plus, for DELETE WHERE,
the quad view at ``ts``) on the driver. Bulk mutation belongs to the
build/append pipelines, not here.
"""

from __future__ import annotations

import glob
import os
import re

import pyarrow.dataset as pads

from .. import ntriples
from . import reconstruct
from .append import append_graphs, delete_graphs

_DATA_RE = re.compile(r"(INSERT|DELETE)\s+DATA\s*\{", re.IGNORECASE)
_WHERE_RE = re.compile(r"DELETE\s+WHERE\s*\{", re.IGNORECASE)
_GRAPH_RE = re.compile(
    r"(CLEAR|DROP)\s+(?:SILENT\s+)?GRAPH\s*<([^<>\s]+)>\s*$", re.IGNORECASE
)


def _store_table(store: str):
    files = sorted(glob.glob(os.path.join(store, "partition=*", "*.parquet")))
    if not files:
        raise ValueError(f"no delta partitions under {store!r}")
    return pads.dataset(files).to_table()


def _ground_term(term, pos: str):
    """Query-AST term → (value, is_literal); vars/paths are rejected
    (DATA forms take ground quads only)."""
    kind = term[0]
    if kind == "iri":
        return term[1], False
    if kind == "lit" and pos == "obj":
        return term[1], True
    if kind == "var":
        raise ValueError(
            f"INSERT/DELETE DATA takes ground terms, got variable ?{term[1]}"
        )
    raise ValueError(f"bad {pos} term in ground data: {term!r}")


def _ground_quads(group: dict) -> list:
    """Parsed DATA group → [(graph_id, subj, pred, obj, is_lit)]."""
    for key in ("filters", "optionals", "unions", "values", "binds",
                "minus", "exists", "subqueries"):
        if group.get(key):
            raise ValueError(f"{key} are not allowed in INSERT/DELETE DATA")
    if group["patterns"]:
        raise ValueError(
            "INSERT/DELETE DATA needs GRAPH blocks — the store keeps "
            "every triple in a named source graph (GRAPH <id> { ... })"
        )
    out = []
    for gterm, sub in group.get("graphs") or []:
        if gterm[0] != "iri":
            raise ValueError(
                f"GRAPH term in DATA must be a constant IRI: {gterm!r}"
            )
        for key in ("filters", "optionals", "unions", "values", "binds",
                    "minus", "exists", "subqueries", "graphs"):
            if sub.get(key):
                raise ValueError(
                    f"{key} are not allowed inside a DATA GRAPH block"
                )
        for s, p, o in sub["patterns"]:
            subj, _ = _ground_term(s, "subj")
            pred, _ = _ground_term(p, "pred")
            if p[0] == "path":
                raise ValueError("property paths are not ground predicates")
            obj, is_lit = _ground_term(o, "obj")
            out.append((gterm[1], subj, pred, obj, is_lit))
    if not out:
        raise ValueError("empty INSERT/DELETE DATA block")
    return out


def parse_update(update: str) -> dict:
    """Parse a SPARQL-Update string (PREFIX declarations supported) into
    ``{"form": ..., ...}``; raises on unsupported forms with the list of
    supported ones."""
    from ..query.bgp import _expand_prefixes, _match_brace, _parse_group_body

    q = _expand_prefixes(update.strip())
    if m := _DATA_RE.match(q):
        j = _match_brace(q, m.end() - 1)
        if q[j + 1:].strip():
            raise ValueError(f"trailing content after DATA block: {q[j+1:]!r}")
        # scan GRAPH blocks directly: SPARQL quad data does not require
        # "." separators between adjacent GRAPH blocks
        body = q[m.end(): j].strip()
        graphs, pos = [], 0
        gre = re.compile(r"GRAPH\s*<([^<>\s]+)>\s*\{", re.IGNORECASE)
        while pos < len(body):
            if body[pos].isspace() or body[pos] == ".":
                pos += 1
                continue
            gm = gre.match(body, pos)
            if not gm:
                raise ValueError(
                    "INSERT/DELETE DATA needs GRAPH blocks — the store "
                    "keeps every triple in a named source graph "
                    f"(GRAPH <id> {{ ... }}): {body[pos:pos + 60]!r}"
                )
            gj = _match_brace(body, gm.end() - 1)
            sub = _parse_group_body(body[gm.end(): gj].strip())
            graphs.append((("iri", gm.group(1)), sub))
            pos = gj + 1
        group = {"patterns": [], "filters": [], "optionals": [],
                 "unions": [], "values": [], "binds": [], "minus": [],
                 "exists": [], "subqueries": [], "graphs": graphs}
        return {
            "form": f"{m.group(1).lower()}_data",
            "quads": _ground_quads(group),
        }
    if m := _WHERE_RE.match(q):
        j = _match_brace(q, m.end() - 1)
        if q[j + 1:].strip():
            raise ValueError(
                f"trailing content after WHERE block: {q[j+1:]!r}"
            )
        group = _parse_group_body(q[m.end(): j].strip())
        for key in ("filters", "optionals", "unions", "values", "binds",
                    "minus", "exists", "subqueries"):
            if group.get(key):
                raise ValueError(
                    f"DELETE WHERE takes only triple/GRAPH patterns "
                    f"({key} found) — the group is also the deletion "
                    "template, which must be quad patterns"
                )
        for _s, p, _o in group["patterns"]:
            if p[0] == "path":
                raise ValueError(
                    "property paths cannot appear in a deletion template"
                )
        for _gt, sub in group.get("graphs") or []:
            for _s, p, _o in sub["patterns"]:
                if p[0] == "path":
                    raise ValueError(
                        "property paths cannot appear in a deletion template"
                    )
        return {"form": "delete_where", "group": group}
    if m := _GRAPH_RE.match(q):
        return {"form": f"{m.group(1).lower()}_graph", "graph": m.group(2)}
    raise ValueError(
        "unsupported update form (supported: INSERT DATA, DELETE DATA, "
        f"DELETE WHERE, CLEAR GRAPH, DROP GRAPH): {update[:80]!r}"
    )


def _tagged_to_term(v: str):
    """Tagged binding value → (value, is_literal)."""
    return (v[1:], v[0] == "L")


def _instantiate(pattern, row: dict):
    """One solution row (tagged dict) × one triple pattern → ground
    (subj, pred, obj, is_lit), or None if a template var is unbound."""
    out = []
    for pos, term in zip(("subj", "pred", "obj"), pattern):
        if term[0] == "var":
            v = row.get(term[1])
            if v is None:
                return None
            val, is_lit = _tagged_to_term(v)
        elif term[0] == "iri":
            val, is_lit = term[1], False
        else:  # lit
            val, is_lit = term[1], True
        out.append((val, is_lit))
    (s, _), (p, _), (o, ol) = out
    return (s, p, o, ol)


def _delete_where_quads(group: dict, deltas, ts) -> list:
    """Evaluate the DELETE WHERE group at ``ts`` and instantiate its
    patterns into the ground quads to remove."""
    import pandas as pd

    from ..query.bgp import eval_group, eval_one_pattern, eval_pattern_in_graph

    quads = reconstruct.quads_at_table(deltas, ts)
    qdf = quads.to_pandas()
    merged = qdf.drop(columns=["graph_id"]).drop_duplicates()
    source = lambda pat: eval_one_pattern(merged, pat)  # noqa: E731
    gsource = lambda pat, gt: eval_pattern_in_graph(qdf, pat, gt)  # noqa: E731
    bindings = eval_group(group, source, gsource)
    rows = bindings.to_dict("records")
    out = []  # (graph_id, subj, pred, obj, is_lit)
    for pat in group["patterns"]:
        seen = set()
        for row in rows:
            t = _instantiate(pat, row)
            if t is None or t in seen:
                continue
            seen.add(t)
            # a default-graph deletion removes the triple from EVERY
            # source graph holding it (the merged view is the union)
            hit = qdf[
                (qdf["subj"] == t[0]) & (qdf["pred"] == t[1])
                & (qdf["obj"] == t[2]) & (qdf["obj_is_literal"] == t[3])
            ]
            for gid in hit["graph_id"].unique():
                out.append((gid,) + t)
    for gterm, sub in group.get("graphs") or []:
        for pat in sub["patterns"]:
            seen = set()
            for row in rows:
                if gterm[0] == "iri":
                    gid = gterm[1]
                else:
                    gv = row.get(gterm[1])
                    if gv is None:
                        continue
                    gid = _tagged_to_term(gv)[0]
                t = _instantiate(pat, row)
                if t is None or (gid,) + t in seen:
                    continue
                seen.add((gid,) + t)
                out.append((gid,) + t)
    return out


def sparql_update(store: str, update: str, ts: int) -> dict:
    """Apply one SPARQL-Update request to the store at unix-seconds
    ``ts``. Returns a summary ``{"form", "graphs", "added", "removed"}``.
    Writes go through :func:`append_graphs` / :func:`delete_graphs`, so
    canonicalization, digest no-op suppression, the monotonicity check
    and the single-writer lock all apply unchanged."""
    u = parse_update(update)
    form = u["form"]
    if form == "drop_graph":
        n = delete_graphs(store, [u["graph"]], ts)
        return {"form": form, "graphs": n, "added": 0, "removed": 0}
    if form == "clear_graph":
        n = append_graphs(store, {u["graph"]: []}, ts)
        return {"form": form, "graphs": n, "added": 0, "removed": 0}

    deltas = _store_table(store)
    if form == "delete_where":
        quads = _delete_where_quads(u["group"], deltas, ts)
    else:
        quads = u["quads"]
    by_graph: dict = {}
    for gid, s, p, o, ol in quads:
        by_graph.setdefault(gid, []).append((s, p, o, ol))

    live = reconstruct.state_at_table(deltas, ts)
    cur_text = dict(zip(live["graph_id"].to_pylist(),
                        live["delta_text"].to_pylist()))
    updates: dict = {}
    added = removed = 0
    for gid, triples in sorted(by_graph.items()):
        cur = set(ntriples.parse(cur_text.get(gid, "")))
        if form == "insert_data":
            new = cur | set(triples)
            added += len(new) - len(cur)
        else:
            new = cur - set(triples)
            removed += len(cur) - len(new)
        if new != cur:
            updates[gid] = sorted(new)
    if updates:
        append_graphs(store, updates, ts)
    return {"form": form, "graphs": len(updates),
            "added": added, "removed": removed}
