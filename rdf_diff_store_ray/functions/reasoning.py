"""RDFS entailment materialization over a triple Dataset.

The reference stores arbitrary RDF and answers SPARQL over the merged
store (``/root/reference/src/query.rs:117-145``); real catalogs in its
domain (DCAT) lean on RDFS vocabulary — ``dcat:Dataset rdfs:subClassOf
dcat:Resource``, ``dct:title rdfs:subPropertyOf rdfs:label``, domain and
range typing — so a consumer querying ``?s a dcat:Resource`` expects the
*entailed* answers, not just the asserted ones. This module forward-
materializes the ρdf fragment (Muñoz, Pérez, Gutierrez 2009, "Simple and
Efficient Minimal RDFS"): the subClassOf / subPropertyOf / domain /
range rules, which cover RDFS entailment for stores that do not
meta-model the RDFS vocabulary itself.

Scale design — the classic small-TBox / huge-ABox split:

- the **TBox** (schema triples: the four RDFS predicates) is tiny in
  any real corpus (vocabulary-sized, not corpus-sized). It is collected
  once (guarded by ``max_tbox``), its transitive closures computed on
  the driver (BFS over at most vocabulary-many nodes), then *composed*
  into three flat per-predicate lookup tables + one per-class table.
  Closing the rule interplay on the driver (sp-closure feeds dom/range,
  dom/range feed sc-closure) is what makes the ABox pass ONE pass: no
  semi-naive iteration over the corpus, ever.
- the **ABox** (instance triples) streams: the four lookup tables are
  broadcast via ``ray.put`` once and each batch derives its inferences
  with vectorized pandas ``merge`` joins (NUL-safe — merge does not use
  the C-string hash table, see CLAUDE.md). Per-batch fan-out is bounded
  by the TBox hierarchy depth, never corpus-sized.
- the only corpus-scale shuffle is the final exact dedup of
  input ∪ inferred, hash-routed into ``num_partitions`` bounded
  partitions with one vectorized ``drop_duplicates`` each (the repo-wide
  bounded-partition idiom; never ``groupby`` on unbounded triple keys).

Rules materialized (premises → conclusion):

- (a sc b), (b sc c)            → (a sc c)                 [transitivity]
- (p sp q), (q sp r)            → (p sp r)                 [transitivity]
- (s type A), (A sc B)          → (s type B)
- (s p o),   (p sp q)           → (s q o)
- (s p o),   (p dom C)          → (s type C)
- (s p o),   (p range C), o IRI → (o type C)

plus their compositions (e.g. (s p o), (p sp q), (q dom C), (C sc D)
→ (s type D)) via the driver-side closure of the lookup tables.
Literal objects never become subjects of inferred type triples (range
typing skips them — this engine types nodes, not literals).
"""

from __future__ import annotations

from collections import deque

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ..shuffle_utils import drop_duplicates_nul_safe as _ddsafe

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_SUBPROP = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"

_SCHEMA_PREDS = (RDFS_SUBCLASS, RDFS_SUBPROP, RDFS_DOMAIN, RDFS_RANGE)

_COLS = ["subj", "pred", "obj", "obj_is_literal"]


def _reachable(edges: dict[str, set[str]]) -> dict[str, set[str]]:
    """node → every node reachable via ≥1 edge (BFS; cycles fine — a
    node on a cycle reaches itself, which is exactly the entailment)."""
    out: dict[str, set[str]] = {}
    for start, firsts in edges.items():
        seen: set[str] = set()
        dq = deque(firsts)
        while dq:
            n = dq.popleft()
            if n in seen:
                continue
            seen.add(n)
            dq.extend(edges.get(n, ()))
        out[start] = seen
    return out


def _closure_tables(tbox: list[tuple[str, str]]):
    """Compose the driver-side closure of a TBox into flat lookup
    DataFrames. ``tbox`` rows are (pred, subj, obj) restricted to the
    four RDFS predicates. Returns (sp_df, dom_df, range_df, sc_df,
    schema_rows):

    - sp_df:    (pred, new_pred)  — strict super-properties, sp-closed
    - dom_df:   (pred, cls)       — effective domain types, sp+sc-closed
    - range_df: (pred, cls)       — effective range types,  sp+sc-closed
    - sc_df:    (cls, super_cls)  — strict superclasses, sc-closed
    - schema_rows: the transitive sc/sp arcs themselves, as triples
    """
    sc_edges: dict[str, set[str]] = {}
    sp_edges: dict[str, set[str]] = {}
    dom: dict[str, set[str]] = {}
    rng: dict[str, set[str]] = {}
    for p, s, o in tbox:
        if p == RDFS_SUBCLASS:
            sc_edges.setdefault(s, set()).add(o)
        elif p == RDFS_SUBPROP:
            sp_edges.setdefault(s, set()).add(o)
        elif p == RDFS_DOMAIN:
            dom.setdefault(s, set()).add(o)
        elif p == RDFS_RANGE:
            rng.setdefault(s, set()).add(o)

    sc_up = _reachable(sc_edges)   # class → strict supers (≥1 edge)
    sp_up = _reachable(sp_edges)   # pred  → strict super-preds

    def sc_closed(classes: set[str]) -> set[str]:
        out = set(classes)
        for c in classes:
            out |= sc_up.get(c, set())
        return out

    # effective dom/range: walk up sp first, then close the found
    # classes under sc — this is the rule-interplay composition
    preds = set(sp_up) | set(dom) | set(rng)
    eff_dom: dict[str, set[str]] = {}
    eff_rng: dict[str, set[str]] = {}
    for p in preds:
        ps = {p} | sp_up.get(p, set())
        d = set().union(*(dom.get(q, set()) for q in ps)) if ps else set()
        r = set().union(*(rng.get(q, set()) for q in ps)) if ps else set()
        if d:
            eff_dom[p] = sc_closed(d)
        if r:
            eff_rng[p] = sc_closed(r)

    def flat(m: dict[str, set[str]], a: str, b: str,
             drop_self: bool = False) -> pd.DataFrame:
        ka, kb = [], []
        for k, vs in m.items():
            for v in sorted(vs):
                if drop_self and v == k:
                    continue
                ka.append(k)
                kb.append(v)
        return pd.DataFrame({a: ka, b: kb}, dtype=object)

    sp_df = flat(sp_up, "pred", "new_pred", drop_self=True)
    dom_df = flat(eff_dom, "pred", "cls")
    range_df = flat(eff_rng, "pred", "cls")
    sc_df = flat(sc_up, "cls", "super_cls", drop_self=True)

    schema_rows = [(s, RDFS_SUBCLASS, o, False)
                   for s, vs in sc_up.items() for o in sorted(vs)]
    schema_rows += [(s, RDFS_SUBPROP, o, False)
                    for s, vs in sp_up.items() for o in sorted(vs)]
    return sp_df, dom_df, range_df, sc_df, schema_rows


def _collect_tbox(triples, max_tbox: int) -> list[tuple[str, str, str]]:
    """Stream-filter the schema triples out of the Dataset (the filter
    runs inside map_batches; only vocabulary-sized rows reach the
    driver, guarded by ``max_tbox``)."""
    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_in(batch["pred"], value_set=pa.array(_SCHEMA_PREDS)),
            pc.invert(batch["obj_is_literal"].combine_chunks()),
        )
        t = batch.filter(mask)
        return pa.table({"pred": t["pred"], "subj": t["subj"],
                         "obj": t["obj"]})

    small = triples.map_batches(keep, batch_format="pyarrow")
    rows = small.limit(max_tbox + 1).take_all()
    if len(rows) > max_tbox:
        raise ValueError(
            f"TBox exceeds max_tbox={max_tbox} schema triples; a schema "
            "this large cannot be broadcast — raise max_tbox only if it "
            "still fits in worker heaps"
        )
    return [(r["pred"], r["subj"], r["obj"]) for r in rows]


def materialize_rdfs(triples, *, tbox: list[tuple[str, str, str]] | None
                     = None, num_partitions: int = 32,
                     max_tbox: int = 2_000_000):
    """Forward-materialize RDFS (ρdf) entailment over a triple Dataset
    ``(subj, pred, obj, obj_is_literal)``. Returns the entailed set —
    input ∪ inferred, exactly deduplicated — with the same schema.

    ``tbox``: optional explicit schema as (subj, pred, obj) tuples
    (restricted to the four RDFS predicates; others are ignored). When
    omitted the schema is collected from the Dataset itself. The
    explicit form serves stores that keep their ontology out-of-band.
    """
    import ray
    import ray.data as rd

    from ..shuffle_utils import add_partition_id

    if tbox is None:
        tb = _collect_tbox(triples, max_tbox)
    else:
        tb = [(p, s, o) for (s, p, o) in tbox if p in _SCHEMA_PREDS]
    sp_df, dom_df, range_df, sc_df, schema_rows = _closure_tables(tb)
    if tbox is not None:
        # an out-of-band schema drives inference but is not itself data:
        # its (closure) arcs are never asserted into the entailed set
        schema_rows = []

    tables_ref = ray.put((sp_df, dom_df, range_df, sc_df))

    def infer(batch: pd.DataFrame) -> pd.DataFrame:
        # emits the INPUT rows too: the entailed set is input ∪
        # inferred, and emitting both from one pass keeps the input
        # lineage single-consumer (a Dataset consumed twice re-executes
        # its whole upstream lineage twice — the pack_sequences lesson)
        sp, dm, rg, sc = ray.get(tables_ref)
        outs = [batch[_COLS]]
        if len(sp):
            m = batch.merge(sp, on="pred", how="inner")
            if len(m):
                outs.append(pd.DataFrame({
                    "subj": m["subj"], "pred": m["new_pred"],
                    "obj": m["obj"],
                    "obj_is_literal": m["obj_is_literal"]}))
        if len(dm):
            m = batch.merge(dm, on="pred", how="inner")
            if len(m):
                outs.append(pd.DataFrame({
                    "subj": m["subj"], "pred": RDF_TYPE, "obj": m["cls"],
                    "obj_is_literal": False}))
        iri_obj = batch[~batch["obj_is_literal"]]
        if len(rg) and len(iri_obj):
            m = iri_obj.merge(rg, on="pred", how="inner")
            if len(m):
                outs.append(pd.DataFrame({
                    "subj": m["obj"], "pred": RDF_TYPE, "obj": m["cls"],
                    "obj_is_literal": False}))
        typed = iri_obj[iri_obj["pred"] == RDF_TYPE]
        if len(sc) and len(typed):
            m = typed.merge(sc, left_on="obj", right_on="cls", how="inner")
            if len(m):
                outs.append(pd.DataFrame({
                    "subj": m["subj"], "pred": RDF_TYPE,
                    "obj": m["super_cls"], "obj_is_literal": False}))
        out = pd.concat(outs, ignore_index=True)
        # in-batch dedup before the shuffle (NUL-safe)
        return _ddsafe(out, ignore_index=True)

    unioned = triples.map_batches(infer, batch_format="pandas")
    if schema_rows:
        unioned = unioned.union(rd.from_pandas(
            pd.DataFrame(schema_rows, columns=_COLS)))

    # exact global dedup: route by a deterministic composite key into
    # bounded partitions (equal triples always share a key; unequal
    # triples colliding merely co-locate, which only affects balance)
    def route(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            batch["subj"], batch["pred"], batch["obj"],
            pc.cast(pc.cast(batch["obj_is_literal"], pa.int8()),
                    pa.string()),
            "\x1f",
        )
        b = batch.append_column("__route_key", key)
        b = add_partition_id(b, key="__route_key",
                             num_partitions=num_partitions,
                             col="__rdfs_pid")
        return b.drop_columns(["__route_key"])

    def dedup_partition(df: pd.DataFrame) -> pd.DataFrame:
        return _ddsafe(df, subset=_COLS,
                                  ignore_index=True)[_COLS]

    dedup_partition.__name__ = "dedup_partition"
    return (
        unioned.map_batches(route, batch_format="pyarrow")
        .groupby("__rdfs_pid")
        .map_groups(dedup_partition, batch_format="pandas")
    )


def naive_rdfs_closure(triples: list[tuple[str, str, str, bool]]
                       ) -> set[tuple[str, str, str, bool]]:
    """Reference oracle: fixpoint iteration of the raw rule set over
    Python sets. Exponentially dumber than :func:`materialize_rdfs` —
    exists so tests can check the one-pass composition against true
    semi-naive semantics on small inputs."""
    facts = set(triples)
    while True:
        new = set()
        sc = {(s, o) for s, p, o, lit in facts
              if p == RDFS_SUBCLASS and not lit}
        sp = {(s, o) for s, p, o, lit in facts
              if p == RDFS_SUBPROP and not lit}
        dom = {(s, o) for s, p, o, lit in facts
               if p == RDFS_DOMAIN and not lit}
        rng = {(s, o) for s, p, o, lit in facts
               if p == RDFS_RANGE and not lit}
        for a, b in sc:
            for c, d in sc:
                if b == c:
                    new.add((a, RDFS_SUBCLASS, d, False))
        for a, b in sp:
            for c, d in sp:
                if b == c:
                    new.add((a, RDFS_SUBPROP, d, False))
        for s, p, o, lit in facts:
            for q, r in sp:
                if p == q:
                    new.add((s, r, o, lit))
            for q, c in dom:
                if p == q:
                    new.add((s, RDF_TYPE, c, False))
            for q, c in rng:
                if p == q and not lit:
                    new.add((o, RDF_TYPE, c, False))
            if p == RDF_TYPE and not lit:
                for a, b in sc:
                    if o == a:
                        new.add((s, RDF_TYPE, b, False))
        if new <= facts:
            return facts
        facts |= new
