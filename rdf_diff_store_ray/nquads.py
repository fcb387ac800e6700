"""N-Quads codec: the graph-tagged interop format of the quad view.

The store's named graphs are arbitrary source ids (urls, including the
reference's hostile ids with spaces/``<``/``%``, `tests/it.rs:22`), but
an N-Quads graph label must be an IRI — so ids that are not clean
absolute IRIs are carried as ``graph:<percent-encoded-id>`` (reversible;
``quote``/``unquote`` are exact inverses). Ids beginning ``graph:`` are
reserved for this encoding and always decoded back.

Line shape: ``<s> <p> (obj) <g> .`` — the triple part is exactly the
canonical N-Triples line (:func:`..ntriples.format_line`), so quad text
inherits the store's canonical bytes; the graph term never contains
whitespace, which keeps parsing a right-split.
"""

from __future__ import annotations

import re
from urllib.parse import quote, unquote

from . import ntriples

_CLEAN_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://[^\s<>\"{}|^`\\]+$")


def graph_iri(graph_id: str) -> str:
    """Graph id → N-Quads graph IRI (identity for clean absolute IRIs,
    ``graph:``-encoded otherwise)."""
    if _CLEAN_IRI.match(graph_id) and not graph_id.startswith("graph:"):
        return graph_id
    return "graph:" + quote(graph_id, safe="")


def graph_id_from_iri(iri: str) -> str:
    """Inverse of :func:`graph_iri`."""
    if iri.startswith("graph:"):
        return unquote(iri[len("graph:"):])
    return iri


def format_quad_line(graph_id: str, subj: str, pred: str, obj: str,
                     obj_is_literal: bool) -> str:
    base = ntriples.format_line(subj, pred, obj, obj_is_literal)
    assert base.endswith(" .")
    return f"{base[:-2]} <{graph_iri(graph_id)}> ."


def serialize_nquads(quads) -> str:
    """``[(graph_id, subj, pred, obj, is_lit)]`` → canonical N-Quads:
    sorted, deduped, trailing newline; empty input → ""."""
    lines = sorted({format_quad_line(*q) for q in quads})
    return "\n".join(lines) + "\n" if lines else ""


def parse_quad_line(line: str):
    """One N-Quads line → ``(graph_id, subj, pred, obj, is_lit)``."""
    line = line.strip()
    if not line.endswith(" ."):
        raise ValueError(f"not an N-Quads line: {line!r}")
    body, gterm = line[:-2].rstrip().rsplit(" ", 1)
    if not (gterm.startswith("<") and gterm.endswith(">")):
        raise ValueError(f"bad graph term {gterm!r} in: {line!r}")
    (s, p, o, lit), = ntriples.parse(body + " .")
    return (graph_id_from_iri(gterm[1:-1]), s, p, o, lit)


def parse_nquads(text: str):
    """Canonical N-Quads document → quad list (inverse of
    :func:`serialize_nquads` for documents it produced)."""
    out = []
    for line in text.split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        out.append(parse_quad_line(line))
    return out
