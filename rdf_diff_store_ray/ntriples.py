"""Canonical N-Triples serialization, parsing, and digests.

This is the engine's analog of the reference's external "prettifier"
(``/root/reference/src/rdf.rs:29-84``): a deterministic canonical text form
such that re-serializing an unchanged graph yields *byte-identical* text,
which is what makes no-op suppression (``src/graphs.rs:52-61``) and the
digest-based delta log work.

Canonical form:
- every triple on one line: ``<subj> <pred> <obj> .`` or
  ``<subj> <pred> "literal" .``; blank nodes appear as ``_:label``
  terms in subject/object position with content-addressed canonical
  labels (:func:`canonicalize_bnodes`)
- strings NFC-normalized; literals escaped per N-Triples rules
  (``\\`` ``"`` ``\\n`` ``\\r`` ``\\t``)
- lines sorted lexicographically (bytewise) and deduplicated — the set-union
  semantics of the reference's merged store (``src/query.rs:127-139``:
  oxigraph dedups identical triples)
- joined with ``\\n`` and terminated with a single trailing ``\\n``;
  the empty graph serializes to ``""``

No third-party RDF library is used (none is available in the sandbox); the
parser is scoped to exactly this canonical subset.
"""

from __future__ import annotations

import hashlib
import re
import unicodedata

# Typed literals ("5"^^<dt-iri>) and language-tagged literals ("x"@en)
# are carried in the 4-tuple/columnar form as a DECORATED object string:
# the full canonical literal token (quotes + suffix) with
# obj_is_literal=True. Plain literals stay raw values, so their canonical
# bytes (and every existing digest) are unchanged. The strict shape check
# below is what keeps the encoding unambiguous: a *plain* literal whose
# value merely resembles a decorated token fails the escape discipline
# test only if it IS a well-formed token, which the serializer then
# emits identically — the two readings produce the same canonical line.
_DECORATED_RE = re.compile(
    r'^"(?:[^"\\\n\r\t]|\\["\\nrt])*"'
    r'(?:\^\^<[^<>"\s{}|^`\\]+>|@[A-Za-z]+(?:-[A-Za-z0-9]+)*)$'
)

_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}
_UNESCAPES = {v: k for k, v in _ESCAPES.items()}


def escape_literal(value: str) -> str:
    value = unicodedata.normalize("NFC", value)
    out = []
    for ch in value:
        out.append(_ESCAPES.get(ch, ch))
    return "".join(out)


def unescape_literal(value: str) -> str:
    out = []
    i, n = 0, len(value)
    while i < n:
        ch = value[i]
        if ch == "\\" and i + 1 < n:
            pair = value[i : i + 2]
            if pair in _UNESCAPES:
                out.append(_UNESCAPES[pair])
                i += 2
                continue
        out.append(ch)
        i += 1
    return "".join(out)


def is_decorated_literal(obj: str) -> bool:
    """True when ``obj`` is a full typed/lang-tagged literal token."""
    return bool(_DECORATED_RE.match(obj))


def literal_parts(obj: str):
    """Split a literal object into ``(lexical_value, suffix)`` where
    suffix is ``''`` (plain), ``'@lang'`` or ``'^^<iri>'``."""
    if is_decorated_literal(obj):
        j = obj.rindex('"')
        return unescape_literal(obj[1:j]), obj[j + 1 :]
    return obj, ""


def is_blank(term: str) -> bool:
    """``_:label`` terms are blank nodes. Unambiguous vs IRIs: an IRI
    scheme must start with a letter (RFC 3986), so no IRI begins ``_:``."""
    return term.startswith("_:")


def format_line(subj: str, pred: str, obj: str, obj_is_literal: bool) -> str:
    """One canonical N-Triples line (without trailing newline).

    NOTE (reserved shape): a PLAIN literal whose raw value is itself a
    well-formed decorated token (e.g. the 8-char string ``"5"^^<d>``)
    is emitted as that typed literal — the 4-tuple form cannot
    distinguish the two readings. Parser-produced objects are always
    safe; callers constructing tuples programmatically must not pass
    plain-literal values matching ``_DECORATED_RE`` (documented at the
    ``append_graphs`` surface)."""
    if obj_is_literal:
        if is_decorated_literal(obj):
            o = unicodedata.normalize("NFC", obj)
        else:
            o = f'"{escape_literal(obj)}"'
    elif is_blank(obj):
        o = unicodedata.normalize("NFC", obj)
    else:
        o = f"<{unicodedata.normalize('NFC', obj)}>"
    s = unicodedata.normalize("NFC", subj)
    if not is_blank(subj):
        s = f"<{s}>"
    p = unicodedata.normalize("NFC", pred)
    return f"{s} <{p}> {o} ."


def serialize(triples, canonical_bnode_labels: bool = True) -> str:
    """Canonical N-Triples document from an iterable of
    ``(subj, pred, obj, obj_is_literal)``. Sorted + deduped; '' if empty.

    Blank-node labels are rewritten to content-addressed canonical labels
    (see :func:`canonicalize_bnodes`) so two label-renamings of one graph
    serialize byte-identically — required for digest-based no-op
    suppression. Idempotent: canonical labels re-canonicalize to
    themselves. Graphs without blank nodes pay one O(n) scan."""
    tl = [(s, p, o, bool(lit)) for (s, p, o, lit) in triples]
    if canonical_bnode_labels and any(
        is_blank(s) or (not lit and is_blank(o)) for (s, p, o, lit) in tl
    ):
        tl = canonicalize_bnodes(tl)
    lines = sorted({format_line(s, p, o, lit) for (s, p, o, lit) in tl})
    if not lines:
        return ""
    return "\n".join(lines) + "\n"


def canonicalize_bnodes(triples: list) -> list:
    """Deterministically relabel blank nodes by graph STRUCTURE, not by
    their input labels — a light Weisfeiler-Leman refinement (the idea
    behind RDF dataset canonicalization / URDNA2015, simplified):

    1. each blank node starts from the hash of its concrete edge
       signatures (direction, predicate, concrete-or-B placeholder);
    2. iterate: re-hash each node over its neighbors' current hashes
       until the hash partition stops refining (≤ #bnodes rounds);
    3. while hash classes still contain >1 node (automorphic-looking
       groups, e.g. a label cycle), INDIVIDUALIZE one member of the
       smallest tied class and re-refine — for genuinely automorphic
       ties the choice is immaterial (any member yields the identical
       canonical line set), so the result is invariant under input
       statement reordering; for the rare WL-undistinguishable but
       non-automorphic structures (strongly-regular-like graphs) the
       output is still deterministic for a given statement SET;
    4. labels come from the final (now unique) hashes (``_:c<hash16>``).

    Tree-shaped anonymous nodes — the DCAT-catalog shape the reference
    stores (``/root/reference/src/query.rs:117-145`` accepts arbitrary
    Turtle) — are always fully distinguished.

    An RDF graph is a SET of triples, and canonical serialization dedups
    lines — so signatures must be computed over the deduped set or a
    repeated input triple would perturb labels and break the
    serialize→parse→serialize fixpoint. Dedup preserves first-occurrence
    order."""
    triples = list(dict.fromkeys(
        (s, p, o, bool(lit)) for (s, p, o, lit) in triples
    ))
    bnodes: dict[str, list] = {}
    for i, (s, p, o, lit) in enumerate(triples):
        if is_blank(s):
            bnodes.setdefault(s, []).append((i, "out"))
        if not lit and is_blank(o):
            bnodes.setdefault(o, []).append((i, "in"))
    if not bnodes:
        return triples

    def h(parts) -> str:
        return hashlib.sha256("\x1f".join(parts).encode("utf-8")).hexdigest()

    def signature(node: str, cur: dict) -> str:
        sigs = []
        for i, direction in bnodes[node]:
            s, p, o, lit = triples[i]
            if direction == "out":
                other = o
                other_blank = not lit and is_blank(o)
                kind = "L" if lit else "I"
            else:
                other, other_blank, kind = s, is_blank(s), "I"
            rep = cur[other] if other_blank and other != node else (
                "SELF" if other == node else kind + other
            )
            sigs.append(f"{direction}|{p}|{rep}")
        # a node's refined hash must fold in its OWN current hash (proper
        # WL) — otherwise an individualization mark would vanish on the
        # next round and tied classes could never be split
        return h([cur[node]] + sorted(sigs))

    def refine(cur: dict) -> dict:
        n_classes = len(set(cur.values()))
        for _ in range(len(bnodes)):
            nxt = {b: signature(b, cur) for b in bnodes}
            n_nxt = len(set(nxt.values()))
            cur = nxt
            if n_nxt == n_classes:
                return cur
            n_classes = n_nxt
        return cur

    cur = refine({b: "B" for b in bnodes})
    # individualization-refinement until the partition is discrete: pick
    # the lexicographically-smallest tied hash class (deterministic) and
    # individualize one member — automorphic members are interchangeable,
    # so which one is picked cannot change the resulting line set
    for round_no in range(len(bnodes)):
        classes: dict[str, list] = {}
        for b in bnodes:
            classes.setdefault(cur[b], []).append(b)
        tied = sorted(h_ for h_, ms in classes.items() if len(ms) > 1)
        if not tied:
            break
        pick = classes[tied[0]][0]
        cur = dict(cur)
        cur[pick] = h([cur[pick], f"IND{round_no}"])
        cur = refine(cur)
    # hashes are unique now (the loop bound guarantees ≤ #bnodes rounds);
    # fall back to full hashes on a 64-bit prefix collision
    mapping = {b: f"_:c{cur[b][:16]}" for b in bnodes}
    if len(set(mapping.values())) < len(mapping):
        mapping = {b: f"_:c{cur[b]}" for b in bnodes}
    return [
        (
            mapping.get(s, s),
            p,
            mapping.get(o, o) if not lit else o,
            lit,
        )
        for (s, p, o, lit) in triples
    ]


def parse(text: str):
    """Parse a canonical N-Triples document back into
    ``[(subj, pred, obj, obj_is_literal)]``. Inverse of :func:`serialize`
    for documents it produced."""
    out = []
    for line in text.split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if not line.endswith(" ."):
            raise ValueError(f"not a canonical N-Triples line: {line!r}")
        body = line[:-2]
        if body.startswith("_:"):
            sp = body.find(" ")
            if sp < 0:
                raise ValueError(f"bad blank subject in: {line!r}")
            subj = body[:sp]
            rest = body[sp + 1 :].lstrip()
        elif body.startswith("<"):
            si = body.index(">")
            subj = body[1:si]
            rest = body[si + 1 :].lstrip()
        else:
            raise ValueError(f"bad subject in: {line!r}")
        if not rest.startswith("<"):
            raise ValueError(f"bad predicate in: {line!r}")
        pi = rest.index(">")
        pred = rest[1:pi]
        orest = rest[pi + 1 :].lstrip()
        if orest.startswith("<"):
            obj = orest[1:-1]
            if not orest.endswith(">"):
                raise ValueError(f"bad object IRI in: {line!r}")
            out.append((subj, pred, obj, False))
        elif orest.startswith('"'):
            # find the closing quote (escape-aware), then the suffix
            j, n = 1, len(orest)
            while j < n:
                if orest[j] == "\\":
                    j += 2
                    continue
                if orest[j] == '"':
                    break
                j += 1
            if j >= n:
                raise ValueError(f"bad literal in: {line!r}")
            suffix = orest[j + 1 :]
            if suffix == "":
                out.append((subj, pred, unescape_literal(orest[1:-1]), True))
            elif is_decorated_literal(orest):
                # typed / lang-tagged: keep the full token as the object
                out.append((subj, pred, orest, True))
            else:
                raise ValueError(f"bad literal suffix in: {line!r}")
        elif orest.startswith("_:"):
            if " " in orest:
                raise ValueError(f"bad blank object in: {line!r}")
            out.append((subj, pred, orest, False))
        else:
            raise ValueError(f"bad object in: {line!r}")
    return out


def sha256_text(text: str) -> bytes:
    return hashlib.sha256(text.encode("utf-8")).digest()


def sha256_bytes(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()


def graph_filename(graph_id: str) -> str:
    """Filesystem-safe name for a graph id — the reference's encoding:
    ``base64(id)`` with ``/``→``_``, ``+``→``-``, suffix ``.ttl``
    (``/root/reference/src/graphs.rs:42-45``). Kept for parity; partition
    files here are keyed by hash, but hostile ids (e.g. ``"<#/(%¤=:"``,
    ``tests/integration_test.rs:22``) must round-trip."""
    import base64

    enc = base64.b64encode(graph_id.encode("utf-8")).decode("ascii")
    return enc.replace("/", "_").replace("+", "-") + ".ttl"


def graph_id_from_filename(name: str) -> str:
    import base64

    if not name.endswith(".ttl"):
        raise ValueError(name)
    enc = name[:-4].replace("_", "/").replace("-", "+")
    return base64.b64decode(enc.encode("ascii")).decode("utf-8")
