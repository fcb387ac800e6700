"""Canonical N-Triples serialization, parsing, and digests.

This is the engine's analog of the reference's external "prettifier"
(``/root/reference/src/rdf.rs:29-84``): a deterministic canonical text form
such that re-serializing an unchanged graph yields *byte-identical* text,
which is what makes no-op suppression (``src/graphs.rs:52-61``) and the
digest-based delta log work.

Canonical form:
- every triple on one line: ``<subj> <pred> <obj> .`` or
  ``<subj> <pred> "literal" .``
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


def format_line(subj: str, pred: str, obj: str, obj_is_literal: bool) -> str:
    """One canonical N-Triples line (without trailing newline)."""
    if obj_is_literal:
        if is_decorated_literal(obj):
            o = unicodedata.normalize("NFC", obj)
        else:
            o = f'"{escape_literal(obj)}"'
    else:
        o = f"<{unicodedata.normalize('NFC', obj)}>"
    s = unicodedata.normalize("NFC", subj)
    p = unicodedata.normalize("NFC", pred)
    return f"<{s}> <{p}> {o} ."


def serialize(triples) -> str:
    """Canonical N-Triples document from an iterable of
    ``(subj, pred, obj, obj_is_literal)``. Sorted + deduped; '' if empty."""
    lines = sorted({format_line(s, p, o, lit) for (s, p, o, lit) in triples})
    if not lines:
        return ""
    return "\n".join(lines) + "\n"


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
        if not body.startswith("<"):
            raise ValueError(f"bad subject in: {line!r}")
        si = body.index(">")
        subj = body[1:si]
        rest = body[si + 1 :].lstrip()
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
