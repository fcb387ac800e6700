"""Turtle ingestion: parse RDF Turtle into the canonical triple form.

The reference's store holds Turtle documents — its merge explicitly
carries ``@prefix`` headers across graphs
(``/root/reference/src/query.rs:148-169``, first-line split at
``:159``) — while this engine's canonical form is prefix-free
N-Triples. This module closes the ingestion gap: real ``.ttl`` content
from a reference-style store parses into ``(subj, pred, obj,
obj_is_literal)`` tuples (typed / lang-tagged literals as the decorated
tokens of :mod:`rdf_diff_store_ray.ntriples`), after which
``ntriples.serialize`` yields the canonical document.

Scope (everything the reference's observable graphs use; no external RDF
library exists in the sandbox):

- ``@prefix`` / SPARQL-style ``PREFIX`` directives, ``@base``/``BASE``
- prefixed names (``ns:local``, ``:local``) and ``a`` →  ``rdf:type``
- predicate lists (``;``) and object lists (``,``)
- literals: plain, ``@lang``, ``^^<iri>`` / ``^^ns:local`` typed, and the
  numeric / boolean shorthands (``5`` → xsd:integer, ``5.0`` →
  xsd:decimal, ``5e0`` → xsd:double, ``true``/``false`` → xsd:boolean)
- comments, arbitrary whitespace, ``\\uXXXX`` / ``\\UXXXXXXXX`` escapes
- blank nodes: ``_:label`` terms, anonymous ``[ ... ]`` property lists
  (nested) and ``( ... )`` collections (desugared to
  ``rdf:first``/``rdf:rest`` chains). All labels — written and
  generated — are rewritten to deterministic content-addressed
  canonical labels (``ntriples.canonicalize_bnodes``) so the canonical
  bytes don't depend on input label spelling or statement order.
"""

from __future__ import annotations

import re
import unicodedata

from .ntriples import escape_literal

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = _RDF_NS + "type"
RDF_FIRST = _RDF_NS + "first"
RDF_REST = _RDF_NS + "rest"
RDF_NIL = _RDF_NS + "nil"
XSD = "http://www.w3.org/2001/XMLSchema#"

_PNAME_RE = re.compile(r"^([A-Za-z_][\w.\-]*)?:([\w.\-]*)$")
# absolute IRI = has a scheme (RFC 3986: ALPHA *( ALPHA / DIGIT / + / - / . ) ':')
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
# BCP-47-shaped language tags, same grammar as ntriples._DECORATED_RE
_LANG_RE = re.compile(r"^[A-Za-z]+(-[A-Za-z0-9]+)*$")
_NUM_INT_RE = re.compile(r"^[+-]?\d+$")
_NUM_DEC_RE = re.compile(r"^[+-]?\d*\.\d+$")
_NUM_DBL_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")

_STRING_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


class _Tokenizer:
    """Hand-rolled scanner: yields (kind, value) with kind in
    ``iri | literal | pname | punct | word``. Literal values are
    ``(lexical, lang, datatype_token)`` where datatype_token is an IRI
    or pname string, unresolved."""

    def __init__(self, text: str):
        self.s = text
        self.i = 0
        self.n = len(text)

    def _skip_ws(self):
        s, n = self.s, self.n
        while self.i < n:
            c = s[self.i]
            if c.isspace():
                self.i += 1
            elif c == "#":
                j = s.find("\n", self.i)
                self.i = n if j < 0 else j + 1
            else:
                return

    def tokens(self):
        s = self.s
        while True:
            self._skip_ws()
            if self.i >= self.n:
                return
            c = s[self.i]
            if c == "<":
                j = s.index(">", self.i)
                yield ("iri", s[self.i + 1 : j])
                self.i = j + 1
            elif c in "\"'":
                yield ("literal", self._read_literal())
            elif c in ".;,[]()":
                yield ("punct", c)
                self.i += 1
            else:
                j = self.i
                while j < self.n and not s[j].isspace() and s[j] not in ";,)]":
                    # a pname/keyword may END with '.' only as statement dot
                    j += 1
                word = s[self.i : j]
                # a trailing '.' that isn't part of a number/pname local
                # part is the statement terminator
                while word.endswith(".") and not (
                    _NUM_DEC_RE.match(word) or _NUM_DBL_RE.match(word)
                    or (_PNAME_RE.match(word) and not word.endswith("."))
                ):
                    word = word[:-1]
                    j -= 1
                yield ("word", word)
                self.i = j

    def _read_literal(self):
        s, n = self.s, self.n
        quote = s[self.i]
        long = s[self.i : self.i + 3] == quote * 3
        self.i += 3 if long else 1
        out = []
        while True:
            if self.i >= n:
                raise ValueError("unterminated literal")
            c = s[self.i]
            if c == "\\":
                e = s[self.i + 1]
                if e == "u":
                    out.append(chr(int(s[self.i + 2 : self.i + 6], 16)))
                    self.i += 6
                elif e == "U":
                    out.append(chr(int(s[self.i + 2 : self.i + 10], 16)))
                    self.i += 10
                elif e in _STRING_ESCAPES:
                    out.append(_STRING_ESCAPES[e])
                    self.i += 2
                else:
                    raise ValueError(f"bad escape \\{e}")
            elif long and s[self.i : self.i + 3] == quote * 3:
                self.i += 3
                break
            elif not long and c == quote:
                self.i += 1
                break
            else:
                out.append(c)
                self.i += 1
        lex = "".join(out)
        lang = dtype = None
        if s[self.i : self.i + 1] == "@":
            j = self.i + 1
            while j < n and (s[j].isalnum() or s[j] == "-"):
                j += 1
            lang = s[self.i + 1 : j]
            # must satisfy the same grammar ntriples._DECORATED_RE
            # enforces, or the decorated token would silently degrade to
            # a re-escaped plain literal downstream (data corruption)
            if not _LANG_RE.match(lang):
                raise ValueError(f"bad language tag: @{lang!r}")
            self.i = j
        elif s[self.i : self.i + 2] == "^^":
            self.i += 2
            if s[self.i] == "<":
                j = s.index(">", self.i)
                dtype = ("iri", s[self.i + 1 : j])
                self.i = j + 1
            else:
                j = self.i
                while j < n and not s[j].isspace() and s[j] not in ".;,":
                    j += 1
                dtype = ("pname", s[self.i : j])
                self.i = j
        return (lex, lang, dtype)


class TurtleParser:
    def __init__(self, text: str):
        self.toks = list(_Tokenizer(text).tokens())
        self.pos = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.out: list = []
        self._bnode_n = 0

    def _new_bnode(self) -> str:
        """Fresh anonymous node. Generated labels (``_:g<n>``) and mapped
        written labels (``_:u<label>``) live in disjoint namespaces, so a
        document writing ``_:g1`` cannot collide; all labels are replaced
        by canonical content-addressed ones at the end of :meth:`parse`."""
        self._bnode_n += 1
        return f"_:g{self._bnode_n}"

    def _peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def _next(self):
        t = self._peek()
        if t is None:
            raise ValueError("unexpected end of Turtle document")
        self.pos += 1
        return t

    def _resolve_iri(self, raw: str) -> str:
        # absoluteness = a real scheme (mailto:, did:, tel:, urn: … are
        # absolute without '://'); relative refs resolve per RFC 3986
        if _SCHEME_RE.match(raw) or not self.base:
            return raw
        from urllib.parse import urljoin

        return urljoin(self.base, raw)

    def _resolve_pname(self, word: str) -> str:
        m = _PNAME_RE.match(word)
        if not m:
            raise ValueError(f"not a prefixed name: {word!r}")
        ns = self.prefixes.get(m.group(1) or "")
        if ns is None:
            raise ValueError(f"undefined prefix in {word!r}")
        return ns + m.group(2)

    def _resolve_term_iri(self, tok) -> str:
        kind, val = tok
        if kind == "iri":
            return self._resolve_iri(val)
        if kind == "word":
            return self._resolve_pname(val)
        raise ValueError(f"expected IRI or prefixed name, got {tok!r}")

    def parse(self):
        while self._peek() is not None:
            kind, val = self._peek()
            if kind == "word" and val.lower() in ("@prefix", "prefix"):
                self._directive_prefix()
            elif kind == "word" and val.lower() in ("@base", "base"):
                self._directive_base()
            else:
                self._statement()
        if self._bnode_n or any(
            s.startswith("_:") for (s, _, _, _) in self.out
        ):
            from .ntriples import canonicalize_bnodes

            self.out = canonicalize_bnodes(self.out)
        return self.out

    def _expect_dot(self):
        t = self._next()
        if t != ("punct", "."):
            raise ValueError(f"expected '.', got {t!r}")

    def _directive_prefix(self):
        at = self._next()[1].lower()
        name = self._next()
        if name[0] != "word" or not name[1].endswith(":"):
            raise ValueError(f"bad @prefix name: {name!r}")
        iri = self._next()
        if iri[0] != "iri":
            raise ValueError(f"bad @prefix IRI: {iri!r}")
        self.prefixes[name[1][:-1]] = self._resolve_iri(iri[1])
        if at == "@prefix":  # SPARQL-style PREFIX takes no dot
            self._expect_dot()

    def _directive_base(self):
        at = self._next()[1].lower()
        iri = self._next()
        if iri[0] != "iri":
            raise ValueError(f"bad @base IRI: {iri!r}")
        self.base = iri[1]
        if at == "@base":
            self._expect_dot()

    def _statement(self):
        if self._peek() == ("punct", "["):
            self._next()
            subj = self._bnode_property_list()
            # a bare blankNodePropertyList statement: `[ p o ] .`
            if self._peek() == ("punct", "."):
                self._next()
                return
            self._predicate_object_list(subj, ("punct", "."))
            return
        subj_tok = self._next()
        if subj_tok[0] == "word" and subj_tok[1].startswith("_:"):
            subj = "_:u" + subj_tok[1][2:]
        else:
            subj = self._resolve_term_iri(subj_tok)
        self._predicate_object_list(subj, ("punct", "."))

    def _predicate_object_list(self, subj: str, end_tok):
        """``pred obj (, obj)* (; pred obj ...)* end`` — shared by
        statements (end ``.``) and ``[ ... ]`` property lists (end ``]``)."""
        while True:
            pred_tok = self._next()
            if pred_tok == ("word", "a"):
                pred = RDF_TYPE
            else:
                pred = self._resolve_term_iri(pred_tok)
            while True:  # object list
                self._object(subj, pred)
                t = self._next()
                if t == ("punct", ","):
                    continue
                break
            if t == ("punct", ";"):
                # trailing semicolons before the terminator are legal
                while self._peek() == ("punct", ";"):
                    self._next()
                if self._peek() == end_tok:
                    t = self._next()
                    break
                continue
            break
        if t != end_tok:
            raise ValueError(f"expected {end_tok[1]!r}, got {t!r}")

    def _bnode_property_list(self) -> str:
        """``[ predicateObjectList? ]`` (the ``[`` already consumed) →
        fresh blank node carrying the inner triples."""
        b = self._new_bnode()
        if self._peek() == ("punct", "]"):
            self._next()
            return b
        self._predicate_object_list(b, ("punct", "]"))
        return b

    def _collection(self) -> str:
        """``( obj ... )`` (the ``(`` already consumed) → rdf:first /
        rdf:rest chain; ``()`` is rdf:nil."""
        items = []
        while self._peek() != ("punct", ")"):
            items.append(self._object_term())
        self._next()  # consume ')'
        if not items:
            return RDF_NIL
        nodes = [self._new_bnode() for _ in items]
        for i, (b, (val, lit)) in enumerate(zip(nodes, items)):
            self.out.append((b, RDF_FIRST, val, lit))
            rest = nodes[i + 1] if i + 1 < len(nodes) else RDF_NIL
            self.out.append((b, RDF_REST, rest, False))
        return nodes[0]

    def _object(self, subj: str, pred: str):
        val, lit = self._object_term()
        self.out.append((subj, pred, val, lit))

    def _object_term(self):
        """One object → ``(canonical_value, is_literal)``; nested blank
        nodes / collections emit their own triples as a side effect."""
        tok = self._next()
        kind, val = tok
        if kind == "punct" and val == "[":
            return (self._bnode_property_list(), False)
        if kind == "punct" and val == "(":
            return (self._collection(), False)
        if kind == "iri":
            return (self._resolve_iri(val), False)
        if kind == "literal":
            lex, lang, dtype = val
            return (_decorate(lex, lang, dtype, self), True)
        # word: bnode label, pname, number, or boolean shorthand
        if val.startswith("_:"):
            return ("_:u" + val[2:], False)
        if val in ("true", "false"):
            return (_decorated_token(val, f"{XSD}boolean"), True)
        if _NUM_INT_RE.match(val):
            return (_decorated_token(val, f"{XSD}integer"), True)
        if _NUM_DEC_RE.match(val):
            return (_decorated_token(val, f"{XSD}decimal"), True)
        if _NUM_DBL_RE.match(val):
            return (_decorated_token(val, f"{XSD}double"), True)
        return (self._resolve_pname(val), False)


def _decorated_token(lex: str, dtype_iri: str) -> str:
    return f'"{escape_literal(lex)}"^^<{unicodedata.normalize("NFC", dtype_iri)}>'


def _decorate(lex: str, lang, dtype, parser: TurtleParser) -> str:
    """Literal → canonical object form: plain stays a raw value; lang /
    typed become decorated tokens (see ``ntriples._DECORATED_RE``)."""
    if lang:
        return f'"{escape_literal(lex)}"@{lang}'
    if dtype:
        kind, val = dtype
        iri = parser._resolve_iri(val) if kind == "iri" else parser._resolve_pname(val)
        if iri == f"{XSD}string":  # xsd:string == plain (RDF 1.1)
            return lex
        return _decorated_token(lex, iri)
    return lex


def parse_turtle(text: str):
    """Parse a Turtle document → ``[(subj, pred, obj, obj_is_literal)]``
    in the engine's canonical term forms. Canonical N-Triples documents
    are themselves valid Turtle, so this is a strict superset reader."""
    return TurtleParser(text).parse()


def turtle_to_canonical(text: str) -> str:
    """Turtle document → canonical N-Triples text (the prettifier step
    for reference-style ``.ttl`` input, ``src/rdf.rs:29-84`` analog)."""
    from .ntriples import serialize

    return serialize(parse_turtle(text))


def serialize_turtle(triples, prefixes: dict | None = None) -> str:
    """Inverse of :func:`parse_turtle`: prettified Turtle with sorted
    ``@prefix`` headers, ``a`` for rdf:type, pname compaction
    (longest-namespace match, conservative locals) and ``;``-grouped
    predicate lists per subject — the reference serves prettified Turtle
    (``src/query.rs:148-169``, ``src/rdf.rs:87-92``).

    Deterministic: blank labels are canonicalized and statements emitted
    in canonical N-Triples line order, so
    ``turtle_to_canonical(serialize_turtle(t)) == ntriples.serialize(t)``
    (prefix compaction is lossless)."""
    from .ntriples import (
        canonicalize_bnodes,
        escape_literal as esc,
        format_line,
        is_blank,
        is_decorated_literal,
    )

    prefixes = dict(prefixes or {})
    tl = [(s, p, o, bool(lit)) for (s, p, o, lit) in triples]
    if any(is_blank(s) or (not lit and is_blank(o)) for (s, p, o, lit) in tl):
        tl = canonicalize_bnodes(tl)
    uniq = {format_line(s, p, o, lit): (s, p, o, lit)
            for (s, p, o, lit) in tl}
    items = [uniq[k] for k in sorted(uniq)]
    inv = sorted(prefixes.items(), key=lambda kv: (-len(kv[1]), kv[0]))

    def nfc(x: str) -> str:
        return unicodedata.normalize("NFC", x)

    def term_iri(iri: str) -> str:
        for label, ns in inv:
            if iri.startswith(ns):
                local = iri[len(ns):]
                if local == "" or local.isidentifier():
                    return f"{label}:{local}"
        return f"<{nfc(iri)}>"

    def fmt_subj(s: str) -> str:
        return nfc(s) if is_blank(s) else term_iri(s)

    def fmt_pred(p: str) -> str:
        return "a" if p == RDF_TYPE else term_iri(p)

    def fmt_obj(o: str, lit: bool) -> str:
        if lit:
            return nfc(o) if is_decorated_literal(o) else f'"{esc(o)}"'
        return nfc(o) if is_blank(o) else term_iri(o)

    lines = [f"@prefix {label}: <{nfc(ns)}> ."
             for label, ns in sorted(prefixes.items())]
    i = 0
    while i < len(items):
        s = items[i][0]
        po = []
        while i < len(items) and items[i][0] == s:
            _, p, o, lit = items[i]
            po.append(f"{fmt_pred(p)} {fmt_obj(o, lit)}")
            i += 1
        lines.append(f"{fmt_subj(s)} " + " ;\n  ".join(po) + " .")
    return "\n".join(lines) + "\n" if lines else ""
