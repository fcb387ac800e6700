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

Blank nodes and collections raise ``ValueError`` (the reference's graphs
are subject-IRI documents; silently mangling anonymous nodes would break
the byte-identity invariant).
"""

from __future__ import annotations

import re
import unicodedata

from .ntriples import escape_literal

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"

_PNAME_RE = re.compile(r"^([A-Za-z_][\w.\-]*)?:([\w.\-]*)$")
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

    def _peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def _next(self):
        t = self._peek()
        if t is None:
            raise ValueError("unexpected end of Turtle document")
        self.pos += 1
        return t

    def _resolve_iri(self, raw: str) -> str:
        if self.base and "://" not in raw and not raw.startswith("urn:"):
            return self.base + raw
        return raw

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
        subj_tok = self._next()
        if subj_tok == ("punct", "["):
            raise ValueError("blank nodes are not supported")
        subj = self._resolve_term_iri(subj_tok)
        while True:  # predicate list
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
                # ';' may be followed directly by '.' (trailing semicolon)
                if self._peek() == ("punct", "."):
                    t = self._next()
                    break
                continue
            break
        if t != ("punct", "."):
            raise ValueError(f"expected '.', got {t!r}")

    def _object(self, subj: str, pred: str):
        tok = self._next()
        kind, val = tok
        if kind == "punct" and val in "[(":
            raise ValueError("blank nodes / collections are not supported")
        if kind == "iri":
            self.out.append((subj, pred, self._resolve_iri(val), False))
            return
        if kind == "literal":
            lex, lang, dtype = val
            self.out.append((subj, pred, _decorate(lex, lang, dtype, self), True))
            return
        # word: pname, number, or boolean shorthand
        if val in ("true", "false"):
            self.out.append(
                (subj, pred, _decorated_token(val, f"{XSD}boolean"), True)
            )
        elif _NUM_INT_RE.match(val):
            self.out.append(
                (subj, pred, _decorated_token(val, f"{XSD}integer"), True)
            )
        elif _NUM_DEC_RE.match(val):
            self.out.append(
                (subj, pred, _decorated_token(val, f"{XSD}decimal"), True)
            )
        elif _NUM_DBL_RE.match(val):
            self.out.append(
                (subj, pred, _decorated_token(val, f"{XSD}double"), True)
            )
        elif val.startswith("_:"):
            raise ValueError("blank nodes are not supported")
        else:
            self.out.append((subj, pred, self._resolve_pname(val), False))


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
