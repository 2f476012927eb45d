"""Full Turtle parser (SURVEY.md S3/S4) — driver-side, for vocabulary files.

The reference reads arbitrary Turtle/N3 vocabularies through Jena
(`Turtle2CmapConverter.java:87-108`, `CmapUtil.extractModelFromOntologyFile:
977-1014`): prefixed-name subjects, ``;``/``,`` predicate/object lists,
multi-line literals, blank-node property lists, collections, language tags,
numeric/boolean shorthand. The round-1 ``read_ttl`` handled only the
line-oriented subset this engine writes; this module closes the gap with a
self-contained tokenizer + recursive-descent parser (no third-party RDF lib
in this container).

Scale disposition (SURVEY §2.1): vocabulary files are small — parse on the
**driver**, ship as a broadcast DataFrame; huge instance dumps keep the
distributed line parser (`ttl.read_ttl`). :func:`alias_rows_from_triples`
turns a parsed ontology into the entity-linking dictionary (J2), so a user
can point the pipeline at a real ``-r``-style vocab file.

Language-tagged literals (``"label"@en``) survive: the tag folds into
``obj_datatype`` as ``rdf:langString@<tag>`` (see schemas.py — keeping the
8-column triples schema stable while making the tag part of RDF literal
identity, exactly as Jena does). The TTL sink/source and the RDF/XML reader
use the same encoding, so tags round-trip. Remaining documented
simplification: relative-IRI resolution is prefix-concatenation against
``@base`` (no RFC-3986 dot-segment handling).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from rdfcmap_spark import vocab
from rdfcmap_spark.ids import name_uuid
from rdfcmap_spark.schemas import TRIPLES

RDF_LANGSTRING = vocab.RDF + "langString"
RDF_FIRST = vocab.RDF + "first"
RDF_REST = vocab.RDF + "rest"
RDF_NIL = vocab.RDF + "nil"

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<comment>\#[^\n]*)
    | (?P<iriref><[^<>"{}|^`\\\x00-\x20]*>)
    | (?P<lstrq>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
    | (?P<lstrs>'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<strq>"(?:[^"\\\n]|\\.)*")
    | (?P<strs>'(?:[^'\\\n]|\\.)*')
    | (?P<lang>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
    | (?P<dtype>\^\^)
    | (?P<num>[+-]?(?:[0-9]+\.[0-9]+(?:[eE][+-]?[0-9]+)?|\.[0-9]+(?:[eE][+-]?[0-9]+)?|[0-9]+(?:[eE][+-]?[0-9]+)?))
    | (?P<punct>[;,.\[\]()])
    | (?P<pname>[A-Za-z0-9_][A-Za-z0-9_\-.]*?:[A-Za-z0-9_\-.:%]*|:[A-Za-z0-9_\-.:%]*)
    | (?P<kw>[A-Za-z][A-Za-z0-9_\-]*)
    """,
    re.VERBOSE,
)

_ESCAPES = {"t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f", '"': '"', "'": "'", "\\": "\\"}


def _unescape(s: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n in _ESCAPES:
                out.append(_ESCAPES[n])
                i += 2
                continue
            if n == "u" and i + 6 <= len(s):
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if n == "U" and i + 10 <= len(s):
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
        out.append(c)
        i += 1
    return "".join(out)


@dataclass
class _Tok:
    kind: str
    text: str
    pos: int


def _tokenize(text: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise ValueError(f"turtle: cannot tokenize at offset {pos}: {text[pos:pos+40]!r}")
        kind = m.lastgroup or ""
        if kind not in ("ws", "comment"):
            text_tok = m.group(0)
            if kind == "pname" and text_tok.endswith("."):
                # Turtle PN_LOCAL may contain but never END in '.' — a
                # statement written without a space before the terminator
                # ('ex:s ex:p ex:o.') must tokenize as pname + '.', not a
                # dot-terminated pname (ADVICE r2)
                stripped = text_tok.rstrip(".")
                n_dots = len(text_tok) - len(stripped)
                toks.append(_Tok(kind, stripped, pos))
                for k in range(n_dots):
                    toks.append(_Tok("punct", ".", pos + len(stripped) + k))
                pos = m.end()
                continue
            toks.append(_Tok(kind, text_tok, pos))
        pos = m.end()
    return toks


@dataclass
class _Node:
    """Parsed term: kind in {iri, bnode, literal}."""

    kind: str
    iri: str | None = None
    lexical: str | None = None
    datatype: str | None = None
    lang: str | None = None


@dataclass
class ParsedTurtle:
    triples: list[tuple[_Node, str, _Node]] = field(default_factory=list)
    prefixes: dict[str, str] = field(default_factory=dict)
    base: str = ""


class _Parser:
    def __init__(self, toks: list[_Tok], bnode_ns: str):
        self.toks = toks
        self.i = 0
        self.out = ParsedTurtle()
        self.bnode_ns = bnode_ns
        self._anon = 0

    # --- token helpers ----------------------------------------------------
    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise ValueError("turtle: unexpected end of input")
        self.i += 1
        return t

    def expect_punct(self, ch: str) -> None:
        t = self.next()
        if t.kind != "punct" or t.text != ch:
            raise ValueError(f"turtle: expected {ch!r} at offset {t.pos}, got {t.text!r}")

    # --- term construction ------------------------------------------------
    def _bnode(self, label: str | None = None) -> _Node:
        if label is None:
            self._anon += 1
            label = f"anon{self._anon}"
        iri = "urn:uuid:" + name_uuid(f"bnode|{self.bnode_ns}|{label}")
        return _Node("bnode", iri=iri)

    def _resolve_iriref(self, text: str) -> str:
        iri = _unescape(text[1:-1])
        if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", iri):
            return iri
        return self.out.base + iri

    def _expand_pname(self, text: str) -> str:
        prefix, _, local = text.partition(":")
        # a trailing '.' is the statement terminator, never part of PN_LOCAL
        # in our simplified local-name alphabet
        ns = self.out.prefixes.get(prefix)
        if ns is None:
            raise ValueError(f"turtle: undefined prefix {prefix!r}")
        return ns + local

    # --- grammar ----------------------------------------------------------
    def parse(self) -> ParsedTurtle:
        while self.peek() is not None:
            t = self.peek()
            assert t is not None
            if t.kind == "lang" and t.text.lower() in ("@prefix", "@base"):
                self._directive(t.text.lower()[1:], sparql_style=False)
            elif t.kind == "kw" and t.text.upper() in ("PREFIX", "BASE"):
                self._directive(t.text.upper().lower(), sparql_style=True)
            else:
                self._triples()
                self.expect_punct(".")
        return self.out

    def _directive(self, which: str, sparql_style: bool) -> None:
        self.next()
        if which == "prefix":
            pn = self.next()
            if pn.kind != "pname" or not pn.text.endswith(":"):
                raise ValueError(f"turtle: bad @prefix name {pn.text!r}")
            iri = self.next()
            if iri.kind != "iriref":
                raise ValueError(f"turtle: bad @prefix iri {iri.text!r}")
            self.out.prefixes[pn.text[:-1]] = self._resolve_iriref(iri.text)
        else:
            iri = self.next()
            if iri.kind != "iriref":
                raise ValueError(f"turtle: bad @base iri {iri.text!r}")
            self.out.base = self._resolve_iriref(iri.text)
        if not sparql_style:
            self.expect_punct(".")

    def _triples(self) -> None:
        t = self.peek()
        assert t is not None
        if t.kind == "punct" and t.text == "[":
            subj = self._bnode_property_list()
            if not (self.peek() and self.peek().kind == "punct" and self.peek().text == "."):
                self._predicate_object_list(subj)
        else:
            subj = self._subject()
            self._predicate_object_list(subj)

    def _subject(self) -> _Node:
        t = self.next()
        if t.kind == "iriref":
            return _Node("iri", iri=self._resolve_iriref(t.text))
        if t.kind == "pname":
            if t.text.startswith("_:"):
                return self._bnode(t.text[2:])
            return _Node("iri", iri=self._expand_pname(t.text))
        if t.kind == "punct" and t.text == "(":
            self.i -= 1
            return self._collection()
        raise ValueError(f"turtle: bad subject {t.text!r} at offset {t.pos}")

    def _verb(self) -> str:
        t = self.next()
        if t.kind == "kw" and t.text == "a":
            return vocab.RDF_TYPE
        if t.kind == "iriref":
            return self._resolve_iriref(t.text)
        if t.kind == "pname" and not t.text.startswith("_:"):
            return self._expand_pname(t.text)
        raise ValueError(f"turtle: bad predicate {t.text!r} at offset {t.pos}")

    def _predicate_object_list(self, subj: _Node) -> None:
        while True:
            pred = self._verb()
            self._object_list(subj, pred)
            t = self.peek()
            if not (t is not None and t.kind == "punct" and t.text == ";"):
                return
            # consume one or more ';' — '; .', ';;' and '; ]' are all legal
            # (the predicate after ';' is optional)
            while t is not None and t.kind == "punct" and t.text == ";":
                self.next()
                t = self.peek()
            if t is None or (t.kind == "punct" and t.text in (".", "]")):
                return

    def _object_list(self, subj: _Node, pred: str) -> None:
        while True:
            obj = self._object()
            self.out.triples.append((subj, pred, obj))
            t = self.peek()
            if t is not None and t.kind == "punct" and t.text == ",":
                self.next()
                continue
            return

    def _object(self) -> _Node:
        t = self.next()
        if t.kind == "iriref":
            return _Node("iri", iri=self._resolve_iriref(t.text))
        if t.kind == "pname":
            if t.text.startswith("_:"):
                return self._bnode(t.text[2:])
            return _Node("iri", iri=self._expand_pname(t.text))
        if t.kind in ("strq", "strs", "lstrq", "lstrs"):
            body = t.text[3:-3] if t.kind in ("lstrq", "lstrs") else t.text[1:-1]
            lex = _unescape(body)
            nxt = self.peek()
            if nxt is not None and nxt.kind == "lang":
                self.next()
                return _Node("literal", lexical=lex, datatype=RDF_LANGSTRING, lang=nxt.text[1:])
            if nxt is not None and nxt.kind == "dtype":
                self.next()
                dt_tok = self.next()
                if dt_tok.kind == "iriref":
                    dt = self._resolve_iriref(dt_tok.text)
                elif dt_tok.kind == "pname":
                    dt = self._expand_pname(dt_tok.text)
                else:
                    raise ValueError(f"turtle: bad datatype {dt_tok.text!r}")
                return _Node("literal", lexical=lex, datatype=dt)
            return _Node("literal", lexical=lex, datatype=vocab.XSD_STRING)
        if t.kind == "num":
            if re.match(r"^[+-]?[0-9]+$", t.text):
                return _Node("literal", lexical=t.text, datatype=vocab.XSD_INTEGER)
            if "e" in t.text.lower():
                return _Node("literal", lexical=t.text, datatype=vocab.XSD_DOUBLE)
            return _Node("literal", lexical=t.text, datatype=vocab.XSD + "decimal")
        if t.kind == "kw" and t.text in ("true", "false"):
            return _Node("literal", lexical=t.text, datatype=vocab.XSD_BOOLEAN)
        if t.kind == "punct" and t.text == "[":
            self.i -= 1
            return self._bnode_property_list()
        if t.kind == "punct" and t.text == "(":
            self.i -= 1
            return self._collection()
        raise ValueError(f"turtle: bad object {t.text!r} at offset {t.pos}")

    def _bnode_property_list(self) -> _Node:
        self.expect_punct("[")
        node = self._bnode()
        t = self.peek()
        if t is not None and t.kind == "punct" and t.text == "]":
            self.next()
            return node
        self._predicate_object_list(node)
        self.expect_punct("]")
        return node

    def _collection(self) -> _Node:
        self.expect_punct("(")
        items: list[_Node] = []
        while True:
            t = self.peek()
            if t is None:
                raise ValueError("turtle: unterminated collection")
            if t.kind == "punct" and t.text == ")":
                self.next()
                break
            items.append(self._object())
        if not items:
            return _Node("iri", iri=RDF_NIL)
        cells = [self._bnode() for _ in items]
        for idx, (cell, item) in enumerate(zip(cells, items)):
            self.out.triples.append((cell, RDF_FIRST, item))
            rest: _Node = cells[idx + 1] if idx + 1 < len(cells) else _Node("iri", iri=RDF_NIL)
            self.out.triples.append((cell, RDF_REST, rest))
        return cells[0]


def parse_turtle(text: str, bnode_ns: str = "ttl") -> ParsedTurtle:
    """Parse a Turtle document into (subject, predicate, object) terms.

    ``bnode_ns`` salts the deterministic blank-node skolem IRIs so two files
    with the same ``_:b0`` label don't collide when unioned.
    """
    return _Parser(_tokenize(text), bnode_ns).parse()


def _rows(parsed: ParsedTurtle) -> list[tuple]:
    rows = []
    for s, p, o in parsed.triples:
        subj = s.iri
        if o.kind == "literal":
            # lang-tag fold: the tag is part of RDF literal identity
            dt = RDF_LANGSTRING + "@" + o.lang if o.lang else o.datatype
            rows.append((subj, p, "literal", None, o.lexical, dt, None, None))
        else:
            rows.append((subj, p, o.kind, o.iri, None, None, None, None))
    return rows


def read_turtle(spark: SparkSession, path: str) -> DataFrame:
    """Driver-side full-Turtle read -> triples DataFrame (vocab files are
    small; instance-scale dumps use the distributed ``ttl.read_ttl``)."""
    import glob as _glob
    import os

    paths = sorted(_glob.glob(os.path.join(path, "*"))) if os.path.isdir(path) else [path]
    rows: list[tuple] = []
    for p in paths:
        with open(p, encoding="utf-8") as f:
            rows.extend(_rows(parse_turtle(f.read(), bnode_ns=os.path.basename(p))))
    return spark.createDataFrame(rows, TRIPLES)


#: rdf:type IRI -> alias-dictionary term kind
_KIND_OF_TYPE = {
    vocab.OWL + "Class": "class",
    vocab.OWL + "ObjectProperty": "objectProperty",
    vocab.OWL + "DatatypeProperty": "datatypeProperty",
    vocab.OWL_NAMED_INDIVIDUAL: "individual",
}


def alias_rows_from_triples(rows: list[tuple]) -> list[tuple]:
    """Parsed ontology triples -> alias-dictionary rows
    (label_norm, iri, term_kind) with deprecation redirects applied — the
    bridge from a real ``-r`` vocabulary file to the J2 broadcast dictionary
    (reference resolution semantics `RdfUtil.getResourceByLabel:198-539`).
    """
    from rdfcmap_spark.functions.normalize import normalize_label_py

    kinds: dict[str, str] = {}
    labels: dict[str, list[str]] = {}
    deprecated: set[str] = set()
    replaced: dict[str, str] = {}
    for subj, pred, kind, obj_iri, obj_lex, _dt, _c, _t in rows:
        if pred == vocab.RDF_TYPE and obj_iri in _KIND_OF_TYPE:
            # class wins over NamedIndividual double-typing except for pure
            # individuals (reference checks classes first)
            prev = kinds.get(subj)
            new = _KIND_OF_TYPE[obj_iri]
            if prev is None or (prev == "individual" and new != "individual"):
                kinds[subj] = new
        elif pred in (vocab.SKOS_PREF_LABEL, vocab.RDFS_LABEL) and kind == "literal":
            labels.setdefault(subj, []).append(obj_lex)
        elif pred == vocab.OWL_DEPRECATED and obj_lex in ("true", "1"):
            deprecated.add(subj)
        elif pred == vocab.DCT_IS_REPLACED_BY and obj_iri:
            replaced[subj] = obj_iri
    out = []
    for iri, kind in kinds.items():
        target = iri
        seen: set[str] = set()
        while target in deprecated and target in replaced and target not in seen:
            seen.add(target)
            target = replaced[target]
        for label in labels.get(iri, []):
            norm = normalize_label_py(label)
            if norm:
                out.append((norm, target, kinds.get(target, kind)))
    return sorted(set(out))
