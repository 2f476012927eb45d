"""RDF/XML vocabulary reader (SURVEY.md S4).

The reference dispatches ``.owl`` / ``.xml`` / ``.rdfxml`` inputs to Jena's
RDF/XML parser (`Turtle2CmapConverter.java:87-108`,
`CmapUtil.extractModelFromOntologyFile:977-1014`). Most published ontologies
(including AFO distributions) ship RDF/XML, so a user pointing ``-r`` at one
needs this path. No third-party RDF library exists in this container, so the
parser is built on the stdlib ``xml.etree`` over the RDF/XML grammar subset
real ontology exports use:

* ``rdf:Description`` and **typed node elements** (``<owl:Class rdf:about>``
  emits the ``rdf:type`` triple);
* node identification via ``rdf:about`` / ``rdf:ID`` / ``rdf:nodeID`` /
  anonymous blank nodes;
* property elements with ``rdf:resource`` / ``rdf:nodeID`` references,
  nested node elements, literal content with ``rdf:datatype`` or
  ``xml:lang`` (folded into ``obj_datatype`` per schemas.py's lang-tag
  encoding), ``rdf:parseType="Resource"`` and ``rdf:parseType="Collection"``;
* property **attributes** on node elements (non-rdf attrs become literal
  triples);
* ``xml:base`` + relative-IRI resolution by concatenation, matching the
  Turtle reader's documented simplification.

Scale disposition mirrors `sources/turtle.py`: vocabulary files are small
and parse on the **driver**; the result feeds the same
``alias_rows_from_triples`` -> broadcast-dictionary path (J2). Huge instance
dumps stay on the distributed line parser (`ttl.read_ttl`).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from rdfcmap_spark import vocab
from rdfcmap_spark.ids import name_uuid
from rdfcmap_spark.schemas import TRIPLES
from rdfcmap_spark.sources.turtle import RDF_FIRST, RDF_LANGSTRING, RDF_NIL, RDF_REST, _Node

RDF_NS = vocab.RDF.rstrip("#")  # ...22-rdf-syntax-ns#
XML_NS = "http://www.w3.org/XML/1998/namespace"

#: rdf-namespace attributes that are node/graph syntax, never properties
_SYNTAX_ATTRS = {"about", "ID", "nodeID", "resource", "datatype", "parseType", "RDF"}
#: rdf-namespace element local names that are pure syntax containers
_SYNTAX_ELEMS = {"RDF", "Description"}


def _split(tag: str) -> tuple[str, str]:
    """ElementTree '{ns}local' -> (ns, local)."""
    if tag.startswith("{"):
        ns, _, local = tag[1:].partition("}")
        return ns, local
    return "", tag


def _rdf(attr: str) -> str:
    return "{" + vocab.RDF + "}" + attr


class _RdfXml:
    def __init__(self, bnode_ns: str):
        self.bnode_ns = bnode_ns
        self.triples: list[tuple[_Node, str, _Node]] = []
        self.base = ""
        self._anon = 0

    # --- node identity ------------------------------------------------------
    def _bnode(self, label: str | None = None) -> _Node:
        if label is None:
            self._anon += 1
            label = f"anon{self._anon}"
        return _Node("bnode", iri="urn:uuid:" + name_uuid(f"bnode|{self.bnode_ns}|{label}"))

    def _resolve(self, iri: str) -> str:
        if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", iri):
            return iri
        return self.base + iri

    def _subject_of(self, elem: ET.Element) -> _Node:
        about = elem.get(_rdf("about"))
        if about is not None:
            return _Node("iri", iri=self._resolve(about))
        rid = elem.get(_rdf("ID"))
        if rid is not None:
            # rdf:ID names a fragment of the base document
            return _Node("iri", iri=self.base + "#" + rid)
        node_id = elem.get(_rdf("nodeID"))
        if node_id is not None:
            return self._bnode(node_id)
        return self._bnode()

    # --- grammar -------------------------------------------------------------
    def parse(self, root: ET.Element) -> None:
        self.base = root.get("{%s}base" % XML_NS, self.base)
        ns, local = _split(root.tag)
        if ns == vocab.RDF and local == "RDF":
            for child in root:
                self._node_element(child)
        else:
            self._node_element(root)

    def _node_element(self, elem: ET.Element) -> _Node:
        """A node element: rdf:Description or a typed element."""
        subj = self._subject_of(elem)
        ns, local = _split(elem.tag)
        if not (ns == vocab.RDF and local in _SYNTAX_ELEMS):
            self.triples.append((subj, vocab.RDF_TYPE, _Node("iri", iri=ns + local)))
        # property attributes (non-rdf, non-xml attrs are literal statements)
        for attr, value in elem.attrib.items():
            ans, alocal = _split(attr)
            if ans in (vocab.RDF, RDF_NS, XML_NS) or (ans == "" and alocal in _SYNTAX_ATTRS):
                continue
            self.triples.append(
                (subj, ans + alocal, _Node("literal", lexical=value, datatype=vocab.XSD_STRING))
            )
        for child in elem:
            self._property_element(subj, child)
        return subj

    def _property_element(self, subj: _Node, elem: ET.Element) -> None:
        ns, local = _split(elem.tag)
        pred = ns + local
        resource = elem.get(_rdf("resource"))
        node_id = elem.get(_rdf("nodeID"))
        parse_type = elem.get(_rdf("parseType"))
        datatype = elem.get(_rdf("datatype"))
        lang = elem.get("{%s}lang" % XML_NS)
        children = list(elem)

        if resource is not None:
            self.triples.append((subj, pred, _Node("iri", iri=self._resolve(resource))))
        elif node_id is not None:
            self.triples.append((subj, pred, self._bnode(node_id)))
        elif parse_type == "Resource":
            inner = self._bnode()
            self.triples.append((subj, pred, inner))
            for child in children:
                self._property_element(inner, child)
        elif parse_type == "Collection":
            items = [self._node_element(c) for c in children]
            if not items:
                self.triples.append((subj, pred, _Node("iri", iri=RDF_NIL)))
                return
            cells = [self._bnode() for _ in items]
            self.triples.append((subj, pred, cells[0]))
            for idx, (cell, item) in enumerate(zip(cells, items)):
                self.triples.append((cell, RDF_FIRST, item))
                rest = cells[idx + 1] if idx + 1 < len(cells) else _Node("iri", iri=RDF_NIL)
                self.triples.append((cell, RDF_REST, rest))
        elif parse_type == "Literal":
            # XML literal: serialize the inner markup verbatim
            lex = (elem.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in children
            )
            self.triples.append(
                (subj, pred, _Node("literal", lexical=lex, datatype=vocab.RDF + "XMLLiteral"))
            )
        elif children:
            # nested node element(s)
            for child in children:
                self.triples.append((subj, pred, self._node_element(child)))
        else:
            lex = elem.text or ""
            if datatype is not None:
                dt = self._resolve(datatype)
            elif lang is not None:
                # lang-tag fold (schemas.py): rdf:langString@<tag>
                dt = RDF_LANGSTRING + "@" + lang
            else:
                dt = vocab.XSD_STRING
            self.triples.append((subj, pred, _Node("literal", lexical=lex, datatype=dt)))


def parse_rdfxml(text: str, bnode_ns: str = "rdfxml") -> list[tuple[_Node, str, _Node]]:
    """Parse an RDF/XML document into (subject, predicate, object) terms.

    ``bnode_ns`` salts the deterministic blank-node skolem IRIs, mirroring
    :func:`rdfcmap_spark.sources.turtle.parse_turtle`.
    """
    parser = _RdfXml(bnode_ns)
    parser.parse(ET.fromstring(text))
    return parser.triples


def _rows(triples: list[tuple[_Node, str, _Node]]) -> list[tuple]:
    rows = []
    for s, p, o in triples:
        if o.kind == "literal":
            rows.append((s.iri, p, "literal", None, o.lexical, o.datatype, None, None))
        else:
            rows.append((s.iri, p, o.kind, o.iri, None, None, None, None))
    return rows


def read_rdfxml(spark: SparkSession, path: str) -> DataFrame:
    """Driver-side RDF/XML read -> triples DataFrame (vocabulary files are
    driver-sized; see module docstring for the scale rationale)."""
    import glob as _glob
    import os

    paths = sorted(_glob.glob(os.path.join(path, "*"))) if os.path.isdir(path) else [path]
    rows: list[tuple] = []
    for p in paths:
        with open(p, encoding="utf-8") as f:
            rows.extend(_rows(parse_rdfxml(f.read(), bnode_ns=os.path.basename(p))))
    return spark.createDataFrame(rows, TRIPLES)


def read_vocab(spark: SparkSession, path: str) -> DataFrame:
    """Extension dispatch mirroring `Turtle2CmapConverter.java:87-108`:
    ``.owl``/``.xml``/``.rdfxml`` -> RDF/XML; ``.ttl``/``.n3`` (and anything
    else) -> the full Turtle parser."""
    from rdfcmap_spark.sources.turtle import read_turtle

    lower = path.lower()
    if lower.endswith((".owl", ".xml", ".rdfxml")):
        return read_rdfxml(spark, path)
    return read_turtle(spark, path)
