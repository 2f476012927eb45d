"""Seeded fuzz: TTL write -> read round trip on adversarial literals.

The escape/unescape pair in sources/ttl.py is order-sensitive (backslash
first via a NUL sentinel); this composes hostile literal content — quote
and backslash runs, escape-sequence lookalikes, newlines/tabs, unicode,
Turtle syntax characters — with every datatype shape (plain string, typed,
unknown IRI datatype, folded language tag) and asserts the 6-column key
set survives a real write_ttl/read_ttl cycle byte-for-byte.
"""

from __future__ import annotations

import random

from rdfcmap_spark import vocab
from rdfcmap_spark.schemas import TRIPLES
from rdfcmap_spark.sources.ttl import read_ttl, write_ttl

_ATOMS = [
    'say "hi"', '""', '"', '\\', "\\\\", "\\\\\\", r"C:\new", r"\t", r"\n",
    "a\tb", "a\nb", "a\rb", "trailing\\", "\\n\\t\\r", '\\"', 'x\\"y',
    "é ü 漢字 🙂", "mixed é\\né", ". ; , [ ] ( )", "^^xsd:double",
    "@en", '"@en', "<not-an-iri>", "_:fakebnode", "a" * 300, "",
    " leading and trailing ", "line1\nline2\nline3", '“smart quotes”',
]

#: datatype shapes: plain string, known typed, unknown IRI, folded lang tag
_DTS = [
    vocab.XSD_STRING,
    vocab.XSD_DOUBLE,
    vocab.XSD_INTEGER,
    "http://example.org/custom#dt",
    vocab.RDF + "langString@en",
    vocab.RDF + "langString@de-CH",
]

KEY = ["subj", "pred", "obj_kind", "obj_iri", "obj_lexical", "obj_datatype"]


def _rows(n: int = 300) -> list[tuple]:
    rng = random.Random(20260820)
    rows = []
    for i in range(n):
        lex = "".join(rng.choice(_ATOMS) for _ in range(rng.randint(1, 4)))
        dt = rng.choice(_DTS)
        subj = rng.choice([f"urn:uuid:s{i % 17}", f"_:b{i % 5}"])
        pred = rng.choice([vocab.DCT_TITLE, vocab.AFX + "AFX_0000690", "http://example.org/p"])
        rows.append((subj, pred, "literal", None, lex, dt, None, None))
    # a few iri/bnode objects interleaved so the object ladder is exercised
    rows += [
        ("urn:uuid:s1", vocab.RDF_TYPE, "iri", vocab.OBO + "CHEBI_15377", None, None, None, None),
        ("urn:uuid:s2", "http://example.org/p", "bnode", "urn:uuid:deadbeef", None, None, None, None),
    ]
    return rows


def test_ttl_roundtrip_fuzz(spark, tmp_path):
    df = spark.createDataFrame(_rows(), TRIPLES).repartition(7)
    path = str(tmp_path / "fuzz.ttl")
    write_ttl(df, path)
    back = read_ttl(spark, path)
    want = {tuple(r) for r in df.select(*KEY).collect()}
    got = {tuple(r) for r in back.select(*KEY).collect()}
    missing, extra = want - got, got - want
    assert not missing and not extra, (sorted(missing)[:3], sorted(extra)[:3])
