"""S3/S4 full-Turtle parser: real-world-shaped vocabulary documents that the
line-oriented ``ttl.read_ttl`` rejects (multi-line statements, ``;``/``,``
lists, blank-node property lists, collections, lang tags, numeric shorthand),
matching `Turtle2CmapConverter.java:87-108` read semantics."""

from __future__ import annotations

import pytest

from rdfcmap_spark import vocab
from rdfcmap_spark.sources.turtle import (
    alias_rows_from_triples,
    parse_turtle,
    read_turtle,
)

#: an AFO-vocabulary-shaped document exercising every construct the round-1
#: parser could not read
VOCAB_TTL = """\
@prefix rdf:  <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix owl:  <http://www.w3.org/2002/07/owl#> .
@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
@prefix dct:  <http://purl.org/dc/terms/> .
@prefix afe:  <http://purl.allotrope.org/ontologies/equipment#> .
@prefix obo:  <http://purl.obolibrary.org/obo/> .

# a class with a ; predicate list, , object list and a lang tag
afe:AFE_0000354 a owl:Class ;
    skos:prefLabel "reactor"@en , "Reaktor"@de ;
    rdfs:label "chemical reactor" ;
    rdfs:subClassOf afe:AFE_0000001 ;
    dct:description \"\"\"a vessel
spanning multiple lines with "quotes" inside\"\"\" .

obo:CHEBI_15377 a owl:Class ;
    skos:prefLabel "water" ;
    obo:chebi_charge 0 ;
    obo:chebi_mass 18.011 ;
    obo:chebi_flag true .

# deprecated term with redirect
afe:AFE_0000090 a owl:Class ;
    skos:prefLabel "vessel" ;
    owl:deprecated true ;
    dct:isReplacedBy afe:AFE_0000354 .

# blank-node property list + collection
afe:AFE_0000412 a owl:Class ;
    skos:prefLabel "stirrer" ;
    rdfs:seeAlso [ rdfs:label "anon doc" ; dct:source <http://example.org/doc> ] ;
    owl:unionOf ( afe:AFE_0000354 obo:CHEBI_15377 ) .
"""


def test_old_line_parser_rejects_this_document(spark, tmp_path):
    from rdfcmap_spark.sources.ttl import read_ttl

    p = tmp_path / "vocab.ttl"
    p.write_text(VOCAB_TTL)
    parsed = read_ttl(spark, str(p))
    # the line parser sees none of the multi-line / list statements
    assert parsed.count() < 5


def test_parse_basic_statements():
    parsed = parse_turtle(VOCAB_TTL)
    trip = {
        (s.iri, p, o.kind, o.iri, o.lexical, o.datatype)
        for s, p, o in parsed.triples
    }
    afe = "http://purl.allotrope.org/ontologies/equipment#"
    assert (afe + "AFE_0000354", vocab.RDF_TYPE, "iri", vocab.OWL + "Class", None, None) in trip
    assert (afe + "AFE_0000354", vocab.RDFS_SUBCLASS_OF, "iri", afe + "AFE_0000001", None, None) in trip
    # comma object list -> two prefLabel triples (lang recorded on the node)
    labels = {o.lexical for s, p, o in parsed.triples
              if s.iri == afe + "AFE_0000354" and p == vocab.SKOS_PREF_LABEL}
    assert labels == {"reactor", "Reaktor"}
    langs = {o.lang for s, p, o in parsed.triples if p == vocab.SKOS_PREF_LABEL and s.iri == afe + "AFE_0000354"}
    assert langs == {"en", "de"}


def test_parse_multiline_literal_and_numbers():
    parsed = parse_turtle(VOCAB_TTL)
    desc = [o for s, p, o in parsed.triples if p == vocab.DCT + "description"]
    assert len(desc) == 1
    assert desc[0].lexical == 'a vessel\nspanning multiple lines with "quotes" inside'
    obo = "http://purl.obolibrary.org/obo/"
    by_pred = {p: o for s, p, o in parsed.triples if s.iri == obo + "CHEBI_15377"}
    assert by_pred[obo + "chebi_charge"].datatype == vocab.XSD_INTEGER
    assert by_pred[obo + "chebi_mass"].datatype == vocab.XSD + "decimal"
    assert by_pred[obo + "chebi_mass"].lexical == "18.011"
    assert by_pred[obo + "chebi_flag"].datatype == vocab.XSD_BOOLEAN


def test_parse_bnode_property_list_and_collection():
    parsed = parse_turtle(VOCAB_TTL)
    afe = "http://purl.allotrope.org/ontologies/equipment#"
    see = [o for s, p, o in parsed.triples if p == vocab.RDFS + "seeAlso"]
    assert len(see) == 1 and see[0].kind == "bnode"
    bid = see[0].iri
    anon = {p: o for s, p, o in parsed.triples if s.iri == bid}
    assert anon[vocab.RDFS_LABEL].lexical == "anon doc"
    assert anon[vocab.DCT + "source"].iri == "http://example.org/doc"
    # collection expands to rdf:first/rdf:rest cons cells ending in rdf:nil
    union = [o for s, p, o in parsed.triples if p == vocab.OWL + "unionOf"]
    assert len(union) == 1 and union[0].kind == "bnode"
    firsts = {s.iri: o for s, p, o in parsed.triples if p == vocab.RDF + "first"}
    rests = {s.iri: o for s, p, o in parsed.triples if p == vocab.RDF + "rest"}
    cell1 = union[0].iri
    assert firsts[cell1].iri == afe + "AFE_0000354"
    cell2 = rests[cell1].iri
    assert firsts[cell2].iri == "http://purl.obolibrary.org/obo/CHEBI_15377"
    assert rests[cell2].iri == vocab.RDF + "nil"


def test_parse_is_deterministic():
    a = parse_turtle(VOCAB_TTL)
    b = parse_turtle(VOCAB_TTL)
    ta = [(s.iri, p, o.kind, o.iri, o.lexical, o.datatype, o.lang) for s, p, o in a.triples]
    tb = [(s.iri, p, o.kind, o.iri, o.lexical, o.datatype, o.lang) for s, p, o in b.triples]
    assert ta == tb


def test_read_turtle_dataframe_and_write_roundtrip(spark, tmp_path):
    from rdfcmap_spark.sources.ttl import read_ttl, write_ttl

    p = tmp_path / "vocab.ttl"
    p.write_text(VOCAB_TTL)
    df = read_turtle(spark, str(p))
    n = df.count()
    assert n == len(parse_turtle(VOCAB_TTL).triples)
    # full parse -> line-oriented write -> distributed read is lossless on
    # the 6-column key
    out = str(tmp_path / "out.ttl")
    write_ttl(df, out)
    back = read_ttl(spark, out)
    key = ["subj", "pred", "obj_kind", "obj_iri", "obj_lexical", "obj_datatype"]
    assert {tuple(r) for r in back.select(*key).collect()} == {
        tuple(r) for r in df.select(*key).collect()
    }


def test_alias_rows_from_parsed_vocab(spark, tmp_path):
    p = tmp_path / "vocab.ttl"
    p.write_text(VOCAB_TTL)
    rows = [tuple(r) for r in read_turtle(spark, str(p)).collect()]
    alias = alias_rows_from_triples(rows)
    d = {label: (iri, kind) for label, iri, kind in alias}
    afe = "http://purl.allotrope.org/ontologies/equipment#"
    assert d["reactor"] == (afe + "AFE_0000354", "class")
    assert d["chemical reactor"] == (afe + "AFE_0000354", "class")  # rdfs:label too
    assert d["water"] == ("http://purl.obolibrary.org/obo/CHEBI_15377", "class")
    # deprecated 'vessel' redirects to the replacement class (J3)
    assert d["vessel"] == (afe + "AFE_0000354", "class")


def test_undefined_prefix_is_loud():
    with pytest.raises(ValueError, match="undefined prefix"):
        parse_turtle("nope:thing a nope:Class .")
