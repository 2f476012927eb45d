"""S4 RDF/XML vocabulary reader: the `.owl`/`.xml` dispatch branch of
`Turtle2CmapConverter.java:87-108` (Jena "RDF/XML" serialization via
`CmapUtil.extractModelFromOntologyFile:977-1014`), exercised on an
AFO-vocabulary-shaped document with typed nodes, rdf:Description, rdf:ID,
nodeID, parseType Resource/Collection, xml:lang and property attributes."""

from __future__ import annotations

from rdfcmap_spark import vocab
from rdfcmap_spark.sources.rdfxml import parse_rdfxml, read_rdfxml, read_vocab
from rdfcmap_spark.sources.turtle import alias_rows_from_triples

AFE = "http://purl.allotrope.org/ontologies/equipment#"
OBO = "http://purl.obolibrary.org/obo/"

VOCAB_OWL = """\
<?xml version="1.0" encoding="UTF-8"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:skos="http://www.w3.org/2004/02/skos/core#"
         xmlns:dct="http://purl.org/dc/terms/"
         xmlns:afe="http://purl.allotrope.org/ontologies/equipment#"
         xmlns:obo="http://purl.obolibrary.org/obo/"
         xml:base="http://purl.allotrope.org/ontologies/equipment">
  <!-- typed node element: emits the rdf:type triple -->
  <owl:Class rdf:about="http://purl.allotrope.org/ontologies/equipment#AFE_0000354">
    <skos:prefLabel xml:lang="en">reactor</skos:prefLabel>
    <skos:prefLabel xml:lang="de">Reaktor</skos:prefLabel>
    <rdfs:label>chemical reactor</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://purl.allotrope.org/ontologies/equipment#AFE_0000001"/>
  </owl:Class>
  <!-- rdf:Description + typed literal + boolean deprecation + redirect -->
  <rdf:Description rdf:about="http://purl.allotrope.org/ontologies/equipment#AFE_0000090">
    <rdf:type rdf:resource="http://www.w3.org/2002/07/owl#Class"/>
    <skos:prefLabel>vessel</skos:prefLabel>
    <owl:deprecated rdf:datatype="http://www.w3.org/2001/XMLSchema#boolean">true</owl:deprecated>
    <dct:isReplacedBy rdf:resource="http://purl.allotrope.org/ontologies/equipment#AFE_0000354"/>
  </rdf:Description>
  <!-- rdf:ID resolves against xml:base; property attribute shorthand -->
  <owl:ObjectProperty rdf:ID="AFE_0000912" skos:prefLabel="has part"/>
  <!-- nested node element + parseType=Resource + Collection -->
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/CHEBI_15377">
    <skos:prefLabel>water</skos:prefLabel>
    <obo:chebi_mass rdf:datatype="http://www.w3.org/2001/XMLSchema#decimal">18.011</obo:chebi_mass>
    <rdfs:seeAlso>
      <rdf:Description>
        <rdfs:label>anon doc</rdfs:label>
        <dct:source rdf:resource="http://example.org/doc"/>
      </rdf:Description>
    </rdfs:seeAlso>
    <obo:hasQuality rdf:parseType="Resource">
      <rdfs:label>potable</rdfs:label>
    </obo:hasQuality>
    <owl:unionOf rdf:parseType="Collection">
      <rdf:Description rdf:about="http://purl.allotrope.org/ontologies/equipment#AFE_0000354"/>
      <rdf:Description rdf:about="http://purl.obolibrary.org/obo/CHEBI_15378"/>
    </owl:unionOf>
  </owl:Class>
</rdf:RDF>
"""


def _key_set(triples):
    return {(s.iri, p, o.kind, o.iri, o.lexical, o.datatype) for s, p, o in triples}


def test_typed_node_and_description():
    trip = _key_set(parse_rdfxml(VOCAB_OWL))
    assert (AFE + "AFE_0000354", vocab.RDF_TYPE, "iri", vocab.OWL + "Class", None, None) in trip
    assert (AFE + "AFE_0000090", vocab.RDF_TYPE, "iri", vocab.OWL + "Class", None, None) in trip
    assert (
        AFE + "AFE_0000354", vocab.RDFS_SUBCLASS_OF, "iri", AFE + "AFE_0000001", None, None
    ) in trip
    # plain literal defaults to xsd:string; typed literal keeps its datatype
    assert (
        AFE + "AFE_0000354", vocab.RDFS_LABEL, "literal", None, "chemical reactor",
        vocab.XSD_STRING,
    ) in trip
    assert (
        AFE + "AFE_0000090", vocab.OWL_DEPRECATED, "literal", None, "true", vocab.XSD_BOOLEAN
    ) in trip


def test_lang_tags_fold_into_datatype():
    trip = _key_set(parse_rdfxml(VOCAB_OWL))
    langstring = vocab.RDF + "langString"
    assert (
        AFE + "AFE_0000354", vocab.SKOS_PREF_LABEL, "literal", None, "reactor",
        langstring + "@en",
    ) in trip
    assert (
        AFE + "AFE_0000354", vocab.SKOS_PREF_LABEL, "literal", None, "Reaktor",
        langstring + "@de",
    ) in trip


def test_rdf_id_base_and_property_attribute():
    trip = _key_set(parse_rdfxml(VOCAB_OWL))
    prop = "http://purl.allotrope.org/ontologies/equipment#AFE_0000912"
    assert (prop, vocab.RDF_TYPE, "iri", vocab.OWL + "ObjectProperty", None, None) in trip
    assert (prop, vocab.SKOS_PREF_LABEL, "literal", None, "has part", vocab.XSD_STRING) in trip


def test_nested_node_parsetype_resource_and_collection():
    triples = parse_rdfxml(VOCAB_OWL)
    # nested rdf:Description becomes a bnode object with its own statements
    see = [o for s, p, o in triples if p == vocab.RDFS + "seeAlso"]
    assert len(see) == 1 and see[0].kind == "bnode"
    anon = {p: o for s, p, o in triples if s.iri == see[0].iri}
    assert anon[vocab.RDFS_LABEL].lexical == "anon doc"
    assert anon[vocab.DCT + "source"].iri == "http://example.org/doc"
    # parseType=Resource is an implicit bnode
    qual = [o for s, p, o in triples if p == OBO + "hasQuality"]
    assert len(qual) == 1 and qual[0].kind == "bnode"
    qstmts = {p: o for s, p, o in triples if s.iri == qual[0].iri}
    assert qstmts[vocab.RDFS_LABEL].lexical == "potable"
    # parseType=Collection expands to rdf:first / rdf:rest cons cells
    union = [o for s, p, o in triples if p == vocab.OWL + "unionOf"]
    assert len(union) == 1 and union[0].kind == "bnode"
    firsts = {s.iri: o for s, p, o in triples if p == vocab.RDF + "first"}
    rests = {s.iri: o for s, p, o in triples if p == vocab.RDF + "rest"}
    cell1 = union[0].iri
    assert firsts[cell1].iri == AFE + "AFE_0000354"
    cell2 = rests[cell1].iri
    assert firsts[cell2].iri == OBO + "CHEBI_15378"
    assert rests[cell2].iri == vocab.RDF + "nil"


def test_parse_is_deterministic():
    a = [(s.iri, p, o.kind, o.iri, o.lexical, o.datatype) for s, p, o in parse_rdfxml(VOCAB_OWL)]
    b = [(s.iri, p, o.kind, o.iri, o.lexical, o.datatype) for s, p, o in parse_rdfxml(VOCAB_OWL)]
    assert a == b


def test_read_rdfxml_dataframe_and_alias_dictionary(spark, tmp_path):
    p = tmp_path / "vocab.owl"
    p.write_text(VOCAB_OWL)
    df = read_rdfxml(spark, str(p))
    assert df.count() == len(parse_rdfxml(VOCAB_OWL))
    rows = [tuple(r) for r in df.collect()]
    alias = {label: (iri, kind) for label, iri, kind in alias_rows_from_triples(rows)}
    assert alias["reactor"] == (AFE + "AFE_0000354", "class")
    assert alias["water"] == (OBO + "CHEBI_15377", "class")
    assert alias["has part"] == (AFE + "AFE_0000912", "objectProperty")
    # deprecated 'vessel' redirects to the replacement class (J3)
    assert alias["vessel"] == (AFE + "AFE_0000354", "class")


def test_read_vocab_extension_dispatch(spark, tmp_path):
    """The `Turtle2CmapConverter.java:87-108` dispatch: same vocabulary in
    both serializations lands in the same triples (modulo bnode salts)."""
    owl_p = tmp_path / "vocab.owl"
    owl_p.write_text(VOCAB_OWL)
    ttl_p = tmp_path / "vocab.ttl"
    ttl_p.write_text(
        """\
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
@prefix afe: <http://purl.allotrope.org/ontologies/equipment#> .
afe:AFE_0000354 a owl:Class ; skos:prefLabel "reactor"@en .
"""
    )
    owl_df = read_vocab(spark, str(owl_p))
    ttl_df = read_vocab(spark, str(ttl_p))
    key = ["subj", "pred", "obj_kind", "obj_iri", "obj_lexical", "obj_datatype"]
    owl_set = {tuple(r) for r in owl_df.select(*key).collect()}
    ttl_set = {tuple(r) for r in ttl_df.select(*key).collect()}
    assert ttl_set <= owl_set  # the ttl doc is a sub-vocabulary of the owl doc


def test_ttl_roundtrip_preserves_lang_tags(spark, tmp_path):
    """RDF/XML read -> TTL write -> TTL read keeps language tags (the r2
    losslessness gap)."""
    from rdfcmap_spark.sources.ttl import read_ttl, write_ttl

    p = tmp_path / "vocab.owl"
    p.write_text(VOCAB_OWL)
    df = read_rdfxml(spark, str(p))
    out = str(tmp_path / "out.ttl")
    write_ttl(df, out)
    back = read_ttl(spark, out)
    key = ["subj", "pred", "obj_kind", "obj_iri", "obj_lexical", "obj_datatype"]
    assert {tuple(r) for r in back.select(*key).collect()} == {
        tuple(r) for r in df.select(*key).collect()
    }
