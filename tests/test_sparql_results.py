"""W3C SPARQL 1.1 result-set serialization (operators/sparql_results.py):
CSV (sparql11-results-csv-tsv §3), TSV (§4), JSON (sparql11-results-json).
The DuckDB oracles (kg_sparql_results_* driver queries) pin engine parity
on a clean value domain; these tests pin the spec edge cases — RFC-4180
quoting, TSV escapes, blank-node label forms, unbound bindings, and the
JSON envelope."""

from __future__ import annotations

import json

from rdfcmap_spark import vocab
from rdfcmap_spark.operators import sparql_results as SR


def _frame(spark):
    rows = [
        # iri, lang-tagged literal, typed literal
        ("http://ex.org/a", '"plain"^^' + vocab.XSD_STRING,
         '"5"^^' + vocab.XSD + "integer"),
        # bnode subject, literal with comma+quote, unbound
        ("_:b0", '"hi, "there""^^' + vocab.XSD_STRING, None),
        # lang tag + literal containing a tab and a newline
        ("http://ex.org/c", '"bonjour"^^' + vocab.RDF + "langString@fr",
         '"x\ty\nz"^^' + vocab.XSD_STRING),
    ]
    return spark.createDataFrame(rows, "s string, lab string, v string")


def _lines(df):
    return {r["ord"]: r["line"] for r in df.collect()}


def test_csv_spec_forms(spark):
    out = _lines(SR.select_csv(_frame(spark), ["s", "lab", "v"]))
    assert out[0] == "s,lab,v"
    body = set(out.values()) - {out[0]}
    # IRI plain, literal lexical-only, RFC-4180 quote doubling, empty unbound
    assert '_:b0,"hi, ""there""",' in body
    assert "http://ex.org/a,plain,5" in body
    # embedded tab/newline force quoting (newline survives raw inside quotes)
    assert 'http://ex.org/c,bonjour,"x\ty\nz"' in body
    # ordinals are a dense 0..n sequence (a writer can sort and join)
    assert sorted(out) == list(range(len(out)))


def test_tsv_spec_forms(spark):
    out = _lines(SR.select_tsv(_frame(spark), ["s", "lab", "v"]))
    assert out[0] == "?s\t?lab\t?v"
    body = set(out.values()) - {out[0]}
    assert (
        "<http://ex.org/a>\t\"plain\"\t\"5\"^^<http://www.w3.org/2001/XMLSchema#integer>"
        in body
    )
    # lang tag form; tab/newline backslash-escaped inside the quoted form
    assert '<http://ex.org/c>\t"bonjour"@fr\t"x\\ty\\nz"' in body
    # bnode label raw; quote escaped; unbound empty
    assert '_:b0\t"hi, \\"there\\""\t' in body


def test_json_document(spark):
    doc = json.loads(SR.render_json(_frame(spark), ["s", "lab", "v"]))
    assert doc["head"]["vars"] == ["s", "lab", "v"]
    bindings = doc["results"]["bindings"]
    assert len(bindings) == 3
    by_s = {b["s"]["value"]: b for b in bindings}
    # bnode: type bnode, bare label
    assert by_s["b0"]["s"]["type"] == "bnode"
    assert "v" not in by_s["b0"]  # unbound var absent from its row
    a = by_s["http://ex.org/a"]
    assert a["s"]["type"] == "uri"
    assert a["lab"] == {"type": "literal", "value": "plain"}  # xsd:string: no datatype key
    assert a["v"]["datatype"] == vocab.XSD + "integer"
    c = by_s["http://ex.org/c"]
    assert c["lab"]["xml:lang"] == "fr"
    assert c["lab"]["datatype"] == vocab.RDF + "langString"
    assert c["v"]["value"] == "x\ty\nz"


def test_executor_to_serializer_roundtrip(spark):
    """End-to-end: execute a SELECT with OPTIONAL on a triples frame, then
    serialize — unbound OPTIONAL values flow through as empty/absent."""
    from rdfcmap_spark.operators.sparql_exec import execute_sparql

    triples = spark.createDataFrame(
        [
            ("http://ex.org/x", "http://ex.org/p", "literal", None, "one", vocab.XSD_STRING, None, None),
            ("http://ex.org/y", "http://ex.org/p", "literal", None, "two", vocab.XSD_STRING, None, None),
            ("http://ex.org/x", "http://ex.org/q", "literal", None, "extra", vocab.XSD_STRING, None, None),
        ],
        "subj string, pred string, obj_kind string, obj_iri string, "
        "obj_lexical string, obj_datatype string, conv_id string, turn_idx int",
    )
    res = execute_sparql(
        triples,
        "SELECT ?s ?v ?e WHERE { ?s <http://ex.org/p> ?v . "
        "OPTIONAL { ?s <http://ex.org/q> ?e . } }",
    )
    csv = sorted(_lines(SR.select_csv(res, ["s", "v", "e"])).values())
    assert csv == [
        "http://ex.org/x,one,extra",
        "http://ex.org/y,two,",
        "s,v,e",
    ]


def test_xml_spec_forms(spark):
    import xml.dom.minidom as minidom

    frame = spark.createDataFrame(
        [
            ("http://ex.org/a?x=1&y=2", '"a<b>&c"^^' + vocab.XSD_STRING,
             '"5"^^' + vocab.XSD + "integer"),
            ("_:b0", '"salut"^^' + vocab.RDF + "langString@fr", None),
        ],
        "s string, lab string, v string",
    )
    doc = SR.render_xml(frame, ["s", "lab", "v"])
    # well-formed XML with the spec namespace
    dom = minidom.parseString(doc)
    assert dom.documentElement.namespaceURI == "http://www.w3.org/2005/sparql-results#"
    assert [e.getAttribute("name") for e in dom.getElementsByTagName("variable")] == [
        "s", "lab", "v"
    ]
    results = dom.getElementsByTagName("result")
    assert len(results) == 2
    # entity escaping survives the parse back to the raw values
    uris = [e.firstChild.data for e in dom.getElementsByTagName("uri")]
    assert "http://ex.org/a?x=1&y=2" in uris
    lits = {e.firstChild.data: e for e in dom.getElementsByTagName("literal")}
    assert "a<b>&c" in lits
    assert lits["salut"].getAttribute("xml:lang") == "fr"
    assert lits["5"].getAttribute("datatype").endswith("#integer")
    assert dom.getElementsByTagName("bnode")[0].firstChild.data == "b0"
    # the unbound var is absent: one result has 2 bindings, the other 3
    counts = sorted(len(r.getElementsByTagName("binding")) for r in results)
    assert counts == [2, 3]
