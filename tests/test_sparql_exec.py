"""BGP execution (operators/sparql_exec.py): parsing the generated-SPARQL
subset and executing it as joined pattern scans over the triples frame —
closes the loop on `SparqlCreator`'s text product (the reference hands the
query to an external store; we run it on the same cluster)."""

from __future__ import annotations

import pytest

from rdfcmap_spark import vocab
from rdfcmap_spark.operators import sparql_exec as se
from rdfcmap_spark.operators.sparql import render_sparql
from rdfcmap_spark.schemas import TRIPLES

EX = "http://example.org/"


def _triples(spark, rows):
    full = [
        (s, p, k, oi, lex, dt, None, None)
        for (s, p, k, oi, lex, dt) in rows
    ]
    return spark.createDataFrame(full, TRIPLES)


def _graph(spark):
    # a -knows-> b -knows-> c ; ages as literals; b typed Person
    return _triples(
        spark,
        [
            (EX + "a", EX + "knows", "iri", EX + "b", None, None),
            (EX + "b", EX + "knows", "iri", EX + "c", None, None),
            (EX + "a", EX + "age", "literal", None, "30", vocab.XSD + "integer"),
            (EX + "b", EX + "age", "literal", None, "40", vocab.XSD + "integer"),
            (EX + "b", vocab.RDF_TYPE, "iri", EX + "Person", None, None),
        ],
    )


def test_parse_query_terms_and_flags():
    q = se.parse_query(
        """# comment line
PREFIX ex: <http://example.org/>
SELECT DISTINCT ?x ?age WHERE {
  ?x ex:knows <http://example.org/b> .
  ?x ex:age "30"^^xsd:integer .
  ?x a ex:Person .
}
"""
    )
    assert q.distinct and q.select_vars == ["?x", "?age"]
    assert q.patterns[0] == (se.Var("x"), se.Iri(EX + "knows"), se.Iri(EX + "b"))
    # xsd: resolves via the built-in prefix dictionary; 'a' -> rdf:type
    assert q.patterns[1][2] == se.Lit("30", vocab.XSD + "integer")
    assert q.patterns[2][1] == se.Iri(vocab.RDF_TYPE)


def test_parse_rejects_non_bgp_constructs():
    with pytest.raises(ValueError, match="FILTER"):
        se.parse_query("SELECT ?x WHERE {\n  FILTER(?x > 3)\n}")


def test_two_hop_join_and_literal_constant(spark):
    t = _graph(spark)
    out = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?start ?end WHERE {
  ?start ex:knows ?mid .
  ?mid ex:knows ?end .
  ?mid ex:age "40"^^xsd:integer .
}""",
    )
    assert [tuple(r) for r in out.collect()] == [(EX + "a", EX + "c")]


def test_object_var_binds_literal_token_and_iri(spark):
    t = _graph(spark)
    out = se.execute_sparql(
        t,
        "PREFIX ex: <http://example.org/>\nSELECT ?o WHERE {\n  ex:b ?p ?o .\n}",
    )
    got = sorted(r["o"] for r in out.collect())
    assert got == sorted(
        [EX + "c", EX + "Person", se.lit_binding("40", vocab.XSD + "integer")]
    )


def test_ground_pattern_is_existence_gate(spark):
    t = _graph(spark)
    q_present = """PREFIX ex: <http://example.org/>
SELECT ?x WHERE {
  ex:a ex:knows ex:b .
  ?x ex:knows ex:c .
}"""
    assert [r["x"] for r in se.execute_sparql(t, q_present).collect()] == [EX + "b"]
    q_absent = q_present.replace("ex:a ex:knows ex:b", "ex:c ex:knows ex:a")
    assert se.execute_sparql(t, q_absent).count() == 0


def test_repeated_var_in_one_pattern_requires_self_loop(spark):
    t = _graph(spark).unionByName(
        _triples(spark, [(EX + "z", EX + "knows", "iri", EX + "z", None, None)])
    )
    out = se.execute_sparql(
        t, "PREFIX ex: <http://example.org/>\nSELECT ?x WHERE {\n  ?x ex:knows ?x .\n}"
    )
    assert [r["x"] for r in out.collect()] == [EX + "z"]


def test_unbound_select_var_is_loud(spark):
    with pytest.raises(ValueError, match="never bound"):
        se.execute_sparql(
            _graph(spark),
            "PREFIX ex: <http://example.org/>\nSELECT ?nope WHERE {\n  ?x ex:knows ?y .\n}",
        )


def test_generated_query_round_trip(spark):
    """render_sparql output is directly executable: generate the query from
    a marked concept map, run it over the same triples, get the target's
    property bindings back."""
    S, M, T = "urn:uuid:aaa-source", "urn:uuid:bbb-middle", "urn:uuid:ccc-target"
    t = _triples(
        spark,
        [
            (S, vocab.AFV + "isSourceNode", "literal", None, "true", vocab.XSD_BOOLEAN),
            (T, vocab.AFV + "isTargetNode", "literal", None, "true", vocab.XSD_BOOLEAN),
            (S, vocab.RDF_TYPE, "iri", vocab.AFE + "AFE_0000354", None, None),
            (S, vocab.AFX + "AFX_0000141", "iri", M, None, None),
            (T, vocab.AFX + "AFX_0000405", "iri", M, None, None),
            (T, vocab.DCT_TITLE, "literal", None, "target title", vocab.XSD_STRING),
            (T, vocab.AFX + "AFX_0000690", "literal", None, "7.5", vocab.XSD_DOUBLE),
        ],
    )
    r = render_sparql(t)
    out = se.execute_sparql(t, r.text)
    assert out.columns == [v.lstrip("?") for v in r.select_vars]
    rows = [tuple(x) for x in out.collect()]
    assert rows == [
        (
            M,
            se.lit_binding("7.5", vocab.XSD_DOUBLE),
            se.lit_binding("target title", vocab.XSD_STRING),
        )
    ]
