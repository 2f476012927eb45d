"""G3 SPARQL generation: BFS path -> BGP rows -> rendered query text
(`SparqlCreator.createSparql:108-210`, `findNeighbour:537-664`,
`cleanPrefixes:88-106`)."""

from __future__ import annotations

import pytest

from rdfcmap_spark import vocab
from rdfcmap_spark.operators.sparql import (
    clean_prefixes,
    marked_nodes,
    path_statements,
    render_sparql,
    traversal_edges,
)
from rdfcmap_spark.schemas import TRIPLES

S, M, T = "urn:uuid:aaa-source", "urn:uuid:bbb-middle", "urn:uuid:ccc-target"


def _fixture(spark):
    rows = [
        (S, vocab.AFV + "isSourceNode", "literal", None, "true", vocab.XSD_BOOLEAN, None, None),
        (T, vocab.AFV + "isTargetNode", "literal", None, "true", vocab.XSD_BOOLEAN, None, None),
        (S, vocab.RDF_TYPE, "iri", vocab.AFE + "AFE_0000354", None, None, None, None),
        # forward hop source -> middle, then an INVERSE hop (target points at
        # middle) — exercises the edges ∪ reverse(edges) traversal
        (S, vocab.AFX + "AFX_0000141", "iri", M, None, None, None, None),
        (T, vocab.AFX + "AFX_0000405", "iri", M, None, None, None, None),
        (T, vocab.DCT_TITLE, "literal", None, "target title", vocab.XSD_STRING, None, None),
        (T, vocab.AFX + "AFX_0000690", "literal", None, "7.5", vocab.XSD_DOUBLE, None, None),
    ]
    return spark.createDataFrame(rows, TRIPLES)


def test_marked_nodes_and_missing_marker_is_loud(spark):
    df = _fixture(spark)
    assert marked_nodes(df) == (S, T)
    with pytest.raises(ValueError, match="source node"):
        marked_nodes(df.filter(df.pred != vocab.AFV + "isSourceNode"))


def test_path_statements_cross_inverse_edge(spark):
    df = _fixture(spark)
    path = sorted(
        map(tuple, path_statements(traversal_edges(df), S, T).collect()),
        key=lambda r: r[0],
    )
    # statements are emitted in stored orientation even when the BFS crossed
    # them backwards (findNeighbourInverse semantics)
    assert path == [
        (0, S, vocab.AFX + "AFX_0000141", M, "forward"),
        (1, T, vocab.AFX + "AFX_0000405", M, "inverse"),
    ]


def test_no_path_is_loud(spark):
    # disconnect the source entirely: no path can exist
    edges = (
        traversal_edges(_fixture(spark))
        .filter("src <> '%s' AND dst <> '%s'" % (S, S))
    )
    with pytest.raises(ValueError, match="path from source to target"):
        path_statements(edges, S, T, max_hops=5)


def test_rendered_query_text_golden(spark):
    # reference defaults: includePathProperties=true pulls the path subject's
    # rdf:type statement into the body (`createGraphString:324-380`)
    r = render_sparql(_fixture(spark))
    assert r.text == (
        "# SPARQL created with rdfcmap-spark\n"
        "PREFIX af-x: <http://purl.allotrope.org/ontologies/property#>\n"
        "PREFIX afe: <http://purl.allotrope.org/ontologies/equipment#>\n"
        "PREFIX dct: <http://purl.org/dc/terms/>\n"
        "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>\n"
        "\n"
        "select distinct ?uses ?has_value ?title where {\n"
        "  ?node1 af-x:AFX_0000141 ?node2 .\n"
        "  ?node1 rdf:type afe:AFE_0000354 .\n"
        "  ?node0 af-x:AFX_0000405 ?node2 .\n"
        "  ?node0 af-x:AFX_0000405 ?uses .\n"
        "  ?node0 af-x:AFX_0000690 ?has_value .\n"
        "  ?node0 dct:title ?title .\n"
        "}\n"
    )


def test_outside_path_closure_flag(spark):
    """`--skipnodesoutsidepath` default false: statements of nodes outside
    the source->target path join the WHERE body
    (`createGraphStringForUnhandledNodes:215-299`)."""
    extra = spark.createDataFrame(
        [
            ("urn:uuid:eee-extra", vocab.AFX + "AFX_0000141", "iri", M, None, None, None, None),
            ("urn:uuid:eee-extra", vocab.DCT_TITLE, "literal", None, "extra", vocab.XSD_STRING, None, None),
            ("urn:uuid:eee-extra", vocab.RDF_TYPE, "iri", vocab.OWL_NAMED_INDIVIDUAL, None, None, None, None),
        ],
        TRIPLES,
    )
    df = _fixture(spark).unionByName(extra)
    with_outside = render_sparql(df)
    # the extra node's statements appear (NamedIndividual typing excluded),
    # rendered with a fresh ?node var and the literal as "lex"^^xsd:string
    assert '"extra"^^xsd:string .' in with_outside.text
    assert "af-x:AFX_0000141 ?node2 .\n" in with_outside.text
    assert "owl:NamedIndividual" not in with_outside.text
    without = render_sparql(df, skip_nodes_outside_path=True)
    assert '"extra"' not in without.text
    # path-only body is unchanged by the flag
    assert with_outside.body_lines == without.body_lines


def test_select_var_sanitization_and_dedup(spark):
    """Labels with SPARQL-illegal characters sanitize to VARNAME; two
    predicates with the same label get distinct ?vars (ADVICE r2)."""
    rows = [
        (S, vocab.AFV + "isSourceNode", "literal", None, "true", vocab.XSD_BOOLEAN, None, None),
        (T, vocab.AFV + "isTargetNode", "literal", None, "true", vocab.XSD_BOOLEAN, None, None),
        (S, "http://example.org/p", "iri", T, None, None, None, None),
        # two distinct predicates whose local names collide after sanitizing
        (T, "http://example.org/temp(C)", "literal", None, "21", vocab.XSD_DOUBLE, None, None),
        (T, "http://example.org/temp_C_", "literal", None, "70", vocab.XSD_DOUBLE, None, None),
        # leading digit
        (T, "http://example.org/2theta", "literal", None, "1.5", vocab.XSD_DOUBLE, None, None),
    ]
    r = render_sparql(spark.createDataFrame(rows, TRIPLES))
    assert len(set(r.select_vars)) == 3
    import re

    for v in r.select_vars:
        assert re.fullmatch(r"\?[A-Za-z_][A-Za-z0-9_]*", v), v


def test_clean_prefixes_drops_unused_keeps_used():
    q = (
        "PREFIX afe: <http://purl.allotrope.org/ontologies/equipment#>\n"
        "PREFIX chebi: <http://purl.obolibrary.org/obo/CHEBI>\n"
        "select ?x where { ?x a afe:AFE_0000354 . }"
    )
    cleaned = clean_prefixes(q)
    assert "PREFIX afe:" in cleaned
    assert "chebi" not in cleaned
