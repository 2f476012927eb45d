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
    with pytest.raises(ValueError, match="SERVICE"):
        se.parse_query(
            "SELECT ?x WHERE {\n  ?x ex:p ?y .\n"
            "  SERVICE <http://remote/sparql> { ?x ex:q ?z . }\n}"
        )


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


# ---------------------------------------------------------------------------
# group graph patterns: OPTIONAL / FILTER / UNION + solution modifiers
# ---------------------------------------------------------------------------


def _shop(spark):
    """orders o1..o3 -by-> customers with segment literals; phone only on c1;
    integer totals on every order."""
    XI = vocab.XSD + "integer"
    rows = []
    for o, c, total in [("o1", "c1", "150000"), ("o2", "c2", "50000"), ("o3", "c3", "200000")]:
        rows.append((EX + o, EX + "by", "iri", EX + c, None, None))
        rows.append((EX + o, EX + "total", "literal", None, total, XI))
    for c, seg in [("c1", "BUILDING"), ("c2", "AUTO"), ("c3", "AUTO")]:
        rows.append((EX + c, EX + "seg", "literal", None, seg, vocab.XSD_STRING))
    rows.append((EX + "c1", EX + "phone", "literal", None, "11-222", vocab.XSD_STRING))
    return _triples(spark, rows)


def test_optional_left_join_keeps_unmatched(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?ord ?phone WHERE {
  ?ord ex:by ?cust .
  OPTIONAL { ?cust ex:phone ?phone . }
}""",
    )
    got = {r["ord"]: r["phone"] for r in out.collect()}
    assert got == {
        EX + "o1": se.lit_binding("11-222", vocab.XSD_STRING),
        EX + "o2": None,
        EX + "o3": None,
    }


def test_filter_numeric_comparison_and_not_bound(spark):
    t = _shop(spark)
    big = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?ord WHERE {
  ?ord ex:total ?total .
  FILTER(?total > 100000)
}""",
    )
    assert sorted(r["ord"] for r in big.collect()) == [EX + "o1", EX + "o3"]
    nophone = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?cust WHERE {
  ?ord ex:by ?cust .
  OPTIONAL { ?cust ex:phone ?p . }
  FILTER(!bound(?p))
}""",
    )
    assert sorted(r["cust"] for r in nophone.collect()) == [EX + "c2", EX + "c3"]


def test_filter_regex_contains_boolean_ops(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?cust WHERE {
  ?cust ex:seg ?s .
  FILTER(regex(?s, "^bui", "i") || (contains(?s, "UT") && strends(?s, "O")))
}""",
    )
    assert sorted(r["cust"] for r in out.collect()) == [EX + "c1", EX + "c2", EX + "c3"]


def test_filter_non_numeric_lexical_drops_row(spark):
    """SPARQL: a type error in a comparison makes the FILTER false — the
    try_cast NULL maps exactly onto that, so the string-segment row drops."""
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?cust WHERE {
  ?cust ex:seg ?s .
  FILTER(?s > 5)
}""",
    )
    assert out.count() == 0


def test_union_branches_and_var_alignment(spark):
    t = _shop(spark)
    out = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?cust WHERE {
  { ?cust ex:seg "BUILDING" . } UNION { ?cust ex:phone "11-222" . }
}""",
    )
    # c1 matches both branches: UNION is bag semantics -> two rows
    assert sorted(r["cust"] for r in out.collect()) == [EX + "c1", EX + "c1"]
    with pytest.raises(ValueError, match="different variable sets"):
        se.execute_sparql(
            t,
            """PREFIX ex: <http://example.org/>
SELECT ?a WHERE {
  { ?a ex:seg ?s . } UNION { ?a ex:phone ?p . }
}""",
        )


def test_order_by_limit_offset(spark):
    q = """PREFIX ex: <http://example.org/>
SELECT ?ord ?total WHERE {
  ?ord ex:total ?total .
} ORDER BY DESC(?ord) LIMIT 2 OFFSET 1"""
    out = se.execute_sparql(_shop(spark), q)
    assert [r["ord"] for r in out.collect()] == [EX + "o2", EX + "o1"]


def test_optional_scoped_filter_applies_inside_group(spark):
    """A FILTER inside the OPTIONAL restricts the optional match only — the
    outer row survives with an unbound phone instead of being dropped."""
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?cust ?phone WHERE {
  ?ord ex:by ?cust .
  OPTIONAL { ?cust ex:phone ?phone . FILTER(strstarts(?phone, "99")) }
}""",
    )
    got = {r["cust"]: r["phone"] for r in out.collect()}
    assert got == {EX + "c1": None, EX + "c2": None, EX + "c3": None}


def test_filter_unbound_var_is_loud(spark):
    with pytest.raises(ValueError, match="never binds"):
        se.execute_sparql(
            _shop(spark),
            "PREFIX ex: <http://example.org/>\nSELECT ?c WHERE {\n  ?c ex:seg ?s .\n  FILTER(?zzz > 1)\n}",
        )


def test_lang_and_langmatches(spark):
    """Language-tagged literals (obj_datatype = rdf:langString@tag) are
    selectable by tag: lang() extracts it, langMatches does RFC 4647 basic
    filtering including the "*" range and subtag extension."""
    LS = vocab.RDF + "langString@"
    t = _triples(
        spark,
        [
            (EX + "d1", EX + "label", "literal", None, "colour", LS + "en-GB"),
            (EX + "d2", EX + "label", "literal", None, "color", LS + "en"),
            (EX + "d3", EX + "label", "literal", None, "Farbe", LS + "de"),
            (EX + "d4", EX + "label", "literal", None, "plain", vocab.XSD_STRING),
        ],
    )
    en = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?s WHERE { ?s ex:label ?l . FILTER(langMatches(lang(?l), "en")) }""",
    )
    assert sorted(r["s"] for r in en.collect()) == [EX + "d1", EX + "d2"]
    anytag = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?s WHERE { ?s ex:label ?l . FILTER(langMatches(lang(?l), "*")) }""",
    )
    assert sorted(r["s"] for r in anytag.collect()) == [EX + "d1", EX + "d2", EX + "d3"]
    exact = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?s WHERE { ?s ex:label ?l . FILTER(lang(?l) = "de") }""",
    )
    assert [r["s"] for r in exact.collect()] == [EX + "d3"]


def _chain(spark):
    """a -next-> b -next-> c -next-> d, plus a -by-> c1 -inNation-> n1."""
    rows = [
        (EX + "a", EX + "next", "iri", EX + "b", None, None),
        (EX + "b", EX + "next", "iri", EX + "c", None, None),
        (EX + "c", EX + "next", "iri", EX + "d", None, None),
        (EX + "a", EX + "by", "iri", EX + "c1", None, None),
        (EX + "c1", EX + "inNation", "iri", EX + "n1", None, None),
    ]
    return _triples(spark, rows)


def test_path_transitive_plus(spark):
    out = se.execute_sparql(
        _chain(spark),
        "PREFIX ex: <http://example.org/>\nSELECT ?x ?y WHERE { ?x ex:next+ ?y . }",
    )
    got = sorted((r["x"][-1], r["y"][-1]) for r in out.collect())
    assert got == [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]


def test_path_sequence_and_inverse(spark):
    t = _chain(spark)
    seq = se.execute_sparql(
        t,
        "PREFIX ex: <http://example.org/>\nSELECT ?n WHERE { <http://example.org/a> ex:by/ex:inNation ?n . }",
    )
    assert [r["n"] for r in seq.collect()] == [EX + "n1"]
    # ?x ^next c  ≡  c next ?x  → d
    inv = se.execute_sparql(
        t,
        "PREFIX ex: <http://example.org/>\nSELECT ?x WHERE { ?x ^ex:next <http://example.org/c> . }",
    )
    assert [r["x"] for r in inv.collect()] == [EX + "d"]
    # inverse + transitive compose: ?y ^next+ a ≡ a next+ ?y
    invp = se.execute_sparql(
        t,
        "PREFIX ex: <http://example.org/>\nSELECT ?y WHERE { ?y ^ex:next+ <http://example.org/a> . }",
    )
    assert sorted(r["y"][-1] for r in invp.collect()) == ["b", "c", "d"]


def test_path_joins_with_plain_patterns(spark):
    out = se.execute_sparql(
        _chain(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?y ?n WHERE {
  ?x ex:next+ ?y .
  ?x ex:by/ex:inNation ?n .
}""",
    )
    got = sorted((r["y"][-1], r["n"][-1]) for r in out.collect())
    assert got == [("b", "1"), ("c", "1"), ("d", "1")]


def test_path_zero_or_more(spark):
    """next* = zero-length self-pairs over ALL graph terms (a,b,c,d,c1,n1)
    plus the transitive next-pairs."""
    out = se.execute_sparql(
        _chain(spark),
        "PREFIX ex: <http://example.org/>\nSELECT ?x ?y WHERE { ?x ex:next* ?y . }",
    )
    got = sorted((r["x"][len(EX):], r["y"][len(EX):]) for r in out.collect())
    selfp = [(t, t) for t in ["a", "b", "c", "c1", "d", "n1"]]
    plus = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    assert got == sorted(selfp + plus)


def test_path_zero_or_one(spark):
    out = se.execute_sparql(
        _chain(spark),
        "PREFIX ex: <http://example.org/>\nSELECT ?y WHERE { <http://example.org/a> ex:next? ?y . }",
    )
    assert sorted(r["y"][len(EX):] for r in out.collect()) == ["a", "b"]


def test_path_alternation_and_precedence(spark):
    t = _chain(spark)
    alt = se.execute_sparql(
        t,
        "PREFIX ex: <http://example.org/>\nSELECT ?x ?y WHERE { ?x ex:next|ex:by ?y . }",
    )
    got = sorted((r["x"][len(EX):], r["y"][len(EX):]) for r in alt.collect())
    assert got == [("a", "b"), ("a", "c1"), ("b", "c"), ("c", "d")]
    # '|' binds loosest: by/inNation|next == (by/inNation)|(next)
    prec = se.execute_sparql(
        t,
        "PREFIX ex: <http://example.org/>\nSELECT ?y WHERE { <http://example.org/a> ex:by/ex:inNation|ex:next ?y . }",
    )
    assert sorted(r["y"][len(EX):] for r in prec.collect()) == ["b", "n1"]
    # simple alternation is bag union: a pair reachable through both
    # alternatives is two solutions (SPARQL's UNION translation)
    bag = se.execute_sparql(
        t,
        "PREFIX ex: <http://example.org/>\nSELECT ?x ?y WHERE { ?x ex:next|ex:next ?y . }",
    )
    assert bag.count() == 6


def test_path_modifier_validation(spark):
    with pytest.raises(ValueError, match="double path modifier"):
        se.parse_query(
            "PREFIX ex: <http://example.org/>\nSELECT ?x ?y WHERE { ?x ex:next+* ?y . }"
        )
    with pytest.raises(ValueError, match="'\\|' without"):
        se.parse_query(
            "PREFIX ex: <http://example.org/>\nSELECT ?x ?y WHERE { ?x |ex:next ?y . }"
        )


# ---------------------------------------------------------------------------
# aggregates: COUNT/SUM/AVG/MIN/MAX + GROUP BY
# ---------------------------------------------------------------------------


def test_aggregate_group_by(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?seg (COUNT(*) AS ?n) (SUM(?total) AS ?revenue) WHERE {
  ?ord ex:by ?cust .
  ?ord ex:total ?total .
  ?cust ex:seg ?seg .
} GROUP BY ?seg ORDER BY ?seg""",
    )
    rows = [(r["seg"], r["n"], r["revenue"]) for r in out.collect()]
    assert rows == [
        (se.lit_binding("AUTO", vocab.XSD_STRING), 2, 250000.0),
        (se.lit_binding("BUILDING", vocab.XSD_STRING), 1, 150000.0),
    ]


def test_aggregate_global_and_distinct_count(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT (COUNT(DISTINCT ?cust) AS ?n_cust) (AVG(?total) AS ?mean) (MIN(?ord) AS ?first) WHERE {
  ?ord ex:by ?cust .
  ?ord ex:total ?total .
}""",
    )
    r = out.collect()[0]
    assert r["n_cust"] == 3
    assert abs(r["mean"] - (150000 + 50000 + 200000) / 3) < 1e-9
    assert r["first"] == EX + "o1"


def test_aggregate_validation_is_loud(spark):
    t = _shop(spark)
    with pytest.raises(ValueError, match="outside GROUP BY"):
        se.execute_sparql(
            t,
            """PREFIX ex: <http://example.org/>
SELECT ?cust (COUNT(*) AS ?n) WHERE { ?ord ex:by ?cust . }""",
        )
    with pytest.raises(ValueError, match="GROUP BY without an aggregate"):
        se.execute_sparql(
            t,
            "PREFIX ex: <http://example.org/>\nSELECT ?cust WHERE { ?ord ex:by ?cust . } GROUP BY ?cust",
        )
    # HAVING cannot reference SELECT aliases (SPARQL scope rule: repeat the
    # aggregate call inside HAVING instead)
    with pytest.raises(ValueError, match="never binds"):
        se.execute_sparql(
            t,
            """PREFIX ex: <http://example.org/>
SELECT ?cust (COUNT(*) AS ?n) WHERE { ?ord ex:by ?cust . } GROUP BY ?cust HAVING (?n > 1)""",
        )


def test_aggregate_non_numeric_sum_is_null(spark):
    """SUM over a non-numeric literal: the try_cast yields NULL per row, so
    the aggregate is NULL — SPARQL's error, not a crash or a zero."""
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT (SUM(?seg) AS ?s) WHERE { ?cust ex:seg ?seg . }""",
    )
    assert out.collect()[0]["s"] is None


# ---------------------------------------------------------------------------
# CONSTRUCT / ASK query forms
# ---------------------------------------------------------------------------


def test_construct_builds_triples_frame(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
CONSTRUCT {
  ?cust ex:label ?seg .
  ?cust a ex:Customer .
} WHERE {
  ?ord ex:by ?cust .
  ?cust ex:seg ?seg .
}""",
    )
    assert out.columns == [
        "subj", "pred", "obj_kind", "obj_iri", "obj_lexical", "obj_datatype"
    ]
    rows = {(r["subj"], r["pred"], r["obj_kind"], r["obj_iri"], r["obj_lexical"])
            for r in out.collect()}
    # distinct set semantics: one typed triple + one label triple per customer
    assert (EX + "c1", vocab.RDF_TYPE, "iri", EX + "Customer", None) in rows
    assert (EX + "c2", EX + "label", "literal", None, "AUTO") in rows
    assert len(rows) == 6


def test_construct_skips_unbound_optional_instantiations(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
CONSTRUCT { ?cust ex:contact ?phone . } WHERE {
  ?ord ex:by ?cust .
  OPTIONAL { ?cust ex:phone ?phone . }
}""",
    )
    rows = [(r["subj"], r["obj_lexical"]) for r in out.collect()]
    assert rows == [(EX + "c1", "11-222")]


def test_ask_form(spark):
    t = _shop(spark)
    yes = se.execute_sparql(
        t, 'PREFIX ex: <http://example.org/>\nASK { ?c ex:seg "BUILDING" . }'
    )
    assert [r["ask"] for r in yes.collect()] == [True]
    no = se.execute_sparql(
        t, 'PREFIX ex: <http://example.org/>\nASK { ?c ex:seg "MACHINERY" . }'
    )
    assert [r["ask"] for r in no.collect()] == [False]


# ---------------------------------------------------------------------------
# FILTER [NOT] EXISTS and MINUS
# ---------------------------------------------------------------------------


def test_not_exists_anti_join(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?cust WHERE {
  ?ord ex:by ?cust .
  FILTER NOT EXISTS { ?cust ex:phone ?p . }
}""",
    )
    assert sorted(r["cust"] for r in out.collect()) == [EX + "c2", EX + "c3"]


def test_exists_semi_join_with_inner_filter(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?ord WHERE {
  ?ord ex:by ?cust .
  FILTER EXISTS { ?ord ex:total ?t . FILTER(?t >= 150000) }
}""",
    )
    assert sorted(r["ord"] for r in out.collect()) == [EX + "o1", EX + "o3"]


def test_minus_removes_compatible_bindings(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?ord WHERE {
  ?ord ex:by ?cust .
  MINUS { ?ord ex:by <http://example.org/c1> . }
}""",
    )
    assert sorted(r["ord"] for r in out.collect()) == [EX + "o2", EX + "o3"]


def test_minus_disjoint_domain_is_noop(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?ord WHERE {
  ?ord ex:total ?t .
  MINUS { ?x ex:phone ?p . }
}""",
    )
    assert out.count() == 3  # spec: disjoint domains remove nothing


def test_exists_no_shared_var_is_loud(spark):
    with pytest.raises(ValueError, match="shares no variable"):
        se.execute_sparql(
            _shop(spark),
            """PREFIX ex: <http://example.org/>
SELECT ?ord WHERE {
  ?ord ex:total ?t .
  FILTER NOT EXISTS { ?x ex:phone ?p . }
}""",
        )


# ---------------------------------------------------------------------------
# VALUES and DESCRIBE
# ---------------------------------------------------------------------------


def test_values_single_var_restricts_bindings(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?ord ?cust WHERE {
  VALUES ?cust { <http://example.org/c1> <http://example.org/c3> }
  ?ord ex:by ?cust .
}""",
    )
    got = sorted((r["ord"][-2:], r["cust"][-2:]) for r in out.collect())
    assert got == [("o1", "c1"), ("o3", "c3")]


def test_values_multi_var_rows_join(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?ord ?label WHERE {
  VALUES (?cust ?label) {
    (<http://example.org/c1> "first")
    (<http://example.org/c2> "second")
  }
  ?ord ex:by ?cust .
}""",
    )
    got = sorted((r["ord"][-2:], r["label"]) for r in out.collect())
    assert got == [
        ("o1", se.lit_binding("first", vocab.XSD_STRING)),
        ("o2", se.lit_binding("second", vocab.XSD_STRING)),
    ]


def test_values_undef_rejected(spark):
    with pytest.raises(ValueError, match="UNDEF"):
        se.execute_sparql(
            _shop(spark),
            "PREFIX ex: <http://example.org/>\n"
            "SELECT ?o WHERE { VALUES ?c { UNDEF } ?o ex:by ?c . }",
        )


def test_describe_iri_constant(spark):
    out = se.execute_sparql(
        _shop(spark), "DESCRIBE <http://example.org/c1>"
    )
    rows = {(r["pred"], r["obj_lexical"]) for r in out.collect()}
    assert rows == {(EX + "seg", "BUILDING"), (EX + "phone", "11-222")}
    assert out.columns == [
        "subj", "pred", "obj_kind", "obj_iri", "obj_lexical", "obj_datatype"
    ]


def test_describe_var_with_where(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
DESCRIBE ?cust WHERE { ?cust ex:seg "AUTO" . }""",
    )
    subjects = {r["subj"] for r in out.collect()}
    assert subjects == {EX + "c2", EX + "c3"}
    assert out.count() == 2  # one seg triple each; no phones on c2/c3


def test_describe_var_without_where_is_loud(spark):
    with pytest.raises(ValueError, match="WHERE"):
        se.execute_sparql(_shop(spark), "DESCRIBE ?x")


# ---------------------------------------------------------------------------
# BIND
# ---------------------------------------------------------------------------


def test_bind_arithmetic_and_filter_scope(spark):
    # the group's FILTER sees the BIND variable (whole-group filter scope)
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?ord ?half WHERE {
  ?ord ex:total ?t .
  BIND(?t / 2 AS ?half)
  FILTER(?half >= 75000)
}""",
    )
    got = sorted((r["ord"][-2:], r["half"]) for r in out.collect())
    assert got == [
        ("o1", se.lit_binding("75000.0", vocab.XSD_DOUBLE)),
        ("o3", se.lit_binding("100000.0", vocab.XSD_DOUBLE)),
    ]


def test_bind_string_functions(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?cust ?tag WHERE {
  ?cust ex:seg ?seg .
  BIND(CONCAT(LCASE(?seg), "#", SUBSTR(STR(?cust), 20, 2)) AS ?tag)
}""",
    )
    tags = sorted(r["tag"] for r in out.collect())
    assert tags == [
        se.lit_binding("auto#c2"),
        se.lit_binding("auto#c3"),
        se.lit_binding("building#c1"),
    ]


def test_bind_if_and_coalesce_over_optional(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?cust ?contact ?size WHERE {
  ?cust ex:seg ?seg .
  OPTIONAL { ?cust ex:phone ?ph . }
  BIND(COALESCE(?ph, "unlisted") AS ?contact)
  BIND(IF(STRLEN(?seg) > 4, "long", "short") AS ?size)
}""",
    )
    got = {
        r["cust"][-2:]: (r["contact"], r["size"]) for r in out.collect()
    }
    assert got == {
        "c1": (se.lit_binding("11-222"), se.lit_binding("long")),
        "c2": (se.lit_binding("unlisted"), se.lit_binding("short")),
        "c3": (se.lit_binding("unlisted"), se.lit_binding("short")),
    }


def test_bind_replace_and_numeric_error_is_unbound(spark):
    # REPLACE rewrites the lexical; arithmetic on a non-numeric literal
    # yields an unbound (NULL) binding, not a crash (expression-error rule)
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?cust ?clean ?bogus WHERE {
  ?cust ex:phone ?ph .
  BIND(REPLACE(?ph, "-", "") AS ?clean)
  BIND(?ph * 2 AS ?bogus)
}""",
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["clean"] == se.lit_binding("11222")
    assert rows[0]["bogus"] is None


def test_bind_rebinding_in_scope_var_is_loud(spark):
    with pytest.raises(ValueError, match="already in scope"):
        se.execute_sparql(
            _shop(spark),
            "PREFIX ex: <http://example.org/>\n"
            "SELECT ?o WHERE { ?o ex:total ?t . BIND(?t AS ?o) }",
        )


def test_bind_malformed_is_loud(spark):
    with pytest.raises(ValueError, match="BIND must have the form"):
        se.execute_sparql(
            _shop(spark),
            "PREFIX ex: <http://example.org/>\n"
            "SELECT ?o WHERE { ?o ex:total ?t . BIND(?t + 1) }",
        )


def test_filter_parenthesized_arithmetic_comparison(spark):
    # the backtracking path: '(' opens an arithmetic group, not a boolean one
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?ord WHERE {
  ?ord ex:total ?t .
  FILTER((?t + 100000) * 2 >= 500000)
}""",
    )
    assert sorted(r["ord"][-2:] for r in out.collect()) == ["o1", "o3"]


def test_select_expression_projection(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?ord (?t / 1000 AS ?kilo) (CONCAT("seg:", ?seg) AS ?label) WHERE {
  ?ord ex:by ?cust .
  ?ord ex:total ?t .
  ?cust ex:seg ?seg .
}
ORDER BY ?ord""",
    )
    assert out.columns == ["ord", "kilo", "label"]
    rows = out.collect()
    assert [r["kilo"] for r in rows] == [
        se.lit_binding("150.0", vocab.XSD_DOUBLE),
        se.lit_binding("50.0", vocab.XSD_DOUBLE),
        se.lit_binding("200.0", vocab.XSD_DOUBLE),
    ]
    assert rows[0]["label"] == se.lit_binding("seg:BUILDING")


def test_select_expression_sees_earlier_alias(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT (?t / 1000 AS ?kilo) (?kilo * 2 AS ?twice) WHERE {
  <http://example.org/o1> ex:total ?t .
}""",
    )
    r = out.collect()[0]
    assert r["twice"] == se.lit_binding("300.0", vocab.XSD_DOUBLE)


def test_select_expression_with_aggregate_is_loud(spark):
    with pytest.raises(ValueError, match="alongside aggregates"):
        se.execute_sparql(
            _shop(spark),
            "PREFIX ex: <http://example.org/>\n"
            "SELECT (COUNT(*) AS ?n) (?t * 2 AS ?d) WHERE { ?o ex:total ?t . }",
        )


def test_select_head_garbage_is_loud(spark):
    with pytest.raises(ValueError, match="unsupported SELECT"):
        se.parse_query(
            "PREFIX ex: <http://example.org/>\n"
            "SELECT ?x $bogus WHERE { ?x ex:p ?y . }"
        )


# ---------------------------------------------------------------------------
# HAVING / GROUP_CONCAT / SAMPLE / DISTINCT-with-aggregates
# ---------------------------------------------------------------------------


def test_having_filters_groups(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?seg (COUNT(*) AS ?n) WHERE {
  ?ord ex:by ?cust .
  ?cust ex:seg ?seg .
} GROUP BY ?seg HAVING (COUNT(*) > 1)""",
    )
    rows = [(r["seg"], r["n"]) for r in out.collect()]
    assert rows == [(se.lit_binding("AUTO", vocab.XSD_STRING), 2)]


def test_having_multiple_constraints_and_sum(spark):
    """Two parenthesized HAVING constraints conjoin; a SUM call in HAVING
    that is NOT in SELECT computes as a hidden column and drops."""
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?seg (COUNT(*) AS ?n) WHERE {
  ?ord ex:by ?cust .
  ?ord ex:total ?total .
  ?cust ex:seg ?seg .
} GROUP BY ?seg HAVING (SUM(?total) > 100000) (COUNT(*) >= 1) ORDER BY ?seg""",
    )
    assert out.columns == ["seg", "n"]
    rows = [(r["seg"], r["n"]) for r in out.collect()]
    assert rows == [
        (se.lit_binding("AUTO", vocab.XSD_STRING), 2),
        (se.lit_binding("BUILDING", vocab.XSD_STRING), 1),
    ]


def test_having_on_group_var_and_global(spark):
    # HAVING may reference grouped variables directly
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?seg (COUNT(*) AS ?n) WHERE {
  ?cust ex:seg ?seg .
} GROUP BY ?seg HAVING (?seg = "AUTO")""",
    )
    rows = [(r["seg"], r["n"]) for r in out.collect()]
    assert rows == [(se.lit_binding("AUTO", vocab.XSD_STRING), 2)]
    # global aggregate + HAVING (no GROUP BY): empty result when it fails
    out2 = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT (COUNT(*) AS ?n) WHERE { ?ord ex:by ?cust . } HAVING (COUNT(*) > 99)""",
    )
    assert out2.count() == 0


def test_group_concat_and_sample(spark):
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?seg (GROUP_CONCAT(?cust; SEPARATOR="|") AS ?custs)
       (SAMPLE(?cust) AS ?one) WHERE {
  ?cust ex:seg ?seg .
} GROUP BY ?seg ORDER BY ?seg""",
    )
    rows = [(r["seg"], r["custs"], r["one"]) for r in out.collect()]
    assert rows == [
        (se.lit_binding("AUTO", vocab.XSD_STRING), f"{EX}c2|{EX}c3", EX + "c2"),
        (se.lit_binding("BUILDING", vocab.XSD_STRING), EX + "c1", EX + "c1"),
    ]


def test_group_concat_default_sep_distinct_and_lexical(spark):
    """Default separator is a single space; DISTINCT collapses duplicate
    lexical forms (two AUTO customers -> one 'AUTO')."""
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT (GROUP_CONCAT(DISTINCT ?seg) AS ?segs) WHERE {
  ?cust ex:seg ?seg .
}""",
    )
    assert out.collect()[0]["segs"] == "AUTO BUILDING"


def test_distinct_with_aggregates(spark):
    """SELECT DISTINCT over an aggregate projection: the two AUTO customers
    produce identical (n) rows per group only after dropping ?seg — DISTINCT
    collapses them."""
    out = se.execute_sparql(
        _shop(spark),
        """PREFIX ex: <http://example.org/>
SELECT DISTINCT (COUNT(?ord) AS ?n) WHERE {
  ?ord ex:by ?cust .
} GROUP BY ?cust""",
    )
    assert [r["n"] for r in out.collect()] == [1]


# ---------------------------------------------------------- round-3 features


def test_negated_property_set_single(spark):
    """`!ex:age`: every forward edge whose predicate is not ex:age."""
    out = se.execute_sparql(
        _graph(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?s ?o WHERE { ?s !ex:age ?o . }""",
    )
    assert sorted(map(tuple, out.collect())) == [
        (EX + "a", EX + "b"),
        (EX + "b", EX + "Person"),
        (EX + "b", EX + "c"),
    ]


def test_negated_property_set_with_inverse_member(spark):
    """`!(ex:age|a|^ex:knows)` = forward edges with pred ∉ {age, rdf:type}
    ∪ inverse edges with pred ∉ {knows} (SPARQL 1.1 §9.1 split)."""
    out = se.execute_sparql(
        _graph(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?s ?o WHERE { ?s !(ex:age|a|^ex:knows) ?o . }""",
    )
    # forward: the two knows edges; inverse: reversed age + reversed type
    assert sorted(map(tuple, out.collect())) == sorted(
        [
            (EX + "a", EX + "b"),
            (EX + "b", EX + "c"),
            (se.lit_binding("30", vocab.XSD + "integer"), EX + "a"),
            (se.lit_binding("40", vocab.XSD + "integer"), EX + "b"),
            (EX + "Person", EX + "b"),
        ]
    )


def test_negated_property_set_in_sequence_and_modifier(spark):
    """An NPS composes in a sequence and takes a path modifier."""
    out = se.execute_sparql(
        _graph(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?s ?o WHERE { ?s !(ex:age|a)+ ?o . }""",
    )
    # closure over the knows edges only
    assert sorted(map(tuple, out.collect())) == [
        (EX + "a", EX + "b"),
        (EX + "a", EX + "c"),
        (EX + "b", EX + "c"),
    ]


def test_negated_property_set_empty_is_loud():
    with pytest.raises(ValueError, match="empty negated property set"):
        se.parse_query("SELECT ?s WHERE { ?s !() ?o . }")


def test_plain_parenthesized_path_is_loud():
    with pytest.raises(ValueError, match="parenthesized"):
        se.parse_query(
            "PREFIX ex: <http://example.org/>\n"
            "SELECT ?s WHERE { ?s (ex:p/ex:q) ?o . }"
        )


def test_subquery_aggregate_joins_outer(spark):
    """A `{ SELECT … GROUP BY … }` subquery computes per-node counts that
    join the outer pattern on the shared variable."""
    out = se.execute_sparql(
        _graph(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?s ?n WHERE {
  ?s ex:age ?age .
  { SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ex:knows ?o . } GROUP BY ?s }
}""",
    )
    assert sorted(map(tuple, out.collect())) == [(EX + "a", "1"), (EX + "b", "1")]


def test_subquery_limit_restricts_outer(spark):
    """ORDER BY + LIMIT inside the subquery: top-1 age holder only."""
    out = se.execute_sparql(
        _graph(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?s ?o WHERE {
  ?s ex:knows ?o .
  { SELECT ?s WHERE { ?s ex:age ?v . } ORDER BY ?v LIMIT 1 }
}""",
    )
    assert sorted(map(tuple, out.collect())) == [(EX + "a", EX + "b")]


def test_subquery_in_union_branch_is_loud():
    with pytest.raises(ValueError, match="subquery cannot be a UNION branch"):
        se.parse_query(
            "SELECT ?s WHERE { { SELECT ?s WHERE { ?s ex:p ?o . } } "
            "UNION { ?s ex:q ?o . } }"
        )


def test_filter_in_and_not_in(spark):
    g = _graph(spark)
    out = se.execute_sparql(
        g,
        """PREFIX ex: <http://example.org/>
SELECT ?s WHERE { ?s ex:age ?v . FILTER(?v IN (30, 99)) }""",
    )
    assert [r["s"] for r in out.collect()] == [EX + "a"]
    out = se.execute_sparql(
        g,
        """PREFIX ex: <http://example.org/>
SELECT ?s WHERE { ?s ex:age ?v . FILTER(?v NOT IN (30, 99)) }""",
    )
    assert [r["s"] for r in out.collect()] == [EX + "b"]


def test_filter_in_iris(spark):
    out = se.execute_sparql(
        _graph(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?o WHERE { <http://example.org/a> ex:knows ?o . FILTER(?o IN (ex:b, ex:zzz)) }""",
    )
    assert [r["o"] for r in out.collect()] == [EX + "b"]


def test_filter_datatype(spark):
    out = se.execute_sparql(
        _graph(spark),
        """PREFIX ex: <http://example.org/>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
SELECT ?s WHERE { ?s ex:age ?v . FILTER(DATATYPE(?v) = xsd:integer) }""",
    )
    assert sorted(r["s"] for r in out.collect()) == [EX + "a", EX + "b"]
    # DATATYPE of an IRI binding is a type error -> row drops
    out = se.execute_sparql(
        _graph(spark),
        """PREFIX ex: <http://example.org/>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
SELECT ?o WHERE { ?s ex:knows ?o . FILTER(DATATYPE(?o) = xsd:string) }""",
    )
    assert out.collect() == []


def test_predicate_object_lists(spark):
    """';' shares the subject, ',' shares subject+predicate; a trailing ';'
    before '.' is legal (Turtle/SPARQL abbreviation grammar)."""
    out = se.execute_sparql(
        _graph(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?x ?o WHERE {
  ?x ex:age "40"^^xsd:integer ;
     a ex:Person ;
     ex:knows ?o , <http://example.org/c> ;
  .
}""",
    )
    assert sorted(map(tuple, out.collect())) == [(EX + "b", EX + "c")]


def test_semicolon_with_path_predicate(spark):
    out = se.execute_sparql(
        _graph(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?x ?y WHERE { ?x ex:age ?v ; ex:knows+ ?y . }""",
    )
    assert sorted(map(tuple, out.collect())) == [
        (EX + "a", EX + "b"),
        (EX + "a", EX + "c"),
        (EX + "b", EX + "c"),
    ]


def test_dangling_semicolon_is_loud():
    with pytest.raises(ValueError, match="';' before a complete triple"):
        se.parse_query("SELECT ?x WHERE { ?x ; ex:p ?o . }")


# ------------------------------------------------------------------ GRAPH

def _lineage_graph(spark):
    """Triples with lineage: conv c1 holds a-knows-b + a's age, conv c2
    holds b-knows-c; the Person typing is derived (NULL conv) and therefore
    lives only in the default graph."""
    rows = [
        (EX + "a", EX + "knows", "iri", EX + "b", None, None, "c1", 0),
        (EX + "a", EX + "age", "literal", None, "30", vocab.XSD + "integer", "c1", 1),
        (EX + "b", EX + "knows", "iri", EX + "c", None, None, "c2", 0),
        (EX + "b", vocab.RDF_TYPE, "iri", EX + "Person", None, None, None, None),
    ]
    return spark.createDataFrame(rows, TRIPLES)


def test_graph_var_binds_lineage_iri(spark):
    out = se.execute_sparql(
        _lineage_graph(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?g ?x ?y WHERE { GRAPH ?g { ?x ex:knows ?y . } }""",
    )
    assert sorted(map(tuple, out.collect())) == [
        ("urn:conv:c1", EX + "a", EX + "b"),
        ("urn:conv:c2", EX + "b", EX + "c"),
    ]


def test_graph_constant_scopes_scan(spark):
    out = se.execute_sparql(
        _lineage_graph(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?x ?y WHERE { GRAPH <urn:conv:c1> { ?x ex:knows ?y . } }""",
    )
    assert sorted(map(tuple, out.collect())) == [(EX + "a", EX + "b")]
    # an IRI outside the lineage namespace names no graph -> empty
    out = se.execute_sparql(
        _lineage_graph(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?x WHERE { GRAPH <http://example.org/g1> { ?x ex:knows ?y . } }""",
    )
    assert out.collect() == []


def test_graph_var_coscopes_same_group_patterns(spark):
    # both patterns must match INSIDE one conversation: only c1 qualifies
    out = se.execute_sparql(
        _lineage_graph(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?g ?x ?n WHERE { GRAPH ?g { ?x ex:knows ?y . ?x ex:age ?n . } }""",
    )
    assert sorted(map(tuple, out.collect())) == [
        ("urn:conv:c1", EX + "a", se.lit_binding("30", vocab.XSD + "integer")),
    ]


def test_default_graph_is_union_and_joins_graph_unit(spark):
    # the Person typing has NULL conv: visible in the default graph,
    # invisible to GRAPH ?g
    out = se.execute_sparql(
        _lineage_graph(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?g ?x WHERE { GRAPH ?g { ?x a ex:Person . } }""",
    )
    assert out.collect() == []
    out = se.execute_sparql(
        _lineage_graph(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?g ?x WHERE {
  ?x a ex:Person .
  GRAPH ?g { ?y ex:knows ?x . }
}""",
    )
    assert sorted(map(tuple, out.collect())) == [("urn:conv:c1", EX + "b")]


def test_graph_loud_errors(spark):
    with pytest.raises(ValueError, match="nested GRAPH"):
        se.parse_query(
            "SELECT ?x WHERE { GRAPH ?g { GRAPH ?h { ?x ex:p ?y . } } }"
        )
    with pytest.raises(ValueError, match="paths inside GRAPH"):
        se.execute_sparql(
            _lineage_graph(spark),
            """PREFIX ex: <http://example.org/>
SELECT ?x ?y WHERE { GRAPH ?g { ?x ex:knows+ ?y . } }""",
        ).collect()
    with pytest.raises(ValueError, match="subquery inside GRAPH"):
        se.execute_sparql(
            _lineage_graph(spark),
            """PREFIX ex: <http://example.org/>
SELECT ?g ?c WHERE { GRAPH ?g { { SELECT ?c WHERE { ?c ex:knows ?y . } } } }""",
        ).collect()
    with pytest.raises(ValueError, match="SERVICE"):
        se.parse_query(
            "SELECT ?x WHERE { GRAPH ?g { SERVICE <http://r/s> { ?x ex:p ?y . } } }"
        )


# ------------------------------------------- value-function tail (§17.4)

def test_numeric_value_functions(spark):
    # ages 30 (a) and 40 (b); BIND arithmetic feeds ABS/ROUND/CEIL/FLOOR
    out = se.execute_sparql(
        _graph(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?x ?r ?c ?f ?ab WHERE {
  ?x ex:age ?v .
  BIND(ROUND(?v / 7) AS ?r)
  BIND(CEIL(?v / 7) AS ?c)
  BIND(FLOOR(?v / 7) AS ?f)
  BIND(ABS(0 - ?v) AS ?ab)
}""",
    )
    got = {r["x"]: (r["r"], r["c"], r["f"], r["ab"]) for r in out.collect()}
    D = vocab.XSD_DOUBLE
    assert got[EX + "a"] == (  # 30/7 = 4.2857...
        se.lit_binding("4.0", D), se.lit_binding("5.0", D),
        se.lit_binding("4.0", D), se.lit_binding("30.0", D),
    )
    assert got[EX + "b"][0] == se.lit_binding("6.0", D)  # 40/7 = 5.714 -> 6


def test_round_ties_toward_positive_infinity(spark):
    # XPath fn:round: round(-2.5) = -2 (Spark's HALF_UP would give -3)
    out = se.execute_sparql(
        _graph(spark),
        """PREFIX ex: <http://example.org/>
SELECT ?r WHERE {
  ex:a ex:age ?v .
  BIND(ROUND(0 - ?v / 12) AS ?r)
}""",
    )
    assert [r["r"] for r in out.collect()] == [se.lit_binding("-2.0", vocab.XSD_DOUBLE)]


def test_strbefore_strafter(spark):
    t = _triples(
        spark,
        [(EX + "d", EX + "label", "literal", None, "alpha-beta-gamma", vocab.XSD_STRING)],
    )
    out = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?b ?a ?miss ?empty ?all WHERE {
  ?x ex:label ?l .
  BIND(STRBEFORE(?l, "-") AS ?b)
  BIND(STRAFTER(?l, "-") AS ?a)
  BIND(STRAFTER(?l, "zzz") AS ?miss)
  BIND(STRBEFORE(?l, "") AS ?empty)
  BIND(STRAFTER(?l, "") AS ?all)
}""",
    )
    S = vocab.XSD_STRING
    row = out.collect()[0]
    assert (row["b"], row["a"], row["miss"], row["empty"], row["all"]) == (
        se.lit_binding("alpha", S),
        se.lit_binding("beta-gamma", S),   # FIRST occurrence splits
        se.lit_binding("", S),             # no match -> ""
        se.lit_binding("", S),             # spec: STRBEFORE(x, "") = ""
        se.lit_binding("alpha-beta-gamma", S),  # spec: STRAFTER(x, "") = x
    )


def test_isnumeric_and_sameterm(spark):
    t = _triples(
        spark,
        [
            (EX + "d", EX + "v", "literal", None, "12.5", vocab.XSD_DOUBLE),
            (EX + "e", EX + "v", "literal", None, "oops", vocab.XSD_DOUBLE),
            (EX + "f", EX + "v", "literal", None, "12.5", vocab.XSD_STRING),
            (EX + "g", EX + "v", "iri", EX + "d", None, None),
        ],
    )
    out = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?x WHERE { ?x ex:v ?v . FILTER(isNumeric(?v)) }""",
    )
    # valid numeric lexical + numeric datatype only: the invalid double and
    # the string-typed "12.5" both fail
    assert sorted(r["x"] for r in out.collect()) == [EX + "d"]
    # sameTerm is identity on (lexical, datatype) — no numeric promotion:
    # "12.5"^^xsd:double != "12.5"^^xsd:string, but '=' promotes
    out = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?x ?y WHERE {
  ?x ex:v ?v . ?y ex:v ?w .
  FILTER(sameTerm(?v, ?w) && ?x != ?y)
}""",
    )
    assert out.collect() == []
    # var=var '=' is term equality on the binding encoding — for
    # double-vs-string 12.5 that coincides with the spec (incompatible
    # operand types are an error -> false)
    out = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?x ?y WHERE {
  ?x ex:v ?v . ?y ex:v ?w .
  FILTER(?v = ?w && ?x != ?y)
}""",
    )
    assert out.collect() == []
    # a numeric CONSTANT comparison takes the promotion path: the valid
    # double matches, the invalid lexical try_casts to NULL and drops
    out = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?x WHERE { ?x ex:v ?v . FILTER(?v = 12.5 && isNumeric(?v)) }""",
    )
    assert sorted(r["x"] for r in out.collect()) == [EX + "d"]


def test_isblank(spark):
    rows = [
        (EX + "s", EX + "p", "bnode", "_:b0", None, None, None, None),
        (EX + "s", EX + "p", "iri", EX + "o", None, None, None, None),
    ]
    t = spark.createDataFrame(rows, TRIPLES)
    out = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?o WHERE { ?s ex:p ?o . FILTER(isBlank(?o)) }""",
    )
    assert [r["o"] for r in out.collect()] == ["_:b0"]
    out = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?o WHERE { ?s ex:p ?o . FILTER(isIRI(?o)) }""",
    )
    assert [r["o"] for r in out.collect()] == [EX + "o"]


def test_select_reduced_keeps_bag(spark):
    # REDUCED may eliminate duplicates but need not — this implementation
    # keeps the bag (conforming), pinned so a change is deliberate
    t = _triples(
        spark,
        [
            (EX + "a", EX + "knows", "iri", EX + "b", None, None),
            (EX + "c", EX + "knows", "iri", EX + "b", None, None),
        ],
    )
    out = se.execute_sparql(
        t,
        "PREFIX ex: <http://example.org/>\nSELECT REDUCED ?o WHERE { ?s ex:knows ?o . }",
    )
    assert sorted(r["o"] for r in out.collect()) == [EX + "b", EX + "b"]


def test_aggregate_numeric_promotion_and_poison(spark):
    # SUM/AVG promote mixed integer/double lexicals through the same
    # try_cast path as FILTER comparisons; a non-numeric lexical is an
    # expression error -> skipped (NULL to the aggregate), not a job abort
    t = _triples(
        spark,
        [
            (EX + "a", EX + "v", "literal", None, "2", vocab.XSD + "integer"),
            (EX + "a", EX + "v", "literal", None, "2.5", vocab.XSD_DOUBLE),
            (EX + "a", EX + "v", "literal", None, "oops", vocab.XSD_DOUBLE),
        ],
    )
    out = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?s (SUM(?v) AS ?total) (COUNT(?v) AS ?n) WHERE { ?s ex:v ?v . } GROUP BY ?s""",
    )
    row = out.collect()[0]
    assert row["total"] == 4.5 and row["n"] == 3


# ------------------------------------------------------------------ UPDATE

def _key6(df):
    return sorted(
        tuple(r) for r in df.select(
            "subj", "pred", "obj_kind", "obj_iri", "obj_lexical", "obj_datatype"
        ).collect()
    )


def test_insert_data_and_delete_data(spark):
    t = _graph(spark)
    n0 = t.count()
    up = se.execute_update(
        t,
        """PREFIX ex: <http://example.org/>
INSERT DATA { ex:c ex:knows ex:a . ex:c ex:age "50"^^xsd:integer . }""",
    )
    assert up.count() == n0 + 2
    # inserting an already-present triple is a set no-op
    again = se.execute_update(
        up, "PREFIX ex: <http://example.org/>\nINSERT DATA { ex:c ex:knows ex:a . }"
    )
    assert again.count() == n0 + 2
    back = se.execute_update(
        again,
        """PREFIX ex: <http://example.org/>
DELETE DATA { ex:c ex:knows ex:a . ex:c ex:age "50"^^xsd:integer . }""",
    )
    assert _key6(back) == _key6(t)


def test_delete_where_pattern_is_template(spark):
    t = _graph(spark)
    up = se.execute_update(
        t, "PREFIX ex: <http://example.org/>\nDELETE WHERE { ?x ex:knows ?y . }"
    )
    assert up.filter(up.pred == EX + "knows").count() == 0
    assert up.count() == t.count() - 2


def test_delete_insert_where_rewrites_edges(spark):
    # reverse every knows-edge into knownBy, both templates instantiated
    # against the ORIGINAL bindings
    t = _graph(spark)
    up = se.execute_update(
        t,
        """PREFIX ex: <http://example.org/>
DELETE { ?a ex:knows ?b . }
INSERT { ?b ex:knownBy ?a . }
WHERE { ?a ex:knows ?b . }""",
    )
    assert up.filter(up.pred == EX + "knows").count() == 0
    got = sorted(
        (r["subj"], r["obj_iri"]) for r in up.filter(up.pred == EX + "knownBy").collect()
    )
    assert got == [(EX + "b", EX + "a"), (EX + "c", EX + "b")]
    # inserted triples carry NULL lineage (derived)
    assert up.filter((up.pred == EX + "knownBy") & up.conv_id.isNotNull()).count() == 0


def test_insert_where_with_filter_and_literal_passthrough(spark):
    t = _graph(spark)
    up = se.execute_update(
        t,
        """PREFIX ex: <http://example.org/>
INSERT { ?x ex:senior "yes" . ?x ex:ageCopy ?v . }
WHERE { ?x ex:age ?v . FILTER(?v > 35) }""",
    )
    rows = up.filter(up.pred == EX + "senior").collect()
    assert [(r["subj"], r["obj_lexical"], r["obj_datatype"]) for r in rows] == [
        (EX + "b", "yes", vocab.XSD_STRING)
    ]
    # the bound-literal object decodes back into lexical+datatype columns
    cp = up.filter(up.pred == EX + "ageCopy").collect()
    assert [(r["subj"], r["obj_lexical"], r["obj_datatype"]) for r in cp] == [
        (EX + "b", "40", vocab.XSD + "integer")
    ]


def test_delete_removes_all_provenance_rows(spark):
    rows = [
        (EX + "s", EX + "p", "iri", EX + "o", None, None, "c1", 0),
        (EX + "s", EX + "p", "iri", EX + "o", None, None, "c2", 5),
        (EX + "s", EX + "q", "iri", EX + "o", None, None, "c1", 1),
    ]
    t = spark.createDataFrame(rows, TRIPLES)
    up = se.execute_update(
        t, "PREFIX ex: <http://example.org/>\nDELETE DATA { ex:s ex:p ex:o . }"
    )
    assert up.count() == 1 and up.collect()[0]["pred"] == EX + "q"


def test_update_loud_errors(spark):
    with pytest.raises(ValueError, match="ground triples"):
        se.parse_update("INSERT DATA { ?x ex:p ex:o . }")
    with pytest.raises(ValueError, match="sequences"):
        se.parse_update(
            "PREFIX ex: <http://example.org/>\n"
            "INSERT DATA { ex:a ex:p ex:o . } ; DELETE DATA { ex:a ex:p ex:o . }"
        )
    with pytest.raises(ValueError, match="WITH"):
        se.parse_update("WITH <urn:g> DELETE { ?s ?p ?o . } WHERE { ?s ?p ?o . }")
    with pytest.raises(ValueError, match="WHERE group"):
        se.parse_update("PREFIX ex: <http://example.org/>\nINSERT { ex:a ex:p ex:o . }")
    with pytest.raises(ValueError, match="plain BGP"):
        se.parse_update(
            "PREFIX ex: <http://example.org/>\n"
            "DELETE WHERE { ?s ex:p ?o . FILTER(?o > 1) }"
        )


def test_hash_functions(spark):
    # §17.4.4.12/14: lowercase-hex digest of the lexical form
    import hashlib

    t = _triples(
        spark,
        [(EX + "d", EX + "label", "literal", None, "abc", vocab.XSD_STRING)],
    )
    out = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?m ?s1 ?s256 WHERE {
  ?x ex:label ?l .
  BIND(MD5(?l) AS ?m)
  BIND(SHA1(?l) AS ?s1)
  BIND(SHA256(?l) AS ?s256)
}""",
    )
    row = out.collect()[0]
    S = vocab.XSD_STRING
    assert row["m"] == se.lit_binding(hashlib.md5(b"abc").hexdigest(), S)
    assert row["s1"] == se.lit_binding(hashlib.sha1(b"abc").hexdigest(), S)
    assert row["s256"] == se.lit_binding(hashlib.sha256(b"abc").hexdigest(), S)


def test_datetime_accessors(spark):
    # §17.4.5: component accessors read the literal's own lexical form
    DT = vocab.XSD + "dateTime"
    t = _triples(
        spark,
        [
            (EX + "e1", EX + "at", "literal", None, "2024-03-05T14:45:13.815-05:00", DT),
            (EX + "e2", EX + "at", "literal", None, "2024-12-31T23:59:59Z", DT),
            (EX + "e3", EX + "at", "literal", None, "2025-01-01T00:00:00", DT),
        ],
    )
    out = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?x ?y ?mo ?d ?h ?mi ?s ?tz WHERE {
  ?x ex:at ?v .
  BIND(YEAR(?v) AS ?y)   BIND(MONTH(?v) AS ?mo)  BIND(DAY(?v) AS ?d)
  BIND(HOURS(?v) AS ?h)  BIND(MINUTES(?v) AS ?mi)
  BIND(SECONDS(?v) AS ?s) BIND(TZ(?v) AS ?tz)
}""",
    )
    got = {r["x"]: r for r in out.collect()}
    D, S = vocab.XSD_DOUBLE, vocab.XSD_STRING
    r1 = got[EX + "e1"]
    assert r1["y"] == se.lit_binding("2024.0", D)
    assert r1["mo"] == se.lit_binding("3.0", D)
    assert r1["d"] == se.lit_binding("5.0", D)
    assert r1["h"] == se.lit_binding("14.0", D)
    assert r1["mi"] == se.lit_binding("45.0", D)
    assert r1["s"] == se.lit_binding("13.815", D)
    assert r1["tz"] == se.lit_binding("-05:00", S)
    assert got[EX + "e2"]["tz"] == se.lit_binding("Z", S)
    # no zone -> "" per spec
    assert got[EX + "e3"]["tz"] == se.lit_binding("", S)


def test_datetime_accessor_on_non_datetime_is_unbound(spark):
    t = _triples(
        spark,
        [(EX + "d", EX + "label", "literal", None, "not a date", vocab.XSD_STRING)],
    )
    out = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?y ?tz WHERE {
  ?x ex:label ?l .
  BIND(YEAR(?l) AS ?y)
  BIND(TZ(?l) AS ?tz)
}""",
    )
    row = out.collect()[0]
    assert row["y"] is None and row["tz"] is None  # expression error -> unbound


def test_iri_strdt_strlang(spark):
    t = _triples(
        spark,
        [(EX + "d", EX + "label", "literal", None, "widget", vocab.XSD_STRING)],
    )
    out = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?u ?typed ?tagged ?isres WHERE {
  ?x ex:label ?l .
  BIND(IRI(CONCAT("http://example.org/item/", ?l)) AS ?u)
  BIND(STRDT(?l, xsd:token) AS ?typed)
  BIND(STRLANG(?l, "EN") AS ?tagged)
  BIND(isIRI(?u) AS ?isres)
}""",
    )
    row = out.collect()[0]
    assert row["u"] == EX + "item/widget"  # raw-IRI binding, no quotes
    assert row["typed"] == se.lit_binding("widget", vocab.XSD + "token")
    # tag normalized to lowercase in the binding encoding
    assert row["tagged"] == '"widget"^^' + vocab.RDF + "langString@en"
    # boolean call in value position -> xsd:boolean literal
    assert row["isres"] == se.lit_binding("true", vocab.XSD + "boolean")


def test_strlang_result_matches_scanned_tagged_literal(spark):
    # STRLANG-built bindings must compare equal to pattern-scanned
    # lang-tagged literals (same encoding), exercised via lang()
    t = _triples(
        spark,
        [
            (EX + "d", EX + "label", "literal", None, "widget",
             vocab.RDF + "langString@en"),
        ],
    )
    out = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?x WHERE {
  ?x ex:label ?l .
  FILTER(sameTerm(?l, STRLANG("widget", "en")))
}""",
    )
    assert [r["x"] for r in out.collect()] == [EX + "d"]


def test_encode_for_uri(spark):
    # §17.4.3.4 examples + UTF-8 multibyte; unreserved set untouched
    t = _triples(
        spark,
        [
            (EX + "d1", EX + "label", "literal", None, "Los Angeles", vocab.XSD_STRING),
            (EX + "d2", EX + "label", "literal", None, "~bébé_9.x-/?#", vocab.XSD_STRING),
        ],
    )
    out = se.execute_sparql(
        t,
        """PREFIX ex: <http://example.org/>
SELECT ?x ?e WHERE {
  ?x ex:label ?l .
  BIND(ENCODE_FOR_URI(?l) AS ?e)
}""",
    )
    got = {r["x"]: r["e"] for r in out.collect()}
    from urllib.parse import quote

    S = vocab.XSD_STRING
    assert got[EX + "d1"] == se.lit_binding("Los%20Angeles", S)
    assert got[EX + "d2"] == se.lit_binding(quote("~bébé_9.x-/?#", safe="~"), S)


# ------------------------------------------------------- graph management

def _quad_store(spark):
    # named graphs c1 (2 triples, one with 2 provenance rows), c2 (1), and
    # one default-graph (NULL-lineage) triple
    rows = [
        (EX + "s1", EX + "p", "iri", EX + "o1", None, None, "c1", 0),
        (EX + "s1", EX + "p", "iri", EX + "o1", None, None, "c1", 3),
        (EX + "s2", EX + "p", "iri", EX + "o2", None, None, "c1", 1),
        (EX + "s3", EX + "p", "iri", EX + "o3", None, None, "c2", 0),
        (EX + "d", EX + "p", "iri", EX + "od", None, None, None, None),
    ]
    return spark.createDataFrame(rows, TRIPLES)


def test_clear_graph_keeps_other_graphs_and_default(spark):
    out = se.execute_update(_quad_store(spark), "CLEAR GRAPH <urn:conv:c1>")
    got = {(r["subj"], r["conv_id"]) for r in out.collect()}
    # the NULL-conv_id row must survive (null-safe negation)
    assert got == {(EX + "s3", "c2"), (EX + "d", None)}


def test_drop_default_named_all(spark):
    t = _quad_store(spark)
    assert {r["conv_id"] for r in se.execute_update(t, "DROP DEFAULT").collect()} == {
        "c1", "c2"
    }
    named_gone = se.execute_update(t, "DROP SILENT NAMED")
    assert [r["conv_id"] for r in named_gone.collect()] == [None]
    assert se.execute_update(t, "CLEAR ALL").count() == 0


def test_create_is_noop_and_checks_namespace(spark):
    t = _quad_store(spark)
    assert se.execute_update(t, "CREATE GRAPH <urn:conv:new>").count() == t.count()
    with pytest.raises(ValueError, match="lineage namespace"):
        se.execute_update(t, "CREATE GRAPH <http://example.org/g>")


def test_copy_replaces_destination(spark):
    out = se.execute_update(
        _quad_store(spark), "COPY <urn:conv:c1> TO <urn:conv:c2>"
    )
    c2 = sorted(
        (r["subj"], r["turn_idx"]) for r in out.filter("conv_id = 'c2'").collect()
    )
    # destination replaced by the source rows (provenance turn_idx kept)
    assert c2 == [(EX + "s1", 0), (EX + "s1", 3), (EX + "s2", 1)]
    assert out.filter("conv_id = 'c1'").count() == 3  # source kept


def test_move_drops_source_and_nulls_lineage_into_default(spark):
    out = se.execute_update(_quad_store(spark), "MOVE GRAPH <urn:conv:c1> TO DEFAULT")
    assert out.filter("conv_id = 'c1'").count() == 0
    dft = out.filter("conv_id IS NULL")
    # default graph replaced by the moved rows; turn_idx nulled with it
    assert {(r["subj"], r["turn_idx"]) for r in dft.collect()} == {
        (EX + "s1", None), (EX + "s2", None)
    }


def test_add_is_idempotent_union(spark):
    t = _quad_store(spark)
    once = se.execute_update(t, "ADD <urn:conv:c2> TO <urn:conv:c1>")
    assert once.filter("conv_id = 'c1'").count() == 4  # 3 + s3
    assert once.filter("conv_id = 'c2'").count() == 1  # source kept
    twice = se.execute_update(once, "ADD <urn:conv:c2> TO <urn:conv:c1>")
    assert twice.count() == once.count()  # re-ADD adds nothing
    # self-ADD is a no-op per spec
    assert se.execute_update(t, "ADD <urn:conv:c1> TO <urn:conv:c1>").count() == t.count()


def test_load_and_malformed_management_stay_loud(spark):
    t = _quad_store(spark)
    with pytest.raises(ValueError, match="LOAD"):
        se.execute_update(t, "LOAD <http://remote/data.ttl>")
    with pytest.raises(ValueError, match="CLEAR"):
        se.execute_update(t, "CLEAR BOGUS")


def test_update_script_sequences_operations(spark):
    t = _quad_store(spark)
    out = se.execute_update_script(
        t,
        """PREFIX ex: <http://example.org/>
# insert, then delete by pattern, then drop a whole graph
INSERT DATA { ex:n ex:p "a;b" . } ;
DELETE WHERE { ?s ex:p <http://example.org/o3> . } ;
MOVE <urn:conv:c1> TO <urn:conv:c2> ;
""",
    )
    got = {(r["subj"], r["conv_id"]) for r in out.collect()}
    # ex:n inserted with NULL lineage; s3 (the only ex:p->o3 triple) deleted;
    # c1 moved wholesale into c2 (replacing s3's graph, already empty)
    assert (EX + "n", None) in got
    assert not any(s == EX + "s3" for s, _ in got)
    assert {s for s, c in got if c == "c2"} == {EX + "s1", EX + "s2"}
    assert not any(c == "c1" for _, c in got)


def test_update_script_later_op_sees_earlier_result(spark):
    t = _quad_store(spark)
    # the DELETE WHERE pattern only matches the triple the INSERT just added
    out = se.execute_update_script(
        t,
        """PREFIX ex: <http://example.org/>
INSERT DATA { ex:tmp ex:marker ex:gone . } ;
DELETE WHERE { ?s ex:marker ?o . }
""",
    )
    assert out.count() == t.count()  # net no-op, proving in-order execution


def test_update_script_prefix_accumulates_across_ops(spark):
    t = _quad_store(spark)
    out = se.execute_update_script(
        t,
        """PREFIX ex: <http://example.org/>
INSERT DATA { ex:m ex:p ex:o . } ;
PREFIX e2: <http://example.org/>
INSERT DATA { e2:m2 ex:p e2:o . }
""",
    )
    subs = {r["subj"] for r in out.collect()}
    assert EX + "m" in subs and EX + "m2" in subs


def test_single_op_execute_update_still_rejects_sequences(spark):
    with pytest.raises(ValueError, match="sequences"):
        se.execute_update(
            _quad_store(spark),
            "PREFIX ex: <http://example.org/>\n"
            "INSERT DATA { ex:a ex:p ex:o . } ; DELETE DATA { ex:a ex:p ex:o . }",
        )


def test_insert_data_with_graph_blocks(spark):
    t = _quad_store(spark)
    out = se.execute_update(
        t,
        """PREFIX ex: <http://example.org/>
INSERT DATA {
  ex:plain ex:p ex:o .
  GRAPH <urn:conv:c2> { ex:g2a ex:p ex:o . ex:g2b ex:p "lit" . }
  GRAPH <urn:conv:c9> { ex:g9 ex:p ex:o . }
}""",
    )
    got = {(r["subj"], r["conv_id"]) for r in out.collect()}
    assert (EX + "plain", None) in got          # default graph, NULL lineage
    assert (EX + "g2a", "c2") in got and (EX + "g2b", "c2") in got
    assert (EX + "g9", "c9") in got             # graph created implicitly
    # idempotence per graph: re-inserting into c2 adds nothing
    again = se.execute_update(
        out,
        "PREFIX ex: <http://example.org/>\n"
        "INSERT DATA { GRAPH <urn:conv:c2> { ex:g2a ex:p ex:o . } }",
    )
    assert again.count() == out.count()


def test_delete_data_with_graph_block_scopes_to_graph(spark):
    rows = [
        (EX + "s", EX + "p", "iri", EX + "o", None, None, "c1", 0),
        (EX + "s", EX + "p", "iri", EX + "o", None, None, "c1", 4),
        (EX + "s", EX + "p", "iri", EX + "o", None, None, "c2", 0),
        (EX + "s", EX + "p", "iri", EX + "o", None, None, None, None),
    ]
    t = spark.createDataFrame(rows, TRIPLES)
    out = se.execute_update(
        t,
        "PREFIX ex: <http://example.org/>\n"
        "DELETE DATA { GRAPH <urn:conv:c1> { ex:s ex:p ex:o . } }",
    )
    # both provenance rows in c1 go; c2 and the default-graph row stay
    assert {r["conv_id"] for r in out.collect()} == {"c2", None}


def test_graph_in_where_template_stays_loud(spark):
    with pytest.raises(ValueError, match="DATA forms"):
        se.parse_update(
            "PREFIX ex: <http://example.org/>\n"
            "INSERT { GRAPH <urn:conv:c1> { ?s ex:q ?o . } } WHERE { ?s ex:p ?o . }"
        )


def test_construct_where_shorthand(spark):
    # §10.2.3: the pattern is its own template
    out = se.execute_sparql(
        _graph(spark),
        """PREFIX ex: <http://example.org/>
CONSTRUCT WHERE { ?x ex:knows ?y . }""",
    )
    got = {(r["subj"], r["obj_iri"]) for r in out.collect()}
    assert got == {(EX + "a", EX + "b"), (EX + "b", EX + "c")}
    with pytest.raises(ValueError, match="plain BGP"):
        se.parse_query(
            "PREFIX ex: <http://example.org/>\n"
            "CONSTRUCT WHERE { ?x ex:knows ?y . FILTER(?x != ?y) }"
        )


def test_final_triple_dot_is_optional(spark):
    """The grammar allows omitting '.' after a block's final triple (and a
    trailing ';' after the last predicate-object pair)."""
    g = _graph(spark)
    no_dot = se.execute_sparql(g, "SELECT ?x WHERE { ?x <%sknows> <%sb> }" % (EX, EX))
    assert [r["x"] for r in no_dot.collect()] == [EX + "a"]
    trailing_semi = se.execute_sparql(
        g, "SELECT ?x ?a WHERE { ?x <%sknows> <%sb> ; <%sage> ?a ; }" % (EX, EX, EX)
    )
    assert trailing_semi.count() == 1
    # mid-statement truncation still raises
    import pytest as _pytest
    with _pytest.raises(ValueError, match="mid-statement"):
        se.execute_sparql(g, "SELECT ?x WHERE { ?x <%sknows> }" % EX)


def test_construct_over_subselect(spark):
    """A nested { SELECT … } inside CONSTRUCT's WHERE group: the template
    instantiates over the subquery's (ordered+limited) projection."""
    g = _graph(spark)
    out = se.execute_sparql(
        g,
        """CONSTRUCT { ?x <%soldest> ?a }
           WHERE { { SELECT ?x ?a WHERE { ?x <%sage> ?a } ORDER BY DESC(?a) LIMIT 1 } }"""
        % (EX, EX),
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["subj"] == EX + "b" and rows[0]["obj_lexical"] == "40"
