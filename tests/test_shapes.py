"""SHACL shapes-graph emission (`ShapesCreator2.java:65-245`):
structure, collision suffixes, datatype fallback, TTL round trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfcmap_spark import ids, vocab
from rdfcmap_spark.operators.shapes import shacl_shapes_graph
from rdfcmap_spark.sources.ttl import read_ttl, write_ttl

KEY = ["subj", "pred", "obj_kind", "obj_iri", "obj_lexical", "obj_datatype"]

EX = "http://www.example.org#"


def _fixture(spark):
    """Two colliding types (ex:Customer / ex2:Customer -> CustomerShape),
    one literal pred with mixed datatypes (fallback), one object pred with
    partial coverage (min 0), one exact literal pred."""
    rows = []
    # ex:Customer — 3 subjects; name on all (string), order on 2 of 3
    for i in range(3):
        rows.append((f"{EX}c{i}", EX + "Customer", EX + "hasName", "literal", vocab.XSD_STRING))
    for i in range(2):
        rows.append((f"{EX}c{i}", EX + "Customer", EX + "hasOrder", "iri", None))
    # second order for c0 -> max 2
    rows.append((f"{EX}c0", EX + "Customer", EX + "hasOrder", "iri", None))
    # ex2:Customer — mixed datatypes on ex:code -> xsd:string fallback
    rows.append(("http://www.example2.org#c9", "http://www.example2.org#Customer",
                 EX + "code", "literal", vocab.XSD_DOUBLE))
    rows.append(("http://www.example2.org#c9", "http://www.example2.org#Customer",
                 EX + "code", "literal", vocab.XSD_INTEGER))
    return spark.createDataFrame(
        rows, "subj string, rdf_type string, pred string, obj_kind string, obj_datatype string"
    )


def test_shapes_graph_structure(spark):
    out = shacl_shapes_graph(_fixture(spark))
    got = {tuple(r) for r in out.select(*KEY).collect()}

    afs = vocab.AFS_PREFIX
    # collision: example.org sorts before example2.org -> ex unsuffixed
    shape_ex = afs + "CustomerShape"
    shape_ex2 = afs + "CustomerShape_1"
    assert (shape_ex, vocab.RDF_TYPE, "iri", vocab.SH_NODE_SHAPE, None, None) in got
    assert (shape_ex2, vocab.RDF_TYPE, "iri", vocab.SH_NODE_SHAPE, None, None) in got
    assert (shape_ex, vocab.SH_TARGET_CLASS, "iri", EX + "Customer", None, None) in got
    assert (shape_ex2, vocab.SH_TARGET_CLASS, "iri",
            "http://www.example2.org#Customer", None, None) in got

    # rdf-type property shape: cons-list path (rdf:type [sh:zeroOrMorePath …])
    ps_t = ids.instance_iri("shacl-ts|" + EX + "Customer")
    l0 = ids.instance_iri("shacl-tp0|" + EX + "Customer")
    l1 = ids.instance_iri("shacl-tp1|" + EX + "Customer")
    z = ids.instance_iri("shacl-tpz|" + EX + "Customer")
    assert (shape_ex, vocab.SH_PROPERTY, "bnode", ps_t, None, None) in got
    assert (ps_t, vocab.SH_PATH, "bnode", l0, None, None) in got
    assert (l0, vocab.RDF_FIRST, "iri", vocab.RDF_TYPE, None, None) in got
    assert (l0, vocab.RDF_REST, "bnode", l1, None, None) in got
    assert (l1, vocab.RDF_FIRST, "bnode", z, None, None) in got
    assert (z, vocab.SH_ZERO_OR_MORE_PATH, "iri", vocab.RDFS_SUBCLASS_OF, None, None) in got
    assert (l1, vocab.RDF_REST, "iri", vocab.RDF_NIL, None, None) in got
    assert (ps_t, vocab.SH_HAS_VALUE, "iri", EX + "Customer", None, None) in got
    assert (ps_t, vocab.SH_MIN_COUNT, "literal", None, "1", vocab.XSD_INTEGER) in got

    # literal property shape: single datatype observed
    ps_name = ids.instance_iri("shacl-ps|" + EX + "Customer|" + EX + "hasName")
    assert (ps_name, vocab.SH_PATH, "iri", EX + "hasName", None, None) in got
    assert (ps_name, vocab.SH_MIN_COUNT, "literal", None, "1", vocab.XSD_INTEGER) in got
    assert (ps_name, vocab.SH_MAX_COUNT, "literal", None, "1", vocab.XSD_INTEGER) in got
    assert (ps_name, vocab.SH_NODEKIND, "iri", vocab.SH_LITERAL, None, None) in got
    assert (ps_name, vocab.SH_DATATYPE, "iri", vocab.XSD_STRING, None, None) in got

    # object property shape: partial coverage -> min 0, max 2, qualified twins
    ps_ord = ids.instance_iri("shacl-ps|" + EX + "Customer|" + EX + "hasOrder")
    assert (ps_ord, vocab.SH_MIN_COUNT, "literal", None, "0", vocab.XSD_INTEGER) in got
    assert (ps_ord, vocab.SH_MAX_COUNT, "literal", None, "2", vocab.XSD_INTEGER) in got
    assert (ps_ord, vocab.SH_QUALIFIED_MIN_COUNT, "literal", None, "0", vocab.XSD_INTEGER) in got
    assert (ps_ord, vocab.SH_QUALIFIED_MAX_COUNT, "literal", None, "2", vocab.XSD_INTEGER) in got
    assert not any(r[1] == vocab.SH_NODEKIND and r[0] == ps_ord for r in got)
    # qualified counts are paired with a value shape (well-formed SHACL,
    # r4 ADVICE): ps -> [ sh:nodeKind sh:BlankNodeOrIRI ]
    qvs_ord = ids.instance_iri("shacl-qvs|" + EX + "Customer|" + EX + "hasOrder")
    assert (ps_ord, vocab.SH_QUALIFIED_VALUE_SHAPE, "bnode", qvs_ord, None, None) in got
    assert (qvs_ord, vocab.SH_NODEKIND, "iri", vocab.SH_BLANK_NODE_OR_IRI, None, None) in got
    # literal property shapes carry NO qualified constraints
    assert not any(r[1] == vocab.SH_QUALIFIED_VALUE_SHAPE and r[0] == ps_name for r in got)

    # mixed datatypes -> xsd:string fallback (ShapesCreator2.java:846-851)
    ps_code = ids.instance_iri(
        "shacl-ps|http://www.example2.org#Customer|" + EX + "code"
    )
    assert (ps_code, vocab.SH_DATATYPE, "iri", vocab.XSD_STRING, None, None) in got

    # every rdf:rest chain terminates at rdf:nil
    rests = {r[0]: r[3] for r in got if r[1] == vocab.RDF_REST}
    for head in [r[3] for r in got if r[1] == vocab.SH_PATH and r[2] == "bnode"]:
        cell, hops = head, 0
        while cell != vocab.RDF_NIL:
            cell = rests[cell]
            hops += 1
            assert hops <= 4
    # blank nodes are skolem urn:uuid in both positions (repo invariant)
    for r in got:
        if r[2] == "bnode":
            assert r[3].startswith("urn:uuid:")


def test_shapes_graph_ttl_roundtrip(spark, tmp_path):
    """shapes graph -> write_ttl -> read_ttl is a fixed point on the six
    triple columns (bnode kind survives via the _:b<uuid> convention)."""
    out = shacl_shapes_graph(_fixture(spark)).select(
        *KEY,
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
    )
    path = str(tmp_path / "shapes.ttl")
    write_ttl(out, path)
    back = read_ttl(spark, path)
    before = {tuple(r) for r in out.select(*KEY).collect()}
    after = {tuple(r) for r in back.select(*KEY).collect()}
    assert after == before


def test_shapes_graph_partition_invariant(spark):
    f = _fixture(spark)
    a = {tuple(r) for r in shacl_shapes_graph(f.repartition(1)).select(*KEY).collect()}
    b = {tuple(r) for r in shacl_shapes_graph(f.repartition(7)).select(*KEY).collect()}
    assert a == b and len(a) > 0
