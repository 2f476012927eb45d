"""§3.2 reverse mapping: title ladder + triples -> cmap shape -> triples
round trip (`Turtle2CmapConverter.createTitle:2049-2130`, `:142-314`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfcmap_spark import vocab
from rdfcmap_spark.operators.reverse import (
    link_edges,
    reassemble_triples,
    reconstruct_cmap,
    title_ladder,
)
from rdfcmap_spark.plans.pipeline import run_pipeline
from rdfcmap_spark.schemas import TRIPLES
from rdfcmap_spark.synth import transcripts_df


def _lit(s, p, lex):
    return (s, p, "literal", None, lex, vocab.XSD_STRING, None, None)


def _iri(s, p, o):
    return (s, p, "iri", o, None, None, None, None)


def test_title_ladder_priority(spark):
    rows = [
        # every tier present -> dct:title wins
        _lit("e1", vocab.DCT_TITLE, "the title"),
        _lit("e1", vocab.SKOS_PREF_LABEL, "the preflabel"),
        _lit("e1", vocab.DCT + "identifier", "ID-1"),
        _lit("e1", vocab.RDFS_LABEL, "the label"),
        # prefLabel beats identifier/label
        _lit("e2", vocab.SKOS_PREF_LABEL, "pl2"),
        _lit("e2", vocab.RDFS_LABEL, "l2"),
        # type-label fallback: e3 typed with a titled class
        _iri("e3", vocab.RDF_TYPE, "c:T"),
        _lit("c:T", vocab.DCT_TITLE, "Type Title"),
        # nothing at all -> "instance"
        _iri("e4", "ex:related", "e1"),
        # first-match pinned to lexicographic min
        _lit("e5", vocab.DCT_TITLE, "zebra"),
        _lit("e5", vocab.DCT_TITLE, "aardvark"),
    ]
    df = spark.createDataFrame(rows, TRIPLES)
    got = {r["subj"]: (r["title"], r["title_source"]) for r in title_ladder(df).collect()}
    assert got["e1"] == ("the title", "title")
    assert got["e2"] == ("pl2", "prefLabel")
    assert got["e3"] == ("Type Title", "type")
    assert got["e4"] == ("instance", "instance")
    assert got["e5"] == ("aardvark", "title")
    assert got["c:T"] == ("Type Title", "title")


def test_title_ladder_multiple_types_joined_sorted(spark):
    rows = [
        _iri("e1", vocab.RDF_TYPE, "c:B"),
        _iri("e1", vocab.RDF_TYPE, "c:A"),
        _lit("c:B", vocab.RDFS_LABEL, "beta"),
        _lit("c:A", vocab.RDFS_LABEL, "alpha"),
    ]
    got = {r["subj"]: r["title"] for r in title_ladder(spark.createDataFrame(rows, TRIPLES)).collect()}
    assert got["e1"] == "alpha, beta"  # sorted, ", "-joined (pinned HashSet order)


def test_reconstruct_roundtrip_pipeline_triples(spark):
    """triples -> (concepts, links, connections) -> two-hop reassembly must
    reproduce exactly the relation edges with their ladder labels (P/R=1.0)."""
    triples = run_pipeline(transcripts_df(spark, 6, 4).localCheckpoint()).triples.localCheckpoint()
    concepts, links, connections = reconstruct_cmap(triples)
    back = {
        (r["subj"], r["link_label"], r["obj"])
        for r in reassemble_triples(concepts, links, connections).collect()
    }
    # expected: link_edges labelled through the same ladder (computed
    # independently of the link minting/joins under test)
    titles = {r["subj"]: r["title"] for r in title_ladder(triples).collect()}
    import re

    def label_of(pred):
        t = titles.get(pred)
        if t is not None and t != "instance":
            return t
        return re.search(r"([^#/]+)$", pred).group(1)

    expected = {
        (r["subj"], label_of(r["pred"]), r["obj"]) for r in link_edges(triples).collect()
    }
    assert back == expected and len(back) > 0
    # every connection endpoint resolves to a concept or a link (closed shape)
    ids = {r["concept_id"] for r in concepts.collect()} | {r["link_id"] for r in links.collect()}
    for r in connections.collect():
        assert r["from_id"] in ids and r["to_id"] in ids


def test_cxl_sink_wellformed_and_complete(spark, tmp_path):
    """S9: triples -> reconstruct -> CXL text; the document must be
    well-formed XML, escape X11-style, and carry every concept/link/
    connection exactly once."""
    import xml.etree.ElementTree as ET

    from rdfcmap_spark.sources.cxl import cxl_escape, render_cxl, write_cxl

    triples = run_pipeline(transcripts_df(spark, 4, 3).localCheckpoint()).triples.localCheckpoint()
    concepts, links, connections = reconstruct_cmap(triples)
    # tab/newline are the XML-1.0-parsable control chars; BEL-class chars
    # render as &#N; numeric refs per the reference's XML 1.1 target (valid
    # for CmapTools, rejected by strict 1.0 parsers — asserted separately)
    text = render_cxl(concepts, links, connections, title='quo"te & <ctrl>\twith\nbreaks')
    root = ET.fromstring(text)  # well-formed despite hostile title
    ns = "{http://cmap.ihmc.us/xml/cmap/}"
    doc_concepts = root.findall(f".//{ns}concept")
    doc_links = root.findall(f".//{ns}linking-phrase")
    doc_conns = root.findall(f".//{ns}connection")
    assert len(doc_concepts) == concepts.count() > 0
    assert len(doc_links) == links.count() > 0
    assert len(doc_conns) == connections.count() > 0
    # labels survive the escape round trip through a real XML parser
    # (with the X2 display wrap applied, as the reference writes them)
    from rdfcmap_spark.functions.normalize import break_string_py

    want = {break_string_py(r["label"]) for r in concepts.collect()}
    got = {c.get("label") for c in doc_concepts}
    assert got == want
    p = tmp_path / "out.cxl"
    write_cxl(concepts, links, connections, str(p))
    assert p.read_text().startswith("<?xml")


def test_cxl_escape_is_reference_faithful():
    from rdfcmap_spark.sources.cxl import cxl_escape

    # escapeXml11 basics + NumericEntityEscaper.below(0x20)
    assert cxl_escape('a<b>&"c"') == "a&lt;b&gt;&amp;&quot;c&quot;"
    assert cxl_escape("x\ty\nz") == "x&#9;y&#10;z"
    assert cxl_escape("\x07bell") == "&#7;bell"
    assert cxl_escape(None) == ""
    assert cxl_escape("nul\x00gone") == "nulgone"


def test_update_mode_roundtrip_fixed_point(spark, tmp_path):
    """The reference's --update mode (`RdfCmap.java:260-276`): model -> cxl
    -> model must be a fixed point. triples -> reconstruct -> write_cxl ->
    read_cxl -> reassemble reproduces the same (subj, link_label, obj) set,
    and a second write produces byte-identical CXL."""
    from rdfcmap_spark.sources.cxl import read_cxl, render_cxl, write_cxl

    triples = run_pipeline(transcripts_df(spark, 4, 3).localCheckpoint()).triples.localCheckpoint()
    concepts, links, connections = reconstruct_cmap(triples)
    p = str(tmp_path / "m.cxl")
    write_cxl(concepts, links, connections, p)
    c2, l2, x2 = read_cxl(spark, p)
    before = {tuple(r) for r in reassemble_triples(concepts, links, connections).collect()}
    after = {tuple(r) for r in reassemble_triples(c2, l2, x2).collect()}
    assert after == before and len(after) > 0
    # idempotence: re-rendering the parsed-back shape is byte-identical
    assert render_cxl(c2, l2, x2) == render_cxl(concepts, links, connections)


def test_literal_nodes_semantics(spark):
    """visualizeLiterals path (`addLiteralNodesForVisualization:438-620`):
    dct:title skip-listed, instance-graph subjects only (urn:uuid / bnode),
    XSD-compacted concept labels, addPrefix'd link labels, deterministic
    ids shared between the row and reconstruct_cmap's union."""
    from rdfcmap_spark.operators.reverse import literal_nodes

    rows = [
        # instance node: plain string literal on a prefixable predicate
        ("urn:uuid:e1", vocab.DCT + "description", "literal", None, "a desc", vocab.XSD_STRING, None, None),
        # bnode subject, non-prefixable predicate that carries its own title
        ("_:b1", "http://example.org/x/p", "literal", None, "42", vocab.XSD_DOUBLE, None, None),
        _lit("http://example.org/x/p", vocab.DCT_TITLE, "has price"),
        # dct:title literal on an instance -> SKIPPED
        ("urn:uuid:e1", vocab.DCT_TITLE, "literal", None, "shown as node title", vocab.XSD_STRING, None, None),
        # literal on a non-instance subject -> excluded
        ("http://example.org/vocab1", vocab.DCT + "description", "literal", None, "x", vocab.XSD_STRING, None, None),
        # OBO idspace ladder
        ("urn:uuid:e2", vocab.OBO + "IAO_0000115", "literal", None, "defn", vocab.XSD_STRING, None, None),
    ]
    df = spark.createDataFrame(rows, TRIPLES)
    out = {(r["subj"], r["pred"]): r for r in literal_nodes(df).collect()}
    assert set(out) == {
        ("urn:uuid:e1", vocab.DCT + "description"),
        ("_:b1", "http://example.org/x/p"),
        ("urn:uuid:e2", vocab.OBO + "IAO_0000115"),
    }
    e1 = out[("urn:uuid:e1", vocab.DCT + "description")]
    assert e1["concept_label"] == '"a desc"^^xsd:string'
    assert e1["link_label"] == "dct:description"
    b1 = out[("_:b1", "http://example.org/x/p")]
    assert b1["concept_label"] == '"42"^^xsd:double'
    assert b1["link_label"] == "has price"  # predicate's own dct:title, no prefix
    assert out[("urn:uuid:e2", vocab.OBO + "IAO_0000115")]["link_label"] == "iao:IAO_0000115"
    # ids deterministic and distinct per (concept, link)
    assert e1["concept_id"].startswith("urn:uuid:") and e1["concept_id"] != e1["link_id"]

    # reconstruct_cmap(visualize_literals=True) unions exactly these groups
    c0, l0, x0 = reconstruct_cmap(df)
    c1, l1, x1 = reconstruct_cmap(df, visualize_literals=True)
    assert c1.count() == c0.count() + 3 and l1.count() == l0.count() + 3
    assert x1.count() == x0.count() + 6  # two connections per literal group
    assert c1.where(F.col("label") == '"a desc"^^xsd:string').count() == 1


_APPEARANCE_FIXTURE = """<?xml version="1.0" encoding="UTF-8"?>
<cmap xmlns:dcterms="http://purl.org/dc/terms/" xmlns="http://cmap.ihmc.us/xml/cmap/" xmlns:dc="http://purl.org/dc/elements/1.1/">
    <res-meta><dc:title>appearance fixture</dc:title></res-meta>
    <map width="6000" height="6000">
    <concept-list>
        <concept id="c1" label="reactor" short-comment="sc &amp; more" long-comment="lc"/>
        <concept id="c2" label="reactor"/>
        <concept id="c3" label="pump"/>
    </concept-list>
    <concept-appearance-list>
        <concept-appearance id="c1" x="120" y="240" width="150" height="40" font-style="bold" font-size="14" border-shape="oval" border-color="10,20,30,255" background-color="237,244,246,255" background-image="img-7" background-image-style="full"/>
        <concept-appearance id="c2" x="300" y="60" width="100" height="25" font-style="plain" expanded="true"/>
        <concept-appearance id="c3" x="10" y="10" width="100" height="25" font-style="plain"/>
    </concept-appearance-list>
    <linking-phrase-list>
        <linking-phrase id="l1" label="feeds"/>
    </linking-phrase-list>
    <linking-phrase-appearance-list>
        <linking-phrase-appearance id="l1" x="77" y="88" width="90" height="11" min-width="2" min-height="11" font-size="9"/>
    </linking-phrase-appearance-list>
    <connection-list>
        <connection id="x1" from-id="c1" to-id="l1"/>
        <connection id="x2" from-id="l1" to-id="c2"/>
    </connection-list>
    </map>
</cmap>
"""


def _appearance_map(df):
    return {
        (r["elem_id"], r["attr"]): r["value"]
        for r in df.select("elem_id", "attr", "value").collect()
    }


def test_cxl_appearance_roundtrip(spark, tmp_path):
    """cxl -> afv: triples -> ttl -> afv: triples -> cxl keeps per-element
    appearance (font/border/background/image satellites, positions, sizes,
    comments) intact — the CxlWriter stored-appearance path
    (`CxlWriter.generateCxlFromRdfModel:140-430`). Labels collide
    (c1/c2 'reactor') so the id-keyed plumbing can't lean on titles."""
    from rdfcmap_spark.sources.cxl import (
        appearance_from_triples,
        appearance_triples,
        read_cxl,
        read_cxl_appearance,
        render_cxl,
    )
    from rdfcmap_spark.sources.ttl import read_ttl, write_ttl

    src = tmp_path / "fixture.cxl"
    src.write_text(_APPEARANCE_FIXTURE, encoding="utf-8")

    concepts, links, conns = read_cxl(spark, str(src))
    app0 = read_cxl_appearance(spark, str(src))
    a0 = _appearance_map(app0)
    assert a0[("c1", "font-size")] == "14"
    assert a0[("c1", "border-shape")] == "oval"
    assert a0[("c1", "short-comment")] == "sc & more"
    assert a0[("l1", "font-size")] == "9"

    # appearance -> triples -> TTL -> triples -> appearance
    trips = appearance_triples(app0).select(
        "*",
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
    )
    ttl_path = str(tmp_path / "appearance.ttl")
    write_ttl(trips, ttl_path)
    back = appearance_from_triples(read_ttl(spark, ttl_path))
    a1 = _appearance_map(back)
    # everything the afv: model persists survives (min-* are style-sheet
    # constants in the reference, not per-element statements)
    persisted = {k: v for k, v in a0.items() if k[1] not in ("min-width", "min-height")}
    assert a1 == persisted

    # re-render with the recovered appearance: attribute-for-attribute intact
    out = tmp_path / "out.cxl"
    out.write_text(
        render_cxl(concepts, links, conns, appearance=back), encoding="utf-8"
    )
    a2 = _appearance_map(read_cxl_appearance(spark, str(out)))
    for k, v in persisted.items():
        assert a2[k] == v, k
    # and the rendered document is itself a fixed point of the loop
    c2, l2, x2 = read_cxl(spark, str(out))
    out2 = tmp_path / "out2.cxl"
    out2.write_text(
        render_cxl(
            c2, l2, x2,
            appearance=appearance_from_triples(appearance_triples(read_cxl_appearance(spark, str(out)))),
        ),
        encoding="utf-8",
    )
    assert out2.read_text(encoding="utf-8") == out.read_text(encoding="utf-8")


_CONN_FIXTURE = """<?xml version="1.0" encoding="UTF-8"?>
<cmap xmlns:dcterms="http://purl.org/dc/terms/" xmlns="http://cmap.ihmc.us/xml/cmap/" xmlns:dc="http://purl.org/dc/elements/1.1/">
    <res-meta><dc:title>curved fixture</dc:title></res-meta>
    <map width="6000" height="6000">
    <concept-list>
        <concept id="c1" label="reactor"/>
        <concept id="c2" label="vessel"/>
    </concept-list>
    <concept-appearance-list>
        <concept-appearance id="c1" x="10" y="10" width="100" height="25" font-style="plain"/>
        <concept-appearance id="c2" x="400" y="300" width="100" height="25" font-style="plain"/>
    </concept-appearance-list>
    <linking-phrase-list>
        <linking-phrase id="l1" label="feeds"/>
    </linking-phrase-list>
    <linking-phrase-appearance-list>
        <linking-phrase-appearance id="l1" x="200" y="150" width="90" height="11"/>
    </linking-phrase-appearance-list>
    <connection-list>
        <connection id="conn-0" from-id="c1" to-id="l1"/>
        <connection id="conn-1" from-id="l1" to-id="c2"/>
    </connection-list>
    <connection-appearance-list>
        <connection-appearance id="conn-0" from-pos="right" to-pos="left" type="curved" arrowhead="yes">
            <control-point x="120" y="35"/>
            <control-point x="180" y="95"/>
        </connection-appearance>
        <connection-appearance id="conn-1" from-pos="center" to-pos="center" type="straight" arrowhead="no"/>
    </connection-appearance-list>
    <style-sheet-list>
        <style-sheet id="_Default_">
            <concept-style font-name="Verdana" font-size="12"/>
            <connection-style color="0,0,0,255" type="straight"/>
        </style-sheet>
        <style-sheet id="custom">
            <concept-style font-size="16" font-style="italic"/>
        </style-sheet>
    </style-sheet-list>
    </map>
</cmap>
"""


def test_cxl_connection_controlpoints_and_stylesheets_roundtrip(spark, tmp_path):
    """round 5 (r4 review item 4 — the last CXL gap): connection
    appearances with curved control points and the style-sheet block
    survive cxl -> afv: triples -> ttl -> cxl, and the rendered document
    is a text-level fixed point of the loop."""
    from rdfcmap_spark.sources.cxl import (
        appearance_from_triples,
        appearance_triples,
        read_cxl,
        read_cxl_appearance,
        read_cxl_stylesheets,
        render_cxl,
    )
    from rdfcmap_spark.sources.ttl import read_ttl, write_ttl

    src = tmp_path / "curved.cxl"
    src.write_text(_CONN_FIXTURE, encoding="utf-8")

    concepts, links, conns = read_cxl(spark, str(src))
    app0 = read_cxl_appearance(spark, str(src))
    a0 = _appearance_map(app0)
    # connection attrs + flattened index-ordered control points parsed
    assert a0[("conn-0", "type")] == "curved"
    assert a0[("conn-0", "control-point/0/x")] == "120"
    assert a0[("conn-0", "control-point/1/y")] == "95"
    assert a0[("conn-1", "arrowhead")] == "no"

    ss0 = {
        (r["sheet_id"], r["style_tag"], r["attr"]): r["value"]
        for r in read_cxl_stylesheets(spark, str(src)).collect()
    }
    assert ss0[("custom", "concept-style", "font-size")] == "16"
    assert ss0[("_Default_", "connection-style", "type")] == "straight"

    # appearance -> triples -> TTL -> appearance: control points ride as
    # afv:Point satellites with afx:index and come back exactly
    trips = appearance_triples(app0).select(
        "*",
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
    )
    ttl_path = str(tmp_path / "curved.ttl")
    write_ttl(trips, ttl_path)
    a1 = _appearance_map(appearance_from_triples(read_ttl(spark, ttl_path)))
    assert a1 == a0

    # re-render: connection appearance + control points + stylesheets all
    # re-emitted; re-parse matches
    out = tmp_path / "out.cxl"
    out.write_text(
        render_cxl(
            concepts, links, conns,
            appearance=app0,
            style_sheets=read_cxl_stylesheets(spark, str(src)),
        ),
        encoding="utf-8",
    )
    a2 = _appearance_map(read_cxl_appearance(spark, str(out)))
    for k, v in a0.items():
        assert a2[k] == v, k
    ss2 = {
        (r["sheet_id"], r["style_tag"], r["attr"]): r["value"]
        for r in read_cxl_stylesheets(spark, str(out)).collect()
    }
    assert ss2 == ss0

    # text-level fixed point of the full loop
    c2, l2, x2 = read_cxl(spark, str(out))
    out2 = tmp_path / "out2.cxl"
    out2.write_text(
        render_cxl(
            c2, l2, x2,
            appearance=read_cxl_appearance(spark, str(out)),
            style_sheets=read_cxl_stylesheets(spark, str(out)),
        ),
        encoding="utf-8",
    )
    assert out2.read_text(encoding="utf-8") == out.read_text(encoding="utf-8")


def test_render_cxl_default_stylesheet_block_is_reference_shaped(spark, tmp_path):
    """With no parsed sheets, render_cxl emits the reference writer's
    fixed default block (`CxlWriter.java:118-131`) — _Default_ +
    _LatestChanges_ with the hardcoded style attributes."""
    from rdfcmap_spark.sources.cxl import read_cxl_stylesheets, render_cxl

    concepts = spark.createDataFrame([("c1", "a")], "concept_id string, label string")
    links = spark.createDataFrame([], "link_id string, label string")
    conns = spark.createDataFrame([], "from_id string, to_id string")
    p = tmp_path / "d.cxl"
    p.write_text(render_cxl(concepts, links, conns), encoding="utf-8")
    ss = {
        (r["sheet_id"], r["style_tag"], r["attr"]): r["value"]
        for r in read_cxl_stylesheets(spark, str(p)).collect()
    }
    assert ss[("_Default_", "concept-style", "font-name")] == "Verdana"
    assert ss[("_Default_", "concept-style", "border-shape")] == "rounded-rectangle"
    assert ss[("_Default_", "connection-style", "arrowhead")] == "if-to-concept-and-slopes-up"
    assert ss[("_LatestChanges_", "connection-style", "arrowhead")] == "no"
