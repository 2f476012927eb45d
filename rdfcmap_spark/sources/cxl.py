"""CXL sink (SURVEY.md S9) + XML escaping (X11).

The reference emits CXL through deliberate string templating — no XML
library (`cmap/CxlWriter.write:44-135`): a fixed document skeleton with
``concept-list`` / ``linking-phrase-list`` / ``connection-list`` sections
plus default appearance/style blocks, attribute values escaped with
``escapeXml11`` + ``NumericEntityEscaper.below(0x20)``
(`Cmap2TurtleConverter.java:1413-1415`).

Spark disposition: a concept map is a human-drawn artifact (thousands of
nodes at most), so the three reconstructed DataFrames
(:func:`rdfcmap_spark.operators.reverse.reconstruct_cmap`) are collected on
the driver and templated — the same shape as the reference's writer, with
the same escaping, deterministic element order (sorted by id), and the
fixed appearance defaults the reference hardcodes (grid-walk x/y).
:func:`cxl_escape` is the X11 mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_XML_BASE = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;", "'": "&apos;"}


def cxl_escape(s: str | None) -> str:
    """X11: escapeXml11 + numeric entities for control chars below 0x20
    (tab/newline/CR included, as NumericEntityEscaper.below(0x20) does;
    NUL is dropped — invalid even as a character reference in XML 1.1
    consumers that are XML 1.0 parsers)."""
    if s is None:
        return ""
    out: list[str] = []
    for ch in s:
        o = ord(ch)
        if ch in _XML_BASE:
            out.append(_XML_BASE[ch])
        elif o == 0:
            continue
        elif o < 0x20:
            out.append(f"&#{o};")
        else:
            out.append(ch)
    return "".join(out)


_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<cmap xmlns:dcterms="http://purl.org/dc/terms/" xmlns="http://cmap.ihmc.us/xml/cmap/" '
    'xmlns:dc="http://purl.org/dc/elements/1.1/">\n'
    "    <res-meta>\n"
    "        <dc:title>{title}</dc:title>\n"
    "        <dc:format>x-cmap/x-storable</dc:format>\n"
    "        <dc:publisher>rdfcmap-spark</dc:publisher>\n"
    "    </res-meta>\n"
    '    <map width="6000" height="6000">\n'
)


def render_cxl(
    concepts: DataFrame,
    links: DataFrame,
    connections: DataFrame,
    title: str = "rdfcmap-spark export",
    wrap_labels: bool = True,
    positions: DataFrame | None = None,
    appearance: DataFrame | None = None,
) -> str:
    """(concepts, links, connections) -> CXL document text.

    Deterministic: elements sorted by id; appearance coordinates follow the
    reference's fixed grid walk (`CxlWriter.java:81-90`: x=y=10 stepping 10
    for concepts, 15 for linking phrases), unless ``positions`` supplies
    computed ones — (node, x, y) as produced by
    :func:`rdfcmap_spark.operators.layout.force_layout` /
    :func:`~rdfcmap_spark.operators.layout.link_positions`, keyed by
    concept/link id; elements without a row keep the grid walk (the
    reference likewise only overwrites coordinates the layouter touched,
    `Layouter.java:146-151`). ``wrap_labels`` applies the X2 ``breakString``
    word-wrap exactly as the reference does on the CXL side
    (`Turtle2CmapConverter.java:1448-1460`); :func:`read_cxl` unbreaks (X1),
    so the write/read pair is a fixed point.

    ``appearance`` (long-form ``(elem_id, attr, value)`` — the shape of
    :func:`read_cxl_appearance` / :func:`appearance_from_triples`)
    persists stored per-element attributes through the round trip: x/y
    (highest precedence, above ``positions`` and the grid walk),
    width/height over the defaults, and the optional expanded / font /
    border / background attributes in the reference's stored-appearance
    emission order (`CxlWriter.generateCxlFromRdfModel:236-345`), plus
    short/long comments on the element tags."""
    from rdfcmap_spark.functions.normalize import break_string_py

    wrap = break_string_py if wrap_labels else (lambda x: x)
    pos: dict[str, tuple[int, int]] = {}
    if positions is not None:
        key = "node" if "node" in positions.columns else "link_id"
        pos = {r[key]: (r["x"], r["y"]) for r in positions.select(key, "x", "y").collect()}
    app: dict[str, dict[str, str]] = {}
    if appearance is not None:
        for r in appearance.select("elem_id", "attr", "value").collect():
            app.setdefault(r["elem_id"], {})[r["attr"]] = r["value"]

    def _comments(eid: str) -> str:
        a = app.get(eid, {})
        out = ""
        for attr in ("short-comment", "long-comment"):
            if attr in a:
                out += f' {attr}="{cxl_escape(a[attr])}"'
        return out

    def _appearance_tail(eid: str, defaults: dict[str, str]) -> str:
        a = app.get(eid, {})
        out = ""
        for attr in _APPEARANCE_ORDER:
            v = a.get(attr, defaults.get(attr))
            if v is not None:
                out += f' {attr}="{cxl_escape(v)}"'
        return out
    # label-less elements (read_cxl tolerates them) render as label="" —
    # break_string_py iterates its input, so None must be coalesced first
    crows = sorted((r["concept_id"], wrap(r["label"] or "")) for r in concepts.collect())
    lrows = sorted((r["link_id"], wrap(r["label"] or "")) for r in links.collect())
    xrows = sorted((r["from_id"], r["to_id"]) for r in connections.collect())

    sb: list[str] = [_HEADER.format(title=cxl_escape(title))]
    sb.append("    <concept-list>\n")
    for cid, label in crows:
        sb.append(
            f'        <concept id="{cxl_escape(cid)}" label="{cxl_escape(label)}"'
            f"{_comments(cid)}/>\n"
        )
    sb.append("    </concept-list>\n")
    sb.append("    <concept-appearance-list>\n")
    x = y = 10
    c_defaults = {"width": "100", "height": "25", "font-style": "plain"}
    for cid, _ in crows:
        a = app.get(cid, {})
        px, py = pos.get(cid, (x, y))
        px, py = a.get("x", px), a.get("y", py)
        sb.append(
            f'        <concept-appearance id="{cxl_escape(cid)}" x="{px}" y="{py}"'
            f"{_appearance_tail(cid, c_defaults)}/>\n"
        )
        x += 10
        y += 10
    sb.append("    </concept-appearance-list>\n")
    sb.append("    <linking-phrase-list>\n")
    for lid, label in lrows:
        sb.append(
            f'        <linking-phrase id="{cxl_escape(lid)}" label="{cxl_escape(label)}"'
            f"{_comments(lid)}/>\n"
        )
    sb.append("    </linking-phrase-list>\n")
    sb.append("    <linking-phrase-appearance-list>\n")
    x = y = 15
    l_defaults = {"width": "100", "height": "11"}
    for lid, _ in lrows:
        a = app.get(lid, {})
        px, py = pos.get(lid, (x, y))
        px, py = a.get("x", px), a.get("y", py)
        sb.append(
            f'        <linking-phrase-appearance id="{cxl_escape(lid)}" x="{px}" y="{py}"'
            f'{_appearance_tail(lid, l_defaults)} min-width="2" min-height="11"/>\n'
        )
        x += 10
        y += 10
    sb.append("    </linking-phrase-appearance-list>\n")
    sb.append("    <connection-list>\n")
    for i, (fid, tid) in enumerate(xrows):
        sb.append(
            f'        <connection id="conn-{i}" from-id="{cxl_escape(fid)}" to-id="{cxl_escape(tid)}"/>\n'
        )
    sb.append("    </connection-list>\n")
    sb.append("    </map>\n</cmap>\n")
    return "".join(sb)


def write_cxl(
    concepts: DataFrame,
    links: DataFrame,
    connections: DataFrame,
    path: str,
    title: str = "rdfcmap-spark export",
) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write(render_cxl(concepts, links, connections, title))


def read_cxl(spark, path: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """CXL parse (S1 for CXL-shaped files): concept-list /
    linking-phrase-list / connection-list -> three DataFrames, the input
    shape of `assembly.assemble_from_connections` (J1). The reference
    JAXB-unmarshals (`Cmap2TurtleConverter.java:1343-1347`); a cmap is
    driver-sized, so a stdlib XML parse + createDataFrame is the honest
    disposition (SURVEY §2.1). Together with :func:`write_cxl` this closes
    the reference's ``--update`` round trip (cxl -> model -> cxl fixed
    point, `RdfCmap.java:260-276`)."""
    import xml.etree.ElementTree as ET

    from rdfcmap_spark.functions.normalize import unbreak_py

    ns = "{http://cmap.ihmc.us/xml/cmap/}"
    root = ET.parse(path).getroot()
    # labels arrive with X2 &#10; display breaks; unbreak (X1) restores the
    # logical label, mirroring Cmap2TurtleConverter.unbreakString on parse
    def _lab(el):
        raw = el.get("label")
        return unbreak_py(raw) if raw is not None else None

    concepts = [(c.get("id"), _lab(c)) for c in root.iter(f"{ns}concept")]
    links = [(l.get("id"), _lab(l)) for l in root.iter(f"{ns}linking-phrase")]
    conns = [(x.get("from-id"), x.get("to-id")) for x in root.iter(f"{ns}connection")]
    return (
        spark.createDataFrame(concepts, "concept_id string, label string"),
        spark.createDataFrame(links, "link_id string, label string"),
        spark.createDataFrame(conns, "from_id string, to_id string"),
    )


# --- appearance persistence (`CxlWriter.generateCxlFromRdfModel:140-430`,
# `VisualizationInfoBuilder` font/border/image satellites) -----------------

#: CXL attribute -> direct afv: literal on the element's viz twin
_DIRECT_ATTRS = {
    "x": "xPosition",
    "y": "yPosition",
    "width": "width",
    "height": "height",
    "expanded": "expanded",
    "background-color": "backgroundColor",
    "short-comment": "shortComment",
    "long-comment": "longComment",
    "font-style": None,  # satellite, see _SAT_ATTRS
}
#: CXL attribute -> (satellite group, link pred local, type local, value pred local)
_SAT_ATTRS = {
    "font-style": ("font", "hasFont", "Font", "style"),
    "font-size": ("font", "hasFont", "Font", "size"),
    "border-shape": ("border", "hasBorder", "Border", "shape"),
    "border-color": ("border", "hasBorder", "Border", "color"),
    "background-image": ("image", "hasImage", "Image", "identifier"),
    "background-image-style": ("image", "hasImage", "Image", "style"),
}
#: stored-appearance emission order (`CxlWriter.java:236-345`)
_APPEARANCE_ORDER = [
    "expanded", "width", "height", "font-style", "font-size", "border-shape",
    "border-color", "background-color", "background-image", "background-image-style",
]


def read_cxl_appearance(spark, path: str) -> DataFrame:
    """concept-appearance / linking-phrase-appearance attributes (plus the
    short/long comments carried on the element tags) in long form
    ``(elem_id, attr, value)`` — the read half of the appearance round
    trip. Driver-sized by the same contract as :func:`read_cxl`."""
    import xml.etree.ElementTree as ET

    ns = "{http://cmap.ihmc.us/xml/cmap/}"
    root = ET.parse(path).getroot()
    rows: list[tuple[str, str, str]] = []
    for tag in ("concept-appearance", "linking-phrase-appearance"):
        for el in root.iter(f"{ns}{tag}"):
            eid = el.get("id")
            for attr, val in el.attrib.items():
                if attr != "id" and val is not None:
                    rows.append((eid, attr, val))
    for tag in ("concept", "linking-phrase"):
        for el in root.iter(f"{ns}{tag}"):
            for attr in ("short-comment", "long-comment"):
                v = el.get(attr)
                if v is not None:
                    rows.append((el.get("id"), attr, v))
    return spark.createDataFrame(rows, "elem_id string, attr string, value string")


def appearance_triples(appearance: DataFrame) -> DataFrame:
    """Long-form appearance -> afv: triples: direct literals on the
    element's viz twin (``afv:<uuid3(cxlviz|id)>``), font/border/image
    attributes on typed satellite resources (`VisualizationInfoBuilder`'s
    ``createOrUpdateLiteralValueOfRelatedResource`` shape), plus one
    ``afv:identifier`` back-pointer per element so the CXL id survives the
    TTL round trip. All column expressions + one distinct for the
    satellite skeleton rows — runs at any scale."""
    from pyspark.sql import functions as F

    from rdfcmap_spark import vocab
    from rdfcmap_spark.ids import VIZ_PREFIX, name_uuid_col

    viz = F.concat(F.lit(VIZ_PREFIX), name_uuid_col(F.concat(F.lit("cxlviz|"), F.col("elem_id"))))

    def lit_row(subj, pred, lex):
        return [
            subj.alias("subj"), pred.alias("pred"), F.lit("literal").alias("obj_kind"),
            F.lit(None).cast("string").alias("obj_iri"), lex.alias("obj_lexical"),
            F.lit(vocab.XSD_STRING).alias("obj_datatype"),
        ]

    def iri_row(subj, pred, obj):
        return [
            subj.alias("subj"), pred.alias("pred"), F.lit("iri").alias("obj_kind"),
            obj.alias("obj_iri"), F.lit(None).cast("string").alias("obj_lexical"),
            F.lit(None).cast("string").alias("obj_datatype"),
        ]

    direct_pred = F.create_map(
        *[x for a, local in _DIRECT_ATTRS.items() if local
          for x in (F.lit(a), F.lit(vocab.AFV + local))]
    )
    direct = appearance.filter(direct_pred.getItem(F.col("attr")).isNotNull()).select(
        *lit_row(viz, direct_pred.getItem(F.col("attr")), F.col("value"))
    )

    sat_group = F.create_map(
        *[x for a, (g, *_rest) in _SAT_ATTRS.items() for x in (F.lit(a), F.lit(g))]
    )
    sat_pred = F.create_map(
        *[x for a, (_g, _l, _t, vp) in _SAT_ATTRS.items()
          for x in (F.lit(a), F.lit(vocab.AFV + vp))]
    )
    sats = appearance.filter(sat_group.getItem(F.col("attr")).isNotNull()).withColumn(
        "sat",
        F.concat(
            F.lit(VIZ_PREFIX),
            name_uuid_col(
                F.concat(F.lit("cxl"), sat_group.getItem(F.col("attr")), F.lit("|"),
                         F.col("elem_id"))
            ),
        ),
    )
    sat_values = sats.select(*lit_row(F.col("sat"), sat_pred.getItem(F.col("attr")), F.col("value")))
    link_pred = F.create_map(
        *[x for a, (_g, lp, _t, _vp) in _SAT_ATTRS.items()
          for x in (F.lit(a), F.lit(vocab.AFV + lp))]
    )
    type_iri = F.create_map(
        *[x for a, (_g, _lp, t, _vp) in _SAT_ATTRS.items()
          for x in (F.lit(a), F.lit(vocab.AFV + t))]
    )
    sat_skeleton = (
        sats.select(
            viz.alias("viz"), F.col("sat"),
            link_pred.getItem(F.col("attr")).alias("lp"),
            type_iri.getItem(F.col("attr")).alias("ti"),
        )
        .distinct()
    )
    sat_links = sat_skeleton.select(*iri_row(F.col("viz"), F.col("lp"), F.col("sat")))
    sat_types = sat_skeleton.select(
        *iri_row(F.col("sat"), F.lit(vocab.RDF_TYPE), F.col("ti"))
    ).distinct()

    idents = appearance.select("elem_id").distinct().select(
        *lit_row(viz, F.lit(vocab.AFV_IDENTIFIER), F.col("elem_id"))
    )
    return direct.unionByName(sat_values).unionByName(sat_links).unionByName(sat_types).unionByName(idents)


def appearance_from_triples(triples: DataFrame) -> DataFrame:
    """Invert :func:`appearance_triples`: afv: triples -> long-form
    ``(elem_id, attr, value)``. Element identity comes from the
    ``afv:identifier`` back-pointer; satellite values rejoin through their
    ``hasFont``/``hasBorder``/``hasImage`` link. Two hash joins keyed on
    the viz/satellite IRIs — no driver loop."""
    from pyspark.sql import functions as F

    from rdfcmap_spark import vocab

    ids_ = triples.filter(F.col("pred") == vocab.AFV_IDENTIFIER).select(
        F.col("subj").alias("viz"), F.col("obj_lexical").alias("elem_id")
    )
    direct_attr = F.create_map(
        *[x for a, local in _DIRECT_ATTRS.items() if local
          for x in (F.lit(vocab.AFV + local), F.lit(a))]
    )
    direct = (
        triples.withColumn("attr", direct_attr.getItem(F.col("pred")))
        .filter(F.col("attr").isNotNull())
        .join(ids_, F.col("subj") == F.col("viz"))
        .select("elem_id", "attr", F.col("obj_lexical").alias("value"))
    )
    links = triples.filter(
        F.col("pred").isin(vocab.AFV_HAS_FONT, vocab.AFV_HAS_BORDER, vocab.AFV_HAS_IMAGE)
    ).select(F.col("subj").alias("viz"), F.col("pred").alias("lp"), F.col("obj_iri").alias("sat"))
    sat_attr = F.create_map(
        *[x for a, (_g, lp, _t, vp) in _SAT_ATTRS.items()
          for x in (F.lit(vocab.AFV + lp + "|" + vocab.AFV + vp), F.lit(a))]
    )
    sat = (
        triples.join(links, F.col("subj") == F.col("sat"))
        .withColumn("attr", sat_attr.getItem(F.concat(F.col("lp"), F.lit("|"), F.col("pred"))))
        .filter(F.col("attr").isNotNull())
        .join(ids_, "viz")
        .select("elem_id", "attr", F.col("obj_lexical").alias("value"))
    )
    return direct.unionByName(sat)
