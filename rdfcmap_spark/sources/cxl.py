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

#: the reference writer's fixed style-sheet block (`CxlWriter.java:118-131`),
#: emitted verbatim when the caller supplies no parsed sheets — content
#: parity attribute-for-attribute (whitespace ours)
_DEFAULT_STYLE_SHEETS = (
    "    <style-sheet-list>\n"
    '        <style-sheet id="_Default_">\n'
    '            <map-style background-color="255,255,255,0" image-style="full" image-top-left="0,0"/>\n'
    '            <concept-style font-name="Verdana" font-size="12" font-style="plain" '
    'font-color="0,0,0,255" text-margin="4" background-color="237,244,246,255" '
    'background-image-style="full" border-color="0,0,0,255" border-style="solid" '
    'border-thickness="1" border-shape="rounded-rectangle" border-shape-rrarc="15.0" '
    'text-alignment="center" shadow-color="none" min-width="-1" min-height="-1" '
    'max-width="-1.0" group-child-spacing="10" group-parent-spacing="10"/>\n'
    '            <linking-phrase-style font-name="Verdana" font-size="12" font-style="plain" '
    'font-color="0,0,0,255" text-margin="1" background-color="0,0,255,0" '
    'background-image-style="full" border-color="0,0,0,0" border-style="solid" '
    'border-thickness="1" border-shape="rectangle" border-shape-rrarc="15.0" '
    'text-alignment="center" shadow-color="none" min-width="-1" min-height="-1" '
    'max-width="-1.0" group-child-spacing="10" group-parent-spacing="10"/>\n'
    '            <connection-style color="0,0,0,255" style="solid" thickness="1" '
    'type="straight" arrowhead="if-to-concept-and-slopes-up"/>\n'
    '            <resource-style font-name="SanSerif" font-size="12" font-style="plain" '
    'font-color="0,0,0,255" background-color="192,192,192,255"/>\n'
    "        </style-sheet>\n"
    '        <style-sheet id="_LatestChanges_">\n'
    '            <concept-style font-style="plain"/>\n'
    '            <connection-style arrowhead="no"/>\n'
    "        </style-sheet>\n"
    "    </style-sheet-list>\n"
)

#: connection-appearance defaults (`CxlWriter.java:114-116`)
_CONN_DEFAULTS = {
    "from-pos": "center",
    "to-pos": "center",
    "type": "straight",
    "arrowhead": "no",
}


def render_cxl(
    concepts: DataFrame,
    links: DataFrame,
    connections: DataFrame,
    title: str = "rdfcmap-spark export",
    wrap_labels: bool = True,
    positions: DataFrame | None = None,
    appearance: DataFrame | None = None,
    style_sheets: DataFrame | None = None,
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
    short/long comments on the element tags. Connection appearances
    (round 5) render with the stored anchors/line-type/arrowhead (defaults
    `CxlWriter.java:114-116`) and nested index-ordered ``control-point``
    children. ``style_sheets`` — the :func:`read_cxl_stylesheets` frame —
    re-emits the ``<style-sheet-list>`` block; absent, the reference
    writer's fixed default block is emitted verbatim."""
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
    # connection appearances + control points (round 5)
    import re as _re

    sb.append("    <connection-appearance-list>\n")
    for i, _fid_tid in enumerate(xrows):
        cid = f"conn-{i}"
        a = app.get(cid, {})
        attrs = "".join(
            f' {k}="{cxl_escape(a.get(k, d))}"' for k, d in _CONN_DEFAULTS.items()
        )
        cps: dict[int, dict[str, str]] = {}
        for attr, v in a.items():
            m = _re.fullmatch(r"control-point/(\d+)/(x|y)", attr)
            if m:
                cps.setdefault(int(m.group(1)), {})[m.group(2)] = v
        if cps:
            sb.append(f'        <connection-appearance id="{cxl_escape(cid)}"{attrs}>\n')
            for idx in sorted(cps):
                p = cps[idx]
                sb.append(
                    f'            <control-point x="{cxl_escape(p.get("x", "0"))}"'
                    f' y="{cxl_escape(p.get("y", "0"))}"/>\n'
                )
            sb.append("        </connection-appearance>\n")
        else:
            sb.append(f'        <connection-appearance id="{cxl_escape(cid)}"{attrs}/>\n')
    sb.append("    </connection-appearance-list>\n")
    # style-sheet passthrough (round 5): parsed sheets, else the
    # reference's fixed default block
    if style_sheets is not None:
        sheets: dict[str, dict[str, dict[str, str]]] = {}
        for r in style_sheets.select("sheet_id", "style_tag", "attr", "value").collect():
            sheets.setdefault(r["sheet_id"], {}).setdefault(r["style_tag"], {})[
                r["attr"]
            ] = r["value"]
        sb.append("    <style-sheet-list>\n")
        for sid in sorted(sheets):
            sb.append(f'        <style-sheet id="{cxl_escape(sid)}">\n')
            for tag in sorted(sheets[sid]):
                attrs = "".join(
                    f' {k}="{cxl_escape(v)}"' for k, v in sorted(sheets[sid][tag].items())
                )
                sb.append(f"            <{tag}{attrs}/>\n")
            sb.append("        </style-sheet>\n")
        sb.append("    </style-sheet-list>\n")
    else:
        sb.append(_DEFAULT_STYLE_SHEETS)
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
    # connection-appearance attributes (`CxlWriter.java:501-505`,
    # `VizUtil.java:57-66`; round 5)
    "from-pos": "anchorFrom",
    "to-pos": "anchorTo",
    "type": "lineType",
    "arrowhead": "arrowHead",
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
    """concept-appearance / linking-phrase-appearance /
    connection-appearance attributes (plus the short/long comments carried
    on the element tags) in long form ``(elem_id, attr, value)`` — the
    read half of the appearance round trip. Connection control points
    (round 5 — `ControlPoints.java`, `Cmap2TurtleConverter.java:1790-1822`:
    nested ``<control-point x y/>`` children, index = document order)
    flatten to ``control-point/<index>/x`` / ``.../y`` attr rows.
    Driver-sized by the same contract as :func:`read_cxl`."""
    import xml.etree.ElementTree as ET

    ns = "{http://cmap.ihmc.us/xml/cmap/}"
    root = ET.parse(path).getroot()
    rows: list[tuple[str, str, str]] = []
    for tag in ("concept-appearance", "linking-phrase-appearance", "connection-appearance"):
        for el in root.iter(f"{ns}{tag}"):
            eid = el.get("id")
            for attr, val in el.attrib.items():
                if attr != "id" and val is not None:
                    rows.append((eid, attr, val))
            for i, cp in enumerate(el.findall(f"{ns}control-point")):
                rows.append((eid, f"control-point/{i}/x", cp.get("x")))
                rows.append((eid, f"control-point/{i}/y", cp.get("y")))
    for tag in ("concept", "linking-phrase"):
        for el in root.iter(f"{ns}{tag}"):
            for attr in ("short-comment", "long-comment"):
                v = el.get(attr)
                if v is not None:
                    rows.append((el.get("id"), attr, v))
    return spark.createDataFrame(rows, "elem_id string, attr string, value string")


def read_cxl_stylesheets(spark, path: str) -> DataFrame:
    """``<style-sheet-list>`` passthrough (round 5 — `StyleSheets.java`,
    the writer's fixed block `CxlWriter.java:118-131`): every style child
    of every sheet flattens to ``(sheet_id, style_tag, attr, value)``.
    :func:`render_cxl` re-emits the block from this frame (sheets/tags/
    attrs in sorted order — deterministic text, identical re-parse)."""
    import xml.etree.ElementTree as ET

    ns = "{http://cmap.ihmc.us/xml/cmap/}"
    root = ET.parse(path).getroot()
    rows: list[tuple[str, str, str, str]] = []
    for sheet in root.iter(f"{ns}style-sheet"):
        sid = sheet.get("id")
        for style in sheet:
            tag = style.tag.removeprefix(ns)
            for attr, val in style.attrib.items():
                rows.append((sid, tag, attr, val))
    return spark.createDataFrame(
        rows, "sheet_id string, style_tag string, attr string, value string"
    )


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

    # control points (round 5): one afv:Point satellite per (element, index)
    # — afv:hasControlPoint link, xPosition/yPosition literals, afx:index
    # (`Cmap2TurtleConverter.java:1790-1822`, `CxlWriter.java:512-534`)
    cp = (
        appearance.filter(F.col("attr").rlike(r"^control-point/[0-9]+/[xy]$"))
        .withColumn("idx", F.regexp_extract("attr", r"^control-point/([0-9]+)/", 1))
        .withColumn("axis", F.regexp_extract("attr", r"/([xy])$", 1))
        .withColumn(
            "cp_sat",
            F.concat(
                F.lit(VIZ_PREFIX),
                name_uuid_col(
                    F.concat(F.lit("cxlcp"), F.col("idx"), F.lit("|"), F.col("elem_id"))
                ),
            ),
        )
    )
    cp_values = cp.select(
        *lit_row(
            F.col("cp_sat"),
            F.when(F.col("axis") == "x", F.lit(vocab.AFV_X_POSITION)).otherwise(
                F.lit(vocab.AFV_Y_POSITION)
            ),
            F.col("value"),
        )
    )
    cp_skel = cp.select(viz.alias("viz"), "cp_sat", "idx").distinct()
    cp_links = cp_skel.select(
        *iri_row(F.col("viz"), F.lit(vocab.AFV_HAS_CONTROL_POINT), F.col("cp_sat"))
    )
    cp_types = cp_skel.select(
        *iri_row(F.col("cp_sat"), F.lit(vocab.RDF_TYPE), F.lit(vocab.AFV_POINT))
    )
    cp_idx = cp_skel.select(
        *lit_row(F.col("cp_sat"), F.lit(vocab.AFX_INDEX_PROP), F.col("idx"))
    )

    return (
        direct.unionByName(sat_values)
        .unionByName(sat_links)
        .unionByName(sat_types)
        .unionByName(idents)
        .unionByName(cp_values)
        .unionByName(cp_links)
        .unionByName(cp_types)
        .unionByName(cp_idx)
    )


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
    # control points (round 5): rejoin each afv:Point satellite through its
    # hasControlPoint link and afx:index, rebuilding the flattened
    # control-point/<idx>/<axis> attr rows
    cp_links = triples.filter(F.col("pred") == vocab.AFV_HAS_CONTROL_POINT).select(
        F.col("subj").alias("viz"), F.col("obj_iri").alias("cp_sat")
    )
    cp_idx = triples.filter(F.col("pred") == vocab.AFX_INDEX_PROP).select(
        F.col("subj").alias("cp_sat"), F.col("obj_lexical").alias("idx")
    )
    cp = (
        triples.filter(F.col("pred").isin(vocab.AFV_X_POSITION, vocab.AFV_Y_POSITION))
        .select(F.col("subj").alias("cp_sat"), "pred", F.col("obj_lexical").alias("value"))
        .join(cp_links, "cp_sat")
        .join(cp_idx, "cp_sat")
        .join(ids_, "viz")
        .select(
            "elem_id",
            F.concat(
                F.lit("control-point/"),
                F.col("idx"),
                F.lit("/"),
                F.when(F.col("pred") == vocab.AFV_X_POSITION, F.lit("x")).otherwise(
                    F.lit("y")
                ),
            ).alias("attr"),
            "value",
        )
    )
    return direct.unionByName(sat).unionByName(cp)
