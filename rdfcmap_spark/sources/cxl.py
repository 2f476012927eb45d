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
    so the write/read pair is a fixed point."""
    from rdfcmap_spark.functions.normalize import break_string_py

    wrap = break_string_py if wrap_labels else (lambda x: x)
    pos: dict[str, tuple[int, int]] = {}
    if positions is not None:
        key = "node" if "node" in positions.columns else "link_id"
        pos = {r[key]: (r["x"], r["y"]) for r in positions.select(key, "x", "y").collect()}
    # label-less elements (read_cxl tolerates them) render as label="" —
    # break_string_py iterates its input, so None must be coalesced first
    crows = sorted((r["concept_id"], wrap(r["label"] or "")) for r in concepts.collect())
    lrows = sorted((r["link_id"], wrap(r["label"] or "")) for r in links.collect())
    xrows = sorted((r["from_id"], r["to_id"]) for r in connections.collect())

    sb: list[str] = [_HEADER.format(title=cxl_escape(title))]
    sb.append("    <concept-list>\n")
    for cid, label in crows:
        sb.append(f'        <concept id="{cxl_escape(cid)}" label="{cxl_escape(label)}"/>\n')
    sb.append("    </concept-list>\n")
    sb.append("    <concept-appearance-list>\n")
    x = y = 10
    for cid, _ in crows:
        px, py = pos.get(cid, (x, y))
        sb.append(
            f'        <concept-appearance id="{cxl_escape(cid)}" x="{px}" y="{py}" '
            'width="100" height="25" font-style="plain"/>\n'
        )
        x += 10
        y += 10
    sb.append("    </concept-appearance-list>\n")
    sb.append("    <linking-phrase-list>\n")
    for lid, label in lrows:
        sb.append(f'        <linking-phrase id="{cxl_escape(lid)}" label="{cxl_escape(label)}"/>\n')
    sb.append("    </linking-phrase-list>\n")
    sb.append("    <linking-phrase-appearance-list>\n")
    x = y = 15
    for lid, _ in lrows:
        px, py = pos.get(lid, (x, y))
        sb.append(
            f'        <linking-phrase-appearance id="{cxl_escape(lid)}" x="{px}" y="{py}" '
            'width="100" height="11" min-width="2" min-height="11"/>\n'
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
