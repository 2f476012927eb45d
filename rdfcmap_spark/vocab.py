"""IRI constants, prefix maps, and the built-in alias dictionary.

Mirrors the vocabulary surface of the reference: the static prefix->namespace
dictionaries of `util/Prefixes.java:25-122`, the well-known term constants of
`util/AFOUtil.java` / `util/VizUtil.java`, and the label->term resolution data
the reference scans per lookup in `util/RdfUtil.java:449-529`.

In the reference the vocabulary is a Jena Model merged from `-r` files and
re-scanned linearly for every label lookup; here it is a small DataFrame
(:func:`alias_dict_df`) that entity linking **broadcasts** (SURVEY.md J2) —
one cheap build, zero per-lookup scans, no shuffle at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rdfcmap_spark.schemas import ALIAS_DICT

# --- well-known IRIs (public W3C/DC/QUDT/Allotrope namespaces; cf. AFOUtil.java:55,160-269) ---
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
XSD = "http://www.w3.org/2001/XMLSchema#"
SKOS = "http://www.w3.org/2004/02/skos/core#"
DCT = "http://purl.org/dc/terms/"
QUDT = "http://qudt.org/schema/qudt#"
UNIT = "http://qudt.org/vocab/unit#"
OBO = "http://purl.obolibrary.org/obo/"
AFE = "http://purl.allotrope.org/ontologies/equipment#"
AFM = "http://purl.allotrope.org/ontologies/material#"
AFR = "http://purl.allotrope.org/ontologies/result#"
AFP = "http://purl.allotrope.org/ontologies/process#"
AFX = "http://purl.allotrope.org/ontologies/property#"
AFV = "http://purl.allotrope.org/ontologies/visualization#"

RDF_TYPE = RDF + "type"
RDFS_LABEL = RDFS + "label"
RDFS_SUBCLASS_OF = RDFS + "subClassOf"
OWL_NAMED_INDIVIDUAL = OWL + "NamedIndividual"
OWL_SAME_AS = OWL + "sameAs"
OWL_DEPRECATED = OWL + "deprecated"
SKOS_PREF_LABEL = SKOS + "prefLabel"
SKOS_RELATED = SKOS + "related"
DCT_TITLE = DCT + "title"
DCT_IS_REPLACED_BY = DCT + "isReplacedBy"
QUDT_UNIT = QUDT + "unit"

DCT_IDENTIFIER = DCT + "identifier"

# visualization-twin terms (`VizUtil.java:13-82`) — the afv: model the
# reference mints alongside every instance (`VisualizationInfoBuilder.java`)
AFV_CONCEPT = AFV + "Concept"
AFV_MAP = AFV + "Map"
AFV_HAS_MAP = AFV + "hasMap"
AFV_IDENTIFIER = AFV + "identifier"
AFV_SHORT_COMMENT = AFV + "shortComment"
AFV_LONG_COMMENT = AFV + "longComment"
AFV_X_POSITION = AFV + "xPosition"
AFV_Y_POSITION = AFV + "yPosition"
AFV_WIDTH = AFV + "width"
AFV_HEIGHT = AFV + "height"
# appearance satellites (`VizUtil.java:20-83`): font/border/image nodes
AFV_FONT = AFV + "Font"
AFV_BORDER = AFV + "Border"
AFV_IMAGE = AFV + "Image"
AFV_HAS_FONT = AFV + "hasFont"
AFV_HAS_BORDER = AFV + "hasBorder"
AFV_HAS_IMAGE = AFV + "hasImage"
AFV_STYLE = AFV + "style"
AFV_SIZE = AFV + "size"
AFV_SHAPE = AFV + "shape"
AFV_COLOR = AFV + "color"
AFV_BACKGROUND_COLOR = AFV + "backgroundColor"
AFV_EXPANDED = AFV + "expanded"
# connection appearance + control points (`VizUtil.java:18,57-58,65-66,76`,
# `AFOUtil.java:325`; round 5 — the last CXL surface)
AFV_POINT = AFV + "Point"
AFV_HAS_CONTROL_POINT = AFV + "hasControlPoint"
AFV_ANCHOR_FROM = AFV + "anchorFrom"
AFV_ANCHOR_TO = AFV + "anchorTo"
AFV_LINE_TYPE = AFV + "lineType"
AFV_ARROW_HEAD = AFV + "arrowHead"
AFX_INDEX_PROP = AFX + "AFX_0000684"  # af-x:index (AFOUtil.java:325)

# RDF collection cells (`AFOUtil.java:177-179`) — the sh:path cons-list
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"

# SHACL terms used by the shapes-graph product (`AFOUtil.java:214-244`)
SHACL = "http://www.w3.org/ns/shacl#"
SH_NODE_SHAPE = SHACL + "NodeShape"
SH_PROPERTY_SHAPE = SHACL + "PropertyShape"
SH_LITERAL = SHACL + "Literal"
SH_HAS_VALUE = SHACL + "hasValue"
SH_NODEKIND = SHACL + "nodeKind"
SH_MIN_COUNT = SHACL + "minCount"
SH_MAX_COUNT = SHACL + "maxCount"
SH_QUALIFIED_MIN_COUNT = SHACL + "qualifiedMinCount"
SH_QUALIFIED_MAX_COUNT = SHACL + "qualifiedMaxCount"
SH_QUALIFIED_VALUE_SHAPE = SHACL + "qualifiedValueShape"
SH_BLANK_NODE_OR_IRI = SHACL + "BlankNodeOrIRI"
SH_DATATYPE = SHACL + "datatype"
SH_PROPERTY = SHACL + "property"
SH_PATH = SHACL + "path"
SH_TARGET_CLASS = SHACL + "targetClass"
SH_ZERO_OR_MORE_PATH = SHACL + "zeroOrMorePath"

#: shape-IRI namespace (`AFOUtil.AFS_PREFIX`, ShapesCreator2.java:105)
AFS_PREFIX = "http://purl.allotrope.org/shapes/core#"

XSD_STRING = XSD + "string"
XSD_DOUBLE = XSD + "double"
XSD_INTEGER = XSD + "integer"
XSD_DATETIME = XSD + "dateTime"
XSD_DATETIMESTAMP = XSD + "dateTimeStamp"
XSD_BOOLEAN = XSD + "boolean"

#: datatypes the reference parses from "v"^^xsd:t labels
#: (`Cmap2TurtleConverter.java:2416-2463`); unknown types fall back to string.
KNOWN_DATATYPES = {
    "string": XSD_STRING,
    "double": XSD_DOUBLE,
    "integer": XSD_INTEGER,
    "dateTime": XSD_DATETIME,
    "dateTimeStamp": XSD_DATETIMESTAMP,
    "boolean": XSD_BOOLEAN,
}

# cardinality resource types (VizUtil.java:24-27)
AFV_EXACT_CARDINALITY = AFV + "ExactCardinality"
AFV_MIN_CARDINALITY = AFV + "MinCardinality"
AFV_MAX_CARDINALITY = AFV + "MaxCardinality"
AFV_INTERVAL_CARDINALITY = AFV + "IntervalCardinality"
AFV_MIN_VALUE = AFV + "minimumValue"
AFV_MAX_VALUE = AFV + "maximumValue"
AFV_ON_PROPERTY = AFV + "onProperty"
AFX_HAS_OBJECT = AFX + "AFX_0000396"  # af-x:hasObject (AFOUtil.java:352)

#: prefix -> namespace, full breadth of `Prefixes.java:25-122` (21 AFT + 15
#: OBO + ~30 others). Keys that would alias a namespace we already map under
#: a short local key (afe/afm/afr/afp/afv vs the reference's af-e/af-m/...)
#: are kept under OUR key only — one prefix per namespace, so qname
#: compaction is deterministic (longest-namespace match wins, ttl._to_prefixed).
NS_PREFIX_MAP = {
    # core (ours, stable keys)
    "rdf": RDF,
    "rdfs": RDFS,
    "owl": OWL,
    "xsd": XSD,
    "skos": SKOS,
    "dct": DCT,
    "qudt": QUDT,
    "unit": UNIT,
    "obo": OBO,
    "afe": AFE,
    "afm": AFM,
    "afr": AFR,
    "afp": AFP,
    "af-x": AFX,
    "afv": AFV,
    # AFT family (Prefixes.aftPrefixMap)
    "af-c": "http://purl.allotrope.org/ontologies/common#",
    "af-cq": "http://purl.allotrope.org/ontologies/common/qualifier#",
    "af-rl": "http://purl.allotrope.org/ontologies/role#",
    "af-fn": "http://purl.allotrope.org/ontologies/function#",
    "af-re": "http://purl.allotrope.org/ontologies/realizable#",
    "af-s": "http://purl.allotrope.org/shapes/core#",
    "af-dt": "http://purl.allotrope.org/ontologies/datatype#",
    "af-q": "http://purl.allotrope.org/ontologies/quality#",
    "af-cur": "http://purl.allotrope.org/ontologies/curation#",
    "af-ec-001": "http://purl.allotrope.org/ontologies/equipment/codelist/001#",
    "af-ec-002": "http://purl.allotrope.org/ontologies/equipment/codelist/002#",
    "af-ec-003": "http://purl.allotrope.org/ontologies/equipment/codelist/003#",
    "af-ec-004": "http://purl.allotrope.org/ontologies/equipment/codelist/004#",
    "af-ec-005": "http://purl.allotrope.org/ontologies/equipment/codelist/005#",
    "af-ec-006": "http://purl.allotrope.org/ontologies/equipment/codelist/006#",
    "af-map": "http://purl.allotrope.org/ontologies/mapping#",
    "af-math": "http://purl.allotrope.org/ontologies/math#",
    # OBO family (Prefixes.oboPrefixMap; namespaces end at the idspace, so
    # obo/BFO_0000019 compacts to bfo:_0000019 as in the reference)
    "cl": OBO + "CL",
    "go": OBO + "GO",
    "ro": OBO + "RO",
    "uo": OBO + "UO",
    "iao": OBO + "IAO",
    "bfo": OBO + "BFO",
    "gaz": OBO + "GAZ",
    "mop": OBO + "MOP",
    "obi": OBO + "OBI",
    "chmo": OBO + "CHMO",
    "envo": OBO + "ENVO",
    "ncbi": OBO + "NCBITaxon",
    "pato": OBO + "PATO",
    "chebi": OBO + "CHEBI",
    "uberon": OBO + "UBERON",
    # misc (Prefixes.nsPrefixMap)
    "m": "http://www.w3.org/1998/Math/MathML#",
    "co": "http://purl.org/co/",
    "ex": "http://www.example.org#",
    "qb": "http://purl.org/linked-data/cube#",
    "ex2": "http://www.example2.org#",
    "hdf": "http://purl.allotrope.org/ontologies/hdf5/1.8#",
    "ldp": "http://purl.org/ldp/",
    "map": "http://purl.allotrope.org/ontologies/mapping/instances#",
    "ops": "http://www.openphacts.org/units/",
    "ore": "http://www.openarchives.org/ore/terms/",
    "org": "http://www.w3.org/ns/org#",
    "pav": "http://purl.org/pav/",
    "xml": "http://www.w3.org/xml/1998/namespace",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "omcd": "http://www.openmath.org/cd/",
    "prov": "http://www.w3.org/ns/prov#",
    "time": "http://www.w3.org/2006/time#",
    "void": "http://rdfs.org/ns/void#",
    "afs-c": "http://purl.allotrope.org/shapes/common#",
    "afs-q": "http://purl.allotrope.org/shapes/qudt#",
    "shacl": "http://www.w3.org/ns/shacl#",
    "vcard": "http://www.w3.org/2006/vcard/ns#",
    "adf-dc": "http://purl.allotrope.org/ontologies/datacube#",
    "adf-dp": "http://purl.allotrope.org/ontologies/datapackage#",
    "afs-dc": "http://purl.allotrope.org/shapes/datacube#",
    "afs-hr": "http://purl.allotrope.org/shapes/resources#",
    "dctype": "http://purl.org/dc/dcmitype/",
    "premis": "http://www.loc.gov/premis/rdf/v1#",
    "qudt-ext": "http://purl.allotrope.org/ontology/qudt-ext/schema#",
    "unit-ext": "http://purl.allotrope.org/ontology/qudt-ext/unit#",
    "adf-dc-hdf": "http://purl.allotrope.org/ontologies/datacube-hdf-map#",
    "quantity-ext": "http://purl.allotrope.org/ontology/qudt-ext/quantity#",
}

# one prefix per namespace is load-bearing for deterministic compaction
assert len(set(NS_PREFIX_MAP.values())) == len(NS_PREFIX_MAP), "duplicate namespace in NS_PREFIX_MAP"

#: namespace-priority for resolution tie-breaks: the reference prefers
#: Allotrope terms when a label is ambiguous (comma-list scan
#: `RdfUtil.java:249-260` accepts the first `af*` term; prefixed-iri list
#: `:283-318` likewise). Lower = preferred.
NS_PRIORITY = {"afe": 0, "afm": 0, "afr": 0, "afp": 0, "af-x": 0, "obo": 1, "unit": 3, "qudt": 3}

# ---------------------------------------------------------------------------
# Built-in alias dictionary (FIXTURES.md §3): ~50 terms covering every
# resolution branch — deprecated redirect, ambiguous label, units, properties.
# rows: (iri, prefix, label_norm, label_kind, term_kind, is_deprecated, replaced_by)
# ---------------------------------------------------------------------------

_CLASSES = [
    (AFE + "AFE_0000354", "afe", "reactor"),
    (AFE + "AFE_0000412", "afe", "stirrer"),
    (AFE + "AFE_0000501", "afe", "detector"),
    (AFE + "AFE_0000277", "afe", "pump"),
    (AFE + "AFE_0000049", "afe", "balance"),
    (AFE + "AFE_0000330", "afe", "vial"),
    (AFE + "AFE_0000601", "afe", "cooling jacket"),
    (AFM + "AFM_0000275", "afm", "sample"),
    (AFM + "AFM_0000312", "afm", "solvent"),
    (AFM + "AFM_0000099", "afm", "aliquot"),
    (AFR + "AFR_0001073", "afr", "peak area"),
    (AFR + "AFR_0001120", "afr", "measurement"),
    (AFR + "AFR_0001417", "afr", "dataset"),
    (AFR + "AFR_0001533", "afr", "report"),
    (AFP + "AFP_0003062", "afp", "experiment"),
    (AFP + "AFP_0003411", "afp", "protocol"),
    (OBO + "PATO_0000146", "obo", "temperature"),
    (OBO + "PATO_0001025", "obo", "pressure"),
    (OBO + "CHEBI_15377", "obo", "water"),
    (OBO + "CHEBI_16236", "obo", "ethanol"),
    (OBO + "CHEBI_15347", "obo", "acetone"),
    (OBO + "BFO_0000015", "obo", "process"),
    (OBO + "BFO_0000019", "obo", "quality"),
    # ambiguous label: present in two namespaces; af* wins the tie-break
    (AFE + "AFE_0000700", "afe", "column"),
    (OBO + "OBI_0000968", "obo", "column"),
]

_OBJECT_PROPERTIES = [
    (AFX + "AFX_0000141", "af-x", "has part"),
    (AFX + "AFX_0000233", "af-x", "contains"),
    (AFX + "AFX_0000311", "af-x", "is realized by"),
    (AFX + "AFX_0000287", "af-x", "has participant"),
    (AFX + "AFX_0000405", "af-x", "uses"),
    (AFX + "AFX_0000512", "af-x", "produces"),
    (AFX + "AFX_0000533", "af-x", "measures"),
    (AFX + "AFX_0000602", "af-x", "is about"),
    (AFX + "AFX_0000618", "af-x", "has quality"),
    (OBO + "BFO_0000063", "obo", "precedes"),
    (QUDT_UNIT, "qudt", "unit"),
    (OWL_SAME_AS, "owl", "is same as"),
]

_DATATYPE_PROPERTIES = [
    (AFX + "AFX_0000690", "af-x", "has value"),
    (DCT + "identifier", "dct", "has identifier"),
]

_INDIVIDUALS = [
    # qudt unit named individuals -> rewritten to unit classes by J6
    (UNIT + "DEG_C-Individual", "unit", "degree celsius"),
    (UNIT + "KiloPA-Individual", "unit", "kilopascal"),
]

#: J6 rewrite map (`Cmap2TurtleConverter.replaceNamedResources:2828-2910`):
#: objects referencing a unit *individual* via qudt:unit are re-pointed at the
#: unit *class*.
UNIT_INDIVIDUAL_TO_CLASS = {
    UNIT + "DEG_C-Individual": UNIT + "DEG_C",
    UNIT + "KiloPA-Individual": UNIT + "KiloPA",
}

#: deprecated-term redirects (`Cmap2TurtleConverter.java:997-1015`):
#: (iri, prefix, label, replaced_by)
_DEPRECATED = [
    (AFE + "AFE_0000090", "afe", "vessel", AFE + "AFE_0000354"),       # -> reactor
    (AFM + "AFM_0000010", "afm", "specimen", AFM + "AFM_0000275"),     # -> sample
]

#: small rdfs:subClassOf edge list for hierarchy-level tests (G4/G5,
#: `VisualizationInfoBuilder.determineClassHierarchyLevel:1155-1208`).
SUBCLASS_EDGES = [
    (AFE + "AFE_0000354", AFE + "AFE_0000001"),  # reactor ⊑ equipment
    (AFE + "AFE_0000412", AFE + "AFE_0000001"),  # stirrer ⊑ equipment
    (AFE + "AFE_0000601", AFE + "AFE_0000001"),  # cooling jacket ⊑ equipment
    (AFE + "AFE_0000001", OBO + "BFO_0000040"),  # equipment ⊑ material entity
    (AFM + "AFM_0000275", OBO + "BFO_0000040"),  # sample ⊑ material entity
    (OBO + "PATO_0000146", OBO + "BFO_0000019"),  # temperature ⊑ quality
    (OBO + "PATO_0001025", OBO + "BFO_0000019"),  # pressure ⊑ quality
]


def alias_rows() -> list[tuple]:
    """Full dictionary as plain rows (driver-side; broadcast by linking)."""
    rows = []
    for iri, prefix, label in _CLASSES:
        rows.append((iri, prefix, label, "prefLabel", "class", False, None, NS_PRIORITY.get(prefix, 9)))
    for iri, prefix, label in _OBJECT_PROPERTIES:
        rows.append((iri, prefix, label, "prefLabel", "objectProperty", False, None, NS_PRIORITY.get(prefix, 9)))
    for iri, prefix, label in _DATATYPE_PROPERTIES:
        rows.append((iri, prefix, label, "prefLabel", "datatypeProperty", False, None, NS_PRIORITY.get(prefix, 9)))
    for iri, prefix, label in _INDIVIDUALS:
        rows.append((iri, prefix, label, "prefLabel", "individual", False, None, NS_PRIORITY.get(prefix, 9)))
    for iri, prefix, label, replaced in _DEPRECATED:
        rows.append((iri, prefix, label, "prefLabel", "class", True, replaced, NS_PRIORITY.get(prefix, 9)))
    return rows


def alias_dict_df(spark: SparkSession) -> DataFrame:
    """The broadcast side of entity linking (SURVEY.md J2)."""
    return spark.createDataFrame(alias_rows(), ALIAS_DICT)


#: surfaces usable as entity mentions (for the synthetic grammar)
ENTITY_SURFACES = sorted({r[2] for r in _CLASSES} | {r[2] for r in _DEPRECATED} | {r[2] for r in _INDIVIDUALS})
#: linking-phrase surfaces (relation sentences)
RELATION_PHRASES = sorted({r[2] for r in _OBJECT_PROPERTIES} - {"unit", "is same as"})
LITERAL_PHRASES = sorted(r[2] for r in _DATATYPE_PROPERTIES)
#: surfaces planted but intentionally absent from the dictionary -> must land
#: in the unresolved_mentions metric (reference behavior RdfUtil.java:531-537)
UNRESOLVED_SURFACES = ["flux capacitor", "retro encabulator"]
UNRESOLVED_PHRASES = ["frobnicates"]
