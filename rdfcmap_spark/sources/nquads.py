"""N-Quads source + sink — the lineage-preserving interchange dump.

The reference writes single-graph Turtle (`CmapUtil.java` write path); this
repo's triples carry per-conversation lineage (``conv_id``), which SPARQL
exposes as named graphs ``urn:conv:<conv_id>`` (``operators/sparql_exec.py``
GRAPH support). N-Quads (W3C `n-quads`) is the standard flat serialization
of exactly that model — one ``subj pred obj [graph] .`` statement per line,
absolute IRIs only — so it is the format a 100 TB dump leaves the cluster
in when lineage must survive: line-oriented (splittable on read by any
engine), no header, no prefix state, embarrassingly partition-parallel in
both directions.

* :func:`write_nquads` — distributed text sink; a triple whose ``conv_id``
  is NULL lands in the default graph (3-term line), otherwise the graph
  label is ``urn:conv:<conv_id>`` — byte-compatible with the GRAPH clause's
  naming. ``turn_idx`` is sub-graph lineage with no N-Quads slot; it reads
  back NULL (documented loss, same contract as TTL's conv_id).
* :func:`read_nquads` — distributed regexp line parse back into the triples
  schema, graph label → ``conv_id``.

Round-trip (write → read) is asserted lossless for the 7-column set
(everything but turn_idx) by tests; content equivalence vs the pipeline is
oracle-checked (``kg_nquads_roundtrip``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdfcmap_spark import vocab
from rdfcmap_spark.schemas import TRIPLES
from rdfcmap_spark.sources.ttl import SIGNATURE, _esc_literal, _LANG_DT_PREFIX

#: the SPARQL executor's lineage named-graph namespace (sparql_exec.GRAPH_NS)
GRAPH_NS = "urn:conv:"


def _iri_or_bnode(col: F.Column) -> F.Column:
    return F.when(col.startswith("_:"), col).otherwise(
        F.concat(F.lit("<"), col, F.lit(">"))
    )


def quad_line_col() -> F.Column:
    """Column expression rendering one triple row as an N-Quads line. IRIs
    are always absolute ``<…>`` (the grammar has no prefixed names);
    literals escape exactly like the TTL sink; skolemized bnode objects
    render as ``_:b<uuid>`` labels (same convention as ``ttl_line_col``);
    plain ``xsd:string`` literals omit the datatype (canonical form)."""
    lit = F.concat(
        F.lit('"'),
        _esc_literal(F.col("obj_lexical")),
        F.lit('"'),
        F.when(
            F.col("obj_datatype").startswith(_LANG_DT_PREFIX),
            F.concat(F.lit("@"), F.substring(F.col("obj_datatype"), len(_LANG_DT_PREFIX) + 1, 100)),
        )
        .when(
            F.col("obj_datatype").isNotNull() & (F.col("obj_datatype") != vocab.XSD_STRING),
            F.concat(F.lit("^^<"), F.col("obj_datatype"), F.lit(">")),
        )
        .otherwise(F.lit("")),
    )
    bnode_label = F.concat(F.lit("_:b"), F.regexp_replace(F.col("obj_iri"), "^urn:uuid:", ""))
    obj = (
        F.when(F.col("obj_kind") == "literal", lit)
        .when(F.col("obj_kind") == "bnode", bnode_label)
        .otherwise(_iri_or_bnode(F.col("obj_iri")))
    )
    graph = F.when(
        F.col("conv_id").isNotNull(),
        F.concat(F.lit("<" + GRAPH_NS), F.col("conv_id"), F.lit(">")),
    )
    return F.concat_ws(
        " ",
        _iri_or_bnode(F.col("subj")),
        F.concat(F.lit("<"), F.col("pred"), F.lit(">")),
        obj,
        graph,  # concat_ws skips NULL -> default-graph 3-term line
        F.lit("."),
    )


def triples_to_nquads_lines(triples: DataFrame) -> DataFrame:
    """(line: string) — one rendered quad per row."""
    return triples.select(quad_line_col().alias("line"))


def write_nquads(triples: DataFrame, path: str) -> None:
    """Distributed text write: signature comment as the ``part-00000``
    shard (same unionByName ordering contract as ``write_ttl``), one body
    shard per partition."""
    spark = triples.sparkSession
    header = spark.createDataFrame([(SIGNATURE,)], "line string").coalesce(1)
    header.unionByName(triples_to_nquads_lines(triples)).write.mode("overwrite").text(path)


_IRI = r"<([^>]*)>"
_BN = r"(_:[A-Za-z0-9_\-]+)"
_LIT = r'"((?:[^"\\]|\\.)*)"(?:\^\^<([^>]*)>|@([a-zA-Z]+(?:-[a-zA-Z0-9]+)*))?'
QUAD_RE = (
    rf"^\s*(?:{_IRI}|{_BN})\s+{_IRI}\s+(?:{_LIT}|{_IRI}|{_BN})"
    rf"(?:\s+{_IRI})?\s*\.\s*$"
)


def read_nquads(spark: SparkSession, path: str) -> DataFrame:
    """Distributed parse back into the triples schema: one pushed-down
    comment filter, one regexp per line, no shuffles. The graph label
    strips ``urn:conv:`` into ``conv_id`` (foreign graph IRIs are carried
    verbatim — better loud-in-column than dropped)."""
    lines = spark.read.text(path).filter(
        ~F.col("value").startswith("#") & (F.length(F.trim(F.col("value"))) > 0)
    )
    g = lambda i: F.regexp_extract(F.col("value"), QUAD_RE, i)
    # groups: 1 subj-iri, 2 subj-bnode, 3 pred, 4 lit-lex, 5 lit-dt,
    # 6 lit-lang, 7 obj-iri, 8 obj-bnode, 9 graph
    subj = F.when(g(2) != "", g(2)).otherwise(g(1))
    is_lit = F.col("value").rlike(r'"') & (g(7) == "") & (g(8) == "")

    def unesc(col):
        c = F.regexp_replace(col, r"\\\\", "\x00")
        c = F.regexp_replace(c, r"\\t", "\t")
        c = F.regexp_replace(c, r"\\r", "\r")
        c = F.regexp_replace(c, r"\\n", "\n")
        c = F.regexp_replace(c, r'\\"', '"')
        return F.regexp_replace(c, "\x00", r"\\")

    parsed = lines.filter(F.col("value").rlike(QUAD_RE)).select(
        subj.alias("subj"),
        g(3).alias("pred"),
        F.when(is_lit, F.lit("literal"))
        .when(g(8) != "", F.lit("bnode"))
        .otherwise(F.lit("iri"))
        .alias("obj_kind"),
        F.when(g(8).startswith("_:b"), F.concat(F.lit("urn:uuid:"), F.substring(g(8), 4, 10_000)))
        .when(~is_lit, g(7))
        .alias("obj_iri"),
        F.when(is_lit, unesc(g(4))).alias("obj_lexical"),
        F.when(
            is_lit,
            F.when(g(6) != "", F.concat(F.lit(_LANG_DT_PREFIX), g(6)))
            .when(g(5) != "", g(5))
            .otherwise(F.lit(vocab.XSD_STRING)),
        ).alias("obj_datatype"),
        F.when(g(9).startswith(GRAPH_NS), F.substring(g(9), len(GRAPH_NS) + 1, 10_000))
        .when(g(9) != "", g(9))
        .alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
    )
    return parsed.select(*[F.col(f.name).cast(f.dataType) for f in TRIPLES.fields])
