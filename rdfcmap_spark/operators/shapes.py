"""SHACL shapes-GRAPH emission (§7.9 — `cmap/shape/ShapesCreator2.java`).

The reference's ``--shapes`` mode walks the instance graph and emits a real
SHACL shapes *model*: one named ``sh:NodeShape`` per reached node (label
minted from the node's title, collision-suffixed, `ShapesCreator2.java:859-885`),
``sh:property`` blank-node property shapes carrying ``sh:path`` /
``sh:minCount`` / ``sh:maxCount`` (+ qualified counts for object properties,
`:560-674`; ``sh:nodeKind sh:Literal`` + ``sh:datatype`` for literal
properties, `:780-855`), and — for the rdf-type constraint — an RDF-list
``sh:path`` of cons cells ``(rdf:type [sh:zeroOrMorePath rdfs:subClassOf])``
built from ``rdf:first``/``rdf:rest`` blank nodes (`:188-245`).

Spark-first re-expression: instead of a driver-side graph walk, the shapes
graph is a **projection of the observed-cardinality summary** (the same
aggregation as :func:`rdfcmap_spark.operators.graph.shacl_shapes`) — one
shape per ``rdf_type``, one property shape per observed ``(rdf_type, pred)``
with min/max counts measured over the data (sh:minCount 0 when some subject
of the type lacks the property). Blank nodes are minted as deterministic
skolems (``urn:uuid:`` UUIDv3 over the (type, pred) natural key —
:mod:`rdfcmap_spark.ids`), honouring the repo invariant *bnode iff skolem
urn:uuid*, so the graph round-trips through the TTL sink/source and is
identical across cluster sizes. Everything is built-in column expressions +
two small aggregations + one explode of constant triple templates — no
driver loop, no UDF; the per-type frame is dictionary-sized, so the label
collision window is safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rdfcmap_spark import ids, vocab

#: triple-struct field order shared by every template below
_FIELDS = ("subj", "pred", "obj_kind", "obj_iri", "obj_lexical", "obj_datatype")


def _t(
    subj: Column,
    pred: str,
    kind: str,
    iri: Column | None = None,
    lex: Column | None = None,
    dt: str | None = None,
) -> Column:
    """One triple template as a struct column."""
    null = F.lit(None).cast("string")
    return F.struct(
        subj.alias("subj"),
        F.lit(pred).alias("pred"),
        F.lit(kind).alias("obj_kind"),
        (iri if iri is not None else null).alias("obj_iri"),
        (lex if lex is not None else null).alias("obj_lexical"),
        (F.lit(dt) if dt is not None else null).alias("obj_datatype"),
    )


def _shape_label(rdf_type: Column) -> Column:
    """`ShapesCreator2.getShapesLabel:859-885`: local name of the type IRI,
    brackets stripped, split on whitespace/dash/parens, each word
    capitalized (first letter upper, rest lower — WordUtils.capitalizeFully)
    and joined, + "Shape"."""
    local = F.regexp_extract(rdf_type, r"([^#/:]+)$", 1)
    cleaned = F.regexp_replace(local, r"[\[\]]", "")
    parts = F.split(cleaned, r"[-\s\(\)]+")
    camel = F.array_join(
        F.transform(
            parts,
            lambda x: F.concat(F.upper(F.substring(x, 1, 1)), F.lower(F.substring(x, 2, 1000))),
        ),
        "",
    )
    return F.concat(camel, F.lit("Shape"))


def _explode(frame: DataFrame, arr: Column) -> DataFrame:
    t = frame.select(F.explode(arr).alias("t"))
    return t.select(*[F.col(f"t.{f}") for f in _FIELDS])


def shacl_shapes_graph(typed_triples: DataFrame) -> DataFrame:
    """Typed observations -> the SHACL shapes graph, as TRIPLES rows.

    Input: ``(subj, rdf_type, pred, obj_kind, obj_datatype)`` — one row per
    observed (subject, predicate) occurrence, ``obj_kind`` in
    iri|bnode|literal, ``obj_datatype`` set for literals. ``pred`` must not
    be rdf:type (the type constraint gets its own RDF-list property shape).

    Output: ``(subj, pred, obj_kind, obj_iri, obj_lexical, obj_datatype)``
    triples of the shapes model:

    * per type: ``afs:<Label>Shape a sh:NodeShape ; sh:targetClass <type>``
      with collision-suffixed labels (first occurrence by type-IRI order
      unsuffixed, later ones ``_1, _2, …`` — the A4 counter semantics);
      plus the rdf-type property shape whose ``sh:path`` is the cons-list
      ``(rdf:type [sh:zeroOrMorePath rdfs:subClassOf])``
      (`ShapesCreator2.java:188-245`): ``sh:minCount 1``, ``sh:hasValue
      <type>``.
    * per (type, pred): a property shape with ``sh:path <pred>``,
      observed ``sh:minCount`` (0 when some subject of the type lacks the
      property) / ``sh:maxCount``; literal-valued predicates additionally
      carry ``sh:nodeKind sh:Literal`` + ``sh:datatype`` (the single
      observed datatype, or xsd:string when mixed — the reference's
      fallback, `:846-851`), object-valued ones the qualified min/max
      twins (`:588-613`).

    Scale posture: two narrow aggregations (per-subject count, then
    per-(type,pred) min/max — both map-side combinable), one broadcast-sized
    per-type frame for labels (shape count = |types|, dictionary-sized by
    construction), constant-factor explode of templates. Blank-node ids are
    content-addressed UUIDv3 skolems — no ``monotonically_increasing_id``,
    identical output at any parallelism.
    """
    xsd_int = vocab.XSD_INTEGER

    # --- observed-cardinality summary per (rdf_type, pred) ---
    per_subj = typed_triples.groupBy("rdf_type", "pred", "subj").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.when(F.col("obj_kind") != "literal", 1).otherwise(0)).alias("any_nonlit"),
    )
    subj_totals = (
        typed_triples.select("rdf_type", "subj")
        .distinct()
        .groupBy("rdf_type")
        .agg(F.count(F.lit(1)).alias("n_subjects"))
    )
    dts = typed_triples.filter(F.col("obj_kind") == "literal").groupBy("rdf_type", "pred").agg(
        F.count_distinct("obj_datatype").alias("n_dt"),
        F.min("obj_datatype").alias("dt_min"),
    )
    summary = (
        per_subj.groupBy("rdf_type", "pred")
        .agg(
            F.count(F.lit(1)).alias("n_with"),
            F.min("n").alias("observed_min"),
            F.max("n").alias("max_count"),
            F.max("any_nonlit").alias("any_nonlit"),
        )
        .join(subj_totals, "rdf_type")
        .join(dts, ["rdf_type", "pred"], "left")
        .select(
            "rdf_type",
            "pred",
            F.when(F.col("n_with") < F.col("n_subjects"), F.lit(0))
            .otherwise(F.col("observed_min"))
            .cast("long")
            .alias("min_count"),
            F.col("max_count").cast("long"),
            (F.col("any_nonlit") == 0).alias("is_literal"),
            F.when(F.col("n_dt") == 1, F.col("dt_min"))
            .otherwise(F.lit(vocab.XSD_STRING))
            .alias("dt"),
        )
    )

    # --- shape IRI per type (collision-suffixed label) ---
    w = Window.partitionBy("label").orderBy("rdf_type")
    types = (
        typed_triples.select("rdf_type")
        .distinct()
        .withColumn("label", _shape_label(F.col("rdf_type")))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rdf_type",
            F.concat(
                F.lit(vocab.AFS_PREFIX),
                F.when(
                    F.col("rank") > 1,
                    F.concat(F.col("label"), F.lit("_"), (F.col("rank") - 1).cast("string")),
                ).otherwise(F.col("label")),
            ).alias("shape"),
        )
        .localCheckpoint(eager=False)  # tiny; reused by both template frames
    )

    # --- node-shape + rdf-type cons-list templates (12 triples per type) ---
    shape = F.col("shape")
    typ = F.col("rdf_type")
    ps_t = ids.instance_iri_col(F.concat(F.lit("shacl-ts|"), typ))
    l0 = ids.instance_iri_col(F.concat(F.lit("shacl-tp0|"), typ))
    l1 = ids.instance_iri_col(F.concat(F.lit("shacl-tp1|"), typ))
    z = ids.instance_iri_col(F.concat(F.lit("shacl-tpz|"), typ))
    node_triples = _explode(
        types,
        F.array(
            _t(shape, vocab.RDF_TYPE, "iri", F.lit(vocab.SH_NODE_SHAPE)),
            _t(shape, vocab.SH_TARGET_CLASS, "iri", typ),
            _t(shape, vocab.SH_PROPERTY, "bnode", ps_t),
            _t(ps_t, vocab.RDF_TYPE, "iri", F.lit(vocab.SH_PROPERTY_SHAPE)),
            _t(ps_t, vocab.SH_MIN_COUNT, "literal", lex=F.lit("1"), dt=xsd_int),
            _t(ps_t, vocab.SH_HAS_VALUE, "iri", typ),
            _t(ps_t, vocab.SH_PATH, "bnode", l0),
            _t(l0, vocab.RDF_FIRST, "iri", F.lit(vocab.RDF_TYPE)),
            _t(l0, vocab.RDF_REST, "bnode", l1),
            _t(l1, vocab.RDF_FIRST, "bnode", z),
            _t(z, vocab.SH_ZERO_OR_MORE_PATH, "iri", F.lit(vocab.RDFS_SUBCLASS_OF)),
            _t(l1, vocab.RDF_REST, "iri", F.lit(vocab.RDF_NIL)),
        ),
    )

    # --- property-shape templates per (type, pred) ---
    enriched = summary.join(F.broadcast(types), "rdf_type")
    ps = ids.instance_iri_col(F.concat(F.lit("shacl-ps|"), typ, F.lit("|"), F.col("pred")))
    pred_iri = F.col("pred")
    min_lex = F.col("min_count").cast("string")
    max_lex = F.col("max_count").cast("string")
    common = [
        _t(shape, vocab.SH_PROPERTY, "bnode", ps),
        _t(ps, vocab.RDF_TYPE, "iri", F.lit(vocab.SH_PROPERTY_SHAPE)),
        _t(ps, vocab.SH_PATH, "iri", pred_iri),
        _t(ps, vocab.SH_MIN_COUNT, "literal", lex=min_lex, dt=xsd_int),
        _t(ps, vocab.SH_MAX_COUNT, "literal", lex=max_lex, dt=xsd_int),
    ]
    lit_triples = _explode(
        enriched.filter(F.col("is_literal")),
        F.array(
            *common,
            _t(ps, vocab.SH_NODEKIND, "iri", F.lit(vocab.SH_LITERAL)),
            _t(ps, vocab.SH_DATATYPE, "iri", F.col("dt")),
        ),
    )
    # qualified counts MUST be paired with a sh:qualifiedValueShape to be
    # well-formed SHACL (r4 ADVICE; the reference pairs them with value/
    # node shapes, ShapesCreator2.java:620-674). The observed object TYPE
    # is not part of this operator's input contract, so the value shape
    # constrains the node kind instead: [ sh:nodeKind sh:BlankNodeOrIRI ]
    # — true of every object-valued observation by construction.
    qvs = ids.instance_iri_col(
        F.concat(F.lit("shacl-qvs|"), typ, F.lit("|"), F.col("pred"))
    )
    obj_triples = _explode(
        enriched.filter(~F.col("is_literal")),
        F.array(
            *common,
            _t(ps, vocab.SH_QUALIFIED_VALUE_SHAPE, "bnode", qvs),
            _t(qvs, vocab.SH_NODEKIND, "iri", F.lit(vocab.SH_BLANK_NODE_OR_IRI)),
            _t(ps, vocab.SH_QUALIFIED_MIN_COUNT, "literal", lex=min_lex, dt=xsd_int),
            _t(ps, vocab.SH_QUALIFIED_MAX_COUNT, "literal", lex=max_lex, dt=xsd_int),
        ),
    )

    return node_triples.unionByName(lit_triples).unionByName(obj_triples)
