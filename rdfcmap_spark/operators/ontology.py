"""Ontology creation mode (SURVEY.md §0 table row `--ontology`).

The reference derives an OWL ontology from an instance model in two hops:
instance triples -> SHACL shapes (per-class, per-property observed
cardinalities, `ShapesCreator*`) -> OWL classes + property declarations +
``owl:Restriction`` nodes (`ontology/OntologyCreator.createOntologyFromShapes:
102-168`, restrictions `addPropertyRestriction:170-283`, class prefLabels
de-camel-cased at `:124`). Single-JVM, triple-by-triple.

Spark re-architecture — the whole mode is three aggregations over the
instance triples:

* classes   = distinct ``rdf:type`` objects -> ``owl:Class`` + prefLabel;
* properties = per-predicate object-kind profile -> ``owl:ObjectProperty``
  (any non-literal use wins, mirroring `isObjectDomainProperty:577-590`) or
  ``owl:DatatypeProperty`` (`isLiteralDomainProperty:555-575`);
* restrictions = per (class, predicate) observed min/max counts (min = 0
  when some instance of the class lacks the property — the sh:minCount
  inference of `ShapesCreatorPath.java:632-711`) -> deterministic
  ``owl:Restriction`` bnodes attached via ``rdfs:subClassOf``.

Restriction node ids replace the reference's fresh bnodes with
uuid3(restr|class|pred) so output is resumable / cluster-size-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfcmap_spark import vocab
from rdfcmap_spark.ids import INSTANCE_PREFIX, name_uuid_col
from rdfcmap_spark.operators.assembly import _explode_triples, _null_i, _null_s, _tstruct

OWL_CLASS = vocab.OWL + "Class"
OWL_OBJECT_PROPERTY = vocab.OWL + "ObjectProperty"
OWL_DATATYPE_PROPERTY = vocab.OWL + "DatatypeProperty"
OWL_RESTRICTION = vocab.OWL + "Restriction"
OWL_ON_PROPERTY = vocab.OWL + "onProperty"
OWL_MIN_CARDINALITY = vocab.OWL + "minCardinality"
OWL_MAX_CARDINALITY = vocab.OWL + "maxCardinality"


def _pref_label(local):
    """De-camel-cased lowercase label (`OntologyCreator.java:124`):
    ``CoolingJacket-X`` -> ``cooling jacket  x`` (dash -> space, space before
    each capital, trim, lower) — ported replaceAll-for-replaceAll."""
    c = F.regexp_replace(local, "-", " ")
    c = F.regexp_replace(c, "([A-Z])", " $1")
    return F.lower(F.trim(c))


def _local_name(iri):
    return F.regexp_extract(iri, r"([^#/]+)$", 1)


def ontology_from_instances(triples: DataFrame) -> DataFrame:
    """Instance triples -> OWL ontology triples (one DataFrame, TRIPLES
    schema with null provenance)."""
    typed = triples.filter(
        (F.col("pred") == vocab.RDF_TYPE) & (F.col("obj_kind") == "iri")
    ).select("subj", F.col("obj_iri").alias("class_iri"))

    # --- classes: one scan of the distinct type set
    classes = typed.select("class_iri").distinct()
    class_t = _explode_triples(
        classes,
        F.array(
            _tstruct(
                F.col("class_iri"), F.lit(vocab.RDF_TYPE), F.lit("iri"), F.lit(OWL_CLASS),
                _null_s(), _null_s(), _null_s(), _null_i(),
            ),
            _tstruct(
                F.col("class_iri"), F.lit(vocab.SKOS_PREF_LABEL), F.lit("literal"), _null_s(),
                _pref_label(_local_name(F.col("class_iri"))), F.lit(vocab.XSD_STRING),
                _null_s(), _null_i(),
            ),
        ),
    )

    # --- properties: object-kind profile per predicate (object wins a mix,
    # `OntologyCreator.isObjectDomainProperty/isLiteralDomainProperty`)
    props = (
        triples.filter(F.col("pred") != vocab.RDF_TYPE)
        .groupBy("pred")
        .agg(F.max((F.col("obj_kind") != "literal").cast("int")).alias("any_obj"))
        .withColumn(
            "prop_kind",
            F.when(F.col("any_obj") == 1, F.lit(OWL_OBJECT_PROPERTY)).otherwise(
                F.lit(OWL_DATATYPE_PROPERTY)
            ),
        )
    )
    prop_t = _explode_triples(
        props,
        F.array(
            _tstruct(
                F.col("pred"), F.lit(vocab.RDF_TYPE), F.lit("iri"), F.col("prop_kind"),
                _null_s(), _null_s(), _null_s(), _null_i(),
            ),
            _tstruct(
                F.col("pred"), F.lit(vocab.SKOS_PREF_LABEL), F.lit("literal"), _null_s(),
                _pref_label(_local_name(F.col("pred"))), F.lit(vocab.XSD_STRING),
                _null_s(), _null_i(),
            ),
        ),
    )

    # --- restrictions: observed per-(class, pred) cardinality envelope.
    # per-subject counts, then min/max across the class; min 0 when some
    # instance lacks the property (count subjects with the pred vs class size)
    per_subj = (
        typed.join(
            triples.filter(F.col("pred") != vocab.RDF_TYPE).select("subj", "pred"), "subj"
        )
        .groupBy("class_iri", "pred", "subj")
        .agg(F.count("*").alias("n"))
    )
    class_sizes = typed.groupBy("class_iri").agg(
        F.countDistinct("subj").alias("n_subjects")
    )
    envelope = (
        per_subj.groupBy("class_iri", "pred")
        .agg(
            F.min("n").alias("min_present"),
            F.max("n").alias("max_count"),
            F.count("*").alias("n_with_pred"),
        )
        .join(class_sizes, "class_iri")
        .withColumn(
            "min_count",
            F.when(F.col("n_with_pred") < F.col("n_subjects"), F.lit(0)).otherwise(
                F.col("min_present")
            ),
        )
        .withColumn(
            "rnode",
            F.concat(
                F.lit(INSTANCE_PREFIX),
                name_uuid_col(F.concat_ws("|", F.lit("restr"), F.col("class_iri"), F.col("pred"))),
            ),
        )
    )
    r = F.col("rnode")
    restr_t = _explode_triples(
        envelope,
        F.array(
            _tstruct(F.col("class_iri"), F.lit(vocab.RDFS_SUBCLASS_OF), F.lit("bnode"), r,
                     _null_s(), _null_s(), _null_s(), _null_i()),
            _tstruct(r, F.lit(vocab.RDF_TYPE), F.lit("iri"), F.lit(OWL_RESTRICTION),
                     _null_s(), _null_s(), _null_s(), _null_i()),
            _tstruct(r, F.lit(OWL_ON_PROPERTY), F.lit("iri"), F.col("pred"),
                     _null_s(), _null_s(), _null_s(), _null_i()),
            _tstruct(r, F.lit(OWL_MIN_CARDINALITY), F.lit("literal"), _null_s(),
                     F.col("min_count").cast("string"), F.lit(vocab.XSD_INTEGER),
                     _null_s(), _null_i()),
            _tstruct(r, F.lit(OWL_MAX_CARDINALITY), F.lit("literal"), _null_s(),
                     F.col("max_count").cast("string"), F.lit(vocab.XSD_INTEGER),
                     _null_s(), _null_i()),
        ),
    )
    return class_t.unionByName(prop_t).unionByName(restr_t)


def rdfs_entail(triples: DataFrame, subclass_edges: DataFrame) -> DataFrame:
    """RDFS subclass entailment: materialize the ``rdf:type`` triples a
    reasoner would infer through the class hierarchy — if ``s a C`` and
    ``C ⊑* D`` then ``s a D`` (rdfs9), the standard type-completion step
    between KG construction and SPARQL-over-types querying (Jena's RDFS
    reasoner plays this role around the reference's models; here it is a
    batch operator over the triples frame).

    Provenance: every inferred triple carries the (conv_id, turn_idx) of
    the asserted source type it was derived from — the minimum over
    (conv_id ASC NULLS FIRST, turn_idx ASC NULLS FIRST, source class ASC),
    a total order because the triples frame is set-deduped (so each
    (subj, source-class) pair is unique). Already-asserted types are
    anti-joined away; output is exactly the NEW triples, in the standard
    6+2-column triples schema.

    Scale posture: the subclass closure is computed by pointer-doubling
    (:func:`~rdfcmap_spark.operators.graph.transitive_closure` — ontology
    hierarchies are tiny, SURVEY §2.8 disposition) and broadcast; one
    broadcast join against the type slice of the corpus, one LeftAnti on
    the asserted set, one per-(subj, class) window bounded by hierarchy
    depth.
    """
    from pyspark.sql import Window

    from rdfcmap_spark import vocab
    from rdfcmap_spark.operators.graph import transitive_closure

    closure = transitive_closure(
        subclass_edges.select(F.col("child").alias("src"), F.col("parent").alias("dst"))
    )
    typed = triples.filter(
        (F.col("pred") == vocab.RDF_TYPE) & (F.col("obj_kind") == "iri")
    ).select("subj", "obj_iri", "conv_id", "turn_idx")
    inf = typed.join(
        F.broadcast(closure), typed["obj_iri"] == closure["src"]
    ).select(
        "subj",
        F.col("obj_iri").alias("src_class"),
        F.col("dst").alias("anc"),
        "conv_id",
        "turn_idx",
    )
    new = inf.join(
        typed.select("subj", F.col("obj_iri").alias("anc")), ["subj", "anc"], "left_anti"
    )
    w = Window.partitionBy("subj", "anc").orderBy(
        F.col("conv_id").asc_nulls_first(),
        F.col("turn_idx").asc_nulls_first(),
        F.col("src_class").asc(),
    )
    return (
        new.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "subj",
            F.lit(vocab.RDF_TYPE).alias("pred"),
            F.lit("iri").alias("obj_kind"),
            F.col("anc").alias("obj_iri"),
            F.lit(None).cast("string").alias("obj_lexical"),
            F.lit(None).cast("string").alias("obj_datatype"),
            "conv_id",
            "turn_idx",
        )
    )
