"""Stage 3 — triple assembly (SURVEY.md J1/J8, X3, X12).

Builds the ``triples`` DataFrame from linked sentences + entities:

* entity triples — ``rdf:type owl:NamedIndividual`` + ``dct:title`` +
  resolved-type (`VisualizationInfoBuilder.java:76,112-124`);
* relation triples — (subj, property, obj); unresolved linking phrases fall
  back to ``skos:related`` (cf. `Cmap2TurtleConverter.java:539-578`);
* qudt-unit rewrite — objects referenced via ``qudt:unit`` are re-pointed
  from the unit named-individual to the unit class (J6,
  `Cmap2TurtleConverter.replaceNamedResources:2828-2910`);
* cardinality resources — classified per `CmapUtil.determineCardinality:
  809-876`, attached as structured nodes (`Cmap2TurtleConverter.java:580-684`);
  unknown grammars quarantine instead of throwing;
* typed literals — lexical + datatype kept verbatim (X12,
  `Cmap2TurtleConverter.java:2416-2463`), invalid lexicals quarantined.

Scale notes: every triple family is a narrow projection off the linked
sentence stream — the only joins are the broadcast dictionary probes done in
stage 2; IDs are minted inline (uuid5 column expr). No shuffle until the
final set-semantics ``dropDuplicates``.

:func:`assemble_from_connections` is the general two-hop J1 join
(`Cmap2TurtleConverter.java:477-537`) for CXL-shaped relational inputs
(concepts / linking_phrases / connections), kept as a first-class operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfcmap_spark import vocab
from rdfcmap_spark.functions.cardinality import classify_cols
from rdfcmap_spark.ids import instance_iri_col
from rdfcmap_spark.schemas import TRIPLES

_T_COLS = [f.name for f in TRIPLES.fields]


def _as_triples(df: DataFrame) -> DataFrame:
    """Project/cast to the canonical triples schema column order."""
    for f in TRIPLES.fields:
        if f.name not in df.columns:
            df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
    return df.select(*[F.col(f.name).cast(f.dataType) for f in TRIPLES.fields])


def _tstruct(subj, pred, obj_kind, obj_iri, obj_lexical, obj_datatype, conv_id, turn_idx):
    """Triple as a uniformly-typed struct (for array-explode emission)."""
    return F.struct(
        subj.cast("string").alias("subj"),
        pred.cast("string").alias("pred"),
        obj_kind.cast("string").alias("obj_kind"),
        obj_iri.cast("string").alias("obj_iri"),
        obj_lexical.cast("string").alias("obj_lexical"),
        obj_datatype.cast("string").alias("obj_datatype"),
        conv_id.cast("string").alias("conv_id"),
        turn_idx.cast("int").alias("turn_idx"),
    )


def _explode_triples(df: DataFrame, arr) -> DataFrame:
    """Explode an array<triple-struct> column; null elements are dropped.

    This is the single-scan emission shape: one pass over the input produces
    EVERY triple family at once, instead of one union branch (= one full
    re-scan of the checkpointed sentence stream) per family — the round-1
    plan re-read the checkpoint ~9x, which was the measured bandwidth
    bottleneck of the materialization phase.
    """
    return (
        df.select(F.explode(arr).alias("_t"))
        .filter(F.col("_t").isNotNull())
        .select("_t.*")
        .select(*[F.col(f.name).cast(f.dataType) for f in TRIPLES.fields])
    )


def _null_s():
    return F.lit(None).cast("string")


def _null_i():
    return F.lit(None).cast("int")


def entity_triples(entities: DataFrame) -> DataFrame:
    """NamedIndividual + title + resolved-type triples per entity — ONE scan
    of the aggregated entity table (explode of a per-entity triple array)."""
    eid = F.col("entity_id")
    conv = F.col("conv_id")
    named = _tstruct(
        eid, F.lit(vocab.RDF_TYPE), F.lit("iri"), F.lit(vocab.OWL_NAMED_INDIVIDUAL),
        _null_s(), _null_s(), conv, _null_i(),
    )
    typed = F.when(
        F.col("canonical_iri").isNotNull(),
        _tstruct(
            eid, F.lit(vocab.RDF_TYPE), F.lit("iri"), F.col("canonical_iri"),
            _null_s(), _null_s(), conv, _null_i(),
        ),
    )
    titles = F.transform(
        F.col("titles"),
        lambda t: _tstruct(
            eid, F.lit(vocab.DCT_TITLE), F.lit("literal"), _null_s(),
            t, F.lit(vocab.XSD_STRING), conv, _null_i(),
        ),
    )
    return _explode_triples(entities, F.concat(F.array(named, typed), titles))


def relation_triples(rel: DataFrame) -> DataFrame:
    """Relation sentences (subj_entity, pred_iri?, obj_entity, obj_kind, card).

    Expects columns: conv_id, turn_idx, sent_idx, subj_entity, pred_iri
    (null = unresolved phrase), obj_entity, obj_kind, card.
    Emits the main triple + cardinality satellite nodes; sameAs rows must be
    filtered out by the caller (they feed canonicalization, not the output).
    """
    unit_map = F.create_map(*[F.lit(x) for kv in vocab.UNIT_INDIVIDUAL_TO_CLASS.items() for x in kv])
    pred = F.coalesce(F.col("pred_iri"), F.lit(vocab.SKOS_RELATED))
    obj = F.when(
        F.col("pred_iri") == vocab.QUDT_UNIT,
        F.coalesce(unit_map[F.col("obj_entity")], F.col("obj_entity")),
    ).otherwise(F.col("obj_entity"))
    conv, turn = F.col("conv_id"), F.col("turn_idx")

    main = _tstruct(
        F.col("subj_entity"), pred, F.col("obj_kind"), obj, _null_s(), _null_s(), conv, turn
    )

    raw_type, raw_min, raw_max = classify_cols(F.col("card"))
    has_card = (
        F.col("card").isNotNull() & (F.col("card") != "") & F.col("pred_iri").isNotNull()
        & raw_type.isNotNull()  # unsupported grammar -> quarantined, not fatal
    )
    card_type = F.when(has_card, raw_type)
    card_min = F.when(has_card, raw_min)
    card_max = F.when(has_card, raw_max)
    card_node = F.when(
        has_card,
        instance_iri_col(
            F.concat_ws("|", F.lit("card"), conv, turn, F.col("sent_idx"))
        ),
    )
    cardinal = [
        F.when(has_card, _tstruct(
            card_node, F.lit(vocab.RDF_TYPE), F.lit("iri"), card_type,
            _null_s(), _null_s(), conv, turn)),
        F.when(has_card, _tstruct(
            card_node, F.lit(vocab.AFV_ON_PROPERTY), F.lit("iri"), F.col("pred_iri"),
            _null_s(), _null_s(), conv, turn)),
        F.when(has_card, _tstruct(
            F.col("subj_entity"), F.lit(vocab.AFV + "hasCardinality"), F.lit("bnode"), card_node,
            _null_s(), _null_s(), conv, turn)),
        F.when(has_card & card_min.isNotNull(), _tstruct(
            card_node, F.lit(vocab.AFV_MIN_VALUE), F.lit("literal"), _null_s(),
            card_min, F.lit(vocab.XSD_INTEGER), conv, turn)),
        F.when(has_card & card_max.isNotNull(), _tstruct(
            card_node, F.lit(vocab.AFV_MAX_VALUE), F.lit("literal"), _null_s(),
            card_max, F.lit(vocab.XSD_INTEGER), conv, turn)),
    ]
    return _explode_triples(rel, F.array(main, *cardinal))


def sentence_triples(sent: DataFrame) -> DataFrame:
    """EVERY batch triple family — entity declarations (NamedIndividual /
    title / resolved type for subject- and object-position mentions),
    relation mains with the QUDT unit rewrite, cardinality satellites, and
    quarantined typed literals — emitted from ONE scan of the linked-sentence
    stream as a single array explode.

    Entity triples are emitted **per mention** rather than per aggregated
    entity: the triple *set* is identical (entity_id, resolved IRI and the
    trimmed title are pure functions of (conv_id, surface_norm)), and the
    final set-semantics aggregate collapses the duplicates — so the entity
    groupBy + collect_set shuffle of the per-family formulation disappears
    entirely. sameAs relations are intentionally NOT emitted (they feed
    canonicalization, not the output model).
    """
    from rdfcmap_spark.functions.literals import literal_cols

    conv, turn = F.col("conv_id"), F.col("turn_idx")

    def entity_structs(ok, eid, surface, res):
        return [
            F.when(ok, _tstruct(
                eid, F.lit(vocab.RDF_TYPE), F.lit("iri"), F.lit(vocab.OWL_NAMED_INDIVIDUAL),
                _null_s(), _null_s(), conv, _null_i())),
            F.when(ok, _tstruct(
                eid, F.lit(vocab.DCT_TITLE), F.lit("literal"), _null_s(),
                F.trim(surface), F.lit(vocab.XSD_STRING), conv, _null_i())),
            F.when(ok & res.isNotNull(), _tstruct(
                eid, F.lit(vocab.RDF_TYPE), F.lit("iri"), res,
                _null_s(), _null_s(), conv, _null_i())),
        ]

    subj_ok = (F.col("subj_norm") != "") & (
        F.col("subj_kind").isNull() | (F.col("subj_kind") != "individual")
    )
    obj_ment = (F.col("form") == "relation") & F.col("obj_norm").isNotNull()
    obj_ok = obj_ment & (F.col("obj_norm") != "") & (
        F.col("obj_kind_term").isNull() | (F.col("obj_kind_term") != "individual")
    )
    ent = entity_structs(subj_ok, F.col("subj_entity"), F.col("subj"), F.col("subj_res")) + \
        entity_structs(obj_ok, F.col("obj_entity"), F.col("obj"), F.col("obj_res"))

    rel_ok = (
        (F.col("form") == "relation")
        & F.col("obj_entity").isNotNull()
        & (F.col("pred_iri").isNull() | (F.col("pred_iri") != vocab.OWL_SAME_AS))
    )
    unit_map = F.create_map(*[F.lit(x) for kv in vocab.UNIT_INDIVIDUAL_TO_CLASS.items() for x in kv])
    robj = F.when(
        F.col("pred_iri") == vocab.QUDT_UNIT,
        F.coalesce(unit_map[F.col("obj_entity")], F.col("obj_entity")),
    ).otherwise(F.col("obj_entity"))
    main = F.when(rel_ok, _tstruct(
        F.col("subj_entity"), F.coalesce(F.col("pred_iri"), F.lit(vocab.SKOS_RELATED)),
        F.col("obj_kind"), robj, _null_s(), _null_s(), conv, turn,
    ))

    raw_type, raw_min, raw_max = classify_cols(F.col("card"))
    has_card = (
        rel_ok & F.col("card").isNotNull() & (F.col("card") != "")
        & F.col("pred_iri").isNotNull() & raw_type.isNotNull()
    )
    card_node = F.when(
        has_card,
        instance_iri_col(F.concat_ws("|", F.lit("card"), conv, turn, F.col("sent_idx"))),
    )
    cardinal = [
        F.when(has_card, _tstruct(
            card_node, F.lit(vocab.RDF_TYPE), F.lit("iri"), raw_type,
            _null_s(), _null_s(), conv, turn)),
        F.when(has_card, _tstruct(
            card_node, F.lit(vocab.AFV_ON_PROPERTY), F.lit("iri"), F.col("pred_iri"),
            _null_s(), _null_s(), conv, turn)),
        F.when(has_card, _tstruct(
            F.col("subj_entity"), F.lit(vocab.AFV + "hasCardinality"), F.lit("bnode"), card_node,
            _null_s(), _null_s(), conv, turn)),
        F.when(has_card & raw_min.isNotNull(), _tstruct(
            card_node, F.lit(vocab.AFV_MIN_VALUE), F.lit("literal"), _null_s(),
            raw_min, F.lit(vocab.XSD_INTEGER), conv, turn)),
        F.when(has_card & raw_max.isNotNull(), _tstruct(
            card_node, F.lit(vocab.AFV_MAX_VALUE), F.lit("literal"), _null_s(),
            raw_max, F.lit(vocab.XSD_INTEGER), conv, turn)),
    ]

    lit_token = F.concat(F.lit('"'), F.col("lex"), F.lit('"^^xsd:'), F.col("dt_local"))
    obj_lex, obj_dt, lex_valid = literal_cols(lit_token)
    lit_ok = (F.col("form") == "literal") & F.coalesce(lex_valid, F.lit(False))
    literal = F.when(lit_ok, _tstruct(
        F.col("subj_entity"), F.coalesce(F.col("pred_iri"), F.lit(vocab.SKOS_RELATED)),
        F.lit("literal"), _null_s(), obj_lex, obj_dt, conv, turn,
    ))

    return _explode_triples(sent, F.array(*ent, main, *cardinal, literal))


def literal_triples(lit: DataFrame) -> DataFrame:
    """Literal sentences -> (subj, datatype_prop, literal) with quarantine.

    Expects: conv_id, turn_idx, subj_entity, pred_iri, obj_lexical,
    obj_datatype, lex_valid. Invalid lexicals (reference would throw in
    Double.parseDouble etc.) are dropped here and counted by the caller.
    """
    return _as_triples(
        lit.filter(F.col("lex_valid"))
        .select(
            F.col("subj_entity").alias("subj"),
            F.col("pred_iri").alias("pred"),
            F.lit("literal").alias("obj_kind"),
            F.lit(None).alias("obj_iri"),
            "obj_lexical",
            "obj_datatype",
            "conv_id",
            "turn_idx",
        )
    )


def assemble_from_connections(
    concepts: DataFrame, links: DataFrame, connections: DataFrame
) -> DataFrame:
    """The reference's core two-hop join J1 (`Cmap2TurtleConverter.java:
    477-537`): (concept -> link) pairs ⋈ (link -> concept) pairs on the link
    id -> (from_concept, link_label, to_concept).

    Inputs follow FIXTURES.md §2 (concepts/linking_phrases/connections). The
    reference runs this as nested loops over statements (O(n·m)); here it is
    two shuffle-hash/broadcast equi-joins that AQE sizes at runtime. If one
    linking phrase is hyper-shared (skew), AQE skew-join splits it; the join
    keys stay (link_id), never the label.
    """
    c2l = (
        connections.join(links.select(F.col("link_id"), F.col("label")), connections.to_id == F.col("link_id"))
        .select(F.col("from_id").alias("from_concept"), "link_id", "label")
    )
    l2c = connections.join(
        links.select(F.col("link_id").alias("lid2")), connections.from_id == F.col("lid2")
    ).select(F.col("lid2").alias("link_id_r"), F.col("to_id").alias("to_concept"))
    return (
        c2l.join(l2c, c2l.link_id == l2c.link_id_r)
        .join(concepts.select(F.col("concept_id").alias("from_concept"), F.col("label").alias("from_label")), "from_concept")
        .join(concepts.select(F.col("concept_id").alias("to_concept"), F.col("label").alias("to_label")), "to_concept")
        .select("from_concept", "from_label", F.col("label").alias("link_label"), "to_concept", "to_label")
    )
