"""The flagship KG-construction pipeline (SURVEY.md §3.1 re-architected).

transcripts ── extract (narrow, codegen) ── link (broadcast joins)
            ── assemble (inline uuid5 minting, no shuffle)
            ── canonicalize (iterative CC over identity edges)
            ── materialize (set-dedup + partitioned write + metrics)

Every stage is a pure DataFrame -> DataFrame function; the whole plan up to
canonicalization is shuffle-free (scan -> split/explode -> regexp -> broadcast
probes -> projections), which is what survives a 100 TB input: cost is one
pass over the text plus the small CC fixed point over identity edges only.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdfcmap_spark import vocab
from rdfcmap_spark.functions.literals import literal_cols
from rdfcmap_spark.functions.normalize import normalize_label
from rdfcmap_spark.operators import assembly, canonicalize, linking, mentions


@dataclass
class PipelineResult:
    triples: DataFrame
    metrics: dict = field(default_factory=dict)


def linked_sentences(transcripts: DataFrame, alias: DataFrame) -> DataFrame:
    """Sentences with subject/object/predicate all resolved + entity IDs.

    Three broadcast probes of the alias dictionary (subject surface, object
    surface, linking phrase) — no shuffle, no Python.
    """
    sent = mentions.extract_sentences(transcripts)
    sent = sent.withColumn("subj_norm", normalize_label(F.col("subj"))).withColumn(
        "obj_norm", normalize_label(F.col("obj"))
    ).withColumn("phrase_norm", normalize_label(F.col("phrase")))

    a = F.broadcast
    al = linking.resolved_alias_df(transcripts.sparkSession)
    subj_d = al.select(
        F.col("label_norm").alias("subj_norm"),
        F.col("resolved_iri").alias("subj_res"),
        F.col("term_kind").alias("subj_kind"),
    )
    obj_d = al.select(
        F.col("label_norm").alias("obj_norm"),
        F.col("resolved_iri").alias("obj_res"),
        F.col("term_kind").alias("obj_kind_term"),
    )
    pred_d = al.filter(F.col("term_kind").isin("objectProperty", "datatypeProperty")).select(
        F.col("label_norm").alias("phrase_norm"),
        F.col("resolved_iri").alias("pred_iri"),
    )
    from rdfcmap_spark.ids import instance_iri_col

    out = (
        sent.join(a(subj_d), "subj_norm", "left")
        .join(a(obj_d), "obj_norm", "left")
        .join(a(pred_d), "phrase_norm", "left")
        .withColumn(
            "subj_entity",
            F.when(F.col("subj_kind") == "individual", F.col("subj_res")).otherwise(
                instance_iri_col(F.concat_ws("|", F.lit("ent"), F.col("conv_id"), F.col("subj_norm")))
            ),
        )
        .withColumn(
            "obj_entity",
            F.when(F.col("obj_norm").isNull(), F.lit(None)).when(
                F.col("obj_kind_term") == "individual", F.col("obj_res")
            ).otherwise(
                instance_iri_col(F.concat_ws("|", F.lit("ent"), F.col("conv_id"), F.col("obj_norm")))
            ),
        )
        # named individuals of the ontology are never blank nodes (J7 wins
        # over the [ ] marker — golden mirror in synth.entity_for)
        .withColumn(
            "obj_kind",
            F.when(F.col("obj_kind_term") == "individual", F.lit("iri"))
            .when(F.col("obj_bnode"), F.lit("bnode"))
            .otherwise(F.lit("iri")),
        )
    )
    return out


def identity_inputs(sent: DataFrame, checkpoint: bool = True):
    """(sameas, idents) — the identity families that feed canonicalization,
    not the output model. ONE scan of the 2 GB-per-2M-turn sentence
    checkpoint extracts BOTH into a tiny (kind, a, b) frame, checkpointed so
    the CC machinery's actions (gate count, edge materialization) never
    touch the wide stream again — materializing sameas and idents separately
    was two full checkpoint scans (stage-probe measured, 8->32 scaling
    work)."""
    lit_token = F.concat(F.lit('"'), F.col("lex"), F.lit('"^^xsd:'), F.col("dt_local"))
    obj_lex, _, lex_valid = literal_cols(lit_token)
    is_sameas = (
        (F.col("form") == "relation")
        & F.col("obj_entity").isNotNull()
        & (F.col("pred_iri") == vocab.OWL_SAME_AS)
    )
    is_ident = (
        (F.col("form") == "literal")
        & (F.col("pred_iri") == vocab.DCT + "identifier")
        & F.coalesce(lex_valid, F.lit(False))
    )
    ident_pre = (
        sent.select(
            F.when(is_sameas, F.lit("sameas")).when(is_ident, F.lit("ident")).alias("kind"),
            F.col("subj_entity").alias("a"),
            F.when(is_sameas, F.col("obj_entity")).otherwise(obj_lex).alias("b"),
        )
        .filter(F.col("kind").isNotNull())
    )
    if checkpoint:
        ident_pre = ident_pre.localCheckpoint()
    sameas = ident_pre.filter(F.col("kind") == "sameas").select("a", "b")
    idents = ident_pre.filter(F.col("kind") == "ident").select(
        F.col("a").alias("entity_id"), F.col("b").alias("value")
    )
    return sameas, idents


def run_pipeline(
    transcripts: DataFrame,
    alias: DataFrame | None = None,
    with_canonicalization: bool = True,
    checkpoint: bool = True,
    with_visualization: bool = False,
) -> PipelineResult:
    spark = transcripts.sparkSession
    alias = alias if alias is not None else linking.resolved_alias_df(spark)

    sent = linked_sentences(transcripts, alias)
    # prune before materialization: phrase/phrase_norm are spent (pred_iri
    # carries the result) and obj_bnode is folded into obj_kind — the
    # checkpoint is re-scanned ~6x by the triple families, so every dropped
    # column is paid back sixfold in memory bandwidth
    sent = sent.drop("phrase", "phrase_norm", "obj_bnode")
    if checkpoint:
        # Materialize the linked-sentence stream ONCE: every downstream
        # triple family (entities, relations, literals, cardinality,
        # identity edges) branches off it, and without a checkpoint each
        # branch would re-run scan -> extract -> broadcast-link from the
        # source (~9x recompute). This is also the stage boundary the
        # resume machinery records (SURVEY.md §4 iteration/lineage row).
        #
        # HOW it materializes matters at high thread counts: localCheckpoint
        # stores row-format UnsafeRows (every rescan reads ALL columns),
        # while persist() stores compressed COLUMNAR batches that each
        # family scan column-prunes — far less memory traffic on a
        # bandwidth-saturated box. Measured (interleaved A/B, local[32],
        # 2M turns, same drift window): checkpoint median 109.1 s vs
        # persist 60.9 s — 1.8x. SPARK_GRAFT_SENT_CACHE selects:
        # persist (default) | offheap (columnar cache in off-heap memory,
        # zero GC tracing of the cached bytes) | checkpoint (row-format,
        # lineage-truncating — the pre-round-3 behavior).
        mode = os.environ.get("SPARK_GRAFT_SENT_CACHE", "persist")
        if mode in ("persist", "offheap"):
            from pyspark import StorageLevel

            lvl = StorageLevel.OFF_HEAP if mode == "offheap" else StorageLevel.MEMORY_AND_DISK
            sent = sent.persist(lvl)
            sent.count()  # eager, so downstream branches hit the cache
        else:
            sent = sent.localCheckpoint()

    # --- ALL batch triple families from ONE scan of the checkpointed
    # linked-sentence stream (entity declarations per mention, relations with
    # unit rewrite, cardinality satellites, quarantined literals) — see
    # assembly.sentence_triples. No shuffle until the set-semantics
    # aggregate: the entity groupBy of the per-family formulation is gone
    # (per-mention emission + final dedup is set-identical).
    triples = assembly.sentence_triples(sent)

    sameas, idents = identity_inputs(sent, checkpoint=checkpoint)

    metrics: dict = {}
    if with_canonicalization:
        # CC runs over identity edges only (tiny next to the triple stream);
        # the raw triple union is NOT materialized — it fuses straight into
        # the set-semantics aggregate of rewrite_triples, so the 10^13-row
        # candidate stream is touched exactly once (a checkpoint of it was
        # measured to double wall time at 2M turns: ~4 GB of wide rows
        # evicts the sentence checkpoint and spills).
        edges = canonicalize.identity_edges(sameas, idents)
        mapping, n_mapping = canonicalize.connected_components_with_count(edges)
        # compact binary shuffle encoding: see rewrite_triples — wins when
        # the set-semantics shuffle crosses a network or contends for
        # memory bandwidth, costs encode/decode ALU when it doesn't
        compact = os.environ.get("SPARK_GRAFT_COMPACT_SHUFFLE", "") == "1"
        triples = canonicalize.rewrite_triples(
            triples, mapping, n_mapping=n_mapping, compact_shuffle=compact
        )
    else:
        key = ["subj", "pred", "obj_kind", "obj_iri", "obj_lexical", "obj_datatype"]
        triples = triples.dropDuplicates(key)

    if with_visualization:
        # --update parity: mint the afv: twin + position triples per
        # instance entity (`VisualizationInfoBuilder.java:40-350`). The
        # twin stage re-scans the triple stream (subjects + title ladder),
        # so cut the lineage once first; the twin volume itself is
        # human-map-sized by the viz contract.
        from rdfcmap_spark.operators.reverse import viz_twins

        triples = triples.localCheckpoint(eager=False)
        twins = viz_twins(triples).select(
            "*",
            F.lit(None).cast("string").alias("conv_id"),
            F.lit(None).cast("int").alias("turn_idx"),
        )
        triples = triples.unionByName(twins)

    return PipelineResult(triples=triples, metrics=metrics)


def pipeline_metrics(transcripts: DataFrame, alias: DataFrame | None = None) -> dict:
    """QA metrics the reference logs as it converts (`CmapUtil.java:450-466`,
    unresolved labels `RdfUtil.java:531-537`) — computed in one aggregate pass.
    """
    spark = transcripts.sparkSession
    sent = linked_sentences(transcripts, alias or linking.resolved_alias_df(spark))
    lit_token = F.concat(F.lit('"'), F.col("lex"), F.lit('"^^xsd:'), F.col("dt_local"))
    _, _, lex_valid = literal_cols(lit_token)
    row = sent.agg(
        F.count("*").alias("sentences"),
        F.sum(((F.col("form") == "relation") & F.col("subj_res").isNull()).cast("long")).alias(
            "unresolved_subjects"
        ),
        F.sum(
            ((F.col("form") == "relation") & F.col("obj_norm").isNotNull() & F.col("obj_res").isNull()).cast("long")
        ).alias("unresolved_objects"),
        F.sum((F.col("pred_iri").isNull()).cast("long")).alias("unresolved_phrases"),
        F.sum(((F.col("form") == "literal") & ~F.coalesce(lex_valid, F.lit(False))).cast("long")).alias(
            "quarantined_literals"
        ),
    ).collect()[0]
    return row.asDict()


def triple_support(
    transcripts: DataFrame,
    alias: DataFrame | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Evidence counts per canonical triple — the confidence signal a
    corpus-built KG needs for downstream edge pruning and conflict
    resolution (no reference counterpart: one CXL map is one witness; at
    10^12 turns the same canonical triple is asserted by many independent
    conversations, and how many is the signal).

    Output: the TRIPLES key columns + ``n_turns`` (distinct supporting
    (conv_id, turn_idx) provenances) + ``n_convs`` (distinct supporting
    conversations). Counts are DISTINCT-provenance — robust to the
    candidate stream's per-mention emission multiplicity, and exactly
    mirrorable over the oracle's ``rew`` CTE.

    Scale posture: identical to the flagship pipeline up to the rewrite
    (shuffle-free extract/link/assemble, CC over identity edges only,
    size-gated broadcast rewrite joins via
    :func:`~rdfcmap_spark.operators.canonicalize.rewritten_candidates`);
    the counting itself is ONE hash aggregate on the triple key (the two
    distinct counts expand ×3 with map-side partial aggregation — no
    sort, no window). The candidate stream is touched exactly once.
    """
    spark = transcripts.sparkSession
    alias = alias if alias is not None else linking.resolved_alias_df(spark)
    sent = linked_sentences(transcripts, alias).drop("phrase", "phrase_norm", "obj_bnode")
    if checkpoint:
        from pyspark import StorageLevel

        sent = sent.persist(StorageLevel.MEMORY_AND_DISK)
        sent.count()
    triples = assembly.sentence_triples(sent)
    sameas, idents = identity_inputs(sent, checkpoint=checkpoint)
    edges = canonicalize.identity_edges(sameas, idents)
    mapping, n_mapping = canonicalize.connected_components_with_count(edges)
    out, key, (d_iri, d_kind, d_dt) = canonicalize.rewritten_candidates(
        triples, mapping, n_mapping=n_mapping
    )
    agg = out.groupBy(*key).agg(
        F.countDistinct(
            F.col("conv_id"), F.coalesce(F.col("turn_idx"), F.lit(-1))
        ).alias("n_turns"),
        F.countDistinct("conv_id").alias("n_convs"),
    )
    return agg.select(
        d_iri(F.col("subj_b")).alias("subj"),
        F.col("pred"),
        d_kind(F.col("kind_t")).alias("obj_kind"),
        d_iri(F.col("obj_b")).alias("obj_iri"),
        F.col("obj_lexical"),
        d_dt(F.col("dt_b")).alias("obj_datatype"),
        "n_turns",
        "n_convs",
    )


def triple_timeline(
    transcripts: DataFrame,
    alias: DataFrame | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Temporal KG: assertion-time bounds per canonical triple — when the
    corpus FIRST and LAST asserted each fact (exact integer microseconds,
    the sessionize/event-funnel timestamp device), plus the distinct-
    provenance turn count of :func:`triple_support`. The validity-interval
    signal a transcript-built KG needs for staleness pruning and
    conflict-by-recency resolution (no reference counterpart: one CXL map
    has no time axis).

    Scale posture: identical head to :func:`triple_support` up to the
    rewrite; then (a) one distinct over (triple key, conv_id, turn_idx) —
    map-side combinable, collapses the per-mention multiplicity BEFORE any
    join, (b) one hash join of that provenance frame against the
    (conv_id, turn_idx) -> ts projection of the input (left join: a
    provenance without a turn row keeps null bounds rather than dropping
    the triple), (c) one final hash aggregate. The candidate stream is
    touched exactly once.

    Output: TRIPLES key + first_asserted_us, last_asserted_us, n_turns.
    """
    spark = transcripts.sparkSession
    alias = alias if alias is not None else linking.resolved_alias_df(spark)
    sent = linked_sentences(transcripts, alias).drop("phrase", "phrase_norm", "obj_bnode")
    if checkpoint:
        from pyspark import StorageLevel

        sent = sent.persist(StorageLevel.MEMORY_AND_DISK)
        sent.count()
    triples = assembly.sentence_triples(sent)
    sameas, idents = identity_inputs(sent, checkpoint=checkpoint)
    edges = canonicalize.identity_edges(sameas, idents)
    mapping, n_mapping = canonicalize.connected_components_with_count(edges)
    out, key, (d_iri, d_kind, d_dt) = canonicalize.rewritten_candidates(
        triples, mapping, n_mapping=n_mapping
    )
    prov = out.select(*key, "conv_id", "turn_idx").distinct()
    ts_us = transcripts.select(
        "conv_id",
        "turn_idx",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("_ts_us"),
    )
    agg = (
        prov.join(ts_us, ["conv_id", "turn_idx"], "left")
        .groupBy(*key)
        .agg(
            F.min("_ts_us").alias("first_asserted_us"),
            F.max("_ts_us").alias("last_asserted_us"),
            F.count(F.lit(1)).cast("long").alias("n_turns"),
        )
    )
    return agg.select(
        d_iri(F.col("subj_b")).alias("subj"),
        F.col("pred"),
        d_kind(F.col("kind_t")).alias("obj_kind"),
        d_iri(F.col("obj_b")).alias("obj_iri"),
        F.col("obj_lexical"),
        d_dt(F.col("dt_b")).alias("obj_datatype"),
        "first_asserted_us",
        "last_asserted_us",
        "n_turns",
    )


def turn_sft_pairs(
    transcripts: DataFrame,
    alias: DataFrame | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """SFT pairs FROM the KG (round 5 — the graft cell's fusion product:
    transcripts in, training data out): per turn, ``prompt`` = the turn's
    raw text and ``target`` = the canonical triples that turn asserts,
    serialized deterministically (sorted ``subj|pred|obj`` tokens joined
    with " ; ") — the supervision pairs for fine-tuning an extraction
    model on the pipeline's own outputs (the standard bootstrap loop:
    pipeline labels the corpus, the model distills the pipeline).

    Scale posture: identical head to :func:`triple_support` up to the
    rewrite (one pass over the text, CC over identity edges only); then
    one distinct over (triple key, provenance), one hash aggregate per
    turn building the sorted token list (collect_list is bounded by
    triples-per-turn — a human turn asserts a handful), one hash join
    back to the turn text. Output is turn-linear.

    Output: (conv_id, turn_idx, prompt, target, n_triples); turns that
    assert no triple produce no pair (inner-join semantics — empty
    targets teach nothing).
    """
    spark = transcripts.sparkSession
    alias = alias if alias is not None else linking.resolved_alias_df(spark)
    sent = linked_sentences(transcripts, alias).drop("phrase", "phrase_norm", "obj_bnode")
    if checkpoint:
        from pyspark import StorageLevel

        sent = sent.persist(StorageLevel.MEMORY_AND_DISK)
        sent.count()
    triples = assembly.sentence_triples(sent)
    sameas, idents = identity_inputs(sent, checkpoint=checkpoint)
    edges = canonicalize.identity_edges(sameas, idents)
    mapping, n_mapping = canonicalize.connected_components_with_count(edges)
    out, key, (d_iri, d_kind, d_dt) = canonicalize.rewritten_candidates(
        triples, mapping, n_mapping=n_mapping
    )
    prov = out.select(*key, "conv_id", "turn_idx").distinct()
    obj_repr = F.when(
        d_kind(F.col("kind_t")) == "literal",
        F.concat(F.lit('"'), F.col("obj_lexical"), F.lit('"^^'), d_dt(F.col("dt_b"))),
    ).otherwise(d_iri(F.col("obj_b")))
    tok = prov.select(
        "conv_id",
        "turn_idx",
        F.concat_ws("|", d_iri(F.col("subj_b")), F.col("pred"), obj_repr).alias("token"),
    )
    agg = tok.groupBy("conv_id", "turn_idx").agg(
        F.array_join(F.array_sort(F.collect_list("token")), " ; ").alias("target"),
        F.count(F.lit(1)).cast("long").alias("n_triples"),
    )
    return agg.join(
        transcripts.select("conv_id", "turn_idx", F.col("text").alias("prompt")),
        ["conv_id", "turn_idx"],
    ).select("conv_id", "turn_idx", "prompt", "target", "n_triples")


def triple_growth(timeline: DataFrame, bucket_us: int = 3_600_000_000) -> DataFrame:
    """KG growth curve over the temporal timeline (round 5): per time
    bucket of FIRST assertion, how many canonical triples the corpus
    minted in that bucket, plus the running total — the monitoring
    product a continuously-built KG needs (is extraction saturating? did
    a source change bend the curve?). ``bucket_us`` sizes the bucket
    (default hourly; a corpus whose canonical facts saturate early — like
    the synthetic fixture, where recurring facts are all first-asserted
    within the first conversations — needs fine buckets to show a curve).

    Scale posture: one hash aggregate over the timeline keyed on the
    bucket ordinal (map-side combinable), then a running sum by window
    over the per-bucket frame — which is CALENDAR-sized (one row per
    bucket of corpus history), not corpus-sized, so the unpartitioned
    window is bounded by design. Bucket ordinal is exact integer
    division of microseconds (``DIV`` — no double rounding at edges).

    Output: (epoch_bucket, n_new_triples, cum_triples), ascending
    ordinals of ``bucket_us``-microsecond buckets since the epoch.
    """
    from pyspark.sql import Window

    bucket = F.expr(f"first_asserted_us DIV {int(bucket_us)}")
    per = (
        timeline.filter(F.col("first_asserted_us").isNotNull())
        .groupBy(bucket.alias("epoch_bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_new_triples"))
    )
    w = Window.orderBy("epoch_bucket").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        F.col("epoch_bucket").cast("long").alias("epoch_bucket"),
        "n_new_triples",
        F.sum("n_new_triples").over(w).cast("long").alias("cum_triples"),
    )


def resolve_by_recency(timeline: DataFrame) -> DataFrame:
    """Conflict resolution by recency: for every multi-valued
    (subject, predicate) in a :func:`triple_timeline` frame, keep the most
    recently asserted value — the standard merge policy for a KG built
    from a stream of conversations (later statements supersede earlier
    ones; rdf:type and dct:title are excluded as legitimately
    multi-valued, the :func:`~rdfcmap_spark.operators.relational.
    fact_conflicts` contract).

    One window over (subj, pred) — rank by (last_asserted_us DESC nulls
    last, obj_kind, value token, datatype: a total order, so the winner is
    deterministic even on timestamp ties — plus the per-pair value count;
    only pairs that actually conflicted (n_values > 1) are returned.

    Output: TRIPLES key + last_asserted_us + n_values (how many values
    the winner displaced, itself included).
    """
    from pyspark.sql import Window

    t = timeline.filter(~F.col("pred").isin(vocab.RDF_TYPE, vocab.DCT_TITLE))
    tok = F.coalesce(F.col("obj_iri"), F.col("obj_lexical"))
    w = Window.partitionBy("subj", "pred")
    wo = w.orderBy(
        F.col("last_asserted_us").desc_nulls_last(),
        F.col("obj_kind").asc(),
        tok.asc(),
        F.col("obj_datatype").asc_nulls_first(),
    )
    return (
        t.withColumn("_rn", F.row_number().over(wo))
        .withColumn("n_values", F.count(F.lit(1)).over(w).cast("long"))
        .filter((F.col("_rn") == 1) & (F.col("n_values") > 1))
        .select(
            "subj", "pred", "obj_kind", "obj_iri", "obj_lexical", "obj_datatype",
            "last_asserted_us", "n_values",
        )
    )
