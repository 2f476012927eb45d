"""Stage 2 — entity linking against the broadcast alias dictionary (J2/J3).

Reference behavior: every label is resolved by case-insensitive exact match
against ``skos:prefLabel`` ∪ ``rdfs:label`` of the vocabulary, preferring
Allotrope namespaces on ambiguity (`RdfUtil.getResourceByLabel:198-539`), and
deprecated terms follow ``dct:isReplacedBy`` (`Cmap2TurtleConverter.java:
997-1015`). The reference re-scans the whole vocabulary model per lookup;
here the dictionary is resolved **once on the driver** (tie-break +
deprecation closure precomputed, J3) and shipped as a broadcast hash join —
no shuffle, no per-row work beyond the hash probe.

Unresolvable labels are not errors: they surface in the
``unresolved_mentions`` metric (reference logs partial hits,
`RdfUtil.java:531-537`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rdfcmap_spark import vocab
from rdfcmap_spark.ids import instance_iri_col


def resolved_alias_rows() -> list[tuple[str, str, str]]:
    """(label_norm, iri, term_kind) — one winner per label.

    Tie-break = (ns_priority, iri) ascending; deprecation redirects applied
    transitively (closure is tiny, computed driver-side).
    """
    by_label: dict[str, list[tuple]] = {}
    iri_rows = {r[0]: r for r in vocab.alias_rows()}
    for r in vocab.alias_rows():
        by_label.setdefault(r[2], []).append(r)
    out = []
    for label, rows in by_label.items():
        rows.sort(key=lambda r: (r[7], r[0]))
        iri, _, _, _, kind, deprecated, replaced_by, _ = rows[0]
        seen = set()
        while deprecated and replaced_by and replaced_by not in seen:
            seen.add(replaced_by)
            iri = replaced_by
            nxt = iri_rows.get(replaced_by)
            if nxt is None:
                break
            _, _, _, _, kind, deprecated, replaced_by, _ = nxt
        out.append((label, iri, kind))
    return sorted(out)


_RESOLVED_SCHEMA = T.StructType(
    [
        T.StructField("label_norm", T.StringType(), False),
        T.StructField("resolved_iri", T.StringType(), False),
        T.StructField("term_kind", T.StringType(), False),
    ]
)


def resolved_alias_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(resolved_alias_rows(), _RESOLVED_SCHEMA)


def link_mentions(mentions: DataFrame, alias: DataFrame) -> DataFrame:
    """mentions(surface_norm, ...) ⟕ broadcast(alias) -> adds resolved_iri,
    term_kind, entity_id.

    ``entity_id`` is the pipeline's instance IRI: named individuals of the
    ontology keep their real IRI (J7, `Cmap2TurtleConverter.
    replaceNamedIndividualsOfOntologies:2319-2372`); everything else gets the
    deterministic ``urn:uuid:uuid5(ent|conv_id|surface_norm)`` (replacing the
    reference's ``UUID.randomUUID()`` at `VisualizationInfoBuilder.java:70`).
    Minting is an inline codegen'd expression — entity identity requires **no
    join and no shuffle**.
    """
    linked = mentions.join(
        F.broadcast(alias), on=mentions.surface_norm == alias.label_norm, how="left"
    ).drop("label_norm")
    minted = instance_iri_col(F.concat_ws("|", F.lit("ent"), F.col("conv_id"), F.col("surface_norm")))
    return linked.withColumn(
        "entity_id",
        F.when(F.col("term_kind") == "individual", F.col("resolved_iri")).otherwise(minted),
    ).withColumn("is_resolved", F.col("resolved_iri").isNotNull())


def build_entities(mentions_linked: DataFrame) -> DataFrame:
    """Distinct entities per (conv_id, surface_norm) with their triple-ready
    attributes. The reference emits one instance per concept node
    (`VisualizationInfoBuilder.java:70-124`); our natural key is the
    normalized surface within a conversation.
    """
    return (
        mentions_linked.filter(F.col("term_kind").isNull() | (F.col("term_kind") != "individual"))
        .groupBy("conv_id", "surface_norm")
        .agg(
            F.first("entity_id").alias("entity_id"),
            F.sort_array(F.collect_set(F.trim(F.col("surface")))).alias("titles"),
            F.first("resolved_iri").alias("canonical_iri"),
            F.first("is_resolved").alias("is_resolved"),
        )
    )


def unresolved_suggestions(misses: DataFrame, alias: DataFrame, k: int = 5) -> DataFrame:
    """Partial-hit suggestion report for unresolved labels — the
    reference's "found possibly matching term" log (`RdfUtil.java:531-537`:
    when the exact lookup misses, terms whose label matches outside the
    preferred namespace are collected and reported). Generalized here to
    the substring family: a dictionary label is a candidate for a missed
    norm when either contains the other.

    ``misses(norm)`` joins the **broadcast** dictionary with the contains
    predicate (a broadcast nested-loop probe — the dictionary is
    driver-resolved and broadcast-sized by the J2 contract, so no shuffle
    and no quadratic blow-up; cost = |misses| x |dict| label scans,
    embarrassingly parallel over the misses). Candidates rank by
    (|len(label) - len(norm)| asc, label asc, iri asc) — closest-length
    first, fully deterministic — truncated to ``k`` per miss by a window
    bounded at the dictionary size.

    Output: (norm, rank, candidate_label, candidate_iri, term_kind).
    """
    from pyspark.sql import Window

    cand = (
        misses.select("norm")
        .distinct()
        .join(
            F.broadcast(alias),
            F.col("label_norm").contains(F.col("norm"))
            | F.col("norm").contains(F.col("label_norm")),
        )
    )
    w = Window.partitionBy("norm").orderBy(
        F.abs(F.length("label_norm") - F.length("norm")).asc(),
        F.col("label_norm").asc(),
        F.col("resolved_iri").asc(),
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "norm",
            "rank",
            F.col("label_norm").alias("candidate_label"),
            F.col("resolved_iri").alias("candidate_iri"),
            "term_kind",
        )
    )
