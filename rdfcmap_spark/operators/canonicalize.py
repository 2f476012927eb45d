"""Stage 4 — canonicalization via connected components (SURVEY.md G1).

The reference determines instance-graph membership with a recursive DFS and a
visited set (`Turtle2CmapConverter.collectNodeIds:781-875`,
`isBlankNodeWithConnectionToInstanceGraph:936-989`) — single-threaded,
stack-bound. Here the same fixed point is computed as **iterative frontier
joins**: min-label propagation with a pointer-jumping step (path halving), so
convergence is O(log diameter) rounds instead of O(diameter).

Identity edges come from two places (north_star canonicalization semantics):

* explicit ``owl:sameAs`` relations extracted from text;
* shared ``dct:identifier`` literal values across conversations — grouped by
  value, emitted as a star around the min entity, which keeps a hot
  identifier (the skew fixture) a *map-side partial-aggregate*, never a
  pairwise self-join blowup (a value shared by k entities yields k-1 edges,
  not k² pairs).

Each iteration ``localCheckpoint()``s to truncate lineage (SURVEY.md §4
iteration row); convergence is checked on the count of changed labels.
The representative is the lexicographic min entity id — deterministic at any
parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfcmap_spark.schemas import TRIPLES


def identity_edges(sameas: DataFrame, idents: DataFrame) -> DataFrame:
    """sameas(a, b) ∪ star(idents(entity_id, value)) -> edges(src, dst)."""
    hub = idents.groupBy("value").agg(F.min("entity_id").alias("hub"))
    star = (
        idents.join(hub, "value")
        .filter(F.col("entity_id") != F.col("hub"))
        .select(F.col("hub").alias("src"), F.col("entity_id").alias("dst"))
    )
    return sameas.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(star)


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """edges(src, dst) -> mapping(entity_id, canonical_id).

    Only nodes that appear in an edge are returned (isolated entities are
    their own representative by definition and need no mapping row — keeps
    the rewrite join small).
    """
    spark = edges.sparkSession
    und = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    und = und.localCheckpoint()
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = (
            und.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        prop = (
            labels.join(nbr, "node", "left")
            .select("node", F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias("comp"))
        )
        # pointer jumping: comp <- comp(comp)  (path halving)
        jump = (
            prop.alias("l")
            .join(prop.select(F.col("node").alias("comp"), F.col("comp").alias("comp2")).alias("r"), "comp", "left")
            .select(F.col("node"), F.least(F.col("comp"), F.coalesce(F.col("comp2"), F.col("comp"))).alias("comp"))
        )
        new_labels = jump.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("entity_id"), F.col("comp").alias("canonical_id"))


def rewrite_triples(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subj and obj_iri through the canonical mapping, then enforce
    RDF set semantics (dropDuplicates on the triple key, keeping the min
    provenance — deterministic).

    Two shuffle joins on (subj) and (obj_iri); the mapping side is usually
    far smaller than the triples side (only merged entities), so AQE
    broadcast-converts it when it fits.
    """
    m_subj = mapping.withColumnRenamed("entity_id", "subj").withColumnRenamed("canonical_id", "subj_canon")
    m_obj = mapping.withColumnRenamed("entity_id", "obj_iri").withColumnRenamed("canonical_id", "obj_canon")
    out = (
        triples.join(m_subj, "subj", "left")
        .join(m_obj, "obj_iri", "left")
        .select(
            F.coalesce("subj_canon", "subj").alias("subj"),
            "pred",
            "obj_kind",
            F.coalesce("obj_canon", "obj_iri").alias("obj_iri"),
            "obj_lexical",
            "obj_datatype",
            "conv_id",
            "turn_idx",
        )
    )
    key = ["subj", "pred", "obj_kind", "obj_iri", "obj_lexical", "obj_datatype"]
    return (
        out.groupBy(*[F.col(c) for c in key])
        .agg(F.min(F.struct("conv_id", "turn_idx")).alias("_prov"))
        .select(*key, F.col("_prov.conv_id").alias("conv_id"), F.col("_prov.turn_idx").alias("turn_idx"))
        .select(*[f.name for f in TRIPLES.fields])
    )
