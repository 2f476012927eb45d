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


def _driver_cc(und: DataFrame) -> DataFrame:
    """Union-find fixed point on the collected edge list (min representative
    — identical semantics to the distributed loop, asserted by tests).

    The identity graph (sameAs + shared-identifier stars) is orders of
    magnitude smaller than the triple stream — at 10^12 turns the *triples*
    need a cluster, the *identity edges* usually fit one node. Below the
    threshold the driver fixed point replaces ~10 latency-bound Spark jobs
    per iteration with one collect.
    """
    import pandas as pd

    spark = und.sparkSession
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    # Arrow-batched toPandas (one job, columnar transfer) — row collect()
    # pickles row-by-row and toLocalIterator schedules a job per partition;
    # both anti-scale
    pdf = und.select("src", "dst").toPandas()
    for src, dst in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
        ra, rb = find(src), find(dst)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    out = pd.DataFrame(
        {"entity_id": list(parent.keys()), "canonical_id": [find(n) for n in parent]}
    )
    return spark.createDataFrame(out, "entity_id string, canonical_id string")


#: ~500k edges × 2 string cols ≈ tens of MB pandas on the driver — safely
#: inside a 16g driver heap. (5M was ~10× too brave: multi-GB toPandas plus a
#: Python dict union-find over 10M strings.)
DRIVER_CC_MAX_EDGES = 500_000

#: rewrite_triples broadcasts the canonical mapping only below this row count
#: (~2 short string cols ≈ 100 bytes/row → ~100 MB executor-resident). Above
#: it the hint is dropped and AQE/SMJ decides — a too-big forced broadcast
#: fails the job instead of degrading.
BROADCAST_MAPPING_MAX_ROWS = 1_000_000


def connected_components(
    edges: DataFrame, max_iter: int = 25, driver_threshold: int = DRIVER_CC_MAX_EDGES
) -> DataFrame:
    """edges(src, dst) -> mapping(entity_id, canonical_id).

    Only nodes that appear in an edge are returned (isolated entities are
    their own representative by definition and need no mapping row — keeps
    the rewrite join small).

    Two physical strategies behind one semantic contract:

    * ``n_edges <= driver_threshold`` — collect + union-find on the driver
      (see :func:`_driver_cc`);
    * else — distributed min-label propagation with pointer jumping,
      ``localCheckpoint`` per iteration (lineage truncation), convergence
      detected by an order-insensitive state hash.
    """
    spark = edges.sparkSession
    und = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    und = und.localCheckpoint()
    if driver_threshold and und.count() <= driver_threshold:
        return _driver_cc(und)
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    def state_hash(lbl: DataFrame) -> int:
        # order-insensitive content hash of the full label state — one cheap
        # scan of a checkpointed frame; replaces a join-based changed-count
        # (min-label propagation converges iff the state stops changing)
        row = lbl.agg(F.sum(F.xxhash64("node", "comp").cast("decimal(38,0)")).alias("h")).collect()[0]
        return int(row["h"]) if row["h"] is not None else 0

    prev_hash = state_hash(labels)
    for _ in range(max_iter):
        nbr = (
            und.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        prop = (
            labels.join(nbr, "node", "left")
            .select("node", F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias("comp"))
            .localCheckpoint()  # jump self-joins prop: materialize once
        )
        # pointer jumping: comp <- comp(comp)  (path halving)
        jump = (
            prop.alias("l")
            .join(prop.select(F.col("node").alias("comp"), F.col("comp").alias("comp2")).alias("r"), "comp", "left")
            .select(F.col("node"), F.least(F.col("comp"), F.coalesce(F.col("comp2"), F.col("comp"))).alias("comp"))
        )
        labels = jump.localCheckpoint()
        h = state_hash(labels)
        if h == prev_hash:
            break
        prev_hash = h
    return labels.select(F.col("node").alias("entity_id"), F.col("comp").alias("canonical_id"))


def rewrite_triples(
    triples: DataFrame, mapping: DataFrame, n_mapping: int | None = None
) -> DataFrame:
    """Rewrite subj and obj_iri through the canonical mapping, then enforce
    RDF set semantics (dropDuplicates on the triple key, keeping the min
    provenance — deterministic).

    The mapping (merged entities only) usually sits right at the 10MB
    auto-broadcast threshold, where AQE would fall back to two full
    sort-merge shuffles of the triples table — so we hint ``broadcast`` when
    the mapping is measured small. But the hint is a hard commitment (a
    forced broadcast that no longer fits OOMs executors instead of degrading)
    and identity-merge volume grows with data, so it is **size-gated**: above
    :data:`BROADCAST_MAPPING_MAX_ROWS` the hint is dropped and Catalyst/AQE
    pick the physical join. Pass ``n_mapping`` if the row count is already
    known (the CC loop materializes the mapping) to skip the extra count job.

    Both joins probe the SAME broadcast subplan (only the join condition
    differs) so ReuseExchange builds it once, halving driver-serial
    broadcast-build time.
    """
    if n_mapping is None:
        # mapping comes out of connected_components checkpointed/materialized
        # — one cheap count job over a tiny frame
        n_mapping = mapping.count()
    m = F.broadcast(mapping) if n_mapping <= BROADCAST_MAPPING_MAX_ROWS else mapping
    ms, mo = m.alias("ms"), m.alias("mo")
    out = (
        triples.join(ms, F.col("subj") == F.col("ms.entity_id"), "left")
        .withColumn("subj_canon", F.col("ms.canonical_id"))
        .drop("entity_id", "canonical_id")
        .join(mo, F.col("obj_iri") == F.col("mo.entity_id"), "left")
        .withColumn("obj_canon", F.col("mo.canonical_id"))
        .drop("entity_id", "canonical_id")
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
