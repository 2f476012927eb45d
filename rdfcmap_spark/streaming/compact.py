"""Continuous-ingest compaction: streaming landing zone -> canonical KG.

The lambda split for KG construction at 10^12-turn scale (SURVEY §2.9 +
north rule resumability):

* the **stream** lands three append-only parquet zones per microbatch, all
  stateless (no streaming state store anywhere): raw triples
  (:func:`rdfcmap_spark.streaming.stream.streaming_triples`) and the two
  identity-observation streams (sameAs pairs, identifier values);
* a **periodic batch compaction** folds the landing zone into the canonical
  snapshot: union with the previous compacted triples, connected components
  over ALL identity observations seen so far, canonical rewrite + RDF set
  semantics, written as a manifest snapshot (`sources/sink.py` — the same
  per-partition lineage the staged pipeline records).

Compaction is **idempotent and convergent**: every ID is deterministic and
the rewrite is a pure function of (observed triples, observed identity
edges), so compacting twice — or compacting after the stream re-delivered a
turn — produces byte-identical snapshots, and the final snapshot equals the
batch pipeline run over the same transcripts (asserted by tests).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdfcmap_spark.operators import canonicalize
from rdfcmap_spark.schemas import TRIPLES
from rdfcmap_spark.sources import sink
from rdfcmap_spark.streaming.stream import (
    streaming_identity_observations,
    streaming_triples,
)

RAW_DIR = "raw_triples"
SAMEAS_DIR = "sameas"
IDENTS_DIR = "idents"
SNAPSHOT_DIR = "compacted"


def start_landing(transcripts_stream: DataFrame, workdir: str, watermark: str = "1 hour"):
    """Start the three landing writers; returns the StreamingQuery handles.

    Each writer has its own checkpointLocation, so a restarted job resumes
    exactly-once from the source offsets (file-source + parquet sink).
    """
    queries = []
    triples = streaming_triples(transcripts_stream, watermark)
    queries.append(
        triples.writeStream.format("parquet")
        .option("path", os.path.join(workdir, RAW_DIR))
        .option("checkpointLocation", os.path.join(workdir, "_ckpt_raw"))
        .outputMode("append")
        .start()
    )
    sameas, idents = streaming_identity_observations(transcripts_stream, watermark)
    queries.append(
        sameas.writeStream.format("parquet")
        .option("path", os.path.join(workdir, SAMEAS_DIR))
        .option("checkpointLocation", os.path.join(workdir, "_ckpt_sameas"))
        .outputMode("append")
        .start()
    )
    queries.append(
        idents.writeStream.format("parquet")
        .option("path", os.path.join(workdir, IDENTS_DIR))
        .option("checkpointLocation", os.path.join(workdir, "_ckpt_idents"))
        .outputMode("append")
        .start()
    )
    return queries


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], schema)


_TRIPLES_DDL = (
    "subj string, pred string, obj_kind string, obj_iri string, "
    "obj_lexical string, obj_datatype string, conv_id string, turn_idx int"
)


def compact(spark: SparkSession, workdir: str) -> DataFrame:
    """One compaction cycle: landing zone (+ previous snapshot) ->
    canonical triples snapshot with manifest. Returns the compacted frame.

    Idempotent: the rewrite maps canonical ids to themselves and the set
    aggregate is stable, so re-compacting without new landings rewrites the
    same snapshot (same deterministic snapshot_id).
    """
    raw = _read_or_empty(spark, os.path.join(workdir, RAW_DIR), _TRIPLES_DDL)
    prev_path = os.path.join(workdir, SNAPSHOT_DIR)
    if sink.snapshot_exists(prev_path):
        prev, _ = sink.read_snapshot(spark, prev_path)
        raw = raw.select(*[f.name for f in TRIPLES.fields]).unionByName(
            prev.select(*[f.name for f in TRIPLES.fields])
        )
    sameas = _read_or_empty(spark, os.path.join(workdir, SAMEAS_DIR), "a string, b string")
    idents = _read_or_empty(
        spark, os.path.join(workdir, IDENTS_DIR), "entity_id string, value string"
    )
    edges = canonicalize.identity_edges(sameas, idents)
    mapping, n_mapping = canonicalize.connected_components_with_count(edges)
    compacted = canonicalize.rewrite_triples(raw, mapping, n_mapping=n_mapping).withColumn(
        "pred_bucket", F.pmod(F.xxhash64("pred"), F.lit(16))
    )
    # materialize BEFORE the overwrite: the plan still reads the previous
    # snapshot's files, which mode("overwrite") is about to delete
    compacted = compacted.localCheckpoint()
    sink.write_snapshot(
        compacted, prev_path, partition_by=["pred_bucket"], extra_meta={"stage": "compact"}
    )
    df, _ = sink.read_snapshot(spark, prev_path)
    return df.drop("pred_bucket")


# ---------------------------------------------------------------------------
# incremental compaction: per-cycle cost tracks the DELTA, not history


MAPPING_DIR = "mapping"
HUBS_DIR = "value_hubs"
STATE_FILE = "_compact_state.json"


def _zone_files(df: DataFrame) -> DataFrame:
    """The zone's rows tagged with their source file — Spark resolves the
    file set through the streaming sink's ``_spark_metadata`` commit log, so
    in-flight uncommitted part files are never observed. (On Iceberg this
    cycle diff would come from snapshot ids instead of file names.)"""
    return df.withColumn("_file", F.input_file_name())


def compact_incremental(spark: SparkSession, workdir: str) -> DataFrame:
    """One incremental compaction cycle: fold ONLY the landing files that
    arrived since the previous cycle.

    Versus :func:`compact` (which re-runs connected components over every
    identity observation ever landed), the per-cycle graph work here is
    bounded by the DELTA:

    * new ``sameAs`` rows become edges directly;
    * new identifier observations join a persisted ``value -> hub`` side
      table (one row per distinct identifier value): a known value yields
      one (entity, hub) edge; unseen values form their own min-entity
      stars. Hub choice only shapes edges — the component representative
      is re-derived as the component min by the merge, so a later entity
      with a smaller id still wins (tested);
    * the delta edges fold into the persisted mapping via
      :func:`canonicalize.merge_mapping` — CC over the batch only.

    The triple rewrite still runs over snapshot ∪ new raw triples (a merge
    may rewrite ANY historical triple's endpoints, and RDF set semantics is
    global); that pass is one broadcast-probe + one hash aggregate, no
    iteration. Contract, pinned by tests: the snapshot (content fingerprint
    included) is byte-identical to a full :func:`compact` over the same
    landing zone, for any batch split.
    """
    import json

    state_path = os.path.join(workdir, STATE_FILE)
    state: dict = {"processed": {}}
    if os.path.exists(state_path):
        with open(state_path) as fh:
            state = json.load(fh)
    processed: dict[str, list[str]] = state["processed"]

    def new_rows(zone: str, schema: str) -> tuple[DataFrame, list[str]]:
        df = _zone_files(_read_or_empty(spark, os.path.join(workdir, zone), schema))
        seen = set(processed.get(zone, []))
        if seen:
            df = df.filter(~F.col("_file").isin(sorted(seen)))
        df = df.localCheckpoint()  # pin the file set for this cycle
        files = [r["_file"] for r in df.select("_file").distinct().collect()]
        return df.drop("_file"), sorted(seen | set(files))

    raw_new, raw_files = new_rows(RAW_DIR, _TRIPLES_DDL)
    sameas_new, sameas_files = new_rows(SAMEAS_DIR, "a string, b string")
    idents_new, idents_files = new_rows(IDENTS_DIR, "entity_id string, value string")

    map_path = os.path.join(workdir, MAPPING_DIR)
    hubs_path = os.path.join(workdir, HUBS_DIR)
    have_state = os.path.exists(os.path.join(map_path, "_SUCCESS"))
    old_mapping = (
        spark.read.parquet(map_path)
        if have_state
        else spark.createDataFrame([], "entity_id string, canonical_id string")
    )
    old_hubs = (
        spark.read.parquet(hubs_path)
        if os.path.exists(os.path.join(hubs_path, "_SUCCESS"))
        else spark.createDataFrame([], "value string, hub string")
    )

    # identifier delta -> edges: known values link to their persisted hub;
    # unseen values form min-entity stars among this batch's observations
    with_hub = idents_new.join(old_hubs, "value", "left")
    known = with_hub.filter(F.col("hub").isNotNull())
    unseen = with_hub.filter(F.col("hub").isNull()).drop("hub")
    new_hubs = unseen.groupBy("value").agg(F.min("entity_id").alias("hub"))
    star_new = (
        unseen.join(new_hubs, "value")
        .filter(F.col("entity_id") != F.col("hub"))
        .select(F.col("hub").alias("src"), F.col("entity_id").alias("dst"))
    )
    edges = (
        sameas_new.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            known.filter(F.col("entity_id") != F.col("hub")).select(
                F.col("hub").alias("src"), F.col("entity_id").alias("dst")
            )
        )
        .unionByName(star_new)
    )
    mapping = canonicalize.merge_mapping(old_mapping, edges).localCheckpoint()
    n_mapping = mapping.count()
    hubs = old_hubs.unionByName(new_hubs).localCheckpoint()

    # rewrite: previous snapshot ∪ new raw triples through the merged
    # mapping (old canonicals are mapping entities, so already-rewritten
    # historical triples re-point correctly when their component merged)
    prev_path = os.path.join(workdir, SNAPSHOT_DIR)
    raw = raw_new.select(*[f.name for f in TRIPLES.fields])
    if sink.snapshot_exists(prev_path):
        prev, _ = sink.read_snapshot(spark, prev_path)
        raw = raw.unionByName(prev.select(*[f.name for f in TRIPLES.fields]))
    compacted = canonicalize.rewrite_triples(raw, mapping, n_mapping=n_mapping).withColumn(
        "pred_bucket", F.pmod(F.xxhash64("pred"), F.lit(16))
    )
    compacted = compacted.localCheckpoint()  # plan reads files the overwrite deletes
    sink.write_snapshot(
        compacted, prev_path, partition_by=["pred_bucket"],
        extra_meta={"stage": "compact_incremental"},
    )
    mapping.write.mode("overwrite").parquet(map_path)
    hubs.write.mode("overwrite").parquet(hubs_path)
    state["processed"] = {
        RAW_DIR: raw_files, SAMEAS_DIR: sameas_files, IDENTS_DIR: idents_files
    }
    tmp = state_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, state_path)  # atomic: a crashed cycle re-folds, never skips
    df, _ = sink.read_snapshot(spark, prev_path)
    return df.drop("pred_bucket")
