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
