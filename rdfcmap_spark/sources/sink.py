"""Partitioned table sink with snapshot manifests (S7/S8 re-architected).

The reference writes one monolithic TTL stream (`prepareOutput:1869-1909`)
or one file per instance (`writeSeparateTurtleFiles:2585-2770`). At 10^12
turns the output is a partitioned table; this module writes parquet with an
Iceberg-style JSON manifest per snapshot:

* ``snapshot_id`` — deterministic content fingerprint (order-insensitive
  xxhash64 sum over the rows), so identical logical output at any
  parallelism produces the same id;
* per-partition row counts (the per-partition lineage/metrics demanded by
  the north rule — on Iceberg these live in the snapshot's manifest files;
  we keep the layout swap-compatible).

On a cluster with an Iceberg catalog the write becomes
``df.writeTo(table).partitionedBy(...)`` and the manifest comes for free;
everything above the sink is unchanged.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


def content_fingerprint(df: DataFrame, cols: list[str] | None = None) -> str:
    """Order-insensitive content hash (sum of per-row xxhash64)."""
    cols = cols or df.columns
    row = df.agg(F.sum(F.xxhash64(*[F.col(c) for c in cols]).cast("decimal(38,0)")).alias("h")).collect()[0]
    return str(row["h"] if row["h"] is not None else 0)


def write_snapshot(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    key_cols: list[str] | None = None,
    extra_meta: dict | None = None,
) -> dict:
    """Write ``df`` as a partitioned parquet snapshot + manifest; returns the
    manifest dict. One extra aggregate pass computes the fingerprint and
    per-partition counts (both order-insensitive)."""
    partition_by = partition_by or []
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)

    spark = df.sparkSession
    written = spark.read.parquet(path)
    if partition_by:
        pc = written.groupBy(*partition_by).count().collect()
        part_counts = {"|".join(str(r[c]) for c in partition_by): r["count"] for r in pc}
    else:
        part_counts = {}
    manifest = {
        "snapshot_id": content_fingerprint(written, key_cols),
        "row_count": written.count(),
        "partition_by": partition_by,
        "partition_counts": dict(sorted(part_counts.items())),
        "schema": written.schema.simpleString(),
        "written_at": time.time(),
        **(extra_meta or {}),
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_snapshot(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    return spark.read.parquet(path), manifest


def snapshot_exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, MANIFEST))
