"""SparkSession factory tuned for the KG-construction pipeline.

Local-mode settings mirror what we would set on a real cluster:
AQE on (runtime re-plan + skew-join splitting), Arrow on (every UDF in this
repo is a pandas/Arrow UDF — no per-row Python), shuffle partitions sized to
cores (on a 1000-executor cluster this would be ~2-3x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    cpus: int | None = None,
    app_name: str = "rdfcmap_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # 4x cores: memory-heavy hash aggregations (the 15M-key triple
        # dedup) spill with one fat partition per core (measured 54s -> 35s
        # at 8 cores); AQE coalescePartitions shrinks small stages back, so
        # the higher initial count costs nothing elsewhere
        shuffle_partitions = max(4 * cpus, 16)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # 16g default: measured on this box, >24g heaps produce erratic
        # 2-3x wall-time swings (kernel page-fault storms, 86% system time);
        # 12-16g is flat run-to-run and ample for local-mode state
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # ParallelGC: measured 3.2x faster than default G1 at local[32] on
        # the string/regex-heavy pipeline (G1 concurrent phases thrash
        # against 32 mutator threads; throughput GC fits a batch engine)
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_DRIVER_JAVA_OPTIONS", "-XX:+UseParallelGC"),
        )
        # deterministic-output requirement (SURVEY.md §4 determinism row):
        # never let partial-aggregation push nondeterminism into floats we hash
        .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
        # collect_set/collect_list aggregates (entity titles, LSH band keys,
        # per-subject assembly) run in ObjectHashAggregate, which falls back
        # to SORT-based after only 128 distinct keys per partition by
        # default — our aggs have 10^4-10^6 small-buffer groups, so raise
        # the fallback so they stay hash-based (buffers are tiny title/hash
        # sets, not unbounded)
        .config(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            os.environ.get("SPARK_GRAFT_OBJHASH_FALLBACK", "1000000"),
        )
    )
    # Off-heap Tungsten memory: the set-semantics aggregate + shuffle of the
    # triple stream allocates GB-scale page arrays; on-heap they promote to
    # old gen and ParallelGC full-pauses stop ALL task threads — measured as
    # the 8->32 scaling killer (stage probe: GC seconds > CPU seconds at
    # local[32]). Off-heap pages never touch the collector. Size via
    # SPARK_GRAFT_OFFHEAP_GB (0 disables).
    offheap_gb = os.environ.get("SPARK_GRAFT_OFFHEAP_GB", "8")
    if offheap_gb and offheap_gb != "0":
        builder = builder.config("spark.memory.offHeap.enabled", "true").config(
            "spark.memory.offHeap.size", f"{offheap_gb}g"
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
