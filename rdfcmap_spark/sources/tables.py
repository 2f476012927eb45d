"""Parquet table loaders for the driver-provided testdata (TESTDATA.md).

On a real deployment these are Iceberg catalog tables
(``spark.read.table('catalog.db.transcripts')``) — the reads here go through
one function so swapping the source format is a one-line change. Catalyst
pushes filters/column pruning into the scan either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}
