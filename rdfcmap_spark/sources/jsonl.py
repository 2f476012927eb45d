"""JSONL transcripts source/sink — the wire format conversation logs
actually arrive in (one JSON object per line, append-friendly, the
standard for agent-trace capture), feeding the same TRANSCRIPTS-shaped
table every operator consumes.

No reference counterpart (rdfcmap reads single CXL files); this is the
ingest seam a 10^12-turn pipeline needs: schema-enforced distributed read
with malformed-line QUARANTINE (bad lines are data, not exceptions — the
same disposition as the X12 literal quarantine), and a distributed write
whose timestamp format round-trips bit-exactly through both Spark and the
DuckDB oracle (zone-free ``yyyy-MM-dd HH:mm:ss.SSSSSS``; the session runs
UTC).

Scale posture: both directions are pure per-partition text transforms —
zero shuffles, no Python; the reader is one JsonScan with the schema
pushed down (no sampling pass over the corpus, which Spark's schema
inference would otherwise do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rdfcmap_spark.schemas import TRANSCRIPTS

#: zone-free microsecond format, identical lexical form in Spark and DuckDB
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

#: reader-side schema: TRANSCRIPTS + the corrupt-record capture column
_READ_SCHEMA = T.StructType(
    [*TRANSCRIPTS.fields, T.StructField("_corrupt", T.StringType(), True)]
)


def write_transcripts_jsonl(turns: DataFrame, path: str) -> None:
    """Distributed JSONL write of a TRANSCRIPTS-shaped frame."""
    turns.select(*[f.name for f in TRANSCRIPTS.fields]).write.mode("overwrite").option(
        "timestampFormat", TS_FMT
    ).json(path)


def read_transcripts_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """TRANSCRIPTS columns + ``_corrupt`` (the raw line when the record
    failed to parse, else NULL). PERMISSIVE mode: a malformed line yields
    one quarantine row instead of failing the scan — split with
    :func:`split_quarantine`."""
    return (
        spark.read.schema(_READ_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("timestampFormat", TS_FMT)
        .json(path)
    )


def split_quarantine(raw: DataFrame, materialize: bool = True) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined): good rows carry the TRANSCRIPTS columns;
    quarantined rows carry the offending raw line.

    ``materialize`` (default) localCheckpoints the parsed batch first —
    Spark's documented contract for reading the corrupt-record column
    (a query whose required schema is ONLY ``_corrupt`` is disallowed
    straight off the JsonScan, UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    RECORD_COLUMN). At corpus scale this matches the real ingest shape
    anyway: parse once, then write the good table and the quarantine side
    table from the same materialized pass. Pass ``materialize=False`` only
    when the quarantine frame will not be consumed on its own."""
    if materialize:
        raw = raw.localCheckpoint()
    good = raw.filter(F.col("_corrupt").isNull()).select(
        *[f.name for f in TRANSCRIPTS.fields]
    )
    bad = raw.filter(F.col("_corrupt").isNotNull()).select(
        F.col("_corrupt").alias("raw_line")
    )
    return good, bad


def read_transcripts_jsonl_stream(spark: SparkSession, path: str) -> DataFrame:
    """Structured Streaming twin of :func:`read_transcripts_jsonl` — the
    continuous-ingest path for JSONL conversation logs (same pushed
    schema, corrupt-record capture and timestamp format; new files picked
    up incrementally). Composes with the streaming triple emission and
    watermarked dedup in :mod:`rdfcmap_spark.streaming.stream` exactly as
    the parquet stream does — the reader is the only streaming-specific
    piece."""
    return (
        spark.readStream.schema(_READ_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("timestampFormat", TS_FMT)
        .json(path)
    )
