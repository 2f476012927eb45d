"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

At 100 TB, image/audio/video ride along as binary columns with a metadata
struct; decode / feature-extraction runs as Arrow-batched ``mapInPandas``
(one Python process per partition, columnar transfer, never row-at-a-time).

The actual decoders (PIL / librosa / av) are **not in this container**, so
:func:`extract_features` computes a clearly-marked deterministic fake
(length/checksum-derived dims) unless ``real_decode=True``, which raises
``NotImplementedError`` at the exact seam where the real library call goes.
The Spark-side plumbing — schema, binary handling, batch shape, partition
behavior — is real and tested (tests/test_training_ops.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def ingest_media(docs: DataFrame) -> DataFrame:
    """documents -> media table: payload = utf-8 bytes of ``text`` standing
    in for an encoded image; metadata computed JVM-side (md5 / length on the
    binary — no Python)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for the real decoder. Replace body with e.g.
    ``PIL.Image.open(io.BytesIO(payload)).size`` on a cluster with codecs.

    All three dims derive from the byte *length* only — a content-byte peek
    (payload[0]) and the oracle's codepoint peek (ascii(substr(...))) diverge
    on non-ASCII-leading payloads, so both engines use the same quantity by
    construction."""
    n = len(payload)
    return n % 640, n % 480, 1 + n % 16


def extract_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` receives column-pruned batches (only doc_id/payload/
    n_bytes/checksum reach Python — verify with .explain ReadSchema); output
    schema is fixed so downstream stays columnar.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real image/audio decode needs PIL/librosa — not in this container; "
                    "plug the decoder into _fake_decode"
                )
            dims = [_fake_decode(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "checksum": pdf["checksum"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return media.select("doc_id", "payload", "n_bytes", "checksum").mapInPandas(run, FEATURES)


def media_features(docs: DataFrame) -> DataFrame:
    """ingest + extract, ordered columns for the oracle compare."""
    return extract_features(ingest_media(docs)).select(
        "doc_id", "n_bytes", "checksum", "width", "height", "n_frames"
    )
