"""Deterministically scale the driver's documents/embeddings tables for the
large-input bench (BENCH.md sf>=1 section).

The driver testdata tops out at sf0.1 (5,000 documents / 2,000 embeddings).
To measure the dedup/ANN family at a scale where partitioning actually
matters, this tool expands those tables K-fold into /tmp, deterministically
(pure column expressions keyed on (doc_id, replica) — same output at any
parallelism):

* replica 0 keeps every row verbatim;
* 1/8 of replicas are EXACT duplicates (same text, new doc_id) — exercises
  exact dedup;
* 3/8 are near-duplicates (deterministic token edit: one vocabulary word
  appended, position keyed by hash) — exercises MinHash/SimHash recall;
* 4/8 are distinct documents (replica index woven into the text every ~7
  tokens) — background corpus.

Embeddings are replicated with a deterministic per-replica offset on one
vector component (keeps near-neighbor structure without collapsing all
replicas onto one point).

Other tables are symlinked from the source sf dir so every bench query
resolves. Usage:

    python tools/scale_docs.py [K] [src_sf_dir] [dst_dir]

defaults: K=100, src=/root/testdata/sf0.1, dst=/tmp/sfbig
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def scale(spark, k: int, src: str, dst: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    reps = spark.range(k).select(F.col("id").cast("int").alias("replica"))
    h = F.xxhash64("doc_id", "replica")
    mode = F.when(F.col("replica") == 0, F.lit("orig")).otherwise(
        F.when(F.pmod(h, F.lit(8)) < 1, F.lit("exact"))
        .when(F.pmod(h, F.lit(8)) < 4, F.lit("near"))
        .otherwise(F.lit("distinct"))
    )
    word = F.concat(F.lit("replica"), F.pmod(h, F.lit(997)).cast("string"))
    scaled_docs = (
        docs.crossJoin(reps)
        .withColumn("mode", mode)
        .select(
            # keep ids numeric (the production schema): replica r of doc d
            # becomes d*K + r — bijective and deterministic
            (F.col("doc_id") * k + F.col("replica")).alias("doc_id"),
            F.when(F.col("mode").isin("orig", "exact"), F.col("text"))
            .when(F.col("mode") == "near", F.concat_ws(" ", "text", word))
            .otherwise(
                # distinct: weave the replica word in every ~7 tokens so
                # shingles diverge, not just the tail
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t, i: F.when(
                            F.pmod(i, F.lit(7)) == 0, F.concat_ws(" ", word, t)
                        ).otherwise(t),
                    ),
                    " ",
                )
            )
            .alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text"))
    )
    scaled_docs.repartition(64).write.mode("overwrite").parquet(
        os.path.join(dst, "documents.parquet")
    )

    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    eh = F.xxhash64("vec_id", "replica")
    scaled_emb = (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") * k + F.col("replica")).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda v, i: F.when(
                    i == F.pmod(eh, F.lit(16)).cast("int"),
                    v + (F.pmod(eh, F.lit(1000)).cast("float") / 1000.0 - 0.5) * 0.1,
                ).otherwise(v),
            ).alias("embedding"),
            "label",
        )
    )
    scaled_emb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "embeddings.parquet")
    )

    for t in (
        "region nation customer supplier part orders lineitem events".split()
    ):
        link = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(src, f"{t}.parquet"), link)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfbig"
    from rdfcmap_spark.session import build_session

    spark = build_session(app_name="scale_docs")
    scale(spark, k, src, dst)
    n = spark.read.parquet(os.path.join(dst, "documents.parquet")).count()
    e = spark.read.parquet(os.path.join(dst, "embeddings.parquet")).count()
    print(f"wrote {dst}: {n} documents, {e} embeddings (K={k})")
    spark.stop()


if __name__ == "__main__":
    main()
