"""MinHash LSH bucket-size audit (PLAN item: banding at 10^8+ docs).

The LSH self-join's cost is sum(bucket_size^2) over (band, band_key)
buckets — linear in the corpus only while buckets stay small. Two things
can break that at web scale:

* **exact-dup cliques**: K byte-identical docs share every band, so one
  boilerplate template of multiplicity K contributes a K-sized bucket in
  all 4 bands -> 2*K^2 candidate pairs. This is a DATA property, not a
  banding-parameter property — no band width fixes it. The fix is
  dedup.dup_groups' exact-collapse-first design (LSH sees one
  representative per distinct text).
* **band-key skew** among distinct texts: would indicate the hash space
  is too coarse (the r2 SimHash 8-bit-band bug). The md5 band_key space
  is 2^128, so any residual skew is true near-dup mass.

This tool measures both on the scale_docs corpus: bucket-size quantiles +
max, and sum(c^2) candidate mass, for (a) raw docs and (b) exact-collapsed
representatives. Prints one JSON line; BENCH.md records the result.

Usage: python tools/bucket_audit.py [K] [cpus]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from pyspark.sql import functions as F  # noqa: E402

from rdfcmap_spark.operators import dedup  # noqa: E402
from rdfcmap_spark.session import build_session  # noqa: E402
from scale_docs import scale  # noqa: E402


def bucket_stats(docs) -> dict:
    sizes = (
        dedup.lsh_band_keys(docs)
        .groupBy("band", "band_key")
        .agg(F.count("*").alias("c"))
    )
    row = sizes.agg(
        F.count("*").alias("n_buckets"),
        F.max("c").alias("max"),
        F.expr("percentile_approx(c, array(0.5, 0.99, 0.999), 10000)").alias("q"),
        F.sum(F.col("c") * F.col("c")).cast("decimal(38,0)").alias("sum_c2"),
        F.sum("c").alias("rows"),
    ).collect()[0]
    return {
        "n_buckets": row["n_buckets"],
        "p50": float(row["q"][0]),
        "p99": float(row["q"][1]),
        "p999": float(row["q"][2]),
        "max": row["max"],
        "sum_c2_pair_mass": int(row["sum_c2"]),
        "band_rows": row["rows"],
    }


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    dst = f"/tmp/sfbig_K{k}"
    spark = build_session(cpus=cpus, app_name=f"bucket_audit_K{k}")
    if not os.path.exists(os.path.join(dst, "documents.parquet")):
        scale(spark, k, "/root/testdata/sf0.1", dst)
    docs = spark.read.parquet(os.path.join(dst, "documents.parquet"))

    raw = bucket_stats(docs)

    groups = docs.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("doc_id"))
    reps = docs.join(groups.select("doc_id"), "doc_id")
    collapsed = bucket_stats(reps)

    print(
        json.dumps(
            {
                "mode": "bucket_audit",
                "k": k,
                "docs": docs.count(),
                "reps": reps.count(),
                "raw": raw,
                "exact_collapsed": collapsed,
                "pair_mass_ratio": round(
                    raw["sum_c2_pair_mass"] / max(1, collapsed["sum_c2_pair_mass"]), 3
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
