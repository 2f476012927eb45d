"""Large-input (sf>=1 equivalent) timing for the dedup / ANN / text family.

VERDICT r2 item 8: the dedup and similarity queries had only been timed at
sf0.1 (5k documents, 2k embeddings). This runs them end-to-end against the
K-fold deterministic expansion written by tools/scale_docs.py (replica
modes: exact dup / near dup / distinct background — realistic duplicate
density instead of K-1 exact twins per doc). Consumption matches bench.py:
a single count+xxhash aggregate, full computation, no driver collect.

Usage: python tools/bigscale_bench.py [K] [cpus]
Defaults: K=100 (500k docs / 200k embeddings ~ sf10), cpus=32.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from rdfcmap_spark.session import build_session  # noqa: E402
from scale_docs import scale  # noqa: E402

#: queries whose inputs are documents/embeddings only
QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_lsh_verified",
    "dedup_dup_groups",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_simhash_groups",
    # embedding near-dup at scale goes through the hyperplane-LSH path;
    # dedup_embedding_cosine (exact, label-blocked) is quadratic in
    # corpus/n_labels by design and is bench-gated to small corpora
    "dedup_embedding_lsh",
    "dedup_embedding_groups",
    "sim_topk_bruteforce",
    "sim_topk_ivf",
    "sim_topk_bucketed",
    "text_quality",
    "text_langid",
    "text_token_stats",
    "text_fingerprint",
    "text_lm_score",
    "text_lm_bigram",
    "text_tfidf_keywords",
    "sim_topk_pq",
    "sim_topk_pq_refined",
    "sim_topk_ivfpq",
    "sim_ann_recall_sampled",
    "data_mixture_weights",
]


def consume(df) -> int:
    hashables = [
        c
        for c in df.columns
        if not str(df.schema[c].dataType).startswith(("ArrayType", "Array"))
    ][:4]
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0): summing 10^5-10^7 xxhash64 longs overflows bigint
        # under ANSI (same treatment as bench.py's consume)
        *[F.sum(F.xxhash64(c).cast("decimal(38,0)")).alias(f"h_{c}") for c in hashables],
    ).collect()[0]
    return row["n"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    # optional query subset (argv[3:]) so long-running families can be
    # timed in separate processes/batches
    subset = sys.argv[3:] or QUERIES
    dst = f"/tmp/sfbig_K{k}"
    spark = build_session(cpus=cpus, app_name=f"bigscale_K{k}")
    if not os.path.exists(os.path.join(dst, "documents.parquet")):
        scale(spark, k, "/root/testdata/sf0.1", dst)
    qs = entrymod.queries()
    out: dict[str, float] = {}
    rows: dict[str, int] = {}
    t_all = time.perf_counter()
    for name in subset:
        t0 = time.perf_counter()
        rows[name] = consume(qs[name](spark, dst))
        out[name] = round(time.perf_counter() - t0, 3)
        print(f"{name}: {out[name]} s, {rows[name]} rows", file=sys.stderr)
    print(
        json.dumps(
            {
                "mode": "bigscale",
                "k": k,
                "docs": 5000 * k,
                "embeddings": 2000 * k,
                "cpus": cpus,
                "queries": out,
                "rows": rows,
                "total_seconds": round(time.perf_counter() - t_all, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
