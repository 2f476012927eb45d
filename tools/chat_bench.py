"""Large-input timing for the conversation-level transcripts family.

The driver bench's chat_* entries run over the small oracle fixture
(correctness-scale); this times the same operators end-to-end on a
bench-scale synthetic transcript table (default 256k conversations x 8
turns = 2M turns, the flagship pipeline's own bigscale input size).
Consumption matches bench.py: one count+xxhash aggregate per query, full
computation, no driver collect. Input generation is excluded from the
timed window (localCheckpoint up front, standing in for an Iceberg scan).

Usage: python tools/chat_bench.py [n_convs] [cpus] [query ...]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from rdfcmap_spark.operators import transcripts as T  # noqa: E402
from rdfcmap_spark.session import build_session  # noqa: E402
from rdfcmap_spark.synth import transcripts_df  # noqa: E402

QUERIES = {
    "chat_render": T.chat_render,
    "chat_sft_pairs": lambda df: T.sft_pairs(df, k=4),
    "chat_role_check": T.role_check,
    "chat_conv_stats": T.conv_stats,
    "chat_tool_transitions": T.tool_transitions,
    "chat_truncate_budget": lambda df: T.truncate_to_budget(df, budget=48),
    "chat_quality": T.conv_quality,
    "chat_dup_groups": T.conv_dup_groups,
    "chat_entity_pmi": T.entity_pmi,
    "chat_entity_timeline": T.entity_timeline,
    "chat_pronoun_coref": T.pronoun_antecedents,
    "kg_triple_support": None,  # resolved lazily (plans import)
}


def _triple_support(df):
    from rdfcmap_spark.plans.pipeline import triple_support

    return triple_support(df)


def consume(df) -> int:
    cols = [
        c
        for c in df.columns
        if not str(df.schema[c].dataType).startswith(("ArrayType", "Array"))
    ][:4]
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.xxhash64(c).cast("decimal(38,0)")).alias(f"h_{c}") for c in cols],
    ).collect()[0]
    return row["n"]


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 256_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    subset = sys.argv[3:] or list(QUERIES)
    spark = build_session(cpus=cpus, app_name=f"chat_bench_{n_convs}")
    parts = 2 * spark.sparkContext.defaultParallelism
    turns = transcripts_df(
        spark, n_convs=n_convs, turns_per_conv=8, partitions=parts
    ).localCheckpoint()
    n_turns = turns.count()
    out: dict[str, float] = {}
    rows: dict[str, int] = {}
    t_all = time.perf_counter()
    for name in subset:
        fn = QUERIES[name] or _triple_support
        t0 = time.perf_counter()
        rows[name] = consume(fn(turns))
        out[name] = round(time.perf_counter() - t0, 3)
        print(f"{name}: {out[name]} s, {rows[name]} rows", file=sys.stderr)
    print(
        json.dumps(
            {
                "mode": "chat_bigscale",
                "n_convs": n_convs,
                "n_turns": n_turns,
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
