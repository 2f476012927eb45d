"""Distributed connected-components benchmark (the >500k-edge regime).

The flagship pipeline's identity graphs usually sit under the
DRIVER_CC_MAX_EDGES=500k gate where a driver union-find wins; above it the
distributed min-label + pointer-jumping loop (operators/canonicalize.py)
takes over. This benches THAT path on a deterministic synthetic graph big
enough that the gate count alone proves we're on it, with an analytically
known component count:

* chain edges inside blocks of ``B`` nodes  -> N/B components of diameter B
  (exercises pointer-jumping depth: O(log B) rounds);
* a hub star from node 0 to the head of every second block -> merges half
  the blocks into one component (exercises the hot-key skew shape).

expected components = N/B - N/(2B)   (half the blocks merge into block 0's)

Usage: python tools/cc_bench.py [n_nodes] [block] [cpus]
Defaults: 5_000_000 1000 32 (~5M edges). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from pyspark.sql import functions as F

    from rdfcmap_spark.operators.canonicalize import connected_components
    from rdfcmap_spark.session import build_session

    spark = build_session(cpus=cpus, app_name="cc_bench")
    ids = spark.range(n).repartition(2 * cpus)
    chain = ids.filter(F.col("id") % block != block - 1).select(
        F.concat(F.lit("n"), F.col("id")).alias("src"),
        F.concat(F.lit("n"), F.col("id") + 1).alias("dst"),
    )
    heads = spark.range(1, n // block, 2).select(
        F.lit("n0").alias("src"),
        F.concat(F.lit("n"), F.col("id") * block).alias("dst"),
    )
    edges = chain.unionByName(heads).localCheckpoint()
    n_edges = edges.count()
    assert n_edges > 500_000, "must exceed the driver-CC gate"

    t0 = time.perf_counter()
    mapping = connected_components(edges)
    n_components = mapping.select("canonical_id").distinct().count()
    wall = round(time.perf_counter() - t0, 3)

    n_blocks = n // block
    expected = n_blocks - (n_blocks - 1 + 1) // 2  # heads 1,3,5,... merge into n0's
    print(
        json.dumps(
            {
                "mode": "distributed-cc",
                "n_nodes": n,
                "n_edges": n_edges,
                "block_diameter": block,
                "cpus": cpus,
                "seconds": wall,
                "edges_per_sec": round(n_edges / wall, 1),
                "components": n_components,
                "components_expected": expected,
                "correct": n_components == expected,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
