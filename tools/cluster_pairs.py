"""Real multi-executor N vs 4N scaling via Spark local-cluster mode.

``local[n]`` is a single JVM; a real cluster is many executor JVMs with RPC
shuffle between them. Spark's ``local-cluster[numWorkers,coresPerWorker,
memPerWorkerMB]`` master launches genuine Worker + Executor JVM processes —
the closest a one-box sandbox gets to ``spark-submit`` against standalone
clusters of two sizes. This harness runs the flagship pipeline on

    N executors  x c cores   (small cluster)   vs
    4N executors x c cores   (big cluster)

with weak-scaling inputs (the big cluster owns 4x the conversations) and
per-executor-constant memory (a real 4N cluster brings 4x total memory),
alternating the levels round by round so each pair shares one host-drift
window (see tools/ab_pairs.py for why).

Efficiency here is still bounded by the measured host ceiling — all
executor JVMs share this VM's memory channels, unlike a real cluster —
so BENCH.md reports it alongside the independent-JVM ceiling probe.

Usage: python tools/cluster_pairs.py [n_convs_at_N] [workers_small] [cores_each] [mult] [rounds]
Defaults: 64000 1 8 4 2  (1x8-core executor on 512k turns vs 4x8-core on 2M).
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import REPO, pregenerate  # noqa: E402


def run_cluster(workers: int, cores: int, parquet: str) -> dict:
    """One fresh driver JVM + `workers` executor JVMs via local-cluster."""
    mem_mb = 4096  # per-executor heap — constant across cluster sizes
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(workers * cores),  # shuffle partitions sizing
        SPARK_GRAFT_MASTER=f"local-cluster[{workers},{cores},{mem_mb}]",
        SPARK_GRAFT_PIPELINE_ONLY="1",
        SPARK_GRAFT_TRANSCRIPTS_PARQUET=parquet,
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        SPARK_GRAFT_OFFHEAP_GB=str(cores),  # per-EXECUTOR, so per-core-constant
        SPARK_DRIVER_JAVA_OPTIONS="-XX:+UseG1GC",
        SPARK_GRAFT_EXTRA_CONF=(
            f"spark.executor.memory={mem_mb - 512}m"
            f";spark.executor.extraJavaOptions=-XX:+UseG1GC -XX:ActiveProcessorCount={cores}"
        ),
    )
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)["pipeline"]
    r["wall_with_startup"] = round(time.perf_counter() - t0, 3)
    return r


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 64000
    w_small = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    mult = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    rounds = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    w_big = w_small * mult
    pq_small = pregenerate(n_convs)
    pq_big = pregenerate(n_convs * mult)

    pairs = []
    for i in range(rounds):
        a = run_cluster(w_small, cores, pq_small)
        b = run_cluster(w_big, cores, pq_big)
        assert a["triples_hashsum"] is not None
        pairs.append(
            {
                "round": i,
                f"wall_{w_small}x{cores}": a["seconds"],
                f"wall_{w_big}x{cores}": b["seconds"],
                "weak_eff": round(a["seconds"] / b["seconds"], 3),
                f"thr_{w_small}x{cores}": a["triples_per_sec"],
                f"thr_{w_big}x{cores}": b["triples_per_sec"],
                "hash_match_small_big_inputs": [a["triples_hashsum"], b["triples_hashsum"]],
            }
        )
        print(json.dumps(pairs[-1]), file=sys.stderr)

    print(
        json.dumps(
            {
                "mode": "local-cluster-weak-paired",
                "executors": [w_small, w_big],
                "cores_each": cores,
                "turns": {w_small: n_convs * 8, w_big: n_convs * mult * 8},
                "rounds": pairs,
                "median_weak_eff": round(
                    statistics.median(p["weak_eff"] for p in pairs), 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
