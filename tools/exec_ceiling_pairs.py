"""Interleaved executor-deployment vs coordination-free-JVM ceiling pairs.

The round-4 adjacent-window measurement (BENCH.md) left an open question:
is the 0.57-0.65 calibrated weak efficiency of the 4x8 `local-cluster`
deployment real, or cross-window drift? This instrument closes the gap the
way the tri-pairs harness does for single-JVM levels: each ROUND runs the
ceiling probe (4 concurrent coordination-free local[8] JVMs, each on its
own 512k-turn input — what 4 independent 8-core executor groups would do
to this box) and the REAL 4x8-executor `local-cluster` deployment on the
2M-turn input BACK-TO-BACK inside one drift window, so the calibrated
ratio

    calibrated_weak_eff = concurrent_mean / wall_4x8

pairs numerator and denominator from the same minutes of host weather.

Usage: python tools/exec_ceiling_pairs.py [n_convs_at_8] [rounds]
Defaults: 64000 2. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from cluster_pairs import run_cluster  # noqa: E402
from jvm_calibration import _pipeline_seconds, _popen  # noqa: E402
from scaling_bench import pregenerate  # noqa: E402


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 64000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    mult, cores = 4, 8
    pq_small = pregenerate(n_convs)
    pq_big = pregenerate(n_convs * mult)

    out_rounds = []
    for i in range(rounds):
        # arm A: 4 coordination-free 8-core JVMs, each its own 512k turns
        t0 = time.perf_counter()
        procs = [_popen(cores, pq_small) for _ in range(mult)]
        walls = [_pipeline_seconds(p) for p in procs]
        ceiling_mean = sum(walls) / len(walls)
        # arm B: the real 4x8-executor deployment on the 2M-turn input,
        # immediately after, same window
        b = run_cluster(mult, cores, pq_big)
        r = {
            "round": i,
            "ceiling_walls": [round(w, 3) for w in walls],
            "ceiling_mean": round(ceiling_mean, 3),
            "wall_4x8": b["seconds"],
            "thr_4x8": b["triples_per_sec"],
            "calibrated_weak_eff": round(ceiling_mean / b["seconds"], 3),
            "window_seconds": round(time.perf_counter() - t0, 1),
        }
        out_rounds.append(r)
        print(json.dumps(r), file=sys.stderr)

    print(
        json.dumps(
            {
                "mode": "exec-vs-ceiling-interleaved",
                "turns": {"per_free_jvm": n_convs * 8, "executor_4x8": n_convs * mult * 8},
                "rounds": out_rounds,
                "median_calibrated_weak_eff": round(
                    statistics.median(r["calibrated_weak_eff"] for r in out_rounds), 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
