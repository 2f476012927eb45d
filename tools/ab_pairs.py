"""Paired two-level scaling measurement robust to host drift.

This sandbox VM is a shared KVM tenant: identical flagship-pipeline runs
drift ±40% between minutes (measured: 49.5 s vs 66.4 s vs 87.6 s for the
same 2M-turn local[32] config across one hour). Best-of-N per level — with
the two levels measured in separate multi-minute blocks (tools/
scaling_bench.py) — can therefore pair a quiet-host N-core run with a
noisy-host 4N-core run and report garbage efficiency in either direction.

This harness instead ALTERNATES the levels round by round (8, 32, 8, 32...)
so each round's pair shares one drift window, reports every round's
(wall_N, wall_4N, weak efficiency = wall_N / wall_4N), and summarizes with
the min-combined-wall round (quietest window) plus the median ratio.
Weak-scaling inputs: the 4N level processes mult x the conversations, so
equal wall = perfect scaling (a 4N cluster is bought to chew 4x the data in
the same time).

Usage: python tools/ab_pairs.py [n_convs_at_N] [N_cores] [mult] [rounds]
Defaults: 64000 8 4 3  (512k turns at local[8] vs 2M turns at local[32]).
Prints one JSON line.
"""

from __future__ import annotations

import json
import statistics
import sys

from scaling_bench import _run_once, pregenerate


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 64000
    n_cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    big = n_cores * mult
    pq_small = pregenerate(n_convs)
    pq_big = pregenerate(n_convs * mult)

    pairs = []
    for i in range(rounds):
        a = _run_once(n_cores, pq_small)["pipeline"]
        b = _run_once(big, pq_big)["pipeline"]
        pairs.append(
            {
                "round": i,
                f"wall_{n_cores}": a["seconds"],
                f"wall_{big}": b["seconds"],
                "weak_eff": round(a["seconds"] / b["seconds"], 3),
                f"thr_{n_cores}": a["triples_per_sec"],
                f"thr_{big}": b["triples_per_sec"],
            }
        )
        print(json.dumps(pairs[-1]), file=sys.stderr)
    best = min(pairs, key=lambda p: p[f"wall_{n_cores}"] + p[f"wall_{big}"])
    print(
        json.dumps(
            {
                "mode": "weak-paired",
                "levels": [n_cores, big],
                "turns": {n_cores: n_convs * 8, big: n_convs * mult * 8},
                "rounds": pairs,
                "best_round": best,
                "median_weak_eff": round(
                    statistics.median(p["weak_eff"] for p in pairs), 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
