"""Same-window tri-level scaling measurement: the round-3 scaling evidence.

The north rule's two-cluster-size criterion (N vs 4N executors, efficiency
>= 0.8) cannot use a real cluster in this sandbox, and this shared VM has
two confounds the round-2 methodology couldn't separate:

1. **Host drift**: identical runs drift +/-40% between minutes, so the two
   levels must be measured back-to-back inside one drift window.
2. **Host ceiling for THE WORKLOAD**: the pure-ALU / bandwidth probes
   (tools/host_calibration.py) bound generic work at 0.84 / 0.78 for
   8 -> 32, but allocation-heavy JVM string/regex code dilates much more
   under shared-L3/bandwidth pressure. The faithful ceiling is ``mult``
   INDEPENDENT single-level bench JVMs run CONCURRENTLY — exactly what
   ``mult`` separate 8-core executor groups would do to this box, with
   ZERO cross-JVM coordination. No Spark plan can beat that; a real
   N -> 4N executor cluster does not share this ceiling because every
   executor group brings its own sockets, caches and memory channels.

So each round measures, back to back in ONE window, on weak-scaling inputs
(the 4N level owns mult x the conversations — what a 4N cluster is FOR):

  A. solo  ``local[N]``           on the N-sized input      -> wall_N
  B. mult x ``local[N]`` JVMs     each on its own N-sized
     input, started together      -> ceiling_wall (batch)
  C. solo  ``local[N*mult]``      on the mult x input       -> wall_4N

  raw_eff        = wall_N / wall_4N          (naive, host-confounded)
  ceiling_eff    = wall_N / ceiling_wall     (what this HOST allows 4 ideal
                                              executor groups; <1 is pure
                                              hardware contention)
  calibrated_eff = ceiling_wall / wall_4N    (the PLAN's efficiency net of
                                              host: 1.0 = the single-JVM 4N
                                              run matches mult independent
                                              coordination-free JVMs)

Output invariance across levels is asserted via the order-insensitive
triple hash (B runs the same input as A in one of its JVMs).

Usage: python tools/tri_pairs.py [n_convs_at_N] [N_cores] [mult] [rounds]
Defaults: 64000 8 4 3. Prints one JSON line; BENCH.md carries the story.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

from scaling_bench import _run_once, pregenerate


def _popen_level(cpus: int, parquet: str):
    import os
    import subprocess

    from scaling_bench import REPO, _level_memory_gb

    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_PIPELINE_ONLY="1",
        SPARK_GRAFT_TRANSCRIPTS_PARQUET=parquet,
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        SPARK_DRIVER_MEMORY=f"{_level_memory_gb(cpus)}g",
        SPARK_DRIVER_JAVA_OPTIONS=f"-XX:+UseG1GC -XX:ActiveProcessorCount={cpus}",
    )
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, cwd=REPO,
    )


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 64000
    n_cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    big = n_cores * mult
    pq_small = pregenerate(n_convs)
    pq_big = pregenerate(n_convs * mult)

    out_rounds = []
    for i in range(rounds):
        a = _run_once(n_cores, pq_small)["pipeline"]  # A: solo local[N]
        t0 = time.perf_counter()  # B: mult independent local[N] JVMs
        procs = [_popen_level(n_cores, pq_small) for _ in range(mult)]
        outs = [p.communicate()[0] for p in procs]
        ceiling_wall = time.perf_counter() - t0
        pipes = [
            json.loads([l for l in o.splitlines() if l.startswith("{")][-1])["pipeline"]
            for o in outs
        ]
        c = _run_once(big, pq_big)["pipeline"]  # C: solo local[N*mult]
        hashes = {a["triples_hashsum"]} | {p["triples_hashsum"] for p in pipes}
        assert len(hashes) == 1, f"output differs across runs/levels: {hashes}"
        # The comparable ceiling is the max of the concurrent JVMs'
        # PIPELINE-SECTION walls (the sections overlap — all JVMs start
        # together and spend near-equal time in startup/warm-up first).
        # The whole-process batch wall additionally bills 4x Spark startup,
        # JIT warm-up and input load, none of which A/C's pipeline-section
        # walls contain — using it overstated the ceiling by ~2x.
        ceiling_pipe = max(p["seconds"] for p in pipes)
        r = {
            "round": i,
            f"wall_{n_cores}": a["seconds"],
            "ceiling_wall": round(ceiling_pipe, 3),
            "ceiling_batch_wall": round(ceiling_wall, 3),
            "ceiling_jvm_walls": [p["seconds"] for p in pipes],
            f"wall_{big}": c["seconds"],
            "raw_eff": round(a["seconds"] / c["seconds"], 3),
            "ceiling_eff": round(a["seconds"] / ceiling_pipe, 3),
            "calibrated_eff": round(ceiling_pipe / c["seconds"], 3),
            f"thr_{n_cores}": a["triples_per_sec"],
            f"thr_{big}": c["triples_per_sec"],
        }
        out_rounds.append(r)
        print(json.dumps(r), file=sys.stderr)

    best = min(out_rounds, key=lambda r: r[f"wall_{n_cores}"] + r[f"wall_{big}"])
    print(
        json.dumps(
            {
                "mode": "weak-tri-paired",
                "levels": [n_cores, big],
                "turns": {n_cores: n_convs * 8, big: n_convs * mult * 8},
                "rounds": out_rounds,
                "best_round": best,
                "median_raw_eff": round(
                    statistics.median(r["raw_eff"] for r in out_rounds), 3
                ),
                "median_ceiling_eff": round(
                    statistics.median(r["ceiling_eff"] for r in out_rounds), 3
                ),
                "median_calibrated_eff": round(
                    statistics.median(r["calibrated_eff"] for r in out_rounds), 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
