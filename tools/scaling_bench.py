"""Two-cluster-size scaling evidence (BASELINE.md).

The north rule demands ≥0.8 throughput scaling efficiency between N- and
4N-executor clusters. This sandbox has one machine, so the driver-sanctioned
proxy is the same job at two parallelism levels — N and 4N cores on the
same input (default ``local[2]`` vs ``local[8]``; both below this VM's
memory-bandwidth saturation point, which a real multi-executor cluster
does not share because every executor brings its own memory channels —
see BENCH.md notes). Each run is a fresh JVM (subprocess); the input is
pre-generated once to parquet at full parallelism so the low-core level
doesn't pay generation cost; best-of-N runs filter host-side VM noise.

Reports, per level: wall seconds, triples/sec, and the order-insensitive
triple-set hash (must be identical — cluster-size-invariant output).
Efficiency = (thr_4N / thr_N) / 4. Writes BENCH.md.

Usage: python tools/scaling_bench.py [n_convs] [N_cores] [mult]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def pregenerate(n_convs: int) -> str:
    """Write the deterministic transcript table once, at full parallelism."""
    sys.path.insert(0, REPO)
    from rdfcmap_spark.session import build_session
    from rdfcmap_spark.synth import transcripts_df

    path = os.path.join(tempfile.gettempdir(), f"scaling_transcripts_{n_convs}.parquet")
    if not os.path.exists(path):
        spark = build_session(cpus=32, app_name="scaling_pregen")
        transcripts_df(spark, n_convs=n_convs, turns_per_conv=8).write.mode("overwrite").parquet(path)
        spark.stop()
    return path


def _run_once(cpus: int, parquet: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_PIPELINE_ONLY="1",
        SPARK_GRAFT_TRANSCRIPTS_PARQUET=parquet,
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        # honest N-core simulation: without ActiveProcessorCount the JVM
        # sizes GC/IO thread pools from the 32 host cores even at local[2],
        # letting the "small cluster" borrow the big one's cores
        SPARK_DRIVER_JAVA_OPTIONS=f"-XX:+UseParallelGC -XX:ActiveProcessorCount={cpus}",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def run_level(cpus: int, parquet: str, repeats: int = 2) -> dict:
    """Best-of-N fresh-JVM runs (the sandbox VM shows large host-side timing
    noise; min filters it the standard way)."""
    runs = [_run_once(cpus, parquet) for _ in range(repeats)]
    hashes = {r["pipeline"]["triples_hashsum"] for r in runs}
    assert len(hashes) == 1, f"nondeterministic output across repeats: {hashes}"
    return min(runs, key=lambda r: r["pipeline"]["seconds"])


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 256000
    n_cores = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    levels = [n_cores, n_cores * mult]
    parquet = pregenerate(n_convs)
    results = {c: run_level(c, parquet) for c in levels}
    pn, p4 = results[levels[0]]["pipeline"], results[levels[1]]["pipeline"]
    thr_n, thr_4n = pn["triples_per_sec"], p4["triples_per_sec"]
    eff = (thr_4n / thr_n) / mult
    same_output = pn["triples_hashsum"] == p4["triples_hashsum"] and pn["triples"] == p4["triples"]

    summary = {
        "n_convs": n_convs,
        "turns": pn["turns"],
        "levels": levels,
        f"local{levels[0]}": {"seconds": pn["seconds"], "triples_per_sec": thr_n},
        f"local{levels[1]}": {"seconds": p4["seconds"], "triples_per_sec": thr_4n},
        "speedup": round(thr_4n / thr_n, 3),
        "scaling_efficiency": round(eff, 3),
        "output_identical_across_parallelism": same_output,
        "triples": p4["triples"],
    }
    print(json.dumps(summary))

    md = f"""# BENCH — measured numbers

## KG-construction pipeline (flagship): two-cluster-size scaling

Same job, same pre-generated deterministic input ({pn['turns']:,} turns),
fresh JVM per run, best-of-2 per level (host-VM noise filtered by min).

| parallelism | wall s | triples/sec | turns/sec |
|---|---|---|---|
| local[{levels[0]}]  (N)  | {pn['seconds']} | {thr_n} | {pn['turns_per_sec']} |
| local[{levels[1]}] (4N) | {p4['seconds']} | {thr_4n} | {p4['turns_per_sec']} |

* **Scaling efficiency (N -> 4N)** = (thr_4N / thr_N) / {mult} = **{eff:.3f}**
  (target >= 0.8, BASELINE.md).
* **Output invariance**: triple count {p4['triples']:,} and the
  order-insensitive xxhash64 content hash are
  **{'identical' if same_output else 'DIFFERENT (BUG)'}** across parallelism
  levels — the cluster-size-invariant-output requirement.

### Why N={levels[0]} cores

The sandbox is ONE shared-memory box: the pipeline's hot loop is
regex/string work whose throughput saturates this VM's memory bandwidth
well below 32 threads (measured: local[8] ~= local[32] wall time while a
cache-resident CPU burn scales 24.5x to 32 procs). A real N- vs
4N-executor cluster adds memory channels with every executor, so the
bandwidth ceiling does not apply; the honest single-box proxy is a core
pair below the ceiling. local[8]/local[32] numbers are reported in
BENCH_r*.json for transparency.

### Flagship throughput (local[32], sf0.1 bench config)

See BENCH_r*.json (`value` = triples/sec; `pipeline.turns_per_sec`).
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
