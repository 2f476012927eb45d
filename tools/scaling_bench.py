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
Efficiency = (thr_4N / thr_N) / 4. Prints one JSON line; the committed
BENCH.md aggregates the measured matrix across level pairs together with
the host parallel-efficiency ceiling (tools/host_calibration.py).

Two modes:

* strong (default) — SAME input at both levels; efficiency =
  (thr_4N / thr_N) / mult.
* weak (``--weak``) — per-core-constant input: the 4N level gets mult x
  the conversations (what a 4N-executor cluster would be bought FOR).
  Perfect scaling = identical wall time; efficiency = wall_N / wall_4N,
  which equals (thr_4N / thr_N) / mult since the work scales by mult.

Usage: python tools/scaling_bench.py [n_convs] [N_cores] [mult] [--weak]
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


def _level_memory_gb(cpus: int) -> int:
    """Per-core-constant heap (1 GB/core, floor 8, cap 16): a real 4N-executor
    cluster brings 4x total memory, but >24 GB single-JVM heaps measurably
    destabilize this box (session.py note), so the 32-core level caps at 16.
    Also keeps the 4-concurrent-JVM ceiling probe (tri_pairs B) from pushing
    the host into page-fault storms (4x16g heaps + off-heap did, measured)."""
    return min(16, max(8, cpus))


def _run_once(cpus: int, parquet: str, extra_env: dict[str, str] | None = None) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_PIPELINE_ONLY="1",
        SPARK_GRAFT_TRANSCRIPTS_PARQUET=parquet,
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        SPARK_DRIVER_MEMORY=f"{_level_memory_gb(cpus)}g",
        # honest N-core simulation: without ActiveProcessorCount the JVM
        # sizes GC/IO thread pools from the 32 host cores even at local[2],
        # letting the "small cluster" borrow the big one's cores
        SPARK_DRIVER_JAVA_OPTIONS=f"-XX:+UseG1GC -XX:ActiveProcessorCount={cpus}",
        **(extra_env or {}),
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
    argv = [a for a in sys.argv[1:] if a != "--weak"]
    weak = "--weak" in sys.argv[1:]
    n_convs = int(argv[0]) if len(argv) > 0 else 256000
    n_cores = int(argv[1]) if len(argv) > 1 else 2
    mult = int(argv[2]) if len(argv) > 2 else 4
    levels = [n_cores, n_cores * mult]
    convs_at = {n_cores: n_convs, n_cores * mult: n_convs * mult if weak else n_convs}
    parquets = {c: pregenerate(convs_at[c]) for c in levels}
    results = {c: run_level(c, parquets[c]) for c in levels}
    pn, p4 = results[levels[0]]["pipeline"], results[levels[1]]["pipeline"]
    thr_n, thr_4n = pn["triples_per_sec"], p4["triples_per_sec"]
    eff = (thr_4n / thr_n) / mult
    same_output = pn["triples_hashsum"] == p4["triples_hashsum"] and pn["triples"] == p4["triples"]

    summary = {
        "mode": "weak" if weak else "strong",
        "n_convs": convs_at,
        "turns": {c: results[c]["pipeline"]["turns"] for c in levels},
        "levels": levels,
        f"local{levels[0]}": {"seconds": pn["seconds"], "triples_per_sec": thr_n},
        f"local{levels[1]}": {"seconds": p4["seconds"], "triples_per_sec": thr_4n},
        "speedup": round(thr_4n / thr_n, 3),
        "scaling_efficiency": round(eff, 3),
        "triples": p4["triples"],
    }
    if not weak:
        summary["output_identical_across_parallelism"] = same_output
    # one JSON line; the committed BENCH.md carries the full measured matrix
    # (every level pair + tools/host_calibration.py ceilings) as ONE story —
    # this tool no longer overwrites it per-pair
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
