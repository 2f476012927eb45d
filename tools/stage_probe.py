"""Per-stage diagnosis of the flagship pipeline at one parallelism level.

Runs transcripts->triples on a pre-generated parquet input with the Spark UI
enabled, then dumps every stage's task count, wall, executorRunTime,
executorCpuTime, jvmGcTime and shuffle bytes from the REST API. This is the
measurement tool behind the 8 vs 32 core scaling work (BENCH.md): it shows
WHERE the extra cores go (GC? scheduling? a starved stage? dilated task CPU).

Usage: python tools/stage_probe.py <cpus> <parquet> [label]
Prints one JSON line per stage + a totals line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1])
    parquet = sys.argv[2]
    label = sys.argv[3] if len(sys.argv) > 3 else f"local{cpus}"

    from pyspark.sql import functions as F

    from rdfcmap_spark.plans.pipeline import run_pipeline
    from rdfcmap_spark.session import build_session
    from rdfcmap_spark.synth import transcripts_df

    spark = build_session(
        cpus=cpus,
        app_name=f"stage_probe_{label}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    transcripts = spark.read.parquet(parquet).localCheckpoint()
    warm = transcripts_df(spark, n_convs=32, turns_per_conv=4).localCheckpoint()
    run_pipeline(warm).triples.count()

    def consume(df):
        # same consume as bench.py: full-column hash aggregate, no storage
        cols = list(df.columns)
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]["n"]

    t0 = time.perf_counter()
    n = consume(run_pipeline(transcripts).triples)
    wall = time.perf_counter() - t0

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4050/api/v1/applications/{app_id}"
    stages = json.loads(urllib.request.urlopen(f"{base}/stages?status=complete").read())
    rows = []
    for s in stages:
        # true stage wall from submission->completion (executorRunTime is
        # task-seconds, which hides scheduling gaps and concurrency)
        real_wall = None
        try:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            sub = datetime.strptime(s["submissionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
            comp = datetime.strptime(s["completionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
            real_wall = round((comp - sub).total_seconds(), 2)
        except Exception:
            pass
        rows.append(
            {
                "stage": s["stageId"],
                "attempt": s["attemptId"],
                "name": s["name"].split("\n")[0][:70],
                "tasks": s["numCompleteTasks"],
                "stage_wall_s": real_wall,
                "wall_s": round((s.get("executorRunTime", 0)) / 1000.0, 2),
                "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
                "gc_s": round(s.get("jvmGcTime", 0) / 1000.0, 2),
                "in_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "sh_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "spill_mem_mb": round(s.get("memoryBytesSpilled", 0) / 1e6, 1),
                "spill_disk_mb": round(s.get("diskBytesSpilled", 0) / 1e6, 1),
                "submit": s.get("submissionTime", ""),
            }
        )
    rows.sort(key=lambda r: r["stage"])
    tot_run = sum(r["wall_s"] for r in rows)
    tot_cpu = sum(r["cpu_s"] for r in rows)
    tot_gc = sum(r["gc_s"] for r in rows)
    for r in rows:
        if r["wall_s"] > 0.2:
            print(json.dumps(r))
    print(
        json.dumps(
            {
                "label": label,
                "cpus": cpus,
                "wall_s": round(wall, 2),
                "triples": n,
                "task_run_s": round(tot_run, 1),
                "task_cpu_s": round(tot_cpu, 1),
                "task_gc_s": round(tot_gc, 1),
                "ideal_wall_s": round(tot_run / cpus, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
