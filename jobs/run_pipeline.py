"""spark-submit entry point for the KG-construction pipeline.

Cluster deployment (north rule)::

    python tools/package.py                       # -> dist/rdfcmap_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/rdfcmap_spark.zip \\
        jobs/run_pipeline.py \\
        --input  <transcripts parquet/Iceberg path> \\
        --workdir <stage-snapshot dir> \\
        --output <triples table path> \\
        [--synthetic-convs N]       # generate deterministic input instead

The job is the staged, resumable runner: re-submitting after a failure
skips completed stages (plans/staged.py). All configuration that matters at
scale (AQE, Arrow, shuffle partitions) comes from spark-submit --conf on a
real cluster; build_session defaults only apply in local mode.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="transcripts parquet path")
    ap.add_argument("--synthetic-convs", type=int, default=None)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("rdfcmap_spark_pipeline").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from rdfcmap_spark.plans.staged import run_staged
    from rdfcmap_spark.sources import sink
    from rdfcmap_spark.synth import transcripts_df

    if args.input:
        transcripts = spark.read.parquet(args.input)
        input_fp = args.input
    elif args.synthetic_convs:
        transcripts = transcripts_df(spark, args.synthetic_convs, 8).localCheckpoint()
        input_fp = f"synthetic:{args.synthetic_convs}x8"
    else:
        ap.error("need --input or --synthetic-convs")
        return

    triples, run = run_staged(spark, transcripts, args.workdir, input_fp)
    manifest = sink.write_snapshot(
        triples,
        args.output,
        key_cols=["subj", "pred", "obj_kind", "obj_iri", "obj_lexical", "obj_datatype"],
    )
    print(
        json.dumps(
            {
                "triples": manifest["row_count"],
                "snapshot_id": manifest["snapshot_id"],
                "stages_ran": run.ran,
                "stages_resumed": run.skipped,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
