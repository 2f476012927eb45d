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
import os
import sys

# local runs (`python jobs/run_pipeline.py ...`): sys.path[0] is jobs/, not
# the repo root; on a cluster --py-files provides the package instead
try:  # pragma: no cover - trivial import guard
    import rdfcmap_spark  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="transcripts parquet path")
    ap.add_argument("--synthetic-convs", type=int, default=None)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--output", required=True)
    # reference CLI parity (rdfcmap's output flags, RdfCmap.java):
    ap.add_argument("--ttl-output", default=None, help="also write a Turtle dump here")
    ap.add_argument(
        "--noprefixes", action="store_true", help="raw <iri> terms, no @prefix block"
    )
    ap.add_argument(
        "--notitles", action="store_true", help="drop dct:title statements from TTL"
    )
    ap.add_argument(
        "--noblanknodes",
        action="store_true",
        help="keep instances named (default anonymizes them to bnodes in TTL, "
        "like the reference's useBlankNodes)",
    )
    ap.add_argument(
        "--separate",
        default=None,
        metavar="DIR",
        help="also write one TTL file per instance (writeSeparateTurtleFiles)",
    )
    ap.add_argument(
        "--table-output",
        default=None,
        metavar="TABLE",
        help="commit the triples to a versioned snapshot table "
        "(sources/table_log.py: append with content-idempotent replay, "
        "partitioned by obj_kind; the Iceberg-shaped sink)",
    )
    ap.add_argument(
        "--table-mode",
        default="append",
        choices=["append", "overwrite"],
        help="table_log commit mode for --table-output",
    )
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
    result = {
        "triples": manifest["row_count"],
        "snapshot_id": manifest["snapshot_id"],
        "stages_ran": run.ran,
        "stages_resumed": run.skipped,
    }
    if args.ttl_output:
        from rdfcmap_spark.operators.relational import anonymize_instances
        from rdfcmap_spark.sources.ttl import write_ttl

        ttl = triples if args.noblanknodes else anonymize_instances(triples)
        write_ttl(
            ttl,
            args.ttl_output,
            use_prefixes=not args.noprefixes,
            add_titles=not args.notitles,
        )
        result["ttl_output"] = args.ttl_output
    if args.separate:
        from rdfcmap_spark.sources.ttl import write_instance_files

        names = write_instance_files(triples, args.separate)
        result["separate_files"] = len(names)
    if args.table_output:
        from rdfcmap_spark.sources.table_log import commit

        snap = commit(
            triples,
            args.table_output,
            mode=args.table_mode,
            partition_by=["obj_kind"],
            key_cols=["subj", "pred", "obj_kind", "obj_iri", "obj_lexical", "obj_datatype"],
        )
        result["table_version"] = snap["version"]
        result["table_snapshot_id"] = snap["snapshot_id"]
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
