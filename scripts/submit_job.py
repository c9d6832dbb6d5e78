"""spark-submit entrypoint for the resolution pipeline (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Package and submit:

    cd /root/repo && zip -qr /tmp/entity_resolver_spark.zip entity_resolver_spark
    spark-submit --py-files /tmp/entity_resolver_spark.zip \
        scripts/submit_job.py \
        --input /path/to/transcripts.parquet \
        --warehouse /path/to/warehouse \
        [--input-table catalog.db.transcripts]   # Iceberg table instead of path
        [--model /path/to/model.json] [--resume] [--report-labeled labeled.parquet]
        [--checkpoint-dir hdfs:///ckpt --cc-reliable-every 5]  # durable CC loop

The transcripts input must have columns
(conv_id string, turn_idx int, role string, text string, tool string,
 ts timestamp) — BASELINE.json input_hint. On a cluster the warehouse should
be an Iceberg namespace (sources/catalog auto-detects configured catalogs);
in plain deployments it is a parquet directory with atomic-rename commits.
All session tuning (shuffle partitions, AQE, Arrow batch size) comes from
spark-submit --conf, not from code — this entrypoint uses the session it is
given, so N-vs-4N executor runs differ only in cluster size.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="transcripts parquet path")
    p.add_argument("--input-table", help="transcripts table name (e.g. Iceberg)")
    p.add_argument("--warehouse", required=True, help="stage-table root/namespace")
    p.add_argument("--model", help="Model JSON (weights/bias/thresholds)")
    p.add_argument("--resume", action="store_true", help="skip completed stages")
    p.add_argument(
        "--incremental", help="parquet path of NEW transcripts to fold into a run"
    )
    p.add_argument(
        "--report-labeled", help="labeled pairs parquet -> write_report artifact"
    )
    p.add_argument("--output", help="optional parquet path for the cluster table")
    p.add_argument(
        "--checkpoint-dir",
        help="HDFS/S3/posix dir for RELIABLE checkpoints; with "
        "--cc-reliable-every, the connected-components loop's lineage cuts "
        "land here and survive executor loss (localCheckpoint blocks do not)",
    )
    p.add_argument(
        "--enhancement",
        choices=["none", "minimal", "moderate", "aggressive"],
        default="none",
        help="G3 post-classification match enhancement (reference "
        "config.yml:26 enhancement_aggressiveness; disabled there and "
        "here by default). Enhanced edges carry confidence 0.60 — lower "
        "min_edge_confidence via a custom model to let strict clustering "
        "consume them",
    )
    p.add_argument(
        "--cc-reliable-every",
        type=int,
        default=0,
        help="reliable-checkpoint the CC loop every K rounds (0 = "
        "executor-local cuts only; requires --checkpoint-dir when set)",
    )
    args = p.parse_args(argv)
    # --incremental consumes ONLY the new-transcripts parquet (the prior
    # run's records come from the warehouse), so --input/--input-table are
    # meaningless — and required — there. Keep the contracts disjoint.
    if args.incremental:
        if args.input or args.input_table:
            p.error("--incremental reads the warehouse, not --input/--input-table")
    elif not args.input and not args.input_table:
        p.error("one of --input / --input-table is required")
    if args.cc_reliable_every and not args.checkpoint_dir:
        p.error("--cc-reliable-every requires --checkpoint-dir")
    return args


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)

    # Import AFTER argparse so --help works without a JVM.
    from pyspark.sql import SparkSession

    from entity_resolver_spark.config import EngineConfig
    from entity_resolver_spark.operators.scoring import Model
    from entity_resolver_spark.plans.pipeline import ResolutionPipeline

    spark = SparkSession.builder.appName("entity-resolver-spark").getOrCreate()
    if args.checkpoint_dir:
        spark.sparkContext.setCheckpointDir(args.checkpoint_dir)
    model = None
    if args.model:
        with open(args.model) as f:
            model = Model.from_json(f.read())
    cfg = EngineConfig(
        cc_reliable_every=args.cc_reliable_every,
        enhancement_aggressiveness=args.enhancement,
    )
    pipe = ResolutionPipeline(spark, args.warehouse, cfg=cfg, model=model)
    if args.incremental:
        result = pipe.run_incremental(spark.read.parquet(args.incremental))
    else:
        transcripts = (
            spark.read.table(args.input_table)
            if args.input_table
            else spark.read.parquet(args.input)
        )
        result = pipe.run(transcripts, resume=args.resume)
    n = result.clusters.count()
    if args.output:
        result.clusters.write.mode("overwrite").parquet(args.output)
    if args.report_labeled:
        pipe.write_report(spark.read.parquet(args.report_labeled))
    print(f"clusters committed: {n} records -> {pipe.wh.root}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
