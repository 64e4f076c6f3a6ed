"""spark-submit entry point for the full resolution pipeline (north rule:
'ships as spark-submit --py-files to a multi-executor cluster').

    spark-submit --py-files dist/dedupe_archived_files_spark.zip \\
        scripts/run_job.py \\
        --input  /path/or/table/of/pages/parquet \\
        --output /path/for/clusters \\
        --checkpoint-dir /path/for/stage/checkpoints \\
        [--tau 0.85] [--min-size 0] [--quarantine-dir ...]

The session is created WITHOUT a master so the launcher (YARN/K8s/standalone)
decides; all engine tuning (AQE, skew-join, Arrow) still applies.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from dedupe_archived_files_spark.config import PipelineConfig
from dedupe_archived_files_spark.plans.pipeline import (
    run_pipeline,
    run_pipeline_checkpointed,
)
from dedupe_archived_files_spark.sources.pages import (
    read_pages,
    write_clusters,
    write_quarantine,
)


def build_session(app_name: str = "dedupe_pages") -> SparkSession:
    return (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--quarantine-dir", default=None)
    p.add_argument("--tau", type=float, default=0.85)
    p.add_argument("--min-size", type=int, default=0)
    p.add_argument("--shingle-size", type=int, default=3)
    p.add_argument("--max-block-size", type=int, default=2000)
    p.add_argument(
        "--audit",
        action="store_true",
        help="print the per-stage lineage audit (volumes, partition skew, "
        "score histogram) after a checkpointed run",
    )
    args = p.parse_args()

    cfg = PipelineConfig(
        tau_jaccard=args.tau,
        min_size=args.min_size,
        shingle_size=args.shingle_size,
        max_block_size=args.max_block_size,
        checkpoint_dir=args.checkpoint_dir,
    ).validated()

    spark = build_session()
    pages = read_pages(spark, args.input)

    if args.checkpoint_dir:
        clusters = run_pipeline_checkpointed(pages, args.checkpoint_dir, cfg)
        write_clusters(clusters, args.output)
        if args.audit:
            from dedupe_archived_files_spark.plans.lineage import CheckpointStore

            CheckpointStore(spark, args.checkpoint_dir).audit().orderBy(
                "stage"
            ).show(truncate=False)
    else:
        res = run_pipeline(pages, cfg)
        write_clusters(res.clusters, args.output)
        if args.quarantine_dir:
            write_quarantine(res.pages_text, args.quarantine_dir)

    spark.stop()


if __name__ == "__main__":
    main()
