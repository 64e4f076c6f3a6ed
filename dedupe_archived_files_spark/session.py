"""SparkSession factory tuned for this engine.

Local mode is the test bed; the config is written for a multi-executor cluster
(AQE on, skew-join on, Arrow batches sized for text payloads). The reference has
no parallelism at all (SURVEY.md §6: `parallel_workers` knob is dead code,
reference core/scanner.py:8); here parallelism is the whole point.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dedupe_archived_files_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback ``*``) so
    the same entry points run under the driver harness and under spark-submit
    on a real cluster (where ``master`` is left to the launcher).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        cpus_s = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus_s) if cpus_s else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local mode: the driver JVM IS the executor — give it real memory
        # (ignored by spark-submit deployments that set their own)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # shuffle sized to cores locally; on a real cluster raise to ~2-3x total cores
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing, skew-join splitting, join-strategy switches
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every pandas UDF / toPandas hop
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # deterministic timestamps vs DuckDB oracle
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # collect_list/collect_set aggregations over millions of groups:
        # the default ObjectHashAggregate fallback (128 in-memory keys per
        # partition!) silently degrades to sort-based aggregation — the exact
        # sort the bucket-based blocking design exists to avoid
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
        # equi-joins on high-cardinality keys: shuffled-hash beats two full
        # sorts; AQE still re-plans skewed/oversized partitions
        .config("spark.sql.join.preferSortMergeJoin", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
