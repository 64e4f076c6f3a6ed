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
    # glibc malloc mmap()s every allocation over ~128 KB and munmap()s it on
    # free; numpy temporaries in the featurizer UDFs sit right above that
    # threshold, and each munmap fires TLB-shootdown IPIs at every core. At 32
    # parallel workers this turns into a kernel-time storm (measured on this
    # box: 32x featurize workers, wall 12.4s -> 5.6s, sys CPU 224s -> 28s with
    # the thresholds raised). Set BEFORE the JVM starts so the pyspark daemon
    # and every forked worker inherit it; executorEnv carries it to real
    # cluster executors.
    for var in ("MALLOC_MMAP_THRESHOLD_", "MALLOC_TRIM_THRESHOLD_"):
        os.environ.setdefault(var, "1073741824")
    # pyarrow's bundled jemalloc decay-purges its chunks (madvise) a few
    # seconds after each Arrow batch and refaults them on the next — repeated
    # UDF stages degrade monotonically (measured: 4 consecutive 400k-page
    # extract stages at local[32]: 20s, 57s, 62s, 54s with jemalloc vs 14s,
    # 15s, 19s, 18s with the system allocator, which the thresholds above
    # keep resident). Workers inherit this env in local mode; executorEnv
    # carries all three to real cluster executors.
    os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        cpus_s = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus_s) if cpus_s else (os.cpu_count() or 8)

    # 12g, NOT bigger: on this sandbox (snapshot-restored microVM) the cost of
    # FIRST-TOUCH page faults is ~50-100x a warm fault (VMM-serviced), and G1
    # on a huge pinned heap keeps allocating young regions in never-touched
    # areas — measured: the identical explode+agg job swings 5s..92s at 48g,
    # stabilizes at 4-10s with a 10-12g heap (run-to-run, warm machine). A
    # right-sized heap keeps the whole working set hot. On a real cluster
    # executors size their own heaps; this default only governs local mode.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local mode: the driver JVM IS the executor — give it real memory
        # (ignored by spark-submit deployments that set their own)
        .config("spark.driver.memory", driver_mem)
        # -Xms == -Xmx: a growing/shrinking G1 heap commits and UNCOMMITS
        # regions continuously under cache/shuffle churn, and every uncommit
        # is an munmap → TLB-shootdown IPIs on all cores (measured: the 13M-row
        # blocking aggregate dropped from 87s wall / 1447s sys CPU to 17s /
        # 12s once the heap was pinned). Pages still fault in lazily — no
        # AlwaysPreTouch — so session startup stays fast.
        .config("spark.driver.extraJavaOptions", f"-Xms{driver_mem}")
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
        # count(*)/min/max over plain parquet answered from footer row-group
        # stats instead of a data scan (used by the ANN's corpus-size probe)
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # collect_list/collect_set aggregations over millions of groups:
        # the default ObjectHashAggregate fallback (128 in-memory keys per
        # partition!) silently degrades to sort-based aggregation — the exact
        # sort the bucket-based blocking design exists to avoid
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
        # equi-joins on high-cardinality keys: shuffled-hash beats two full
        # sorts; AQE still re-plans skewed/oversized partitions
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # NEVER memory-map shuffle/storage blocks: local-mode reads mmap any
        # block over the 2 MB default, and the later munmap burst (buffer
        # cleaner at GC) fires TLB-shootdown IPIs across every core — measured
        # here as a kernel-time storm (12s -> 145s wall, 19s -> 2866s sys CPU
        # on an identical 13M-row shuffle+aggregate re-run at local[32]).
        # Plain pread of shuffle blocks is uniformly fast and stable.
        .config("spark.storage.memoryMapThreshold", "2g")
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "1073741824")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "1073741824")
        .config("spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL", "system")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Spark 4 collation-aware string functions (lower/upper/initcap) lazily
    # initialize ICU (CollationAwareUTF8String class init) on FIRST use — on a
    # many-core executor every task thread of the first stage blocks on the
    # class-initialization monitor, serializing the whole stage (measured:
    # 153s -> 39s cold-run on a 32-core local pipeline). Pay the ~4s init
    # once, single-threaded, at session start instead.
    spark.sql("select lower('Ü'), upper('ü'), initcap('warm')").collect()
    return spark
