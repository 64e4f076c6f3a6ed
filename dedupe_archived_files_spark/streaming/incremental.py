"""Structured-Streaming front door for incremental ingest.

The reference's incremental behavior is batch-resume (skip unchanged inputs on
re-run, core/scanner.py:119-134) — SURVEY.md §2.5 notes there are NO streaming
operators to port. This module is therefore the *extension* for continuous
ingest: new page files landing in a directory are micro-batched through the
same extract stage, and `foreachBatch` applies the same J6 anti-join +
checkpointed append used by the batch pipeline (one code path, two drivers).

Watermark + tumbling-window duplicate-rate monitoring comes for free on the
same stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dedupe_archived_files_spark import schema as S
from dedupe_archived_files_spark.config import PipelineConfig
from dedupe_archived_files_spark.operators.extract import extract_pages


def stream_pages(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of page rows (schema enforced, never inferred)."""
    return spark.readStream.schema(S.PAGES).parquet(path)


def stream_extract(pages_stream: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """The batch extract stage applied to a micro-batch stream — identical
    semantics, identical code (operators.extract)."""
    return extract_pages(pages_stream, cfg or PipelineConfig())


def duplicate_rate_per_window(pages_text_stream: DataFrame) -> DataFrame:
    """Windowed monitoring aggregate: per 1-hour crawl window, pages seen and
    distinct contents (approx) — the live duplicate-rate signal. Watermarked
    so state is bounded under late data."""
    return (
        pages_text_stream.withWatermark("warc_ts", "2 hours")
        .groupBy(F.window("warc_ts", "1 hour"))
        .agg(
            F.count("*").alias("n_pages"),
            F.approx_count_distinct("full_hash").alias("approx_distinct"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "n_pages",
            "approx_distinct",
        )
    )


def stateful_dedupe_stream(
    pages_stream: DataFrame, cfg: PipelineConfig | None = None
) -> DataFrame:
    """Custom stateful streaming operator: exact-dedupe ACROSS micro-batches.

    Each page is extracted and grouped by ``full_hash``; per-hash GroupState
    remembers whether that content was ever emitted, so only the FIRST row of
    each distinct content survives — the streaming analogue of the batch
    exact channel (reference J1 as a continuous operator). Implemented with
    ``applyInPandasWithState`` (Arrow-batched; the state tuple is one
    (first_url, first_ts) pair per distinct hash).

    Scale notes: the groupBy shuffles by content hash, so state is evenly
    spread; hot hashes (viral pages) are still ONE state row each. State is
    unbounded by design here (content identity never expires) — a production
    deployment bounds it with the RocksDB state store + snapshotting; a TTL
    would reintroduce duplicates after expiry, which is a policy choice, not
    a default. Quarantined rows (no hash) pass through untouched via the
    null-hash group being keyed by url instead.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cfg = cfg or PipelineConfig()
    extracted = extract_pages(pages_stream, cfg)
    # null full_hash (quarantined) must not collapse into one group: key those
    # rows by url so each passes through individually
    keyed = extracted.withColumn(
        "dedup_key", F.coalesce(F.col("full_hash"), F.concat(F.lit("q:"), F.col("url")))
    )

    out_type = S.PAGES_TEXT
    state_type = T.StructType(
        [
            T.StructField("first_url", T.StringType()),
            T.StructField("first_ts", T.LongType()),
        ]
    )

    def first_seen_only(key, pdf_iter, state: GroupState):
        if state.exists:
            # content already emitted in an earlier batch → drop everything
            for _ in pdf_iter:
                pass
            return
        # deterministic winner inside the batch: min (url, warc_ts) across
        # ALL Arrow chunks — a group's rows can span chunks, so the running
        # best is compared against each chunk's local min (keeping only the
        # first non-empty chunk would make the winner chunk-order-dependent)
        best = None
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            local = pdf.sort_values(["url", "warc_ts"]).head(1)
            if best is None:
                best = local
            else:
                lrow, brow = local.iloc[0], best.iloc[0]
                if (str(lrow["url"]), lrow["warc_ts"]) < (
                    str(brow["url"]), brow["warc_ts"]
                ):
                    best = local
        if best is not None:
            row = best.iloc[0]
            state.update((str(row["url"]), int(row["warc_ts"].value)))
            yield best.drop(columns=["dedup_key"])

    return keyed.groupBy("dedup_key").applyInPandasWithState(
        first_seen_only,
        outputStructType=out_type,
        stateStructType=state_type,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_incremental_append(
    pages_stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
):
    """foreachBatch sink: each micro-batch is extracted and appended after a
    J6-style anti-join against what the target already holds.

    Delivery contract: the streaming checkpoint gives at-least-once batch
    delivery; a foreachBatch retry after a crash mid-append can re-run the
    batch, and the anti-join then drops every (url, warc_ts) the partial
    append already committed — so the sink is idempotent at row granularity
    (duplicate-free), which is the property the batch pipeline's J6 resume
    relies on. True transactional exactly-once needs an atomic table format
    (Iceberg MERGE — jars absent in this image; see plans/lineage.py)."""
    cfg = cfg or PipelineConfig()

    def handle(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        extracted = extract_pages(batch, cfg)
        # Existence check is explicit: ONLY a missing/empty target skips the
        # anti-join. Any other read failure (corrupt footer, transient FS
        # error) must fail the batch — treating it as "first batch" would
        # append without the J6 guard and silently duplicate rows.
        # "Empty" means no COMMITTED data file: a crash during the very first
        # append can leave target_dir holding only _temporary/ — dir-existence
        # alone would then wedge the stream forever on "unable to infer
        # schema". Hidden entries (_temporary, _SUCCESS, .crc) don't count.
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path(target_dir)  # noqa: SLF001
        fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
        has_data = False
        if fs.exists(jvm_path):
            for st in fs.listStatus(jvm_path):
                name = st.getPath().getName()
                if st.isFile() and not name.startswith(("_", ".")):
                    has_data = True
                    break
        if has_data:
            existing = spark.read.parquet(target_dir).select("url", "warc_ts")
            fresh = extracted.join(existing, ["url", "warc_ts"], "left_anti")
        else:
            fresh = extracted
        fresh.write.mode("append").parquet(target_dir)

    return (
        pages_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def crawl_sessions_stream(pages_text_stream: DataFrame) -> DataFrame:
    """Native streaming gap sessionization: per-`lang` crawl sessions that
    close after 30 minutes without a new page (the streaming twin of the
    batch `queries.sessionize_events`, expressed with Spark's built-in
    `session_window` so the state store — not a custom operator — merges and
    expires sessions).

    Watermarked at 2 hours: late pages older than the watermark drop out of
    state instead of growing it without bound; a session's row emits once
    its close is final under the watermark (append mode). Scale shape: the
    state key is (lang, merged-window), so state size tracks ACTIVE sessions
    only — the built-in operator merges overlapping windows and evicts
    closed ones, exactly what a hand-rolled applyInPandasWithState would
    have to re-implement."""
    return (
        pages_text_stream.withWatermark("warc_ts", "2 hours")
        .groupBy(F.session_window("warc_ts", "30 minutes"), F.col("lang"))
        .agg(
            F.count("*").alias("n_pages"),
            F.approx_count_distinct("full_hash").alias("approx_distinct"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "lang",
            "n_pages",
            "approx_distinct",
        )
    )


def cross_crawl_dup_stream(
    crawl_a: DataFrame, crawl_b: DataFrame, max_lag_hours: int = 24
) -> DataFrame:
    """Stream-stream INTERVAL join: pages from two live crawl streams with
    identical content (full_hash) observed within ``max_lag_hours`` of each
    other — continuous cross-crawl duplicate detection (the J1 equi-join
    lifted to two unbounded sides).

    Both sides are watermarked, and the join carries an explicit event-time
    range constraint — the two things Spark's state-cleanup planner needs to
    EVICT buffered rows once no future match is possible; without them a
    stream-stream join buffers both streams forever. State per side is
    therefore bounded by (watermark + lag window) × arrival rate, not by
    stream length. Scale shape: state-store keyed by full_hash (the join
    key), so skew follows viral-content hashes — the same hot keys the batch
    blocking caps, monitored here via the lineage dup-rate windows."""
    a = crawl_a.withWatermark("warc_ts", "2 hours").select(
        F.col("url").alias("url_a"),
        F.col("warc_ts").alias("ts_a"),
        F.col("full_hash").alias("hash_a"),
    )
    b = crawl_b.withWatermark("warc_ts", "2 hours").select(
        F.col("url").alias("url_b"),
        F.col("warc_ts").alias("ts_b"),
        F.col("full_hash").alias("hash_b"),
    )
    return a.join(
        b,
        F.expr(
            f"""hash_a = hash_b
                AND ts_b >= ts_a - INTERVAL {int(max_lag_hours)} HOURS
                AND ts_b <= ts_a + INTERVAL {int(max_lag_hours)} HOURS"""
        ),
        "inner",
    ).select(
        "url_a", "url_b", F.col("hash_a").alias("full_hash"), "ts_a", "ts_b"
    )
