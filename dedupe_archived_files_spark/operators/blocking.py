"""Stage 2 — block: pages_text → candidate pairs.

Multi-channel blocking (SURVEY.md §7.1 stage 2). Channels:

* ``exact``   — full_hash (reference J1 key). GUARANTEED channel: exact
  duplicates can never be lost by probabilistic blocking (the reference's
  J2-superset invariant, SURVEY.md §5).
* ``quick``   — quick_hash for large bodies (reference J2).
* ``url``     — normalized URL (re-crawl / mirror key).
* ``minhash`` — LSH band keys over token-shingle MinHash signatures.

Skew handling (north rule — the reference has none, SURVEY.md §4):
oversized blocks (> cfg.max_block_size rows sharing one key) would generate
O(n²) candidate pairs; they are CAPPED — dropped from pair generation and
reported via `oversized_blocks` so lineage records what was skipped (standard
LSH practice for template/boilerplate keys). The exact channel is exempt from
the cap: identical content is resolved group-wise (no pair explosion) by
operators.dedupe.exact_duplicate_clusters.

The candidate self-join shuffles once on (channel, key); AQE skew-join splits
residual hot partitions at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedupe_archived_files_spark.config import PipelineConfig
from dedupe_archived_files_spark.functions.minhash import (
    band_keys,
    make_minhash_udf,
    make_shingle_hash_udf,
)
from dedupe_archived_files_spark.functions.text import normalize_url, tokens
from dedupe_archived_files_spark.operators.extract import eligible


def with_signature(pages_text: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Add tokens / shingle-set / MinHash signature columns (stage-2 prep).

    `shingle_set` (distinct, sorted) is kept for exact-Jaccard verification in
    the scoring stage; the raw text is NOT carried forward (column pruning —
    SURVEY.md §4)."""
    df = pages_text.withColumn("toks", tokens(F.col("text")))
    # shingle_set holds 64-bit shingle HASHES, not strings: 8 bytes/element
    # through every shuffle, and Jaccard verification intersects longs.
    shingle_hashes = make_shingle_hash_udf(cfg.shingle_size)
    df = df.withColumn("shingle_set", shingle_hashes(F.col("text")))
    minhash = make_minhash_udf(cfg.minhash_perms)
    df = df.withColumn(
        "signature",
        F.when(F.size("shingle_set") > 0, minhash(F.col("shingle_set"))),
    )
    return df


def block_keys(pages_sig: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """One row per (url, channel, key). Null keys are dropped."""
    base = pages_sig.filter(eligible(cfg))

    exact = base.select(
        "url", F.lit("exact").alias("channel"), F.col("full_hash").alias("key")
    )
    quick = base.filter(F.col("quick_hash").isNotNull()).select(
        "url", F.lit("quick").alias("channel"), F.col("quick_hash").alias("key")
    )
    url = base.select(
        "url", F.lit("url").alias("channel"), normalize_url(F.col("url")).alias("key")
    )
    mh = (
        base.filter(F.col("signature").isNotNull())
        .select(
            "url",
            F.explode(
                band_keys(F.col("signature"), cfg.lsh_bands, cfg.lsh_rows_per_band)
            ).alias("bk"),
        )
        .select("url", F.lit("minhash").alias("channel"), F.col("bk").cast("string").alias("key"))
    )
    return exact.unionByName(quick).unionByName(url).unionByName(mh).filter(
        F.col("key").isNotNull()
    )


def oversized_blocks(keys: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Blocks whose row count exceeds the cap — excluded from pair generation,
    surfaced for lineage (north rule: caps must be logged, not silent)."""
    return (
        keys.groupBy("channel", "key")
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > cfg.max_block_size)
    )


def candidate_pairs(
    pages_sig: DataFrame, cfg: PipelineConfig, channels: tuple[str, ...] = ("quick", "url", "minhash")
) -> DataFrame:
    """Distinct unordered candidate pairs from the probabilistic channels.

    The exact channel is intentionally absent here: exact duplicates go through
    the group-wise path (no pairs), keeping this join quadratic only within
    small verified blocks.
    """
    keys = block_keys(pages_sig, cfg).filter(F.col("channel").isin(*channels))
    big = oversized_blocks(keys, cfg).select("channel", "key")
    keys = keys.join(big, on=["channel", "key"], how="left_anti")

    a = keys.alias("a")
    b = keys.alias("b")
    return (
        a.join(b, on=["channel", "key"], how="inner")
        .filter(F.col("a.url") < F.col("b.url"))
        .select(
            F.col("a.url").alias("url_a"),
            F.col("b.url").alias("url_b"),
            F.col("channel"),
        )
        .groupBy("url_a", "url_b")
        .agg(F.array_sort(F.collect_set("channel")).alias("channels"))
    )
