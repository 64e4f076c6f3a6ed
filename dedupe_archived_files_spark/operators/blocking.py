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
    make_shingle_minhash_udf,
)
from dedupe_archived_files_spark.functions.text import normalize_url, tokens
from dedupe_archived_files_spark.operators.extract import eligible


def with_signature(pages_text: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Add token-hash / shingle-set / MinHash signature columns (stage-2 prep).

    Tokenization and per-token hashing are JVM-side (split + xxhash64 inside
    whole-stage codegen); shingle combination + the k-permutation min run in
    ONE vectorized numpy pandas UDF. `shingle_set` holds 64-bit shingle
    HASHES (8 bytes/element through every shuffle; exact-Jaccard verification
    intersects longs). Raw text is NOT carried forward (column pruning —
    SURVEY.md §4)."""
    df = pages_text.withColumn(
        "tok_hashes",
        F.transform(tokens(F.col("text")), lambda t: F.xxhash64(t)),
    )
    sm = make_shingle_minhash_udf(cfg.shingle_size, cfg.minhash_perms)
    df = df.withColumn("_sm", sm(F.col("tok_hashes")))
    df = (
        df.withColumn("shingle_set", F.col("_sm.shingle_set"))
        .withColumn("signature", F.col("_sm.signature"))
        .drop("_sm")
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
    # precomputed band_keys (fused-UDF path) beat the JVM expression: the
    # per-row slice/hash expression tree was the top GC producer in the
    # blocking stage (see functions.minhash.band_keys)
    if "band_keys" in pages_sig.columns:
        bk_col = F.col("band_keys")
        mh_base = base.filter(F.col("band_keys").isNotNull())
    else:
        bk_col = band_keys(F.col("signature"), cfg.lsh_bands, cfg.lsh_rows_per_band)
        mh_base = base.filter(F.col("signature").isNotNull())
    mh = mh_base.select(
        "url", F.explode(bk_col).alias("bk")
    ).select("url", F.lit("minhash").alias("channel"), F.col("bk").cast("string").alias("key"))
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

    Physical shape: ONE shuffle of the key table. Keys are hash-aggregated
    into per-bucket member arrays (ObjectHashAggregate — no sort), singleton
    buckets are dropped inside the same pass, oversized buckets are capped,
    and pairs are emitted by a bounded double-explode within each bucket. The
    self-equi-join formulation costs two full sorts of the (rows × bands) key
    table — at 10^12 docs the most expensive shuffle in the pipeline; the
    bucket form never sorts and shuffles the key table exactly once.

    The exact channel is intentionally absent here: exact duplicates go
    through the group-wise path (no pairs), keeping the quadratic work
    bounded by cfg.max_block_size within probabilistic blocks only.
    """
    keys = block_keys(pages_sig, cfg).filter(F.col("channel").isin(*channels))
    # consumed by the count pass AND the bucket build — pin to one execution
    keys = keys.localCheckpoint(eager=False)
    # count pre-filter (codegen HashAggregate): only keys with 2..cap members
    # survive, so no member list is ever BUILT for a singleton or a viral
    # bucket — memory per group stays bounded by cfg.max_block_size
    kept = (
        keys.groupBy("channel", "key")
        .agg(F.count("*").alias("n_rows"))
        .filter((F.col("n_rows") >= 2) & (F.col("n_rows") <= cfg.max_block_size))
        .select("channel", "key")
    )
    buckets = (
        keys.join(kept, ["channel", "key"])
        .groupBy("channel", "key")
        .agg(F.collect_list("url").alias("members"))
    )
    return (
        buckets.select("channel", F.explode("members").alias("url_a"), "members")
        .select("channel", "url_a", F.explode("members").alias("url_b"))
        .filter(F.col("url_a") < F.col("url_b"))
        .groupBy("url_a", "url_b")
        .agg(F.array_sort(F.collect_set("channel")).alias("channels"))
    )
