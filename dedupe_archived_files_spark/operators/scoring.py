"""Stage 3 — score: candidate pairs → verified match edges.

The verification tier (reference J3, core/scanner.py:366-387: blocked
candidates are re-checked with the exact computation; false positives drop
out). Channels:

* exact full_hash equality             → score 1.0   (reference's only metric)
* exact Jaccard over shingle sets      → keep >= cfg.tau_jaccard
* SimHash Hamming distance             → keep <= cfg.max_hamming
* Jaro-Winkler on normalized urls      → reported as a feature, not a gate

Everything except Jaro-Winkler is JVM-side array/bit arithmetic; all of it
runs only on blocked candidates (post-LSH volume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedupe_archived_files_spark.config import PipelineConfig
from dedupe_archived_files_spark.functions.minhash import jaccard
from dedupe_archived_files_spark.functions.simhash import hamming, simhash_udf
from dedupe_archived_files_spark.functions.strings import jaro_winkler_udf
from dedupe_archived_files_spark.functions.text import normalize_url, tokens


def pair_features(pages_sig: DataFrame, candidates: DataFrame) -> DataFrame:
    """Join candidate pairs to per-doc features and compute pairwise scores.

    Features are computed ONLY for docs that appear in at least one candidate
    pair (left-semi prune) — post-blocking volume, not corpus volume; the
    reference's deferred-verification economics (P8, hasher.py:133-148: pay
    for the expensive hash only after a cheap-key collision). The feature
    payload is slim (hash arrays + one long); text/html never travel."""
    cand_urls = (
        candidates.select(F.col("url_a").alias("url"))
        .union(candidates.select(F.col("url_b").alias("url")))
        .distinct()
    )
    tok_hashes = F.transform(tokens(F.col("text")), lambda t: F.xxhash64(t))
    feats = (
        pages_sig.join(cand_urls, "url", "left_semi")
        .select(
            "url",
            "full_hash",
            "shingle_set",
            simhash_udf(F.array_distinct(tok_hashes)).alias("simhash"),
            normalize_url(F.col("url")).alias("norm_url"),
        )
    )
    fa = feats.select(
        F.col("url").alias("url_a"),
        F.col("full_hash").alias("fh_a"),
        F.col("shingle_set").alias("sh_a"),
        F.col("simhash").alias("sim_a"),
        F.col("norm_url").alias("nu_a"),
    )
    fb = feats.select(
        F.col("url").alias("url_b"),
        F.col("full_hash").alias("fh_b"),
        F.col("shingle_set").alias("sh_b"),
        F.col("simhash").alias("sim_b"),
        F.col("norm_url").alias("nu_b"),
    )
    return (
        candidates.join(fa, "url_a").join(fb, "url_b")
        .withColumn("exact_match", F.col("fh_a") == F.col("fh_b"))
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .withColumn(
            "hamming",
            F.when(
                F.col("sim_a").isNotNull() & F.col("sim_b").isNotNull(),
                hamming(F.col("sim_a"), F.col("sim_b")),
            ),
        )
        .select(
            "url_a", "url_b", "channels", "exact_match", "jaccard", "hamming",
            "nu_a", "nu_b",
        )
    )


def verified_edges(scored: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Keep pairs passing any verification gate; emit schema.EDGES-shaped rows.

    A quick-hash or LSH collision with low true similarity is dropped here —
    the reference's false-positive elimination (tests/test_scanner.py:378-411)."""
    keep = (
        F.col("exact_match")
        | (F.col("jaccard") >= F.lit(cfg.tau_jaccard))
    )
    # Jaro-Winkler (row-at-a-time Python inside an Arrow batch) runs ONLY on
    # verified edges — never on the full candidate set. It is a reported
    # feature, not a gate, so this is free precision at ~0 cost.
    return (
        scored.filter(keep)
        .withColumn("url_jw", jaro_winkler_udf(F.col("nu_a"), F.col("nu_b")))
        .select(
            "url_a",
            "url_b",
            F.when(F.col("exact_match"), F.lit(1.0)).otherwise(F.col("jaccard")).alias("score"),
            F.when(F.col("exact_match"), F.lit("exact")).otherwise(F.lit("minhash")).alias("channel"),
            "url_jw",
        )
    )
