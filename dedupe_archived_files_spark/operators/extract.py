"""Stage 1 — extract: pages → pages_text.

Reference analogue: Phase-1 archive scan (core/scanner.py:102-199): enumerate
entries (S3-S10), size-filter (P2), hash (P6/P7), project to FileEntry (P1).
Here: decode `html` → frozen-contract text, compute size + two-tier hashes,
quarantine undecodable rows instead of failing the job (reference: extraction
errors are caught per-archive and the scan continues, core/scanner.py:70-72).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dedupe_archived_files_spark.config import PipelineConfig
from dedupe_archived_files_spark.functions.hashing import two_tier_hashes
from dedupe_archived_files_spark.functions.text import extract_text_udf


def extract_pages(pages: DataFrame, cfg: PipelineConfig | None = None,
                  algo: str = "md5") -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → pages_text (schema.PAGES_TEXT).

    The `html` column is dropped on output so downstream stages never carry
    multi-KB binary payloads through shuffles, and parquet scans of later
    stages column-prune it away (SURVEY.md §4 'keep html out of
    post-extraction stages').
    """
    cfg = (cfg or PipelineConfig()).validated()

    df = pages.withColumn("text", extract_text_udf(F.col("html"), F.col("text")))
    df = df.withColumn(
        "size", F.coalesce(F.octet_length(F.col("text")).cast("long"), F.lit(0).cast("long"))
    )
    full, quick = two_tier_hashes(
        F.col("text"), F.col("size"),
        quick_size=cfg.quick_hash_size, threshold=cfg.quick_hash_threshold, algo=algo,
    )
    df = (
        df.withColumn("full_hash", full)
        .withColumn("quick_hash", quick)
        .withColumn("quarantined", F.col("text").isNull())
        .withColumn(
            "quarantine_reason",
            F.when(F.col("text").isNull(), F.lit("no html and no text")),
        )
    )
    return df.select(
        "url", "warc_ts", "text", "lang", "size",
        "full_hash", "quick_hash", "quarantined", "quarantine_reason",
    )


def extract_with_signature(pages: DataFrame, cfg: PipelineConfig | None = None,
                           algo: str = "md5") -> DataFrame:
    """Fused stages 1+2: pages → pages_text ⊕ (title, shingle_set, signature,
    band_keys, simhash) with a SINGLE Python crossing (see
    functions.minhash.make_featurize_udf for why chaining two pandas UDFs in
    one stage is pathological). All hash columns are JVM-side over the UDF's
    text output; norm_url is a JVM regexp chain computed once here so no
    downstream stage re-derives it."""
    from dedupe_archived_files_spark.functions.minhash import (
        SIGNATURE_SPACE,
        make_featurize_udf,
    )
    from dedupe_archived_files_spark.functions.text import normalize_url

    cfg = (cfg or PipelineConfig()).validated()
    fused = make_featurize_udf(
        cfg.shingle_size, cfg.minhash_perms, cfg.lsh_bands, with_extract=True
    )
    df = pages.withColumn("_x", fused(F.col("html"), F.col("text")))
    df = (
        df.withColumn("text", F.col("_x.text"))
        .withColumn("title", F.col("_x.title"))
        .withColumn("shingle_set", F.col("_x.shingle_set"))
        .withColumn("signature", F.col("_x.signature"))
        .withColumn("band_keys", F.col("_x.band_keys"))
        .withColumn("simhash", F.col("_x.simhash"))
        .drop("_x")
    )
    df = df.withColumn(
        "size", F.coalesce(F.octet_length(F.col("text")).cast("long"), F.lit(0).cast("long"))
    )
    full, quick = two_tier_hashes(
        F.col("text"), F.col("size"),
        quick_size=cfg.quick_hash_size, threshold=cfg.quick_hash_threshold, algo=algo,
    )
    df = (
        df.withColumn("full_hash", full)
        .withColumn("quick_hash", quick)
        .withColumn("quarantined", F.col("text").isNull())
        .withColumn(
            "quarantine_reason",
            F.when(F.col("text").isNull(), F.lit("no html and no text")),
        )
        .withColumn("norm_url", normalize_url(F.col("url")))
        .withColumn("sig_space", F.lit(SIGNATURE_SPACE))
    )
    return df.select(
        "url", "warc_ts", "text", "lang", "size",
        "full_hash", "quick_hash", "quarantined", "quarantine_reason",
        "title", "shingle_set", "signature", "band_keys", "simhash",
        "norm_url", "sig_space",
    )


def eligible(cfg: PipelineConfig) -> Column:
    """Rows allowed to participate in matching: not quarantined and at least
    `min_size` bytes — the min-size filter is symmetric on both join sides
    (reference core/scanner.py:143-145 and :304-306)."""
    return (~F.col("quarantined")) & (F.col("size") >= F.lit(cfg.min_size))
