"""Declared schemas — never inferred (the reference declares its schema twice:
dataclasses in core/models.py and DDL in core/database.py:45-112).

``PAGES`` is the task's input_hint shape; the rest are stage outputs.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input table (input_hint): one row per crawled page.
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Stage 1 output: extracted + hashed pages (reference FileEntry, core/models.py:10-23).
PAGES_TEXT = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("size", T.LongType(), False),
        T.StructField("full_hash", T.StringType(), True),
        T.StructField("quick_hash", T.StringType(), True),
        T.StructField("quarantined", T.BooleanType(), False),
        T.StructField("quarantine_reason", T.StringType(), True),
    ]
)

# Ground truth for the F1 gate (FIXTURES.md §2).
LABELED_PAIRS = T.StructType(
    [
        T.StructField("url_a", T.StringType(), False),
        T.StructField("url_b", T.StringType(), False),
        T.StructField("is_dup", T.BooleanType(), False),
        T.StructField("kind", T.StringType(), False),  # exact | near | hard_negative
        T.StructField("block_key", T.StringType(), True),
    ]
)

# Stage 3 output: scored candidate pairs.
EDGES = T.StructType(
    [
        T.StructField("url_a", T.StringType(), False),
        T.StructField("url_b", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("channel", T.StringType(), False),  # exact | minhash | simhash | url
    ]
)

# Stage 5 output (FIXTURES.md §3).
CLUSTERS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("cluster_id", T.StringType(), False),
        T.StructField("canonical_url", T.StringType(), False),
    ]
)

# Per-partition lineage rows (FIXTURES.md §4; north rule "per-partition lineage").
LINEAGE = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("block_key_min", T.StringType(), True),
        T.StructField("block_key_max", T.StringType(), True),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("pair_count", T.LongType(), True),
        T.StructField("score_histogram", T.ArrayType(T.LongType()), True),
        T.StructField("snapshot_id", T.LongType(), False),
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)
