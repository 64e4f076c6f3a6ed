"""Checkpointed stages + per-partition lineage (north rule: every stage
checkpoints with per-partition lineage rows so a killed run resumes from the
last committed stage).

Storage: parquet directories under cfg.checkpoint_dir with an atomic _COMMITTED
marker per stage (Iceberg would give this via snapshots — its jars are not in
this image, so the store is format-agnostic behind this module; swap
`_write`/`_read` for `writeTo(...).append()` on a real deployment).

Lineage rows mirror the reference's `archives` bookkeeping table
(core/database.py:50-58: what was scanned, when, how many files) extended per
FIXTURES.md §4 with block-key ranges and score histograms.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- stage data -----------------------------------------------------------
    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _marker(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}._COMMITTED")

    def is_committed(self, stage: str) -> bool:
        return os.path.exists(self._marker(stage))

    def write_stage(self, stage: str, df: DataFrame, key_col: str | None = None) -> DataFrame:
        """Write a stage output + lineage, atomically: data first, lineage
        second, marker last. A crash between any two leaves the stage
        uncommitted → rerun redoes the whole stage (idempotent overwrite)."""
        path = self._dir(stage)
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        self._write_lineage(stage, out, key_col)
        with open(self._marker(stage), "w") as f:
            json.dump({"stage": stage, "committed_at": time.time()}, f)
        return out

    def read_stage(self, stage: str, require_sig_space: bool = False) -> DataFrame:
        if not self.is_committed(stage):
            raise FileNotFoundError(f"stage '{stage}' is not committed")
        df = self.spark.read.parquet(self._dir(stage))
        # Signature-space guard: a checkpoint written under a DIFFERENT
        # feature derivation (older engine version; foreign job) must not
        # resume silently — its band keys / simhash are join-incompatible
        # with freshly computed ones and the miss is a silent false negative.
        # One-row probe, not a scan: stages commit atomically, so every row
        # carries the same stamp.
        from dedupe_archived_files_spark.functions.minhash import SIGNATURE_SPACE

        if "sig_space" in df.columns:
            row = df.select("sig_space").first()
            found = row[0] if row is not None else None
            if found is not None and found != SIGNATURE_SPACE:
                raise ValueError(
                    f"checkpoint stage '{stage}' was written under signature "
                    f"space '{found}' but this engine derives "
                    f"'{SIGNATURE_SPACE}' — delete the stage (or its marker) "
                    f"to recompute it"
                )
        elif require_sig_space:
            raise ValueError(
                f"checkpoint stage '{stage}' has no sig_space column (written "
                f"by an engine predating signature-space stamping) — delete "
                f"the stage to recompute under '{SIGNATURE_SPACE}'"
            )
        return df

    def resume_or_compute(
        self,
        stage: str,
        compute,
        key_col: str | None = None,
        require_sig_space: bool = False,
    ) -> DataFrame:
        """The resume primitive: committed → read back (skip recompute,
        reference J6 semantics); else compute, commit, return."""
        if self.is_committed(stage):
            return self.read_stage(stage, require_sig_space=require_sig_space)
        return self.write_stage(stage, compute(), key_col)

    # -- lineage --------------------------------------------------------------
    def _write_lineage(self, stage: str, df: DataFrame, key_col: str | None) -> None:
        key = F.col(key_col).cast("string") if key_col else F.lit(None).cast("string")
        score = F.col("score") if "score" in df.columns else F.lit(None).cast("double")
        lineage = (
            df.select(
                F.spark_partition_id().alias("partition_id"),
                key.alias("k"),
                score.alias("s"),
            )
            .groupBy("partition_id")
            .agg(
                F.min("k").alias("block_key_min"),
                F.max("k").alias("block_key_max"),
                F.count("*").alias("row_count"),
                F.count("s").alias("pair_count"),
                F.array(
                    *[
                        F.coalesce(
                            F.sum(
                                F.when(
                                    F.least(F.floor(F.col("s") * 10), F.lit(9)) == i, 1
                                ).otherwise(0)
                            ),
                            F.lit(0),
                        ).cast("long")
                        for i in range(10)
                    ]
                ).alias("score_histogram"),
            )
            .withColumn("stage", F.lit(stage))
            .withColumn("snapshot_id", F.lit(int(time.time() * 1000)))
            .withColumn("committed_at", F.current_timestamp())
        )
        # dynamic partition overwrite keyed by stage: a crash between this
        # write and the marker makes the rerun REPLACE this stage's lineage
        # rows instead of re-appending duplicates — the idempotent-overwrite
        # contract now covers lineage, not just stage data. Written under a
        # VERSIONED subdir (_lineage_v2): the pre-partitioned layout wrote
        # flat parquet files into _lineage/, and mixing those with stage=<x>/
        # subdirs breaks partition discovery. Contract: lineage() reflects the
        # CURRENT committed state of each stage (committed_at/snapshot_id say
        # when); it is not an append-only history log.
        (
            lineage.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("stage")
            .parquet(os.path.join(self.root, "_lineage_v2"))
        )

    def lineage(self) -> DataFrame:
        v2 = os.path.join(self.root, "_lineage_v2")
        if os.path.exists(v2):
            return self.spark.read.parquet(v2)
        # legacy layout (flat, unpartitioned) — readable for old roots
        return self.spark.read.parquet(os.path.join(self.root, "_lineage"))
