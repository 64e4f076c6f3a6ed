"""Exact-duplicate resolution — the reference's core join semantics as
DataFrame ops.

* J1 equi inner join on full_hash (reference core/database.py:232-241 +
  driver loop core/scanner.py:351-364): hash equality ONLY — size is not part
  of the key; many-to-many fan-out is preserved (3 sources × 1 target → 3
  matches, reference tests/test_database.py:178-200).
* J2 left-semi existence probe on quick_hash (core/database.py:254-258) — the
  cheap blocking tier.
* J3 verification join after blocking (core/scanner.py:366-387): quick-hash
  survivors are verified on full_hash; false-positive quick collisions drop
  out (tests/test_scanner.py:378-411).
* A1 group-by cluster formation (core/scanner.py:255-261).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedupe_archived_files_spark.config import PipelineConfig
from dedupe_archived_files_spark.operators.extract import eligible


def _pair_cols(a: str = "url_a", b: str = "url_b"):
    return a, b


def exact_duplicate_pairs(pages_text: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """Unordered pairs of distinct urls with byte-identical content.

    Self-equi-join on full_hash with url_a < url_b as the canonical unordered
    form. At scale this is one shuffle on full_hash; group sizes are bounded by
    the cluster-size cap applied in blocking (operators.blocking) — for the
    exact channel a giant group means a truly viral page and AQE skew-join
    handles the join-side imbalance.
    """
    cfg = cfg or PipelineConfig()
    base = pages_text.filter(eligible(cfg)).select("url", "full_hash")
    a = base.alias("a")
    b = base.alias("b")
    return (
        a.join(b, on="full_hash", how="inner")
        .filter(F.col("a.url") < F.col("b.url"))
        .select(
            F.col("a.url").alias("url_a"),
            F.col("b.url").alias("url_b"),
            F.col("full_hash"),
        )
    )


def exact_duplicate_clusters(pages_text: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """Cluster view without pair explosion: group by full_hash, keep groups of
    >= 2, canonical member = min url (deterministic; the reference's last-wins
    upsert, core/database.py:195-208, is replaced per SURVEY.md §7.4).

    This is the SCALE path for exact dedup: one groupBy shuffle, no self-join,
    no quadratic pair blow-up on viral pages.
    """
    cfg = cfg or PipelineConfig()
    return (
        pages_text.filter(eligible(cfg))
        .groupBy("full_hash")
        .agg(
            F.count("*").alias("cluster_size"),
            F.min("url").alias("canonical_url"),
            F.sort_array(F.collect_list("url")).alias("urls"),
        )
        .filter(F.col("cluster_size") >= 2)
    )


def duplicate_matches(
    source_pages_text: DataFrame,
    target_pages_text: DataFrame,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """Reference Phase-2 semantics (J1): every (target, source) pair sharing a
    full_hash is a match — many-to-many fan-out preserved.

    Output mirrors DuplicateMatch (core/models.py:27-37) flattened.
    """
    cfg = cfg or PipelineConfig()
    src = (
        source_pages_text.filter(eligible(cfg))
        .select(
            F.col("url").alias("source_url"),
            F.col("full_hash"),
            F.col("size").alias("source_size"),
        )
    )
    tgt = (
        target_pages_text.filter(eligible(cfg))
        .select(
            F.col("url").alias("target_url"),
            F.col("full_hash"),
            F.col("size").alias("target_size"),
        )
    )
    return tgt.join(src, on="full_hash", how="inner").select(
        "source_url", "target_url", "full_hash", "source_size", "target_size"
    )


def duplicate_matches_two_tier(
    source_pages_text: DataFrame,
    target_pages_text: DataFrame,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """Reference two-tier flow for LARGE inputs (J2 → J3): targets above the
    quick-hash threshold are first blocked by a left-semi join on quick_hash
    (cheap), and only survivors are verified on full_hash; small targets join
    directly on full_hash (reference scanner.py:341-387 policy).

    Result is identical to duplicate_matches (the quick tier is a superset
    filter); the point at 100 TB is that the semi-join prunes the expensive
    shuffle of non-matching large rows — and in a real deployment where the
    full hash of blocked-out rows is never computed at all, it prunes the
    hashing cost too (reference P8 deferred-hash upgrade).
    """
    cfg = cfg or PipelineConfig()
    src = source_pages_text.filter(eligible(cfg))
    tgt = target_pages_text.filter(eligible(cfg))

    small = tgt.filter(F.col("size") < cfg.quick_hash_threshold)
    big = tgt.filter(F.col("size") >= cfg.quick_hash_threshold)

    # J2: existence probe on the cheap key (distinct → small build side).
    quick_keys = src.filter(F.col("quick_hash").isNotNull()).select("quick_hash").distinct()
    big_survivors = big.join(quick_keys, on="quick_hash", how="left_semi")

    verified = duplicate_matches(src, big_survivors.unionByName(small), cfg)
    return verified


def cluster_rollup(matches: DataFrame) -> DataFrame:
    """A1: group matches per source identity with counts + member list
    (reference Dict[source_archive, List[DuplicateMatch]], scanner.py:255-261)."""
    return (
        matches.groupBy("source_url")
        .agg(
            F.count("*").alias("duplicate_count"),
            F.sort_array(F.collect_list("target_url")).alias("target_urls"),
        )
    )
