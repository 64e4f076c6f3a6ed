"""Exact-duplicate join semantics — the reference's correctness invariants
(SURVEY.md §5 'invariants to port')."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_archived_files_spark.config import PipelineConfig
from dedupe_archived_files_spark.operators.dedupe import (
    cluster_rollup,
    duplicate_matches,
    duplicate_matches_two_tier,
    exact_duplicate_clusters,
    exact_duplicate_pairs,
)
from dedupe_archived_files_spark.operators.extract import extract_pages

CFG = PipelineConfig()


def _pt(pages_dfs, spark):
    pages, labeled, expected = pages_dfs
    return extract_pages(pages, CFG).cache(), labeled, expected


def test_exact_pairs_match_planted_labels(spark, pages_dfs):
    """Every planted exact pair is found; no labeled non-dup appears."""
    pt, labeled, _ = _pt(pages_dfs, spark)
    got = exact_duplicate_pairs(pt, CFG).select("url_a", "url_b")
    planted = labeled.filter((F.col("kind") == "exact") & F.col("is_dup")).select("url_a", "url_b")
    missing = planted.exceptAll(got).count()
    assert missing == 0
    # labeled hard negatives (e.g. the quick-hash-collision pair) must NOT match
    negs = labeled.filter(~F.col("is_dup")).select("url_a", "url_b")
    false_pos = negs.intersect(got).count()
    assert false_pos == 0


def test_every_fifth_corpus_exact_count(spark, pages_dfs):
    """100 originals, every 5th mirrored → exactly 20 mirror matches
    (reference tests/test_extensive.py:684-725)."""
    pt, _, _ = _pt(pages_dfs, spark)
    got = exact_duplicate_pairs(pt, CFG)
    n = got.filter(
        F.col("url_a").startswith("https://corpus.example.com")
        & F.col("url_b").startswith("https://mirror.example.com")
    ).count()
    assert n == 20


def test_many_to_many_fanout(spark, pages_dfs):
    """k identical copies → C(k,2) pairs (reference tests/test_database.py:178-200:
    3 rows sharing a hash → 3 matches)."""
    pt, _, _ = _pt(pages_dfs, spark)
    pairs = exact_duplicate_pairs(pt, CFG)
    g5 = pairs.filter(F.col("url_a").contains("/exact/g5/")).count()
    assert g5 == 10  # C(5,2)
    g3 = pairs.filter(F.col("url_a").contains("/exact/g3/")).count()
    assert g3 == 3  # C(3,2)


def test_clusters_have_min_url_canonical(spark, pages_dfs):
    pt, _, _ = _pt(pages_dfs, spark)
    clusters = exact_duplicate_clusters(pt, CFG)
    bad = clusters.filter(F.col("canonical_url") != F.array_min("urls")).count()
    assert bad == 0
    assert clusters.filter(F.col("cluster_size") >= 5).count() >= 1


def test_source_target_matches(spark, pages_dfs):
    """Phase-2 J1: target×source fan-out; 3 targets × 1 source → 3 matches
    (reference tests/test_scanner.py:322-360)."""
    pages, _, _ = pages_dfs
    pt = extract_pages(pages, CFG)
    src = pt.filter(F.col("url").contains("/exact/g0/"))  # 2 copies
    tgt = pt.filter(F.col("url").contains("/exact/g0/") | F.col("url").contains("/base/"))
    m = duplicate_matches(src, tgt, CFG)
    # 2 sources × 2 targets sharing the hash = 4 matches
    assert m.count() == 4


def test_two_tier_equals_single_tier(spark, pages_dfs):
    """Blocking is a superset filter: two-tier result == direct full-hash join
    (reference J2/J3 invariant; collision pair verified out,
    tests/test_scanner.py:378-411)."""
    pt, _, _ = _pt(pages_dfs, spark)
    direct = duplicate_matches(pt, pt, CFG).select("source_url", "target_url")
    tiered = duplicate_matches_two_tier(pt, pt, CFG).select("source_url", "target_url")
    assert direct.exceptAll(tiered).count() == 0
    assert tiered.exceptAll(direct).count() == 0
    # and the quick-collision pair is absent
    assert (
        tiered.filter(
            F.col("source_url").contains("quickcollide")
            & F.col("target_url").contains("quickcollide")
            & (F.col("source_url") != F.col("target_url"))
        ).count()
        == 0
    )


def test_unicode_and_long_urls_match(spark, pages_dfs):
    pt, _, _ = _pt(pages_dfs, spark)
    pairs = exact_duplicate_pairs(pt, CFG)
    assert pairs.filter(F.col("url_a").startswith("https://unicode.example.com")).count() == 1
    assert pairs.filter(F.col("url_a").startswith("https://long.example.com")).count() == 1
    # content identity ignores path depth (deep vs shallow url)
    assert (
        pairs.filter(F.col("url_b").startswith("https://shallow.example.com")).count() == 1
    )


def test_cluster_rollup_counts(spark, pages_dfs):
    pt, _, _ = _pt(pages_dfs, spark)
    m = duplicate_matches(
        pt.filter(F.col("url").contains("/exact/")),
        pt.filter(F.col("url").contains("/exact/")),
        CFG,
    ).filter(F.col("source_url") != F.col("target_url"))
    roll = cluster_rollup(m)
    # the 5-copy group: each source has 4 targets
    r = roll.filter(F.col("source_url").contains("/exact/g5/")).collect()
    assert len(r) == 5 and all(x["duplicate_count"] == 4 for x in r)
