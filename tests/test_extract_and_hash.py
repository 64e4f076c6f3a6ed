"""Stage-1 extraction + hashing invariants, ported from the reference's test
strategy (SURVEY.md §5): oracle-style hash checks (tests/test_hasher.py:214-231),
empty-content semantics (tests/test_hasher.py:82-92), determinism
(tests/test_hasher.py:94-104), quarantine of corrupt rows
(tests/test_scanner.py:198-212).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from dedupe_archived_files_spark.config import PipelineConfig
from dedupe_archived_files_spark.functions.text import extract_text_py
from dedupe_archived_files_spark.operators.extract import eligible, extract_pages

CFG = PipelineConfig()


def test_extract_contract_oracle(spark, pages_dfs):
    """Byte-identical extracted text per url vs the frozen single-value
    reference implementation (the per-row invariant in BASELINE.json)."""
    pages, _, _ = pages_dfs
    out = extract_pages(pages, CFG)
    got = {r["url"]: r["text"] for r in out.select("url", "text").collect()}
    raw = {r["url"]: (r["html"], r["text"]) for r in pages.collect()}
    assert set(got) == set(raw)
    for url, (html, text) in raw.items():
        assert got[url] == extract_text_py(html, text), url


def test_full_hash_is_md5_of_utf8_text(spark, pages_dfs):
    """Oracle check in the style of reference tests/test_hasher.py:214-231."""
    pages, _, _ = pages_dfs
    out = extract_pages(pages, CFG)
    rows = out.filter(~F.col("quarantined")).select("url", "text", "full_hash").limit(50).collect()
    assert rows
    for r in rows:
        assert r["full_hash"] == hashlib.md5(r["text"].encode("utf-8")).hexdigest()


def test_empty_text_has_a_hash(spark, pages_dfs):
    """Zero-byte inputs hash fine and equal each other
    (reference tests/test_hasher.py:82-92, test_extensive.py:731-772)."""
    pages, _, _ = pages_dfs
    out = extract_pages(pages, CFG)
    empties = out.filter(F.col("url").startswith("https://empty.example.com")).collect()
    assert len(empties) == 2
    assert empties[0]["full_hash"] == empties[1]["full_hash"]
    assert empties[0]["size"] == 0
    assert not empties[0]["quarantined"]


def test_quick_hash_only_above_threshold(spark, pages_dfs):
    """Size-dispatch policy (reference hasher.py:49-58; models.py:97-98)."""
    pages, _, _ = pages_dfs
    out = extract_pages(pages, CFG).filter(~F.col("quarantined"))
    bad = out.filter(
        ((F.col("size") >= CFG.quick_hash_threshold) & F.col("quick_hash").isNull())
        | ((F.col("size") < CFG.quick_hash_threshold) & F.col("quick_hash").isNotNull())
    ).count()
    assert bad == 0
    assert out.filter(F.col("quick_hash").isNotNull()).count() > 0


def test_quick_hash_superset_property(spark, pages_dfs):
    """Equal full text ⇒ equal quick hash (blocking never loses a true match —
    reference J2 superset invariant, SURVEY.md §5)."""
    pages, _, _ = pages_dfs
    out = extract_pages(pages, CFG).filter(F.col("quick_hash").isNotNull())
    viol = (
        out.alias("a")
        .join(out.alias("b"), F.col("a.full_hash") == F.col("b.full_hash"))
        .filter(F.col("a.quick_hash") != F.col("b.quick_hash"))
        .count()
    )
    assert viol == 0


def test_corrupt_rows_quarantined(spark, pages_dfs):
    """html null + text null → quarantined, excluded from matching
    (reference tests/test_scanner.py:198-212)."""
    pages, _, _ = pages_dfs
    out = extract_pages(pages, CFG)
    q = out.filter(F.col("quarantined"))
    assert q.count() == 5
    assert all(u["url"].startswith("https://corrupt.example.com") for u in q.select("url").collect())
    assert out.filter(eligible(CFG) & F.col("quarantined")).count() == 0


def test_min_size_filter_symmetric(spark, pages_dfs):
    pages, _, _ = pages_dfs
    cfg = PipelineConfig(min_size=10)
    out = extract_pages(pages, cfg)
    kept = out.filter(eligible(cfg))
    assert kept.filter(F.col("size") < 10).count() == 0
    # empty pages are now excluded (below min size) — symmetric on any side
    assert kept.filter(F.col("url").startswith("https://empty.example.com")).count() == 0


def test_extraction_deterministic(spark, pages_dfs):
    pages, _, _ = pages_dfs
    a = extract_pages(pages, CFG).select("url", "full_hash")
    b = extract_pages(pages, CFG).select("url", "full_hash")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
