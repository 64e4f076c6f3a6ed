"""Round-2 gate tests: salted blocking keeps all pairs, the simhash Hamming
gate is a real OR-channel, both featurizer paths share one signature space,
ANN recall vs the brute-force baseline, title Jaro-Winkler channel, and the
skip-marked xxh3 reference-parity oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_archived_files_spark.config import PipelineConfig
from dedupe_archived_files_spark.operators.blocking import (
    block_keys,
    candidate_pairs,
    with_signature,
)
from dedupe_archived_files_spark.operators.extract import (
    extract_pages,
    extract_with_signature,
)
from dedupe_archived_files_spark.operators.scoring import pair_features, verified_edges

CFG = PipelineConfig()


# ---------------------------------------------------------------------------
# Salted pair generation (north rule: salted repartitioning for hot keys)
# ---------------------------------------------------------------------------

def test_salting_preserves_every_pair(spark):
    """A near-cap hot block must yield the IDENTICAL pair set whether it is
    pair-exploded in one task (cell >= n) or salted across grid cells
    (cell < n) — salting parallelizes, never drops."""
    n = 60
    rows = [(f"https://hot.example.com/p{i:03d}",) for i in range(n)]
    pages = spark.createDataFrame(rows, ["url"]).select(
        "url",
        F.lit("2025-06-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        # unique text per row: only the shared normalized-url-ish key blocks them
        F.concat(F.lit("totally unique body text number "), F.col("url")).alias("text"),
        F.lit("en").alias("lang"),
    )
    # force every row into ONE url-channel block via a hot normalized key:
    # strip the path by overriding norm_url after signature derivation
    sig = with_signature(extract_pages(pages, CFG), CFG).withColumn(
        "norm_url", F.lit("hot.example.com")
    )
    unsalted_cfg = PipelineConfig(max_block_size=100, salt_buckets=1)   # cell=100 >= n
    salted_cfg = PipelineConfig(max_block_size=100, salt_buckets=16)    # cell=7 << n
    unsalted = {
        (r["url_a"], r["url_b"])
        for r in candidate_pairs(sig, unsalted_cfg, channels=("url",)).collect()
    }
    salted = {
        (r["url_a"], r["url_b"])
        for r in candidate_pairs(sig, salted_cfg, channels=("url",)).collect()
    }
    assert len(unsalted) == n * (n - 1) // 2
    assert salted == unsalted


def test_salting_still_respects_block_cap(spark):
    """Blocks over max_block_size stay capped (dropped) under salting."""
    n = 30
    rows = [(f"https://cap.example.com/p{i:03d}",) for i in range(n)]
    pages = spark.createDataFrame(rows, ["url"]).select(
        "url",
        F.lit("2025-06-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.concat(F.lit("unique body "), F.col("url")).alias("text"),
        F.lit("en").alias("lang"),
    )
    sig = with_signature(extract_pages(pages, CFG), CFG).withColumn(
        "norm_url", F.lit("cap.example.com")
    )
    cfg = PipelineConfig(max_block_size=20, salt_buckets=4)  # block of 30 > cap
    assert candidate_pairs(sig, cfg, channels=("url",)).count() == 0


# ---------------------------------------------------------------------------
# SimHash gate as a real recall channel (VERDICT r1 #2)
# ---------------------------------------------------------------------------

def _mk_pages(spark, rows):
    return spark.createDataFrame(
        [(u, t) for u, t in rows], ["url", "text"]
    ).select(
        "url",
        F.lit("2025-06-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("en").alias("lang"),
    )


def test_simhash_gate_adds_recall_below_tau(spark):
    """A pair whose Jaccard lands just below tau but whose shingle-simhash
    Hamming is within max_hamming must be kept, labeled channel='simhash' —
    the second near-dup channel contributes to recall, not just a report."""
    import random

    rng = random.Random(3)
    vocab = [f"tok{i}" for i in range(2000)]
    base = [rng.choice(vocab) for _ in range(300)]
    edited = list(base)
    for p in rng.sample(range(300), 6):  # 2% edit → J = 0.886, hamming = 8
        edited[p] = rng.choice(vocab)
    pages = _mk_pages(
        spark, [("https://a.example.com/x", " ".join(base)),
                ("https://b.example.com/y", " ".join(edited))]
    )
    # tau set above the pair's true Jaccard so ONLY the simhash gate can keep it
    cfg = PipelineConfig(tau_jaccard=0.95, max_hamming=10)
    sig = with_signature(extract_pages(pages, cfg), cfg)
    cand = candidate_pairs(sig, cfg)
    edges = verified_edges(pair_features(sig, cand), cfg).collect()
    assert len(edges) == 1, edges
    assert edges[0]["channel"] == "simhash"
    assert 0.0 < edges[0]["score"] <= 1.0
    # sanity: the jaccard gate alone would have dropped it
    scored = pair_features(sig, cand).collect()[0]
    assert scored["jaccard"] < 0.95
    assert scored["hamming"] <= 10


def test_simhash_gate_rejects_heavy_edits(spark, pages_dfs):
    """Planted hard negatives (J <= 0.47) must NOT leak through the hamming
    gate at the default max_hamming (separation measured in functions.minhash)."""
    pages, labeled, _ = pages_dfs
    cfg = PipelineConfig(tau_jaccard=0.85)
    sig = with_signature(extract_pages(pages, cfg), cfg)
    cand = candidate_pairs(sig, cfg)
    edges = verified_edges(pair_features(sig, cand), cfg)
    negs = labeled.filter(~F.col("is_dup")).select("url_a", "url_b")
    assert negs.intersect(edges.select("url_a", "url_b")).count() == 0


# ---------------------------------------------------------------------------
# One signature space across both featurizer paths (ADVICE r1)
# ---------------------------------------------------------------------------

def test_fused_and_from_text_paths_agree(spark, pages_dfs):
    """extract_with_signature(html→features) and with_signature(text→features)
    must produce byte-identical signatures, band keys and simhashes for the
    same content — rows from either path are join-compatible."""
    pages, _, _ = pages_dfs
    a = extract_with_signature(pages, CFG).select(
        "url", "shingle_set", "signature", "band_keys", "simhash", "sig_space"
    )
    b = with_signature(extract_pages(pages, CFG), CFG).select(
        "url", "shingle_set", "signature", "band_keys", "simhash", "sig_space"
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


# ---------------------------------------------------------------------------
# Title Jaro-Winkler channel (north rule: JW on titles/urls)
# ---------------------------------------------------------------------------

def test_title_jw_on_verified_edges(spark):
    """Same-title near-dup pages get a title_jw ≈ 1 feature on their edge."""
    body = " ".join(f"word{i}" for i in range(200))
    html_a = f"<html><title>Shared Title</title><body>{body}</body></html>".encode()
    html_b = f"<html><title>Shared Titles</title><body>{body} extra</body></html>".encode()
    pages = spark.createDataFrame(
        [("https://t.example.com/a", html_a), ("https://t.example.com/b", html_b)],
        ["url", "html"],
    ).select(
        "url",
        F.lit("2025-06-01 00:00:00").cast("timestamp").alias("warc_ts"),
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )
    cfg = PipelineConfig(tau_jaccard=0.8)
    sig = extract_with_signature(pages, cfg)
    edges = verified_edges(pair_features(sig, candidate_pairs(sig, cfg)), cfg).collect()
    assert len(edges) == 1
    assert edges[0]["title_jw"] is not None and edges[0]["title_jw"] > 0.9


# ---------------------------------------------------------------------------
# ANN recall vs brute force (VERDICT r1 #3)
# ---------------------------------------------------------------------------

def test_ann_recall_at_5(spark):
    """Multi-table sign-LSH must recover >= 0.9 of the brute-force top-5
    neighbor sets for the 20 query vectors (self-oracle: no DuckDB needed)."""
    from dedupe_archived_files_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    truth = Q.embedding_topk_cosine(spark, sf).collect()
    ann = Q.embedding_ann_lsh(spark, sf).collect()
    t = {(r["query_id"], r["neighbor_id"]) for r in truth}
    got = {(r["query_id"], r["neighbor_id"]) for r in ann}
    recall = len(t & got) / len(t)
    print(f"\n[gate] embedding_ann_lsh recall@5 = {recall:.3f} (>= 0.9 required)")
    assert recall >= 0.9, f"ANN recall@5 = {recall:.3f}"


def test_ann_ivf_recall_at_5(spark):
    """The IVF coarse-quantizer variant must also recover >= 0.9 of the
    brute-force top-5 sets at its default n_probe."""
    from dedupe_archived_files_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    truth = Q.embedding_topk_cosine(spark, sf).collect()
    ivf = Q.embedding_ann_ivf(spark, sf).collect()
    t = {(r["query_id"], r["neighbor_id"]) for r in truth}
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    recall = len(t & got) / len(t)
    print(f"\n[gate] embedding_ann_ivf recall@5 = {recall:.3f} (>= 0.9 required)")
    assert recall >= 0.9, f"IVF recall@5 = {recall:.3f}"


def test_ann_ivf2_recall_at_5(spark):
    """The two-level IVF (distributed per-cell sub-quantizer) must also
    recover >= 0.9 of the brute-force top-5 sets at its defaults."""
    from dedupe_archived_files_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    truth = Q.embedding_topk_cosine(spark, sf).collect()
    ivf2 = Q.embedding_ann_ivf2(spark, sf).collect()
    t = {(r["query_id"], r["neighbor_id"]) for r in truth}
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf2}
    recall = len(t & got) / len(t)
    print(f"\n[gate] embedding_ann_ivf2 recall@5 = {recall:.3f} (>= 0.9 required)")
    assert recall >= 0.9, f"IVF2 recall@5 = {recall:.3f}"


def test_ivf2_params_budget(spark):
    """Two-level sizing holds the per-query candidate budget across the whole
    range single-level IVF refuses (n to ~1.2e8 at defaults): expected rerank
    volume p_eff*n/(k1*k2) <= budget, with k1/k2 under their memory/training
    caps. Past the two-level range it refuses naming the third rung — never a
    silent linear-in-n degrade at ANY scale."""
    from dedupe_archived_files_spark import queries as Q

    p_eff = Q.IVF2_N_PROBE1 * Q.IVF2_N_PROBE2
    for n in (1_000, 100_000, 1_400_000, 10_000_000, 100_000_000):
        k1, k2 = Q.ivf2_params(n)
        assert k1 <= Q.IVF_MAX_CENTROIDS and k2 <= Q.IVF2_MAX_SUB, (n, k1, k2)
        assert p_eff * n / (k1 * k2) <= Q.IVF_TARGET_CAND_PER_QUERY, (n, k1, k2)
    # single-level refuses at 1e7; two-level must still size it
    with pytest.raises(NotImplementedError):
        Q.embedding_ann_ivf(spark, "/root/testdata/sf0.001", n_hint=10_000_000)
    assert Q.ivf2_params(10_000_000)
    with pytest.raises(NotImplementedError, match="third"):
        Q.ivf2_params(10**10)


def test_ivf_candidate_budget(spark):
    """VERDICT r4 #3: IVF candidate volume is bounded by config, not merely
    documented. The derived cell count holds n_probe*n/k <= budget across the
    whole single-level range; past the range (centroid cap exhausted) the
    query REFUSES with the second-level pointer instead of silently reranking
    linear-in-n candidate sets."""
    from dedupe_archived_files_spark import queries as Q

    for n in (1_000, 10_000, 100_000, 1_000_000):
        k = Q.ivf_n_centroids(n)
        assert k <= Q.IVF_MAX_CENTROIDS
        assert Q.IVF_N_PROBE * n / k <= Q.IVF_TARGET_CAND_PER_QUERY, (n, k)
    with pytest.raises(NotImplementedError, match="second-level"):
        Q.embedding_ann_ivf(spark, "/root/testdata/sf0.001", n_hint=10**9)


# ---------------------------------------------------------------------------
# xxh3 reference-parity oracle (skip-marked until the wheel exists)
# ---------------------------------------------------------------------------

def test_xxh3_digest_parity(spark):
    """Oracle check in the reference's own style (tests/test_hasher.py:214-231):
    the engine's xxh3 algo must equal xxhash.xxh3_64(content).hexdigest() —
    byte parity with the reference's hash identity (core/hasher.py:88).
    Skip-marked: proven automatically the moment the xxhash wheel exists."""
    xxhash = pytest.importorskip("xxhash", reason="xxhash wheel not in this image")
    from dedupe_archived_files_spark.functions.hashing import full_hash

    rows = [("u1", "hello world"), ("u2", ""), ("u3", "ünïcode 文件")]
    df = spark.createDataFrame(rows, ["url", "text"])
    got = {
        r["url"]: r["h"]
        for r in df.select("url", full_hash(F.col("text"), algo="xxh3").alias("h")).collect()
    }
    for url, text in rows:
        assert got[url] == xxhash.xxh3_64(text.encode("utf-8")).hexdigest()
