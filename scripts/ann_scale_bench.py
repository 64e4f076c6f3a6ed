"""ANN scale evidence: the two-level IVF at a corpus size where single-level
IVF REFUSES (per-query candidate budget unattainable at the 4096-centroid
cap — queries.py::embedding_ann_ivf), plus the sign-LSH path at the same
scale. Recall@5 for both is measured against the exact brute-force top-k
(embedding_topk_cosine — itself a distributed one-pass matmul, so this also
exercises the baseline at scale).

    python scripts/ann_scale_bench.py [n_vectors] [cores]

Default n_vectors = 4_000_000: single-level IVF's refusal point at default
budget/probes is n_probe*n/4096 > 2*4096 → n > ~2.8e6, so 4M sits past it.
Prints one JSON line with per-variant secs / recall@5 / measured candidate
volume vs the configured budget.

Corpus: deterministic clustered vectors (no external data): 64-dim, vector i
belongs to cluster i % n_clusters; both centroid and noise components come
from a counter-based splitmix64-style hash of (i, dim) — reproducible across
runs, partitionings, and batch sizes. The cluster count scales with n
(~CLUSTER_MEMBERS members per cluster at any n): constant per-cluster
membership keeps the ground truth well-separated — a query's true top-5 are
same-cluster (cos ~= the intra-cluster level) vs cross-cluster (~0), so
recall@5 measures bucket/cell ROUTING, the thing an ANN index actually
varies. (A fixed cluster count would make membership grow linearly in n and
the "top-5" a near-tie among hundreds of equidistant members — a tie-breaking
lottery, not an index metric. It is also the realistic web-dedupe regime:
duplicate groups do not grow 800-wide as the corpus grows; the number of
groups grows instead.)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dedupe_archived_files_spark import queries as Q  # noqa: E402
from dedupe_archived_files_spark.session import get_spark  # noqa: E402

CLUSTER_MEMBERS = 20  # ~members per cluster at any n (n_clusters = n / 20)
# Per-dim uniform noise half-width. Total noise power vs the unit centroid
# is 64*NOISE^2/3, so member-member cosine ~= 1/(1 + 64*NOISE^2/3): 0.09
# targets ~0.85 — the near-duplicate similarity regime — leaving the true
# top-5 well above the max cross-cluster cosine (~0.6 at 4M vectors in 64-d).
NOISE = 0.09

_C1 = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 constants (public domain)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def _hash_unit(ids: np.ndarray, salt: int) -> np.ndarray:
    """(len(ids), 64) deterministic pseudo-random matrix in [-1, 1): a
    splitmix64-style finalizer over (id, dim, salt) — identical for a given
    id regardless of batch composition or partitioning. The xor-shift rounds
    matter: a plain affine hash (a*id + b*dim) % m makes two ids' rows differ
    by a CONSTANT across all dims — rank-1 'noise' that collapses every
    cluster member onto (nearly) one vector and turns the top-5 ground truth
    into an exact tie at cos=1."""
    J = np.arange(64, dtype=np.uint64)[None, :]
    x = ids.astype(np.uint64)[:, None] * _C1 + (
        J + np.uint64(salt) * np.uint64(64) + np.uint64(1)
    ) * _C2
    x ^= x >> np.uint64(30)
    x *= _C2
    x ^= x >> np.uint64(27)
    x *= _C3
    x ^= x >> np.uint64(31)
    return (x.astype(np.float64) / float(2**64)) * 2.0 - 1.0


def gen_embeddings(spark, n: int, out_dir: str, parts: int) -> None:
    n_clusters = max(1000, n // CLUSTER_MEMBERS)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            cl = ids % n_clusters
            cent = _hash_unit(cl, salt=1)
            cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
            noise = _hash_unit(ids, salt=2) * NOISE
            V = (cent + noise).astype(np.float32)
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": list(V),
                    "label": cl.astype(np.int32),
                }
            )

    (
        spark.range(0, n, numPartitions=parts)
        .mapInPandas(gen, "vec_id long, embedding array<float>, label int")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "embeddings.parquet"))
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)
    )
    spark = get_spark(
        app_name="ann_scale_bench",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 32),
    )
    sf_dir = tempfile.mkdtemp(prefix="ann_scale_")
    t0 = time.time()
    gen_embeddings(spark, n, sf_dir, parts=max(cores * 2, 64))
    gen_secs = time.time() - t0

    out: dict = {"n_vectors": n, "cores": cores, "gen_secs": round(gen_secs, 1)}

    # single-level IVF must REFUSE here (never silently linear in n)
    try:
        Q.embedding_ann_ivf(spark, sf_dir, n_hint=n)
        out["single_level_refused"] = False
    except NotImplementedError:
        out["single_level_refused"] = True

    t0 = time.time()
    truth_rows = Q.embedding_topk_cosine(spark, sf_dir).collect()
    out["brute_force_secs"] = round(time.time() - t0, 1)
    truth = {(r["query_id"], r["neighbor_id"]) for r in truth_rows}

    stats: dict = {}
    t0 = time.time()
    ivf2_rows = Q.embedding_ann_ivf2(spark, sf_dir, n_hint=n, stats=stats).collect()
    out["ivf2_secs"] = round(time.time() - t0, 1)
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf2_rows}
    out["ivf2_recall_at_5"] = round(len(truth & got) / max(1, len(truth)), 3)
    out["ivf2_k1"], out["ivf2_k2"] = stats["k1"], stats["k2"]
    out["ivf2_cand_per_query"] = round(stats["cand_per_query"], 1)
    out["cand_budget"] = Q.IVF_TARGET_CAND_PER_QUERY

    t0 = time.time()
    lsh_rows = Q.embedding_ann_lsh(spark, sf_dir, n_hint=n).collect()
    out["lsh_secs"] = round(time.time() - t0, 1)
    got = {(r["query_id"], r["neighbor_id"]) for r in lsh_rows}
    out["lsh_recall_at_5"] = round(len(truth & got) / max(1, len(truth)), 3)

    print(json.dumps(out))
    # persist for BENCH.md regeneration (scripts/scaling_bench.py embeds the
    # latest ANN-at-scale evidence when this artifact is present)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "ANN_SCALE.json"), "w") as f:
        json.dump(out, f)
        f.write("\n")
    shutil.rmtree(sf_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
