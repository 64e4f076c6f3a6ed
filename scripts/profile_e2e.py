"""Phase-instrumented run_pipeline: where does the wall-clock go at a given
parallelism level? Materializes each stage boundary eagerly and times it, so
the per-phase deltas expose serial fractions (Amdahl analysis for the
scaling-efficiency gate in BENCH.md).

Usage: python scripts/profile_e2e.py <cores> [pages:<dir> | sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import docs_as_pages, force  # noqa: E402
from dedupe_archived_files_spark.config import PipelineConfig  # noqa: E402
from dedupe_archived_files_spark.operators.blocking import (  # noqa: E402
    block_keys,
    candidate_pairs,
    oversized_blocks,
)
from dedupe_archived_files_spark.operators.clustering import (  # noqa: E402
    connected_components,
    resolve_clusters,
)
from dedupe_archived_files_spark.operators.extract import (  # noqa: E402
    extract_with_signature,
)
from dedupe_archived_files_spark.operators.scoring import (  # noqa: E402
    pair_features,
    verified_edges,
)
from dedupe_archived_files_spark.plans.pipeline import exact_star_edges  # noqa: E402
from dedupe_archived_files_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    inp = sys.argv[2] if len(sys.argv) > 2 else "pages:/tmp/scaling_pages_v2"
    spark = get_spark(app_name=f"profile_e2e_{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    cfg = PipelineConfig(tau_jaccard=0.9)

    if inp.startswith("pages:"):
        pages = spark.read.parquet(inp[len("pages:"):]).repartition(cores)
    else:
        pages = docs_as_pages(spark, inp).repartition(cores)
    n = pages.count()

    t: dict[str, float] = {}
    counts: dict[str, int] = {"pages": n}

    def cpu():
        with open("/proc/stat") as f:
            p = f.readline().split()[1:8]
        return [int(x) for x in p]

    _c = {"v": cpu()}

    def mark(name: str, t0: float) -> None:
        c1 = cpu()
        d = [b - a for a, b in zip(_c["v"], c1)]
        _c["v"] = c1
        t[name] = round(time.time() - t0, 2)
        t[name + "_user"] = d[0] // 100
        t[name + "_sys"] = d[2] // 100

    # warm-up (JIT / Arrow / python worker pool) on a tiny slice
    force(extract_with_signature(pages.limit(256), cfg))

    t0 = time.time()
    sig = extract_with_signature(pages, cfg).persist()
    force(sig)
    mark("1_extract_signature", t0)

    t0 = time.time()
    cand = candidate_pairs(sig, cfg).persist()
    force(cand)
    mark("2_candidates", t0)
    counts["candidates"] = cand.count()

    t0 = time.time()
    scored = pair_features(sig, cand)
    near = verified_edges(scored, cfg).select("url_a", "url_b", "score", "channel")
    exact = exact_star_edges(sig, cfg)
    edges = (
        near.unionByName(exact)
        .dropDuplicates(["url_a", "url_b"])
        .persist()
    )
    force(edges)
    mark("3_score_edges", t0)
    counts["edges"] = edges.count()

    t0 = time.time()
    labels = connected_components(edges.select("url_a", "url_b"), cfg)
    force(resolve_clusters(labels))
    mark("4_cluster_resolve", t0)

    print(json.dumps({"cores": cores, "phase_secs": t, "counts": counts,
                      "total": round(sum(t.values()), 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
