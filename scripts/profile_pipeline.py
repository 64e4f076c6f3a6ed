"""Per-stage wall-clock breakdown of the dedupe pipeline (forces each stage
output through the noop sink in sequence — upstream results are cached so each
measurement isolates one stage's marginal cost).

Usage: python scripts/profile_pipeline.py [pages:<dir> | sf_dir] [cores]
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
    with_signature,
)
from dedupe_archived_files_spark.operators.clustering import (  # noqa: E402
    connected_components,
    resolve_clusters,
)
from dedupe_archived_files_spark.operators.extract import extract_pages  # noqa: E402
from dedupe_archived_files_spark.operators.scoring import (  # noqa: E402
    pair_features,
    verified_edges,
)
from dedupe_archived_files_spark.plans.pipeline import exact_star_edges  # noqa: E402
from dedupe_archived_files_spark.session import get_spark  # noqa: E402


def main() -> None:
    inp = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else (os.cpu_count() or 8)
    spark = get_spark(app_name="profile", master=f"local[{cores}]", shuffle_partitions=cores)
    cfg = PipelineConfig(tau_jaccard=0.9)

    if inp.startswith("pages:"):
        pages = spark.read.parquet(inp[len("pages:"):]).repartition(cores)
    else:
        pages = docs_as_pages(spark, inp).repartition(cores)
    pages = pages.cache()
    n = pages.count()

    t: dict[str, float] = {}

    def step(name, df, cache=True):
        nonlocal t
        if cache:
            df = df.cache()
        t0 = time.time()
        force(df)
        t[name] = round(time.time() - t0, 2)
        return df

    pt = step("1_extract", extract_pages(pages, cfg))
    sig = step("2_signature", with_signature(pt, cfg))
    keys = step("2b_block_keys", block_keys(sig, cfg))
    cand = step("3_candidates", candidate_pairs(sig, cfg))
    scored = step("4_scoring", pair_features(sig, cand))
    edges = step(
        "5_edges",
        verified_edges(scored, cfg)
        .select("url_a", "url_b", "score", "channel")
        .unionByName(exact_star_edges(pt, cfg))
        .dropDuplicates(["url_a", "url_b"]),
    )
    t0 = time.time()
    labels = connected_components(edges.select("url_a", "url_b"), cfg).cache()
    force(resolve_clusters(labels))
    t["6_cluster_resolve"] = round(time.time() - t0, 2)

    counts = {
        "pages": n,
        "candidates": cand.count(),
        "edges": edges.count(),
        "labels": labels.count(),
    }
    print(json.dumps({"cores": cores, "stage_secs": t, "counts": counts}))
    spark.stop()


if __name__ == "__main__":
    main()
