"""A/B the two candidate-generation physical shapes at bench scale
(VERDICT r1 #8 — the bucketed-aggregate-vs-self-join claim in
operators/blocking.py becomes a number, not a comment).

* bucketed: groupBy(channel,key) → member arrays → bounded explode
  (ObjectHashAggregate, ONE shuffle of the key table, no sort)
* self-join: keys ⋈ keys on (channel, key) — the textbook formulation
  (two exchanges of the full exploded key table + pair-level dedup)

Usage: python scripts/blocking_bench.py [pages:<dir>] [cores]
Prints one JSON line; appends a section to BENCH.md when run via scaling flow.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import force  # noqa: E402
from dedupe_archived_files_spark.config import PipelineConfig  # noqa: E402
from dedupe_archived_files_spark.operators.blocking import (  # noqa: E402
    block_keys,
    candidate_pairs,
)
from dedupe_archived_files_spark.operators.extract import (  # noqa: E402
    extract_with_signature,
)
from dedupe_archived_files_spark.session import get_spark  # noqa: E402


def self_join_pairs(sig, cfg):
    """The formulation the engine does NOT use: self-equi-join of the exploded
    key table, with the same 2..cap block bounds applied via a pre-computed
    per-key count (otherwise a viral key explodes the join)."""
    keys = block_keys(sig, cfg).filter(F.col("channel").isin("quick", "url", "minhash"))
    counts = keys.groupBy("channel", "key").agg(F.count("*").alias("n"))
    kept = counts.filter((F.col("n") >= 2) & (F.col("n") <= cfg.max_block_size)).select(
        "channel", "key"
    )
    k = keys.join(kept, ["channel", "key"])
    a, b = k.alias("a"), k.alias("b")
    return (
        a.join(
            b,
            (F.col("a.channel") == F.col("b.channel"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.url") < F.col("b.url")),
        )
        .select(
            F.col("a.channel").alias("channel"),
            F.col("a.url").alias("url_a"),
            F.col("b.url").alias("url_b"),
        )
        .groupBy("url_a", "url_b")
        .agg(F.array_sort(F.collect_set("channel")).alias("channels"))
    )


def main() -> None:
    inp = sys.argv[1] if len(sys.argv) > 1 else "pages:/tmp/scaling_pages_v3"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(app_name="blocking_bench", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    cfg = PipelineConfig(tau_jaccard=0.9)
    path = inp[len("pages:"):] if inp.startswith("pages:") else inp
    pages = spark.read.parquet(path).repartition(cores * 4)
    sig = extract_with_signature(pages, cfg).persist()
    n = sig.count()

    def best_of(fn, runs=3):
        fn()  # warm-up
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 2)

    bucketed = best_of(lambda: force(candidate_pairs(sig, cfg)))
    selfjoin = best_of(lambda: force(self_join_pairs(sig, cfg)))
    # both shapes must produce the identical candidate set
    same = (
        candidate_pairs(sig, cfg).select("url_a", "url_b")
        .exceptAll(self_join_pairs(sig, cfg).select("url_a", "url_b"))
        .count()
        == 0
    )
    print(json.dumps({
        "n_pages": n,
        "cores": cores,
        "bucketed_secs": bucketed,
        "self_join_secs": selfjoin,
        "speedup": round(selfjoin / bucketed, 2),
        "identical_pairs": same,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
