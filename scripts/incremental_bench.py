"""Incremental-economics evidence (VERDICT r4 #1): cost of a 1-row delta vs a
from-scratch run of the checkpointed pipeline on the same corpus.

The reference's core economics are skip-unchanged at every tier
(core/scanner.py:119-134 skips whole archives; :332-339 skips unchanged target
hashes). This engine's analogue: a re-crawl featurizes ONLY new/changed urls
and recomputes edges ONLY over blocks whose membership the delta touched
(plans/pipeline.py::scoped_incremental_edges). This script measures both:

    python scripts/incremental_bench.py [n_pages] [cores]

Prints one JSON line:
    {"n_pages": N, "full_secs": F, "delta_secs": D, "delta_speedup": F/D, ...}

Protocol: synthesize a deterministic corpus (input_hint shape, seed 42), run
the checkpointed pipeline from scratch (timed), then re-run against the SAME
checkpoint root with exactly one url re-crawled (newer warc_ts, changed text)
and time that. Both runs pay full JVM/stage-commit costs; the delta run's
floor is the O(log n) connected-components pass + stage parquet rewrites,
which is why speedup grows with corpus size (featurize+blocking+scoring drop
from O(corpus) to O(changed blocks)).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dedupe_archived_files_spark import schema as S  # noqa: E402
from dedupe_archived_files_spark.config import PipelineConfig  # noqa: E402
from dedupe_archived_files_spark.plans.pipeline import (  # noqa: E402
    run_pipeline_checkpointed,
)
from dedupe_archived_files_spark.session import get_spark  # noqa: E402
from dedupe_archived_files_spark.synth import generate_corpus  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)
    )
    spark = get_spark(
        app_name="incremental_bench",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    c = generate_corpus(seed=42, n_base=n_pages)
    pdf = pd.DataFrame(c.pages, columns=["url", "warc_ts", "html", "text", "lang"])
    pages_dir = tempfile.mkdtemp(prefix="incbench_pages_")
    spark.createDataFrame(pdf, schema=S.PAGES).repartition(cores * 4).write.mode(
        "overwrite"
    ).parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)
    n = pages.count()
    cfg = PipelineConfig()

    # 1-row delta: the lexicographically-first url re-crawled with changed
    # text at a newer warc_ts
    first = pages.orderBy("url").limit(1)
    new_html = (
        b"<html><title>delta</title><body>"
        + b"recrawled delta content words differ entirely now "
        * 8
        + b"</body></html>"
    )
    delta = first.withColumn(
        "warc_ts", (F.col("warc_ts") + F.expr("INTERVAL 1 DAY"))
    ).withColumn("html", F.lit(new_html))
    snapshot2 = pages.unionByName(delta.select(*pages.columns))

    # This sandbox's wall-clocks swing 2-3x between identical runs (shared
    # host; VERDICT r4 "what's wrong #1"), so a single sample per phase is
    # not a number — run `repeats` full+delta pairs (fresh checkpoint root
    # each), report best-of per phase, and record the spread so an unstable
    # measurement can never silently read as a trend (same contract as
    # bench.py's unstable_queries flag).
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    full_times, delta_times = [], []
    for _ in range(repeats):
        root = tempfile.mkdtemp(prefix="incbench_ckpt_")
        t0 = time.time()
        run_pipeline_checkpointed(pages, root, cfg).count()
        full_times.append(time.time() - t0)
        t0 = time.time()
        run_pipeline_checkpointed(snapshot2, root, cfg).count()
        delta_times.append(time.time() - t0)
        shutil.rmtree(root, ignore_errors=True)
    full_secs, delta_secs = min(full_times), min(delta_times)

    def _spread(ts: list) -> float:
        return round((max(ts) - min(ts)) / min(ts), 3)

    result = {
        "n_pages": n,
        "cores": cores,
        "full_secs": round(full_secs, 3),
        "delta_secs": round(delta_secs, 3),
        "delta_speedup": round(full_secs / delta_secs, 2),
        "repeats": repeats,
        "full_spread": _spread(full_times),
        "delta_spread": _spread(delta_times),
    }
    print(json.dumps(result))
    # persist for BENCH.md regeneration (scripts/scaling_bench.py embeds the
    # recorded runs when this artifact is present); one entry per corpus size
    # so the speedup-vs-size trend stays visible
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art = os.path.join(repo, "INCREMENTAL.json")
    runs = []
    if os.path.exists(art):
        with open(art) as f:
            runs = json.load(f).get("runs", [])
    runs = [r for r in runs if r["n_pages"] != n] + [result]
    with open(art, "w") as f:
        json.dump({"runs": sorted(runs, key=lambda r: r["n_pages"])}, f)
        f.write("\n")
    shutil.rmtree(pages_dir, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
