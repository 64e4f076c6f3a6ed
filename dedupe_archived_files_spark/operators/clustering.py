"""Stage 4 — cluster: match edges → connected components.

Iterative large-star/small-star connected components (Kiveris et al.,
"Connected Components in MapReduce and Beyond", public algorithm) as a
driver-side DataFrame loop — the Spark analogue of the reference's bounded
recursive expansion loop (nested-archive recursion with a depth cap,
core/extractor.py:68,102-104; SURVEY.md S10).

Why this algorithm at 100 TB: label propagation converges in O(diameter)
shuffles; large-star/small-star converges in O(log n) rounds even on
path-shaped components, each round a groupBy + join on the node key. Every
iteration `localCheckpoint`s to truncate the lineage (otherwise the plan tree
grows exponentially across iterations).

Node ids are urls (strings — min() is a total order); components are labeled
by their minimum member, which also becomes the canonical url (deterministic,
replacing the reference's order-dependent last-wins, core/database.py:195-208).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dedupe_archived_files_spark.config import PipelineConfig


def _symmetric(edges: DataFrame) -> DataFrame:
    fwd = edges.select(F.col("url_a").alias("u"), F.col("url_b").alias("v"))
    rev = edges.select(F.col("url_b").alias("u"), F.col("url_a").alias("v"))
    return fwd.unionByName(rev)


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u}).

    Symmetrizes internally — each round's input is a directed edge list, and
    neighborhoods must see both directions."""
    sym = _symmetric(edges.select(F.col("u").alias("url_a"), F.col("v").alias("url_b"))).distinct()
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.withColumn("m", F.least(F.col("u"), F.col("mv"))).select("u", "m")
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges high→low; connect all smaller neighbors (and u) to the min."""
    oriented = (
        edges.select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    nbr = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edge = mins.select(F.col("u"), F.col("m").alias("v"))
    return (
        nbr.unionByName(self_edge)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    # order-insensitive content signature; hashes reduced mod 1e9+7 so the sum
    # can't overflow a long under ANSI mode (~9e9 edges of headroom)
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.xxhash64("u", "v") % F.lit(1_000_000_007)), F.lit(0)).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """Exact union-find on the driver for SMALL edge sets. Adaptive choice,
    not a shortcut around Spark: scheduling O(log n) distributed rounds over a
    few thousand edges costs orders of magnitude more than the union-find
    itself. Memory is bounded by the caller's threshold check (~50 MB per
    million edges). Output identical to the distributed path: component = min
    reachable node."""
    spark = edges.sparkSession
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    # collect(), not toLocalIterator(): the iterator schedules one sequential
    # job per partition (32 partitions → 32 serial round-trips); the caller's
    # threshold already bounds the collected size
    for u, v in edges.select("u", "v").collect():
        ru, rv = find(u), find(v)
        if ru != rv:
            # min-root union keeps the representative = min member
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    rows = [(n, find(n)) for n in parent]
    out_type = edges.schema["u"].dataType
    return spark.createDataFrame(
        rows, T.StructType([
            T.StructField("url", out_type, False),
            T.StructField("component", out_type, False),
        ])
    )


def connected_components(edges: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """edges(url_a, url_b) → labels(url, component) where component is the
    minimum url reachable. Runs alternating large-star/small-star until the
    edge set is stable or cfg.max_iterations is hit (iteration cap mirrors the
    reference's recursion cap). Edge sets below cfg.cc_driver_threshold take
    the exact driver union-find fast path (AQE-spirit adaptivity: pick the
    physical strategy by observed size)."""
    cfg = cfg or PipelineConfig()
    spark = edges.sparkSession

    cur = (
        edges.select(F.col("url_a").alias("u"), F.col("url_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    if cfg.cc_driver_threshold and cur.count() <= cfg.cc_driver_threshold:
        return _driver_union_find(cur)
    # big graph → materialize once, then iterate (checkpoint AFTER the
    # adaptive size check so the small-graph path never pays for it)
    cur = cur.localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(cfg.max_iterations):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        sig = _checksum(cur)
        if sig == prev_sig:
            break
        prev_sig = sig

    # After convergence every edge is (node, root); nodes that ARE roots appear
    # only on the right side — add their self-labels.
    labels = cur.select(F.col("u").alias("url"), F.col("v").alias("component"))
    roots = cur.select(F.col("v").alias("url")).distinct().withColumn(
        "component", F.col("url")
    )
    all_labels = labels.unionByName(roots).groupBy("url").agg(
        F.min("component").alias("component")
    )
    return all_labels


def resolve_clusters(labels: DataFrame) -> DataFrame:
    """Stage 5 — resolve: labels → schema.CLUSTERS rows. Canonical member =
    the component label itself (min url). Group formation is the reference's
    A1 rollup (core/scanner.py:255-261) keyed by component."""
    return labels.select(
        "url",
        F.col("component").alias("cluster_id"),
        F.col("component").alias("canonical_url"),
    )


def cluster_summary(labels: DataFrame) -> DataFrame:
    """Per-cluster rollup (A1/A3/A4 analogues): size + members."""
    return (
        labels.groupBy(F.col("component").alias("cluster_id"))
        .agg(
            F.count("*").alias("cluster_size"),
            F.sort_array(F.collect_list("url")).alias("urls"),
        )
        .filter(F.col("cluster_size") >= 2)
    )
