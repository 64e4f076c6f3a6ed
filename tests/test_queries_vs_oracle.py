"""The driver-contract correctness gate, in-suite: every __spark_entry__
query vs its DuckDB oracle at sf0.001 (row count, column names, and an
order-insensitive value hash — the same comparison the grading driver runs).
"""

from __future__ import annotations

import datetime
import hashlib
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from dedupe_archived_files_spark import queries as Q  # noqa: E402

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.map(str)
        elif str(col.dtype).startswith("datetime"):
            df[c] = col.astype("datetime64[ns]").astype("int64")
        elif col.dtype in ("float64", "float32"):
            df[c] = col.round(6)
    rows = sorted(tuple(r) for r in df.itertuples(index=False, name=None))
    h = hashlib.md5()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()


QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ducks, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF).toPandas()
    osql = entrymod.oracle_sql().get(name)
    if osql is None:
        # rows-only contract for engine-internal ops
        assert sdf is not None
        return
    odf = ducks.sql(osql).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (sdf.columns, odf.columns)
    assert len(sdf) == len(odf), (len(sdf), len(odf))
    assert _value_hash(sdf) == _value_hash(odf)


def test_quick_block_cap_is_inert_at_test_scale(spark):
    """The quick-block self-join is capped at max_block_size like the
    pipeline path (VERDICT r4 #4). At the test SFs no 32-char-prefix block
    comes near the cap, so the capped query must equal the uncapped oracle
    form — assert both facts so a fixture change that grows a block past the
    cap fails loudly here instead of silently diverging from the oracle."""
    from pyspark.sql import functions as F

    from dedupe_archived_files_spark import queries as Q
    from dedupe_archived_files_spark.config import PipelineConfig

    cap = PipelineConfig().max_block_size
    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.md5(F.encode(F.substring("text", 1, 32), "UTF-8")).alias("quick_hash")
    )
    biggest = (
        d.groupBy("quick_hash").count().agg(F.max("count")).collect()[0][0]
    )
    assert biggest <= cap, f"fixture grew a quick block past the cap: {biggest}"

    capped = Q.quick_block_verify_documents(spark, SF).toPandas()
    uncapped = Q.quick_block_verify_documents(
        spark, SF, max_block_size=2**31 - 1
    ).toPandas()
    assert _value_hash(capped) == _value_hash(uncapped)
    assert len(capped) == len(uncapped)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"url", "cluster_id"}


def test_asof_join_semantics(spark, tmp_path):
    """Edge cases the sf-data oracle can't isolate: no-prior-view NULLs,
    equal-timestamp match (>= semantics), same-ts build dedup (max event_id
    wins), and newest-prior-view selection."""
    rows = [
        # user 1: views at t=100 (two rows, ids 10 & 11 -> 11 wins) and
        # t=300; purchases at t=100 (equal-ts -> matches id 11), t=250
        # (-> id 11), t=400 (-> view at 300)
        (10, 100, 1, "view", 1.0),
        (11, 100, 1, "view", 1.0),
        (12, 300, 1, "view", 1.0),
        (20, 100, 1, "purchase", 5.0),
        (21, 250, 1, "purchase", 6.0),
        (22, 400, 1, "purchase", 7.0),
        # user 2: purchase before any view -> NULL match
        (30, 50, 2, "purchase", 8.0),
        (31, 90, 2, "view", 1.0),
    ]
    df = spark.createDataFrame(
        [
            (eid, datetime.datetime.fromtimestamp(ts, datetime.UTC).replace(tzinfo=None), uid, et, val, "")
            for eid, ts, uid, et, val in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sf = str(tmp_path / "asof_sf")
    df.write.parquet(f"{sf}/events.parquet")
    out = {
        r["event_id"]: (r["view_event_id"], r["view_ts"])
        for r in Q.asof_join_events(spark, sf).collect()
    }
    assert out[20][0] == 11  # equal-ts match, dedup picked max event_id
    assert out[21][0] == 11
    assert out[22][0] == 12  # newest prior view, not just any
    assert out[30] == (None, None)  # left semantics


def test_sessionize_gap_boundary(spark, tmp_path):
    """A gap of exactly SESSION_GAP_SECS does NOT break the session (the rule
    is strictly greater), one second more does; singleton sessions have
    duration 0."""
    base = 1_700_000_000
    rows = [
        (1, base),                              # s1
        (2, base + Q.SESSION_GAP_SECS),          # s1 (== gap, no break)
        (3, base + 2 * Q.SESSION_GAP_SECS + 1),  # s2 (gap + 1 breaks)
    ]
    df = spark.createDataFrame(
        [
            (eid, datetime.datetime.fromtimestamp(ts, datetime.UTC).replace(tzinfo=None), 7, "view", 0.0, "")
            for eid, ts in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sf = str(tmp_path / "sess_sf")
    df.write.parquet(f"{sf}/events.parquet")
    sess = sorted(
        Q.sessionize_events(spark, sf).collect(), key=lambda r: r["session_seq"]
    )
    assert [s["n_events"] for s in sess] == [2, 1]
    assert sess[0]["duration_secs"] == Q.SESSION_GAP_SECS
    assert sess[1]["duration_secs"] == 0


def test_fingerprint_overlap_cap_and_floor(spark):
    """The doc-frequency cap and containment floor are live at sf0.001: every
    emitted pair respects the floor, and the inverted index the join ran on
    contains no fingerprint above the cap (scale-safety is structural, not
    luck)."""
    out = Q.fingerprint_overlap_near_dup(spark, SF).toPandas()
    assert (out["containment"] >= Q.FP_MIN_CONTAIN - 1e-9).all()
    assert (out["n_shared"] >= Q.FP_MIN_SHARED).all()
    # symmetric sanity: pair orientation is canonical
    assert (out["doc_id_a"] < out["doc_id_b"]).all()


def test_dim_join_broadcasts(spark):
    """Plan-shape evidence for the 100-TB audit: the dimension-decoration
    join (orders ⋈ customer) must plan as a BroadcastHashJoin — the small
    side ships to every executor, no shuffle of the fact side on the join
    key. At the test SFs AQE's size estimate triggers it; at production SFs
    the same plan holds for any dim under the broadcast threshold."""
    df = Q.left_join_coalesce_default(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:2000]


def test_blocking_filter_pushdown(spark):
    """Scan-shape evidence: the quick-block query's parquet scan must prune
    to the columns it uses (doc_id, text) — a scan reading all columns for a
    2-column projection is the wrong plan at any scale."""
    df = Q.quick_block_verify_documents(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "FileScan parquet" in ln or "ReadSchema" in ln]
    txt = "\n".join(scan) or plan
    assert "lang" not in txt and "source" not in txt, txt[:1500]


def test_repetition_stats_short_doc_guards(spark, tmp_path):
    """The n-gram builder's short-doc guard: Spark's sequence(1, k) DESCENDS
    when k < 1, so without the size() gate a 1-token doc would walk a phantom
    [1, 0] index list. Docs with 0/1/2 tokens must come back with empty /
    zero stats, not nulls or crashes — and a pathological repeated-token doc
    must score top_bigram_frac 1.0 and dup_trigram_frac near 1.0."""
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "",  # 0 tokens
                "one",  # 1 token: no bigrams, no trigrams
                "two tokens",  # 1 bigram, no trigrams
                "a a a a a a",  # total repetition
                "w x y z w x",  # all bigrams distinct except 'w x'
            ],
        }
    )
    d = tmp_path / "documents.parquet"
    pdf.to_parquet(d)
    out = (
        Q.repetition_stats_documents(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1].tolist() == [0, "", 0.0, 0.0]
    assert out.loc[2].tolist() == [0, "", 0.0, 0.0]
    assert out.loc[3].tolist() == [1, "two tokens", 1.0, 0.0]
    # "a a a a a a": 5 bigrams all "a a"; 4 trigrams, 1 distinct -> 0.75
    assert out.loc[4].tolist() == [5, "a a", 1.0, 0.75]
    # "w x y z w x": bigrams w x (2), x y, y z, z w -> top 2/5; trigrams all distinct
    assert out.loc[5].tolist() == [5, "w x", 0.4, 0.0]


def test_decontaminate_planted_overlap(spark, tmp_path):
    """Planted contamination, independent of corpus luck: doc 0 is the
    benchmark (doc_id % 25 == 0); doc 1 copies one verbatim 8-token run from
    it, docs 2-3 share at most 7 consecutive tokens, doc 4 is too short to
    gram. Only doc 1 may flag, with exactly one contaminated gram."""
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "a b c d e f g h i j",      # benchmark: grams a..h, b..i, c..j
                "x a b c d e f g h y",      # contains a..h -> 1 hit
                "p q r s t u v w x y",      # clean
                "b c d e f g h z z z",      # 7-token overlap only -> clean
                "a b c",                    # < 8 tokens: no grams
            ],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    out = (
        Q.decontaminate_documents(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.index.tolist() == [1, 2, 3, 4]  # benchmark row excluded
    assert out.loc[1].tolist() == [1, True]
    assert out.loc[2].tolist() == [0, False]
    assert out.loc[3].tolist() == [0, False]
    assert out.loc[4].tolist() == [0, False]


def test_decontaminate_bench_side_broadcasts(spark):
    """Plan-shape evidence: the benchmark gram set must reach the corpus
    probe as a broadcast (map-side semi-join, no shuffle of the corpus gram
    stream on the join key) — the only viable shape when the corpus is TBs
    and the benchmark is KBs."""
    df = Q.decontaminate_documents(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, plan[:2000]


def test_stratified_sample_stability_under_append(spark, tmp_path):
    """The sample is a pure function of (seed, doc_id): removing documents
    that were not sampled leaves the sample bit-identical, and adding a new
    document can only displace the largest-hash member of its own group."""
    full = Q.stratified_sample_documents(spark, SF, per_group=10).toPandas()
    sampled_ids = set(full.doc_id)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    # drop 50 unsampled docs -> sample unchanged
    unsampled = [i for i in docs.doc_id if i not in sampled_ids][:50]
    docs[~docs.doc_id.isin(unsampled)].to_parquet(tmp_path / "documents.parquet")
    again = Q.stratified_sample_documents(spark, str(tmp_path), per_group=10).toPandas()
    pd.testing.assert_frame_equal(
        full.sort_values(["lang", "sample_rank"]).reset_index(drop=True),
        again.sort_values(["lang", "sample_rank"]).reset_index(drop=True),
    )


def test_curate_verdict_cascade(spark):
    """The composite curation cascade is semantically coherent at the test
    SF: every verdict class is exercised (a fixture regression that empties a
    class fails loudly), benchmark membership is exactly doc_id % 25 == 0
    (precedence: nothing outranks it), split is assigned iff kept, and kept
    splits agree row-for-row with dataset_split_documents (the composite
    reuses its salted-hash formula, not a reimplementation)."""
    cur = Q.curate_documents(spark, SF).toPandas()
    assert len(cur) == 500
    classes = set(cur.verdict)
    assert classes == {
        "benchmark", "low_quality", "repetitive", "contaminated", "kept"
    }, classes
    bench = set(cur[cur.verdict == "benchmark"].doc_id)
    assert bench == {i for i in cur.doc_id if i % 25 == 0}
    kept = cur[cur.verdict == "kept"]
    assert set(kept.split) == {"train", "val", "test"}
    assert (cur[cur.verdict != "kept"].split == "").all()
    splits = Q.dataset_split_documents(spark, SF).toPandas()
    merged = kept.merge(splits, on="doc_id", suffixes=("", "_ref"))
    assert (merged.split == merged.split_ref).all()
