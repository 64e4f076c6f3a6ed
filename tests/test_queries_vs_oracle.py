"""The driver-contract correctness gate, in-suite: every __spark_entry__
query vs its DuckDB oracle at sf0.001 (row count, column names, and an
order-insensitive value hash — the same comparison the grading driver runs).
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

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
