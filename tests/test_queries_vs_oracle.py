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


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"url", "cluster_id"}
