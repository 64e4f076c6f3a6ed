"""Oracle-parity checker at arbitrary scale factor — the driver-style
rows+schema+value-hash comparison (same hashing as
tests/test_queries_vs_oracle.py) runnable at sf0.01/sf0.1/sf1.0, so an
optimization can be proven output-identical beyond the in-suite sf0.001 gate
before it ships.

Usage:
  python scripts/parity_check.py --sf-dir /root/testdata/sf0.1 \
      [--queries name1,name2] [--skip-no-oracle]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def value_hash(df: pd.DataFrame) -> str:
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


TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--queries", default="")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from dedupe_archived_files_spark.session import get_spark

    spark = get_spark(app_name="parity_check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qmap = entrymod.queries()
    osql = entrymod.oracle_sql()
    names = [q for q in args.queries.split(",") if q] or sorted(qmap)
    n_fail = 0
    for name in names:
        sql = osql.get(name)
        t0 = time.time()
        try:
            sdf = qmap[name](spark, args.sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error {exc}")
            n_fail += 1
            continue
        if sql is None:
            print(f"ok   {name}: no_oracle ({len(sdf)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        odf = con.sql(sql).df()
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_rows = len(sdf) == len(odf)
        ok_hash = ok_cols and ok_rows and value_hash(sdf) == value_hash(odf)
        if ok_cols and ok_rows and ok_hash:
            print(f"ok   {name}: {len(sdf)} rows, {time.time()-t0:.1f}s")
        else:
            print(
                f"FAIL {name}: cols={ok_cols} rows={ok_rows}({len(sdf)} vs "
                f"{len(odf)}) hash={ok_hash}"
            )
            n_fail += 1
    print(f"{'ALL GREEN' if n_fail == 0 else f'{n_fail} FAILURES'}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
