"""Deterministic large-SF test data for scale validation (guide §1: measure
at the scale the optimization claims to hold at).

The driver ships sf0.001/0.01/0.1 read-only; this script derives an sfN-style
directory by replica-tiling a base SF R times with consistent key offsets —
no RNG, no network, byte-deterministic:

* `documents`: doc_id' = r*N + doc_id, text/lang/source copied verbatim. A
  replica set therefore forms R-member EXACT-duplicate cliques per base doc
  (the viral re-crawl shape) on top of the base SF's planted near-dup pairs,
  which replicate R^2-fold across replicas — at R=10 the sf0.1 corpus grows
  5k -> 50k docs and ~2.4k -> ~460k true jac>=0.9 pairs, stressing the
  banding/verify machinery without changing the per-doc text distribution.
* `embeddings`: vec_id' = r*N + vec_id, vectors copied — R-member cos=1.0
  cliques plus replicated base pairs (same rationale).
* `events`: event_id'/user_id' offset per replica, ts/value/props copied —
  R-fold more sessions/windows of identical per-user shape.
* TPC-H-ish tables: every key column offset by r * (max_key+1) of its own
  table, preserving referential integrity (o_custkey tracks customer,
  lineitem tracks orders/part/supplier). region/nation copied once (fixed
  dimensions).

Layout matches the driver's files: ONE row group per table (the
single-split-unit shape queries._spread exists for), zstd.

Usage:
  python scripts/gen_scale_testdata.py [--base /root/testdata/sf0.1] \
      [--out /root/sfdata/sf1.0] [--replicas 10]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key columns to offset, per table: {column: table-whose-id-space-it-lives-in}
OFFSETS = {
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
    "events": {"event_id": "events", "user_id": "events:user_id"},
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
}
COPY_ONLY = ["region", "nation"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/sfdata/sf1.0")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    # id-space sizes (max+1) per key domain, computed once from the base
    spans: dict[str, int] = {}
    tables: dict[str, pa.Table] = {}
    for name in list(OFFSETS) + COPY_ONLY:
        tables[name] = pq.read_table(f"{args.base}/{name}.parquet")
    for name, cols in OFFSETS.items():
        for col, domain in cols.items():
            if domain not in spans:
                if ":" in domain:
                    tbl, dcol = domain.split(":")
                else:
                    tbl = domain
                    dcol = col if col in tables[tbl].column_names else None
                    if dcol is None:
                        # the domain table's own primary key (first column)
                        dcol = tables[tbl].column_names[0]
                spans[domain] = (
                    pc.max(tables[tbl].column(dcol)).as_py() + 1
                )

    for name in COPY_ONLY:
        pq.write_table(
            tables[name],
            f"{args.out}/{name}.parquet",
            compression="zstd",
            row_group_size=1 << 30,
        )
        print(f"{name}: copied {tables[name].num_rows} rows")

    for name, cols in OFFSETS.items():
        base = tables[name]
        reps = []
        for r in range(args.replicas):
            t = base
            for col, domain in cols.items():
                off = r * spans[domain]
                idx = t.column_names.index(col)
                shifted = pc.add(t.column(col), pa.scalar(off, pa.int64()))
                t = t.set_column(
                    idx, t.field(idx), shifted.cast(t.field(idx).type)
                )
            reps.append(t)
        out = pa.concat_tables(reps)
        pq.write_table(
            out,
            f"{args.out}/{name}.parquet",
            compression="zstd",
            row_group_size=1 << 30,
        )
        print(f"{name}: {base.num_rows} x {args.replicas} = {out.num_rows} rows")


if __name__ == "__main__":
    main()
