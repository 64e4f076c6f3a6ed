"""SimHash fingerprints + Hamming distance.

A second near-dup channel (north rule): a single 60-bit fingerprint per doc
whose Hamming distance tracks cosine/weighted-token similarity. 60 bits keeps
the value inside a signed 64-bit long for both Spark and the DuckDB oracle.

Formula (FROZEN — the oracle SQL in __spark_entry__ replicates it exactly):

    h(token)   = int64 of the first 15 hex chars of md5(token)      (60 bits)
    bit_b(doc) = 1  iff  sum over DISTINCT tokens of (2*((h>>b)&1) - 1) > 0
    simhash    = sum_b bit_b * 2^b

Token hashes are computed JVM-side; the bit-vote reduction is one numpy
pandas UDF (vectorized) — or, equivalently, the explode/groupBy formulation in
`simhash_agg_cols` used by the oracle-checked query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

BITS = 60


def token_hash60(tok: Column) -> Column:
    """60-bit deterministic token hash, expressible identically in DuckDB:
    cast(concat('0x', substr(md5(t),1,15)) as bigint)."""
    return F.conv(F.substring(F.md5(F.encode(tok, "UTF-8")), 1, 15), 16, 10).cast("long")


def distinct_token_hashes(tokens_col: Column) -> Column:
    """array<string> tokens → array<long> distinct 60-bit hashes (JVM-side)."""
    return F.array_distinct(F.transform(tokens_col, token_hash60))


@F.pandas_udf(T.LongType())
def simhash_udf(hashes: pd.Series) -> pd.Series:
    """array<long> distinct token hashes → 60-bit simhash (numpy bit votes)."""
    shifts = np.arange(BITS, dtype=np.uint64)
    out = []
    for h in hashes:
        if h is None or len(h) == 0:
            out.append(None)
            continue
        hv = np.asarray(h, dtype=np.int64).view(np.uint64)
        bits = (hv[:, None] >> shifts[None, :]) & np.uint64(1)  # (n, 60)
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        sig = ((votes > 0).astype(np.uint64) << shifts).sum()
        out.append(np.int64(sig))
    return pd.Series(out, dtype="object")


def hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two simhashes — JVM-side popcount of XOR."""
    return F.bit_count(a.bitwiseXOR(b))
