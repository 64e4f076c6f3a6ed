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
    """array<long> distinct token hashes → 60-bit simhash (numpy bit votes).

    Batch-vectorized (optimization r6, guide §4.2): instead of building a
    per-doc (n, 60) shift matrix, all docs' hashes are concatenated per
    ~128k-hash chunk, bits are extracted with ONE np.unpackbits pass (the
    same uint8 trick as functions.minhash.featurize_texts), and per-doc
    votes come from np.add.reduceat over doc boundaries. The vote rule is
    unchanged: bit b set ⇔ sum(2*bit-1) > 0 ⇔ 2*ones > n."""
    weights = np.uint64(1) << np.arange(BITS, dtype=np.uint64)
    out: list = [None] * len(hashes)
    arrs: list = []
    idxs: list = []
    total = 0

    def flush() -> None:
        nonlocal arrs, idxs, total
        if not arrs:
            return
        flat = np.concatenate(arrs)
        lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
        starts = np.zeros(len(arrs), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        bits = np.unpackbits(
            flat.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )[:, :BITS]
        ones = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)  # (docs, 60)
        sigs = ((2 * ones > lens[:, None]).astype(np.uint64) * weights[None, :]).sum(
            axis=1
        )
        for i, s in zip(idxs, sigs.view(np.int64)):
            out[i] = np.int64(s)
        arrs, idxs, total = [], [], 0

    for i, h in enumerate(hashes):
        if h is None or len(h) == 0:
            continue
        a = np.asarray(h, dtype=np.int64).view(np.uint64)
        arrs.append(a)
        idxs.append(i)
        total += len(a)
        if total >= 131072:  # bound the chunk's bit matrix to ~8 MB
            flush()
    flush()
    return pd.Series(out, dtype="object")


def hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two simhashes — JVM-side popcount of XOR."""
    return F.bit_count(a.bitwiseXOR(b))
