"""MinHash signatures + LSH banding as DataFrame ops.

This generalizes the reference's quick-hash blocking tier (core/hasher.py:86-94
+ the J2 semi-join, core/database.py:254-258): a cheap key that is *likely*
shared by near-identical content, verified by an exact computation afterwards
(reference J3, scanner.py:366-387 → our Jaccard verification in
operators.scoring).

Scale design:
* shingle base-hashes are computed JVM-side (`xxhash64` inside a higher-order
  `transform` — whole-stage codegen, no Python);
* the k-permutation min is one Arrow-batched pandas UDF over `array<long>`
  (numpy matrix min — vectorized, no per-row Python);
* band keys are JVM `hash()` over signature slices; candidate generation is a
  self-equi-join on (band, band_key) — one shuffle, AQE skew-join splits hot
  buckets, and oversized buckets are capped upstream (operators.blocking).

We implement banding directly rather than via pyspark.ml.feature.MinHashLSH:
the ml version hides band/row control and offers no skew capping (SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Deterministic permutation parameters (seeded — same seed → same signatures
# across runs and executors; the reference pins its hash fn the same way,
# core/hasher.py:88).
_SEED = 0x5EED
_PRIME = np.uint64(4294967311)  # smallest prime > 2^32
_MASK32 = np.uint64(0xFFFFFFFF)


def _perm_params(k: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(_SEED)
    # a in [1, 2^31), b in [0, 2^31): a*h (h < 2^32) stays < 2^63 — no uint64 overflow
    a = rng.randint(1, 2**31, size=k).astype(np.uint64)
    b = rng.randint(0, 2**31, size=k).astype(np.uint64)
    return a, b


def shingle_base_hashes(shingles_col: Column) -> Column:
    """array<string> shingles → array<long> 64-bit base hashes, JVM-side.

    NOTE: only safe when `shingles_col` is a cheap column reference. Feeding a
    *computed* array expression into a higher-order lambda makes Catalyst
    re-evaluate it per element after projection collapse — use
    `make_shingle_hash_udf` for the text→shingle-hash hot path instead."""
    return F.transform(shingles_col, lambda s: F.xxhash64(s))


def make_shingle_hash_udf(k: int):
    """text → array<long> of DISTINCT sorted k-token shingle hashes, one
    Arrow-batched pass (tokenize, shingle, blake2b-64 per shingle).

    Why a pandas UDF and not higher-order Columns: expressing
    slice-per-position over a computed token array in Spark SQL re-evaluates
    the tokenization per shingle (no let-binding in the expression language),
    turning a 2.5 MB document into O(n²) regex work. One vectorized pass is
    linear and keeps executors JVM-free of giant intermediate string arrays —
    only the 8-byte hashes come back.

    Documents shorter than k tokens yield one whole-document shingle (short
    pages must still block). Empty/None text → empty/None (resolved by the
    exact channel)."""
    from hashlib import blake2b

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def shingle_hashes(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            if t is None:
                out.append(None)
                continue
            toks = t.lower().split()
            if not toks:
                out.append([])
                continue
            if len(toks) < k:
                shs = [" ".join(toks)]
            else:
                shs = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
            hs = {
                int.from_bytes(
                    blake2b(s.encode("utf-8"), digest_size=8).digest(), "big", signed=True
                )
                for s in shs
            }
            out.append(sorted(hs))
        return pd.Series(out, dtype="object")

    return shingle_hashes


def make_minhash_udf(k: int):
    """Returns a pandas UDF: array<long> base hashes → array<long> signature
    of length k. Empty/None input → None (excluded from LSH; empty docs are
    resolved by the exact channel)."""
    a, b = _perm_params(k)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_udf(hashes: pd.Series) -> pd.Series:
        chunk = 8192  # bound the (k, chunk) work matrix to ~8 MB regardless of doc size
        out = []
        for h in hashes:
            if h is None or len(h) == 0:
                out.append(None)
                continue
            hv = (np.asarray(h, dtype=np.int64).view(np.uint64) & _MASK32)
            best = np.full(k, np.iinfo(np.uint64).max, dtype=np.uint64)
            for lo in range(0, len(hv), chunk):
                part = hv[lo : lo + chunk]
                m = (a[:, None] * part[None, :] + b[:, None]) % _PRIME
                np.minimum(best, m.min(axis=1), out=best)
            out.append(best.astype(np.int64).tolist())
        return pd.Series(out, dtype="object")

    return minhash_udf


def band_keys(signature_col: Column, bands: int, rows_per_band: int) -> Column:
    """Signature → array of `bands` 64-bit band keys. Each key hashes one
    signature slice together with its band index, so keys from different bands
    never collide into the same join bucket."""
    return F.array(
        *[
            F.xxhash64(
                F.lit(i),
                F.array_join(
                    F.transform(
                        F.slice(signature_col, i * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                ),
            )
            for i in range(bands)
        ]
    )


def estimated_jaccard(sig_a: Column, sig_b: Column, k: int) -> Column:
    """Signature-agreement estimate of Jaccard (fraction of equal components)."""
    return (
        F.size(F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda e: e))
        .cast("double") / F.lit(float(k))
    )


def jaccard(set_a: Column, set_b: Column) -> Column:
    """Exact Jaccard over two pre-distinct arrays — the verification metric
    (JVM-side array ops; reference J3 verify-after-block analogue)."""
    inter = F.size(F.array_intersect(set_a, set_b))
    union = F.size(F.array_union(set_a, set_b))
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(1.0))
