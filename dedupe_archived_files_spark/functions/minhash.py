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


def make_shingle_minhash_udf(k: int, perms: int):
    """tok_hashes(array<long>, JVM xxhash64 per token) →
    struct(shingle_set array<long>, signature array<long>) in ONE fully
    vectorized numpy pass — no Python string ops anywhere:

      shingle_hash[i] = Σ_j C_j * h[i+j]   (uint64 wraparound, odd constants)
      shingle_set     = unique(shingle_hash)
      signature[p]    = min((a_p * (sh & 0xffffffff) + b_p) mod P)

    This is the engine's hot path (every page, every crawl); the blake2b
    string variant (make_shingle_hash_udf) remains for contexts that need
    text-level shingles."""
    a, b = _perm_params(perms)
    cs = np.array(
        [((0x9E3779B97F4A7C15 * (2 * j + 1)) & 0xFFFFFFFFFFFFFFFF) | 1 for j in range(k)],
        dtype=np.uint64,
    )
    maxu = np.iinfo(np.uint64).max
    out_type = T.StructType(
        [
            T.StructField("shingle_set", T.ArrayType(T.LongType()), True),
            T.StructField("signature", T.ArrayType(T.LongType()), True),
        ]
    )

    @F.pandas_udf(out_type)
    def shingle_minhash(tok_hashes: pd.Series) -> pd.DataFrame:
        shingles_out, sigs_out = [], []
        with np.errstate(over="ignore"):
            for th in tok_hashes:
                if th is None or len(th) == 0:
                    shingles_out.append([] if th is not None else None)
                    sigs_out.append(None)
                    continue
                h = np.asarray(th, dtype=np.int64).view(np.uint64)
                n = len(h)
                if n < k:
                    sh = (cs[:n] * h).sum(keepdims=True)
                else:
                    m = n - k + 1
                    sh = np.zeros(m, dtype=np.uint64)
                    for j in range(k):
                        sh += cs[j] * h[j : j + m]
                sh = np.unique(sh)
                shingles_out.append(sh.view(np.int64).tolist())
                hv = sh & _MASK32
                best = np.full(perms, maxu, dtype=np.uint64)
                for lo in range(0, len(hv), 8192):
                    part = hv[lo : lo + 8192]
                    mm = (a[:, None] * part[None, :] + b[:, None]) % _PRIME
                    np.minimum(best, mm.min(axis=1), out=best)
                sigs_out.append(best.astype(np.int64).tolist())
        return pd.DataFrame({"shingle_set": shingles_out, "signature": sigs_out})

    return shingle_minhash


def make_fused_extract_signature_udf(k: int, perms: int, bands: int = 0):
    """(html, text) → struct(text, shingle_set, signature[, band_keys]): the
    WHOLE Python portion of stages 1-2 in one Arrow crossing.

    Why fused: two chained ArrowEvalPython nodes in one stage (extract UDF
    feeding a signature UDF) pipeline JVM→workerA→JVM→workerB per batch and
    stall each other under load — measured 25x slower than either stage alone
    at local[16]. One UDF = one worker per task, no inter-worker backpressure.

    Inside: frozen extraction contract (functions.text.extract_text_py),
    blake2b-64 token hashes, numpy sliding-window shingle combine, unique,
    k-permutation min — all per Arrow batch."""
    from hashlib import blake2b

    from dedupe_archived_files_spark.functions.text import extract_text_py

    a, b = _perm_params(perms)
    cs = np.array(
        [((0x9E3779B97F4A7C15 * (2 * j + 1)) & 0xFFFFFFFFFFFFFFFF) | 1 for j in range(k)],
        dtype=np.uint64,
    )
    maxu = np.iinfo(np.uint64).max
    fields = [
        T.StructField("text", T.StringType(), True),
        T.StructField("shingle_set", T.ArrayType(T.LongType()), True),
        T.StructField("signature", T.ArrayType(T.LongType()), True),
    ]
    r = perms // bands if bands else 0
    if bands:
        fields.append(T.StructField("band_keys", T.ArrayType(T.LongType()), True))
        # per-band polynomial fold constants (band index folded in so bands
        # never collide with each other)
        bc = np.array(
            [((0xC2B2AE3D27D4EB4F * (2 * j + 1)) & 0xFFFFFFFFFFFFFFFF) | 1 for j in range(r)],
            dtype=np.uint64,
        )
        bidx = np.arange(1, bands + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    out_type = T.StructType(fields)

    def tok_hash(t: str) -> int:
        return int.from_bytes(blake2b(t.encode("utf-8"), digest_size=8).digest(), "big")

    @F.pandas_udf(out_type)
    def fused(html_s: pd.Series, text_s: pd.Series) -> pd.DataFrame:
        texts, shingles_out, sigs_out, bands_out = [], [], [], []
        with np.errstate(over="ignore"):
            for html, text in zip(html_s, text_s):
                txt = extract_text_py(html, text)
                texts.append(txt)
                if txt is None:
                    shingles_out.append(None)
                    sigs_out.append(None)
                    bands_out.append(None)
                    continue
                toks = txt.lower().split()
                if not toks:
                    shingles_out.append([])
                    sigs_out.append(None)
                    bands_out.append(None)
                    continue
                h = np.fromiter((tok_hash(t) for t in toks), dtype=np.uint64, count=len(toks))
                n = len(h)
                if n < k:
                    sh = (cs[:n] * h).sum(keepdims=True)
                else:
                    m = n - k + 1
                    sh = np.zeros(m, dtype=np.uint64)
                    for j in range(k):
                        sh += cs[j] * h[j : j + m]
                sh = np.unique(sh)
                shingles_out.append(sh.view(np.int64).tolist())
                hv = sh & _MASK32
                best = np.full(perms, maxu, dtype=np.uint64)
                for lo in range(0, len(hv), 8192):
                    part = hv[lo : lo + 8192]
                    mm = (a[:, None] * part[None, :] + b[:, None]) % _PRIME
                    np.minimum(best, mm.min(axis=1), out=best)
                sigs_out.append(best.astype(np.int64).tolist())
                if bands:
                    # band key = polynomial fold of each signature slice + band salt
                    mat = best.reshape(bands, r)
                    keys = (mat * bc[None, :]).sum(axis=1) + bidx
                    bands_out.append(keys.view(np.int64).tolist())
        data = {"text": texts, "shingle_set": shingles_out, "signature": sigs_out}
        if bands:
            data["band_keys"] = bands_out
        return pd.DataFrame(data)

    return fused


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
    never collide into the same join bucket.

    Hashes the long slice DIRECTLY (no string materialization — the earlier
    array_join formulation allocated 32 strings per row and its GC time
    tripled the blocking stage)."""
    return F.array(
        *[
            F.xxhash64(F.lit(i), F.slice(signature_col, i * rows_per_band + 1, rows_per_band))
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
