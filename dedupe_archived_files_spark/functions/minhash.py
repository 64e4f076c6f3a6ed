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


def _perm_params64(k: int) -> tuple[np.ndarray, np.ndarray]:
    """Dietzfelbinger multiply-shift parameters for the FULL-WIDTH path
    ((a*x + b) mod 2^64 >> 32): a must be a random ODD uint64 and b a random
    uint64 so b's high bits land inside the kept output window. (The 31-bit
    `_perm_params` family is only for the mod-prime path, where a*h must stay
    below 2^63.)"""
    rng = np.random.RandomState(_SEED ^ 0xD1E7)
    lo = rng.randint(0, 2**32, size=2 * k).astype(np.uint64)
    hi = rng.randint(0, 2**32, size=2 * k).astype(np.uint64)
    full = (hi << np.uint64(32)) | lo
    a = full[:k] | np.uint64(1)  # odd
    b = full[k:]
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


# ---------------------------------------------------------------------------
# Unified featurizer (THE pipeline signature space)
# ---------------------------------------------------------------------------
# There is exactly ONE way pipeline signatures/band keys are derived — both the
# fused html→features path (operators.extract.extract_with_signature) and the
# text→features path (operators.blocking.with_signature) call featurize_texts,
# so rows from either path are always join-compatible. Outputs carry the
# SIGNATURE_SPACE stamp so checkpoints from a different derivation are
# detectable before a silent false-negative join.
#
# Derivation (frozen for space "msh128.pdhash.v2"):
#   tok_hash   = pandas hash_array (SipHash-1-3, fixed key) over lowercased
#                whitespace tokens — C-vectorized per Arrow batch
#   shingle[i] = Σ_j C_j * tok_hash[i+j]   (uint64 wraparound, odd constants;
#                docs shorter than k tokens → one whole-doc shingle)
#   sig[p]     = min over shingles of ((a_p * sh + b_p) mod 2^64) >> 32 —
#                multiply-shift universal hashing (Dietzfelbinger et al.):
#                the same k-permutation MinHash estimator as round 1 but with
#                no uint64 modulo in the hot loop (~2x per-core throughput).
#                v3: a_p is a random ODD uint64, b_p a random uint64 (the v2
#                params reused the 31-bit mod-prime family, whose b was
#                discarded by the >>32 — weaker than the cited family)
#   band_keys  = per-band polynomial fold of signature slices + band salt
#   simhash    = 64-bit bit-vote over the (distinct) SHINGLE hash set.
#                Shingle basis, not token basis: token-level simhash collapses
#                for same-vocabulary documents (measured on the synth corpus:
#                planted hard negatives at Jaccard <= 0.47 land at token
#                hamming 0-3 — indistinguishable from duplicates — while
#                shingle hamming separates cleanly: near-dups 3-10 vs hard
#                negatives 13-35 of 64 bits)
SIGNATURE_SPACE = "msh128.pdhash.v3"

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _shingle_consts(k: int) -> np.ndarray:
    return np.array(
        [((0x9E3779B97F4A7C15 * (2 * j + 1)) & 0xFFFFFFFFFFFFFFFF) | 1 for j in range(k)],
        dtype=np.uint64,
    )


def _band_consts(bands: int, r: int) -> tuple[np.ndarray, np.ndarray]:
    bc = np.array(
        [((0xC2B2AE3D27D4EB4F * (2 * j + 1)) & 0xFFFFFFFFFFFFFFFF) | 1 for j in range(r)],
        dtype=np.uint64,
    )
    bidx = np.arange(1, bands + 1, dtype=np.uint64) * _GOLD
    return bc, bidx


def featurize_texts(
    texts: list, k: int, perms: int, bands: int
) -> tuple[list, list, list, list]:
    """Batch-vectorized feature derivation for a list of extracted texts
    (None = quarantined row). Returns per-doc lists:
    (shingle_sets, signatures, band_keys, simhashes)."""
    r = perms // bands
    a, b = _perm_params64(perms)
    cs = _shingle_consts(k)
    bc, bidx = _band_consts(bands, r)
    n_docs = len(texts)

    shingles_out: list = [None] * n_docs
    sigs_out: list = [None] * n_docs
    bands_out: list = [None] * n_docs
    sim_out: list = [None] * n_docs

    # 1) tokenize + batch token hashing (one C pass over every token in the
    # Arrow batch; categorize=True hashes each distinct token once)
    tok_lists = [None if t is None else t.lower().split() for t in texts]
    flat: list = []
    for tl in tok_lists:
        if tl:
            flat.extend(tl)
    if flat:
        h_all = pd.util.hash_array(np.asarray(flat, dtype=object), categorize=True)
    else:
        h_all = np.empty(0, dtype=np.uint64)

    a_col = a[:, None]
    b_col = b[:, None]
    shift32 = np.uint64(32)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)

    # 2) per-doc: shingle set, multiply-shift MinHash signature, simhash
    live_idx: list[int] = []
    sig_rows: list[np.ndarray] = []
    pos = 0
    with np.errstate(over="ignore"):
        for i, tl in enumerate(tok_lists):
            if tl is None:
                continue
            n = len(tl)
            if n == 0:
                shingles_out[i] = np.empty(0, dtype=np.int64)
                continue
            h = h_all[pos : pos + n]
            pos += n
            if n < k:
                sh = (cs[:n] * h).sum(keepdims=True)
            else:
                m = n - k + 1
                sh = cs[0] * h[:m]
                for j in range(1, k):
                    sh += cs[j] * h[j : j + m]
            sh = np.unique(sh)
            # ndarray, NOT .tolist(): pyarrow converts int64 ndarrays via
            # buffer copy; boxing ~300 ints/doc into Python lists and letting
            # pyarrow unbox them again measured 2.4x the whole featurize
            # stage's wall at local[32]
            shingles_out[i] = sh.view(np.int64)
            live_idx.append(i)

            # signature: min over shingles of ((a*sh + b) mod 2^64) >> 32,
            # chunked so the (perms, chunk) work matrix stays cache-resident
            best = None
            for lo in range(0, len(sh), 8192):
                part = sh[lo : lo + 8192]
                mm = a_col * part[None, :]
                mm += b_col
                mm >>= shift32
                pm = mm.min(axis=1)
                best = pm if best is None else np.minimum(best, pm)
            sig_rows.append(best)

            # simhash: bit votes over the shingle hash set (uint8 unpack —
            # no giant intermediate, no reduceat; see SIGNATURE_SPACE notes
            # for why shingle basis, not token basis)
            bits = np.unpackbits(
                sh.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            )
            votes = bits.sum(axis=0, dtype=np.int64)
            sim_out[i] = int(
                np.where(2 * votes > len(sh), weights, np.uint64(0)).sum().view(np.int64)
            )

        if not live_idx:
            return shingles_out, sigs_out, bands_out, sim_out

        # 3) band keys: per-band polynomial fold over the whole batch at once
        S = np.vstack(sig_rows)  # (nd, perms) uint64
        bk = (S.reshape(len(live_idx), bands, r) * bc[None, None, :]).sum(axis=2)
        bk += bidx[None, :]

    sig_i64 = S.view(np.int64)
    bk_i64 = bk.view(np.int64)
    for j, i in enumerate(live_idx):
        sigs_out[i] = sig_i64[j]
        bands_out[i] = bk_i64[j]
    return shingles_out, sigs_out, bands_out, sim_out


def make_featurize_udf(k: int, perms: int, bands: int, with_extract: bool):
    """(html, text) → struct(text, title, shingle_set, signature, band_keys,
    simhash): the WHOLE Python portion of stages 1-2 in one Arrow crossing.

    Why fused: two chained ArrowEvalPython nodes in one stage pipeline
    JVM→workerA→JVM→workerB per batch and stall each other under load —
    measured 25x slower than either stage alone at local[16]. One UDF = one
    worker per task, no inter-worker backpressure.

    ``with_extract=True`` runs the frozen extraction contract
    (functions.text.extract_text_py) and title scrape on `html` first;
    ``with_extract=False`` trusts `text` as already extracted (the
    with_signature path) — both produce IDENTICAL features for identical text
    (asserted in tests), which is the one-signature-space guarantee."""
    from dedupe_archived_files_spark.functions.text import (
        extract_text_py,
        extract_title_py,
    )

    out_type = T.StructType(
        [
            T.StructField("text", T.StringType(), True),
            T.StructField("title", T.StringType(), True),
            T.StructField("shingle_set", T.ArrayType(T.LongType()), True),
            T.StructField("signature", T.ArrayType(T.LongType()), True),
            T.StructField("band_keys", T.ArrayType(T.LongType()), True),
            T.StructField("simhash", T.LongType(), True),
        ]
    )

    @F.pandas_udf(out_type)
    def featurize(html_s: pd.Series, text_s: pd.Series) -> pd.DataFrame:
        if with_extract:
            texts = [extract_text_py(h, t) for h, t in zip(html_s, text_s)]
            titles = [extract_title_py(h) for h in html_s]
        else:
            texts = [t if t is not None else None for t in text_s]
            titles = [None] * len(texts)
        shingle_sets, sigs, bks, sims = featurize_texts(texts, k, perms, bands)
        return pd.DataFrame(
            {
                "text": texts,
                "title": titles,
                "shingle_set": shingle_sets,
                "signature": sigs,
                "band_keys": bks,
                "simhash": pd.Series(sims, dtype="object"),
            }
        )

    return featurize


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
            out.append(best.view(np.int64))  # ndarray: buffer-copied into Arrow
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
