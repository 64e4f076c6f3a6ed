"""Content hashing — the reference's two-tier hash policy re-expressed as
Column expressions (reference core/hasher.py; policy constants models.py:97-98).

Tiers (reference P4-P8, SURVEY.md §2.2):

* ``full_hash``  — hash of the entire extracted text's UTF-8 bytes. Exact
  content identity: equal hash ⇔ equal bytes (reference J1 join key,
  core/database.py:232-241).
* ``quick_hash`` — hash of the first ``quick_hash_size`` bytes, computed only
  for bodies >= ``quick_hash_threshold`` (reference hasher.py:49-58). It is a
  SUPERSET blocking filter: two equal texts always share it; collisions are
  dropped by full verification (reference tests/test_scanner.py:378-411).

Algorithms are pluggable (reference models.py:99 declares `hash_algorithm` but
implements only xxhash). Default is md5 — built into both Spark (JVM-side,
codegen'd) and DuckDB, which makes every hash-bearing query oracle-checkable.
`xxh64` uses Spark's native xxhash64 (fastest, JVM-side). `xxh3` gives hex-digest
parity with the reference's xxh3_64 (core/hasher.py:88) but needs the `xxhash`
wheel, absent in this image — import-gated.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this image
    import xxhash as _xxhash
except ImportError:
    _xxhash = None


def _md5(data: Column) -> Column:
    return F.md5(data)


def _sha256(data: Column) -> Column:
    return F.sha2(data, 256)


def _xxh64(data: Column) -> Column:
    # Spark-native XXH64 (seed 42) over the binary column; hex-encoded for a
    # uniform string hash type. JVM-side — the throughput choice at scale.
    return F.lower(F.hex(F.xxhash64(data)))


def _xxh3(data: Column) -> Column:  # pragma: no cover - requires xxhash wheel
    if _xxhash is None:
        raise ImportError(
            "xxh3 parity hashing requires the 'xxhash' package "
            "(reference core/hasher.py:88 uses xxh3_64); install it or use "
            "algo='md5'/'xxh64'"
        )
    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def xxh3_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda b: _xxhash.xxh3_64(b).hexdigest() if b is not None else None)

    return xxh3_udf(data)


ALGORITHMS = {"md5": _md5, "sha256": _sha256, "xxh64": _xxh64, "xxh3": _xxh3}


def content_bytes(text_col: Column) -> Column:
    """The byte string identity is defined over: UTF-8 encoding of the
    extracted text (frozen extraction contract in functions.text)."""
    return F.encode(text_col, "UTF-8")


def full_hash(text_col: Column, algo: str = "md5") -> Column:
    return ALGORITHMS[algo](content_bytes(text_col))


def quick_hash(text_col: Column, size: int = 8192, algo: str = "md5") -> Column:
    """Hash of the first ``size`` BYTES (not chars) — byte semantics match the
    reference's partial read (core/hasher.py:86-94)."""
    return ALGORITHMS[algo](F.substring(content_bytes(text_col), 1, size))


def two_tier_hashes(
    text_col: Column,
    size_col: Column,
    quick_size: int = 8192,
    threshold: int = 1_048_576,
    algo: str = "md5",
) -> tuple[Column, Column]:
    """(full_hash, quick_hash) per the reference's size-dispatch policy
    (hasher.py:64-84 stream path: big inputs get BOTH, small get full only —
    the one-pass dual hash, hasher.py:115-131; unlike the file path
    hasher.py:49-58 we never defer the full hash, so the known reference
    false-negative branch is not reproduced)."""
    fh = full_hash(text_col, algo)
    qh = F.when(size_col >= threshold, quick_hash(text_col, quick_size, algo))
    return fh, qh


# ---------------------------------------------------------------------------
# Pure-Python XXH64 reference implementation (public spec, Cyan4973/xxHash
# XXH64 algorithm). Purpose: a CROSS-IMPLEMENTATION PARITY ORACLE for the
# registry's JVM fast path — `_xxh64` above rides Spark's built-in
# `F.xxhash64` (seed 42), and tests/test_extract_and_hash.py asserts this
# implementation produces bit-identical digests for the same bytes. That
# closes the same trust gap the env-gated xxh3 test covers for the reference
# hash (core/hasher.py:88): the engine's non-cryptographic identity hash is
# spec-checked, not assumed. NOT a hot-path function (the hot path is the
# JVM builtin); driver/test use only.
# ---------------------------------------------------------------------------

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_U64 = 0xFFFFFFFFFFFFFFFF


def _xxrotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _U64


def _xxround(acc: int, lane: int) -> int:
    acc = (acc + lane * _XXP2) & _U64
    return (_xxrotl(acc, 31) * _XXP1) & _U64


def _xxmerge(h: int, acc: int) -> int:
    h ^= _xxround(0, acc)
    return (h * _XXP1 + _XXP4) & _U64


def xxh64_py(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` with ``seed`` (Spark's xxhash64 default is 42),
    returned as an unsigned 64-bit int. Spec: xxHash XXH64, little-endian
    lane reads, 32-byte stripes, 8/4/1-byte tail, final avalanche."""
    n = len(data)
    i = 0
    if n >= 32:
        a1 = (seed + _XXP1 + _XXP2) & _U64
        a2 = (seed + _XXP2) & _U64
        a3 = seed & _U64
        a4 = (seed - _XXP1) & _U64
        while i + 32 <= n:
            a1 = _xxround(a1, int.from_bytes(data[i : i + 8], "little"))
            a2 = _xxround(a2, int.from_bytes(data[i + 8 : i + 16], "little"))
            a3 = _xxround(a3, int.from_bytes(data[i + 16 : i + 24], "little"))
            a4 = _xxround(a4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _xxrotl(a1, 1) + _xxrotl(a2, 7) + _xxrotl(a3, 12) + _xxrotl(a4, 18)
        ) & _U64
        h = _xxmerge(h, a1)
        h = _xxmerge(h, a2)
        h = _xxmerge(h, a3)
        h = _xxmerge(h, a4)
    else:
        h = (seed + _XXP5) & _U64
    h = (h + n) & _U64
    while i + 8 <= n:
        h ^= _xxround(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_xxrotl(h, 27) * _XXP1 + _XXP4) & _U64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _XXP1) & _U64
        h = (_xxrotl(h, 23) * _XXP2 + _XXP3) & _U64
        i += 4
    while i < n:
        h ^= (data[i] * _XXP5) & _U64
        h = (_xxrotl(h, 11) * _XXP1) & _U64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _U64
    h ^= h >> 29
    h = (h * _XXP3) & _U64
    h ^= h >> 32
    return h


def xxh64_py_hex(data: bytes, seed: int = 42) -> str:
    """Digest formatted exactly as the registry's `_xxh64` Column emits it:
    Spark `hex()` of the signed long trims leading zeros; lowercased."""
    return format(xxh64_py(data, seed), "x")
