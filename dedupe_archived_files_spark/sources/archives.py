"""Archive-member enumeration source (reference S3-S7/S9-S11,
core/extractor.py:89-391) — the reference's core domain, Spark-native.

The reference opens each archive off the filesystem and yields
`(path_in_archive, stream, size, is_nested_archive)` per regular-file member
(core/extractor.py:89), dispatching on format with a fallback chain (S9,
extractor.py:175-184) and recursing into nested archives with a depth cap
(S10, extractor.py:68,102-104,608-613). Here the archive is an opaque
`binary` column row and enumeration is one `mapInPandas` pass:

* **one shuffle-free flatMap shape** — each input row (one archive blob)
  expands to N member rows inside the task that already holds the bytes;
* **nested recursion stays in-process** — a nested archive's bytes are a
  member of the blob the task is already holding, so recursing via BytesIO
  costs no temp file, no extra job, and no shuffle (the reference writes the
  member to a temp file and recurses for the same reason: extractor.py:608).
  Depth cap 10 matches the reference (extractor.py:68);
* **quarantine, never crash** (S9 error semantics, tests/test_scanner.py:
  198-212): a corrupt or unsupported archive becomes one status row with
  null member fields; sibling archives in the same batch are unaffected;
* **format dispatch is magic-byte first** (S11 + the S8 carving scanner's
  signature table, extractor.py:48-66,393-548), falling back to the
  extension for bare tar (whose `ustar` magic sits at offset 257 and is
  absent in some writers).

ZIP and TAR (plus gz/bz2/xz single-file and compressed-tar forms) use the
stdlib; 7z/RAR are dispatched to py7zr/rarfile when importable and degrade
to an `unsupported:` status row otherwise (those wheels are absent in this
container — same gating as the reference's optional libarchive fallback).

Scale notes: per-task memory is bounded by (largest single archive blob +
one member + the ~64 MiB output flush budget), not by the corpus and not by
the Arrow batch's total expansion — enumeration streams out incrementally
(`op` flushes mid-batch and mid-archive). `max_member_bytes` caps any one
member's expansion (zip-bomb guard) and is enforced BEFORE decompression:
ZIP/TAR members are rejected on their size headers without being read, and
header-less containers (bare gzip/bz2/xz) run through a capped streaming
decompressor that stops at cap+1 bytes. The cap is REPORTED as a
`truncated:` status row, never silent, per the north rule's "caps logged,
not silent".
"""

from __future__ import annotations

import bz2
import gzip
import io
import lzma
import tarfile
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - wheel absent in this container
    import py7zr  # type: ignore
except ImportError:  # pragma: no cover
    py7zr = None
try:  # pragma: no cover - wheel absent in this container
    import rarfile  # type: ignore
except ImportError:  # pragma: no cover
    rarfile = None

MAX_DEPTH = 10  # reference: core/extractor.py:68

ARCHIVE_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("archive_path", T.StringType(), False),
        T.StructField("member_path", T.StringType(), True),
        T.StructField("member_size", T.LongType(), True),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("is_nested_archive", T.BooleanType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)

_COMPRESSED_EXT = {".gz": "gzip", ".bz2": "bzip2", ".xz": "xz"}


def sniff_archive_format(content: bytes | None, name: str = "") -> str | None:
    """Magic-byte archive classifier (reference S11 is extension-based,
    extractor.py:77-87; magic-first is strictly stronger and matches the S8
    carving scanner's signature dispatch). Returns None for non-archives."""
    if not content:
        return None
    if content[:4] in (b"PK\x03\x04", b"PK\x05\x06", b"PK\x07\x08"):
        return "zip"
    if content[:6] == b"7z\xbc\xaf\x27\x1c":
        return "7z"
    if content[:4] == b"Rar!":
        return "rar"
    if content[:2] == b"\x1f\x8b":
        # gzip stream: compressed tar if the inner name says so
        return "tar" if ".tar." in name.lower() or name.lower().endswith(".tgz") else "gzip"
    if content[:3] == b"BZh":
        return "tar" if ".tar." in name.lower() else "bzip2"
    if content[:6] == b"\xfd7zXZ\x00":
        return "tar" if ".tar." in name.lower() else "xz"
    if len(content) > 262 and content[257:262] == b"ustar":
        return "tar"
    if name.lower().endswith(".tar"):
        return "tar"
    return None


def _capped_decompress(fmt: str, data: bytes, cap: int) -> bytes | None:
    """Streaming decompress with a hard output cap: returns the bytes, or
    None the moment output would exceed ``cap`` — the input is never inflated
    past cap+1 bytes, so a compression bomb in a header-less container
    (bare gzip/bz2/xz) cannot OOM the task."""
    import zlib

    if fmt == "gzip":
        d = zlib.decompressobj(wbits=31)
    elif fmt == "bzip2":
        d = bz2.BZ2Decompressor()
    else:
        d = lzma.LZMADecompressor()
    out = d.decompress(data, cap + 1)
    return None if len(out) > cap else out


def _strip_one_suffix(name: str) -> str:
    for ext in _COMPRESSED_EXT:
        if name.lower().endswith(ext):
            return name[: -len(ext)]
    return name


def _enumerate(
    archive_path: str,
    name: str,
    content: bytes,
    depth: int,
    max_depth: int,
    max_member_bytes: int,
) -> Iterator[tuple]:
    """Yield ARCHIVE_MEMBER_SCHEMA tuples for one archive blob, recursing
    into nested archives (prefix `parent/child` per extractor.py:608-613)."""
    fmt = sniff_archive_format(content, name)
    if fmt is None:
        yield (archive_path, None, None, depth, False, None, "not_an_archive")
        return
    if (fmt == "7z" and py7zr is None) or (fmt == "rar" and rarfile is None):
        yield (archive_path, None, None, depth, False, None, f"unsupported:{fmt}")
        return

    def members() -> Iterator[tuple[str, int | None]]:
        """Yield ``(member_name, declared_size, read_bytes)`` WITHOUT reading
        the member: the caller checks ``declared_size`` against the cap
        BEFORE calling ``read_bytes``, so an oversized member is rejected on
        its header and never decompressed into memory (a zip bomb must not
        OOM the executor before the ``truncated:`` row can be emitted).
        ``declared_size`` is None where the container has no per-member size
        header (bare gzip/bz2/xz) — those decompress through a CAPPED
        streaming decompressor instead (``_capped_decompress``)."""
        if fmt == "zip":
            with zipfile.ZipFile(io.BytesIO(content)) as zf:
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    # ZipExtFile stops at the declared size, so the header
                    # check bounds memory even for a lying (bomb) header
                    yield (
                        info.filename,
                        info.file_size,
                        lambda i=info: zf.read(i),
                    )
        elif fmt == "tar":
            with tarfile.open(fileobj=io.BytesIO(content), mode="r:*") as tf:
                for info in tf.getmembers():
                    if not info.isreg():
                        continue

                    def _read_tar(i=info):
                        fh = tf.extractfile(i)
                        return fh.read() if fh is not None else b""

                    yield info.name, info.size, _read_tar
        elif fmt in ("gzip", "bzip2", "xz"):
            # single-compressed-file container: one member, name minus
            # suffix; no size header → capped streaming decompress
            yield (
                _strip_one_suffix(name) or "member",
                None,
                lambda: _capped_decompress(fmt, content, max_member_bytes),
            )
        elif fmt == "7z":  # pragma: no cover - wheel absent in this container
            with py7zr.SevenZipFile(io.BytesIO(content)) as sz:
                sizes = {
                    e.filename: e.uncompressed for e in sz.list()
                }
                for mname, bio in (sz.readall() or {}).items():
                    yield mname, sizes.get(mname), lambda b=bio: b.read()
        elif fmt == "rar":  # pragma: no cover - wheel absent in this container
            with rarfile.RarFile(io.BytesIO(content)) as rf:
                for info in rf.infolist():
                    if info.is_dir():
                        continue
                    yield (
                        info.filename,
                        info.file_size,
                        lambda i=info: rf.read(i),
                    )

    try:
        empty = True
        for mname, declared, read_bytes in members():
            empty = False
            mpath = f"{name}/{mname}" if depth > 0 else mname
            if declared is not None and declared > max_member_bytes:
                # rejected on the HEADER — the member is never decompressed
                yield (archive_path, mpath, declared, depth, False, None,
                       f"truncated:{max_member_bytes}")
                continue
            mbytes = read_bytes()
            if mbytes is None or len(mbytes) > max_member_bytes:
                # capped stream overflowed (no size header), or the header
                # lied low — either way the cap is reported, never silent
                yield (archive_path, mpath, None, depth, False, None,
                       f"truncated:{max_member_bytes}")
                continue
            nested_fmt = sniff_archive_format(mbytes, mname)
            if nested_fmt is not None:
                if depth + 1 >= max_depth:
                    # cap is reported, not silent (reference raises at the
                    # cap, extractor.py:102-104; we quarantine the row)
                    yield (archive_path, mpath, len(mbytes), depth, True,
                           mbytes, "depth_cap")
                else:
                    yield (archive_path, mpath, len(mbytes), depth, True,
                           mbytes, "nested_expanded")
                    yield from _enumerate(
                        archive_path, mpath, mbytes, depth + 1, max_depth,
                        max_member_bytes,
                    )
                continue
            yield (archive_path, mpath, len(mbytes), depth, False, mbytes, "ok")
        if empty:
            # empty-but-valid archive is OK, not an error (extractor.py:175-184)
            yield (archive_path, None, None, depth, False, None, "empty")
    except Exception as e:  # noqa: BLE001 - quarantine, don't crash (S9)
        yield (archive_path, None, None, depth, False, None,
               f"corrupt:{type(e).__name__}")


def enumerate_archive_members(
    archives: DataFrame,
    path_col: str = "path",
    content_col: str = "content",
    max_depth: int = MAX_DEPTH,
    max_member_bytes: int = 1 << 30,
) -> DataFrame:
    """FlatMap-shaped enumeration: (path, content:binary) → one row per
    regular-file member (reference S3-S7), nested archives expanded in-task
    (S10), failures quarantined as status rows (S9)."""

    # Flush bound: emit an output DataFrame whenever the buffered member
    # content crosses this many bytes (or rows), so task memory is bounded by
    # ~flush budget + one member — NOT by the whole Arrow batch's expansion
    # (an input batch of thousands of archives, each inflating 100x, must
    # stream out incrementally; _enumerate is already a generator, so even
    # one huge archive flushes mid-enumeration).
    FLUSH_BYTES = 64 << 20
    FLUSH_ROWS = 4096
    cols = [f.name for f in ARCHIVE_MEMBER_SCHEMA]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[tuple] = []
        acc = 0
        for pdf in batches:
            for path, content in zip(pdf[path_col], pdf[content_col]):
                if content is None:
                    rows.append((path, None, None, 0, False, None, "missing"))
                    continue
                for row in _enumerate(
                    path, path.rsplit("/", 1)[-1], bytes(content),
                    0, max_depth, max_member_bytes,
                ):
                    rows.append(row)
                    acc += len(row[5] or b"")
                    if acc >= FLUSH_BYTES or len(rows) >= FLUSH_ROWS:
                        yield pd.DataFrame(rows, columns=cols)
                        rows, acc = [], 0
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    return archives.select(path_col, content_col).mapInPandas(
        op, schema=ARCHIVE_MEMBER_SCHEMA
    )


def archive_members_as_pages(members: DataFrame) -> DataFrame:
    """Bridge to the pipeline's input shape: enumerated members → pages rows,
    so the full extract → block → score → cluster pipeline runs over archive
    CONTENTS — the reference's end-to-end workflow (scan archives, hash every
    member, find duplicates across archives: core/scanner.py Phase 1-2).

    url = `archive_path#member_path`, the reference's composite
    (source_archive, path_in_archive) identity (core/models.py:10-23).
    Only `status='ok'` rows carry member bytes; nested-container and
    quarantine/status rows are excluded here (quarantine is its own sink).
    warc_ts has no archive analogue — a fixed epoch keeps rows deterministic.
    """
    return members.filter(F.col("status") == "ok").select(
        F.concat_ws("#", "archive_path", "member_path").alias("url"),
        F.to_timestamp(F.lit("1980-01-01 00:00:00")).alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


PACKED_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.BinaryType(), False),
        T.StructField("n_members", T.LongType(), False),
    ]
)


def pack_zip_groups(
    df: DataFrame,
    group_col: str,
    name_col: str,
    text_col: str,
) -> DataFrame:
    """Deterministic inverse of enumeration, for fixtures and round-trip
    tests: one ZIP blob per group (members sorted by name, fixed timestamp,
    STORED — byte-identical across runs/partitionings). applyInPandas keeps
    each group's members on one task; group size is the caller's contract
    (bucket the group key if a group can outgrow executor memory)."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(name_col)
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_STORED) as zf:
            for mname, text in zip(pdf[name_col], pdf[text_col]):
                info = zipfile.ZipInfo(str(mname), date_time=(1980, 1, 1, 0, 0, 0))
                zf.writestr(info, (text or "").encode("utf-8"))
        return pd.DataFrame(
            {
                "path": [str(pdf[group_col].iloc[0])],
                "content": [buf.getvalue()],
                "n_members": [len(pdf)],
            }
        )

    return df.select(group_col, name_col, text_col).groupBy(group_col).applyInPandas(
        pack, schema=PACKED_SCHEMA
    )
