"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, decoded / feature-extracted via `mapInPandas`.

The decode itself is STUBBED (no image/audio libraries in this container):
`decode_image_meta` dispatches on magic bytes and returns deterministic
metadata; `decode_image_pixels` raises NotImplementedError behind a clearly
marked gate. The Spark-side plumbing — schema, Arrow batch shape, partition-
level iteration, quarantine-not-crash error handling — is real and tested.

Reference analogue: the magic-byte carving scanner (S8,
core/extractor.py:393-548: find `hsqs`/`CD001`/`PK\\x03\\x04` offsets inside an
opaque binary payload and route to the right handler).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sniffed_format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("decode_status", T.StringType(), False),
    ]
)

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
    (b"%PDF", "pdf"),
    (b"PK\x03\x04", "zip"),
    (b"<", "markup"),
]


def sniff_format(content: bytes | None) -> str | None:
    """Magic-byte format classifier (reference S11/S8 dispatch)."""
    if content is None:
        return None
    for magic, name in _MAGIC:
        if content[: len(magic)] == magic:
            return name
    return "unknown"


def parse_image_dims(fmt: str | None, content: bytes) -> tuple[int, int] | None:
    """REAL (no-library) image dimensions from format headers — pure byte
    parsing of the public container specs, so the metadata surface does not
    depend on the stubbed pixel decoder:

    * PNG: IHDR width/height, big-endian u32 at offsets 16/20;
    * GIF: logical-screen width/height, little-endian u16 at offsets 6/8;
    * JPEG: scan the marker stream for a start-of-frame (SOF0-15, excluding
      the DHT/DAC/RST non-frame markers) and read height/width from it.

    Returns None when the header is truncated or malformed (callers fall
    back to the clearly-marked stub path)."""
    try:
        if fmt == "png" and len(content) >= 24 and content[12:16] == b"IHDR":
            # require the IHDR chunk tag: magic + arbitrary bytes is NOT a
            # decodable header (falls through to the stub path)
            w = int.from_bytes(content[16:20], "big")
            h = int.from_bytes(content[20:24], "big")
            return (w, h) if 0 < w and 0 < h else None
        if fmt == "gif" and len(content) >= 10:
            w = int.from_bytes(content[6:8], "little")
            h = int.from_bytes(content[8:10], "little")
            return (w, h) if 0 < w and 0 < h else None
        if fmt == "jpeg":
            i = 2
            n = len(content)
            while i + 9 < n:
                if content[i] != 0xFF:
                    return None
                marker = content[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = int.from_bytes(content[i + 2 : i + 4], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h = int.from_bytes(content[i + 5 : i + 7], "big")
                    w = int.from_bytes(content[i + 7 : i + 9], "big")
                    return (w, h) if 0 < w and 0 < h else None
                i += 2 + seg_len
    except Exception:  # noqa: BLE001 - malformed header == undecodable
        return None
    return None


def decode_image_pixels(content: bytes):  # pragma: no cover - stub by design
    """REAL DECODE STUB: pixel decode requires an imaging library absent from
    this container. On a real deployment, swap in PIL/libvips here — the
    mapInPandas plumbing above it is unchanged."""
    raise NotImplementedError(
        "image pixel decode is stubbed in this environment; deterministic "
        "metadata extraction (extract_media_meta) is the tested surface"
    )


def extract_media_meta(pages: DataFrame) -> DataFrame:
    """mapInPandas operator: (url, html) → typed media metadata. Batch-shaped:
    each Arrow batch is processed as one pandas frame; per-row failures become
    `decode_status='error'` rows, never job failures (reference S9 error
    semantics)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, nbytes, fmts, ws, hs, status = [], [], [], [], [], []
            for url, content in zip(pdf["url"], pdf["html"]):
                urls.append(url)
                if content is None:
                    nbytes.append(0)
                    fmts.append(None)
                    ws.append(None)
                    hs.append(None)
                    status.append("missing")
                    continue
                try:
                    fmt = sniff_format(bytes(content))
                    nbytes.append(len(content))
                    fmts.append(fmt)
                    if fmt in ("png", "jpeg", "gif"):
                        dims = parse_image_dims(fmt, bytes(content))
                        if dims is not None:
                            # REAL header-parsed dimensions (no library
                            # needed — see parse_image_dims); only the pixel
                            # decode itself is stubbed
                            ws.append(int(dims[0]))
                            hs.append(int(dims[1]))
                            status.append("header_decoded")
                        else:
                            # truncated/malformed header: deterministic fake
                            # dims derived from content length — the pixel
                            # decode is stubbed (see decode_image_pixels)
                            ws.append(int(len(content) % 1024))
                            hs.append(int((len(content) // 1024) % 1024))
                            status.append("stub_decoded")
                    else:
                        ws.append(None)
                        hs.append(None)
                        status.append("not_image")
                except Exception as e:  # noqa: BLE001 - quarantine, don't crash
                    nbytes.append(len(content))
                    fmts.append(None)
                    ws.append(None)
                    hs.append(None)
                    status.append(f"error: {type(e).__name__}")
            yield pd.DataFrame(
                {
                    "url": urls,
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                    "sniffed_format": fmts,
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "decode_status": status,
                }
            )

    return pages.select("url", "html").mapInPandas(op, schema=MEDIA_META_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("orig_width", T.IntegerType(), True),
        T.StructField("orig_height", T.IntegerType(), True),
        T.StructField("target_width", T.IntegerType(), False),
        T.StructField("target_height", T.IntegerType(), False),
        T.StructField("scale", T.DoubleType(), True),
        T.StructField("resized", T.BinaryType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)


def resize_images(pages: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """mapInPandas resize operator: (url, html) → fit-preserving resize plan
    per image. The GEOMETRY is real (header-parsed original dimensions, the
    aspect-preserving scale factor a real resampler would apply); the pixel
    RESAMPLE is stubbed — `resized` is NULL with status 'stub_resample', and
    swapping PIL/libvips into the marked branch changes nothing about the
    schema, partitioning, or batch shape. Non-images and undecodable headers
    quarantine as status rows, never job failures (reference S9 semantics)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("url", "ow", "oh", "sc", "rb", "st")}
            for url, content in zip(pdf["url"], pdf["html"]):
                out["url"].append(url)
                fmt = sniff_format(bytes(content)) if content is not None else None
                dims = (
                    parse_image_dims(fmt, bytes(content))
                    if fmt in ("png", "jpeg", "gif")
                    else None
                )
                if dims is None:
                    out["ow"].append(None)
                    out["oh"].append(None)
                    out["sc"].append(None)
                    out["rb"].append(None)
                    out["st"].append("not_image" if fmt not in ("png", "jpeg", "gif") else "undecodable_header")
                    continue
                w, h = dims
                scale = min(target_w / w, target_h / h)
                out["ow"].append(w)
                out["oh"].append(h)
                out["sc"].append(round(scale, 6))
                # REAL-RESAMPLE STUB: PIL/libvips goes here; emit NULL bytes
                # so no caller can mistake the stub for decoded pixels
                out["rb"].append(None)
                out["st"].append("stub_resample")
            yield pd.DataFrame(
                {
                    "url": out["url"],
                    "orig_width": pd.Series(out["ow"], dtype="Int32"),
                    "orig_height": pd.Series(out["oh"], dtype="Int32"),
                    "target_width": pd.Series([target_w] * len(out["url"]), dtype="int32"),
                    "target_height": pd.Series([target_h] * len(out["url"]), dtype="int32"),
                    "scale": pd.Series(out["sc"], dtype="float64"),
                    "resized": out["rb"],
                    "status": out["st"],
                }
            )

    return pages.select("url", "html").mapInPandas(op, schema=RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("byte_offset", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("frame_md5", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)


def sample_video_frames(
    pages: DataFrame, stride_bytes: int = 1 << 16, max_frames: int = 64
) -> DataFrame:
    """flatMap-shaped mapInPandas frame sampler: one input blob → up to
    ``max_frames`` frame records. Codec demux/decode is stubbed (no av libs
    in-container): 'frames' are fixed byte-stride slices with REAL offsets,
    sizes, and content hashes, status 'stub_demux' — a real demuxer slots
    into the marked branch and the row contract (one row per sampled frame,
    cap enforced BEFORE materializing slices, one-row quarantine on bad
    input) is unchanged. The frame cap is the compression-bomb guard the
    archive source applies (sources/archives.py): bounded output per input
    row, by construction."""
    from hashlib import md5 as _md5

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("url", "fi", "off", "nb", "h", "st")}
            for url, content in zip(pdf["url"], pdf["html"]):
                if content is None or len(content) == 0:
                    rows["url"].append(url)
                    rows["fi"].append(0)
                    rows["off"].append(0)
                    rows["nb"].append(0)
                    rows["h"].append(_md5(b"").hexdigest())
                    rows["st"].append("missing")
                    continue
                blob = bytes(content)
                # STUB DEMUX: real implementation parses container atoms /
                # packets here; stride slicing keeps offsets + hashes real
                n = min(max_frames, -(-len(blob) // stride_bytes))
                for i in range(n):
                    off = i * stride_bytes
                    chunk = blob[off : off + stride_bytes]
                    rows["url"].append(url)
                    rows["fi"].append(i)
                    rows["off"].append(off)
                    rows["nb"].append(len(chunk))
                    rows["h"].append(_md5(chunk).hexdigest())
                    rows["st"].append("stub_demux")
            yield pd.DataFrame(
                {
                    "url": rows["url"],
                    "frame_idx": pd.Series(rows["fi"], dtype="int64"),
                    "byte_offset": pd.Series(rows["off"], dtype="int64"),
                    "n_bytes": pd.Series(rows["nb"], dtype="int64"),
                    "frame_md5": rows["h"],
                    "status": rows["st"],
                }
            )

    return pages.select("url", "html").mapInPandas(op, schema=FRAME_SAMPLE_SCHEMA)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
        T.StructField("status", T.StringType(), False),
    ]
)


def byte_histogram_features(pages: DataFrame) -> DataFrame:
    """REAL (not stubbed) content feature extractor: the L1-normalized
    256-bin byte histogram of each blob — a genuine, library-free signal for
    binary near-dup detection and format clustering (compressed formats are
    near-uniform, text is ASCII-banded, each image codec has a distinctive
    marker distribution). One numpy bincount per row, vectorized via
    frombuffer — no per-byte Python. The 256-dim output plugs directly into
    the embedding channels (cosine dedup / ANN) as-is."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, feats, status = [], [], []
            for url, content in zip(pdf["url"], pdf["html"]):
                urls.append(url)
                if content is None or len(content) == 0:
                    feats.append(None)
                    status.append("missing")
                    continue
                arr = np.frombuffer(bytes(content), dtype=np.uint8)
                hist = np.bincount(arr, minlength=256).astype(np.float64)
                feats.append((hist / hist.sum()).tolist())
                status.append("ok")
            yield pd.DataFrame(
                {"url": urls, "features": feats, "status": status}
            )

    return pages.select("url", "html").mapInPandas(op, schema=FEATURES_SCHEMA)
