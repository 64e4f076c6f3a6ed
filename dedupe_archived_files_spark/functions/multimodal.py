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
                        # deterministic fake dimensions derived from content
                        # length — the real decode is stubbed (see
                        # decode_image_pixels)
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
