"""Sources, streaming ingest, and multimodal plumbing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dedupe_archived_files_spark import schema as S
from dedupe_archived_files_spark.config import PipelineConfig
from dedupe_archived_files_spark.functions.multimodal import (
    extract_media_meta,
    sniff_format,
)
from dedupe_archived_files_spark.sources.pages import (
    binary_files_as_pages,
    read_binary_files,
    read_pages,
    write_clusters,
    write_quarantine,
)
from dedupe_archived_files_spark.streaming.incremental import (
    duplicate_rate_per_window,
    start_incremental_append,
    stream_extract,
    stream_pages,
)


def test_read_pages_schema_enforced(spark, pages_dfs, tmp_path):
    pages, _, _ = pages_dfs
    p = str(tmp_path / "pages")
    pages.write.parquet(p)
    back = read_pages(spark, p)
    # parquet round-trip relaxes nullability; names + types are the contract
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in S.PAGES.fields
    ]
    assert back.count() == pages.count()


def test_binary_files_source(spark, tmp_path):
    """Directory-walk source (reference S1/S2): files become page rows."""
    d = tmp_path / "raw"
    d.mkdir()
    (d / "a.html").write_bytes(b"<html><body>hello</body></html>")
    (d / "b.html").write_bytes(b"<html><body>world</body></html>")
    files = read_binary_files(spark, str(d), glob="*.html")
    pages = binary_files_as_pages(files)
    rows = pages.collect()
    assert len(rows) == 2
    assert all(r["html"] is not None and r["text"] is None for r in rows)
    assert pages.schema["url"].dataType.typeName() == "string"


def test_write_quarantine_and_clusters(spark, pages_dfs, tmp_path):
    from dedupe_archived_files_spark.operators.extract import extract_pages

    pages, _, _ = pages_dfs
    pt = extract_pages(pages, PipelineConfig())
    qdir = str(tmp_path / "quarantine")
    write_quarantine(pt, qdir)
    assert spark.read.parquet(qdir).count() == 5

    clusters = spark.createDataFrame(
        [("u1", "c1", "c1"), ("u2", "c1", "c1")], schema=S.CLUSTERS
    )
    cdir = str(tmp_path / "clusters")
    write_clusters(clusters, cdir)
    assert spark.read.parquet(cdir).count() == 2


def test_sniff_format():
    assert sniff_format(b"\x89PNG\r\n\x1a\nxxxx") == "png"
    assert sniff_format(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert sniff_format(b"PK\x03\x04zip!") == "zip"
    assert sniff_format(b"<html>") == "markup"
    assert sniff_format(b"\x00\x01\x02") == "unknown"
    assert sniff_format(None) is None


def test_extract_media_meta(spark):
    rows = [
        ("u_png", bytearray(b"\x89PNG\r\n\x1a\n" + b"x" * 100)),
        ("u_jpg", bytearray(b"\xff\xd8\xff" + b"y" * 2100)),
        ("u_txt", bytearray(b"plain text")),
        ("u_nil", None),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = {r["url"]: r.asDict() for r in extract_media_meta(df).collect()}
    assert out["u_png"]["sniffed_format"] == "png"
    assert out["u_png"]["decode_status"] == "stub_decoded"
    assert out["u_png"]["n_bytes"] == 108
    assert out["u_jpg"]["width"] == (2103 % 1024)
    assert out["u_txt"]["decode_status"] == "not_image"
    assert out["u_nil"]["decode_status"] == "missing"


def test_streaming_incremental_append(spark, pages_dfs, tmp_path):
    """availableNow micro-batch ingest: extract runs per batch, re-runs append
    nothing new (J6 anti-join semantics on a stream)."""
    pages, _, _ = pages_dfs
    src = str(tmp_path / "incoming")
    tgt = str(tmp_path / "pages_text")
    ckpt = str(tmp_path / "ckpt")
    pages.limit(50).write.parquet(src)

    q = start_incremental_append(stream_pages(spark, src), tgt, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(tgt).count()
    assert n1 == 50

    # second run over the same checkpoint: no new files → no new rows
    q2 = start_incremental_append(stream_pages(spark, src), tgt, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(tgt).count() == n1


def test_duplicate_rate_window_plan(spark, pages_dfs, tmp_path):
    """The monitoring aggregate runs on the stream (memory sink smoke)."""
    from dedupe_archived_files_spark.operators.extract import extract_pages

    pages, _, _ = pages_dfs
    src = str(tmp_path / "in2")
    pages.limit(100).write.parquet(src)
    stream = stream_extract(stream_pages(spark, src), PipelineConfig())
    agg = duplicate_rate_per_window(stream)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("dup_rate")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; the plan executing
    # end-to-end without error is the smoke contract here
    spark.sql("SELECT * FROM dup_rate").collect()


def test_stateful_dedupe_stream(spark, tmp_path):
    """applyInPandasWithState exact-dedupe across micro-batches: each distinct
    content hash is emitted exactly once even when duplicates arrive in a
    LATER batch (maxFilesPerTrigger=1 forces one source file per
    micro-batch; per-hash GroupState survives between batches)."""
    import datetime
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedupe_archived_files_spark.streaming.incremental import (
        stateful_dedupe_stream,
    )

    src = tmp_path / "stateful_in"
    src.mkdir()
    ts = datetime.datetime(2025, 6, 1)

    def write_file(name, rows, mtime):
        tbl = pa.table(
            {
                "url": [r[0] for r in rows],
                "warc_ts": pa.array([ts] * len(rows), pa.timestamp("us")),
                "html": pa.array([None] * len(rows), pa.binary()),
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
            }
        )
        path = str(src / name)
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    now = _time.time()
    # batch 1: contents A, B       batch 2: B again (dup), C
    write_file("f1.parquet", [("u1", "content A"), ("u2", "content B")], now - 60)
    write_file("f2.parquet", [("u3", "content B"), ("u4", "content C")], now)

    stream = (
        spark.readStream.schema(S.PAGES)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = stateful_dedupe_stream(stream, PipelineConfig())
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("stateful_dedupe")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT url, full_hash FROM stateful_dedupe").collect()
    urls = sorted(r["url"] for r in rows)
    # exactly one survivor per distinct content; the "content B" survivor is
    # whichever batch ran first (file order is mtime-based but not contractual)
    assert len(rows) == 3, urls
    assert "u1" in urls and "u4" in urls
    assert ("u2" in urls) != ("u3" in urls)
    assert len({r["full_hash"] for r in rows}) == 3
