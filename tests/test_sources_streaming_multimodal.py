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


# ---------------------------------------------------------------------------
# Archive enumeration source (reference S3-S7/S9-S11, sources/archives.py)
# ---------------------------------------------------------------------------

def _zip_bytes(members, compression=None):
    import io
    import zipfile

    buf = io.BytesIO()
    comp = compression if compression is not None else zipfile.ZIP_DEFLATED
    with zipfile.ZipFile(buf, "w", compression=comp) as zf:
        for name, data in members:
            zf.writestr(name, data)
    return buf.getvalue()


def _tar_gz_bytes(members):
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for name, data in members:
            import time

            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def test_archive_enumeration_zip_tar_gzip(spark):
    """S3/S4 + gzip single-file: every regular member surfaces exactly once
    with true size+bytes; directories are skipped (extractor.py:186-223)."""
    import gzip as _gzip

    from dedupe_archived_files_spark.sources.archives import (
        enumerate_archive_members,
    )

    z = _zip_bytes([("a.txt", b"alpha"), ("dir/b.txt", b"beta")])
    t = _tar_gz_bytes([("c.txt", b"gamma"), ("sub/d.txt", b"delta")])
    g = _gzip.compress(b"epsilon")
    df = spark.createDataFrame(
        [("s3://x/one.zip", z), ("s3://x/two.tar.gz", t), ("s3://x/e.txt.gz", g)],
        "path string, content binary",
    )
    rows = {
        (r["archive_path"], r["member_path"]): r
        for r in enumerate_archive_members(df).collect()
    }
    assert rows[("s3://x/one.zip", "a.txt")]["content"] == bytearray(b"alpha")
    assert rows[("s3://x/one.zip", "dir/b.txt")]["member_size"] == 4
    assert rows[("s3://x/two.tar.gz", "c.txt")]["status"] == "ok"
    assert rows[("s3://x/two.tar.gz", "sub/d.txt")]["content"] == bytearray(b"delta")
    assert rows[("s3://x/e.txt.gz", "e.txt")]["content"] == bytearray(b"epsilon")
    assert all(r["depth"] == 0 for r in rows.values())
    assert len(rows) == 5


def test_archive_nested_recursion_and_depth_cap(spark):
    """S10: zip-in-zip expands in-task with `parent/child` path prefixes
    (extractor.py:608-613); the depth cap quarantines, never recurses
    unbounded (extractor.py:68,102-104) — and the cap is REPORTED."""
    from dedupe_archived_files_spark.sources.archives import (
        enumerate_archive_members,
    )

    inner = _zip_bytes([("leaf.txt", b"leafdata")])
    mid = _zip_bytes([("inner.zip", inner), ("mid.txt", b"middata")])
    outer = _zip_bytes([("mid.zip", mid)])
    df = spark.createDataFrame([("outer.zip", outer)], "path string, content binary")

    out = enumerate_archive_members(df).collect()
    by_path = {r["member_path"]: r for r in out}
    assert by_path["mid.zip"]["is_nested_archive"] and (
        by_path["mid.zip"]["status"] == "nested_expanded"
    )
    assert by_path["mid.zip/inner.zip"]["depth"] == 1
    leaf = by_path["mid.zip/inner.zip/leaf.txt"]
    assert leaf["status"] == "ok" and leaf["depth"] == 2
    assert leaf["content"] == bytearray(b"leafdata")
    assert by_path["mid.zip/mid.txt"]["status"] == "ok"

    # depth cap: same nesting, max_depth=2 → inner.zip is NOT expanded and
    # the refusal is visible as a status row
    capped = enumerate_archive_members(df, max_depth=2).collect()
    cap_by_path = {r["member_path"]: r for r in capped}
    assert cap_by_path["mid.zip/inner.zip"]["status"] == "depth_cap"
    assert "mid.zip/inner.zip/leaf.txt" not in cap_by_path


def test_archive_quarantine_and_unsupported(spark):
    """S9 error semantics: corrupt/unsupported/missing blobs become status
    rows; sibling archives in the same Arrow batch still enumerate."""
    from dedupe_archived_files_spark.sources.archives import (
        enumerate_archive_members,
    )

    good = _zip_bytes([("ok.txt", b"fine")])
    corrupt = b"PK\x03\x04" + b"\x00" * 16  # zip magic, garbage body
    seven = b"7z\xbc\xaf\x27\x1c" + b"\x00" * 8  # 7z magic, wheel absent
    df = spark.createDataFrame(
        [
            ("good.zip", good),
            ("bad.zip", corrupt),
            ("x.7z", seven),
            ("none.zip", None),
            ("plain.txt", b"just text"),
        ],
        "path string, content binary",
    )
    rows = enumerate_archive_members(df).collect()
    status = {r["archive_path"]: r["status"] for r in rows}
    assert status["good.zip"] == "ok"
    assert status["bad.zip"].startswith("corrupt:")
    assert status["x.7z"] == "unsupported:7z"
    assert status["none.zip"] == "missing"
    assert status["plain.txt"] == "not_an_archive"
    assert len(rows) == 5


def test_pack_zip_groups_deterministic_roundtrip(spark):
    """pack_zip_groups is byte-deterministic across partitionings (fixed
    timestamps, sorted members) and round-trips through enumeration."""
    from dedupe_archived_files_spark.sources.archives import (
        enumerate_archive_members,
        pack_zip_groups,
    )

    data = [(f"g{i % 2}", f"m{i}.txt", f"text {i}") for i in range(6)]
    df1 = spark.createDataFrame(data, "g string, name string, text string")
    df8 = spark.createDataFrame(data, "g string, name string, text string").repartition(8)
    p1 = {r["path"]: bytes(r["content"]) for r in pack_zip_groups(df1, "g", "name", "text").collect()}
    p8 = {r["path"]: bytes(r["content"]) for r in pack_zip_groups(df8, "g", "name", "text").collect()}
    assert p1 == p8 and len(p1) == 2

    packed = pack_zip_groups(df1, "g", "name", "text")
    members = enumerate_archive_members(packed).collect()
    got = {(r["archive_path"], r["member_path"]): bytes(r["content"]) for r in members}
    assert got == {(g, n): t.encode() for g, n, t in data}


def test_cross_archive_duplicate_detection(spark):
    """The reference's headline workflow end-to-end: enumerate two archives,
    bridge members into the pages shape, run the exact-dedup operator — the
    shared member dedupes ACROSS archives under its composite
    `archive#member` identity (core/scanner.py Phase 1-2 semantics)."""
    from dedupe_archived_files_spark.operators.dedupe import (
        exact_duplicate_clusters,
    )
    from dedupe_archived_files_spark.operators.extract import extract_pages
    from dedupe_archived_files_spark.sources.archives import (
        archive_members_as_pages,
        enumerate_archive_members,
    )

    shared = b"identical content shared by both archives, long enough to hash"
    z1 = _zip_bytes([("keep/shared.txt", shared), ("only1.txt", b"unique one")])
    z2 = _zip_bytes([("other/shared_copy.txt", shared), ("only2.txt", b"unique two")])
    df = spark.createDataFrame(
        [("a1.zip", z1), ("a2.zip", z2)], "path string, content binary"
    )
    pages = archive_members_as_pages(enumerate_archive_members(df))
    clusters = exact_duplicate_clusters(extract_pages(pages)).collect()
    assert len(clusters) == 1
    assert sorted(clusters[0]["urls"]) == [
        "a1.zip#keep/shared.txt",
        "a2.zip#other/shared_copy.txt",
    ]
    assert clusters[0]["canonical_url"] == "a1.zip#keep/shared.txt"


def test_archive_member_cap_enforced_before_decompression(spark):
    """Zip-bomb guard semantics: an oversized member is rejected on its SIZE
    HEADER (zip/tar) or by the capped streaming decompressor (bare gzip —
    no header), reported as a `truncated:` status row with null content;
    in-cap siblings in the same archive still enumerate."""
    import gzip as _gzip

    from dedupe_archived_files_spark.sources.archives import (
        _capped_decompress,
        enumerate_archive_members,
    )

    big = b"x" * 4096
    z = _zip_bytes([("small.txt", b"ok"), ("big.bin", big)])
    g = _gzip.compress(b"y" * 4096)  # expands far past the cap below
    df = spark.createDataFrame(
        [("a.zip", z), ("b.gz", g)], "path string, content binary"
    )
    rows = {
        (r["archive_path"], r["member_path"]): r
        for r in enumerate_archive_members(df, max_member_bytes=1024).collect()
    }
    trunc = rows[("a.zip", "big.bin")]
    assert trunc["status"] == "truncated:1024"
    assert trunc["content"] is None
    assert trunc["member_size"] == len(big)  # header size, member never read
    assert rows[("a.zip", "small.txt")]["status"] == "ok"
    gz = rows[("b.gz", "b")]
    assert gz["status"] == "truncated:1024" and gz["content"] is None

    # the capped decompressor itself never inflates past cap+1
    assert _capped_decompress("gzip", g, 1024) is None
    assert _capped_decompress("gzip", _gzip.compress(b"z" * 100), 1024) == b"z" * 100


def test_crawl_sessions_stream(spark, tmp_path):
    """Native session_window gap sessionization across micro-batches: pages
    more than 30 min apart land in different sessions; append mode emits a
    session only once the watermark (advanced by the SECOND micro-batch,
    maxFilesPerTrigger=1) proves it closed. Verifies merged counts and the
    first-ts/last-ts+gap window bounds."""
    import datetime
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedupe_archived_files_spark.streaming.incremental import (
        crawl_sessions_stream,
    )

    src = tmp_path / "sess_in"
    src.mkdir()
    t0 = datetime.datetime(2025, 6, 1, 0, 0, 0)

    def write_file(name, rows, mtime):
        tbl = pa.table(
            {
                "url": [r[0] for r in rows],
                "warc_ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "html": pa.array([None] * len(rows), pa.binary()),
                "text": [r[1] for r in rows],
                "lang": [r[3] for r in rows],
            }
        )
        path = str(src / name)
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    mins = lambda m: t0 + datetime.timedelta(minutes=m)  # noqa: E731
    now = _time.time()
    # batch 1: en pages 0 + 10 min (ONE session, merged), en page at +120 min
    # (a second session), de page at 0 (its own key)
    write_file(
        "b1.parquet",
        [
            ("u1", "text one", mins(0), "en"),
            ("u2", "text two", mins(10), "en"),
            ("u3", "text three", mins(120), "en"),
            ("u4", "text vier", mins(0), "de"),
        ],
        now - 60,
    )
    # batch 2: far-future page advances the watermark (10 h - 2 h watermark
    # = +8 h) past every batch-1 session end, forcing their append emission
    write_file("b2.parquet", [("u5", "text five", mins(600), "en")], now)

    stream = (
        spark.readStream.schema(S.PAGES)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = crawl_sessions_stream(stream_extract(stream, PipelineConfig()))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("crawl_sessions")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT * FROM crawl_sessions ORDER BY lang, session_start"
    ).collect()
    got = {
        (r["lang"], r["session_start"], r["session_end"]): r["n_pages"]
        for r in rows
    }
    gap = datetime.timedelta(minutes=30)
    assert got == {
        ("de", mins(0), mins(0) + gap): 1,
        ("en", mins(0), mins(10) + gap): 2,   # merged 0+10min pages
        ("en", mins(120), mins(120) + gap): 1,
    }, got


# ---------------------------------------------------------------------------
# Multimodal: real header parsing + resize / frame-sample / feature plumbing
# ---------------------------------------------------------------------------

def _png_bytes(w, h):
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR"
        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00" + b"\x00" * 8
    )


def _gif_bytes(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 20


def _jpeg_bytes(w, h):
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03" + b"\x00" * 9
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_parse_image_dims_real_headers():
    from dedupe_archived_files_spark.functions.multimodal import (
        parse_image_dims,
        sniff_format,
    )

    for blob, fmt, dims in [
        (_png_bytes(640, 480), "png", (640, 480)),
        (_gif_bytes(320, 200), "gif", (320, 200)),
        (_jpeg_bytes(1920, 1080), "jpeg", (1920, 1080)),
    ]:
        assert sniff_format(blob) == fmt
        assert parse_image_dims(fmt, blob) == dims
    # truncated headers -> None (stub fallback), never an exception
    assert parse_image_dims("png", _png_bytes(10, 10)[:12]) is None
    assert parse_image_dims("gif", b"GIF89a\x01") is None
    assert parse_image_dims("jpeg", b"\xff\xd8\xff") is None


def test_extract_media_meta_header_decoded(spark):
    from dedupe_archived_files_spark.functions.multimodal import extract_media_meta

    rows = [
        ("png", _png_bytes(640, 480)),
        ("gif", _gif_bytes(320, 200)),
        ("jpeg", _jpeg_bytes(1920, 1080)),
        ("trunc", _png_bytes(9, 9)[:12]),
        ("text", b"<html>hi</html>"),
        ("none", None),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r for r in extract_media_meta(df).collect()}
    assert (got["png"]["width"], got["png"]["height"]) == (640, 480)
    assert (got["gif"]["width"], got["gif"]["height"]) == (320, 200)
    assert (got["jpeg"]["width"], got["jpeg"]["height"]) == (1920, 1080)
    assert all(got[k]["decode_status"] == "header_decoded" for k in ("png", "gif", "jpeg"))
    assert got["trunc"]["decode_status"] == "stub_decoded"
    assert got["text"]["decode_status"] == "not_image"
    assert got["none"]["decode_status"] == "missing"


def test_resize_images_geometry(spark):
    from dedupe_archived_files_spark.functions.multimodal import resize_images

    df = spark.createDataFrame(
        [("a", _png_bytes(640, 480)), ("b", b"%PDF-1.4 not an image")],
        "url string, html binary",
    )
    got = {r["url"]: r for r in resize_images(df, 224, 224).collect()}
    a = got["a"]
    assert (a["orig_width"], a["orig_height"]) == (640, 480)
    assert abs(a["scale"] - 224 / 640) < 1e-9  # fit-preserving: min of ratios
    assert a["resized"] is None and a["status"] == "stub_resample"
    assert got["b"]["status"] == "not_image" and got["b"]["scale"] is None


def test_sample_video_frames_cap_and_hashes(spark):
    from hashlib import md5

    from dedupe_archived_files_spark.functions.multimodal import (
        sample_video_frames,
    )

    blob = bytes(range(256)) * 40  # 10240 bytes
    df = spark.createDataFrame(
        [("v", blob), ("empty", None)], "url string, html binary"
    )
    rows = sample_video_frames(df, stride_bytes=4096, max_frames=2).collect()
    v = sorted(
        (r for r in rows if r["url"] == "v"), key=lambda r: r["frame_idx"]
    )
    # cap enforced: 10240/4096 = 3 slices, capped at 2
    assert len(v) == 2
    assert [r["byte_offset"] for r in v] == [0, 4096]
    assert v[0]["frame_md5"] == md5(blob[:4096]).hexdigest()
    assert v[1]["n_bytes"] == 4096
    e = [r for r in rows if r["url"] == "empty"]
    assert len(e) == 1 and e[0]["status"] == "missing"


def test_byte_histogram_features_real_signal(spark):
    import numpy as np

    from dedupe_archived_files_spark.functions.multimodal import (
        byte_histogram_features,
    )

    df = spark.createDataFrame(
        [("ascii", b"aaaabbbb"), ("uniform", bytes(range(256)))],
        "url string, html binary",
    )
    got = {r["url"]: r for r in byte_histogram_features(df).collect()}
    f = np.array(got["ascii"]["features"])
    assert abs(f.sum() - 1.0) < 1e-9
    assert f[ord("a")] == 0.5 and f[ord("b")] == 0.5
    u = np.array(got["uniform"]["features"])
    assert np.allclose(u, 1 / 256)


def test_cross_crawl_dup_stream(spark, tmp_path):
    """Watermarked stream-stream interval join: identical content observed in
    both crawl streams within the lag window matches; the same content seen
    outside the window does NOT; distinct content never matches. (Inner
    stream-stream joins emit as matches arrive — no watermark wait needed
    for the positive rows; the watermark's job is state eviction.)"""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedupe_archived_files_spark.streaming.incremental import (
        cross_crawl_dup_stream,
    )

    t0 = datetime.datetime(2025, 6, 1, 0, 0, 0)

    def write_pages(d, rows):
        d.mkdir()
        tbl = pa.table(
            {
                "url": [r[0] for r in rows],
                "warc_ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "html": pa.array([None] * len(rows), pa.binary()),
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
            }
        )
        pq.write_table(tbl, str(d / "part.parquet"))

    hours = lambda h: t0 + datetime.timedelta(hours=h)  # noqa: E731
    # crawl A: content X at t0, content Y at t0
    write_pages(tmp_path / "a", [("a1", "content X", hours(0)), ("a2", "content Y", hours(0))])
    # crawl B: X again 1 h later (match), X again 60 h later (outside the
    # 24 h window -> no match), Z (never matches)
    write_pages(
        tmp_path / "b",
        [
            ("b1", "content X", hours(1)),
            ("b2", "content X", hours(60)),
            ("b3", "content Z", hours(1)),
        ],
    )
    sa = stream_extract(stream_pages(spark, str(tmp_path / "a")), PipelineConfig())
    sb = stream_extract(stream_pages(spark, str(tmp_path / "b")), PipelineConfig())
    q = (
        cross_crawl_dup_stream(sa, sb, max_lag_hours=24)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cross_crawl")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT url_a, url_b FROM cross_crawl").collect()
    assert {(r["url_a"], r["url_b"]) for r in rows} == {("a1", "b1")}
