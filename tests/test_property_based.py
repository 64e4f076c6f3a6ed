"""Property-based tests (hypothesis) over the engine's PURE kernels — the
functions whose correctness everything Spark-side leans on but which need no
SparkSession per example: archive enumeration round-trips, image header
parsing, capped decompression, and the XXH64 reference implementation's
algebraic branch structure."""

from __future__ import annotations

import io
import tarfile
import zipfile

from hypothesis import given, settings
from hypothesis import strategies as st

from dedupe_archived_files_spark.functions.hashing import xxh64_py
from dedupe_archived_files_spark.functions.multimodal import (
    parse_image_dims,
    sniff_format,
)
from dedupe_archived_files_spark.sources.archives import (
    _capped_decompress,
    _enumerate,
)

MEMBER_NAMES = st.lists(
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789_-.",
        min_size=1,
        max_size=20,
    ).map(lambda s: s.strip(".") or "x"),
    min_size=1,
    max_size=8,
    unique=True,
)
MEMBER_BYTES = st.binary(min_size=0, max_size=4096)


def _zip(members):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        for name, data in members:
            zf.writestr(name, data)
    return buf.getvalue()


def _tar(members):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


@settings(max_examples=40, deadline=None)
@given(names=MEMBER_NAMES, data=st.data())
def test_archive_roundtrip_lossless(names, data):
    """INVARIANT (reference core/extractor.py:89: every member surfaces
    exactly once, byte-exact): pack arbitrary members → enumerate → the ok
    rows reproduce exactly the packed (name, bytes, size) set, for both ZIP
    and TAR containers."""
    members = [(n, data.draw(MEMBER_BYTES)) for n in names]
    for blob in (_zip(members), _tar(members)):
        rows = list(_enumerate("a", "a", blob, 0, 10, 1 << 26))
        ok = [r for r in rows if r[6] == "ok"]
        got = {(r[1], bytes(r[5])) for r in ok}
        # top-level members keep their own path; nesting would prefix
        assert got == {(n, d) for n, d in members}
        assert all(r[2] == len(bytes(r[5])) for r in ok)  # true sizes


@settings(max_examples=40, deadline=None)
@given(names=MEMBER_NAMES, data=st.data())
def test_archive_member_cap_never_silent(names, data):
    """Members over the cap are rejected as `truncated:` STATUS rows (never
    silently dropped, never crash): rows out == members in, and every member
    is either ok (<= cap) or truncated (> cap)."""
    cap = 64
    members = [(n, data.draw(st.binary(min_size=0, max_size=256))) for n in names]
    blob = _zip(members)
    rows = list(_enumerate("a", "a", blob, 0, 10, cap))
    by_name = {r[1]: r for r in rows if r[1] is not None}
    assert len(by_name) == len(members)
    for n, d in members:
        r = by_name[n]
        if len(d) <= cap:
            assert r[6] == "ok" and bytes(r[5]) == d
        else:
            assert r[6].startswith("truncated") and r[5] is None


@settings(max_examples=60, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=8192),
    cap=st.integers(min_value=0, max_value=8192),
)
def test_capped_decompress_hard_stop(data, cap):
    """The streaming decompressor NEVER returns more than cap bytes: either
    the exact payload (fits) or None (would exceed) — the compression-bomb
    guard's contract, for all inputs and caps."""
    import gzip

    blob = gzip.compress(data)
    out = _capped_decompress("gzip", blob, cap)
    if len(data) <= cap:
        assert out == data
    else:
        assert out is None


@settings(max_examples=80, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=2**16 - 1),
    h=st.integers(min_value=1, max_value=2**16 - 1),
    trailer=st.binary(max_size=64),
)
def test_image_dims_roundtrip(w, h, trailer):
    """Constructed headers always parse back to the exact dimensions, with
    arbitrary trailing bytes — and truncating the header never raises, it
    returns None (the stub-fallback contract)."""
    png = (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00" + trailer
    )
    gif = b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + trailer
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03" + b"\x00" * 9
    )
    jpg = b"\xff\xd8" + app0 + sof + trailer
    assert parse_image_dims("png", png) == (w, h)
    assert parse_image_dims("gif", gif) == (w, h)
    assert parse_image_dims("jpeg", jpg) == (w, h)
    for fmt, blob in (("png", png), ("gif", gif), ("jpeg", jpg)):
        for cut in (0, 3, 9, len(blob) // 2):
            parse_image_dims(fmt, blob[:cut])  # must not raise


@settings(max_examples=100, deadline=None)
@given(data=st.binary(max_size=200), seed=st.integers(0, 2**32 - 1))
def test_xxh64_branch_consistency(data, seed):
    """Structural properties that hold for a correct XXH64 across all branch
    classes (JVM bit-parity is pinned separately in test_round2_gates):
    64-bit range, determinism, seed sensitivity, and prefix sensitivity."""
    h = xxh64_py(data, seed)
    assert 0 <= h < 2**64
    assert h == xxh64_py(data, seed)
    if data:
        # appending a byte must change the digest (would catch tail-loop
        # off-by-ones that drop the last byte)
        assert xxh64_py(data + b"\x00", seed) != h
    assert xxh64_py(data, seed ^ 1) != h or data == b""  # seed reaches output
