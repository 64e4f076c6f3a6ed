"""Deterministic synthetic `pages` corpus + ground truth (FIXTURES.md §1-§3).

Every population mirrors a reference test case (cited per block below). The
generator is pure-Python + numpy with a fixed seed: same seed → byte-identical
corpus, so labels are exact by construction and the expected clusters are
derivable without running the engine.

No external data; nothing is read from disk.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

import numpy as np

VOCAB = [
    # deterministic small vocabulary; content realism doesn't matter, identity does
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "page", "crawl", "web", "archive", "dedupe",
    "spark", "shuffle", "partition", "cluster", "minhash", "band", "shingle",
    "token", "hash", "block", "verify", "resolve", "lineage", "snapshot",
]

EPOCH = np.datetime64("2025-06-01T00:00:00")


@dataclass
class Corpus:
    """Rows + ground truth. ``pages`` rows are tuples matching schema.PAGES."""

    pages: list = field(default_factory=list)          # (url, warc_ts, html, text, lang)
    labeled_pairs: list = field(default_factory=list)  # (url_a, url_b, is_dup, kind, block_key)
    dup_edges: list = field(default_factory=list)      # planted (url_a, url_b) true-dup edges

    def add_page(self, url: str, html: bytes | None, text: str | None,
                 lang: str = "en", ts_offset_s: int = 0) -> None:
        ts = (EPOCH + np.timedelta64(ts_offset_s, "s")).astype("datetime64[us]").item()
        self.pages.append((url, ts, html, text, lang))

    def label(self, a: str, b: str, is_dup: bool, kind: str, block_key: str) -> None:
        a, b = (a, b) if a < b else (b, a)
        self.labeled_pairs.append((a, b, is_dup, kind, block_key))
        if is_dup:
            self.dup_edges.append((a, b))

    def expected_clusters(self) -> list:
        """Union-find over planted dup edges; canonical = min url (deterministic,
        unlike the reference's last-writer-wins, core/database.py:195-208)."""
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in self.dup_edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        urls = {u for e in self.dup_edges for u in e}
        out = []
        for u in sorted(urls):
            root = find(u)
            out.append((u, root, root))  # cluster_id == canonical_url == min member
        return out


def _body(rng: np.random.RandomState, n_tokens: int) -> str:
    idx = rng.randint(0, len(VOCAB), size=n_tokens)
    return " ".join(VOCAB[i] for i in idx)


def _html(title: str, body: str) -> bytes:
    return (
        f"<html><head><title>{title}</title>"
        f"<script>var x=1;</script><style>p{{}}</style></head>"
        f"<body><p>{body}</p></body></html>"
    ).encode("utf-8")


def _perturb(rng: np.random.RandomState, body: str, frac: float) -> str:
    """Replace ~frac of tokens — near-duplicate planting (FIXTURES.md: 1-5%)."""
    toks = body.split(" ")
    n = max(1, int(len(toks) * frac))
    pos = rng.choice(len(toks), size=n, replace=False)
    for p in pos:
        toks[p] = VOCAB[rng.randint(0, len(VOCAB))]
    return " ".join(toks)


def generate_corpus(seed: int = 42, n_base: int = 200, hot_key_rows: int = 120) -> Corpus:
    """Build the full planted corpus. ~(n_base + 350) rows at defaults."""
    rng = np.random.RandomState(seed)
    c = Corpus()

    # -- filler: unique pages (negatives by construction) --------------------
    langs = ["en", "en", "en", "de", "fr", "zh"]
    for i in range(n_base):
        body = _body(rng, 80 + int(rng.randint(0, 200)))
        c.add_page(
            f"https://site{i % 37}.example.com/base/{i}",
            _html(f"base {i}", body), None, langs[i % len(langs)], i,
        )

    # -- exact-duplicate groups k=2,3,5 (reference tests/test_extensive.py:33-131,
    #    tests/test_database.py:178-200: many-to-many fan-out) ----------------
    for gi, k in enumerate([2, 2, 2, 3, 3, 5]):
        body = _body(rng, 150)
        html = _html(f"exact group {gi}", body)
        urls = [f"https://dup{u}.example.com/exact/g{gi}/copy{u}" for u in range(k)]
        for u, url in enumerate(urls):
            c.add_page(url, html, None, "en", 1000 + gi * 10 + u)
        for a, b in itertools.combinations(urls, 2):
            c.label(a, b, True, "exact", "full_hash")

    # -- every-5th duplicated corpus: 100 pages, copy every 5th → exactly 20
    #    matched pairs (reference tests/test_extensive.py:684-725) ------------
    for i in range(100):
        body = _body(rng, 60)
        html = _html(f"corpus {i}", body)
        c.add_page(f"https://corpus.example.com/orig/{i}", html, None, "en", 2000 + i)
        if i % 5 == 0:
            c.add_page(f"https://mirror.example.com/copy/{i}", html, None, "en", 2500 + i)
            c.label(
                f"https://corpus.example.com/orig/{i}",
                f"https://mirror.example.com/copy/{i}",
                True, "exact", "full_hash",
            )

    # -- near-duplicates (no reference analogue; north-rule MinHash target) ---
    for gi in range(25):
        body = _body(rng, 400)
        url_a = f"https://near.example.com/a/{gi}"
        url_b = f"https://near.example.com/b/{gi}"
        c.add_page(url_a, _html(f"near {gi}", body), None, "en", 3000 + gi)
        c.add_page(url_b, _html(f"near {gi}", _perturb(rng, body, 0.02)), None, "en", 3100 + gi)
        c.label(url_a, url_b, True, "near", "minhash")

    # -- hard negatives: same template, heavily edited (same URL-ish block key,
    #    below tau) ------------------------------------------------------------
    for gi in range(15):
        body = _body(rng, 300)
        url_a = f"https://hardneg.example.com/a/{gi}"
        url_b = f"https://hardneg.example.com/b/{gi}"
        c.add_page(url_a, _html(f"hardneg {gi}", body), None, "en", 3500 + gi)
        c.add_page(url_b, _html(f"hardneg {gi}", _perturb(rng, body, 0.5)), None, "en", 3600 + gi)
        c.label(url_a, url_b, False, "hard_negative", "minhash")

    # -- quick-hash-collision pair: identical first 8 KiB, different tail —
    #    must NOT match (reference tests/test_scanner.py:378-411) -------------
    # prefix > 8192 bytes of extracted text (quick hashes collide); tails are
    # ~38% of the document so shingle Jaccard lands well below tau — the pair
    # must fail BOTH exact verification and near-dup verification.
    prefix = _body(rng, 2500)
    for tag, tail in (("x", "tail one " + _body(rng, 1500)), ("y", "tail two " + _body(rng, 1500))):
        c.add_page(
            f"https://bigfile.example.com/quickcollide/{tag}",
            _html("quick collide", prefix + " " + tail), None, "en", 4000,
        )
    c.label(
        "https://bigfile.example.com/quickcollide/x",
        "https://bigfile.example.com/quickcollide/y",
        False, "hard_negative", "quick_hash",
    )

    # -- large pages straddling the 1 MiB quick-hash threshold
    #    (reference tests/test_extensive.py:369-417) ---------------------------
    # each size gets its OWN unit: repeating one unit across sizes would make
    # the shingle SETS identical and the near-dup channel would (correctly)
    # merge all sizes into one cluster
    for mult, tag in [(2, "half"), (4, "at"), (8, "twice")]:
        big_unit = _body(rng, 40000)  # ~0.25 MiB of text
        body = " ".join([big_unit] * mult)
        html = _html(f"big {tag}", body)
        c.add_page(f"https://big.example.com/{tag}/a", html, None, "en", 4100)
        c.add_page(f"https://big.example.com/{tag}/b", html, None, "en", 4101)
        c.label(
            f"https://big.example.com/{tag}/a", f"https://big.example.com/{tag}/b",
            True, "exact", "full_hash",
        )

    # -- zero-byte pages ARE duplicates of each other
    #    (reference tests/test_extensive.py:731-772) ---------------------------
    c.add_page("https://empty.example.com/one", b"", None, "en", 4200)
    c.add_page("https://empty.example.com/two", b"", None, "en", 4201)
    c.label("https://empty.example.com/one", "https://empty.example.com/two",
            True, "exact", "full_hash")

    # -- unicode / special-char urls & titles (tests/test_extensive.py:591-642)
    ubody = _body(rng, 90)
    c.add_page("https://unicode.example.com/文件 with space/ä", _html("unicode 文件", ubody),
               None, "zh", 4300)
    c.add_page("https://unicode.example.com/copy%20of/文件", _html("unicode 文件", ubody),
               None, "zh", 4301)
    c.label("https://unicode.example.com/copy%20of/文件",
            "https://unicode.example.com/文件 with space/ä", True, "exact", "full_hash")

    # -- full-byte-range binary content dup pair (tests/test_extensive.py:644-682)
    allbytes = bytes(range(256)) * 100
    c.add_page("https://binary.example.com/all/a", allbytes, None, None, 4400)
    c.add_page("https://binary.example.com/all/b", allbytes, None, None, 4401)
    c.label("https://binary.example.com/all/a", "https://binary.example.com/all/b",
            True, "exact", "full_hash")

    # -- very long url path segment (tests/test_extensive.py:774-814) ----------
    long_seg = "L" * 220
    lbody = _body(rng, 70)
    c.add_page(f"https://long.example.com/{long_seg}/a", _html("long", lbody), None, "en", 4500)
    c.add_page(f"https://long.example.com/{long_seg}/b", _html("long", lbody), None, "en", 4501)
    c.label(f"https://long.example.com/{long_seg}/a", f"https://long.example.com/{long_seg}/b",
            True, "exact", "full_hash")

    # -- nested/compound identity: deep path shares content with shallow url
    #    (tests/test_extensive.py:133-192 — identity ignores path depth) -------
    nbody = _body(rng, 110)
    c.add_page("https://deep.example.com/l1/l2/l3/l4/deep", _html("deep", nbody), None, "en", 4600)
    c.add_page("https://shallow.example.com/flat", _html("deep", nbody), None, "en", 4601)
    c.label("https://deep.example.com/l1/l2/l3/l4/deep", "https://shallow.example.com/flat",
            True, "exact", "full_hash")

    # -- corrupt / undecodable rows: html null AND text null → quarantined,
    #    never clustered, never committed (tests/test_scanner.py:198-212) ------
    for i in range(5):
        c.add_page(f"https://corrupt.example.com/{i}", None, None, "en", 4700 + i)

    # -- pre-extracted rows: text present, html null (input_hint allows both) --
    for i in range(10):
        c.add_page(f"https://textonly.example.com/{i}", None, _body(rng, 60), "en", 4800 + i)

    # -- hot blocking key (skew): many rows, one normalized-URL template key,
    #    unique contents (north-rule salting/caps exercise) --------------------
    for i in range(hot_key_rows):
        body = _body(rng, 40)
        c.add_page(f"https://hot.example.com/listing?page={i}", _html("listing", body),
                   None, "en", 5000 + i)

    return c


def recrawl_snapshot(seed: int = 42) -> list:
    """Second-snapshot rows for resume tests (reference needs_rescan,
    core/models.py:56-60): same urls, newer warc_ts, changed html → must be
    reprocessed; unchanged (url, warc_ts) rows are skipped on resume."""
    rng = np.random.RandomState(seed + 1)
    rows = []
    for i in range(7):
        ts = (EPOCH + np.timedelta64(86400 + i, "s")).astype("datetime64[us]").item()
        rows.append(
            (f"https://site{i % 37}.example.com/base/{i}", ts,
             _html(f"recrawled {i}", _body(rng, 90)), None, "en")
        )
    # edge-DOOMING change: this url's committed exact edge (to
    # deep.example.com, labeled in generate_corpus) must be deleted by the
    # incremental edge MERGE once its content diverges
    ts7 = (EPOCH + np.timedelta64(86400 + 7, "s")).astype("datetime64[us]").item()
    rows.append(
        ("https://shallow.example.com/flat", ts7,
         _html("recrawled flat", _body(rng, 90)), None, "en")
    )
    # edge-CREATING change: two re-crawled urls converge on identical html →
    # a fresh exact-dup edge between two changed urls must be inserted
    twin = _html("recrawled twin", _body(rng, 90))
    for i in (8, 9):
        ts = (EPOCH + np.timedelta64(86400 + i, "s")).astype("datetime64[us]").item()
        rows.append(
            (f"https://site{i % 37}.example.com/base/{i}", ts, twin, None, "en")
        )
    return rows


def corpus_to_spark(spark, corpus: Corpus):
    """Materialize as DataFrames with declared schemas."""
    from dedupe_archived_files_spark import schema as S

    pages = spark.createDataFrame(corpus.pages, schema=S.PAGES)
    labeled = spark.createDataFrame(corpus.labeled_pairs, schema=S.LABELED_PAIRS)
    expected = spark.createDataFrame(corpus.expected_clusters(), schema=S.CLUSTERS)
    return pages, labeled, expected
