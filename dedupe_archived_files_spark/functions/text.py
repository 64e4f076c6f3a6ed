"""Deterministic HTML→text extraction + text-analysis functions.

The extraction contract is FROZEN (north rule: byte-identical extracted text
per url; reference analogue: the extractor's per-format generators,
core/extractor.py:89-184, whose output bytes the hashes are defined over):

    1. if ``text`` is non-null it is trusted as pre-extracted and returned as-is;
    2. else if ``html`` is non-null: decode UTF-8 strict, fall back Latin-1
       (total — Latin-1 accepts any byte string, so raw binary bodies like the
       all-256-byte-values fixture still resolve to deterministic text,
       mirroring the reference hashing raw bytes, tests/test_extensive.py:644-682);
       drop <script>/<style> blocks, strip tags, unescape entities, collapse
       whitespace runs to single spaces, strip ends;
    3. else null → the row is quarantined (reference: corrupt archives are
       excluded from results AND lineage, tests/test_scanner.py:198-212).

All functions are Arrow-batched pandas UDFs or pure Column expressions —
no per-row Python (input_hint requirement).
"""

from __future__ import annotations

import html as _htmllib
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)


def extract_text_py(html_bytes: bytes | None, text: str | None) -> str | None:
    """Single-value reference implementation of the frozen contract (used by
    oracle-style unit tests, pattern of reference tests/test_hasher.py:214-231)."""
    if text is not None:
        return text
    if html_bytes is None:
        return None
    try:
        s = html_bytes.decode("utf-8")
    except UnicodeDecodeError:
        s = html_bytes.decode("latin-1")
    s = _SCRIPT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _htmllib.unescape(s)
    s = _WS_RE.sub(" ", s).strip()
    return s


@F.pandas_udf(T.StringType())
def extract_text_udf(html_s: pd.Series, text_s: pd.Series) -> pd.Series:
    out = []
    for h, t in zip(html_s, text_s):
        out.append(extract_text_py(h, t))
    return pd.Series(out, dtype="object")


def extract_title_py(html_bytes: bytes | None) -> str | None:
    """Single-value title scrape (the Jaro-Winkler scoring channel's input;
    north rule: 'Jaro-Winkler on titles/urls'). None when no html / no title."""
    if html_bytes is None:
        return None
    try:
        s = html_bytes.decode("utf-8")
    except UnicodeDecodeError:
        s = html_bytes.decode("latin-1")
    m = _TITLE_RE.search(s)
    return _WS_RE.sub(" ", _htmllib.unescape(m.group(1))).strip() if m else None


@F.pandas_udf(T.StringType())
def extract_title_udf(html_s: pd.Series) -> pd.Series:
    """Title extraction (for Jaro-Winkler scoring channel)."""
    return pd.Series([extract_title_py(h) for h in html_s], dtype="object")


# ---------------------------------------------------------------------------
# Pure-Column text analysis (JVM-side, whole-stage-codegen'd)
# ---------------------------------------------------------------------------

def normalize_url(col: Column) -> Column:
    """Normalized-URL blocking key: lowercase, strip scheme / 'www.' / query /
    fragment / trailing slash. A cheap high-recall key for same-page re-crawls."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"^https?://", "")
    c = F.regexp_replace(c, r"^www\.", "")
    c = F.regexp_replace(c, r"[?#].*$", "")
    c = F.regexp_replace(c, r"/+$", "")
    return c


def tokens(col: Column) -> Column:
    """Whitespace tokens of lowercased text, empties removed."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != F.lit(""))


def word_shingles(tok_col: Column, k: int) -> Column:
    """k-token shingles as strings; docs shorter than k yield the whole doc as
    one shingle (so short pages still block)."""
    n = F.size(tok_col)
    joined = F.array_join(tok_col, " ")
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.array_join(F.slice(tok_col, i + 1, k), " "),
        ),
    ).otherwise(F.array(joined))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "des", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "de", "que"],
}


def lang_scores(tok_col: Column) -> dict[str, Column]:
    """Per-language marker-token hit counts (with multiplicity)."""
    return {
        lang: F.size(F.filter(tok_col, lambda t: t.isin(words)))
        for lang, words in STOPWORDS.items()
    }


def quality_features(text_col: Column) -> dict[str, Column]:
    """Cheap quality-scoring features for a training-data pipeline."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_char = F.length(text_col)
    n_alpha = F.length(F.regexp_replace(text_col, r"[^a-zA-Z]", ""))
    n_punct = F.length(F.regexp_replace(text_col, r"[^.,;:!?]", ""))
    return {
        "n_chars": n_char,
        "n_tokens": n_tok,
        "avg_token_len": F.when(n_tok > 0, (n_alpha.cast("double") / n_tok)).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(n_char > 0, (n_punct.cast("double") / n_char)).otherwise(F.lit(0.0)),
        "alpha_ratio": F.when(n_char > 0, (n_alpha.cast("double") / n_char)).otherwise(F.lit(0.0)),
    }
