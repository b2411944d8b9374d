"""Text-analysis operators for large-scale training-data pipelines:
language ID (stopword heuristic), quality scoring, token counting,
document fingerprinting.

All pure native column expressions (JVM-side, codegen'd) — at 100 TB
these run inside the parquet scan stage with zero shuffles; nothing
here touches Python at execution time. Generalizes the reference's
text-normalization needs (clean_customer_name, cartera.py:92-98) to
document corpora.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists (ASCII, regex-safe). Heuristic
#: language ID — the point is the operator shape, not linguistic
#: accuracy; swap lists for real deployments.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "los", "las", "y", "en", "que"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "une"],
}

#: Deterministic precedence for argmax ties.
LANG_ORDER = ["en", "es", "fr"]


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def whitespace_tokens(c: Column | str) -> Column:
    """Whitespace tokenization; empty/blank text → empty array."""
    col = F.trim(_c(c).cast("string"))
    return F.when(col == "", F.array().cast("array<string>")).otherwise(
        F.split(col, r"\s+")
    )


def token_count(c: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(whitespace_tokens(c))


#: BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation.
REGEX_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def regex_token_count(c: Column | str, pattern: str = REGEX_TOKEN_PATTERN) -> Column:
    """Token count under a BPE-style pre-tokenization regex."""
    return F.regexp_count(_c(c).cast("string"), F.lit(pattern))


def char_shingles(c: Column | str, k: int) -> Column:
    """All k-char shingles of a string (with multiplicity); length < k
    → empty array. Expression-level — no UDF, no explode."""
    col = _c(c).cast("string")
    return F.when(
        F.length(col) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(col) - (k - 1)),
            lambda i: F.substr(col, i, F.lit(k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_hash(s: Column) -> Column:
    """28-bit integer hash of a shingle via md5 hex prefix — identical
    in any engine with md5 + hex parsing (the cross-engine contract the
    DuckDB oracles rely on). 28 bits keeps (a*x+b) products inside
    int64 under ANSI."""
    return F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("long")


def stopword_count(c: Column | str, lang: str) -> Column:
    """Occurrences of the language's stopwords as whole words (on
    lowercased text)."""
    words = "|".join(STOPWORDS[lang])
    return F.regexp_count(F.lower(_c(c).cast("string")), F.lit(rf"\b({words})\b"))


def lang_id(c: Column | str) -> Column:
    """Heuristic language ID: argmax of stopword hit counts with
    deterministic precedence; no hits → 'unknown'."""
    scores = {lang: stopword_count(c, lang) for lang in LANG_ORDER}
    # built from lowest precedence up, so earlier langs win ties (each
    # lang requires score >= every later lang's score)
    expr = F.lit("unknown")
    for lang in reversed(LANG_ORDER):
        cond = scores[lang] > 0
        for other in LANG_ORDER[LANG_ORDER.index(lang) + 1:]:
            cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def quality_features(c: Column | str) -> dict[str, Column]:
    """Quality-scoring feature set: lengths, punctuation ratio,
    stopword ratio, and a combined [0,1] score. Arithmetic is written
    in a fixed operation order so any engine reproduces it bit-exactly.
    """
    col = _c(c).cast("string")
    n_chars = F.length(col).cast("double")
    n_tokens = token_count(col).cast("double")
    punct = F.regexp_count(col, F.lit(r"[^\w\s]")).cast("double")
    stop_en = stopword_count(col, "en").cast("double")
    safe_chars = F.greatest(n_chars, F.lit(1.0))
    safe_tokens = F.greatest(n_tokens, F.lit(1.0))
    punct_ratio = punct / safe_chars
    stopword_ratio = stop_en / safe_tokens
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * F.lit(0.3)
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0))) * F.lit(0.3)
        + F.least(stopword_ratio * F.lit(5.0), F.lit(1.0)) * F.lit(0.4)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stopword_ratio,
        "quality_score": score,
    }


def normalized_text(c: Column | str) -> Column:
    """Dedup normalization: lowercase, trim, collapse whitespace
    (punctuation kept — near-dup detection handles the rest)."""
    s = F.lower(F.trim(_c(c).cast("string")))
    return F.regexp_replace(s, r"\s+", " ")


def content_md5(c: Column | str) -> Column:
    """Exact-content fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(c))


def minhash64(c: Column | str, k: int = 5) -> Column:
    """Single-value document fingerprint: min shingle-hash over k-char
    shingles (a 1-permutation minhash / 'rolling-hash' fingerprint)."""
    return F.array_min(F.transform(char_shingles(normalized_text(c), k), shingle_hash))
