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

from etl_rj_spark.functions.exprs import bind_once

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
    → empty array. Expression-level — no UDF, no explode. The input
    string is bound once (r16): callers pass derived text (normalize =
    lower+trim+regexp_replace), and an inlined ``substr(col, i, k)``
    lambda body would re-derive it once per shingle position."""
    col0 = _c(c).cast("string")

    def shingles(col: Column) -> Column:
        return F.when(
            F.length(col) >= k,
            F.transform(
                F.sequence(F.lit(1), F.length(col) - (k - 1)),
                lambda i: F.substr(col, i, F.lit(k)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return bind_once(col0, shingles)


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


def bigram_fluency_score(df, id_col: str, text_col: str):
    """Bigram conditional-LM scoring of each document against the
    corpus's OWN transition distribution — the next rung above
    ``unigram_rarity_score`` on the KenLM-perplexity-filter ladder:
    unigram rarity flags rare WORDS, the bigram conditional flags
    implausible TRANSITIONS (word-salad and boilerplate-stitched docs
    score low even when every individual token is common).

    House integer contract: the conditional is the scaled integer
    ``p_ppm(w2|w1) = (c(w1,w2)·10⁶) div c(w1·)`` with ``c(w1·)`` the
    prefix's total transition count (so Σ_w2 p = 10⁶ up to truncation)
    — bit-identical across engines where a float log-prob could drift
    an ulp; the monotone mapping preserves every ranking. Per doc:
    ``mean_cond_ppm`` (transition-frequency-weighted mean) and
    ``min_cond_ppm`` (the single most surprising transition — the
    sharpest screen). Docs with < 2 tokens have no transitions and
    drop from the output, same convention as the unigram score.

    Scale: bigrams are built SCAN-STAGE as an array transform (no
    self-join of positions); the stream reduces to (doc, w1, w2, tf)
    by one map-side-combinable aggregate before any join; corpus
    transition counts key on (w1, w2) and prefix totals on w1 (AQE
    splits head-word skew). int64-exact to ~10¹² corpus tokens.

    Returns (id, n_bigrams, mean_cond_ppm, min_cond_ppm).
    """
    # \s+ split (r9 review fix): a literal single-space split fused
    # tab/newline-separated words into one token, producing phantom
    # rare transitions that tanked min_cond_ppm for perfectly fluent
    # docs — the exact misclassification this filter exists to avoid
    toks0 = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")

    # token array bound once (r16): inlined, the split+filter re-ran
    # per bigram position inside the element_at lambda (guide §1.2)
    def bigram_arr(toks: Column) -> Column:
        bigrams = F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        )
        return F.when(F.size(toks) >= 2, bigrams).otherwise(
            F.array().cast("array<struct<w1:string,w2:string>>")
        )

    bg = (
        df.select(F.col(id_col), F.explode(bind_once(toks0, bigram_arr)).alias("b"))
        .select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    tf = bg.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    c2 = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    p = c2.join(c1, "w1").withColumn(
        "p_ppm", F.expr("(c2 * CAST(1000000 AS BIGINT)) div c1")
    ).select("w1", "w2", "p_ppm")
    return (
        tf.join(p, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.expr("sum(tf * p_ppm) div sum(tf)").alias("mean_cond_ppm"),
            F.min("p_ppm").alias("min_cond_ppm"),
        )
    )


def feature_hash_vectors(df, id_col: str, text_col: str, dim: int = 16):
    """Hashing-trick document feature vectors: ``dim``-length integer
    token-count vectors, bucket = md5-hash of the token mod ``dim`` —
    the dependency-free, vocabulary-free featurization that turns raw
    text into something the integer k-means / IVF / similarity stack
    can cluster (topic cells, near-topic routing) without training or
    shipping a vocabulary. md5 keeps the bucket assignment
    engine-portable (the module's cross-engine hash contract).

    Counts are emitted as ``array<double>`` so the vectors slot
    directly into the quantizing k-means ops (floor(c·2²⁰) rescales
    them exactly — counts are integers). Scan-stage only: the
    per-token bucket filter is O(dim·|tokens|) per doc, fine for the
    routing-sized dims this exists for (≤ 64); for wide feature spaces
    explode tokens and pivot through a (doc, bucket) aggregate
    instead. NULL text → NULL vector (filter before clustering).
    """
    toks0 = whitespace_tokens(normalized_text(text_col))

    def bucket(t: Column) -> Column:
        return F.conv(F.substring(F.md5(t), 1, 12), 16, 10).cast("long") % dim

    # token array bound once (r16): inlined, normalize+split re-ran per
    # bucket index — dim× per document (guide §1.2)
    feats = bind_once(
        toks0,
        lambda toks: F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: F.size(F.filter(toks, lambda t: bucket(t) == j)).cast("double"),
        ),
    )
    feats = F.when(F.col(text_col).isNull(), F.lit(None).cast("array<double>")).otherwise(feats)
    return df.select(F.col(id_col), feats.alias("features"))


def bpe_pair_counts(df, text_col: str, min_word_len: int = 2):
    """First-iteration BPE merge-candidate statistics: corpus-wide
    counts of adjacent character pairs inside alphabetic words (the
    pair a byte-pair-encoding trainer would merge first is the argmax).
    Tokenization is the lower+split-on-non-letters pre-tokenizer, so
    pairs never span word boundaries.

    Scale shape: the fan-out (one row per within-word pair) happens in
    the scan stage via transform-over-sequence — a single explode of a
    precomputed array, all expression-level. The aggregation key space
    is at most 26² pairs, so the groupBy is a map-side partial combine
    into a trivially small shuffle regardless of corpus size — the
    whole op is scan-bound, which is what a tokenizer-trainer pass over
    100 TB must be. Subsequent BPE iterations re-run with the learned
    merges applied (driver loop, one pass each) — the classic
    distributed trainer loop; this operator is its inner statistic.
    """
    words = df.select(
        F.explode(F.split(F.lower(F.col(text_col).cast("string")), "[^a-z]+")).alias(
            "word"
        )
    ).filter(F.length("word") >= int(min_word_len))
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair")
    )
    return pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n_pair"))


def js_divergence(
    left: DataFrame,
    right: DataFrame,
    term_col: str = "term",
    count_col: str = "n",
) -> DataFrame:
    """Jensen–Shannon divergence (bits, ppm) between two term-count
    distributions — the symmetric, bounded [0,1] corpus-drift metric
    (new source vs corpus, this week vs last week). Inputs are
    (term, count) tables; the full-outer term join handles
    side-exclusive vocabulary natively (the missing side contributes
    probability 0, exactly as JS defines — no smoothing needed, unlike
    KL).

    Determinism: each term's contribution
    ``½·(p·log2(2p/(p+q)) + q·log2(2q/(p+q)))`` is ONE double
    expression on exact integer counts, rounded to an int64 ppm BEFORE
    the cross-term sum — the same per-term-rounding trick as
    ``group_entropy_ppm``, making the reduction exact-integer and
    aggregation-order-proof. Output: one row
    (n_terms, n_left, n_right, js_ppm). Vocabulary-grain throughout.
    """
    l = left.select(F.col(term_col).alias("__t"), F.col(count_col).alias("__a"))
    r = right.select(F.col(term_col).alias("__t"), F.col(count_col).alias("__b"))
    merged = (
        l.join(r, "__t", "full_outer")
        .select(
            "__t",
            F.coalesce("__a", F.lit(0)).cast("long").alias("__a"),
            F.coalesce("__b", F.lit(0)).cast("long").alias("__b"),
        )
    )
    tot = merged.agg(
        F.sum("__a").alias("__ta"), F.sum("__b").alias("__tb")
    )
    # p = a/ta, q = b/tb; contribution in bits:
    #   0.5*(p*log2(2p/(p+q)) + q*log2(2q/(p+q)))
    # try_divide: one side EMPTY (its total 0) means that side is not
    # a distribution and JS is undefined — every term (and so js_ppm)
    # goes NULL, exactly as the SQL oracle's x/0 → NULL propagates
    # (r10 degenerate-input sweep fix; a bare `/` hard-errors under
    # ANSI)
    p = F.try_divide(F.col("__a"), F.col("__ta"))
    q = F.try_divide(F.col("__b"), F.col("__tb"))
    term = merged.join(F.broadcast(tot)).select(
        "__t", "__a", "__b", "__ta", "__tb",
        F.round(
            (
                F.when(
                    F.col("__a") > 0,
                    p * (F.lit(1) + F.log2(p) - F.log2(p + q)),
                ).otherwise(F.lit(0.0))
                + F.when(
                    F.col("__b") > 0,
                    q * (F.lit(1) + F.log2(q) - F.log2(p + q)),
                ).otherwise(F.lit(0.0))
            )
            * 500_000
        ).cast("long").alias("__j"),
    )
    return term.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.max("__ta").cast("bigint").alias("n_left"),
        F.max("__tb").cast("bigint").alias("n_right"),
        F.sum("__j").alias("js_ppm"),
    )
