"""Data-quality queries: quarantine-split accounting and TF-IDF
keyword extraction — the structured forms of the reference's console
diagnostics (SURVEY §5: non-numeric counts, unmapped-name lists) and
the text-analysis extension's scoring family.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_rj_spark.analytics.suite import REGISTRY, _q, _t
from etl_rj_spark.operators.validate import with_validation_reasons


@_q(
    "quarantine_reason_counts",
    """
    SELECT reasons, COUNT(*) AS n_rows
    FROM (
      SELECT concat_ws(',',
               CASE WHEN NOT coalesce(l_quantity <= 45, FALSE) THEN 'qty_gt_45' END,
               CASE WHEN NOT coalesce(l_discount <= 0.08, FALSE) THEN 'discount_gt_8pct' END,
               CASE WHEN NOT coalesce(l_tax < 0.08, FALSE) THEN 'tax_ge_8pct' END
             ) AS reasons
      FROM lineitem
    ) WHERE reasons <> ''
    GROUP BY reasons ORDER BY reasons
    """,
    tags=("validation", "quarantine", "F1-generalized"),
)
def quarantine_reason_counts(spark, sf_dir):
    """Dead-letter accounting: how many rows fail which rule
    combinations. One scan computes every rule; the reasons array keeps
    rule order, so the joined string is deterministic. (The rules here
    are demonstration thresholds over clean synthetic data — the
    operator is the contract, the thresholds are arbitrary.)"""
    li = _t(spark, sf_dir, "lineitem")
    rules = {
        "qty_gt_45": F.col("l_quantity") <= 45,
        "discount_gt_8pct": F.col("l_discount") <= 0.08,
        "tax_ge_8pct": F.col("l_tax") < 0.08,
    }
    flagged = with_validation_reasons(li, rules)
    return (
        flagged.filter(F.size("reasons") > 0)
        .select(F.array_join("reasons", ",").alias("reasons"))
        .groupBy("reasons")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("reasons")
    )


@_q(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, t.token FROM documents,
             UNNEST(string_split(text, ' ')) AS t(token)
      WHERE t.token <> ''
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM documents)
    SELECT doc_id, token, tf, df, score_ppm FROM (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             tf.tf * ((n.n * 1000000) // df.df) AS score_ppm,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf * ((n.n * 1000000) // df.df) DESC,
                                         tf.token) AS rn
      FROM tf JOIN df USING (token) CROSS JOIN n
    ) WHERE rn <= 3
    ORDER BY doc_id, score_ppm DESC, token
    """,
    tags=("text-analysis", "tfidf", "topk"),
)
def tfidf_top_terms(spark, sf_dir):
    """Top-3 characteristic terms per document by TF-IDF. The IDF is a
    scaled-integer inverse frequency ``(N*1e6) div df`` rather than the
    usual log-damped form: integer arithmetic is bit-identical across
    engines, where ``ln`` could differ in the last ulp and flip a
    ranking tie (both engines' orderings stay identical either way for
    a top-k CONTRACT — the log variant belongs in scoring pipelines,
    not cross-engine oracles). df is computed from the (doc, token)
    level — one shuffle on token over data already shrunk by the tf
    aggregation, never a second pass over the raw token stream."""
    docs = _t(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(df, "token")
        .join(F.broadcast(n))
        .withColumn("score_ppm", F.col("tf") * F.expr("(n * CAST(1000000 AS BIGINT)) div df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_ppm"), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "tf", "df", "score_ppm")
        .orderBy("doc_id", F.desc("score_ppm"), "token")
    )


@_q(
    "repetition_filter_docs",
    """
    WITH tf AS (
      SELECT doc_id, t.token, COUNT(*) AS tf
      FROM documents, UNNEST(string_split(text, ' ')) AS t(token)
      WHERE t.token <> '' GROUP BY 1, 2
    ),
    stats AS (
      -- CAST: DuckDB SUM(int) is HUGEINT → float64 in pandas; the
      -- driver hashes that differently from Spark's int64
      SELECT doc_id, MAX(tf) AS max_tf, CAST(SUM(tf) AS BIGINT) AS n_tokens,
             COUNT(*) AS n_distinct
      FROM tf GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_distinct,
           CAST(max_tf AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_frac,
           CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS distinct_frac,
           (CAST(max_tf AS DOUBLE) / CAST(n_tokens AS DOUBLE)) > 0.12 AS is_repetitive
    FROM stats ORDER BY doc_id
    """,
    tags=("text-analysis", "quality-filter", "gopher-rules"),
)
def repetition_filter_docs(spark, sf_dir):
    """Gopher-style repetition screen: a document dominated by one
    token (or with low distinct-token fraction) is boilerplate, not
    prose. Both fractions are ratios of exact counts (deterministic
    double division); the 0.12 threshold flags the repetitive tail of
    this corpus. One tokenize→tf pass feeds all stats."""
    docs = _t(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = tf.groupBy("doc_id").agg(
        F.max("tf").alias("max_tf"),
        F.sum("tf").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    top_frac = F.col("max_tf").cast("double") / F.col("n_tokens").cast("double")
    return stats.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        top_frac.alias("top_token_frac"),
        (F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double")).alias(
            "distinct_frac"
        ),
        (top_frac > 0.12).alias("is_repetitive"),
    ).orderBy("doc_id")


@_q(
    "pii_scrub_docs",
    """
    SELECT doc_id,
           regexp_replace(
             regexp_replace(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\+?[0-9][0-9 ()-]{7,}[0-9]', '<PHONE>', 'g') AS clean,
           LENGTH(dirty)
             - LENGTH(regexp_replace(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '', 'g'))
             AS email_chars_removed
    FROM (
      -- || not concat(): DuckDB's concat() coerces NULL args to ''
      -- (non-standard) while Spark's concat and SQL || propagate
      -- NULL — a NULL doc has nothing to scrub (r10 nullmix parity)
      SELECT doc_id,
             'contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1 (555) 010-'
               || CAST(1000 + doc_id % 9000 AS VARCHAR) || ' re: ' || substr(text, 1, 40) AS dirty
      FROM documents
    ) ORDER BY doc_id
    """,
    tags=("text-analysis", "pii", "curation"),
)
def pii_scrub_docs(spark, sf_dir):
    """PII scrubbing pass (emails, phone numbers → typed placeholders)
    — the redaction step of a training-data curation pipeline. The
    corpus is synthetic words, so the PII is injected deterministically
    from doc_id, then scrubbed; the chars-removed audit column is the
    quarantine-style accounting of what was redacted. Pure regexp_replace
    chains — JVM-side, codegen'd, no UDF."""
    docs = _t(spark, sf_dir, "documents")
    email_re = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    phone_re = "\\+?[0-9][0-9 ()-]{7,}[0-9]"
    dirty = F.concat(
        F.lit("contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 (555) 010-"),
        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        F.lit(" re: "),
        F.substring("text", 1, 40),
    )
    return (
        docs.select("doc_id", dirty.alias("dirty"))
        .select(
            "doc_id",
            F.regexp_replace(
                F.regexp_replace("dirty", email_re, "<EMAIL>"), phone_re, "<PHONE>"
            ).alias("clean"),
            (
                F.length("dirty")
                - F.length(F.regexp_replace("dirty", email_re, ""))
            ).alias("email_chars_removed"),
        )
        .orderBy("doc_id")
    )


@_q(
    "pack_sequences_budget",
    """
    WITH sized AS (
      SELECT doc_id, doc_id % 4 AS shard,
             len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, shard, n_tokens,
             CAST((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) - n_tokens) // 256
                  AS BIGINT) AS batch_id
      FROM sized
    )
    SELECT shard, batch_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens
    FROM packed GROUP BY shard, batch_id ORDER BY shard, batch_id
    """,
    tags=("curation", "sequence-packing", "llm-batch"),
)
def pack_sequences_budget(spark, sf_dir):
    """Sequence packing for training batches: contiguous greedy fill of
    a 256-token budget per shard (batch = token-offset div budget — a
    doc belongs to the batch its first token lands in). Sharding is the
    scale story: packing is an inherently sequential prefix-sum, so it
    runs per-shard (shards ≈ training data-parallel ranks), keeping
    every window partition bounded instead of one global ordering. All
    integers — deterministic at any partitioning."""
    docs = _t(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        (F.col("doc_id") % 4).alias("shard"),
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = sized.withColumn(
        "batch_id", F.expr("(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id "
                           "ROWS UNBOUNDED PRECEDING) - n_tokens) div 256")
    )
    return (
        packed.groupBy("shard", "batch_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("batch_tokens"))
        .orderBy("shard", "batch_id")
    )


@_q(
    "embedding_int8_quantized",
    """
    SELECT vec_id, maxabs,
           array_to_string(
             list_transform(emb_d, x -> CAST(ROUND(x * 127.0 / maxabs) AS INTEGER)),
             ',') AS qvec
    FROM (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb_d,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
      FROM embeddings
    ) ORDER BY vec_id
    """,
    tags=("similarity", "quantization", "llm-embeddings"),
)
def embedding_int8_quantized(spark, sf_dir):
    """Symmetric int8 quantization of the embedding column (per-vector
    absmax scale) — the storage/bandwidth step before ANN serving: 4×
    smaller vectors, int8 dot products. float32 → double is exact, the
    scale divide is one IEEE op, so qvec is engine-identical. Assumes
    no all-zero vectors (unit-norm corpus); serving-side dequantize is
    q * maxabs / 127. Pure array transforms — no UDF, no shuffle."""
    emb = _t(spark, sf_dir, "embeddings")
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    return (
        emb.select("vec_id", emb_d.alias("emb_d"), maxabs.alias("maxabs"))
        .select(
            "vec_id",
            "maxabs",
            F.array_join(
                F.transform(
                    "emb_d",
                    lambda x: F.round(x * 127.0 / F.col("maxabs")).cast("int").cast("string"),
                ),
                ",",
            ).alias("qvec"),
        )
        .orderBy("vec_id")
    )


_CHUNK_EDGE_ROWS = (
    "SELECT 1000001 AS doc_id, '' AS text "
    "UNION ALL SELECT 1000002, NULL "
    "UNION ALL SELECT 1000003, repeat('x', 64) "
    "UNION ALL SELECT 1000004, repeat('x', 65) "
    "UNION ALL SELECT 1000005, 'añé€中文-' || repeat('y', 60)"
)


@_q(
    "doc_chunk_windows",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 2000
      UNION ALL {_CHUNK_EDGE_ROWS}
    ),
    cnt AS (
      SELECT doc_id, text,
             CASE WHEN text IS NULL OR length(text) = 0 THEN 0
                  WHEN length(text) <= 64 THEN 1
                  ELSE (length(text) - 64 + 47) // 48 + 1 END AS nc
      FROM corpus
    )
    SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
           CAST(i * 48 AS BIGINT) AS chunk_start,
           substr(text, CAST(i * 48 + 1 AS INTEGER), 64) AS chunk_text
    FROM (SELECT doc_id, text, unnest(range(nc)) AS i FROM cnt)
    ORDER BY doc_id, chunk_idx
    """,
    tags=("curation", "chunking", "context-window"),
)
def doc_chunk_windows(spark, sf_dir):
    """Context-window chunking: every document split into 64-char
    windows with stride 48 (overlap 16) via ``chunk_windows`` — the
    pre-tokenization slicing step of a training pipeline. The corpus
    adds edge documents (empty, NULL, exactly-size, size+1, and
    multibyte text) so the oracle pins the boundary chunk count and
    character (not byte) offsets."""
    from etl_rj_spark.operators.curation import chunk_windows

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < 2000
    )
    edges = spark.createDataFrame(
        [
            (1000001, ""),
            (1000002, None),
            (1000003, "x" * 64),
            (1000004, "x" * 65),
            (1000005, "añé€中文-" + "y" * 60),
        ],
        "doc_id long, text string",
    )
    return chunk_windows(
        docs.unionByName(edges), "doc_id", "text", size=64, stride=48
    ).orderBy("doc_id", "chunk_idx")


@_q(
    "unigram_rarity_score",
    """
    WITH toks AS (
      SELECT doc_id, t.token FROM documents,
             UNNEST(string_split(text, ' ')) AS t(token)
      WHERE t.token <> ''
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    vocab AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vocab)
    SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           CAST(SUM(tf.tf * ((n.n * 1000000) // vocab.c)) // SUM(tf.tf) AS BIGINT)
             AS mean_rarity_ppm,
           CAST(MAX((n.n * 1000000) // vocab.c) AS BIGINT) AS max_rarity_ppm
    FROM tf JOIN vocab USING (token) CROSS JOIN n
    GROUP BY tf.doc_id ORDER BY tf.doc_id
    """,
    tags=("text-analysis", "lm-score", "quality-filter"),
)
def unigram_rarity_score(spark, sf_dir):
    """Unigram language-model scoring of each document against the
    corpus's own token distribution — the KenLM-perplexity-filter
    stand-in of a curation pipeline (docs whose tokens are globally
    rare score high → candidates for quality review). Rarity is the
    scaled-integer inverse frequency ``(N*1e6) div count`` rather than
    ``-ln(count/N)``: integer arithmetic is bit-identical across
    engines where ``ln`` could differ in the last ulp (same contract
    rationale as ``tfidf_top_terms``); the monotone mapping preserves
    every ranking a log-space filter would make.

    Scale: the token stream is reduced to (doc, token, tf) by one
    map-side-combinable aggregate before anything joins; the vocab
    join keys on token over that reduced stream (per-token row count
    bounded by doc frequency — AQE splits any residual head-word
    skew), and the corpus total broadcasts as one row. Worst-case
    products stay under int64 up to ~10^12 total tokens; past that,
    swap the ppm scale for ``total div c`` odds or DECIMAL(38,0) —
    noted here so the 100 TB reader doesn't have to rediscover it."""
    docs = _t(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.groupBy("token").agg(F.sum("tf").alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    rarity = (
        vocab.join(F.broadcast(total))
        .withColumn("rarity_ppm", F.expr("(n * CAST(1000000 AS BIGINT)) div c"))
        .select("token", "rarity_ppm")
    )
    return (
        tf.join(rarity, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.expr("sum(tf * rarity_ppm) div sum(tf)").alias("mean_rarity_ppm"),
            F.max("rarity_ppm").alias("max_rarity_ppm"),
        )
        .orderBy("doc_id")
    )


@_q(
    "bigram_fluency_score",
    r"""
    WITH toks AS (
      -- \s+ split mirrors the engine (r9): newline/tab-separated words
      -- must not fuse into phantom rare bigrams
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest([t[i] for i in range(1, len(t))]) AS w1,
             unnest([t[i + 1] for i in range(1, len(t))]) AS w2
      FROM toks WHERE len(t) >= 2
    ),
    tf AS (SELECT doc_id, w1, w2, COUNT(*) AS tf FROM bg GROUP BY 1, 2, 3),
    c2 AS (SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c2 FROM tf GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
    p AS (SELECT w1, w2, (c2 * 1000000) // c1 AS p_ppm FROM c2 JOIN c1 USING (w1))
    SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_bigrams,
           CAST(SUM(tf.tf * p.p_ppm) // SUM(tf.tf) AS BIGINT) AS mean_cond_ppm,
           CAST(MIN(p.p_ppm) AS BIGINT) AS min_cond_ppm
    FROM tf JOIN p USING (w1, w2)
    GROUP BY tf.doc_id
    """,
    tags=("text-analysis", "lm-score", "quality-filter"),
)
def bigram_fluency_score_q(spark, sf_dir):
    """Bigram conditional-LM fluency screen — the transition-level
    rung above unigram_rarity_score: word-salad docs score low even
    when every token is individually common. Exact scaled-integer
    conditionals, oracle replays the full count→conditional→aggregate
    chain."""
    from etl_rj_spark.operators.text_analysis import bigram_fluency_score

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bigram_fluency_score(docs, "doc_id", "text")


@_q(
    "equi_depth_price_bins",
    """
    -- complete-case: a NULL price has no bin and must not inflate the
    -- depth denominator (r10 nullmix parity)
    WITH v AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders WHERE o_totalprice IS NOT NULL),
    counts AS (SELECT cents, COUNT(*) AS c FROM v GROUP BY cents),
    cum AS (
      SELECT cents,
             SUM(c) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) - c AS before
      FROM counts
    ),
    tot AS (SELECT SUM(c) AS n FROM counts),
    bins AS (SELECT cents, CAST((before * 20) // n AS INTEGER) AS bin
             FROM cum CROSS JOIN tot)
    SELECT bin, COUNT(*) AS n_rows,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents
    FROM v JOIN bins USING (cents)
    GROUP BY bin
    """,
    tags=("stats-binning",),
)
def equi_depth_price_bins(spark, sf_dir):
    """Equi-depth discretization of order totals into 20 bins WITHOUT
    a global row sort: counts reduce per distinct cents value, the
    cumulative runs over the distinct-value table, and the bin map
    broadcast-joins back (ntile's single-partition window is the shape
    that dies first at scale). Exact integer assignment — the oracle
    replays the cumulative and the (before·k) div n rule."""
    from etl_rj_spark.operators.stats import equi_depth_bins

    # complete-case: a NULL price has no bin (see oracle, r10)
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice").isNotNull())
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    )
    return (
        equi_depth_bins(o, "cents", 20)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )


@_q(
    "mad_outlier_events",
    """
    WITH v AS (
      SELECT event_type, event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, event_id, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v
    ),
    med AS (SELECT event_type, cents AS median FROM ranked WHERE rn = (n + 1) // 2),
    dev AS (
      SELECT v.event_type, v.event_id, v.cents, m.median,
             ABS(v.cents - m.median) AS ad
      FROM v JOIN med m USING (event_type)
    ),
    devr AS (
      SELECT event_type, event_id, ad,
             row_number() OVER (PARTITION BY event_type ORDER BY ad, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM dev
    ),
    mad AS (SELECT event_type, ad AS mad FROM devr WHERE rn = (n + 1) // 2)
    SELECT d.event_type, d.event_id, d.cents, d.median, mad.mad
    FROM dev d JOIN mad USING (event_type)
    WHERE d.ad * 1000 > 5000 * mad.mad
    """,
    tags=("stats-robust",),
)
def mad_outlier_events(spark, sf_dir):
    """MAD-based robust outlier screen over event values (integer
    cents): lower-median and lower-MAD per event type, flag
    |x − med|·1000 > 5000·MAD — integer-exact end to end, immune to
    the aggregation-order drift AND the outlier-drag that break a
    mean/stddev z-score. The oracle replays both rank windows and the
    ppt comparison."""
    from etl_rj_spark.operators.stats import mad_outlier_screen

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "event_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    out = mad_outlier_screen(ev, "event_type", "cents", "event_id", k_ppt=5000)
    return out.filter("is_outlier").select(
        "event_type", "event_id", "cents", "median", "mad"
    )


@_q(
    "event_cooccurrence_lift",
    """
    WITH b AS (
      SELECT DISTINCT user_id AS bk, event_type AS it FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    ic AS (SELECT it, COUNT(*) AS c FROM b GROUP BY it),
    nb AS (SELECT COUNT(DISTINCT bk) AS n FROM b),
    sup AS (
      SELECT a.it AS item_a, c.it AS item_b, COUNT(*) AS support
      FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it
      GROUP BY 1, 2 HAVING COUNT(*) >= 5
    )
    SELECT item_a, item_b, support,
           CAST((support::HUGEINT * n * 1000000) // (ca.c::HUGEINT * cb.c)
                AS BIGINT) AS lift_ppm
    FROM sup
    JOIN ic ca ON ca.it = item_a
    JOIN ic cb ON cb.it = item_b
    CROSS JOIN nb
    """,
    tags=("stats-association",),
)
def event_cooccurrence_lift(spark, sf_dir):
    """Market-basket co-occurrence with integer-ppm lift: event-type
    pairs sharing a user, support ≥ 5, lift = support·n/(cₐ·c_b) in
    exact decimal arithmetic (> 10⁶ ⇒ the pair co-occurs beyond
    independence). Presence rows dedup map-side before the
    within-basket self-join; the oracle replays counts and lift."""
    from etl_rj_spark.operators.stats import cooccurrence_pairs

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type")
    return cooccurrence_pairs(ev, "user_id", "event_type", min_support=5)


@_q(
    "join_key_skew_audit",
    """
    WITH c AS (SELECT event_type, COUNT(*) AS n_rows FROM events GROUP BY event_type),
    t AS (SELECT COUNT(*) AS n FROM events)
    SELECT event_type, n_rows,
           CAST((n_rows * 1000000) // n AS BIGINT) AS share_ppm
    FROM c CROSS JOIN t
    WHERE (n_rows * 1000000) // n >= 100000
    """,
    tags=("stats-skew", "diagnostics"),
)
def join_key_skew_audit(spark, sf_dir):
    """Shuffle-key skew audit: keys whose row share exceeds 10% in
    exact integer ppm — the pre-flight check before a 100 TB join
    hangs one reducer (salt / AQE-split / broadcast decisions need
    this number). One map-side aggregate + broadcast total."""
    from etl_rj_spark.operators.skew import skew_audit

    ev = _t(spark, sf_dir, "events")
    return skew_audit(ev, "event_type", threshold_ppm=100_000)


@_q(
    "value_trend_slope",
    """
    WITH v AS (
      SELECT event_type, (CAST(ts AS DATE) - DATE '1970-01-01') AS x,
             CAST(ROUND(value * 100) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    m AS (
      SELECT event_type, COUNT(*)::HUGEINT AS n, SUM(x::HUGEINT) AS sx,
             SUM(y::HUGEINT) AS sy, SUM(x::HUGEINT * y) AS sxy,
             SUM(x::HUGEINT * x) AS sxx
      FROM v GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_points,
           CAST(ROUND((n * sxy - sx * sy)::DOUBLE
                      / (n * sxx - sx * sx)::DOUBLE * 1000000) AS BIGINT)
             AS slope_ppm,
           CAST(ROUND((sy::DOUBLE
                       - ((n * sxy - sx * sy)::DOUBLE
                          / (n * sxx - sx * sx)::DOUBLE) * sx::DOUBLE)
                      / n::DOUBLE * 1000000) AS BIGINT)
             AS intercept_ppm
    FROM m WHERE n * sxx - sx * sx <> 0
    """,
    tags=("stats-regression",),
)
def value_trend_slope(spark, sf_dir):
    """Per-event-type OLS trend of value-cents over epoch days, from
    exact decimal moment sums — order-independent where regr_slope's
    float reduction is not; one correctly-rounded division per
    coefficient, oracle replays the identical operation order."""
    from etl_rj_spark.operators.stats import ols_slope_by_group

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    return ols_slope_by_group(ev, "event_type", "x", "y")


@_q(
    "exact_auc_purchase_value",
    """
    WITH v AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    per AS (SELECT s, COUNT(*) AS c, SUM(y) AS p FROM v GROUP BY s),
    cum AS (
      SELECT s, c, p,
             SUM(c) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) - c AS before
      FROM per
    )
    SELECT CAST(CASE WHEN SUM(p::HUGEINT) * SUM((c - p)::HUGEINT) = 0 THEN NULL
                ELSE ((SUM(p::HUGEINT * (2 * before + c + 1))
                       - SUM(p::HUGEINT) * (SUM(p::HUGEINT) + 1)) * 1000000)
                     // (2 * SUM(p::HUGEINT) * SUM((c - p)::HUGEINT))
                END AS BIGINT)
             AS auc_ppm,
           CAST(SUM(p) AS BIGINT) AS n_pos,
           CAST(SUM(c - p) AS BIGINT) AS n_neg
    FROM cum
    """,
    tags=("stats-auc", "evaluation"),
)
def exact_auc_purchase_value(spark, sf_dir):
    """EXACT distributed ROC-AUC (does event value predict purchase?)
    via the Mann–Whitney rank-sum with integer midranks — per-score
    counts reduce map-side and the only ordered pass runs over the
    score vocabulary, never a global row sort. decimal-exact to the
    final ppm division; oracle replays ranks, tie handling, and the
    rank-sum identity."""
    from etl_rj_spark.operators.stats import exact_auc

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select(
            F.round(F.col("value") * 100).cast("long").alias("s"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        )
    )
    return exact_auc(ev, "s", "y")


@_q(
    "retention_labels_events",
    """
    WITH w AS (
      SELECT user_id, event_id, ts,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events
    )
    SELECT user_id, event_id,
           CASE WHEN nxt IS NOT NULL AND nxt <= ts + INTERVAL 7 DAY
                THEN 1 ELSE 0 END AS retained,
           (epoch_us(nxt) - epoch_us(ts)) // 1000000 AS gap_seconds
    FROM w
    """,
    tags=("feature-labels", "windows"),
)
def retention_labels_events(spark, sf_dir):
    """Retention labels: 1 iff the user has another event within 7
    days — one lead over the (user, ts, id) window (sorted events make
    next-within-horizon ⟺ any-within-horizon), no future self-join.
    gap_seconds in exact integer micros→seconds; last events are
    right-censored to 0."""
    from etl_rj_spark.operators.windows import future_window_label

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return future_window_label(ev, "user_id", "ts", "event_id", horizon_days=7).drop(
        "ts"
    )


@_q(
    "calibration_bins_events",
    """
    WITH v AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    rng AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM v),
    b AS (
      SELECT CAST(((s - lo) * 10) // (hi - lo + 1) AS INTEGER) AS bin, s, y
      FROM v CROSS JOIN rng
    )
    SELECT bin, COUNT(*) AS n,
           CAST(ROUND(SUM(y::HUGEINT)::DOUBLE / COUNT(*) * 1000000) AS BIGINT)
             AS pos_rate_ppm,
           CAST(ROUND(SUM(s::HUGEINT)::DOUBLE / COUNT(*) * 1000000) AS BIGINT)
             AS mean_score_ppm
    FROM b GROUP BY bin
    """,
    tags=("stats-calibration", "evaluation"),
)
def calibration_bins_events(spark, sf_dir):
    """Reliability bins (calibration companion to the exact AUC): 10
    equi-width score bins with exact-integer assignment and
    correctly-rounded per-bin positive rates — AUC ranks, calibration
    asks whether the score's value means what it claims."""
    from etl_rj_spark.operators.stats import calibration_bins

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select(
            F.round(F.col("value") * 100).cast("long").alias("s"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        )
    )
    return calibration_bins(ev, "s", "y", k=10)


@_q(
    "user_feature_snapshot",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT))::DOUBLE
                      / COUNT(value) * 1000000) AS BIGINT) AS mean_cents_ppm,
           MAX(ts) AS last_ts,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS days_active
    FROM events GROUP BY user_id
    """,
    tags=("feature-store", "A3-generalized"),
)
def user_feature_snapshot(spark, sf_dir):
    """Feature-store materialization: one wide row per user — event
    counts overall and per type (conditional sums, never a
    nondeterministic pivot column order), exact-integer mean value,
    last-seen timestamp, distinct active days. ONE map-side-combinable
    aggregate over the user key; at 100 TB this is the canonical
    nightly feature snapshot written partitioned by run date."""
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")

    def n_type(t):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast("bigint")

    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        n_type("click").alias("n_click"),
        n_type("purchase").alias("n_purchase"),
        n_type("view").alias("n_view"),
        F.round(
            F.sum(cents).cast("double") / F.count("value") * 1e6
        ).cast("long").alias("mean_cents_ppm"),
        F.max("ts").alias("last_ts"),
        F.countDistinct(F.to_date("ts")).alias("days_active"),
    )


@_q(
    "pareto_revenue_report",
    """
    WITH rev AS (
      SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT SUM(cents::HUGEINT) AS t FROM rev),
    ranked AS (
      SELECT o_custkey, cents,
             row_number() OVER (ORDER BY cents DESC, o_custkey) AS rnk,
             SUM(cents::HUGEINT) OVER (ORDER BY cents DESC, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM rev
    )
    SELECT o_custkey, cents, CAST(rnk AS BIGINT) AS rnk,
           CAST((cents::HUGEINT * 1000000) // t AS BIGINT) AS share_ppm,
           CAST((cum * 1000000) // t AS BIGINT) AS cum_share_ppm
    FROM ranked CROSS JOIN tot
    WHERE ((cum - cents) * 1000000) // t < 800000
    """,
    tags=("stats-pareto", "A3-generalized"),
)
def pareto_revenue_report(spark, sf_dir):
    """Pareto (80/20) concentration report: customers ranked by exact
    integer revenue cents with ppm shares and cumulative shares; keeps
    the 'vital few' — every customer whose cumulative share BEFORE
    them is under 80% (so the customer crossing the line is included).

    Scale (VERDICT r7 #3): per-customer revenue at 100 TB is ~10⁹ rows
    — far too big for a global row_number/running-sum window. The rank
    and cumulative sum come from ``global_rank_cumsum``: range-bucket
    by (cents DESC, custkey), rank + cumsum per bucket under a
    PARTITIONED window, then shift each bucket by the exact
    count/total of the buckets above it (a triangular join over the
    KB-sized per-bucket stats) — identical values, no task ever sorts
    more than its bucket. All divisions are positive integer div."""
    from etl_rj_spark.operators.windows import global_rank_cumsum

    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    tot = rev.agg(F.sum(F.col("cents").cast("decimal(38,0)")).alias("__t"))
    ranked = global_rank_cumsum(
        rev, "cents", ["o_custkey"], rank_col="rnk", cum_col="__cum"
    )
    return (
        ranked.join(F.broadcast(tot))
        .filter(F.expr("((__cum - cents) * 1000000) div __t < 800000"))
        .select(
            "o_custkey", "cents", F.col("rnk").cast("bigint").alias("rnk"),
            F.expr("cast((cast(cents as decimal(38,0)) * 1000000) div __t as bigint)")
            .alias("share_ppm"),
            F.expr("cast((__cum * 1000000) div __t as bigint)").alias("cum_share_ppm"),
        )
    )


_UP_WEIGHTS = {"src0": 2.3, "src1": 0.4, "src2": 3.0, "src3": 0.0}
_UP_DEFAULT = 1.0
_UP_HMAX = 16 ** 13


def _upsample_oracle() -> str:
    """CASE arms share the operator's exact Python threshold ints."""
    n_arms, t_arms = [], []
    for g, w in _UP_WEIGHTS.items():
        n_arms.append(f"WHEN source = '{g}' THEN {int(w)}")
        t_arms.append(f"WHEN source = '{g}' THEN {int((w - int(w)) * _UP_HMAX)}")
    n_case = "CASE " + " ".join(n_arms) + f" ELSE {int(_UP_DEFAULT)} END"
    t_case = (
        "CASE " + " ".join(t_arms)
        + f" ELSE {int((_UP_DEFAULT - int(_UP_DEFAULT)) * _UP_HMAX)} END"
    )
    return f"""
    WITH sized AS (
      SELECT doc_id, source,
             ({n_case})
             + CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':up'), 1, 13))::BIGINT
                         < ({t_case}) THEN 1 ELSE 0 END AS n
      FROM documents
    )
    SELECT doc_id, source, CAST(unnest(range(n)) AS INTEGER) AS epoch
    FROM sized ORDER BY doc_id, epoch
    """


@_q(
    "resample_epoch_upsample",
    _upsample_oracle(),
    tags=("curation", "data-mixture", "upsample"),
)
def resample_epoch_upsample(spark, sf_dir):
    """Fractional epoch re-weighting of the source mix (src0×2.3,
    src1×0.4, src2×3, src3 dropped, rest ×1) via ``epoch_upsample`` —
    the upsampling half of data-mixture construction the cap-based
    resamplers can't express. The oracle replays the identical integer
    copy-count rule, so membership AND copy counts are exact."""
    from etl_rj_spark.operators.curation import epoch_upsample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return epoch_upsample(
        docs, "source", "doc_id", _UP_WEIGHTS, default_weight=_UP_DEFAULT
    ).orderBy("doc_id", "epoch")


def _shard_pipeline_oracle() -> str:
    """Full-composition replay: upsample rule → chunk rule → token
    counts → per-shard prefix-sum packing, all exact integers."""
    t_half = int(0.5 * 16 ** 13)
    return rf"""
    WITH up AS (
      SELECT doc_id, text,
             (CASE WHEN source = 'src0' THEN 2
                   WHEN source = 'src1' THEN 0 ELSE 1 END)
             + CASE WHEN source = 'src1'
                     AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':up'), 1, 13))::BIGINT
                         < {t_half} THEN 1 ELSE 0 END AS n_copies
      FROM documents
    ),
    epochs AS (
      SELECT doc_id * 10 + unnest(range(n_copies)) AS uid, text FROM up
    ),
    cnt AS (
      SELECT uid, text,
             CASE WHEN text IS NULL OR length(text) = 0 THEN 0
                  WHEN length(text) <= 128 THEN 1
                  ELSE (length(text) - 128 + 127) // 128 + 1 END AS nc
      FROM epochs
    ),
    chunks AS (
      SELECT uid, CAST(i AS INTEGER) AS chunk_idx,
             substr(text, CAST(i * 128 + 1 AS INTEGER), 128) AS chunk
      FROM (SELECT uid, text, unnest(range(nc)) AS i FROM cnt)
    ),
    sized AS (
      SELECT uid, chunk_idx, uid % 4 AS shard,
             CASE WHEN trim(chunk) = '' THEN 0
                  ELSE len(string_split_regex(trim(chunk), '\s+')) END AS n_tokens
      FROM chunks
    ),
    packed AS (
      SELECT shard, n_tokens,
             CAST((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY uid, chunk_idx
                                       ROWS UNBOUNDED PRECEDING) - n_tokens) // 256
                  AS BIGINT) AS batch_id
      FROM sized
    )
    SELECT shard, batch_id, COUNT(*) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens
    FROM packed GROUP BY shard, batch_id ORDER BY shard, batch_id
    """


@_q(
    "training_shard_pipeline",
    _shard_pipeline_oracle(),
    tags=("curation", "composition", "upsample", "chunking", "sequence-packing"),
)
def training_shard_pipeline(spark, sf_dir):
    """The training-shard construction chain as ONE lazy plan:
    ``epoch_upsample`` (src0×2, src1×0.5, rest ×1) →
    ``chunk_windows`` (128-char, non-overlapping) → whitespace token
    counts → 256-token greedy packing per hash shard. Pins that the
    three curation operators compose — column flow, copy identity
    (uid = doc_id·10 + epoch), and the packing prefix-sum — under a
    single DuckDB replay of the whole composition.

    Scale: upsample + chunking are zero-shuffle scan-stage fan-out;
    the only shuffle before the final rollup is the per-shard packing
    window, bounded by shard count exactly like
    ``pack_sequences_budget``."""
    from etl_rj_spark.operators.curation import chunk_windows, epoch_upsample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    up = epoch_upsample(docs, "source", "doc_id", {"src0": 2.0, "src1": 0.5})
    up = up.select(
        (F.col("doc_id") * 10 + F.col("epoch")).alias("uid"), "text"
    )
    chunks = chunk_windows(up, "uid", "text", size=128, stride=128)
    from etl_rj_spark.operators.text_analysis import token_count

    sized = chunks.select(
        "uid", "chunk_idx", (F.col("uid") % 4).alias("shard"),
        token_count("chunk_text").alias("n_tokens"),
    )
    packed = sized.withColumn(
        "batch_id",
        F.expr(
            "(sum(n_tokens) OVER (PARTITION BY shard ORDER BY uid, chunk_idx "
            "ROWS UNBOUNDED PRECEDING) - n_tokens) div 256"
        ),
    )
    return (
        packed.groupBy("shard", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("batch_tokens"),
        )
        .orderBy("shard", "batch_id")
    )


@_q(
    "target_encoding_loo",
    """
    WITH g AS (
      SELECT c_mktsegment, COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS cents
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c_custkey, c.c_mktsegment,
           CASE WHEN n > 1
                THEN CAST(cents - CAST(ROUND(c_acctbal*100) AS BIGINT) AS DOUBLE)
                     / CAST((n - 1) * 100 AS DOUBLE)
           END AS segment_acctbal_loo
    FROM customer c JOIN g USING (c_mktsegment)
    ORDER BY c_custkey
    """,
    tags=("feature-engineering", "target-encoding"),
)
def target_encoding_loo(spark, sf_dir):
    """Leave-one-out target encoding — the standard ML categorical
    feature that must EXCLUDE each row's own target to avoid leakage:
    per-segment mean account balance computed as (Σcents − own) /
    (n−1). One map-side-combinable aggregate + a broadcast join back;
    the numerator is exact integer cents, the single final division is
    identical IEEE on both engines. Singleton groups encode NULL
    (nothing to average without leaking)."""
    c = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    g = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("__n"), F.sum(cents).alias("__cents")
    )
    return (
        c.join(F.broadcast(g), "c_mktsegment")
        .select(
            "c_custkey", "c_mktsegment",
            F.when(
                F.col("__n") > 1,
                (F.col("__cents") - cents).cast("double")
                / ((F.col("__n") - 1) * 100).cast("double"),
            ).alias("segment_acctbal_loo"),
        )
        .orderBy("c_custkey")
    )


@_q(
    "token_dist_chi2_drift",
    r"""
    WITH toks AS (
      SELECT source, t.token FROM documents,
             UNNEST(string_split(text, ' ')) AS t(token)
      WHERE source IN ('src0', 'src1') AND t.token <> ''
    ),
    cells AS (SELECT source, token, COUNT(*) AS o FROM toks GROUP BY 1, 2),
    -- complete the grid: a token absent from one source is a 0 cell
    grid AS (
      SELECT s.source, tk.token, COALESCE(c.o, 0) AS o
      FROM (SELECT DISTINCT source FROM cells) s
      CROSS JOIN (SELECT DISTINCT token FROM cells) tk
      LEFT JOIN cells c USING (source, token)
    ),
    tot AS (
      SELECT g.*, CAST(SUM(o) OVER (PARTITION BY source) AS BIGINT) AS row_n,
             CAST(SUM(o) OVER (PARTITION BY token) AS BIGINT) AS col_n,
             CAST(SUM(o) OVER () AS BIGINT) AS n
      FROM grid g
    ),
    terms AS (
      SELECT CAST(ROUND(
               ((CAST(o AS DOUBLE) - (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)) / CAST(n AS DOUBLE))
                * (CAST(o AS DOUBLE) - (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)) / CAST(n AS DOUBLE)))
               / ((CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)) / CAST(n AS DOUBLE)) * 1000000
             ) AS BIGINT) AS t_micro,
             token
      FROM tot
    )
    SELECT CAST(SUM(t_micro) AS BIGINT) AS chi2_micro,
           CAST(COUNT(DISTINCT token) - 1 AS BIGINT) AS dof
    FROM terms
    """,
    tags=("data-quality", "drift", "chi-squared"),
)
def token_dist_chi2_drift(spark, sf_dir):
    """Distribution-drift test: Pearson χ² between two sources' token
    distributions (2×|vocab| contingency grid, zero cells completed).
    Each cell's (o−e)²/e is one fixed-order double expression — bit-
    identical cross-engine — rounded to integer micro-units BEFORE the
    sum, so the reduction is exact int64 and immune to summation
    order (the determinism rule every float aggregate here follows).

    Scale: one tf reduce, the grid is |sources|×|vocab| — and the
    TOKEN vocabulary is explicitly NOT a bounded grain (SCALE.md §3,
    rule sharpened r9), so NO window may walk it. Rewritten r12 (the
    window audit's one engine finding): the three former windows are
    now aggregates — ``col_n`` per token rides the sources×col_tot
    cross join that completes the zero cells (one token-grain shuffle,
    no second pass), ``row_n`` (|sources| rows) and the scalar ``n``
    broadcast back. Zero WindowExec at any vocabulary size; values
    bit-identical (same sums, same fixed-order double expression)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("source").isin("src0", "src1"))
    toks = (
        docs.select("source", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    cells = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("o"))
    col_tot = cells.groupBy("token").agg(F.sum("o").alias("col_n"))
    row_tot = cells.groupBy("source").agg(F.sum("o").alias("row_n"))
    n_tot = cells.agg(F.sum("o").alias("n"))
    tot = (
        cells.select("source").distinct()
        .crossJoin(col_tot)
        .join(cells, ["source", "token"], "left")
        .select(
            "source", "token", "col_n",
            F.coalesce("o", F.lit(0)).alias("o"),
        )
        .join(F.broadcast(row_tot), "source")
        .join(F.broadcast(n_tot))
    )
    e = (F.col("row_n").cast("double") * F.col("col_n").cast("double")) / F.col("n").cast("double")
    term = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    terms = tot.select(
        F.round(term * 1000000).cast("long").alias("t_micro"), "token"
    )
    return terms.agg(
        F.sum("t_micro").alias("chi2_micro"),
        (F.countDistinct("token") - 1).alias("dof"),
    )


@_q(
    "benford_first_digit",
    """
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice*100) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS d
      FROM orders WHERE o_totalprice > 0
    ),
    obs AS (SELECT d, COUNT(*) AS n FROM digits GROUP BY d),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM obs)
    SELECT d, n,
           CAST((n * 1000000) // tot.total AS BIGINT) AS observed_ppm,
           CAST(FLOOR(LOG10(1.0 + 1.0 / d) * 1000000) AS BIGINT) AS benford_ppm
    FROM obs CROSS JOIN tot ORDER BY d
    """,
    tags=("data-quality", "benford", "fraud-screen"),
)
def benford_first_digit(spark, sf_dir):
    """Benford first-digit screen — the classic bulk-data fraud /
    fabrication check: observed leading-digit shares (exact integer
    ppm) beside Benford's law expectation log10(1+1/d). The expected
    column is a single fixed-order double expression on small integer
    ratios, floored to ppm — identical IEEE on both engines; observed
    shares are pure integer division. Consumers flag columns whose
    observed distribution diverges (the χ² machinery from
    token_dist_chi2_drift applies directly).

    Scale: one map-side-combinable 9-row aggregate over the scan."""
    ord_ = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
    ).cast("long")
    obs = ord_.select(d.alias("d")).groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    return (
        obs.join(F.broadcast(tot))
        .select(
            "d", "n",
            F.expr("(n * CAST(1000000 AS BIGINT)) div total").alias("observed_ppm"),
            F.floor(F.log10(1.0 + 1.0 / F.col("d")) * 1000000)
            .cast("long").alias("benford_ppm"),
        )
        .orderBy("d")
    )


@_q(
    "trimmed_mean_price_brand",
    """
    WITH c AS (
      -- complete-case (r12, the r10 stats convention): a NULL price
      -- has no rank position and must not occupy a kept-band slot —
      -- engines disagree on NULL sort order, so it is dropped on
      -- BOTH sides (a group whose every value is NULL disappears)
      SELECT p_brand, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents
      FROM part WHERE p_retailprice IS NOT NULL
    ), r AS (
      SELECT p_brand, cents,
             row_number() OVER (PARTITION BY p_brand ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY p_brand) AS n
      FROM c
    )
    SELECT p_brand, CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(cents::HUGEINT) // COUNT(*) AS BIGINT) AS trimmed_mean,
           MIN(cents) AS min_kept, MAX(cents) AS max_kept
    FROM r WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY p_brand ORDER BY p_brand
    """,
    tags=("stats-robust", "A3-generalized"),
)
def trimmed_mean_price_brand(spark, sf_dir):
    """10% two-sided trimmed mean of part retail price per brand, in
    exact integer cents — the robust location estimate beside the MAD
    screen's robust spread. Rank cut ties among equal cents are
    value-identical, so the kept SUM/COUNT/MIN/MAX are deterministic."""
    from etl_rj_spark.operators.stats import trimmed_mean_by_group

    p = _t(spark, sf_dir, "part").select(
        "p_brand", F.round(F.col("p_retailprice") * 100).cast("long").alias("cents")
    )
    return trimmed_mean_by_group(p, "p_brand", "cents", trim_denom=10).orderBy("p_brand")


_RI_RELATIONS = [
    ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation.n_regionkey->region.r_regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier.s_nationkey->nation.n_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
]

_RI_BLOCK = """
    SELECT '{label}' AS relation,
           CAST(COUNT(*) AS BIGINT) AS child_rows,
           CAST(SUM(CASE WHEN c.{ck} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_keys,
           CAST(COUNT(DISTINCT c.{ck}) AS BIGINT) AS distinct_keys,
           CAST(SUM(CASE WHEN c.{ck} IS NOT NULL AND p.__pk IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS orphan_rows
    FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} AS __pk FROM {parent}) p
      ON c.{ck} = p.__pk
"""


@_q(
    "referential_integrity_audit",
    " UNION ALL ".join(
        _RI_BLOCK.format(label=label, child=child, ck=ck, parent=parent, pk=pk)
        for label, child, ck, parent, pk in _RI_RELATIONS
    )
    + " ORDER BY relation",
    tags=("validation", "referential-integrity", "J4-generalized"),
)
def referential_integrity_audit(spark, sf_dir):
    """Warehouse-wide FK integrity report: every declared relation's
    child-row / null-key / distinct-key / orphan counts in one frame —
    the load-time invariant check the reference performs implicitly by
    trusting its dim lookups (unmapped-name reports, SURVEY §5) made an
    explicit queryable contract. All-zero orphan columns over the clean
    synthetic warehouse ARE the assertion; the operator exists for
    corpora where they are not."""
    from etl_rj_spark.operators.validate import referential_orphan_audit

    rels = [
        (label, _t(spark, sf_dir, child), ck, pk, _t(spark, sf_dir, parent), "")
        for label, child, ck, parent, pk in _RI_RELATIONS
    ]
    return referential_orphan_audit(rels).orderBy("relation")


_POIS_SQL_W = """CASE
      WHEN h < 1656781714176974 THEN 0
      WHEN h < 3313563428353948 THEN 1
      WHEN h < 4141954285442435 THEN 2
      WHEN h < 4418084571138597 THEN 3
      WHEN h < 4487117142562638 THEN 4
      ELSE 5 END"""


@_q(
    "poisson_bootstrap_revenue",
    f"""
    WITH fan AS (
      SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(r.r AS INTEGER) AS replicate
      FROM orders, (SELECT UNNEST(range(0, 32)) AS r) r
      -- the bootstrap resamples OBSERVED values only — mirrors the
      -- engine fold's isNotNull drop (r10 nullmix parity)
      WHERE o_totalprice IS NOT NULL
    ), h AS (
      SELECT replicate, cents,
             ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':' ||
                                 CAST(replicate AS VARCHAR)), 1, 13))::BIGINT AS h
      FROM fan
    ), w AS (
      SELECT replicate, cents, {_POIS_SQL_W} AS w FROM h
    )
    SELECT replicate, CAST(SUM(w) AS BIGINT) AS n_eff,
           CAST(SUM(w::HUGEINT * cents) // SUM(w) AS BIGINT) AS mean_value
    FROM w GROUP BY replicate ORDER BY replicate
    """,
    tags=("stats-bootstrap", "A3-generalized"),
)
def poisson_bootstrap_revenue(spark, sf_dir):
    """32 bootstrap replicate means of order value (exact integer
    cents) via deterministic Poisson(1) multiplicities — the spread
    across replicates is the standard error of mean revenue WITHOUT
    materializing a single resampled copy: every order draws its own
    per-replicate weight map-side from md5(key:replicate) against
    precomputed 52-bit integer CDF thresholds (no float anywhere), and
    one partial-aggregating shuffle with 32 output groups yields all
    replicates in a single pass. The scan reads 2 columns; the fan-out
    is 32× rows but 0× extra I/O.

    DE-BENCHED r12 (VERDICT r11 #3): this md5 row stays the
    cross-engine ORACLE twin — DuckDB replays every weight draw
    bit-for-bit — but the TIMED Poisson row is now
    ``poisson_bootstrap_revenue_xxh`` (the xxhash64 production fast
    path, identical plan, ~3.4× faster). Benching the md5 kernel every
    round paid an 8–10 s md5 tax that dominated suite variance while
    measuring the hash, not the engine; the draw kernel's correctness
    is still driver-checked here every rotation, just untimed."""
    from etl_rj_spark.operators.stats import poisson_bootstrap_means

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    return poisson_bootstrap_means(o, "o_orderkey", "cents", replicates=32).orderBy(
        "replicate"
    )


def _poisson_xxh_orders(spark, sf_dir):
    from etl_rj_spark.operators.stats import poisson_bootstrap_means

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    return o, poisson_bootstrap_means(
        o, "o_orderkey", "cents", replicates=32, hash="xxhash64"
    )


@_q(
    "poisson_bootstrap_revenue_xxh",
    """
    SELECT CAST(32 AS INTEGER) AS n_replicates,
           CAST(32 AS INTEGER) AS n_eff_within,
           CAST(32 AS INTEGER) AS mean_within
    -- existence guard: on an EMPTY orders table there are no
    -- replicates and no contract to check — 0 rows both engines
    -- (r10 degenerate-input sweep fix)
    WHERE EXISTS (SELECT 1 FROM orders)
    """,
    # the benched Poisson DEFAULT since r12 (VERDICT r11 #3): the md5
    # twin above keeps the cross-engine draw-replay oracle but is no
    # longer timed
    bench=True,
    tags=("stats-bootstrap", "production-fast-path", "contract-flag"),
)
def poisson_bootstrap_revenue_xxh(spark, sf_dir):
    """The xxhash64 PRODUCTION fast path of the Poisson bootstrap
    (VERDICT r7 #6 / r8 #7): identical plan to
    ``poisson_bootstrap_revenue`` with the md5→hex→conv draw replaced
    by the JVM-native xxhash64 low-52-bits (measured 3.2× on the 32×
    fan-out). xxhash64 is JVM-only, so DuckDB cannot replay the draws
    — instead the query emits a DETERMINISTIC contract flag (the
    LSH-scaled pattern): all 32 replicates must exist and sit within
    ±8σ of their analytic expectations. The weight draw caps at 5
    (P(X>5) < 6·10⁻⁴), so E[min(Pois(1),5)] = 1 − 6.883·10⁻⁴ — the
    n_eff band centers on the CAPPED expectation ``n − (n·688) div
    10⁶`` (an uncentered n ± 8√n band would flip red from the
    systematic cap deficit alone once n > ~1.3·10⁸ rows — review fix
    r9); the capped variance is < 1/row, so ±8√n still over-covers.
    The replicate mean is a ratio of two equally-scaled expectations,
    so the cap bias cancels and μ ± 8·√(Σx²)/n stands. An 8σ miss has
    probability ~1e-15: a broken weight draw, threshold table, or
    hash-signature change flips the flag while legitimate runs never
    do. The timed bench path (`bench_build`) is the production
    operator alone; the md5 row stays the timed oracle contract and
    the frozen basis is untouched."""
    o, reps = _poisson_xxh_orders(spark, sf_dir)
    base = o.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("cents").alias("__t"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("__ss"),
    )
    j = reps.join(F.broadcast(base))
    mu = (F.col("__t").cast("decimal(38,0)") / F.col("__n")).cast("long")
    # literal-grouped so an EMPTY orders table yields an EMPTY flag
    # report instead of one (NULL, NULL, 0) row (r10 sweep fix,
    # mirrored by the oracle's existence guard)
    return j.groupBy(F.lit(1).alias("__g")).agg(
        F.count(F.lit(1)).cast("int").alias("n_replicates"),
        F.sum(
            F.when(
                F.abs(
                    F.col("n_eff")
                    - (F.col("__n") - F.expr("(__n * 688) div 1000000"))
                ).cast("double")
                <= 8.0 * F.sqrt(F.col("__n").cast("double")) + 1.0,
                1,
            ).otherwise(0)
        ).cast("int").alias("n_eff_within"),
        F.sum(
            F.when(
                # a zero-weight replicate (empty resample, P = e^(-n),
                # so tiny-n only) has no mean — the mean contract is
                # VACUOUS for it, not violated (r10 sweep fix)
                F.col("mean_value").isNull()
                | (
                    F.abs(F.col("mean_value") - mu).cast("double")
                    <= 8.0 * F.sqrt(F.col("__ss").cast("double")) / F.col("__n") + 2.0
                ),
                1,
            ).otherwise(0)
        ).cast("int").alias("mean_within"),
    ).drop("__g")


def _poisson_xxh_bench(spark, sf_dir):
    """Timed path: the production fast-path operator alone (the
    contract-flag reduction above stays on the driver's .build)."""
    return _poisson_xxh_orders(spark, sf_dir)[1]


REGISTRY["poisson_bootstrap_revenue_xxh"].bench_build = _poisson_xxh_bench


@_q(
    "weighted_percentiles_price",
    """
    WITH c AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
    ),
    vals AS (SELECT v, CAST(SUM(w) AS BIGINT) AS w FROM c GROUP BY v),
    tot AS (SELECT SUM(w::HUGEINT) AS tw FROM vals),
    cum AS (
      SELECT v, SUM(w::HUGEINT) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, tw
      FROM vals CROSS JOIN tot
    )
    SELECT pct, MIN(v) AS value, CAST(MAX(tw) AS BIGINT) AS total_weight
    FROM cum, (SELECT UNNEST([50, 90, 99]) AS pct) p
    WHERE cum * 100 >= tw * pct
    GROUP BY pct ORDER BY pct
    """,
    tags=("stats-percentile", "A3-generalized"),
)
def weighted_percentiles_price(spark, sf_dir):
    """Exact quantity-weighted P50/P90/P99 of extended price (integer
    cents) — the weighted complement of the KLL sketch's approximate
    quantiles. The cumulative pass runs over DISTINCT price values
    (vocabulary-sized, the equi_depth construction), and the threshold
    test stays in cross-multiplied integer form."""
    from etl_rj_spark.operators.stats import weighted_percentiles

    li = _t(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return weighted_percentiles(li, "cents", "qty", percentiles=(50, 90, 99)).orderBy(
        "pct"
    )


_CMS_COL = (
    "('0x' || substr(md5(CAST({r} AS VARCHAR) || ':' || "
    "CAST({key} AS VARCHAR)), 1, 13))::BIGINT % 64"
)


@_q(
    "cms_user_event_counts",
    f"""
    -- complete-case: a NULL user is not a sketch item (Spark's
    -- xxhash64 would hash NULL to a real cell, conflating every NULL
    -- row into one phantom heavy hitter); mirrors the engine filter
    -- (r10 nullmix parity)
    WITH ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
    sk AS (
      SELECT rr.r, {_CMS_COL.format(r='rr.r', key='user_id')} AS col,
             COUNT(*) AS counter
      FROM ev, (SELECT UNNEST(range(0, 4)) AS r) rr
      GROUP BY 1, 2
    ),
    top AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM ev GROUP BY 1 ORDER BY exact_n DESC, user_id LIMIT 10
    ),
    probe AS (
      SELECT t.user_id, t.exact_n, rr.r,
             {_CMS_COL.format(r='rr.r', key='t.user_id')} AS col
      FROM top t, (SELECT UNNEST(range(0, 4)) AS r) rr
    )
    SELECT p.user_id, p.exact_n,
           CAST(MIN(coalesce(s.counter, 0)) AS BIGINT) AS est_n
    FROM probe p LEFT JOIN sk s ON s.r = p.r AND s.col = p.col
    GROUP BY 1, 2 ORDER BY p.user_id
    """,
    tags=("sketch-cms", "A3-generalized"),
)
def cms_user_event_counts(spark, sf_dir):
    """Count-min sketch round trip: build the 4×64 CMS of per-user
    event frequencies as a relational state table (additive/mergeable —
    the frequent-items ledger discipline applies verbatim), then probe
    it for the 10 heaviest users beside their exact counts. The
    guaranteed one-sided error (est ≥ exact) is visible in the output;
    the deliberately narrow width shows the collision overcount the
    depth's MIN bounds."""
    from etl_rj_spark.streaming.sketches import cms_estimate, cms_sketch

    # complete-case: NULL users are not sketch items (see oracle, r10)
    ev = (
        _t(spark, sf_dir, "events")
        .select("user_id")
        .where(F.col("user_id").isNotNull())
    )
    sk = cms_sketch(ev, "user_id", depth=4, width=64)
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "user_id")
        .limit(10)
    )
    return cms_estimate(sk, top, "user_id", depth=4, width=64).orderBy("user_id")


@_q(
    "stream_cms_maintenance",
    f"""
    -- complete-case: a NULL user is not a sketch item (Spark's
    -- xxhash64 would hash NULL to a real cell, conflating every NULL
    -- row into one phantom heavy hitter); mirrors the engine filter
    -- (r10 nullmix parity)
    WITH ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
    sk AS (
      SELECT rr.r, {_CMS_COL.format(r='rr.r', key='user_id')} AS col,
             COUNT(*) AS counter
      FROM ev, (SELECT UNNEST(range(0, 4)) AS r) rr
      GROUP BY 1, 2
    ),
    top AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM ev GROUP BY 1 ORDER BY exact_n DESC, user_id LIMIT 10
    ),
    probe AS (
      SELECT t.user_id, t.exact_n, rr.r,
             {_CMS_COL.format(r='rr.r', key='t.user_id')} AS col
      FROM top t, (SELECT UNNEST(range(0, 4)) AS r) rr
    )
    SELECT p.user_id, p.exact_n,
           CAST(MIN(coalesce(s.counter, 0)) AS BIGINT) AS est_n,
           1 AS stream_is_2x
    FROM probe p LEFT JOIN sk s ON s.r = p.r AND s.col = p.col
    GROUP BY 1, 2 ORDER BY p.user_id
    """,
    tags=("streaming", "sketch-cms", "incremental"),
)
def stream_cms_maintenance(spark, sf_dir):
    """Streaming count-min maintenance (streaming/sketches.py): events
    drain as 3 micro-batches folding per-day CMS partials (additive →
    batch-id ledger, the frequent-items class); one extra whole-table
    fold under a fresh id EXACTLY DOUBLES every counter, and
    redelivering that id must change nothing. The served estimate for
    each heavy user must therefore equal 2× the direct single-pass CMS
    estimate the oracle replays (CMS is linear under exact duplication
    — integer counters, no rounding), which ``stream_is_2x`` pins; the
    reported ``est_n`` is the undoubled estimate so the output matches
    the batch query's semantics."""
    from etl_rj_spark.analytics.coverage_suite import _scratch
    from etl_rj_spark.sources.parquet import read_parquet_table
    from etl_rj_spark.streaming.sketches import (
        cms_estimate,
        cms_sketch,
        fold_cms_batch,
        serve_cms_sketch,
        stream_cms_partials,
    )

    root = _scratch("stream_cms")
    # complete-case: NULL users are not sketch items (see oracle, r10)
    ev = (
        read_parquet_table(spark, f"{sf_dir}/events.parquet")
        .select("user_id", "ts")
        .where(F.col("user_id").isNotNull())
    )
    ev.repartition(3).write.parquet(f"{root}/in")
    schema = spark.read.parquet(f"{root}/in").schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{root}/in")
    stream_cms_partials(
        stream, f"{root}/partials", f"{root}/ck"
    ).awaitTermination()
    fold_cms_batch(ev, 99, f"{root}/partials")
    fold_cms_batch(ev, 99, f"{root}/partials")  # ledgered no-op

    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "user_id")
        .limit(10)
    )
    served = cms_estimate(
        serve_cms_sketch(spark, f"{root}/partials"), top, "user_id"
    ).withColumnRenamed("est_n", "__served")
    batch = cms_estimate(cms_sketch(ev, "user_id"), top, "user_id")
    return (
        batch.join(served.select("user_id", "__served"), "user_id")
        .select(
            "user_id", "exact_n", "est_n",
            (F.col("__served") == 2 * F.col("est_n")).cast("int")
            .alias("stream_is_2x"),
        )
        .orderBy("user_id")
    )


_PK_TABLES = [('customer', 'customer', ['c_custkey']), ('documents', 'documents', ['doc_id']), ('embeddings', 'embeddings', ['vec_id']), ('events', 'events', ['event_id']), ('lineitem', 'lineitem', ['l_orderkey', 'l_linenumber']), ('nation', 'nation', ['n_nationkey']), ('orders', 'orders', ['o_orderkey']), ('part', 'part', ['p_partkey']), ('region', 'region', ['r_regionkey']), ('supplier', 'supplier', ['s_suppkey'])]


@_q(
    "pk_uniqueness_audit",
    """
    SELECT 'customer' AS table_name, CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_keys,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_rows
    FROM (SELECT COUNT(*) AS c FROM customer GROUP BY c_custkey)
    UNION ALL
    SELECT 'documents' AS table_name, CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_keys,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_rows
    FROM (SELECT COUNT(*) AS c FROM documents GROUP BY doc_id)
    UNION ALL
    SELECT 'embeddings' AS table_name, CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_keys,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_rows
    FROM (SELECT COUNT(*) AS c FROM embeddings GROUP BY vec_id)
    UNION ALL
    SELECT 'events' AS table_name, CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_keys,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_rows
    FROM (SELECT COUNT(*) AS c FROM events GROUP BY event_id)
    UNION ALL
    SELECT 'lineitem' AS table_name, CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_keys,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_rows
    FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)
    UNION ALL
    SELECT 'nation' AS table_name, CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_keys,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_rows
    FROM (SELECT COUNT(*) AS c FROM nation GROUP BY n_nationkey)
    UNION ALL
    SELECT 'orders' AS table_name, CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_keys,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_rows
    FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'part' AS table_name, CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_keys,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_rows
    FROM (SELECT COUNT(*) AS c FROM part GROUP BY p_partkey)
    UNION ALL
    SELECT 'region' AS table_name, CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_keys,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_rows
    FROM (SELECT COUNT(*) AS c FROM region GROUP BY r_regionkey)
    UNION ALL
    SELECT 'supplier' AS table_name, CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_keys,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_rows
    FROM (SELECT COUNT(*) AS c FROM supplier GROUP BY s_suppkey)
    ORDER BY table_name
    """,
    tags=("validation", "pk-integrity", "A2-generalized"),
)
def pk_uniqueness_audit_q(spark, sf_dir):
    """Warehouse-wide primary-key report: every table's row count,
    distinct-key count, and rows participating in duplicated keys —
    the uniqueness half of constraint checking beside the FK orphan
    audit. One map-side-combinable pass per table; all-zero
    ``n_dup_rows`` over the clean warehouse IS the assertion."""
    from etl_rj_spark.operators.validate import pk_uniqueness_audit

    tables = [(label, _t(spark, sf_dir, tbl), keys) for label, tbl, keys in _PK_TABLES]
    return pk_uniqueness_audit(tables).orderBy("table_name")


@_q(
    "zorder_layout_buckets",
    """
    WITH k AS (
      SELECT (l_partkey & 65535) AS a, (l_suppkey & 65535) AS b FROM lineitem
    ), m AS (
      SELECT ((((a >> 0) & 1) << 0) + (((b >> 0) & 1) << 1)) + ((((a >> 1) & 1) << 2) + (((b >> 1) & 1) << 3)) + ((((a >> 2) & 1) << 4) + (((b >> 2) & 1) << 5)) + ((((a >> 3) & 1) << 6) + (((b >> 3) & 1) << 7)) + ((((a >> 4) & 1) << 8) + (((b >> 4) & 1) << 9)) + ((((a >> 5) & 1) << 10) + (((b >> 5) & 1) << 11)) + ((((a >> 6) & 1) << 12) + (((b >> 6) & 1) << 13)) + ((((a >> 7) & 1) << 14) + (((b >> 7) & 1) << 15)) + ((((a >> 8) & 1) << 16) + (((b >> 8) & 1) << 17)) + ((((a >> 9) & 1) << 18) + (((b >> 9) & 1) << 19)) + ((((a >> 10) & 1) << 20) + (((b >> 10) & 1) << 21)) + ((((a >> 11) & 1) << 22) + (((b >> 11) & 1) << 23)) + ((((a >> 12) & 1) << 24) + (((b >> 12) & 1) << 25)) + ((((a >> 13) & 1) << 26) + (((b >> 13) & 1) << 27)) + ((((a >> 14) & 1) << 28) + (((b >> 14) & 1) << 29)) + ((((a >> 15) & 1) << 30) + (((b >> 15) & 1) << 31)) AS mkey FROM k
    )
    SELECT mkey >> 22 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(mkey) AS min_key, MAX(mkey) AS max_key
    FROM m GROUP BY 1 ORDER BY bucket
    """,
    tags=("layout", "zorder", "K2-generalized"),
)
def zorder_layout_buckets(spark, sf_dir):
    """Z-ORDER layout audit: Morton keys interleaving (l_partkey,
    l_suppkey) low bits, bucketed to the top 10 bits — the key a
    write-time ``sortWithinPartitions(morton_key)`` would cluster by
    so min/max file statistics prune scans filtered on EITHER column.
    The per-bucket min/max ranges in the output are exactly the
    pruning metadata such a layout yields; pure bit surgery, one
    aggregate."""
    from etl_rj_spark.operators.stats import morton_key

    li = _t(spark, sf_dir, "lineitem")
    keyed = li.select(
        morton_key(F.col("l_partkey"), F.col("l_suppkey"), bits=16).alias("mkey")
    )
    return (
        keyed.select(F.shiftright("mkey", 22).alias("bucket"), "mkey")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("mkey").alias("min_key"),
            F.max("mkey").alias("max_key"),
        )
        .orderBy("bucket")
    )


@_q(
    "shard_source_diversity",
    """
    WITH sharded AS (
      SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 8
               AS shard, source
      FROM documents
    ), cnt AS (
      SELECT shard, source, COUNT(*) AS c FROM sharded GROUP BY 1, 2
    )
    SELECT shard, CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_sources,
           CAST(1000000 - (SUM(c::HUGEINT * c) * 1000000)
                // (SUM(c::HUGEINT) * SUM(c)) AS BIGINT) AS gini_simpson_ppm
    FROM cnt GROUP BY shard ORDER BY shard
    """,
    tags=("diversity", "curation", "A3-generalized"),
)
def shard_source_diversity(spark, sf_dir):
    """Per-training-shard source-diversity report: Gini–Simpson index
    (1 − Σpᵢ²) in exact integer ppm over each hash shard's source mix
    — the skewed-shard detector a curriculum builder runs after
    sharding (a low-diversity shard trains on one source for a whole
    step). Shards come from the same md5 bucket assignment the
    splitters use; two nested map-side aggregates, no float."""
    from etl_rj_spark.operators.curation import split_bucket

    d = _t(spark, sf_dir, "documents").select(
        split_bucket(F.col("doc_id"), 8).alias("shard"), "source"
    )
    cnt = d.groupBy("shard", "source").agg(F.count(F.lit(1)).alias("c"))
    return (
        cnt.groupBy("shard")
        .agg(
            F.sum("c").alias("n_docs"),
            F.count(F.lit(1)).alias("n_sources"),
            F.expr(
                "cast(1000000 - (sum(cast(c as decimal(38,0)) * c) * 1000000)"
                " div (sum(cast(c as decimal(38,0))) * sum(c)) as bigint)"
            ).alias("gini_simpson_ppm"),
        )
        .orderBy("shard")
    )


@_q(
    "rfm_segmentation",
    """
    WITH cust AS (
      SELECT o_custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                       (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)) AS recency,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary
      FROM orders
      -- a NULL customer key is not a customer (r10 nullmix parity)
      WHERE o_custkey IS NOT NULL
      GROUP BY o_custkey
    ),
    n AS (SELECT COUNT(*) AS n FROM cust),
    rb AS (SELECT v, CAST((before * 4) // n AS INTEGER) AS bin FROM (
             SELECT recency AS v, SUM(COUNT(*)) OVER (ORDER BY recency
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS before0,
               COUNT(*) AS c
             FROM cust GROUP BY recency) CROSS JOIN n,
             LATERAL (SELECT coalesce(before0, 0) AS before)),
    fb AS (SELECT v, CAST((before * 4) // n AS INTEGER) AS bin FROM (
             SELECT frequency AS v, SUM(COUNT(*)) OVER (ORDER BY frequency
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS before0,
               COUNT(*) AS c
             FROM cust GROUP BY frequency) CROSS JOIN n,
             LATERAL (SELECT coalesce(before0, 0) AS before)),
    mb AS (SELECT v, CAST((before * 4) // n AS INTEGER) AS bin FROM (
             SELECT monetary AS v, SUM(COUNT(*)) OVER (ORDER BY monetary
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS before0,
               COUNT(*) AS c
             FROM cust GROUP BY monetary) CROSS JOIN n,
             LATERAL (SELECT coalesce(before0, 0) AS before))
    SELECT (rb.bin + 1) * 100 + (fb.bin + 1) * 10 + (mb.bin + 1) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cust.monetary) AS BIGINT) AS total_cents
    FROM cust
    JOIN rb ON cust.recency = rb.v
    JOIN fb ON cust.frequency = fb.v
    JOIN mb ON cust.monetary = mb.v
    GROUP BY 1 ORDER BY segment
    """,
    tags=("rfm", "segmentation", "A3-generalized"),
)
def rfm_segmentation(spark, sf_dir):
    """Classic RFM customer segmentation with engine-exact quartile
    codes: recency (days since last order vs corpus max date),
    frequency (order count), monetary (exact cents) each discretized
    by the equi-depth construction — bins from DISTINCT-value
    cumulative counts, so ties share a bin, assignments replay
    bit-for-bit, and no global row sort exists. Output is the ~64
    segment rollup (code = R·100 + F·10 + M, quartiles 1..4)."""
    from etl_rj_spark.operators.stats import equi_depth_bins

    # complete-case: a NULL customer key is not a customer (see oracle)
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey").isNotNull())
    mx = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("__mx"))
    cust = (
        o.join(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("__last"),
            F.max("__mx").alias("__mx2"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("monetary"),
        )
        .select(
            "o_custkey",
            F.datediff("__mx2", "__last").alias("recency"),
            "frequency", "monetary",
        )
    )
    binned = equi_depth_bins(cust, "recency", 4, bin_col="__rb")
    binned = equi_depth_bins(binned, "frequency", 4, bin_col="__fb")
    binned = equi_depth_bins(binned, "monetary", 4, bin_col="__mb")
    return (
        binned.select(
            ((F.col("__rb") + 1) * 100 + (F.col("__fb") + 1) * 10 + F.col("__mb") + 1)
            .alias("segment"),
            "monetary",
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary").alias("total_cents"),
        )
        .orderBy("segment")
    )


@_q(
    "weekday_seasonality_revenue",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT COUNT(*) AS nd, SUM(c::HUGEINT) AS t FROM daily)
    SELECT isodow(d) AS dow, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(c) AS BIGINT) AS total_cents,
           CAST((SUM(c::HUGEINT) * nd * 1000000) // (COUNT(*) * t) AS BIGINT)
             AS index_ppm
    FROM daily CROSS JOIN tot
    GROUP BY dow, nd, t ORDER BY dow
    """,
    tags=("seasonality", "A3-generalized"),
)
def weekday_seasonality_revenue(spark, sf_dir):
    """Weekday seasonality profile: each ISO weekday's mean daily
    revenue relative to the overall mean daily revenue, as the exact
    integer-ppm index ``(Σc_dow · n_days · 10⁶) div (n_dow · Σc)`` —
    the multiplicative seasonal factor a deseasonalizing monitor
    divides by. Day-grain after one corpus aggregate; the totals ride
    a broadcast."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c")
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("__nd"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("__t"),
    )
    return (
        daily.join(F.broadcast(tot))
        .select((F.weekday("d") + 1).alias("dow"), "c", "__nd", "__t")
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("c").alias("total_cents"),
            F.expr(
                "cast((sum(cast(c as decimal(38,0))) * max(__nd) * 1000000)"
                " div (count(1) * max(__t)) as bigint)"
            ).alias("index_ppm"),
        )
        .orderBy("dow")
    )


@_q(
    "prorate_order_totals",
    """
    WITH l AS (
      SELECT l_orderkey, l_linenumber,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS w
      FROM lineitem
    ), o AS (
      SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total
      FROM orders
    ), j AS (
      SELECT l.l_orderkey, l.l_linenumber, l.w, o.total,
             SUM(l.w::HUGEINT) OVER (PARTITION BY l.l_orderkey) AS w_sum
      FROM l JOIN o ON l.l_orderkey = o.o_orderkey
    ), b AS (
      SELECT *, CAST((total::HUGEINT * w) // w_sum AS BIGINT) AS base,
             (total::HUGEINT * w) - ((total::HUGEINT * w) // w_sum) * w_sum AS rem
      FROM j
    ), r AS (
      SELECT *, total - CAST(SUM(base) OVER (PARTITION BY l_orderkey) AS BIGINT) AS R,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY rem DESC, l_linenumber, w DESC) AS rk
      FROM b
    )
    SELECT l_orderkey, l_linenumber, w,
           CAST(base + CASE WHEN rk <= R THEN 1 ELSE 0 END AS BIGINT) AS alloc
    FROM r
    """,
    tags=("proration", "largest-remainder", "N-generalized"),
)
def prorate_order_totals(spark, sf_dir):
    """Largest-remainder proration: each order's exact total cents
    distributed across its lineitems in proportion to extended price,
    with the leftover cents going to the largest scaled remainders —
    integer allocations that sum EXACTLY to the order total (the
    invariant a float split loses a cent on, at 100 TB a reconciliation
    break). One shuffle on the order key; three windows share it."""
    from etl_rj_spark.operators.aggregates import prorate_largest_remainder

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("w"),
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("total"),
    )
    lines = li.join(o, "l_orderkey")
    return prorate_largest_remainder(
        lines, ["l_orderkey"], "w", "total",
        tiebreak_cols=["l_linenumber"], out_col="alloc",
    ).select("l_orderkey", "l_linenumber", "w", "alloc")
