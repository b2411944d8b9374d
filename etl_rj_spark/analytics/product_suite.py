"""Product-analytics / experimentation / concentration queries — the
round-8 tier: Markov transitions, exact Gini and chi-square screens,
deterministic A/B testing, exact stratified splits, skylines, dyadic
EWMA smoothing, entropy profiles, vocabulary coverage, and CDF
normalization. Everything follows the house rules: exact-integer (or
single-expression 9-dp double) statistics a DuckDB oracle replays
bit-for-bit, and no unpartitioned window over an unbounded grain
(SCALE.md §3 — the ranked pieces ride ``ranked_topk`` /
``global_rank_cumsum`` / value-vocabulary windows).

These extend the reference surface (jorgelqc/ETL-RJ has no analytics
beyond its five documented queries); they are the reporting tier a
production deployment of the same warehouse would ask for next.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_rj_spark.analytics.llm_suite import _SQL_TOKS
from etl_rj_spark.analytics.suite import _q, _t

# ---------------------------------------------------------------------------
# Markov transition matrix
# ---------------------------------------------------------------------------

@_q(
    "markov_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_state
      FROM events
    ),
    pairs AS (
      SELECT prev_state, event_type AS state, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_state IS NOT NULL GROUP BY 1, 2
    ),
    rt AS (SELECT prev_state, SUM(n) AS rt FROM pairs GROUP BY 1)
    SELECT p.prev_state, p.state, p.n,
           CAST((p.n * 1000000) // r.rt AS BIGINT) AS p_ppm
    FROM pairs p JOIN rt r USING (prev_state)
    """,
    bench=True,  # NEW bench row r8 (add, never replace)
    tags=("markov", "sequence", "W1-generalized"),
)
def markov_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix of the event stream: per
    user, LAG the event type over (ts, event_id); count (prev, cur)
    pairs; row-normalize to exact integer ppm. The behavioral-model
    primitive (next-action prediction, anomaly scoring, session
    simulation). One shuffle on the user key, then a |types|²-cell
    vocabulary aggregate."""
    from etl_rj_spark.operators.windows import transition_counts

    ev = _t(spark, sf_dir, "events")
    return transition_counts(ev, "user_id", "ts", "event_type", "event_id")


# ---------------------------------------------------------------------------
# Exact Gini concentration
# ---------------------------------------------------------------------------

@_q(
    "gini_revenue_customers",
    """
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT cents, row_number() OVER (ORDER BY cents DESC, o_custkey) AS r
      FROM rev
    ),
    agg AS (
      SELECT COUNT(*)::HUGEINT AS n, SUM(cents::HUGEINT) AS s,
             SUM(r::HUGEINT * cents) AS rs
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS total,
           CAST(CASE WHEN n*s = 0 THEN NULL
                ELSE ((n+1)*s - 2*rs) * 1000000 // (n*s) END AS BIGINT)
             AS gini_ppm
    FROM agg
    """,
    bench=True,  # NEW bench row r8 (add, never replace): two-phase global rank
    tags=("stats-gini", "concentration"),
)
def gini_revenue_customers(spark, sf_dir):
    """Exact Gini coefficient of customer revenue concentration in
    ppm — the single-number summary of the Pareto report. The global
    rank that the closed form needs comes from ``global_rank_cumsum``
    (range-bucketed two-phase — no unpartitioned window touches the
    ~10⁹-customer aggregate at 100 TB); everything else is
    decimal(38,0)."""
    from etl_rj_spark.operators.stats import gini_concentration

    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    return gini_concentration(rev, "cents", ["o_custkey"])


# ---------------------------------------------------------------------------
# Chi-square independence screen
# ---------------------------------------------------------------------------

@_q(
    "chi_square_priority_status",
    """
    -- complete-case (NULL in either column drops the row from ALL
    -- counts) and the split division identity
    -- (A²·10⁶)//B = (A²//B)·10⁶ + ((A² % B)·10⁶)//B, both mirroring
    -- the engine (r9 review fix: NULL keys / HUGEINT overflow)
    WITH base AS (
      SELECT o_orderpriority AS pa, o_orderstatus AS pb FROM orders
      WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
    ),
    cells AS (
      SELECT pa AS a, pb AS b, COUNT(*)::HUGEINT AS o
      FROM base GROUP BY 1, 2
    ),
    rows_ AS (SELECT pa AS a, COUNT(*)::HUGEINT AS r FROM base GROUP BY 1),
    cols_ AS (SELECT pb AS b, COUNT(*)::HUGEINT AS c FROM base GROUP BY 1),
    tot AS (
      SELECT COUNT(*)::HUGEINT AS t,
             COUNT(DISTINCT pa)::BIGINT AS ka,
             COUNT(DISTINCT pb)::BIGINT AS kb
      FROM base
    )
    SELECT CAST(MAX(t) AS BIGINT) AS n,
           CAST((MAX(ka)-1) * (MAX(kb)-1) AS BIGINT) AS dof,
           -- observed-cell contributions + the expected mass of cells
           -- ABSENT from the data: Σ_all r·c = N², so the o=0 cells
           -- contribute ((N² − Σ_observed r·c)·10⁶) // N in ppm
           CAST(SUM(((o*t - r*c) * (o*t - r*c) // (t*r*c)) * 1000000
                    + (((o*t - r*c) * (o*t - r*c)) % (t*r*c)) * 1000000
                      // (t*r*c))
                + (MAX(t)*MAX(t) - SUM(r*c)) * 1000000 // MAX(t) AS BIGINT)
             AS chi2_ppm
    FROM cells JOIN rows_ USING (a) JOIN cols_ USING (b) CROSS JOIN tot
    -- degenerate-input parity (ADVICE r9): on an empty/all-NULL-key
    -- base the engine's groupBy emits 0 rows; without this HAVING the
    -- global aggregate here would emit 1 all-NULL row instead
    HAVING COUNT(*) > 0
    """,
    tags=("stats-chi2", "independence"),
)
def chi_square_priority_status(spark, sf_dir):
    """Pearson chi-square independence screen between order priority
    and order status, fully exact-integer: per-cell contribution
    ``((o·N − r·c)²·10⁶) div (N·r·c)`` summed exactly, plus the
    expected mass of empty cells (``((N²−S)·10⁶) div N`` with S the
    r·c sum over observed cells) — the drift-monitor statistic (are
    two categoricals still independent?) with no float anywhere.
    Contingency cells are vocabulary-grain."""
    from etl_rj_spark.operators.stats import chi_square_independence

    o = _t(spark, sf_dir, "orders")
    return chi_square_independence(o, "o_orderpriority", "o_orderstatus")


# ---------------------------------------------------------------------------
# Deterministic A/B test
# ---------------------------------------------------------------------------

@_q(
    "ab_test_purchase_conversion",
    """
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s
      FROM events
      -- a NULL user is not an experiment subject: it cannot be arm-
      -- assigned (hash of NULL) and GROUP BY would conflate every
      -- NULL row into one phantom subject (r10 nullmix parity)
      WHERE user_id IS NOT NULL
      GROUP BY 1
    ),
    armed AS (
      SELECT (('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 13))::BIGINT)
               % 2 AS arm, s
      FROM per_user
    ),
    agg AS (
      SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN arm = 0 THEN s ELSE 0 END) AS BIGINT) AS conv0,
             CAST(SUM(CASE WHEN arm = 1 THEN s ELSE 0 END) AS BIGINT) AS conv1
      FROM armed
    )
    SELECT n0, n1, conv0, conv1,
           CASE WHEN n0 > 0 AND n1 > 0 THEN
             CAST((conv1 * 1000000) // n1 - (conv0 * 1000000) // n0 AS BIGINT)
           END AS lift_ppm,
           CASE WHEN n0 > 0 AND n1 > 0 AND conv0 + conv1 > 0
                     AND conv0 + conv1 < n0 + n1 THEN
             ROUND((conv1 / CAST(n1 AS DOUBLE) - conv0 / CAST(n0 AS DOUBLE))
                   / SQRT(((conv0 + conv1) / CAST(n0 + n1 AS DOUBLE))
                          * (1 - (conv0 + conv1) / CAST(n0 + n1 AS DOUBLE))
                          * (1.0/n0 + 1.0/n1)), 9)
           END AS z_9dp
    FROM agg
    """,
    tags=("experimentation", "ab-test", "ztest"),
)
def ab_test_purchase_conversion(spark, sf_dir):
    """Two-proportion A/B z-test with DETERMINISTIC hash arm
    assignment (md5(user ':ab') % 2 — the assignment any re-run or
    any engine reproduces): per-arm exact (n, conversions), integer
    lift in ppm (two nonneg divisions — never an integer division of
    a negative), and the pooled z-statistic as one IEEE expression on
    exact scalars rounded to 9 dp. The whole corpus reduces in one
    per-user aggregate + one 2-group aggregate."""
    from etl_rj_spark.operators.stats import two_proportion_ztest

    # complete-case (see oracle): concat_ws SKIPS a NULL user_id, so
    # every NULL row would hash to md5("ab")'s arm — a phantom
    # subject, not a population (r10 nullmix parity)
    ev = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull()).select(
        "user_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("s"),
    )
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("user_id").cast("string"), F.lit("ab"))),
                1, 13,
            ),
            16, 10,
        ).cast("long") % 2
    )
    return two_proportion_ztest(ev, "user_id", "s", arm)


# ---------------------------------------------------------------------------
# Exact stratified split
# ---------------------------------------------------------------------------

@_q(
    "stratified_split_sources",
    """
    -- complete-case: a document with no source cannot be stratified
    -- BY source (r10 nullmix parity; mirrors the engine filter)
    WITH docs AS (SELECT doc_id, source FROM documents
                  WHERE source IS NOT NULL),
    counts AS (SELECT source, COUNT(*)::BIGINT AS n FROM docs GROUP BY 1),
    parts AS (SELECT * FROM (VALUES (0,'train',8),(1,'val',1),(2,'test',1))
              AS t(ord, part, w)),
    sized0 AS (
      SELECT c.source, c.n, p.ord, p.part,
             (c.n * p.w) // 10 AS base, (c.n * p.w) % 10 AS rem
      FROM counts c CROSS JOIN parts p
    ),
    sized AS (
      SELECT *, n - SUM(base) OVER (PARTITION BY source) AS extra,
             row_number() OVER (PARTITION BY source ORDER BY rem DESC, ord) AS rk
      FROM sized0
    ),
    bounds0 AS (
      SELECT source, ord, part,
             base + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS sz
      FROM sized
    ),
    bounds AS (
      SELECT source, part,
             COALESCE(SUM(sz) OVER (PARTITION BY source ORDER BY ord
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
             SUM(sz) OVER (PARTITION BY source ORDER BY ord
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
      FROM bounds0
    ),
    ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':split'), doc_id)
               AS split_rank
      FROM docs
    )
    SELECT r.doc_id, r.source, CAST(r.split_rank AS INT) AS split_rank,
           b.part AS split
    FROM ranked r
    JOIN bounds b ON b.source = r.source
                 AND r.split_rank > b.lo AND r.split_rank <= b.hi
    """,
    tags=("curation", "split", "largest-remainder"),
)
def stratified_split_sources(spark, sf_dir):
    """Exact stratified train/val/test split (8/1/1) of the document
    corpus by source: per-stratum part sizes are the largest-remainder
    apportionment of the stratum count (EXACTLY right, where a
    Bernoulli split is only right in expectation), and membership is
    the deterministic md5-rank interval — re-runs, engines, and
    backfills all agree. Apportionment runs on the strata×parts KB
    frame (``prorate_largest_remainder`` reused); the corpus pays one
    partitioned rank window."""
    from etl_rj_spark.operators.curation import stratified_split_exact

    # complete-case: no source, no stratum (see oracle, r10)
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .where(F.col("source").isNotNull())
    )
    return stratified_split_exact(
        d, "source", "doc_id", [("train", 8), ("val", 1), ("test", 1)]
    ).select("doc_id", "source", "split_rank", "split")


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto front)
# ---------------------------------------------------------------------------

@_q(
    "skyline_parts",
    """
    WITH p AS (
      SELECT p_partkey, CAST(ROUND(p_retailprice*100) AS BIGINT) AS cents, p_size
      FROM part
      -- a part with NULL price/size cannot be dominance-compared; the
      -- NOT-EXISTS form would otherwise admit it as a vacuous
      -- "skyline point" (every comparison NULL — r10 nullmix parity)
      WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
    )
    SELECT p_partkey, cents, p_size FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.cents >= a.cents AND b.p_size >= a.p_size
        AND (b.cents > a.cents OR b.p_size > a.p_size)
    )
    """,
    tags=("skyline", "pareto-front"),
)
def skyline_parts(spark, sf_dir):
    """2-D skyline of the part catalog (maximize price AND size —
    the non-dominated frontier): computed on the VALUE grain via the
    staircase (per-distinct-x max-y, suffix-max over distinct x, keep
    y strictly above the suffix) — one aggregate + one broadcast join,
    where the textbook NOT-EXISTS form the oracle runs is O(n²).
    The value-vocabulary window is bounded per SCALE.md §3."""
    from etl_rj_spark.operators.stats import skyline_max2

    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
        "p_size",
    )
    return skyline_max2(p, "cents", "p_size")


# ---------------------------------------------------------------------------
# Dyadic EWMA smoothing
# ---------------------------------------------------------------------------

@_q(
    "ewma_daily_revenue",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    )
    SELECT a.d, a.cents,
           CAST(SUM((CAST(1 AS HUGEINT) << (9 - (a.d - b.d))) * b.cents)
                // SUM(CAST(1 AS HUGEINT) << (9 - (a.d - b.d))) AS BIGINT) AS ewma
    FROM daily a JOIN daily b ON b.d <= a.d AND a.d - b.d < 10
    GROUP BY a.d, a.cents
    """,
    tags=("timeseries", "ewma", "A3-generalized"),
)
def ewma_daily_revenue(spark, sf_dir):
    """Exponentially-weighted daily revenue with dyadic weights
    (α=½, 10-tap horizon): pure integer arithmetic — powers of two
    and one floor division — so the smoothed series is bit-exact on
    any engine, where a float EWMA recursion both drifts and refuses
    to parallelize. Gaps/edges divide by the weights actually present.
    The horizon join runs on the DAY grain (bounded period series,
    SCALE.md §3) after one corpus aggregate."""
    from etl_rj_spark.operators.stats import dyadic_ewma

    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    return dyadic_ewma(daily, "d", "cents", taps=10)


# ---------------------------------------------------------------------------
# Per-user behavioral entropy
# ---------------------------------------------------------------------------

@_q(
    "entropy_event_type_users",
    """
    WITH cat AS (
      SELECT user_id, event_type, COUNT(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT user_id, COUNT(*)::BIGINT AS g FROM events GROUP BY 1),
    term AS (
      SELECT c.user_id, t.g,
             CAST(ROUND((c.n / CAST(t.g AS DOUBLE))
                        * (log2(t.g) - log2(c.n)) * 1000000) AS BIGINT) AS tm
      FROM cat c JOIN tot t USING (user_id)
    )
    SELECT user_id, MAX(g) AS n_events, COUNT(*)::BIGINT AS n_cats,
           CAST(SUM(tm) AS BIGINT) AS entropy_ppm
    FROM term GROUP BY user_id
    """,
    tags=("stats-entropy", "profiling"),
)
def entropy_event_type_users(spark, sf_dir):
    """Shannon entropy (bits, ppm) of each user's event-type mix —
    the behavioral-diversity feature (bots are low-entropy, explorers
    high). Each category's term is ONE double expression on exact
    integers rounded to an int64 BEFORE the cross-category sum, so
    the addition is exact-integer and aggregation-order-proof.
    Two map-side-combinable aggregates, vocabulary-bounded fan-out."""
    from etl_rj_spark.operators.stats import group_entropy_ppm

    ev = _t(spark, sf_dir, "events")
    return group_entropy_ppm(ev, "user_id", "event_type")


# ---------------------------------------------------------------------------
# Vocabulary coverage / OOV
# ---------------------------------------------------------------------------

@_q(
    "vocab_oov_rate",
    f"""
    WITH toks AS (
      SELECT source, t.term FROM
        (SELECT source, {_SQL_TOKS} AS tt FROM documents),
        UNNEST(tt) AS t(term)
    ),
    counts AS (SELECT term, COUNT(*)::BIGINT AS n FROM toks GROUP BY 1),
    vocab AS (
      SELECT term FROM (
        SELECT term, row_number() OVER (ORDER BY n DESC, term) AS r FROM counts
      ) WHERE r <= 100
    ),
    flag AS (
      SELECT s.source, CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
      FROM toks s LEFT JOIN vocab v USING (term)
    )
    SELECT source, COUNT(*)::BIGINT AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           CAST((SUM(oov) * 1000000) // COUNT(*) AS BIGINT) AS oov_ppm
    FROM flag GROUP BY source
    """,
    tags=("tokenizer", "vocab-coverage", "oov"),
)
def vocab_oov_rate(spark, sf_dir):
    """Vocabulary coverage audit: build the top-100 corpus vocabulary
    (by frequency, term-tiebreak — via ``ranked_topk``, so the
    vocabulary cut is a distributed top-k, no global window) and
    report each source's out-of-vocabulary token rate in ppm — the
    screen that catches a source whose text a fixed tokenizer will
    shred into bytes. Token stream is (doc, term) grain; the vocab
    broadcasts back."""
    from etl_rj_spark.operators.text_analysis import (
        normalized_text,
        whitespace_tokens,
    )
    from etl_rj_spark.operators.windows import ranked_topk

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(whitespace_tokens(normalized_text("text"))).alias("term"),
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    vocab = ranked_topk(
        counts, [(F.col("n"), False), (F.col("term"), True)], 100
    ).select("term", F.lit(1).alias("__v"))
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__v").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "source", "n_tokens", "n_oov",
            F.expr("(n_oov * 1000000) div n_tokens").alias("oov_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster size histogram
# ---------------------------------------------------------------------------

@_q(
    "dup_cluster_size_histogram",
    """
    WITH c AS (SELECT md5(text) AS h, COUNT(*)::BIGINT AS sz
               FROM documents GROUP BY 1)
    SELECT sz AS cluster_size, COUNT(*)::BIGINT AS n_clusters
    FROM c GROUP BY 1
    """,
    tags=("dedup", "histogram", "ops-report"),
)
def dup_cluster_size_histogram(spark, sf_dir):
    """Exact-duplicate cluster-size histogram — the one-line health
    report of a dedup pass (how much of the corpus is singleton vs
    boilerplate explosions). Two map-side-combinable aggregates; the
    second runs on cluster grain."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )


# ---------------------------------------------------------------------------
# Inter-purchase gap distribution
# ---------------------------------------------------------------------------

@_q(
    "interpurchase_gap_stats",
    """
    WITH gaps AS (
      SELECT CAST(o_orderdate AS DATE)
             - lag(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS gap
      FROM orders
    ),
    g AS (SELECT gap FROM gaps WHERE gap IS NOT NULL),
    v AS (SELECT gap, COUNT(*)::BIGINT AS c FROM g GROUP BY 1),
    cum AS (
      SELECT gap, SUM(c) OVER (ORDER BY gap
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
      FROM v
    ),
    n AS (SELECT COUNT(*)::BIGINT AS n FROM g)
    SELECT MAX(n.n) AS n_gaps,
           CAST(MIN(CASE WHEN cum.hi >= (n.n + 1) // 2 THEN cum.gap END)
                AS BIGINT) AS median_gap,
           CAST(MIN(CASE WHEN cum.hi >= (9 * n.n + 9) // 10 THEN cum.gap END)
                AS BIGINT) AS p90_gap
    FROM cum CROSS JOIN n
    """,
    tags=("stats-quantile", "value-grain", "W1-generalized"),
)
def interpurchase_gap_stats(spark, sf_dir):
    """Inter-purchase interval distribution: per-customer consecutive
    order-date gaps (days), then the exact LOWER median and lower P90
    of all gaps computed on the VALUE grain — counts per distinct gap,
    one cumulative window over the gap vocabulary (bounded by the date
    range, never corpus-sized), pick the first value whose cumulative
    count crosses the rank. One shuffle on the customer key for the
    LAG, one vocabulary aggregate."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.select(
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate").cast("date")).over(w),
            ).alias("gap")
        )
        .filter(F.col("gap").isNotNull())
    )
    v = gaps.groupBy("gap").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.orderBy("gap").rowsBetween(Window.unboundedPreceding, 0)
    cum = v.select("gap", F.sum("c").over(wc).alias("hi"))
    n = gaps.agg(F.count(F.lit(1)).alias("n"))
    return (
        cum.join(F.broadcast(n))
        .agg(
            F.max("n").alias("n_gaps"),
            F.min(
                F.when(F.expr("hi >= (n + 1) div 2"), F.col("gap"))
            ).cast("bigint").alias("median_gap"),
            F.min(
                F.when(F.expr("hi >= (9 * n + 9) div 10"), F.col("gap"))
            ).cast("bigint").alias("p90_gap"),
        )
    )


# ---------------------------------------------------------------------------
# Seasonally-adjusted outlier days
# ---------------------------------------------------------------------------

@_q(
    "seasonal_adjusted_outlier_days",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT COUNT(*)::BIGINT AS nd, SUM(cents::HUGEINT) AS t FROM daily),
    idx AS (
      SELECT (dayofweek(d) + 6) % 7 + 1 AS dow,
             CAST((SUM(cents::HUGEINT) * nd * 1000000) // (COUNT(*) * t)
                  AS BIGINT) AS index_ppm
      FROM daily CROSS JOIN tot GROUP BY 1, nd, t
    ),
    deseason AS (
      SELECT d.d, d.cents,
             CAST((d.cents::HUGEINT * 1000000) // i.index_ppm AS BIGINT) AS adj
      FROM daily d JOIN idx i ON (dayofweek(d.d) + 6) % 7 + 1 = i.dow
    ),
    ranked AS (
      SELECT d, adj, row_number() OVER (ORDER BY adj, d) AS rn,
             COUNT(*) OVER () AS n
      FROM deseason
    ),
    med AS (SELECT adj AS median FROM ranked WHERE rn = (n + 1) // 2),
    dev AS (
      SELECT ds.d, ds.cents, ds.adj, m.median, ABS(ds.adj - m.median) AS ad
      FROM deseason ds CROSS JOIN med m
    ),
    devr AS (
      SELECT ad, row_number() OVER (ORDER BY ad, d) AS rn, COUNT(*) OVER () AS n
      FROM dev
    ),
    mad AS (SELECT ad AS mad FROM devr WHERE rn = (n + 1) // 2)
    SELECT dev.d, dev.cents, dev.adj, dev.median, mad.mad,
           dev.ad * 1000 > 5000 * mad.mad AS is_outlier
    FROM dev CROSS JOIN mad
    """,
    tags=("timeseries", "seasonality", "stats-robust"),
)
def seasonal_adjusted_outlier_days(spark, sf_dir):
    """Seasonally-adjusted daily-revenue anomaly screen: divide each
    day by its weekday's exact integer-ppm seasonal index (the
    ``weekday_seasonality_revenue`` statistic), then flag days where
    the DESEASONALIZED value fails the 5·MAD robust screen — a plain
    MAD screen on raw dailies would flag every healthy Sunday. All
    integer; the MAD windows run on the day grain (bounded period
    series, SCALE.md §3) via ``mad_outlier_screen`` on one constant
    group."""
    from etl_rj_spark.operators.stats import mad_outlier_screen

    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("__nd"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("__t"),
    )
    idx = (
        daily.join(F.broadcast(tot))
        .select((F.weekday("d") + 1).alias("dow"), "cents", "__nd", "__t")
        .groupBy("dow")
        .agg(
            F.expr(
                "cast((sum(cast(cents as decimal(38,0))) * max(__nd) * 1000000)"
                " div (count(1) * max(__t)) as bigint)"
            ).alias("index_ppm")
        )
    )
    deseason = (
        daily.withColumn("dow", F.weekday("d") + 1)
        .join(F.broadcast(idx), "dow")
        .select(
            "d", "cents",
            F.expr(
                "cast((cast(cents as decimal(38,0)) * 1000000) div index_ppm"
                " as bigint)"
            ).alias("adj"),
        )
        .withColumn("__g", F.lit(1))
    )
    return (
        mad_outlier_screen(deseason.select("__g", "d", "adj", "cents"),
                           "__g", "adj", "d")
        .join(deseason.select("d", "cents"), "d")
        .select("d", "cents", F.col("adj"), "median", "mad", "is_outlier")
    )


# ---------------------------------------------------------------------------
# CDF percentile-rank normalization
# ---------------------------------------------------------------------------

@_q(
    "percentile_rank_chars",
    """
    -- complete-case: the CDF population is documents WITH a length —
    -- NULL rows otherwise skew the denominator and (under Spark's
    -- NULLS FIRST vs SQL's NULLS LAST) the cumulative itself (r10
    -- nullmix parity; mirrors the engine filter)
    WITH docs AS (SELECT doc_id, n_chars FROM documents
                  WHERE n_chars IS NOT NULL),
    v AS (SELECT n_chars, COUNT(*)::BIGINT AS c FROM docs GROUP BY 1),
    cum AS (
      SELECT n_chars,
             SUM(c) OVER (ORDER BY n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS lt
      FROM v
    ),
    n AS (SELECT COUNT(*)::BIGINT AS n FROM docs)
    SELECT d.doc_id, d.n_chars,
           CAST((cum.lt * 1000000) // n.n AS BIGINT) AS pct_ppm
    FROM docs d JOIN cum USING (n_chars) CROSS JOIN n
    """,
    tags=("stats-cdf", "normalize", "value-grain"),
)
def percentile_rank_chars(spark, sf_dir):
    """Percentile-rank (CDF) normalization of document length:
    ``pct_ppm = (rows strictly below my value)·10⁶ div n`` — the
    scale-free feature transform that makes heterogeneous quality
    scores comparable across sources. NO global row rank: per-value
    counts, one cumulative window over the value VOCABULARY, broadcast
    map joined back — the same posture as ``equi_depth_bins``."""
    # complete-case: CDF over documents WITH a length (see oracle, r10)
    d = _t(spark, sf_dir, "documents").where(F.col("n_chars").isNotNull())
    v = d.groupBy("n_chars").agg(F.count(F.lit(1)).alias("__c"))
    wc = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    cum = v.select(
        "n_chars", (F.sum("__c").over(wc) - F.col("__c")).alias("__lt")
    )
    n = d.agg(F.count(F.lit(1)).alias("__n"))
    cdf = cum.join(F.broadcast(n)).select(
        "n_chars",
        F.expr("cast((__lt * 1000000) div __n as bigint)").alias("pct_ppm"),
    )
    return d.select("doc_id", "n_chars").join(F.broadcast(cdf), "n_chars").select(
        "doc_id", "n_chars", "pct_ppm"
    )


# ---------------------------------------------------------------------------
# Streaming Markov-matrix maintenance
# ---------------------------------------------------------------------------

@_q(
    "stream_transition_maintenance",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_state
      FROM events
    ),
    pairs AS (
      SELECT prev_state, event_type AS state, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_state IS NOT NULL GROUP BY 1, 2
    ),
    rt AS (SELECT prev_state, SUM(n) AS rt FROM pairs GROUP BY 1)
    SELECT p.prev_state, p.state, p.n,
           CAST((p.n * 1000000) // r.rt AS BIGINT) AS p_ppm,
           1 AS boundary_exact
    FROM pairs p JOIN rt r USING (prev_state)
    """,
    tags=("streaming", "markov", "incremental", "exact-state"),
)
def stream_transition_maintenance(spark, sf_dir):
    """Streaming Markov-matrix maintenance
    (streaming/transitions.py) — the fifth point in the
    state-maintenance taxonomy: SNAPSHOT-VERSIONED state with a
    commit-marker publish and monotone-batch-id idempotence. The
    events table folds as 3 TIME-RANGE slices (the ordered log-segment
    contract); the transition spanning each slice boundary is visible
    to neither slice alone, so the maintained matrix equals the
    single-pass batch matrix ONLY if boundary stitching via the
    stored per-user last-seen state is exact — that equality (to the
    oracle's direct LAG) is the check, ``boundary_exact`` pins it
    in-schema. Redelivering a committed fold id and an out-of-order
    old id must both no-op (asserted in tests/test_streaming.py)."""
    from etl_rj_spark.analytics.coverage_suite import _scratch
    from etl_rj_spark.sources.parquet import read_parquet_table
    from etl_rj_spark.streaming.transitions import (
        fold_transitions_batch,
        serve_transition_matrix,
    )

    root = _scratch("stream_transitions")
    ev = read_parquet_table(spark, f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id", "event_type"
    )
    # three contiguous time slices — each entity's events arrive in
    # order across folds, per the maintainer's log-segment contract
    bounds = ev.agg(
        F.expr("percentile_approx(cast(ts as double), 0.34)").alias("t1"),
        F.expr("percentile_approx(cast(ts as double), 0.67)").alias("t2"),
    ).collect()[0]
    t1, t2 = bounds.t1, bounds.t2
    slices = [
        ev.filter(F.col("ts").cast("double") <= t1),
        ev.filter((F.col("ts").cast("double") > t1) & (F.col("ts").cast("double") <= t2)),
        ev.filter(F.col("ts").cast("double") > t2),
    ]
    for i, s in enumerate(slices):
        fold_transitions_batch(s, i, root)
    fold_transitions_batch(slices[2], 2, root)  # redelivery: no-op
    fold_transitions_batch(slices[0], 0, root)  # stale id: no-op
    return serve_transition_matrix(spark, root).withColumn(
        "boundary_exact", F.lit(1)
    )


# ---------------------------------------------------------------------------
# Forecast evaluation (naive seasonal baseline)
# ---------------------------------------------------------------------------

@_q(
    "forecast_eval_naive7",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS c
      FROM orders GROUP BY 1
    ),
    e7 AS (
      SELECT a.d, ABS(a.c - b.c) AS e, a.c AS actual
      FROM daily a JOIN daily b ON b.d = a.d - 7
    ),
    e1 AS (
      SELECT ABS(a.c - b.c) AS e FROM daily a JOIN daily b ON b.d = a.d - 1
    ),
    agg7 AS (
      -- zero-actual days contribute NULL (excluded from the MAPE sum,
      -- still counted in n7) — MAPE's textbook failure mode guarded
      SELECT COUNT(*)::BIGINT AS n7, SUM(e::HUGEINT) AS se7,
             SUM(CASE WHEN actual = 0 THEN NULL
                 ELSE (e::HUGEINT * 1000000) // actual END) AS mape_terms
      FROM e7
    ),
    agg1 AS (SELECT COUNT(*)::BIGINT AS n1, SUM(e::HUGEINT) AS se1 FROM e1)
    SELECT n7,
           CAST(CASE WHEN n7 = 0 THEN NULL ELSE se7 // n7 END AS BIGINT)
             AS mae_cents,
           CAST(CASE WHEN n7 = 0 THEN NULL ELSE mape_terms // n7 END AS BIGINT)
             AS mape_ppm,
           -- a CONSTANT daily series zeroes the naive-1 denominator:
           -- MASE undefined, NULL on both engines
           CAST(CASE WHEN se1 * n7 = 0 THEN NULL
                ELSE (se7 * n1 * 1000000) // (se1 * n7) END AS BIGINT)
             AS mase_ppm
    FROM agg7 CROSS JOIN agg1
    """,
    tags=("forecast-eval", "timeseries", "A3-generalized"),
)
def forecast_eval_naive7(spark, sf_dir):
    """Forecast-accuracy harness over the seasonal-naive baseline
    (forecast(d) = actual(d−7)): exact-integer MAE (cents), MAPE (mean
    of per-day integer-ppm terms), and MASE (scaled against the
    naive-1 baseline, the denominator that makes error comparable
    across series — Hyndman & Koehler 2006). Everything is date-grain
    after one corpus aggregate; the ratios are nonneg integer div, so
    the whole scorecard is engine-exact — the eval loop for any
    downstream revenue model."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c")
    )
    a = daily.alias("a")
    f7 = daily.select(F.date_add(F.col("d"), 7).alias("d"), F.col("c").alias("__f"))
    e7 = a.join(f7, "d").select(
        F.abs(F.col("c") - F.col("__f")).alias("e"), F.col("c").alias("actual")
    )
    f1 = daily.select(F.date_add(F.col("d"), 1).alias("d"), F.col("c").alias("__f"))
    e1 = a.join(f1, "d").select(F.abs(F.col("c") - F.col("__f")).alias("e"))
    agg7 = e7.agg(
        F.count(F.lit(1)).alias("n7"),
        F.sum(F.col("e").cast("decimal(38,0)")).alias("__se7"),
        # zero-actual days contribute NULL (excluded from the sum,
        # still counted in n7) — MAPE's textbook failure mode guarded
        F.sum(
            F.expr(
                "case when actual = 0 then null else"
                " (cast(e as decimal(38,0)) * 1000000) div actual end"
            )
        ).alias("__mt"),
    )
    agg1 = e1.agg(
        F.count(F.lit(1)).alias("n1"),
        F.sum(F.col("e").cast("decimal(38,0)")).alias("__se1"),
    )
    return agg7.join(F.broadcast(agg1)).select(
        "n7",
        F.expr(
            "cast(case when n7 = 0 then null else __se7 div n7 end as bigint)"
        ).alias("mae_cents"),
        F.expr(
            "cast(case when n7 = 0 then null else __mt div n7 end as bigint)"
        ).alias("mape_ppm"),
        # a CONSTANT daily series zeroes the naive-1 denominator:
        # MASE undefined, NULL on both engines
        F.expr(
            "cast(case when __se1 * n7 = 0 then null else"
            " (__se7 * n1 * 1000000) div (__se1 * n7) end as bigint)"
        ).alias("mase_ppm"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


@_q(
    "benford_first_digit_audit",
    f"""
    WITH v AS (
      SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice*100) AS BIGINT) AS VARCHAR),
                         1, 1) AS INT) AS digit
      FROM orders
    ),
    n AS (SELECT COUNT(*)::BIGINT AS n FROM v),
    obs AS (SELECT digit, COUNT(*)::BIGINT AS n_d FROM v GROUP BY 1),
    exp_ AS (SELECT * FROM (VALUES
      {", ".join(f"({d}, {p})" for d, p in _BENFORD_PPM.items())})
      AS t(digit, expected_ppm))
    -- LEFT join from the 9-row expected table: a digit that NEVER
    -- occurs must still report (n_d 0, dev −expected) — dropping it
    -- would hide exactly the anomaly this audit screens for
    -- an EMPTY input keeps the 9-row report with NULL ppm columns
    -- (the LEFT-join rows now exist, so n = 0 must not divide)
    SELECT e.digit, COALESCE(o.n_d, 0) AS n_d,
           CAST(CASE WHEN n.n = 0 THEN NULL
                ELSE (COALESCE(o.n_d, 0) * 1000000) // n.n END AS BIGINT)
             AS observed_ppm,
           CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
           CAST(CASE WHEN n.n = 0 THEN NULL
                ELSE (COALESCE(o.n_d, 0) * 1000000) // n.n - e.expected_ppm
                END AS BIGINT)
             AS dev_ppm
    FROM exp_ e LEFT JOIN obs o USING (digit) CROSS JOIN n
    """,
    tags=("audit", "benford", "data-quality"),
)
def benford_first_digit_audit(spark, sf_dir):
    """Benford's-law first-digit audit of order totals: observed vs
    expected ``log10(1+1/d)`` digit frequencies in exact integer ppm
    (the expected table is a 9-row literal, identical in engine and
    oracle) — the classic fabricated-data / broken-ETL screen. One
    scan-stage digit extraction into a 9-cell aggregate; the signed
    deviation is a subtraction, never a division of a negative. The
    report is LEFT-joined from the expected table so a digit that
    never occurs still reports (n_d 0, dev −expected) — same empty-
    cell principle as ``chi_square_independence``: the absent digit
    IS the screen's signal (r9 fix, both engine and oracle)."""
    o = _t(spark, sf_dir, "orders")
    v = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
        ).cast("int").alias("digit")
    )
    obs = v.groupBy("digit").agg(F.count(F.lit(1)).alias("n_d"))
    n = v.agg(F.count(F.lit(1)).alias("__n"))
    exp_ = spark.createDataFrame(
        list(_BENFORD_PPM.items()), "digit int, expected_ppm int"
    )
    return (
        exp_.join(obs, "digit", "left")
        .withColumn("n_d", F.coalesce(F.col("n_d"), F.lit(0)))
        .join(F.broadcast(n))
        .select(
            "digit", "n_d",
            # an EMPTY input keeps the 9-row report with NULL ppm
            # columns (the LEFT-join rows exist, so __n = 0 must not
            # divide under ANSI)
            F.expr(
                "case when __n = 0 then null else"
                " (n_d * 1000000) div __n end"
            ).alias("observed_ppm"),
            F.col("expected_ppm").cast("bigint").alias("expected_ppm"),
            F.expr(
                "case when __n = 0 then null else"
                " (n_d * 1000000) div __n - expected_ppm end"
            ).cast("bigint").alias("dev_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Triangle counting on the co-purchase graph
# ---------------------------------------------------------------------------

@_q(
    "triangle_count_copurchase",
    """
    WITH pres AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    pairs AS (
      SELECT a.p AS u, b.p AS v, COUNT(*)::BIGINT AS sup
      FROM pres a JOIN pres b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2
    ),
    e AS (SELECT u, v FROM pairs WHERE sup >= 2),
    deg AS (
      SELECT n, COUNT(*)::BIGINT AS d FROM (
        SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e
      ) GROUP BY 1
    ),
    tri AS (
      SELECT COUNT(*)::BIGINT AS t
      FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3
        ON e3.u = e1.u AND e3.v = e2.v
    ),
    agg AS (
      SELECT COUNT(*)::BIGINT AS n_nodes,
             SUM((d * (d - 1)) // 2)::HUGEINT AS n_wedges
      FROM deg
    ),
    ne AS (SELECT COUNT(*)::BIGINT AS n_edges FROM e)
    SELECT agg.n_nodes, ne.n_edges, CAST(agg.n_wedges AS BIGINT) AS n_wedges,
           tri.t AS n_triangles,
           CASE WHEN agg.n_wedges > 0 THEN
             CAST((tri.t::HUGEINT * 3000000) // agg.n_wedges AS BIGINT)
           END AS global_cc_ppm
    FROM agg CROSS JOIN ne CROSS JOIN tri
    """,
    bench=True,  # NEW bench row r9 (add, never replace): heaviest graph query
    tags=("graph", "triangles", "clustering-coefficient"),
)
def triangle_count_copurchase(spark, sf_dir):
    """Exact triangle count + global clustering coefficient of the
    co-purchase graph (parts co-occurring in ≥2 orders — the support
    floor keeps the graph signal, not noise): ``triangle_stats`` uses
    DEGREE ORIENTATION (edges point from the (deg,id)-smaller
    endpoint), capping every out-neighborhood at O(√m) so wedge
    enumeration is O(m^1.5) instead of Σdeg² — the standard
    MapReduce-era trick that makes triangles feasible on a
    billion-edge graph. The oracle counts the same triangles by the
    textbook ordered three-way join."""
    from etl_rj_spark.operators.components import triangle_stats

    li = _t(spark, sf_dir, "lineitem")
    # r15 (guide §2.4): the old shape was distinct(o,p) → self-join on
    # o → groupBy(u,v) — three exchanges and a join whose per-order
    # fan-out Spark rebuilt row-by-row. An order's co-purchase pairs
    # are a PER-ORDER local product (orders hold a handful of parts),
    # so ONE groupBy(o) with a sorted part set + an in-row C(n,2) pair
    # expansion replaces the distinct AND the self-join: 2 exchanges,
    # 0 joins, identical (u, v, sup) multiset (array_sort makes i<j ⇒
    # u<v canonical, collect_set = the old distinct). Per-row width is
    # bounded by the order's part count — the same C(n,2) the join
    # emitted, just generated where the data already sits.
    parts = li.groupBy(F.col("l_orderkey").alias("o")).agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    n = F.size("ps")
    pair_structs = F.when(
        n >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, n.cast("long")),
                    lambda j: F.struct(
                        F.element_at(F.col("ps"), i.cast("int")).alias("u"),
                        F.element_at(F.col("ps"), j.cast("int")).alias("v"),
                    ),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<struct<u:bigint,v:bigint>>"))
    edges = (
        parts.select(F.explode(pair_structs).alias("pr"))
        .select("pr.u", "pr.v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("sup"))
        .filter(F.col("sup") >= 2)
        .select("u", "v")
    )
    return triangle_stats(edges, "u", "v")


# ---------------------------------------------------------------------------
# Interval-overlap join: view sessions × error bursts
# ---------------------------------------------------------------------------

@_q(
    "session_error_overlap",
    """
    WITH views AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events WHERE event_type = 'view'
    ),
    vs AS (
      SELECT user_id, ts,
             SUM(CASE WHEN prev IS NULL
                      OR epoch_us(ts) - epoch_us(prev) > 1800000000
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM views
    ),
    sessions AS (
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM vs GROUP BY 1, 2
    ),
    errs AS (
      SELECT ts, event_id, lag(ts) OVER (ORDER BY ts, event_id) AS prev
      FROM events WHERE event_type = 'error'
    ),
    eb AS (
      SELECT ts,
             SUM(CASE WHEN prev IS NULL
                      OR epoch_us(ts) - epoch_us(prev) > 300000000
                 THEN 1 ELSE 0 END)
               OVER (ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS burst_id
      FROM errs
    ),
    bursts AS (
      SELECT CAST(burst_id AS BIGINT) AS burst_id,
             MIN(ts) AS b_start, MAX(ts) AS b_end
      FROM eb GROUP BY 1
    )
    SELECT s.user_id, s.session_id, s.s_start, s.s_end,
           b.burst_id, b.b_start, b.b_end
    FROM sessions s JOIN bursts b
      ON s.s_start <= b.b_end AND b.b_start <= s.s_end
    """,
    tags=("temporal-join", "interval-overlap", "sessionization"),
)
def session_error_overlap(spark, sf_dir):
    """Interval × interval overlap join — the third temporal-join
    shape (``interval_overlap_join``): per-user view sessions (30-min
    gap) overlapped with global error bursts (5-min gap), the
    "was this session exposed to an incident?" question. Each interval
    explodes to its covering hour buckets; candidates meet on a bucket
    EQUI-join (never a nested-loop theta join) and the exact closed
    overlap predicate filters. The oracle runs the textbook theta
    join."""
    from etl_rj_spark.operators.asof import interval_overlap_join
    from etl_rj_spark.operators.windows import global_sessionize, sessionize

    ev = _t(spark, sf_dir, "events")
    views = sessionize(
        ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id"),
        "user_id", "ts", 1800, tiebreak_col="event_id",
    )
    sessions = views.groupBy(
        "user_id", F.col("session_id").cast("bigint").alias("session_id")
    ).agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    # GLOBAL burst detection rides the two-phase range-bucket form
    # (r12 window-audit fix): the former constant-key sessionize put
    # every error event through one task; ids are identical (dense,
    # start-ordered — the oracle's running sum) at any partition count
    errs = global_sessionize(
        ev.filter(F.col("event_type") == "error").select("ts", "event_id"),
        "ts", 300, tiebreak_col="event_id",
    )
    bursts = errs.groupBy(
        F.col("session_id").cast("bigint").alias("burst_id")
    ).agg(F.min("ts").alias("b_start"), F.max("ts").alias("b_end"))
    return interval_overlap_join(
        sessions, bursts, "s_start", "s_end", "b_start", "b_end",
        bucket_seconds=3600,
    ).select(
        "user_id", "session_id", "s_start", "s_end",
        "burst_id", "b_start", "b_end",
    )


# ---------------------------------------------------------------------------
# Python DataSource surface: spark.read.format("xls")
# ---------------------------------------------------------------------------

@_q(
    "xls_datasource_roundtrip",
    """
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
           CAST(n_regionkey AS BIGINT) AS n_regionkey
    FROM nation
    -- keyed rows only: mirrors the engine fixture (r10 nullmix fix)
    WHERE n_nationkey IS NOT NULL
    """,
    tags=("S3", "datasource-api", "python-datasource"),
)
def xls_datasource_roundtrip(spark, sf_dir):
    """The PySpark-4 Python DataSource surface
    (`sources/xls_datasource.py`): nation split into TWO real BIFF8
    workbooks in a drop directory, read back through the STANDARD
    reader API — ``spark.read.format('xls').option('path', glob)`` —
    with one input partition per file (the planner lists metadata
    only; each task opens only its own workbook). Cells surface as
    strings + _file/_row_idx lineage; the typed casts here are the
    parse-kernel step every .xls ingest performs."""
    import os

    from etl_rj_spark.analytics.coverage_suite import _scratch
    from etl_rj_spark.sinks.xls_legacy import write_xls
    from etl_rj_spark.sources.xls_datasource import register_xls_source

    d = _scratch("xlsds")
    os.makedirs(d)
    # keyed rows only (see oracle) — r10 nullmix fix: int(None) crashed
    rows = sorted(
        (int(r.n_nationkey), r.n_name, int(r.n_regionkey))
        for r in _t(spark, sf_dir, "nation").collect()
        if r.n_nationkey is not None
    )
    header = ["n_nationkey", "n_name", "n_regionkey"]
    half = len(rows) // 2
    write_xls(os.path.join(d, "a.xls"), {"Hoja1": [header] + [list(r) for r in rows[:half]]})
    write_xls(os.path.join(d, "b.xls"), {"Hoja1": [header] + [list(r) for r in rows[half:]]})
    register_xls_source(spark)
    df = spark.read.format("xls").option("path", f"{d}/*.xls").load()
    return df.select(
        F.col("n_nationkey").cast("bigint"),
        "n_name",
        F.col("n_regionkey").cast("bigint"),
    )


# ---------------------------------------------------------------------------
# Kaplan–Meier survival curve
# ---------------------------------------------------------------------------

@_q(
    "km_view_to_purchase_survival",
    """
    WITH RECURSIVE bounds AS (SELECT MAX(ts) AS obs_end FROM events),
    fv AS (
      SELECT user_id, MIN(ts) AS first_view FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    fp AS (
      SELECT f.user_id, MIN(e.ts) AS first_purchase
      FROM fv f JOIN events e
        ON e.user_id = f.user_id AND e.event_type = 'purchase'
       AND e.ts >= f.first_view
      GROUP BY 1
    ),
    subj AS (
      SELECT f.user_id,
             CASE WHEN p.first_purchase IS NOT NULL
                  THEN CAST(date_diff('day', f.first_view, p.first_purchase) AS INT)
                  ELSE CAST(date_diff('day', f.first_view, b.obs_end) AS INT)
             END AS t,
             CASE WHEN p.first_purchase IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM fv f LEFT JOIN fp p USING (user_id) CROSS JOIN bounds b
    ),
    tab AS (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(1 - ev) AS BIGINT) AS c
      FROM subj GROUP BY 1
    ),
    risk AS (
      SELECT t, d, c,
             CAST((SELECT COUNT(*) FROM subj)
                  - COALESCE(SUM(d + c) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n
      FROM tab
    ),
    ord AS (SELECT *, row_number() OVER (ORDER BY t) AS i FROM risk),
    km AS (
      SELECT i, t, n, d, c,
             CAST((1000000 * (n - d)) // n AS BIGINT) AS s
      FROM ord WHERE i = 1
      UNION ALL
      SELECT o.i, o.t, o.n, o.d, o.c,
             CAST((km.s * (o.n - o.d)) // o.n AS BIGINT)
      FROM ord o JOIN km ON o.i = km.i + 1
    )
    SELECT t, n AS n_at_risk, d AS d_events, c AS n_censored,
           s AS survival_ppm
    FROM km
    """,
    bench=True,  # NEW bench row r9 (add, never replace): events-wide window + fold
    tags=("survival", "kaplan-meier", "stats-exact"),
)
def km_view_to_purchase_survival(spark, sf_dir):
    """Kaplan–Meier survival of time-to-purchase: per user, days from
    first view to first purchase (event) or to the observation end
    (right-censored), then the KM curve via ``kaplan_meier`` — the
    exact integer-ppm recurrence ``s ← (s·(n−d)) div n`` folded over
    the sorted duration vocabulary, which the oracle replays with a
    recursive CTE (a float Π(1−d/n) would drift with grouping). The
    churn/conversion-lifetime statistic with censoring done right."""
    from etl_rj_spark.operators.stats import kaplan_meier

    ev = _t(spark, sf_dir, "events")
    obs_end = ev.agg(F.max("ts").alias("__end"))
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fp = (
        fv.join(
            ev.filter(F.col("event_type") == "purchase")
            .select("user_id", F.col("ts").alias("__pts")),
            "user_id",
        )
        .filter(F.col("__pts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("__pts").alias("first_purchase"))
    )
    subj = (
        fv.join(fp, "user_id", "left")
        .join(F.broadcast(obs_end))
        .select(
            F.when(
                F.col("first_purchase").isNotNull(),
                F.datediff(F.col("first_purchase"), F.col("first_view")),
            )
            .otherwise(F.datediff(F.col("__end"), F.col("first_view")))
            .cast("int")
            .alias("t"),
            F.when(F.col("first_purchase").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    return kaplan_meier(subj, "t", "ev")


# ---------------------------------------------------------------------------
# Pairwise correlation matrix
# ---------------------------------------------------------------------------

def _corr_oracle() -> str:
    cols = ["qty", "cents", "disc_bp", "tax_bp"]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    arms = []
    for a, b in pairs:
        num = f"(n1 * sp_{a}_{b} - s_{a} * s_{b})"
        va = f"(n1 * ss_{a} - s_{a} * s_{a})"
        vb = f"(n1 * ss_{b} - s_{b} * s_{b})"
        arms.append(
            f"SELECT '{a}' AS m1, '{b}' AS m2, CAST(n1 AS BIGINT) AS n, "
            f"CASE WHEN {va} > 0 AND {vb} > 0 THEN "
            f"ROUND(CAST({num} AS DOUBLE) / SQRT(CAST({va} AS DOUBLE) * CAST({vb} AS DOUBLE)), 9) "
            f"END AS r_9dp FROM m"
        )
    sums = ", ".join(
        f"SUM({c}::HUGEINT) AS s_{c}, SUM({c}::HUGEINT * {c}) AS ss_{c}"
        for c in cols
    )
    sps = ", ".join(
        f"SUM({a}::HUGEINT * {b}) AS sp_{a}_{b}" for a, b in pairs
    )
    return f"""
    WITH v AS (
      SELECT CAST(l_quantity AS BIGINT) AS qty,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(ROUND(l_discount * 10000) AS BIGINT) AS disc_bp,
             CAST(ROUND(l_tax * 10000) AS BIGINT) AS tax_bp
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_discount IS NOT NULL AND l_tax IS NOT NULL
    ),
    m AS (SELECT COUNT(*)::HUGEINT AS n1, {sums}, {sps} FROM v)
    {" UNION ALL ".join(arms)}
    """


@_q(
    "correlation_matrix_lineitem",
    _corr_oracle(),
    tags=("stats-correlation", "exact-moments"),
)
def correlation_matrix_lineitem(spark, sf_dir):
    """Pairwise Pearson matrix over four lineitem measures (quantity,
    price cents, discount/tax basis points) via ``correlation_matrix``
    — every pairwise product is a scan-stage expression, all six
    moment sets reduce in ONE map-side aggregate, and each r is a
    single 9-dp IEEE expression on exact decimals (``corr()``'s float
    accumulation drifts with partitioning; this doesn't). The
    drift-screen for feature redundancy."""
    from etl_rj_spark.operators.stats import correlation_matrix

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("disc_bp"),
        F.round(F.col("l_tax") * 10000).cast("long").alias("tax_bp"),
    )
    return correlation_matrix(li, ["qty", "cents", "disc_bp", "tax_bp"])


# ---------------------------------------------------------------------------
# Exact-integer BM25 and positional phrase search
# ---------------------------------------------------------------------------

@_q(
    "bm25_search_topk",
    f"""
    -- rid: ROW-GRAIN corpus model (r11 dupstorm parity) — every input
    -- row is one document, so df/tf/dl key on the row, never on a
    -- possibly-duplicated doc_id (the old doc_id-keyed dl join fanned
    -- duplicated ids out and tripled their scores); value-identical on
    -- unique ids
    WITH base AS (SELECT row_number() OVER () AS rid, doc_id, text,
                         {_SQL_TOKS} AS tt
                  FROM documents),
    dl AS (
      SELECT rid, doc_id,
             CASE WHEN trim(text) = '' THEN 0 ELSE len(tt) END AS dl
      FROM base
    ),
    stats AS (
      SELECT COUNT(*)::BIGINT AS n,
             CAST(SUM(dl) // COUNT(*) AS BIGINT) AS avgdl
      FROM dl
    ),
    toks AS (
      SELECT b.rid, b.doc_id, t.term FROM base b, UNNEST(tt) AS t(term)
      WHERE t.term IN ('spark', 'window', 'hash')
    ),
    tf AS (SELECT rid, doc_id, term, COUNT(*)::BIGINT AS tf
           FROM toks GROUP BY 1, 2, 3),
    idf AS (
      SELECT term, (s.n * 1000000) // COUNT(DISTINCT rid) AS idf_ppm
      FROM tf CROSS JOIN stats s GROUP BY term, s.n
    ),
    scored AS (
      SELECT tf.rid, tf.doc_id,
             CAST(SUM((idf_ppm * tf.tf * 44 * s.avgdl)
                      // (20 * tf.tf * s.avgdl + 6 * s.avgdl + 18 * d.dl))
                  AS BIGINT) AS score
      FROM tf JOIN idf USING (term)
           JOIN dl d ON d.rid = tf.rid
           CROSS JOIN stats s
      GROUP BY tf.rid, tf.doc_id
    )
    SELECT doc_id, score, CAST(rank AS INT) AS rank FROM (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= 15
    """,
    bench=True,  # NEW bench row r9 (add, never replace): corpus-wide lexical scoring
    tags=("search", "bm25", "lexical"),
)
def bm25_search_topk(spark, sf_dir):
    """Okapi BM25 top-15 in the exact-integer form: k1 = 6/5 and
    b = 3/4 clear the textbook denominator to pure int64
    (``(idf·tf·44·avgdl) div (20·tf·avgdl + 6·avgdl + 18·dl)``), so
    the oracle replays saturation, length normalization, selection
    AND order bit-for-bit — float BM25 ties differ per libm. Same
    scan-stage isin explode / distributed-top-k shape as the TF·IDF
    scorer."""
    from etl_rj_spark.operators.search import bm25_search_topk as bm25

    d = _t(spark, sf_dir, "documents")
    return bm25(d, ("spark", "window", "hash"), "doc_id", "text", k=15)


@_q(
    "phrase_search_docs",
    f"""
    WITH base AS (SELECT doc_id, {_SQL_TOKS} AS tt FROM documents),
    pos AS (
      SELECT b.doc_id, b.tt[r.i] AS term, r.i AS p
      FROM base b, UNNEST(range(1, len(b.tt) + 1)) AS r(i)
      WHERE b.tt[r.i] IN ('sort', 'merge')
    ),
    s0 AS (SELECT doc_id, p AS start FROM pos WHERE term = 'sort'),
    s1 AS (SELECT doc_id, p - 1 AS start FROM pos WHERE term = 'merge')
    SELECT s0.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM s0 JOIN s1 USING (doc_id, start)
    GROUP BY s0.doc_id
    """,
    tags=("search", "phrase", "positional-index"),
)
def phrase_search_docs(spark, sf_dir):
    """Positional phrase search: documents containing the exact
    adjacent phrase "sort merge", with occurrence counts — the
    positional-index query bag-of-words scoring cannot answer. Only
    matching tokens explode (isin in the scan stage); adjacency is a
    (doc, position) equi-join, hash-partitionable at any corpus
    size."""
    from etl_rj_spark.operators.search import phrase_match_docs

    d = _t(spark, sf_dir, "documents")
    return phrase_match_docs(d, ("sort", "merge"), "doc_id", "text")


# ---------------------------------------------------------------------------
# Cohen's kappa: lang-id classifier vs labeled lang
# ---------------------------------------------------------------------------

def _kappa_oracle() -> str:
    from etl_rj_spark.analytics.llm_suite import _sql_stop_count

    pred = f"""CASE
             WHEN {_sql_stop_count('en')} > 0
                  AND {_sql_stop_count('en')} >= {_sql_stop_count('es')}
                  AND {_sql_stop_count('en')} >= {_sql_stop_count('fr')} THEN 'en'
             WHEN {_sql_stop_count('es')} > 0
                  AND {_sql_stop_count('es')} >= {_sql_stop_count('fr')} THEN 'es'
             WHEN {_sql_stop_count('fr')} > 0 THEN 'fr'
             ELSE 'unknown'
           END"""
    return f"""
    WITH both_ AS (SELECT lang AS a, {pred} AS b FROM documents),
    tot AS (
      SELECT COUNT(*)::HUGEINT AS n,
             SUM(CASE WHEN a = b THEN 1 ELSE 0 END)::HUGEINT AS agree
      FROM both_
    ),
    r AS (SELECT a AS k, COUNT(*)::HUGEINT AS r FROM both_ GROUP BY 1),
    c AS (SELECT b AS k, COUNT(*)::HUGEINT AS c FROM both_ GROUP BY 1),
    s AS (SELECT COALESCE(SUM(r.r * c.c), 0)::HUGEINT AS s
          FROM r JOIN c USING (k))
    SELECT CAST(n AS BIGINT) AS n, CAST(agree AS BIGINT) AS n_agree,
           CASE WHEN n * n - s <= 0 THEN NULL
                WHEN n * agree - s >= 0 THEN
                  CAST(((n * agree - s) * 1000000) // (n * n - s) AS BIGINT)
                ELSE
                  -CAST(((s - n * agree) * 1000000) // (n * n - s) AS BIGINT)
           END AS kappa_ppm
    FROM tot CROSS JOIN s
    """


@_q(
    "kappa_langid_agreement",
    _kappa_oracle(),
    tags=("eval", "cohens-kappa", "inter-rater"),
)
def kappa_langid_agreement(spark, sf_dir):
    """Cohen's kappa of the n-gram lang-id heuristic against the
    labeled ``lang`` column — chance-corrected classifier agreement
    via ``stats.cohens_kappa``'s exact rational identity
    ``κ = (n·agree − Σr·c)/(n² − Σr·c)`` in signed integer ppm (no
    float, no negative integer division). The eval-harness statistic
    accuracy alone overstates on skewed label sets."""
    from etl_rj_spark.operators.stats import cohens_kappa
    from etl_rj_spark.operators.text_analysis import lang_id

    d = _t(spark, sf_dir, "documents").select(
        "lang", lang_id("text").alias("lang_pred")
    )
    return cohens_kappa(d, "lang", "lang_pred")


# ---------------------------------------------------------------------------
# Jensen–Shannon corpus drift
# ---------------------------------------------------------------------------

@_q(
    "js_divergence_source_halves",
    f"""
    WITH toks AS (
      SELECT source, t.term FROM
        (SELECT source, {_SQL_TOKS} AS tt FROM documents),
        UNNEST(tt) AS t(term)
    ),
    l AS (SELECT term, COUNT(*)::BIGINT AS a FROM toks
          WHERE CAST(substr(source, 4) AS INT) < 10 GROUP BY 1),
    r AS (SELECT term, COUNT(*)::BIGINT AS b FROM toks
          WHERE CAST(substr(source, 4) AS INT) >= 10 GROUP BY 1),
    m AS (
      SELECT COALESCE(l.term, r.term) AS term,
             COALESCE(a, 0) AS a, COALESCE(b, 0) AS b
      FROM l FULL OUTER JOIN r USING (term)
    ),
    tot AS (SELECT SUM(a)::BIGINT AS ta, SUM(b)::BIGINT AS tb FROM m),
    term_ AS (
      SELECT CAST(ROUND((
               CASE WHEN a > 0 THEN (a / CAST(ta AS DOUBLE))
                 * (1 + log2(a / CAST(ta AS DOUBLE))
                      - log2(a / CAST(ta AS DOUBLE) + b / CAST(tb AS DOUBLE)))
               ELSE 0 END
             + CASE WHEN b > 0 THEN (b / CAST(tb AS DOUBLE))
                 * (1 + log2(b / CAST(tb AS DOUBLE))
                      - log2(a / CAST(ta AS DOUBLE) + b / CAST(tb AS DOUBLE)))
               ELSE 0 END) * 500000) AS BIGINT) AS j,
             ta, tb
      FROM m CROSS JOIN tot
    )
    SELECT COUNT(*)::BIGINT AS n_terms, CAST(MAX(ta) AS BIGINT) AS n_left,
           CAST(MAX(tb) AS BIGINT) AS n_right,
           CAST(SUM(j) AS BIGINT) AS js_ppm
    FROM term_
    """,
    tags=("drift", "js-divergence", "curation"),
)
def js_divergence_source_halves(spark, sf_dir):
    """Jensen–Shannon divergence (bits, ppm) between the token
    distributions of the two source halves (src0–9 vs src10–19) —
    the symmetric bounded corpus-drift metric a curation pipeline
    tracks between snapshots or between a new source and the corpus.
    Side-exclusive vocabulary contributes exactly as JS defines (no
    smoothing); per-term contributions round to int64 ppm before the
    exact cross-term sum (``text_analysis.js_divergence``)."""
    from etl_rj_spark.operators.text_analysis import (
        js_divergence,
        normalized_text,
        whitespace_tokens,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.substring("source", 4, 10).cast("int").alias("__s"),
        F.explode(whitespace_tokens(normalized_text("text"))).alias("term"),
    )
    l = d.filter(F.col("__s") < 10).groupBy("term").agg(
        F.count(F.lit(1)).alias("n")
    )
    r = d.filter(F.col("__s") >= 10).groupBy("term").agg(
        F.count(F.lit(1)).alias("n")
    )
    return js_divergence(l, r)


# ---------------------------------------------------------------------------
# Cumulative gains / lift table
# ---------------------------------------------------------------------------

@_q(
    "gains_table_activity_purchase",
    """
    WITH per_user AS (
      SELECT user_id, COUNT(*)::BIGINT AS score,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
      FROM events GROUP BY 1
    ),
    v AS (SELECT score, COUNT(*)::BIGINT AS c FROM per_user GROUP BY 1),
    cum AS (
      SELECT score,
             SUM(c) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS above
      FROM v
    ),
    n AS (SELECT COUNT(*)::BIGINT AS n, SUM(pos)::BIGINT AS p FROM per_user),
    binned AS (
      SELECT u.user_id, u.pos,
             CAST((cum.above * 10) // n.n AS INT) AS decile
      FROM per_user u JOIN cum USING (score) CROSS JOIN n
    ),
    bins AS (
      SELECT decile, COUNT(*)::BIGINT AS n_users, SUM(pos)::BIGINT AS n_pos
      FROM binned GROUP BY 1
    ),
    cb AS (
      SELECT decile, n_users, n_pos,
             SUM(n_pos) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
      FROM bins
    )
    -- zero purchasers overall leaves capture/lift undefined:
    -- NULL, never a divide-by-zero
    SELECT cb.decile, cb.n_users, cb.n_pos,
           CAST(CASE WHEN n.p = 0 THEN NULL
                ELSE (cb.cum_pos * 1000000) // n.p END AS BIGINT)
             AS capture_ppm,
           CAST(CASE WHEN n.p = 0 THEN NULL
                ELSE (cb.n_pos * n.n * 1000000) // (cb.n_users * n.p)
                END AS BIGINT)
             AS lift_ppm
    FROM cb CROSS JOIN n
    """,
    tags=("eval", "gains-lift", "value-grain"),
)
def gains_table_activity_purchase(spark, sf_dir):
    """Cumulative-gains / lift table: users ranked into activity
    DECILES (decile 0 = most active, equi-depth on the score
    VOCABULARY — ``(users_above·10) div n``, ties share a decile, no
    global row sort), per decile the purchase count, cumulative
    capture of all purchasers in ppm, and the lift over the base rate
    ``(pos_d·n·10⁶) div (n_d·pos)`` — the targeting-model report
    ("the top decile captures X% of buyers at Y× lift"). All exact
    integer; the cumulative runs over ten rows."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("score"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("pos"),
    )
    v = per_user.groupBy("score").agg(F.count(F.lit(1)).alias("__c"))
    wd = W.orderBy(F.desc("score")).rowsBetween(W.unboundedPreceding, 0)
    cum = v.select(
        "score", (F.sum("__c").over(wd) - F.col("__c")).alias("__above")
    )
    n = per_user.agg(
        F.count(F.lit(1)).alias("__n"), F.sum("pos").alias("__p")
    )
    binned = (
        per_user.join(F.broadcast(cum), "score")
        .join(F.broadcast(n))
        .select(
            "pos", F.expr("cast((__above * 10) div __n as int)").alias("decile"),
            "__n", "__p",
        )
    )
    bins = binned.groupBy("decile", "__n", "__p").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    return bins.select(
        "decile", "n_users", "n_pos",
        F.sum("n_pos").over(wc).alias("__cum_pos"),
        "__n", "__p",
    ).select(
        "decile", "n_users", "n_pos",
        # zero purchasers overall leaves capture/lift undefined:
        # NULL, never an ANSI divide-by-zero
        F.expr(
            "cast(case when __p = 0 then null else"
            " (__cum_pos * 1000000) div __p end as bigint)"
        ).alias("capture_ppm"),
        F.expr(
            "cast(case when __p = 0 then null else"
            " (cast(n_pos as decimal(38,0)) * __n * 1000000)"
            " div (cast(n_users as decimal(38,0)) * __p) end as bigint)"
        ).alias("lift_ppm"),
    )


# ---------------------------------------------------------------------------
# Autocorrelation function of daily revenue
# ---------------------------------------------------------------------------

@_q(
    "acf_daily_revenue",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS c
      FROM orders GROUP BY 1
    ),
    lags AS (SELECT CAST(unnest(range(1, 15)) AS INT) AS lag),
    pairs AS (
      SELECT l.lag, a.c AS x, b.c AS y
      FROM lags l JOIN daily a ON TRUE JOIN daily b ON b.d = a.d + l.lag
    ),
    m AS (
      SELECT lag, COUNT(*)::HUGEINT AS n,
             SUM(x::HUGEINT) AS sx, SUM(y::HUGEINT) AS sy,
             SUM(x::HUGEINT * x) AS sxx, SUM(y::HUGEINT * y) AS syy,
             SUM(x::HUGEINT * y) AS sxy
      FROM pairs GROUP BY 1
    )
    SELECT lag, CAST(n AS BIGINT) AS n,
           CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0 THEN
             ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
                   / SQRT(CAST(n*sxx - sx*sx AS DOUBLE)
                          * CAST(n*syy - sy*sy AS DOUBLE)), 9)
           END AS r_9dp
    FROM m
    """,
    tags=("timeseries", "acf", "exact-moments"),
)
def acf_daily_revenue(spark, sf_dir):
    """Autocorrelation function of daily revenue at lags 1–14: per
    lag, the exact-moment Pearson r between the series and its
    k-day-shifted self (one 9-dp IEEE division on decimal sums — the
    same determinism contract as ``correlation_matrix``). Weekly
    cycles surface as the lag-7/14 peaks. The lag fan-out and the
    self-join run on the DAY grain (bounded period series); pairs use
    only dates where both ends exist (the unpadded ACF convention)."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c"))
    )
    a = daily.select(
        F.explode(F.sequence(F.lit(1), F.lit(14))).alias("lag"),
        F.col("d"), F.col("c").alias("x"),
    )
    b = daily.select(F.col("d").alias("__d2"), F.col("c").alias("y"))
    pairs = a.join(
        b, F.col("__d2") == F.expr("date_add(d, lag)")
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("x")).alias("__sx"), F.sum(dec("y")).alias("__sy"),
        F.sum(dec("x") * F.col("x")).alias("__sxx"),
        F.sum(dec("y") * F.col("y")).alias("__syy"),
        F.sum(dec("x") * F.col("y")).alias("__sxy"),
    )
    return m.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            "case when (n*__sxx - __sx*__sx) > 0 and (n*__syy - __sy*__sy) > 0 then"
            " round(cast(n*__sxy - __sx*__sy as double)"
            " / sqrt(cast(n*__sxx - __sx*__sx as double)"
            "        * cast(n*__syy - __sy*__sy as double)), 9) end"
        ).alias("r_9dp"),
    )


# ---------------------------------------------------------------------------
# Population Stability Index (PSI) feature drift
# ---------------------------------------------------------------------------

@_q(
    "psi_price_drift",
    """
    WITH tagged AS (
      SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS v,
             CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 0 ELSE 1 END
               AS half
      FROM orders
      -- a NULL value is in NEITHER population: it cannot bin (r10
      -- nullmix parity; mirrors the engine filter)
      WHERE o_totalprice IS NOT NULL
    ),
    ref AS (SELECT v FROM tagged WHERE half = 0),
    rv AS (SELECT v, COUNT(*)::BIGINT AS c FROM ref GROUP BY 1),
    rcum AS (
      SELECT v, SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS before
      FROM rv
    ),
    rn AS (SELECT COUNT(*)::BIGINT AS n FROM ref),
    binmap AS (
      SELECT rcum.v, CAST((rcum.before * 10) // rn.n AS INT) AS bin
      FROM rcum CROSS JOIN rn
    ),
    edges AS (SELECT bin, MIN(v) AS lo FROM binmap GROUP BY 1),
    assigned AS (
      SELECT t.half,
             (SELECT MAX(e.bin) FROM edges e WHERE e.lo <= t.v) AS bin
      FROM tagged t
    ),
    counts AS (
      SELECT COALESCE(bin, 0) AS bin,
             SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS p_n,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS q_n
      FROM assigned GROUP BY 1
    ),
    tot AS (SELECT SUM(p_n)::BIGINT AS tp, SUM(q_n)::BIGINT AS tq FROM counts)
    SELECT c.bin, c.p_n, c.q_n,
           CAST(ROUND((GREATEST(c.q_n, 1) / CAST(t.tq AS DOUBLE)
                       - GREATEST(c.p_n, 1) / CAST(t.tp AS DOUBLE))
                      * (ln(GREATEST(c.q_n, 1) / CAST(t.tq AS DOUBLE))
                         - ln(GREATEST(c.p_n, 1) / CAST(t.tp AS DOUBLE)))
                      * 1000000) AS BIGINT) AS psi_term_ppm
    FROM counts c CROSS JOIN tot t
    """,
    tags=("drift", "psi", "value-grain"),
)
def psi_price_drift(spark, sf_dir):
    """Population Stability Index of order value, pre-1998 (reference)
    vs 1998+ (current): reference DECILE edges from the value
    vocabulary (equi-depth, no global row sort), both populations
    binned by the same edges, per-bin PSI term
    ``(q−p)·ln(q/p)`` with the industry floor-at-one-count convention
    for empty bins, rounded to int64 ppm per bin (sum the column for
    the headline PSI; >0.2 conventionally = major shift). The binning
    is a broadcast range lookup; everything else is a 10-row frame."""
    # complete-case: NULL values bin nowhere (see oracle, r10)
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice").isNotNull())
    tagged = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        F.when(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), 0)
        .otherwise(1).alias("half"),
    )
    ref = tagged.filter(F.col("half") == 0)
    rv = ref.groupBy("v").agg(F.count(F.lit(1)).alias("__c"))
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    rcum = rv.select("v", (F.sum("__c").over(wv) - F.col("__c")).alias("__before"))
    rn = ref.agg(F.count(F.lit(1)).alias("__n"))
    binmap = rcum.join(F.broadcast(rn)).select(
        "v", F.expr("cast((__before * 10) div __n as int)").alias("bin")
    )
    edges = binmap.groupBy("bin").agg(F.min("v").alias("__lo"))
    # per-DISTINCT-value bin via range lookup against the 10 edges
    # (highest edge at-or-below v; below the lowest edge → bin 0), then
    # one broadcast of the value→bin map back onto the rows — current
    # values the reference never saw still bin correctly
    val_bins = (
        tagged.select("v").distinct()
        .join(F.broadcast(edges), F.col("__lo") <= F.col("v"), "left")
        .groupBy("v")
        .agg(F.coalesce(F.max("bin"), F.lit(0)).alias("bin"))
    )
    binned = tagged.join(F.broadcast(val_bins), "v")
    cnt = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("bigint").alias("p_n"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("bigint").alias("q_n"),
    )
    tot = cnt.agg(
        F.sum("p_n").alias("__tp"), F.sum("q_n").alias("__tq")
    )
    # try_divide: an EMPTY population half (its total 0) has no
    # distribution to compare — every PSI term goes NULL, exactly as
    # the oracle's x/0 → NULL propagates (r10 degenerate-input sweep
    # fix; a bare `/` hard-errors under ANSI)
    qr = F.try_divide(F.greatest(F.col("q_n"), F.lit(1)), F.col("__tq"))
    pr = F.try_divide(F.greatest(F.col("p_n"), F.lit(1)), F.col("__tp"))
    return cnt.join(F.broadcast(tot)).select(
        "bin", "p_n", "q_n",
        F.round(
            (qr - pr) * (F.log(qr) - F.log(pr)) * 1e6
        ).cast("long").alias("psi_term_ppm"),
    )


# ---------------------------------------------------------------------------
# Log2 value histogram, Zipf slope, Fano burstiness
# ---------------------------------------------------------------------------

@_q(
    "log2_histogram_order_values",
    """
    WITH v AS (SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS c FROM orders
               WHERE o_totalprice > 0)
    SELECT CAST(length(bin(c)) - 1 AS INT) AS bucket,
           COUNT(*)::BIGINT AS n,
           CAST(MIN(c) AS BIGINT) AS min_cents,
           CAST(MAX(c) AS BIGINT) AS max_cents
    FROM v GROUP BY 1
    """,
    tags=("histogram", "log2-buckets", "ops-report"),
)
def log2_histogram_order_values(spark, sf_dir):
    """HDR-style log₂ value histogram of order cents: bucket k holds
    2^k ≤ v < 2^(k+1), computed EXACTLY as ``length(bin(v)) − 1`` —
    the binary-digit-count trick that sidesteps floor(log2(v))'s
    float boundary flips at exact powers of two (both engines print
    identical binary strings). The latency/value-histogram shape every
    ops dashboard wants: one scan-stage expression into a ≤63-bucket
    aggregate."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    c = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.select(c.alias("c"))
        .groupBy((F.length(F.bin("c")) - 1).cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
        )
    )


@_q(
    "zipf_slope_tokens",
    f"""
    WITH toks AS (
      SELECT t.term FROM (SELECT {_SQL_TOKS} AS tt FROM documents),
      UNNEST(tt) AS t(term)
    ),
    freq AS (SELECT term, COUNT(*)::BIGINT AS n FROM toks GROUP BY 1),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, term) AS r FROM freq
    ),
    pts AS (
      SELECT CAST(ROUND(ln(r) * 1000000) AS BIGINT) AS x,
             CAST(ROUND(ln(n) * 1000000) AS BIGINT) AS y
      FROM ranked
    ),
    m AS (
      SELECT COUNT(*)::HUGEINT AS nn, SUM(x::HUGEINT) AS sx,
             SUM(y::HUGEINT) AS sy, SUM(x::HUGEINT*y) AS sxy,
             SUM(x::HUGEINT*x) AS sxx
      FROM pts
    )
    SELECT CAST(nn AS BIGINT) AS n_points,
           CAST(ROUND(CAST(nn*sxy - sx*sy AS DOUBLE)
                      / CAST(nn*sxx - sx*sx AS DOUBLE) * 1000000) AS BIGINT)
             AS slope_ppm,
           CAST(ROUND((CAST(sy AS DOUBLE)
                       - CAST(nn*sxy - sx*sy AS DOUBLE)
                         / CAST(nn*sxx - sx*sx AS DOUBLE)
                         * CAST(sx AS DOUBLE)) / CAST(nn AS DOUBLE) * 1000000)
                AS BIGINT) AS intercept_ppm
    FROM m WHERE nn*sxx - sx*sx <> 0
    """,
    tags=("zipf", "corpus-diagnostic", "ols"),
)
def zipf_slope_tokens(spark, sf_dir):
    """Zipf fit of the token frequency distribution: OLS slope of
    log-frequency on log-rank (a healthy natural-language corpus
    slopes ≈ −1; word-salad or deduplication damage shows as a flat
    or broken slope). Each (ln rank, ln freq) point rounds to int64
    micro-units BEFORE the moment sums, so the regression is
    exact-integer and aggregation-order-proof (`ols_slope_by_group`
    machinery on one constant group). The rank comes from the
    two-phase range-bucketed ``global_rank_cumsum`` (VERDICT r8 #2):
    a 100 TB web corpus has 10⁸–10⁹ distinct whitespace tokens, the
    one "vocabulary" grain NOT bounded enough for an unpartitioned
    ``row_number`` window — no WindowExec without a partition key
    touches this plan (pinned in tests/test_plans.py)."""
    from etl_rj_spark.operators.stats import ols_slope_by_group
    from etl_rj_spark.operators.text_analysis import (
        normalized_text,
        whitespace_tokens,
    )
    from etl_rj_spark.operators.windows import global_rank_cumsum

    d = _t(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(whitespace_tokens(normalized_text("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked = global_rank_cumsum(freq, "n", ["term"], rank_col="__r", cum_col="__cum")
    pts = ranked.select(
        F.lit(1).alias("__g"),
        F.round(F.log(F.col("__r").cast("double")) * 1e6)
        .cast("long").alias("x"),
        F.round(F.log(F.col("n").cast("double")) * 1e6).cast("long").alias("y"),
    )
    return ols_slope_by_group(pts, "__g", "x", "y").select(
        "n_points", "slope_ppm", "intercept_ppm"
    )


@_q(
    "fano_factor_users",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*)::BIGINT AS x
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, COUNT(*)::BIGINT AS n_days,
           CAST(SUM(x) AS BIGINT) AS n_events,
           CAST((COUNT(*)::HUGEINT * SUM(x::HUGEINT * x)
                 - SUM(x::HUGEINT) * SUM(x)) * 1000000
                // (COUNT(*)::HUGEINT * SUM(x)) AS BIGINT) AS fano_ppm
    FROM daily GROUP BY 1
    """,
    tags=("burstiness", "fano", "bot-screen"),
)
def fano_factor_users(spark, sf_dir):
    """Fano factor (variance-to-mean, ppm) of each user's active-day
    event counts — the burstiness screen: Poisson-like humans sit
    near 10⁶, schedulers near 0, bursty bots far above. Exact
    rational: ``(n·Σx² − (Σx)²)·10⁶ div (n·Σx)`` — no float at all
    (population variance over mean clears its divisions). Day-grain
    after one aggregate; single-active-day users report 0."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("x")
    )
    xd = F.col("x").cast("decimal(38,0)")
    return daily.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").cast("bigint").alias("n_events"),
        F.expr(
            "cast((count(1) * sum(cast(x as decimal(38,0)) * x)"
            " - sum(cast(x as decimal(38,0))) * sum(x)) * 1000000"
            " div (count(1) * sum(cast(x as decimal(38,0)))) as bigint)"
        ).alias("fano_ppm"),
    )


# ---------------------------------------------------------------------------
# Sequence-pattern matching over session paths
# ---------------------------------------------------------------------------

@_q(
    "path_regex_sessions",
    """
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
      FROM o
    ), p AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM s GROUP BY 1, 2
    )
    SELECT COUNT(*)::BIGINT AS n_sessions,
           CAST(SUM(CASE WHEN regexp_matches(path, 'view(>click)*>purchase')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
           CAST((SUM(CASE WHEN regexp_matches(path, 'view(>click)*>purchase')
                     THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT)
             AS match_ppm
    FROM p
    """,
    tags=("sequence-pattern", "path-analysis", "match-recognize"),
)
def path_regex_sessions(spark, sf_dir):
    """Sequence-pattern query (the MATCH_RECOGNIZE shape): sessions
    whose event path matches ``view(>click)*>purchase`` — a view
    leading to a purchase through clicks only. Sessions reduce to
    their ordered path STRING once (deterministic sorted-struct
    build), then the pattern is one scan-stage regex over session
    grain — arbitrarily complex step patterns without a new join per
    step (compare the funnel's min-ts cascade). The regex subset used
    is identical in Java and RE2."""
    from etl_rj_spark.operators.windows import sessionize

    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    s = sessionize(e, "user_id", "ts", 1800, tiebreak_col="event_id")
    paths = s.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    hit = F.when(F.col("path").rlike("view(>click)*>purchase"), 1).otherwise(0)
    return paths.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(hit).cast("bigint").alias("n_matched"),
        F.expr(
            "cast((sum(case when path rlike 'view(>click)*>purchase' then 1"
            " else 0 end) * 1000000) div count(1) as bigint)"
        ).alias("match_ppm"),
    )


# ---------------------------------------------------------------------------
# Batch model inference: linear quality classifier over embeddings
# ---------------------------------------------------------------------------

#: Deterministic demo coefficients for the 64-dim embedding space —
#: the engine-side literal IS the deployed model artifact (a real
#: pipeline broadcasts its trained weights the same way).
_QC_W = [((i * 37) % 21 - 10) / 100.0 for i in range(64)]
_QC_BIAS = -0.05


@_q(
    "quality_classifier_inference",
    f"""
    WITH w AS (SELECT [{", ".join(str(x) for x in _QC_W)}]::DOUBLE[] AS wv),
    scored AS (
      SELECT e.vec_id,
             ROUND(1.0 / (1.0 + exp(-(
               list_sum(list_transform(range(1, 65),
                        i -> e.embedding[i]::DOUBLE * w.wv[i]))
               + ({_QC_BIAS}) ))), 9) AS score_9dp
      FROM embeddings e CROSS JOIN w
    )
    SELECT vec_id, score_9dp,
           CAST(CASE WHEN score_9dp >= 0.5 THEN 1 ELSE 0 END AS INT) AS keep
    FROM scored
    """,
    tags=("inference", "batch-scoring", "quality-model"),
)
def quality_classifier_inference(spark, sf_dir):
    """Batch model inference as a relational scan: a linear quality
    classifier (literal 64-dim weights + bias — the broadcast model
    artifact) scored over every embedding with
    ``sigmoid(w·x + b)`` rounded to 9 dp, plus the keep decision at
    0.5 — the quality-filter inference step every curation pipeline
    runs before sampling. The dot product is a zip_with/aggregate
    fold inside whole-stage codegen (left-to-right, same order as the
    oracle's list_sum) — no UDF, no Python, 100 TB is just a longer
    scan."""
    e = _t(spark, sf_dir, "embeddings")
    wlit = F.array(*[F.lit(x) for x in _QC_W])
    z = (
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                wlit,
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        + F.lit(_QC_BIAS)
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9)
    return e.select(
        "vec_id",
        score.alias("score_9dp"),
        F.when(score >= 0.5, 1).otherwise(0).cast("int").alias("keep"),
    )


# ---------------------------------------------------------------------------
# Holt level+trend smoothing of daily revenue
# ---------------------------------------------------------------------------

@_q(
    "holt_trend_daily_revenue",
    """
    WITH RECURSIVE daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS c
      FROM orders
      -- a time series has no NULL period: rows with no order date
      -- cannot sit on the smoothing axis (r10 nullmix parity)
      WHERE o_orderdate IS NOT NULL
      GROUP BY 1
    ),
    ord AS (SELECT *, row_number() OVER (ORDER BY d) AS i FROM daily),
    holt AS (
      SELECT i, d, c, c AS l, CAST(0 AS BIGINT) AS b FROM ord WHERE i = 1
      UNION ALL
      SELECT o.i, o.d, o.c,
             (o.c + h.l + h.b) >> 1,
             (h.b + ((o.c + h.l + h.b) >> 1) - h.l) >> 1
      FROM ord o JOIN holt h ON o.i = h.i + 1
    )
    SELECT d, c AS cents, CAST(l AS BIGINT) AS level,
           CAST(b AS BIGINT) AS trend, CAST(l + b AS BIGINT) AS forecast_next
    FROM holt
    """,
    tags=("timeseries", "holt", "forecast", "exact-recurrence"),
)
def holt_trend_daily_revenue(spark, sf_dir):
    """Holt level+trend smoothing of daily revenue (α = β = ½ dyadic)
    via ``stats.holt_linear_smooth`` — the exact-integer recurrence
    folded over the sorted day vocabulary (arithmetic shift = floor
    halving, identical on negatives in both engines), which the
    oracle replays with a recursive CTE. Pairs with
    ``forecast_eval_naive7``: this is the forecast METHOD, that is
    the scorecard."""
    from etl_rj_spark.operators.stats import holt_linear_smooth

    # complete-case: a time series has no NULL period (see oracle, r10)
    daily = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate").isNotNull())
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    return holt_linear_smooth(daily, "d", "cents")


# ---------------------------------------------------------------------------
# k-anonymity privacy audit
# ---------------------------------------------------------------------------

@_q(
    "k_anonymity_audit",
    """
    WITH combos AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*)::BIGINT AS grp_size
      FROM customer GROUP BY 1, 2
    ),
    n AS (SELECT COUNT(*)::BIGINT AS n FROM customer)
    SELECT CAST(5 AS INT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_combos,
           CAST(SUM(CASE WHEN grp_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_combos,
           CAST(SUM(CASE WHEN grp_size < 5 THEN grp_size ELSE 0 END) AS BIGINT)
             AS n_risk_rows,
           CAST((SUM(CASE WHEN grp_size < 5 THEN grp_size ELSE 0 END) * 1000000)
                // MAX(n.n) AS BIGINT) AS risk_ppm,
           CAST(MIN(grp_size) AS BIGINT) AS k_actual
    FROM combos CROSS JOIN n
    """,
    tags=("privacy", "k-anonymity", "audit"),
)
def k_anonymity_audit(spark, sf_dir):
    """k-anonymity audit of the (nation, market-segment)
    quasi-identifier: how many identifier combinations have fewer
    than k=5 members, how many ROWS sit in those re-identifiable
    groups (ppm of the table), and the actual k the table achieves
    (its smallest group) — the release-gate check before sharing a
    'de-identified' extract. One vocabulary-grain aggregate."""
    c = _t(spark, sf_dir, "customer")
    combos = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("grp_size")
    )
    n = c.agg(F.count(F.lit(1)).alias("__n"))
    return combos.join(F.broadcast(n)).agg(
        F.lit(5).cast("int").alias("k"),
        F.count(F.lit(1)).alias("n_combos"),
        F.sum(F.when(F.col("grp_size") < 5, 1).otherwise(0))
        .cast("bigint").alias("n_small_combos"),
        F.sum(F.when(F.col("grp_size") < 5, F.col("grp_size")).otherwise(0))
        .cast("bigint").alias("n_risk_rows"),
        F.expr(
            "cast((sum(case when grp_size < 5 then grp_size else 0 end)"
            " * 1000000) div max(__n) as bigint)"
        ).alias("risk_ppm"),
        F.min("grp_size").cast("bigint").alias("k_actual"),
    )


# ---------------------------------------------------------------------------
# ABC classification + Bayesian-average shrinkage
# ---------------------------------------------------------------------------

@_q(
    "abc_classification_parts",
    """
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT l_partkey, cents,
             SUM(cents::HUGEINT) OVER (ORDER BY cents DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM rev
    ),
    tot AS (SELECT SUM(cents::HUGEINT) AS t FROM rev),
    labeled AS (
      SELECT l_partkey, cents,
             CASE WHEN ((cum - cents) * 1000000) // t < 800000 THEN 'A'
                  WHEN ((cum - cents) * 1000000) // t < 950000 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked CROSS JOIN tot
    )
    SELECT abc, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM labeled GROUP BY abc
    """,
    tags=("abc-classification", "concentration", "two-phase-rank"),
)
def abc_classification_parts(spark, sf_dir):
    """ABC inventory classification of parts by revenue: every part
    labeled A/B/C by whether the cumulative revenue share BEFORE it
    crosses 80% / 95% (the class of the part that crosses a line
    includes it — same convention as the Pareto report), rolled up to
    class totals. The running sum comes from ``global_rank_cumsum``
    (range-bucketed two phase) — at 100 TB the part table is ~10⁸
    rows and a single-window cumsum is the scale-killer; the
    class-label comparison is exact integer ppm."""
    from etl_rj_spark.operators.windows import global_rank_cumsum

    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents")
    )
    tot = rev.agg(F.sum(F.col("cents").cast("decimal(38,0)")).alias("__t"))
    ranked = global_rank_cumsum(
        rev, "cents", ["l_partkey"], rank_col="__rnk", cum_col="__cum"
    )
    labeled = ranked.join(F.broadcast(tot)).select(
        "cents",
        F.expr(
            "case when ((__cum - cents) * 1000000) div __t < 800000 then 'A'"
            " when ((__cum - cents) * 1000000) div __t < 950000 then 'B'"
            " else 'C' end"
        ).alias("abc"),
    )
    return labeled.groupBy("abc").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    )


@_q(
    "bayes_avg_part_quantity",
    """
    WITH per_part AS (
      SELECT l_partkey, COUNT(*)::BIGINT AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s
      FROM lineitem GROUP BY 1
    ),
    g AS (SELECT SUM(s)::HUGEINT AS gs, SUM(n)::HUGEINT AS gn FROM per_part),
    prior AS (SELECT CAST((gs * 1000000) // gn AS BIGINT) AS m_ppm FROM g)
    SELECT p.l_partkey, p.n, p.s,
           CAST((20 * pr.m_ppm + p.s * 1000000) // (20 + p.n) AS BIGINT)
             AS bayes_avg_ppm
    FROM per_part p CROSS JOIN prior pr
    """,
    tags=("bayes-average", "shrinkage", "ranking"),
)
def bayes_avg_part_quantity(spark, sf_dir):
    """Bayesian-average (shrinkage) score per part: the per-part mean
    quantity pulled toward the global mean with prior strength C=20
    — ``(C·m + Σx)·10⁶ div (C + n)`` in exact integer ppm — the
    cold-start fix that stops a part with 2 observations outranking
    one with 2,000 (the IMDb-style weighted rating). One part-grain
    aggregate + a 1-row broadcast prior."""
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("long")).cast("bigint").alias("s"),
    )
    prior = per_part.agg(
        F.expr(
            "cast((sum(cast(s as decimal(38,0))) * 1000000)"
            " div sum(cast(n as decimal(38,0))) as bigint)"
        ).alias("__m_ppm")
    )
    return per_part.join(F.broadcast(prior)).select(
        "l_partkey", "n", "s",
        F.expr(
            "cast((20 * cast(__m_ppm as decimal(38,0)) + cast(s as decimal(38,0))"
            " * 1000000) div (20 + n) as bigint)"
        ).alias("bayes_avg_ppm"),
    )


# ---------------------------------------------------------------------------
# Date-spine gap filling
# ---------------------------------------------------------------------------

@_q(
    "date_spine_fill_gaps",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    )
    SELECT s.d, COALESCE(dd.cents, 0) AS cents,
           CAST(CASE WHEN dd.d IS NULL THEN 1 ELSE 0 END AS INT) AS was_gap
    FROM spine s LEFT JOIN daily dd USING (d)
    """,
    tags=("timeseries", "date-spine", "gap-fill"),
)
def date_spine_fill_gaps(spark, sf_dir):
    """Date-spine gap filling: the dense calendar from min to max
    order date (``sequence`` explode — never a driver loop) left-
    joined onto daily revenue, zero-filled and gap-flagged — the
    prerequisite for any window/EWMA/ACF computation that assumes a
    dense series (a LAG over a sparse series silently compares
    non-adjacent days). Spine size is the date RANGE (period grain);
    the join broadcasts the daily aggregate side at dim scale or
    hash-joins at fact scale."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    bounds = daily.agg(F.min("d").alias("__lo"), F.max("d").alias("__hi"))
    spine = bounds.select(
        F.explode(F.sequence("__lo", "__hi")).alias("d")
    )
    return spine.join(daily.withColumn("__hit", F.lit(1)), "d", "left").select(
        "d",
        F.coalesce("cents", F.lit(0)).cast("bigint").alias("cents"),
        F.when(F.col("__hit").isNull(), 1).otherwise(0).cast("int").alias("was_gap"),
    )


# ---------------------------------------------------------------------------
# Bootstrap distribution of the median
# ---------------------------------------------------------------------------

@_q(
    "bootstrap_median_revenue",
    """
    WITH v AS (
      SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents
      FROM orders
      -- the bootstrap resamples OBSERVED values only — mirrors the
      -- engine fold's isNotNull drop (r10 nullmix parity)
      WHERE o_totalprice IS NOT NULL
    ),
    fan AS (
      SELECT o_orderkey, cents, CAST(unnest(range(0, 8)) AS INT) AS replicate
      FROM v
    ),
    weighted AS (
      SELECT replicate, cents,
             CASE
               WHEN h < 1656781714176974 THEN 0
               WHEN h < 3313563428353948 THEN 1
               WHEN h < 4141954285442435 THEN 2
               WHEN h < 4418084571138597 THEN 3
               WHEN h < 4487117142562638 THEN 4
               ELSE 5
             END AS w
      FROM (
        SELECT replicate, cents,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
                                   || CAST(replicate AS VARCHAR)), 1, 13))::BIGINT
                 AS h
        FROM fan
      )
    ),
    grain AS (
      SELECT replicate, cents, SUM(w)::BIGINT AS wsum
      FROM weighted GROUP BY 1, 2 HAVING SUM(w) > 0
    ),
    cum AS (
      SELECT replicate, cents,
             SUM(wsum) OVER (PARTITION BY replicate ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
             SUM(wsum) OVER (PARTITION BY replicate) AS n
      FROM grain
    )
    SELECT replicate, CAST(MAX(n) AS BIGINT) AS n_eff,
           CAST(MIN(CASE WHEN hi >= (n + 1) // 2 THEN cents END) AS BIGINT)
             AS median_cents
    FROM cum GROUP BY replicate
    """,
    bench=True,  # NEW bench row r9 (add, never replace): 12M-row map-side fan-out
    tags=("bootstrap", "median", "value-grain"),
)
def bootstrap_median_revenue(spark, sf_dir):
    """Bootstrap distribution of the MEDIAN order value: 8 Poisson(1)
    replicates drawn map-side (the same md5 inverse-CDF weights as
    ``poisson_bootstrap_revenue``), each replicate's weighted LOWER
    median computed on the VALUE grain — a per-replicate cumulative
    over distinct values, never a per-replicate row sort. The spread
    of the 8 medians is the nonparametric CI the mean-bootstrap
    cannot give for a skewed measure. One fan-out scan + one
    (replicate, value) aggregate + a replicate-partitioned vocabulary
    window."""
    from etl_rj_spark.operators.stats import poisson_h52_expr, poisson_weight_from_h52

    # the bootstrap resamples OBSERVED values only (the
    # poisson_bootstrap_means contract; see oracle, r10 nullmix parity)
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice").isNotNull())
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    fan = o.select(
        "o_orderkey", "cents",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("replicate"),
    )
    # draw hash materialized as its own column before the weight CASE
    # (r15, guide §1.2): inline, the md5→hex→conv chain re-evaluates per
    # CASE branch (conditional evaluation defeats codegen subexpression
    # elimination) — the draw stage alone measured 3.69 s vs 1.29 s.
    # Draw values (and the oracle's bit-for-bit md5 replay) unchanged.
    weighted = fan.withColumn(
        "__h52", poisson_h52_expr("o_orderkey", "replicate")
    ).withColumn("w", poisson_weight_from_h52(F.col("__h52")))
    # (r15 note: a w > 0 pre-shuffle filter would drop the e⁻¹ ≈ 37 %
    # zero-weight rows, but predicate pushdown substitutes the md5
    # chain into the pushed filter below the __h52 projection — the
    # hash then evaluates TWICE per row, which costs more than the
    # saved shuffle bytes. Measured and reverted; the wsum > 0 filter
    # below keeps the identical grain table.)
    # single-long composite grain key (r16, guide §2.3 narrower keys —
    # VERDICT r15 #5): the 12M-row fan-out shuffles ONE int64
    # (cents<<3 | replicate) instead of the (int, long) pair — fewer
    # key bytes and one hash per row instead of two — and the grain
    # decodes exactly afterwards (replicate = low 3 bits, cents =
    # arithmetic shiftright, lossless for |cents| < 2⁶⁰; bit ops, not
    # mul/div, so a negative cents would still round-trip). Identical
    # (replicate, cents, wsum) table.
    grain = (
        weighted.groupBy(
            (F.shiftleft(F.col("cents"), 3) + F.col("replicate")).alias("__k")
        )
        .agg(F.sum("w").alias("wsum"))
        .filter(F.col("wsum") > 0)
        .select(
            F.col("__k").bitwiseAND(F.lit(7)).cast("int").alias("replicate"),
            F.shiftright(F.col("__k"), 3).alias("cents"),
            "wsum",
        )
    )
    wc = (
        Window.partitionBy("replicate")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grain.select(
        "replicate", "cents",
        F.sum("wsum").over(wc).alias("hi"),
        F.sum("wsum").over(Window.partitionBy("replicate")).alias("n"),
    )
    return cum.groupBy("replicate").agg(
        F.max("n").cast("bigint").alias("n_eff"),
        F.min(F.when(F.expr("hi >= (n + 1) div 2"), F.col("cents")))
        .cast("bigint").alias("median_cents"),
    )


# ---------------------------------------------------------------------------
# Transition latency matrix + hierarchical share report
# ---------------------------------------------------------------------------

@_q(
    "transition_latency_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER w AS prev_state,
             lag(ts) OVER w AS prev_ts
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT prev_state, event_type AS state, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(epoch_us(ts) - epoch_us(prev_ts)) // COUNT(*) AS BIGINT)
             AS mean_gap_us,
           CAST(MAX(epoch_us(ts) - epoch_us(prev_ts)) AS BIGINT) AS max_gap_us
    FROM seq WHERE prev_state IS NOT NULL
    GROUP BY 1, 2
    """,
    tags=("markov", "latency", "W1-generalized"),
)
def transition_latency_matrix(spark, sf_dir):
    """Transition LATENCY matrix — the time twin of
    ``markov_event_transitions``: per (prev, cur) event-type pair, the
    exact integer-microsecond mean and max gap between consecutive
    events (floor mean — Σgap div n on exact micros; a float mean
    drifts with partial-agg order). Where the probability matrix says
    WHAT happens next, this says HOW FAST — the input to timeout and
    abandonment tuning. Same one-shuffle LAG, vocabulary-grain
    output."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    seq = ev.select(
        F.lag("event_type").over(w).alias("prev_state"),
        F.col("event_type").alias("state"),
        gap.alias("__gap"),
    ).filter(F.col("prev_state").isNotNull())
    return seq.groupBy("prev_state", "state").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("cast(sum(__gap) div count(1) as bigint)").alias("mean_gap_us"),
        F.max("__gap").cast("bigint").alias("max_gap_us"),
    )


@_q(
    "hierarchy_share_report",
    """
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(ROUND(o.o_totalprice*100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2
    ),
    reg AS (SELECT region, SUM(cents::HUGEINT) AS rc FROM rev GROUP BY 1),
    tot AS (SELECT SUM(cents::HUGEINT) AS t FROM rev)
    SELECT rev.region, rev.nation, rev.cents,
           CAST((rev.cents::HUGEINT * 1000000) // reg.rc AS BIGINT)
             AS share_of_region_ppm,
           CAST((reg.rc * 1000000) // tot.t AS BIGINT) AS region_share_ppm
    FROM rev JOIN reg USING (region) CROSS JOIN tot
    """,
    tags=("hierarchy", "ratio-to-parent", "A3-generalized"),
)
def hierarchy_share_report(spark, sf_dir):
    """Two-level ratio-to-parent report: each nation's exact-ppm share
    of its region's revenue, and each region's share of the total —
    the drill-down BI shape (% of parent at every level) in one pass:
    a leaf-grain aggregate, a parent rollup that broadcasts back, and
    a 1-row total. All integer div on exact cents."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
        )
    )
    reg = rev.groupBy("region").agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("__rc")
    )
    tot = rev.agg(F.sum(F.col("cents").cast("decimal(38,0)")).alias("__t"))
    return (
        rev.join(F.broadcast(reg), "region")
        .join(F.broadcast(tot))
        .select(
            "region", "nation", "cents",
            F.expr(
                "cast((cast(cents as decimal(38,0)) * 1000000) div __rc as bigint)"
            ).alias("share_of_region_ppm"),
            F.expr("cast((__rc * 1000000) div __t as bigint)").alias("region_share_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Comparative attribution (first vs last vs linear) + max drawdown
# ---------------------------------------------------------------------------

@_q(
    "attribution_model_compare",
    """
    WITH p AS (
      SELECT user_id, event_id AS pid, ts AS pts,
             CAST(ROUND(value*100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, event_type AS ttype, ts AS tts, event_id AS tid
      FROM events WHERE event_type IN ('view', 'click')
    ),
    j AS (
      SELECT p.pid, p.cents, t.ttype, t.tts, t.tid
      FROM p JOIN t ON t.user_id = p.user_id
       AND t.tts <= p.pts AND t.tts > p.pts - INTERVAL 7 DAY
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY pid ORDER BY tts, tid) AS rf,
             row_number() OVER (PARTITION BY pid ORDER BY tts DESC, tid DESC) AS rl,
             COUNT(*) OVER (PARTITION BY pid) AS n
      FROM j
    )
    SELECT ttype AS touch_type,
           CAST(SUM(CASE WHEN rf = 1 THEN cents ELSE 0 END) AS BIGINT)
             AS first_touch_cents,
           CAST(SUM(CASE WHEN rl = 1 THEN cents ELSE 0 END) AS BIGINT)
             AS last_touch_cents,
           CAST(SUM(cents // n) AS BIGINT) AS linear_cents
    FROM ranked GROUP BY 1
    """,
    tags=("attribution", "first-last-linear", "marketing"),
)
def attribution_model_compare(spark, sf_dir):
    """Comparative attribution: every purchase's value credited under
    FIRST-touch, LAST-touch, and LINEAR models side by side, per
    channel (view/click touches in a 7-day window; linear = exact
    floor split, the ``linear_attribution`` convention) — the report
    that shows how much a channel's 'performance' is a modeling
    choice. One user-key range join, two rank directions + the count
    on ONE per-purchase partitioning."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), F.col("ts").alias("pts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("event_type").alias("ttype"),
        F.col("ts").alias("tts"), F.col("event_id").alias("tid"),
    )
    j = p.join(
        t,
        (p.user_id == t.user_id)
        & (t.tts <= p.pts)
        & (t.tts > p.pts - F.expr("INTERVAL 7 DAYS")),
    ).select("pid", "cents", "ttype", "tts", "tid")
    wp = Window.partitionBy("pid")
    ranked = j.select(
        "pid", "cents", "ttype",
        F.row_number().over(wp.orderBy("tts", "tid")).alias("rf"),
        F.row_number().over(wp.orderBy(F.desc("tts"), F.desc("tid"))).alias("rl"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    return ranked.groupBy(F.col("ttype").alias("touch_type")).agg(
        F.sum(F.when(F.col("rf") == 1, F.col("cents")).otherwise(0))
        .cast("bigint").alias("first_touch_cents"),
        F.sum(F.when(F.col("rl") == 1, F.col("cents")).otherwise(0))
        .cast("bigint").alias("last_touch_cents"),
        F.sum(F.expr("cents div n")).cast("bigint").alias("linear_cents"),
    )


@_q(
    "max_drawdown_daily_revenue",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS c
      FROM orders GROUP BY 1
    ),
    runpeak AS (
      SELECT d, c, MAX(c) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM daily
    ),
    dd AS (SELECT d, c, peak, peak - c AS drawdown FROM runpeak)
    SELECT CAST(MAX(drawdown) AS BIGINT) AS max_drawdown_cents,
           CAST(MIN(CASE WHEN drawdown = (SELECT MAX(drawdown) FROM dd)
                    THEN d END) AS DATE) AS trough_date,
           CAST(MAX(CASE WHEN drawdown = (SELECT MAX(drawdown) FROM dd)
                    THEN peak END) AS BIGINT) AS peak_cents
    FROM dd
    """,
    tags=("timeseries", "drawdown", "period-grain"),
)
def max_drawdown_daily_revenue(spark, sf_dir):
    """Maximum drawdown of the daily revenue series: running peak
    (period-grain cumulative MAX), per-day drawdown = peak − value,
    and the deepest trough with its date and the peak it fell from —
    the worst-case-decline metric finance and SLO monitoring share.
    All exact integer; the ordered window walks the bounded day
    series (SCALE.md §3)."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    dd = daily.select(
        "d", "c", F.max("c").over(w).alias("peak")
    ).withColumn("drawdown", F.col("peak") - F.col("c"))
    mx = dd.agg(F.max("drawdown").alias("__mx"))
    return (
        dd.join(F.broadcast(mx))
        .agg(
            F.max("__mx").cast("bigint").alias("max_drawdown_cents"),
            F.min(F.when(F.col("drawdown") == F.col("__mx"), F.col("d")))
            .alias("trough_date"),
            F.max(F.when(F.col("drawdown") == F.col("__mx"), F.col("peak")))
            .cast("bigint").alias("peak_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Growth accounting, reconciliation audit, JSON key census
# ---------------------------------------------------------------------------

@_q(
    "growth_accounting_weekly",
    """
    WITH wk AS (
      SELECT DISTINCT user_id,
             CAST(ts AS DATE)
               - CAST((dayofweek(CAST(ts AS DATE)) + 6) % 7 AS INTEGER) AS week
      FROM events
    ),
    firsts AS (SELECT user_id, MIN(week) AS first_week FROM wk GROUP BY 1),
    seq AS (
      SELECT w.user_id, w.week, f.first_week,
             lag(w.week) OVER (PARTITION BY w.user_id ORDER BY w.week) AS prev_week
      FROM wk w JOIN firsts f USING (user_id)
    )
    SELECT week,
           CAST(SUM(CASE WHEN week = first_week THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(SUM(CASE WHEN week > first_week AND prev_week = week - 7
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
           CAST(SUM(CASE WHEN week > first_week AND prev_week < week - 7
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
    FROM seq GROUP BY 1
    """,
    tags=("growth-accounting", "retention", "W1-generalized"),
)
def growth_accounting_weekly(spark, sf_dir):
    """Weekly growth accounting: every active (user, week) classified
    NEW (first week ever), RETAINED (also active the immediately
    preceding week) or RESURRECTED (returning after a gap) — the
    growth-loop decomposition behind every DAU chart (churn is last
    week's actives minus this week's retained, derivable from these
    columns). One (user, week) dedup + one per-user LAG; Monday-start
    weeks computed by date arithmetic identical in both engines."""
    ev = _t(spark, sf_dir, "events")
    wk = ev.select(
        "user_id",
        F.date_sub(
            F.col("ts").cast("date"),
            (F.dayofweek(F.col("ts").cast("date")) + 5) % 7,
        ).alias("week"),
    ).distinct()
    firsts = wk.groupBy("user_id").agg(F.min("week").alias("first_week"))
    w = Window.partitionBy("user_id").orderBy("week")
    seq = wk.join(firsts, "user_id").select(
        "week", "first_week", F.lag("week").over(w).alias("prev_week")
    )
    return seq.groupBy("week").agg(
        F.sum(F.when(F.col("week") == F.col("first_week"), 1).otherwise(0))
        .cast("bigint").alias("n_new"),
        F.sum(
            F.when(
                (F.col("week") > F.col("first_week"))
                & (F.col("prev_week") == F.date_sub(F.col("week"), 7)),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_retained"),
        F.sum(
            F.when(
                (F.col("week") > F.col("first_week"))
                & (F.col("prev_week") < F.date_sub(F.col("week"), 7)),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_resurrected"),
    )


@_q(
    "order_total_reconciliation",
    """
    WITH lines AS (
      SELECT l_orderkey,
             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS line_cents
      FROM lineitem GROUP BY 1
    ),
    j AS (
      SELECT o.o_orderkey,
             CAST(ROUND(o.o_totalprice*100) AS BIGINT) AS total_cents,
             COALESCE(l.line_cents, 0) AS line_cents
      FROM orders o LEFT JOIN lines l ON l.l_orderkey = o.o_orderkey
    )
    SELECT COUNT(*)::BIGINT AS n_orders,
           CAST(SUM(CASE WHEN total_cents <> line_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mismatched,
           CAST((SUM(CASE WHEN total_cents <> line_cents THEN 1 ELSE 0 END)
                 * 1000000) // COUNT(*) AS BIGINT) AS mismatch_ppm,
           CAST(MAX(ABS(total_cents - line_cents)) AS BIGINT)
             AS max_abs_diff_cents
    FROM j
    """,
    tags=("audit", "reconciliation", "value-integrity"),
)
def order_total_reconciliation(spark, sf_dir):
    """Value-level reconciliation audit — the money twin of the FK
    orphan check: does each order's header total equal the sum of its
    line extended prices? Reports mismatch count/ppm and the worst
    absolute break in exact cents. (On this synthetic data the header
    is priced independently of the lines, so the audit flags ~100% —
    exactly what it's for: the check reports, it doesn't assume.)
    One line-grain aggregate + one key join."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    lines = li.groupBy("l_orderkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("line_cents")
    )
    j = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
    ).join(lines, o.o_orderkey == lines.l_orderkey, "left").select(
        "total_cents", F.coalesce("line_cents", F.lit(0)).alias("line_cents")
    )
    neq = F.when(F.col("total_cents") != F.col("line_cents"), 1).otherwise(0)
    return j.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(neq).cast("bigint").alias("n_mismatched"),
        F.expr(
            "cast((sum(case when total_cents <> line_cents then 1 else 0 end)"
            " * 1000000) div count(1) as bigint)"
        ).alias("mismatch_ppm"),
        F.max(F.abs(F.col("total_cents") - F.col("line_cents")))
        .cast("bigint").alias("max_abs_diff_cents"),
    )


@_q(
    "json_key_census",
    """
    WITH keys_ AS (
      SELECT unnest(json_keys(props)) AS key_name FROM events
      WHERE props IS NOT NULL
    ),
    n AS (SELECT COUNT(*)::BIGINT AS n FROM events WHERE props IS NOT NULL)
    SELECT key_name, COUNT(*)::BIGINT AS n_rows,
           CAST((COUNT(*) * 1000000) // MAX(n.n) AS BIGINT) AS presence_ppm
    FROM keys_ CROSS JOIN n GROUP BY key_name
    """,
    tags=("semi-structured", "profiling", "schema-census"),
)
def json_key_census(spark, sf_dir):
    """JSON key census of the semi-structured ``props`` column: every
    key that appears, in how many rows, and its presence ppm — the
    schema-drift monitor for event payloads (a new client version
    shipping a renamed key shows up here before any extract breaks).
    ``json_object_keys`` explodes in the scan stage into a
    key-vocabulary aggregate."""
    ev = _t(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    n = ev.agg(F.count(F.lit(1)).alias("__n"))
    keys = ev.select(F.explode(F.json_object_keys("props")).alias("key_name"))
    return (
        keys.groupBy("key_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .join(F.broadcast(n))
        .select(
            "key_name", "n_rows",
            F.expr("cast((n_rows * 1000000) div __n as bigint)").alias("presence_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Stickiness (DAU/WAU) + weekday-hour median heatmap
# ---------------------------------------------------------------------------

@_q(
    "stickiness_daily",
    """
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    days AS (SELECT DISTINCT d FROM du),
    dau AS (SELECT d, COUNT(*)::BIGINT AS dau FROM du GROUP BY 1),
    wau AS (
      SELECT days.d, COUNT(DISTINCT du.user_id)::BIGINT AS wau
      FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
      GROUP BY 1
    )
    SELECT dau.d, dau.dau, wau.wau,
           CAST((dau.dau * 1000000) // wau.wau AS BIGINT) AS stickiness_ppm
    FROM dau JOIN wau USING (d)
    """,
    tags=("engagement", "stickiness", "rolling-distinct"),
)
def stickiness_daily(spark, sf_dir):
    """Daily stickiness — DAU as a share of trailing-7-day actives in
    exact ppm (the engagement-frequency KPI: how much of the weekly
    audience shows up on a given day). Reuses the exact
    rolling-distinct construction of ``rolling_7day_active_users``:
    (day, user) dedup first, each day joins its ≤7 trailing slices
    (rolling DISTINCT has no window partial aggregate; HLL partials
    are the documented approximate swap at extreme scale)."""
    ev = _t(spark, sf_dir, "events")
    du = ev.select(F.col("ts").cast("date").alias("d"), "user_id").distinct()
    dau = du.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    days = du.select("d").distinct()
    slices = du.select(F.col("d").alias("__sd"), "user_id")
    wau = (
        days.join(
            slices,
            (F.col("__sd") >= F.date_sub(F.col("d"), 6))
            & (F.col("__sd") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return dau.join(wau, "d").select(
        "d", "dau", "wau",
        F.expr("cast((dau * 1000000) div wau as bigint)").alias("stickiness_ppm"),
    )


@_q(
    "dow_hour_value_p50",
    """
    WITH v AS (
      SELECT (dayofweek(CAST(ts AS DATE)) + 6) % 7 + 1 AS dow,
             CAST(hour(ts) AS INT) AS hr,
             CAST(ROUND(value*100) AS BIGINT) AS cents, event_id
      FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT dow, hr, cents,
             row_number() OVER (PARTITION BY dow, hr ORDER BY cents, event_id)
               AS rn,
             COUNT(*) OVER (PARTITION BY dow, hr) AS n
      FROM v
    )
    SELECT dow, hr, CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS BIGINT)
             AS p50_cents
    FROM ranked GROUP BY 1, 2
    """,
    tags=("heatmap", "median-grid", "ops-report"),
)
def dow_hour_value_p50(spark, sf_dir):
    """Weekday × hour median-value heatmap: the exact LOWER median of
    event value per (ISO weekday, hour) cell — the 7×24 ops grid that
    shows when traffic is valuable vs noisy. Each cell's rank window
    is PARTITIONED by the cell key (never global); output is the
    bounded 168-cell grid."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = ev.select(
        (F.weekday(F.col("ts").cast("date")) + 1).alias("dow"),
        F.hour("ts").cast("int").alias("hr"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_id",
    )
    w = Window.partitionBy("dow", "hr").orderBy("cents", "event_id")
    ranked = v.select(
        "dow", "hr", "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("dow", "hr")).alias("n"),
    )
    return ranked.groupBy("dow", "hr").agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.max(F.when(F.expr("rn = (n + 1) div 2"), F.col("cents")))
        .cast("bigint").alias("p50_cents"),
    )


# ---------------------------------------------------------------------------
# Late round-8 closers: expectation suite, l-diversity, TWAP, and the
# stream-stream interval join's batch-equivalence contract
# ---------------------------------------------------------------------------

@_q(
    "expectation_suite_orders",
    """
    WITH a AS (
      -- COALESCE(...,0): an EMPTY load trivially passes every rule
      -- (mirrors the engine's empty-input contract, r10 sweep fix)
      SELECT
        COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS v0,
        COALESCE(SUM(CASE WHEN NOT COALESCE(o_orderdate BETWEEN DATE '1992-01-01'
              AND DATE '1998-12-31', FALSE) THEN 1 ELSE 0 END), 0) AS v1,
        COALESCE(SUM(CASE WHEN NOT COALESCE(regexp_matches(o_orderpriority, '^[1-5]-'),
              FALSE) THEN 1 ELSE 0 END), 0) AS v2,
        COALESCE(SUM(CASE WHEN NOT COALESCE(o_orderstatus IN ('O','F','P'), FALSE)
              THEN 1 ELSE 0 END), 0) AS v3,
        COALESCE(SUM(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE)
              THEN 1 ELSE 0 END), 0) AS v4,
        COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS v5
      FROM orders
    ),
    rep AS (
      SELECT 'custkey_not_null' AS rule, v0 AS n_violations FROM a
      UNION ALL SELECT 'orderdate_in_range', v1 FROM a
      UNION ALL SELECT 'priority_format', v2 FROM a
      UNION ALL SELECT 'status_in_domain', v3 FROM a
      UNION ALL SELECT 'totalprice_positive', v4 FROM a
      UNION ALL SELECT 'unique(o_orderkey)', v5 FROM a
    )
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
           CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INTEGER)
             AS passed
    FROM rep ORDER BY rule
    """,
    tags=("data-quality", "expectation-suite", "A2-generalized"),
)
def expectation_suite_orders(spark, sf_dir):
    """Deequ-style verification run over orders: six named expectations
    (completeness, date range, priority format, status domain, price
    positivity, PK uniqueness) evaluated in ONE full-table aggregate
    pass and unpivoted to a (rule, n_violations, passed) report — the
    release-gate table a warehouse load publishes next to the data.
    Generalizes the reference's console-count diagnostics
    (ventas_totales.py:127-128,154-156) into an auditable artifact.
    One scan, one 1-row shuffle, constant-size stack."""
    from etl_rj_spark.operators.validate import expectation_suite

    o = _t(spark, sf_dir, "orders")
    return expectation_suite(
        o,
        {
            "custkey_not_null": F.col("o_custkey").isNotNull(),
            "orderdate_in_range": F.col("o_orderdate").between(
                "1992-01-01", "1998-12-31"
            ),
            "priority_format": F.col("o_orderpriority").rlike("^[1-5]-"),
            "status_in_domain": F.col("o_orderstatus").isin("O", "F", "P"),
            "totalprice_positive": F.col("o_totalprice") > 0,
        },
        unique_cols=["o_orderkey"],
    )


@_q(
    "l_diversity_audit",
    """
    WITH ext AS (
      SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    ),
    g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_rows,
             COUNT(DISTINCT o_orderpriority) AS div
      FROM ext GROUP BY 1, 2
    )
    SELECT CAST(3 AS INTEGER) AS l,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN div < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_div_groups,
           CAST(MIN(div) AS BIGINT) AS l_actual,
           CAST(SUM(CASE WHEN div < 3 THEN n_rows ELSE 0 END) AS BIGINT)
             AS n_risk_rows,
           CAST(SUM(CASE WHEN div < 3 THEN n_rows ELSE 0 END) * 1000000
                // SUM(n_rows) AS BIGINT) AS risk_ppm
    FROM g
    """,
    tags=("privacy", "l-diversity", "A3-generalized"),
)
def l_diversity_audit(spark, sf_dir):
    """l-diversity audit — the companion gate to ``k_anonymity_audit``:
    k-anonymity alone fails when a quasi-identifier group is large but
    every member shares ONE sensitive value (the homogeneity attack).
    Here the published extract is customers joined to their orders'
    priority; per (nation, market-segment) QI group we count DISTINCT
    sensitive values and report the groups below l=3, the rows exposed
    in them (exact ppm), and the l the extract actually achieves. One
    key-shuffled join + a vocabulary-grain (≤ |nations|·|segments|)
    distinct aggregate — scale-safe."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    ext = o.join(
        c.select("c_custkey", "c_nationkey", "c_mktsegment"),
        o.o_custkey == c.c_custkey,
    )
    g = ext.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderpriority").alias("div"),
    )
    low = F.when(F.col("div") < 3, F.col("n_rows")).otherwise(0)
    return g.agg(
        F.lit(3).cast("int").alias("l"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("div") < 3, 1).otherwise(0)).cast("bigint")
        .alias("n_low_div_groups"),
        F.min("div").cast("bigint").alias("l_actual"),
        F.sum(low).cast("bigint").alias("n_risk_rows"),
        F.expr(
            "cast(sum(case when div < 3 then n_rows else 0 end) * 1000000"
            " div sum(n_rows) as bigint)"
        ).alias("risk_ppm"),
    )


@_q(
    "time_weighted_value_user",
    """
    WITH seq AS (
      SELECT user_id, CAST(ROUND(value*100) AS BIGINT) AS cents,
             epoch_us(ts) AS t,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS t_next
      FROM events
    ),
    iv AS (
      SELECT user_id, cents, t_next - t AS dur
      FROM seq WHERE t_next IS NOT NULL
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dur) AS BIGINT) AS total_dur_us,
           CAST(SUM(cents::HUGEINT * dur) // SUM(dur) AS BIGINT)
             AS twap_cents
    FROM iv GROUP BY user_id HAVING SUM(dur) > 0
    """,
    tags=("timeseries", "time-weighted", "W1-generalized"),
)
def time_weighted_value_user(spark, sf_dir):
    """Time-weighted average event value per user (the TSDB
    ``time_weight``/LOCF-average shape): each event's value holds
    until the user's next event, so a value that was current for an
    hour outweighs ten updates in a minute — the correct mean for
    irregularly-sampled gauges. Exact integers end to end (epoch µs ×
    integer cents, floor division); the last event per user carries no
    duration and single-event users drop out. One user-key shuffle
    (LEAD window + aggregate on the same partitioning)."""
    from etl_rj_spark.operators.windows import time_weighted_mean

    ev = _t(spark, sf_dir, "events")
    return time_weighted_mean(
        ev, "user_id", "ts",
        F.round(F.col("value") * 100).cast("long"), "event_id",
    )


@_q(
    "stream_view_purchase_join",
    """
    SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
    FROM events v JOIN events p ON p.user_id = v.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    ORDER BY 1, 2, 3
    """,
    tags=("streaming", "stream-stream-join", "interval-join"),
)
def stream_view_purchase_join(spark, sf_dir):
    """Stream-stream interval join batch equivalence
    (streaming/events.py:73): the events table replays as 3
    CONTIGUOUS TIME SLICES through a file stream
    (maxFilesPerTrigger=1), both sides watermarked 2 h, and every
    purchase joins the same user's views from the preceding 30 min.
    The oracle is the plain batch interval join — equality holds
    because ordered arrival keeps every needed view inside the state
    store's eviction horizon (view state is dropped only once
    watermark passes view_ts + gap; with time-ordered slices the
    watermark trails any future purchase's window by the full 2 h
    margin). This is the semantics contract the sessionizing funnel
    pipelines rely on; the outer-join eviction twin is pinned in
    tests/test_streaming.py."""
    from etl_rj_spark.analytics.coverage_suite import _scratch
    from etl_rj_spark.sources.parquet import read_parquet_table
    from etl_rj_spark.streaming.events import view_purchase_stream_join

    root = _scratch("stream_vp_join")
    ev = read_parquet_table(spark, f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type"
    )
    bounds = ev.agg(
        F.expr("percentile_approx(cast(ts as double), 0.34)").alias("t1"),
        F.expr("percentile_approx(cast(ts as double), 0.67)").alias("t2"),
    ).collect()[0]
    t1, t2 = bounds.t1, bounds.t2
    slices = [
        ev.filter(F.col("ts").cast("double") <= t1),
        ev.filter(
            (F.col("ts").cast("double") > t1)
            & (F.col("ts").cast("double") <= t2)
        ),
        ev.filter(F.col("ts").cast("double") > t2),
    ]
    for s in slices:  # sequential appends → file mtimes follow time order
        s.coalesce(1).write.mode("append").parquet(f"{root}/in")
    schema = spark.read.parquet(f"{root}/in").schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{root}/in")
    joined = view_purchase_stream_join(stream, max_gap_minutes=30)
    (
        joined.writeStream.format("parquet")
        .option("path", f"{root}/out")
        .option("checkpointLocation", f"{root}/ck")
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
        .awaitTermination()
    )
    return (
        spark.read.parquet(f"{root}/out")
        .select("user_id", "view_id", "purchase_id")
        .orderBy("user_id", "view_id", "purchase_id")
    )


@_q(
    "ks_two_sample_values",
    """
    WITH v AS (
      SELECT CAST(ROUND(value*100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1
      FROM events
      WHERE event_type IN ('click', 'view') AND value IS NOT NULL
    ),
    pv AS (SELECT cents, SUM(g1) AS c1, SUM(1 - g1) AS c2 FROM v GROUP BY 1),
    cum AS (
      SELECT
        SUM(c1) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum1,
        SUM(c2) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum2
      FROM pv
    ),
    n AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM pv)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(MAX(ABS(cum1 * n2 - cum2 * n1)) AS BIGINT) AS d_scaled,
           CAST(CASE WHEN n1 * n2 = 0 THEN NULL
                     ELSE MAX(ABS(cum1 * n2 - cum2 * n1)) * 1000000 // (n1 * n2)
                END AS BIGINT) AS d_ppm
    FROM cum CROSS JOIN n GROUP BY n1, n2
    """,
    tags=("stats-ks", "drift", "two-sample"),
)
def ks_two_sample_values(spark, sf_dir):
    """Exact two-sample Kolmogorov–Smirnov statistic between the
    click and view value distributions: D = sup|F1 − F2|, evaluated
    on the merged value grain (the CDFs are step functions — the sup
    is attained at a data value). The UNBINNED drift test beside the
    binned PSI/JS divergences: sensitive anywhere on the CDF, no bin
    tuning. Exact integers: D is reported as max|cum1·n2 − cum2·n1|
    plus its ppm form — no floats anywhere. The cumulative window is
    unpartitioned but walks the VALUE VOCABULARY (bounded cents
    grain, SCALE.md §3 rule — same class as equi_depth_bins), never
    the row grain."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view") & F.col("value").isNotNull()
    )
    v = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g1"),
    )
    pv = v.groupBy("cents").agg(
        F.sum("g1").alias("c1"), F.sum(F.lit(1) - F.col("g1")).alias("c2")
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = pv.select(
        F.sum("c1").over(w).alias("cum1"), F.sum("c2").over(w).alias("cum2")
    )
    n = pv.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    return (
        cum.join(F.broadcast(n))
        .groupBy("n1", "n2")
        .agg(
            F.max(F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")))
            .alias("__d")
        )
        .select(
            F.col("n1").cast("bigint").alias("n1"),
            F.col("n2").cast("bigint").alias("n2"),
            F.col("__d").cast("bigint").alias("d_scaled"),
            # an empty sample (n1 or n2 = 0) has no defined D:
            # NULL, never an ANSI divide-by-zero
            F.expr(
                "cast(case when n1 * n2 = 0 then null else"
                " (__d * 1000000) div (n1 * n2) end as bigint)"
            ).alias("d_ppm"),
        )
    )


@_q(
    "cuped_theta_events",
    """
    WITH u AS (
      SELECT user_id,
             SUM(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END)::HUGEINT AS x,
             SUM(CASE WHEN day(ts) > 15
                 THEN CAST(ROUND(COALESCE(value,0)*100) AS BIGINT)
                 ELSE 0 END)::HUGEINT AS y
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT COUNT(*)::HUGEINT AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*x) AS sxx, SUM(x*y) AS sxy, SUM(y*y) AS syy
      FROM u
    ),
    d AS (
      SELECT n, n*sxy - sx*sy AS t, n*sxx - sx*sx AS dd, n*syy - sy*sy AS vy
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(CASE WHEN dd = 0 THEN NULL
                     WHEN t >= 0 THEN (t * 1000000) // dd
                     ELSE -((-t * 1000000) // dd) END AS BIGINT) AS theta_ppm,
           CAST(CASE WHEN dd * vy = 0 THEN NULL
                     ELSE (t * t * 1000000) // (dd * vy) END AS BIGINT)
             AS var_reduction_ppm
    FROM d
    """,
    tags=("experimentation", "cuped", "variance-reduction"),
)
def cuped_theta_events(spark, sf_dir):
    """CUPED pre-analysis statistics: θ = cov(X,Y)/var(X) and the
    expected variance reduction ρ² for the covariate-adjusted metric
    Y − θ(X − X̄), where X is each user's PRE-period activity (event
    count, days 1–15) and Y the POST-period value (cents, days 16+).
    The experimentation-platform planning number: ρ²·10⁶ ppm of the
    metric's variance disappears under CUPED adjustment. Exact
    integer moments end to end (decimal(38,0) ↔ HUGEINT); θ reported
    in sign-split truncating ppm so both engines agree on negatives.
    One user-key aggregate then a 1-row moment reduction."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0))
        .cast("decimal(38,0)").alias("x"),
        F.sum(
            F.when(
                F.dayofmonth("ts") > 15,
                F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100).cast("long"),
            ).otherwise(0)
        ).cast("decimal(38,0)").alias("y"),
    )
    m = u.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    d = m.select(
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("t"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("dd"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("vy"),
    )
    return d.select(
        F.col("n").cast("bigint").alias("n_users"),
        # a constant pre-period covariate (dd = 0) or constant post
        # metric (vy = 0) leaves θ / ρ² undefined: NULL, never an
        # ANSI divide-by-zero (same guard family as ols2's det)
        F.expr(
            "cast(case when dd = 0 then null"
            " when t >= 0 then (t * 1000000) div dd"
            " else -((-t * 1000000) div dd) end as bigint)"
        ).alias("theta_ppm"),
        F.expr(
            "cast(case when dd * vy = 0 then null else"
            " (t * t * 1000000) div (dd * vy) end as bigint)"
        ).alias("var_reduction_ppm"),
    )


@_q(
    "ols_price_qty_discount",
    """
    WITH b AS (
      SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS y,
             CAST(l_quantity AS BIGINT) AS x1,
             CAST(ROUND(l_discount*100) AS BIGINT) AS x2
      FROM lineitem
    ),
    m AS (
      SELECT COUNT(*)::HUGEINT AS n,
             SUM(x1::HUGEINT) AS sx1, SUM(x2::HUGEINT) AS sx2,
             SUM(y::HUGEINT) AS sy,
             SUM(x1::HUGEINT * x1) AS s11, SUM(x1::HUGEINT * x2) AS s12,
             SUM(x2::HUGEINT * x2) AS s22,
             SUM(x1::HUGEINT * y) AS s1y, SUM(x2::HUGEINT * y) AS s2y
      FROM b
    ),
    d AS (
      SELECT n,
        n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2)
          + sx2*(sx1*s12 - s11*sx2) AS det,
        sy*(s11*s22 - s12*s12) - sx1*(s1y*s22 - s12*s2y)
          + sx2*(s1y*s12 - s11*s2y) AS det0,
        n*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2)
          + sx2*(sx1*s2y - s1y*sx2) AS det1,
        n*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2)
          + sy*(sx1*s12 - s11*sx2) AS det2
      FROM m
    )
    -- det = 0 (collinear/constant features) -> NULL betas, mirroring
    -- the engine's guard (ADVICE r8)
    SELECT CAST(n AS BIGINT) AS n,
      CAST(CASE WHEN det = 0 THEN NULL
           WHEN (det0 >= 0) = (det >= 0)
           THEN (ABS(det0) * 1000000) // ABS(det)
           ELSE -((ABS(det0) * 1000000) // ABS(det)) END AS BIGINT)
        AS beta0_ppm,
      CAST(CASE WHEN det = 0 THEN NULL
           WHEN (det1 >= 0) = (det >= 0)
           THEN (ABS(det1) * 1000000) // ABS(det)
           ELSE -((ABS(det1) * 1000000) // ABS(det)) END AS BIGINT)
        AS beta1_ppm,
      CAST(CASE WHEN det = 0 THEN NULL
           WHEN (det2 >= 0) = (det >= 0)
           THEN (ABS(det2) * 1000000) // ABS(det)
           ELSE -((ABS(det2) * 1000000) // ABS(det)) END AS BIGINT)
        AS beta2_ppm
    FROM d
    """,
    tags=("stats-ols", "regression", "closed-form"),
)
def ols_price_qty_discount(spark, sf_dir):
    """Two-feature OLS with intercept fit over lineitem in ONE
    aggregate pass: extendedprice (cents) on quantity and discount
    (integer percent), solved by Cramer's rule on the integer
    normal-equation moments (``ols2_normal_equations``) — the
    multi-feature sibling of ``value_trend_slope``'s closed form.
    No iterations, no driver math, no floats: β in sign-split
    truncating ppm, bit-identical across engines. At 100 TB this is
    still one map-side-combining reduction to a single row."""
    from etl_rj_spark.operators.stats import ols2_normal_equations

    li = _t(spark, sf_dir, "lineitem")
    return ols2_normal_equations(
        li,
        F.round(F.col("l_extendedprice") * 100).cast("long"),
        F.col("l_quantity").cast("long"),
        F.round(F.col("l_discount") * 100).cast("long"),
    )


@_q(
    "ivm_join_maintenance",
    """
    SELECT o.o_orderkey, o.o_custkey, c.c_nationkey,
           CAST(ROUND(o.o_totalprice*100) AS BIGINT) AS cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY 1
    """,
    tags=("streaming", "ivm", "incremental", "J1-generalized"),
)
def ivm_join_maintenance(spark, sf_dir):
    """Incremental view maintenance of a two-sided equi-join
    (streaming/ivm.py): orders AND customers both arrive as 3
    insert-only delta batches; each fold applies the bilinear product
    rule ΔV = ΔA ⋈ B_new ∪ A_old ⋈ ΔB and appends to a ledgered
    batch-partitioned view log. The oracle is the from-scratch batch
    join — equality pins the delta algebra's exactly-once pairing (a
    pair arriving in batches (i, j) materializes in fold max(i, j)
    and nowhere else, so the union needs no dedup). A committed fold
    is redelivered in-query and must no-op (K1 posture). Per-fold
    cost is O(|ΔA|+|ΔB|+|ΔV|) appends — nothing rewrites."""
    from etl_rj_spark.analytics.coverage_suite import _scratch
    from etl_rj_spark.streaming.ivm import fold_join_delta, serve_join_view

    root = _scratch("ivm_join")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    for i in range(3):
        fold_join_delta(
            o.filter(F.col("o_orderkey") % 3 == i),
            c.filter(F.col("c_custkey") % 3 == i),
            i, root, "o_custkey", "c_custkey",
        )
    fold_join_delta(  # redelivery of a committed fold: must no-op
        o.filter(F.col("o_orderkey") % 3 == 1),
        c.filter(F.col("c_custkey") % 3 == 1),
        1, root, "o_custkey", "c_custkey",
    )
    schema = "o_orderkey long, o_custkey long, cents long, c_custkey long, c_nationkey long"
    return (
        serve_join_view(spark, root, schema)
        .select("o_orderkey", "o_custkey", "c_nationkey", "cents")
        .orderBy("o_orderkey")
    )


@_q(
    "stream_dedup_within_watermark",
    """
    -- event_id-KEYED canonical relation (ADVICE r11, medium): the
    -- streaming operator dedups on event_id alone, and which copy of
    -- a duplicated id it keeps is arrival-order arbitrary — so BOTH
    -- sides reduce each event_id to the same deterministic canonical
    -- payload (column-wise MIN of the observed values; engines agree
    -- on NULL-skipping MIN where struct-ordering rules diverge).
    -- On unique event_ids — and on the dupstorm regime's verbatim
    -- duplicates — this is exactly the former full-row DISTINCT.
    SELECT event_id, MIN(epoch_us(ts)) AS ts_us, MIN(user_id) AS user_id,
           MIN(event_type) AS event_type,
           MIN(CAST(ROUND(COALESCE(value, 0)*100) AS BIGINT)) AS cents
    FROM events
    -- an event with no event-time cannot pass a watermark operator:
    -- Spark drops NULL-ts rows from watermarked dedup (r10 parity)
    WHERE ts IS NOT NULL
    GROUP BY event_id
    ORDER BY event_id
    """,
    tags=("streaming", "dedup", "watermark", "exactly-once"),
)
def stream_dedup_within_watermark(spark, sf_dir):
    """Native streaming deduplication with bounded state
    (``dropDuplicatesWithinWatermark``, Spark 3.5+): events replay as
    3 time-ordered micro-batches, and the tail HOUR of each batch is
    re-sent verbatim at the head of the next one — the at-least-once
    delivery pattern every log-based source produces. With a 2 h
    watermark the duplicate arrives well inside the original's state
    lifetime, so the operator must drop every re-send while evicting
    state older than the watermark (bounded memory — unlike a plain
    ``dropDuplicates`` whose streaming state grows forever).

    The replay source is the CANONICALIZED events relation: one row
    per event_id, payload = column-wise MIN of the observed values
    (NULL-timestamped rows dropped first — they cannot pass a
    watermark operator either way). The operator keys on event_id and
    keeps an arrival-order-arbitrary survivor, so without the
    canonical reduction a duplicated id carrying DIFFERING payloads
    (at-least-once ingestion racing an update) would make engine vs
    oracle diverge nondeterministically — the r11 oracle's full-row
    DISTINCT only matched under the verbatim-duplicate assumption
    (ADVICE r11, medium). Canonicalizing both sides makes the parity
    deterministic under every regime while leaving the tested
    behavior — in-stream drop of the re-sent tail hours — intact, and
    is a no-op on unique ids and on verbatim duplicates."""
    from etl_rj_spark.analytics.coverage_suite import _scratch
    from etl_rj_spark.sources.parquet import read_parquet_table

    root = _scratch("stream_dedup_wm")
    ev = (
        read_parquet_table(spark, f"{sf_dir}/events.parquet")
        .where(F.col("ts").isNotNull())
        .groupBy("event_id")
        .agg(
            F.min("ts").alias("ts"),
            F.min("user_id").alias("user_id"),
            F.min("event_type").alias("event_type"),
            F.min(
                F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100)
                .cast("bigint")
            ).alias("cents"),
        )
    )
    bounds = ev.agg(
        F.expr("percentile_approx(cast(ts as double), 0.34)").alias("t1"),
        F.expr("percentile_approx(cast(ts as double), 0.67)").alias("t2"),
    ).collect()[0]
    # EMPTY events: percentiles are NULL — slice at epoch 0 so all
    # three replay files are schema'd empty frames and the stream
    # drains cleanly (r10 degenerate-input sweep fix)
    t1 = bounds.t1 if bounds.t1 is not None else 0.0
    t2 = bounds.t2 if bounds.t2 is not None else 0.0
    sec = F.col("ts").cast("double")
    s0, s1, s2 = (
        ev.filter(sec <= t1),
        ev.filter((sec > t1) & (sec <= t2)),
        ev.filter(sec > t2),
    )
    # at-least-once re-sends: the last hour of each slice rides again
    # in the NEXT file (arrival within the 2 h watermark delay, so
    # dedup is guaranteed by the operator's contract)
    files = [
        s0,
        s1.unionByName(s0.filter(sec > t1 - 3600)),
        s2.unionByName(s1.filter(sec > t2 - 3600)),
    ]
    for f in files:  # sequential appends → mtime follows event time
        f.coalesce(1).write.mode("append").parquet(f"{root}/in")
    schema = spark.read.parquet(f"{root}/in").schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{root}/in")
    deduped = stream.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    (
        deduped.writeStream.format("parquet")
        .option("path", f"{root}/out")
        .option("checkpointLocation", f"{root}/ck")
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
        .awaitTermination()
    )
    return (
        spark.read.parquet(f"{root}/out")
        .select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id", "event_type", "cents",
        )
        .orderBy("event_id")
    )


@_q(
    "ivm_agg_with_retractions",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
             AS total
    FROM orders
    WHERE NOT (o_orderkey % 3 = 0 AND o_orderkey % 7 = 0)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("streaming", "ivm", "z-set", "retraction", "A3-generalized"),
)
def ivm_agg_with_retractions(spark, sf_dir):
    """Weighted (z-set) incremental aggregate maintenance
    (streaming/ivm.py:fold_agg_delta): orders arrive as 3 insert
    batches, then a RETRACTION batch deletes every order whose key is
    divisible by 21 — weight −1 rows, no tombstones — and a committed
    fold is redelivered (no-op). The served per-priority (count, total
    cents) must equal the from-scratch aggregate over the surviving
    orders: the oracle never saw a delta, the maintainer never saw the
    final relation. Per-fold cost is one O(|Δ|-keys) partial append;
    deletes ride the SAME additive algebra as inserts."""
    from etl_rj_spark.analytics.coverage_suite import _scratch
    from etl_rj_spark.streaming.ivm import fold_agg_delta, serve_agg_view

    root = _scratch("ivm_agg")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    for i in range(3):
        fold_agg_delta(
            o.filter(F.col("o_orderkey") % 3 == i).withColumn("w", F.lit(1)),
            i, root, ["o_orderpriority"], "w", "cents",
        )
    retract = (
        o.filter((F.col("o_orderkey") % 3 == 0) & (F.col("o_orderkey") % 7 == 0))
        .withColumn("w", F.lit(-1))
    )
    fold_agg_delta(retract, 3, root, ["o_orderpriority"], "w", "cents")
    fold_agg_delta(retract, 3, root, ["o_orderpriority"], "w", "cents")  # no-op
    schema = "o_orderpriority string, __w long, __s decimal(38,0)"
    return (
        serve_agg_view(spark, root, ["o_orderpriority"], schema)
        .orderBy("o_orderpriority")
    )
