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
           CAST(((n+1)*s - 2*rs) * 1000000 // (n*s) AS BIGINT) AS gini_ppm
    FROM agg
    """,
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
    WITH cells AS (
      SELECT o_orderpriority AS a, o_orderstatus AS b, COUNT(*)::HUGEINT AS o
      FROM orders GROUP BY 1, 2
    ),
    rows_ AS (SELECT o_orderpriority AS a, COUNT(*)::HUGEINT AS r FROM orders GROUP BY 1),
    cols_ AS (SELECT o_orderstatus AS b, COUNT(*)::HUGEINT AS c FROM orders GROUP BY 1),
    tot AS (
      SELECT COUNT(*)::HUGEINT AS t,
             COUNT(DISTINCT o_orderpriority)::BIGINT AS ka,
             COUNT(DISTINCT o_orderstatus)::BIGINT AS kb
      FROM orders
    )
    SELECT CAST(MAX(t) AS BIGINT) AS n,
           CAST((MAX(ka)-1) * (MAX(kb)-1) AS BIGINT) AS dof,
           CAST(SUM((o*t - r*c) * (o*t - r*c) * 1000000 // (t*r*c)) AS BIGINT)
             AS chi2_ppm
    FROM cells JOIN rows_ USING (a) JOIN cols_ USING (b) CROSS JOIN tot
    """,
    tags=("stats-chi2", "independence"),
)
def chi_square_priority_status(spark, sf_dir):
    """Pearson chi-square independence screen between order priority
    and order status, fully exact-integer: per-cell contribution
    ``((o·N − r·c)²·10⁶) div (N·r·c)`` summed exactly — the
    drift-monitor statistic (are two categoricals still independent?)
    with no float anywhere. Contingency cells are vocabulary-grain."""
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
      FROM events GROUP BY 1
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

    ev = _t(spark, sf_dir, "events").select(
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
    WITH counts AS (SELECT source, COUNT(*)::BIGINT AS n FROM documents GROUP BY 1),
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
      FROM documents
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

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
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
