"""Window-function family beyond the reference's single LAG citation
(SURVEY §2.7 W1): frame-based rolling aggregates, distribution ranks,
first/last frame values, and the groupwise-min join shape.

The reference's docs prescribe only LAG (Cartera PDF §8); these queries
exercise the rest of the `pyspark.sql.Window` surface the engine
exposes, each with a DuckDB oracle. Scale posture: every window here
partitions before ordering (no global single-partition window except
the bounded per-day rolling series, which is pre-aggregated to one row
per day — ~2.4k rows at any SF — before the unpartitioned frame walk).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_rj_spark.analytics.suite import _msum, _q, _t


@_q(
    "rolling_7day_revenue",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS dia,
             SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS rev_c
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    )
    SELECT dia,
           SUM(rev_c) OVER (ORDER BY dia RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
             / 100.0 AS rev_7d,
           COUNT(*) OVER (ORDER BY dia RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
             AS days_present
    FROM daily ORDER BY dia
    """,
    tags=("W-frame", "A3", "rolling"),
)
def rolling_7day_revenue(spark, sf_dir):
    """Rolling 7-day revenue: pre-aggregate to one row per day (exact
    cents — that shuffle is the scalable part), then a RANGE frame over
    the ~2.4k-row daily series. The frame sums BIGINT cents, so the
    rolling total is order-exact; division to money happens after the
    frame. Spark's rangeBetween needs a numeric ordering key — days
    since epoch via unix_date mirrors DuckDB's DATE RANGE semantics."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("dia")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    w = Window.orderBy(F.unix_date("dia")).rangeBetween(-6, 0)
    return (
        daily.select(
            "dia",
            (F.sum("rev_c").over(w) / F.lit(100.0)).alias("rev_7d"),
            F.count(F.lit(1)).over(w).alias("days_present"),
        )
        .orderBy("dia")
    )


@_q(
    "acctbal_distribution_ranks",
    """
    -- complete-case (r12): a NULL balance has no rank position —
    -- engines disagree on NULL sort order (Spark NULLS FIRST, DuckDB
    -- NULLS LAST), so those rows are excluded on BOTH sides
    SELECT c_custkey, c_mktsegment,
           PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS pct_rank,
           CUME_DIST()    OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS cume,
           RANK()         OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS rnk
    FROM customer WHERE c_acctbal IS NOT NULL ORDER BY c_custkey
    """,
    tags=("W-rank", "distribution"),
)
def acctbal_distribution_ranks(spark, sf_dir):
    """PERCENT_RANK / CUME_DIST / RANK per market segment. Ordering by
    the raw double is safe: both engines assign tied doubles the same
    rank, and the rank ratios are exact small-integer divisions.

    Rewritten r12 on the value-grain grouped CDF: all three are pure
    functions of each value's (rows-below, rows-at-or-below, n) —
    RANK = below+1, CUME_DIST = through/n, PERCENT_RANK =
    below/(n−1) (0 when n = 1, both engines' convention) — so the
    only window walks each segment's distinct balances after a
    map-side count, and the vocabulary-sized rank map broadcasts back
    onto the customer scan. The old per-segment ROW window was the
    low-cardinality-key trap: 5 segments means corpus/5 rows through
    one task. Values identical: ties share a CDF row by construction."""
    from etl_rj_spark.operators.stats import grouped_value_cdf

    c = _t(spark, sf_dir, "customer").where(F.col("c_acctbal").isNotNull())
    ranks = grouped_value_cdf(
        c.select("c_mktsegment", "c_acctbal"), "c_mktsegment", "c_acctbal"
    ).select(
        F.col("c_mktsegment").alias("__seg"), F.col("c_acctbal").alias("__bal"),
        F.when(F.col("__n") == 1, F.lit(0.0))
        .otherwise(F.col("__before") / (F.col("__n") - 1)).alias("pct_rank"),
        (F.col("__through") / F.col("__n")).alias("cume"),
        (F.col("__before") + 1).cast("int").alias("rnk"),
    )
    return (
        c.select("c_custkey", "c_mktsegment", "c_acctbal")
        .join(
            F.broadcast(ranks),
            F.col("c_mktsegment").eqNullSafe(F.col("__seg"))
            & (F.col("c_acctbal") == F.col("__bal")),
        )
        .select("c_custkey", "c_mktsegment", "pct_rank", "cume", "rnk")
        .orderBy("c_custkey")
    )


@_q(
    "first_last_order_span",
    """
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(CAST(o_orderdate AS DATE)) OVER w AS first_fecha,
           LAST_VALUE(CAST(o_orderdate AS DATE))  OVER w AS last_fecha,
           FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
           LAST_VALUE(o_orderkey)  OVER w AS last_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey
    """,
    tags=("W-frame", "first-last"),
)
def first_last_order_span(spark, sf_dir):
    """First/last order per customer via an unbounded ROWS frame — the
    o_orderkey tiebreaker makes same-day first/last deterministic (the
    default frame would silently return CURRENT ROW for LAST_VALUE;
    the explicit unbounded frame is the correct idiom both engines)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.select(
            "o_custkey",
            F.first(F.to_date("o_orderdate")).over(w).alias("first_fecha"),
            F.last(F.to_date("o_orderdate")).over(w).alias("last_fecha"),
            F.first("o_orderkey").over(w).alias("first_orderkey"),
            F.last("o_orderkey").over(w).alias("last_orderkey"),
        )
        .distinct()
        .orderBy("o_custkey")
    )


@_q(
    "cheapest_part_per_type",
    """
    SELECT p_type, p_partkey, p_name, p_retailprice
    FROM (
      SELECT p_type, p_partkey, p_name, p_retailprice,
             MIN(p_retailprice) OVER (PARTITION BY p_type) AS mn
      FROM part
    ) WHERE p_retailprice = mn
    ORDER BY p_type, p_partkey
    """,
    tags=("W-agg", "groupwise-min", "tpch-q2-shape"),
)
def cheapest_part_per_type(spark, sf_dir):
    """TPC-H-Q2-shaped groupwise minimum (no partsupp table — retail
    price stands in for supply cost): parts matching their type's
    minimum price. The per-type minimum is a map-side-combining
    aggregate broadcast back onto the scan (rewritten r12 — the old
    `MIN OVER (PARTITION BY p_type)` window put each type's WHOLE
    row set through one task, the low-cardinality-key trap: the
    hotkey regime's 99%-one-type table rode a single sort). Equality
    compares the same stored double, so float drift cannot diverge.
    Ties all survive (same both engines) and p_partkey orders them.
    The join back is NULL-SAFE on p_type (ADVICE r12): the oracle's
    window keeps a NULL partition, so a NULL-type group with non-NULL
    prices must survive the rewrite too — a bare equi-join silently
    dropped it (groupBy aggregates the NULL group; only the join lost
    it)."""
    p = _t(spark, sf_dir, "part")
    mins = p.groupBy("p_type").agg(F.min("p_retailprice").alias("mn"))
    return (
        p.join(
            F.broadcast(mins.withColumnRenamed("p_type", "__mn_type")),
            p["p_type"].eqNullSafe(F.col("__mn_type")),
        )
        .filter(F.col("p_retailprice") == F.col("mn"))
        .select("p_type", "p_partkey", "p_name", "p_retailprice")
        .orderBy("p_type", "p_partkey")
    )


@_q(
    "orders_array_per_customer",
    """
    SELECT o_custkey,
           array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS orderkeys,
           len(list(o_orderkey)) AS n_orders
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_custkey ORDER BY o_custkey
    """,
    tags=("A3", "array-agg"),
)
def orders_array_per_customer(spark, sf_dir):
    """Deterministic array aggregation: collect_list has no inherent
    order (partial-agg arrival order), so the engine contract is
    sort_array after collect — the only way an array-valued aggregate
    is stable across partitionings/engines. The driver canonicalizer
    cannot hash array cells, so the contract emits the sorted array
    string-joined (exact int64 renderings — engine-identical)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("o_orderkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("orderkeys"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_custkey")
    )


@_q(
    "lateral_top2_orders",
    """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
         LATERAL (
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
         ) AS t
    WHERE c.c_mktsegment = 'BUILDING'
    ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
    """,
    tags=("J-lateral", "topk", "sql-surface"),
)
def lateral_top2_orders(spark, sf_dir):
    """Correlated LATERAL subquery (top-2 orders per BUILDING customer)
    through the SQL surface — Spark 4 plans LATERAL ... LIMIT as a
    ranked window under the hood, the same physical shape as the
    DataFrame row_number top-k (topk_orders_per_customer); this pins
    the SQL spelling. Ties broken by o_orderkey in the sort AND the
    limit ordering, so both engines pick identical rows."""
    from etl_rj_spark.analytics.sql_surface import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
             LATERAL (
               SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
             ) AS t
        WHERE c.c_mktsegment = 'BUILDING'
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
        """
    )


@_q(
    "decay_weighted_revenue",
    """
    WITH daily AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS dia,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    mx AS (SELECT MAX(dia) AS anchor FROM daily),
    anchored AS (
      SELECT o_custkey, cents,
             date_diff('day', dia, mx.anchor) AS age
      FROM daily CROSS JOIN mx
    )
    SELECT o_custkey,
           CAST(SUM(cents // CAST(2 ** LEAST(age // 7, 62) AS BIGINT)) AS BIGINT)
             AS decayed_cents,
           CAST(SUM(cents) AS BIGINT) AS raw_cents,
           COUNT(*) AS n_days
    FROM anchored GROUP BY o_custkey ORDER BY o_custkey
    """,
    tags=("feature-engineering", "decay", "ewma"),
)
def decay_weighted_revenue(spark, sf_dir):
    """Half-life decay-weighted customer revenue — the recency-
    weighted feature an EWMA would give, in EXACT integer form: each
    day's cents are right-shifted one bit per week of age
    (``cents div 2^(age div 7)`` — a 7-day half-life, age measured
    from the corpus's own max date), then summed as
    int64. Float ``pow(λ, age)`` is NOT correctly-rounded-guaranteed
    across math libraries, so λ is fixed at ½ where decay is integer
    division and the whole feature is engine-exact.

    Scale: one map-side-combinable daily aggregate, one grouped sum —
    no window, no per-key ordering."""
    ord_ = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    daily = (
        ord_.groupBy("o_custkey", F.col("o_orderdate").cast("date").alias("dia"))
        .agg(F.sum(cents).alias("cents"))
    )
    mx = daily.agg(F.max("dia").alias("anchor"))
    return (
        daily.join(F.broadcast(mx))
        .withColumn("age", F.datediff(F.col("anchor"), F.col("dia")))
        .withColumn(
            "__d", F.expr("shiftright(cents, CAST(least(age div 7, 62) AS INT))")
        )
        .groupBy("o_custkey")
        .agg(
            F.sum("__d").alias("decayed_cents"),
            F.sum("cents").alias("raw_cents"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .orderBy("o_custkey")
    )
