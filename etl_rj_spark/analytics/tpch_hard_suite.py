"""TPC-H hard shapes — the classically difficult join/subquery patterns
(Q6/Q7/Q8/Q10/Q13/Q14/Q15/Q18/Q21/Q22, plus the partsupp family
Q2/Q11/Q20 over an in-query derived partsupp), adapted to the driver's
schema (no partsupp / l_receiptdate / c_phone / o_comment columns, so
Q21/Q22 use documented stand-in predicates with identical plan shapes
and Q2/Q11/Q20 synthesize partsupp deterministically from part × {0..3}).

These exercise what the earlier tpch_suite does not: OR'd join-pair
predicates (Q7), conditional-ratio aggregates (Q8/Q14), outer-join count
distributions that must keep zero groups (Q13), scalar-subquery equality
against an aggregate (Q15/Q22), IN-subquery on a grouped HAVING (Q18),
and the exactly-one-late-supplier double-filter (Q21).

Scale notes (100 TB posture): every query keeps filters against base
scans (pushdown), joins dims via broadcast, and does big-big joins only
on orders⋈lineitem where AQE picks SMJ/shuffled-hash by size. The Q13
distribution and Q21 per-order flags are two-level aggregations that
combine map-side partials before the second shuffle.

Reference tie-in: the reference's star schema implies exactly these
read patterns at warehouse scale (SURVEY §2.10 generalized); the
incremental loaders' anti-join (ventas_totales.py:205-209) is the same
plan family as Q21/Q22's NOT EXISTS.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_rj_spark.analytics.suite import _msum, _q, _t
from etl_rj_spark.operators.aggregates import money_sum

# Exact integer-cents column (shared determinism contract with _msum).
def _cents(col):
    return F.round(col * 100).cast("bigint")


@_q(
    "forecast_revenue_q6",
    f"""
    SELECT {_msum('l_extendedprice * l_discount', 'revenue')}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.08 AND l_quantity < 24
    """,
    tags=("A3", "tpch-q6", "pushdown"),
)
def forecast_revenue_q6(spark, sf_dir):
    """TPC-H Q6: single-scan conditional revenue — the pure
    filter-pushdown benchmark (all three predicates reach the parquet
    scan; no joins, no shuffle beyond the final 1-row agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.04, 0.08)
            & (F.col("l_quantity") < 24)
        )
        .agg(money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@_q(
    "volume_shipping_q7",
    f"""
    SELECT supp_region, cust_region, l_year, {_msum('volume', 'revenue')}
    FROM (
      SELECT rs.r_name AS supp_region, rc.r_name AS cust_region,
             YEAR(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ns ON s_nationkey = ns.n_nationkey
      JOIN nation nc ON c_nationkey = nc.n_nationkey
      JOIN region rs ON ns.n_regionkey = rs.r_regionkey
      JOIN region rc ON nc.n_regionkey = rc.r_regionkey
      WHERE ((rs.r_name = 'EUROPE' AND rc.r_name = 'ASIA')
          OR (rs.r_name = 'ASIA' AND rc.r_name = 'EUROPE'))
        AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    ) GROUP BY supp_region, cust_region, l_year
    ORDER BY supp_region, cust_region, l_year
    """,
    tags=("J1", "A3", "tpch-q7"),
)
def volume_shipping_q7(spark, sf_dir):
    """TPC-H Q7 (region-pair variant — the 10-supplier small SF can
    lack any given nation, regions always exist): revenue shipped
    between two regions in either direction. The OR'd pair predicate
    cannot become a join key — it is applied post-join on broadcast dim
    columns, so the only shuffle is orders⋈lineitem."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    ns = n.alias("ns")
    nc = n.alias("nc")
    rs = r.alias("rs")
    rc = r.alias("rc")
    j = (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns.n_nationkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc.n_nationkey"))
        .join(F.broadcast(rs), F.col("ns.n_regionkey") == F.col("rs.r_regionkey"))
        .join(F.broadcast(rc), F.col("nc.n_regionkey") == F.col("rc.r_regionkey"))
        .select(
            F.col("rs.r_name").alias("supp_region"),
            F.col("rc.r_name").alias("cust_region"),
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .filter(
            ((F.col("supp_region") == "EUROPE") & (F.col("cust_region") == "ASIA"))
            | ((F.col("supp_region") == "ASIA") & (F.col("cust_region") == "EUROPE"))
        )
    )
    return (
        j.groupBy("supp_region", "cust_region", "l_year")
        .agg(money_sum(F.col("volume")).alias("revenue"))
        .orderBy("supp_region", "cust_region", "l_year")
    )


@_q(
    "market_share_q8",
    """
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_region = 'EUROPE'
                    THEN CAST(ROUND(volume*100) AS BIGINT) ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(ROUND(volume*100) AS BIGINT)) AS DOUBLE) AS mkt_share
    FROM (
      SELECT YEAR(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             rs.r_name AS supp_region
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation nc ON c_nationkey = nc.n_nationkey
      JOIN region rcr ON nc.n_regionkey = rcr.r_regionkey
      JOIN nation ns ON s_nationkey = ns.n_nationkey
      JOIN region rs ON ns.n_regionkey = rs.r_regionkey
      WHERE rcr.r_name = 'ASIA' AND p_type = 'PROMO'
    ) GROUP BY o_year ORDER BY o_year
    """,
    tags=("J1", "A3", "tpch-q8", "conditional-ratio"),
)
def market_share_q8(spark, sf_dir):
    """TPC-H Q8 (region market share): fraction of ASIA-customer PROMO
    revenue supplied from EUROPE, per order year. The ratio divides two
    exact cent sums (deterministic under any partial-agg order); the
    division is double/double in BOTH engines (Spark SQL BIGINT/BIGINT
    would yield DECIMAL — hence the explicit casts in the oracle)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    nc = n.alias("nc")
    ns = n.alias("ns")
    rcr = r.alias("rcr").filter(F.col("r_name") == "ASIA")
    rs = r.alias("rs")
    j = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc.n_nationkey"))
        .join(F.broadcast(rcr), F.col("nc.n_regionkey") == F.col("rcr.r_regionkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns.n_nationkey"))
        .join(F.broadcast(rs), F.col("ns.n_regionkey") == F.col("rs.r_regionkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("vol_c"),
            F.col("rs.r_name").alias("supp_region"),
        )
    )
    agg = j.groupBy("o_year").agg(
        F.sum(F.when(F.col("supp_region") == "EUROPE", F.col("vol_c")).otherwise(F.lit(0))).alias("num_c"),
        F.sum("vol_c").alias("den_c"),
    )
    return agg.select(
        "o_year",
        (F.col("num_c").cast("double") / F.col("den_c").cast("double")).alias("mkt_share"),
    ).orderBy("o_year")


@_q(
    "returned_item_reporting_q10",
    f"""
    SELECT c_custkey, c_name, n_name AS nation,
           {_msum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    bench=True,
    tags=("J1", "A3", "O1", "O2", "tpch-q10"),
)
def returned_item_reporting_q10(spark, sf_dir):
    """TPC-H Q10: customers who returned the most revenue in a half-year
    window — date filter pushes into the orders scan, returnflag into
    lineitem, nation broadcasts; unique c_custkey breaks revenue ties."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@_q(
    "order_count_distribution_q13",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    tags=("J1", "A3", "tpch-q13", "outer-join"),
)
def order_count_distribution_q13(spark, sf_dir):
    """TPC-H Q13 (priority stand-in for the o_comment NOT LIKE filter —
    column absent here): distribution of non-urgent order counts per
    customer. The left join + COUNT(o_orderkey) keeps zero-order
    customers (COUNT of the null right side is 0, not 1) — the shape
    an inner join silently gets wrong."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@_q(
    "promo_revenue_q14",
    """
    SELECT CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)
                     ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS DOUBLE)
           AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    tags=("J1", "A3", "tpch-q14", "conditional-ratio"),
)
def promo_revenue_q14(spark, sf_dir):
    """TPC-H Q14: percent of one month's revenue from PROMO parts —
    conditional cent-sum over a broadcast part join; the 100.0 factor
    stays in double on both engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).select(
        F.col("p_type"),
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_c"),
    )
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_c")).otherwise(F.lit(0))).alias("num_c"),
        F.sum("rev_c").alias("den_c"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("num_c").cast("double") / F.col("den_c").cast("double")).alias(
            "promo_share_pct"
        )
    )


@_q(
    "top_supplier_q15",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {_msum('l_extendedprice * (1 - l_discount)', 'total_revenue')}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("A3", "scalar-subquery", "tpch-q15"),
)
def top_supplier_q15(spark, sf_dir):
    """TPC-H Q15: supplier(s) with the max quarterly revenue. The MAX
    scalar subquery is a broadcast cross-join of a 1-row aggregate (kept
    lazy — no driver-side collect); equality compares identical
    cent-exact doubles so ties and float drift cannot diverge."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@_q(
    "large_volume_customers_q18",
    f"""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS fecha, o_totalprice,
           {_msum('l_quantity', 'sum_qty')}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 180
    )
    GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    bench=True,
    tags=("J1", "J-semi", "A3", "tpch-q18"),
)
def large_volume_customers_q18(spark, sf_dir):
    """TPC-H Q18: customers with orders totalling > 180 units. The IN
    subquery is a left-semi join against a grouped HAVING — at scale the
    semi side is itself a shuffle agg over lineitem, so AQE decides
    broadcast vs shuffled semi by the surviving key count. l_quantity is
    integer-valued; the cent-sum keeps the shared determinism contract."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 180)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "big_orderkey"),
        F.col("o_orderkey") == F.col("big_orderkey"),
        "left_semi",
    )
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("fecha"),
            "o_totalprice",
        )
        .agg(money_sum(F.col("l_quantity")).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@_q(
    "exclusive_late_supplier_q21",
    """
    WITH flags AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 180 DAY THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_orderkey, l_suppkey
    ),
    culprit AS (
      SELECT l_orderkey FROM flags
      GROUP BY l_orderkey HAVING COUNT(*) >= 2 AND SUM(late) = 1
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM flags
    JOIN culprit USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE late = 1
    GROUP BY s_name ORDER BY numwait DESC, s_name
    """,
    bench=True,
    tags=("J-semi", "J-anti", "A3", "tpch-q21"),
)
def exclusive_late_supplier_q21(spark, sf_dir):
    """TPC-H Q21 (l_receiptdate absent — "late" = shipped >180 days
    after order date): suppliers who were the SOLE late supplier on
    multi-supplier orders. The classic EXISTS/NOT-EXISTS pair is
    re-expressed as one per-(order,supplier) flag aggregation plus a
    per-order HAVING — two map-side-combinable aggs and one reused
    intermediate instead of three correlated scans of lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    flags = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 180 DAY"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("late")
        )
    )
    # r16 (guide §2.4 — same-key operations share one exchange): the
    # r15 shape materialized `flags` (localCheckpoint) so the culprit
    # aggregate and the semi-join-back could reuse it — one scan per
    # table, but still TWO l_orderkey-keyed operations (the groupBy
    # exchange + the semi-join's own exchange+sorts) plus the barrier's
    # materialize/read round-trip. The per-order culprit stats are a
    # WINDOW over the partitioning both branches already needed:
    # count(*) / sum(late) OVER (PARTITION BY l_orderkey) computes
    # n_supp/n_late on every flags row in ONE exchange, the culprit
    # condition becomes a row-local filter, and the semi-join AND the
    # checkpoint disappear — `flags` has a single consumer again, so
    # the lazy plan reads each table once by construction. Plan: the
    # r15 shape's 5 exchanges + 1 SortMergeJoin + 2 jobs → 4 exchanges,
    # 0 SMJ, 1 job. Identical rows: the window filter keeps exactly
    # the flags rows the semi-join kept (late=1 rows of orders with
    # n_supp ≥ 2 and n_late = 1).
    from pyspark.sql import Window

    wo = Window.partitionBy("l_orderkey")
    s = _t(spark, sf_dir, "supplier")
    return (
        flags.select(
            "l_suppkey",
            "late",
            F.count(F.lit(1)).over(wo).alias("n_supp"),
            F.sum("late").over(wo).alias("n_late"),
        )
        .filter((F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@_q(
    "dormant_customers_q22",
    """
    WITH threshold AS (
      SELECT CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_c
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name AS nation, COUNT(*) AS numcust,
           SUM(CAST(ROUND(c_acctbal*100) AS BIGINT))/100.0 AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE CAST(CAST(ROUND(c_acctbal*100) AS BIGINT) AS DOUBLE) > (SELECT avg_c FROM threshold)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY n_name ORDER BY n_name
    """,
    tags=("J-anti", "scalar-subquery", "A3", "tpch-q22"),
)
def dormant_customers_q22(spark, sf_dir):
    """TPC-H Q22 (no c_phone → country-code filter dropped; "no orders"
    → "no orders since 2000-01-01", because every customer has some
    order in this dataset): wealthy-but-dormant customers per nation.
    The average threshold is computed in exact cents then divided as
    double (identical in both engines regardless of sum order); the
    NOT EXISTS is a left-anti join against the date-filtered orders."""
    c = _t(spark, sf_dir, "customer")
    bal_c = _cents(F.col("c_acctbal"))
    thr = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(bal_c).cast("double") / F.count(F.lit(1))).alias("avg_c")
        )
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(thr))
        .filter(bal_c.cast("double") > F.col("avg_c"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(bal_c) / F.lit(100.0)).alias("totacctbal"),
        )
        .orderBy("nation")
    )


@_q(
    "grouping_sets_flag_status",
    f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING_ID(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n, {_msum('l_extendedprice', 'total_price')}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    -- empty-input parity: Spark's groupingSets emits 0 rows, ANSI
    -- emits the () grand total; only that row can have n = 0 (r10)
    HAVING COUNT(*) > 0
    ORDER BY gid, l_returnflag, l_linestatus
    """,
    tags=("A3", "grouping-sets"),
)
def grouping_sets_flag_status(spark, sf_dir):
    """Explicit GROUPING SETS (completes the rollup/cube family —
    SURVEY §2.6 extension) with GROUPING_ID disambiguating the
    super-aggregate null rows. Spark's expand-based plan computes all
    three sets in one pass over lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id("l_returnflag", "l_linestatus").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            money_sum(F.col("l_extendedprice")).alias("total_price"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


@_q(
    "product_profit_q9",
    f"""
    SELECT nation, o_year, {_msum('amount', 'sum_profit')}
    FROM (
      SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    ) GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("J1", "A3", "tpch-q9"),
)
def product_profit_q9(spark, sf_dir):
    """TPC-H Q9 (no partsupp → supply cost modeled as 60% of retail
    price): per-nation, per-year profit on widget parts. Negative
    amounts are routine here — the cent-sum contract is signed, so the
    aggregate stays order-exact. The LIKE filter pushes into the part
    scan; part and every dim broadcast, orders⋈lineitem is the big-big
    join."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    j = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
            ).alias("amount"),
        )
    )
    return (
        j.groupBy("nation", "o_year")
        .agg(money_sum(F.col("amount")).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@_q(
    "parts_supplier_counts_q16",
    """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_type <> 'PROMO' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    tags=("J-anti", "distinct-agg", "tpch-q16"),
)
def parts_supplier_counts_q16(spark, sf_dir):
    """TPC-H Q16 (lineitem stands in for partsupp as the part↔supplier
    relation; negative account balance stands in for the complaints
    filter): distinct supplier count per brand/size, excluding
    blacklisted suppliers. The NOT IN is a left_anti join — safe here
    because s_suppkey is non-null; with nullable keys NOT IN's
    three-valued logic would need the null-safe variant
    (operators.dedup on_null_key='match')."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    li = _t(spark, sf_dir, "lineitem")
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


@_q(
    "shipping_priority_counts_q12",
    """
    SELECT YEAR(l_shipdate) AS ship_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY YEAR(l_shipdate) ORDER BY ship_year
    """,
    tags=("J1", "A3", "tpch-q12", "conditional-count"),
)
def shipping_priority_counts_q12(spark, sf_dir):
    """TPC-H Q12 (no l_shipmode/l_receiptdate → "slow shipments" =
    shipped >90 days after ordering, per ship year): how many high- vs
    low-priority orders ride the slow path. The two-way conditional
    count is one pass — a CASE pair inside the aggregate, not two
    filtered scans."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


@_q(
    "disjunctive_revenue_q19",
    f"""
    SELECT {_msum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#5' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
    tags=("J1", "A3", "tpch-q19", "disjunctive-pushdown"),
)
def disjunctive_revenue_q19(spark, sf_dir):
    """TPC-H Q19 (no p_container/l_shipmode → brand/size/quantity
    triplets): revenue matching any of three AND-groups. The classic
    optimizer test: the part-only conjuncts of each branch should
    factor out to the part scan (CNF extraction), the join stays a
    single broadcast, and the mixed part×lineitem residual evaluates
    post-join — not three unioned scans."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.filter(cond).agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


# --- Q2 / Q11 / Q20: the partsupp family over a derived partsupp -----------
#
# The driver schema has no partsupp table, so these three shapes run on a
# partsupp DERIVED deterministically from part × {0..3} with pure integer
# arithmetic — identical expressions in Spark and DuckDB, the same
# synthesize-in-query pattern the dup-corpus queries use. Columns:
#   ps_suppkey        = (p_partkey + i) % (#suppliers)   (4 distinct/part)
#   ps_availqty       = (p_partkey*7 + i*13) % 9999 + 1
#   ps_supplycost_c   = (p_partkey*31 + i*17) % 100000 + 100   (integer cents)
# Supply cost stays in exact integer cents everywhere (the repo-wide money
# determinism contract), so every aggregate below is engine-exact.

_PARTSUPP_SQL = """
    partsupp AS (
      SELECT p_partkey AS ps_partkey,
             (p_partkey + g.i) % (SELECT COUNT(*) FROM supplier) AS ps_suppkey,
             (p_partkey * 7 + g.i * 13) % 9999 + 1 AS ps_availqty,
             (p_partkey * 31 + g.i * 17) % 100000 + 100 AS ps_supplycost_c
      FROM part CROSS JOIN range(0, 4) g(i)
    )
"""


def _derived_partsupp(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    nsupp = F.broadcast(
        _t(spark, sf_dir, "supplier").agg(F.count("*").alias("__nsupp"))
    )
    return (
        p.crossJoin(nsupp)
        .select(
            "p_partkey",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("__i"),
            "__nsupp",
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") + F.col("__i")) % F.col("__nsupp")).alias("ps_suppkey"),
            ((F.col("p_partkey") * 7 + F.col("__i") * 13) % 9999 + 1).alias("ps_availqty"),
            ((F.col("p_partkey") * 31 + F.col("__i") * 17) % 100000 + 100).alias(
                "ps_supplycost_c"
            ),
        )
    )


@_q(
    "min_cost_supplier_q2",
    f"""
    WITH {_PARTSUPP_SQL},
    cand AS (
      SELECT p.p_partkey, p.p_type, ps.ps_supplycost_c, s.s_name, s.s_acctbal,
             n.n_name,
             row_number() OVER (PARTITION BY p.p_partkey
                                ORDER BY ps.ps_supplycost_c, ps.ps_suppkey) AS rn
      FROM part p
      JOIN partsupp ps ON ps.ps_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE p.p_size <= 25 AND p.p_type = 'ECONOMY' AND r.r_name = 'EUROPE'
    )
    SELECT p_partkey, s_name, n_name, s_acctbal, ps_supplycost_c AS min_cost_c
    FROM cand WHERE rn = 1
    """,
    tags=("tpch-q2", "groupwise-min", "partsupp-derived"),
)
def min_cost_supplier_q2(spark, sf_dir):
    """TPC-H Q2 on the derived partsupp: cheapest in-region supplier
    per filtered part — the groupwise-min join with deterministic
    (cost, suppkey) tie-break. Plan: partsupp derives from the part
    scan (no extra table), supplier/nation/region broadcast, one
    window over the filtered candidates."""
    ps = _derived_partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 25) & (F.col("p_type") == "ECONOMY")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cand = (
        ps.join(p.select("p_partkey"), ps.ps_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("p_partkey").orderBy("ps_supplycost_c", "ps_suppkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey", "s_name", "n_name", "s_acctbal",
            F.col("ps_supplycost_c").alias("min_cost_c"),
        )
    )


@_q(
    "important_stock_q11",
    f"""
    WITH {_PARTSUPP_SQL},
    scoped AS (
      SELECT ps.ps_partkey, ps.ps_supplycost_c * ps.ps_availqty AS value_c
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_0', 'NATION_1', 'NATION_2')
    )
    SELECT ps_partkey, CAST(SUM(value_c) AS BIGINT) AS stock_value_c
    FROM scoped
    GROUP BY ps_partkey
    HAVING SUM(value_c) > (SELECT SUM(value_c) * 0.001 FROM scoped)
    """,
    tags=("tpch-q11", "having-scalar-subquery", "partsupp-derived"),
)
def important_stock_q11(spark, sf_dir):
    """TPC-H Q11 on the derived partsupp: per-part stock value for a
    nation group, kept only when above a fraction of the TOTAL value —
    the grouped-HAVING-against-global-scalar shape. The total is a
    1-row broadcast (never a driver collect); all value arithmetic is
    exact integer cents, the 0.001 threshold compare is
    integer × literal on both engines."""
    ps = _derived_partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_0", "NATION_1", "NATION_2")
    )
    scoped = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_c") * F.col("ps_availqty")).alias("value_c"),
        )
    )
    total = F.broadcast(scoped.agg(F.sum("value_c").alias("__total_c")))
    return (
        scoped.groupBy("ps_partkey")
        .agg(F.sum("value_c").alias("stock_value_c"))
        .crossJoin(total)
        .filter(F.col("stock_value_c") > F.col("__total_c") * 0.001)
        .select("ps_partkey", "stock_value_c")
    )


@_q(
    "promotion_suppliers_q20",
    f"""
    WITH {_PARTSUPP_SQL},
    shipped AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    excess AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM partsupp ps
      JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_type = 'SMALL'
      JOIN shipped sh ON sh.l_partkey = ps.ps_partkey AND sh.l_suppkey = ps.ps_suppkey
      WHERE 2.0 * ps.ps_availqty > sh.qty
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT ps_suppkey FROM excess)
      AND n.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
    """,
    tags=("tpch-q20", "nested-semi-join", "partsupp-derived"),
)
def promotion_suppliers_q20(spark, sf_dir):
    """TPC-H Q20 on the derived partsupp: suppliers holding excess
    stock (availqty > half the year's shipped quantity) of SMALL parts,
    in a nation group — the nested-semi-join shape (partsupp semi
    lineitem-agg, supplier semi the result). l_quantity values are
    small integers, so SUM is exact in double and the half-compare is
    written 2·availqty > qty to stay away from .5 rounding."""
    li = _t(spark, sf_dir, "lineitem")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    ps = _derived_partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    excess = (
        ps.join(F.broadcast(p.select("p_partkey")), ps.ps_partkey == F.col("p_partkey"))
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey) & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(2.0 * F.col("ps_availqty") > F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4")
    )
    return (
        s.join(excess, s.s_suppkey == excess.ps_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )
