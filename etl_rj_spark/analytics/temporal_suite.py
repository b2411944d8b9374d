"""Oracle-checked queries for the temporal-join and skew operators.

DuckDB has native ASOF JOIN and unconstrained inequality joins, so the
oracles state the *semantics* directly while the Spark side proves the
scalable composition (union+window as-of; bucketized range join)
computes exactly the same thing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_rj_spark.analytics.suite import _msum, _q, _t
from etl_rj_spark.operators.asof import asof_join, range_join_count
from etl_rj_spark.operators.aggregates import money_sum
from etl_rj_spark.operators.skew import salted_join


@_q(
    "asof_purchase_last_view",
    """
    WITH v AS (SELECT user_id, ts, MAX(event_id) AS view_event_id
               FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.ts,
           v.ts AS asof_ts, v.view_event_id AS asof_view_event_id
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    bench=True,
    tags=("asof-join",),
)
def asof_purchase_last_view(spark, sf_dir):
    """As-of join: for each purchase, the user's most recent view at or
    before it (null when none). Spark side: tagged union + one window
    sort per user — no per-group Python, one shuffle."""
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    return asof_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts",
        right_values=["view_event_id"],
    )


@_q(
    "range_join_error_clicks",
    """
    WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT e.event_id, e.user_id, e.ts, COUNT(c.ts) AS n_clicks
    FROM e LEFT JOIN c
      ON c.user_id = e.user_id AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 3600 SECOND
    GROUP BY 1, 2, 3
    """,
    bench=True,
    tags=("range-join",),
)
def range_join_error_clicks(spark, sf_dir):
    """Range join: clicks within 1 hour after each error, counted per
    error. Spark side: time-bucketized equi-join (each left row probes
    2 buckets) + exact range filter — no BroadcastNestedLoopJoin."""
    e = _t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    return range_join_count(
        errors, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        window_seconds=3600, count_alias="n_clicks",
    )


@_q(
    "salted_customer_rollup",
    f"""
    SELECT c_name AS nombre_cliente, COUNT(*) AS n_orders,
           {_msum('o_totalprice', 'total')}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_name
    """,
    tags=("skew", "J1"),
)
def salted_customer_rollup(spark, sf_dir):
    """Skew-mitigated join: fact side salted into 8 buckets, dimension
    replicated per bucket — results provably identical to the plain
    join (the oracle IS the plain join)."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = salted_join(o, c, on="c_custkey", salt=8)
    return joined.groupBy(F.col("c_name").alias("nombre_cliente")).agg(
        F.count("*").alias("n_orders"), money_sum("o_totalprice").alias("total")
    )
