"""The SQL surface must produce the same results as the DataFrame op
library — same engine through either API."""

from __future__ import annotations

from etl_rj_spark.analytics import REGISTRY
from etl_rj_spark.analytics.sql_surface import register_tables


def test_sql_equals_dataframe_api(spark, sf_dir):
    register_tables(spark, sf_dir)
    # §2.10 #2 trend aggregate via spark.sql vs the registry query
    sql_rows = spark.sql(
        """
        SELECT CAST(o_orderdate AS DATE) AS fecha_carga,
               SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))/CAST(100 AS DOUBLE)
                 AS total_cartera,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1 ORDER BY 1 DESC
        """
    ).collect()
    df_rows = REGISTRY["trend_total_by_snapshot"].build(spark, sf_dir).collect()
    assert sorted(map(str, sql_rows)) == sorted(map(str, df_rows))


def test_sql_window_and_subquery(spark, sf_dir):
    register_tables(spark, sf_dir)
    # A4 scalar subquery + W1 window, pure SQL
    rows = spark.sql(
        """
        SELECT o_custkey, o_totalprice,
               LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders
        WHERE o_orderdate >= (SELECT MAX(o_orderdate) FROM orders) - INTERVAL 365 DAYS
        """
    ).collect()
    assert len(rows) > 0
