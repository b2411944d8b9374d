"""The four reference ETL flows (SURVEY.md §3) recomposed from the
engine's sources, kernels, operators and sinks — lazy DataFrame
expression trees end-to-end (the reference executes the same dataflow
eagerly step-by-step in pandas)."""

from etl_rj_spark.pipelines.cartera import clean_cartera  # noqa: F401
from etl_rj_spark.pipelines.pending_orders import clean_pending_orders  # noqa: F401
from etl_rj_spark.pipelines.ventas import clean_ventas, load_ventas  # noqa: F401
from etl_rj_spark.pipelines.wor import (  # noqa: F401
    clean_category_tables,
    clean_forecast_tables,
    harvest_zone_quotas,
)
