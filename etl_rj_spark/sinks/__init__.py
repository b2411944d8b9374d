"""Sinks K1/K2 (SURVEY.md §2.2): snapshot and incremental appends."""

from etl_rj_spark.sinks.incremental import append_incremental, upsert_jdbc  # noqa: F401
from etl_rj_spark.sinks.snapshot import append_snapshot  # noqa: F401
from etl_rj_spark.sinks.layout import write_clustered_parquet  # noqa: F401
