"""Sources S1-S6 (SURVEY.md §2.1): parquet tables, messy CSV with
header/footer junk, Excel named-table discovery, JDBC."""

from etl_rj_spark.sources.parquet import read_parquet_table  # noqa: F401
