"""Test-side alias of the packaged legacy .xls writer."""

from etl_rj_spark.sinks.xls_legacy import (  # noqa: F401
    build_workbook_stream,
    wrap_cfb,
    write_xls,
)
