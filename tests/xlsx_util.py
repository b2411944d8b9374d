"""Back-compat shim: the stdlib .xlsx writer moved into the package
(etl_rj_spark/sinks/xlsx.py) so the coverage suite's Excel roundtrip
query can use it too."""

from etl_rj_spark.sinks.xlsx import write_xlsx  # noqa: F401
