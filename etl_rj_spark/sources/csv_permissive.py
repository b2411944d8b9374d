"""Schema-checked CSV ingest with dead-letter quarantine — the CSV
twin of :mod:`etl_rj_spark.sources.jsonl`.

The reference trusts its operational CSV exports (``pd.read_csv`` with
inference, ventas_totales.py:84); an unattended pipeline cannot. This
source reads with an EXPLICIT schema in PERMISSIVE mode, so a row with
the wrong column count or an untypeable cell lands in
``_corrupt_record`` with its raw line preserved (same column contract
as the JSONL source — ``quarantine_corrupt`` works on both), instead
of failing the job (FAILFAST) or silently vanishing (DROPMALFORMED).

Splittability: plain CSV splits by line like JSONL; the same .gz
caveat applies (one task per gz shard until a repartition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from etl_rj_spark.sources.jsonl import read_permissive


def read_csv_permissive(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    min_partitions: int | None = None,
) -> DataFrame:
    """Read CSV with an explicit schema; malformed rows carry their raw
    line in ``_corrupt_record`` (data columns null). Split good/bad
    with :func:`etl_rj_spark.sources.jsonl.quarantine_corrupt`.
    Delegates to the shared PERMISSIVE dead-letter reader so the
    corrupt-record wiring is single-sourced across formats."""
    return read_permissive(
        spark,
        path,
        schema,
        "csv",
        options={"header": str(header).lower()},
        min_partitions=min_partitions,
    )
