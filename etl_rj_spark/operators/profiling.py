"""Data profiling: per-column statistics in ONE pass over the table.

The reference's operational diagnostics (non-numeric counts,
ventas_totales.py:127-128; unmapped lists) generalized: a single
aggregation computes null counts, distinct estimates, and numeric
ranges for every requested column — one scan, one (tiny) result row,
regardless of table width. At 100 TB this is the profile you can
actually afford; per-column loops would scan the table N times.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    string_cols: Sequence[str] = (),
) -> DataFrame:
    """One-row frame of per-column stats: rows, nulls per column,
    exact distinct counts, min/max for numerics. Exact (not approx) so
    results are engine-comparable; swap countDistinct for
    approx_count_distinct when profiling at full scale."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in [*numeric_cols, *string_cols]:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}_nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}_distinct"))
    for c in numeric_cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.agg(*aggs)
