"""Window operators W1 (SURVEY.md §2.7) + sessionization.

W1 (LAG day-over-day delta) is the one reference-cited window op
(Cartera PDF §8); sessionization is the standard gap-based pattern the
events table exercises.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_lag_delta(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    value_col: str,
    prev_name: str = "prev_value",
    delta_name: str = "delta",
) -> DataFrame:
    """W1 — ``LAG(value) OVER (PARTITION BY ... ORDER BY ...)`` plus the
    day-over-day delta (Cartera PDF §8). ``order_by`` should be a total
    order (include a unique tiebreaker) for deterministic results."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    prev = F.lag(value_col).over(w)
    return df.withColumn(prev_name, prev).withColumn(
        delta_name, F.col(value_col) - F.col(prev_name)
    )


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids per user: a new session starts when
    the time since the previous event exceeds ``gap_seconds``.

    Two stacked windows over the same (user, ts) partitioning — one
    shuffle, both windows reuse the sort.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    # integer-microsecond epoch: exact arithmetic, so a gap of exactly
    # ``gap_seconds`` can never ulp-flip across engines (a float epoch
    # did, at the 1800 s boundary); unix_timestamp alone would truncate
    # to seconds and misclassify sub-second gaps
    epoch = F.unix_micros(F.col(ts_col))
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
