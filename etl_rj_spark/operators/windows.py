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


def future_window_label(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    id_col: str,
    horizon_days: int,
    label_col: str = "retained",
) -> DataFrame:
    """Supervised retention/churn labels WITHOUT leakage gymnastics:
    each row is labeled 1 iff the same group has ANOTHER event within
    ``horizon_days`` after it. Because events sorted by time make "any
    future event within the horizon" equivalent to "the NEXT event
    within the horizon", one ``lead`` over the (group, ts, id) window
    suffices — no self-join against the future, no per-row range scan.

    Also emits ``gap_seconds`` to the next event (NULL for each
    group's last event; its label is 0 — the right-censoring
    convention, callers typically drop rows whose observation window
    extends past the data's end). Deterministic: the window orders by
    (ts, id); gap arithmetic is exact integer micros → seconds.

    One shuffle on the group key — the same partitioning every other
    per-entity feature wants, so at scale this rides an existing
    repartition.
    """
    w = Window.partitionBy(group_col).orderBy(F.col(ts_col), F.col(id_col))
    nxt = F.lead(ts_col).over(w)
    # integer micros → whole seconds: subtract the remainder first so
    # the double division is exact (numerator a multiple of 10⁶, well
    # under 2^53) — same trick as the range-join bucketing
    diff = F.unix_micros(nxt) - F.unix_micros(F.col(ts_col))
    gap_s = ((diff - diff % F.lit(1_000_000)) / F.lit(1_000_000)).cast("long")
    return df.select(
        "*",
        F.when(
            nxt.isNotNull()
            & (nxt <= F.col(ts_col) + F.expr(f"INTERVAL {int(horizon_days)} DAYS")),
            1,
        )
        .otherwise(0)
        .alias(label_col),
        gap_s.alias("gap_seconds"),
    )
