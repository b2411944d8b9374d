"""Aggregate / snapshot operators A1-A5 (SURVEY.md §2.6).

``latest_snapshot`` is implemented as a join against the broadcast
1-row MAX aggregate rather than a driver-side ``.first()`` — no
collect, works unchanged on a cluster, and when the table is
partitioned by the snapshot column Catalyst turns it into dynamic
partition pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def latest_snapshot(df: DataFrame, snapshot_col: str) -> DataFrame:
    """A4 — ``WHERE col = (SELECT MAX(col) FROM t)`` (Cartera PDF §7)."""
    mx = df.agg(F.max(snapshot_col).alias("__max_snapshot"))
    return (
        df.join(F.broadcast(mx), F.col(snapshot_col) == F.col("__max_snapshot"))
        .drop("__max_snapshot")
    )


def distinct_values(df: DataFrame, col: str) -> DataFrame:
    """A1 — distinct values of a column (unmapped-client report,
    ventas_totales.py:154)."""
    return df.select(col).distinct()


def distinct_topk(df: DataFrame, col: str, k: int, ascending: bool = False) -> DataFrame:
    """A5 — ``SELECT DISTINCT TOP k col ORDER BY col`` (Cartera PDF §8:
    last two snapshot dates)."""
    order = F.col(col).asc() if ascending else F.col(col).desc()
    return df.select(col).distinct().orderBy(order).limit(k)


def money_sum(c: Column | str, scale: int = 2) -> Column:
    """Deterministic money aggregation: sum exact scaled integers, then
    one double division. Unlike a raw double SUM (whose value depends on
    partial-aggregation order), this is bit-identical across engines,
    partitionings and re-runs — required for oracle comparison and good
    hygiene for money anyway.
    """
    col = F.col(c) if isinstance(c, str) else c
    factor = 10 ** scale
    return F.sum(F.round(col * factor).cast("long")) / F.lit(float(factor))


def merge_partial_sums(state, delta, keys, sum_cols):
    """Incremental materialized-view maintenance: merge a stored
    partial-aggregate state (sums/counts per key) with a new batch's
    partials — each refresh costs O(|delta|) + one shuffle of the
    (small) key space, never a full-history recompute. Keep additive
    aggregates in exact integer form (counts, integer cents) so the
    merge is order-independent; derive averages at read time."""
    from pyspark.sql import functions as F

    return (
        state.unionByName(delta)
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
    )
