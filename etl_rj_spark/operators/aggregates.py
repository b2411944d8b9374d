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


def prorate_largest_remainder(
    lines: DataFrame,
    group_cols: list[str],
    weight_col: str,
    total_col: str,
    tiebreak_cols: list[str],
    out_col: str = "alloc",
) -> DataFrame:
    """Exact proration by the largest-remainder (Hamilton) method:
    distribute each group's integer ``total_col`` across its rows in
    proportion to ``weight_col`` so the allocations are integers that
    SUM EXACTLY to the total — the invariant float proration loses a
    cent on. Every row gets ``floor(total·w / W)``; the leftover
    ``R < n`` cents go one each to the R rows with the largest scaled
    remainder (ties by ``tiebreak_cols`` — rows identical on weight and
    every tiebreak are interchangeable, so the allocation multiset is
    deterministic).

    All arithmetic is decimal(38,0) products and floor division — no
    float. Three window passes over ONE group partitioning (weight
    total, base-allocation total, remainder rank); at scale this is a
    single shuffle on the group key. ``total_col`` must be constant
    within each group (it rides on every line, the join the caller
    already did).

    (Internal columns avoid any name that is a case-variant of a
    plausible caller column: Spark resolves case-insensitively by
    default, so an internal ``__W`` silently binds to a caller's
    ``__w`` — the same identifier-collision class as the r7 DuckDB
    oracle bug, caught by ``stratified_split_exact``.)"""
    from pyspark.sql import Window

    g = Window.partitionBy(*group_cols)
    dec = f"cast({total_col} as decimal(38,0)) * cast({weight_col} as decimal(38,0))"
    w_total = F.sum(F.col(weight_col).cast("decimal(38,0)")).over(g)
    step = lines.withColumn("__wsum", w_total).withColumn(
        "__base", F.expr(f"cast(({dec}) div __wsum as bigint)")
    ).withColumn(
        # scaled remainder: total·w − base·wsum ∈ [0, wsum)
        "__rem", F.expr(f"cast(({dec}) - cast(__base as decimal(38,0)) * __wsum as decimal(38,0))")
    )
    rank_w = Window.partitionBy(*group_cols).orderBy(
        F.desc("__rem"), *[F.col(c) for c in tiebreak_cols]
    )
    step = step.withColumn("__topup", F.col(total_col) - F.sum("__base").over(g)).withColumn(
        "__rk", F.row_number().over(rank_w)
    )
    return step.withColumn(
        out_col,
        F.col("__base") + F.when(F.col("__rk") <= F.col("__topup"), 1).otherwise(0),
    ).drop("__wsum", "__base", "__rem", "__topup", "__rk")
