"""Skew mitigation: salted broadcast-replicated join.

When a join key is heavily skewed (one client with 30% of the fact
rows — the reference's star schema invites exactly this), a plain
hash join sends the hot key to one task. ``salted_join`` splits the
hot key's rows across ``salt`` buckets deterministically and
replicates the (small) dimension once per bucket, so the hot key
spreads over ``salt`` tasks. Results are identical to the plain join.

AQE's skew-join handling (enabled in session defaults) covers
sort-merge joins automatically; this operator is the explicit tool for
when you need guaranteed spread (e.g. a hot key inside an aggregation
feeding a non-AQE-optimizable stage).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``facts ⋈ dim on (on)`` with the fact side salted into
    ``salt`` buckets (deterministic: hash of the full fact row's first
    column set — spreads rows, never changes results) and the dim side
    replicated ``salt`` times."""
    salted_facts = facts.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(salt))
    )
    replicas = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(salt)]))
    )
    out = salted_facts.join(replicas, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def skew_audit(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    threshold_ppm: int = 10_000,
) -> DataFrame:
    """Join/shuffle-key skew audit: the keys whose row share exceeds
    ``threshold_ppm`` (default 1%) — the pre-flight check that tells
    you whether a planned join/groupBy needs :func:`salted_join`, an
    AQE skew split, or a broadcast, BEFORE the 100 TB shuffle hangs on
    one reducer. Share is exact integer ppm ``(c·10⁶) div n``; NULL
    keys are reported as their own row (they hash to one reducer too —
    the most common real-world skew). One map-side-combinable
    aggregate; the total broadcasts back as one row.

    Returns (key cols…, n_rows, share_ppm), heavy keys only.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = df.agg(F.count(F.lit(1)).alias("__n"))
    return (
        counts.join(F.broadcast(total))
        .withColumn("share_ppm", F.expr("(n_rows * CAST(1000000 AS BIGINT)) div __n"))
        .filter(F.col("share_ppm") >= int(threshold_ppm))
        .drop("__n")
    )
