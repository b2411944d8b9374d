"""Merge/upsert emulation (CDC / SCD) without a table format.

Spark without Delta/Iceberg has no MERGE INTO; the equivalent
composition is union + keep-latest-per-key. ``merge_upsert`` is the
type-2-less upsert (latest version wins); pair it with the snapshot
sink's ``fecha_carga`` partitioning for point-in-time reads, which is
how the reference's warehouse answers "current state" questions
(MAX(FechaCarga) — SURVEY §1.1 snapshot-versioned facts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from etl_rj_spark.operators.curation import keep_latest


def merge_upsert(
    existing: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    version_cols: Sequence[str],
) -> DataFrame:
    """Rows = existing ∪ updates, one survivor per key: the greatest by
    ``version_cols`` (must end in a unique tiebreaker; ties across the
    two sides would otherwise be nondeterministic). New keys insert,
    existing keys update — MERGE INTO semantics as a pure dataflow."""
    unioned = existing.unionByName(updates)
    return keep_latest(unioned, keys, version_cols)
