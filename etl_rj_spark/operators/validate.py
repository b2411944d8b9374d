"""Rule-based row validation with a quarantine split.

The reference's correctness practice is console diagnostics: it counts
non-numeric amounts (ventas_totales.py:127-128) and prints unmapped
client names (ventas_totales.py:154-156), then silently drops the rows.
At warehouse scale that becomes a dead-letter pattern: every row either
passes all rules or lands in a quarantine table carrying WHICH rules it
failed — auditable, reprocessable, and computed in the same single pass
as the load (one scan, no per-rule re-filtering).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REASONS_COL = "reasons"


def with_validation_reasons(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Add an array column ``reasons`` listing every rule (by name, in
    rule order) whose predicate is NOT satisfied. A null predicate
    result counts as a failure (unknown ≠ valid)."""
    flags = [
        F.when(~F.coalesce(pred, F.lit(False)), F.lit(name)) for name, pred in rules.items()
    ]
    return df.withColumn(REASONS_COL, F.array_compact(F.array(*flags)))


def quarantine_split(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined): valid rows drop the reasons column,
    quarantined rows keep it. Both sides derive from one flagged plan —
    persist the flagged frame upstream if both sides are consumed."""
    flagged = with_validation_reasons(df, rules)
    valid = flagged.filter(F.size(REASONS_COL) == 0).drop(REASONS_COL)
    quarantined = flagged.filter(F.size(REASONS_COL) > 0)
    return valid, quarantined
