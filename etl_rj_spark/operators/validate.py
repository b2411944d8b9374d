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


def referential_orphan_audit(
    relations: list[tuple[str, DataFrame, str, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key integrity audit: one row per relation with the child
    row count, NULL-key count, distinct-key count, and orphan count
    (child keys absent from the parent). ``relations`` entries are
    ``(label, child_df, child_key, parent_key, parent_df, _unused)``
    — label shows in the report; pass e.g.
    ``("lineitem.l_orderkey->orders.o_orderkey", li, "l_orderkey",
    "o_orderkey", orders, "")``.

    Each relation is ONE pass: left join the child's key column against
    the parent's distinct keys, then a single aggregate counts all four
    measures (the orphan test is "child key present, parent side null").
    The join shuffles both sides on the key — the honest shape for
    fact→fact relations; dimension parents broadcast automatically
    under AQE's size threshold. The per-relation outputs are 1-row
    frames unioned into the report.
    """
    if not relations:
        raise ValueError("referential_orphan_audit: empty relations list")
    reports = []
    for label, child, ck, pk, parent, _ in relations:
        keys = parent.select(F.col(pk).alias("__pk")).distinct()
        joined = child.select(F.col(ck).alias("__ck")).join(
            keys, F.col("__ck") == F.col("__pk"), "left"
        )
        reports.append(
            joined.agg(
                F.lit(label).alias("relation"),
                F.count(F.lit(1)).alias("child_rows"),
                F.sum(F.when(F.col("__ck").isNull(), 1).otherwise(0)).alias("null_keys"),
                F.countDistinct("__ck").alias("distinct_keys"),
                F.sum(
                    F.when(F.col("__ck").isNotNull() & F.col("__pk").isNull(), 1).otherwise(0)
                ).alias("orphan_rows"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def pk_uniqueness_audit(
    tables: list[tuple[str, DataFrame, list[str]]],
) -> DataFrame:
    """Primary-key integrity report — the other half of constraint
    checking beside ``referential_orphan_audit``: one row per table
    with the row count, distinct-key count, and the number of rows
    participating in a duplicated key (0 means the PK holds).
    Composite keys are checked as the column tuple. Each table costs
    one partial-aggregating pass keyed on its PK (per-key counts
    reduce map-side), then a tiny second aggregate over the key-count
    table; the 1-row results union into the report.
    """
    if not tables:
        raise ValueError("pk_uniqueness_audit: empty tables list")
    reports = []
    for label, df, key_cols in tables:
        per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__c"))
        reports.append(
            per_key.agg(
                F.lit(label).alias("table_name"),
                F.sum("__c").alias("n_rows"),
                F.count(F.lit(1)).alias("n_distinct_keys"),
                F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0)).alias(
                    "n_dup_rows"
                ),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def expectation_suite(
    df: DataFrame,
    rules: dict[str, Column],
    unique_cols: list[str] | None = None,
) -> DataFrame:
    """Deequ-style expectation run: evaluate every row-level rule in
    ONE aggregate pass over the table and emit a verification report —
    one row per rule with its violation count and a pass flag. Rules
    are predicates each row SHOULD satisfy; a NULL predicate result
    counts as a violation (unknown ≠ valid), matching
    ``with_validation_reasons``.

    ``unique_cols`` adds a ``unique(col)`` expectation per listed
    column, measured as ``count(col) − count(distinct col)`` inside the
    same aggregate (Spark plans the distinct via expand — still a
    single scan of the input, no per-rule re-filtering).

    The aggregate is a full-table reduction to ONE row (map-side
    partial aggregation does the heavy lifting; the shuffle moves one
    row per partition), then a constant-size ``stack`` unpivot to the
    report grain. Output: (rule, n_violations, passed), sorted by rule
    — a |rules|-row frame, broadcastable anywhere.

    EMPTY input yields 0 violations / passed=1 for every rule (SUM
    over zero rows is NULL in ANSI SQL — coalesced to 0 here, because
    an empty load trivially satisfies every row-level expectation; a
    NULL report row would read as "unknown" and block a release gate
    that should open — r10 degenerate-input sweep fix).
    """
    aggs = [
        F.coalesce(
            F.sum(F.when(~F.coalesce(pred, F.lit(False)), 1).otherwise(0)),
            F.lit(0),
        ).cast("bigint").alias(f"__v{i}")
        for i, (_, pred) in enumerate(rules.items())
    ]
    names = list(rules)
    for col in unique_cols or []:
        aggs.append(
            (F.count(col) - F.countDistinct(col)).cast("bigint").alias(
                f"__v{len(aggs)}"
            )
        )
        names.append(f"unique({col})")
    if any("'" in n for n in names):
        raise ValueError("rule names must not contain single quotes")
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', __v{i}" for i, n in enumerate(names))
    return (
        one.selectExpr(
            f"stack({len(names)}, {stack_args}) as (rule, n_violations)"
        )
        .select(
            "rule",
            F.col("n_violations").cast("bigint").alias("n_violations"),
            (F.col("n_violations") == 0).cast("int").alias("passed"),
        )
        .orderBy("rule")
    )
