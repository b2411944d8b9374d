"""Filter operators F1-F5 (SURVEY.md §2.4)."""

from __future__ import annotations

from functools import reduce
from operator import or_
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_null_rows(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """F1 — drop rows whose dim lookup failed (dropna(subset=...),
    ventas_totales.py:158 etc.)."""
    return df.na.drop(subset=list(cols))


def rows_where_no_column_contains(
    df: DataFrame, needle: str, cols: Sequence[str] | None = None
) -> DataFrame:
    """F3 — drop rows where ANY column's string form contains ``needle``
    (subtotal-row scrub, wor2.py:269). An empty ``cols`` list scans
    nothing and keeps every row (r9 review fix: ``reduce`` over an
    empty iterable raised an opaque TypeError when a caller's column
    filter matched nothing)."""
    cols = list(cols) if cols is not None else df.columns
    if not cols:
        return df
    hit = reduce(or_, [F.col(c).cast("string").contains(needle) for c in cols])
    # null.contains -> null; treat null as "no hit" like pandas str.contains(na=False)
    return df.filter(~F.coalesce(hit, F.lit(False)))


def drop_leading_rows(df: DataFrame, index_col: str, n: int) -> DataFrame:
    """F5 — drop the first ``n`` data rows using a captured source row
    index (wor2.py:268 drops a repeated header row). Order-dependent:
    requires the source to have attached ``index_col`` (sources.trimmed_csv
    does)."""
    return df.filter(F.col(index_col) >= n)
