"""Projection / column ops P1-P5 (SURVEY.md §2.3).

The reference's schema system is dynamic/positional/convention-based
(SURVEY §1.3): hardcoded rename dicts whose keys include trailing
spaces, positional renames by column index, keep-if-present subsets,
and a "first present column" rule for exports that vary.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rename_map(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P2 — rename by dict, missing keys ignored (pandas ``df.rename``
    semantics; ventas_totales.py:107-122, cartera.py:77-87)."""
    present = {k: v for k, v in mapping.items() if k in df.columns}
    return df.withColumnsRenamed(present)


def rename_positional(df: DataFrame, positions: Mapping[int, str]) -> DataFrame:
    """P3 — overwrite column names by index (wor2.py:256-262)."""
    names = list(df.columns)
    for idx, new in positions.items():
        names[idx] = new
    return df.toDF(*names)


def select_present(df: DataFrame, wanted: Sequence[str]) -> DataFrame:
    """P4 — keep-if-present subset projection (pending_orders.py:151-155,
    wor2.py:227-228)."""
    return df.select(*[c for c in wanted if c in df.columns])


def first_present_column(df: DataFrame, candidates: Sequence[str]) -> str:
    """Flexible column detection (pending_orders.py:74-77): the first of
    ``candidates`` present in the schema ('Validated Status ' else
    'Status ')."""
    for c in candidates:
        if c in df.columns:
            return c
    raise ValueError(f"none of {candidates!r} present in {df.columns}")


def with_literals(df: DataFrame, **values) -> DataFrame:
    """P5 — add literal columns (FechaCarga stamp cartera.py:179,
    id_cliente=0 wor2.py:216). Column values pass through; plain Python
    values become literals."""
    cols = {k: v if isinstance(v, Column) else F.lit(v) for k, v in values.items()}
    return df.withColumns(cols)
