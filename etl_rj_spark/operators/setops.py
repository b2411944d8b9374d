"""Set operators U1 (SURVEY.md §2.9)."""

from __future__ import annotations

from functools import reduce
from collections.abc import Sequence

from pyspark.sql import DataFrame


def union_all_by_name(dfs: Sequence[DataFrame]) -> DataFrame:
    """U1 — UNION ALL of per-(zone,month) extracted tables
    (pd.concat, wor2.py:188,300-301). Name-based, not positional, with
    missing columns null-padded — month-to-month schema drift is the
    reference's normal case."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
