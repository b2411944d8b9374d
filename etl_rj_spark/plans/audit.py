"""Plan-audit helpers (SURVEY §7 step 9 — the 100 TB posture checks).

``explain_counts`` summarizes the physical plan features that matter
at scale: join strategies, shuffle (Exchange) count, scan count.
Tests pin these for the flagship queries so a regression that silently
turns a broadcast join into a shuffle join, or drops a pushed filter,
fails CI — plan shape is part of the contract, not a side effect.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def explain_counts(df: DataFrame) -> dict[str, int]:
    """Counts of scale-relevant physical operators in the (pre-AQE)
    executed plan."""
    plan = _plan_string(df)
    return {
        "broadcast_hash_join": plan.count("BroadcastHashJoin"),
        "sort_merge_join": plan.count("SortMergeJoin"),
        "shuffled_hash_join": plan.count("ShuffledHashJoin"),
        "exchange": plan.count("Exchange"),
        "parquet_scans": plan.count("Scan parquet"),
    }


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists of every scan in the plan (empty lists
    excluded) — a projection that doesn't push its filters reads data
    it then throws away."""
    plan = _plan_string(df)
    return [m for m in re.findall(r"PushedFilters: \[([^\]]+)\]", plan) if m.strip()]
