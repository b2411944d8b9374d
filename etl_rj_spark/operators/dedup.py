"""Incremental dedup J4/J5 (SURVEY.md §2.5): anti-join new rows against
already-loaded keys.

The reference implements this twice — a set-fingerprint variant
(ventas_totales.py:169,186-209) and a merge-indicator variant
(wor2.py:236-237,344-346) — both are exactly Spark's ``left_anti``
equi-join.

Semantics guard (SURVEY §4): pandas treats NaN keys as equal, Spark's
``left_anti`` treats null keys as non-matching. The reference
normalizes/casts/fills every key before comparing, making the delta
unreachable; this operator enforces that by requiring non-null keys
(``on_null_key="error"``) or reproducing pandas semantics with a
null-safe compare (``"match"``).

Scale: the existing-keys side at 100 TB is a full fact-table key
projection — column-pruned at the scan (Catalyst pushes the projection
into parquet/JDBC). Leave ``broadcast_existing=None`` so AQE picks
broadcast vs sort-merge from the *actual* key-side size at runtime;
force True only when the key set is known-small.
"""

from __future__ import annotations

from functools import reduce
from operator import and_
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anti_join_new_rows(
    new: DataFrame,
    existing: DataFrame,
    keys: Sequence[str],
    broadcast_existing: bool | None = None,
    on_null_key: str = "error",
) -> DataFrame:
    """Return rows of ``new`` whose key tuple is absent from ``existing``.

    ``on_null_key``: "error" (default) raises at plan time if key
    columns are nullable-unchecked — callers must normalize first;
    "drop" filters null-keyed rows; "match" uses null-safe equality
    (``<=>``) reproducing the pandas set-membership behavior.
    """
    keys = list(keys)
    ex = existing.select(*keys)
    if broadcast_existing:
        ex = F.broadcast(ex)

    if on_null_key == "match":
        exa = ex.toDF(*[f"__ex_{k}" for k in keys])
        cond = reduce(and_, [new[k].eqNullSafe(exa[f"__ex_{k}"]) for k in keys])
        return new.join(exa, on=cond, how="left_anti")

    if on_null_key == "drop":
        new = new.na.drop(subset=keys)
    elif on_null_key == "error":
        # enforce the normalization contract lazily, inside the plan:
        # any null key in `new` poisons the run with a clear error.
        checks = [
            F.when(F.col(k).isNull(), F.raise_error(F.lit(f"anti_join_new_rows: null dedup key '{k}' — normalize keys first (SURVEY §4)"))).otherwise(F.col(k)).alias(k)
            for k in keys
        ]
        # preserve the INPUT column order (r9 review fix): keys-first
        # reordering silently swapped columns under positional
        # consumers (union/insertInto) — and differed from the other
        # on_null_key modes
        by_name = {k: chk for k, chk in zip(keys, checks)}
        new = new.select(*[by_name.get(c, F.col(c)) for c in new.columns])
    else:
        raise ValueError(f"on_null_key must be error|drop|match, got {on_null_key!r}")

    return new.join(ex, on=keys, how="left_anti")
