"""Join / lookup operators J1-J3 (SURVEY.md §2.5).

Every reference join is a (left|anti) equi-join against a small
dimension — the natural Spark physical plan is a broadcast hash join,
which we hint explicitly so the plan is stable regardless of stats.
At cluster scale a dimension that outgrows
``spark.sql.autoBroadcastJoinThreshold`` should pass
``broadcast_dim=False`` and rely on AQE's join selection.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_lookup(
    df: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """J1/J2 — enrich facts with dimension columns by equi-join
    (cartera.py:121-122, pending_orders.py:113-114; the dict-map
    variant ventas_totales.py:146-152 has identical semantics).

    Left join preserves unmapped fact rows (their dim columns null) so
    the caller can report (A1) and drop (F1) them, as the reference does.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return df.join(d, on=on, how=how)


def unmapped_rows(df_enriched: DataFrame, probe_col: str) -> DataFrame:
    """A1 companion — rows whose lookup failed (null probe column), for
    the reference's unmapped-client warnings (ventas_totales.py:154-156)."""
    return df_enriched.filter(F.col(probe_col).isNull())
