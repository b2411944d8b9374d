"""Numeric/cast kernels N1-N6 (SURVEY.md §2.8).

All lenient casts use ``try_cast`` so behavior is invariant under
``spark.sql.ansi.enabled`` (Spark 4 defaults ANSI on; the reference's
``pd.to_numeric(errors='coerce')`` semantics are coerce-to-null).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def to_number(c: Column | str, dtype: str = "double") -> Column:
    """N1 — lenient numeric cast, invalid → null
    (pd.to_numeric(errors='coerce'), ventas_totales.py:127 etc.)."""
    return _c(c).cast("string").try_cast(dtype)


def to_number_default(c: Column | str, default: float = 0.0, dtype: str = "double") -> Column:
    """N1+N2 — lenient cast with null → default (cartera.py:148-149)."""
    return F.coalesce(to_number(c, dtype), F.lit(default).cast(dtype))


def parse_int_thousands(c: Column | str) -> Column:
    """N4 — strip thousands separators, numeric-parse, truncate to int
    (pending_orders.py:142-143 — ``pd.to_numeric`` then
    ``astype(int)``): '1,234' → 1234, '1,234.00' → 1234, '1234.9' →
    1234 (truncation toward zero, the astype(int) rule); junk → null.
    A direct int try_cast nulled every decimal-formatted quantity —
    which the pipeline default then turned into 0 (r9 review fix)."""
    return (
        F.regexp_replace(_c(c).cast("string"), ",", "")
        .try_cast("double")
        .try_cast("int")
    )
