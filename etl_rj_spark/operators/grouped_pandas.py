"""Grouped-map Pandas UDF operators (``applyInPandas``) — the
escape hatch for per-group logic built-ins can't express (SURVEY §2.9
UDF1 note), kept deterministic enough to oracle-check.

``zscore_by_group`` standardizes a value column within each group.
Mean/stddev are computed from exact integer-cents sums inside the UDF
(numpy int64), then fixed-order double arithmetic — the same numbers
any engine derives from the same definition, unlike float pandas
``mean()`` whose result depends on summation order.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def zscore_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "zscore",
) -> DataFrame:
    """Per-group z-score via Arrow grouped-map. Population stddev;
    groups with zero variance get z=0. Output schema = input + zscore.
    """
    group_cols = list(group_cols)
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", `{out_col}` double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(pdf[value_col].to_numpy(dtype="float64") * 100).astype("int64")
        n = len(cents)
        mean = (int(cents.sum()) / 100.0) / n
        sq = (cents.astype(object) * cents.astype(object)).sum()  # exact int
        var = (int(sq) / 10000.0) / n - mean * mean
        # math.sqrt, not **0.5: pow may differ from the correctly
        # rounded sqrt by an ulp, and the oracle uses sqrt
        std = math.sqrt(var) if var > 0 else 0.0
        v = pdf[value_col].to_numpy(dtype="float64")
        z = (v - mean) / std if std > 0 else np.zeros(n)
        out = pdf.copy()
        out[out_col] = z
        return out

    return df.groupBy(*group_cols).applyInPandas(fn, schema=out_schema)
