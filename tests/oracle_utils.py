"""Local emulation of the driver's DuckDB-oracle comparison: run the
Spark query and the oracle SQL on the same parquet tables, compare
row count, sorted column names, and order-insensitive values."""

from __future__ import annotations

import datetime
import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def normalize_rows(cols, rows):
    """Sort columns by name, then rows; normalize cell values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def _check_driver_hashable(spark_df, rel):
    """The round driver canonicalizes via pandas: DuckDB HUGEINT (bare
    SUM over integers) and DECIMAL become float64/Decimal while Spark
    emits int64 — equal values, different hashes (round-1/2
    `sessionization` + `repetition_filter_docs` root cause). Array/map/
    struct cells are unhashable for it entirely. Fail fast on both."""
    import pyspark.sql.types as T

    for c, t in zip(rel.columns, rel.types):
        ts = str(t)
        assert "HUGEINT" not in ts and "DECIMAL" not in ts, (
            f"oracle column {c!r} has driver-hostile type {ts}: "
            "CAST(... AS BIGINT/DOUBLE) in the oracle SQL"
        )
    for f in spark_df.schema.fields:
        assert not isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)), (
            f"spark column {f.name!r} is {f.dataType.simpleString()}: the driver "
            "canonicalizer cannot hash complex cells — string-join or explode"
        )


def compare_spark_duck(spark_df, con, sql):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    _check_driver_hashable(spark_df, rel)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    sc, sr = normalize_rows(s_cols, s_rows)
    dc, dr = normalize_rows(d_cols, d_rows)
    assert sc == dc, f"column mismatch: spark={sc} duck={dc}"
    assert len(sr) == len(dr), f"row count mismatch: spark={len(sr)} duck={len(dr)}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        assert a == b, f"row {i} mismatch:\n  spark={a}\n  duck ={b}"


def lint_case_colliding_aliases(sql: str) -> list[tuple[str, str]]:
    """Round-8 registration-time lint for the r7 `prorate_order_totals`
    bug class: DuckDB identifiers are case-insensitive, so two aliases
    in one oracle that differ ONLY by case (`w` vs `W`) silently
    resolve to the same column — the oracle then computes something
    other than what it reads as. Returns the offending pairs (empty =
    clean). Scans `AS <ident>` aliases only; same-case repeats across
    CTEs are normal SQL and not flagged."""
    import re

    aliases = re.findall(
        r"\bAS\s+([A-Za-z_][A-Za-z0-9_]*)", sql, flags=re.IGNORECASE
    )
    seen: dict[str, str] = {}
    bad = []
    for a in aliases:
        k = a.casefold()
        if k in seen and seen[k] != a:
            pair = tuple(sorted({seen[k], a}))
            if pair not in bad:
                bad.append(pair)
        seen.setdefault(k, a)
    return bad
