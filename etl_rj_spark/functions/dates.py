"""Date/time kernels D1-D8 (SURVEY.md §2.8).

Locale-free by design: month-name translation is an explicit 12-entry
recode table exactly like the reference (wor2.py:65-76), never a JVM
locale dependency.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_rj_spark.functions.strings import recode_values

#: wor2.py:65-76 — Spanish → English month names.
MONTH_ES_EN = {
    "Enero": "January", "Febrero": "February", "Marzo": "March",
    "Abril": "April", "Mayo": "May", "Junio": "June",
    "Julio": "July", "Agosto": "August", "Septiembre": "September",
    "Octubre": "October", "Noviembre": "November", "Diciembre": "December",
}
MONTH_EN_ES = {v: k for k, v in MONTH_ES_EN.items()}


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def parse_date(c: Column | str, fmt: str = "M/d/yyyy") -> Column:
    """D1 — explicit-format date parse (ventas_totales.py:133,
    '%m/%d/%Y'); invalid → null (try_to_date, never ANSI-raise)."""
    return F.try_to_date(_c(c), fmt)


def parse_date_lenient(c: Column | str) -> Column:
    """D2 — lenient parse, invalid → null (errors='coerce',
    cartera.py:170-172, pending_orders.py:85). pandas' no-format
    ``to_datetime`` INFERS the export family's month-first layout
    (ventas_totales.py:133 documents %m/%d/%Y for the same system),
    so the lenient path tries ISO first, then M/d/yyyy — a bare
    ``try_to_date`` only parsed ISO and silently nulled every
    US-format date, defaulting all of them to 1900-01-01 downstream
    (r9 review fix)."""
    col = _c(c)
    return F.coalesce(F.try_to_date(col), F.try_to_date(col, "M/d/yyyy"))


def date_default(c: Column | str, default: str = "1900-01-01") -> Column:
    """D4 — null-date default (pending_orders.py:86)."""
    return F.coalesce(_c(c), F.to_date(F.lit(default)))


def iso_format(c: Column | str) -> Column:
    """D5 — format to YYYY-MM-DD string (cartera.py:170-172)."""
    return F.date_format(_c(c), "yyyy-MM-dd")


def month_name(c: Column | str, spanish: bool = False) -> Column:
    """D6/D8 — English month name ('%B', pending_orders.py:87), with
    optional recode to Spanish via the explicit table (wor2.py:65-76)."""
    en = F.date_format(_c(c), "MMMM")
    return recode_values(en, MONTH_EN_ES) if spanish else en


def temporal_dims(c: Column | str) -> dict[str, Column]:
    """D6 — the temporal-dimension derivation of pending_orders.py:87-90:
    nombre_mes / mes / dia / anio from a date column."""
    col = _c(c)
    return {
        "nombre_mes": F.date_format(col, "MMMM"),
        "mes": F.month(col),
        "dia": F.dayofmonth(col),
        "anio": F.year(col),
    }
