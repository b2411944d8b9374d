"""String kernels X1-X9 (SURVEY.md §2.8).

Reference behaviors reproduced as native Spark expression chains (the
reference applies the same transforms row-at-a-time in pandas; here
they stay inside whole-stage codegen — no UDF).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_lower(c: Column | str) -> Column:
    """X1 — lowercase + trim (name normalization, ventas_totales.py:145,149)."""
    return F.lower(F.trim(F.col(c) if isinstance(c, str) else c))


def norm_upper(c: Column | str) -> Column:
    """X2 — uppercase + trim (wor2.py:329,429)."""
    return F.upper(F.trim(F.col(c) if isinstance(c, str) else c))


def clean_customer_name(c: Column | str) -> Column:
    """X3 — the reference's ``clean_customer_name`` (cartera.py:92-98,
    pending_orders.py:102-107): null-safe str cast → strip/lower →
    remove non-[a-z0-9 whitespace] → collapse whitespace → strip.

    The reference does this with a row-level Python ``.apply``; here it
    is a pure native chain (no UDF — SURVEY §2.9 UDF1 note).
    """
    col = F.col(c) if isinstance(c, str) else c
    s = F.lower(F.trim(col.cast("string")))
    s = F.regexp_replace(s, r"[^a-z0-9\s]", "")
    s = F.regexp_replace(s, r"\s+", " ")
    return F.trim(s)


def parse_money(c: Column | str) -> Column:
    """X4+N1 — accounting-format money parse (cartera.py:143-148):
    ``(`` → ``-``, ``)`` → removed, strip ``$`` ``,``, whitespace at
    the ENDS only (the reference's ``.strip()`` — interior whitespace
    survives and coerces the value to null, e.g. ``'1 234.56'``; an
    all-whitespace strip would wrongly accept it — ADVICE r9, same fix
    as :func:`parse_plain_money`), then lenient numeric cast."""
    col = F.col(c) if isinstance(c, str) else c
    s = F.regexp_replace(col.cast("string"), r"[$,]", "")
    s = F.regexp_replace(s, r"\(", "-")
    s = F.regexp_replace(s, r"\)", "")
    s = F.regexp_replace(s, r"^\s+|\s+$", "")
    return s.try_cast("double")


def parse_money_default(c: Column | str, default: float = 0.0) -> Column:
    """X4+N2 — money parse with null → default (cartera.py:148-149)."""
    return F.coalesce(parse_money(c), F.lit(default))


def parse_plain_money(c: Column | str) -> Column:
    """X4-variant (pending_orders.py:140-141): strip ``$`` ``,`` and
    whitespace then lenient numeric cast — NO accounting-parens
    handling. The pending reference coerces '(1,500.00)' to NaN (→ 0.0
    after the pipeline default); only cartera's open_balance maps
    parens to negatives (:func:`parse_money`). Using the cartera
    kernel in the pending pipeline flipped every parenthesized amount
    to a negative the reference stores as 0 (r9 review fix).

    Whitespace is stripped at the ENDS only (the reference's
    ``.strip()``), never interior: ``'1 234.56'`` must coerce to null
    (→ 0.0 with the pipeline default), exactly as ``pd.to_numeric``
    rejects it — an all-whitespace ``[$,\\s]`` strip would silently
    accept it as 1234.56 (ADVICE r9 fix)."""
    col = F.col(c) if isinstance(c, str) else c
    s = F.regexp_replace(col.cast("string"), r"[$,]", "")
    s = F.regexp_replace(s, r"^\s+|\s+$", "")
    return s.try_cast("double")


def parse_plain_money_default(c: Column | str, default: float = 0.0) -> Column:
    """Pending's money parse with null → default (pending_orders.py:141)."""
    return F.coalesce(parse_plain_money(c), F.lit(default))


def recode_values(c: Column | str, mapping: Mapping[str, str], default: Column | None = None) -> Column:
    """X5/J3 — static value recode (e.g. '- no customer/project -' →
    'Sin Nombre', cartera.py:110; zone/product maps wor2.py:36-62).

    Unmatched values pass through unchanged unless ``default`` given.
    """
    col = F.col(c) if isinstance(c, str) else c
    expr = None
    for k, v in mapping.items():
        cond = col == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    tail = default if default is not None else col
    return tail if expr is None else expr.otherwise(tail)


def truncate(c: Column | str, width: int) -> Column:
    """X7 — substring truncation to field width (pending_orders.py:146,149)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.substring(col, 1, width)


#: Latin accent fold map (both cases, applied char-for-char). A fixed
#: table, never locale/ICU collation: the reference's exact-match name
#: joins (cartera.py:121-122) silently drop accented variants of the
#: same customer — folding must behave identically on every engine and
#: JVM locale, so it is data, not library behavior (same rationale as
#: the D8 month-name recode table, wor2.py:65-76).
_ACCENT_SRC = "áàâäãåÁÀÂÄÃÅéèêëÉÈÊËíìîïÍÌÎÏóòôöõÓÒÔÖÕúùûüÚÙÛÜýÿÝçÇñÑ"
_ACCENT_DST = "aaaaaaAAAAAAeeeeEEEEiiiiIIIIoooooOOOOOuuuuUUUUyyYcCnN"
assert len(_ACCENT_SRC) == len(_ACCENT_DST)


def fold_accents(c: Column | str) -> Column:
    """Fold common Latin accents to ASCII (``translate`` — single-pass,
    JVM-side, codegen-friendly). Composes with ``clean_customer_name``
    to make the reference's dimension lookups accent-insensitive."""
    col = F.col(c) if isinstance(c, str) else c
    return F.translate(col.cast("string"), _ACCENT_SRC, _ACCENT_DST)
