"""Fixed-width (positional) text files — the classic mainframe /
COBOL-copybook export layout: every record is one line, every field a
fixed byte range, numerics right-aligned space-padded, text
left-aligned space-padded. The reference's ecosystem (legacy business
exports, SURVEY §2.1) makes this the one flat-file shape the engine
did not yet ingest natively.

Spark-first: ``spark.read.text`` is line-splittable, so slicing is
pure scan-stage ``substring``/``trim``/``try_cast`` expression work —
distributed, whole-stage-codegen'd, no UDF, no driver parsing. The
sink twin emits the same layout with ``lpad``/``rpad`` + ``concat``
and writes through the text datasource, so mux/demux roundtrips are
testable and 100 TB-writable.

Field spec: ``(name, width, type)`` with type one of ``"string"``
(left-aligned) or any castable numeric/date type (right-aligned).
Values wider than their field raise at write (truncating a key
silently would corrupt the record grid).

Format limitation (inherent to space-padded fixed-width, not a bug in
this codec): the byte grid cannot distinguish NULL, the empty string,
whitespace-only strings, or leading/trailing spaces — all pad to
spaces on write and trim back to NULL on read. A roundtrip therefore
conflates those values (NULL-normalizes them). If a dataset's strings
carry significant whitespace, this is the wrong container — use the
Arrow/Parquet/JSONL sinks, which preserve them exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FieldSpec = tuple[str, int, str]


def read_fixed_width(
    spark: SparkSession,
    path: str,
    fields: Sequence[FieldSpec],
    *,
    skip_blank: bool = True,
) -> DataFrame:
    """Slice each line into typed columns per ``fields``. Short lines
    yield NULLs for fields beyond their end (ragged tails tolerated,
    the way mainframe trailing-blank stripping produces them)."""
    lines = spark.read.text(path)
    if skip_blank:
        lines = lines.filter(F.trim("value") != "")
    cols, pos = [], 1
    for name, width, typ in fields:
        raw = F.trim(F.substring("value", pos, width))
        cell = F.when(raw == "", None).otherwise(raw)
        if typ != "string":
            cell = cell.try_cast(typ)
        cols.append(cell.alias(name))
        pos += width
    return lines.select(*cols)


def write_fixed_width(
    df: DataFrame,
    path: str,
    fields: Sequence[FieldSpec],
    *,
    mode: str = "overwrite",
) -> None:
    """Mux twin: left-align strings (rpad), right-align everything
    else (lpad), concat, write text. Raises executor-side on any value
    wider than its field (raise_error beats silent truncation)."""
    parts = []
    for name, width, typ in fields:
        s = F.col(name).cast("string")
        s = F.coalesce(s, F.lit(""))
        checked = F.when(
            F.length(s) > width,
            F.raise_error(
                F.concat(
                    F.lit(f"fixed-width overflow in {name!r} (width {width}): "), s
                )
            ),
        ).otherwise(s)
        parts.append(
            F.rpad(checked, width, " ") if typ == "string" else F.lpad(checked, width, " ")
        )
    df.select(F.concat(*parts).alias("value")).write.mode(mode).text(path)
