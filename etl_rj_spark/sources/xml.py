"""XML read/write — Spark 4's native XML datasource plus the
column-level ``from_xml``/``to_xml`` kernels.

The reference ingests CSV/Excel/JDBC only (ventas_totales.py:70-113);
XML is a Spark-first extension for feed interchange (the same niche
the reference's Excel named-table feeds occupy: semi-structured
partner drops). Spark 4 bundles the formerly-external spark-xml
connector as a first-class datasource, so it carries the usual
Catalyst source contract — schema inference or user schema, column
pruning, malformed-record modes — with no extra classpath.

Scale posture: an XML scan is line-oblivious (a row element may span
lines), so Spark splits files by rowTag scan, not newline; throughput
is below parquet/ORC by construction. The intended 100 TB posture is
XML at the EDGE only — land partner XML feeds, normalize once into
parquet/ORC via :func:`read_xml` → parquet sink — never as the lake
format. Malformed elements follow the same dead-letter discipline as
the JSONL/CSV sources (PERMISSIVE + ``_corrupt_record`` quarantine,
sources/jsonl.py:48).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Default quarantine column, shared name with the JSONL/CSV sources so
#: downstream quarantine_reason logic treats all three uniformly.
CORRUPT_COL = "_corrupt_record"


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Write ``df`` as XML documents, one ``<row_tag>`` element per
    row under ``<root_tag>``. Values are entity-escaped by the
    datasource (``&lt;`` etc.), so arbitrary text survives the
    roundtrip."""
    w = (
        df.write.format("xml")
        .mode(mode)
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
    )
    if compression:
        w = w.option("compression", compression)
    w.save(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """Read XML rows under ``row_tag``. With an explicit ``schema`` the
    read is PERMISSIVE and malformed elements land whole in
    ``_corrupt_record`` (split them off with
    :func:`etl_rj_spark.sources.jsonl.quarantine_corrupt`); without
    one, Spark infers the schema with an extra pass (fine for edge
    feeds, avoid on wide lakes)."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        # PERMISSIVE needs the corrupt column IN the schema to keep
        # the raw text of broken elements (same contract as JSON/CSV).
        # StructType.add mutates in place — build a copy, never the
        # caller's schema object.
        if CORRUPT_COL not in schema.fieldNames():
            schema = T.StructType(
                list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
            )
        r = (
            r.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
        )
    return r.load(path)


def xml_encode(cols: Column) -> Column:
    """``to_xml`` over a struct column — one XML fragment per row
    (JVM-side expression; no Python in the hot path)."""
    return F.to_xml(cols)


def xml_extract(c: Column | str, schema: str) -> Column:
    """Parse an XML fragment column into a struct with ``from_xml``.

    ``schema`` is a DDL struct string (``"k int, v string"``).
    Malformed fragments yield a null struct rather than failing the
    task (PERMISSIVE is from_xml's only mode), so a filter on
    ``result IS NULL`` is the quarantine split."""
    col = F.col(c) if isinstance(c, str) else c
    return F.from_xml(col, T.StructType.fromDDL(schema))
