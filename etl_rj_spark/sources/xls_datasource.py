"""PySpark-4 Python DataSource exposing legacy .xls (BIFF8) workbooks
through the STANDARD reader API::

    from etl_rj_spark.sources.xls_datasource import register_xls_source
    register_xls_source(spark)
    df = (spark.read.format("xls")
          .option("path", "/data/exports/*.xls")
          .option("sheet", "Ventas")        # index or name; default 0
          .load())

This is the idiomatic-Spark packaging of the same native BIFF reader
the pipelines call directly (`sources/xls_biff.py` — [MS-CFB] +
[MS-XLS], no xlrd): a DataSource subclass whose planner lists the
matching FILES (metadata only, driver-side) and emits ONE InputPartition
per file, so a drop-directory of thousands of daily exports reads in
parallel across executors — each task opens only its own workbook.
All cells surface as strings (plus ``_file`` lineage and ``_row_idx``
F5-contract columns, matching `trimmed_csv`'s posture): .xls exports
are untyped business data, and the engine's typed parse kernels
(X4/N1/N4/D1) own coercion — inferring types per-file would let two
files disagree about a column.

Schema comes from the FIRST matching file's header row (driver-side,
one workbook open) or an explicit ``.schema(...)``; files whose
headers disagree fail loudly per-task rather than silently
misaligning columns (the same strictness `excel_tables` applies).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

_META_COLS = ("_file", "_row_idx")


def _glob_files(pattern: str) -> list[str]:
    """Local/posix glob (driver + task side, no JVM gateway — tasks run
    in Python workers where the py4j bridge is unavailable)."""
    import glob as _glob

    return sorted(f for f in _glob.glob(pattern) if not f.endswith("/"))


def _header_of(path: str, sheet: int | str) -> list[str]:
    from etl_rj_spark.sources.xls_biff import read_xls_sheet

    pdf = read_xls_sheet(path, sheet)
    return [str(c) for c in pdf.columns]


@dataclass
class _XlsPartition(InputPartition):
    path: str


class _XlsReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema_ = schema
        self.pattern = options.get("path")
        if not self.pattern:
            raise ValueError("xls source requires .option('path', <glob>)")
        sheet = options.get("sheet", "0")
        self.sheet: int | str = int(sheet) if str(sheet).lstrip("-").isdigit() else sheet

    def partitions(self):
        files = _glob_files(self.pattern)
        if not files:
            raise FileNotFoundError(f"xls source matched no files: {self.pattern}")
        return [_XlsPartition(p) for p in files]

    def read(self, partition: _XlsPartition):
        from etl_rj_spark.sources.xls_biff import read_xls_sheet

        data_cols = [f.name for f in self.schema_.fields if f.name not in _META_COLS]
        pdf = read_xls_sheet(partition.path, self.sheet)
        got = [str(c) for c in pdf.columns]
        if got != data_cols:
            raise ValueError(
                f"{partition.path}: header {got} does not match the source "
                f"schema {data_cols} — schema drift across the drop directory"
            )
        emit_meta = any(f.name in _META_COLS for f in self.schema_.fields)

        def s(v):
            if v is None:
                return None
            # integral RK/NUMBER cells print without the float artifact
            # ("2", not "2.0") — the form the parse kernels expect from
            # a business export
            if isinstance(v, float) and v.is_integer():
                return str(int(v))
            return str(v)

        for i, row in enumerate(pdf.itertuples(index=False, name=None)):
            vals = [s(v) for v in row]
            if emit_meta:
                yield tuple(vals) + (partition.path, i)
            else:
                yield tuple(vals)


class XlsDataSource(DataSource):
    """``spark.read.format("xls")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "xls"

    def schema(self) -> StructType:
        files = _glob_files(self.options.get("path", ""))
        if not files:
            raise FileNotFoundError(
                f"xls source matched no files: {self.options.get('path')!r}"
            )
        sheet = self.options.get("sheet", "0")
        sheet = int(sheet) if str(sheet).lstrip("-").isdigit() else sheet
        header = _header_of(files[0], sheet)
        return StructType(
            [StructField(c, StringType()) for c in header]
            + [StructField("_file", StringType()), StructField("_row_idx", LongType())]
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return _XlsReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> "_XlsSimpleStreamReader":
        return _XlsSimpleStreamReader(schema, self.options)


def register_xls_source(spark) -> None:
    """Idempotent registration of the ``xls`` format on a session."""
    spark.dataSource.register(XlsDataSource)


class _XlsSimpleStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the ``xls`` source: the drop-directory as an
    UNBOUNDED table. Offsets are the sorted list of files already
    delivered — each micro-batch reads exactly the complement, and
    ``readBetweenOffsets`` replays a committed range deterministically
    (same file set → same rows), so checkpoint recovery is
    exactly-once: the DataSource-level form of the
    `sources/manifest.py` ledger contract.

    The offset grows with one path per file ever seen — fine for the
    daily-export cadence this wraps (hundreds of files); compact to a
    high-water-mark offset if filenames are ordered.
    """

    def __init__(self, schema: StructType, options):
        self.inner = _XlsReader(schema, options)

    def initialOffset(self):
        return {"seen": []}

    def _rows_for(self, files):
        # materialized list, not a generator: the simple-stream harness
        # pickles the returned rows for partition planning/prefetch
        out = []
        for f in files:
            out.extend(self.inner.read(_XlsPartition(f)))
        return out

    def read(self, start):
        seen = set(start.get("seen", []))
        new = [f for f in _glob_files(self.inner.pattern) if f not in seen]
        end = {"seen": sorted(seen | set(new))}
        return iter(self._rows_for(new)), end

    def readBetweenOffsets(self, start, end):
        seen = set(start.get("seen", []))
        replay = [f for f in end.get("seen", []) if f not in seen]
        return iter(self._rows_for(replay))
