"""Data-layout sink: range-clustered, sorted parquet writes for
min/max data skipping.

At 100 TB the cheapest scan is the one that never happens: parquet
keeps per-row-group min/max statistics, and engines (Spark's parquet
reader, DuckDB, Trino) skip row groups whose [min, max] cannot satisfy
the predicate. That only helps if values are clustered — a randomly
laid-out table has every row group spanning the whole value domain, so
nothing skips. ``write_clustered_parquet`` produces the clustered
layout: ``repartitionByRange`` on the cluster keys (disjoint key
ranges per file) + ``sortWithinPartitions`` (monotone within each
file, so row groups inside a file are tight too).

This generalizes the reference's snapshot layout (SURVEY §4: partition
by ``fecha_carga`` makes the latest-snapshot filter partition pruning)
one level down: partition pruning skips directories, clustering skips
row groups within files. ``row_group_ranges`` / ``skipped_fraction``
read the written statistics back (pyarrow) so tests assert the layout
contract instead of trusting it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_by: Sequence[str],
    num_files: int | None = None,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` range-clustered and sorted on ``cluster_by``.

    ``num_files`` bounds output file count (defaults to the session
    shuffle parallelism); ``partition_by`` adds directory-level
    partitioning on top (prune dirs first, then row groups).
    """
    cluster_by = list(cluster_by)
    if num_files:
        clustered = df.repartitionByRange(num_files, *cluster_by)
    else:
        clustered = df.repartitionByRange(*cluster_by)
    clustered = clustered.sortWithinPartitions(*cluster_by)
    writer = clustered.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*list(partition_by))
    writer.parquet(path)


def row_group_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` for every row group under ``path``,
    read from parquet footer statistics."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))

    def naive(v):
        # TIMESTAMP(MICROS, adjusted=UTC) stats decode tz-aware; strip
        # to naive UTC so callers compare against plain datetimes
        import datetime

        if isinstance(v, datetime.datetime) and v.tzinfo is not None:
            return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v

    out: list[tuple] = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    out.append((naive(col.statistics.min), naive(col.statistics.max)))
    return out


def skipped_fraction(path: str, column: str, lo, hi) -> float:
    """Fraction of row groups whose [min, max] proves they contain no
    value in [lo, hi] — what a stats-aware scan would skip."""
    ranges = row_group_ranges(path, column)
    if not ranges:
        return 0.0
    skipped = sum(1 for mn, mx in ranges if mx < lo or mn > hi)
    return skipped / len(ranges)


def _morton_interleave(a, b):
    """Interleave two 16-bit bucket indexes into one 32-bit Morton
    code with the classic magic-number spread — pure JVM bit
    expressions (shiftleft/bitwise), no UDF:

        x = (x | x<<8) & 0x00FF00FF
        x = (x | x<<4) & 0x0F0F0F0F
        x = (x | x<<2) & 0x33333333
        x = (x | x<<1) & 0x55555555
        z = spread(a) | spread(b) << 1
    """
    from pyspark.sql import functions as F

    def spread(x):
        for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                            (2, 0x33333333), (1, 0x55555555)):
            x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
        return x

    return spread(a).bitwiseOR(F.shiftleft(spread(b), 1))


def write_zorder_parquet(
    df: DataFrame,
    path: str,
    cluster_by: Sequence[str],
    num_files: int | None = None,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` Z-ORDER clustered on exactly two columns.

    Lexicographic clustering (``write_clustered_parquet``) gives the
    LEADING column tight row groups and the trailing column none — a
    predicate on the second column alone scans everything. Z-order
    interleaves the bits of both columns' rank buckets, so row groups
    are tight rectangles in (a, b) space and single-column predicates
    on EITHER column skip (the public Delta/Databricks OPTIMIZE ZORDER
    layout, re-expressed as repartitionByRange + sortWithinPartitions
    on a Morton code).

    Rank buckets come from per-column equi-depth boundaries
    (``approxQuantile``, 2^bits buckets; driver-side cost is one
    sketch pass) so skew cannot collapse the curve; the bucket rank is
    an O(2^bits)-per-row array fold JVM-side — which is why ``bits``
    defaults to 8 (256 buckets per column = 65k Z cells, far finer
    than row-group granularity already) and is capped at 12. The
    Morton interleave is pure bit expressions; the z-code is dropped
    before write — the layout, not the schema, carries it.
    """
    from pyspark.sql import functions as F

    if not 1 <= bits <= 12:
        raise ValueError("bits must be in [1, 12] (2^bits-wide rank fold per row)")
    a, b = list(cluster_by)
    nb = 1 << bits
    # one sketch pass over the data covers both columns
    qa, qb = df.stat.approxQuantile(
        [a, b], [i / nb for i in range(1, nb)], 0.001
    )

    def bucket(col, bounds):
        arr = F.array(*[F.lit(float(v)) for v in bounds])
        # width_bucket over explicit boundaries via array + expr:
        # count of boundaries <= value  (equi-depth rank, 0..len)
        return F.aggregate(
            arr,
            F.lit(0),
            lambda acc, bnd: acc + F.when(F.col(col).cast("double") >= bnd, 1).otherwise(0),
        )

    z = df.withColumn(
        "__z", _morton_interleave(bucket(a, _dedupe(qa)), bucket(b, _dedupe(qb)))
    )
    if num_files:
        z = z.repartitionByRange(num_files, "__z")
    else:
        z = z.repartitionByRange("__z")
    z.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)


def _dedupe(bounds: list) -> list:
    """approxQuantile repeats boundaries on low-cardinality columns;
    collapse them so bucket ranks stay monotone."""
    out: list = []
    for v in bounds:
        if not out or v > out[-1]:
            out.append(v)
    return out
