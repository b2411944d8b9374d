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
