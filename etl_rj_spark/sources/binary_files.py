"""Binary-file source — real file ingest for the multimodal layer.

The multimodal operators (decode_image, sample_frames, audio_stats)
consume a ``(doc_id, payload: binary)`` column; this source produces
that column from actual files on storage via Spark's built-in
``binaryFile`` datasource (one row per file: path, modificationTime,
length, content). That is the 100 TB ingest posture for media:
each file is one row, the scan parallelizes across files, and
``pathGlobFilter`` prunes by extension BEFORE any bytes are read.

Two deliberate limits, stated here because they bite at scale:

- ``binaryFile`` loads each file's full content as ONE row — fine for
  images/clips (KB–MB), wrong for hour-long videos (use a manifest +
  ranged reads instead).
- ``spark.sql.sources.binaryFile.maxLength`` (default 2^31-1) bounds a
  single file; oversized files fail the scan rather than truncate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """(path, length, payload) per file under ``path``; ``glob`` (e.g.
    ``*.png``) prunes files by name before content is read."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path).select(
        "path", "length", F.col("content").alias("payload")
    )
