"""Bucketed table sink — shuffle-free co-located joins.

Writing both sides of a recurring big-big join bucketed (and sorted)
on the join key lets every later join run with zero Exchange: each
task reads matching buckets from both tables. At 100 TB this is the
difference between reshuffling the fact table on every run and never
shuffling it again — the right physical design for the reference's
nightly ``fact ⋈ existing-keys`` dedup against a huge warehouse table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_keys: Sequence[str],
    num_buckets: int = 8,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed+sorted parquet table (session-catalog managed;
    set ``spark.sql.warehouse.dir`` or pass ``path``)."""
    keys = list(bucket_keys)
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, keys[0], *keys[1:])
        .sortBy(keys[0], *keys[1:])
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)
