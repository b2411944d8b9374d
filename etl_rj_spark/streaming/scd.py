"""Streaming SCD Type 2 maintenance: a change stream folded into a
validity-interval dimension history with ``foreachBatch`` +
:func:`etl_rj_spark.operators.scd.scd2_apply` — the streaming twin of
the batch SCD2 operator, the way ``streaming/incremental.py`` twins
the K1 anti-join append.

Each micro-batch may carry several effective dates; they are applied
in ascending order (one ``scd2_apply`` per date — distinct dates per
batch are calendar-scale, so the driver loop is metadata-sized). A
key with two changes at the SAME effective date is ambiguous and
raises rather than silently picking one.

History swap is crash-safe without a table format: write the new
history to a staging dir, move current → backup, staging → current,
drop backup; the reader recovers a backup left by a crash between the
two renames. Idempotence on redelivery comes from SCD2 semantics
itself: re-applying an already-applied change is a no-op (attributes
equal → history untouched), so a replayed batch cannot double-close
or duplicate intervals.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

from etl_rj_spark.operators.scd import scd2_apply


def _hpath(spark: SparkSession, p: str):
    jvm = spark.sparkContext._jvm
    path = jvm.org.apache.hadoop.fs.Path(p)
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, path


def read_history(spark: SparkSession, history_path: str) -> DataFrame | None:
    """Current history, recovering from a crash mid-swap (backup dir
    present but current missing → restore backup first)."""
    fs, cur = _hpath(spark, history_path)
    _, bak = _hpath(spark, history_path + ".backup")
    if not fs.exists(cur) and fs.exists(bak):
        fs.rename(bak, cur)
    if not fs.exists(cur):
        return None
    return spark.read.parquet(history_path)


def stream_scd2_maintain(
    changes_stream: DataFrame,
    history_path: str,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    checkpoint: str,
    effective_col: str = "effective_date",
) -> StreamingQuery:
    """Drain available change files once (Trigger.AvailableNow),
    folding each micro-batch into the SCD2 history at
    ``history_path``. Bootstraps an empty history from the batch
    schema on first run."""
    keys = list(keys)
    compare_cols = list(compare_cols)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.dropDuplicates()  # exact re-sends collapse
        dup = (
            batch_df.groupBy(*keys, effective_col)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"ambiguous SCD2 batch: key {tuple(dup[0])[:-1]} has two "
                "different changes at one effective date"
            )
        hist = read_history(spark, history_path)
        if hist is None:
            hist = batch_df.select(
                *keys, *compare_cols,
                F.col(effective_col).alias("valid_from"),
                F.lit(None).cast(batch_df.schema[effective_col].dataType)
                .alias("valid_to"),
            ).limit(0)
        # ascending effective order; distinct dates are calendar-scale
        effs = [
            r[0]
            for r in batch_df.select(effective_col).distinct().orderBy(effective_col).collect()
        ]
        for eff in effs:
            hist = scd2_apply(
                hist,
                batch_df.filter(F.col(effective_col) == F.lit(eff)),
                keys,
                compare_cols,
                effective_col=effective_col,
            )
        staging = history_path + f".staging-{batch_id}"
        hist.write.mode("overwrite").parquet(staging)
        fs, cur = _hpath(spark, history_path)
        _, bak = _hpath(spark, history_path + ".backup")
        _, stg = _hpath(spark, staging)
        if fs.exists(bak):
            fs.delete(bak, True)
        if fs.exists(cur):
            fs.rename(cur, bak)
        fs.rename(stg, cur)
        if fs.exists(bak):
            fs.delete(bak, True)

    return (
        changes_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
