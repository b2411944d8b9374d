"""Streaming event ingestion and aggregation.

``read_event_stream`` reads the events table shape as a file-source
stream (parquet dirs with TIMESTAMP(NANOS) read as long then converted,
matching sources.parquet). ``windowed_event_counts_stream`` is the
streaming twin of the batch ``windowed_event_counts`` oracle query —
identical grouping expressions, plus a watermark for state eviction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos-as-long; converted below
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over event parquet files; ns-long timestamps
    converted to TimestampType (µs truncation, same as batch)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_event_counts_stream(
    events: DataFrame, watermark: str = "10 minutes", window: str = "5 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts — the streaming form of the
    batch ``windowed_event_counts`` query (same expressions; late rows
    beyond the watermark are dropped instead of recomputed)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def stream_snapshot_append(
    events: DataFrame, out_path: str, checkpoint: str
) -> StreamingQuery:
    """K2 as a stream: drain all currently-available files once
    (Trigger.AvailableNow) appending date-stamped rows — the reference's
    manually-triggered daily snapshot load with exactly-once file
    tracking via the checkpoint."""
    stamped = events.withColumn("fecha_carga", F.current_date())
    return (
        stamped.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("fecha_carga")
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )


def view_purchase_stream_join(
    events: DataFrame, max_gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: each purchase paired with the same
    user's views from the preceding ``max_gap_minutes`` — the streaming
    twin of the batch range join (range_join_error_clicks pattern).

    Both sides carry watermarks and the join condition bounds event
    time in both directions, so Spark can size the join state and evict
    rows older than watermark + gap (unbounded state otherwise)."""
    v = (
        events.filter(F.col("event_type") == "view")
        .select("user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", watermark)
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return v.join(
        p,
        F.expr(
            f"user_id = p_user AND purchase_ts >= view_ts "
            f"AND purchase_ts <= view_ts + INTERVAL {max_gap_minutes} MINUTES"
        ),
        "inner",
    ).select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")
