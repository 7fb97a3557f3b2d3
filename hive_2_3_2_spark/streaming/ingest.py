"""Streaming ingest + event-time operators.

All functions take/return streaming DataFrames; tests drive them with a
file source + Trigger.AvailableNow (deterministic, no timers), which
exercises the exact operators a live Kafka/file stream would use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_ingest(
    spark: SparkSession,
    source_path: str,
    schema: str,
    sink_path: str,
    checkpoint: str,
    partition_cols: list[str] | None = None,
    fmt: str = "parquet",
    available_now: bool = True,
) -> StreamingQuery:
    """File-source ingest → partitioned parquet append.

    = HiveEndPoint TransactionBatch ingest (HiveEndPoint.java:62), with
    the checkpoint dir playing the transaction log's role (exactly-once
    per-file tracking)."""
    stream = spark.readStream.schema(schema).format(fmt).load(source_path)
    writer = (
        stream.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    window: str = "1 hour",
    slide: str | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling/sliding window counts: late rows beyond the
    watermark are dropped; state for closed windows is evicted."""
    keys = key_cols or []
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), *keys, "n")
    )


def sessionized_stream(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Watermarked session windows (F.session_window) — merges events
    within ``gap`` per key; sessions close when the watermark passes
    last_event + gap."""
    keys = key_cols or []
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *keys,
            "n_events",
        )
    )


def stream_dedup(
    events: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup on ids within the watermark horizon
    (dropDuplicates keeps state per id until the watermark passes)."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(
        [*id_cols, ts_col]
    )
