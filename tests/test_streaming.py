"""Structured Streaming tests driven with file sources +
Trigger.AvailableNow (deterministic: processes all available input then
stops — no timers/flakiness)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.streaming import (
    sessionized_stream,
    stream_dedup,
    stream_ingest,
    windowed_counts,
)

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def _events_source(spark, sf_dir, tmp_path):
    """Stage the events table as a parquet dir with a streaming-friendly
    (µs) timestamp for the file source."""
    src = str(tmp_path / "src")
    load_table(spark, sf_dir, "events").write.parquet(src)
    return src


def test_stream_ingest_appends_partitioned(spark, sf_dir, tmp_path):
    src = _events_source(spark, sf_dir, tmp_path)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = stream_ingest(
        spark,
        src,
        EVENTS_SCHEMA,
        sink,
        ckpt,
        partition_cols=["event_type"],
    )
    q.awaitTermination(120)
    batch = load_table(spark, sf_dir, "events")
    got = spark.read.parquet(sink)
    assert got.count() == batch.count()
    # partition dirs exist per event type (dynamic partition ingest)
    types = {r.event_type for r in got.select("event_type").distinct().collect()}
    assert types == {
        r.event_type for r in batch.select("event_type").distinct().collect()
    }


def test_windowed_counts_stream_matches_batch(spark, sf_dir, tmp_path):
    src = _events_source(spark, sf_dir, tmp_path)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    out = windowed_counts(stream, window="1 hour", key_cols=["event_type"])
    sink = str(tmp_path / "win_sink")
    ckpt = str(tmp_path / "win_ckpt")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )
    # append mode emits only windows closed by the watermark — every
    # emitted row must match the batch computation exactly
    emitted = {(r.win_start, r.event_type): r.n for r in got.collect()}
    expected = {(r.win_start, r.event_type): r.n for r in batch.collect()}
    assert emitted, "no windows emitted"
    for key, n in emitted.items():
        assert expected[key] == n
    # and the watermark must have closed all but the tail hour(s)
    assert len(emitted) >= len(expected) - len(
        {r.event_type for r in batch.collect()}
    ) * 2


def test_stream_dedup_and_sessions_run(spark, sf_dir, tmp_path):
    src = _events_source(spark, sf_dir, tmp_path)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    dedup = stream_dedup(stream, ["event_id"])
    sink = str(tmp_path / "dd_sink")
    q = (
        dedup.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_src = load_table(spark, sf_dir, "events").count()
    assert spark.read.parquet(sink).count() == n_src  # event_id unique

    stream2 = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    sess = sessionized_stream(stream2, key_cols=["user_id"])
    q2 = (
        sess.writeStream.format("memory")
        .queryName(f"sess_{int(time.time())}")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
