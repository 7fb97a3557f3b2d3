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


def test_stateful_running_totals_across_microbatches(spark, sf_dir, tmp_path):
    """State must persist across micro-batches: 4 input files, 1 per
    trigger — the final emitted (n, total) per user equals the batch
    aggregate over all files."""
    from hive_2_3_2_spark.streaming import running_totals

    src = str(tmp_path / "rt_src")
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"rt_{int(time.time())}"
    q = (
        running_totals(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "rt_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    updates = spark.table(name)
    # n is monotonically increasing per user: the max-n row is the final state
    from pyspark.sql import Window

    final = (
        updates.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("n"))
            ),
        )
        .filter("rk = 1")
        .select("user_id", "n", "total")
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("value").alias("n"), F.sum("value").alias("total")
        )
    )
    j = final.join(batch, "user_id", "full").collect()
    assert j, "no rows emitted"
    for r in j:
        assert r["n"] is not None and r["n"] == r[3], r
        assert abs(r["total"] - r[4]) < 1e-6, r
    # and state genuinely crossed batches: some user got >1 update
    multi = updates.groupBy("user_id").count().filter("count > 1").count()
    assert multi > 0


def test_stateful_sessionizer_closed_sessions_match_session_window(
    spark, sf_dir, tmp_path
):
    """Every session the EventTimeTimeout sessionizer closes must exactly
    match a row of the batch F.session_window aggregation."""
    from hive_2_3_2_spark.streaming import sessionize_stateful

    src = str(tmp_path / "ss_src")
    events = load_table(spark, sf_dir, "events")
    # order files by time so the watermark advances across micro-batches
    events.sort("ts").coalesce(1).write.parquet(src)
    # re-split into 4 time-ordered files
    part1 = spark.read.parquet(src).sort("ts")
    src2 = str(tmp_path / "ss_src2")
    n = events.count()
    pdf = part1.toPandas()
    import os

    os.makedirs(src2)
    for i in range(4):
        chunk = pdf.iloc[i * n // 4 : (i + 1) * n // 4]
        spark.createDataFrame(chunk, schema=EVENTS_SCHEMA).coalesce(1).write.parquet(
            src2 + f"/f{i}", mode="overwrite"
        )
    paths = [src2 + f"/f{i}" for i in range(4)]
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src2 + "/f*")
    )
    name = f"ss_{int(time.time())}"
    q = (
        sessionize_stateful(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ss_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table(name).collect()
    assert got, "no sessions closed — watermark never advanced"
    batch = {
        (r.user_id, r.start, r.end): (r.n, round(r.total, 6))
        for r in events.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("start"),
            F.col("w.end").alias("end"),
            "n",
            "total",
        )
        .collect()
    }
    for r in got:
        key = (
            r.user_id,
            r.session_start,
            # session_window end = last_ts + gap
            r.session_end + __import__("datetime").timedelta(seconds=1800),
        )
        assert key in batch, (key, sorted(batch)[:3])
        assert batch[key][0] == r.n_events
        assert abs(batch[key][1] - r.sum_value) < 1e-6


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """Streaming click→purchase attribution join must produce exactly the
    batch interval-join rows (inner join; all input available, so the
    watermark never drops a match)."""
    from hive_2_3_2_spark.streaming import stream_stream_interval_join

    src = _events_source(spark, sf_dir, tmp_path)
    clicks_s = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(src)
        .filter("event_type = 'click'")
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
    )
    buys_s = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(src)
        .filter("event_type = 'purchase'")
        .select("user_id", "ts", F.col("event_id").alias("buy_id"))
    )
    joined = stream_stream_interval_join(clicks_s, buys_s).select(
        "click_id", "buy_id"
    )
    sink = str(tmp_path / "ssj_sink")
    q = (
        joined.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.click_id, r.buy_id) for r in spark.read.parquet(sink).collect()}

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"),
        F.col("event_id").alias("click_id"),
    )
    buys = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("bu"), F.col("ts").alias("bts"),
        F.col("event_id").alias("buy_id"),
    )
    expected = {
        (r.click_id, r.buy_id)
        for r in clicks.join(
            buys,
            (F.col("cu") == F.col("bu"))
            & (F.col("bts") > F.col("cts"))
            & (F.col("bts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert expected, "no attribution pairs in fixture"
    assert got == expected


def test_stream_static_enrich_matches_batch_and_is_stateless(
    spark, sf_dir, tmp_path
):
    from hive_2_3_2_spark.streaming import stream_static_enrich

    src = _events_source(spark, sf_dir, tmp_path)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    dim = spark.createDataFrame(
        [(t, i) for i, t in enumerate(["click", "view", "purchase", "error"])],
        ["event_type", "type_rank"],
    )
    out = stream_static_enrich(stream, dim, ["event_type"])
    q = (
        out.writeStream.format("memory")
        .queryName("enriched")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("enriched")
    batch = load_table(spark, sf_dir, "events").join(
        dim, ["event_type"], "left"
    )
    assert got.count() == batch.count()
    assert (
        got.groupBy("type_rank").count().orderBy("type_rank").collect()
        == batch.groupBy("type_rank").count().orderBy("type_rank").collect()
    )
    # stateless: no state store rows for a stream-static join
    assert q.lastProgress is None or all(
        (s.get("numRowsTotal", 0) == 0)
        for s in (q.lastProgress.get("stateOperators") or [])
    )


def test_stream_upsert_sink_cdc_versioned_merge(spark, sf_dir, tmp_path):
    """CDC feed: key = pmod(event_id, 97), version = event_id (unique per
    key). Final table must hold the max-version row per key regardless of
    which micro-batch each file lands in (out-of-order tolerance)."""
    from pyspark.sql import Window

    from hive_2_3_2_spark.streaming import stream_upsert_sink

    feed = (
        load_table(spark, sf_dir, "events")
        .select(
            F.pmod("event_id", F.lit(97)).alias("entity_id"),
            F.col("event_id").alias("ver"),
            "event_type",
            "value",
        )
    )
    src = str(tmp_path / "cdc_src")
    feed.repartition(6).write.parquet(src)

    stream = (
        spark.readStream.schema(
            "entity_id BIGINT, ver BIGINT, event_type STRING, value DOUBLE"
        )
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    target = str(tmp_path / "cdc_target")
    ckpt = str(tmp_path / "cdc_ckpt")
    q = stream_upsert_sink(stream, target, ["entity_id"], ckpt, order_col="ver")
    q.awaitTermination(180)

    w = Window.partitionBy("entity_id").orderBy(F.col("ver").desc())
    want = (
        feed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    got = spark.read.parquet(target)
    assert got.count() == want.count()
    key = lambda r: r.entity_id
    assert sorted(got.collect(), key=key) == sorted(want.collect(), key=key)


def test_stream_rollup_sink_matches_batch_recompute(spark, sf_dir, tmp_path):
    """Streaming continuous aggregate: folding the events stream into the
    rollup micro-batch by micro-batch must equal a flat batch rollup of
    all events — the mergeable-partials contract under arbitrary batch
    splits."""
    from hive_2_3_2_spark.operators import rollup_finalize, rollup_partials
    from hive_2_3_2_spark.streaming import stream_rollup_sink

    src = _events_source(spark, sf_dir, tmp_path)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    path = str(tmp_path / "live_rollup")
    ckpt = str(tmp_path / "live_ckpt")
    q = stream_rollup_sink(stream, path, ckpt)
    q.awaitTermination(180)

    got = rollup_finalize(spark.read.parquet(path)).orderBy(
        "bucket_start", "event_type"
    )
    want = rollup_finalize(
        rollup_partials(load_table(spark, sf_dir, "events"))
    ).orderBy("bucket_start", "event_type")
    assert got.collect() == want.collect()
