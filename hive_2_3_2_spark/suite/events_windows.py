"""Event-time windowing over the events table (batch form).

The reference has no stream engine (SURVEY §2.10) — these are the
Spark-native extras the north star asks for: tumbling/sliding/session
windows + dedup, expressed with the same F.window/F.session_window
operators Structured Streaming uses (identical semantics in batch mode;
the streaming wiring — readStream/watermark/writeStream — lives in
hive_2_3_2_spark/streaming/ and is exercised in tests/test_streaming.py).

Scale: event-time windows groupBy (window, key) — shuffle is keyed on the
window bucket, so parallelism scales with #buckets × #keys. Session
windows merge per key; the partitionBy(user_id) shuffle is the same one
applyInPandasWithState would use in a live stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.suite import query


@query(
    "events_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS win_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate (F.window)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "events_sliding_window",
    oracle="""
    SELECT CAST(to_timestamp((FLOOR(epoch(ts) / 1800) - k) * 1800) AS TIMESTAMP)
             AS win_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM events, UNNEST([0, 1]) AS u(k)
    GROUP BY 1
    """,
)
def sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h window, 30 min slide): each event lands in
    exactly window/slide = 2 buckets; Spark materializes the duplication
    inside WindowExec's generator. The oracle replicates it with an
    explicit 2-offset unnest over the slide grid."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n", "sum_value")
    )


@query(
    "events_session_window",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    islands AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM gaps
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS session_value
    FROM islands
    GROUP BY user_id, sess
    """,
)
def session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user
    (F.session_window — Spark merges overlapping [ts, ts+gap) intervals;
    window.end = last event + gap). Oracle: classic gaps-and-islands."""
    from hive_2_3_2_spark.catalog import register_star_schema

    register_star_schema(spark, sf_dir)
    # SQL text over the memoized events view — same analyzed plan as the
    # former groupBy(F.session_window(...)) chain (r12).
    return spark.sql("""
        SELECT user_id, w.start AS session_start, w.end AS session_end,
               n_events, session_value
        FROM (
          SELECT session_window(ts, '30 minutes') AS w, user_id,
                 COUNT(1) AS n_events,
                 ROUND(SUM(value), 4) AS session_value
          FROM events
          GROUP BY session_window(ts, '30 minutes'), user_id
        ) t
    """)


@query(
    "events_dedup_distinct",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a projection — the batch twin of streaming
    watermark dedup (streaming/ wires the withWatermark variant)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").dropDuplicates()


@query(
    "events_rate_per_type_share",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (), 6) AS share
    FROM events
    GROUP BY event_type
    """,
)
def type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + window-over-aggregate composition (share-of-total)."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    agg = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return agg.select(
        "event_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(Window.partitionBy()), 6).alias(
            "share"
        ),
    )


@query(
    "stream_stateful_running_totals",
    oracle="""
    SELECT user_id,
           CAST(COUNT(value) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState,
    streaming/stateful.py running_totals) run end-to-end: stage events as
    a file-source stream, run with Trigger.AvailableNow into a memory
    sink, return the final per-user state. Single input file → one
    micro-batch → update-mode output equals the batch aggregate (the
    cross-micro-batch state carry is asserted in
    tests/test_streaming.py with maxFilesPerTrigger=1)."""
    import tempfile
    import uuid

    from hive_2_3_2_spark.streaming import running_totals

    tmp = tempfile.mkdtemp(prefix="stateful_rt_")
    src = f"{tmp}/src"
    load_table(spark, sf_dir, "events").coalesce(1).write.parquet(src)
    schema = (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING"
    )
    name = f"rt_{uuid.uuid4().hex[:8]}"
    q = (
        running_totals(spark.readStream.schema(schema).parquet(src))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n").alias("n"), F.round(F.max("total"), 2).alias("total"))
        .orderBy("user_id")
    )


@query(
    "events_click_purchase_attribution",
    oracle="""
    SELECT c.event_id AS click_id, b.event_id AS buy_id,
           ROUND(b.value, 2) AS buy_value
    FROM events c
    JOIN events b
      ON c.user_id = b.user_id
     AND b.ts > c.ts
     AND b.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND b.event_type = 'purchase'
    ORDER BY click_id, buy_id
    """,
)
def click_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join (attribution): purchases within 1h after
    a click by the same user — the batch semantics of
    streaming/stateful.py stream_stream_interval_join (streaming parity
    asserted in tests/test_streaming.py). Equi-join on user_id with a
    range residual — Catalyst plans the equi part as the shuffle key, so
    no cross product forms; the range bound is what lets the streaming
    form evict state."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"),
        F.col("event_id").alias("click_id"),
    )
    buys = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("bu"), F.col("ts").alias("bts"),
        F.col("event_id").alias("buy_id"), F.col("value"),
    )
    return (
        clicks.join(
            buys,
            (F.col("cu") == F.col("bu"))
            & (F.col("bts") > F.col("cts"))
            & (F.col("bts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "click_id", "buy_id", F.round(F.col("value"), 2).alias("buy_value")
        )
        .orderBy("click_id", "buy_id")
    )


@query(
    "events_rollup_incremental",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS sum_v,
           ROUND(ROUND(SUM(value), 2) / COUNT(*), 4) AS avg_v,
           MIN(value) AS min_v,
           MAX(value) AS max_v
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate serve path (operators/rollup.py): materialize
    hourly partials for history (ts < max-1day), then serve history ∪
    raw tail through the mergeable-partials algebra. The oracle is the
    flat GROUP BY over ALL events — incremental merge must equal full
    recompute exactly (that equality is the rollup's contract).

    Scale: the materialized side is one row per (hour, event_type); the
    tail aggregate scans only data past the high watermark; the merge
    re-aggregates rollup-sized rows, not raw rows."""
    from datetime import timedelta

    from hive_2_3_2_spark.operators.rollup import rollup_partials, rollup_serve

    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("m")).collect()[0].m
    cutoff = mx - timedelta(days=1)
    history = rollup_partials(ev.filter(F.col("ts") < F.lit(cutoff)))
    tail = ev.filter(F.col("ts") >= F.lit(cutoff))
    return rollup_serve(history, tail).orderBy("bucket_start", "event_type")


@query(
    "events_rollup_ndv_sketch",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket_start,
           event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv_exact,
           TRUE AS sketch_ok
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def rollup_ndv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count rollup (operators/rollup.py *_ndv): HLL
    sketch partials for history, unioned with the raw tail's sketch at
    serve time — the metric COUNT(DISTINCT) that plain additive partials
    cannot carry. Hash-checkable via the exact+bound trick: emit the
    EXACT per-bucket ndv (oracle-computable) plus a boolean that the
    merged-sketch estimate lands within 5% (+2 absolute slack for tiny
    buckets); the oracle asserts TRUE."""
    from datetime import timedelta

    from hive_2_3_2_spark.operators.rollup import (
        rollup_partials_ndv,
        rollup_serve_ndv,
    )

    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("m")).collect()[0].m
    cutoff = mx - timedelta(days=1)
    hist = rollup_partials_ndv(ev.filter(F.col("ts") < F.lit(cutoff)))
    est = rollup_serve_ndv(hist, ev.filter(F.col("ts") >= F.lit(cutoff)))
    exact = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_start"), "event_type"
    ).agg(F.count_distinct("user_id").alias("ndv_exact"))
    return (
        exact.join(est, ["bucket_start", "event_type"])
        .select(
            "bucket_start",
            "event_type",
            "ndv_exact",
            (
                F.abs(F.col("ndv_estimate") - F.col("ndv_exact"))
                <= F.greatest(0.05 * F.col("ndv_exact"), F.lit(2.0))
            ).alias("sketch_ok"),
        )
        .orderBy("bucket_start", "event_type")
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS w
      FROM events
    ),
    first_seen AS (
      SELECT user_id, MIN(w) AS cohort FROM act GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
      FROM first_seen GROUP BY cohort
    )
    SELECT f.cohort AS cohort_week,
           CAST(datediff('day', f.cohort, a.w) / 7 AS INT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active,
           ROUND(COUNT(DISTINCT a.user_id) * 1.0 / s.cohort_size, 4)
             AS retention
    FROM act a
    JOIN first_seen f USING (user_id)
    JOIN sizes s ON s.cohort = f.cohort
    GROUP BY f.cohort, CAST(datediff('day', f.cohort, a.w) / 7 AS INT),
             s.cohort_size
    ORDER BY cohort_week, week_offset
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple a Hive
    warehouse serves daily: cohort = a user's first active week
    (date_trunc to Monday), each later active week lands at its week
    offset; retention = active users / cohort size. Plan shape: ONE
    exchange keyed by user_id covers both the distinct weekly activity
    and the first-seen aggregate; cohort sizes are a broadcast-sized
    second aggregate joined back. At 100 TB of events the user_id
    shuffle is the only corpus-sized movement (events naturally
    pre-partitioned by date prune the scan)."""
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("w")
    ).distinct()
    first_seen = act.groupBy("user_id").agg(F.min("w").alias("cohort"))
    sizes = first_seen.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        act.join(first_seen, "user_id")
        .withColumn(
            "week_offset",
            (F.datediff(F.col("w"), F.col("cohort")) / 7).cast("int"),
        )
        .groupBy("cohort", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .join(F.broadcast(sizes), "cohort")
        .select(
            F.col("cohort").alias("cohort_week"),
            "week_offset",
            "n_active",
            F.round(F.col("n_active") / F.col("cohort_size"), 4).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "events_funnel_ordered_steps",
    oracle="""
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS ts1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) AS ts2
      FROM events e JOIN t1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > t1.ts1
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, MIN(e.ts) AS ts3
      FROM events e JOIN t2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
      GROUP BY e.user_id
    )
    SELECT step, CAST(n_users AS BIGINT) AS n_users FROM (
      SELECT '1_view' AS step, COUNT(*) AS n_users FROM t1
      UNION ALL SELECT '2_click', COUNT(*) FROM t2
      UNION ALL SELECT '3_purchase', COUNT(*) FROM t3
    ) ORDER BY step
    """,
)
def events_funnel_ordered_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase) with strict
    time causality: a user counts at step k only with a step-k event
    AFTER their first step-(k-1) event — the product-analytics funnel a
    Hive warehouse serves. Plan shape: one user_id-keyed aggregate per
    step over the step-filtered scan, each joined to the (user-count
    sized, broadcastable) previous frontier; the events scan is read
    once per step with the event_type filter pushed down. No window over
    the whole corpus, no per-user explode."""
    ev = load_table(spark, sf_dir, "events")

    def first_after(step: str, prev: DataFrame | None, tcol: str, pcol: str):
        e = ev.filter(F.col("event_type") == step)
        if prev is not None:
            e = e.join(F.broadcast(prev), "user_id").filter(
                F.col("ts") > F.col(pcol)
            )
        return e.groupBy("user_id").agg(F.min("ts").alias(tcol))

    t1 = first_after("view", None, "ts1", "")
    t2 = first_after("click", t1, "ts2", "ts1")
    t3 = first_after("purchase", t2, "ts3", "ts2")
    counts = [
        t1.agg(F.count(F.lit(1)).alias("n_users")).withColumn(
            "step", F.lit("1_view")
        ),
        t2.agg(F.count(F.lit(1)).alias("n_users")).withColumn(
            "step", F.lit("2_click")
        ),
        t3.agg(F.count(F.lit(1)).alias("n_users")).withColumn(
            "step", F.lit("3_purchase")
        ),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.select("step", "n_users").orderBy("step")
