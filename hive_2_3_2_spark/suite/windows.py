"""Window-function surface: ranking, analytic, ROWS/RANGE frames.

Reference: PTFOperator (ql/.../exec/PTFOperator.java:47) evaluating
WindowingTableFunction (udf/ptf/WindowingTableFunction.java:61 — RANGE
frames :198, ROWS frames :264); registered window fns
exec/FunctionRegistry.java:503-515 (lead lag row_number rank dense_rank
percent_rank cume_dist ntile first_value last_value; any UDAF over a
window). Default frames: parse/WindowingSpec.java:222-244.

Spark: Window.partitionBy().orderBy() with rowsBetween/rangeBetween —
WindowExec sorts within partitions after one shuffle on the partition key.
Scale: the shuffle is keyed on partitionBy cols; a window with no
partitionBy collapses to a single task (same single-reducer bottleneck as
Hive's ORDER BY) — every query below partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.suite import query


@query(
    "window_rank_top_parts",
    oracle="""
    SELECT * FROM (
      SELECT p_brand, p_partkey, ROUND(p_retailprice, 2) AS price,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
             CAST(RANK()       OVER w AS BIGINT) AS rnk,
             CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
      FROM part
      WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
    ) t WHERE rn <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand: row_number/rank/dense_rank + rank filter
    (Hive pushes this via PTFTopNHash, ql/.../exec/PTFTopNHash.java:35;
    Spark infers a window group limit). SQL text over the memoized star
    view — same analyzed plan as the former Window/F.* chain, built in
    one py4j call instead of ~20 (r12)."""
    from hive_2_3_2_spark.catalog import register_star_schema

    register_star_schema(spark, sf_dir)
    return spark.sql("""
        SELECT p_brand, p_partkey, price, rn, rnk, drnk FROM (
          SELECT p_brand, p_partkey,
                 ROUND(p_retailprice, 2)            AS price,
                 CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
                 CAST(RANK()       OVER w AS BIGINT) AS rnk,
                 CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
          FROM part
          WINDOW w AS (PARTITION BY p_brand
                       ORDER BY p_retailprice DESC, p_partkey)
        ) t WHERE rn <= 3
    """)


@query(
    "window_lead_lag_orders",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice, 2) AS total,
           ROUND(LAG(o_totalprice)  OVER w, 2) AS prev_total,
           ROUND(LEAD(o_totalprice) OVER w, 2) AS next_total,
           ROUND(o_totalprice - LAG(o_totalprice) OVER w, 2) AS delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag (FunctionRegistry.java:503-506) with a deterministic
    tiebreak on orderkey."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    total = F.col("o_totalprice")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(total, 2).alias("total"),
        F.round(F.lag(total).over(w), 2).alias("prev_total"),
        F.round(F.lead(total).over(w), 2).alias("next_total"),
        F.round(total - F.lag(total).over(w), 2).alias("delta"),
    )


@query(
    "window_running_sum_rows_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           ROUND(AVG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3
    FROM orders
    """,
)
def window_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frames: running total + 3-row moving average
    (WindowingTableFunction.java:264 ROWS evaluation)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias(
            "moving_avg_3"
        ),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total,
           CAST(COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_similar_cheaper
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering (value-based boundaries —
    WindowingTableFunction.java:198, ValueBoundaryScanner.java:36)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("total"),
        F.count(F.lit(1)).over(w).alias("n_similar_cheaper"),
    )


@query(
    "window_distribution_functions",
    oracle="""
    SELECT s_suppkey,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           ROUND(FIRST_VALUE(s_acctbal) OVER w2, 2) AS poorest_bal,
           ROUND(LAST_VALUE(s_acctbal)  OVER w2, 2) AS richest_bal
    FROM supplier
    WINDOW w  AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey),
           w2 AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist/first_value/last_value
    (FunctionRegistry.java:507-515). last_value uses an explicit unbounded
    frame — the default frame ends at CURRENT ROW (WindowingSpec.java:222),
    which makes last_value degenerate; same rule in both engines."""
    supp = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return supp.select(
        "s_suppkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.first("s_acctbal").over(w2), 2).alias("poorest_bal"),
        F.round(F.last("s_acctbal").over(w2), 2).alias("richest_bal"),
    )


@query(
    "window_share_of_partition",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice / SUM(l_extendedprice) OVER
                 (PARTITION BY l_orderkey), 6) AS line_share
    FROM lineitem
    """,
)
def window_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered partition window (whole-partition aggregate per row) —
    the PTF 'partition table function' base case."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice") / F.sum("l_extendedprice").over(w), 6
        ).alias("line_share"),
    )


@query(
    "window_time_range_frame",
    oracle="""
    SELECT event_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_30m,
           ROUND(SUM(value) OVER w, 2) AS sum_30m
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts
      RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW
    )
    ORDER BY event_id
    """,
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-valued RANGE frame: per event, the count and value sum of
    the same user's events in the PRECEDING 30 minutes — the
    ValueBoundaryScanner time-range case (reference:
    udf/ptf/ValueBoundaryScanner.java:36; Hive's RANGE over a
    timestamp ORDER BY). Spark evaluates the interval frame natively
    in the Window node — no self-join, one user_id exchange."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("ev_time_range")
    return spark.sql(
        """
        SELECT event_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_30m,
               ROUND(SUM(value) OVER w, 2) AS sum_30m
        FROM ev_time_range
        WINDOW w AS (
          PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW
        )
        ORDER BY event_id
        """
    )
