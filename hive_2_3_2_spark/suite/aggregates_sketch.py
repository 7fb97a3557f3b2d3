"""Sketch-aggregate suite entries, oracle-checkable formulation.

approx_percentile / approx_count_distinct are approximate, so their raw
outputs can't hash-match an exact oracle. Formulation that CAN: emit the
EXACT value (DuckDB computes the same) plus a deterministic Spark-side
boolean asserting the sketch landed within its documented error bound —
the oracle emits TRUE, so a sketch drifting out of bounds flips the
boolean and fails the hash compare. This turns the two red rows-only
driver rows from round 1 into full hash-checked rows while still
exercising the sketch path (the 100 TB formulation: mergeable
constant-size sketch state through one shuffle).

Reference: GenericUDAFPercentileApprox (ql/.../udf/generic/
GenericUDAFPercentileApprox.java) and the Flajolet-Martin NDV estimator
(ql/.../udf/generic/NumDistinctValueEstimator.java:30).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.suite import query


@query(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 2) AS p50_exact,
           TRUE AS approx_within_2pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (FunctionRegistry.java:431) → approx_percentile
    (GK-sketch; mergeable ⇒ one shuffle of constant-size sketches at
    100 TB). Exact p50 ships for the hash compare; the sketch's value is
    asserted within 2% relative error — at accuracy 10000 the GK bound
    is far tighter, so the boolean is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", 0.5), 2).alias("p50_exact"),
            (
                F.abs(
                    F.percentile_approx("l_extendedprice", 0.5, 10000)
                    - F.percentile("l_extendedprice", 0.5)
                )
                / F.percentile("l_extendedprice", 0.5)
                <= 0.02
            ).alias("approx_within_2pct"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS approx_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct = HLL++ (reference NDV estimator is
    Flajolet-Martin, NumDistinctValueEstimator.java:30). Exact distinct
    count ships for the hash compare; the HLL estimate (default rsd
    0.05) is asserted within 5% relative error."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            (
                F.abs(
                    F.approx_count_distinct("l_partkey").cast("double")
                    - F.countDistinct("l_partkey")
                )
                / F.countDistinct("l_partkey")
                <= 0.05
            ).alias("approx_within_5pct"),
        )
        .orderBy("l_returnflag")
    )
