"""Hive sort/distribution semantics (SURVEY §2.7; parse/HiveParser.g:84-89,
genReduceSinkPlan parse/SemanticAnalyzer.java:7962)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hive_order_by(df: DataFrame, *cols: Column | str) -> DataFrame:
    """ORDER BY — total order. Spark range-partitions via sampling
    (parallel; Hive funnels through ONE reducer —
    exec/HiveTotalOrderPartitioner.java exists but is off by default)."""
    return df.orderBy(*cols)


def sort_by(df: DataFrame, *cols: Column | str) -> DataFrame:
    """SORT BY — per-partition order only."""
    return df.sortWithinPartitions(*cols)


def distribute_by(df: DataFrame, *cols: Column | str, n: int | None = None) -> DataFrame:
    """DISTRIBUTE BY — hash partition on cols (= ReduceSink partition
    cols, exec/ReduceSinkOperator.java:103)."""
    return df.repartition(n, *cols) if n else df.repartition(*cols)


def cluster_by(df: DataFrame, *cols: Column | str, n: int | None = None) -> DataFrame:
    """CLUSTER BY = DISTRIBUTE BY + SORT BY on the same cols."""
    return sort_by(distribute_by(df, *cols, n=n), *cols)


def top_k_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_fn: str = "row_number",
) -> DataFrame:
    """Top-k rows per group via ranking-window + filter.

    Hive pushes this via PTFTopNHash (exec/PTFTopNHash.java:35); Spark
    3.5+ infers a WindowGroupLimit below the shuffle, so only ~k rows per
    (task, group) move — verify with .explain() showing WindowGroupLimit.
    ``rank_fn``: row_number | rank | dense_rank.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    rk = getattr(F, rank_fn)().over(w)
    return df.withColumn("__rk", rk).filter(F.col("__rk") <= k).drop("__rk")
