"""DML suite entries — MERGE / UPDATE / DELETE emulation over parquet
(sources/writers.py), the reference's ACID DML surface
(parse/UpdateDeleteSemanticAnalyzer.java:62-86) re-expressed as
staged rewrites.

Each query copies a source table to a per-query scratch directory under
the repo (fixed path, overwritten per run — no growth), applies the DML
helper, then returns a deterministic aggregate of the resulting table.
The DuckDB oracle expresses the same end-state directly over the
original table (DELETE → WHERE NOT cond, UPDATE → CASE, MERGE →
CASE + UNION ALL of inserts), so the driver's hash compare verifies the
mutated table's contents exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.sources.writers import (
    delete_where,
    merge_upsert,
    update_where,
)
from hive_2_3_2_spark.suite import query
from hive_2_3_2_spark.suite._scratch import _fresh_copy

@query(
    "dml_delete_where",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE NOT (o_totalprice > 150000)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def dml_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE FROM orders WHERE o_totalprice > 150000, verified by
    aggregating the survivors (UpdateDeleteSemanticAnalyzer.java:80
    semantics; staged directory-swap rewrite, never cache-then-overwrite)."""
    path = _fresh_copy(spark, sf_dir, "orders", "delete_where")
    delete_where(spark, path, F.col("o_totalprice") > 150000)
    return (
        spark.read.parquet(path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "dml_delete_partitioned",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    WHERE NOT (o_orderdate < DATE '1993-01-01')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def dml_delete_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned DELETE: only partitions containing deleted rows are
    rewritten (partition-directory swap — a partition whose rows are all
    deleted is removed outright, which dynamic overwrite can't express)."""
    path = _fresh_copy(
        spark, sf_dir, "orders", "delete_part", partition_cols=["o_orderpriority"]
    )
    delete_where(
        spark,
        path,
        F.col("o_orderdate") < F.lit("1993-01-01").cast("date"),
        partition_cols=["o_orderpriority"],
    )
    return (
        spark.read.parquet(path)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


@query(
    "dml_update_where",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice + 10 ELSE o_totalprice END), 2)
               AS total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def dml_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE orders SET o_totalprice = o_totalprice + 10 WHERE
    o_orderpriority = '1-URGENT' (UpdateDeleteSemanticAnalyzer.java:62);
    +10 keeps the 2-decimal money exactness so sums compare exactly."""
    path = _fresh_copy(spark, sf_dir, "orders", "update_where")
    update_where(
        spark,
        path,
        {"o_totalprice": F.col("o_totalprice") + 10},
        F.col("o_orderpriority") == "1-URGENT",
    )
    return (
        spark.read.parquet(path)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "dml_merge_upsert",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(bal), 2) AS total
    FROM (
      SELECT c_mktsegment,
             CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 1000
                  ELSE c_acctbal END AS bal
      FROM customer
      UNION ALL
      SELECT c_mktsegment, 0.0 AS bal
      FROM customer WHERE c_custkey % 10 = 0
    )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def dml_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO customer: matched rows (custkey % 10 = 0) get
    c_acctbal + 1000; the same rows re-keyed +10M become inserts with
    balance 0 (WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT,
    UpdateDeleteSemanticAnalyzer.java:86)."""
    path = _fresh_copy(spark, sf_dir, "customer", "merge_upsert")
    base = spark.read.parquet(path).filter(F.col("c_custkey") % 10 == 0)
    updated = base.withColumn("c_acctbal", F.col("c_acctbal") + 1000)
    inserts = base.withColumn(
        "c_custkey", F.col("c_custkey") + 10_000_000
    ).withColumn("c_acctbal", F.lit(0.0))
    merge_upsert(
        spark, path, updated.unionByName(inserts), key_cols=["c_custkey"]
    )
    return (
        spark.read.parquet(path)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("total"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "dml_merge_matched_delete",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 50 = 0
               AND o_totalprice > 100000)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def dml_merge_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE ... WHEN MATCHED AND o_totalprice > 100000 THEN DELETE:
    the delete condition applies to MATCHED rows only — unmatched target
    rows over the price bar must survive."""
    path = _fresh_copy(spark, sf_dir, "orders", "merge_delete")
    updates = (
        spark.read.parquet(path)
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 50 == 0))
    )
    merge_upsert(
        spark,
        path,
        updates,
        key_cols=["o_orderkey"],
        delete_condition=F.col("o_totalprice") > 100000,
    )
    return (
        spark.read.parquet(path)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )
