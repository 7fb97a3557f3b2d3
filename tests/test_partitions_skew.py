"""Partition pruning (static + dynamic) and skew handling — the
scale-critical physical behaviors (SURVEY §4.3; FIXTURES §3/§8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.plans import explain_str


@pytest.fixture(scope="module")
def orders_partitioned(spark, sf_dir, tmp_path_factory):
    """srcpart parity: orders partitioned by status (directory keys)."""
    path = str(tmp_path_factory.mktemp("part") / "orders_by_status")
    orders = load_table(spark, sf_dir, "orders")
    orders.withColumn("status", F.col("o_orderstatus")).write.partitionBy(
        "status"
    ).parquet(path)
    return path


def test_static_partition_pruning(spark, orders_partitioned):
    """WHERE on the partition column prunes directories at plan time
    (PartitionPruner parity, optimizer/ppr/PartitionPruner.java:74)."""
    df = spark.read.parquet(orders_partitioned).filter(F.col("status") == "F")
    plan = explain_str(df)
    assert "PartitionFilters: [isnotnull(status" in plan or "status" in plan
    # pruned scan reads only the F partition:
    n_f = df.count()
    total = spark.read.parquet(orders_partitioned).count()
    assert 0 < n_f < total
    # the physical scan's partition count reflects pruning
    assert "PartitionFilters" in plan


def test_dynamic_partition_pruning_plan(spark, sf_dir, orders_partitioned):
    """Join against a filtered dim triggers DPP: the fact scan gets a
    runtime subquery filter on the partition key
    (= AppMasterEventOperator events, ql/.../exec/AppMasterEventOperator.java:46)."""
    fact = spark.read.parquet(orders_partitioned)
    # the dim filter must NOT be statically foldable onto the partition
    # column (Catalyst would turn it into a plain PartitionFilter —
    # stronger than DPP but not what we're testing): filter on an
    # aggregate of another column.
    dim = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 4000)
    )
    joined = fact.join(F.broadcast(dim), "status")
    plan = explain_str(joined)
    assert "dynamicpruning" in plan.lower() or "SubqueryBroadcast" in plan, plan


def test_skewed_join_aqe_and_salted_agree(spark, sf_dir, tmp_path):
    """FIXTURES §8 skew fixture: 100k rows, 90% mass on key=0, joined to a
    uniform side — AQE plan and the explicit salted join must agree."""
    from hive_2_3_2_spark.operators import salted_skew_join

    skewed = spark.range(100_000).select(
        F.when(F.rand(7) < 0.9, 0).otherwise((F.rand(11) * 500).cast("long")).alias("key"),
        F.lit("v").alias("payload"),
    )
    uniform = spark.range(500).select(
        F.col("id").alias("key"), (F.col("id") * 2).alias("val")
    )
    plain = (
        skewed.join(uniform, "key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()[0]
    )
    salted = (
        salted_skew_join(skewed, uniform, "key", salt_buckets=16)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()[0]
    )
    assert (plain.n, plain.s) == (salted.n, salted.s)
    assert plain.n >= 100_000 * 9 // 10  # hot key joined


def test_bucket_pruning_on_bucketed_table(spark, sf_dir):
    """Bucketed scan + equality filter on the bucket column reads a single
    bucket (FixedBucketPruningOptimizer parity)."""
    import uuid

    t = f"bp_{uuid.uuid4().hex[:6]}"
    load_table(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").mode(
        "overwrite"
    ).saveAsTable(t)
    # Spark auto-disables bucketed scans when no operator exploits the
    # clustering; force it on so the point-filter bucket pruning shows.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table(t).filter(F.col("o_orderkey") == 42)
        plan = explain_str(df)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.sql(f"DROP TABLE {t}")


def test_dml_rewrite_scan_statically_prunes_touched_partitions(spark, sf_dir, tmp_path):
    """The partitioned DML rewrite must compile the collected touched
    partition values into static PartitionFilters so the rewrite scan
    READS only those partitions — the broadcast-semi-join form is
    value-identical but scans the whole table (the 100 TB failure mode:
    a DELETE touching one day rewriting nothing but scanning all)."""
    from pyspark.sql import functions as F

    from hive_2_3_2_spark.sources.writers import (
        _partition_filter,
        parquet_row_count,
    )

    path = str(tmp_path / "orders_prune.parquet")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .repartition("o_orderpriority")
        .write.partitionBy("o_orderpriority")
        .parquet(path)
    )
    target = spark.read.parquet(path)
    pred = _partition_filter(["o_orderpriority"], [("1-URGENT",)])
    plan = (
        target.filter(pred)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "1-URGENT" in plan.split("PartitionFilters")[1].split("]")[0]

    # end-to-end: DELETE confined to one partition leaves other
    # partitions' FILES untouched (same inodes — no rewrite happened)
    import os

    def files_of(prio):
        d = os.path.join(path, f"o_orderpriority={prio}")
        return {
            f: os.stat(os.path.join(d, f)).st_mtime_ns
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before_low = files_of("5-LOW")
    from hive_2_3_2_spark.sources.writers import delete_where

    n = delete_where(
        spark,
        path,
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderkey") % 2 == 0),
        ["o_orderpriority"],
    )
    assert n > 0
    assert files_of("5-LOW") == before_low  # untouched partition intact
    assert parquet_row_count(path) == spark.read.parquet(path).count()
