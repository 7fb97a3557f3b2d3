"""Sorts, limits, top-K, distribution, sampling.

Reference (SURVEY §2.7): ORDER BY (total order, single reducer), SORT BY
(per-reducer), DISTRIBUTE BY (hash partition), CLUSTER BY (both) —
parse/HiveParser.g:84-89, genReduceSinkPlan parse/SemanticAnalyzer.java:7962;
LIMIT (exec/LimitOperator.java:32); top-K pushdown (exec/TopNHash.java:45
via optimizer/LimitPushdownOptimizer.java:91); TABLESAMPLE
(parse/SemanticAnalyzer.java:10268 genSamplePredicate).

Scale: Spark's orderBy range-partitions via sampling (parallel total order
= Hive's HiveTotalOrderPartitioner, automatic); orderBy+limit compiles to
TakeOrderedAndProject — a per-partition heap + driver merge, no global
sort. sortWithinPartitions/repartition map 1:1 to SORT/DISTRIBUTE BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.suite import query


@query(
    "sort_order_by_multi",
    oracle="""
    SELECT c_custkey, c_nationkey, ROUND(c_acctbal, 2) AS bal
    FROM customer
    ORDER BY c_nationkey ASC, bal DESC, c_custkey
    """,
)
def order_by_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total ORDER BY on mixed asc/desc keys (range-partitioned sort —
    parallel, unlike Hive's single reducer)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey", "c_nationkey", F.round("c_acctbal", 2).alias("bal")
    ).orderBy(F.asc("c_nationkey"), F.desc("bal"), F.asc("c_custkey"))


@query(
    "sort_nulls_ordering",
    oracle="""
    SELECT d, n_orders, n_ships
    FROM (
      WITH o AS (
        SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01' GROUP BY 1
      ), l AS (
        SELECT CAST(l_shipdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n_ships
        FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01' GROUP BY 1
      )
      SELECT COALESCE(o.d, l.d) AS d, n_orders, n_ships
      FROM o FULL OUTER JOIN l ON o.d = l.d
    ) t
    ORDER BY n_orders DESC NULLS LAST, d
    """,
)
def nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS FIRST/LAST ordering (Hive sorts nulls first ascending — we pin
    explicit NULLS LAST on a column that actually contains nulls)."""
    from hive_2_3_2_spark.suite.joins import join_full

    df = join_full(spark, sf_dir)
    return df.orderBy(F.desc_nulls_last("n_orders"), F.asc("d"))


@query(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25 OFFSET 10
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT with OFFSET (Hive genLimitPlan with offset,
    parse/SemanticAnalyzer.java:7689)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
        .orderBy(F.desc("total"), "o_orderkey")
        .offset(10)
        .limit(25)
    )


@query(
    "sort_topk_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 15
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject (per-partition heap, no
    global sort; = ReduceSink TopNHash, exec/TopNHash.java:45). At 100 TB
    this reads all data but shuffles only 15×P rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price")
        )
        .orderBy(F.desc("price"), "l_orderkey", "l_linenumber")
        .limit(15)
    )


@query(
    "sort_distribute_cluster_by",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber
    FROM lineitem WHERE l_quantity > 45
    """,
)
def distribute_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTE BY + SORT BY (= CLUSTER BY, HiveParser.g:84-89):
    repartition on the key then sort within partitions. Global row set is
    unchanged (the oracle checks content); the per-partition clustering is
    asserted in tests/test_operators.py."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        li.select("l_suppkey", "l_orderkey", "l_linenumber")
        .repartition("l_suppkey")
        .sortWithinPartitions("l_suppkey", "l_orderkey", "l_linenumber")
    )


@query(
    "sample_bucket_deterministic",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_orderkey % 8 = 0
    """,
)
def bucket_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE(BUCKET 1 OUT OF 8 ON l_orderkey) semantics: Hive buckets
    int columns by their value (Hive hash(int)=int), so bucket-1-of-8 on an
    int key is exactly ``key % 8 = 0`` (genSamplePredicate,
    parse/SemanticAnalyzer.java:10268)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.pmod(F.col("l_orderkey"), F.lit(8)) == 0).select(
        "l_orderkey", "l_linenumber"
    )


@query(
    "sample_fraction",
    oracle="""
    SELECT TRUE AS count_in_bounds, TRUE AS all_rows_from_source
    """,
)
def fraction_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent TABLESAMPLE → df.sample(fraction, seed). The row SET is
    engine-RNG-dependent (no cross-engine value oracle exists), so this
    emits INVARIANT BOOLEANS (the sketch/ANN-entry trick): the sampled
    count sits inside ±6σ Bernoulli bounds around 0.1·n, and an anti-join
    proves every sampled row exists in the source. Both booleans are
    TRUE for any correct Bernoulli sampler (6σ ≈ 1-in-10⁹ per run even
    over RNG draws), so the DuckDB literal oracle hash-checks them; the
    tighter count bounds stay asserted in tests/test_operators.py."""
    import math

    li = load_table(spark, sf_dir, "lineitem")
    sampled = li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber"
    )
    n = li.count()
    mu, sigma = 0.1 * n, math.sqrt(n * 0.1 * 0.9)
    lo, hi = int(mu - 6 * sigma), int(mu + 6 * sigma)
    stats = sampled.agg(F.count(F.lit(1)).alias("k"))
    foreign = sampled.join(
        li.select("l_orderkey", "l_linenumber"),
        ["l_orderkey", "l_linenumber"],
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("bad"))
    return stats.crossJoin(foreign).select(
        F.col("k").between(lo, hi).alias("count_in_bounds"),
        (F.col("bad") == 0).alias("all_rows_from_source"),
    )
