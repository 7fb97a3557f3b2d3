"""Aggregation surface: distinct aggs, grouping sets/cube/rollup, UDAFs.

Reference: GroupByOperator (ql/.../exec/GroupByOperator.java:75) with
2-phase modes (plan/GroupByDesc.java:43-60); GROUPING SETS expansion
(parse/SemanticAnalyzer.java:4058-4088); standard UDAF registrations
(exec/FunctionRegistry.java:407-446). Catalyst's HashAggregateExec does the
partial/final split + spill natively (SURVEY §2.5 — nothing physical to
build); this module pins the *semantics*.

Scale: groupBy on low-cardinality keys does map-side partial aggregation,
so the shuffle carries one row per (task, key) — constant in table size.
count(DISTINCT) expands to a two-shuffle plan keyed on (group, value),
which is the scalable formulation (no driver-side set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.suite import query


@query(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-DISTINCT aggregate (Hive CBO expands via
    HiveExpandDistinctAggregatesRule, CalcitePlanner.java:1811; Catalyst
    RewriteDistinctAggregates does the same expansion)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_rollup_order_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total,
           CAST(GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS BIGINT)
             AS grp_id
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping() (parse/HiveParser.g:79-82 tokens;
    FunctionRegistry.java:350 grouping). SQL text over the memoized star
    view — same analyzed plan as the former rollup().agg() chain (r12)."""
    from hive_2_3_2_spark.catalog import register_star_schema

    register_star_schema(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(1)                     AS n,
               ROUND(SUM(o_totalprice), 2)  AS total,
               CAST(GROUPING(o_orderstatus)
                    + 2 * GROUPING(o_orderpriority) AS BIGINT) AS grp_id
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """)


@query(
    "agg_cube_returnflag_linestatus",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two keys (SemanticAnalyzer.java:4066 getGroupingSetsForCube)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_grouping_sets_custom",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SemanticAnalyzer.java:4088). Uses the SQL
    path — Spark's DataFrame API added groupingSets in 4.0 but SQL is the
    reference-parity surface."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_having_filter",
    oracle="""
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15 AND SUM(o_totalprice) > 3000000
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter (Hive plans it as a FilterOperator
    above GroupByOperator, SemanticAnalyzer genBodyPlan)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .filter((F.col("n_orders") >= 15) & (F.col("total") > 3000000))
    )


@query(
    "agg_statistical_moments",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 6)  AS sd_qty,
           ROUND(STDDEV_POP(l_quantity), 6)   AS sdp_qty,
           ROUND(VAR_SAMP(l_discount), 6)     AS var_disc,
           ROUND(VAR_POP(l_discount), 6)      AS varp_disc,
           ROUND(COVAR_POP(l_quantity, l_extendedprice), 4) AS cov_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covs_qty_price,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical UDAFs (FunctionRegistry.java:407-446: std, stddev_samp,
    var_pop, var_samp, covar_pop, covar_samp, corr) — all Spark natives."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("sdp_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.var_pop("l_discount"), 6).alias("varp_disc"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias(
            "cov_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covs_qty_price"
        ),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
    )


@query(
    "agg_collect_set_sorted",
    oracle="""
    SELECT n_regionkey,
           array_to_string(LIST_SORT(LIST(DISTINCT n_name)), ',') AS nations,
           array_to_string(LIST_SORT(LIST(n_name)), ',')          AS nations_all
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set / collect_list (FunctionRegistry.java:434-435) with
    deterministic ordering via sort_array — collect order is undefined in
    both engines, so the comparable surface is the sorted, joined array."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations"),
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias(
            "nations_all"
        ),
    )


@query(
    "agg_exact_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4)  AS p50,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.95), 4) AS p95
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile (FunctionRegistry.java:446 percentile) — Spark's
    native ``percentile`` with linear interpolation matches DuckDB's
    quantile_cont. (approx_percentile exists for the 100 TB path where an
    exact sort-based percentile is too expensive — see
    agg_approx_percentile in aggregates_sketch.py, now hash-checked via
    exact-value + error-bound-boolean formulation.)"""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.5), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", 0.95), 4).alias("p95"),
    )
