"""Join surface: every join type the reference executes.

Reference join types (ql/.../plan/JoinDesc.java:42-47): INNER, LEFT_OUTER,
RIGHT_OUTER, FULL_OUTER, UNIQUE, LEFT_SEMI (+ CROSS in the grammar,
parse/FromClauseParser.g:147; anti-join via NOT EXISTS rewrite,
parse/CalcitePlanner.java:1503). Strategies (SURVEY §2.4): shuffle join
(CommonJoinOperator.java:51), broadcast map-join (MapJoinOperator.java:78),
SMB (SMBMapJoinOperator.java:60), skew (SkewJoinHandler.java:74) — Catalyst
+ AQE pick these automatically; we add explicit ``broadcast()`` hints where
the dimension side is known-small.

Scale: only equi-joins shuffle; every dim join below broadcasts, so at
100 TB the fact table never moves for those. Mixed equi+residual conditions
keep the equi part as the shuffle key and evaluate the residual post-match
(same as Hive's residual filter handling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.suite import query


@query(
    "join_inner_orders_customer",
    oracle="""
    SELECT o_orderkey, c_name, ROUND(o_totalprice, 2) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'MACHINERY' AND o_totalprice > 300000
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join, dim side broadcast (MapJoinOperator parity)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    return orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_name", F.round("o_totalprice", 2).alias("total")
    )


@query(
    "join_left_outer_customer_orders",
    oracle="""
    SELECT c_custkey,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


@query(
    "join_right_outer_orders_customer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey
    FROM orders RIGHT JOIN customer
      ON o_custkey = c_custkey AND o_totalprice > 450000
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join with a join-condition (not WHERE) filter — the
    semantics Hive resolves in JoinCondDesc; unmatched right rows keep
    NULL o_orderkey."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return orders.join(
        cust,
        (orders.o_custkey == cust.c_custkey) & (orders.o_totalprice > 450000),
        "right",
    ).select("c_custkey", "c_name", "o_orderkey")


@query(
    "join_full_outer_daily_activity",
    oracle="""
    WITH o AS (
      SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01' GROUP BY 1
    ), l AS (
      SELECT CAST(l_shipdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n_ships
      FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01' GROUP BY 1
    )
    SELECT COALESCE(o.d, l.d) AS d, n_orders, n_ships
    FROM o FULL OUTER JOIN l ON o.d = l.d
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates with unmatched rows on both sides
    (order dates end 2001-08, ship dates run to 2001-11)."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp"))
        .groupBy(F.col("l_shipdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_ships"))
    )
    return orders.join(li, orders.d == li.d, "full").select(
        F.coalesce(orders.d, li.d).alias("d"), "n_orders", "n_ships"
    )


@query(
    "join_left_semi_active_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (JoinDesc LEFT_SEMI=5; Hive rewrites IN-subqueries to
    semi joins, parse/SemanticAnalyzer.java:3354)."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_left_anti_inactive_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (Hive: NOT EXISTS rewrite, CalcitePlanner.java:1503)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_cross_region_nation",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (parse/FromClauseParser.g:147; guarded in Hive by
    CrossProductCheck — Spark requires crossJoin/explicit syntax too)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


@query(
    "join_mixed_equi_residual",
    oracle="""
    SELECT o_orderkey, CAST(COUNT(*) AS BIGINT) AS late_lines
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderkey
    """,
)
def join_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with a non-equi residual predicate: the equi key drives the
    shuffle; the date inequality is evaluated post-match (Hive: residual
    filter in CommonJoinOperator; full theta would need cross+filter)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > F.date_add(orders.o_orderdate, 90)),
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("late_lines"))
    )


@query(
    "join_skew_salted",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_returnflag
    """,
)
def join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join under AQE skew handling.

    Hive needs a dedicated runtime operator for skewed keys
    (exec/SkewJoinHandler.java:74 spills oversized keys to a follow-up
    job); Spark's AQE splits skewed partitions in-place
    (spark.sql.adaptive.skewJoin.enabled, on in our session). For
    pathological producer-side skew beyond AQE, operators/joins.py
    provides an explicit salting helper.
    """
    from hive_2_3_2_spark.catalog import register_star_schema

    register_star_schema(spark, sf_dir)
    # SQL text over the memoized star views — same analyzed plan as the
    # former join/groupBy chain (r12).
    return spark.sql("""
        SELECT l_returnflag, COUNT(1) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_returnflag
    """)


@query(
    "join_smb_bucketed",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def join_smb_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-merge-bucket join over two co-bucketed tables
    (exec/SMBMapJoinOperator.java:60): both sides written with
    bucketBy(8, custkey) + sortBy at explicit scratch locations, so the
    SMJ reads pre-bucketed, pre-sorted files and joins with NO shuffle
    exchange on either side (plan pinned in
    tests/test_plan_regression.py). At 100 TB this is THE fact-fact
    join strategy: bucket both tables once at write time, every
    subsequent join on the bucket key is exchange-free."""
    import os

    from hive_2_3_2_spark.sources.writers import write_bucketed_table
    from hive_2_3_2_spark.suite._scratch import scratch_root

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = os.path.join(scratch_root("smb"), tag)
    names = {}
    for tbl, key in (("orders", "o_custkey"), ("customer", "c_custkey")):
        name = f"smb_{tbl}_{tag}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        write_bucketed_table(
            load_table(spark, sf_dir, tbl),
            name,
            [key],
            8,
            sort_cols=[key],
            path=os.path.join(base, tbl),
        )
        names[tbl] = name
    o = spark.table(names["orders"])
    c = spark.table(names["customer"])
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("c_mktsegment")
    )
