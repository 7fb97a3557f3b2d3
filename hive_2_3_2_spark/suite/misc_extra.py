"""Late-round additions: lead/lag offsets+defaults, null-safe join (<=>),
UNION type coercion, keep-first dedup pattern."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.suite import query


@query(
    "window_lead_lag_offsets",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(LAG(o_totalprice, 2, -1.0) OVER w, 2)  AS lag2,
           ROUND(LEAD(o_totalprice, 3, 0.0) OVER w, 2)  AS lead3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def lead_lag_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag with explicit offsets and default values
    (GenericUDFLeadLag's 3-arg form, FunctionRegistry.java:503-506)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice", 2, -1.0).over(w), 2).alias("lag2"),
        F.round(F.lead("o_totalprice", 3, 0.0).over(w), 2).alias("lead3"),
    )


@query(
    "join_null_safe_equality",
    oracle="""
    WITH a AS (
      SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
                  ELSE o_orderstatus END AS k,
             o_orderkey
      FROM orders WHERE o_orderkey < 2000
    ), b AS (
      SELECT DISTINCT CASE WHEN n_nationkey = 0 THEN NULL
                  ELSE 'O' END AS k
      FROM nation WHERE n_nationkey < 2
    )
    SELECT a.k, CAST(COUNT(*) AS BIGINT) AS n
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY a.k
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=>, FunctionRegistry.java:358 — NULL
    matches NULL; a plain = join would drop those rows)."""
    a = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            F.when(F.col("o_orderkey") % 100 == 0, None)
            .otherwise(F.col("o_orderstatus"))
            .alias("k"),
            "o_orderkey",
        )
    )
    b = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey") < 2)
        .select(
            F.when(F.col("n_nationkey") == 0, None).otherwise("O").alias("k")
        )
        .distinct()
    )
    return (
        a.join(b, a.k.eqNullSafe(b.k))
        .groupBy(a.k)
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "setop_union_type_coercion",
    oracle="""
    SELECT v FROM (
      SELECT CAST(n_nationkey AS DOUBLE) AS v FROM nation
      UNION ALL
      SELECT n_regionkey + 0.5 FROM nation
    ) t
    """,
)
def union_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION branch type coercion: int column unioned with double widens
    to double (Hive's implicit-conversion common-type resolution,
    FunctionRegistry common type logic)."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(F.col("n_nationkey").cast("int").alias("v")).unionAll(
        n.select((F.col("n_regionkey") + 0.5).alias("v"))
    )


@query(
    "dedup_keep_first_by_priority",
    oracle="""
    SELECT user_id, event_type, event_id
    FROM (
      SELECT user_id, event_type, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first-by-priority dedup: the canonical row_number()=1 pattern
    (deterministic alternative to dropDuplicates' arbitrary row choice) —
    the workhorse of training-data dedup materialization."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id")
    )
