"""Third function batch: array family, boolean aggregates, IGNORE NULLS
windows, interval arithmetic (SURVEY §1.2 interval_year_month /
interval_day_time; §2.9 complex-type functions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.suite import query


@query(
    "fn_array_family",
    oracle="""
    WITH t AS (
      SELECT n_nationkey AS k,
             [n_nationkey, n_nationkey + 1, n_nationkey + 2, 1] AS arr
      FROM nation
    )
    SELECT k,
           array_to_string(list_slice(arr, 2, 4), ',')          AS sliced,
           CAST(list_position(arr, 1) AS INT)                   AS pos1,
           array_to_string(flatten([arr, [100, 200]]), ',')     AS flat,
           array_to_string(range(1, 6), ',')                    AS seq15,
           array_to_string(list_filter(arr, x -> x <> 1), ',')  AS removed,
           CAST(list_sum(list_transform(arr, x -> x * 2)) AS BIGINT)
             AS doubled_sum,
           CAST(list_max(arr) AS INT)                           AS mx,
           CAST(list_min(arr) AS INT)                           AS mn,
           array_to_string(list_reverse_sort(arr), ',')         AS rsorted
    FROM t
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions: slice, array_position, flatten, sequence,
    array_remove, transform+aggregate, array_max/min, reverse sort —
    the §2.9 complex-type surface plus Spark's HOF extensions."""
    n = load_table(spark, sf_dir, "nation")
    arr = F.array(
        F.col("n_nationkey"),
        F.col("n_nationkey") + 1,
        F.col("n_nationkey") + 2,
        F.lit(1),
    )
    return n.select(
        F.col("n_nationkey").alias("k"),
        F.array_join(F.slice(arr, 2, 3), ",").alias("sliced"),
        F.array_position(arr, 1).cast("int").alias("pos1"),
        F.array_join(
            F.flatten(F.array(arr, F.array(F.lit(100), F.lit(200)))), ","
        ).alias("flat"),
        F.array_join(F.sequence(F.lit(1), F.lit(5)), ",").alias("seq15"),
        F.array_join(F.array_remove(arr, 1), ",").alias("removed"),
        F.aggregate(
            F.transform(arr, lambda x: x * 2),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("doubled_sum"),
        F.array_max(arr).cast("int").alias("mx"),
        F.array_min(arr).cast("int").alias("mn"),
        F.array_join(F.sort_array(arr, asc=False), ",").alias("rsorted"),
    )


@query(
    "agg_boolean_family",
    oracle="""
    SELECT o_orderstatus,
           BOOL_OR(o_totalprice > 400000)   AS any_big,
           BOOL_AND(o_totalprice > 1000)    AS all_over_1k,
           CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
                AS BIGINT)                  AS n_urgent,
           CAST(SUM(DISTINCT o_custkey) AS BIGINT) AS sum_dist_cust
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (any/bool_or, every/bool_and), count_if,
    SUM(DISTINCT) — FunctionRegistry UDAF surface."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_big"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
        F.sum_distinct(F.col("o_custkey")).alias("sum_dist_cust"),
    )


@query(
    "window_ignore_nulls",
    oracle="""
    WITH t AS (
      SELECT o_custkey, o_orderkey,
             CASE WHEN o_totalprice > 300000 THEN o_totalprice END AS big
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           ROUND(LAST_VALUE(big IGNORE NULLS) OVER w, 2)  AS last_big,
           ROUND(FIRST_VALUE(big IGNORE NULLS) OVER w2, 2) AS first_big
    FROM t
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w2 AS (PARTITION BY o_custkey ORDER BY o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with IGNORE NULLS (Hive's skipNulls flag on
    GenericUDAFFirstValue/LastValue) — running last-known-value pattern."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, F.col("o_totalprice")).alias(
            "big"
        ),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w2 = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.last("big", ignorenulls=True).over(w), 2).alias("last_big"),
        F.round(F.first("big", ignorenulls=True).over(w2), 2).alias(
            "first_big"
        ),
    )


@query(
    "fn_interval_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP)       AS plus_3m,
           CAST(o_orderdate - INTERVAL 45 DAY AS TIMESTAMP)        AS minus_45d,
           CAST(o_orderdate + INTERVAL 1 YEAR + INTERVAL 2 MONTH
                AS TIMESTAMP)                                      AS plus_ym,
           CAST(o_orderdate + INTERVAL 36 HOUR AS TIMESTAMP)       AS plus_36h,
           CAST(o_orderdate + INTERVAL 90 MINUTE AS TIMESTAMP)     AS plus_90min
    FROM orders WHERE o_orderkey < 200
    """,
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """interval_year_month / interval_day_time arithmetic
    (serdeConstants.java:109-111 → YearMonthIntervalType /
    DayTimeIntervalType, SURVEY §1.3)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        (d + F.expr("INTERVAL 3 MONTH")).alias("plus_3m"),
        (d - F.expr("INTERVAL 45 DAY")).alias("minus_45d"),
        (d + F.expr("INTERVAL 1 YEAR") + F.expr("INTERVAL 2 MONTH")).alias(
            "plus_ym"
        ),
        (d + F.expr("INTERVAL 36 HOUR")).alias("plus_36h"),
        (d + F.expr("INTERVAL 90 MINUTE")).alias("plus_90min"),
    )


@query(
    "fn_xpath_family",
    oracle="""
    SELECT doc_id,
           doc_id AS xid,
           lang AS xlang,
           source AS xsource,
           CAST(4 AS INT) AS n_children,
           doc_id % 7 = 0 AS is_lucky,
           CAST(n_chars AS DOUBLE) AS xchars
    FROM documents
    ORDER BY doc_id
    """,
)
def fn_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath function family (FunctionRegistry.java:318-327 xpath,
    xpath_string/boolean/double/long/int...; Spark natives). XML is
    CONSTRUCTED from the documents columns and xpath'd back out, so the
    DuckDB oracle — which has no xpath — verifies the round trip by
    selecting the original columns directly."""
    docs = load_table(spark, sf_dir, "documents")
    xml = F.concat(
        F.lit("<doc><id>"), F.col("doc_id").cast("string"),
        F.lit("</id><lang>"), F.col("lang"),
        F.lit("</lang><src>"), F.col("source"),
        F.lit("</src><chars>"), F.col("n_chars").cast("string"),
        F.lit("</chars></doc>"),
    )
    return docs.select(
        "doc_id",
        F.xpath_long(xml, F.lit("doc/id")).alias("xid"),
        F.xpath_string(xml, F.lit("doc/lang")).alias("xlang"),
        F.xpath_string(xml, F.lit("doc/src")).alias("xsource"),
        F.size(F.xpath(xml, F.lit("doc/*"))).alias("n_children"),
        F.xpath_boolean(
            F.concat(
                F.lit("<a><v>"),
                (F.col("doc_id") % 7 == 0).cast("string"),
                F.lit("</v></a>"),
            ),
            F.lit("a/v = 'true'"),
        ).alias("is_lucky"),
        F.xpath_double(xml, F.lit("doc/chars")).alias("xchars"),
    ).orderBy("doc_id")
