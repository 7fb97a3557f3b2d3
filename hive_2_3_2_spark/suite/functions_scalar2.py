"""Second scalar-function batch (SURVEY §2.9 continued): substring_index,
find_in_set, initcap, space/elt/chr, bin/hex/conv, str_to_map,
from_unixtime/unix_timestamp, months_between-family, null-handling ops.
Non-DuckDB-portable functions (soundex, format_number, sentences, conv,
xpath_*) are pinned by literal unit tests in tests/test_functions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.suite import query


@query(
    "fn_string_family2",
    oracle="""
    SELECT n_nationkey,
           split_part(n_name, '_', 1)                         AS prefix,
           split_part(n_name, '_', 2)                         AS num,
           CASE WHEN list_contains(string_split('NATION_1,NATION_2,NATION_3', ','),
                                   n_name)
                THEN CAST(list_position(string_split('NATION_1,NATION_2,NATION_3', ','),
                                        n_name) AS INT)
                ELSE 0 END                                    AS fis,
           concat(n_name, repeat(' ', 3), '|')                AS spaced,
           chr(65 + n_nationkey % 26)                         AS letter,
           bin(n_nationkey)                                   AS b,
           upper(left(lower(n_name), 1)) || substr(lower(n_name), 2) AS initcapped,
           ['a','b','c'][1 + n_nationkey % 3]                 AS elt_pick
    FROM nation
    """,
)
def fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """substring_index, find_in_set, space, chr, bin, initcap, elt
    (FunctionRegistry.java:195-263)."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.substring_index("n_name", "_", 1).alias("prefix"),
        F.substring_index("n_name", "_", -1).alias("num"),
        F.expr("find_in_set(n_name, 'NATION_1,NATION_2,NATION_3')").alias("fis"),
        F.concat("n_name", F.expr("space(3)"), F.lit("|")).alias("spaced"),
        F.chr(F.lit(65) + F.col("n_nationkey") % 26).alias("letter"),
        F.bin("n_nationkey").alias("b"),
        F.initcap(F.lower("n_name")).alias("initcapped"),
        F.expr(
            "elt(1 + n_nationkey % 3, 'a', 'b', 'c')"
        ).alias("elt_pick"),
    )


@query(
    "fn_str_to_map",
    oracle="""
    SELECT event_type,
           map_from_entries(list_transform(
             string_split(concat('type:', event_type, ',n:1'), ','),
             s -> (string_split(s, ':')[1], string_split(s, ':')[2])
           ))['type'][1] AS type_val,
           map_from_entries(list_transform(
             string_split(concat('type:', event_type, ',n:1'), ','),
             s -> (string_split(s, ':')[1], string_split(s, ':')[2])
           ))['n'][1] AS n_val
    FROM (SELECT DISTINCT event_type FROM events) t
    """,
)
def fn_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str_to_map (GenericUDFStringToMap, FunctionRegistry.java:279)."""
    ev = load_table(spark, sf_dir, "events").select("event_type").distinct()
    m = F.str_to_map(
        F.concat(F.lit("type:"), F.col("event_type"), F.lit(",n:1")),
        F.lit(","),
        F.lit(":"),
    )
    return ev.select(
        "event_type",
        m.getItem("type").alias("type_val"),
        m.getItem("n").alias("n_val"),
    )


@query(
    "fn_unix_time_family",
    oracle="""
    SELECT event_id,
           CAST(FLOOR(epoch(ts)) AS BIGINT)                    AS unix_ts,
           CAST(to_timestamp(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS TIMESTAMP)
             AS roundtrip,
           strftime(ts, '%Y-%m-%d %H:%M:%S')                   AS formatted
    FROM events WHERE event_id < 100
    """,
)
def fn_unix_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unix_timestamp / from_unixtime (FunctionRegistry.java:317-318)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    return ev.select(
        "event_id",
        F.unix_timestamp("ts").alias("unix_ts"),
        F.from_unixtime(F.unix_timestamp("ts")).cast("timestamp").alias("roundtrip"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("formatted"),
    )


@query(
    "fn_months_between_trunc",
    oracle="""
    SELECT o_orderkey,
           CAST(datediff('month',
                date_trunc('month', TIMESTAMP '1995-01-01'),
                date_trunc('month', o_orderdate)) AS DOUBLE)  AS whole_months,
           CAST(date_trunc('month', o_orderdate) AS DATE)     AS trunc_mm,
           CAST(date_trunc('year', o_orderdate) AS DATE)      AS trunc_yy
    FROM orders WHERE o_orderkey < 300
    """,
)
def fn_months_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """months_between (whole-month part) + trunc('MM'/'YY')
    (FunctionRegistry.java:308-312). Hive's trunc(date, 'MM') ==
    date_trunc month."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return o.select(
        "o_orderkey",
        F.floor(
            F.months_between(
                F.date_trunc("month", F.col("o_orderdate")),
                F.lit("1995-01-01").cast("timestamp"),
            )
        ).cast("double").alias("whole_months"),
        F.trunc(F.col("o_orderdate").cast("date"), "MM").alias("trunc_mm"),
        F.trunc(F.col("o_orderdate").cast("date"), "YY").alias("trunc_yy"),
    )


@query(
    "fn_null_ops",
    oracle="""
    SELECT x, y,
           COALESCE(x, y, -1)                  AS c,
           CASE WHEN x IS NULL THEN y ELSE x END AS nvl_,
           CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x + y END AS both_sum,
           (x IS NOT DISTINCT FROM y)          AS eq_null_safe,
           CASE WHEN x = 0 THEN NULL ELSE x END AS nullif_zero
    FROM (VALUES (1, 10), (NULL, 20), (3, NULL), (NULL, NULL), (0, 5))
      t(x, y)
    """,
)
def fn_null_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling operators: coalesce, nvl, <=> (eqNullSafe), nullif
    (FunctionRegistry.java:358-377, 462-466)."""
    df = spark.createDataFrame(
        [(1, 10), (None, 20), (3, None), (None, None), (0, 5)], ["x", "y"]
    )
    return df.select(
        "x",
        "y",
        F.coalesce("x", "y", F.lit(-1)).alias("c"),
        F.nvl("x", "y").alias("nvl_"),
        (F.col("x") + F.col("y")).alias("both_sum"),
        F.col("x").eqNullSafe(F.col("y")).alias("eq_null_safe"),
        F.nullif("x", F.lit(0)).alias("nullif_zero"),
    )


@query(
    "fn_bitwise_ops",
    oracle="""
    SELECT n_nationkey,
           n_nationkey & 12                     AS b_and,
           n_nationkey | 5                      AS b_or,
           xor(n_nationkey, 9)                  AS b_xor,
           ~n_nationkey                         AS b_not,
           n_nationkey << 2                     AS shl,
           n_nationkey >> 1                     AS shr
    FROM nation
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operators & | ^ ~ shiftleft shiftright
    (FunctionRegistry.java:341-348)."""
    n = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    return n.select(
        "n_nationkey",
        k.bitwiseAND(F.lit(12)).alias("b_and"),
        k.bitwiseOR(F.lit(5)).alias("b_or"),
        k.bitwiseXOR(F.lit(9)).alias("b_xor"),
        F.bitwise_not(k).alias("b_not"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 1).alias("shr"),
    )
