"""UDTFs + LATERAL VIEW: explode, posexplode, stack, inline, json_tuple.

Reference: UDTFOperator (ql/.../exec/UDTFOperator.java:43) +
LateralViewForward/LateralViewJoin (ql/.../exec/LateralViewJoinOperator.java:76);
generator registrations exec/FunctionRegistry.java:493-500 (explode,
posexplode, inline, stack, json_tuple, parse_url_tuple). Spark: native
generator expressions — explode/posexplode/inline/stack — evaluated inside
whole-stage codegen (no Python boundary).

Scale: generators are map-side (no shuffle); the downstream groupBys are
the only exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.suite import query


@query(
    "lateral_explode_tokens",
    oracle="""
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents) t
    WHERE tok <> ''
    GROUP BY tok
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode(split(...)) — token frequency over documents."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "lateral_posexplode_first_tokens",
    oracle="""
    SELECT doc_id, pos, tok FROM (
      SELECT doc_id,
             CAST(UNNEST(range(len(string_split(text, ' ')))) AS BIGINT) AS pos,
             UNNEST(string_split(text, ' ')) AS tok
      FROM documents
    ) t WHERE pos < 3
    """,
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (FunctionRegistry.java:494) — position-aware explode;
    keeps the first 3 tokens of each document."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
        )
        .filter(F.col("pos") < 3)
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")
    )


@query(
    "lateral_stack_unpivot",
    oracle="""
    SELECT c_custkey, metric, ROUND(val, 2) AS val
    FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    ) t
    """,
)
def stack_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stack(n, ...) — row-generating unpivot (FunctionRegistry.java:497)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, "
            "'nationkey', CAST(c_nationkey AS DOUBLE))"
        ).alias("metric", "v"),
    ).select("c_custkey", "metric", F.round("v", 2).alias("val"))


@query(
    "lateral_inline_structs",
    oracle="""
    SELECT r_regionkey, kind, tag
    FROM (
      SELECT r_regionkey, 'primary' AS kind, r_name AS tag FROM region
      UNION ALL
      SELECT r_regionkey, 'lower', lower(r_name) FROM region
    ) t
    """,
)
def inline_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inline(array<struct>) — explode an array of structs into columns
    (FunctionRegistry.java:496)."""
    region = load_table(spark, sf_dir, "region")
    return region.select(
        "r_regionkey",
        F.inline(
            F.array(
                F.struct(F.lit("primary").alias("kind"), F.col("r_name").alias("tag")),
                F.struct(F.lit("lower").alias("kind"), F.lower("r_name").alias("tag")),
            )
        ),
    )


@query(
    "lateral_json_tuple_props",
    oracle="""
    SELECT event_type,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
)
def json_tuple_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_tuple / get_json_object (FunctionRegistry.java:322,498) over the
    events payload column."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type", F.json_tuple(F.col("props"), "k").alias("k")
        )
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(F.avg(F.col("k").cast("double")), 4).alias("avg_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "lateral_explode_outer_empty",
    oracle="""
    SELECT doc_id, tok
    FROM (
      SELECT doc_id,
             UNNEST(CASE WHEN n_chars < 100 THEN string_split(text, ' ')
                         ELSE [NULL] END) AS tok
      FROM documents
    ) t
    """,
)
def explode_outer_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer — LATERAL VIEW OUTER semantics (row preserved with
    NULL when the generator yields nothing; LateralViewJoinOperator's
    outer flag)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode_outer(
            F.when(F.col("n_chars") < 100, F.split("text", " ")).otherwise(
                F.lit(None).cast("array<string>")
            )
        ).alias("tok"),
    )
