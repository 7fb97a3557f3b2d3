"""Driver-verifiable entries for the round-7 surface (registered
inside the r7 window per the freeze rule): stats-answered metadata
queries (Hive StatsOptimizer parity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_2_3_2_spark.engine import Engine
from hive_2_3_2_spark.suite import query


@query(
    "stats_answered_aggregates",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(p_size) AS BIGINT) AS n_size,
           CAST(min(p_size) AS INT) AS min_size,
           CAST(max(p_size) AS INT) AS max_size,
           min(p_retailprice) AS min_price,
           max(p_retailprice) AS max_price
    FROM part
    """,
)
def stats_answered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(*)/count(col)/min/max answered purely from gathered stats
    — Hive's StatsOptimizer (reference:
    ql/src/java/.../optimizer/StatsOptimizer.java behind
    hive.compute.query.using.stats, wired at Optimizer.java:227).
    ANALYZE gathers basic stats from parquet FOOTERS and column stats
    in one aggregation pass; the SELECT then runs zero Spark jobs (the
    plan pin in tests/test_plan_regression.py asserts a scan-free
    LocalRelation). The values must equal a real scan's — which is
    exactly what the DuckDB oracle computes."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    eng.sql("SET hive.compute.query.using.stats=true")
    eng.sql("ANALYZE TABLE part COMPUTE STATISTICS")
    eng.sql(
        "ANALYZE TABLE part COMPUTE STATISTICS "
        "FOR COLUMNS p_size, p_retailprice"
    )
    return eng.sql(
        "SELECT count(*) AS n_rows, count(p_size) AS n_size, "
        "min(p_size) AS min_size, max(p_size) AS max_size, "
        "min(p_retailprice) AS min_price, max(p_retailprice) AS max_price "
        "FROM part"
    )
