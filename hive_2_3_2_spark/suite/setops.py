"""Set operations: UNION [ALL|DISTINCT], INTERSECT [ALL], EXCEPT [ALL].

Reference: UNION via UnionOperator (ql/.../exec/UnionOperator.java:39,
genUnionPlan parse/SemanticAnalyzer.java:10019); INTERSECT/EXCEPT via CBO
rewrite to aggregates+joins (optimizer/calcite/rules/
HiveIntersectRewriteRule.java, HiveExceptRewriteRule.java,
CalcitePlanner.java:1781). Spark implements the same rewrites natively
(ReplaceIntersectWithSemiJoin, RewriteExceptAll, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.suite import query


def _halves(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two overlapping customer-key sets: big spenders vs urgent buyers."""
    orders = load_table(spark, sf_dir, "orders")
    big = (
        orders.filter(F.col("o_totalprice") > 350000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return big, urgent


_BIG = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 350000"
_URGENT = (
    "SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'"
)


@query(
    "setop_union_all",
    oracle=f"SELECT custkey FROM (({_BIG}) UNION ALL ({_URGENT})) t",
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — bag union, no shuffle (UnionOperator parity)."""
    big, urgent = _halves(spark, sf_dir)
    return big.unionAll(urgent)


@query(
    "setop_union_distinct",
    oracle=f"SELECT custkey FROM (({_BIG}) UNION ({_URGENT})) t",
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT = union + group-by (SemanticAnalyzer rewires through
    a GroupByOperator; Spark: union().distinct(), one shuffle)."""
    big, urgent = _halves(spark, sf_dir)
    return big.union(urgent).distinct()


@query(
    "setop_intersect_distinct",
    oracle=f"({_BIG}) INTERSECT ({_URGENT})",
)
def intersect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT DISTINCT (HiveIntersectRewriteRule parity)."""
    big, urgent = _halves(spark, sf_dir)
    return big.intersect(urgent)


@query(
    "setop_intersect_all",
    oracle=f"({_BIG}) INTERSECT ALL ({_URGENT})",
)
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset semantics (min of multiplicities)."""
    big, urgent = _halves(spark, sf_dir)
    return big.intersectAll(urgent)


@query(
    "setop_except_distinct",
    oracle=f"({_BIG}) EXCEPT ({_URGENT})",
)
def except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT/MINUS DISTINCT (HiveExceptRewriteRule parity)."""
    big, urgent = _halves(spark, sf_dir)
    return big.subtract(urgent)


@query(
    "setop_except_all",
    oracle=f"({_BIG}) EXCEPT ALL ({_URGENT})",
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (Hive implements via
    replicate_rows UDTF, FunctionRegistry.java:499; Spark RewriteExceptAll
    uses the same sum-of-multiplicities trick)."""
    big, urgent = _halves(spark, sf_dir)
    return big.exceptAll(urgent)
