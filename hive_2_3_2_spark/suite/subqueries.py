"""Subquery surface: IN / NOT IN / EXISTS / NOT EXISTS / scalar subqueries.

Reference: subquery filters rewritten into joins at analysis time
(parse/SemanticAnalyzer.java:3354,3372) or via CBO
HiveSubQueryRemoveRule + decorrelation (parse/CalcitePlanner.java:1503,
HiveSemiJoinRule :1670). Spark's Catalyst performs the identical
rewrites (RewritePredicateSubquery → semi/anti join, scalar subquery
decorrelation), so these run through ``spark.sql`` on registered views —
the same SQL surface a Hive user would bring over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_2_3_2_spark.catalog import register_star_schema
from hive_2_3_2_spark.suite import query


def _sql(spark: SparkSession, sf_dir: str, q: str) -> DataFrame:
    register_star_schema(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    return spark.sql(q)


_IN_SQL = """
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
"""


@query("subq_in_uncorrelated", oracle=_IN_SQL)
def subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left-semi join (SemanticAnalyzer.java:3354)."""
    return _sql(spark, sf_dir, _IN_SQL)


_NOT_IN_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_totalprice > 400000
)
"""


@query("subq_not_in_uncorrelated", oracle=_NOT_IN_SQL)
def subq_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN → null-aware anti join (o_custkey is non-null here, so both
    engines agree; the null-propagating case is pinned in unit tests)."""
    return _sql(spark, sf_dir, _NOT_IN_SQL)


_EXISTS_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""


@query("subq_exists_correlated", oracle=_EXISTS_SQL)
def subq_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → semi join after decorrelation."""
    return _sql(spark, sf_dir, _EXISTS_SQL)


_NOT_EXISTS_SQL = """
SELECT n_nationkey, n_name
FROM nation n
WHERE NOT EXISTS (
  SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey
)
"""


@query("subq_not_exists_correlated", oracle=_NOT_EXISTS_SQL)
def subq_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS → anti join (CalcitePlanner.java:1503)."""
    return _sql(spark, sf_dir, _NOT_EXISTS_SQL)


_SCALAR_SQL = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
FROM orders
WHERE o_totalprice > 1.9 * (SELECT AVG(o_totalprice) FROM orders)
"""


@query("subq_scalar_uncorrelated", oracle=_SCALAR_SQL)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in WHERE (one-row guard =
    sq_count_check, FunctionRegistry.java:253)."""
    return _sql(spark, sf_dir, _SCALAR_SQL)


_CORR_SCALAR_SQL = """
SELECT l_orderkey, l_linenumber
FROM lineitem l1
WHERE l_extendedprice > 1.5 * (
  SELECT AVG(l_extendedprice) FROM lineitem l2
  WHERE l2.l_orderkey = l1.l_orderkey
)
"""


@query("subq_scalar_correlated", oracle=_CORR_SCALAR_SQL)
def subq_scalar_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery → decorrelated to an aggregate + join
    (Calcite decorrelator parity; Catalyst pulls the agg above a join)."""
    return _sql(spark, sf_dir, _CORR_SCALAR_SQL)


_CTE_SQL = """
WITH national_spend AS (
  SELECT c_nationkey, SUM(o_totalprice) AS spend
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY c_nationkey
)
SELECT n_name, ROUND(spend, 2) AS spend
FROM national_spend JOIN nation ON c_nationkey = n_nationkey
WHERE spend > (SELECT AVG(spend) FROM national_spend)
"""


@query("subq_cte_reuse", oracle=_CTE_SQL)
def subq_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE referenced twice — exercises plan reuse (Hive shares the scan
    via CorrelationOptimizer/YSmart, optimizer/correlation/
    CorrelationOptimizer.java:85; Spark reuses the exchange or inlines)."""
    return _sql(spark, sf_dir, _CTE_SQL)
