"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke check at sf0.001.
queries()    — every implemented operator from SURVEY.md §2, one callable
               per named query (see hive_2_3_2_spark/suite/).
oracle_sql() — DuckDB-runnable ANSI SQL oracle per query (where
               SQL-expressible; rows-only otherwise).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hive_2_3_2_spark.suite import load_all

_REGISTRY = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return _REGISTRY["tpch_q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _REGISTRY.items()
        if spec.oracle is not None
    }
