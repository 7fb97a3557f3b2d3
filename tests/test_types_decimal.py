"""Decimal / char / varchar type coverage (SURVEY §1.2:
serdeConstants.java:95-105, TypeInfoFactory.java:45-68 — default decimal
decimal(38,18), char/varchar with max lengths)."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle


def test_decimal_38_18_arithmetic(spark, oracle):
    """decimal(38,18) — the reference's default decimal — exact arithmetic
    vs DuckDB (which also supports width-38 decimals)."""
    # Scales chosen so no step trims precision (Spark's width-38 +/- trims
    # the last fractional digit; and downcasts differ: Spark/Hive round
    # HALF_UP — pinned in test_decimal_literal_type — while DuckDB
    # truncates). At (20,6) both engines carry exact digits end-to-end.
    df = spark.sql(
        """
        SELECT CAST('12345678901234.123456' AS DECIMAL(20,6)) AS a,
               CAST('0.000001' AS DECIMAL(20,6)) AS b
        """
    ).select(
        (F.col("a") + F.col("b")).alias("add_"),
        (F.col("a") - F.col("b")).alias("sub_"),
        (F.col("a") * 2).alias("dbl"),
        (F.col("a") % 7).alias("md"),
    )
    assert_matches_oracle(
        df,
        oracle,
        """
        SELECT a + b AS add_, a - b AS sub_, a * 2 AS dbl, a % 7 AS md
        FROM (SELECT CAST('12345678901234.123456' AS DECIMAL(20,6)) AS a,
                     CAST('0.000001' AS DECIMAL(20,6)) AS b)
        """,
    )


def test_decimal_aggregation_exact(spark, oracle, sf_dir):
    """Money aggregation in decimal is EXACT (no double rounding) — the
    reason Hive defaults money columns to decimal. Cast the double price
    column and compare exact sums."""
    from hive_2_3_2_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    df = (
        li.select(
            "l_returnflag",
            F.col("l_extendedprice").cast("decimal(18,2)").alias("p"),
        )
        .groupBy("l_returnflag")
        .agg(F.sum("p").alias("total"))
    )
    assert_matches_oracle(
        df,
        oracle,
        """
        SELECT l_returnflag, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS total
        FROM lineitem GROUP BY l_returnflag
        """,
    )


def test_decimal_overflow_null_not_error(spark):
    """Hive (non-ANSI): decimal overflow yields NULL, not an error."""
    row = spark.sql(
        "SELECT CAST('99' AS DECIMAL(38,0)) * CAST('1' || repeat('0', 37) AS DECIMAL(38,0)) AS v"
    ).collect()[0]
    assert row.v is None


def test_char_varchar_ddl_semantics(spark, tmp_path):
    """CHAR(n) pads/truncates on write; VARCHAR(n) truncates only —
    serdeConstants char/varchar parity via Spark DDL types."""
    spark.sql("DROP TABLE IF EXISTS cv_t")
    spark.sql("CREATE TABLE cv_t (c CHAR(5), v VARCHAR(5)) USING parquet")
    spark.sql("INSERT INTO cv_t VALUES ('ab', 'ab'), ('abcde', 'abcde')")
    rows = {r.c: r.v for r in spark.table("cv_t").collect()}
    # CHAR(5) reads back space-padded to length 5
    assert "ab   " in rows
    assert rows["ab   "] == "ab"
    assert rows["abcde"] == "abcde"
    # over-length insert into VARCHAR(5) errors (strict length check)
    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.sql("INSERT INTO cv_t VALUES ('x', 'toolongvalue')")
    spark.sql("DROP TABLE cv_t")


def test_decimal_literal_type(spark):
    """Non-ANSI Spark parses exact literals as decimal — Hive parity."""
    dt = spark.sql("SELECT 12.34 AS v").schema["v"].dataType.simpleString()
    assert dt == "decimal(4,2)"
    row = spark.sql("SELECT CAST(12.345 AS DECIMAL(10,2)) AS v").collect()[0]
    assert row.v == Decimal("12.35")  # HALF_UP rounding on cast
