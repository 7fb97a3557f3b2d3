"""Type-system edge-case differential tests (FIXTURES.md §5 alltypes):
extreme ints, ±inf/NaN doubles, nulls in every column, epoch-boundary
timestamps — Spark expressions vs DuckDB on the identical parquet file.
Mirrors the reference's alltypesorc coverage (q_test_init.sql:141-157)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from tests.conftest import assert_matches_oracle

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("ctinyint", ByteType()),
        StructField("csmallint", ShortType()),
        StructField("cint", IntegerType()),
        StructField("cbigint", LongType()),
        StructField("cfloat", FloatType()),
        StructField("cdouble", DoubleType()),
        StructField("cstring", StringType()),
        StructField("cbool", BooleanType()),
        StructField("cts", TimestampType()),
    ]
)

ROWS = [
    (0, 127, 32767, 2147483647, 9223372036854775807, 3.5, 1e300, "max", True,
     datetime.datetime(2038, 1, 19, 3, 14, 7)),
    (1, -128, -32768, -2147483648, -9223372036854775808, -3.5, -1e300, "min",
     False, datetime.datetime(1970, 1, 1, 0, 0, 0)),
    (2, 0, 0, 0, 0, float("inf"), float("-inf"), "", True,
     datetime.datetime(2000, 2, 29, 23, 59, 59)),
    (3, None, None, None, None, None, None, None, None, None),
    (4, 1, 2, 3, 4, float("nan"), float("nan"), "NaN", False,
     datetime.datetime(1969, 12, 31, 23, 59, 59)),
    (5, 7, -7, 42, -42, 0.0, -0.0, "  spaces  ", True,
     datetime.datetime(2024, 6, 15, 12, 30, 45)),
]


@pytest.fixture(scope="module")
def alltypes(spark, oracle, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("alltypes") / "t.parquet")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.parquet(path)
    oracle.execute(
        f"CREATE OR REPLACE VIEW alltypes AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    df = spark.read.parquet(path)
    df.createOrReplaceTempView("alltypes")
    return df


def test_arithmetic_edges(spark, oracle, alltypes):
    df = alltypes.select(
        "id",
        # bigint-widened increment: DuckDB is ANSI (int32 overflow errors)
        # while our engine wraps (Hive semantics — pinned separately in
        # test_overflow_wraps_not_errors); the differential row compares
        # the widened result both engines agree on.
        (F.col("cint").cast("long") + F.lit(1)).alias("int_inc"),
        (F.col("cbigint") % 7).alias("mod7"),
        (F.col("cdouble") * 2).alias("dbl2"),
        F.abs(F.col("csmallint").cast("int")).alias("abs_s"),
        F.isnan("cfloat").alias("is_nan"),  # Spark: isnan(NULL)=false, not NULL
        (F.col("cfloat") == float("inf")).alias("is_inf"),
    )
    assert_matches_oracle(
        df,
        oracle,
        """
        SELECT id, CAST(cint AS BIGINT) + 1 AS int_inc, cbigint % 7 AS mod7,
               cdouble * 2 AS dbl2, abs(CAST(csmallint AS INT)) AS abs_s,
               COALESCE(isnan(cfloat), FALSE) AS is_nan,
               cfloat = CAST('inf' AS FLOAT) AS is_inf
        FROM alltypes
        """,
    )


def test_string_edges(spark, oracle, alltypes):
    df = alltypes.select(
        "id",
        F.length("cstring").alias("len"),
        F.trim("cstring").alias("trimmed"),
        F.upper("cstring").alias("up"),
        F.coalesce("cstring", F.lit("<null>")).alias("c"),
        (F.col("cstring") == "").alias("is_empty"),
    )
    assert_matches_oracle(
        df,
        oracle,
        """
        SELECT id, length(cstring) AS len, trim(cstring) AS trimmed,
               upper(cstring) AS up, COALESCE(cstring, '<null>') AS c,
               cstring = '' AS is_empty
        FROM alltypes
        """,
    )


def test_timestamp_edges(spark, oracle, alltypes):
    df = alltypes.select(
        "id",
        F.year("cts").alias("yr"),
        F.date_trunc("day", F.col("cts")).alias("day_start"),
        F.unix_timestamp("cts").alias("epoch_s"),
    )
    assert_matches_oracle(
        df,
        oracle,
        """
        SELECT id, YEAR(cts) AS yr, CAST(date_trunc('day', cts) AS TIMESTAMP) AS day_start,
               CAST(FLOOR(epoch(cts)) AS BIGINT) AS epoch_s
        FROM alltypes
        """,
    )


def test_null_propagation_in_aggregates(spark, oracle, alltypes):
    df = alltypes.agg(
        F.count("cint").alias("cnt_nonnull"),
        F.count(F.lit(1)).alias("cnt_all"),
        F.sum("ctinyint").cast("long").alias("sum_tiny"),
        F.max("cstring").alias("max_str"),
        F.min("cts").alias("min_ts"),
    )
    assert_matches_oracle(
        df,
        oracle,
        """
        SELECT CAST(COUNT(cint) AS BIGINT) AS cnt_nonnull,
               CAST(COUNT(*) AS BIGINT) AS cnt_all,
               CAST(SUM(ctinyint) AS BIGINT) AS sum_tiny,
               MAX(cstring) AS max_str, MIN(cts) AS min_ts
        FROM alltypes
        """,
    )


def test_overflow_wraps_not_errors(spark, alltypes):
    """Hive/non-ANSI semantics: bigint overflow wraps silently (ANSI Spark
    would raise) — pins the session's ansi=false contract."""
    row = alltypes.filter(F.col("id") == 0).select(
        (F.col("cbigint") + 1).alias("wrapped")
    ).collect()[0]
    assert row.wrapped == -9223372036854775808


def test_nan_ordering_spark_semantics(spark, alltypes):
    """Spark sorts NaN greater than any double (Hive: same)."""
    ordered = [
        r.id
        for r in alltypes.filter(F.col("cfloat").isNotNull())
        .orderBy(F.col("cfloat"))
        .collect()
    ]
    assert ordered[-1] == 4  # NaN row last
