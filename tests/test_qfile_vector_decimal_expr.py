"""vector_decimal_expressions.q + vector_decimal_aggregate.q replay
(reference: ql/src/test/queries/clientpositive/) — the decimal
arithmetic battery (+ - * / % with mixed literals, the full cast fan
including TIMESTAMP-as-seconds) and grouped decimal aggregates with
HAVING.

Computed decimals are CAST to DOUBLE on both sides before comparison:
Spark and DuckDB assign different result precision/scale to decimal
division (value-identical, format-different), and the comparator's
9-significant-digit float norm is the robust equality.

Note the interplay with the engine's int→timestamp MILLIS default:
DECIMAL is not an integral type, so CAST(cdecimal AS TIMESTAMP) counts
SECONDS (TimestampWritable.decimalToTimestamp) — the typeof dispatch
must route decimals to the ELSE branch."""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

ROWS = [
    (i,
     round(237.101 * ((i % 7) + 1) + i, 3),
     round(1000 + 17.29 * (i % 11) + 0.001 * i, 3))
    for i in range(60)
] + [(99, None, None), (100, 0.0, 0.0)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfile_vdec")
    eng = Engine(spark=spark)
    p = str(root / "decimal_test")
    (spark.createDataFrame(ROWS, "cint int, d1 double, d2 double")
        .selectExpr(
            "cint",
            "cast(d1 as decimal(20,10)) as cdecimal1",
            "cast(d2 as decimal(23,14)) as cdecimal2",
            "d1 as cdouble",
        )
        .coalesce(1).write.parquet(p))
    eng.register_table("decimal_test", p)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW decimal_test AS SELECT cint, "
        "CAST(d1 AS DECIMAL(20,10)) AS cdecimal1, "
        "CAST(d2 AS DECIMAL(23,14)) AS cdecimal2, d1 AS cdouble "
        "FROM (VALUES "
        + ", ".join(
            f"({c}, {d1 if d1 is not None else 'NULL'}, "
            f"{d2 if d2 is not None else 'NULL'})"
            for c, d1, d2 in ROWS
        )
        + ") AS t(cint, d1, d2)"
    )
    yield eng, con
    con.close()


def test_q_vde_arithmetic_and_cast_battery(qenv):
    """vector_decimal_expressions.q: the full projection battery under
    a compound decimal WHERE."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            """
            SELECT cast(cdecimal1 + cdecimal2 as double) as c1,
            cast(cdecimal1 - (2*cdecimal2) as double) as c2,
            cast(((cdecimal1+2.34)/cdecimal2) as double) as c3,
            cast((cdecimal1 * (cdecimal2/3.4)) as double) as c4,
            cast(cdecimal1 % 10 as double) as c5,
            CAST(cdecimal1 AS INT) as c6,
            CAST(cdecimal2 AS SMALLINT) as c7,
            CAST(cdecimal2 AS TINYINT) as c8,
            CAST(cdecimal1 AS BIGINT) as c9,
            CAST(cdecimal1 AS BOOLEAN) as c10,
            CAST(cdecimal2 AS DOUBLE) as c11,
            round(cast(CAST(cdecimal1 AS FLOAT) as double), 3) as c12,
            CAST(cdecimal1 AS TIMESTAMP) as c14
            FROM decimal_test
            WHERE cdecimal1 > 0 AND cdecimal1 < 12345.5678
              AND cdecimal2 != 0 AND cdecimal2 > 1000
              AND cdouble IS NOT NULL
            """
        ),
        con,
        """
        SELECT CAST(cdecimal1 + cdecimal2 AS DOUBLE) AS c1,
        CAST(cdecimal1 - (2*cdecimal2) AS DOUBLE) AS c2,
        CAST(((cdecimal1+2.34)/cdecimal2) AS DOUBLE) AS c3,
        CAST((cdecimal1 * (cdecimal2/3.4)) AS DOUBLE) AS c4,
        CAST(cdecimal1 % 10 AS DOUBLE) AS c5,
        CAST(trunc(cdecimal1) AS INT) AS c6,
        CAST((CAST(trunc(cdecimal2) AS BIGINT) + 32768) % 65536 - 32768
             AS SMALLINT) AS c7,
        CAST((CAST(trunc(cdecimal2) AS BIGINT) + 128) % 256 - 128
             AS TINYINT) AS c8,
        CAST(trunc(cdecimal1) AS BIGINT) AS c9,
        (cdecimal1 <> 0) AS c10,
        CAST(cdecimal2 AS DOUBLE) AS c11,
        round(CAST(CAST(cdecimal1 AS FLOAT) AS DOUBLE), 3) AS c12,
        make_timestamp(CAST(cdecimal1 * 1000000 AS BIGINT)) AS c14
        FROM decimal_test
        WHERE cdecimal1 > 0 AND cdecimal1 < 12345.5678
          AND cdecimal2 <> 0 AND cdecimal2 > 1000
          AND cdouble IS NOT NULL
        """,
    )


def test_q_vda_grouped_decimal_aggregates_having(qenv):
    """vector_decimal_aggregate.q: count/max/min/sum + avg/stddev over
    decimal columns grouped by cint with HAVING count(*)>1."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            """
            SELECT cint,
            COUNT(cdecimal1) as n1, cast(MAX(cdecimal1) as double) as mx1,
            cast(MIN(cdecimal1) as double) as mn1,
            cast(SUM(cdecimal1) as double) as s1,
            cast(AVG(cdecimal1) as double) as a1,
            STDDEV_POP(cdecimal1) as sp1, STDDEV_SAMP(cdecimal1) as ss1
            FROM decimal_test
            GROUP BY cint
            HAVING COUNT(*) > 1
            """
        ),
        con,
        """
        SELECT cint,
        CAST(COUNT(cdecimal1) AS BIGINT) AS n1,
        CAST(MAX(cdecimal1) AS DOUBLE) AS mx1,
        CAST(MIN(cdecimal1) AS DOUBLE) AS mn1,
        CAST(SUM(cdecimal1) AS DOUBLE) AS s1,
        CAST(AVG(cdecimal1) AS DOUBLE) AS a1,
        stddev_pop(CAST(cdecimal1 AS DOUBLE)) AS sp1,
        stddev_samp(CAST(cdecimal1 AS DOUBLE)) AS ss1
        FROM decimal_test
        GROUP BY cint
        HAVING COUNT(*) > 1
        """,
    )
