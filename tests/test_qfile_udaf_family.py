"""clientpositive `.q` slice, round 8: udaf_all_keyword.q,
udaf_number_format.q, udaf_percentile.q (reference:
ql/src/test/queries/clientpositive/). The ALL keyword is a no-op
qualifier (count(ALL x) == count(x)); aggregates over a NON-NUMERIC
string coerce to NULL and answer NULL, not an error (Hive's
UDAFs skip nulls after the failed coercion)."""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(str(i % 83), f"val_{i % 83}") for i in range(500)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfile_udaf")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    p = str(root / "ua_src")
    spark.createDataFrame(SRC, "key string, value string") \
        .coalesce(1).write.parquet(p)
    eng.register_table("ua_src", p)
    con.execute(
        f"CREATE VIEW ua_src AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield eng, con
    con.close()


def test_q_udaf_all_keyword(qenv):
    """udaf_all_keyword.q: ALL-qualified aggregates equal the bare
    forms for count/avg/min/max/sum."""
    eng, con = qenv
    df = eng.sql(
        "SELECT count(ALL 1) AS c1, count(ALL key) AS ck, "
        "count(ALL key) = count(key) AS ceq, "
        "round(AVG(ALL key), 6) AS ak, AVG(ALL key) = AVG(key) AS aeq, "
        "MIN(ALL key) AS mnk, MIN(ALL key) = MIN(key) AS mneq, "
        "MAX(ALL key) AS mxk, MAX(ALL key) = MAX(key) AS mxeq, "
        "round(SUM(ALL key), 4) AS sk, SUM(ALL key) = SUM(key) AS seq "
        "FROM ua_src"
    )
    assert_matches_oracle(
        df, con,
        "SELECT CAST(count(ALL 1) AS BIGINT) AS c1, "
        "CAST(count(ALL key) AS BIGINT) AS ck, "
        "count(ALL key) = count(key) AS ceq, "
        "round(AVG(ALL CAST(key AS DOUBLE)), 6) AS ak, "
        "AVG(ALL CAST(key AS DOUBLE)) = AVG(CAST(key AS DOUBLE)) AS "
        "aeq, MIN(ALL key) AS mnk, MIN(ALL key) = MIN(key) AS mneq, "
        "MAX(ALL key) AS mxk, MAX(ALL key) = MAX(key) AS mxeq, "
        "round(SUM(ALL CAST(key AS DOUBLE)), 4) AS sk, "
        "SUM(ALL CAST(key AS DOUBLE)) = SUM(CAST(key AS DOUBLE)) AS "
        "seq FROM ua_src",
    )


def test_q_udaf_number_format_non_numeric(qenv):
    """udaf_number_format.q: sum/avg/variance/std over a NON-NUMERIC
    string literal — every row coerces to NULL, every aggregate
    answers NULL (never an error, never 0 for sum)."""
    eng, con = qenv
    row = eng.sql(
        "SELECT sum('a') AS s, avg('a') AS a, variance('a') AS v, "
        "std('a') AS sd FROM ua_src"
    ).collect()[0]
    assert (row.s, row.a, row.v, row.sd) == (None, None, None, None)


def test_q_udaf_percentile(qenv):
    """udaf_percentile.q: exact percentile over bigint keys."""
    eng, con = qenv
    df = eng.sql(
        "SELECT percentile(cast(key as bigint), 0.3) AS p FROM ua_src"
    )
    assert_matches_oracle(
        df, con,
        # DuckDB's quantile_cont matches Hive's exact percentile
        # interpolation over the sorted multiset
        "SELECT quantile_cont(CAST(key AS BIGINT), 0.3) AS p FROM ua_src",
    )
