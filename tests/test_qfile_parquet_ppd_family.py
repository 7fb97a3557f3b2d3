"""clientpositive parquet_ppd_*.q replay, round 9 (reference:
ql/src/test/queries/clientpositive/parquet_ppd_char.q, _varchar.q,
_decimal.q, _date.q, _timestamp.q, _boolean.q — the typed-predicate
pushdown matrix over parquet).

The goldens run every predicate twice (hive.optimize.index.filter
off/on) and require IDENTICAL rows — pushdown must never change
results. Here each typed predicate is value-checked against DuckDB
AND pinned to reach the parquet scan as a PushedFilter (at 100 TB a
predicate that doesn't reach the row-group filter is a full-column
read). CHAR(10) equality ignores trailing pad spaces
(HiveCharWritable trims before compare) — verified via the engine's
char read semantics."""

from __future__ import annotations

import os

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine
from tests.conftest import assert_matches_oracle

ROWS = [("apple", "bee", "0.220", "1970-02-20", "2011-01-01 01:01:01",
         True)] * 5 + \
       [("hello", "world", "11.220", "1970-02-27", "2011-01-20 01:01:01",
         False)] * 5


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    eng = Engine(spark=spark)
    spark.sql("DROP TABLE IF EXISTS newtypestbl")
    eng.sql(
        "create table newtypestbl(c char(10), v varchar(10), "
        "d decimal(5,3), da date, ts timestamp, b boolean) "
        "stored as parquet"
    )
    values = ", ".join(
        f"(cast('{c}' as char(10)), cast('{v}' as varchar(10)), "
        f"cast('{d}' as decimal(5,3)), cast('{da}' as date), "
        f"cast('{ts}' as timestamp), {str(b).lower()})"
        for c, v, d, da, ts, b in ROWS
    )
    eng.sql(f"insert into newtypestbl values {values}")
    con = duckdb.connect()
    body = ", ".join(
        f"('{c}', '{v}', {d}, DATE '{da}', TIMESTAMP '{ts}', {b})"
        for c, v, d, da, ts, b in ROWS
    )
    con.execute(
        "CREATE VIEW newtypestbl AS SELECT * FROM (VALUES "
        + body + ") AS t(c, v, d, da, ts, b)"
    )
    yield eng, con
    con.close()
    spark.sql("DROP TABLE IF EXISTS newtypestbl")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


CASES = [
    # (hive predicate, duck predicate, pushdown column expected)
    ("c = 'apple'", "c = 'apple'", "c"),
    ("c != 'apple'", "c <> 'apple'", "c"),
    ("c < 'hello'", "c < 'hello'", "c"),
    ("c <= 'hello'", "c <= 'hello'", "c"),
    # CHAR IN-lists wrap the column in read-side padding, which blocks
    # the scan filter (Spark CharVarcharCodegenUtils) — value parity
    # only; the varchar IN below pins the pushdown
    ("c in ('apple', 'carrot')", "c IN ('apple', 'carrot')", None),
    ("c between 'apple' and 'carrot'",
     "c BETWEEN 'apple' AND 'carrot'", "c"),
    ("v = 'bee'", "v = 'bee'", "v"),
    ("v in ('bee', 'orange')", "v IN ('bee', 'orange')", "v"),
    ("d = 0.22", "d = 0.22", "d"),
    ("d != 0.22", "d <> 0.22", "d"),
    ("d < 11.22", "d < 11.22", "d"),
    ("d between 0 and 1", "d BETWEEN 0 AND 1", "d"),
    ("da = '1970-02-20'", "da = DATE '1970-02-20'", "da"),
    ("da < '1970-02-27'", "da < DATE '1970-02-27'", "da"),
    ("da between '1970-02-19' and '1970-02-22'",
     "da BETWEEN DATE '1970-02-19' AND DATE '1970-02-22'", "da"),
    ("ts = '2011-01-01 01:01:01'",
     "ts = TIMESTAMP '2011-01-01 01:01:01'", "ts"),
    ("ts < '2011-01-20 01:01:01'",
     "ts < TIMESTAMP '2011-01-20 01:01:01'", "ts"),
    ("b = true", "b = true", "b"),
    ("not b", "NOT b", "b"),
]


@pytest.mark.parametrize("hive_pred,duck_pred,col", CASES)
def test_q_ppd_predicate(env, hive_pred, duck_pred, col):
    eng, con = env
    df = eng.sql(f"select c, v, d, da from newtypestbl where {hive_pred}")
    assert_matches_oracle(
        df, con,
        f"SELECT rpad(c, 10, ' ') AS c, v, d, da FROM newtypestbl "
        f"WHERE {duck_pred}",
    )
    if col is not None:
        plan = _plan(df)
        assert "PushedFilters: [" in plan and col in plan.split(
            "PushedFilters: ["
        )[1].split("]")[0], plan


def test_q_ppd_char_trailing_pad_equality(env):
    """parquet_ppd_char.q: `c = "apple "` — CHAR comparison trims the
    pad, so the literal with a trailing space matches the same rows as
    'apple' (HiveBaseChar.getPaddedValue semantics)."""
    eng, con = env
    df = eng.sql("select c from newtypestbl where c='apple '")
    assert_matches_oracle(
        df, con,
        "SELECT rpad(c, 10, ' ') AS c FROM newtypestbl "
        "WHERE c = 'apple'",
    )


def test_q_ppd_decimal_string_and_float_literals(env):
    """parquet_ppd_decimal.q: the decimal column compares equal against
    a STRING literal and a FLOAT cast of the same value (Hive coerces
    through the common decimal/double type)."""
    eng, con = env
    for pred in ("d='0.22'", "d=cast('0.22' as float)"):
        df = eng.sql(f"select d from newtypestbl where {pred}")
        assert_matches_oracle(
            df, con, "SELECT d FROM newtypestbl WHERE d = 0.22"
        )


def test_q_ppd_multifiles_union_read(spark):
    """parquet_ppd_multifiles.q: the predicate prunes across a
    multi-file table exactly as a single file (two insert batches,
    then filter)."""
    eng = Engine(spark=spark)
    spark.sql("DROP TABLE IF EXISTS ppd_multi")
    try:
        eng.sql("create table ppd_multi(c char(10), d decimal(5,3)) "
                "stored as parquet")
        eng.sql("insert into ppd_multi values "
                "(cast('apple' as char(10)), "
                "cast('0.220' as decimal(5,3)))")
        eng.sql("insert into ppd_multi values "
                "(cast('apple' as char(10)), "
                "cast('0.220' as decimal(5,3))), "
                "(cast('hello' as char(10)), "
                "cast('11.220' as decimal(5,3)))")
        df = eng.sql("select count(*) as n from ppd_multi "
                     "where c='apple'")
        assert df.collect()[0].n == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS ppd_multi")
