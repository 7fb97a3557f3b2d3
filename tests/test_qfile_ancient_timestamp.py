"""vectorized_timestamp.q's ancient-date goldens (reference:
ql/src/test/queries/clientpositive/vectorized_timestamp.q —
0001-01-01 / 9999-12-31 boundary values over an ORC table; Hive
returns the 0001 row from every filter shape).

REAL divergence found by the r10 sweep: Spark builds the ORC
SearchArgument for a TIMESTAMP filter from proleptic micros without
the hybrid-calendar rebase ORC files store, so stripe elimination
silently DROPS pre-Gregorian rows (count = 0 with
spark.sql.orc.filterPushdown=true, 1 with it off). The engine wraps
the column side of pre-1583 timestamp comparisons in ``+ INTERVAL 0
SECOND`` — a value identity that keeps the predicate row-side.
Modern-literal filters keep their pushdown (pinned)."""

from __future__ import annotations

import pytest

from hive_2_3_2_spark.engine import Engine


@pytest.fixture(scope="module")
def tseng(spark):
    eng = Engine(spark=spark)
    spark.sql("DROP TABLE IF EXISTS anc_ts")
    eng.sql("CREATE TABLE anc_ts(ts TIMESTAMP) STORED AS ORC")
    eng.sql(
        "INSERT INTO TABLE anc_ts VALUES "
        "('0001-01-01 00:00:00.000000000'), "
        "('1500-06-15 12:00:00'), "
        "('2012-03-04 05:06:07'), "
        "('9999-12-31 23:59:59.999999999')"
    )
    yield eng
    spark.sql("DROP TABLE IF EXISTS anc_ts")


def test_q_ancient_equality_and_in_return_rows(tseng):
    assert tseng.sql(
        "select count(*) c from anc_ts "
        "where ts = timestamp '0001-01-01 00:00:00'"
    ).collect()[0].c == 1
    assert tseng.sql(
        "SELECT count(*) c FROM anc_ts WHERE ts IN "
        "(timestamp '0001-01-01 00:00:00.000000000', "
        "timestamp '0002-02-02 00:00:00.000000000')"
    ).collect()[0].c == 1
    # pre-cutover but not year-boundary
    assert tseng.sql(
        "select count(*) c from anc_ts "
        "where ts = timestamp '1500-06-15 12:00:00'"
    ).collect()[0].c == 1
    # range shapes and the mirrored literal-first form
    assert tseng.sql(
        "select count(*) c from anc_ts "
        "where ts < timestamp '1582-01-01 00:00:00'"
    ).collect()[0].c == 2
    assert tseng.sql(
        "select count(*) c from anc_ts "
        "where timestamp '0001-01-01 00:00:00' = ts"
    ).collect()[0].c == 1


def test_q_min_max_boundaries(tseng):
    r = tseng.sql(
        "select cast(min(ts) as string) mn, cast(max(ts) as string) mx "
        "from anc_ts"
    ).collect()[0]
    assert r.mn == "0001-01-01 00:00:00"
    assert r.mx == "9999-12-31 23:59:59.999999"


def test_q_modern_filters_keep_orc_pushdown(tseng):
    """The wrap applies ONLY to pre-1583 literals: a modern timestamp
    filter still reaches the ORC reader as a PushedFilter."""
    plan = (
        tseng.sql(
            "select ts from anc_ts "
            "where ts = timestamp '2012-03-04 05:06:07'"
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan
    assert "ts" in plan.split("PushedFilters:")[1][:80]
    assert tseng.sql(
        "select count(*) c from anc_ts "
        "where ts = timestamp '2012-03-04 05:06:07'"
    ).collect()[0].c == 1
