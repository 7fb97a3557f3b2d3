"""clientpositive `.q` slice, round 6i: interval_arithmetic.q /
interval_comparison.q (reference: ql/src/test/queries/clientpositive/
interval_arithmetic.q; HIVE-9792 interval types). Hive's INTERVAL
literal surface maps 1:1 onto Spark's ANSI interval literals, so this
is a parity pin, not a rewrite:

- YEAR TO MONTH literals ('2-2', negative '-2-2', unary minus) added
  to and subtracted from dates, in both operand orders;
- DAY TO SECOND literals with fractional seconds against timestamps;
- the bare-unit form (interval 30 days);
- timestamp - timestamp and date - date differences (day-time
  interval results);
- interval comparisons.

PySpark cannot collect a bare YearMonthIntervalType cell
(`fromInternal is not implemented` in pyspark 4.1) — interval VALUES
therefore compare through CAST(... AS STRING), which is also how the
reference's CLI renders them.
"""

from __future__ import annotations

import pytest

from hive_2_3_2_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark=spark)


def _one(eng, sql):
    return eng.sql(sql).collect()[0][0]


def test_q_interval_year_month_date_arithmetic(eng):
    """interval_arithmetic.q block 1: all six year-month forms."""
    assert str(_one(eng,
        "select date '2001-01-01' - interval '2-2' year to month AS a"
    )) == "1998-11-01"
    assert str(_one(eng,
        "select date '2001-01-01' - interval '-2-2' year to month AS a"
    )) == "2003-03-01"
    assert str(_one(eng,
        "select date '2001-01-01' + interval '2-2' year to month AS a"
    )) == "2003-03-01"
    assert str(_one(eng,
        "select date '2001-01-01' + interval '-2-2' year to month AS a"
    )) == "1998-11-01"
    assert str(_one(eng,
        "select - interval '2-2' year to month + date '2001-01-01' AS a"
    )) == "1998-11-01"
    assert str(_one(eng,
        "select interval '2-2' year to month + date '2001-01-01' AS a"
    )) == "2003-03-01"


def test_q_interval_day_second_timestamp_arithmetic(eng):
    """interval_arithmetic.q block 2: day-to-second with fractional
    seconds, and the bare-unit form."""
    assert str(_one(eng,
        "select timestamp '2001-01-01 01:02:03' "
        "- interval '99 11:22:33.123456' day to second AS a"
    )) == "2000-09-23 13:39:29.876544"
    assert str(_one(eng,
        "select timestamp '2001-01-01 01:02:03' "
        "+ interval '99 11:22:33.123456' day to second AS a"
    )) == "2001-04-10 12:24:36.123456"
    assert str(_one(eng,
        "select date '2001-01-01' + interval 30 days AS a"
    )) == "2001-01-31"


def test_q_interval_sum_renders(eng):
    """interval_arithmetic.q: interval + interval — collected through
    CAST AS STRING (PySpark cannot materialize the bare type)."""
    got = _one(eng,
        "select cast(interval '2-2' year to month "
        "+ interval '3-3' year to month as string) AS a")
    assert got == "INTERVAL '5-5' YEAR TO MONTH"


def test_q_timestamp_and_date_differences(eng):
    """interval_arithmetic.q tail: ts - ts and date - date produce
    day-time intervals."""
    import datetime

    d = _one(eng,
        "select timestamp '2001-01-01 00:00:00' "
        "- timestamp '2000-01-01 12:00:00' AS a")
    assert d == datetime.timedelta(days=365, hours=12)
    d2 = _one(eng, "select date '2001-01-28' - date '2001-01-01' AS a")
    assert d2 == datetime.timedelta(days=27)


def test_q_interval_comparisons(eng):
    """interval_comparison.q: ordering across year-month intervals."""
    assert _one(eng,
        "select interval '2-2' year to month "
        "> interval '2-1' year to month AS a") is True
    assert _one(eng,
        "select interval '1 2:3:4' day to second "
        "= interval '1 2:3:4' day to second AS a") is True
    assert _one(eng,
        "select interval '2-2' year to month "
        "< interval '2-1' year to month AS a") is False


def test_q_interval_constructor_functions(eng):
    """interval_1.q / interval_2.q: Hive's interval_year_month /
    interval_day_time constructor functions (GenericUDFToIntervalYearMonth,
    FunctionRegistry.java:399-400) rewrite to Spark's string->interval
    casts."""
    assert _one(eng,
        "select cast(interval_year_month('10-11') as string) AS a"
    ) == "INTERVAL '10-11' YEAR TO MONTH"
    assert _one(eng,
        "select cast(interval_day_time('2 1:2:3') as string) AS a"
    ) == "INTERVAL '2 01:02:03' DAY TO SECOND"
    assert str(_one(eng,
        "select date '2001-01-01' + interval_year_month('2-2') AS a"
    )) == "2003-03-01"
    # column-valued argument (interval_2.q's concat(key, '-1') form)
    got = _one(eng,
        "select cast(interval_year_month(concat('3', '-4')) as string) AS a"
    )
    assert got == "INTERVAL '3-4' YEAR TO MONTH"


def test_q_select_transform_hint_dropped(eng, spark):
    """select_transform_hint.q: a /*+ MAPJOIN */ hint directly before
    TRANSFORM parses (the hint is dropped — physical advice has no
    meaning for a script pipe)."""
    spark.createDataFrame(
        [("1", "a"), ("2", "b")], "key string, value string"
    ).createOrReplaceTempView("th_t")
    rows = sorted(tuple(r) for r in eng.sql(
        "SELECT /*+MAPJOIN(a)*/ TRANSFORM(a.key, a.value) USING 'cat' "
        "AS (tkey, tvalue) FROM th_t a"
    ).collect())
    assert rows == [("1", "a"), ("2", "b")]
