"""udf_months_between.q golden matrix — two REAL value divergences the
r11 sweep found between Spark's months_between and Hive 2.3's
(GenericUDFMonthsBetween, reference
ql/src/java/org/apache/hadoop/hive/ql/udf/generic/
GenericUDFMonthsBetween.java):

1. Hive parses STRING operands with a LENIENT GregorianCalendar —
   out-of-range fields ROLL OVER: '2002-02-31' is 2002-03-03, so
   months_between('2002-02-31','2002-03-01') = 2/31 = 0.06451613.
   Spark returns NULL.
2. Hive SKIPS a PARTIAL time-of-day — '1995-02-02 10:39' counts as
   midnight (golden 1.03225806). Spark parses the partial time and
   returns 1.04657258.

The engine normalizes both operands through a pure Catalyst
expression (hiveql_rewrites._rewrite_months_between) — no UDF.
"""

from __future__ import annotations

import pytest

from hive_2_3_2_spark.engine import Engine

#: (a, b) → udf_months_between.q.out golden value
GOLDEN = [
    ("'1995-02-02'", "'1995-01-01'", 1.03225806),
    ("'2003-07-17'", "'2005-07-06'", -23.64516129),
    ("'2001-06-30'", "'2000-05-31'", 13.0),
    ("'2000-06-01'", "'2004-07-01'", -49.0),
    ("'2002-02-28'", "'2002-03-01'", -0.12903226),
    ("'2002-02-31'", "'2002-03-01'", 0.06451613),  # lenient rollover
    ("'2012-02-29'", "'2012-03-01'", -0.09677419),
    ("'2012-02-31'", "'2012-03-01'", 0.03225806),  # lenient rollover
    ("'1976-01-01 00:00:00'", "'1975-12-31 23:59:59'", 3.7e-07),
    ("'1976-01-01'", "'1975-12-31 23:59:59'", 3.7e-07),
    ("'1997-02-28 10:30:00'", "'1996-10-30'", 3.94959677),
    # both last-day → time ignored
    ("'2002-03-31'", "'2002-02-28'", 1.0),
    ("'2002-03-31'", "'2002-02-28 10:30:00'", 1.0),
    ("'2002-03-31 10:30:00'", "'2002-02-28'", 1.0),
    # same day-of-month → time ignored
    ("'2002-03-24'", "'2002-02-24'", 1.0),
    ("'2002-03-24 10:30:00'", "'2002-02-24'", 1.0),
    # partial time SKIPPED (Spark would count it: 1.04657258)
    ("'1995-02-02 10:39'", "'1995-01-01'", 1.03225806),
    ("'1995-02-02'", "'1995-01-01 10:39'", 1.03225806),
    # non-padded and short years
    ("'1995-02-2'", "'1995-1-01'", 1.03225806),
    ("'95-2-02'", "'95-01-1'", 1.03225806),
    # NULLs and garbage
    ("cast(null as string)", "'2012-03-01'", None),
    ("'garbage'", "'2012-03-01'", None),
]


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark=spark)


def test_months_between_golden_matrix(eng):
    cells = ", ".join(f"months_between({a}, {b})" for a, b, _ in GOLDEN)
    got = list(eng.sql(f"select {cells}").collect()[0])
    want = [v for _a, _b, v in GOLDEN]
    assert got == want


def test_months_between_typed_args_untouched(eng):
    """DATE/TIMESTAMP operands round-trip the normalization exactly
    (CAST to string re-parses losslessly)."""
    r = eng.sql(
        "select months_between(cast('1995-02-02' as date), "
        "cast('1995-01-01' as date)) a, "
        "months_between(cast('1976-01-01 00:00:00' as timestamp), "
        "cast('1975-12-31 23:59:59' as timestamp)) b"
    ).collect()[0]
    assert r.a == 1.03225806
    assert r.b == 3.7e-07


def test_months_between_third_arg_roundoff(eng):
    r = eng.sql(
        "select months_between('1995-02-02', '1995-01-01', false) a"
    ).collect()[0]
    assert abs(r.a - 1.0322580645161292) < 1e-12


def test_add_months_lenient_rollover(eng):
    """udf_add_months.q golden: the same lenient-calendar parse —
    add_months('2014-01-32', 1) rolls Jan 32 to Feb 1 → '2014-03-01';
    Spark alone NULLs it. Unparseable stays NULL; last-day pinning and
    timestamp inputs are Spark-native and unchanged."""
    r = eng.sql(
        "select add_months('2014-01-14', 1) a, "
        "add_months('2014-01-31', 1) b, add_months('2014-02-28', -1) c, "
        "add_months('2014-01-32', 1) d, add_months('01/14/2014', 1) e, "
        "add_months('2014-01-14 10:30:00', 1) g"
    ).collect()[0]
    assert [str(v) for v in r] == [
        "2014-02-14", "2014-02-28", "2014-01-31", "2014-03-01",
        "None", "2014-02-14",
    ]
