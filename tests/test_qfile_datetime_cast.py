"""clientpositive `.q` slice, round 5 batch 3: the cast / date /
timestamp semantic families (cast_to_int.q, date_1.q,
date_comparison.q, timestamp_comparison.q, timestamp_udf.q,
date_udf.q).

These goldens pin COERCION semantics more than plan shapes, and DuckDB
disagrees with Hive on several (DuckDB ROUNDS '1.6'→2 where Hive
truncates to 1), so the expected values here are literal transcriptions
of the reference's own `.q.out` goldens
(ql/src/test/results/clientpositive/cast_to_int.q.out, date_1.q.out) —
the same golden-diff method as QTestUtil, inlined."""

from __future__ import annotations

import datetime

import pytest

from hive_2_3_2_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark=spark)


def test_q_cast_to_int_battery(eng):
    """cast_to_int.q golden, verbatim: decimal strings TRUNCATE through
    int casts ('1.4'→1, '1.6'→1 — DuckDB would round), scientific
    notation and malformed numerics go NULL, boundary values hold."""
    r = eng.sql(
        """
        select
          cast('1' as float) c1, cast('1.4' as float) c2,
          cast('1.6' as float) c3,
          cast('1' as int) c4, cast('1.4' as int) c5,
          cast('1.6' as int) c6,
          cast('1' as tinyint) c7, cast('1.4' as tinyint) c8,
          cast('1.6' as tinyint) c9,
          cast('1' as smallint) c10, cast('1.4' as smallint) c11,
          cast('1.6' as smallint) c12,
          cast('1' as bigint) c13, cast('1.4' as bigint) c14,
          cast('1.6' as bigint) c15,
          cast(cast('1' as float) as int) c16,
          cast(cast('1.4' as float) as int) c17,
          cast(cast('1.6' as float) as int) c18,
          cast('+1e5' as int) c19,
          cast('2147483647' as int) c20,
          cast('-2147483648' as int) c21,
          cast('32767' as smallint) c22,
          cast('-32768' as smallint) c23,
          cast('-128' as tinyint) c24,
          cast('127' as tinyint) c25,
          cast('1.0a' as int) c26,
          cast('-1.-1' as int) c27
        """
    ).collect()[0]
    # golden row: 1.0 1.4 1.6 1 1 1 1 1 1 1 1 1 1 1 1 1 1 1
    #             NULL 2147483647 -2147483648 32767 -32768 -128 127 NULL NULL
    assert (r.c1, r.c2, r.c3) == (1.0, pytest.approx(1.4), pytest.approx(1.6))
    assert (r.c4, r.c5, r.c6) == (1, 1, 1)
    assert (r.c7, r.c8, r.c9) == (1, 1, 1)
    assert (r.c10, r.c11, r.c12) == (1, 1, 1)
    assert (r.c13, r.c14, r.c15) == (1, 1, 1)
    assert (r.c16, r.c17, r.c18) == (1, 1, 1)
    assert r.c19 is None
    assert (r.c20, r.c21) == (2147483647, -2147483648)
    assert (r.c22, r.c23) == (32767, -32768)
    assert (r.c24, r.c25) == (-128, 127)
    assert r.c26 is None and r.c27 is None


def test_q_date_1_cast_matrix(eng, spark, tmp_path):
    """date_1.q: three INSERT forms (cast-string, DATE literal,
    cast-timestamp) land the same date; the string/timestamp/date cast
    matrix round-trips; date→boolean/numeric are ALL NULL (golden's
    final row)."""
    path = str(tmp_path / "date_1")
    spark.createDataFrame([], "d date").write.parquet(path)
    eng.register_table("date_1", path)
    for expr in (
        "cast('2011-01-01' as date)",
        "date '2011-01-01'",
        "cast(cast('2011-01-01 00:00:00' as timestamp) as date)",
    ):
        eng.sql(f"INSERT OVERWRITE TABLE date_1 SELECT {expr}")
        got = eng.sql("SELECT d, count(d) AS n FROM date_1 GROUP BY d").collect()
        assert [(r.d, r.n) for r in got] == [(datetime.date(2011, 1, 1), 1)]
    r = eng.sql(
        """
        select cast('2012-01-01' as string) s1, cast(d as string) s2,
               cast(d as timestamp) t1,
               cast(cast(d as timestamp) as date) d1, cast(d as date) d2
        from date_1 limit 1
        """
    ).collect()[0]
    assert r.s1 == "2012-01-01" and r.s2 == "2011-01-01"
    assert r.t1 == datetime.datetime(2011, 1, 1, 0, 0)
    assert r.d1 == r.d2 == datetime.date(2011, 1, 1)
    r = eng.sql(
        """
        select cast(d as boolean) b, cast(d as tinyint) ti,
               cast(d as smallint) si, cast(d as int) i,
               cast(d as bigint) bi, cast(d as float) f,
               cast(d as double) db
        from date_1 limit 1
        """
    ).collect()[0]
    assert all(v is None for v in (r.b, r.ti, r.si, r.i, r.bi, r.f, r.db))


def test_q_date_and_timestamp_comparison(eng):
    """date_comparison.q + timestamp_comparison.q: the six comparison
    operators on equal and unequal values, plus sub-second-precision
    equality ('...09.1000' = '...09.1')."""
    r = eng.sql(
        """
        select
          cast('2011-05-06' as date) >  cast('2011-05-06' as date) c1,
          cast('2011-05-06' as date) <  cast('2011-05-06' as date) c2,
          cast('2011-05-06' as date) =  cast('2011-05-06' as date) c3,
          cast('2011-05-06' as date) <> cast('2011-05-06' as date) c4,
          cast('2011-05-06' as date) >= cast('2011-05-06' as date) c5,
          cast('2011-05-06' as date) <= cast('2011-05-06' as date) c6,
          cast('2011-05-05' as date) >  cast('2011-05-06' as date) c7,
          cast('2011-05-05' as date) <  cast('2011-05-06' as date) c8,
          cast('2011-05-06 07:08:09' as timestamp)
            >= cast('2011-05-06 07:08:09.1' as timestamp) c9,
          cast('2011-05-06 07:08:09' as timestamp)
            <  cast('2011-05-06 07:08:09.1' as timestamp) c10,
          cast('2011-05-06 07:08:09.1000' as timestamp)
            =  cast('2011-05-06 07:08:09.1' as timestamp) c11
        """
    ).collect()[0]
    assert (r.c1, r.c2, r.c3, r.c4, r.c5, r.c6) == (
        False, False, True, False, True, True,
    )
    assert (r.c7, r.c8) == (False, True)
    assert (r.c9, r.c10, r.c11) == (False, True, True)


def test_q_timestamp_udf_functions(eng):
    """timestamp_udf.q / date_udf.q: the extraction + arithmetic
    battery on a fractional-second timestamp, golden-style literal
    expectations; from/to_utc_timestamp round-trip through a named
    zone (deterministic regardless of session timezone)."""
    r = eng.sql(
        """
        select year(t) y, month(t) mo, day(t) d, dayofmonth(t) dom,
               weekofyear(t) woy, hour(t) h, minute(t) mi, second(t) s,
               to_date(t) td,
               date_add(t, 5) da, date_sub(t, 10) ds,
               datediff(t, t) dd0,
               datediff(t, '2002-03-21') dd1,
               datediff('2002-03-21', t) dd2,
               from_utc_timestamp(t, 'America/Chicago') f_utc,
               to_utc_timestamp(t, 'America/Chicago') t_utc
        from (select cast('2011-05-06 07:08:09.1234567' as timestamp) t)
        """
    ).collect()[0]
    assert (r.y, r.mo, r.d, r.dom, r.woy) == (2011, 5, 6, 6, 18)
    assert (r.h, r.mi, r.s) == (7, 8, 9)
    assert r.td == datetime.date(2011, 5, 6)
    assert r.da == datetime.date(2011, 5, 11)
    assert r.ds == datetime.date(2011, 4, 26)
    assert (r.dd0, r.dd1, r.dd2) == (0, 3333, -3333)
    # 2011-05-06 is CDT (UTC-5)
    assert r.f_utc == datetime.datetime(2011, 5, 6, 2, 8, 9, 123456)
    assert r.t_utc == datetime.datetime(2011, 5, 6, 12, 8, 9, 123456)


def test_q_date_udf_on_string_column(eng, spark, tmp_path):
    """date_udf.q's *_string twin: the same functions applied to a
    STRING column holding a date — Hive coerces implicitly."""
    path = str(tmp_path / "date_udf_string")
    spark.createDataFrame([("2011-05-06",)], "d string").write.parquet(path)
    eng.register_table("date_udf_string", path)
    r = eng.sql(
        """
        select year(d) y, month(d) mo, day(d) dm, weekofyear(d) woy,
               to_date(d) td, date_add(d, 5) da, date_sub(d, 10) ds,
               datediff(d, '2002-03-21') dd
        from date_udf_string
        """
    ).collect()[0]
    assert (r.y, r.mo, r.dm, r.woy) == (2011, 5, 6, 18)
    assert r.td == datetime.date(2011, 5, 6)
    assert r.da == datetime.date(2011, 5, 11)
    assert r.ds == datetime.date(2011, 4, 26)
    assert r.dd == 3333


def test_q_decimal_2_cast_battery(eng):
    """decimal_2.q: the decimal→everything cast battery. Matches the
    Hive golden on truncation toward zero (17.29→17), in-range integral
    casts, and float/double widening. Two DOCUMENTED divergences from
    the golden, both Spark-core cast semantics this engine accepts:
    - decimal→narrow-int OVERFLOW wraps in non-ANSI Spark (golden:
      NULL) — same Java-wraparound family as Hive's own int arithmetic
      (pinned in test_functions.py::test_overflow_wraps_not_errors);
    - decimal→string keeps the declared scale's trailing zeros
      ('17.290000000'; golden trims to '17.29' via
      HiveDecimal.toString)."""
    r = eng.sql(
        """
        select cast(t as boolean) b, cast(t as tinyint) ti,
               cast(t as int) i, cast(t as bigint) bi,
               cast(t as double) d, cast(t as string) s
        from (select cast(cast('17.29' as decimal(4,2))
                     as decimal(18,9)) t)
        """
    ).collect()[0]
    assert r.b is True
    assert (r.ti, r.i, r.bi) == (17, 17, 17)  # truncation, golden row
    assert r.d == 17.29
    assert r.s == "17.290000000"  # divergence: golden prints 17.29
    r = eng.sql(
        """
        select cast(t as int) i, cast(t as bigint) bi,
               cast(t as float) f, cast(t as double) d,
               cast(t as tinyint) ti
        from (select cast('3404045.5044003' as decimal(18,9)) t)
        """
    ).collect()[0]
    assert (r.i, r.bi) == (3404045, 3404045)  # golden rows
    assert r.f == pytest.approx(3404045.5)
    assert r.d == 3404045.5044003
    # divergence: golden yields NULL on tinyint overflow; Spark wraps
    assert r.ti == 13


def test_q_decimal_udf_mixed_arithmetic(eng):
    """decimal_udf.q: decimal ⊕ decimal/int/string arithmetic keeps
    exactness, int division promotes, x/0 is NULL (never an error)."""
    r = eng.sql(
        """
        select key + key AS s2, key + value AS siv,
               key + '1.0' AS sstr, key - (value / 2) AS shalf,
               key * key AS sq, key / 0 AS dz, key / null AS dn
        from (select cast('7.5' as decimal(20,10)) key, 3 value)
        """
    ).collect()[0]
    assert float(r.s2) == 15.0
    assert float(r.siv) == 10.5
    assert float(r.sstr) == 8.5
    assert float(r.shalf) == 6.0
    assert float(r.sq) == 56.25
    assert r.dz is None and r.dn is None


def test_q_udf_field_sql_callable(eng):
    """udf_field.q: the variadic field() UDF callable from SQL (r5
    rewrite → array_position composition): 1-based index, 0 when
    absent, NULL needle gives 0, nested call args survive the paren
    walk."""
    r = eng.sql(
        """
        select field('b', 'a', 'b', 'c') f1,
               field('x', 'a', 'b', 'c') f0,
               field(cast(null as string), 'a', 'b') fn,
               field(concat('b', ''), 'a', concat('b', ''), 'c') fnest,
               field(3, 1, 2, 3, 4) fint
        """
    ).collect()[0]
    assert (r.f1, r.f0, r.fn, r.fnest, r.fint) == (2, 0, 0, 2, 3)


def test_q_udf_greatest_least_null_semantics(eng):
    """udf_greatest.q / udf_least.q goldens: Hive's GREATEST/LEAST
    return NULL when ANY argument is NULL (GenericUDFGreatest after
    HIVE-12082) — Spark and DuckDB skip nulls, so Engine.sql rewrites
    to the null-guarded form. Value rows transcribed from the golden:
    string comparison is lexicographic ('2' > '13')."""
    r = eng.sql(
        """
        select greatest('a', 'b', 'c') g1,
               greatest('C', 'a', 'B') g2,
               greatest('AAA', 'AaA', 'AAa') g3,
               greatest('11', '2', '12') g4,
               greatest(cast(null as string), 'b', 'c') gn1,
               greatest('a', cast(null as string), 'c') gn2,
               greatest('a', 'b', cast(null as string)) gn3,
               greatest(11, 13, 12) gi,
               greatest(-11, -13, -12) gneg,
               greatest(1, cast(null as int), 2) gni,
               least('a', 'b', 'c') l1,
               least('11', '2', '12') l2,
               least(cast(null as string), 'b', 'c') ln1,
               least(13, 11, 12) li,
               least(1, cast(null as int), 2) lni,
               greatest(least(3, 5), 2, 4) nested
        """
    ).collect()[0]
    assert (r.g1, r.g2, r.g3, r.g4) == ("c", "a", "AaA", "2")
    assert r.gn1 is None and r.gn2 is None and r.gn3 is None
    assert (r.gi, r.gneg) == (13, -11)
    assert r.gni is None
    assert (r.l1, r.l2) == ("a", "11")
    assert r.ln1 is None
    assert r.li == 11
    assert r.lni is None
    assert r.nested == 4


def test_q_null_semantics_battery(eng):
    """udf_concat_ws.q / udf_split.q / udf_substr.q / udf_round.q /
    udf_sort_array.q golden corners in one battery: NULL separator
    nullifies concat_ws, split keeps trailing empties (Java limit -1),
    substr position 0 behaves as 1, round is HALF_UP while bround is
    banker's, sort_array puts NULLs first, find_in_set returns 0 for a
    needle containing a comma."""
    r = eng.sql(
        """
        select concat_ws(cast(null as string), 'a', 'b') cwn,
               split('a,b,,', ',') spl,
               substr('abcde', 0) s0,
               substr('abcde', 0, 3) s03,
               pmod(-7, 3) pm,
               round(2.5) r25, round(-2.5) rn25,
               bround(2.5) b25, bround(3.5) b35,
               sort_array(array(3, 1, cast(null as int))) sa,
               find_in_set('b', 'a,b,c') fis,
               find_in_set('b,c', 'a,b,c') fis_comma
        """
    ).collect()[0]
    assert r.cwn is None
    assert r.spl == ["a", "b", "", ""]
    assert (r.s0, r.s03) == ("abcde", "abc")
    assert r.pm == 2
    assert (int(r.r25), int(r.rn25)) == (3, -3)
    assert (int(r.b25), int(r.b35)) == (2, 4)
    assert r.sa == [None, 1, 3]
    assert (r.fis, r.fis_comma) == (2, 0)


def test_q_rewriters_ignore_string_literals(eng):
    """Rewrite hardening: greatest/field/noop/matchpath tokens inside
    QUOTED LITERALS must pass through untouched (the rewriters search
    code, not strings)."""
    r = eng.sql(
        """
        select 'use greatest(1,2) wisely' AS a,
               'noop(on x)' AS b,
               "field(a, b)" AS c,
               greatest(1, 2, cast(null as int)) AS d
        """
    ).collect()[0]
    assert r.a == "use greatest(1,2) wisely"
    assert r.b == "noop(on x)"
    assert r.c == "field(a, b)"
    assert r.d is None


def test_q_date_format_invalid_pattern_null(spark):
    """udf_date_format.q golden: date_format('2015-04-08','Q') → NULL —
    Hive's GenericUDFDateFormat.initialize catches the SimpleDateFormat
    IllegalArgumentException and yields NULL for every row; Spark would
    raise INVALID_DATETIME_PATTERN at execution, so Engine.sql
    pre-validates pattern literals (engine._rewrite_invalid_sdf_literals)."""
    from hive_2_3_2_spark.engine import Engine

    eng = Engine(spark=spark)
    row = eng.sql(
        "select date_format('2015-04-08', 'Q') AS q, "
        "date_format('2015-04-08', 'EEEE') AS e, "
        "unix_timestamp('2015-04-08', 'QQ') AS u, "
        "from_unixtime(0, 'yyyy-MM-dd') AS f"
    ).collect()[0]
    assert row.q is None and row.u is None
    assert row.e == "Wednesday"
    assert row.f == "1970-01-01"
