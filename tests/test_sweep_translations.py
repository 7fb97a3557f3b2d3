"""Pure-python pins for the sweep's oracle-translation layer (r11
batch 4) — no Spark session; DuckDB only. These rules decide whether
golden statements value-verify, so they get the same regression
treatment as engine code.
"""

from __future__ import annotations

import duckdb
import pytest

from tools.qfile_value_sweep import (
    duck_exec_statements,
    duck_translate,
    register_duck_test_fns,
    _sub_nonliteral,
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    register_duck_test_fns(c)
    return c


def test_string_literals_never_rewrite(con):
    """parquet_join.q regression: operand-shaped text INSIDE a quoted
    literal must survive every coercion rule byte-for-byte."""
    t = duck_translate(
        'select concat(value, "value2-1"), concat(value, \'a+b\') '
        "from src"
    )
    assert "'value2-1'" in t and "'a+b'" in t
    assert "TRY_CAST(value2" not in t


def test_arith_rule_preserves_precedence_and_idents():
    """20000 * a + b must NOT re-parenthesize, and a trailing ident
    must not backtrack-shorten (TRY_CAST → TRY_CAS)."""
    t = duck_translate("select 20000 * a.range + b.range from t")
    assert "20000 * TRY_CAST(a.range AS DOUBLE)" in t
    t2 = duck_translate("select int(empno+deptno/2) from emps")
    assert "TRY_CAS AS" not in t2


def test_typed_literal_suffixes(con):
    t = duck_translate("select 2L, 3S, 4Y, 0.0125BD * 4BD")
    row = con.execute(t).fetchall()[0]
    assert row[:3] == (2, 3, 4) and float(row[3]) == 0.05


def test_identity_cat_transform(con):
    con.execute("CREATE OR REPLACE TABLE tsrc AS SELECT 'k' AS a, 'v' AS b")
    t = duck_translate(
        "select transform(a, b) using 'cat' as (x, y) from tsrc"
    )
    assert con.execute(t).fetchall() == [("k", "v")]
    # literal args (newline.q's embedded-tab escapes) stay untouched
    t2 = duck_translate(
        "select transform('a\\tb', 'c') using 'cat' as (x, y) from tsrc"
    )
    assert "using 'cat'" in t2.lower()


def test_implicit_alias_after_numeric_literal(con):
    t = duck_translate("select 11 key, 0 confuse_you, 1 a_one from (select 1) t")
    assert con.execute(t).fetchall() == [(11, 0, 1)]


def test_row_tuple_and_struct_in(con):
    t = duck_translate(
        "select 1 where struct('a', 1) in (struct('a',1), struct('b',2))"
    )
    assert con.execute(t).fetchall() == [(1,)]
    t2 = duck_translate(
        "select 1 where (int(1+3/2), int(4/3)) in ((2,1),(3,2))"
    )
    assert con.execute(t2).fetchall() == [(1,)]


def test_cast_division_truncates_like_hive(con):
    """mapreduce5.q: CAST(15/10 AS INT) is 1 in Hive (truncate toward
    zero); duck's plain cast rounds to 2."""
    t = duck_translate(
        "select cast(key / 10 as int) from (select '15' as key) t"
    )
    assert con.execute(t).fetchall() == [(1,)]


def test_months_between_hive_lenient(con):
    rows = con.execute(duck_translate(
        "select months_between('2002-02-31', '2002-03-01'), "
        "months_between('1995-02-02 10:39', '1995-01-01'), "
        "months_between('garbage', '1995-01-01')"
    )).fetchall()[0]
    assert rows == (0.06451613, 1.03225806, None)


def test_add_months_last_day_pins(con):
    rows = con.execute(duck_translate(
        "select add_months('2014-01-31', 1), add_months('2014-02-28', -1)"
    )).fetchall()[0]
    assert rows == ("2014-02-28", "2014-01-31")


def test_from_utc_timestamp_fixed_offsets(con):
    rows = con.execute(duck_translate(
        "select from_utc_timestamp('2012-02-11 04:30:00', 'GMT+8'), "
        "from_utc_timestamp('2012-02-11 04:30:00', 'PST')"
    )).fetchall()[0]
    assert str(rows[0]) == "2012-02-11 12:30:00"
    assert str(rows[1]) == "2012-02-10 20:30:00"


def test_try_cast_invalid_dates_null(con):
    rows = con.execute(duck_translate(
        "select cast('2002-02-31' as date), cast('x' as timestamp)"
    )).fetchall()[0]
    assert rows == (None, None)


def test_mixed_static_dynamic_partition_insert_order(con):
    """llap_smb.q regression: partition (y=2000, q) — the static y
    interleaves per the declared order, never appends after q."""
    for stmt in duck_exec_statements(
        "create table orc_x (id bigint, cdouble double) "
        "partitioned by (y int, q smallint)"
    ):
        con.execute(stmt)
    for stmt in duck_exec_statements(
        "insert into table orc_x partition (y=2000, q) "
        "select 7, 1.5, 2"
    ):
        con.execute(stmt)
    assert con.execute(
        "select id, cdouble, y, q from orc_x"
    ).fetchall() == [(7, 1.5, 2000, 2)]
    con.execute("drop table orc_x")


def test_dynamic_overwrite_keeps_untouched_partitions(con):
    """partitions_filter_default.q regression: a second dynamic
    OVERWRITE only swaps the partitions it touches — the NULL
    partition survives."""
    for stmt in duck_exec_statements(
        "create table ptf_x (a string) partitioned by (c int)"
    ):
        con.execute(stmt)
    for src in ("select 'Col1', null", "select 'Col2', 5"):
        for stmt in duck_exec_statements(
            f"insert overwrite table ptf_x partition (c) {src}"
        ):
            con.execute(stmt)
    got = sorted(
        con.execute("select a, c from ptf_x").fetchall(),
        key=repr,
    )
    assert got == [("Col1", None), ("Col2", 5)]
    # re-overwriting a TOUCHED partition swaps it
    for stmt in duck_exec_statements(
        "insert overwrite table ptf_x partition (c) select 'Col3', 5"
    ):
        con.execute(stmt)
    got = sorted(
        con.execute("select a, c from ptf_x").fetchall(), key=repr
    )
    assert got == [("Col1", None), ("Col3", 5)]
    con.execute("drop table ptf_x")


def test_sub_nonliteral_segments():
    out = _sub_nonliteral(r"a", "X", "a 'a' \"a\" a")
    assert out == "X 'a' \"a\" X"
