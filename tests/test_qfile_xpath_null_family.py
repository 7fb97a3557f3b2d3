"""clientpositive input_testxpath.q–input_testxpath4.q + input21.q +
inputwherefalse.q replay: Hive's "xpath"-style complex-type navigation
(ExprNodeFieldDesc / GenericUDFIndex over the src_thrift fixture) and
NULL-heavy DISTRIBUTE/SORT semantics over src_null.

Navigation matrix: array index (lint[1]), struct field of an array
element (lintstring[0].mystring), map key (mstringstring['key_2']),
FIELD PROJECTION ACROSS an array of structs (lintstring.myint →
array<int> — Hive and Spark both support the implicit map), size() of
array/map, and NULL guards over whole complex columns.

src_thrift reproduced inline: row i has lint=[i, i*2], lintstring=
[{myint:i*i, mystring:'str_i', underscore_int:i}], mstringstring=
{'key_i': 'value_i'}; the last row is all-NULL (the thrift fixture's
NULL record every IS NOT NULL cell depends on).
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_xp")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    rows = [
        (
            [i, i * 2],
            [{"myint": i * i, "mystring": f"str_{i}",
              "underscore_int": i}],
            {f"key_{i}": f"value_{i}"},
        )
        for i in range(10)
    ] + [(None, None, None)]
    p = str(root / "xp_thrift")
    spark.createDataFrame(
        rows,
        "lint array<int>, lintstring array<struct<myint:int,"
        "mystring:string,underscore_int:int>>, "
        "mstringstring map<string,string>",
    ).coalesce(1).write.parquet(p)
    eng.register_table("xp_thrift", p)
    nulls = [("1.0", "1", "same", str(i)) for i in range(5)] + [
        ("1.0", "1", "same", None), (None, None, None, None),
        ("", "", "", ""),
    ]
    pn = str(root / "xp_null")
    spark.createDataFrame(
        nulls, "a string, b string, c string, d string"
    ).coalesce(1).write.parquet(pn)
    eng.register_table("xp_null", pn)
    con.execute(
        f"CREATE VIEW xp_null AS SELECT * FROM read_parquet('{pn}/*.parquet')"
    )
    yield eng, con
    con.close()


def test_q_xpath_index_field_map(qenv):
    """input_testxpath.q: lint[1], lintstring[0].mystring,
    mstringstring['key_2'] — including the NULL row propagating NULL
    through every navigation."""
    eng, _ = qenv
    rows = eng.sql(
        "FROM xp_thrift SELECT xp_thrift.lint[1] AS i1, "
        "xp_thrift.lintstring[0].mystring AS s1, "
        "xp_thrift.mstringstring['key_2'] AS m1"
    ).collect()
    got = sorted(((r.i1, r.s1, r.m1) for r in rows), key=repr)
    exp = sorted(
        [(i * 2, f"str_{i}", "value_2" if i == 2 else None)
         for i in range(10)] + [(None, None, None)],
        key=repr,
    )
    assert got == exp


def test_q_xpath2_sizes_with_null_guards(qenv):
    """input_testxpath2.q: size() of array/struct-array/map under
    IS NOT NULL guards — the all-NULL record is filtered out, sizes
    are element counts."""
    eng, _ = qenv
    rows = eng.sql(
        "FROM xp_thrift SELECT size(xp_thrift.lint) AS a, "
        "size(xp_thrift.lintstring) AS b, "
        "size(xp_thrift.mstringstring) AS c "
        "where xp_thrift.lint IS NOT NULL AND "
        "NOT (xp_thrift.mstringstring IS NULL)"
    ).collect()
    assert len(rows) == 10
    assert all((r.a, r.b, r.c) == (2, 1, 1) for r in rows)


def test_q_xpath3_field_across_array(qenv):
    """input_testxpath3.q/4.q: lintstring.myint projects the struct
    field ACROSS the array (array<int> result), with AND/OR NULL-guard
    variants."""
    eng, _ = qenv
    rows = eng.sql(
        "FROM xp_thrift SELECT xp_thrift.mstringstring['key_9'] AS m, "
        "xp_thrift.lintstring.myint AS mi"
    ).collect()
    got = sorted(
        ((r.m, tuple(r.mi) if r.mi is not None else None)
         for r in rows),
        key=repr,
    )
    exp = sorted(
        [("value_9" if i == 9 else None, (i * i,)) for i in range(10)]
        + [(None, None)], key=repr,
    )
    assert got == exp
    # AND guard keeps only non-null rows; OR keeps all non-all-NULL
    n_and = eng.sql(
        "FROM xp_thrift SELECT mstringstring['key_9'] AS m, "
        "lintstring.myint AS mi WHERE mstringstring['key_9'] IS NOT "
        "NULL AND lintstring.myint IS NOT NULL AND lintstring IS NOT "
        "NULL"
    ).count()
    assert n_and == 1
    n_or = eng.sql(
        "FROM xp_thrift SELECT mstringstring['key_9'] AS m, "
        "lintstring.myint AS mi WHERE mstringstring['key_9'] IS NOT "
        "NULL OR lintstring.myint IS NOT NULL OR lintstring IS NOT NULL"
    ).count()
    assert n_or == 10


def test_q_input21_distribute_sort_nulls(qenv):
    """input21.q: SELECT * ... DISTRIBUTE BY c SORT BY d over a table
    with NULL and empty-string rows — a layout directive, so the
    MULTISET equals the plain scan (Hive's golden is sorted for
    comparison the same way)."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql("SELECT * FROM xp_null DISTRIBUTE BY c SORT BY d"),
        con,
        "SELECT * FROM xp_null",
    )


def test_q_inputwherefalse(qenv):
    """inputwherefalse.q: WHERE FALSE through a subquery — zero rows,
    schema intact."""
    eng, _ = qenv
    df = eng.sql(
        "From (select * from xp_null) a SELECT a.a, a.b where false"
    )
    assert df.count() == 0 and df.columns == ["a", "b"]
