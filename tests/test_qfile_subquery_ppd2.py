"""clientpositive `.q` slice, round 6h: second subquery/ppd wave
(reference: ql/src/test/queries/clientpositive/subquery_exists.q,
subquery_views.q, ppd_union.q, ppd_outer_join4.q,
ppd_repeated_alias.q).

- subquery_exists: correlated EXISTS on two columns with an extra
  range conjunct, plus the HAVING-EXISTS variant;
- subquery_views: the EXISTS subquery frozen inside a CREATE VIEW,
  then the view consumed TWICE (outer scan + IN-subquery over
  itself) — stacked view/subquery resolution;
- ppd_union: FROM-first branches each carrying their own WHERE inside
  a UNION ALL, with the outer FROM-first WHERE pushed into both;
- ppd_outer_join4: LEFT OUTER then RIGHT OUTER chain whose WHERE mixes
  preserved-side ranges with a function predicate (sqrt(c.key) <> 13)
  — after the WHERE binds on a/b columns the outer joins collapse to
  inner, the golden's point;
- ppd_repeated_alias: the SAME alias name (`a`) reused at two nesting
  levels with a null-producing-side WHERE.

All string-ordering comparisons (key < '100') stay STRING comparisons,
matching Hive (quoted literals do not trigger numeric coercion).
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(str(i % 83), f"val_{i % 83}") for i in range(500)]
POKES = [(1, 3, 10), (2, 3, 11), (3, 4, 12), (4, None, 13), (5, 3, 14)]
POKES2 = [(1, 3, 20), (3, 5, 21), (5, 3, 22), (6, 3, 23)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_subppd")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    p = str(root / "sp_src")
    spark.createDataFrame(SRC, "key string, value string").coalesce(
        2
    ).write.parquet(p)
    eng.register_table("sp_src", p)
    con.execute(
        f"CREATE VIEW sp_src AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    for name, rows in (("sp_pokes", POKES), ("sp_pokes2", POKES2)):
        pp = str(root / name)
        spark.createDataFrame(
            rows, "foo int, bar int, blah int"
        ).coalesce(1).write.parquet(pp)
        eng.register_table(name, pp)
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{pp}/*.parquet')"
        )
    yield eng, con
    con.close()


def test_q_subquery_exists_correlated(qenv):
    """subquery_exists.q: two-column correlated EXISTS with a range
    conjunct inside the subquery."""
    eng, con = qenv
    sql = (
        "select b.key AS key, b.value AS value from sp_src b "
        "where exists (select a.key from sp_src a "
        "where b.value = a.value and a.key = b.key and a.value > 'val_9')"
    )
    assert_matches_oracle(eng.sql(sql), con, sql)


def test_q_subquery_exists_in_having(qenv):
    """subquery_exists.q tail: EXISTS inside HAVING, correlated on the
    group key."""
    eng, con = qenv
    sql = (
        "select b.key AS key, count(*) AS cnt from sp_src b "
        "group by b.key having exists "
        "(select a.key from sp_src a "
        "where a.key = b.key and a.value > 'val_9')"
    )
    duck = (
        "select b.key AS key, CAST(count(*) AS BIGINT) AS cnt "
        "from sp_src b group by b.key having exists "
        "(select a.key from sp_src a "
        "where a.key = b.key and a.value > 'val_9')"
    )
    assert_matches_oracle(eng.sql(sql), con, duck)


def test_q_subquery_views_exists_view_self_in(qenv):
    """subquery_views.q: EXISTS subquery inside a view, the view then
    consumed twice (scan + IN-subquery over itself)."""
    eng, con = qenv
    eng.sql("DROP VIEW IF EXISTS sp_cv1")
    eng.sql(
        "create view sp_cv1 as select * from sp_src b where exists "
        "(select a.key from sp_src a "
        "where b.value = a.value and a.key = b.key and a.value > 'val_9')"
    )
    assert_matches_oracle(
        eng.sql(
            "select key, value from sp_cv1 where sp_cv1.key in "
            "(select key from sp_cv1 c where c.key > '95')"
        ),
        con,
        "WITH cv1 AS (select * from sp_src b where exists "
        "(select a.key from sp_src a where b.value = a.value "
        "and a.key = b.key and a.value > 'val_9')) "
        "SELECT key, value FROM cv1 WHERE key IN "
        "(SELECT key FROM cv1 c WHERE c.key > '95')",
    )


def test_q_ppd_union_from_first_branch_filters(qenv):
    """ppd_union.q: per-branch WHERE inside FROM-first union branches,
    outer FROM-first WHERE on top."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "FROM ( FROM sp_src select sp_src.key, sp_src.value "
            "WHERE sp_src.key < '100' "
            "UNION ALL "
            "FROM sp_src SELECT sp_src.* WHERE sp_src.key > '150' "
            ") unioned_query "
            "SELECT unioned_query.* WHERE key > '4' and value > 'val_4'"
        ),
        con,
        "SELECT key, value FROM ("
        "SELECT key, value FROM sp_src WHERE key < '100' "
        "UNION ALL SELECT key, value FROM sp_src WHERE key > '150') u "
        "WHERE key > '4' AND value > 'val_4'",
    )


def test_q_ppd_outer_join4_collapse_to_inner(qenv):
    """ppd_outer_join4.q: LOJ + ROJ chain whose WHERE binds on all
    sides (including sqrt(c.key) <> 13) — outer joins collapse to
    inner and the row set must match the oracle's."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "FROM sp_src a LEFT OUTER JOIN sp_src b ON (a.key = b.key) "
            "RIGHT OUTER JOIN sp_src c ON (a.key = c.key) "
            "SELECT a.key AS ak, a.value AS av, b.key AS bk, "
            "b.value AS bv, c.key AS ck "
            "WHERE a.key > '10' AND a.key < '20' AND b.key > '15' "
            "AND b.key < '25' AND sqrt(c.key) <> 13"
        ),
        con,
        "SELECT a.key AS ak, a.value AS av, b.key AS bk, "
        "b.value AS bv, c.key AS ck "
        "FROM sp_src a JOIN sp_src b ON a.key = b.key "
        "JOIN sp_src c ON a.key = c.key "
        "WHERE a.key > '10' AND a.key < '20' AND b.key > '15' "
        "AND b.key < '25' AND sqrt(TRY_CAST(c.key AS DOUBLE)) <> 13",
    )


def test_q_ppd_repeated_alias(qenv):
    """ppd_repeated_alias.q: alias `a` reused at two nesting levels;
    WHERE on the null-producing side makes the LOJ effectively inner."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "SELECT a.foo as foo1, b.foo as foo2, b.bar "
            "FROM sp_pokes a LEFT OUTER JOIN sp_pokes2 b ON a.foo=b.foo "
            "WHERE b.bar=3"
        ),
        con,
        "SELECT a.foo AS foo1, b.foo AS foo2, b.bar AS bar "
        "FROM sp_pokes a JOIN sp_pokes2 b ON a.foo = b.foo "
        "WHERE b.bar = 3",
    )
    assert_matches_oracle(
        eng.sql(
            "SELECT * FROM (SELECT a.foo as foo1, b.foo as foo2, b.bar "
            "FROM sp_pokes a LEFT OUTER JOIN sp_pokes2 b ON a.foo=b.foo) "
            "a WHERE a.bar=3"
        ),
        con,
        "SELECT a.foo AS foo1, b.foo AS foo2, b.bar AS bar "
        "FROM sp_pokes a JOIN sp_pokes2 b ON a.foo = b.foo "
        "WHERE b.bar = 3",
    )
