"""clientpositive `.q` slice, round 8: the join family tail —
join42.q-join46.q, join_1to1.q, join_alt_syntax.q, join_star.q,
join_filters_overlap.q, join_grp_diff_keys.q,
join_merge_multi_expressions.q, join_casesensitive.q (reference:
ql/src/test/queries/clientpositive/). The join_1to1/casesensitive
fixtures are data/files/in5.txt / in6.txt reproduced inline (with the
NULL-key tail rows the NULL-semantics cells depend on).

Recurring traps this tail pins: non-equi and one-sided conditions in
OUTER join ON clauses (they filter the null-extension, not the rows),
comma-list (implicit cross) syntax mixed with explicit JOINs, chained
star joins over broadcastable dims, and duplicate-expression join
conditions merged across a 3-way join.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

IN5 = [
    (5, 10005, 66), (15, 10015, 66), (20, 10020, 66), (25, 10025, 88),
    (30, 10030, 66), (35, 10035, 88), (40, 10040, 66), (40, 10040, 88),
    (50, 10050, 88), (50, 10050, 66), (50, 10050, 88), (60, 10040, 66),
    (60, 10040, 66), (70, 10040, 66), (70, 10040, 66), (80, 10040, 88),
    (80, 10040, 88), (None, 10050, 66), (None, None, 66),
]
IN6 = [
    (5, 10005, 66), (10, 10010, 66), (20, 10020, 66), (25, 10025, 66),
    (30, 10030, 88), (35, 10035, 88), (40, 10040, 66), (40, 10040, 88),
    (50, 10050, 66), (50, 10050, 88), (50, 10050, 66), (60, 10040, 66),
    (60, 10040, 66), (70, 10040, 88), (70, 10040, 88), (80, 10040, 66),
    (80, 10040, 66), (None, 10050, 66), (None, None, 66),
]
# join46.q / join_emit_interval.q fixtures
TEST1 = [(None, None, "None"), (98, None, "None"), (99, 0, "Alice"),
         (99, 2, "Mat"), (100, 1, "Bob"), (101, 2, "Car")]
TEST2 = [(102, 2, "Del"), (103, 2, "Ema"), (104, 3, "Fli"),
         (105, None, "None")]


def _values_view(con, name, rows, cols):
    body = ", ".join(
        "(" + ", ".join("NULL" if v is None else repr(v) for v in r) + ")"
        for r in rows
    )
    con.execute(
        f"CREATE VIEW {name} AS SELECT * FROM (VALUES {body}) AS t({cols})"
    )


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfile_join2")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    for name, rows, schema, cols in (
        ("j2_1to1_1", IN5, "key1 int, key2 int, value int",
         "key1, key2, value"),
        ("j2_1to1_2", IN6, "key1 int, key2 int, value int",
         "key1, key2, value"),
        ("j2_test1", TEST1, "key int, value int, col_1 string",
         "key, value, col_1"),
        ("j2_test2", TEST2, "key int, value int, col_2 string",
         "key, value, col_2"),
    ):
        p = str(root / name)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(p)
        eng.register_table(name, p)
        _values_view(con, name, rows, cols)
    yield eng, con
    con.close()


_AB = ("a.key1 AS ak1, a.key2 AS ak2, a.value AS av, "
       "b.key1 AS bk1, b.key2 AS bk2, b.value AS bv")
_T12 = ("t1.key AS k1, t1.value AS v1, t1.col_1 AS c1, "
        "t2.key AS k2, t2.value AS v2, t2.col_2 AS c2")


def _chk(eng, con, hive_sql, duck_sql=None):
    assert_matches_oracle(eng.sql(hive_sql), con, duck_sql or hive_sql)


def test_q_join_1to1(qenv):
    """join_1to1.q: inner and full-outer over tables with NULL keys and
    duplicate key groups — plus constant-value conjuncts in the FULL
    OUTER ON clause (they gate MATCHING, not filtering)."""
    eng, con = qenv
    for jt, cond in (
        ("join", "a.key1 = b.key1"),
        ("full outer join", "a.key1 = b.key1"),
        ("full outer join", "a.key1 = b.key1 and a.value = 66 and "
                            "b.value = 66"),
        ("full outer join", "a.key1 = b.key1 and a.key2 = b.key2"),
        ("full outer join", "a.key1 = b.key1 and a.value = 66 and "
                            "b.value = 66 and a.key2 = b.key2"),
    ):
        _chk(
            eng, con,
            f"SELECT {_AB} FROM j2_1to1_1 a {jt} j2_1to1_2 b ON {cond}",
        )


def test_q_join46_one_sided_outer_conditions(qenv):
    """join46.q / join_emit_interval.q: LEFT/RIGHT OUTER with range or
    one-sided conditions in the ON clause — unmatched preserved-side
    rows survive, the condition only gates matching."""
    eng, con = qenv
    shapes = [
        ("LEFT OUTER JOIN", "t1.value = t2.value"),
        ("LEFT OUTER JOIN",
         "t1.value = t2.value AND t1.key between 100 and 102 "
         "AND t2.key between 100 and 102"),
        ("LEFT OUTER JOIN",
         "t1.key between 100 and 102 AND t2.key between 100 and 102"),
        ("RIGHT OUTER JOIN", "t1.value = t2.value AND true"),
        ("LEFT OUTER JOIN", "t1.key between 100 and 102"),
    ]
    for jt, cond in shapes:
        _chk(
            eng, con,
            f"SELECT {_T12} FROM j2_test1 t1 {jt} j2_test2 t2 ON ({cond})",
        )


def test_q_join44_comma_syntax_with_between(qenv):
    """join44.q + join_alt_syntax.q: comma-list FROM (implicit cross)
    restricted by WHERE equalities and BETWEEN ranges, and a comma
    source mixed with an explicit JOIN."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT a.key1 AS k1, b.key1 AS k2 FROM j2_1to1_1 a, "
        "j2_1to1_2 b WHERE a.key1 = b.key1 AND a.key2 between 10000 "
        "and 10030 AND b.key2 between 10000 and 10030",
    )
    _chk(
        eng, con,
        "SELECT p1.key1 AS a, p2.key1 AS b, p3.key1 AS c FROM "
        "j2_1to1_1 p1, j2_1to1_2 p2 JOIN j2_1to1_1 p3 ON "
        "p2.key1 = p3.key1 WHERE p1.key1 = p2.key1",
    )


def test_q_join_casesensitive_mixed_case_names(qenv, spark):
    """join_casesensitive.q: mixed-case table and column identifiers
    resolve case-insensitively (HiveQL identifier rules)."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT joinone.key2 AS k2, joinTWO.key2 AS j2, joinone.value "
        "AS v1, joinTwo.value AS v2 FROM j2_1to1_1 joinone JOIN "
        "j2_1to1_2 joinTwo ON(joinone.key2=joinTwo.key2)",
        "SELECT joinone.key2 AS k2, joinTwo.key2 AS j2, joinone.value "
        "AS v1, joinTwo.value AS v2 FROM j2_1to1_1 joinone JOIN "
        "j2_1to1_2 joinTwo ON(joinone.key2=joinTwo.key2)",
    )


def test_q_join_filters_overlap(qenv, spark, tmp_path):
    """join_filters_overlap.q: the same table outer-joined three ways
    with OVERLAPPING constant predicates per ON clause — Hive merges
    the filter sets per alias; values must match however the planner
    dedups them."""
    eng, con = qenv
    p = str(tmp_path / "j2_a")
    rows = [(100, 40), (100, 50), (100, 60)]
    spark.createDataFrame(rows, "key int, value int") \
        .coalesce(1).write.parquet(p)
    eng.register_table("j2_a", p)
    _values_view(con, "j2_a", rows, "key, value")
    _chk(
        eng, con,
        "SELECT a.key AS ak, a.value AS av, b.key AS bk, b.value AS "
        "bv, c.key AS ck, c.value AS cv FROM j2_a a LEFT OUTER JOIN "
        "j2_a b ON (a.key=b.key AND a.value=50 AND b.value=50) LEFT "
        "OUTER JOIN j2_a c ON (a.key=c.key AND a.value=60 AND "
        "c.value=60)",
    )
    _chk(
        eng, con,
        "SELECT a.key AS ak, a.value AS av, b.key AS bk, b.value AS "
        "bv, c.key AS ck, c.value AS cv FROM j2_a a RIGHT OUTER JOIN "
        "j2_a b ON (a.key=b.key AND a.value=50 AND b.value=50) LEFT "
        "OUTER JOIN j2_a c ON (b.key=c.key AND b.value=60 AND "
        "c.value=60)",
    )
    _chk(
        eng, con,
        "SELECT a.key AS ak, a.value AS av, b.key AS bk, b.value AS "
        "bv, c.key AS ck, c.value AS cv, d.key AS dk, d.value AS dv "
        "FROM j2_a a FULL OUTER JOIN j2_a b ON (a.key=b.key AND "
        "a.value=50 AND b.value=50) LEFT OUTER JOIN j2_a c ON "
        "(b.key=c.key AND b.value=60 AND c.value=60) LEFT OUTER JOIN "
        "j2_a d ON (a.key=d.key AND a.value=40 AND d.value=40)",
    )


def test_q_join_grp_diff_keys(qenv, spark, tmp_path):
    """join_grp_diff_keys.q: 4-way join on compound keys grouped by a
    DIFFERENT column than the join keys."""
    eng, con = qenv
    rows = {
        "j2_foo": [(1, 10, "o1"), (1, 11, "o2"), (2, 20, "o3")],
        "j2_bar": [(1, 10, "b1"), (1, 11, "b2"), (2, 20, "b3"),
                   (2, 20, "b4")],
        "j2_split": [(1, 10, "s1"), (2, 20, "s2")],
        "j2_forecast": [(1, 10, "f1"), (1, 11, "f2"), (2, 20, "f3")],
    }
    for name, rs in rows.items():
        p = str(tmp_path / name)
        spark.createDataFrame(rs, "id int, line_id int, orders string") \
            .coalesce(1).write.parquet(p)
        eng.register_table(name, p)
        _values_view(con, name, rs, "id, line_id, orders")
    _chk(
        eng, con,
        "SELECT j2_foo.id AS id, count(*) AS factor FROM j2_foo JOIN "
        "j2_bar ON (j2_foo.id = j2_bar.id AND j2_foo.line_id = "
        "j2_bar.line_id) JOIN j2_split ON (j2_foo.id = j2_split.id AND "
        "j2_foo.line_id = j2_split.line_id) JOIN j2_forecast ON "
        "(j2_foo.id = j2_forecast.id AND j2_foo.line_id = "
        "j2_forecast.line_id) GROUP BY j2_foo.id ORDER BY id",
        "SELECT j2_foo.id AS id, CAST(count(*) AS BIGINT) AS factor "
        "FROM j2_foo JOIN j2_bar ON (j2_foo.id = j2_bar.id AND "
        "j2_foo.line_id = j2_bar.line_id) JOIN j2_split ON (j2_foo.id "
        "= j2_split.id AND j2_foo.line_id = j2_split.line_id) JOIN "
        "j2_forecast ON (j2_foo.id = j2_forecast.id AND "
        "j2_foo.line_id = j2_forecast.line_id) GROUP BY j2_foo.id "
        "ORDER BY id NULLS FIRST",
    )


def test_q_join_star_broadcasts(qenv, spark, tmp_path):
    """join_star.q: a fact chained through four dim joins — values
    match AND every dim side broadcasts (the golden's point: all
    mapjoins, zero shuffle joins for small dims)."""
    eng, con = qenv
    fact = [(1, 2, 10, 20), (3, 4, 11, 21), (5, 6, 12, 22)]
    dims = {
        "j2_dim1": [(10, 100), (11, 101), (12, 102)],
        "j2_dim2": [(20, 200), (21, 201), (22, 202)],
        "j2_dim3": [(100, 1000), (101, 1001), (102, 1002)],
        "j2_dim4": [(200, 2000), (201, 2001), (202, 2002)],
    }
    p = str(tmp_path / "j2_fact")
    spark.createDataFrame(fact, "m1 int, m2 int, d1 int, d2 int") \
        .coalesce(1).write.parquet(p)
    eng.register_table("j2_fact", p)
    _values_view(con, "j2_fact", fact, "m1, m2, d1, d2")
    for name, rs in dims.items():
        dp = str(tmp_path / name)
        spark.createDataFrame(rs, "f1 int, f2 int") \
            .coalesce(1).write.parquet(dp)
        eng.register_table(name, dp)
        _values_view(con, name, rs, "f1, f2")
    df = eng.sql(
        "SELECT m1 AS m1, m2 AS m2, j2_dim3.f2 AS g1, j2_dim4.f2 AS g2 "
        "FROM j2_fact JOIN j2_dim1 ON j2_fact.d1 = j2_dim1.f1 JOIN "
        "j2_dim2 ON j2_fact.d2 = j2_dim2.f1 JOIN j2_dim3 ON "
        "j2_dim1.f2 = j2_dim3.f1 JOIN j2_dim4 ON j2_dim2.f2 = "
        "j2_dim4.f1"
    )
    assert_matches_oracle(
        df, con,
        "SELECT m1, m2, j2_dim3.f2 AS g1, j2_dim4.f2 AS g2 FROM "
        "j2_fact JOIN j2_dim1 ON j2_fact.d1 = j2_dim1.f1 JOIN j2_dim2 "
        "ON j2_fact.d2 = j2_dim2.f1 JOIN j2_dim3 ON j2_dim1.f2 = "
        "j2_dim3.f1 JOIN j2_dim4 ON j2_dim2.f2 = j2_dim4.f1",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("BroadcastHashJoin") == 4, plan
    assert "SortMergeJoin" not in plan, plan


def test_q_join_merge_multi_expressions(qenv, spark, tmp_path):
    """join_merge_multi_expressions.q: three-way self-join on the SAME
    compound condition — Hive merges them into one join stage; the
    count must match however Spark plans it."""
    eng, con = qenv
    rows = [(str(i % 7), str(11 + i % 2)) for i in range(40)]
    p = str(tmp_path / "j2_sp")
    spark.createDataFrame(rows, "key string, hr string") \
        .coalesce(1).write.parquet(p)
    eng.register_table("j2_sp", p)
    _values_view(con, "j2_sp", rows, "key, hr")
    _chk(
        eng, con,
        "SELECT count(*) AS c FROM j2_sp a JOIN j2_sp b ON a.key = "
        "b.key AND a.hr = b.hr JOIN j2_sp c ON a.hr = c.hr AND "
        "a.key = c.key",
        "SELECT CAST(count(*) AS BIGINT) AS c FROM j2_sp a JOIN j2_sp "
        "b ON a.key = b.key AND a.hr = b.hr JOIN j2_sp c ON a.hr = "
        "c.hr AND a.key = c.key",
    )


def test_q_tez_join_hash_ambiguous_groupby_ref(qenv, spark, tmp_path):
    """tez_join_hash.q: the select list's bare `key` is ambiguous
    across join inputs (a.key, b.key) but Hive binds it to the one the
    GROUP BY references qualified (SemanticAnalyzer resolves the
    select list against the group-by row schema). The engine's
    AMBIGUOUS_REFERENCE retry qualifies it the same way."""
    eng, con = qenv
    rows = [(str(i % 11), f"val_{i % 11}") for i in range(60)]
    p = str(tmp_path / "j2_th")
    spark.createDataFrame(rows, "key string, value string") \
        .coalesce(1).write.parquet(p)
    eng.register_table("j2_th", p)
    _values_view(con, "j2_th", rows, "key, value")
    inner = (
        "(select x.key as key, y.value as value from j2_th x join "
        "j2_th y on (x.key = y.key) union all select key, value from "
        "j2_th z) a join j2_th b on (a.value = b.value) "
        "group by a.key, a.value"
    )
    _chk(
        eng, con,
        f"select key, count(*) AS n from {inner}",
        f"select a.key AS key, CAST(count(*) AS BIGINT) AS n from {inner}",
    )
