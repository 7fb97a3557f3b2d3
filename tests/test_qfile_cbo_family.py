"""clientpositive `.q` slice, round 8: the cbo_* golden family — the
Calcite-path shapes (reference:
ql/src/test/queries/clientpositive/cbo_simple_select.q, cbo_join.q,
cbo_gby.q, cbo_subq_in.q, cbo_subq_not_in.q, cbo_subq_exists.q,
cbo_semijoin.q, cbo_windowing.q, cbo_union.q, cbo_limit.q; table
fixtures from data/scripts/q_test_init.sql:260-326 — cbo_t1/t2/t3 are
20-row tables whose keys deliberately include leading/trailing-space
variants (' 1 ', ' 1', '1 ', '1') plus NULL rows, so equality joins
must be byte-exact, not trimmed).

In Hive these files re-exercise the whole relational core through
Calcite's planner (hive.cbo.enable=true); in this engine the
equivalent optimizer is Catalyst, so the value of the replay is the
SQL SHAPES — deeply aliased subqueries, filters split across
subquery/outer levels, semi joins chained into outer joins, windowing
batteries, nested unions — value-diffed against DuckDB over the same
rows. Pure-LIMIT-without-ORDER shapes assert row COUNTS (any 5-of-20
subset is a correct answer; the golden's own choice is an
implementation accident).
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

# data/files/cbo_t1/t2/t3.txt multiplicities (q_test_init.sql loads)
_SP = [(" 1 ", " 1 "), (" 1", " 1"), ("1 ", "1 ")]


def _rows(spec):
    out = []
    for (k, v, ci, cf, cb), n in spec:
        out += [(k, v, ci, cf, cb)] * n
    return out


T1 = _rows([
    ((" 1 ", " 1 ", 1, 1.0, True), 2),
    ((" 1", " 1", 1, 1.0, True), 2),
    (("1 ", "1 ", 1, 1.0, True), 2),
    (("1", "1", 1, 1.0, False), 2),
    (("1", "1", 1, 1.0, True), 10),
    ((None, None, None, None, None), 2),
])
T2 = _rows([
    ((" 1 ", " 1 ", 1, 1.0, True), 2),
    ((" 1", " 1", 1, 1.0, True), 2),
    (("1 ", "1 ", 1, 1.0, True), 2),
    (("1", "1", 1, 1.0, False), 2),
    (("1", "1", 1, 1.0, True), 5),
    (("2", "2", 2, 2.0, True), 5),
    ((None, None, None, None, None), 2),
])
T3 = _rows([
    ((" 1 ", " 1 ", 1, 1.0, True), 2),
    ((" 1", " 1", 1, 1.0, True), 2),
    (("1 ", "1 ", 1, 1.0, True), 2),
    (("1", "1", 1, 1.0, False), 2),
    (("1", "1", 1, 1.0, True), 4),
    (("2", "2", 2, 2.0, True), 3),
    (("3", "3", 3, 3.0, True), 3),
    ((None, None, None, None, None), 2),
])
SRC_CBO = [(str(i % 83), f"val_{i % 83}") for i in range(500)]
_SCHEMA = "key string, value string, c_int int, c_float float, c_boolean boolean"


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfile_cbo")
    eng = Engine(spark=spark)
    for name, rows in (("cbo_t1", T1), ("cbo_t2", T2), ("cbo_t3", T3)):
        p = str(root / name)
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(p)
        eng.register_table(name, p)
    p = str(root / "src_cbo")
    spark.createDataFrame(SRC_CBO, "key string, value string") \
        .coalesce(1).write.parquet(p)
    eng.register_table("src_cbo", p)
    con = duckdb.connect()
    for name in ("cbo_t1", "cbo_t2", "cbo_t3", "src_cbo"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{root}/{name}/*.parquet')"
        )
    yield eng, con
    con.close()


def _chk(eng, con, hive_sql, duck_sql=None):
    assert_matches_oracle(eng.sql(hive_sql), con, duck_sql or hive_sql)


def test_q_cbo_simple_select(qenv):
    """cbo_simple_select.q: projections/filters through nested aliased
    subqueries — the filter text repeats at subquery and outer level."""
    eng, con = qenv
    _chk(eng, con,
         "SELECT key, value, c_int, c_float, c_boolean FROM cbo_t1")
    _chk(
        eng, con,
        "SELECT cbo_t1.key AS x, c_int AS c_int, "
        "round((((c_int+c_float)*10)+5), 2) AS y FROM cbo_t1",
        "SELECT key AS x, c_int, "
        "round((((c_int+CAST(c_float AS DOUBLE))*10)+5), 2) AS y "
        "FROM cbo_t1",
    )
    _chk(
        eng, con,
        "SELECT x, c_int, y FROM (SELECT cbo_t2.key AS x, c_int AS "
        "c_int, round((((c_int+c_float)*10)+5), 2) AS y FROM cbo_t1 AS "
        "cbo_t2 WHERE cbo_t2.c_int >= 0 AND c_float+c_int >= 0 OR "
        "c_float <= 100) AS cbo_t1 "
        "WHERE cbo_t1.c_int >= 0 AND y+c_int >= 0 OR x <= '100'",
        "SELECT x, c_int, y FROM (SELECT key AS x, c_int, "
        "round((((c_int+CAST(c_float AS DOUBLE))*10)+5), 2) AS y "
        "FROM cbo_t1 WHERE c_int >= 0 AND "
        "CAST(c_float AS DOUBLE)+c_int >= 0 OR c_float <= 100) t "
        "WHERE c_int >= 0 AND y+c_int >= 0 OR x <= '100'",
    )


def test_q_cbo_join_core(qenv):
    """cbo_join.q head: the four join types on the space-variant keys
    plus the cross join (`join` with no ON — Hive nonstrict mode) and
    a three-way join through aliased subqueries."""
    eng, con = qenv
    for jt in ("JOIN", "LEFT OUTER JOIN", "RIGHT OUTER JOIN",
               "FULL OUTER JOIN"):
        _chk(
            eng, con,
            f"SELECT cbo_t1.c_int AS a, cbo_t2.c_int AS b FROM cbo_t1 "
            f"{jt} cbo_t2 ON cbo_t1.key = cbo_t2.key",
        )
    _chk(
        eng, con,
        "SELECT cbo_t1.key AS k FROM cbo_t1 JOIN cbo_t3",
        "SELECT cbo_t1.key AS k FROM cbo_t1 CROSS JOIN cbo_t3",
    )
    _chk(
        eng, con,
        "SELECT b, cbo_t1.c, cbo_t2.p, q, cbo_t3.c_int FROM "
        "(SELECT key AS a, c_int AS b, cbo_t1.c_float AS c FROM cbo_t1) "
        "cbo_t1 JOIN (SELECT cbo_t2.key AS p, cbo_t2.c_int AS q, "
        "c_float AS r FROM cbo_t2) cbo_t2 ON cbo_t1.a=p "
        "JOIN cbo_t3 ON cbo_t1.a=key",
        "SELECT b, t1.c, t2.p, q, cbo_t3.c_int FROM "
        "(SELECT key AS a, c_int AS b, c_float AS c FROM cbo_t1) t1 "
        "JOIN (SELECT key AS p, c_int AS q, c_float AS r FROM cbo_t2) "
        "t2 ON t1.a=p JOIN cbo_t3 ON t1.a=cbo_t3.key",
    )


def test_q_cbo_gby(qenv):
    """cbo_gby.q head: group by MORE columns than projected (c_float
    grouped but not selected) and re-aggregation of an aggregate."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT key, (c_int+1)+2 AS x, sum(c_int) AS s FROM cbo_t1 "
        "GROUP BY c_float, cbo_t1.c_int, key",
        "SELECT key, (c_int+1)+2 AS x, CAST(sum(c_int) AS BIGINT) AS s "
        "FROM cbo_t1 GROUP BY c_float, c_int, key",
    )
    _chk(
        eng, con,
        "SELECT x, y, count(*) AS n FROM (SELECT key, "
        "round((c_int+c_float+1+2), 2) AS x, sum(c_int) AS y FROM "
        "cbo_t1 GROUP BY c_float, cbo_t1.c_int, key) R GROUP BY y, x",
        "SELECT x, y, CAST(count(*) AS BIGINT) AS n FROM (SELECT key, "
        "round((c_int+CAST(c_float AS DOUBLE)+1+2), 2) AS x, "
        "CAST(sum(c_int) AS BIGINT) AS y FROM cbo_t1 "
        "GROUP BY c_float, c_int, key) R GROUP BY y, x",
    )


def test_q_cbo_subq_in(qenv):
    """cbo_subq_in.q: uncorrelated IN, correlated DISTINCT IN, and IN
    correlated through an extra equality in the subquery."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT key, value FROM src_cbo WHERE src_cbo.key IN "
        "(SELECT key FROM src_cbo s1 WHERE s1.key > '9')",
    )
    _chk(
        eng, con,
        "SELECT b.key, b.value FROM src_cbo b WHERE b.key IN "
        "(SELECT DISTINCT a.key FROM src_cbo a WHERE b.value = a.value "
        "AND a.key > '9')",
    )


def test_q_cbo_subq_not_in(qenv):
    """cbo_subq_not_in.q: NOT IN with the NULL-gate semantics —
    uncorrelated, correlated through a second column, and against a
    scalar aggregate subquery."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT key, value FROM src_cbo WHERE src_cbo.key NOT IN "
        "(SELECT key FROM src_cbo s1 WHERE s1.key > '2')",
    )
    _chk(
        eng, con,
        "SELECT b.key, b.c_int FROM cbo_t1 b WHERE b.key NOT IN "
        "(SELECT a.key FROM cbo_t2 a WHERE a.c_int < 2 "
        "AND b.value = a.value)",
    )
    _chk(
        eng, con,
        "SELECT key, c_int FROM cbo_t3 WHERE cbo_t3.c_int NOT IN "
        "(SELECT avg(c_int) FROM cbo_t2 WHERE c_int < 2)",
        "SELECT key, c_int FROM cbo_t3 WHERE c_int NOT IN "
        "(SELECT CAST(avg(c_int) AS DOUBLE) FROM cbo_t2 WHERE c_int < 2)",
    )


def test_q_cbo_subq_exists(qenv):
    """cbo_subq_exists.q: NOT EXISTS in WHERE and in HAVING over a
    grouped outer query."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT key, value FROM src_cbo b WHERE NOT EXISTS "
        "(SELECT DISTINCT a.key FROM src_cbo a WHERE b.value = a.value "
        "AND a.value > 'val_2')",
    )
    _chk(
        eng, con,
        "SELECT key, value FROM src_cbo b GROUP BY key, value "
        "HAVING NOT EXISTS (SELECT a.key FROM src_cbo a WHERE "
        "b.value = a.value AND a.key = b.key AND a.value > 'val_12')",
    )


def test_q_cbo_semijoin(qenv):
    """cbo_semijoin.q: Hive's LEFT SEMI JOIN syntax, plain and chained
    into an outer join of a third table."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT cbo_t1.c_int AS ci FROM cbo_t1 LEFT SEMI JOIN cbo_t2 "
        "ON cbo_t1.key = cbo_t2.key",
        "SELECT c_int AS ci FROM cbo_t1 WHERE EXISTS "
        "(SELECT 1 FROM cbo_t2 WHERE cbo_t1.key = cbo_t2.key)",
    )
    _chk(
        eng, con,
        "SELECT cbo_t1.c_int AS ci FROM cbo_t1 LEFT SEMI JOIN cbo_t2 "
        "ON cbo_t1.key = cbo_t2.key WHERE (cbo_t1.c_int + 1 == 2) AND "
        "(cbo_t1.c_int > 0 OR cbo_t1.c_float >= 0)",
        "SELECT c_int AS ci FROM cbo_t1 WHERE EXISTS "
        "(SELECT 1 FROM cbo_t2 WHERE cbo_t1.key = cbo_t2.key) "
        "AND (c_int + 1 = 2) AND (c_int > 0 OR c_float >= 0)",
    )
    _chk(
        eng, con,
        "SELECT c_int AS ci, b, cbo_t1.c FROM (SELECT key AS a, c_int "
        "AS b, cbo_t1.c_float AS c FROM cbo_t1 WHERE (cbo_t1.c_int + 1 "
        "== 2) AND (cbo_t1.c_int > 0 OR cbo_t1.c_float >= 0)) cbo_t1 "
        "LEFT SEMI JOIN (SELECT cbo_t2.key AS p, cbo_t2.c_int AS q, "
        "c_float AS r FROM cbo_t2 WHERE (cbo_t2.c_int + 1 == 2) AND "
        "(cbo_t2.c_int > 0 OR cbo_t2.c_float >= 0)) cbo_t2 ON "
        "cbo_t1.a=p RIGHT OUTER JOIN cbo_t3 ON cbo_t1.a=key "
        "WHERE (b + 1 == 2) AND (b > 0 OR c_int >= 0)",
        "SELECT cbo_t3.c_int AS ci, t1.b, t1.c FROM (SELECT key AS a, "
        "c_int AS b, c_float AS c FROM cbo_t1 WHERE (c_int + 1 = 2) "
        "AND (c_int > 0 OR c_float >= 0) AND EXISTS (SELECT 1 FROM "
        "cbo_t2 WHERE cbo_t2.key = cbo_t1.key AND (cbo_t2.c_int + 1 = "
        "2) AND (cbo_t2.c_int > 0 OR cbo_t2.c_float >= 0))) t1 "
        "RIGHT OUTER JOIN cbo_t3 ON t1.a = cbo_t3.key "
        "WHERE (t1.b + 1 = 2) AND (t1.b > 0 OR cbo_t3.c_int >= 0)",
    )


def test_q_cbo_windowing(qenv):
    """cbo_windowing.q: the ranking + framed-aggregate battery over
    the space-variant keys, and aggregate-of-aggregate over a window
    (sum(c_int)+sum(sum(c_int)) over())."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT count(c_int) OVER() AS n FROM cbo_t1",
        "SELECT CAST(count(c_int) OVER() AS BIGINT) AS n FROM cbo_t1",
    )
    _chk(
        eng, con,
        "SELECT count(c_int) OVER(PARTITION BY c_float ORDER BY key) "
        "AS a, round(sum(c_float) OVER(PARTITION BY c_float ORDER BY "
        "key), 2) AS b, max(c_int) OVER(PARTITION BY c_float ORDER BY "
        "key) AS c, min(c_int) OVER(PARTITION BY c_float ORDER BY key) "
        "AS d, row_number() OVER(PARTITION BY c_float ORDER BY key) AS "
        "rn, rank() OVER(PARTITION BY c_float ORDER BY key) AS rk, "
        "dense_rank() OVER(PARTITION BY c_float ORDER BY key) AS dr, "
        "round(percent_rank() OVER(PARTITION BY c_float ORDER BY key), "
        "2) AS pr FROM cbo_t1",
        "SELECT CAST(count(c_int) OVER(PARTITION BY c_float ORDER BY "
        "key NULLS FIRST) AS BIGINT) AS a, round(CAST(sum(c_float) "
        "OVER(PARTITION BY c_float ORDER BY key NULLS FIRST) AS "
        "DOUBLE), 2) AS b, max(c_int) OVER(PARTITION BY c_float ORDER "
        "BY key NULLS FIRST) AS c, min(c_int) OVER(PARTITION BY "
        "c_float ORDER BY key NULLS FIRST) AS d, CAST(row_number() "
        "OVER(PARTITION BY c_float ORDER BY key NULLS FIRST) AS "
        "BIGINT) AS rn, CAST(rank() OVER(PARTITION BY c_float ORDER "
        "BY key NULLS FIRST) AS BIGINT) AS rk, CAST(dense_rank() "
        "OVER(PARTITION BY c_float ORDER BY key NULLS FIRST) AS "
        "BIGINT) AS dr, round(percent_rank() OVER(PARTITION BY c_float "
        "ORDER BY key NULLS FIRST), 2) AS pr FROM cbo_t1",
    )
    _chk(
        eng, con,
        "SELECT sum(c_int)+sum(sum(c_int)) OVER() AS s FROM cbo_t1",
        "SELECT CAST(sum(c_int)+sum(sum(c_int)) OVER() AS BIGINT) AS s "
        "FROM cbo_t1",
    )


def test_q_cbo_union(qenv):
    """cbo_union.q: nested UNION ALL pyramids, one side filtered, and
    a self-join of two unions."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT key FROM (SELECT key, c_int FROM (SELECT key, c_int "
        "FROM cbo_t1 UNION ALL SELECT key, c_int FROM cbo_t2 WHERE "
        "cbo_t2.key >= '0') r1 UNION ALL SELECT key, c_int FROM "
        "cbo_t3) r2 WHERE key >= '0'",
    )
    _chk(
        eng, con,
        "SELECT r2.key FROM (SELECT key, c_int FROM (SELECT key, c_int "
        "FROM cbo_t1 UNION ALL SELECT key, c_int FROM cbo_t3) r1 "
        "UNION ALL SELECT key, c_int FROM cbo_t3) r2 JOIN (SELECT key, "
        "c_int FROM (SELECT key, c_int FROM cbo_t1 UNION ALL SELECT "
        "key, c_int FROM cbo_t2 WHERE cbo_t2.key >= '0') r1 UNION ALL "
        "SELECT key, c_int FROM cbo_t3) r3 ON r2.key=r3.key "
        "WHERE r3.key >= '0'",
    )


def test_q_cbo_limit(qenv):
    """cbo_limit.q: ordered limit over grouped output; nested
    unordered limits assert COUNT (any 5-row subset is correct)."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT key, (c_int+1)+2 AS x, sum(c_int) AS s FROM cbo_t1 "
        "GROUP BY c_float, cbo_t1.c_int, key ORDER BY x LIMIT 1",
        "SELECT key, (c_int+1)+2 AS x, CAST(sum(c_int) AS BIGINT) AS s "
        "FROM cbo_t1 GROUP BY c_float, c_int, key "
        "ORDER BY x NULLS FIRST LIMIT 1",
    )
    n = eng.sql(
        "SELECT key FROM (SELECT key FROM (SELECT key FROM cbo_t1 "
        "LIMIT 5) cbo_t2 LIMIT 5) cbo_t3 LIMIT 5"
    ).count()
    assert n == 5
