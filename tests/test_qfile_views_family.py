"""clientpositive `.q` slice, round 8: cbo_views.q — view stacks,
views joined with base tables and with each other, a view DEFINED
WITH a CTE, and CTEs that reference a CTE defined AFTER them (Hive
allows forward/backward CTE references; the engine's
_reorder_forward_ctes rewrite). Reference:
ql/src/test/queries/clientpositive/cbo_views.q over the cbo_t1/t2
fixtures (q_test_init.sql)."""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

T1 = ([(" 1 ", " 1 ", 1, 1.0, True)] * 2 + [(" 1", " 1", 1, 1.0, True)] * 2 +
      [("1 ", "1 ", 1, 1.0, True)] * 2 + [("1", "1", 1, 1.0, False)] * 2 +
      [("1", "1", 1, 1.0, True)] * 10 + [(None, None, None, None, None)] * 2)
T2 = ([(" 1 ", " 1 ", 1, 1.0, True)] * 2 + [(" 1", " 1", 1, 1.0, True)] * 2 +
      [("1 ", "1 ", 1, 1.0, True)] * 2 + [("1", "1", 1, 1.0, False)] * 2 +
      [("1", "1", 1, 1.0, True)] * 5 + [("2", "2", 2, 2.0, True)] * 5 +
      [(None, None, None, None, None)] * 2)
_SCHEMA = ("key string, value string, c_int int, c_float float, "
           "c_boolean boolean")


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfile_views")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    for name, rows in (("vw_t1", T1), ("vw_t2", T2)):
        p = str(root / name)
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(p)
        eng.register_table(name, p)
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{p}/*.parquet')"
        )
    eng.sql(
        "CREATE VIEW vw_v1 AS SELECT c_int, value, c_boolean FROM vw_t1"
    )
    eng.sql("CREATE VIEW vw_v2 AS SELECT c_int, value FROM vw_t2")
    con.execute(
        "CREATE VIEW vw_v1 AS SELECT c_int, value, c_boolean FROM vw_t1"
    )
    con.execute("CREATE VIEW vw_v2 AS SELECT c_int, value FROM vw_t2")
    yield eng, con
    con.close()
    for v in ("vw_v1", "vw_v2", "vw_v3", "vw_v4"):
        try:
            eng.sql(f"DROP VIEW IF EXISTS {v}")
        except Exception:
            pass


def _chk(eng, con, hive_sql, duck_sql=None):
    assert_matches_oracle(eng.sql(hive_sql), con, duck_sql or hive_sql)


def test_q_cbo_views_selects_and_joins(qenv):
    eng, con = qenv
    _chk(eng, con,
         "SELECT value FROM vw_v1 WHERE c_boolean = false")
    _chk(
        eng, con,
        "SELECT max(c_int) AS m FROM vw_v1 GROUP BY (c_boolean)",
    )
    _chk(
        eng, con,
        "SELECT count(vw_v1.c_int) AS c FROM vw_v1 JOIN vw_t2 ON "
        "vw_v1.c_int = vw_t2.c_int",
        "SELECT CAST(count(vw_v1.c_int) AS BIGINT) AS c FROM vw_v1 "
        "JOIN vw_t2 ON vw_v1.c_int = vw_t2.c_int",
    )
    _chk(
        eng, con,
        "SELECT count(vw_v1.c_int) AS c FROM vw_v1 JOIN vw_v2 ON "
        "vw_v1.c_int = vw_v2.c_int",
        "SELECT CAST(count(vw_v1.c_int) AS BIGINT) AS c FROM vw_v1 "
        "JOIN vw_v2 ON vw_v1.c_int = vw_v2.c_int",
    )
    _chk(
        eng, con,
        "SELECT count(*) AS c FROM vw_v1 a JOIN vw_v1 b ON "
        "a.value = b.value",
        "SELECT CAST(count(*) AS BIGINT) AS c FROM vw_v1 a JOIN "
        "vw_v1 b ON a.value = b.value",
    )


def test_q_cbo_views_view_over_view_join(qenv):
    """v3 = view over a view-join; counted with a filter."""
    eng, con = qenv
    eng.sql(
        "CREATE VIEW vw_v3 AS SELECT vw_v1.value val FROM vw_v1 JOIN "
        "vw_t1 ON vw_v1.c_boolean = vw_t1.c_boolean"
    )
    con.execute(
        "CREATE VIEW vw_v3 AS SELECT vw_v1.value AS val FROM vw_v1 "
        "JOIN vw_t1 ON vw_v1.c_boolean = vw_t1.c_boolean"
    )
    _chk(
        eng, con,
        "SELECT count(val) AS c FROM vw_v3 WHERE val != '1'",
        "SELECT CAST(count(val) AS BIGINT) AS c FROM vw_v3 "
        "WHERE val != '1'",
    )


def test_q_cbo_views_ctes(qenv):
    """CTEs over views; a view DEFINED WITH a CTE; and a CTE that
    references a CTE defined AFTER it (Hive's forward-reference
    allowance — engine rewrite _reorder_forward_ctes)."""
    eng, con = qenv
    _chk(
        eng, con,
        "WITH q1 AS (SELECT key FROM vw_t1 WHERE key = '1') "
        "SELECT count(*) AS c FROM q1",
        "WITH q1 AS (SELECT key FROM vw_t1 WHERE key = '1') "
        "SELECT CAST(count(*) AS BIGINT) AS c FROM q1",
    )
    _chk(
        eng, con,
        "WITH q1 AS (SELECT value FROM vw_v1 WHERE c_boolean = false) "
        "SELECT count(value) AS c FROM q1",
        "WITH q1 AS (SELECT value FROM vw_v1 WHERE c_boolean = false) "
        "SELECT CAST(count(value) AS BIGINT) AS c FROM q1",
    )
    eng.sql(
        "CREATE VIEW vw_v4 AS WITH q1 AS (SELECT key, c_int FROM "
        "vw_t1 WHERE key = '1') SELECT * FROM q1"
    )
    con.execute(
        "CREATE VIEW vw_v4 AS WITH q1 AS (SELECT key, c_int FROM "
        "vw_t1 WHERE key = '1') SELECT * FROM q1"
    )
    _chk(eng, con, "SELECT key, c_int FROM vw_v4")
    # q1 references q2, defined AFTER it — Hive accepts, Spark needs
    # the engine's forward-CTE reorder
    _chk(
        eng, con,
        "WITH q1 AS (SELECT c_int FROM q2 WHERE c_boolean = false), "
        "q2 AS (SELECT c_int, c_boolean FROM vw_v1 WHERE value = '1') "
        "SELECT sum(c_int) AS s FROM (SELECT c_int FROM q1) a",
        "WITH q2 AS (SELECT c_int, c_boolean FROM vw_v1 WHERE value = "
        "'1'), q1 AS (SELECT c_int FROM q2 WHERE c_boolean = false) "
        "SELECT CAST(sum(c_int) AS BIGINT) AS s FROM (SELECT c_int "
        "FROM q1) a",
    )
