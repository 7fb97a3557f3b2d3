"""clientpositive CTE family replay: cte_1.q, cte_2.q, cte_4.q
(= cte_2 under materialize.threshold=1), cte_mat_2.q–cte_mat_5.q.
Materialization is a Hive EXECUTION strategy
(hive.optimize.cte.materialize.threshold spools the CTE to a temp
table; SemanticAnalyzer.toRealRootTasks) — results are identical by
construction, and Spark's WithCTE node subsumes both modes, so the
replay pins the SEMANTIC corners the family exercises: CTE through
CTAS/INSERT/views, the view-internal-CTE name collision, FROM-style
selects, self-joins of one CTE, and rollup through a FROM-first CTE.

cte_mat_1's database-qualified q1-vs-CTE-q1 collision lives in
tests/test_qfile_database_family.py.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_cte")
    src_path = str(root / "src")
    rows = [(str(i % 83), f"val_{i % 83}") for i in range(500)]
    spark.createDataFrame(rows, "key string, value string").coalesce(
        2
    ).write.parquet(src_path)
    eng = Engine(spark=spark)
    eng.register_table("src", src_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW src AS SELECT * FROM read_parquet('{src_path}/*.parquet')"
    )
    yield eng, con, str(root)
    con.close()


def test_q_cte_union_and_self_join(qenv):
    """cte_2.q union of two CTEs + cte_mat_2.q self-join of one CTE."""
    eng, con, _ = qenv
    assert_matches_oracle(
        eng.sql(
            "with q1 as (select * from src where key= '5'), "
            "q2 as (select * from src s2 where key = '4') "
            "select * from q1 union all select * from q2"
        ),
        con,
        "SELECT * FROM src WHERE key = '5' "
        "UNION ALL SELECT * FROM src WHERE key = '4'",
    )
    assert_matches_oracle(
        eng.sql(
            "with q1 as (select * from src where key= '5') "
            "select a.key from q1 a join q1 b on a.key=b.key"
        ),
        con,
        "WITH q1 AS (SELECT * FROM src WHERE key = '5') "
        "SELECT a.key FROM q1 a JOIN q1 b ON a.key = b.key",
    )


def test_q_cte_from_style_and_insert(qenv, tmp_path):
    """cte_2.q: FROM-style select over a CTE, and the FROM-first
    multi-insert whose source is a CTE."""
    eng, con, _ = qenv
    assert_matches_oracle(
        eng.sql("with q1 as (select * from src where key= '5') "
                "from q1 select *"),
        con,
        "SELECT * FROM src WHERE key = '5'",
    )
    # create table s1 like src; with q1 ... from q1 insert overwrite s1
    eng.spark.sql("DROP TABLE IF EXISTS cte_s1")
    eng.sql("create table cte_s1 like src stored as parquet")
    eng.sql(
        "with q1 as ( select key, value from src where key = '5') "
        "from q1 insert overwrite table cte_s1 select *"
    )
    assert_matches_oracle(
        eng.sql("select * from cte_s1"),
        con,
        "SELECT * FROM src WHERE key = '5'",
    )
    eng.sql("drop table cte_s1")


def test_q_cte_ctas(qenv):
    """cte_1.q/cte_2.q: CTAS whose body is a WITH query (cte9/cte10
    shape + the s2 shape)."""
    eng, con, _ = qenv
    eng.spark.sql("DROP TABLE IF EXISTS cte_s2")
    eng.sql(
        "create table cte_s2 as "
        "with q1 as ( select key from src where key = '4') "
        "select * from q1"
    )
    assert_matches_oracle(
        eng.sql("select * from cte_s2"),
        con,
        "SELECT key FROM src WHERE key = '4'",
    )
    eng.sql("drop table cte_s2")


def test_q_cte_view_name_collision(qenv):
    """cte_2.q view test: a view whose BODY has an internal CTE q1
    keeps using it even when the CALLING statement defines a different
    CTE with the same name (Hive expands the view text in its own
    scope — SemanticAnalyzer view expansion)."""
    eng, con, _ = qenv
    eng.sql("drop view if exists cte_v1")
    eng.sql(
        "create view cte_v1 as "
        "with q1 as ( select key from src where key = '5') "
        "select * from q1"
    )
    # plain read
    assert_matches_oracle(
        eng.sql("select * from cte_v1"),
        con,
        "SELECT key FROM src WHERE key = '5'",
    )
    # collision: outer q1 selects '4' but the view's q1 must win
    assert_matches_oracle(
        eng.sql(
            "with q1 as ( select key from src where key = '4') "
            "select * from cte_v1"
        ),
        con,
        "SELECT key FROM src WHERE key = '5'",
    )
    eng.sql("drop view cte_v1")


def test_q_cte_from_first_rollup(qenv):
    """cte_1.q: FROM-first select over a CTE with WITH ROLLUP and the
    standard rollup syntax — both spellings, same groups."""
    eng, con, _ = qenv
    oracle = (
        "SELECT key, CAST(count(*) AS BIGINT) AS n FROM src "
        "WHERE CAST(key AS DOUBLE) < 5 GROUP BY ROLLUP (key)"
    )
    assert_matches_oracle(
        eng.sql(
            "with q1 as (select * from src where key < 5) "
            "from q1 select key, count(*) AS n group by key with rollup"
        ),
        con,
        oracle,
    )
    assert_matches_oracle(
        eng.sql(
            "with q1 as (select * from src where key < 5) "
            "from q1 select key, count(*) AS n group by rollup (key)"
        ),
        con,
        oracle,
    )


def test_q_cte_subquery_in_predicate(qenv):
    """cte_1.q: a CTE referenced from an IN subquery in the outer
    WHERE."""
    eng, con, _ = qenv
    assert_matches_oracle(
        eng.sql(
            "with q1 as (select * from src where key > 60) "
            "select s1.key, s1.value from src s1 where key > 3 "
            "and s1.value in (select q1.value from q1 where key > 70)"
        ),
        con,
        "SELECT s1.key, s1.value FROM src s1 "
        "WHERE CAST(s1.key AS DOUBLE) > 3 AND s1.value IN "
        "(SELECT value FROM src WHERE CAST(key AS DOUBLE) > 70)",
    )
