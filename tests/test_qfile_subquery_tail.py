"""clientpositive subquery tail: subquery_select.q (subqueries in the
SELECT LIST — scalar, correlated scalar, IN-as-projection),
subquery_nested_subquery.q (IN whose body itself carries a correlated
EXISTS), subquery_shared_alias.q (the inner query reuses the OUTER
table's name), subquery_null_agg.q (aggregate-of-NULL through a
window into arithmetic).

Uses the shared TPC-H part fixture at SF_DIR (driver-parity oracle via
the conftest DuckDB views).
"""

from __future__ import annotations

import os

import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.fixture(scope="module")
def qenv(spark, oracle):
    eng = Engine(spark=spark, sf_dir=SF_DIR)
    yield eng, oracle


def test_q_subquery_select_scalar_and_in(qenv):
    """subquery_select.q: an uncorrelated scalar subquery, a
    CORRELATED scalar subquery, and an IN predicate — all projected in
    the SELECT list."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "SELECT p_partkey, p_size, "
            "(SELECT MAX(p_size) FROM part) AS mx, "
            "p_size IN (SELECT MAX(p_size) FROM part) AS is_max "
            "FROM part"
        ),
        con,
        "SELECT p_partkey, p_size, (SELECT MAX(p_size) FROM part) AS "
        "mx, p_size IN (SELECT MAX(p_size) FROM part) AS is_max "
        "FROM part",
    )
    assert_matches_oracle(
        eng.sql(
            "SELECT p_partkey, p_size, (SELECT MAX(p.p_size) FROM "
            "part p WHERE p.p_brand = part.p_brand) AS brand_max "
            "FROM part"
        ),
        con,
        "SELECT p_partkey, p_size, (SELECT MAX(p.p_size) FROM part p "
        "WHERE p.p_brand = part.p_brand) AS brand_max FROM part",
    )


def test_q_subquery_nested_in_exists(qenv):
    """subquery_nested_subquery.q: IN whose subquery body contains a
    correlated EXISTS over a third scan."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "select x.p_partkey, x.p_name from part x where x.p_name "
            "in (select y.p_name from part y where exists (select "
            "z.p_name from part z where y.p_name = z.p_name))"
        ),
        con,
        "SELECT x.p_partkey, x.p_name FROM part x WHERE x.p_name IN "
        "(SELECT y.p_name FROM part y WHERE EXISTS (SELECT z.p_name "
        "FROM part z WHERE y.p_name = z.p_name))",
    )


def test_q_subquery_shared_alias(qenv):
    """subquery_shared_alias.q: the inner query references the SAME
    table name as the outer — each scope binds its own scan."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "select p_partkey, p_size from part where part.p_size in "
            "(select p_size from part where p_size > 40)"
        ),
        con,
        "SELECT p_partkey, p_size FROM part WHERE p_size IN "
        "(SELECT p_size FROM part WHERE p_size > 40)",
    )


def test_q_subquery_null_agg_window(qenv):
    """subquery_null_agg.q: MIN(NULL) OVER () is NULL; NULL * NULL
    stays NULL through the projecting subquery."""
    eng, _ = qenv
    rows = eng.sql(
        "SELECT (t1.int_col) * (t1.int_col) AS int_col FROM (SELECT "
        "MIN(NULL) OVER () AS int_col FROM part) t1 LIMIT 5"
    ).collect()
    assert rows and all(r.int_col is None for r in rows)


def test_q_subquery_multiinsert(qenv, spark, tmp_path):
    """subquery_multiinsert.q: FROM-first multi-insert whose branches
    carry a CORRELATED IN and a NOT IN subquery (+ per-branch ORDER
    BY)."""
    eng, con = qenv
    p = str(tmp_path / "sq_src")
    rows = [(str(i % 13), f"val_{i % 13}") for i in range(60)]
    spark.createDataFrame(rows, "key string, value string").coalesce(
        1
    ).write.parquet(p)
    eng.register_table("sq_src", p)
    body = ", ".join(f"('{k}', '{v}')" for k, v in rows)
    con.execute(
        "CREATE OR REPLACE VIEW sq_src AS SELECT * FROM (VALUES "
        + body + ") t(key, value)"
    )
    for t in ("sq_4", "sq_5"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        eng.sql(
            f"CREATE TABLE {t} (key STRING, value STRING) "
            "STORED AS PARQUET"
        )
    eng.sql(
        "from sq_src b "
        "INSERT OVERWRITE TABLE sq_4 select * where b.key in "
        "(select a.key from sq_src a where b.value = a.value and "
        "a.key > '9') "
        "INSERT OVERWRITE TABLE sq_5 select * where b.key not in "
        "(select key from sq_src s1 where s1.key > '2') order by key"
    )
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM sq_4"),
        con,
        "SELECT key, value FROM sq_src b WHERE b.key IN (SELECT a.key "
        "FROM sq_src a WHERE b.value = a.value AND a.key > '9')",
    )
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM sq_5"),
        con,
        "SELECT key, value FROM sq_src WHERE key NOT IN "
        "(SELECT key FROM sq_src WHERE key > '2')",
    )
    for t in ("sq_4", "sq_5"):
        eng.sql(f"DROP TABLE {t}")
