"""clientpositive `.q` slice, round 6f: limit_pushdown.q — Hive's
TopNHash/LimitPushdownOptimizer shapes (reference:
ql/src/test/queries/clientpositive/limit_pushdown.q,
optimizer/LimitPushdownOptimizer.java). Each shape is value-diffed
against DuckDB AND, for the order+limit head, the plan is pinned to
TakeOrderedAndProject — Catalyst's TopNHash twin (no full sort, no
full shuffle of the unlimited result)."""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine
from hive_2_3_2_spark.plans.explain import explain_str

from tests.conftest import assert_matches_oracle

SRC = [(str(i % 83), f"val_{i % 83}") for i in range(500)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_lp")
    eng = Engine(spark=spark)
    p = str(root / "src")
    spark.createDataFrame(SRC, "key string, value string").coalesce(
        2
    ).write.parquet(p)
    eng.register_table("src", p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW src AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield eng, con
    con.close()


def test_q_limit_pushdown_order_topn(qenv):
    """order by key limit 20 asc/desc — TakeOrderedAndProject in the
    plan (per-partition top-N, single-reduce merge: Hive's TopNHash)."""
    eng, con = qenv
    for d in ("", " desc"):
        got = eng.sql(
            f"select key, value from src order by key{d}, value limit 20"
        )
        assert_matches_oracle(
            got, con,
            f"SELECT key, value FROM src ORDER BY key{d}, value LIMIT 20",
        )
        assert "TakeOrderedAndProject" in explain_str(got)


def test_q_limit_pushdown_after_groupby(qenv):
    """group by + order by + limit: the limit rides above the
    aggregation; sum(key+1) coerces string keys to double."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "select value, round(sum(key + 1), 2) as s from src "
            "group by value order by value limit 20"
        ),
        con,
        "SELECT value, ROUND(SUM(CAST(key AS DOUBLE) + 1), 2) AS s "
        "FROM src GROUP BY value ORDER BY value LIMIT 20",
    )
    assert_matches_oracle(
        eng.sql(
            "select value, round(avg(key + 1), 4) as a from src "
            "group by value order by value limit 20"
        ),
        con,
        "SELECT value, ROUND(AVG(CAST(key AS DOUBLE) + 1), 4) AS a "
        "FROM src GROUP BY value ORDER BY value LIMIT 20",
    )


def test_q_limit_pushdown_distinct_and_multi_distinct(qenv):
    """distinct + limit, count(distinct) + limit, and TWO distinct
    aggregates in one group-by with limit."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "select distinct(key) as dis from src order by dis limit 20"
        ),
        con,
        "SELECT DISTINCT key AS dis FROM src ORDER BY dis LIMIT 20",
    )
    assert_matches_oracle(
        eng.sql(
            "select value, count(distinct(key)) AS n from src "
            "group by value order by value limit 20"
        ),
        con,
        "SELECT value, CAST(COUNT(DISTINCT key) AS BIGINT) AS n "
        "FROM src GROUP BY value ORDER BY value LIMIT 20",
    )
    assert_matches_oracle(
        eng.sql(
            "select value, count(distinct(key)) AS n1, "
            "count(distinct(substr(key, 1, 1))) AS n2 from src "
            "group by value order by value limit 20"
        ),
        con,
        "SELECT value, CAST(COUNT(DISTINCT key) AS BIGINT) AS n1, "
        "CAST(COUNT(DISTINCT SUBSTR(key, 1, 1)) AS BIGINT) AS n2 "
        "FROM src GROUP BY value ORDER BY value LIMIT 20",
    )


def test_q_limit_zero_and_order_by_aggregate_alias(qenv):
    """limit 0 (empty, schema intact) and ORDER BY an aggregate's
    SELECT alias."""
    eng, con = qenv
    empty = eng.sql("select key, value from src order by key limit 0")
    assert empty.count() == 0 and empty.columns == ["key", "value"]
    assert_matches_oracle(
        eng.sql(
            "select value, round(sum(key), 2) as s from src "
            "group by value order by s, value limit 20"
        ),
        con,
        "SELECT value, ROUND(SUM(CAST(key AS DOUBLE)), 2) AS s "
        "FROM src GROUP BY value ORDER BY s, value LIMIT 20",
    )


def test_q_limited_subqueries_joined(qenv):
    """limit_pushdown.q's join of two LIMITed aggregate subqueries —
    one ordered (deterministic top-2) joined to the other side filtered
    to the same keys (the golden's unordered limit 3 subquery is
    nondeterministic on a multi-partition engine, so the replay pins
    the deterministic half: ordered-limit subquery joined against the
    full aggregate, outer limit applied on a total order)."""
    eng, con = qenv
    got = eng.sql(
        """
        select subq.key AS k, subq.n AS n1, subq2.n AS n2 from
        (select key, count(1) AS n from src group by key
         order by key limit 2) subq
        join
        (select key, count(1) AS n from src group by key) subq2
        on subq.key = subq2.key
        order by k limit 4
        """
    )
    assert_matches_oracle(
        got, con,
        """
        SELECT subq.key AS k, subq.n AS n1, subq2.n AS n2 FROM
        (SELECT key, CAST(count(1) AS BIGINT) AS n FROM src
         GROUP BY key ORDER BY key LIMIT 2) subq
        JOIN
        (SELECT key, CAST(count(1) AS BIGINT) AS n FROM src
         GROUP BY key) subq2
        ON subq.key = subq2.key
        ORDER BY k LIMIT 4
        """,
    )
