"""clientpositive `.q` slice: the groupby_sort golden family
(groupby_sort_1.q ff., groupby_sort_skew_1.q — reference:
ql/src/test/queries/clientpositive/groupby_sort_1.q, driven by
ql/.../optimizer/GroupByOptimizer.java).

Hive's point: when a table is CLUSTERED BY + SORTED BY its group-by
key, the aggregation completes map-side with NO ReduceSink. Spark's
restatement: a bucketed scan reports hashpartitioning on the bucket
column, so HashAggregate needs no Exchange — pinned below alongside
value parity for the golden's aggregation shapes (exact key match,
superset grouping, expression-of-key grouping which CANNOT reuse the
bucketing, and the DISTINCT rewrite).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

ROWS = [(str(i % 50), str(i)) for i in range(500)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    eng = Engine(spark=spark)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS gbs_t1")
    shutil.rmtree(os.path.join(wh, "gbs_t1"), ignore_errors=True)
    eng.sql(
        "CREATE TABLE gbs_t1 (key STRING, val STRING) "
        "CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS "
        "STORED AS PARQUET"
    )
    eng.sql(
        "INSERT INTO gbs_t1 VALUES "
        + ", ".join(f"('{k}', '{v}')" for k, v in ROWS)
    )
    con = duckdb.connect()
    body = ", ".join(f"('{k}', '{v}')" for k, v in ROWS)
    con.execute(
        "CREATE VIEW gbs_t1 AS SELECT * FROM (VALUES "
        + body + ") AS t(key, val)"
    )
    yield eng, con
    con.close()
    spark.sql("DROP TABLE IF EXISTS gbs_t1")


def test_q_groupby_sort_key_match(qenv):
    """groupby_sort_1.q: GROUP BY exactly the sorted bucket key."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "SELECT key, count(1) AS cnt FROM gbs_t1 GROUP BY key "
            "ORDER BY key"
        ),
        con,
        "SELECT key, CAST(count(1) AS BIGINT) AS cnt FROM gbs_t1 "
        "GROUP BY key ORDER BY key",
    )


def test_q_groupby_sort_superset(qenv):
    """groupby_sort_1.q: GROUP BY (key, val) — a superset of the sort
    key still map-side aggregates in Hive; values must match either
    way."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "SELECT key, val, count(1) AS cnt FROM gbs_t1 "
            "GROUP BY key, val ORDER BY key, val"
        ),
        con,
        "SELECT key, val, CAST(count(1) AS BIGINT) AS cnt FROM gbs_t1 "
        "GROUP BY key, val ORDER BY key, val",
    )


def test_q_groupby_sort_expr_of_key(qenv):
    """groupby_sort_1.q: GROUP BY key+key — an expression over the
    sort key does NOT qualify for the optimization (Hive inserts the
    ReduceSink; Spark inserts the Exchange); values still match."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "SELECT key + key AS k2, count(1) AS cnt FROM gbs_t1 "
            "GROUP BY key + key ORDER BY k2"
        ),
        con,
        "SELECT TRY_CAST(key AS DOUBLE) + TRY_CAST(key AS DOUBLE) AS k2, "
        "CAST(count(1) AS BIGINT) AS cnt FROM gbs_t1 "
        "GROUP BY TRY_CAST(key AS DOUBLE) + TRY_CAST(key AS DOUBLE) "
        "ORDER BY k2",
    )


def test_q_groupby_sort_distinct(qenv):
    """groupby_sort_1.q: SELECT DISTINCT key over the sorted table
    (the golden's count(distinct) sibling)."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql("SELECT DISTINCT key FROM gbs_t1 ORDER BY key"),
        con,
        "SELECT DISTINCT key FROM gbs_t1 ORDER BY key",
    )


def test_q_groupby_sort_no_exchange_plan(qenv, spark):
    """The plan property the family protects, restated for Spark: a
    GROUP BY on the bucket column of a bucketed table plans ZERO
    Exchanges (the scan's hashpartitioning satisfies the aggregate's
    requirement — GroupByOptimizer's map-side group-by). The
    expression-of-key variant must plan one."""
    eng, _ = qenv
    df = eng.sql("SELECT key, count(1) AS cnt FROM gbs_t1 GROUP BY key")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan
    assert "Bucketed: true" in plan, plan
    df2 = eng.sql(
        "SELECT key + key AS k2, count(1) AS cnt FROM gbs_t1 "
        "GROUP BY key + key"
    )
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("Exchange") == 1, plan2
