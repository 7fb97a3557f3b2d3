"""clientpositive groupby_sort_*.q replay, round 9 (reference:
ql/src/test/queries/clientpositive/groupby_sort_1_23.q,
groupby_sort_2.q … groupby_sort_6.q; optimizer
GroupByOptimizer.java — hive.map.groupby.sorted=true turns a GROUP BY
on a bucketed+sorted table's keys into a MAP-SIDE-ONLY aggregation
with no reduce phase).

Spark's equivalent: a scan of a bucketed table reports
HashPartitioning(bucket cols), which satisfies the aggregate's
ClusteredDistribution when the grouping keys contain the bucket keys —
Catalyst plans partial+final HashAggregate with ZERO Exchange, the
same no-shuffle shape Hive's map-side sorted group-by executes. At
100 TB that is the difference between an aggregation that reads and
one that reads AND reshuffles the table."""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine
from tests.conftest import assert_matches_oracle

# T1.txt fixture rows (data/files/T1.txt: 1|11, 2|12, 3|13, 7|17, 8|18,
# 8|28) — the family's canonical table
T1 = [("1", "11"), ("2", "12"), ("3", "13"),
      ("7", "17"), ("8", "18"), ("8", "28")]


def _drop(spark, *names):
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in names:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)


@pytest.fixture(scope="module")
def qenv(spark):
    eng = Engine(spark=spark)
    _drop(spark, "gbs_t1", "gbs_t2")
    # CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS
    (spark.createDataFrame(T1, "key string, val string")
        .write.bucketBy(2, "key").sortBy("key")
        .format("parquet").saveAsTable("gbs_t1"))
    # partitioned variant (groupby_sort_6.q): same layout + ds column
    (spark.createDataFrame([(k, v, "1") for k, v in T1],
                           "key string, val string, ds string")
        .write.partitionBy("ds").bucketBy(2, "key").sortBy("key")
        .format("parquet").saveAsTable("gbs_t2"))
    con = duckdb.connect()
    body = ", ".join(f"('{k}', '{v}')" for k, v in T1)
    con.execute(f"CREATE VIEW gbs_t1 AS SELECT * FROM (VALUES {body}) "
                "AS t(key, val)")
    con.execute("CREATE VIEW gbs_t2 AS SELECT key, val, '1' AS ds "
                "FROM gbs_t1")
    yield eng, con
    con.close()
    _drop(spark, "gbs_t1", "gbs_t2")


def _final_plan(df) -> str:
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


def _run(df):
    df.collect()
    return _final_plan(df)


def test_q_gbs1_group_by_bucket_key_no_exchange(qenv):
    """groupby_sort_1_23.q test 1: GROUP BY the bucket/sort key —
    map-side-only aggregation, zero shuffles."""
    eng, con = qenv
    df = eng.sql("SELECT key, count(1) as cnt FROM gbs_t1 GROUP BY key")
    plan = _run(df)
    assert "Exchange" not in plan, plan
    assert_matches_oracle(
        df, con,
        "SELECT key, CAST(COUNT(1) AS BIGINT) AS cnt FROM gbs_t1 "
        "GROUP BY key",
    )


def test_q_gbs1_group_by_key_and_val_superset(qenv):
    """groupby_sort_1_23.q test 2: GROUP BY (key, val) — the grouping
    keys CONTAIN the bucket key, so co-partitioning still holds and no
    shuffle is needed (GroupByOptimizer's sort-prefix rule)."""
    eng, con = qenv
    df = eng.sql(
        "SELECT key, val, count(1) as cnt FROM gbs_t1 GROUP BY key, val"
    )
    plan = _run(df)
    assert "Exchange" not in plan, plan
    assert_matches_oracle(
        df, con,
        "SELECT key, val, CAST(COUNT(1) AS BIGINT) AS cnt FROM gbs_t1 "
        "GROUP BY key, val",
    )


def test_q_gbs1_subquery_and_alias_forms(qenv):
    """groupby_sort_1_23.q tests 3-4: the optimization survives a
    pass-through subquery and a column RENAME in the subquery."""
    eng, con = qenv
    for sql in (
        "SELECT key, count(1) as cnt FROM "
        "(SELECT key, val FROM gbs_t1) subq1 GROUP BY key",
        "SELECT k, count(1) as cnt FROM "
        "(SELECT key as k, val as v FROM gbs_t1) subq1 GROUP BY k",
    ):
        df = eng.sql(sql)
        plan = _run(df)
        assert "Exchange" not in plan, plan
    assert_matches_oracle(
        df, con,
        "SELECT key AS k, CAST(COUNT(1) AS BIGINT) AS cnt FROM gbs_t1 "
        "GROUP BY key",
    )


def test_q_gbs2_group_by_non_bucket_col_falls_back(qenv):
    """groupby_sort_2.q: GROUP BY val (not the bucket key) — the
    map-side path does NOT apply; a real shuffle runs and values are
    still exact."""
    eng, con = qenv
    df = eng.sql("SELECT val, count(1) as cnt FROM gbs_t1 GROUP BY val")
    plan = _run(df)
    assert "Exchange" in plan, plan
    assert_matches_oracle(
        df, con,
        "SELECT val, CAST(COUNT(1) AS BIGINT) AS cnt FROM gbs_t1 "
        "GROUP BY val",
    )


def test_q_gbs3_constant_in_group_by(qenv):
    """groupby_sort_1_23.q test 5: GROUP BY 1, key — a constant in the
    grouping list doesn't break the bucket-key match."""
    eng, con = qenv
    df = eng.sql(
        "SELECT 1 as one, key, count(1) as cnt FROM gbs_t1 "
        "GROUP BY 1, key"
    )
    _run(df)
    assert_matches_oracle(
        df, con,
        "SELECT 1 AS one, key, CAST(COUNT(1) AS BIGINT) AS cnt "
        "FROM gbs_t1 GROUP BY key",
    )


def test_q_gbs6_partitioned_bucket_sorted(qenv):
    """groupby_sort_6.q: the bucketed+sorted PARTITIONED variant —
    per-partition buckets still satisfy the aggregate's distribution
    after partition pruning."""
    eng, con = qenv
    df = eng.sql(
        "SELECT key, count(1) as cnt FROM gbs_t2 WHERE ds = '1' "
        "GROUP BY key"
    )
    plan = _run(df)
    assert "Exchange" not in plan, plan
    assert_matches_oracle(
        df, con,
        "SELECT key, CAST(COUNT(1) AS BIGINT) AS cnt FROM gbs_t2 "
        "WHERE ds = '1' GROUP BY key",
    )


def test_q_gbs_distinct_on_bucket_key(qenv):
    """groupby_sort_8.q shape: DISTINCT over the bucket key — the
    dedup is an aggregate on the bucket key, again exchange-free."""
    eng, con = qenv
    df = eng.sql("SELECT DISTINCT key FROM gbs_t1")
    plan = _run(df)
    assert "Exchange" not in plan, plan
    assert_matches_oracle(df, con, "SELECT DISTINCT key FROM gbs_t1")


def test_q_gbs_agg_battery_values(qenv):
    """groupby_sort_10/11.q shapes: richer aggregates over the sorted
    bucket key (count distinct val, sum, min/max) — value parity."""
    eng, con = qenv
    df = eng.sql(
        "SELECT key, count(distinct val) as cd, sum(val) as s, "
        "min(val) as mn, max(val) as mx FROM gbs_t1 GROUP BY key"
    )
    _run(df)
    assert_matches_oracle(
        df, con,
        """
        SELECT key, CAST(COUNT(DISTINCT val) AS BIGINT) AS cd,
               SUM(CAST(val AS DOUBLE)) AS s,
               MIN(val) AS mn, MAX(val) AS mx
        FROM gbs_t1 GROUP BY key
        """,
    )
