"""clientpositive `.q` slice, round 8: the groupby_sort_2..11 tail —
GROUP BY over bucketed+SORTED tables, the surface of Hive's
SortedGroupByOptimizer / map-side GBY rewrite (reference:
ql/src/test/queries/clientpositive/groupby_sort_2.q ff.; fixture
data/files/T1.txt). In Hive these pin WHEN the sorted-table rewrite
may fire (group key == sort prefix) and when it must NOT (group on
val, sorted by key); Catalyst plans the same aggregate either way, so
the replay is value parity plus one plan property: a GROUP BY on the
BUCKET column of a bucketed table aggregates WITHOUT an exchange
(bucketing supplies the clustering — the optimization the family
exists to test, at any scale)."""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

T1 = [("1", "11"), ("2", "12"), ("3", "13"), ("7", "17"),
      ("8", "18"), ("8", "28")]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    eng = Engine(spark=spark)
    con = duckdb.connect()
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("gs_t1", "gs_t2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    # groupby_sort_2/3: CLUSTERED BY (key) SORTED BY (val) vs (key,val)
    eng.sql(
        "CREATE TABLE gs_t1 (key STRING, val STRING) CLUSTERED BY "
        "(key) SORTED BY (val) INTO 2 BUCKETS STORED AS PARQUET"
    )
    eng.sql(
        "CREATE TABLE gs_t2 (key STRING, val STRING) CLUSTERED BY "
        "(key) SORTED BY (key, val) INTO 2 BUCKETS STORED AS PARQUET"
    )
    for t in ("gs_t1", "gs_t2"):
        spark.createDataFrame(T1, "key string, val string") \
            .write.insertInto(t)
    body = ", ".join(f"('{k}', '{v}')" for k, v in T1)
    con.execute(
        f"CREATE VIEW gs_t1 AS SELECT * FROM (VALUES {body}) t(key, val)"
    )
    con.execute("CREATE VIEW gs_t2 AS SELECT * FROM gs_t1")
    yield eng, con
    con.close()
    for t in ("gs_t1", "gs_t2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _chk(eng, con, hive_sql, duck_sql=None):
    df = eng.sql(hive_sql)
    assert_matches_oracle(df, con, duck_sql or hive_sql)
    return df


def _final_plan(df):
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


def test_q_groupby_sort_2_group_on_non_sort_col(qenv):
    """groupby_sort_2.q: grouped on val while sorted by val within
    key buckets — Hive may NOT use the sorted rewrite; values exact."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT val, count(1) AS cnt FROM gs_t1 GROUP BY val "
        "ORDER BY val",
        "SELECT val, CAST(count(1) AS BIGINT) AS cnt FROM gs_t1 "
        "GROUP BY val ORDER BY val NULLS FIRST",
    )


def test_q_groupby_sort_3_group_on_sort_prefix(qenv):
    """groupby_sort_3.q: grouped on (key, val) == the sort order, and
    on key == the sort prefix."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT key, val, count(1) AS cnt FROM gs_t2 GROUP BY key, "
        "val ORDER BY key, val",
        "SELECT key, val, CAST(count(1) AS BIGINT) AS cnt FROM gs_t2 "
        "GROUP BY key, val ORDER BY key NULLS FIRST, val NULLS FIRST",
    )
    _chk(
        eng, con,
        "SELECT key, count(1) AS cnt FROM gs_t2 GROUP BY key "
        "ORDER BY key",
        "SELECT key, CAST(count(1) AS BIGINT) AS cnt FROM gs_t2 "
        "GROUP BY key ORDER BY key NULLS FIRST",
    )


def test_q_groupby_on_bucket_column_no_exchange(qenv, spark):
    """The family's scale property in Catalyst terms: GROUP BY on the
    bucket column of a bucketed table needs NO exchange before the
    aggregate — bucketing already clusters by key."""
    eng, con = qenv
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = eng.sql(
            "SELECT key, count(1) AS cnt FROM gs_t2 GROUP BY key"
        )
        plan = _final_plan(df)
        assert plan.count("Exchange") == 0, plan
        assert_matches_oracle(
            df, con,
            "SELECT key, CAST(count(1) AS BIGINT) AS cnt FROM gs_t2 "
            "GROUP BY key",
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_q_groupby_sort_8_10_distinct_over_partitions(qenv, spark,
                                                      tmp_path):
    """groupby_sort_8.q/groupby_sort_10.q: count(DISTINCT key) and
    SELECT DISTINCT over a PARTITIONED bucketed-sorted table — before
    and after a second partition lands (the rewrite must see all
    partitions, not just one)."""
    eng = Engine(spark=spark)
    con = duckdb.connect()
    p = str(tmp_path / "gs_part")
    spark.createDataFrame(
        [(k, v, "1") for k, v in T1], "key string, val string, ds string"
    ).repartition("ds").write.partitionBy("ds").parquet(p)
    eng.register_table("gs_part", p, ["ds"])
    assert eng.sql(
        "SELECT count(distinct key) AS c FROM gs_part"
    ).collect()[0].c == 5
    got = sorted(
        r.key for r in eng.sql("SELECT distinct key FROM gs_part").collect()
    )
    assert got == ["1", "2", "3", "7", "8"]
    # second partition with the same keys: distinct unchanged,
    # count(distinct) unchanged — per-partition dedup alone would be
    # wrong only if keys differed; add a new key to partition 2 to pin
    # the cross-partition merge
    eng.sql(
        "INSERT INTO TABLE gs_part PARTITION (ds='2') "
        "SELECT '9', '19'"
    )
    assert eng.sql(
        "SELECT count(distinct key) AS c FROM gs_part"
    ).collect()[0].c == 6
    got2 = sorted(
        r.key for r in eng.sql("SELECT distinct key FROM gs_part").collect()
    )
    assert got2 == ["1", "2", "3", "7", "8", "9"]
    con.close()
