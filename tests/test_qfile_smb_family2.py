"""clientpositive `.q` slice, round 8: the smb_mapjoin tail —
smb_mapjoin_13.q/14.q/18.q/25.q (reference:
ql/src/test/queries/clientpositive/). Corners beyond the smb 1-5
replay: bucket/sort COLUMN ORDER variants (clustered (key,value)
sorted (key,value) vs sorted (value,key) — same buckets, different
order → Spark adds a Sort, never an Exchange, when the bucket sets
match), subquery-wrapped SMB joins with filters above/below the
subquery boundary, and a join-of-joins where both inputs are
themselves SMB joins."""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(i % 83, f"val_{i % 83}") for i in range(500)]
B1 = [(1, "val_1"), (3, "val_3"), (4, "val_4"), (5, "val_5"),
      (10, "val_10")]
B2 = [(20, "val_20"), (23, "val_23"), (25, "val_25"), (30, "val_30"),
      (5, "val_5")]
B3 = [(4, "val_4"), (5, "val_5"), (10, "val_10"), (17, "val_17"),
      (20, "val_20"), (23, "val_23")]

_TBLS = ("smb2_t1", "smb2_t2", "smb2_kv", "smb2_vk",
         "smb2_b1", "smb2_b2", "smb2_b3")


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    eng = Engine(spark=spark)
    con = duckdb.connect()
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in _TBLS:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    # smb_mapjoin_14 fixtures: 2-bucket sorted, keys < 10
    for t in ("smb2_t1", "smb2_t2"):
        eng.sql(
            f"CREATE TABLE {t} (key INT, value STRING) CLUSTERED BY "
            "(key) SORTED BY (key) INTO 2 BUCKETS STORED AS PARQUET"
        )
        spark.createDataFrame(
            [r for r in SRC if r[0] < 10], "key int, value string"
        ).write.insertInto(t)
    # smb_mapjoin_13 fixtures: same compound bucket cols, DIFFERENT
    # sort orders
    eng.sql(
        "CREATE TABLE smb2_kv (key INT, value STRING) CLUSTERED BY "
        "(key, value) SORTED BY (key, value) INTO 4 BUCKETS "
        "STORED AS PARQUET"
    )
    eng.sql(
        "CREATE TABLE smb2_vk (key INT, value STRING) CLUSTERED BY "
        "(key, value) SORTED BY (value, key) INTO 4 BUCKETS "
        "STORED AS PARQUET"
    )
    for t in ("smb2_kv", "smb2_vk"):
        spark.createDataFrame(SRC, "key int, value string") \
            .write.insertInto(t)
    # smb_mapjoin_25 fixtures: 1-bucket minis
    for t, rows in (("smb2_b1", B1), ("smb2_b2", B2), ("smb2_b3", B3)):
        eng.sql(
            f"CREATE TABLE {t} (key INT, value STRING) CLUSTERED BY "
            "(key) SORTED BY (key) INTO 1 BUCKETS STORED AS PARQUET"
        )
        spark.createDataFrame(rows, "key int, value string") \
            .write.insertInto(t)
    lt10 = [r for r in SRC if r[0] < 10]

    def vv(name, rows):
        body = ", ".join(f"({k}, '{v}')" for k, v in rows)
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM (VALUES {body}) "
            "t(key, value)"
        )

    vv("smb2_t1", lt10)
    vv("smb2_t2", lt10)
    vv("smb2_kv", SRC)
    vv("smb2_vk", SRC)
    vv("smb2_b1", B1)
    vv("smb2_b2", B2)
    vv("smb2_b3", B3)
    yield eng, con
    con.close()
    for t in _TBLS:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _chk(eng, con, hive_sql, duck_sql=None):
    df = eng.sql(hive_sql)
    assert_matches_oracle(df, con, duck_sql or hive_sql)
    return df


def _final_plan(df):
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


def test_q_smb13_different_sort_orders_no_exchange(qenv, spark):
    """smb_mapjoin_13.q: both tables bucketed on (key, value) but
    sorted (key,value) vs (value,key) — the join on BOTH columns is
    exchange-free (bucket sets match); Spark re-sorts one side instead
    of shuffling. A join on key ALONE must shuffle (bucketing is on
    the pair, not the prefix)."""
    eng, con = qenv
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _chk(
            eng, con,
            "SELECT count(*) AS c FROM smb2_kv a JOIN smb2_vk b ON "
            "a.key = b.key AND a.value = b.value",
            "SELECT CAST(count(*) AS BIGINT) AS c FROM smb2_kv a JOIN "
            "smb2_vk b ON a.key = b.key AND a.value = b.value",
        )
        plan = _final_plan(df)
        assert plan.count("Exchange") <= 1, plan  # count gather only
        assert "SortMergeJoin" in plan, plan
        df2 = _chk(
            eng, con,
            "SELECT count(*) AS c FROM smb2_kv a JOIN smb2_vk b ON "
            "a.key = b.key",
            "SELECT CAST(count(*) AS BIGINT) AS c FROM smb2_kv a JOIN "
            "smb2_vk b ON a.key = b.key",
        )
        assert _final_plan(df2).count("Exchange") >= 2  # pinned fallback
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_q_smb14_subquery_wrapped_joins(qenv):
    """smb_mapjoin_14.q: the SMB join under subqueries — bare count,
    group-by over the join, count over the grouped output, filtered
    subqueries joined, and a filter above AND below the subquery
    boundary."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT count(*) AS c FROM (SELECT /*+mapjoin(a)*/ a.key AS "
        "key, a.value AS val1, b.value AS val2 FROM smb2_t1 a JOIN "
        "smb2_t2 b ON a.key = b.key) subq1",
        "SELECT CAST(count(*) AS BIGINT) AS c FROM (SELECT a.key, "
        "a.value AS val1, b.value AS val2 FROM smb2_t1 a JOIN smb2_t2 "
        "b ON a.key = b.key) subq1",
    )
    _chk(
        eng, con,
        "SELECT key, count(*) AS c FROM (SELECT a.key AS key, a.value "
        "AS val1, b.value AS val2 FROM smb2_t1 a JOIN smb2_t2 b ON "
        "a.key = b.key) subq1 GROUP BY key ORDER BY key",
        "SELECT key, CAST(count(*) AS BIGINT) AS c FROM (SELECT a.key "
        "AS key FROM smb2_t1 a JOIN smb2_t2 b ON a.key = b.key) subq1 "
        "GROUP BY key ORDER BY key NULLS FIRST",
    )
    _chk(
        eng, con,
        "SELECT count(*) AS c FROM (SELECT key, count(*) FROM (SELECT "
        "a.key AS key FROM smb2_t1 a JOIN smb2_t2 b ON a.key = b.key) "
        "subq1 GROUP BY key) subq2",
        "SELECT CAST(count(*) AS BIGINT) AS c FROM (SELECT key FROM "
        "(SELECT a.key AS key FROM smb2_t1 a JOIN smb2_t2 b ON a.key "
        "= b.key) subq1 GROUP BY key) subq2",
    )
    _chk(
        eng, con,
        "SELECT /*+mapjoin(subq1)*/ count(*) AS c FROM (SELECT a.key "
        "AS key, a.value AS value FROM smb2_t1 a WHERE key < 6) subq1 "
        "JOIN (SELECT a.key AS key, a.value AS value FROM smb2_t2 a "
        "WHERE key < 6) subq2 ON subq1.key = subq2.key",
        "SELECT CAST(count(*) AS BIGINT) AS c FROM (SELECT key FROM "
        "smb2_t1 WHERE key < 6) subq1 JOIN (SELECT key FROM smb2_t2 "
        "WHERE key < 6) subq2 ON subq1.key = subq2.key",
    )
    _chk(
        eng, con,
        "SELECT count(*) AS c FROM (SELECT * FROM (SELECT a.key AS "
        "key, a.value AS value FROM smb2_t1 a WHERE key < 8) subq1 "
        "WHERE key < 6) subq2 JOIN smb2_t2 b ON subq2.key = b.key",
        "SELECT CAST(count(*) AS BIGINT) AS c FROM (SELECT key FROM "
        "smb2_t1 WHERE key < 8 AND key < 6) subq2 JOIN smb2_t2 b ON "
        "subq2.key = b.key",
    )


def test_q_smb25_join_of_joins(qenv):
    """smb_mapjoin_25.q: a LEFT OUTER join whose BOTH inputs are
    themselves SMB joins, constants pushed through every level."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT t1.key AS k1, t2.key AS k2 FROM (SELECT a.key FROM "
        "smb2_b1 a JOIN smb2_b2 b ON (a.key = b.key) WHERE a.key = 5) "
        "t1 LEFT OUTER JOIN (SELECT c.key FROM smb2_b2 c JOIN smb2_b3 "
        "d ON (c.key = d.key) WHERE c.key = 5) t2 ON (t1.key = "
        "t2.key) WHERE t2.key = 5",
    )


def test_q_sort_merge_join_desc_pairs(qenv, spark):
    """sort_merge_join_desc_1.q-4.q/8.q: DESC-sorted bucketed pairs.
    Matching (key DESC, value DESC) orders join exchange-free (the
    bucket sets align; Spark at most re-Sorts); a prefix-vs-full sort
    mismatch ((key DESC) vs (key DESC, value DESC)) still answers
    correctly."""
    eng, con = qenv
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("smb2_d1", "smb2_d2", "smb2_d3"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    for t, order in (
        ("smb2_d1", "key DESC, value DESC"),
        ("smb2_d2", "key DESC, value DESC"),
        ("smb2_d3", "key DESC"),
    ):
        eng.sql(
            f"CREATE TABLE {t} (key STRING, value STRING) CLUSTERED "
            f"BY (key, value) SORTED BY ({order}) INTO 2 BUCKETS "
            "STORED AS PARQUET"
        )
        spark.createDataFrame(
            [(str(k), v) for k, v in SRC], "key string, value string"
        ).write.insertInto(t)

    def vv(name):
        body = ", ".join(f"('{k}', '{v}')" for k, v in SRC)
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM "
            f"(VALUES {body}) AS t(key, value)"
        )

    for t in ("smb2_d1", "smb2_d2", "smb2_d3"):
        vv(t)
    # matched DESC-DESC pair: exchange-free (count gather only)
    df = eng.sql(
        "select count(*) AS n from smb2_d1 a join smb2_d2 b on "
        "a.key = b.key and a.value = b.value"
    )
    assert_matches_oracle(
        df, con,
        "SELECT CAST(count(*) AS BIGINT) AS n FROM smb2_d1 a JOIN "
        "smb2_d2 b ON a.key = b.key AND a.value = b.value",
    )
    # no hash-partitioning shuffle on either side: the small pair is
    # broadcast (Hive's own MAPJOIN conversion) or bucket-aligned —
    # either way the only Exchanges are broadcast/gather
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 0, plan
    # prefix sort vs full sort: answers stay right regardless of how
    # Spark plans it
    assert_matches_oracle(
        eng.sql(
            "select count(*) AS n from smb2_d1 a join smb2_d3 b on "
            "a.key = b.key and a.value = b.value"
        ),
        con,
        "SELECT CAST(count(*) AS BIGINT) AS n FROM smb2_d1 a JOIN "
        "smb2_d3 b ON a.key = b.key AND a.value = b.value",
    )
    for t in ("smb2_d1", "smb2_d2", "smb2_d3"):
        eng.sql(f"DROP TABLE {t}")


def test_q_smb10_cross_partition_self_join(qenv, spark):
    """smb_mapjoin_10.q: a bucketed PARTITIONED table self-joined
    across two different partitions (partition predicates INSIDE the
    ON) on the full compound sort key."""
    eng, con = qenv
    spark.sql("DROP TABLE IF EXISTS smb2_p10")
    eng.sql(
        "CREATE TABLE smb2_p10 (userid INT, pageid INT, postid INT, "
        "type STRING) PARTITIONED BY (ds STRING) CLUSTERED BY (userid) "
        "SORTED BY (pageid, postid, type, userid) INTO 2 BUCKETS "
        "STORED AS PARQUET"
    )
    rows = [(i % 5, i % 7, i % 3, f"t{i % 2}") for i in range(30)]
    for ds in ("1", "2"):
        eng.sql(
            f"INSERT INTO smb2_p10 PARTITION (ds='{ds}') VALUES "
            + ", ".join(f"({u}, {p}, {po}, '{t}')"
                        for u, p, po, t in rows)
        )
    got = eng.sql(
        "select /*+mapjoin(a)*/ count(*) AS n from smb2_p10 a join "
        "smb2_p10 b on (a.ds = '1' and b.ds = '2' and a.userid = "
        "b.userid and a.pageid = b.pageid and a.postid = b.postid "
        "and a.type = b.type)"
    ).collect()[0].n
    from collections import Counter
    c = Counter(rows)
    assert got == sum(v * v for v in c.values())
    eng.sql("DROP TABLE smb2_p10")


def test_q_smb17_eight_way_chain(qenv, spark):
    """smb_mapjoin_17.q: an 8-way map-join chain over identically
    bucketed tables all keyed on the same column."""
    eng, con = qenv
    lt10 = [r for r in SRC if r[0] < 10]
    names = [f"smb2_c{i}" for i in range(1, 9)]
    for t in names:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        eng.sql(
            f"CREATE TABLE {t} (key INT, value STRING) CLUSTERED BY "
            "(key) SORTED BY (key) INTO 2 BUCKETS STORED AS PARQUET"
        )
        spark.createDataFrame(lt10, "key int, value string") \
            .write.insertInto(t)
    joins = " ".join(
        f"JOIN {t} {chr(98 + i)} ON a.key = {chr(98 + i)}.key"
        for i, t in enumerate(names[1:])
    )
    got = eng.sql(
        "SELECT /*+ mapjoin(b, c, d, e, f, g, h) */ count(*) AS n "
        f"FROM smb2_c1 a {joins}"
    ).collect()[0].n
    from collections import Counter
    c = Counter(k for k, _ in lt10)
    assert got == sum(v ** 8 for v in c.values())
    for t in names:
        eng.sql(f"DROP TABLE {t}")
