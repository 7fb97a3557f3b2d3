"""clientpositive `.q` slice, round 8: the auto_sortmerge_join family
(reference: ql/src/test/queries/clientpositive/auto_sortmerge_join_1.q
through _16.q) — the direct test surface for auto-converted sort-merge
bucket joins (optimizer/AbstractSMBJoinProc / SortedMergeBucketMapJoin).

Method (the repo's established qfile strategy): the goldens' TABLE
SHAPES — partitioned 2/3/4-bucket sorted tables, bucketed-unsorted,
bucketed-by-a-different-column, empty buckets — are rebuilt as REAL
Spark bucketed tables over synthesized src-like data, and every
statement shape replays through Engine.sql diffed order-insensitively
against DuckDB over the same rows. Hive's SMB machinery (bucket-count
divisibility: a 2-bucket table joins a 4-bucket table by reading two
buckets per task) maps to Catalyst bucketed SMJ + coalesceBucketsInJoin
(on in session.py ENGINE_CONFS); the DIVISIBLE cases pin ZERO Exchange
operators, the NON-divisible (3 vs 4) and differently-bucketed cases
pin that correctness survives the forced shuffle — at 100 TB the
exchange-free plan removes both shuffles from every co-bucketed fact
join, which is exactly why the reference family exists.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

# src-parity contents (kv pairs, repeated keys) — synthesized, the
# golden's count(*) answers are re-derived by the DuckDB oracle
SRC = [(i % 83, f"val_{i % 83}") for i in range(500)]
# bucket_small/big family uses STRING keys like the goldens
SMALL = [(str(k), f"val_{k}") for k in (0, 5, 10, 15, 20, 26, 37, 48, 66, 82)]
BIG1 = [(str(i % 83), f"val_{i % 83}") for i in range(0, 500, 2)]
BIG2 = [(str(i % 83), f"val_{i % 83}") for i in range(1, 500, 2)]


def _values_view(con, name, rows, cols) -> None:
    body = ", ".join(
        "(" + ", ".join("NULL" if v is None else repr(v) for v in r) + ")"
        for r in rows
    )
    con.execute(
        f"CREATE VIEW {name} AS SELECT * FROM (VALUES {body}) AS t({cols})"
    )


def _drop(spark, *names) -> None:
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in names:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)


_TABLES = (
    "asmj_small", "asmj_big", "asmj_medium", "asmj_tbl1", "asmj_tbl2",
    "asmj_tbl3", "asmj_tbl4", "asmj_nosort2", "asmj_nosort4",
    "asmj_onekey", "asmj_dest1", "asmj_dest2",
)


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    eng = Engine(spark=spark)
    _drop(spark, *_TABLES)
    # bucket_small: 1 partition, 2 buckets sorted — auto_sortmerge_join_1.q
    (spark.createDataFrame([(k, v, "2008-04-08") for k, v in SMALL],
                           "key string, value string, ds string")
        .write.partitionBy("ds").bucketBy(2, "key").sortBy("key")
        .format("parquet").saveAsTable("asmj_small"))
    # bucket_big: 2 partitions, 4 buckets sorted
    big_rows = [(k, v, "2008-04-08") for k, v in BIG1] + \
               [(k, v, "2008-04-09") for k, v in BIG2]
    (spark.createDataFrame(big_rows, "key string, value string, ds string")
        .write.partitionBy("ds").bucketBy(4, "key").sortBy("key")
        .format("parquet").saveAsTable("asmj_big"))
    # bucket_medium: 3 buckets — NON-divisible vs both 2 and 4
    # (auto_sortmerge_join_12.q)
    (spark.createDataFrame([(k, v, "2008-04-08") for k, v in SMALL[:6]],
                           "key string, value string, ds string")
        .write.partitionBy("ds").bucketBy(3, "key").sortBy("key")
        .format("parquet").saveAsTable("asmj_medium"))
    # tbl1-tbl4: the INT-key family (auto_sortmerge_join_6/9/10/13/14)
    # via ENGINE DDL (CLUSTERED BY ... SORTED BY ... INTO n BUCKETS)
    for t, bkt_col, rows in (
        ("asmj_tbl1", "key", [r for r in SRC if r[0] < 10]),
        ("asmj_tbl2", "key", [r for r in SRC if r[0] < 10]),
        ("asmj_tbl3", "key", [r for r in SRC if r[0] < 10]),
        ("asmj_tbl4", "value", [r for r in SRC if r[0] < 10]),
    ):
        eng.sql(
            f"CREATE TABLE {t} (key INT, value STRING) CLUSTERED BY "
            f"({bkt_col}) SORTED BY ({bkt_col}) INTO 2 BUCKETS "
            "STORED AS PARQUET"
        )
        spark.createDataFrame(rows, "key int, value string") \
            .write.insertInto(t)
    # bucketed NOT sorted (auto_sortmerge_join_11.q: CLUSTERED BY only)
    for t, n in (("asmj_nosort2", 2), ("asmj_nosort4", 4)):
        (spark.createDataFrame(SRC, "key int, value string")
            .write.bucketBy(n, "key").format("parquet").saveAsTable(t))
    # empty buckets: one distinct key → every other bucket has no file
    (spark.createDataFrame([(7, "val_7")] * 5, "key int, value string")
        .write.bucketBy(4, "key").sortBy("key").format("parquet")
        .saveAsTable("asmj_onekey"))

    con = duckdb.connect()
    _values_view(con, "asmj_small", [(k, v, "2008-04-08") for k, v in SMALL],
                 "key, value, ds")
    _values_view(con, "asmj_big", big_rows, "key, value, ds")
    _values_view(con, "asmj_medium",
                 [(k, v, "2008-04-08") for k, v in SMALL[:6]],
                 "key, value, ds")
    _values_view(con, "src", SRC, "key, value")
    con.execute("CREATE VIEW asmj_tbl1 AS SELECT * FROM src WHERE key < 10")
    con.execute("CREATE VIEW asmj_tbl2 AS SELECT * FROM src WHERE key < 10")
    con.execute("CREATE VIEW asmj_tbl3 AS SELECT * FROM src WHERE key < 10")
    con.execute("CREATE VIEW asmj_tbl4 AS SELECT * FROM src WHERE key < 10")
    con.execute("CREATE VIEW asmj_nosort2 AS SELECT * FROM src")
    con.execute("CREATE VIEW asmj_nosort4 AS SELECT * FROM src")
    _values_view(con, "asmj_onekey", [(7, "val_7")] * 5, "key, value")
    spark.createDataFrame(SRC, "key int, value string") \
        .createOrReplaceTempView("src")
    yield eng, con
    con.close()
    _drop(spark, *_TABLES)
    spark.catalog.dropTempView("src")


def _chk(eng, con, hive_sql: str, duck_sql: str | None = None):
    df = eng.sql(hive_sql)
    assert_matches_oracle(df, con, duck_sql or hive_sql)
    return df


def _plan(df) -> str:
    """Executed plan, FINAL section only (AdaptiveSparkPlan's toString
    repeats the pre-AQE initial plan below the final one — counting
    operators across both would double-count)."""
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


@pytest.fixture()
def no_broadcast(spark):
    """The goldens test the SMB path, not mapjoin — force SMJ."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_q_asmj_1_to_8_partitioned_divisible_both_orders(
    qenv, no_broadcast
):
    """auto_sortmerge_join_1.q-5.q/7.q/8.q core: partitioned 2-bucket
    joins partitioned 4-bucket, both table orders (Hive's size-based /
    leftmost big-table selection policies change only WHICH side
    streams; the answer is order-independent), count(*) and projected
    forms. Divisible bucket counts → ZERO Exchange (Hive reads two
    buckets per task; Spark coalesces the 4-bucket side)."""
    eng, con = qenv
    for sql in (
        "SELECT CAST(count(*) AS BIGINT) AS c FROM asmj_small a "
        "JOIN asmj_big b ON a.key = b.key",
        "SELECT CAST(count(*) AS BIGINT) AS c FROM asmj_big a "
        "JOIN asmj_small b ON a.key = b.key",
    ):
        df = _chk(eng, con, sql)
        # the join itself is exchange-free: the ONLY exchange allowed
        # in the plan is the global count(*)'s single-partition gather
        plan = _plan(df)
        assert plan.count("Exchange") <= 1, plan
        assert "SortMergeJoin" in plan, plan
    # projected join (not just count) stays exchange-free
    df = _chk(
        eng, con,
        "SELECT a.key AS k, b.value AS w FROM asmj_small a JOIN "
        "asmj_big b ON a.key = b.key ORDER BY k, w",
        "SELECT a.key AS k, b.value AS w FROM asmj_small a JOIN "
        "asmj_big b ON a.key = b.key ORDER BY k NULLS FIRST, w NULLS FIRST",
    )


def test_q_asmj_5_unpartitioned_outer_variants(qenv, no_broadcast):
    """auto_sortmerge_join_5.q (unpartitioned) + _14/_15.q (outer):
    LEFT and RIGHT OUTER over asymmetric bucketed tables — tbl1 has
    keys < 10, the big side all keys — plus the golden's second phase
    where the small side is re-filled wider than the big side."""
    eng, con = qenv
    for jt in ("JOIN", "LEFT OUTER JOIN", "RIGHT OUTER JOIN",
               "FULL OUTER JOIN"):
        _chk(
            eng, con,
            f"SELECT CAST(count(*) AS BIGINT) AS c FROM asmj_nosort2 a "
            f"{jt} asmj_tbl2 b ON a.key = b.key",
        )
    # count over the projected outer join (null-extended rows counted)
    _chk(
        eng, con,
        "SELECT CAST(count(b.key) AS BIGINT) AS c FROM asmj_nosort2 a "
        "LEFT OUTER JOIN asmj_tbl2 b ON a.key = b.key",
    )


def test_q_asmj_6_three_way_mixed_bucketing(qenv, no_broadcast):
    """auto_sortmerge_join_6.q: tbl1 JOIN tbl2 (co-bucketed on key) then
    JOIN src (unbucketed) on value — the SMB pair stays exchange-free,
    the third join shuffles; and tbl4 is bucketed on VALUE, so joining
    it on value needs no exchange on ITS side either."""
    eng, con = qenv
    df = _chk(
        eng, con,
        "SELECT CAST(count(*) AS BIGINT) AS c FROM asmj_tbl1 a "
        "JOIN asmj_tbl2 b ON a.key = b.key JOIN src c ON c.value = a.value",
    )
    # pinned fallback: the value-join must shuffle (src is unbucketed)
    assert _plan(df).count("Exchange") >= 2
    _chk(
        eng, con,
        "SELECT CAST(count(*) AS BIGINT) AS c FROM asmj_tbl1 a "
        "JOIN asmj_tbl2 b ON a.key = b.key JOIN asmj_tbl3 c "
        "ON c.key = a.key",
    )
    _chk(
        eng, con,
        "SELECT CAST(count(*) AS BIGINT) AS c FROM asmj_tbl1 a "
        "JOIN asmj_tbl2 b ON a.key = b.key JOIN asmj_tbl4 c "
        "ON c.value = a.value",
    )


def test_q_asmj_9_subquery_and_group_by_reuses_bucketing(
    qenv, no_broadcast
):
    """auto_sortmerge_join_9.q: the join wrapped in a subquery, then
    GROUP BY the join key — the SMB output is already hash-partitioned
    on key, so the aggregation adds NO exchange (Catalyst partitioning
    reuse; Hive gets the same via the correlation optimizer)."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT CAST(count(*) AS BIGINT) AS c FROM (SELECT a.key AS key, "
        "a.value AS val1, b.value AS val2 FROM asmj_tbl1 a JOIN "
        "asmj_tbl2 b ON a.key = b.key) subq1",
    )
    df = _chk(
        eng, con,
        "SELECT key, CAST(count(*) AS BIGINT) AS c FROM (SELECT a.key AS "
        "key, a.value AS val1, b.value AS val2 FROM asmj_tbl1 a JOIN "
        "asmj_tbl2 b ON a.key = b.key) subq1 GROUP BY key ORDER BY key",
        "SELECT key, CAST(count(*) AS BIGINT) AS c FROM (SELECT a.key AS "
        "key FROM asmj_tbl1 a JOIN asmj_tbl2 b ON a.key = b.key) subq1 "
        "GROUP BY key ORDER BY key NULLS FIRST",
    )
    plan = _plan(df)
    # join exchange-free AND group-by exchange-free: the only exchange
    # is the ORDER BY's range repartition
    assert plan.count("Exchange") == 1, plan


def test_q_asmj_10_union_side_falls_back(qenv, no_broadcast):
    """auto_sortmerge_join_10.q: one side is a UNION ALL subquery —
    bucketing metadata does not survive the union, so the join MUST
    shuffle (pinned), and the doubled rows answer stays exact."""
    eng, con = qenv
    sql = (
        "SELECT CAST(count(*) AS BIGINT) AS c FROM (SELECT * FROM "
        "(SELECT a.key AS key, a.value AS value FROM asmj_tbl1 a WHERE "
        "key < 6 UNION ALL SELECT a.key AS key, a.value AS value FROM "
        "asmj_tbl1 a WHERE key < 6) usubq1) subq1 JOIN (SELECT a.key AS "
        "key, a.value AS value FROM asmj_tbl2 a WHERE key < 6) subq2 "
        "ON subq1.key = subq2.key"
    )
    df = _chk(eng, con, sql)
    assert "Exchange" in _plan(df)


def test_q_asmj_11_bucketed_unsorted_no_exchange(qenv, no_broadcast):
    """auto_sortmerge_join_11.q: CLUSTERED BY without SORTED BY — Hive
    runs a plain bucket map join; Spark keeps the exchange-free plan
    and adds the missing Sort below the SMJ (different physical
    strategy, same no-shuffle property — the golden's point)."""
    eng, con = qenv
    df = _chk(
        eng, con,
        "SELECT CAST(count(*) AS BIGINT) AS c FROM asmj_nosort2 a "
        "JOIN asmj_nosort4 b ON a.key = b.key",
    )
    plan = _plan(df)
    assert plan.count("Exchange") <= 1, plan  # only the count gather
    assert "SortMergeJoin" in plan, plan
    assert "Sort " in plan or "Sort\n" in plan, plan
    # 3-way form from the golden's MAPJOIN(a,b) hint statement
    _chk(
        eng, con,
        "SELECT CAST(count(*) AS BIGINT) AS c FROM asmj_small a JOIN "
        "asmj_big b ON a.key = b.key JOIN asmj_big c ON a.key = c.key",
    )


def test_q_asmj_12_three_way_non_divisible(qenv, no_broadcast):
    """auto_sortmerge_join_12.q: small(2) ⋈ medium(3) ⋈ big(4) ⋈
    medium(3) — 3 divides neither 2 nor 4, so Hive falls back off the
    SMB path for those edges; values must stay exact regardless of
    which sides Spark shuffles."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT CAST(count(*) AS BIGINT) AS c FROM asmj_small a JOIN "
        "asmj_medium b ON a.key = b.key JOIN asmj_big c ON c.key = b.key "
        "JOIN asmj_medium d ON c.key = d.key",
    )


def test_q_asmj_13_multi_insert_from_join_subquery(qenv, no_broadcast):
    """auto_sortmerge_join_13.q: FROM (join subq) INSERT OVERWRITE two
    destinations — the SMB join feeds a multi-insert; both dest tables
    must hold exactly the join's projections."""
    eng, con = qenv
    spark = eng.spark
    _drop(spark, "asmj_dest1", "asmj_dest2")
    eng.sql("CREATE TABLE asmj_dest1 (k1 INT, k2 INT) STORED AS PARQUET")
    eng.sql(
        "CREATE TABLE asmj_dest2 (k1 STRING, k2 STRING) STORED AS PARQUET"
    )
    eng.sql(
        "FROM (SELECT a.key key1, a.value value1, b.key key2, b.value "
        "value2 FROM asmj_tbl1 a JOIN asmj_tbl2 b ON a.key = b.key) subq "
        "INSERT OVERWRITE TABLE asmj_dest1 SELECT key1, key2 "
        "INSERT OVERWRITE TABLE asmj_dest2 SELECT value1, value2"
    )
    assert_matches_oracle(
        eng.sql("SELECT k1, k2 FROM asmj_dest1 ORDER BY k1, k2"),
        con,
        "SELECT a.key AS k1, b.key AS k2 FROM asmj_tbl1 a JOIN asmj_tbl2 "
        "b ON a.key = b.key ORDER BY k1 NULLS FIRST, k2 NULLS FIRST",
    )
    assert_matches_oracle(
        eng.sql("SELECT k1, k2 FROM asmj_dest2 ORDER BY k1, k2"),
        con,
        "SELECT a.value AS k1, b.value AS k2 FROM asmj_tbl1 a JOIN "
        "asmj_tbl2 b ON a.key = b.key ORDER BY k1 NULLS FIRST, "
        "k2 NULLS FIRST",
    )
    _drop(spark, "asmj_dest1", "asmj_dest2")


def test_q_asmj_empty_buckets(qenv, no_broadcast):
    """Empty-bucket corner (the family's fixture files deliberately
    leave buckets empty): a 4-bucket table whose rows all hash to ONE
    bucket joins a full 2-bucket table — missing bucket FILES must read
    as empty buckets, not break the zipped bucket iteration."""
    eng, con = qenv
    df = _chk(
        eng, con,
        "SELECT CAST(count(*) AS BIGINT) AS c FROM asmj_onekey a "
        "JOIN asmj_nosort2 b ON a.key = b.key",
    )
    plan = _plan(df)
    assert plan.count("Exchange") <= 1, plan
    _chk(
        eng, con,
        "SELECT a.key AS k, b.value AS v FROM asmj_onekey a JOIN "
        "asmj_nosort4 b ON a.key = b.key ORDER BY k, v",
        "SELECT a.key AS k, b.value AS v FROM asmj_onekey a JOIN "
        "asmj_nosort4 b ON a.key = b.key ORDER BY k NULLS FIRST, "
        "v NULLS FIRST",
    )


def test_q_asmj_14_outer_after_rewrite(qenv, no_broadcast, spark):
    """auto_sortmerge_join_14.q second phase: tbl2 re-filled WIDER than
    tbl1 (key < 200 vs key < 20) then RIGHT OUTER — the null-extension
    flips sides relative to the first phase."""
    eng, con = qenv
    _drop(spark, "asmj_w1", "asmj_w2")
    for t, lim in (("asmj_w1", 20), ("asmj_w2", 200)):
        eng.sql(
            f"CREATE TABLE {t} (key INT, value STRING) CLUSTERED BY (key) "
            "SORTED BY (key) INTO 2 BUCKETS STORED AS PARQUET"
        )
        spark.createDataFrame(
            [r for r in SRC if r[0] < lim], "key int, value string"
        ).write.insertInto(t)
    con.execute("CREATE VIEW asmj_w1 AS SELECT * FROM src WHERE key < 20")
    con.execute("CREATE VIEW asmj_w2 AS SELECT * FROM src WHERE key < 200")
    try:
        _chk(
            eng, con,
            "SELECT CAST(count(*) AS BIGINT) AS c FROM asmj_w1 a "
            "LEFT OUTER JOIN asmj_w2 b ON a.key = b.key",
        )
        df = _chk(
            eng, con,
            "SELECT CAST(count(*) AS BIGINT) AS c FROM asmj_w1 a "
            "RIGHT OUTER JOIN asmj_w2 b ON a.key = b.key",
        )
        assert _plan(df).count("Exchange") <= 1
    finally:
        con.execute("DROP VIEW asmj_w1")
        con.execute("DROP VIEW asmj_w2")
        _drop(spark, "asmj_w1", "asmj_w2")
