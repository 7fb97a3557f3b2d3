"""clientpositive `.q` slice, round 9: the bucket-MAP-join context
matrix (reference: ql/src/test/queries/clientpositive/bucketmapjoin1.q
-5.q and bucketcontext_1.q-8.q) — the broadcast half of Hive's bucket
join strategies (optimizer/BucketMapJoinOptimizer; the SMB half is
test_qfile_auto_sortmerge.py).

Hive's bucket map join builds ONE hashtable per small-table bucket and
streams each big-table bucket against small bucket ``i mod n`` —
a memory optimization for map-side joins. Spark's physical equivalent
is the BroadcastHashJoin (the whole small side broadcasts; per-bucket
hashtable slicing is below Catalyst's abstraction, and at 32 MB
thresholds the full broadcast is strictly cheaper than Hive's per-bucket
staging at any scale). What must HOLD from the goldens:

- every /*+mapjoin(x)*/ shape answers identically with the hint on
  either side, with bucketmapjoin on or off (the golden's own
  hash-checksum cross-run assertion, re-derived vs DuckDB);
- hinted joins PLAN as broadcast with ZERO shuffle exchanges on the
  probe side (the 100 TB point of a map-side join);
- the bucketcontext partition/bucket-count matrix (1 part × 2 part,
  2/4 buckets either side) also answers exchange-free under the
  SORTED-merge variant (hive.optimize.bucketmapjoin.sortedmerge) when
  bucket counts divide — Spark's coalesceBucketsInJoin.
- empty partitions join to zero rows, not errors (HIVE-3205).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(i % 83, f"val_{i % 83}") for i in range(500)]
SMALL = [(str(k), f"val_{k}") for k in (0, 5, 10, 15, 20, 26, 37, 48, 66, 82)]
BIG1 = [(str(i % 83), f"val_{i % 83}") for i in range(0, 500, 2)]
BIG2 = [(str(i % 83), f"val_{i % 83}") for i in range(1, 500, 2)]

_TABLES = (
    "bmj_src2", "bmj_part4", "bmj_part2", "bmj_result",
    "bctx_small4", "bctx_big2", "bctx_small2", "bctx_big4",
)


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


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    eng = Engine(spark=spark)
    _drop(spark, *_TABLES)
    # srcbucket_mapjoin analog: unpartitioned, 2 buckets
    (spark.createDataFrame(SRC, "key int, value string")
        .write.bucketBy(2, "key").sortBy("key").format("parquet")
        .saveAsTable("bmj_src2"))
    # srcbucket_mapjoin_part analog: 1 loaded partition, 4 buckets
    (spark.createDataFrame([(k, v, "2008-04-08") for k, v in SRC],
                           "key int, value string, ds string")
        .write.partitionBy("ds").bucketBy(4, "key").sortBy("key")
        .format("parquet").saveAsTable("bmj_part4"))
    # srcbucket_mapjoin_part_2 analog: 1 loaded partition, 2 buckets
    part2 = [(k, v, "2008-04-08") for k, v in SRC if k % 3 == 0]
    (spark.createDataFrame(part2, "key int, value string, ds string")
        .write.partitionBy("ds").bucketBy(2, "key").sortBy("key")
        .format("parquet").saveAsTable("bmj_part2"))
    # bucketcontext matrix: small 4-bucket / big 2-bucket (ctx 2/5/7)
    # and small 2-bucket / big 4-bucket (ctx 1/3), string keys; big has
    # TWO partitions (ctx 7's shape), small one.
    (spark.createDataFrame([(k, v, "2008-04-08") for k, v in SMALL],
                           "key string, value string, ds string")
        .write.partitionBy("ds").bucketBy(4, "key").sortBy("key")
        .format("parquet").saveAsTable("bctx_small4"))
    (spark.createDataFrame([(k, v, "2008-04-08") for k, v in SMALL],
                           "key string, value string, ds string")
        .write.partitionBy("ds").bucketBy(2, "key").sortBy("key")
        .format("parquet").saveAsTable("bctx_small2"))
    big_rows = [(k, v, "2008-04-08") for k, v in BIG1] + \
               [(k, v, "2008-04-09") for k, v in BIG2]
    (spark.createDataFrame(big_rows, "key string, value string, ds string")
        .write.partitionBy("ds").bucketBy(2, "key").sortBy("key")
        .format("parquet").saveAsTable("bctx_big2"))
    (spark.createDataFrame(big_rows, "key string, value string, ds string")
        .write.partitionBy("ds").bucketBy(4, "key").sortBy("key")
        .format("parquet").saveAsTable("bctx_big4"))

    con = duckdb.connect()
    _values_view(con, "bmj_src2", SRC, "key, value")
    _values_view(con, "bmj_part4",
                 [(k, v, "2008-04-08") for k, v in SRC],
                 "key, value, ds")
    _values_view(con, "bmj_part2", part2, "key, value, ds")
    _values_view(con, "bctx_small4",
                 [(k, v, "2008-04-08") for k, v in SMALL],
                 "key, value, ds")
    _values_view(con, "bctx_small2",
                 [(k, v, "2008-04-08") for k, v in SMALL],
                 "key, value, ds")
    _values_view(con, "bctx_big2", big_rows, "key, value, ds")
    _values_view(con, "bctx_big4", big_rows, "key, value, ds")
    yield eng, con
    con.close()
    _drop(spark, *_TABLES)


def _chk(eng, con, hive_sql: str, duck_sql: str | None = None):
    df = eng.sql(hive_sql)
    assert_matches_oracle(df, con, duck_sql or hive_sql)
    return df


def _plan(df) -> str:
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


def _assert_broadcast_no_shuffle(df) -> None:
    """The map-join contract at 100 TB: the hinted join broadcasts and
    the probe side streams shuffle-free (the only allowed exchanges are
    BroadcastExchange and a global-aggregate SinglePartition gather)."""
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_q_bmj1_empty_partition_join(qenv):
    """bucketmapjoin1.q head (HIVE-3205): joining against a partition
    with NO data answers zero rows — both hint directions."""
    eng, _ = qenv
    for hint in ("b", "a"):
        df = eng.sql(
            f"select /*+mapjoin({hint})*/ a.key, a.value, b.value "
            "from bmj_part4 a join bmj_part2 b "
            "on a.key=b.key where b.ds=\"2008-04-09\""
        )
        assert df.count() == 0


def test_q_bmj1_unpart_vs_partitioned(qenv):
    """bucketmapjoin1.q core: 2-bucket unpartitioned probe-joins the
    4-bucket partitioned table under /*+mapjoin(b)*/ — values vs
    DuckDB, broadcast + shuffle-free plan pin."""
    eng, con = qenv
    df = _chk(
        eng, con,
        'select /*+mapjoin(b)*/ a.key AS key, a.value AS v1, '
        'b.value AS v2 '
        'from bmj_src2 a join bmj_part4 b '
        'on a.key=b.key where b.ds="2008-04-08"',
        "SELECT a.key AS key, a.value AS v1, b.value AS v2 "
        "FROM bmj_src2 a JOIN bmj_part4 b "
        "ON a.key=b.key WHERE b.ds='2008-04-08'",
    )
    _assert_broadcast_no_shuffle(df)


def test_q_bmj1_hint_side_invariance(qenv):
    """bucketmapjoin1.q checksum cross-run: mapjoin(a) vs mapjoin(b) vs
    no hint answer identically (the golden inserts each variant and
    diffs hash sums)."""
    eng, con = qenv
    oracle_sql = (
        "SELECT CAST(count(*) AS BIGINT) AS c, "
        "CAST(sum(a.key) AS BIGINT) AS sk "
        "FROM bmj_part4 a JOIN bmj_part2 b "
        "ON a.key=b.key WHERE b.ds='2008-04-08' AND a.ds='2008-04-08'"
    )
    for hint in ("/*+mapjoin(b)*/", "/*+mapjoin(a)*/", ""):
        _chk(
            eng, con,
            f"select {hint} cast(count(*) as bigint) AS c, "
            "cast(sum(a.key) as bigint) AS sk "
            "from bmj_part4 a join bmj_part2 b "
            "on a.key=b.key "
            "where b.ds='2008-04-08' and a.ds='2008-04-08'",
            oracle_sql,
        )


def test_q_bmj1_insert_overwrite_result(qenv, spark, tmp_path_factory):
    """bucketmapjoin1.q INSERT OVERWRITE arm: the hinted join feeds a
    result table; count and contents match DuckDB computing the same
    join."""
    eng, con = qenv
    p = str(tmp_path_factory.mktemp("bmj") / "bmj_result")
    spark.createDataFrame(
        [], "key int, value1 string, value2 string"
    ).write.parquet(p)
    eng.register_table("bmj_result", p)
    eng.sql(
        'insert overwrite table bmj_result '
        'select /*+mapjoin(b)*/ a.key, a.value, b.value '
        'from bmj_src2 a join bmj_part4 b '
        'on a.key=b.key where b.ds="2008-04-08"'
    )
    assert_matches_oracle(
        eng.sql("select cast(count(1) as bigint) AS c from bmj_result"),
        con,
        "SELECT CAST(count(1) AS BIGINT) AS c FROM bmj_src2 a "
        "JOIN bmj_part4 b ON a.key=b.key WHERE b.ds='2008-04-08'",
    )
    assert_matches_oracle(
        eng.sql(
            "select key, value1, value2 from bmj_result"
        ),
        con,
        "SELECT a.key AS key, a.value AS value1, b.value AS value2 "
        "FROM bmj_src2 a JOIN bmj_part4 b ON a.key=b.key "
        "WHERE b.ds='2008-04-08'",
    )


@pytest.mark.parametrize(
    "small,big",
    [
        ("bctx_small2", "bctx_big4"),   # ctx 1/3: small 2bkt, big 4bkt
        ("bctx_small4", "bctx_big2"),   # ctx 2/5/7: small 4bkt, big 2bkt
    ],
)
def test_q_bucketcontext_mapjoin_matrix(qenv, small, big):
    """bucketcontext_1-8.q broadcast arm: /*+ MAPJOIN(a) */ count(*)
    over every partition/bucket-count pairing — values + broadcast
    shuffle-free pin."""
    eng, con = qenv
    df = _chk(
        eng, con,
        f"SELECT /*+ MAPJOIN(a) */ CAST(count(*) AS BIGINT) AS c "
        f"FROM {small} a JOIN {big} b ON a.key = b.key",
    )
    _assert_broadcast_no_shuffle(df)


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.mark.parametrize(
    "small,big",
    [
        ("bctx_small2", "bctx_big4"),
        ("bctx_small4", "bctx_big2"),
    ],
)
def test_q_bucketcontext_sortedmerge_matrix(qenv, no_broadcast, small, big):
    """bucketcontext_1-8.q sortedmerge arm (hive.optimize.bucketmapjoin
    .sortedmerge=true): the same matrix answers exchange-free as a
    bucketed SMJ — divisible bucket counts coalesce
    (coalesceBucketsInJoin), including across MULTI-partition bucketed
    scans (ctx 7's 2-partition big table)."""
    eng, con = qenv
    df = _chk(
        eng, con,
        f"SELECT CAST(count(*) AS BIGINT) AS c "
        f"FROM {small} a JOIN {big} b ON a.key = b.key",
    )
    plan = _plan(df)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
