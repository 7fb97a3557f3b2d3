"""clientpositive `.q` slice, round 8: the insert_* family —
INSERT INTO accumulation, per-branch ORDER BY/LIMIT inside
multi-insert, typed VALUES, and the IF NOT EXISTS overwrite guard
(reference: ql/src/test/queries/clientpositive/insert1.q,
insert_into1.q, insert_into3.q, insert_values_tmp_table.q,
insert1_overwrite_partitions.q).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(str(i % 83), f"val_{i % 83}") for i in range(500)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfile_insert")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    p = str(root / "i_src")
    spark.createDataFrame(SRC, "key string, value string") \
        .coalesce(1).write.parquet(p)
    eng.register_table("i_src", p)
    con.execute(
        f"CREATE VIEW i_src AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield eng, con
    con.close()


def _fresh(spark, eng, name, ddl):
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
    eng.sql(ddl)


def test_q_insert_into1_accumulates(qenv, spark):
    """insert_into1.q: INSERT INTO appends — two identical inserts
    double the row count; a following OVERWRITE resets it."""
    eng, con = qenv
    _fresh(spark, eng, "i_into1",
           "CREATE TABLE i_into1 (key INT, value STRING) STORED AS PARQUET")
    for expect in (100, 200):
        eng.sql(
            "INSERT INTO TABLE i_into1 SELECT * FROM i_src "
            "ORDER BY key LIMIT 100"
        )
        n = eng.sql("SELECT count(*) AS c FROM i_into1").collect()[0].c
        assert n == expect
    eng.sql(
        "INSERT OVERWRITE TABLE i_into1 SELECT * FROM i_src "
        "ORDER BY key LIMIT 10"
    )
    assert eng.sql("SELECT count(*) AS c FROM i_into1").collect()[0].c == 10
    spark.sql("DROP TABLE IF EXISTS i_into1")


def test_q_insert_into3_branch_order_limit(qenv, spark):
    """insert_into3.q: multi-insert where each branch carries its OWN
    ORDER BY ... LIMIT — branch a gets 50 rows, branch b 100, from one
    shared scan."""
    eng, con = qenv
    _fresh(spark, eng, "i_3a",
           "CREATE TABLE i_3a (key INT, value STRING) STORED AS PARQUET")
    _fresh(spark, eng, "i_3b",
           "CREATE TABLE i_3b (key INT, value STRING) STORED AS PARQUET")
    eng.sql(
        "FROM i_src INSERT INTO TABLE i_3a SELECT * ORDER BY key, "
        "value LIMIT 50 INSERT INTO TABLE i_3b SELECT * ORDER BY key, "
        "value LIMIT 100"
    )
    assert eng.sql("SELECT count(*) AS c FROM i_3a").collect()[0].c == 50
    assert eng.sql("SELECT count(*) AS c FROM i_3b").collect()[0].c == 100
    # values are the ordered heads, not arbitrary subsets
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM i_3a ORDER BY key, value"),
        con,
        # the branch ordered the STRING key lexicographically before
        # the LIMIT; the INT cast happens at the store, after
        "SELECT CAST(key AS INT) AS key, value FROM (SELECT key, "
        "value FROM i_src ORDER BY key NULLS FIRST, value NULLS FIRST "
        "LIMIT 50) t ORDER BY key NULLS FIRST, value NULLS FIRST",
    )
    for t in ("i_3a", "i_3b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_q_insert_values_typed(qenv, spark):
    """insert_values_tmp_table.q: typed VALUES — decimal(5,2) and
    negative values keep scale through the insert."""
    eng, con = qenv
    _fresh(spark, eng, "i_vals",
           "CREATE TABLE i_vals (i INT, de DECIMAL(5,2), vc STRING) "
           "STORED AS PARQUET")
    eng.sql(
        "INSERT INTO TABLE i_vals VALUES "
        "(1, 109.23, 'mary had a little lamb'), "
        "(429496729, 0.14, 'its fleece was white as snow'), "
        "(-29496729, -0.14, 'negative values test')"
    )
    rows = eng.sql(
        "SELECT i, de, vc FROM i_vals ORDER BY i"
    ).collect()
    assert [(r.i, str(r.de)) for r in rows] == [
        (-29496729, "-0.14"), (1, "109.23"), (429496729, "0.14"),
    ]
    spark.sql("DROP TABLE IF EXISTS i_vals")


def test_q_insert_overwrite_if_not_exists(qenv, spark):
    """insert1_overwrite_partitions.q: INSERT OVERWRITE PARTITION (...)
    IF NOT EXISTS — the first insert fills the partition, the second
    is a NO-OP (the existing rows survive, rows_affected 0)."""
    eng, con = qenv
    _fresh(spark, eng, "i_dest",
           "CREATE TABLE i_dest (one STRING, two STRING) PARTITIONED "
           "BY (ds STRING, hr STRING) STORED AS PARQUET")
    n1 = eng.sql(
        "INSERT OVERWRITE TABLE i_dest PARTITION (ds='2011-11-11', "
        "hr='11') IF NOT EXISTS SELECT key, value FROM i_src "
        "ORDER BY key DESC, value DESC LIMIT 5"
    ).collect()[0][0]
    assert n1 == 5
    before = {
        (r.one, r.two)
        for r in eng.sql("SELECT one, two FROM i_dest").collect()
    }
    # second insert with a DIFFERENT select must be skipped entirely
    n2 = eng.sql(
        "INSERT OVERWRITE TABLE i_dest PARTITION (ds='2011-11-11', "
        "hr='11') IF NOT EXISTS SELECT key, value FROM i_src "
        "ORDER BY key ASC, value ASC LIMIT 3"
    ).collect()[0][0]
    assert n2 == 0
    after = {
        (r.one, r.two)
        for r in eng.sql("SELECT one, two FROM i_dest").collect()
    }
    assert after == before
    # a NEW partition under the guard still inserts
    n3 = eng.sql(
        "INSERT OVERWRITE TABLE i_dest PARTITION (ds='2011-11-11', "
        "hr='12') IF NOT EXISTS SELECT key, value FROM i_src "
        "ORDER BY key LIMIT 4"
    ).collect()[0][0]
    assert n3 == 4
    parts = [r[0] for r in eng.sql("SHOW PARTITIONS i_dest").collect()]
    assert sorted(parts) == [
        "ds=2011-11-11/hr=11", "ds=2011-11-11/hr=12",
    ]
    spark.sql("DROP TABLE IF EXISTS i_dest")


def test_q_insert1_multi_into_and_overwrite(qenv, spark):
    """insert1.q core: one FROM feeding an INTO branch and an
    OVERWRITE branch with disjoint filters."""
    eng, con = qenv
    _fresh(spark, eng, "i_a",
           "CREATE TABLE i_a (key INT, value STRING) STORED AS PARQUET")
    _fresh(spark, eng, "i_b",
           "CREATE TABLE i_b (key INT, value STRING) STORED AS PARQUET")
    eng.sql(
        "FROM i_src INSERT INTO TABLE i_a SELECT * WHERE key < 10 "
        "INSERT OVERWRITE TABLE i_b SELECT * WHERE key > 10 AND key < 20"
    )
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM i_a ORDER BY key, value"),
        con,
        "SELECT CAST(key AS INT) AS key, value FROM i_src WHERE "
        "CAST(key AS DOUBLE) < 10 ORDER BY key NULLS FIRST, "
        "value NULLS FIRST",
    )
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM i_b ORDER BY key, value"),
        con,
        "SELECT CAST(key AS INT) AS key, value FROM i_src WHERE "
        "CAST(key AS DOUBLE) > 10 AND CAST(key AS DOUBLE) < 20 "
        "ORDER BY key NULLS FIRST, value NULLS FIRST",
    )
    for t in ("i_a", "i_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
