"""clientpositive `.q` slice, round 8: typed-partition-column shapes —
partition_date.q, partition_varchar1.q, loadpart1.q's mixed-case
partition specs (reference: ql/src/test/queries/clientpositive/).

DATE / VARCHAR / INT partition columns with the full comparison matrix
in WHERE (=, <>, </>/<=/>=, BETWEEN, string-vs-typed literals) — every
predicate must both PRUNE (cheap at 10^5 partitions) and answer
exactly like a flat scan, which is what the DuckDB oracle computes
over the same rows. Hive resolves partition spec NAMES
case-insensitively (pCol1 vs pcol1 — loadpart1.q's trap); values stay
case-sensitive.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(str(i % 83), f"val_{i % 83}") for i in range(40)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfile_partcols")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    # partition_date_1: (dt DATE, region STRING) via dynamic write
    specs = [("2000-01-01", "1", 10), ("2000-01-01", "2", 5),
             ("2013-12-10", "2020-20-20", 5), ("2013-08-08", "1", 20),
             ("2013-08-08", "10", 11)]
    rows = []
    for dt, region, n in specs:
        rows += [(k, v, dt, region) for k, v in SRC[:n]]
    import datetime

    typed = [(k, v, datetime.date.fromisoformat(d), r)
             for k, v, d, r in rows]
    p = str(root / "partition_date_1")
    (spark.createDataFrame(
        typed, "key string, value string, dt date, region string")
        .repartition("dt", "region").write.partitionBy("dt", "region")
        .parquet(p))
    eng.register_table("partition_date_1", p, ["dt", "region"])
    con.execute(
        "CREATE VIEW partition_date_1 AS SELECT * FROM "
        f"read_parquet('{p}/*/*/*.parquet', hive_partitioning=1)"
    )
    yield eng, con
    con.close()


def _chk(eng, con, hive_sql, duck_sql=None):
    df = eng.sql(hive_sql)
    assert_matches_oracle(df, con, duck_sql or hive_sql)
    return df


def test_q_partition_date_predicates(qenv):
    """partition_date.q: the comparison matrix over a DATE partition
    column, typed and string literals both."""
    eng, con = qenv
    _chk(eng, con,
         "SELECT DISTINCT dt FROM partition_date_1 ORDER BY dt")
    _chk(
        eng, con,
        "SELECT key, value, dt, region FROM partition_date_1 WHERE "
        "dt = '2000-01-01' AND region = '2' ORDER BY key, value",
        "SELECT key, value, dt, region FROM partition_date_1 WHERE "
        "dt = DATE '2000-01-01' AND region = '2' "
        "ORDER BY key NULLS FIRST, value NULLS FIRST",
    )
    cases = [
        ("dt = date '2000-01-01'", "dt = DATE '2000-01-01'"),
        ("dt = '2000-01-01'", "dt = DATE '2000-01-01'"),
        ("dt = date '2000-01-01' and region = '2'",
         "dt = DATE '2000-01-01' AND region = '2'"),
        ("dt = date '2013-08-08' and region = '10'",
         "dt = DATE '2013-08-08' AND region = '10'"),
        ("region = '1'", "region = '1'"),
        ("dt = date '2000-01-01' and region = '3'",
         "dt = DATE '2000-01-01' AND region = '3'"),
        ("dt = date '1999-01-01'", "dt = DATE '1999-01-01'"),
        ("dt > date '2000-01-01' and region = '1'",
         "dt > DATE '2000-01-01' AND region = '1'"),
        ("dt < date '2000-01-02' and region = '1'",
         "dt < DATE '2000-01-02' AND region = '1'"),
        ("dt >= date '2000-01-02' and region = '1'",
         "dt >= DATE '2000-01-02' AND region = '1'"),
        ("dt <= date '2000-01-01' and region = '1'",
         "dt <= DATE '2000-01-01' AND region = '1'"),
        ("dt <> date '2000-01-01' and region = '1'",
         "dt <> DATE '2000-01-01' AND region = '1'"),
        ("dt between date '1999-12-30' and date '2000-01-03' "
         "and region = '1'",
         "dt BETWEEN DATE '1999-12-30' AND DATE '2000-01-03' "
         "AND region = '1'"),
        ("region = '2020-20-20'", "region = '2020-20-20'"),
        ("region > '2010-01-01'", "region > '2010-01-01'"),
    ]
    for hive_pred, duck_pred in cases:
        _chk(
            eng, con,
            f"SELECT count(*) AS c FROM partition_date_1 WHERE {hive_pred}",
            f"SELECT CAST(count(*) AS BIGINT) AS c FROM "
            f"partition_date_1 WHERE {duck_pred}",
        )


def test_q_partition_date_pruning_pin(qenv):
    """The scale property behind the family: a dt equality prunes the
    directory tree — PartitionFilters carries the predicate and the
    scan reads 2 of 5 partitions."""
    eng, con = qenv
    df = eng.sql(
        "SELECT count(*) AS c FROM partition_date_1 "
        "WHERE dt = date '2000-01-01'"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan, plan
    assert "isnotnull(dt" in plan or "dt#" in plan, plan
    assert df.collect()[0].c == 15


def test_q_partition_varchar_int_cols(qenv, spark, tmp_path):
    """partition_varchar1.q: VARCHAR + INT partition columns with
    range and IN predicates."""
    eng = Engine(spark=spark)
    con = duckdb.connect()
    specs = [("2000-01-01", 1, 10), ("2000-01-01", 2, 5),
             ("2013-08-08", 1, 12), ("2013-08-08", 10, 11)]
    rows = []
    for dt, region, n in specs:
        rows += [(k, v, dt, region) for k, v in SRC[:n]]
    p = str(tmp_path / "partition_varchar_1")
    (spark.createDataFrame(
        rows, "key string, value string, dt string, region int")
        .repartition("dt", "region").write.partitionBy("dt", "region")
        .parquet(p))
    eng.register_table("partition_varchar_1", p, ["dt", "region"])
    con.execute(
        "CREATE VIEW partition_varchar_1 AS SELECT * FROM "
        f"read_parquet('{p}/*/*/*.parquet', hive_partitioning=1)"
    )
    for pred in (
        "dt = '2000-01-01'",
        "dt = '2000-01-01' and region = 2",
        "dt = '2013-08-08' and region = 10",
        "region = 1",
        "dt > '2000-01-01'",
        "dt < '2013-01-01' and region < 2",
        "region IN (2, 10)",
    ):
        assert_matches_oracle(
            eng.sql(
                f"SELECT count(*) AS c FROM partition_varchar_1 "
                f"WHERE {pred}"
            ),
            con,
            f"SELECT CAST(count(*) AS BIGINT) AS c FROM "
            f"partition_varchar_1 WHERE {pred}",
        )
    con.close()


def test_q_loadpart1_mixed_case_partition_spec(qenv, spark, tmp_path):
    """loadpart1.q: partition spec NAMES are case-insensitive — an
    INSERT spelled pCol1/pcol2 lands in the same partition as
    pcol1/pCol2; values stay case-SENSITIVE ('test_part' vs
    'test_Part' are different partitions)."""
    eng = Engine(spark=spark)
    p = str(tmp_path / "hive_test_dst")
    spark.createDataFrame(
        [("seed", "test_part", "x")], "col1 string, pcol1 string, pcol2 string"
    ).write.partitionBy("pcol1", "pcol2").parquet(p)
    eng.register_table("hive_test_dst", p, ["pcol1", "pcol2"])
    eng.sql(
        "INSERT OVERWRITE TABLE hive_test_dst PARTITION "
        "(pCol1='test_part', pcol2='test_Part') "
        "SELECT 'v1'"
    )
    got = eng.sql(
        "SELECT col1, pcol1, pcol2 FROM hive_test_dst WHERE "
        "pcol1='test_part' AND pcol2='test_Part'"
    ).collect()
    assert [(r.col1, r.pcol1, r.pcol2) for r in got] == [
        ("v1", "test_part", "test_Part")
    ]
    # different VALUE case = different partition (empty)
    assert eng.sql(
        "SELECT count(*) AS c FROM hive_test_dst WHERE "
        "pcol1='test_part' AND pcol2='test_part'"
    ).collect()[0].c == 0
