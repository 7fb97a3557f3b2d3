"""clientpositive `.q` slice, round 8: the multi-DISTINCT aggregate
family — cbo_rp_gby2_map_multi_distinct.q /
groupby2_map_multi_distinct.q (reference:
ql/src/test/queries/clientpositive/). TWO different DISTINCT
aggregates plus plain aggregates in ONE grouped select, feeding an
INSERT OVERWRITE with Hive positional casts."""

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
    root = tmp_path_factory.mktemp("qfile_mdist")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    p = str(root / "md_src")
    spark.createDataFrame(SRC, "key string, value string") \
        .coalesce(1).write.parquet(p)
    eng.register_table("md_src", p)
    con.execute(
        f"CREATE VIEW md_src AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield eng, con
    con.close()


def test_q_multi_distinct_select(qenv):
    """The bare multi-distinct select: count(DISTINCT x),
    sum(DISTINCT x), count(y) in one GROUP BY."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "SELECT substr(key,1,1) AS k, count(DISTINCT "
            "substr(value,5)) AS c1, round(sum(DISTINCT "
            "substr(value, 5)), 2) AS c3, count(value) AS c4 "
            "FROM md_src GROUP BY substr(key,1,1) ORDER BY k"
        ),
        con,
        "SELECT substr(key,1,1) AS k, CAST(count(DISTINCT "
        "substr(value,5)) AS BIGINT) AS c1, round(sum(DISTINCT "
        "CAST(substr(value, 5) AS DOUBLE)), 2) AS c3, "
        "CAST(count(value) AS BIGINT) AS c4 FROM md_src "
        "GROUP BY substr(key,1,1) ORDER BY k NULLS FIRST",
    )


def test_q_multi_distinct_insert(qenv, spark):
    """The golden's full shape through the INSERT positional casts
    (concat of an aggregate included)."""
    eng, con = qenv
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS md_dest")
    shutil.rmtree(os.path.join(wh, "md_dest"), ignore_errors=True)
    eng.sql(
        "CREATE TABLE md_dest (key STRING, c1 INT, c2 STRING, c3 INT, "
        "c4 INT) STORED AS PARQUET"
    )
    eng.sql(
        "FROM md_src INSERT OVERWRITE TABLE md_dest SELECT "
        "substr(md_src.key,1,1), count(DISTINCT "
        "substr(md_src.value,5)), concat(substr(md_src.key,1,1), "
        "sum(substr(md_src.value,5))), sum(DISTINCT "
        "substr(md_src.value, 5)), count(md_src.value) "
        "GROUP BY substr(md_src.key,1,1)"
    )
    assert_matches_oracle(
        eng.sql("SELECT key, c1, c3, c4 FROM md_dest ORDER BY key"),
        con,
        "SELECT substr(key,1,1) AS key, CAST(count(DISTINCT "
        "substr(value,5)) AS INT) AS c1, CAST(sum(DISTINCT "
        "CAST(substr(value, 5) AS DOUBLE)) AS INT) AS c3, "
        "CAST(count(value) AS INT) AS c4 FROM md_src "
        "GROUP BY substr(key,1,1) ORDER BY key NULLS FIRST",
    )
    spark.sql("DROP TABLE IF EXISTS md_dest")
