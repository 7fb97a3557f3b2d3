"""clientpositive `.q` slice: the insert_into golden family
(insert_into1.q-insert_into6.q). Semantics under test: INSERT INTO a
catalog table APPENDS across statements (Hive 0.8's HIVE-306 —
accumulation, never replacement), INSERT OVERWRITE resets, ORDER BY +
LIMIT inside the insert body bounds each batch, and multi-column
VALUES inserts coexist with SELECT inserts. The goldens canonicalize
with SUM(HASH(...)); our comparator is order-insensitive so row
multisets are compared directly (strictly stronger).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(i % 83, f"val_{i % 83}") for i in range(500)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_insinto")
    eng = Engine(spark=spark)
    p = str(root / "src")
    spark.createDataFrame(SRC, "key int, value string").coalesce(
        2
    ).write.parquet(p)
    eng.register_table("ii_src", p)
    spark.sql("DROP TABLE IF EXISTS ii_t1")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(wh, "ii_t1"), ignore_errors=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW ii_src AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield eng, con
    con.close()
    spark.sql("DROP TABLE IF EXISTS ii_t1")


def test_q_insert_into1_accumulation(qenv):
    eng, con = qenv
    eng.sql("CREATE TABLE ii_t1 (key INT, value STRING) STORED AS PARQUET")
    eng.sql(
        "INSERT INTO TABLE ii_t1 SELECT * FROM ii_src ORDER BY key, value "
        "LIMIT 100"
    )
    # second INTO appends the same 100 rows — count doubles
    eng.sql(
        "INSERT INTO TABLE ii_t1 SELECT * FROM ii_src ORDER BY key, value "
        "LIMIT 100"
    )
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM ii_t1 ORDER BY key, value"),
        con,
        """
        WITH batch AS (
          SELECT key, value FROM ii_src ORDER BY key, value LIMIT 100
        )
        SELECT key, value FROM (
          SELECT * FROM batch UNION ALL SELECT * FROM batch
        ) t ORDER BY key, value
        """,
    )


def test_q_insert_into1_overwrite_resets(qenv):
    eng, con = qenv
    eng.sql(
        "INSERT OVERWRITE TABLE ii_t1 SELECT * FROM ii_src "
        "ORDER BY key, value LIMIT 10"
    )
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM ii_t1 ORDER BY key, value"),
        con,
        "SELECT key, value FROM ii_src ORDER BY key, value LIMIT 10",
    )


def test_q_insert_into3_values_and_select_mix(qenv):
    """insert_into3.q shape: VALUES and SELECT batches accumulate in
    one table."""
    eng, con = qenv
    eng.sql("INSERT INTO TABLE ii_t1 VALUES (1000, 'extra_a'), (1001, 'extra_b')")
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM ii_t1 ORDER BY key, value"),
        con,
        """
        SELECT key, value FROM (
          SELECT key, value FROM ii_src ORDER BY key, value LIMIT 10
        ) t
        UNION ALL
        SELECT * FROM (VALUES (1000, 'extra_a'), (1001, 'extra_b'))
          v(key, value)
        ORDER BY key, value
        """,
    )
