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


def test_q_insert_schema_with_partition_spec(spark):
    """insert_into_with_schema.q (r10): HIVE-9481 column lists compose
    with PARTITION specs — fully static (list names data columns),
    mixed static+dynamic (the dynamic column appears IN the list), and
    fully dynamic with an UNLISTED partition column (NULL →
    __HIVE_DEFAULT_PARTITION__)."""
    from hive_2_3_2_spark.engine import Engine

    eng = Engine(spark=spark)
    spark.sql("DROP TABLE IF EXISTS pageviews_r10")
    try:
        eng.sql(
            "CREATE TABLE pageviews_r10 (userid STRING, link STRING, "
            "source STRING) PARTITIONED BY (datestamp STRING, i int) "
            "STORED AS PARQUET"
        )
        eng.sql(
            "INSERT INTO TABLE pageviews_r10 PARTITION "
            "(datestamp = '2014-09-23', i = 1)(userid,link) "
            "VALUES ('jsmith', 'mail.com')"
        )
        eng.sql(
            "INSERT INTO TABLE pageviews_r10 PARTITION "
            "(datestamp='2014-09-23',i)(userid,i,link) "
            "VALUES ('jsmith', 7, '7mail.com')"
        )
        eng.sql(
            "INSERT INTO TABLE pageviews_r10 PARTITION "
            "(datestamp,i)(userid,i,link,datestamp) "
            "VALUES ('jsmith', 17, '17mail.com', '2014-09-23')"
        )
        rows = sorted(
            (r.userid, r.link, r.source, r.datestamp, r.i)
            for r in eng.sql("select * from pageviews_r10").collect()
        )
        assert rows == [
            ("jsmith", "17mail.com", None, "2014-09-23", 17),
            ("jsmith", "7mail.com", None, "2014-09-23", 7),
            ("jsmith", "mail.com", None, "2014-09-23", 1),
        ]
        # unlisted dynamic partition column → NULL partition
        eng.sql(
            "INSERT INTO TABLE pageviews_r10 PARTITION "
            "(datestamp,i)(userid,i,link) "
            "VALUES ('jsmith', 23, '23mail.com')"
        )
        got = eng.sql(
            "select datestamp from pageviews_r10 where i = 23"
        ).collect()
        assert [r.datestamp for r in got] in (
            [None], ["__HIVE_DEFAULT_PARTITION__"]
        )
        # static-bound partition column in the list stays a typed error
        import pytest as _pytest

        from hive_2_3_2_spark.engine import HiveQLUnsupportedError
        with _pytest.raises(HiveQLUnsupportedError):
            eng.sql(
                "INSERT INTO TABLE pageviews_r10 PARTITION "
                "(datestamp='x', i=9)(userid,datestamp) "
                "VALUES ('a','b')"
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS pageviews_r10")
