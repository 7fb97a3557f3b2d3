"""bucketsortoptimize_insert_2.q + groupby_multi_single_reducer2.q
replay. The insert family's subject: an SMB join of two bucketed
partitioned tables INSERT OVERWRITten into a third bucketed
partitioned table keeps the sink's declared bucket layout — verified
the way the golden does, by reading each bucket back with
TABLESAMPLE(BUCKET i OUT OF n) and checking the union reconstructs
the join exactly (Hive's BucketingSortingReduceSinkOptimizer keeps
the map-side bucket identity; Spark's insertInto a bucketed catalog
table re-buckets by spec — same invariant).

groupby_multi_single_reducer2: one FROM-first statement whose
branches carry DIFFERENT WHERE filters and DISTINCT aggregates
(Hive's multi-groupby single-reducer path).
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(i % 83, f"val_{i % 83}") for i in range(500)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_bsi")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    p = str(root / "bsi_src")
    spark.createDataFrame(SRC, "key int, value string").coalesce(
        1
    ).write.parquet(p)
    eng.register_table("bsi_src", p)
    body = ", ".join(f"({k}, '{v}')" for k, v in SRC)
    con.execute(
        "CREATE VIEW bsi_src AS SELECT * FROM (VALUES "
        + body + ") AS t(key, value)"
    )
    for t in ("bsi_t1", "bsi_t2", "bsi_t3"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        eng.sql(
            f"CREATE TABLE {t} (key INT, value STRING) PARTITIONED BY "
            "(ds STRING) CLUSTERED BY (key) SORTED BY (key) INTO 2 "
            "BUCKETS STORED AS PARQUET"
        )
    for ds in ("1", "2"):
        eng.sql(
            f"FROM bsi_src INSERT OVERWRITE TABLE bsi_t1 PARTITION "
            f"(ds = '{ds}') SELECT * where key < 10"
        )
        eng.sql(
            f"FROM bsi_src INSERT OVERWRITE TABLE bsi_t2 PARTITION "
            f"(ds = '{ds}') SELECT * where key < 100"
        )
    yield eng, con
    for t in ("bsi_t1", "bsi_t2", "bsi_t3"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    con.close()


def test_q_bucketsort_insert_join_to_bucketed_sink(qenv):
    """bucketsortoptimize_insert_2.q: bucketed-join output inserted
    into a bucketed partitioned sink; per-bucket TABLESAMPLE readback
    partitions the rows exactly."""
    eng, con = qenv
    eng.sql(
        "INSERT OVERWRITE TABLE bsi_t3 PARTITION (ds = '1') "
        "SELECT a.key, concat(a.value, b.value) FROM bsi_t1 a JOIN "
        "bsi_t2 b ON a.key = b.key WHERE a.ds = '1' and b.ds = '1'"
    )
    assert_matches_oracle(
        eng.sql("select key, value from bsi_t3 where ds = '1'"),
        con,
        "SELECT a.key, a.value || b.value AS value FROM "
        "(SELECT * FROM bsi_src WHERE key < 10) a JOIN "
        "(SELECT * FROM bsi_src WHERE key < 100) b ON a.key = b.key",
    )
    # per-bucket readback: the two buckets partition the rows, no
    # overlap, union = everything (the golden's tablesample checks)
    b1 = eng.sql(
        "select key, value from bsi_t3 tablesample (bucket 1 out of 2 "
        "ON key) s where ds = '1'"
    ).collect()
    b2 = eng.sql(
        "select key, value from bsi_t3 tablesample (bucket 2 out of 2 "
        "ON key) s where ds = '1'"
    ).collect()
    all_rows = eng.sql(
        "select key, value from bsi_t3 where ds = '1'"
    ).collect()
    assert len(b1) + len(b2) == len(all_rows)
    # a key hashes to exactly ONE bucket — the samples are disjoint
    # by key and their union reconstructs the partition
    assert {r.key for r in b1}.isdisjoint({r.key for r in b2})


def test_q_groupby_multi_single_reducer2(qenv, spark):
    """groupby_multi_single_reducer2.q: FROM-first multi-insert whose
    branches have DISJOINT WHERE filters and distinct aggregates."""
    eng, con = qenv
    for t in ("bsi_g2", "bsi_g3"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    eng.sql("CREATE TABLE bsi_g2 (k STRING, c BIGINT) STORED AS PARQUET")
    eng.sql(
        "CREATE TABLE bsi_g3 (k STRING, c BIGINT, cv BIGINT) "
        "STORED AS PARQUET"
    )
    eng.sql(
        "FROM bsi_src "
        "INSERT OVERWRITE TABLE bsi_g2 SELECT substr(value,5,1), "
        "count(DISTINCT key) WHERE substr(value,5,1) >= 5 "
        "GROUP BY substr(value,5,1) "
        "INSERT OVERWRITE TABLE bsi_g3 SELECT substr(value,5,1), "
        "count(DISTINCT key), count(value) WHERE substr(value,5,1) < 5 "
        "GROUP BY substr(value,5,1)"
    )
    assert_matches_oracle(
        eng.sql("SELECT k, c FROM bsi_g2"),
        con,
        "SELECT substr(value,5,1) AS k, CAST(count(DISTINCT key) AS "
        "BIGINT) AS c FROM bsi_src WHERE CAST(substr(value,5,1) AS "
        "DOUBLE) >= 5 GROUP BY substr(value,5,1)",
    )
    assert_matches_oracle(
        eng.sql("SELECT k, c, cv FROM bsi_g3"),
        con,
        "SELECT substr(value,5,1) AS k, CAST(count(DISTINCT key) AS "
        "BIGINT) AS c, CAST(count(value) AS BIGINT) AS cv FROM bsi_src "
        "WHERE CAST(substr(value,5,1) AS DOUBLE) < 5 "
        "GROUP BY substr(value,5,1)",
    )
    for t in ("bsi_g2", "bsi_g3"):
        eng.sql(f"DROP TABLE {t}")
