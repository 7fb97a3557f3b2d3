"""clientpositive `.q` slice: the load_dyn_part golden family —
dynamic-partition INSERT into catalog tables. Reference:
ql/src/test/queries/clientpositive/load_dyn_part1.q (CREATE TABLE LIKE
a partitioned table; FROM-first multi-insert where one branch is
all-dynamic ``partition (ds, hr)`` and the other MIXED
``partition (ds='2008-12-31', hr)``), load_dyn_part3.q (single
all-dynamic insert), load_dyn_part8.q (overwrite semantics across
partitions). Hive's semantics under test (SemanticAnalyzer dynamic
partition handling + MoveTask): the SELECT supplies data columns then
dynamic partition values positionally; static values come from the
spec; OVERWRITE with a static spec replaces exactly that partition
(even from an empty select), with dynamic partitions only the
partitions the output touches.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [
    (str(k), f"val_{k}", ds, hr)
    for ds in ("2008-04-08", "2008-04-09")
    for hr in ("11", "12")
    for k in range(0, 100, 7)
]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    eng = Engine(spark=spark)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("ldp_srcpart", "ldp_part1", "ldp_part2", "ldp_part3"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    eng.sql(
        "CREATE TABLE ldp_srcpart (key STRING, value STRING) "
        "PARTITIONED BY (ds STRING, hr STRING) STORED AS PARQUET"
    )
    for ds in ("2008-04-08", "2008-04-09"):
        for hr in ("11", "12"):
            vals = ", ".join(
                f"('{k}', '{v}')"
                for k, v, d, h in SRC
                if d == ds and h == hr
            )
            eng.sql(
                f"INSERT INTO ldp_srcpart PARTITION (ds='{ds}', "
                f"hr='{hr}') VALUES {vals}"
            )
    con = duckdb.connect()
    body = ", ".join(
        f"('{k}', '{v}', '{d}', '{h}')" for k, v, d, h in SRC
    )
    con.execute(
        "CREATE VIEW ldp_srcpart AS SELECT * FROM (VALUES "
        + body + ") AS t(key, value, ds, hr)"
    )
    yield eng, con
    con.close()
    for t in ("ldp_srcpart", "ldp_part1", "ldp_part2", "ldp_part3"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_q_load_dyn_part1_mixed_multi_insert(qenv):
    """load_dyn_part1.q: CREATE LIKE + FROM-first multi-insert with an
    all-dynamic branch and a mixed static/dynamic branch."""
    eng, con = qenv
    eng.sql("CREATE TABLE ldp_part1 LIKE ldp_srcpart")
    eng.sql("CREATE TABLE ldp_part2 LIKE ldp_srcpart")
    res = eng.sql(
        """
        FROM ldp_srcpart
        INSERT OVERWRITE TABLE ldp_part1 PARTITION (ds, hr)
          SELECT key, value, ds, hr WHERE ds <= '2008-04-08'
        INSERT OVERWRITE TABLE ldp_part2 PARTITION (ds='2008-12-31', hr)
          SELECT key, value, hr WHERE ds > '2008-04-08'
        """
    ).collect()
    assert {(r.target_table, r.rows_affected) for r in res} == {
        ("ldp_part1", 30),
        ("ldp_part2", 30),
    }
    assert_matches_oracle(
        eng.sql(
            "SELECT * FROM ldp_part1 WHERE ds IS NOT NULL AND hr IS NOT "
            "NULL ORDER BY key, value, ds, hr"
        ),
        con,
        "SELECT key, value, ds, hr FROM ldp_srcpart "
        "WHERE ds <= '2008-04-08' ORDER BY key, value, ds, hr",
    )
    assert_matches_oracle(
        eng.sql("SELECT * FROM ldp_part2 ORDER BY key, value, ds, hr"),
        con,
        "SELECT key, value, '2008-12-31' AS ds, hr FROM ldp_srcpart "
        "WHERE ds > '2008-04-08' ORDER BY key, value, ds, hr",
    )


def test_q_load_dyn_part3_all_dynamic(qenv):
    """load_dyn_part3.q: single INSERT OVERWRITE, both partition
    columns dynamic."""
    eng, con = qenv
    eng.sql("CREATE TABLE ldp_part3 LIKE ldp_srcpart")
    eng.sql(
        "INSERT OVERWRITE TABLE ldp_part3 PARTITION (ds, hr) "
        "SELECT key, value, ds, hr FROM ldp_srcpart "
        "WHERE ds IS NOT NULL AND hr IS NOT NULL"
    )
    assert_matches_oracle(
        eng.sql("SELECT * FROM ldp_part3 ORDER BY key, value, ds, hr"),
        con,
        "SELECT key, value, ds, hr FROM ldp_srcpart "
        "ORDER BY key, value, ds, hr",
    )


def test_q_dynamic_overwrite_touches_only_output_partitions(qenv):
    """load_dyn_part8.q semantics: a dynamic OVERWRITE replaces only
    the partitions present in the output; other partitions keep their
    rows (Hive MoveTask per-partition replace, NOT a table truncate)."""
    eng, con = qenv
    eng.sql(
        "INSERT OVERWRITE TABLE ldp_part3 PARTITION (ds, hr) "
        "SELECT key, 'rewritten', ds, hr FROM ldp_srcpart "
        "WHERE ds = '2008-04-09' AND hr = '11'"
    )
    assert_matches_oracle(
        eng.sql("SELECT * FROM ldp_part3 ORDER BY key, value, ds, hr"),
        con,
        "SELECT key, CASE WHEN ds = '2008-04-09' AND hr = '11' "
        "THEN 'rewritten' ELSE value END AS value, ds, hr "
        "FROM ldp_srcpart ORDER BY key, value, ds, hr",
    )


def test_q_static_overwrite_clears_on_empty_select(qenv):
    """Hive replaces the static target partition even when the select
    produces no rows (directory swap) — the partition must come back
    empty, siblings untouched."""
    eng, con = qenv
    eng.sql(
        "INSERT OVERWRITE TABLE ldp_part3 PARTITION "
        "(ds='2008-04-08', hr='11') SELECT key, value FROM ldp_srcpart "
        "WHERE 1 = 0"
    )
    assert_matches_oracle(
        eng.sql(
            "SELECT * FROM ldp_part3 ORDER BY key, value, ds, hr"
        ),
        con,
        "SELECT key, CASE WHEN ds = '2008-04-09' AND hr = '11' "
        "THEN 'rewritten' ELSE value END AS value, ds, hr "
        "FROM ldp_srcpart WHERE NOT (ds = '2008-04-08' AND hr = '11') "
        "ORDER BY key, value, ds, hr",
    )


def test_q_load_dyn_part2_bucketed_mixed_static_dynamic(qenv, spark):
    """load_dyn_part2.q: static ds + dynamic hr into a CLUSTERED BY
    (bucketed) partitioned table — bucketing and dynamic partitioning
    compose."""
    eng, con = qenv
    spark.sql("DROP TABLE IF EXISTS ldp_bucket")
    eng.sql(
        "CREATE TABLE ldp_bucket (key STRING, value STRING) "
        "PARTITIONED BY (ds STRING, hr STRING) "
        "CLUSTERED BY (key) INTO 10 BUCKETS STORED AS PARQUET"
    )
    eng.sql(
        "insert overwrite table ldp_bucket partition (ds='2010-03-23', "
        "hr) select key, value, hr from ldp_srcpart where ds is not "
        "null and hr is not null"
    )
    for hr in ("11", "12"):
        assert_matches_oracle(
            eng.sql(
                "select key, value from ldp_bucket where "
                f"ds='2010-03-23' and hr='{hr}'"
            ),
            con,
            f"SELECT key, value FROM ldp_srcpart WHERE hr = '{hr}'",
        )
    eng.sql("DROP TABLE ldp_bucket")


def test_q_load_dyn_part14_null_empty_partition_values(qenv, spark):
    """load_dyn_part14.q: dynamic partition VALUES that are NULL,
    empty string, and blank — NULL and '' land in Hive's default
    partition (__HIVE_DEFAULT_PARTITION__), the blank keeps its
    directory."""
    eng, con = qenv
    spark.sql("DROP TABLE IF EXISTS ldp_p14")
    eng.sql(
        "CREATE TABLE ldp_p14 (key STRING) PARTITIONED BY "
        "(value STRING) STORED AS PARQUET"
    )
    eng.spark.sql("set spark.sql.sources.partitionOverwriteMode=dynamic")
    eng.sql(
        "insert overwrite table ldp_p14 partition(value) "
        "select key, value from ("
        " select * from (select 'k1' as key, cast(null as string) as "
        "value from ldp_srcpart limit 2)a "
        " union all select * from (select 'k2' as key, '' as value "
        "from ldp_srcpart limit 2)b "
        " union all select * from (select 'k3' as key, ' ' as value "
        "from ldp_srcpart limit 2)c ) T"
    )
    parts = {r[0] for r in eng.sql("show partitions ldp_p14").collect()}
    assert any("__HIVE_DEFAULT_PARTITION__" in p for p in parts), parts
    rows = eng.sql("select key, value from ldp_p14").collect()
    assert len(rows) == 6
    # NULL and '' both read back as NULL from the default partition
    by_key = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r.value)
    assert by_key["k1"] == [None, None]
    assert by_key["k2"] == [None, None]
    eng.sql("DROP TABLE ldp_p14")


def test_q_load_dyn_part8_mixed_branches_multi_insert(qenv, spark):
    """load_dyn_part8.q: one FROM-first statement with a FULLY dynamic
    branch and a static-ds + dynamic-hr branch, filters disjoint."""
    eng, con = qenv
    spark.sql("DROP TABLE IF EXISTS ldp_p8")
    eng.sql(
        "CREATE TABLE ldp_p8 (key STRING, value STRING) PARTITIONED "
        "BY (ds STRING, hr STRING) STORED AS PARQUET"
    )
    eng.sql(
        "from ldp_srcpart "
        "insert overwrite table ldp_p8 partition (ds, hr) select key, "
        "value, ds, hr where ds <= '2008-04-08' "
        "insert overwrite table ldp_p8 partition(ds='2008-12-31', hr) "
        "select key, value, hr where ds > '2008-04-08'"
    )
    assert_matches_oracle(
        eng.sql("select key, value, ds, hr from ldp_p8"),
        con,
        "SELECT key, value, ds, hr FROM ldp_srcpart WHERE "
        "ds <= '2008-04-08' UNION ALL SELECT key, value, "
        "'2008-12-31' AS ds, hr FROM ldp_srcpart WHERE "
        "ds > '2008-04-08'",
    )
    eng.sql("DROP TABLE ldp_p8")
