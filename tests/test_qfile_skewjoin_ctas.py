"""clientpositive `.q` slice, round 6e: skewjoinopt1.q (joins over
SKEWED BY tables — the skew DDL is advisory; results must equal plain
joins) and ctas.q (CTAS with sort/limit, expression columns, delimited
text CTAS, reserved-word columns). Reference:
ql/src/test/queries/clientpositive/skewjoinopt1.q, ctas.q."""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

T1 = [("1", "11"), ("2", "12"), ("3", "13"), ("7", "17"), ("8", "18"),
      ("8", "28")]
T2 = [("2", "22"), ("3", "13"), ("4", "14"), ("5", "15"), ("8", "18"),
      ("8", "18")]
SRC = [(str(i % 83), f"val_{i % 83}") for i in range(500)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_sjc")
    eng = Engine(spark=spark)
    # skewed tables created through the Hive DDL path (the golden's
    # opener), then loaded
    for name, rows, skew in (("sj1_t1", T1, "2"), ("sj1_t2", T2, "3")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        import shutil as _sh, os as _os
        _wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        _sh.rmtree(_os.path.join(_wh, name), ignore_errors=True)
        eng.sql(
            f"CREATE TABLE {name}(key STRING, val STRING) "
            f"SKEWED BY (key) ON (('{skew}')) STORED AS PARQUET"
        )
        eng.sql(
            f"INSERT INTO {name} VALUES "
            + ", ".join(f"('{k}', '{v}')" for k, v in rows)
        )
    p = str(root / "src")
    spark.createDataFrame(SRC, "key string, value string").coalesce(
        2
    ).write.parquet(p)
    eng.register_table("src", p)
    con = duckdb.connect()
    for name, rows in (("sj1_t1", T1), ("sj1_t2", T2)):
        body = ", ".join(f"('{k}', '{v}')" for k, v in rows)
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM (VALUES {body}) "
            "AS t(key, val)"
        )
    con.execute(
        f"CREATE VIEW src AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield eng, con, str(root)
    con.close()
    for name in ("sj1_t1", "sj1_t2"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")



def _fresh(spark, *names):
    """Drop catalog entries AND their managed locations (a failed prior
    run can leave the warehouse dir behind, which Spark then refuses to
    reuse with LOCATION_ALREADY_EXISTS)."""
    import os
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")
        shutil.rmtree(os.path.join(wh, n), ignore_errors=True)


def test_q_skewjoinopt1_joins_over_skewed_tables(qenv):
    """skewjoinopt1.q: inner and right-outer joins plus count(1)
    aggregates over SKEWED BY tables — the skew metadata must never
    change results vs the plain-join oracle."""
    eng, con, _ = qenv
    proj = "a.key AS ak, a.val AS av, b.key AS bk, b.val AS bv"
    for jt in ("JOIN", "RIGHT OUTER JOIN"):
        assert_matches_oracle(
            eng.sql(
                f"SELECT {proj} FROM sj1_t1 a {jt} sj1_t2 b "
                "ON a.key = b.key"
            ),
            con,
            f"SELECT {proj} FROM sj1_t1 a {jt} sj1_t2 b "
            "ON a.key = b.key",
        )
        assert_matches_oracle(
            eng.sql(
                f"SELECT count(1) AS n FROM sj1_t1 a {jt} sj1_t2 b "
                "ON a.key = b.key"
            ),
            con,
            f"SELECT CAST(count(1) AS BIGINT) AS n FROM sj1_t1 a {jt} "
            "sj1_t2 b ON a.key = b.key",
        )


def test_q_ctas_sort_limit_and_expressions(qenv):
    """ctas.q: CTAS with order by + limit (the golden's SORT BY runs
    single-reducer in QTestUtil, i.e. a total order; SORT BY + LIMIT on
    a multi-partition engine is a nondeterministic multiset, so the
    diffable replay uses the total-order spelling), expression columns (key/2, concat aliases), and CREATE
    TABLE IF NOT EXISTS over an existing CTAS target (no-op — content
    unchanged)."""
    eng, con, root = qenv
    spark = eng.spark
    _fresh(spark, "nz_ctas1")
    eng.sql(
        "create table nz_ctas1 as select key k, value from src "
        "order by k, value limit 10"
    )
    assert_matches_oracle(
        eng.sql("SELECT k, value FROM nz_ctas1"),
        con,
        "SELECT key AS k, value FROM src ORDER BY k, value LIMIT 10",
    )
    _fresh(spark, "nz_ctas3")
    eng.sql(
        "create table nz_ctas3 as "
        "select key/2 half_key, concat(value, '_con') conb from src "
        "order by half_key, conb limit 10"
    )
    assert_matches_oracle(
        eng.sql("SELECT half_key, conb FROM nz_ctas3"),
        con,
        "SELECT CAST(key AS DOUBLE)/2 AS half_key, value || '_con' "
        "AS conb FROM src ORDER BY half_key, conb LIMIT 10",
    )
    # IF NOT EXISTS over the existing target: statement is a no-op
    eng.sql(
        "create table if not exists nz_ctas3 as "
        "select key, value from src order by key, value limit 2"
    )
    cols = eng.sql("SELECT * FROM nz_ctas3").columns
    assert cols == ["half_key", "conb"], cols
    assert eng.sql("SELECT count(*) AS n FROM nz_ctas3").collect()[0].n == 10
    spark.sql("DROP TABLE nz_ctas1")
    spark.sql("DROP TABLE nz_ctas3")


def test_q_ctas_delimited_text_and_reserved_word_column(qenv):
    """ctas.q tail: delimited-text CTAS (row format delimited fields
    terminated by ','), then a table with a RESERVED-WORD column
    (`to`) fed by tablesample and re-CTAS'd."""
    eng, con, root = qenv
    spark = eng.spark
    _fresh(spark, "nz_ctas4")
    eng.sql(
        "create table nz_ctas4 row format delimited fields terminated "
        "by ',' stored as textfile as "
        "select key, value from src order by key, value limit 10"
    )
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM nz_ctas4"),
        con,
        "SELECT key, value FROM src ORDER BY key, value LIMIT 10",
    )
    _fresh(spark, "nz_ctas6", "nz_ctas7")
    eng.sql("create table nz_ctas6 (key string, `to` string)")
    eng.sql(
        "insert overwrite table nz_ctas6 "
        "select key, value from src tablesample (10 rows)"
    )
    assert eng.sql("SELECT count(*) AS n FROM nz_ctas6").collect()[0].n == 10
    eng.sql("create table nz_ctas7 as select key, `to` from nz_ctas6")
    out = eng.sql("SELECT key, `to` FROM nz_ctas7")
    assert out.count() == 10 and out.columns == ["key", "to"]
    for t in ("nz_ctas4", "nz_ctas6", "nz_ctas7"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
