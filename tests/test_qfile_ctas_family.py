"""clientpositive `.q` slice, round 8: ctas.q / ctas_colname.q /
ctas_char.q / ctas_varchar.q shapes (reference:
ql/src/test/queries/clientpositive/). The load-bearing corner is
Hive's auto-naming of unaliased CTAS expression columns: ``create
table s as select *, key+1, concat(value,value) from src`` yields
columns key, value, _c1, _c2 (SemanticAnalyzer; Spark would store the
raw expression text as the column name)."""

from __future__ import annotations

import pytest

from hive_2_3_2_spark.engine import Engine

SRC = [(str(i % 19), f"val_{i % 19}") for i in range(60)]


@pytest.fixture()
def eng(spark, tmp_path):
    eng = Engine(spark=spark)
    p = str(tmp_path / "ct_src")
    spark.createDataFrame(SRC, "key string, value string") \
        .coalesce(1).write.parquet(p)
    eng.register_table("ct_src", p)
    return eng


def test_q_ctas_basic_and_if_not_exists(eng, spark):
    spark.sql("DROP TABLE IF EXISTS ct_1")
    eng.sql(
        "CREATE TABLE ct_1 STORED AS PARQUET AS SELECT key k, value "
        "FROM ct_src ORDER BY k, value LIMIT 10"
    )
    assert eng.sql("SELECT count(*) AS c FROM ct_1").collect()[0].c == 10
    # CREATE IF NOT EXISTS over an existing CTAS target is a no-op
    eng.sql(
        "CREATE TABLE IF NOT EXISTS ct_1 STORED AS PARQUET AS SELECT "
        "key, value FROM ct_src LIMIT 2"
    )
    assert eng.sql("SELECT count(*) AS c FROM ct_1").collect()[0].c == 10
    spark.sql("DROP TABLE IF EXISTS ct_1")


def test_q_ctas_colname_autonames(eng, spark):
    """ctas_colname.q: unaliased expressions get _c<ordinal> names."""
    spark.sql("DROP TABLE IF EXISTS ct_summary")
    eng.sql(
        "CREATE TABLE ct_summary STORED AS PARQUET AS SELECT *, "
        "key + 1, concat(value, value) FROM ct_src LIMIT 20"
    )
    df = eng.sql("SELECT * FROM ct_summary")
    assert df.columns == ["key", "value", "_c2", "_c3"]
    row = eng.sql(
        "SELECT key, _c2, _c3 FROM ct_summary WHERE key = '1' LIMIT 1"
    ).collect()[0]
    assert (row._c2, row._c3) == (2.0, "val_1val_1")
    spark.sql("DROP TABLE IF EXISTS ct_summary")


def test_q_ctas_colname_window_autonames(eng, spark):
    """ctas_colname.q window half: an ALIASED window keeps its name
    next to auto-named siblings."""
    spark.sql("DROP TABLE IF EXISTS ct_x4")
    eng.sql(
        "CREATE TABLE ct_x4 STORED AS PARQUET AS SELECT *, rank() "
        "over(partition by key order by value) as rr FROM ct_src"
    )
    df = eng.sql("SELECT * FROM ct_x4")
    assert df.columns == ["key", "value", "rr"]
    assert df.count() == len(SRC)
    spark.sql("DROP TABLE IF EXISTS ct_x4")


def test_q_ctas_char_varchar_chain(eng, spark):
    """ctas_char.q: CTAS from a CHAR-typed table then a view over the
    CTAS — values flow through the chain."""
    spark.sql("DROP TABLE IF EXISTS ct_c1")
    spark.sql("DROP TABLE IF EXISTS ct_c2")
    eng.sql(
        "CREATE TABLE ct_c1 (key CHAR(10), value STRING) "
        "STORED AS PARQUET"
    )
    eng.sql(
        "INSERT OVERWRITE TABLE ct_c1 SELECT key, value FROM ct_src "
        "ORDER BY key, value LIMIT 5"
    )
    eng.sql(
        "CREATE TABLE ct_c2 STORED AS PARQUET AS SELECT key, value "
        "FROM ct_c1"
    )
    eng.sql("CREATE VIEW ct_c3 AS SELECT key, value FROM ct_c2")
    n1 = eng.sql("SELECT count(*) AS c FROM ct_c2").collect()[0].c
    n2 = eng.sql("SELECT count(*) AS c FROM ct_c3").collect()[0].c
    assert n1 == n2 == 5
    eng.sql("DROP VIEW IF EXISTS ct_c3")
    spark.sql("DROP TABLE IF EXISTS ct_c1")
    spark.sql("DROP TABLE IF EXISTS ct_c2")
