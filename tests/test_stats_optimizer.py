"""Stats-answered queries — Hive StatsOptimizer parity (reference:
ql/src/java/org/apache/hadoop/hive/ql/optimizer/StatsOptimizer.java,
wired at Optimizer.java:227 behind hive.compute.query.using.stats,
default true per HiveConf.java:2043).

Contract under test: count(*)/count(1) from basic stats, count(col) =
numRows - numNulls, min/max(col) from column stats — served ONLY while
the table's data files match the fingerprint recorded at ANALYZE time;
any write (engine DML or external) falls back to real execution, the
engine's version of Hive dropping COLUMN_STATS_ACCURATE."""

from __future__ import annotations

import os

import pytest

from hive_2_3_2_spark.engine import Engine
from hive_2_3_2_spark.plans import explain_str


@pytest.fixture()
def senv(spark, tmp_path):
    eng = Engine(spark=spark)
    p = str(tmp_path / "stats_t")
    spark.createDataFrame(
        [(1, 10, "a"), (2, None, "bb"), (3, 30, None), (4, 40, "dd")],
        "id int, n int, s string",
    ).coalesce(1).write.parquet(p)
    eng.register_table("stats_t", p)
    return eng, p


def _is_stats_answered(df) -> bool:
    plan = explain_str(df)
    return (
        "ExistingRDD" in plan
        and "Scan parquet" not in plan
        and "Aggregate" not in plan
    )


def test_answers_from_stats_after_analyze(senv):
    eng, _ = senv
    eng.sql("ANALYZE TABLE stats_t COMPUTE STATISTICS")
    eng.sql("ANALYZE TABLE stats_t COMPUTE STATISTICS FOR COLUMNS id, n, s")
    df = eng.sql(
        "SELECT count(*) AS c, count(n) AS cn, count(s) AS cs, "
        "min(n) AS mn, max(n) AS mx, min(id) AS mi FROM stats_t"
    )
    assert _is_stats_answered(df), explain_str(df)
    row = df.collect()[0]
    assert (row.c, row.cn, row.cs, row.mn, row.mx, row.mi) == (
        4, 3, 3, 10, 40, 1,
    )


def test_no_answer_without_analyze(senv):
    eng, _ = senv
    df = eng.sql("SELECT count(*) AS c FROM stats_t")
    assert not _is_stats_answered(df)
    assert df.collect()[0].c == 4


def test_conf_off_disables(senv):
    eng, _ = senv
    eng.sql("ANALYZE TABLE stats_t COMPUTE STATISTICS")
    eng.sql("SET hive.compute.query.using.stats=false")
    df = eng.sql("SELECT count(*) AS c FROM stats_t")
    assert not _is_stats_answered(df)
    assert df.collect()[0].c == 4


def test_stale_stats_fall_back(senv, spark):
    """An external write after ANALYZE changes the data-file
    fingerprint: the engine must re-execute, not serve the stale
    count."""
    eng, p = senv
    eng.sql("ANALYZE TABLE stats_t COMPUTE STATISTICS")
    assert eng.sql("SELECT count(*) AS c FROM stats_t").collect()[0].c == 4
    spark.createDataFrame([(9, 90, "z")], "id int, n int, s string") \
        .coalesce(1).write.mode("append").parquet(p)
    # standard Spark contract for external writes: refresh the cached
    # file listing (REFRESH TABLE); the stats fingerprint is checked
    # independently of it
    spark.catalog.refreshTable("stats_t")
    df = eng.sql("SELECT count(*) AS c FROM stats_t")
    assert not _is_stats_answered(df)
    assert df.collect()[0].c == 5
    # re-ANALYZE refreshes the fingerprint → answered again, new value
    eng.sql("ANALYZE TABLE stats_t COMPUTE STATISTICS")
    df2 = eng.sql("SELECT count(*) AS c FROM stats_t")
    assert _is_stats_answered(df2)
    assert df2.collect()[0].c == 5


def test_unsupported_shapes_fall_back(senv):
    eng, _ = senv
    eng.sql("ANALYZE TABLE stats_t COMPUTE STATISTICS")
    eng.sql("ANALYZE TABLE stats_t COMPUTE STATISTICS FOR COLUMNS id, n, s")
    # WHERE clause → real execution
    df = eng.sql("SELECT count(*) AS c FROM stats_t WHERE n > 10")
    assert not _is_stats_answered(df)
    assert df.collect()[0].c == 2
    # min of a STRING column: stats store lengths, not extrema →
    # real execution (the reference bails out the same way)
    df = eng.sql("SELECT min(s) AS m FROM stats_t")
    assert not _is_stats_answered(df)
    assert df.collect()[0].m == "a"
    # non-aggregate select list → untouched
    df = eng.sql("SELECT id FROM stats_t")
    assert not _is_stats_answered(df)
    assert df.count() == 4
    # count(DISTINCT x) is NOT answerable from these stats
    df = eng.sql("SELECT count(DISTINCT n) AS c FROM stats_t")
    assert not _is_stats_answered(df)
    assert df.collect()[0].c == 3


def test_engine_dml_invalidates(senv):
    """A write through the ENGINE's own DML also flips the
    fingerprint (no special-case plumbing — same files, same
    digest)."""
    eng, _ = senv
    eng.sql("ANALYZE TABLE stats_t COMPUTE STATISTICS")
    eng.sql("DELETE FROM stats_t WHERE id = 4")
    df = eng.sql("SELECT count(*) AS c FROM stats_t")
    assert not _is_stats_answered(df)
    assert df.collect()[0].c == 3
