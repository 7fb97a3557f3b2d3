"""clientpositive `.q` slice, round 8: orc_predicate_pushdown.q
shapes (reference: ql/src/test/queries/clientpositive/). ORC is the
reference's primary columnar format (§2.2); the golden pins that
predicates REACH the ORC reader (SARGs — hive.optimize.index.filter)
and that the filtered answers stay exact. Spark's ORC datasource does
the same via PushedFilters; values are checked against the in-memory
fixture (DuckDB reads no ORC)."""

from __future__ import annotations

import pytest

from hive_2_3_2_spark.engine import Engine

ROWS = [(i % 7, (i * 3) % 100, f"s_{i % 13}", float(i) / 4, i % 2 == 0)
        for i in range(400)]
SCHEMA = "t int, si int, s string, f double, bo boolean"


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfile_orc")
    eng = Engine(spark=spark)
    p = str(root / "orc_pred")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(2).write.orc(p)
    from hive_2_3_2_spark.sources.readers import read_orc

    read_orc(spark, p).createOrReplaceTempView("orc_pred")
    return eng


def test_q_orc_predicates_reach_reader(qenv):
    eng = qenv
    df = eng.sql("SELECT t, si, s FROM orc_pred WHERE t < 2 AND si > 50")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan, plan
    assert "LessThan(t,2)" in plan and "GreaterThan(si,50)" in plan, plan
    expect = [(t, si, s) for t, si, s, f, bo in ROWS if t < 2 and si > 50]
    got = [(r.t, r.si, r.s) for r in df.collect()]
    assert sorted(got) == sorted(expect)


def test_q_orc_filtered_aggregates_exact(qenv):
    eng = qenv
    for pred, pyf in (
        ("t < 2", lambda r: r[0] < 2),
        ("t > 2", lambda r: r[0] > 2),
        ("t <= 2", lambda r: r[0] <= 2),
        ("si BETWEEN 10 AND 30", lambda r: 10 <= r[1] <= 30),
        ("s = 's_3'", lambda r: r[2] == "s_3"),
        ("bo", lambda r: r[4]),
        ("f < 10.0 OR t = 6", lambda r: r[3] < 10.0 or r[0] == 6),
    ):
        n = eng.sql(
            f"SELECT count(*) AS c FROM orc_pred WHERE {pred}"
        ).collect()[0].c
        assert n == sum(1 for r in ROWS if pyf(r)), pred


def test_q_orc_engine_ddl_roundtrip(qenv, spark, tmp_path):
    """CREATE TABLE ... STORED AS ORC through the engine + INSERT +
    read-back (the STORED AS rewrite's ORC leg)."""
    eng = Engine(spark=spark)
    spark.sql("DROP TABLE IF EXISTS orc_rt")
    eng.sql("CREATE TABLE orc_rt (a INT, b STRING) STORED AS ORC")
    eng.sql("INSERT INTO TABLE orc_rt VALUES (1, 'x'), (2, 'y')")
    rows = eng.sql("SELECT a, b FROM orc_rt ORDER BY a").collect()
    assert [(r.a, r.b) for r in rows] == [(1, "x"), (2, "y")]
    # the table is genuinely ORC on disk
    loc = spark.sql("DESCRIBE EXTENDED orc_rt").collect()
    assert any("orc" in str(r).lower() for r in loc)
    spark.sql("DROP TABLE IF EXISTS orc_rt")
