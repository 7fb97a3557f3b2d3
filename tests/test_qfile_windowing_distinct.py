"""clientpositive `.q` slice, round 6i: windowing_distinct.q
(reference: ql/src/test/queries/clientpositive/windowing_distinct.q;
HIVE-9534) — DISTINCT aggregates inside window functions, which
Spark's analyzer rejects outright. The engine rewrites them over the
frame-respecting collect_set window (engine.py
_rewrite_distinct_window); every golden shape is value-diffed against
DuckDB's native distinct-window support (an independent
implementation).

Typing (since the r7 ADVICE fix): SUM(DISTINCT integral) returns
BIGINT like Hive (the fold accumulator is seeded with a typed NULL of
``elem + 0L``); AVG(DISTINCT integral) is DOUBLE; DECIMAL inputs stay
DECIMAL (accumulator type pinned on retry). Oracles cast accordingly.

Fixture mirrors data/files/windowing_distinct.txt's shape: duplicated
rows inside each index partition plus a NULL cell, so DISTINCT vs
plain aggregates genuinely differ and NULL exclusion is observable.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

ROWS = [
    (1, 19, 26.43, "alice zipper"),
    (1, 19, 26.43, "alice zipper"),
    (1, 35, 96.91, "katie davidson"),
    (1, None, 96.91, "holly king"),
    (2, 124, 74.72, "bob davidson"),
    (2, 111, 13.01, "xavier quirinius"),
    (2, 124, 74.72, "bob davidson"),
    (2, 42, None, "holly king"),
]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_windist")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    p = str(root / "wd_t")
    spark.createDataFrame(
        ROWS, "index int, t int, f double, s string"
    ).coalesce(1).write.parquet(p)
    eng.register_table("wd_t", p)
    con.execute(
        f"CREATE VIEW wd_t AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield eng, con
    con.close()


def test_q_count_distinct_over_partition(qenv):
    """windowing_distinct.q block 1: COUNT(DISTINCT col) and
    COUNT(DISTINCT expr) over bare partitions, NULLs excluded."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "SELECT index, "
            "COUNT(DISTINCT t) OVER (PARTITION BY index) AS ct, "
            "COUNT(DISTINCT f) OVER (PARTITION BY index) AS cf, "
            "COUNT(DISTINCT s) OVER (PARTITION BY index) AS cs, "
            "COUNT(DISTINCT concat('Mr.', s)) OVER (PARTITION BY index) "
            "AS cms FROM wd_t"
        ),
        con,
        "SELECT index, "
        "CAST(count(DISTINCT t) OVER (PARTITION BY index) AS INT) AS ct, "
        "CAST(count(DISTINCT f) OVER (PARTITION BY index) AS INT) AS cf, "
        "CAST(count(DISTINCT s) OVER (PARTITION BY index) AS INT) AS cs, "
        "CAST(count(DISTINCT concat('Mr.', s)) OVER (PARTITION BY index) "
        "AS INT) AS cms FROM wd_t",
    )


def test_q_sum_avg_distinct_over_partition(qenv):
    """windowing_distinct.q blocks 2-3: SUM/AVG(DISTINCT) over bare
    partitions (Hive-typed: BIGINT sum for the int column; values
    match the oracle's)."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "SELECT index, "
            "ROUND(SUM(DISTINCT t) OVER (PARTITION BY index), 3) AS st, "
            "ROUND(SUM(DISTINCT f) OVER (PARTITION BY index), 3) AS sf, "
            "ROUND(AVG(DISTINCT t) OVER (PARTITION BY index), 3) AS at, "
            "ROUND(AVG(DISTINCT f) OVER (PARTITION BY index), 3) AS af "
            "FROM wd_t"
        ),
        con,
        "SELECT index, "
        "ROUND(CAST(sum(DISTINCT t) OVER (PARTITION BY index) AS DOUBLE), "
        "3) AS st, "
        "ROUND(sum(DISTINCT f) OVER (PARTITION BY index), 3) AS sf, "
        "ROUND(CAST(avg(DISTINCT t) OVER (PARTITION BY index) AS DOUBLE), "
        "3) AS at, "
        "ROUND(avg(DISTINCT f) OVER (PARTITION BY index), 3) AS af "
        "FROM wd_t",
    )


def test_q_count_distinct_with_rows_frames(qenv):
    """windowing_distinct.q block 4: COUNT(DISTINCT f) under four ROWS
    frames including preceding-only and following-only (empty frames
    count 0). Hive and Spark default ASC ordering to NULLS FIRST;
    DuckDB defaults to NULLS LAST, so the oracle pins NULLS FIRST."""
    eng, con = qenv
    frames = (
        "ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING",
        "ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING",
    )
    spark_cols = ", ".join(
        f"COUNT(DISTINCT f) OVER (PARTITION BY index ORDER BY f {fr}) "
        f"AS c{i}" for i, fr in enumerate(frames)
    )
    duck_cols = ", ".join(
        f"CAST(count(DISTINCT f) OVER (PARTITION BY index ORDER BY f NULLS FIRST {fr}) "
        f"AS INT) AS c{i}" for i, fr in enumerate(frames)
    )
    assert_matches_oracle(
        eng.sql(f"SELECT index, f, {spark_cols} FROM wd_t"),
        con,
        f"SELECT index, f, {duck_cols} FROM wd_t",
    )


def test_q_sum_distinct_with_rows_frames(qenv):
    """windowing_distinct.q block 5: SUM(DISTINCT f) under the same
    frames — an empty frame yields NULL (the NULL-seed contract)."""
    eng, con = qenv
    frames = (
        "ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING",
        "ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING",
    )
    spark_cols = ", ".join(
        f"ROUND(SUM(DISTINCT f) OVER (PARTITION BY index ORDER BY f {fr}), "
        f"3) AS s{i}" for i, fr in enumerate(frames)
    )
    duck_cols = ", ".join(
        f"ROUND(sum(DISTINCT f) OVER (PARTITION BY index ORDER BY f NULLS FIRST {fr}), "
        f"3) AS s{i}" for i, fr in enumerate(frames)
    )
    assert_matches_oracle(
        eng.sql(f"SELECT index, f, {spark_cols} FROM wd_t"),
        con,
        f"SELECT index, f, {duck_cols} FROM wd_t",
    )


def test_q_count_distinct_multi_arg_null_guard(qenv):
    """Hive's multi-argument COUNT(DISTINCT a, b) OVER: a row with ANY
    NULL argument is excluded from the distinct count."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "SELECT index, "
            "COUNT(DISTINCT t, f) OVER (PARTITION BY index) AS c "
            "FROM wd_t"
        ),
        con,
        # DuckDB's multi-arg count(DISTINCT) counts distinct (t, f)
        # pairs with any-null rows excluded, same as Hive
        "SELECT index, CAST(count(DISTINCT CASE WHEN t IS NULL OR f IS "
        "NULL THEN NULL ELSE (t, f) END) OVER (PARTITION BY index) "
        "AS INT) AS c FROM wd_t",
    )


def test_q_distinct_window_rewriter_inert_cases(qenv):
    """The rewrite must not touch plain DISTINCT aggregates (no OVER)
    or DISTINCT text inside string literals."""
    from hive_2_3_2_spark.engine import _rewrite_distinct_window

    s = "SELECT count(DISTINCT key) FROM t"
    assert _rewrite_distinct_window(s) == s
    s2 = "SELECT 'count(distinct x) over (w)' AS doc FROM t"
    assert _rewrite_distinct_window(s2) == s2
    eng, _ = qenv
    # plain distinct aggregate still runs through the engine unchanged
    assert eng.sql(
        "SELECT count(DISTINCT t) AS c FROM wd_t"
    ).collect()[0].c == 5


def test_q_alias_in_window_spec(qenv, spark):
    """distinct_windowing_no_cbo.q: a SELECT-list alias (here an
    aggregate's) referenced inside a window ORDER BY — Hive resolves
    it; Spark raises LATERAL_COLUMN_ALIAS_IN_WINDOW and the engine
    inlines the defining expression on retry."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "select index, max(f) mf, "
            "rank() over ( partition by index order by mf ) AS r "
            "FROM wd_t GROUP BY index HAVING max(f) > 0"
        ),
        con,
        "select index, max(f) AS mf, "
        "rank() over (partition by index order by max(f)) AS r "
        "FROM wd_t GROUP BY index HAVING max(f) > 0",
    )
    # plain-column alias form
    assert_matches_oracle(
        eng.sql(
            "select index, f + 1 AS fplus, "
            "rank() over (partition by index order by fplus) AS r "
            "FROM wd_t WHERE f IS NOT NULL"
        ),
        con,
        "select index, f + 1 AS fplus, "
        "rank() over (partition by index order by f + 1) AS r "
        "FROM wd_t WHERE f IS NOT NULL",
    )


def test_q_ptfgroupbyjoin_window_over_grouped(qenv, spark):
    """ptfgroupbyjoin.q: row_number() over grouped output (partition =
    the full group key, so rnum is deterministically 1) inside a
    subquery joined to a dimension, and windowing_gby.q's
    rank-over-aggregate-ratio shape."""
    eng, con = qenv
    spark.createDataFrame(
        [(1, 10), (1, 10), (2, 20), (3, 10)], "id int, fkey int"
    ).createOrReplaceTempView("wd_tlb1")
    spark.createDataFrame(
        [(10, "n10"), (20, "n20")], "fid int, name string"
    ).createOrReplaceTempView("wd_tlb2")
    got = sorted(tuple(r) for r in eng.sql(
        "select ddd.id, ddd.fkey, aaa.name, ddd.rnum from ("
        "select id, fkey, row_number() over (partition by id, fkey) "
        "as rnum from wd_tlb1 group by id, fkey) ddd "
        "inner join wd_tlb2 aaa on aaa.fid = ddd.fkey"
    ).collect())
    assert got == [(1, 10, "n10", 1), (2, 20, "n20", 1), (3, 10, "n10", 1)]
    # windowing_gby.q: rank over an aggregate ratio computed in a
    # grouped subquery
    rows = eng.sql(
        "select rank() over (order by ratio) as return_rank from "
        "(select sum(f)/sum(t) as ratio from wd_t group by index) in_web"
    ).collect()
    assert sorted(r.return_rank for r in rows) == [1, 2]
