"""clientpositive windowing tail, round 9 (reference:
ql/src/test/queries/clientpositive/windowing_duplicate.q,
windowing_columnPruning.q, windowing_adjust_rowcontainer_sz.q,
windowing_udaf2.q, windowing_rank.q (the PTFPPD shapes),
windowing_streaming.q (rank-filter limit pushdown)).

over10k is synthesized (same columns/types as data/files/over10k);
the goldens' bare LIMIT heads become total orders (repo convention —
an un-ordered LIMIT subset is engine-arbitrary)."""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

ROWS = []
for i in range(400):
    ROWS.append((
        i % 6,                       # t
        (i * 3) % 11,                # si
        i % 17 - 8,                  # i
        (i * 13) % 23,               # b
        float(i % 9) / 2,            # f
        float(i) * 1.25,             # d
        bool(i % 2),                 # bo
        f"user_{i % 29}",            # s
        f"2013-03-{(i % 28) + 1:02d}",  # ts (date string)
        round((i % 100) / 2.0 + 0.5, 2),  # dec
    ))
SCHEMA = ("t int, si int, i int, b bigint, f double, d double, "
          "bo boolean, s string, ts string, dec double")


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfile_wtail")
    eng = Engine(spark=spark)
    p = str(root / "over10k_wt")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(2).write.parquet(p)
    eng.register_table("over10k_wt", p)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW over10k_wt AS SELECT * FROM "
        f"read_parquet('{p}/*.parquet')"
    )
    yield eng, con
    con.close()


def _chk(eng, con, hive_sql, duck_sql=None):
    df = eng.sql(hive_sql)
    assert_matches_oracle(df, con, duck_sql or hive_sql)
    return df


def test_q_windowing_duplicate_window_over_window(qenv):
    """windowing_duplicate.q: an outer window aggregates an INNER
    window's output (sum over lag) — the duplicate-expression
    elimination must not conflate the two specs."""
    eng, con = qenv
    _chk(
        eng, con,
        """
        select s AS s, ts AS ts,
          sum(bound3) OVER (PARTITION BY s ORDER BY ts, i
            rows between unbounded preceding and current row) as bound1
        from (
          select s, ts, i,
          lag(i) over (partition by s order by ts, i) as bound3
          from over10k_wt
        ) t
        """,
        """
        SELECT s AS s, ts AS ts,
          sum(bound3) OVER (PARTITION BY s
            ORDER BY ts NULLS FIRST, i NULLS FIRST
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bound1
        FROM (
          SELECT s, ts, i,
          lag(i) OVER (PARTITION BY s
            ORDER BY ts NULLS FIRST, i NULLS FIRST) AS bound3
          FROM over10k_wt
        ) t
        """,
    )


def test_q_windowing_column_pruning(qenv):
    """windowing_columnPruning.q: the SELECT projects NEITHER window
    key — values match, and the parquet scan's ReadSchema carries only
    the columns the window actually needs (pruning through the window
    operator; at 100 TB reading 2 of 10 columns is the difference
    between a metadata-light scan and a full-width one)."""
    eng, con = qenv
    df = _chk(
        eng, con,
        """
        select i AS i,
        sum(d) over (distribute by s sort by t, i
          rows between unbounded preceding and current row) as s1
        from over10k_wt
        """,
        """
        SELECT i AS i,
        sum(d) OVER (PARTITION BY s
          ORDER BY t NULLS FIRST, i NULLS FIRST
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1
        FROM over10k_wt
        """,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert m, plan
    schema_part = m[0].split("ReadSchema:")[1]
    for col in ("d", "s", "t", "i"):
        assert f"{col}:" in schema_part
    for col in ("si", "bo", "dec", "ts"):
        assert f"{col}:" not in schema_part, schema_part


def test_q_windowing_adjust_rowcontainer_sz(qenv):
    """windowing_adjust_rowcontainer_sz.q: value parity for the basic
    rank/dense_rank/running-sum triple (the golden only shrinks Hive's
    in-memory row container — a knob with no Spark analogue)."""
    eng, con = qenv
    _chk(
        eng, con,
        """
        select s, t, i,
        rank() over(distribute by s sort by t, i) as r,
        dense_rank() over(distribute by s sort by t, i) as dr,
        sum(b) over (distribute by s sort by t, i
          rows between unbounded preceding and current row) as s1
        from over10k_wt
        """,
        """
        SELECT s, t, i,
        rank() OVER w AS r,
        dense_rank() OVER w AS dr,
        sum(b) OVER (PARTITION BY s
          ORDER BY t NULLS FIRST, i NULLS FIRST
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1
        FROM over10k_wt
        WINDOW w AS (PARTITION BY s ORDER BY t NULLS FIRST, i NULLS FIRST)
        """,
    )


def test_q_windowing_udaf2_user_registered_builtin(qenv):
    """windowing_udaf2.q: a Hive BUILTIN UDAF class registered under a
    user name windows like the builtin — mysum(key) OVER () ==
    sum(key) OVER ()."""
    eng, con = qenv
    eng.sql(
        "create temporary function mysum as "
        "'org.apache.hadoop.hive.ql.udf.generic.GenericUDAFSum'"
    )
    try:
        _chk(
            eng, con,
            "select cast(sum(i) over () as bigint) AS s1, "
            "cast(mysum(i) over () as bigint) AS s2 "
            "from over10k_wt order by s1 limit 1",
            "SELECT CAST(sum(i) OVER () AS BIGINT) AS s1, "
            "CAST(sum(i) OVER () AS BIGINT) AS s2 "
            "FROM over10k_wt ORDER BY s1 LIMIT 1",
        )
    finally:
        eng.sql("drop temporary function mysum")
    assert "mysum" not in eng.fn_aliases


def test_q_windowing_rank_ptf_ppd_shapes(qenv):
    """windowing_rank.q PTFPPD block: rank over a JOIN subquery with
    the filter OUTSIDE (rnk = 1) and with a non-rank filter (dec
    filter) — predicate pushdown through the PTF must not change
    values."""
    eng, con = qenv
    _chk(
        eng, con,
        """
        select ts, dec, rnk
        from
          (select ts, dec,
                  rank() over (partition by ts order by dec) as rnk
                  from
                    (select other.ts, other.dec
                     from over10k_wt other
                     join over10k_wt on (other.b = over10k_wt.b)
                     where other.t < 2
                    ) joined
          ) ranked
        where rnk = 1
        order by ts, dec
        """,
        """
        SELECT ts, dec, rnk
        FROM
          (SELECT ts, dec,
                  rank() OVER (PARTITION BY ts
                    ORDER BY dec NULLS FIRST) AS rnk
                  FROM
                    (SELECT other.ts, other.dec
                     FROM over10k_wt other
                     JOIN over10k_wt ON (other.b = over10k_wt.b)
                     WHERE other.t < 2
                    ) joined
          ) ranked
        WHERE rnk = 1
        ORDER BY ts, dec
        """,
    )


def test_q_windowing_streaming_rank_filter_pushdown(qenv):
    """windowing_streaming.q: rank() filtered by r < N — values match
    DuckDB AND the plan carries Spark's WindowGroupLimit (the
    per-partition top-N short-circuit that makes this streamable — at
    100 TB the window never materializes rows past rank N)."""
    eng, con = qenv
    df = _chk(
        eng, con,
        """
        select s, t, f, r from
        (select s, t, f, rank() over(partition by t order by f, s, i) r
         from over10k_wt) a
        where r < 6 and t < 5
        order by s, t, f, r
        """,
        """
        SELECT s, t, f, r FROM
        (SELECT s, t, f, i, rank() OVER (PARTITION BY t
           ORDER BY f NULLS FIRST, s NULLS FIRST, i NULLS FIRST) r
         FROM over10k_wt) a
        WHERE r < 6 AND t < 5
        ORDER BY s, t, f, r
        """,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
