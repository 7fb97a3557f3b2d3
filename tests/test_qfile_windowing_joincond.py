"""clientpositive `.q` slice, round 6d: windowing_expressions.q (named
WINDOW clauses with Hive's distribute/sort spelling, frame-identity
equivalences) and join_cond_pushdown_1.q (3-way self-joins whose ON
conditions reference earlier tables, compound keys, or constants —
pushdown must not change results). Reference:
ql/src/test/queries/clientpositive/windowing_expressions.q,
join_cond_pushdown_1.q.

Hive's `sum(lag(x)) over w` (a window function nested inside a
windowed aggregate) has no native Spark form; Engine.sql hoists the
inner function into a subquery when Spark rejects the nesting
(engine.py _rewrite_nested_window), and the last test here replays the
golden's nested identity through that path."""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle, TABLES

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def qenv(spark):
    eng = Engine(spark=spark, sf_dir=SF)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    yield eng, con
    con.close()


def test_q_windowing_named_window_clause(qenv):
    """windowing_expressions.q: one named WINDOW w1 (Hive's
    distribute by / sort by spelling) referenced by several functions —
    rank, default-frame sum, explicit rows-frame sum."""
    eng, con = qenv
    got = eng.sql(
        """
        select p_brand, p_partkey,
               rank() over w1 AS r,
               round(sum(p_retailprice) over w1, 2) AS s1,
               round(sum(p_retailprice) over (partition by p_brand
                 order by p_retailprice, p_partkey rows between
                 unbounded preceding and current row), 2) AS s2
        from part
        window w1 as (distribute by p_brand
                      sort by p_retailprice, p_partkey)
        """
    )
    assert_matches_oracle(
        got, con,
        """
        SELECT p_brand, p_partkey,
               CAST(rank() OVER w1 AS BIGINT) AS r,
               ROUND(SUM(p_retailprice) OVER w1, 2) AS s1,
               ROUND(SUM(p_retailprice) OVER (PARTITION BY p_brand
                 ORDER BY p_retailprice, p_partkey ROWS BETWEEN
                 UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS s2
        FROM part
        WINDOW w1 AS (PARTITION BY p_brand
                      ORDER BY p_retailprice, p_partkey)
        """,
    )


def test_q_windowing_frame_identity(qenv):
    """windowing_expressions.q equivalence golden: over the default
    frame, max-min == last_value-first_value must hold on EVERY row
    (ties included — the default RANGE frame makes last_value the
    current peer group's last)."""
    eng, con = qenv
    got = eng.sql(
        """
        select p_brand, p_retailprice,
          (max(p_retailprice) over w1 - min(p_retailprice) over w1) =
          (last_value(p_retailprice) over w1 -
           first_value(p_retailprice) over w1) AS ok
        from part
        window w1 as (distribute by p_brand sort by p_retailprice)
        """
    )
    rows = got.collect()
    assert len(rows) > 0 and all(r.ok for r in rows)
    assert_matches_oracle(
        got, con,
        """
        SELECT p_brand, p_retailprice,
          (MAX(p_retailprice) OVER w1 - MIN(p_retailprice) OVER w1) =
          (last_value(p_retailprice) OVER w1 -
           first_value(p_retailprice) OVER w1) AS ok
        FROM part
        WINDOW w1 AS (PARTITION BY p_brand ORDER BY p_retailprice
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
    )


def test_q_join_cond_pushdown_transposed_keys(qenv):
    """join_cond_pushdown_1.q: the same 3-way name join written with
    the equality operands transposed (p2=p1, p3=p2) — condition
    normalization must produce identical results."""
    eng, con = qenv
    proj = ("p1.p_partkey AS k1, p2.p_partkey AS k2, p3.p_partkey AS k3, "
            "p1.p_name AS n")
    a = eng.sql(
        f"select {proj} from part p1 join part p2 join part p3 "
        "on p1.p_name = p2.p_name and p2.p_name = p3.p_name"
    )
    oracle = (
        f"SELECT {proj} FROM part p1 JOIN part p2 ON p1.p_name = p2.p_name "
        "JOIN part p3 ON p2.p_name = p3.p_name"
    )
    assert_matches_oracle(a, con, oracle)
    b = eng.sql(
        f"select {proj} from part p1 join part p2 join part p3 "
        "on p2.p_name = p1.p_name and p3.p_name = p2.p_name"
    )
    assert_matches_oracle(b, con, oracle)


def test_q_join_cond_pushdown_compound_and_constant(qenv):
    """join_cond_pushdown_1.q tail: a compound arithmetic condition
    (p2.p_partkey + p1.p_partkey = p1.p_partkey ⇒ p2.p_partkey = 0 —
    satisfied by this fixture's partkey-0 row, so it degenerates to a
    one-row filter crossed with p1) and a CONSTANT equality on one
    table (p2.p_partkey = 1 — a filter smuggled into the join
    condition, cross-joined with the name join)."""
    eng, con = qenv
    compound = eng.sql(
        "select p1.p_partkey AS k1, p2.p_partkey AS k2, "
        "p3.p_partkey AS k3 "
        "from part p1 join part p2 join part p3 "
        "on p2.p_partkey + p1.p_partkey = p1.p_partkey "
        "and p3.p_name = p2.p_name"
    )
    assert_matches_oracle(
        compound, con,
        "SELECT p1.p_partkey AS k1, p2.p_partkey AS k2, "
        "p3.p_partkey AS k3 "
        "FROM part p1 CROSS JOIN part p2 JOIN part p3 "
        "ON p3.p_name = p2.p_name "
        "WHERE p2.p_partkey + p1.p_partkey = p1.p_partkey",
    )
    got = eng.sql(
        "select p1.p_partkey AS k1, p2.p_partkey AS k2, "
        "p3.p_partkey AS k3 "
        "from part p1 join part p2 join part p3 "
        "on p2.p_partkey = 1 and p3.p_name = p2.p_name"
    )
    assert_matches_oracle(
        got, con,
        "SELECT p1.p_partkey AS k1, p2.p_partkey AS k2, "
        "p3.p_partkey AS k3 "
        "FROM part p1 CROSS JOIN part p2 JOIN part p3 "
        "ON p3.p_name = p2.p_name WHERE p2.p_partkey = 1",
    )


def test_q_windowing_nested_window_in_aggregate(qenv):
    """windowing_expressions.q's nested form — sum(lag(x,1,0.0)) over
    w1, a window function INSIDE a windowed aggregate. Spark rejects
    the nesting; Engine.sql hoists the inner lag into a subquery on
    that exact error and re-runs. The golden's identity must hold on
    every row: running sum == running sum of lagged + last_value."""
    eng, con = qenv
    got = eng.sql(
        """
        select p_brand, p_retailprice,
               round(sum(p_retailprice) over w1, 2) =
               round(sum(lag(p_retailprice,1,0.0)) over w1 +
                     last_value(p_retailprice) over w1, 2) AS ok
        from part
        window w1 as (distribute by p_brand sort by p_retailprice)
        """
    )
    rows = got.collect()
    assert len(rows) > 0 and all(r.ok for r in rows)
    # value-diff the hoisted computation itself against DuckDB (which
    # also requires the explicit two-level form)
    got2 = eng.sql(
        """
        select p_brand, p_partkey,
               round(sum(lag(p_retailprice,1,0.0)) over w1, 2) AS s
        from part
        window w1 as (distribute by p_brand
                      sort by p_retailprice, p_partkey)
        """
    )
    assert_matches_oracle(
        got2, con,
        """
        SELECT p_brand, p_partkey, ROUND(SUM(lg) OVER w1, 2) AS s
        FROM (
          SELECT p_brand, p_partkey, p_retailprice,
                 lag(p_retailprice, 1, 0.0) OVER
                   (PARTITION BY p_brand
                    ORDER BY p_retailprice, p_partkey) AS lg
          FROM part
        ) t
        WINDOW w1 AS (PARTITION BY p_brand
                      ORDER BY p_retailprice, p_partkey
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
    )
