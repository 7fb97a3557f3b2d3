"""windowing_windowspec4.q + having2.q + limit_pushdown2.q replay:
the full aggregate battery (max/min/first_value/last_value/avg/sum/
collect_set/count) over ONE explicit ROWS frame; compound HAVING with
QUALIFIED aggregate arguments over a join (plus `default.`-qualified
engine tables); grouped ORDER BY ... LIMIT pushdown shapes."""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_wht")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    rows = [(str(i % 83), f"val_{i % 83}") for i in range(400)]
    p = str(root / "wht_src")
    spark.createDataFrame(rows, "key string, value string").coalesce(
        1
    ).write.parquet(p)
    eng.register_table("wht_src", p)
    con.execute(
        f"CREATE VIEW wht_src AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield eng, con
    con.close()


def test_q_windowspec4_aggregate_battery_one_frame(qenv, spark, tmp_path):
    """windowing_windowspec4.q: every aggregate over (rows between 1
    preceding and 7 following) on a 3-row partition — frames clip at
    partition edges; collect_set carries the frame's distinct set."""
    eng, _ = qenv
    p = str(tmp_path / "wht_small")
    spark.createDataFrame(
        [(3, "a"), (1, "a"), (2, "a")], "i int, type string"
    ).coalesce(1).write.parquet(p)
    eng.register_table("wht_small", p)
    rows = eng.sql(
        "select type, i, "
        "max(i) over w AS mx, min(i) over w AS mn, "
        "first_value(i) over w AS fv, last_value(i) over w AS lv, "
        "avg(i) over w AS av, sum(i) over w AS sm, "
        "collect_set(i) over w AS cs, count(i) over w AS cn "
        "from wht_small "
        "window w as (partition by type order by i rows between 1 "
        "preceding and 7 following)"
    ).collect()
    got = {r.i: r for r in rows}
    # i=1: frame [1,2,3]; i=2: frame [1,2,3]; i=3: frame [2,3]
    assert (got[1].mx, got[1].mn, got[1].fv, got[1].lv,
            got[1].sm, got[1].cn) == (3, 1, 1, 3, 6, 3)
    assert (got[2].mx, got[2].mn, got[2].fv, got[2].lv,
            got[2].sm, got[2].cn) == (3, 1, 1, 3, 6, 3)
    assert (got[3].mx, got[3].mn, got[3].fv, got[3].lv,
            got[3].sm, got[3].cn) == (3, 2, 2, 3, 5, 2)
    assert sorted(got[3].cs) == [2, 3]
    assert got[1].av == pytest.approx(2.0)


def test_q_having2_compound_qualified_aggregates(qenv):
    """having2.q: HAVING conjunctions over MULTIPLE aggregates with
    table-qualified arguments, over a self-join, reading the engine
    tables via `default.` qualification; conjunct ORDER must not
    matter."""
    eng, con = qenv
    oracle = (
        "SELECT s1.key AS customer_name FROM wht_src s1 JOIN wht_src "
        "s2 ON s1.key = s2.key GROUP BY s1.key HAVING "
        "SUM(CAST(s1.key AS DOUBLE)) <= 4074689.0 AND "
        "AVG(CAST(s1.key AS DOUBLE)) <= 822 AND COUNT(s2.value) > 4"
    )
    for having in (
        "(SUM(s1.key) <= 4074689.000000041) AND (AVG(s1.key) <= 822) "
        "AND (COUNT(s2.value) > 4)",
        "(COUNT(s2.value) > 4) AND (SUM(s1.key) <= 4074689.000000041) "
        "AND (AVG(s1.key) <= 822)",
    ):
        assert_matches_oracle(
            eng.sql(
                "SELECT s1.key AS customer_name FROM default.wht_src "
                "s1 join default.wht_src s2 on s1.key = s2.key "
                f"GROUP BY s1.key HAVING ({having})"
            ),
            con, oracle,
        )


def test_q_limit_pushdown2_grouped_order_limit(qenv):
    """limit_pushdown2.q: GROUP BY two keys + ORDER BY both + LIMIT —
    deterministic prefix, avg over an arithmetic expression."""
    eng, con = qenv
    got = eng.sql(
        "select key, value, avg(key + 1) AS a from wht_src group by "
        "key, value order by key, value limit 20"
    ).collect()
    exp = con.execute(
        "SELECT key, value, avg(CAST(key AS DOUBLE) + 1) FROM wht_src "
        "GROUP BY key, value ORDER BY key, value LIMIT 20"
    ).fetchall()
    assert [(r.key, r.value, r.a) for r in got] == [
        (k, v, pytest.approx(a)) for k, v, a in exp
    ]


def test_q_windowing_decimal(qenv, spark, tmp_path):
    """windowing_decimal.q: sum/min/max/running windows over a
    DECIMAL(4,2) column keep DECIMAL math (no double drift)."""
    eng, con = qenv
    p = str(tmp_path / "wht_dec")
    spark.sql(
        "SELECT id % 3 AS g, CAST(CAST(id AS DOUBLE) / 7 AS "
        "DECIMAL(4,2)) AS dec FROM range(30)"
    ).coalesce(1).write.parquet(p)
    eng.register_table("wht_dec", p)
    con.execute(
        f"CREATE VIEW wht_dec AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    assert_matches_oracle(
        eng.sql(
            "select g, dec, sum(dec) over (partition by g order by dec "
            "rows between unbounded preceding and current row) AS s, "
            "min(dec) over (partition by g) AS mn, "
            "max(dec) over (partition by g) AS mx from wht_dec"
        ),
        con,
        "SELECT g, dec, CAST(sum(dec) OVER (PARTITION BY g ORDER BY "
        "dec ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS "
        "DECIMAL(14,2)) AS s, min(dec) OVER (PARTITION BY g) AS mn, "
        "max(dec) OVER (PARTITION BY g) AS mx FROM wht_dec",
    )
