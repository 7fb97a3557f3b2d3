"""clientpositive union family tail: union_paren.q, union_pos_alias.q,
unionDistinct_1.q, union32.q, union36.q, union_lateralview.q,
union_date_trim.q — the shapes the first-wave union modules
(test_qfile_union_family / test_qfile_union_remove) don't cover:
parenthesized-branch precedence with mixed UNION ALL / UNION
[DISTINCT], ORDER BY ordinals over a union, cross-branch numeric-type
widening (DOUBLE vs BIGINT), decimal window arithmetic over union
output, LATERAL VIEW over a union, and DATE values threaded through
union + trim/cast round-trips.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_ux")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    rows = [(str(i % 83), f"val_{i % 83}") for i in range(500)]
    p = str(root / "ux_src")
    spark.createDataFrame(rows, "key string, value string").coalesce(
        1
    ).write.parquet(p)
    eng.register_table("ux_src", p)
    con.execute(
        f"CREATE VIEW ux_src AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    for name, vals in (("ux_t1", [1, 1, 2]), ("ux_t2", [2, 1, 2]),
                       ("ux_t3", [2, 3, 2])):
        pt = str(root / name)
        spark.createDataFrame([(v,) for v in vals], "c int").coalesce(
            1
        ).write.parquet(pt)
        eng.register_table(name, pt)
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{pt}/*.parquet')"
        )
    yield eng, con
    con.close()


def test_q_union_paren_precedence(qenv):
    """union_paren.q: UNION ALL vs UNION (distinct) precedence with
    and without parens — Hive (like Spark and DuckDB) evaluates
    left-to-right, parens override; trailing ORDER BY binds to the
    WHOLE union."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql("(select * from ux_t1) union all select * from ux_t2 "
                "union select * from ux_t3 order by c"),
        con,
        "(SELECT * FROM ux_t1) UNION ALL SELECT * FROM ux_t2 "
        "UNION SELECT * FROM ux_t3 ORDER BY c",
    )
    assert_matches_oracle(
        eng.sql("(select * from ux_t1) union all (select * from ux_t2 "
                "union select * from ux_t3) order by c"),
        con,
        "(SELECT * FROM ux_t1) UNION ALL (SELECT * FROM ux_t2 "
        "UNION SELECT * FROM ux_t3) ORDER BY c",
    )
    # fully parenthesized single select with order+limit
    assert eng.sql(
        "(select * from ux_src order by key limit 1)"
    ).count() == 1
    # branch-local limit inside parens vs trailing global order/limit
    assert eng.sql(
        "(select * from ux_src limit 1) union all select * from ux_src "
        "order by key limit 1"
    ).count() == 1


def test_q_union_distinct_keyword(qenv):
    """unionDistinct_1.q: the UNION DISTINCT spelling dedupes across
    constant-aggregate branches."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "select unionsrc.key, unionsrc.value FROM (select 'tst1' "
            "as key, count(1) as value from ux_src s1 UNION DISTINCT "
            "select 'tst2' as key, count(1) as value from ux_src s2 "
            "UNION DISTINCT select 'tst1' as key, count(1) as value "
            "from ux_src s3) unionsrc"
        ),
        con,
        "SELECT 'tst1' AS key, CAST(count(1) AS BIGINT) AS value "
        "FROM ux_src UNION "
        "SELECT 'tst2' AS key, CAST(count(1) AS BIGINT) AS value "
        "FROM ux_src",
    )


def test_q_union_pos_alias(qenv):
    """union_pos_alias.q: ORDER BY 1 (ordinal) over a nested union of
    constant aggregates, and aliases SWAPPING column names."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "select 'tst1' as key, count(1) as value from ux_src s1 "
            "UNION ALL select key, value from (select 'tst2' as key, "
            "count(1) as value from ux_src s2 UNION ALL select 'tst3' "
            "as key, count(1) as value from ux_src s3) s4 order by 1"
        ),
        con,
        "SELECT 'tst1' AS key, CAST(count(1) AS BIGINT) AS value FROM "
        "ux_src UNION ALL SELECT 'tst2', CAST(count(1) AS BIGINT) FROM "
        "ux_src UNION ALL SELECT 'tst3', CAST(count(1) AS BIGINT) FROM "
        "ux_src",
    )
    assert_matches_oracle(
        eng.sql(
            "select key as value, value as key from ux_t1 a join "
            "ux_src b on a.c = b.key UNION ALL select key as value, "
            "value as key from ux_t1 a join ux_src b on a.c = b.key"
        ),
        con,
        "SELECT b.key AS value, b.value AS key FROM ux_t1 a JOIN "
        "ux_src b ON CAST(a.c AS VARCHAR) = b.key UNION ALL "
        "SELECT b.key AS value, b.value AS key FROM ux_t1 a JOIN "
        "ux_src b ON CAST(a.c AS VARCHAR) = b.key",
    )


def test_q_union32_numeric_widening(qenv):
    """union32.q: DOUBLE branch unioned with BIGINT branch widens to
    DOUBLE (Hive FunctionRegistry.getCommonClassForUnionAll)."""
    eng, con = qenv
    got = eng.sql(
        "SELECT * FROM (SELECT CAST(c AS DOUBLE) AS key FROM ux_t1 "
        "UNION ALL SELECT CAST(c AS BIGINT) AS key FROM ux_t2) a"
    )
    assert dict(got.dtypes)["key"] == "double"
    assert_matches_oracle(
        got, con,
        "SELECT CAST(c AS DOUBLE) AS key FROM ux_t1 "
        "UNION ALL SELECT CAST(c AS DOUBLE) AS key FROM ux_t2",
    )


def test_q_union36_decimal_window_share(qenv):
    """union36.q: x/sum(x) over() across decimal union branches —
    including a NULL branch; the DECIMAL division must not degrade to
    DOUBLE NaNs."""
    eng, _ = qenv
    rows = eng.sql(
        "select (x/sum(x) over()) as y from(select cast(1 as "
        "decimal(10,0)) as x from (select * from ux_src limit 2)s1 "
        "union all select cast(1 as decimal(10,0)) x from (select * "
        "from ux_src limit 2) s2 union all select cast('100000000' as "
        "decimal(10,0)) x from (select * from ux_src limit 2) s3)u"
    ).collect()
    ys = sorted(float(r.y) for r in rows)
    total = 2 * 1 + 2 * 1 + 2 * 100000000
    exp = sorted([1 / total] * 4 + [100000000 / total] * 2)
    assert ys == pytest.approx(exp, rel=1e-6)
    rows = eng.sql(
        "select (x/sum(x) over()) as y from(select cast(1 as "
        "decimal(10,0)) as x from (select * from ux_src limit 2)s1 "
        "union all select cast(null as decimal(10,0)) x from (select * "
        "from ux_src limit 2) s2)u"
    ).collect()
    ys = [r.y for r in rows]
    assert sum(1 for y in ys if y is None) == 2
    assert sorted(float(y) for y in ys if y is not None) == [0.5, 0.5]


def test_q_union_lateralview(qenv):
    """union_lateralview.q: LATERAL VIEW explode over a UNION ALL
    subquery — every union row fans out per array element."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "SELECT c.arr_ele as arr_ele, a.key as key FROM (SELECT "
            "key, value, array(1,2,3) as arr FROM ux_src UNION ALL "
            "SELECT key, value, array(1,2,3) as arr FROM ux_src) a "
            "LATERAL VIEW explode(arr) c AS arr_ele"
        ),
        con,
        "SELECT u.arr_ele, t.key FROM ux_src t CROSS JOIN "
        "(VALUES (1),(2),(3)) u(arr_ele) UNION ALL "
        "SELECT u.arr_ele, t.key FROM ux_src t CROSS JOIN "
        "(VALUES (1),(2),(3)) u(arr_ele)",
    )


def test_q_union_date_trim(qenv, spark, tmp_path):
    """union_date_trim.q: DATE column through a union with a
    trim(cast(date as string)) branch cast back to DATE."""
    eng, con = qenv
    p = str(tmp_path / "ux_dates")
    spark.sql(
        "SELECT 1 AS id, DATE'2014-04-07' AS dt UNION ALL "
        "SELECT 2, DATE'2014-04-08' UNION ALL SELECT 3, DATE'2014-04-09'"
    ).coalesce(1).write.parquet(p)
    eng.register_table("ux_dates", p)
    con.execute(
        f"CREATE VIEW ux_dates AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    assert_matches_oracle(
        eng.sql(
            "select id, tm from (select id, dt as tm from ux_dates "
            "where id = 1 union all select id, dt as tm from ux_dates "
            "where id = 2 union all select id, cast(trim(Cast (dt as "
            "string)) as date) as tm from ux_dates where id = 3 ) a"
        ),
        con,
        "SELECT id, dt AS tm FROM ux_dates",
    )
