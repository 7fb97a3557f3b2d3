"""cbo family second batch: cbo_SortUnionTransposeRule.q, cbo_const.q,
cbo_rp_gby_empty.q, cbo_rp_cross_product_check_2.q — the distinct
shapes the cbo_rp_* "return path" mirrors add over the 10 replayed in
tests/test_qfile_cbo_family.py (the rp files otherwise re-run the same
queries through Calcite's return path, which has no engine-side
analogue to vary).

SortUnionTransposeRule is scale-relevant: Hive pushes a LIMIT below a
UNION into each branch (HiveSortUnionTransposeRule); Spark's
CombineLimits + LimitPushDown does the same, pinned here via the
optimized plan carrying per-branch LocalLimits.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_cboe")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    rows = [(str(i % 83), f"val_{i % 83}") for i in range(500)]
    p = str(root / "cbe_src")
    spark.createDataFrame(rows, "key string, value string").coalesce(
        1
    ).write.parquet(p)
    eng.register_table("cbe_src", p)
    con.execute(
        f"CREATE VIEW cbe_src AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    # `s`: the 10-row slice the SortUnionTranspose file builds
    ps = str(root / "cbe_s")
    spark.read.parquet(p).orderBy("key", "value").limit(10) \
        .coalesce(1).write.parquet(ps)
    eng.register_table("cbe_s", ps)
    con.execute(
        f"CREATE VIEW cbe_s AS SELECT * FROM read_parquet('{ps}/*.parquet')"
    )
    yield eng, con
    con.close()


def test_q_sort_union_transpose(qenv):
    """cbo_SortUnionTransposeRule.q: ORDER BY / LIMIT over a UNION ALL
    — ordered form is value-checked; LIMIT-only forms are checked by
    count (the row subset is legitimately engine-chosen); LIMIT 0 is
    empty."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql("select key from cbe_s a union all "
                "select key from cbe_s b order by key"),
        con,
        "SELECT key FROM cbe_s UNION ALL SELECT key FROM cbe_s",
    )
    assert eng.sql(
        "select key from cbe_s a union all select key from cbe_s b "
        "limit 0"
    ).count() == 0
    assert eng.sql(
        "select key from cbe_s a union all select key from cbe_s b "
        "limit 5"
    ).count() == 5
    assert eng.sql(
        "select key from cbe_s a union all select key from cbe_s b "
        "order by key limit 5"
    ).count() == 5
    # limit inside each unioned subquery, limit again outside
    assert eng.sql(
        "select * from (select src1.key, src2.value from cbe_src src1 "
        "left outer join cbe_src src2 on src1.key = src2.key limit 10) "
        "subq1 union all select * from (select src1.key, src2.value "
        "from cbe_src src1 left outer join cbe_src src2 on src1.key = "
        "src2.key limit 10) subq2 limit 5"
    ).count() == 5
    # the LIMIT is pushed INTO the union branches
    # (HiveSortUnionTransposeRule = Spark LimitPushDown)
    plan = eng.sql(
        "select key from cbe_s a union all select key from cbe_s b "
        "limit 5"
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LocalLimit 5") >= 2, plan


def test_q_cbo_const_folding(qenv):
    """cbo_const.q: constant expressions through subqueries, string=
    int coercion in WHERE, WHERE false, and a grouped-subquery join
    filtered by a folded alias."""
    eng, con = qenv
    assert [r[0] for r in eng.sql("select '1'").collect()] == ["1"]
    assert [r[0] for r in eng.sql(
        "select * from (select '1')subq"
    ).collect()] == ["1"]
    assert eng.sql(
        "select * from (select key from cbe_src where false)subq"
    ).count() == 0
    assert_matches_oracle(
        eng.sql("select key from (SELECT key from cbe_src "
                "where key = 1+3)s"),
        con,
        "SELECT key FROM cbe_src WHERE CAST(key AS DOUBLE) = 4",
    )
    assert_matches_oracle(
        eng.sql(
            "select count(*) AS n from cbe_src join (select key as key, "
            "key as `date` from cbe_src group by key) s on "
            "(cbe_src.key = s.key) where s.`date` = '8'"
        ),
        con,
        "SELECT CAST(count(*) AS BIGINT) AS n FROM cbe_src JOIN "
        "(SELECT key, key AS d FROM cbe_src GROUP BY key) s ON "
        "cbe_src.key = s.key WHERE s.d = '8'",
    )


def test_q_cbo_const_interval_literals(qenv):
    """cbo_const.q: interval_day_time constructor over string/varchar/
    char casts all equal the typed interval literal."""
    eng, _ = qenv
    row = eng.sql(
        "select interval_day_time('2 1:2:3') = interval '2 1:2:3' day "
        "to second AS eq1, interval_day_time(cast('2 1:2:3' as "
        "varchar(10))) = interval '2 1:2:3' day to second AS eq2 "
        "from cbe_src limit 1"
    ).collect()[0]
    assert row.eq1 is True and row.eq2 is True


def test_q_cbo_rp_gby_empty(qenv):
    """cbo_rp_gby_empty.q: global aggregates with an EMPTY group-by
    over filters selecting nothing — one row for global aggs, zero for
    grouped."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql("select count(1) AS n, max(key) AS mx from cbe_src "
                "where key = 'no_such'"),
        con,
        "SELECT CAST(count(1) AS BIGINT) AS n, max(key) AS mx "
        "FROM cbe_src WHERE key = 'no_such'",
    )
    assert eng.sql(
        "select key, count(1) AS n from cbe_src where key = 'no_such' "
        "group by key"
    ).count() == 0


def test_q_cbo_rp_cross_product(qenv):
    """cbo_rp_cross_product_check_2.q: explicit and implicit cross
    products (comma list, JOIN without ON over grouped subqueries)
    still execute and match."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "select a.key AS k1, b.key AS k2 from (select key from "
            "cbe_src group by key) a join (select key from cbe_src "
            "group by key) b"
        ),
        con,
        "SELECT a.key AS k1, b.key AS k2 FROM (SELECT DISTINCT key "
        "FROM cbe_src) a CROSS JOIN (SELECT DISTINCT key FROM "
        "cbe_src) b",
    )
