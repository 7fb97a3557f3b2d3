"""clientpositive `.q` slice, round 6c: the correlationoptimizer golden
family (correlationoptimizer1.q, 2, 8, 14, 15 — reference:
ql/src/test/queries/clientpositive/correlationoptimizer1.q ff., driven by
ql/.../optimizer/correlation/CorrelationOptimizer.java).

Hive's correlation optimizer merges the shuffle a JOIN needs with the
shuffle a GROUP BY on the same key needs into ONE ReduceSink. Spark gets
the identical property from Catalyst's EnsureRequirements: a shuffle
join's output partitioning (hashpartitioning on the join key) already
satisfies the aggregate's distribution requirement, so no extra Exchange
is inserted. We replay the golden QUERY SHAPES for value parity vs
DuckDB, and pin the plan property itself once (test at the bottom) —
that pin is the Spark restatement of what the whole golden family
exists to protect.

The goldens canonicalize results with SUM(HASH(...)) because Hive's
diff is order-sensitive; our comparator is order-insensitive, so we
compare the actual rows instead (strictly stronger).

Fixtures mirror Hive's src (500 rows, string key/value) and src1 (25
rows, some with EMPTY string keys — those match nothing in a join but
are preserved by outer sides, which several goldens probe).
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(str(i % 83), f"val_{i % 83}") for i in range(500)]
SRC1 = (
    [(str(k), f"val_{k}") for k in (66, 98, 128, 146, 150, 213, 224, 238)]
    + [("", f"val_{k}") for k in (165, 193, 265, 27)]
    + [("", "")] * 3
    + [(str(k), f"val_{k}") for k in (273, 278, 311, 369, 401, 406, 4, 8, 2, 5)]
)


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_corr")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    for name, rows in (("co_src", SRC), ("co_src1", SRC1)):
        p = str(root / name)
        spark.createDataFrame(rows, "key string, value string").coalesce(
            2
        ).write.parquet(p)
        eng.register_table(name, p)
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{p}/*.parquet')"
        )
    yield eng, con
    con.close()


def _chk(eng, con, hive_sql, duck_sql=None):
    assert_matches_oracle(eng.sql(hive_sql), con, duck_sql or hive_sql)


def test_q_co1_join_then_groupby_on_join_key(qenv):
    """correlationoptimizer1.q head: x JOIN y then GROUP BY x.key —
    one shape per join type the golden cycles through (inner, left
    semi, left outer, right outer, full outer)."""
    eng, con = qenv
    for jt in ("JOIN", "LEFT OUTER JOIN", "RIGHT OUTER JOIN",
               "FULL OUTER JOIN"):
        _chk(eng, con,
             f"SELECT x.key AS key, count(1) AS cnt "
             f"FROM co_src1 x {jt} co_src y ON (x.key = y.key) "
             "GROUP BY x.key",
             f"SELECT x.key AS key, CAST(count(1) AS BIGINT) AS cnt "
             f"FROM co_src1 x {jt} co_src y ON (x.key = y.key) "
             "GROUP BY x.key")
    _chk(eng, con,
         "SELECT x.key AS key, count(1) AS cnt "
         "FROM co_src1 x LEFT SEMI JOIN co_src y ON (x.key = y.key) "
         "GROUP BY x.key",
         "SELECT x.key AS key, CAST(count(1) AS BIGINT) AS cnt "
         "FROM co_src1 x WHERE EXISTS "
         "(SELECT 1 FROM co_src y WHERE x.key = y.key) GROUP BY x.key")


def test_q_co1_groupby_other_side_key(qenv):
    """correlationoptimizer1.q tail: group by the OTHER side's key
    (y.key) after an outer join — NULL-extended keys form one group."""
    eng, con = qenv
    _chk(eng, con,
         "SELECT y.key AS key, count(1) AS cnt "
         "FROM co_src1 x LEFT OUTER JOIN co_src y ON (x.key = y.key) "
         "GROUP BY y.key",
         "SELECT y.key AS key, CAST(count(1) AS BIGINT) AS cnt "
         "FROM co_src1 x LEFT OUTER JOIN co_src y ON (x.key = y.key) "
         "GROUP BY y.key")


def test_q_co2_join_of_two_aggregates(qenv):
    """correlationoptimizer2.q: JOIN of two GROUP BY subqueries, all
    four join types, plus the agg-on-top-of-full-outer form."""
    eng, con = qenv
    for jt in ("JOIN", "LEFT OUTER JOIN", "RIGHT OUTER JOIN",
               "FULL OUTER JOIN"):
        _chk(eng, con,
             "SELECT a.key AS key1, a.cnt AS cnt1, "
             "b.key AS key2, b.cnt AS cnt2 "
             "FROM (SELECT x.key AS key, count(x.value) AS cnt "
             f"FROM co_src x GROUP BY x.key) a {jt} "
             "(SELECT y.key AS key, count(y.value) AS cnt "
             "FROM co_src1 y GROUP BY y.key) b ON (a.key = b.key)",
             "SELECT a.key AS key1, a.cnt AS cnt1, "
             "b.key AS key2, b.cnt AS cnt2 "
             "FROM (SELECT x.key AS key, CAST(count(x.value) AS BIGINT) "
             f"AS cnt FROM co_src x GROUP BY x.key) a {jt} "
             "(SELECT y.key AS key, CAST(count(y.value) AS BIGINT) "
             "AS cnt FROM co_src1 y GROUP BY y.key) b ON (a.key = b.key)")
    _chk(eng, con,
         "SELECT a.key AS key, count(1) AS cnt "
         "FROM (SELECT x.key AS key, count(x.value) AS cnt "
         "FROM co_src x GROUP BY x.key) a FULL OUTER JOIN "
         "(SELECT y.key AS key, count(y.value) AS cnt "
         "FROM co_src1 y GROUP BY y.key) b ON (a.key = b.key) "
         "GROUP BY a.key",
         "SELECT a.key AS key, CAST(count(1) AS BIGINT) AS cnt "
         "FROM (SELECT x.key AS key, count(x.value) AS cnt "
         "FROM co_src x GROUP BY x.key) a FULL OUTER JOIN "
         "(SELECT y.key AS key, count(y.value) AS cnt "
         "FROM co_src1 y GROUP BY y.key) b ON (a.key = b.key) "
         "GROUP BY a.key")


def test_q_co8_union_of_aggregates_into_join(qenv):
    """correlationoptimizer8.q: UNION ALL of two aggregated branches
    joined to a base table — inner, left outer with a VALUE-typed key
    branch, and the group-by-extra-column variant. Hive coerces the
    string `x.key < 20` predicate through double."""
    eng, con = qenv
    _chk(eng, con,
         "SELECT x.key AS k, x.value AS v, subq1.cnt AS cnt FROM "
         "( SELECT x.key AS key, count(1) AS cnt FROM co_src x "
         "WHERE x.key < 20 GROUP BY x.key "
         "UNION ALL "
         "SELECT x1.key AS key, count(1) AS cnt FROM co_src x1 "
         "WHERE x1.key > 100 GROUP BY x1.key ) subq1 "
         "JOIN co_src1 x ON (x.key = subq1.key)",
         "SELECT x.key AS k, x.value AS v, subq1.cnt AS cnt FROM "
         "( SELECT x.key AS key, CAST(count(1) AS BIGINT) AS cnt "
         "FROM co_src x WHERE TRY_CAST(key AS DOUBLE) < 20 GROUP BY x.key "
         "UNION ALL "
         "SELECT x1.key AS key, CAST(count(1) AS BIGINT) AS cnt "
         "FROM co_src x1 WHERE TRY_CAST(key AS DOUBLE) > 100 "
         "GROUP BY x1.key ) subq1 "
         "JOIN co_src1 x ON (x.key = subq1.key)")
    _chk(eng, con,
         "SELECT subq1.key AS k, subq1.cnt AS cnt, "
         "x.key AS k2, x.value AS v2 FROM "
         "( SELECT x.key AS key, count(1) AS cnt FROM co_src x "
         "WHERE x.key < 20 GROUP BY x.key "
         "UNION ALL "
         "SELECT x1.value AS key, count(1) AS cnt FROM co_src1 x1 "
         "WHERE x1.key > 100 GROUP BY x1.value ) subq1 "
         "LEFT OUTER JOIN co_src1 x ON (x.key = subq1.key)",
         "SELECT subq1.key AS k, subq1.cnt AS cnt, "
         "x.key AS k2, x.value AS v2 FROM "
         "( SELECT x.key AS key, CAST(count(1) AS BIGINT) AS cnt "
         "FROM co_src x WHERE TRY_CAST(key AS DOUBLE) < 20 GROUP BY x.key "
         "UNION ALL "
         "SELECT x1.value AS key, CAST(count(1) AS BIGINT) AS cnt "
         "FROM co_src1 x1 WHERE TRY_CAST(key AS DOUBLE) > 100 "
         "GROUP BY x1.value ) subq1 "
         "LEFT OUTER JOIN co_src1 x ON (x.key = subq1.key)")
    # group-by has an extra column → branch is NOT key-correlated;
    # answer must still be right (Hive bails out of the merge here)
    _chk(eng, con,
         "SELECT x.key AS k, x.value AS v, subq1.cnt AS cnt FROM "
         "( SELECT x.key AS key, count(1) AS cnt FROM co_src x "
         "WHERE x.key < 20 GROUP BY x.key "
         "UNION ALL "
         "SELECT x1.key AS key, count(1) AS cnt FROM co_src x1 "
         "WHERE x1.key > 100 GROUP BY x1.key, x1.value ) subq1 "
         "JOIN co_src1 x ON (x.key = subq1.key)",
         "SELECT x.key AS k, x.value AS v, subq1.cnt AS cnt FROM "
         "( SELECT x.key AS key, CAST(count(1) AS BIGINT) AS cnt "
         "FROM co_src x WHERE TRY_CAST(key AS DOUBLE) < 20 GROUP BY x.key "
         "UNION ALL "
         "SELECT x1.key AS key, CAST(count(1) AS BIGINT) AS cnt "
         "FROM co_src x1 WHERE TRY_CAST(key AS DOUBLE) > 100 "
         "GROUP BY x1.key, x1.value ) subq1 "
         "JOIN co_src1 x ON (x.key = subq1.key)")


def test_q_co8_full_outer_mixed_typed_union(qenv):
    """correlationoptimizer8.q tail: the union's two branches SWAP
    which column is the cast int key and which is the count — the
    union coerces to a common type, then FULL OUTER JOIN against a
    string key (int<->string join coerces through double in Hive)."""
    eng, con = qenv
    _chk(eng, con,
         "SELECT subq1.key AS k, subq1.value AS v, "
         "x.key AS k2, x.value AS v2 FROM "
         "( SELECT cast(x.key AS INT) AS key, count(1) AS value "
         "FROM co_src x WHERE x.key < 20 GROUP BY x.key "
         "UNION ALL "
         "SELECT count(1) AS key, cast(x1.key AS INT) AS value "
         "FROM co_src x1 WHERE x1.key > 100 GROUP BY x1.key ) subq1 "
         "FULL OUTER JOIN co_src1 x ON (x.key = subq1.key)",
         "SELECT subq1.key AS k, subq1.value AS v, "
         "x.key AS k2, x.value AS v2 FROM "
         "( SELECT CAST(TRY_CAST(x.key AS INT) AS BIGINT) AS key, "
         "CAST(count(1) AS BIGINT) AS value FROM co_src x "
         "WHERE TRY_CAST(x.key AS DOUBLE) < 20 GROUP BY x.key "
         "UNION ALL "
         "SELECT CAST(count(1) AS BIGINT) AS key, "
         "CAST(TRY_CAST(x1.key AS INT) AS BIGINT) AS value FROM co_src x1 "
         "WHERE TRY_CAST(x1.key AS DOUBLE) > 100 GROUP BY x1.key ) subq1 "
         "FULL OUTER JOIN co_src1 x "
         "ON (TRY_CAST(x.key AS DOUBLE) = TRY_CAST(subq1.key AS DOUBLE))")


def test_q_co14_redistributed_subqueries_feed_join(qenv):
    """correlationoptimizer14.q: DISTRIBUTE BY / SORT BY / CLUSTER BY /
    ORDER BY inside both join inputs — pure data-layout directives that
    must not change the join's result set."""
    eng, con = qenv
    duck = ("SELECT xx.key AS k1, xx.value AS v1, "
            "yy.key AS k2, yy.value AS v2 "
            "FROM co_src xx JOIN co_src1 yy ON (xx.key = yy.key)")
    for directive in ("DISTRIBUTE BY key", "SORT BY key",
                      "DISTRIBUTE BY key SORT BY key",
                      "DISTRIBUTE BY key SORT BY key DESC",
                      "ORDER BY key", "CLUSTER BY key"):
        _chk(eng, con,
             "SELECT xx.key AS k1, xx.value AS v1, "
             "yy.key AS k2, yy.value AS v2 FROM "
             f"(SELECT x.key AS key, x.value AS value FROM co_src x "
             f"{directive}) xx JOIN "
             f"(SELECT y.key AS key, y.value AS value FROM co_src1 y "
             f"{directive}) yy ON (xx.key = yy.key)",
             duck)


def test_q_co15_selfjoin_agg_join_ordered(qenv):
    """correlationoptimizer15.q: (self-join + GROUP BY) joined to a
    second table with a total ORDER BY on top."""
    eng, con = qenv
    _chk(eng, con,
         "SELECT xx.key AS key, xx.cnt AS cnt, yy.key AS ykey FROM "
         "(SELECT x.key AS key, count(1) AS cnt FROM co_src1 x "
         "JOIN co_src1 y ON (x.key = y.key) GROUP BY x.key) xx "
         "JOIN co_src yy ON xx.key = yy.key "
         "ORDER BY xx.key, xx.cnt, yy.key",
         "SELECT xx.key AS key, xx.cnt AS cnt, yy.key AS ykey FROM "
         "(SELECT x.key AS key, CAST(count(1) AS BIGINT) AS cnt "
         "FROM co_src1 x JOIN co_src1 y ON (x.key = y.key) "
         "GROUP BY x.key) xx JOIN co_src yy ON xx.key = yy.key "
         "ORDER BY xx.key, xx.cnt, yy.key")


def test_q_correlation_shared_shuffle_plan(qenv, spark):
    """The plan property the whole golden family protects, restated
    for Spark: with broadcast off, x JOIN y ON key GROUP BY key plans
    exactly TWO hash Exchanges (one per join input) — the aggregate
    above the join reuses the join's hashpartitioning instead of
    inserting a third shuffle (EnsureRequirements ≙ Hive's
    CorrelationOptimizer merging the two ReduceSinks)."""
    eng, _ = qenv
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = eng.sql(
            "SELECT x.key AS key, count(1) AS cnt FROM co_src1 x "
            "JOIN co_src y ON (x.key = y.key) GROUP BY x.key"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 2, f"expected 2 shuffles, got {n_exchanges}:\n{plan}"


def test_q_co3_two_branch_join_reuse(qenv):
    """correlationoptimizer3.q: the same x JOIN y input feeds BOTH an
    aggregated branch and a projected branch, re-joined on the key —
    Hive merges all three ReduceSinks over one shuffle; value parity
    here, the shared-exchange property is pinned below."""
    eng, con = qenv
    _chk(eng, con,
         "SELECT tmp.key AS key, tmp.cnt AS cnt, tmp.value AS value FROM "
         "(SELECT b.key AS key, b.cnt AS cnt, d.value AS value FROM "
         "(SELECT x.key, count(1) AS cnt FROM co_src1 x "
         "JOIN co_src y ON (x.key = y.key) GROUP BY x.key) b "
         "JOIN (SELECT x.key, x.value FROM co_src1 x "
         "JOIN co_src y ON (x.key = y.key)) d "
         "ON b.key = d.key) tmp ORDER BY key, cnt, value",
         "SELECT tmp.key AS key, tmp.cnt AS cnt, tmp.value AS value FROM "
         "(SELECT b.key AS key, b.cnt AS cnt, d.value AS value FROM "
         "(SELECT x.key, CAST(count(1) AS BIGINT) AS cnt FROM co_src1 x "
         "JOIN co_src y ON (x.key = y.key) GROUP BY x.key) b "
         "JOIN (SELECT x.key, x.value FROM co_src1 x "
         "JOIN co_src y ON (x.key = y.key)) d "
         "ON b.key = d.key) tmp ORDER BY key, cnt, value")


def test_q_co6_agg_join_agg(qenv):
    """correlationoptimizer6.q: two (self-join + GROUP BY) derived
    tables joined on the grouped key."""
    eng, con = qenv
    _chk(eng, con,
         "SELECT xx.key AS xkey, xx.cnt AS xcnt, yy.key AS ykey, "
         "yy.cnt AS ycnt FROM "
         "(SELECT x.key AS key, count(1) AS cnt FROM co_src1 x "
         "JOIN co_src1 y ON (x.key = y.key) GROUP BY x.key) xx "
         "JOIN "
         "(SELECT x.key AS key, count(1) AS cnt FROM co_src x "
         "JOIN co_src y ON (x.key = y.key) GROUP BY x.key) yy "
         "ON xx.key = yy.key ORDER BY xkey, ykey",
         "SELECT xx.key AS xkey, CAST(xx.cnt AS BIGINT) AS xcnt, "
         "yy.key AS ykey, CAST(yy.cnt AS BIGINT) AS ycnt FROM "
         "(SELECT x.key AS key, count(1) AS cnt FROM co_src1 x "
         "JOIN co_src1 y ON (x.key = y.key) GROUP BY x.key) xx "
         "JOIN "
         "(SELECT x.key AS key, count(1) AS cnt FROM co_src x "
         "JOIN co_src y ON (x.key = y.key) GROUP BY x.key) yy "
         "ON xx.key = yy.key ORDER BY xkey, ykey")


def test_q_co4_three_way_join_then_group(qenv):
    """correlationoptimizer4.q: 3-way join grouped on the MIDDLE
    table's key — one shared key distribution end to end."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT tmp.key AS key, tmp.cnt AS cnt FROM (SELECT y.key AS "
        "key, count(1) AS cnt FROM co_src1 x JOIN co_src y ON (x.key = "
        "y.key) JOIN co_src1 z ON (y.key = z.key) GROUP BY y.key) tmp",
        "SELECT y.key AS key, CAST(count(1) AS BIGINT) AS cnt "
        "FROM co_src1 x JOIN co_src y ON x.key = y.key "
        "JOIN co_src1 z ON y.key = z.key GROUP BY y.key",
    )


def test_q_co5_join_of_joins_insert(qenv, tmp_path):
    """correlationoptimizer5.q: a join of two JOIN subqueries on the
    same key, INSERT OVERWRITten — all four inputs share one key
    distribution."""
    eng, con = qenv
    eng.spark.sql("DROP TABLE IF EXISTS co5_dest")
    eng.sql("CREATE TABLE co5_dest (key STRING, val STRING) "
            "STORED AS PARQUET")
    eng.sql(
        "INSERT OVERWRITE TABLE co5_dest SELECT b.key, d.val FROM "
        "(SELECT x.key, x.value AS val FROM co_src1 x JOIN co_src y "
        "ON (x.key = y.key)) b JOIN "
        "(SELECT m.key, n.value AS val FROM co_src m JOIN co_src1 n "
        "ON (m.key = n.key)) d ON b.key = d.key"
    )
    assert_matches_oracle(
        eng.sql("SELECT key, val FROM co5_dest"),
        con,
        "SELECT b.key, d.val FROM "
        "(SELECT x.key, x.value AS val FROM co_src1 x JOIN co_src y "
        "ON x.key = y.key) b JOIN "
        "(SELECT m.key, n.value AS val FROM co_src m JOIN co_src1 n "
        "ON m.key = n.key) d ON b.key = d.key",
    )
    eng.sql("DROP TABLE co5_dest")


def test_q_co7_agg_join_rejoined(qenv):
    """correlationoptimizer7.q: (join → group) rejoined with the small
    table on the same key."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT xx.key, xx.cnt, yy.key AS key2, yy.value FROM "
        "(SELECT x.key AS key, count(1) AS cnt FROM co_src x JOIN "
        "co_src1 y ON (x.key = y.key) GROUP BY x.key) xx JOIN co_src1 "
        "yy ON xx.key=yy.key",
        "SELECT xx.key, xx.cnt, yy.key AS key2, yy.value FROM "
        "(SELECT x.key AS key, CAST(count(1) AS BIGINT) AS cnt FROM "
        "co_src x JOIN co_src1 y ON x.key = y.key GROUP BY x.key) xx "
        "JOIN co_src1 yy ON xx.key = yy.key",
    )


def test_q_co9_two_filtered_aggs_joined(qenv):
    """correlationoptimizer9.q: two DIFFERENTLY-filtered aggregates of
    the same table joined on their group keys."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT xx.key, yy.key AS key2, xx.cnt, yy.cnt AS cnt2 FROM "
        "(SELECT x.key AS key, count(1) AS cnt FROM co_src x WHERE "
        "x.key < 120 GROUP BY x.key) xx JOIN "
        "(SELECT x1.key AS key, count(1) AS cnt FROM co_src x1 WHERE "
        "x1.key > 100 GROUP BY x1.key) yy ON (xx.key = yy.key)",
        "SELECT xx.key, yy.key AS key2, xx.cnt, yy.cnt AS cnt2 FROM "
        "(SELECT key, CAST(count(1) AS BIGINT) AS cnt FROM co_src "
        "WHERE CAST(key AS DOUBLE) < 120 GROUP BY key) xx JOIN "
        "(SELECT key, CAST(count(1) AS BIGINT) AS cnt FROM co_src "
        "WHERE CAST(key AS DOUBLE) > 100 GROUP BY key) yy "
        "ON xx.key = yy.key",
    )


def test_q_co10_semi_join_over_agg(qenv):
    """correlationoptimizer10.q: LEFT SEMI JOIN whose left side is an
    aggregate of a self-join — the semi filter applies AFTER the
    aggregate."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT xx.key, xx.cnt FROM (SELECT x.key as key, count(1) as "
        "cnt FROM co_src1 x JOIN co_src1 y ON (x.key = y.key) group by "
        "x.key) xx LEFT SEMI JOIN co_src yy ON xx.key=yy.key",
        "SELECT xx.key, xx.cnt FROM (SELECT x.key AS key, "
        "CAST(count(1) AS BIGINT) AS cnt FROM co_src1 x JOIN co_src1 y "
        "ON x.key = y.key GROUP BY x.key) xx SEMI JOIN co_src yy "
        "ON xx.key = yy.key",
    )
