"""clientpositive `.q` slice, round 6f: the numbered join golden family
(join0.q–join41.q — reference: ql/src/test/queries/clientpositive/join0.q
ff., driven by parse/SemanticAnalyzer.java genJoinPlan + exec/
CommonJoinOperator.java). 47 files; the distinct SEMANTIC shapes they
protect are replayed here, value-diffed against DuckDB:

- join0/join23: JOIN with no ON clause (implicit cross) with filters
  in the subqueries vs in the WHERE clause;
- join10/join22: Hive FROM-first subqueries and nested `alias.*`
  re-expansion through multiple derived tables;
- join11/join12/join13: non-equi conjuncts inside ON, per-edge filters
  in a 3-way join, and a join key that is an EXPRESSION over two
  already-joined tables (string arithmetic coerces through double);
- join15: plain self equijoin (the multiset baseline);
- join18: FULL OUTER join of two aggregate subqueries, one using
  count(DISTINCT) — Hive's classic multi-MR-job shape that Spark plans
  as one exchange-reusing DAG;
- join21/join40: chains of inner/outer joins whose ON clauses carry
  one-sided (and contradictory) filters — the null-extension semantics
  the goldens pin line by line;
- join8: nested FROM-first subqueries under an outer join, sunk into a
  table with an IS NULL filter over the null-producing side;
- join28: subquery join sunk into a table with a partition-pruned
  third table (PartitionFilters must reach the srcpart scan);
- join29/join36: aggregate subqueries joined then INSERT OVERWRITE
  (Hive runs 3 MR jobs; one Spark DAG);
- join38: FROM-first with the WHERE *after* the SELECT list, a MAPJOIN
  hint, an INT/STRING coerced join key, and `count` as a column alias;
- join41: LEFT OUTER whose ON filter disqualifies every match — rows
  survive null-extended (the HIVE-XXXX outer-ON contract).

Hive's goldens diff ordered output (-- SORT_QUERY_RESULTS); our
comparator is order-insensitive, which is strictly stronger, so the
SORT BY clauses are dropped. `SELECT *` over self-joins is projected
with explicit aliases because the comparator keys columns by name
(value parity is unchanged).
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine
from hive_2_3_2_spark.plans.explain import explain_str

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
    root = tmp_path_factory.mktemp("qfiles_joinnum")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    for name, rows in (("jn_src", SRC), ("jn_src1", SRC1)):
        p = str(root / name)
        spark.createDataFrame(rows, "key string, value string").coalesce(
            2
        ).write.parquet(p)
        eng.register_table(name, p)
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{p}/*.parquet')"
        )
    # srcpart: QTestUtil's ds x hr layout for the partition-pruning shapes
    p_part = str(root / "jn_srcpart")
    prows = [
        (k, v, ds, hr)
        for ds in ("2008-04-08", "2008-04-09")
        for hr in ("11", "12")
        for k, v in SRC
    ]
    spark.createDataFrame(
        prows, "key string, value string, ds string, hr string"
    ).repartition("ds", "hr").write.partitionBy("ds", "hr").parquet(p_part)
    eng.register_table("jn_srcpart", p_part, ["ds", "hr"])
    body = ", ".join(f"('{k}', '{v}', '{ds}', '{hr}')" for k, v, ds, hr in prows)
    con.execute(
        "CREATE VIEW jn_srcpart AS SELECT * FROM (VALUES "
        + body + ") AS t(key, value, ds, hr)"
    )
    yield eng, con, str(root)
    con.close()


def _chk(eng, con, hive_sql, duck_sql=None):
    assert_matches_oracle(eng.sql(hive_sql), con, duck_sql or hive_sql)


def test_q_join0_cross_of_filtered_subqueries(qenv):
    """join0.q: JOIN with NO ON clause between two filtered subqueries
    — implicit cross product of the filtered sides."""
    eng, con, _ = qenv
    _chk(eng, con,
         "SELECT src1.key AS k1, src1.value AS v1, "
         "src2.key AS k2, src2.value AS v2 FROM "
         "(SELECT * FROM jn_src WHERE jn_src.key < 10) src1 JOIN "
         "(SELECT * FROM jn_src WHERE jn_src.key < 10) src2",
         "SELECT src1.key AS k1, src1.value AS v1, "
         "src2.key AS k2, src2.value AS v2 FROM "
         "(SELECT * FROM jn_src WHERE TRY_CAST(key AS DOUBLE) < 10) src1 "
         "CROSS JOIN "
         "(SELECT * FROM jn_src WHERE TRY_CAST(key AS DOUBLE) < 10) src2")


def test_q_join23_cross_with_where_filters(qenv):
    """join23.q: JOIN with no ON, both filters in the WHERE clause —
    same cross product, filters applied post-hoc (and pushed down by
    Catalyst, which the value diff proves is sound)."""
    eng, con, _ = qenv
    _chk(eng, con,
         "SELECT src1.key AS k1, src1.value AS v1, "
         "src2.key AS k2, src2.value AS v2 "
         "FROM jn_src src1 JOIN jn_src src2 "
         "WHERE src1.key < 10 and src2.key < 10",
         "SELECT src1.key AS k1, src1.value AS v1, "
         "src2.key AS k2, src2.value AS v2 "
         "FROM jn_src src1 CROSS JOIN jn_src src2 "
         "WHERE TRY_CAST(src1.key AS DOUBLE) < 10 "
         "AND TRY_CAST(src2.key AS DOUBLE) < 10")


def test_q_join10_from_first_subquery_star(qenv):
    """join10.q: FROM-first over two `SELECT src.*` subqueries,
    projecting one side's star."""
    eng, con, _ = qenv
    _chk(eng, con,
         "FROM (SELECT jn_src.* FROM jn_src) x "
         "JOIN (SELECT jn_src.* FROM jn_src) Y ON (x.key = Y.key) "
         "SELECT Y.*",
         "SELECT Y.key AS key, Y.value AS value "
         "FROM (SELECT * FROM jn_src) x "
         "JOIN (SELECT * FROM jn_src) Y ON x.key = Y.key")


def test_q_join22_nested_star_reexpansion(qenv):
    """join22.q: `src3.*` where src3 is itself a join-derived table
    carrying renamed columns, re-expanded two levels up — column
    resolution through stacked derived tables."""
    eng, con, _ = qenv
    _chk(eng, con,
         "SELECT src5.src1_value AS src1_value FROM "
         "(SELECT src3.*, src4.value AS src4_value, src4.key AS src4_key "
         "FROM jn_src src4 JOIN "
         "(SELECT src2.*, src1.key AS src1_key, src1.value AS src1_value "
         "FROM jn_src src1 JOIN jn_src src2 ON src1.key = src2.key) src3 "
         "ON src3.src1_key = src4.key) src5",
         "SELECT src5.src1_value AS src1_value FROM "
         "(SELECT src3.*, src4.value AS src4_value, src4.key AS src4_key "
         "FROM jn_src src4 JOIN "
         "(SELECT src2.*, src1.key AS src1_key, src1.value AS src1_value "
         "FROM jn_src src1 JOIN jn_src src2 ON src1.key = src2.key) src3 "
         "ON src3.src1_key = src4.key) src5")


def test_q_join11_nonequi_conjunct_in_on(qenv):
    """join11.q: equi key plus a one-sided range conjunct inside ON —
    for an INNER join it's just a pushed filter; values must agree."""
    eng, con, _ = qenv
    _chk(eng, con,
         "SELECT src1.c1 AS c1, src2.c4 AS c4 FROM "
         "(SELECT jn_src.key AS c1, jn_src.value AS c2 FROM jn_src) src1 "
         "JOIN "
         "(SELECT jn_src.key AS c3, jn_src.value AS c4 FROM jn_src) src2 "
         "ON src1.c1 = src2.c3 AND src1.c1 < 40",
         "SELECT src1.c1 AS c1, src2.c4 AS c4 FROM "
         "(SELECT key AS c1, value AS c2 FROM jn_src) src1 JOIN "
         "(SELECT key AS c3, value AS c4 FROM jn_src) src2 "
         "ON src1.c1 = src2.c3 AND TRY_CAST(src1.c1 AS DOUBLE) < 40")


def test_q_join12_three_way_per_edge_filters(qenv):
    """join12.q: 3-way join where each edge carries its own range
    filter; the tighter third-edge filter (< 30) must compose."""
    eng, con, _ = qenv
    _chk(eng, con,
         "SELECT src1.c1 AS c1, src2.c4 AS c4 FROM "
         "(SELECT jn_src.key AS c1, jn_src.value AS c2 FROM jn_src) src1 "
         "JOIN "
         "(SELECT jn_src.key AS c3, jn_src.value AS c4 FROM jn_src) src2 "
         "ON src1.c1 = src2.c3 AND src1.c1 < 40 JOIN "
         "(SELECT jn_src.key AS c5, jn_src.value AS c6 FROM jn_src) src3 "
         "ON src1.c1 = src3.c5 AND src3.c5 < 30",
         "SELECT src1.c1 AS c1, src2.c4 AS c4 FROM "
         "(SELECT key AS c1, value AS c2 FROM jn_src) src1 JOIN "
         "(SELECT key AS c3, value AS c4 FROM jn_src) src2 "
         "ON src1.c1 = src2.c3 AND TRY_CAST(src1.c1 AS DOUBLE) < 40 JOIN "
         "(SELECT key AS c5, value AS c6 FROM jn_src) src3 "
         "ON src1.c1 = src3.c5 AND TRY_CAST(src3.c5 AS DOUBLE) < 30")


def test_q_join13_expression_key_over_two_tables(qenv):
    """join13.q: the third join's key is src1.c1 + src2.c3 — an
    expression over TWO already-joined inputs; string+string arithmetic
    coerces through double (GenericUDFOPPlus)."""
    eng, con, _ = qenv
    _chk(eng, con,
         "SELECT src1.c1 AS c1, src2.c4 AS c4 FROM "
         "(SELECT jn_src.key AS c1, jn_src.value AS c2 FROM jn_src) src1 "
         "JOIN "
         "(SELECT jn_src.key AS c3, jn_src.value AS c4 FROM jn_src) src2 "
         "ON src1.c1 = src2.c3 AND src1.c1 < 40 JOIN "
         "(SELECT jn_src.key AS c5, jn_src.value AS c6 FROM jn_src) src3 "
         "ON src1.c1 + src2.c3 = src3.c5",
         "SELECT src1.c1 AS c1, src2.c4 AS c4 FROM "
         "(SELECT key AS c1, value AS c2 FROM jn_src) src1 JOIN "
         "(SELECT key AS c3, value AS c4 FROM jn_src) src2 "
         "ON src1.c1 = src2.c3 AND TRY_CAST(src1.c1 AS DOUBLE) < 40 JOIN "
         "(SELECT key AS c5, value AS c6 FROM jn_src) src3 "
         "ON TRY_CAST(src1.c1 AS DOUBLE) + TRY_CAST(src2.c3 AS DOUBLE) "
         "= TRY_CAST(src3.c5 AS DOUBLE)")


def test_q_join15_self_equijoin_baseline(qenv):
    """join15.q: plain self equijoin over the duplicated-key multiset
    (aliased projection in place of the golden's SELECT *)."""
    eng, con, _ = qenv
    _chk(eng, con,
         "SELECT src1.key AS k1, src1.value AS v1, "
         "src2.key AS k2, src2.value AS v2 "
         "FROM jn_src src1 JOIN jn_src src2 ON (src1.key = src2.key)",
         "SELECT src1.key AS k1, src1.value AS v1, "
         "src2.key AS k2, src2.value AS v2 "
         "FROM jn_src src1 JOIN jn_src src2 ON src1.key = src2.key")


def test_q_join18_full_outer_aggs_with_distinct(qenv):
    """join18.q: FULL OUTER join of a plain count agg and a
    count(DISTINCT) agg over different tables — Hive's canonical
    multi-job shape (empty src1 keys form a real group on one side)."""
    eng, con, _ = qenv
    _chk(eng, con,
         "SELECT a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv "
         "FROM (SELECT src1.key AS key, count(src1.value) AS value "
         "FROM jn_src src1 GROUP BY src1.key) a "
         "FULL OUTER JOIN "
         "(SELECT src2.key AS key, count(distinct(src2.value)) AS value "
         "FROM jn_src1 src2 GROUP BY src2.key) b ON (a.key = b.key)",
         "SELECT a.key AS ak, CAST(a.value AS BIGINT) AS av, "
         "b.key AS bk, CAST(b.value AS BIGINT) AS bv "
         "FROM (SELECT key, count(value) AS value "
         "FROM jn_src GROUP BY key) a "
         "FULL OUTER JOIN "
         "(SELECT key, count(DISTINCT value) AS value "
         "FROM jn_src1 GROUP BY key) b ON a.key = b.key")


def test_q_join21_contradictory_on_chain(qenv):
    """join21.q: LEFT OUTER with a CONTRADICTORY ON filter (key < 10
    AND key > 10 across the two sides) chained into a RIGHT OUTER —
    every src2 slot is null-extended, so the second ON (src2.key =
    src3.key) matches nothing and all src3 rows survive unmatched."""
    eng, con, _ = qenv
    _chk(eng, con,
         "SELECT src1.key AS k1, src2.key AS k2, src2.value AS v2, "
         "src3.key AS k3, src3.value AS v3 "
         "FROM jn_src src1 LEFT OUTER JOIN jn_src src2 "
         "ON (src1.key = src2.key AND src1.key < 10 AND src2.key > 10) "
         "RIGHT OUTER JOIN jn_src src3 "
         "ON (src2.key = src3.key AND src3.key < 10)",
         "SELECT src1.key AS k1, src2.key AS k2, src2.value AS v2, "
         "src3.key AS k3, src3.value AS v3 "
         "FROM jn_src src1 LEFT OUTER JOIN jn_src src2 "
         "ON src1.key = src2.key "
         "AND TRY_CAST(src1.key AS DOUBLE) < 10 "
         "AND TRY_CAST(src2.key AS DOUBLE) > 10 "
         "RIGHT OUTER JOIN jn_src src3 "
         "ON src2.key = src3.key AND TRY_CAST(src3.key AS DOUBLE) < 10")


def test_q_join40_inner_then_right_outer_on_filters(qenv):
    """join40.q tail: INNER join with one- and two-sided ON filters
    chained into a RIGHT OUTER whose ON filters the preserved side —
    both golden variants."""
    eng, con, _ = qenv
    for extra in ("", " AND src2.key < 15"):
        extra_duck = (
            "" if not extra else " AND TRY_CAST(src2.key AS DOUBLE) < 15"
        )
        _chk(eng, con,
             "SELECT src1.key AS k1, src2.key AS k2, "
             "src3.key AS k3, src3.value AS v3 "
             "FROM jn_src src1 JOIN jn_src src2 "
             f"ON (src1.key = src2.key AND src1.key < 10{extra}) "
             "RIGHT OUTER JOIN jn_src src3 "
             "ON (src1.key = src3.key AND src3.key < 20)",
             "SELECT src1.key AS k1, src2.key AS k2, "
             "src3.key AS k3, src3.value AS v3 "
             "FROM jn_src src1 JOIN jn_src src2 "
             "ON src1.key = src2.key "
             f"AND TRY_CAST(src1.key AS DOUBLE) < 10{extra_duck} "
             "RIGHT OUTER JOIN jn_src src3 "
             "ON src1.key = src3.key AND TRY_CAST(src3.key AS DOUBLE) < 20")


def test_q_join40_left_outer_filtered_subquery(qenv):
    """join40.q head: LEFT OUTER against a filtered subquery — the
    filter belongs to the subquery (pre-join), not the ON clause."""
    eng, con, _ = qenv
    _chk(eng, con,
         "SELECT x.key AS xk, x.value AS xv, y.key AS yk, y.value AS yv "
         "FROM jn_src x LEFT OUTER JOIN "
         "(SELECT * FROM jn_src WHERE key <= 20) y ON (x.key = y.key)",
         "SELECT x.key AS xk, x.value AS xv, y.key AS yk, y.value AS yv "
         "FROM jn_src x LEFT OUTER JOIN "
         "(SELECT * FROM jn_src WHERE TRY_CAST(key AS DOUBLE) <= 20) y "
         "ON x.key = y.key")


def test_q_join8_nested_from_first_outer_insert(qenv):
    """join8.q: FROM-first subqueries on BOTH sides of a LEFT OUTER,
    wrapped in another FROM-first, sunk with INSERT OVERWRITE plus an
    IS NULL / IS NOT NULL filter over the null-producing side — the
    anti-join-by-outer idiom."""
    eng, con, root = qenv
    eng.spark.sql("DROP TABLE IF EXISTS jn_dest8")
    eng.sql(
        "CREATE TABLE IF NOT EXISTS jn_dest8 "
        "(c1 INT, c2 STRING, c3 INT, c4 STRING) "
        f"STORED AS TEXTFILE LOCATION '{root}/jn_dest8'"
    )
    eng.sql(
        "FROM ( "
        " FROM ( FROM jn_src src1 "
        "   SELECT src1.key AS c1, src1.value AS c2 "
        "   WHERE src1.key > 10 and src1.key < 20 ) a "
        " LEFT OUTER JOIN ( FROM jn_src src2 "
        "   SELECT src2.key AS c3, src2.value AS c4 "
        "   WHERE src2.key > 15 and src2.key < 25 ) b "
        " ON (a.c1 = b.c3) "
        " SELECT a.c1 AS c1, a.c2 AS c2, b.c3 AS c3, b.c4 AS c4 "
        ") c "
        "INSERT OVERWRITE TABLE jn_dest8 SELECT c.c1, c.c2, c.c3, c.c4 "
        "WHERE c.c3 IS NULL AND c.c1 IS NOT NULL"
    )
    assert_matches_oracle(
        eng.sql("SELECT c1, c2, c3, c4 FROM jn_dest8"),
        con,
        "SELECT CAST(a.c1 AS INT) AS c1, a.c2 AS c2, "
        "CAST(b.c3 AS INT) AS c3, b.c4 AS c4 FROM "
        "(SELECT key AS c1, value AS c2 FROM jn_src "
        " WHERE TRY_CAST(key AS DOUBLE) > 10 "
        " AND TRY_CAST(key AS DOUBLE) < 20) a "
        "LEFT OUTER JOIN "
        "(SELECT key AS c3, value AS c4 FROM jn_src "
        " WHERE TRY_CAST(key AS DOUBLE) > 15 "
        " AND TRY_CAST(key AS DOUBLE) < 25) b ON a.c1 = b.c3 "
        "WHERE b.c3 IS NULL AND a.c1 IS NOT NULL",
    )


def test_q_join28_partition_pruned_three_way_insert(qenv, spark):
    """join28.q: (src1 JOIN src) subquery joined to srcpart with the
    partition predicates in the ON clause, sunk to a table — the
    srcpart scan must be pruned to ds='2008-04-08'/hr=11 (inner join:
    ON-filters ARE scan filters), and the round-tripped values must
    match."""
    eng, con, root = qenv
    eng.spark.sql("DROP TABLE IF EXISTS jn_dest28")
    eng.sql(
        "CREATE TABLE IF NOT EXISTS jn_dest28 (key STRING, value STRING) "
        f"STORED AS TEXTFILE LOCATION '{root}/jn_dest28'"
    )
    probe = eng.sql(
        "SELECT subq.key1, z.value "
        "FROM (SELECT x.key AS key1, x.value AS value1, "
        "y.key AS key2, y.value AS value2 "
        "FROM jn_src1 x JOIN jn_src y ON (x.key = y.key)) subq "
        "JOIN jn_srcpart z "
        "ON (subq.key1 = z.key AND z.ds='2008-04-08' AND z.hr=11)"
    )
    plan = explain_str(probe)
    pf = plan.split("PartitionFilters", 1)[-1][:400]
    assert "2008-04-08" in pf, f"srcpart not pruned:\n{plan}"
    eng.sql(
        "INSERT OVERWRITE TABLE jn_dest28 "
        "SELECT subq.key1, z.value "
        "FROM (SELECT x.key AS key1, x.value AS value1, "
        "y.key AS key2, y.value AS value2 "
        "FROM jn_src1 x JOIN jn_src y ON (x.key = y.key)) subq "
        "JOIN jn_srcpart z "
        "ON (subq.key1 = z.key AND z.ds='2008-04-08' AND z.hr=11)"
    )
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM jn_dest28"),
        con,
        "SELECT x.key AS key, z.value AS value "
        "FROM jn_src1 x JOIN jn_src y ON x.key = y.key "
        "JOIN jn_srcpart z ON x.key = z.key "
        "AND z.ds = '2008-04-08' AND z.hr = '11'",
    )


def test_q_join29_agg_subqueries_feed_insert(qenv):
    """join29.q / join36.q: two aggregate subqueries joined and sunk
    with INSERT OVERWRITE — Hive runs this as 3 MR jobs; here it is
    one DAG whose round-tripped result must match the oracle."""
    eng, con, root = qenv
    eng.spark.sql("DROP TABLE IF EXISTS jn_dest29")
    eng.sql(
        "CREATE TABLE IF NOT EXISTS jn_dest29 "
        "(key STRING, cnt1 INT, cnt2 INT) "
        f"STORED AS TEXTFILE LOCATION '{root}/jn_dest29'"
    )
    eng.sql(
        "INSERT OVERWRITE TABLE jn_dest29 "
        "SELECT subq1.key, subq1.cnt, subq2.cnt "
        "FROM (select x.key, count(1) as cnt from jn_src1 x "
        "group by x.key) subq1 "
        "JOIN (select y.key, count(1) as cnt from jn_src y "
        "group by y.key) subq2 ON (subq1.key = subq2.key)"
    )
    assert_matches_oracle(
        eng.sql("SELECT key, cnt1, cnt2 FROM jn_dest29"),
        con,
        "SELECT subq1.key AS key, CAST(subq1.cnt AS INT) AS cnt1, "
        "CAST(subq2.cnt AS INT) AS cnt2 "
        "FROM (SELECT key, count(1) AS cnt FROM jn_src1 GROUP BY key) subq1 "
        "JOIN (SELECT key, count(1) AS cnt FROM jn_src GROUP BY key) subq2 "
        "ON subq1.key = subq2.key",
    )


def test_q_join38_from_first_where_after_select(qenv):
    """join38.q: FROM-first with the WHERE and GROUP BY written AFTER
    the SELECT list, a MAPJOIN hint, an INT-vs-STRING coerced join
    key, and `count` used as a bare column alias."""
    eng, con, root = qenv
    eng.spark.sql("DROP TABLE IF EXISTS jn_tmp38")
    eng.sql(
        "CREATE TABLE IF NOT EXISTS jn_tmp38 (col5 INT, col11 INT) "
        f"STORED AS PARQUET LOCATION '{root}/jn_tmp38'"
    )
    eng.sql(
        "INSERT OVERWRITE TABLE jn_tmp38 "
        "SELECT cast(key + 5 as int), cast(key + 11 as int) "
        "FROM jn_src WHERE key = 47"
    )
    got = eng.sql(
        "FROM jn_src a JOIN jn_tmp38 b ON (a.key = b.col11) "
        "SELECT /*+ MAPJOIN(a) */ a.value, b.col5, count(1) as count "
        "WHERE b.col11 = 58 "
        "GROUP BY a.value, b.col5"
    )
    assert_matches_oracle(
        got,
        con,
        "SELECT a.value AS value, b.col5 AS col5, "
        "CAST(count(1) AS BIGINT) AS count "
        "FROM jn_src a JOIN "
        "(SELECT CAST(TRY_CAST(key AS DOUBLE) + 5 AS INT) AS col5, "
        " CAST(TRY_CAST(key AS DOUBLE) + 11 AS INT) AS col11 "
        " FROM jn_src WHERE key = '47') b "
        "ON TRY_CAST(a.key AS DOUBLE) = CAST(b.col11 AS DOUBLE) "
        "WHERE b.col11 = 58 GROUP BY a.value, b.col5",
    )


def test_q_join41_on_filter_disqualifies_all(qenv):
    """join41.q: CTAS a single-key slice, then LEFT OUTER where the ON
    filter (src2.key > 10) disqualifies every match — each left row
    survives exactly once, null-extended."""
    eng, con, root = qenv
    eng.spark.sql("DROP TABLE IF EXISTS jn_s1")
    eng.sql(
        f"CREATE TABLE jn_s1 LOCATION '{root}/jn_s1' AS "
        "SELECT * FROM jn_src WHERE key = 0"
    )
    _chk(eng, con,
         "SELECT src1.key AS k1, src1.value AS v1, "
         "src2.key AS k2, src2.value AS v2 "
         "FROM jn_s1 src1 LEFT OUTER JOIN jn_s1 src2 "
         "ON (src1.key = src2.key AND src2.key > 10)",
         "SELECT src1.key AS k1, src1.value AS v1, "
         "src2.key AS k2, src2.value AS v2 FROM "
         "(SELECT * FROM jn_src WHERE key = '0') src1 LEFT OUTER JOIN "
         "(SELECT * FROM jn_src WHERE key = '0') src2 "
         "ON src1.key = src2.key AND TRY_CAST(src2.key AS DOUBLE) > 10")


def test_q_join_merging_cross_table_on_predicates(spark, oracle, sf_dir):
    """join_merging.q (reference: clientpositive/join_merging.q): LOJ
    then ROJ where the second ON references columns of BOTH left-side
    tables (p1.p_size > 10, and the p1.p_size > p2.p_size + 10
    variant) — Hive merges the joins only when legal; the answers must
    match ANSI semantics either way."""
    from hive_2_3_2_spark.engine import Engine
    from tests.conftest import assert_matches_oracle

    eng = Engine(spark=spark, sf_dir=sf_dir)
    for extra in ("", " and p1.p_size > p2.p_size + 10"):
        sql = (
            "select p1.p_partkey AS k1, p2.p_partkey AS k2, "
            "p3.p_partkey AS k3, p1.p_size AS s1 "
            "from part p1 left outer join part p2 "
            "on p1.p_partkey = p2.p_partkey "
            "right outer join part p3 "
            f"on p2.p_partkey = p3.p_partkey and p1.p_size > 10{extra}"
        )
        assert_matches_oracle(eng.sql(sql), oracle, sql)


def test_q_join45_tuple_in_mixed_types(qenv):
    """join45.q: multi-column IN as a JOIN condition with INT literals
    against STRING keys — Hive coerces each field pairwise; the engine
    expands the row-value IN to per-field conjunctions (see
    _rewrite_tuple_in). Scalar IN and function-call arguments are
    untouched (inert cases pinned)."""
    eng, con, _ = qenv
    _chk(eng, con,
         "SELECT src1.key AS k1, src1.value AS v1, "
         "src2.key AS k2, src2.value AS v2 "
         "FROM jn_src1 src1 JOIN jn_src src2 "
         "ON ((src1.key, src2.key) IN ((66, 66), (2, 2), (4, 4)))",
         "SELECT src1.key AS k1, src1.value AS v1, "
         "src2.key AS k2, src2.value AS v2 "
         "FROM jn_src1 src1 JOIN jn_src src2 ON ("
         "(TRY_CAST(src1.key AS DOUBLE) = 66 AND "
         " TRY_CAST(src2.key AS DOUBLE) = 66) OR "
         "(TRY_CAST(src1.key AS DOUBLE) = 2 AND "
         " TRY_CAST(src2.key AS DOUBLE) = 2) OR "
         "(TRY_CAST(src1.key AS DOUBLE) = 4 AND "
         " TRY_CAST(src2.key AS DOUBLE) = 4))")
    from hive_2_3_2_spark.engine import _rewrite_tuple_in
    # inert: scalar IN, subquery IN, function-call args before IN
    for s in (
        "SELECT * FROM t WHERE key IN (1, 2)",
        "SELECT * FROM t WHERE (a+b) IN (1, 2)",
        "SELECT * FROM t WHERE (a, b) IN (SELECT x, y FROM u)",
        "SELECT * FROM t WHERE concat(a, b) IN ('x', 'y')",
    ):
        assert _rewrite_tuple_in(s) == s, s
