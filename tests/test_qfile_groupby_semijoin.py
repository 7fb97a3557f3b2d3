"""clientpositive `.q` slice, round 6b: the groupby/having goldens
(groupby_grouping_sets1.q, having.q, groupby_position.q,
groupby_distinct_samekey.q, groupby_sort_1.q) and the semijoin.q
battery (LEFT SEMI JOIN in every position: hints, subquery right
sides, expression keys, chained with outer joins). Reference:
ql/src/test/queries/clientpositive/semijoin.q ff.

Method: same fixtures/harness as the other qfile slices; semi-join
oracles are written as EXISTS subqueries (engine-portable), grouping
sets as native DuckDB GROUPING SETS. Hive-specific pins: duplicate
grouping sets are DEDUPED (the groupby_grouping_sets1.q golden emits
each `a` once for GROUPING SETS ((a),(a))), and HAVING may reference a
SELECT alias (having.q's `HAVING c > 3`)."""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

GS = [("8", "1", "1"), ("5", "2", "2"), ("1", "1", "3"),
      ("2", "2", "4"), ("2", "3", "5"), ("3", "2", "8")]
SRC = [(str(i % 83), f"val_{i % 83}") for i in range(500)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_gsj")
    eng = Engine(spark=spark)
    spark.createDataFrame(GS, "a string, b string, c string") \
        .createOrReplaceTempView("gs_t1")
    p = str(root / "src")
    spark.createDataFrame(SRC, "key string, value string").coalesce(
        2
    ).write.parquet(p)
    eng.register_table("src", p)
    # semijoin.q tables: t1 = int keys <= 10; t2 = doubled; t3 = union;
    # t4 empty
    spark.sql(
        "SELECT CAST(key AS INT) AS key, value FROM src "
        "WHERE CAST(key AS INT) <= 10"
    ).createOrReplaceTempView("sj_t1")
    spark.sql(
        "SELECT CAST(2 * key AS INT) AS key, value FROM sj_t1"
    ).createOrReplaceTempView("sj_t2")
    spark.sql(
        "SELECT * FROM sj_t1 UNION ALL SELECT * FROM sj_t2"
    ).createOrReplaceTempView("sj_t3")
    spark.createDataFrame([], "key int, value string") \
        .createOrReplaceTempView("sj_t4")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW gs_t1 AS SELECT * FROM (VALUES "
        + ", ".join(f"('{a}','{b}','{c}')" for a, b, c in GS)
        + ") AS t(a, b, c)"
    )
    con.execute(
        f"CREATE VIEW src AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    con.execute(
        "CREATE VIEW sj_t1 AS SELECT CAST(key AS INT) AS key, value "
        "FROM src WHERE CAST(key AS INT) <= 10"
    )
    con.execute(
        "CREATE VIEW sj_t2 AS SELECT CAST(2 * CAST(key AS INT) AS INT) "
        "AS key, value FROM sj_t1"
    )
    con.execute(
        "CREATE VIEW sj_t3 AS SELECT * FROM sj_t1 "
        "UNION ALL SELECT * FROM sj_t2"
    )
    con.execute(
        "CREATE VIEW sj_t4 AS SELECT CAST(NULL AS INT) AS key, "
        "CAST(NULL AS VARCHAR) AS value WHERE 1=0"
    )
    yield eng, con
    con.close()


def _chk(eng, con, hive_sql, duck_sql=None):
    assert_matches_oracle(eng.sql(hive_sql), con, duck_sql or hive_sql)


def test_q_grouping_sets1_cube_forms(qenv):
    """groupby_grouping_sets1.q: WITH CUBE and cube(a,b) are the same
    statement; GROUPING SETS with and without the () grand total."""
    eng, con = qenv
    for form in ("group by a, b with cube", "group by cube(a, b)"):
        _chk(eng, con,
             f"SELECT a, b, count(*) AS n from gs_t1 {form}",
             "SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM gs_t1 "
             "GROUP BY CUBE(a, b)")
    _chk(eng, con,
         "SELECT a, b, count(*) AS n FROM gs_t1 GROUP BY a, b "
         "GROUPING SETS (a, (a, b), b, ())",
         "SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM gs_t1 "
         "GROUP BY GROUPING SETS ((a), (a, b), (b), ())")
    _chk(eng, con,
         "SELECT a, b, count(*) AS n FROM gs_t1 GROUP BY a, b "
         "GROUPING SETS (a, (a, b))",
         "SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM gs_t1 "
         "GROUP BY GROUPING SETS ((a), (a, b))")


def test_q_grouping_sets1_subset_projection_and_dup_sets(qenv):
    """groupby_grouping_sets1.q tail: projecting only `a` from 3-key
    grouping sets, and Hive's DEDUP of duplicate sets — GROUPING SETS
    ((a),(a)) emits each a ONCE (golden: 1,2,3,5,8)."""
    eng, con = qenv
    _chk(eng, con,
         "SELECT a FROM gs_t1 GROUP BY a, b, c GROUPING SETS (a, b, c)",
         "SELECT a FROM gs_t1 GROUP BY GROUPING SETS ((a), (b), (c))")
    got = sorted(
        r.a for r in eng.sql(
            "SELECT a FROM gs_t1 GROUP BY a GROUPING SETS ((a), (a))"
        ).collect()
    )
    assert got == ["1", "2", "3", "5", "8"], got


def test_q_grouping_sets_expression_key(qenv):
    """groupby_grouping_sets1.q: GROUP BY a+b GROUPING SETS (a+b) — an
    EXPRESSION as the grouping set element (string + string coerces to
    double in Hive)."""
    eng, con = qenv
    _chk(eng, con,
         "SELECT a + b AS ab, count(*) AS n FROM gs_t1 "
         "GROUP BY a + b GROUPING SETS (a+b)",
         "SELECT CAST(a AS DOUBLE) + CAST(b AS DOUBLE) AS ab, "
         "CAST(count(*) AS BIGINT) AS n FROM gs_t1 "
         "GROUP BY CAST(a AS DOUBLE) + CAST(b AS DOUBLE)")


def test_q_having_battery(qenv):
    """having.q: HAVING on a SELECT alias, on the group key, on an
    aggregate not in the select list, and combined with WHERE."""
    eng, con = qenv
    _chk(eng, con,
         "SELECT count(value) AS c FROM src GROUP BY key HAVING c > 3",
         "SELECT c FROM (SELECT CAST(count(value) AS BIGINT) AS c "
         "FROM src GROUP BY key) t WHERE c > 3")
    _chk(eng, con,
         "SELECT key, max(value) AS c FROM src GROUP BY key "
         "HAVING key != 30",
         "SELECT key, max(value) AS c FROM src GROUP BY key "
         "HAVING CAST(key AS DOUBLE) != 30")
    _chk(eng, con,
         "SELECT key FROM src GROUP BY key HAVING max(value) > 'val_55'",
         "SELECT key FROM src GROUP BY key HAVING max(value) > 'val_55'")
    _chk(eng, con,
         "SELECT key FROM src WHERE key > 30 GROUP BY key "
         "HAVING max(value) > 'val_55'",
         "SELECT key FROM src WHERE CAST(key AS DOUBLE) > 30 "
         "GROUP BY key HAVING max(value) > 'val_55'")
    _chk(eng, con,
         "SELECT key, COUNT(value) AS n FROM src GROUP BY key "
         "HAVING count(value) >= 4",
         "SELECT key, CAST(COUNT(value) AS BIGINT) AS n FROM src "
         "GROUP BY key HAVING count(value) >= 4")


def test_q_groupby_position_ordinals_multi_insert(qenv, spark,
                                                  tmp_path_factory):
    """groupby_position.q: GROUP BY 1 / GROUP BY 1, 2 ordinals inside
    MULTI-INSERT branches with COUNT(DISTINCT substr(...)) — ordinal
    resolution must survive the shared-FROM reattachment. The .q file
    SETs hive.groupby.orderby.position.alias=true up top (Hive 2.3's
    default treats bare GROUP BY integers as constants) — replayed."""
    eng, con = qenv
    root = tmp_path_factory.mktemp("gbpos")
    for name, ddl in (("gbp_t1", "key string, cnt bigint"),
                      ("gbp_t2", "key string, value string, cnt bigint")):
        p = str(root / name)
        spark.createDataFrame([], ddl).write.parquet(p)
        eng.register_table(name, p)
    eng.sql("set hive.groupby.orderby.position.alias=true")
    eng.sql(
        "FROM src "
        "INSERT OVERWRITE TABLE gbp_t1 "
        "SELECT src.key, COUNT(DISTINCT SUBSTR(src.value,5)) "
        "WHERE src.key < 20 GROUP BY 1 "
        "INSERT OVERWRITE TABLE gbp_t2 "
        "SELECT src.key, src.value, COUNT(DISTINCT SUBSTR(src.value,5)) "
        "WHERE src.key < 20 GROUP BY 1, 2"
    )
    assert_matches_oracle(
        eng.table("gbp_t1"), con,
        "SELECT key, CAST(COUNT(DISTINCT SUBSTR(value,5)) AS BIGINT) "
        "AS cnt FROM src WHERE CAST(key AS DOUBLE) < 20 GROUP BY key",
    )
    assert_matches_oracle(
        eng.table("gbp_t2"), con,
        "SELECT key, value, CAST(COUNT(DISTINCT SUBSTR(value,5)) "
        "AS BIGINT) AS cnt FROM src WHERE CAST(key AS DOUBLE) < 20 "
        "GROUP BY key, value",
    )
    eng.sql("set hive.groupby.orderby.position.alias=false")


def test_q_groupby_distinct_samekey(qenv):
    """groupby_distinct_samekey.q: sum(DISTINCT k) grouped by k itself
    (trivially k), through an ordered subquery too."""
    eng, con = qenv
    _chk(eng, con,
         "select Q1.key, sum(distinct Q1.key) AS s from "
         "(select CAST(key AS INT) AS key from src order by key) Q1 "
         "group by Q1.key",
         "SELECT key, CAST(SUM(DISTINCT key) AS BIGINT) AS s FROM "
         "(SELECT CAST(key AS INT) AS key FROM src) Q1 GROUP BY key")


def test_q_semijoin_plain_battery(qenv):
    """semijoin.q head: LEFT SEMI JOIN against tables, empty tables,
    filtered right sides, extra ON conditions, and subquery right
    sides — all oracled as EXISTS."""
    eng, con = qenv
    _chk(eng, con,
         "select a.key AS k, a.value AS v from sj_t1 a "
         "left semi join sj_t2 b on a.key=b.key",
         "SELECT a.key AS k, a.value AS v FROM sj_t1 a WHERE EXISTS "
         "(SELECT 1 FROM sj_t2 b WHERE a.key = b.key)")
    _chk(eng, con,
         "select a.key AS k, a.value AS v from sj_t2 a "
         "left semi join sj_t1 b on b.key=a.key",
         "SELECT a.key AS k, a.value AS v FROM sj_t2 a WHERE EXISTS "
         "(SELECT 1 FROM sj_t1 b WHERE b.key = a.key)")
    _chk(eng, con,
         "select a.key AS k from sj_t1 a left semi join sj_t4 b "
         "on b.key=a.key",
         "SELECT a.key AS k FROM sj_t1 a WHERE EXISTS "
         "(SELECT 1 FROM sj_t4 b WHERE b.key = a.key)")
    _chk(eng, con,
         "select a.value AS v from sj_t1 a left semi join sj_t3 b "
         "on (b.key = a.key and b.key < '15')",
         "SELECT a.value AS v FROM sj_t1 a WHERE EXISTS "
         "(SELECT 1 FROM sj_t3 b WHERE b.key = a.key "
         "AND CAST(b.key AS DOUBLE) < 15)")
    _chk(eng, con,
         "select a.key AS k, a.value AS v from sj_t1 a "
         "left semi join sj_t2 b on a.key = b.key "
         "and b.value < 'val_10'",
         "SELECT a.key AS k, a.value AS v FROM sj_t1 a WHERE EXISTS "
         "(SELECT 1 FROM sj_t2 b WHERE a.key = b.key "
         "AND b.value < 'val_10')")
    _chk(eng, con,
         "select a.value AS v from sj_t1 a left semi join "
         "(select key from sj_t3 where key > 5) b on a.key = b.key",
         "SELECT a.value AS v FROM sj_t1 a WHERE EXISTS (SELECT 1 "
         "FROM (SELECT key FROM sj_t3 WHERE key > 5) b "
         "WHERE a.key = b.key)")
    _chk(eng, con,
         "select a.key AS k, a.value AS v from sj_t1 a "
         "left semi join sj_t2 b on a.key = 2*b.key",
         "SELECT a.key AS k, a.value AS v FROM sj_t1 a WHERE EXISTS "
         "(SELECT 1 FROM sj_t2 b WHERE a.key = 2 * b.key)")
    _chk(eng, con,
         "select /*+ mapjoin(b) */ a.key AS k from sj_t3 a "
         "left semi join sj_t1 b on a.key = b.key",
         "SELECT a.key AS k FROM sj_t3 a WHERE EXISTS "
         "(SELECT 1 FROM sj_t1 b WHERE a.key = b.key)")
    _chk(eng, con,
         "select a.key AS k, a.value AS v from sj_t3 a "
         "left semi join sj_t1 b on a.key = b.key and a.value=b.value",
         "SELECT a.key AS k, a.value AS v FROM sj_t3 a WHERE EXISTS "
         "(SELECT 1 FROM sj_t1 b WHERE a.key = b.key "
         "AND a.value = b.value)")


def test_q_semijoin_chained_with_joins(qenv):
    """semijoin.q tail: LEFT SEMI JOIN chained with inner and OUTER
    joins on either side — the semi filter applies to its left input
    as built SO FAR, and outer-join NULLs flowing into a semi key
    never match."""
    eng, con = qenv
    _chk(eng, con,
         "select a.key AS k, a.value AS v from sj_t1 a "
         "join sj_t2 b on a.key = b.key "
         "left semi join sj_t3 c on b.key = c.key",
         "SELECT a.key AS k, a.value AS v FROM sj_t1 a "
         "JOIN sj_t2 b ON a.key = b.key WHERE EXISTS "
         "(SELECT 1 FROM sj_t3 c WHERE b.key = c.key)")
    _chk(eng, con,
         "select /*+ mapjoin(b, c) */ a.key AS k from sj_t3 a "
         "left semi join sj_t1 b on a.key = b.key "
         "left semi join sj_t2 c on a.key = c.key",
         "SELECT a.key AS k FROM sj_t3 a WHERE EXISTS "
         "(SELECT 1 FROM sj_t1 b WHERE a.key = b.key) AND EXISTS "
         "(SELECT 1 FROM sj_t2 c WHERE a.key = c.key)")
    _chk(eng, con,
         "select a.key AS k from sj_t3 a "
         "left semi join sj_t2 b on a.key = b.key "
         "left outer join sj_t1 c on a.key = c.key",
         "SELECT a.key AS k FROM (SELECT * FROM sj_t3 a WHERE EXISTS "
         "(SELECT 1 FROM sj_t2 b WHERE a.key = b.key)) a "
         "LEFT OUTER JOIN sj_t1 c ON a.key = c.key")
    _chk(eng, con,
         "select a.key AS k from sj_t3 a "
         "left semi join sj_t2 b on a.key = b.key "
         "right outer join sj_t1 c on a.key = c.key",
         "SELECT a.key AS k FROM (SELECT * FROM sj_t3 a WHERE EXISTS "
         "(SELECT 1 FROM sj_t2 b WHERE a.key = b.key)) a "
         "RIGHT OUTER JOIN sj_t1 c ON a.key = c.key")
    _chk(eng, con,
         "select a.key AS k from sj_t3 a "
         "left semi join sj_t1 b on a.key = b.key "
         "full outer join sj_t2 c on a.key = c.key",
         "SELECT a.key AS k FROM (SELECT * FROM sj_t3 a WHERE EXISTS "
         "(SELECT 1 FROM sj_t1 b WHERE a.key = b.key)) a "
         "FULL OUTER JOIN sj_t2 c ON a.key = c.key")
    _chk(eng, con,
         "select a.key AS k from sj_t3 a "
         "left semi join sj_t2 b on a.value = b.value "
         "where a.key > 100",
         "SELECT a.key AS k FROM sj_t3 a WHERE EXISTS "
         "(SELECT 1 FROM sj_t2 b WHERE a.value = b.value) "
         "AND a.key > 100")


def test_q_groupby_sort_self_overwrite(qenv, spark, tmp_path_factory):
    """groupby_sort_1.q head: INSERT OVERWRITE a table FROM ITSELF
    (staged rewrite — the read must complete before the clobber), then
    aggregate into a typed target."""
    eng, con = qenv
    root = tmp_path_factory.mktemp("gbsort")
    p = str(root / "gbs_t1")
    spark.createDataFrame(
        [("1", "11"), ("2", "12"), ("3", "13"), ("7", "17"),
         ("8", "18"), ("8", "28")],
        "key string, val string",
    ).write.parquet(p)
    eng.register_table("gbs_t1", p)
    eng.sql("INSERT OVERWRITE TABLE gbs_t1 select key, val from gbs_t1")
    assert eng.table("gbs_t1").count() == 6
    p2 = str(root / "gbs_out")
    spark.createDataFrame([], "key int, cnt int").write.parquet(p2)
    eng.register_table("gbs_out", p2)
    eng.sql(
        "INSERT OVERWRITE TABLE gbs_out "
        "SELECT key, count(1) FROM gbs_t1 GROUP BY key"
    )
    got = sorted((r.key, r.cnt) for r in eng.table("gbs_out").collect())
    assert got == [(1, 1), (2, 1), (3, 1), (7, 1), (8, 2)], got
