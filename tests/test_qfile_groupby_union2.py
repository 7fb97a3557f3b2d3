"""clientpositive `.q` slice, round 6g: second groupby/union wave —
groupby4/6/8/10/13.q and union5/7/24.q (reference:
ql/src/test/queries/clientpositive/groupby8.q ff.). The shapes these
goldens protect beyond the first wave:

- groupby4/6: FROM-first INSERT whose select list is a bare
  expression-GROUP BY / SELECT DISTINCT (no aggregate call at all);
- groupby8: ONE scan multi-inserted into TWO sinks, each computing
  count(DISTINCT substr(value)) — Hive's correlated two-MR-job plan,
  Spark's shared persisted source fanning into two write jobs (this is
  also the round's catalog-table multi-insert path under test);
- groupby10: multi-insert where one branch does count+count(distinct)
  and the other sum+sum(DISTINCT substr(...)) — summing STRING
  substrings coerces through double (GenericUDAFSum string path);
- groupby13: GROUP BY listing the same column twice plus an expression
  that also appears inside an aggregate (Hive dedups the group keys;
  HIVE-10572 golden);
- union5/7: UNION ALL whose branches are a one-row aggregate and (7) a
  plain table, re-aggregated on top — the union-of-aggregates type
  unification shape;
- union24: a CTAS chain unioned 4 ways, one branch re-aggregating.
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
    root = tmp_path_factory.mktemp("qfiles_gbu2")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    for name, rows in (("gu_src", SRC), ("gu_src1", SRC1)):
        p = str(root / name)
        spark.createDataFrame(rows, "key string, value string").coalesce(
            2
        ).write.parquet(p)
        eng.register_table(name, p)
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{p}/*.parquet')"
        )
    yield eng, con, str(root)
    con.close()


def _mkdest(eng, root, name, cols):
    eng.spark.sql(f"DROP TABLE IF EXISTS {name}")
    eng.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({cols}) "
        f"STORED AS PARQUET LOCATION '{root}/{name}'"
    )


def test_q_groupby4_bare_expression_group_by(qenv):
    """groupby4.q: INSERT of substr(key,1,1) GROUP BY the same
    expression — no aggregate in the select list at all."""
    eng, con, root = qenv
    _mkdest(eng, root, "gu_dest4", "c1 STRING")
    eng.sql(
        "FROM gu_src INSERT OVERWRITE TABLE gu_dest4 "
        "SELECT substr(gu_src.key,1,1) GROUP BY substr(gu_src.key,1,1)"
    )
    assert_matches_oracle(
        eng.sql("SELECT c1 FROM gu_dest4"),
        con,
        "SELECT DISTINCT substr(key,1,1) AS c1 FROM gu_src",
    )


def test_q_groupby6_select_distinct_insert(qenv):
    """groupby6.q: FROM-first INSERT ... SELECT DISTINCT expr."""
    eng, con, root = qenv
    _mkdest(eng, root, "gu_dest6", "c1 STRING")
    eng.sql(
        "FROM gu_src INSERT OVERWRITE TABLE gu_dest6 "
        "SELECT DISTINCT substr(gu_src.value,5,1)"
    )
    assert_matches_oracle(
        eng.sql("SELECT c1 FROM gu_dest6"),
        con,
        "SELECT DISTINCT substr(value,5,1) AS c1 FROM gu_src",
    )


def test_q_groupby8_two_distinct_sinks(qenv):
    """groupby8.q: one scan, two sinks, each count(DISTINCT
    substr(value,5)) GROUP BY key — the multi-insert correlation shape,
    run twice (the golden repeats it to probe plan reuse)."""
    eng, con, root = qenv
    _mkdest(eng, root, "gu_dest8a", "key INT, value STRING")
    _mkdest(eng, root, "gu_dest8b", "key INT, value STRING")
    stmt = (
        "FROM gu_src "
        "INSERT OVERWRITE TABLE gu_dest8a SELECT gu_src.key, "
        "COUNT(DISTINCT SUBSTR(gu_src.value,5)) GROUP BY gu_src.key "
        "INSERT OVERWRITE TABLE gu_dest8b SELECT gu_src.key, "
        "COUNT(DISTINCT SUBSTR(gu_src.value,5)) GROUP BY gu_src.key"
    )
    eng.sql(stmt)
    eng.sql(stmt)  # golden re-runs: OVERWRITE must swap cleanly
    oracle = (
        "SELECT CAST(key AS INT) AS key, "
        "CAST(count(DISTINCT substr(value,5)) AS STRING) AS value "
        "FROM gu_src GROUP BY key"
    )
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM gu_dest8a"), con, oracle
    )
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM gu_dest8b"), con, oracle
    )


def test_q_groupby10_sum_distinct_string_substr(qenv):
    """groupby10.q: branch 1 count + count(distinct), branch 2 sum +
    sum(DISTINCT substr(value,5)) — summing string substrings coerces
    through double."""
    eng, con, root = qenv
    _mkdest(eng, root, "gu_dest10a", "key INT, val1 INT, val2 INT")
    _mkdest(eng, root, "gu_dest10b", "key INT, val1 INT, val2 INT")
    eng.sql(
        "FROM gu_src "
        "INSERT OVERWRITE TABLE gu_dest10a SELECT gu_src.key, "
        "count(substr(gu_src.value,5)), "
        "count(distinct substr(gu_src.value,5)) GROUP BY gu_src.key "
        "INSERT OVERWRITE TABLE gu_dest10b SELECT gu_src.key, "
        "sum(substr(gu_src.value,5)), "
        "sum(distinct substr(gu_src.value,5)) GROUP BY gu_src.key"
    )
    assert_matches_oracle(
        eng.sql("SELECT key, val1, val2 FROM gu_dest10a"),
        con,
        "SELECT CAST(key AS INT) AS key, "
        "CAST(count(substr(value,5)) AS INT) AS val1, "
        "CAST(count(DISTINCT substr(value,5)) AS INT) AS val2 "
        "FROM gu_src GROUP BY key",
    )
    assert_matches_oracle(
        eng.sql("SELECT key, val1, val2 FROM gu_dest10b"),
        con,
        "SELECT CAST(key AS INT) AS key, "
        "CAST(sum(TRY_CAST(substr(value,5) AS DOUBLE)) AS INT) AS val1, "
        "CAST(sum(DISTINCT TRY_CAST(substr(value,5) AS DOUBLE)) AS INT) "
        "AS val2 FROM gu_src GROUP BY key",
    )


def test_q_groupby13_duplicate_group_expressions(qenv):
    """groupby13.q (HIVE-10572): GROUP BY names the same column twice
    plus an expression also used inside MAX(...) — must parse and
    produce one row per distinct key pair."""
    eng, con, _ = qenv
    hive = (
        "SELECT int_col_7, "
        "MAX(LEAST(COALESCE(int_col_5, -279), COALESCE(int_col_7, 476))) "
        "AS int_col FROM ("
        "SELECT CAST(key AS INT) AS int_col_5, "
        "CAST(length(value) AS INT) AS int_col_7 FROM gu_src) grpby_test "
        "GROUP BY int_col_7, int_col_7, "
        "LEAST(COALESCE(int_col_5, -279), COALESCE(int_col_7, 476))"
    )
    duck = (
        "SELECT int_col_7, "
        "MAX(LEAST(COALESCE(int_col_5, -279), COALESCE(int_col_7, 476))) "
        "AS int_col FROM ("
        "SELECT CAST(key AS INT) AS int_col_5, "
        "CAST(length(value) AS INT) AS int_col_7 FROM gu_src) grpby_test "
        "GROUP BY int_col_7, "
        "LEAST(COALESCE(int_col_5, -279), COALESCE(int_col_7, 476))"
    )
    assert_matches_oracle(eng.sql(hive), con, duck)


def test_q_union5_union_of_aggregates_reaggregated(qenv):
    """union5.q: UNION ALL of two one-row aggregates, grouped on top."""
    eng, con, _ = qenv
    assert_matches_oracle(
        eng.sql(
            "select unionsrc.key AS key, count(1) AS cnt FROM "
            "(select 'tst1' as key, count(1) as value from gu_src s1 "
            "UNION ALL "
            "select 'tst2' as key, count(1) as value from gu_src s2) "
            "unionsrc group by unionsrc.key"
        ),
        con,
        "SELECT key, CAST(count(1) AS BIGINT) AS cnt FROM "
        "(SELECT 'tst1' AS key, count(1) AS value FROM gu_src "
        "UNION ALL "
        "SELECT 'tst2' AS key, count(1) AS value FROM gu_src) unionsrc "
        "GROUP BY key",
    )


def test_q_union7_aggregate_with_plain_table(qenv):
    """union7.q: one aggregate branch UNION ALL one plain-table branch
    (string-typed), re-aggregated — type unification across branches
    (empty src1 keys form a real group)."""
    eng, con, _ = qenv
    assert_matches_oracle(
        eng.sql(
            "select unionsrc.key AS key, count(1) AS cnt FROM "
            "(select 'tst1' as key, cast(count(1) as string) as value "
            "from gu_src s1 "
            "UNION ALL "
            "select s2.key as key, s2.value as value from gu_src1 s2) "
            "unionsrc group by unionsrc.key"
        ),
        con,
        "SELECT key, CAST(count(1) AS BIGINT) AS cnt FROM "
        "(SELECT 'tst1' AS key, CAST(count(1) AS VARCHAR) AS value "
        "FROM gu_src "
        "UNION ALL "
        "SELECT key, value FROM gu_src1) unionsrc GROUP BY key",
    )


def test_q_union24_ctas_chain_four_way(qenv):
    """union24.q: CTAS an aggregate, clone it, union 4 ways with one
    branch re-aggregating — all branches filtered key < 10."""
    eng, con, root = qenv
    for t in ("gu_u24_2", "gu_u24_3", "gu_u24_4", "gu_u24_5"):
        eng.spark.sql(f"DROP TABLE IF EXISTS {t}")
    eng.sql(
        f"create table gu_u24_2 LOCATION '{root}/gu_u24_2' as "
        "select key, count(1) as count from gu_src group by key"
    )
    for t in ("gu_u24_3", "gu_u24_4", "gu_u24_5"):
        eng.sql(
            f"create table {t} LOCATION '{root}/{t}' as "
            "select * from gu_u24_2"
        )
    assert_matches_oracle(
        eng.sql(
            "select s.key AS key, s.count AS count from ("
            "select key, count from gu_u24_2 where key < 10 "
            "union all select key, count from gu_u24_3 where key < 10 "
            "union all select key, count from gu_u24_4 where key < 10 "
            "union all select key, count(1) as count from gu_u24_5 "
            "where key < 10 group by key) s"
        ),
        con,
        "WITH u24 AS (SELECT key, CAST(count(1) AS BIGINT) AS count "
        "FROM gu_src GROUP BY key) "
        "SELECT key, count FROM ("
        "SELECT key, count FROM u24 WHERE TRY_CAST(key AS DOUBLE) < 10 "
        "UNION ALL SELECT key, count FROM u24 "
        "WHERE TRY_CAST(key AS DOUBLE) < 10 "
        "UNION ALL SELECT key, count FROM u24 "
        "WHERE TRY_CAST(key AS DOUBLE) < 10 "
        "UNION ALL SELECT key, CAST(count(1) AS BIGINT) AS count "
        "FROM (SELECT * FROM u24 WHERE TRY_CAST(key AS DOUBLE) < 10) "
        "GROUP BY key) s",
    )


def test_q_union20_join_of_two_unions(qenv):
    """union20.q: JOIN whose BOTH inputs are UNION ALLs mixing a
    one-row aggregate branch with a filtered table branch — the union
    outputs join on the coerced key."""
    eng, con, _ = qenv
    branch = (
        "select 'tst1' as key, cast(count(1) as string) as value "
        "from gu_src {a} UNION ALL "
        "select {b}.key as key, {b}.value as value from gu_src {b} "
        "where {b}.key < 10"
    )
    duck_branch = (
        "select 'tst1' as key, cast(count(1) as varchar) as value "
        "from gu_src UNION ALL "
        "select key, value from gu_src "
        "where TRY_CAST(key AS DOUBLE) < 10"
    )
    assert_matches_oracle(
        eng.sql(
            "SELECT unionsrc1.key AS k1, unionsrc1.value AS v1, "
            "unionsrc2.key AS k2, unionsrc2.value AS v2 FROM ("
            + branch.format(a="s1", b="s2")
            + ") unionsrc1 JOIN ("
            + branch.format(a="s3", b="s4")
            + ") unionsrc2 ON (unionsrc1.key = unionsrc2.key)"
        ),
        con,
        "SELECT u1.key AS k1, u1.value AS v1, u2.key AS k2, u2.value AS v2 "
        f"FROM ({duck_branch}) u1 JOIN ({duck_branch}) u2 "
        "ON u1.key = u2.key",
    )


def test_q_union9_three_branch_count(qenv):
    """union9.q: count over a 3-branch UNION ALL of the same scan."""
    eng, con, _ = qenv
    assert_matches_oracle(
        eng.sql(
            "select count(1) AS cnt FROM ("
            "select s1.key as key, s1.value as value from gu_src s1 "
            "UNION ALL select s2.key as key, s2.value as value "
            "from gu_src s2 UNION ALL "
            "select s3.key as key, s3.value as value from gu_src s3"
            ") unionsrc"
        ),
        con,
        "SELECT CAST(count(1) AS BIGINT) AS cnt FROM ("
        "SELECT key, value FROM gu_src UNION ALL "
        "SELECT key, value FROM gu_src UNION ALL "
        "SELECT key, value FROM gu_src) u",
    )
