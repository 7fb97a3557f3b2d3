"""clientpositive `.q` slice, round 6: union_remove_* (INSERT from
UNION ALL subqueries — Hive's union-branch-elimination optimizer must
never change RESULTS: duplicates preserved, per-branch types coerced)
and multi_insert_* (one scan fanned to several sinks with branch-local
WHERE / GROUP BY / ORDER BY / LATERAL VIEW). Reference:
ql/src/test/queries/clientpositive/union_remove_1.q ff.,
multi_insert.q ff.

Method: inputTbl1 reproduces data/files/T1.txt; `src` is the same
synthetic fixture the other qfile slices use. Targets are path-backed
parquet tables (register_table) so INSERT OVERWRITE goes through the
engine's DML path; after each statement the target's CONTENT is diffed
against a DuckDB oracle computed from the same source rows. The golden
`values` column is renamed vals (VALUES is reserved in both engines'
strict parsers and the goldens only backtick it)."""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

T1 = [("1", "11"), ("2", "12"), ("3", "13"), ("7", "17"), ("8", "18"),
      ("8", "28")]
SRC = [(str(i % 83), f"val_{i % 83}") for i in range(500)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_miu")
    eng = Engine(spark=spark)
    for name, rows in (("inputtbl1", T1), ("src", SRC)):
        p = str(root / name)
        spark.createDataFrame(rows, "key string, val string").coalesce(
            2
        ).write.parquet(p)
        eng.register_table(name, p)
    con = duckdb.connect()
    for name, rows in (("inputtbl1", T1), ("src", SRC)):
        body = ", ".join(f"('{k}', '{v}')" for k, v in rows)
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM (VALUES {body}) "
            "AS t(key, val)"
        )
    yield eng, con, str(root)
    con.close()


def _mktarget(eng, root: str, name: str, ddl: str,
              partition_cols: list[str] | None = None) -> None:
    p = f"{root}/{name}"
    df = eng.spark.createDataFrame([], ddl)
    if partition_cols:
        # an all-empty partitioned write leaves no schema-bearing file;
        # seed one dummy partition, register, then drop it
        seed = eng.spark.createDataFrame(
            [tuple("__seed__" if f.name in partition_cols else None
                   for f in df.schema.fields)],
            df.schema,
        )
        seed.write.partitionBy(*partition_cols).mode("overwrite").parquet(p)
        eng.register_table(name, p, partition_cols)
        spec = ", ".join(f"{c}='__seed__'" for c in partition_cols)
        eng.sql(f"ALTER TABLE {name} DROP PARTITION ({spec})")
    else:
        df.write.mode("overwrite").parquet(p)
        eng.register_table(name, p, partition_cols)


_UNION_AGG = """
  SELECT key, count(1) as vals from inputtbl1 group by key
  UNION ALL
  SELECT key, count(1) as vals from inputtbl1 group by key
"""


def test_q_union_remove_1_duplicates_preserved(qenv):
    """union_remove_1.q: INSERT OVERWRITE from a UNION ALL of two
    IDENTICAL aggregates — branch elimination must not dedup: every key
    appears exactly twice in the target."""
    eng, con, root = qenv
    _mktarget(eng, root, "ur1_out", "key string, vals bigint")
    eng.sql(
        f"insert overwrite table ur1_out SELECT * FROM ({_UNION_AGG}) a"
    )
    assert_matches_oracle(
        eng.table("ur1_out"),
        con,
        "SELECT key, CAST(count(1) AS BIGINT) AS vals FROM inputtbl1 "
        "GROUP BY key UNION ALL SELECT key, CAST(count(1) AS BIGINT) "
        "FROM inputtbl1 GROUP BY key",
    )


def test_q_union_remove_12_join_branch_and_constant_type(qenv):
    """union_remove_12.q: one union branch is a constant projection
    (1 as vals), the other a self-join with CAST(b.val AS BIGINT) —
    branch output types must coerce to one schema."""
    eng, con, root = qenv
    _mktarget(eng, root, "ur12_out", "key string, vals bigint")
    eng.sql(
        """
        insert overwrite table ur12_out
        SELECT * FROM (
          select key, 1 as vals from inputtbl1
          union all
          select a.key as key, cast(b.val as bigint) as vals
          FROM inputtbl1 a join inputtbl1 b on a.key=b.key
        ) c
        """
    )
    assert_matches_oracle(
        eng.table("ur12_out"),
        con,
        "SELECT key, CAST(1 AS BIGINT) AS vals FROM inputtbl1 "
        "UNION ALL SELECT a.key, CAST(b.val AS BIGINT) AS vals "
        "FROM inputtbl1 a JOIN inputtbl1 b ON a.key = b.key",
    )


def test_q_union_remove_6_multi_insert_from_union(qenv):
    """union_remove_6.q: the union subquery feeds a MULTI-insert — both
    sinks receive the identical doubled row set from ONE evaluation."""
    eng, con, root = qenv
    _mktarget(eng, root, "ur6_out1", "key string, vals bigint")
    _mktarget(eng, root, "ur6_out2", "key string, vals bigint")
    eng.sql(
        f"""
        FROM ({_UNION_AGG}) a
        insert overwrite table ur6_out1 select *
        insert overwrite table ur6_out2 select *
        """
    )
    oracle = (
        "SELECT key, CAST(count(1) AS BIGINT) AS vals FROM inputtbl1 "
        "GROUP BY key UNION ALL SELECT key, CAST(count(1) AS BIGINT) "
        "FROM inputtbl1 GROUP BY key"
    )
    assert_matches_oracle(eng.table("ur6_out1"), con, oracle)
    assert_matches_oracle(eng.table("ur6_out2"), con, oracle)


def test_q_union_remove_19_projected_and_derived_filter(qenv):
    """union_remove_19.q: projection through an alias (a.key, a.vals),
    then the derived-column variant — key+key (string arithmetic →
    double under Hive coercion) filtered in an outer WHERE."""
    eng, con, root = qenv
    _mktarget(eng, root, "ur19_out", "key string, vals bigint")
    eng.sql(
        f"insert overwrite table ur19_out "
        f"SELECT a.key, a.vals FROM ({_UNION_AGG}) a"
    )
    assert_matches_oracle(
        eng.table("ur19_out"),
        con,
        "SELECT key, CAST(count(1) AS BIGINT) AS vals FROM inputtbl1 "
        "GROUP BY key UNION ALL SELECT key, CAST(count(1) AS BIGINT) "
        "FROM inputtbl1 GROUP BY key",
    )
    _mktarget(eng, root, "ur19b_out", "key double, vals bigint")
    eng.sql(
        f"""
        insert overwrite table ur19b_out
        select key, vals from (
          SELECT a.key + a.key as key, a.vals FROM ({_UNION_AGG}) a
        ) b where b.key >= 7
        """
    )
    assert_matches_oracle(
        eng.table("ur19b_out"),
        con,
        """
        SELECT key, vals FROM (
          SELECT CAST(key AS DOUBLE) + CAST(key AS DOUBLE) AS key, vals
          FROM (
            SELECT key, CAST(count(1) AS BIGINT) AS vals FROM inputtbl1
            GROUP BY key
            UNION ALL
            SELECT key, CAST(count(1) AS BIGINT) FROM inputtbl1
            GROUP BY key
          ) a
        ) b WHERE b.key >= 7
        """,
    )


def test_q_union_remove_22_duplicated_output_column(qenv):
    """union_remove_22.q: the same union column projected TWICE into
    distinct target columns."""
    eng, con, root = qenv
    _mktarget(eng, root, "ur22_out", "key string, vals bigint, vals2 bigint")
    eng.sql(
        f"insert overwrite table ur22_out "
        f"SELECT a.key, a.vals, a.vals FROM ({_UNION_AGG}) a"
    )
    assert_matches_oracle(
        eng.table("ur22_out"),
        con,
        "SELECT key, vals, vals AS vals2 FROM ("
        "SELECT key, CAST(count(1) AS BIGINT) AS vals FROM inputtbl1 "
        "GROUP BY key UNION ALL SELECT key, CAST(count(1) AS BIGINT) "
        "FROM inputtbl1 GROUP BY key) a",
    )


def test_q_union_remove_25_partitioned_target(qenv):
    """union_remove_25.q: the union lands in a STATIC partition; the
    partition column is appended from the spec, and re-running the
    statement overwrites only that partition."""
    eng, con, root = qenv
    _mktarget(eng, root, "ur25_out", "key string, vals bigint, ds string",
              ["ds"])
    stmt = (
        f"insert overwrite table ur25_out partition(ds='2004') "
        f"SELECT * FROM ({_UNION_AGG}) a"
    )
    eng.sql(stmt)
    eng.sql(stmt)  # idempotent overwrite of the same partition
    assert_matches_oracle(
        eng.table("ur25_out").selectExpr("key", "vals", "ds"),
        con,
        "SELECT key, vals, '2004' AS ds FROM ("
        "SELECT key, CAST(count(1) AS BIGINT) AS vals FROM inputtbl1 "
        "GROUP BY key UNION ALL SELECT key, CAST(count(1) AS BIGINT) "
        "FROM inputtbl1 GROUP BY key) a",
    )


def test_q_multi_insert_disjoint_filters_rerun_stable(qenv):
    """multi_insert.q: the canonical two-sink fan-out with disjoint
    WHERE ranges, run TWICE — OVERWRITE keeps the content stable."""
    eng, con, root = qenv
    _mktarget(eng, root, "mi1_t1", "key string, val string")
    _mktarget(eng, root, "mi1_t2", "key string, val string")
    stmt = (
        "from src "
        "insert overwrite table mi1_t1 select * where key < 10 "
        "insert overwrite table mi1_t2 select * where key > 10 and key < 20"
    )
    eng.sql(stmt)
    eng.sql(stmt)
    assert_matches_oracle(
        eng.table("mi1_t1"), con,
        "SELECT key, val FROM src WHERE CAST(key AS DOUBLE) < 10",
    )
    assert_matches_oracle(
        eng.table("mi1_t2"), con,
        "SELECT key, val FROM src WHERE CAST(key AS DOUBLE) > 10 "
        "AND CAST(key AS DOUBLE) < 20",
    )


def test_q_multi_insert_gby_branch_aggregates(qenv):
    """multi_insert_gby.q: per-branch WHERE + GROUP BY — and the second
    form where one branch aggregates the WHOLE source (no WHERE): the
    shared-scan fan-out must not leak one branch's filter into the
    other."""
    eng, con, root = qenv
    _mktarget(eng, root, "mi_e1", "key string, cnt bigint")
    _mktarget(eng, root, "mi_e2", "key string, cnt bigint")
    eng.sql(
        "FROM src "
        "INSERT OVERWRITE TABLE mi_e1 "
        "SELECT key, COUNT(*) WHERE key > 45 GROUP BY key "
        "INSERT OVERWRITE TABLE mi_e2 "
        "SELECT key, COUNT(*) GROUP BY key"
    )
    assert_matches_oracle(
        eng.table("mi_e1"), con,
        "SELECT key, CAST(COUNT(*) AS BIGINT) AS cnt FROM src "
        "WHERE CAST(key AS DOUBLE) > 45 GROUP BY key",
    )
    assert_matches_oracle(
        eng.table("mi_e2"), con,
        "SELECT key, CAST(COUNT(*) AS BIGINT) AS cnt FROM src "
        "GROUP BY key",
    )


def test_q_multi_insert_mixed_agg_and_filter_branches(qenv):
    """multi_insert_mixed.q: aggregate branches (with ORDER BY inside
    the branch) mixed with a plain filter branch in ONE statement."""
    eng, con, root = qenv
    _mktarget(eng, root, "mi_m1", "key string, cnt bigint")
    _mktarget(eng, root, "mi_m2", "val string, cnt bigint")
    _mktarget(eng, root, "mi_m3", "key string, val string")
    eng.sql(
        "from src "
        "insert overwrite table mi_m1 "
        "select key, count(1) group by key order by key "
        "insert overwrite table mi_m2 "
        "select val, count(1) group by val order by val "
        "insert overwrite table mi_m3 select * where key < 10"
    )
    assert_matches_oracle(
        eng.table("mi_m1"), con,
        "SELECT key, CAST(count(1) AS BIGINT) AS cnt FROM src GROUP BY key",
    )
    assert_matches_oracle(
        eng.table("mi_m2"), con,
        "SELECT val, CAST(count(1) AS BIGINT) AS cnt FROM src GROUP BY val",
    )
    assert_matches_oracle(
        eng.table("mi_m3"), con,
        "SELECT key, val FROM src WHERE CAST(key AS DOUBLE) < 10",
    )


def test_q_multi_insert_lateral_view_branches(qenv):
    """multi_insert_lateral_view.q: each branch carries its OWN
    LATERAL VIEW over the shared scan; then the aggregate-over-LV form
    (sum(C) ... group by key)."""
    eng, con, root = qenv
    eng.spark.sql(
        "SELECT key, val FROM src ORDER BY key, val LIMIT 10"
    ).createOrReplaceTempView("src_10")
    con.execute(
        "CREATE OR REPLACE VIEW src_10 AS SELECT key, val FROM src "
        "ORDER BY key, val LIMIT 10"
    )
    _mktarget(eng, root, "mi_lv1", "key string, c double")
    _mktarget(eng, root, "mi_lv2", "key string, c double")
    eng.sql(
        "from src_10 "
        "insert overwrite table mi_lv1 select key, C "
        "lateral view explode(array(key+1, key+2)) A as C "
        "insert overwrite table mi_lv2 select key, C "
        "lateral view explode(array(key+3, key+4)) A as C"
    )
    assert_matches_oracle(
        eng.table("mi_lv1"), con,
        "SELECT key, u.c AS c FROM src_10, UNNEST(["
        "CAST(key AS DOUBLE)+1, CAST(key AS DOUBLE)+2]) AS u(c)",
    )
    assert_matches_oracle(
        eng.table("mi_lv2"), con,
        "SELECT key, u.c AS c FROM src_10, UNNEST(["
        "CAST(key AS DOUBLE)+3, CAST(key AS DOUBLE)+4]) AS u(c)",
    )
    eng.sql(
        "from src_10 "
        "insert overwrite table mi_lv1 select key, sum(C) "
        "lateral view explode(array(key+1, key+2)) A as C group by key "
        "insert overwrite table mi_lv2 select key, sum(C) "
        "lateral view explode(array(key+3, key+4)) A as C group by key"
    )
    assert_matches_oracle(
        eng.table("mi_lv1"), con,
        "SELECT key, SUM(u.c) AS c FROM src_10, UNNEST(["
        "CAST(key AS DOUBLE)+1, CAST(key AS DOUBLE)+2]) AS u(c) "
        "GROUP BY key",
    )
    assert_matches_oracle(
        eng.table("mi_lv2"), con,
        "SELECT key, SUM(u.c) AS c FROM src_10, UNNEST(["
        "CAST(key AS DOUBLE)+3, CAST(key AS DOUBLE)+4]) AS u(c) "
        "GROUP BY key",
    )


def test_q_multi_insert_with_join_partitioned_sinks(qenv):
    """multi_insert_with_join.q: a JOIN subquery as the shared FROM,
    fanning into two PARTITIONED sinks with static specs."""
    eng, con, root = qenv
    _mktarget(eng, root, "mi_school", "school string, cnt bigint, ds string",
              ["ds"])
    _mktarget(eng, root, "mi_gender", "gender string, cnt bigint, ds string",
              ["ds"])
    eng.sql(
        """
        FROM (SELECT a.val AS status, b.key AS school, b.val AS gender
              FROM src a JOIN src b ON (a.key = b.key)
              WHERE a.key < 5) subq1
        INSERT OVERWRITE TABLE mi_gender PARTITION(ds='2009-03-20')
        SELECT subq1.gender, COUNT(1) GROUP BY subq1.gender
        INSERT OVERWRITE TABLE mi_school PARTITION(ds='2009-03-20')
        SELECT subq1.school, COUNT(1) GROUP BY subq1.school
        """
    )
    assert_matches_oracle(
        eng.table("mi_school").selectExpr("school", "cnt", "ds"),
        con,
        "SELECT b.key AS school, CAST(COUNT(1) AS BIGINT) AS cnt, "
        "'2009-03-20' AS ds FROM src a JOIN src b ON a.key = b.key "
        "WHERE CAST(a.key AS DOUBLE) < 5 GROUP BY b.key",
    )
    assert_matches_oracle(
        eng.table("mi_gender").selectExpr("gender", "cnt", "ds"),
        con,
        "SELECT b.val AS gender, CAST(COUNT(1) AS BIGINT) AS cnt, "
        "'2009-03-20' AS ds FROM src a JOIN src b ON a.key = b.key "
        "WHERE CAST(a.key AS DOUBLE) < 5 GROUP BY b.val",
    )


def test_q_multi_insert_union_source(qenv):
    """multi_insert_union_src.q: the shared FROM is itself a UNION ALL
    of two filtered scans; branch ORDER BY is a no-op for content."""
    eng, con, root = qenv
    _mktarget(eng, root, "mi_u1", "key string, val string")
    _mktarget(eng, root, "mi_u2", "key string, val string")
    eng.sql(
        "from (select * from src where key < 10 union all "
        "select * from src where key > 70) s "
        "insert overwrite table mi_u1 "
        "select key, val where key < 75 order by key "
        "insert overwrite table mi_u2 "
        "select key, val where key > 77 order by val"
    )
    assert_matches_oracle(
        eng.table("mi_u1"), con,
        "SELECT key, val FROM (SELECT * FROM src WHERE "
        "CAST(key AS DOUBLE) < 10 UNION ALL SELECT * FROM src WHERE "
        "CAST(key AS DOUBLE) > 70) s WHERE CAST(key AS DOUBLE) < 75",
    )
    assert_matches_oracle(
        eng.table("mi_u2"), con,
        "SELECT key, val FROM (SELECT * FROM src WHERE "
        "CAST(key AS DOUBLE) < 10 UNION ALL SELECT * FROM src WHERE "
        "CAST(key AS DOUBLE) > 70) s WHERE CAST(key AS DOUBLE) > 77",
    )


def test_q_multi_insert_gby2_global_aggregate_branches(qenv):
    """multi_insert_gby2.q (HIVE-3699: multiple global-aggregate
    branches must NOT store the same result in every table): the
    shared FROM is a subquery, branch one is COUNT(*), branch two is a
    different global aggregate — two different one-row answers."""
    eng, con, root = qenv
    _mktarget(eng, root, "mi_g1", "cnt bigint")
    _mktarget(eng, root, "mi_g2", "mx double")
    eng.sql(
        "FROM (select key, cast(key as double) as value from src "
        "order by key) a "
        "INSERT OVERWRITE TABLE mi_g1 SELECT COUNT(*) "
        "INSERT OVERWRITE TABLE mi_g2 SELECT max(value) + min(value)"
    )
    assert_matches_oracle(
        eng.table("mi_g1"), con,
        "SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM src",
    )
    assert_matches_oracle(
        eng.table("mi_g2"), con,
        "SELECT max(CAST(key AS DOUBLE)) + min(CAST(key AS DOUBLE)) "
        "AS mx FROM src",
    )


def test_q_multi_insert_gby3_distinct_branches_both_orders(qenv):
    """multi_insert_gby3.q: branches with their own GROUP BY where one
    carries COUNT(DISTINCT) — Hive plans these as separate reduce
    phases off one scan; both branch ORDERS must produce identical
    content (the golden runs e1-then-e2 and e2-then-e1), plus the
    3-sink form."""
    eng, con, root = qenv
    _mktarget(eng, root, "mi_d1", "key string, cd bigint")
    _mktarget(eng, root, "mi_d2", "key string, s double, val string")
    _mktarget(eng, root, "mi_d3", "val string, cd bigint")
    src_sub = (
        "FROM (select key, cast(key as double) as keyD, val from src "
        "order by key) a "
    )
    for stmt in (
        src_sub
        + "INSERT OVERWRITE TABLE mi_d1 "
        "SELECT key, COUNT(distinct val) group by key "
        "INSERT OVERWRITE TABLE mi_d2 "
        "SELECT key, sum(keyD), val group by key, val",
        src_sub
        + "INSERT OVERWRITE TABLE mi_d2 "
        "SELECT key, sum(keyD), val group by key, val "
        "INSERT OVERWRITE TABLE mi_d1 "
        "SELECT key, COUNT(distinct val) group by key",
    ):
        eng.sql(stmt)
        assert_matches_oracle(
            eng.table("mi_d1"), con,
            "SELECT key, CAST(COUNT(DISTINCT val) AS BIGINT) AS cd "
            "FROM src GROUP BY key",
        )
        assert_matches_oracle(
            eng.table("mi_d2"), con,
            "SELECT key, sum(CAST(key AS DOUBLE)) AS s, val FROM src "
            "GROUP BY key, val",
        )
    eng.sql(
        "from src "
        "insert overwrite table mi_d1 "
        "select key, count(distinct val) group by key "
        "insert overwrite table mi_d3 "
        "select val, count(distinct key) group by val"
    )
    assert_matches_oracle(
        eng.table("mi_d3"), con,
        "SELECT val, CAST(COUNT(DISTINCT key) AS BIGINT) AS cd "
        "FROM src GROUP BY val",
    )
