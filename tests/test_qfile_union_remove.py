"""clientpositive union_remove_1.q–union_remove_26.q replay.

The family tests Hive's union-remove optimizer
(hive.optimize.union.remove + mapred.input.dir.recursive: each union
branch writes straight into the FileSink's directory instead of
passing through an extra union stage — GenericOptimizer
UnionProcessor). Spark has no such extra stage to remove — each union
branch feeds the insert directly — so the replay pins the SEMANTIC
matrix the 26 files share: union of aggregate branches double-
INSERT-OVERWRITten (idempotent), map-only + aggregate + nested-union
mixes, a join branch inside the union, multi-insert fan-out from one
union, dynamic partitions fed by constant-ds branches, static +
dynamic partition targets over LIMIT subqueries, and the backticked
reserved-word column `values` the whole family uses.

Fixture = data/files/T1.txt (ctrl-A delimited), reproduced inline.
Sinks use parquet (format-specific DDL is covered by the orc/avro/
sequencefile modules); the union/insert semantics are format-blind.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

T1 = [("1", "11"), ("2", "12"), ("3", "13"), ("7", "17"),
      ("8", "18"), ("8", "28")]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_ur")
    p = str(root / "inputtbl1")
    spark.createDataFrame(T1, "key string, val string").coalesce(
        1
    ).write.parquet(p)
    eng = Engine(spark=spark)
    eng.register_table("inputtbl1", p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW inputTbl1 AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    for t in ("ur_out1", "ur_out2", "ur_out3", "ur_outp1", "ur_outp2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    yield eng, con, str(root)
    for t in ("ur_out1", "ur_out2", "ur_out3", "ur_outp1", "ur_outp2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    con.close()


_AGG_UNION = (
    "SELECT key, count(1) as `values` from inputTbl1 group by key "
    "UNION ALL "
    "SELECT key, count(1) as `values` from inputTbl1 group by key"
)
_AGG_UNION_ORACLE = (
    "SELECT key, CAST(count(1) AS BIGINT) AS vals FROM inputTbl1 GROUP BY key "
    "UNION ALL "
    "SELECT key, CAST(count(1) AS BIGINT) AS vals FROM inputTbl1 GROUP BY key"
)


def test_q_union_remove_1_19_idempotent_overwrite(qenv):
    """union_remove_1.q/19.q: aggregate-branch union INSERT
    OVERWRITEs a table; the SECOND overwrite replaces (not appends);
    _19 projects a.key, a.`values` through the union alias."""
    eng, con, _ = qenv
    eng.sql(
        "create table ur_out1(key string, `values` bigint) "
        "stored as parquet"
    )
    for _ in range(2):
        eng.sql(
            "insert overwrite table ur_out1 SELECT * FROM ("
            + _AGG_UNION + ") a"
        )
    assert_matches_oracle(
        eng.sql("select key, `values` AS vals from ur_out1"),
        con, _AGG_UNION_ORACLE,
    )
    # _19: projection through the union alias (+ a WHERE over it)
    eng.sql(
        "insert overwrite table ur_out1 SELECT a.key, a.`values` FROM ("
        + _AGG_UNION + ") a where a.key = 8"
    )
    assert_matches_oracle(
        eng.sql("select key, `values` AS vals from ur_out1"),
        con,
        f"SELECT * FROM ({_AGG_UNION_ORACLE}) a WHERE "
        "CAST(key AS DOUBLE) = 8",
    )
    eng.sql("drop table ur_out1")


def test_q_union_remove_6_multi_insert(qenv):
    """union_remove_6.q: ONE union source FROM-first multi-inserted
    into TWO tables — both sinks get the full union."""
    eng, con, _ = qenv
    eng.sql("create table ur_out2(key string, `values` bigint) "
            "stored as parquet")
    eng.sql("create table ur_out3(key string, `values` bigint) "
            "stored as parquet")
    eng.sql(
        "FROM (" + _AGG_UNION + ") a "
        "insert overwrite table ur_out2 select * "
        "insert overwrite table ur_out3 select *"
    )
    for t in ("ur_out2", "ur_out3"):
        assert_matches_oracle(
            eng.sql(f"select key, `values` AS vals from {t}"),
            con, _AGG_UNION_ORACLE,
        )
    eng.sql("drop table ur_out2")
    eng.sql("drop table ur_out3")


def test_q_union_remove_10_nested_mixed_branches(qenv):
    """union_remove_10.q: nested union whose branches mix map-only
    constants and an aggregate."""
    eng, con, _ = qenv
    eng.sql("create table ur_out1(key string, `values` bigint) "
            "stored as parquet")
    eng.sql(
        "insert overwrite table ur_out1 SELECT * FROM ("
        "select key, 1 as `values` from inputTbl1 "
        "union all "
        "select * FROM ("
        "  SELECT key, count(1) as `values` from inputTbl1 group by key"
        "  UNION ALL"
        "  SELECT key, 2 as `values` from inputTbl1"
        ") a ) b"
    )
    assert_matches_oracle(
        eng.sql("select key, `values` AS vals from ur_out1"),
        con,
        "SELECT key, CAST(1 AS BIGINT) AS vals FROM inputTbl1 "
        "UNION ALL SELECT key, CAST(count(1) AS BIGINT) FROM inputTbl1 "
        "GROUP BY key "
        "UNION ALL SELECT key, CAST(2 AS BIGINT) FROM inputTbl1",
    )
    eng.sql("drop table ur_out1")


def test_q_union_remove_12_join_branch(qenv):
    """union_remove_12.q: a JOIN branch unioned with a map-only
    branch (the join side cannot be map-only — pins that mixed
    parallelism still lands correctly)."""
    eng, con, _ = qenv
    eng.sql("create table ur_out1(key string, `values` bigint) "
            "stored as parquet")
    eng.sql(
        "insert overwrite table ur_out1 SELECT * FROM ("
        "select key, 1 as `values` from inputTbl1 "
        "union all "
        "select a.key as key, cast(b.val as bigint) as `values` "
        "FROM inputTbl1 a join inputTbl1 b on a.key=b.key ) c"
    )
    assert_matches_oracle(
        eng.sql("select key, `values` AS vals from ur_out1"),
        con,
        "SELECT key, CAST(1 AS BIGINT) AS vals FROM inputTbl1 "
        "UNION ALL SELECT a.key, CAST(b.val AS BIGINT) "
        "FROM inputTbl1 a JOIN inputTbl1 b ON a.key = b.key",
    )
    eng.sql("drop table ur_out1")


def test_q_union_remove_15_17_dynamic_partitions(qenv):
    """union_remove_15.q/17.q: dynamic-partition INSERT where each
    union branch carries a CONSTANT ds — each branch lands in its own
    partition; SHOW PARTITIONS sees both."""
    eng, con, _ = qenv
    eng.sql(
        "create table ur_outp1(key string, `values` bigint) "
        "partitioned by (ds string) stored as parquet"
    )
    eng.spark.sql(
        "set spark.sql.sources.partitionOverwriteMode=dynamic"
    )
    eng.sql(
        "insert overwrite table ur_outp1 partition (ds) SELECT * FROM ("
        "  SELECT key, count(1) as `values`, '1' as ds from inputTbl1 "
        "  group by key "
        "  UNION ALL "
        "  SELECT key, count(1) as `values`, '2' as ds from inputTbl1 "
        "  group by key ) a"
    )
    parts = {r[0] for r in eng.sql("show partitions ur_outp1").collect()}
    assert parts == {"ds=1", "ds=2"}
    for ds in ("1", "2"):
        assert_matches_oracle(
            eng.sql(
                "select key, `values` AS vals from ur_outp1 "
                f"where ds = '{ds}'"
            ),
            con,
            "SELECT key, CAST(count(1) AS BIGINT) AS vals "
            "FROM inputTbl1 GROUP BY key",
        )
    eng.sql("drop table ur_outp1")


def test_q_union_remove_25_static_partition_target(qenv):
    """union_remove_25.q: the union written into a STATIC partition
    spec — both branches land in the one partition."""
    eng, con, _ = qenv
    eng.sql(
        "create table ur_outp2(key string, `values` bigint) "
        "partitioned by (ds string) stored as parquet"
    )
    eng.sql(
        "insert overwrite table ur_outp2 partition(ds='2004') "
        "SELECT * FROM (" + _AGG_UNION + ") a"
    )
    parts = {r[0] for r in eng.sql("show partitions ur_outp2").collect()}
    assert parts == {"ds=2004"}
    assert_matches_oracle(
        eng.sql("select key, `values` AS vals from ur_outp2"),
        con, _AGG_UNION_ORACLE,
    )
    eng.sql("drop table ur_outp2")


def test_q_union_remove_22_duplicated_and_concat_columns(qenv):
    """union_remove_22.q: the union output column selected TWICE into
    a 3-column sink, then concat(values,values) coerced back into the
    bigint columns."""
    eng, con, _ = qenv
    eng.sql(
        "create table ur_out1(key string, `values` bigint, "
        "values2 bigint) stored as parquet"
    )
    eng.sql(
        "insert overwrite table ur_out1 SELECT a.key, a.`values`, "
        "a.`values` FROM (" + _AGG_UNION + ") a"
    )
    assert_matches_oracle(
        eng.sql("select key, `values` AS v1, values2 AS v2 from ur_out1"),
        con,
        "SELECT key, vals AS v1, vals AS v2 FROM "
        f"({_AGG_UNION_ORACLE}) a",
    )
    eng.sql(
        "insert overwrite table ur_out1 SELECT a.key, "
        "concat(a.`values`, a.`values`), concat(a.`values`, a.`values`) "
        "FROM (" + _AGG_UNION + ") a"
    )
    assert_matches_oracle(
        eng.sql("select key, `values` AS v1, values2 AS v2 from ur_out1"),
        con,
        "SELECT key, CAST(vals || vals AS BIGINT) AS v1, "
        "CAST(vals || vals AS BIGINT) AS v2 FROM "
        f"({_AGG_UNION_ORACLE}) a",
    )
    eng.sql("drop table ur_out1")
