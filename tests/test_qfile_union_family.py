"""clientpositive `.q` slice, round 8: the union_* numbered family —
the aggregate-branch / type-coercion / sink corners not covered by the
earlier union9/20/22/union_remove replays (reference:
ql/src/test/queries/clientpositive/union3.q, union5.q, union7.q,
union12.q, union17.q, union24.q, union_null.q, union_top_level.q).

Hive compiles each union branch into its own operator tree feeding one
UnionOperator; the family's recurring traps are (a) aggregate branches
with CONSTANT keys ('tst1' + count over the whole table per branch),
(b) type coercion across branches (int count vs string value), and
(c) a union feeding GROUP BY / multi-insert sinks. Catalyst's Union is
a plan-level concat, so each shape value-diffs against DuckDB.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(str(i % 83), f"val_{i % 83}") for i in range(500)]
SRC1 = [("", "val_0"), ("128", ""), ("146", "val_146"), ("150", "val_150"),
        ("213", "val_213"), ("224", ""), ("238", "val_238"),
        ("255", "val_255"), ("", ""), ("401", "val_401")]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfile_union")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    for name, rows, schema in (
        ("u_src", SRC, "key string, value string"),
        ("u_src1", SRC1, "key string, value string"),
    ):
        p = str(root / name)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(p)
        eng.register_table(name, p)
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{p}/*.parquet')"
        )
    yield eng, con
    con.close()


def _chk(eng, con, hive_sql, duck_sql=None):
    assert_matches_oracle(eng.sql(hive_sql), con, duck_sql or hive_sql)


def test_q_union3_constant_branches(qenv):
    """union3.q: four single-row constant branches (each FROM a
    LIMIT-1 subquery) unioned — the classic empty-reduce-branch bug
    surface in Hive's runtime."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT id FROM (SELECT 1 AS id FROM (SELECT * FROM u_src "
        "LIMIT 1) s1 UNION ALL SELECT 2 AS id FROM (SELECT * FROM "
        "u_src LIMIT 1) s1 UNION ALL SELECT 3 AS id FROM (SELECT * "
        "FROM u_src LIMIT 1) s2 UNION ALL SELECT 4 AS id FROM (SELECT "
        "* FROM u_src LIMIT 1) s2) a ORDER BY id",
    )


def test_q_union5_aggregate_branches(qenv):
    """union5.q: both branches are WHOLE-TABLE aggregates with constant
    keys; the outer group-by re-aggregates the two single-row
    branches."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT unionsrc.key AS key, count(1) AS n FROM (SELECT 'tst1' "
        "AS key, count(1) AS value FROM u_src s1 UNION ALL SELECT "
        "'tst2' AS key, count(1) AS value FROM u_src s2) unionsrc "
        "GROUP BY unionsrc.key ORDER BY key",
        "SELECT key, CAST(count(1) AS BIGINT) AS n FROM (SELECT 'tst1' "
        "AS key, count(1) AS value FROM u_src UNION ALL SELECT 'tst2' "
        "AS key, count(1) AS value FROM u_src) unionsrc "
        "GROUP BY key ORDER BY key",
    )


def test_q_union7_mixed_aggregate_and_scan(qenv):
    """union7.q: one aggregate branch + one plain-scan branch, value
    column coerced bigint→string across the union."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT unionsrc.key AS key, count(1) AS n FROM (SELECT 'tst1' "
        "AS key, cast(count(1) AS string) AS value FROM u_src s1 "
        "UNION ALL SELECT s2.key AS key, s2.value AS value FROM u_src1 "
        "s2) unionsrc GROUP BY unionsrc.key ORDER BY key",
        "SELECT key, CAST(count(1) AS BIGINT) AS n FROM (SELECT 'tst1' "
        "AS key, cast(count(1) AS VARCHAR) AS value FROM u_src "
        "UNION ALL SELECT key, value FROM u_src1) unionsrc "
        "GROUP BY key ORDER BY key",
    )


def test_q_union12_17_insert_sinks(qenv, spark):
    """union12.q + union17.q: a three-branch aggregate union feeding
    INSERT OVERWRITE, and a union feeding a MULTI-insert with DISTINCT
    aggregates per branch."""
    import os
    import shutil

    eng, con = qenv
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("u_tmp", "u_d1", "u_d2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    eng.sql("CREATE TABLE u_tmp (key STRING, value INT) STORED AS PARQUET")
    eng.sql(
        "INSERT OVERWRITE TABLE u_tmp SELECT unionsrc.key, "
        "unionsrc.value FROM (SELECT 'tst1' AS key, count(1) AS value "
        "FROM u_src s1 UNION ALL SELECT 'tst2' AS key, count(1) AS "
        "value FROM u_src1 s2 UNION ALL SELECT 'tst3' AS key, count(1) "
        "AS value FROM u_src s3) unionsrc"
    )
    _chk(
        eng, con,
        "SELECT key, value FROM u_tmp ORDER BY key",
        "SELECT * FROM (VALUES ('tst1', 500), ('tst2', 10), "
        "('tst3', 500)) t(key, value) ORDER BY key",
    )
    eng.sql("CREATE TABLE u_d1 (key STRING, value STRING) STORED AS PARQUET")
    eng.sql(
        "CREATE TABLE u_d2 (key STRING, val1 STRING, val2 STRING) "
        "STORED AS PARQUET"
    )
    eng.sql(
        "FROM (SELECT 'tst1' AS key, cast(count(1) AS string) AS value "
        "FROM u_src s1 UNION ALL SELECT s2.key AS key, s2.value AS "
        "value FROM u_src s2) unionsrc "
        "INSERT OVERWRITE TABLE u_d1 SELECT unionsrc.key, "
        "COUNT(DISTINCT SUBSTR(unionsrc.value,5)) GROUP BY unionsrc.key "
        "INSERT OVERWRITE TABLE u_d2 SELECT unionsrc.key, "
        "unionsrc.value, COUNT(DISTINCT SUBSTR(unionsrc.value,5)) "
        "GROUP BY unionsrc.key, unionsrc.value"
    )
    _chk(
        eng, con,
        "SELECT key, value FROM u_d1 ORDER BY key",
        "SELECT key, CAST(count(DISTINCT substr(value,5)) AS VARCHAR) "
        "AS value FROM (SELECT 'tst1' AS key, cast(count(1) AS "
        "VARCHAR) AS value FROM u_src UNION ALL SELECT key, value "
        "FROM u_src) unionsrc GROUP BY key ORDER BY key",
    )
    n = eng.sql("SELECT count(*) AS c FROM u_d2").collect()[0].c
    assert n == 84  # 83 distinct (key,value) + the tst1 branch row
    for t in ("u_tmp", "u_d1", "u_d2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_q_union24_ctas_chain(qenv, spark):
    """union24.q: CTAS tables unioned with a mix of plain scans, an
    aggregate branch, and a join branch."""
    import os
    import shutil

    eng, con = qenv
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("u_src2", "u_src3"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    eng.sql(
        "CREATE TABLE u_src2 STORED AS PARQUET AS SELECT key, count(1) "
        "AS count FROM u_src GROUP BY key"
    )
    eng.sql("CREATE TABLE u_src3 STORED AS PARQUET AS SELECT * FROM u_src2")
    con.execute(
        "CREATE OR REPLACE VIEW u_src2 AS SELECT key, count(1) AS "
        "count FROM u_src GROUP BY key"
    )
    con.execute("CREATE OR REPLACE VIEW u_src3 AS SELECT * FROM u_src2")
    _chk(
        eng, con,
        "SELECT s.key AS key, s.count AS cnt FROM (SELECT key, count "
        "FROM u_src2 WHERE key < '2' UNION ALL SELECT key, count FROM "
        "u_src3 WHERE key < '2' UNION ALL SELECT key, count(1) AS "
        "count FROM u_src3 a WHERE key < '2' GROUP BY key) s "
        "ORDER BY key, cnt",
        "SELECT s.key AS key, CAST(s.count AS BIGINT) AS cnt FROM "
        "(SELECT key, count FROM u_src2 WHERE key < '2' UNION ALL "
        "SELECT key, count FROM u_src3 WHERE key < '2' UNION ALL "
        "SELECT key, count(1) AS count FROM u_src3 WHERE key < '2' "
        "GROUP BY key) s ORDER BY key NULLS FIRST, cnt NULLS FIRST",
    )
    for t in ("u_src2", "u_src3"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_q_union_null(qenv):
    """union_null.q: typed-NULL branches — cast(null as string) unioned
    with real strings, grouped NULL branches, and the bare
    one-row-per-branch constant form."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT x FROM (SELECT * FROM (SELECT value AS x FROM u_src "
        "ORDER BY x LIMIT 5) a UNION ALL SELECT * FROM (SELECT "
        "cast(NULL AS string) AS x FROM u_src LIMIT 5) b) a",
        "SELECT x FROM (SELECT * FROM (SELECT value AS x FROM u_src "
        "ORDER BY x NULLS FIRST LIMIT 5) a UNION ALL SELECT * FROM "
        "(SELECT cast(NULL AS VARCHAR) AS x FROM u_src LIMIT 5) b) a",
    )
    _chk(
        eng, con,
        "SELECT N FROM (SELECT * FROM (SELECT cast(null AS string) AS "
        "N FROM u_src1 GROUP BY key) a UNION ALL SELECT * FROM (SELECT "
        "cast(null AS string) AS N FROM u_src1 GROUP BY key) b) a",
        "SELECT N FROM (SELECT * FROM (SELECT cast(null AS VARCHAR) "
        "AS N FROM u_src1 GROUP BY key) a UNION ALL SELECT * FROM "
        "(SELECT cast(null AS VARCHAR) AS N FROM u_src1 GROUP BY key) "
        "b) a",
    )
    _chk(
        eng, con,
        "SELECT null AS c1 UNION ALL SELECT 1 AS c1",
        "SELECT CAST(null AS INT) AS c1 UNION ALL SELECT 1 AS c1",
    )


def test_q_union_top_level(qenv):
    """union_top_level.q: three limited branches with distinct constant
    tags — per-branch row counts survive the union (the LIMIT inside
    each branch binds to that branch)."""
    eng, con = qenv
    rows = eng.sql(
        "SELECT key, value FROM (SELECT key, 0 AS value FROM u_src "
        "WHERE key % 3 == 0 LIMIT 3) a UNION ALL SELECT key, value "
        "FROM (SELECT key, 1 AS value FROM u_src WHERE key % 3 == 1 "
        "LIMIT 3) b UNION ALL SELECT key, value FROM (SELECT key, 2 "
        "AS value FROM u_src WHERE key % 3 == 2 LIMIT 3) c"
    ).collect()
    from collections import Counter

    tags = Counter(r.value for r in rows)
    assert tags == {0: 3, 1: 3, 2: 3}
    assert all(int(r.key) % 3 == r.value for r in rows)
