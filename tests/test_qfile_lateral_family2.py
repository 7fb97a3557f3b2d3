"""clientpositive `.q` slice, round 8: the lateral_view file tail —
lateral_view_noalias.q, lateral_view_onview.q, lateral_view_outer.q,
lateral_view_ppd.q, lateral_view_cp.q (reference:
ql/src/test/queries/clientpositive/). Corners beyond the suite's six
lateral_* entries: NO-ALIAS map explode (myTab.* with generated column
names key/value), lateral views OVER VIEWS (incl. chained explodes and
explode-of-exploded), LATERAL VIEW OUTER over empty and NULL arrays
(null-extension), predicate pushdown AROUND the lateral boundary, and
an explode over a join's array column with column pruning."""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(str(i % 83), f"val_{i % 83}") for i in range(200)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfile_lateral2")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    p = str(root / "lv_src")
    spark.createDataFrame(SRC, "key string, value string") \
        .coalesce(1).write.parquet(p)
    eng.register_table("lv_src", p)
    con.execute(
        f"CREATE VIEW lv_src AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield eng, con
    con.close()


def test_q_lateral_view_noalias_map(qenv):
    """lateral_view_noalias.q: explode(map) with NO column aliases —
    the generated names are key/value."""
    eng, con = qenv
    rows = eng.sql(
        "SELECT DISTINCT myTab.* FROM lv_src LATERAL VIEW "
        "explode(map('key1', 100, 'key2', 200)) myTab "
        "ORDER BY myTab.key LIMIT 2"
    ).collect()
    assert [(r[0], r[1]) for r in rows] == [("key1", 100), ("key2", 200)]
    rows2 = eng.sql(
        "SELECT explode(map('key1', 100, 'key2', 200)) FROM lv_src "
        "LIMIT 2"
    ).collect()
    assert {tuple(r) for r in rows2} <= {("key1", 100), ("key2", 200)}


def test_q_lateral_view_onview(qenv, spark, tmp_path):
    """lateral_view_onview.q: lateral views OVER A VIEW — chained
    explodes cross-product, explode of an exploded array, and scalar
    functions beside the lateral column."""
    eng, con = qenv
    p = str(tmp_path / "lv_table")
    spark.createDataFrame(
        [("abc  ", [1, 2, 3], 100, "t")] * 3,
        "c1 string, c2 array<int>, c3 int, c4 string",
    ).coalesce(1).write.parquet(p)
    eng.register_table("lv_table", p)
    eng.sql("CREATE OR REPLACE VIEW lv_view AS SELECT * FROM lv_table")
    rows = eng.sql(
        "SELECT myTable.* FROM lv_view LATERAL VIEW "
        "explode(array(1,2,3)) myTable AS myCol LIMIT 3"
    ).collect()
    assert sorted(r.myCol for r in rows) == [1, 2, 3] or len(rows) == 3
    n = eng.sql(
        "SELECT myTable.myCol, myTable2.myCol2 FROM lv_view LATERAL "
        "VIEW explode(array(1,2,3)) myTable AS myCol LATERAL VIEW "
        "explode(array('a', 'b', 'c')) myTable2 AS myCol2"
    ).count()
    assert n == 27  # 3 rows × 3 × 3
    rows = eng.sql(
        "SELECT myTable2.* FROM lv_view LATERAL VIEW "
        "explode(array(array(1,2,3))) myTable AS myCol LATERAL VIEW "
        "explode(myTable.myCol) myTable2 AS myCol2 LIMIT 3"
    ).collect()
    assert sorted(r.myCol2 for r in rows) == [1, 2, 3]
    row = eng.sql(
        "SELECT SIZE(c2) AS sz, c3, TRIM(c1) AS t1, c4, myCol FROM "
        "lv_view LATERAL VIEW explode(array(1,2,3)) myTab AS myCol "
        "ORDER BY myCol LIMIT 1"
    ).collect()[0]
    assert (row.sz, row.c3, row.t1, row.c4, row.myCol) == \
        (3, 100, "abc", "t", 1)


def test_q_lateral_view_outer(qenv, spark, tmp_path):
    """lateral_view_outer.q: OUTER explode of an EMPTY array
    null-extends (rows survive with NULL), a non-empty array behaves
    like inner, and a NULL-valued array column null-extends only the
    NULL rows."""
    eng, con = qenv
    rows = eng.sql(
        "SELECT key, a FROM lv_src LATERAL VIEW OUTER explode(array()) "
        "C AS a ORDER BY key LIMIT 10"
    ).collect()
    assert len(rows) == 10 and all(r.a is None for r in rows)
    rows = eng.sql(
        "SELECT key, a FROM lv_src LATERAL VIEW OUTER "
        "explode(array(4,5)) C AS a ORDER BY key, a LIMIT 10"
    ).collect()
    assert len(rows) == 10 and {r.a for r in rows} == {4, 5}
    p = str(tmp_path / "lv_av")
    spark.createDataFrame(
        [("1", ["v1", "v1"]), ("2", None), ("3", ["v3", "v3"])],
        "key string, value array<string>",
    ).coalesce(1).write.parquet(p)
    eng.register_table("lv_av", p)
    rows = eng.sql(
        "SELECT key, a FROM lv_av LATERAL VIEW OUTER explode(value) "
        "C AS a ORDER BY key, a"
    ).collect()
    assert [(r.key, r.a) for r in rows] == [
        ("1", "v1"), ("1", "v1"), ("2", None), ("3", "v3"), ("3", "v3"),
    ]


def test_q_lateral_view_ppd(qenv):
    """lateral_view_ppd.q: predicates on base columns push BELOW the
    lateral view; predicates on the exploded column stay above; a
    WHERE inside the subquery composes with the outer filter."""
    eng, con = qenv
    _sql = (
        "SELECT value, myCol FROM (SELECT * FROM lv_src LATERAL VIEW "
        "explode(array(1,2,3)) myTable AS myCol) a WHERE key='0'"
    )
    rows = eng.sql(_sql).collect()
    assert len(rows) == 9  # 3 src rows with key '0' (i%83==0) × 3
    assert {r.myCol for r in rows} == {1, 2, 3}
    rows = eng.sql(_sql + " AND myCol=1").collect()
    assert len(rows) == 3 and all(r.myCol == 1 for r in rows)
    rows = eng.sql(
        "SELECT value, myCol FROM (SELECT * FROM lv_src LATERAL VIEW "
        "explode(array(1,2,3)) myTable AS myCol WHERE myCol > 1) a "
        "WHERE key='0'"
    ).collect()
    assert len(rows) == 6 and {r.myCol for r in rows} == {2, 3}
    # double lateral under the filter
    rows = eng.sql(
        "SELECT value, myCol FROM (SELECT * FROM lv_src LATERAL VIEW "
        "explode(array(1,2,3)) myTable AS myCol LATERAL VIEW "
        "explode(array(1,2,3)) myTable2 AS myCol2) a WHERE key='0'"
    ).collect()
    assert len(rows) == 27


def test_q_lateral_view_cp(qenv, spark, tmp_path):
    """lateral_view_cp.q: explode over a join's ARRAY column (column
    pruning must keep the array alive through the join)."""
    eng, con = qenv
    p = str(tmp_path / "lv_avsrc")
    spark.createDataFrame(
        [(k, [v]) for k, v in SRC], "key string, value array<string>"
    ).coalesce(1).write.parquet(p)
    eng.register_table("lv_avsrc", p)
    n = eng.sql(
        "SELECT count(val) AS c FROM (SELECT a.key AS key, b.value AS "
        "array_val FROM lv_src a JOIN lv_avsrc b ON a.key = b.key) i "
        "LATERAL VIEW explode(array_val) c AS val"
    ).collect()[0].c
    # each key i%83 appears ceil-ish times; self-join multiplicity:
    # count = Σ (occurrences of key in lv_src) × (rows in lv_avsrc
    # with that key) × len(array)=1
    from collections import Counter

    cnt = Counter(k for k, _ in SRC)
    assert n == sum(c * c for c in cnt.values())
