"""clientpositive join family third tail: join_reorder.q (STREAMTABLE
hints + expression keys with constants), join_array.q (array-valued
non-key columns through FULL OUTER), join_on_varchar.q (varchar join
keys under MAPJOIN), join_literals.q (typed numeric literal suffixes
0L/0S/0Y/0BD in join conditions), join_empty.q (empty sides under
map-join and common join).

STREAMTABLE is Hive's reducer streaming order hint
(SemanticAnalyzer.genJoinTree reads it from the comment): a pure
execution directive — Spark parses the /*+ ... */ comment, warns on
the unknown hint, and plans normally; the answer must be identical
with and without it.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

T1 = [("1", "11"), ("2", "12"), ("3", "13"), ("7", "17"), ("8", "18"),
      ("8", "28")]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_jt3")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    rows = [(str(i % 83), f"val_{i % 83}") for i in range(400)]
    for name, data, schema, cols in (
        ("jt3_src", rows, "key string, value string", "key, value"),
        ("jt3_t1", T1, "key string, val string", "key, val"),
    ):
        p = str(root / name)
        spark.createDataFrame(data, schema).coalesce(1).write.parquet(p)
        eng.register_table(name, p)
        body = ", ".join(
            "(" + ", ".join(f"'{v}'" for v in r) + ")" for r in data
        )
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM (VALUES {body}) "
            f"AS t({cols})"
        )
    yield eng, con, str(root)
    con.close()


def test_q_join_reorder_streamtable_hint(qenv):
    """join_reorder.q: the STREAMTABLE hint changes nothing about the
    ANSWER (it reorders Hive's reducer streaming); expression key
    c.key+1 = a.key matches shifted keys."""
    eng, con, _ = qenv
    plain = (
        "FROM jt3_t1 a JOIN jt3_src c ON c.key+1=a.key "
        "SELECT a.key AS ak, a.val, c.key AS ck"
    )
    hinted = (
        "FROM jt3_t1 a JOIN jt3_src c ON c.key+1=a.key "
        "SELECT /*+ STREAMTABLE(a) */ a.key AS ak, a.val, c.key AS ck"
    )
    oracle = (
        "SELECT a.key AS ak, a.val, c.key AS ck FROM jt3_t1 a JOIN "
        "jt3_src c ON CAST(c.key AS DOUBLE) + 1 = CAST(a.key AS DOUBLE)"
    )
    assert_matches_oracle(eng.sql(plain), con, oracle)
    assert_matches_oracle(eng.sql(hinted), con, oracle)


def test_q_join_array_valued_columns(qenv, spark, tmp_path):
    """join_array.q: FULL OUTER join where the carried column is an
    ARRAY — null-extension yields NULL arrays, matches carry whole
    arrays."""
    eng, _, _ = qenv
    pa = str(tmp_path / "tinya")
    pb = str(tmp_path / "tinyb")
    spark.createDataFrame([(1,), (2,)], "a int").coalesce(1) \
        .write.parquet(pa)
    spark.createDataFrame(
        [(2, [10, 20]), (3, [30])], "a int, blist array<int>"
    ).coalesce(1).write.parquet(pb)
    eng.register_table("jt3_tinya", pa)
    eng.register_table("jt3_tinyb", pb)
    rows = eng.sql(
        "select jt3_tinyb.a AS ba, jt3_tinyb.blist from jt3_tinyb "
        "full outer join jt3_tinya on jt3_tinyb.a = jt3_tinya.a"
    ).collect()
    got = sorted(
        ((r.ba, tuple(r.blist) if r.blist is not None else None)
         for r in rows),
        key=repr,
    )
    assert got == sorted(
        [(None, None), (2, (10, 20)), (3, (30,))], key=repr
    )


def test_q_join_on_varchar(qenv, spark, tmp_path):
    """join_on_varchar.q: VARCHAR(n) join keys (trailing content
    beyond the declared length was truncated at WRITE) under a MAPJOIN
    hint."""
    eng, _, _ = qenv
    for t, coldef in (("jt3_v1", "c1 VARCHAR(10), c2 INT"),
                      ("jt3_v2", "c1 VARCHAR(20)")):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        eng.sql(f"CREATE TABLE {t} ({coldef}) STORED AS PARQUET")
    eng.sql("insert into jt3_v1 select repeat('t', 10), 11")
    eng.sql("insert into jt3_v1 select repeat('s', 10), 22")
    # 13 chars into varchar(20): kept whole, matches nothing in v1
    eng.sql("insert into jt3_v2 select concat(repeat('t', 10), 'ppp')")
    eng.sql("insert into jt3_v2 select repeat('s', 10)")
    rows = eng.sql(
        "select /*+ MAPJOIN(jt3_v2) */ v1.c1 AS c1, v1.c2 FROM jt3_v1 "
        "v1 join jt3_v2 v2 on (v1.c1 = v2.c1) order by c1"
    ).collect()
    assert [(r.c1, r.c2) for r in rows] == [("s" * 10, 22)]
    for t in ("jt3_v1", "jt3_v2"):
        eng.sql(f"DROP TABLE {t}")


def test_q_join_literals_typed_suffixes(qenv):
    """join_literals.q: Hive's typed numeric literal suffixes — 0L
    (bigint), 0S (smallint), 0Y (tinyint), 0BD (decimal) — inside join
    conditions."""
    eng, con, _ = qenv
    for lit in ("0L", "0S", "0Y", "0BD"):
        got = eng.sql(
            f"SELECT COUNT(*) AS n FROM jt3_src a JOIN jt3_src b ON "
            f"a.key = b.key AND a.key = {lit}"
        ).collect()[0].n
        exp = con.execute(
            "SELECT count(*) FROM jt3_src a JOIN jt3_src b ON "
            "a.key = b.key AND CAST(a.key AS DOUBLE) = 0"
        ).fetchone()[0]
        assert got == exp, (lit, got, exp)


def test_q_join_empty_sides(qenv, spark, tmp_path):
    """join_empty.q: an EMPTY left side under map-join and common join
    returns zero rows without error."""
    eng, _, _ = qenv
    p = str(tmp_path / "jt3_empty")
    spark.createDataFrame(
        [], "key string, value string"
    ).coalesce(1).write.parquet(p)
    eng.register_table("jt3_empty", p)
    for hint in ("/*+mapjoin(a)*/ ", ""):
        assert eng.sql(
            f"select {hint}a.key, b.value from jt3_empty a join "
            "jt3_src b on a.key=b.key"
        ).count() == 0
