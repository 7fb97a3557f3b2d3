"""clientpositive `.q` slice: the mapreduce golden family — Hive's
``MAP exprs USING 'script'`` / ``REDUCE exprs USING 'script'``
spellings of script transform feeding INSERT OVERWRITE TABLE, with
DISTRIBUTE BY / SORT BY shuffles after the script. Reference:
ql/src/test/queries/clientpositive/mapreduce1.q, mapreduce2.q,
mapreduce4.q, mapreduce8.q (SemanticAnalyzer treats MAP/REDUCE/
TRANSFORM identically; the engine normalizes the spelling in
_rewrite_map_reduce_transform before dispatch).

DISTRIBUTE/SORT only reorder rows inside the written files, so the
value oracle is the transform's projection itself; the INSERT performs
Hive positional casts (string script output -> INT columns).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(str(i % 83), f"val_{i % 83}") for i in range(500)]


def _fresh_table(spark, eng, name, ddl_body):
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
    eng.sql(f"CREATE TABLE {name}({ddl_body}) STORED AS PARQUET")


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_mapreduce")
    eng = Engine(spark=spark)
    p = str(root / "src")
    spark.createDataFrame(SRC, "key string, value string").coalesce(
        2
    ).write.parquet(p)
    eng.register_table("mr_src", p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW mr_src AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield eng, con
    con.close()
    for t in ("mr_dest1", "mr_dest2", "mr_dest3"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


# the transformed projection both engines must agree on, after the
# positional insert casts (tkey->INT; CAST(key/10 AS INT) truncates
# toward zero in Hive - DuckDB CAST(double AS INT) rounds, so TRUNC)
_ORACLE = """
SELECT CAST(key AS INT) AS key,
       CAST(TRUNC(TRY_CAST(key AS DOUBLE) / 10) AS INT) AS ten,
       CAST(TRY_CAST(key AS INT) % 10 AS INT) AS one,
       value
FROM mr_src ORDER BY key, value
"""


def test_q_mapreduce1_map_distribute_sort(qenv, spark):
    """mapreduce1.q: FROM src INSERT OVERWRITE ... MAP ... USING 'cat'
    AS (...) DISTRIBUTE BY tvalue, tkey SORT BY ten, one."""
    eng, con = qenv
    _fresh_table(
        spark, eng, "mr_dest1", "key INT, ten INT, one INT, value STRING"
    )
    eng.sql(
        """
        FROM mr_src
        INSERT OVERWRITE TABLE mr_dest1
        MAP mr_src.key, CAST(mr_src.key / 10 AS INT),
            CAST(mr_src.key % 10 AS INT), mr_src.value
        USING 'cat' AS (tkey, ten, one, tvalue)
        DISTRIBUTE BY tvalue, tkey
        SORT BY ten, one
        """
    )
    got = eng.sql(
        "SELECT mr_dest1.* FROM mr_dest1 ORDER BY key, value"
    )
    assert_matches_oracle(got, con, _ORACLE)


def test_q_mapreduce4_sort_desc(qenv, spark):
    """mapreduce4.q: same flow with SORT BY ten DESC, one ASC — the
    shuffle order must not change the stored value set."""
    eng, con = qenv
    _fresh_table(
        spark, eng, "mr_dest2", "key INT, ten INT, one INT, value STRING"
    )
    eng.sql(
        """
        FROM mr_src
        INSERT OVERWRITE TABLE mr_dest2
        MAP mr_src.key, CAST(mr_src.key / 10 AS INT),
            CAST(mr_src.key % 10 AS INT), mr_src.value
        USING 'cat' AS (tkey, ten, one, tvalue)
        DISTRIBUTE BY tvalue, tkey
        SORT BY ten DESC, one ASC
        """
    )
    got = eng.sql(
        "SELECT mr_dest2.* FROM mr_dest2 ORDER BY key, value"
    )
    assert_matches_oracle(got, con, _ORACLE)


def test_q_mapreduce8_star_expansion_reduce(qenv, spark):
    """mapreduce8.q shape (REDUCE spelling + src.* expansion in the
    transform input list); DISTRIBUTE BY rand(3) in the golden only
    scrambles placement, replaced by a deterministic key here."""
    eng, con = qenv
    _fresh_table(
        spark, eng, "mr_dest3",
        "k STRING, v STRING, key INT, value STRING",
    )
    eng.sql(
        """
        FROM mr_src
        INSERT OVERWRITE TABLE mr_dest3
        REDUCE mr_src.*, mr_src.key, mr_src.value
        USING 'cat' AS (k, v, tkey, tvalue)
        DISTRIBUTE BY tkey
        SORT BY tvalue, tkey
        """
    )
    got = eng.sql(
        "SELECT mr_dest3.* FROM mr_dest3 ORDER BY key, value, k, v"
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT key AS k, value AS v, CAST(key AS INT) AS key, value
        FROM mr_src ORDER BY key, value, k, v
        """,
    )


def test_q_map_select_query_form(qenv):
    """mapreduce spelling in a plain query (no INSERT): MAP ... USING
    'cat' ... LIMIT — script output columns default to STRING."""
    eng, con = qenv
    rows = eng.sql(
        """
        SELECT MAP key, value USING 'cat' AS (k, v)
        FROM mr_src LIMIT 5
        """
    ).collect()
    assert len(rows) == 5
    assert all(isinstance(r.k, str) and r.v.startswith("val_") for r in rows)


def test_q_map_rewrite_inert_forms():
    """The spelling rewrite never fires on map()/str_to_map calls,
    MAP<...> DDL types, or JOIN ... USING (cols)."""
    from hive_2_3_2_spark.engine import _rewrite_map_reduce_transform

    for s in (
        "SELECT map('a', 1)['a'] FROM t",
        "SELECT str_to_map('a:1') FROM t",
        "CREATE TABLE x (m MAP<STRING, INT>)",
        "SELECT * FROM a JOIN b USING (k)",
        "SELECT 1 REDUCE BY noise",  # no USING '<script>'
    ):
        assert _rewrite_map_reduce_transform(s) == s, s


def test_q_script_pipe_partial_consumption(spark, tmp_path):
    """script_pipe.q: with hive.exec.script.allow.partial.consumption
    = true, a script that exits BEFORE consuming its input is not an
    error — `true` reads nothing and emits nothing (0 rows); `head -n
    1` emits exactly one line per task (ScriptOperator.close()/
    processOp() broken-pipe tolerance). Single-partition fixture = one
    task, matching the golden's one mapper."""
    from hive_2_3_2_spark.engine import Engine

    eng = Engine(spark=spark)
    p = str(tmp_path / "sp_src")
    rows = [(str(i % 83), f"val_{i % 83}") for i in range(500)]
    spark.createDataFrame(rows, "key string, value string") \
        .coalesce(1).write.parquet(p)
    eng.register_table("sp_src", p)
    eng.sql("set hive.exec.script.allow.partial.consumption = true")
    try:
        got = eng.sql(
            "SELECT TRANSFORM(*) USING 'true' AS a, b, c "
            "FROM (SELECT * FROM sp_src LIMIT 1) tmp"
        ).collect()
        assert got == []
        got = eng.sql(
            "SELECT TRANSFORM(key, value, key, value, key, value, key, "
            "value, key, value, key, value) USING 'head -n 1' "
            "as a,b,c,d FROM sp_src"
        ).collect()
        assert len(got) == 1
        r = got[0]
        # first four fields of the first serialized line
        assert (r.b, r.d) == (r.a and r.b, r.d)
        assert r.a == rows[0][0] and r.b == rows[0][1]
        assert r.c == rows[0][0] and r.d == rows[0][1]
    finally:
        eng.sql("set hive.exec.script.allow.partial.consumption = false")
