"""clientpositive `.q` slice, round 8: the groupby_* golden family —
the map-side-agg / skew / multi-insert / grouping-id corners left
uncovered by the earlier rounds (reference:
ql/src/test/queries/clientpositive/groupby1.q-groupby9.q and the
groupby_grouping_*/groupby_multi_* files; 15/98 were covered before
this module).

Hive's `_map`/`_noskew`/`_map_skew` file variants differ ONLY by conf
(hive.map.aggr / hive.groupby.skewindata) — the plan changes, the
answers don't; Catalyst always runs partial aggregation map-side and
AQE handles skew, so each variant family replays once, value-diffed
against DuckDB. GROUPING__ID follows Hive 2.3's bit order (first
grouping column = MSB — the repo's established convention, mirrored
in the oracle as 2*GROUPING(a)+GROUPING(b)).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(str(i % 83), f"val_{i % 83}") for i in range(500)]
# data/files/groupby_groupingid.txt (6 rows, NULLs included)
GID_T1 = [(1, None), (1, 1), (2, 2), (3, 3), (3, None), (4, 5)]
# data/files/grouping_sets.txt
GS_T1 = [("8", "1", "1"), ("5", "2", "2"), ("1", "1", "3"),
         ("2", "2", "4"), ("2", "3", "5"), ("3", "2", "8")]


def _values_view(con, name, rows, cols):
    body = ", ".join(
        "(" + ", ".join("NULL" if v is None else repr(v) for v in r) + ")"
        for r in rows
    )
    con.execute(
        f"CREATE VIEW {name} AS SELECT * FROM (VALUES {body}) AS t({cols})"
    )


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfile_groupby")
    eng = Engine(spark=spark)
    p = str(root / "src")
    spark.createDataFrame(SRC, "key string, value string") \
        .coalesce(2).write.parquet(p)
    eng.register_table("gb_src", p)
    for name, rows, schema in (
        ("gb_gid_t1", GID_T1, "key int, value int"),
        ("gb_gs_t1", GS_T1, "a string, b string, c string"),
    ):
        tp = str(root / name)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(tp)
        eng.register_table(name, tp)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW gb_src AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    _values_view(con, "gb_gid_t1", GID_T1, "key, value")
    _values_view(con, "gb_gs_t1", GS_T1, "a, b, c")
    yield eng, con
    con.close()


def _chk(eng, con, hive_sql, duck_sql=None):
    assert_matches_oracle(eng.sql(hive_sql), con, duck_sql or hive_sql)


def test_q_groupby3_full_aggregate_suite(qenv):
    """groupby3.q (+ its _map/_map_skew/_noskew/_multi_distinct conf
    twins): the whole-table aggregate battery over substr(value,5) —
    sum/avg/avg DISTINCT/max/min/std/stddev_samp/variance/var_samp.
    Hive's std/variance are the POPULATION forms."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT round(sum(substr(value,5)), 4) AS s, "
        "round(avg(substr(value,5)), 6) AS a, "
        "round(avg(DISTINCT substr(value,5)), 6) AS ad, "
        "round(max(substr(value,5)), 6) AS mx, "
        "round(min(substr(value,5)), 6) AS mn, "
        "round(std(substr(value,5)), 6) AS st, "
        "round(stddev_samp(substr(value,5)), 6) AS ss, "
        "round(variance(substr(value,5)), 6) AS vp, "
        "round(var_samp(substr(value,5)), 6) AS vs FROM gb_src",
        "SELECT round(sum(CAST(substr(value,5) AS DOUBLE)), 4) AS s, "
        "round(avg(CAST(substr(value,5) AS DOUBLE)), 6) AS a, "
        "round(avg(DISTINCT CAST(substr(value,5) AS DOUBLE)), 6) AS ad, "
        # Hive max/min over a STRING arg compare lexicographically
        # (the DOUBLE cast happens at the INSERT, after aggregation)
        "round(CAST(max(substr(value,5)) AS DOUBLE), 6) AS mx, "
        "round(CAST(min(substr(value,5)) AS DOUBLE), 6) AS mn, "
        "round(stddev_pop(CAST(substr(value,5) AS DOUBLE)), 6) AS st, "
        "round(stddev_samp(CAST(substr(value,5) AS DOUBLE)), 6) AS ss, "
        "round(var_pop(CAST(substr(value,5) AS DOUBLE)), 6) AS vp, "
        "round(var_samp(CAST(substr(value,5) AS DOUBLE)), 6) AS vs "
        "FROM gb_src",
    )


def test_q_groupby5_insert_overwrite_grouped(qenv, spark):
    """groupby5.q family: INSERT OVERWRITE of a keyed sum — run twice
    (the golden re-runs to pin overwrite-idempotence), read back."""
    eng, con = qenv
    spark.sql("DROP TABLE IF EXISTS gb_dest1")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(wh, "gb_dest1"), ignore_errors=True)
    eng.sql("CREATE TABLE gb_dest1 (key INT, value STRING) STORED AS PARQUET")
    for _ in range(2):
        eng.sql(
            "INSERT OVERWRITE TABLE gb_dest1 SELECT gb_src.key, "
            "sum(substr(gb_src.value,5)) FROM gb_src GROUP BY gb_src.key"
        )
    _chk(
        eng, con,
        "SELECT key, value FROM gb_dest1 ORDER BY key, value",
        "SELECT CAST(key AS INT) AS key, "
        "CAST(sum(CAST(substr(value,5) AS DOUBLE)) AS VARCHAR) AS value "
        "FROM gb_src GROUP BY key "
        "ORDER BY key NULLS FIRST, value NULLS FIRST",
    )
    spark.sql("DROP TABLE IF EXISTS gb_dest1")


def test_q_groupby7_9_multi_insert_group_by(qenv, spark):
    """groupby7.q/groupby9.q: FROM src multi-insert where each branch
    has its OWN GROUP BY (including a distinct aggregate per branch —
    groupby9's common-distinct corner)."""
    eng, con = qenv
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("gb_d1", "gb_d2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    eng.sql("CREATE TABLE gb_d1 (key INT, value STRING) STORED AS PARQUET")
    eng.sql(
        "CREATE TABLE gb_d2 (key INT, val1 STRING, val2 STRING) "
        "STORED AS PARQUET"
    )
    eng.sql(
        "FROM gb_src "
        "INSERT OVERWRITE TABLE gb_d1 SELECT gb_src.key, "
        "COUNT(DISTINCT SUBSTR(gb_src.value,5)) GROUP BY gb_src.key "
        "INSERT OVERWRITE TABLE gb_d2 SELECT gb_src.key, gb_src.value, "
        "COUNT(DISTINCT SUBSTR(gb_src.value,5)) "
        "GROUP BY gb_src.key, gb_src.value"
    )
    _chk(
        eng, con,
        "SELECT key, value FROM gb_d1 ORDER BY key, value",
        "SELECT CAST(key AS INT) AS key, "
        "CAST(count(DISTINCT substr(value,5)) AS VARCHAR) AS value "
        "FROM gb_src GROUP BY key ORDER BY key NULLS FIRST, "
        "value NULLS FIRST",
    )
    _chk(
        eng, con,
        "SELECT key, val1, val2 FROM gb_d2 ORDER BY key, val1, val2",
        "SELECT CAST(key AS INT) AS key, value AS val1, "
        "CAST(count(DISTINCT substr(value,5)) AS VARCHAR) AS val2 "
        "FROM gb_src GROUP BY key, value ORDER BY key NULLS FIRST, "
        "val1 NULLS FIRST, val2 NULLS FIRST",
    )
    for t in ("gb_d1", "gb_d2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_q_groupby_multi_insert_common_distinct(qenv, spark):
    """groupby_multi_insert_common_distinct.q: the same
    count(distinct value) feeds two branches with DIFFERENT group-by
    keys (key vs key+key) — Hive's shared-distinct RS corner."""
    eng, con = qenv
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("gb_cd1", "gb_cd2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    eng.sql("CREATE TABLE gb_cd1 (key INT, cnt INT) STORED AS PARQUET")
    eng.sql("CREATE TABLE gb_cd2 (key INT, cnt INT) STORED AS PARQUET")
    eng.sql(
        "FROM gb_src "
        "INSERT OVERWRITE TABLE gb_cd1 SELECT key, count(distinct value) "
        "GROUP BY key "
        "INSERT OVERWRITE TABLE gb_cd2 SELECT key+key, "
        "count(distinct value) GROUP BY key+key"
    )
    _chk(
        eng, con,
        "SELECT key, cnt FROM gb_cd1 WHERE key < 10 ORDER BY key",
        "SELECT CAST(key AS INT) AS key, "
        "CAST(count(DISTINCT value) AS INT) AS cnt FROM gb_src "
        "GROUP BY key HAVING CAST(key AS INT) < 10 "
        "ORDER BY key NULLS FIRST",
    )
    _chk(
        eng, con,
        "SELECT key, cnt FROM gb_cd2 WHERE key < 20 ORDER BY key LIMIT 10",
        # Hive string+string arithmetic coerces both sides to DOUBLE
        "SELECT CAST(CAST(key AS DOUBLE) + CAST(key AS DOUBLE) AS INT) "
        "AS key, CAST(count(DISTINCT value) AS INT) AS cnt FROM gb_src "
        "GROUP BY CAST(key AS DOUBLE) + CAST(key AS DOUBLE) "
        "HAVING CAST(CAST(key AS DOUBLE) + CAST(key AS DOUBLE) AS INT) "
        "< 20 ORDER BY key NULLS FIRST LIMIT 10",
    )
    for t in ("gb_cd1", "gb_cd2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_q_groupby_grouping_id2(qenv):
    """groupby_grouping_id2.q: GROUPING__ID under WITH ROLLUP and
    rollup(...) syntaxes, plus re-aggregating BY grouping id."""
    eng, con = qenv
    duck = (
        "SELECT key, value, CAST(2*GROUPING(key)+GROUPING(value) AS "
        "BIGINT) AS gid, count(*) AS n FROM gb_gid_t1 "
        "GROUP BY ROLLUP (key, value) "
        "ORDER BY key NULLS FIRST, value NULLS FIRST, gid"
    )
    for syntax in ("GROUP BY key, value WITH ROLLUP",
                   "GROUP BY ROLLUP (key, value)"):
        _chk(
            eng, con,
            "SELECT key, value, CAST(GROUPING__ID AS BIGINT) AS gid, "
            f"count(*) AS n FROM gb_gid_t1 {syntax} "
            "ORDER BY key, value, gid",
            duck,
        )
    _chk(
        eng, con,
        "SELECT gid, count(*) AS n FROM (SELECT key, value, "
        "CAST(GROUPING__ID AS BIGINT) AS gid, count(*) AS c "
        "FROM gb_gid_t1 GROUP BY key, value WITH ROLLUP) t "
        "GROUP BY gid ORDER BY gid",
        "SELECT gid, count(*) AS n FROM (SELECT key, value, "
        "CAST(2*GROUPING(key)+GROUPING(value) AS BIGINT) AS gid "
        "FROM gb_gid_t1 GROUP BY ROLLUP (key, value)) t "
        "GROUP BY gid ORDER BY gid",
    )


def test_q_groupby_grouping_sets2_cube(qenv):
    """groupby_grouping_sets2.q: WITH CUBE / cube(...) syntaxes and
    sum over an expression of two columns."""
    eng, con = qenv
    duck = (
        "SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM gb_gs_t1 "
        "GROUP BY CUBE (a, b) ORDER BY a NULLS FIRST, b NULLS FIRST, n"
    )
    for syntax in ("GROUP BY a, b WITH CUBE", "GROUP BY CUBE (a, b)"):
        _chk(
            eng, con,
            f"SELECT a, b, count(*) AS n FROM gb_gs_t1 {syntax} "
            "ORDER BY a, b, n",
            duck,
        )
    _chk(
        eng, con,
        "SELECT a, b, round(sum(c), 2) AS s FROM gb_gs_t1 "
        "GROUP BY a, b WITH CUBE ORDER BY a, b, s",
        "SELECT a, b, round(sum(CAST(c AS DOUBLE)), 2) AS s FROM "
        "gb_gs_t1 GROUP BY CUBE (a, b) "
        "ORDER BY a NULLS FIRST, b NULLS FIRST, s NULLS FIRST",
    )


def test_q_groupby_grouping_sets_grouping(qenv):
    """groupby_grouping_sets_grouping.q: grouping() + `grouping__id`
    together, grouping() in HAVING, and grouping() arithmetic in
    ORDER BY."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT key, value, CAST(`grouping__id` AS BIGINT) AS gid, "
        "CAST(grouping(key) AS INT) AS gk, "
        "CAST(grouping(value) AS INT) AS gv "
        "FROM gb_gid_t1 GROUP BY rollup(key, value) "
        "ORDER BY key, value, gid",
        "SELECT key, value, CAST(2*GROUPING(key)+GROUPING(value) AS "
        "BIGINT) AS gid, CAST(GROUPING(key) AS INT) AS gk, "
        "CAST(GROUPING(value) AS INT) AS gv FROM gb_gid_t1 "
        "GROUP BY ROLLUP (key, value) "
        "ORDER BY key NULLS FIRST, value NULLS FIRST, gid",
    )
    _chk(
        eng, con,
        "SELECT key, value FROM gb_gid_t1 GROUP BY cube(key, value) "
        "HAVING grouping(key) = 1 ORDER BY key, value",
        "SELECT key, value FROM gb_gid_t1 GROUP BY CUBE (key, value) "
        "HAVING GROUPING(key) = 1 "
        "ORDER BY key NULLS FIRST, value NULLS FIRST",
    )
    _chk(
        eng, con,
        "SELECT key, value, CAST(grouping(key)+grouping(value) AS "
        "BIGINT) AS x FROM gb_gid_t1 GROUP BY cube(key, value) "
        "HAVING grouping(key) = 1 OR grouping(value) = 1 "
        "ORDER BY x, key, value",
        "SELECT key, value, CAST(GROUPING(key)+GROUPING(value) AS "
        "BIGINT) AS x FROM gb_gid_t1 GROUP BY CUBE (key, value) "
        "HAVING GROUPING(key) = 1 OR GROUPING(value) = 1 "
        "ORDER BY x, key NULLS FIRST, value NULLS FIRST",
    )


def test_q_groupby_duplicate_key(qenv):
    """groupby_duplicate_key.q: DISTINCT over a key plus DUPLICATE
    constant columns (Hive dedups the identical grouping expressions),
    and case-sensitive max('pants')/max('pANTS') constants."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT DISTINCT key, '' AS dummy1, '' AS dummy2 FROM gb_src "
        "ORDER BY key",
        "SELECT DISTINCT key, '' AS dummy1, '' AS dummy2 FROM gb_src "
        "ORDER BY key NULLS FIRST",
    )
    row = eng.sql(
        "SELECT max('pants') AS a, max('pANTS') AS b FROM gb_src "
        "GROUP BY key LIMIT 1"
    ).collect()[0]
    assert (row.a, row.b) == ("pants", "pANTS")


def test_q_groupby_constants(qenv):
    """groupby_neg_float.q + groupby_constcolval.q + groupby_empty.q:
    grouping BY constants (negative double literal, join-subquery
    constants) and GROUP BY () over a non-empty table."""
    eng, con = qenv
    row = eng.sql(
        "SELECT CAST('-30.33' AS DOUBLE) AS d FROM gb_src "
        "GROUP BY CAST('-30.33' AS DOUBLE) LIMIT 1"
    ).collect()
    assert len(row) == 1 and row[0].d == -30.33
    row = eng.sql(
        "SELECT '-30.33' AS s FROM gb_src GROUP BY '-30.33' LIMIT 1"
    ).collect()
    assert len(row) == 1 and row[0].s == "-30.33"
    # join-subquery constants grouped (groupby_constcolval.q)
    _chk(
        eng, con,
        "SELECT key, key1, key2 FROM (SELECT a.key, 0 AS key1, 1 AS "
        "key2 FROM gb_gid_t1 a INNER JOIN gb_src b ON a.key = b.key) a "
        "GROUP BY key, key1, key2 ORDER BY key",
        "SELECT key, key1, key2 FROM (SELECT a.key, 0 AS key1, 1 AS "
        "key2 FROM gb_gid_t1 a INNER JOIN gb_src b "
        "ON a.key = CAST(b.key AS INT)) a "
        "GROUP BY key, key1, key2 ORDER BY key NULLS FIRST",
    )
    # groupby_empty.q: GROUP BY () == one global group
    row = eng.sql(
        "SELECT count(*) AS c FROM gb_gid_t1 GROUP BY ()"
    ).collect()
    assert [r.c for r in row] == [6]


def test_q_groupby_grouping_window(qenv, spark):
    """groupby_grouping_window.q: GROUPING SETS + HAVING + a window
    function over the aggregated output."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT category, max(live) AS live, max(comments) AS comments, "
        "rank() OVER (PARTITION BY category ORDER BY max(comments)) "
        "AS rank1 FROM (SELECT key AS category, 0 AS live, "
        "value AS comments FROM gb_gid_t1) t GROUP BY category "
        "GROUPING SETS ((), (category)) HAVING max(comments) > 0 "
        "ORDER BY category, rank1",
        "SELECT category, max(live) AS live, max(comments) AS comments, "
        "rank() OVER (PARTITION BY category ORDER BY max(comments)) "
        "AS rank1 FROM (SELECT key AS category, 0 AS live, "
        "value AS comments FROM gb_gid_t1) t GROUP BY "
        "GROUPING SETS ((), (category)) HAVING max(comments) > 0 "
        "ORDER BY category NULLS FIRST, rank1",
    )


def test_q_groupby_resolution(qenv):
    """groupby_resolution.q: alias-qualified vs bare grouping keys
    (group by b.key select key and vice versa), HAVING after group by,
    and windowing over count(*)."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT key, count(*) AS n FROM gb_src b GROUP BY b.key "
        "ORDER BY key",
        "SELECT key, CAST(count(*) AS BIGINT) AS n FROM gb_src b "
        "GROUP BY b.key ORDER BY key NULLS FIRST",
    )
    _chk(
        eng, con,
        "SELECT b.key, count(*) AS n FROM gb_src b GROUP BY key "
        "ORDER BY key",
        "SELECT b.key, CAST(count(*) AS BIGINT) AS n FROM gb_src b "
        "GROUP BY key ORDER BY key NULLS FIRST",
    )
    _chk(
        eng, con,
        "SELECT key, count(*) AS n FROM gb_src b GROUP BY b.key "
        "HAVING key < '12' ORDER BY b.key",
        "SELECT key, CAST(count(*) AS BIGINT) AS n FROM gb_src b "
        "GROUP BY b.key HAVING key < '12' ORDER BY b.key NULLS FIRST",
    )
    _chk(
        eng, con,
        "SELECT key, count(*) AS n, rank() OVER (ORDER BY count(*), "
        "key) AS r FROM gb_src b WHERE key < '12' GROUP BY b.key "
        "ORDER BY b.key",
        "SELECT key, CAST(count(*) AS BIGINT) AS n, "
        "CAST(rank() OVER (ORDER BY count(*), key) AS BIGINT) AS r "
        "FROM gb_src b WHERE key < '12' GROUP BY b.key "
        "ORDER BY b.key NULLS FIRST",
    )
