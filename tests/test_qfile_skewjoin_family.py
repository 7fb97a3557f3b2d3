"""clientpositive `.q` slice, round 6h: the remaining skewjoinopt
golden family (reference: ql/src/test/queries/clientpositive/
skewjoinopt2.q, 3, 7, 9, 14, 19 — driven by
optimizer/SkewJoinOptimizer.java). skewjoinopt1 is replayed in
test_qfile_skewjoin_ctas.py; these cover the family's remaining
distinct shapes.

The family's single contract: SKEWED BY is a physical-plan hint (Hive
splits the skewed keys into a separate map-join and unions the
results) that must NEVER change answers. Spark's equivalent is AQE
skew-join splitting, also answer-preserving, so every shape is
value-diffed against a plain-join DuckDB oracle:

- opt2: compound join key (key AND val) under inner and LEFT OUTER
  joins, plus GROUP BY on top — both sides skewed on different values;
- opt3: both sides skewed with an OVERLAPPING skew value (8);
- opt7: 3-way join where only two inputs carry skew metadata;
- opt9: a UNION ALL (duplicating rows) and a GROUP BY subquery feeding
  a join with a skewed table;
- opt14: skew declared on a NON-join column (val) — must be a plain
  no-op for key-join planning;
- opt19: skew combined with CLUSTERED BY bucketing metadata.

The runtime skew path (hive.optimize.skewjoin=true, exec/SkewJoinHandler)
maps to AQE's runtime skew splitting (set at session conf in
catalog.py); join_skew_salted in the registry covers the measured
path.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

# QTestUtil's T1/T2/T3 payloads (data/files/T1.txt ff.)
T1 = [("1", "11"), ("2", "12"), ("3", "13"), ("7", "17"), ("8", "18"),
      ("8", "28")]
T2 = [("2", "22"), ("3", "13"), ("4", "14"), ("5", "15"), ("8", "18"),
      ("8", "18")]
T3 = [("1", "11"), ("2", "12"), ("3", "13"), ("7", "17"), ("8", "18")]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    import os
    import shutil

    eng = Engine(spark=spark)
    con = duckdb.connect()
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    specs = (
        ("sjf_t1", T1, "SKEWED BY (key) ON (('2'), ('8'))"),
        ("sjf_t2", T2, "SKEWED BY (key) ON (('3'), ('8'))"),
        ("sjf_t3", T3, ""),
        ("sjf_t1v", T1, "SKEWED BY (val) ON (('12'))"),
        ("sjf_t1b", T1,
         "CLUSTERED BY (key) INTO 4 BUCKETS SKEWED BY (key) ON (('2'))"),
    )
    for name, rows, skew in specs:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
        eng.sql(
            f"CREATE TABLE {name}(key STRING, val STRING) {skew} "
            "STORED AS PARQUET"
        )
        eng.sql(
            f"INSERT INTO {name} VALUES "
            + ", ".join(f"('{k}', '{v}')" for k, v in rows)
        )
        body = ", ".join(f"('{k}', '{v}')" for k, v in rows)
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM (VALUES {body}) "
            "AS t(key, val)"
        )
    yield eng, con
    con.close()


_PROJ = "a.key AS ak, a.val AS av, b.key AS bk, b.val AS bv"


def _chk(eng, con, hive_sql, duck_sql=None):
    assert_matches_oracle(eng.sql(hive_sql), con, duck_sql or hive_sql)


def test_q_sjopt2_compound_key_inner_outer_gby(qenv):
    """skewjoinopt2.q: compound (key, val) join under inner and LEFT
    OUTER, plus the GROUP BY-on-top variants."""
    eng, con = qenv
    for jt in ("JOIN", "LEFT OUTER JOIN"):
        _chk(eng, con,
             f"SELECT {_PROJ} FROM sjf_t1 a {jt} sjf_t2 b "
             "ON a.key = b.key and a.val = b.val")
        _chk(eng, con,
             f"SELECT a.key AS key, count(1) AS cnt FROM sjf_t1 a {jt} "
             "sjf_t2 b ON a.key = b.key and a.val = b.val "
             "group by a.key",
             f"SELECT a.key AS key, CAST(count(1) AS BIGINT) AS cnt "
             f"FROM sjf_t1 a {jt} sjf_t2 b "
             "ON a.key = b.key AND a.val = b.val GROUP BY a.key")


def test_q_sjopt3_overlapping_skew_values(qenv):
    """skewjoinopt3.q: both sides skewed, overlapping on key 8 (the
    duplicated key on both sides: 2x2 matches)."""
    eng, con = qenv
    _chk(eng, con,
         f"SELECT {_PROJ} FROM sjf_t1 a JOIN sjf_t2 b ON a.key = b.key")


def test_q_sjopt7_three_way_partial_skew(qenv):
    """skewjoinopt7.q: 3-way join, only two inputs skewed."""
    eng, con = qenv
    _chk(eng, con,
         f"SELECT {_PROJ}, c.key AS ck, c.val AS cv "
         "FROM sjf_t1 a JOIN sjf_t2 b ON a.key = b.key "
         "JOIN sjf_t3 c on a.key = c.key")


def test_q_sjopt9_union_and_gby_subqueries(qenv):
    """skewjoinopt9.q: UNION ALL self-duplication and a GROUP BY
    subquery, each joined to a skewed table."""
    eng, con = qenv
    _chk(eng, con,
         "select subq1.key AS sk, subq1.val AS sv, "
         "b.key AS bk, b.val AS bv from "
         "(select key, val from sjf_t1 union all "
         "select key, val from sjf_t1) subq1 "
         "join sjf_t2 b on subq1.key = b.key")
    _chk(eng, con,
         "select subq1.key AS sk, subq1.cnt AS cnt, "
         "b.key AS bk, b.val AS bv from "
         "(select key, count(1) as cnt from sjf_t1 group by key) subq1 "
         "join sjf_t2 b on subq1.key = b.key",
         "SELECT subq1.key AS sk, CAST(subq1.cnt AS BIGINT) AS cnt, "
         "b.key AS bk, b.val AS bv FROM "
         "(SELECT key, count(1) AS cnt FROM sjf_t1 GROUP BY key) subq1 "
         "JOIN sjf_t2 b ON subq1.key = b.key")


def test_q_sjopt14_skew_on_non_join_column(qenv):
    """skewjoinopt14.q: skew metadata on val while joining on key."""
    eng, con = qenv
    _chk(eng, con,
         f"SELECT {_PROJ} FROM sjf_t1v a JOIN sjf_t2 b ON a.key = b.key")


def test_q_sjopt19_skew_plus_bucketing(qenv):
    """skewjoinopt19.q: CLUSTERED BY bucketing + SKEWED BY on the same
    key — both advisory layers, answers unchanged."""
    eng, con = qenv
    _chk(eng, con,
         f"SELECT {_PROJ} FROM sjf_t1b a JOIN sjf_t2 b ON a.key = b.key")


def test_q_runtime_skewjoin_toggle_preserves_answers(qenv):
    """skewjoin.q's SET hive.optimize.skewjoin=true path: toggling the
    runtime skew handler must not change the join answer (here it maps
    to AQE skew splitting, already on by default)."""
    eng, con = qenv
    eng.sql("SET hive.optimize.skewjoin = true")
    try:
        _chk(eng, con,
             f"SELECT {_PROJ} FROM sjf_t1 a JOIN sjf_t2 b "
             "ON a.key = b.key")
    finally:
        eng.sql("SET hive.optimize.skewjoin = false")


def test_q_sjopt10_lateral_view_over_skew_join(qenv, spark):
    """skewjoinopt10.q: LATERAL VIEW explode over the output of a
    skew-table join whose right side carries an ARRAY column — the
    skew split must not duplicate or drop exploded rows."""
    eng, con = qenv
    spark.sql("DROP TABLE IF EXISTS sjf_arr")
    eng.sql(
        "CREATE TABLE sjf_arr (key STRING, value ARRAY<STRING>) "
        "STORED AS PARQUET"
    )
    eng.sql(
        "INSERT INTO sjf_arr SELECT key, array(val) FROM sjf_t1"
    )
    _chk(
        eng, con,
        "select i.key AS key, c.val AS val from (select a.key as key, "
        "b.value as array_val from sjf_t1 a join sjf_arr b on "
        "a.key=b.key) i lateral view explode (array_val) c as val",
        "SELECT a.key AS key, b.val AS val FROM sjf_t1 a JOIN sjf_t1 b "
        "ON a.key = b.key",
    )
    eng.sql("DROP TABLE sjf_arr")


def test_q_sjopt12_compound_skew_compound_join(qenv):
    """skewjoinopt6.q/12.q: BOTH sides skewed on compound (key, val)
    values, joined on the full compound key."""
    eng, con = qenv
    _chk(
        eng, con,
        f"SELECT {_PROJ} FROM sjf_t1 a JOIN sjf_t2 b ON a.key = b.key "
        "and a.val = b.val",
    )


def test_q_sjopt4_one_side_skewed_either_position(qenv):
    """skewjoinopt4.q: only ONE side declares skew — the join answer
    is identical whichever side of the JOIN the skewed table is on."""
    eng, con = qenv
    _chk(
        eng, con,
        f"SELECT {_PROJ} FROM sjf_t1 a JOIN sjf_t3 b ON a.key = b.key",
        f"SELECT {_PROJ} FROM sjf_t1 a JOIN sjf_t3 b ON a.key = b.key",
    )
    _chk(
        eng, con,
        f"SELECT {_PROJ} FROM sjf_t3 a JOIN sjf_t1 b ON a.key = b.key",
        f"SELECT {_PROJ} FROM sjf_t3 a JOIN sjf_t1 b ON a.key = b.key",
    )
