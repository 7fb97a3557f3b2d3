"""clientpositive auto_join family replay (auto_join1/2/8/22/26/28/
30/auto_join_filters/auto_join_nulls — representatives of the 37
unreplayed auto_join*.q files).

The family's subject is MapJoinProcessor auto-conversion
(hive.auto.convert.join): the same join answers whether executed as a
common join or a broadcast map-join. Spark's AQE/broadcast planning IS
that conversion; plan pins for broadcast conversion live in
tests/test_plan_regression.py:32,97. What the files add semantically —
and what this module pins against DuckDB — is the JOIN CONDITION
matrix around the conversion: ON clauses with NO equality at all
(filters only), one-sided predicates inside OUTER ONs (they gate
null-extension, never filter preserved rows), NULL keys under every
join type, bare JOIN with no ON (cross), chained LEFT/RIGHT OUTER
mixes, and join-of-join nesting with .* expansion.

The goldens aggregate with sum(hash(...)) — engine-specific (Hive
Java hashCode vs Spark Murmur3; documented divergence) — so the
replay compares the FULL ROW MULTISET instead, which is strictly
stronger.

Fixtures: data/files/in3.txt / in1.txt reproduced inline (ctrl-A
delimited, with the NULL rows every NULL-semantics cell depends on).
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

IN3 = [(12, 35), (None, 40), (48, None), (100, 100)]
IN1 = [(None, 35), (48, None), (100, 100)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_aj")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    srcrows = [(str(i % 83), f"val_{i % 83}") for i in range(400)]
    for name, rows, schema in (
        ("aj_src", srcrows, "key string, value string"),
        ("aj_in3", IN3, "key int, value int"),
        ("aj_in1", IN1, "key int, value int"),
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


_ROW = ("a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv")


def _chk(eng, con, hive_sql, duck_sql=None):
    assert_matches_oracle(eng.sql(hive_sql), con, duck_sql or hive_sql)


def test_q_auto_join_filters_no_equality(qenv):
    """auto_join_filters.q: ON clauses carrying ONLY filters (no
    cross-table equality) — INNER degenerates to a filtered cross,
    OUTER variants null-extend every non-matching row."""
    eng, con = qenv
    cond = ("a.key > 40 AND a.value > 50 AND a.key = a.value "
            "AND b.key > 40 AND b.value > 50 AND b.key = b.value")
    for jt in ("JOIN", "LEFT OUTER JOIN", "RIGHT OUTER JOIN",
               "FULL OUTER JOIN"):
        _chk(
            eng, con,
            f"SELECT {_ROW} FROM aj_in3 a {jt} aj_in3 b on {cond}",
        )


def test_q_auto_join_filters_mixed_keys(qenv):
    """auto_join_filters.q: equality keys PLUS per-side filters, in
    inner and one-sided outer forms, including the cross-column
    a.key = b.value key."""
    eng, con = qenv
    filt = ("a.key > 40 AND a.value > 50 AND a.key = a.value "
            "AND b.key > 40 AND b.value > 50 AND b.key = b.value")
    for jt in ("JOIN", "LEFT OUTER JOIN", "RIGHT OUTER JOIN"):
        for key in ("a.key = b.value", "a.key = b.key",
                    "a.value = b.value and a.key = b.key"):
            _chk(
                eng, con,
                f"SELECT {_ROW} FROM aj_in3 a {jt} aj_in3 b "
                f"ON {key} AND {filt}",
            )


def test_q_auto_join_nulls(qenv):
    """auto_join_nulls.q: NULL keys never match under any join type;
    bare JOIN with no ON is a cross join (Hive parses it as one)."""
    eng, con = qenv
    _chk(
        eng, con,
        f"SELECT {_ROW} FROM aj_in1 a JOIN aj_in1 b",
        f"SELECT {_ROW} FROM aj_in1 a CROSS JOIN aj_in1 b",
    )
    for jt in ("JOIN", "LEFT OUTER JOIN", "RIGHT OUTER JOIN"):
        for key in ("a.key = b.value", "a.key = b.key",
                    "a.value = b.value"):
            _chk(
                eng, con,
                f"SELECT {_ROW} FROM aj_in1 a {jt} aj_in1 b ON {key}",
            )


def test_q_auto_join28_chained_outer(qenv):
    """auto_join28.q: three-way LEFT/RIGHT OUTER chains whose ON
    clauses mix the equality with one-sided range filters."""
    eng, con = qenv
    cols = ("src1.key AS k1, src1.value AS v1, src2.key AS k2, "
            "src2.value AS v2, src3.key AS k3, src3.value AS v3")
    for j1, j2 in (("LEFT OUTER JOIN", "RIGHT OUTER JOIN"),
                   ("LEFT OUTER JOIN", "LEFT OUTER JOIN"),
                   ("RIGHT OUTER JOIN", "LEFT OUTER JOIN"),
                   ("RIGHT OUTER JOIN", "RIGHT OUTER JOIN")):
        _chk(
            eng, con,
            f"SELECT {cols} FROM aj_src src1 {j1} aj_src src2 ON "
            "(src1.key = src2.key AND src1.key < 10 AND src2.key > 10) "
            f"{j2} aj_src src3 ON (src2.key = src3.key AND "
            "src3.key < 10)",
            f"SELECT {cols} FROM aj_src src1 {j1} aj_src src2 ON "
            "(src1.key = src2.key AND CAST(src1.key AS DOUBLE) < 10 "
            "AND CAST(src2.key AS DOUBLE) > 10) "
            f"{j2} aj_src src3 ON (src2.key = src3.key AND "
            "CAST(src3.key AS DOUBLE) < 10)",
        )


def test_q_auto_join22_join_of_join_star_expansion(qenv):
    """auto_join22.q: a join whose right side is itself a join
    subquery expanded with .* — the nested aliases must all resolve."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT count(*) AS n, count(src5.src1_value) AS nv FROM "
        "(SELECT src3.*, src4.value as src4_value, src4.key as src4_key "
        "FROM aj_src src4 JOIN (SELECT src2.*, src1.key as src1_key, "
        "src1.value as src1_value FROM aj_src src1 JOIN aj_src src2 "
        "ON src1.key = src2.key) src3 ON src3.src1_key = src4.key) src5",
        "SELECT CAST(count(*) AS BIGINT) AS n, "
        "CAST(count(src5.src1_value) AS BIGINT) AS nv FROM "
        "(SELECT src3.*, src4.value as src4_value, src4.key as src4_key "
        "FROM aj_src src4 JOIN (SELECT src2.*, src1.key as src1_key, "
        "src1.value as src1_value FROM aj_src src1 JOIN aj_src src2 "
        "ON src1.key = src2.key) src3 ON src3.src1_key = src4.key) src5",
    )


def test_q_auto_join8_fromfirst_outer_subqueries(qenv):
    """auto_join8.q: FROM-first select over a LEFT OUTER JOIN of two
    FROM-first subqueries with overlapping range filters, plus the
    outer WHERE on the null-extended side."""
    eng, con = qenv
    _chk(
        eng, con,
        "FROM (FROM (FROM aj_src src1 SELECT src1.key AS c1, src1.value "
        "AS c2 WHERE src1.key > 10 and src1.key < 20) a LEFT OUTER JOIN "
        "(FROM aj_src src2 SELECT src2.key AS c3, src2.value AS c4 "
        "WHERE src2.key > 15 and src2.key < 25) b ON (a.c1 = b.c3) "
        "SELECT a.c1 AS c1, a.c2 AS c2, b.c3 AS c3, b.c4 AS c4 "
        "WHERE b.c3 IS NULL) c SELECT c.c1, c.c2",
        "SELECT a.c1, a.c2 FROM "
        "(SELECT key AS c1, value AS c2 FROM aj_src WHERE "
        "CAST(key AS DOUBLE) > 10 AND CAST(key AS DOUBLE) < 20) a "
        "LEFT OUTER JOIN (SELECT key AS c3, value AS c4 FROM aj_src "
        "WHERE CAST(key AS DOUBLE) > 15 AND CAST(key AS DOUBLE) < 25) b "
        "ON a.c1 = b.c3 WHERE b.c3 IS NULL",
    )


def test_q_auto_join26_insert_grouped_join(qenv, tmp_path):
    """auto_join1.q/26.q: FROM-first and plain INSERT OVERWRITE whose
    body is a grouped map-join; double overwrite stays idempotent."""
    eng, con = qenv
    eng.spark.sql("DROP TABLE IF EXISTS aj_dest")
    eng.sql("CREATE TABLE aj_dest (key INT, cnt INT) STORED AS PARQUET")
    for _ in range(2):
        eng.sql(
            "INSERT OVERWRITE TABLE aj_dest SELECT x.key, count(1) "
            "FROM aj_in3 x JOIN aj_src y ON (x.key = y.key) "
            "group by x.key"
        )
    assert_matches_oracle(
        eng.sql("select key, cnt from aj_dest"),
        con,
        "SELECT x.key, CAST(count(1) AS INT) AS cnt FROM aj_in3 x "
        "JOIN aj_src y ON x.key = CAST(y.key AS INT) GROUP BY x.key",
    )
    eng.sql("DROP TABLE aj_dest")


def test_q_auto_join30_sorted_subquery_inputs(qenv):
    """auto_join30.q: join over SORT BY subqueries — the sort is a
    physical hint, the join result is unchanged."""
    eng, con = qenv
    _chk(
        eng, con,
        "FROM (SELECT aj_src.* FROM aj_src sort by key) x JOIN "
        "(SELECT aj_src.* FROM aj_src sort by value) Y ON (x.key = "
        "Y.key) select count(*) AS n, count(Y.value) AS nv",
        "SELECT CAST(count(*) AS BIGINT) AS n, CAST(count(y.value) AS "
        "BIGINT) AS nv FROM aj_src x JOIN aj_src y ON x.key = y.key",
    )
