"""clientpositive `.q` slice, round 8: semijoin.q — Hive's LEFT SEMI
JOIN surface beyond the cbo_semijoin shapes (reference:
ql/src/test/queries/clientpositive/semijoin.q; fixtures t1 = src keys
<= 10 as int, t2 = 2*t1 keys, t3 = t1 UNION ALL t2, t4 empty).

The corners: expression join keys (a.key = 2*b.key), right-side value
conditions inside the semi ON, semi joins CHAINED with left/right/full
OUTER joins in both orders, an empty right side, and a semi join keyed
on a non-join column of a preceding outer join. DuckDB oracles spell
the semi as EXISTS."""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(str(i % 83), f"val_{i % 83}") for i in range(500)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfile_semijoin")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    t1 = sorted({(int(k), v) for k, v in SRC if int(k) <= 10})
    t1 = [r for k, v in SRC if int(k) <= 10 for r in [(int(k), v)]]
    t2 = [(2 * k, v) for k, v in t1]
    t3 = t1 + t2
    for name, rows in (("sj_t1", t1), ("sj_t2", t2), ("sj_t3", t3),
                       ("sj_t4", [])):
        p = str(root / name)
        df = spark.createDataFrame(rows, "key int, value string")
        df.coalesce(1).write.parquet(p)
        eng.register_table(name, p)
        if rows:
            body = ", ".join(f"({k}, '{v}')" for k, v in rows)
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM (VALUES {body}) "
                "t(key, value)"
            )
        else:
            con.execute(
                f"CREATE VIEW {name} AS SELECT CAST(NULL AS INT) AS "
                "key, CAST(NULL AS VARCHAR) AS value WHERE 1=0"
            )
    yield eng, con
    con.close()


def _chk(eng, con, hive_sql, duck_sql):
    assert_matches_oracle(eng.sql(hive_sql), con, duck_sql)


def test_q_semijoin_core(qenv):
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT a.key AS k, a.value AS v FROM sj_t1 a LEFT SEMI JOIN "
        "sj_t2 b ON a.key = b.key",
        "SELECT key AS k, value AS v FROM sj_t1 a WHERE EXISTS "
        "(SELECT 1 FROM sj_t2 b WHERE a.key = b.key)",
    )
    # empty right side → empty result
    _chk(
        eng, con,
        "SELECT a.key AS k FROM sj_t1 a LEFT SEMI JOIN sj_t4 b ON "
        "b.key = a.key",
        "SELECT key AS k FROM sj_t1 a WHERE EXISTS "
        "(SELECT 1 FROM sj_t4 b WHERE b.key = a.key)",
    )
    # right-side condition inside the ON
    _chk(
        eng, con,
        "SELECT a.key AS k, a.value AS v FROM sj_t1 a LEFT SEMI JOIN "
        "sj_t2 b ON a.key = b.key AND b.value < 'val_10'",
        "SELECT key AS k, value AS v FROM sj_t1 a WHERE EXISTS "
        "(SELECT 1 FROM sj_t2 b WHERE a.key = b.key AND "
        "b.value < 'val_10')",
    )
    # expression join key
    _chk(
        eng, con,
        "SELECT a.key AS k, a.value AS v FROM sj_t1 a LEFT SEMI JOIN "
        "sj_t2 b ON a.key = 2*b.key",
        "SELECT key AS k, value AS v FROM sj_t1 a WHERE EXISTS "
        "(SELECT 1 FROM sj_t2 b WHERE a.key = 2*b.key)",
    )
    # semi against a filtered subquery
    _chk(
        eng, con,
        "SELECT a.value AS v FROM sj_t1 a LEFT SEMI JOIN (SELECT key "
        "FROM sj_t3 WHERE key > 5) b ON a.key = b.key",
        "SELECT value AS v FROM sj_t1 a WHERE EXISTS (SELECT 1 FROM "
        "sj_t3 b WHERE b.key > 5 AND a.key = b.key)",
    )


def test_q_semijoin_chained_with_outers(qenv):
    """Semi joins chained with inner/left/right/full outers — the semi
    keyed on the OUTER side's column (NULL keys never match)."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT a.key AS ak, a.value AS av, b.key AS bk, b.value AS "
        "bv FROM sj_t1 a JOIN sj_t2 b ON a.key = b.key LEFT SEMI JOIN "
        "sj_t3 c ON b.key = c.key",
        "SELECT a.key AS ak, a.value AS av, b.key AS bk, b.value AS "
        "bv FROM sj_t1 a JOIN sj_t2 b ON a.key = b.key WHERE EXISTS "
        "(SELECT 1 FROM sj_t3 c WHERE b.key = c.key)",
    )
    _chk(
        eng, con,
        "SELECT a.key AS k FROM sj_t3 a LEFT OUTER JOIN sj_t1 b ON "
        "a.key = b.key LEFT SEMI JOIN sj_t2 c ON b.key = c.key",
        "SELECT a.key AS k FROM sj_t3 a LEFT OUTER JOIN sj_t1 b ON "
        "a.key = b.key WHERE EXISTS (SELECT 1 FROM sj_t2 c WHERE "
        "b.key = c.key)",
    )
    _chk(
        eng, con,
        "SELECT a.key AS k FROM sj_t1 a RIGHT OUTER JOIN sj_t3 b ON "
        "a.key = b.key LEFT SEMI JOIN sj_t2 c ON b.key = c.key",
        "SELECT a.key AS k FROM sj_t1 a RIGHT OUTER JOIN sj_t3 b ON "
        "a.key = b.key WHERE EXISTS (SELECT 1 FROM sj_t2 c WHERE "
        "b.key = c.key)",
    )
    _chk(
        eng, con,
        "SELECT a.key AS k FROM sj_t3 a LEFT SEMI JOIN sj_t2 b ON "
        "a.key = b.key LEFT OUTER JOIN sj_t1 c ON a.key = c.key",
        "SELECT a.key AS k FROM (SELECT * FROM sj_t3 a WHERE EXISTS "
        "(SELECT 1 FROM sj_t2 b WHERE a.key = b.key)) a LEFT OUTER "
        "JOIN sj_t1 c ON a.key = c.key",
    )
    _chk(
        eng, con,
        "SELECT a.key AS k FROM sj_t3 a LEFT SEMI JOIN sj_t1 b ON "
        "a.key = b.key FULL OUTER JOIN sj_t2 c ON a.key = c.key",
        "SELECT a.key AS k FROM (SELECT * FROM sj_t3 a WHERE EXISTS "
        "(SELECT 1 FROM sj_t1 b WHERE a.key = b.key)) a FULL OUTER "
        "JOIN sj_t2 c ON a.key = c.key",
    )
    # semi keyed on VALUE after an outer keyed on KEY
    _chk(
        eng, con,
        "SELECT a.key AS k FROM sj_t3 a LEFT SEMI JOIN sj_t2 b ON "
        "a.value = b.value LEFT OUTER JOIN sj_t1 c ON a.value = c.value",
        "SELECT a.key AS k FROM (SELECT * FROM sj_t3 a WHERE EXISTS "
        "(SELECT 1 FROM sj_t2 b WHERE a.value = b.value)) a LEFT "
        "OUTER JOIN sj_t1 c ON a.value = c.value",
    )
