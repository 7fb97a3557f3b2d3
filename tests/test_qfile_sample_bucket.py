"""clientpositive `.q` slice: the sample golden family — bucket
TABLESAMPLE over a CLUSTERED BY table. Reference:
ql/src/test/queries/clientpositive/sample2.q (implicit column — the
table's bucket spec resolves it), sample4.q (explicit ON key),
sample6.q (x OUT OF y re-hash with y != bucket count, and the last
bucket), sample7.q (sample + WHERE), sample9.q (sample inside a
subquery). Hive's genSamplePredicate (parse/SemanticAnalyzer.java)
filters on (hash(col) & MAX) % y = x-1, where an integral column
hashes to its value — the oracle states key % y = x-1 directly.

Spark's native TABLESAMPLE(BUCKET x OUT OF y) takes a RANDOM row
fraction, so the engine expands the implicit form from the catalog's
bucket spec (or raises a typed error when the table has none).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine, HiveQLUnsupportedError

from tests.conftest import assert_matches_oracle

ROWS = [(i * 7 % 499, f"val_{i * 7 % 499}") for i in range(500)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_sample")
    eng = Engine(spark=spark)
    spark.sql("DROP TABLE IF EXISTS srcbucket_s")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(wh, "srcbucket_s"), ignore_errors=True)
    eng.sql(
        "CREATE TABLE srcbucket_s (key INT, value STRING) "
        "CLUSTERED BY (key) INTO 2 BUCKETS STORED AS PARQUET"
    )
    eng.sql(
        "INSERT INTO srcbucket_s VALUES "
        + ", ".join(f"({k}, '{v}')" for k, v in ROWS)
    )
    # a plain (bucket-less) table for the typed-error case
    p = str(root / "plain")
    spark.createDataFrame(ROWS, "key int, value string").write.parquet(p)
    eng.register_table("plain_s", p)
    con = duckdb.connect()
    body = ", ".join(f"({k}, '{v}')" for k, v in ROWS)
    con.execute(
        "CREATE VIEW srcbucket_s AS SELECT * FROM (VALUES "
        + body + ") AS t(key, value)"
    )
    yield eng, con
    con.close()
    spark.sql("DROP TABLE IF EXISTS srcbucket_s")


def test_q_sample2_implicit_column(qenv):
    """sample2.q: BUCKET 1 OUT OF 2 with no ON — resolved from the
    CLUSTERED BY spec."""
    eng, con = qenv
    got = eng.sql(
        "SELECT s.* FROM srcbucket_s TABLESAMPLE (BUCKET 1 OUT OF 2) s "
        "ORDER BY key, value"
    )
    assert_matches_oracle(
        got,
        con,
        "SELECT key, value FROM srcbucket_s WHERE key % 2 = 0 "
        "ORDER BY key, value",
    )


def test_q_sample4_explicit_on_key(qenv):
    eng, con = qenv
    got = eng.sql(
        "SELECT s.* FROM srcbucket_s TABLESAMPLE (BUCKET 1 OUT OF 2 on key) s "
        "ORDER BY key, value"
    )
    assert_matches_oracle(
        got,
        con,
        "SELECT key, value FROM srcbucket_s WHERE key % 2 = 0 "
        "ORDER BY key, value",
    )


def test_q_sample6_rehash_and_last_bucket(qenv):
    """sample6.q: y=4 against a 2-bucket table (re-hash across 4), and
    BUCKET 4 OUT OF 4 (the last bucket, x-1 = 3)."""
    eng, con = qenv
    got = eng.sql(
        "SELECT s.* FROM srcbucket_s TABLESAMPLE (BUCKET 1 OUT OF 4 on key) s "
        "ORDER BY key, value"
    )
    assert_matches_oracle(
        got,
        con,
        "SELECT key, value FROM srcbucket_s WHERE key % 4 = 0 "
        "ORDER BY key, value",
    )
    got = eng.sql(
        "SELECT s.* FROM srcbucket_s TABLESAMPLE (BUCKET 4 OUT OF 4) s "
        "ORDER BY key, value"
    )
    assert_matches_oracle(
        got,
        con,
        "SELECT key, value FROM srcbucket_s WHERE key % 4 = 3 "
        "ORDER BY key, value",
    )


def test_q_sample7_with_where(qenv):
    """sample7.q: the sample predicate composes with the query WHERE."""
    eng, con = qenv
    got = eng.sql(
        "SELECT s.* FROM srcbucket_s TABLESAMPLE (BUCKET 1 OUT OF 4 on key) s "
        "WHERE s.key > 100 ORDER BY key, value"
    )
    assert_matches_oracle(
        got,
        con,
        "SELECT key, value FROM srcbucket_s WHERE key % 4 = 0 AND key > 100 "
        "ORDER BY key, value",
    )


def test_q_sample9_subquery(qenv):
    """sample9.q: sampling inside a derived table."""
    eng, con = qenv
    got = eng.sql(
        "SELECT s.* FROM (SELECT a.* FROM srcbucket_s "
        "TABLESAMPLE (BUCKET 1 OUT OF 2 on key) a) s ORDER BY key, value"
    )
    assert_matches_oracle(
        got,
        con,
        "SELECT key, value FROM srcbucket_s WHERE key % 2 = 0 "
        "ORDER BY key, value",
    )


def test_q_sample_implicit_without_bucket_spec_rejected(qenv):
    """Implicit-column sampling on a bucket-less table is a typed
    error, NOT Spark's random row-fraction sample."""
    eng, con = qenv
    with pytest.raises(HiveQLUnsupportedError, match="CLUSTERED BY"):
        eng.sql(
            "SELECT * FROM plain_s TABLESAMPLE (BUCKET 1 OUT OF 2) s"
        )


def test_q_sample8_sampled_join_inputs(qenv):
    """sample8.q: TABLESAMPLE on BOTH join inputs — the 1-of-1 side is
    the full table, the 1-of-10 side filters by hash; the join of the
    samples equals joining the equivalent hash-filtered subsets."""
    eng, con = qenv
    got = eng.sql(
        "SELECT s.key AS sk, s.value AS sv FROM srcbucket_s TABLESAMPLE "
        "(BUCKET 1 OUT OF 1 ON key) s JOIN srcbucket_s TABLESAMPLE "
        "(BUCKET 1 OUT OF 10 ON key) t "
        "WHERE t.key = s.key and t.value = s.value"
    ).collect()
    sampled = eng.sql(
        "SELECT key, value FROM srcbucket_s TABLESAMPLE "
        "(BUCKET 1 OUT OF 10 ON key)"
    ).collect()
    # self-join on (key, value) multiplies duplicate rows — compare
    # the DISTINCT row sets plus the duplicate-aware count
    assert {(r.sk, r.sv) for r in got} == {
        (r.key, r.value) for r in sampled
    }
    from collections import Counter
    counts = Counter((r.key, r.value) for r in sampled)
    assert len(got) == sum(c * c for c in counts.values())
    # 1-of-1 sample IS the whole table
    assert eng.sql(
        "SELECT count(*) AS n FROM srcbucket_s TABLESAMPLE "
        "(BUCKET 1 OUT OF 1 ON key)"
    ).collect()[0].n == len(ROWS)


def test_q_sample10_partitioned_bucketed(qenv, spark):
    """sample10.q: TABLESAMPLE over a PARTITIONED bucketed table —
    per-ds counts of the sample equal hand-filtering each partition by
    the same bucket hash."""
    eng, con = qenv
    spark.sql("DROP TABLE IF EXISTS srcpartbucket_s")
    eng.sql(
        "CREATE TABLE srcpartbucket_s (key INT, value STRING) "
        "PARTITIONED BY (ds STRING) CLUSTERED BY (key) INTO 4 BUCKETS "
        "STORED AS PARQUET"
    )
    for ds in ("2008-04-08", "2008-04-09"):
        eng.sql(
            f"INSERT INTO srcpartbucket_s PARTITION (ds='{ds}') "
            "VALUES " + ", ".join(
                f"({k}, '{v}')" for k, v in ROWS if k < 10
            )
        )
    got = {
        (r.ds, r.n)
        for r in eng.sql(
            "select ds, count(1) AS n from srcpartbucket_s tablesample "
            "(bucket 1 out of 4 on key) where ds is not null group by ds"
        ).collect()
    }
    per_ds = eng.sql(
        "select key from srcpartbucket_s tablesample (bucket 1 out of "
        "4 on key) where ds = '2008-04-08'"
    ).count()
    if per_ds:
        assert got == {("2008-04-08", per_ds), ("2008-04-09", per_ds)}
    # rand() sampling: nondeterministic subset, bounded by the table
    n_rand = eng.sql(
        "SELECT count(*) AS n FROM srcpartbucket_s TABLESAMPLE "
        "(BUCKET 1 OUT OF 2 ON rand())"
    ).collect()[0].n
    assert 0 <= n_rand <= 2 * sum(1 for k, _ in ROWS if k < 10)
    eng.sql("DROP TABLE srcpartbucket_s")
