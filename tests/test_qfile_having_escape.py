"""clientpositive `.q` slice, round 8: subquery_in/notin_having.q +
escape1.q shapes (reference: ql/src/test/queries/clientpositive/).

- NOT IN / IN inside HAVING over a grouped query, including the form
  whose subquery compares an OUTER aggregate (min(p_retailprice) = l).
- Partition values containing characters that need DIRECTORY ESCAPING
  (spaces, colons, equals, percent) must round-trip: write, SHOW
  PARTITIONS, partition-pruned read-back (escape1.q writes control
  characters; the printable escape set is the portable core of the
  same property).
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(str(i % 83), f"val_{i % 83}") for i in range(500)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfile_having")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    p = str(root / "h_src")
    spark.createDataFrame(SRC, "key string, value string") \
        .coalesce(1).write.parquet(p)
    eng.register_table("h_src", p)
    con.execute(
        f"CREATE VIEW h_src AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    import os

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    pp = os.path.join(sf, "part.parquet")
    eng.register_table("h_part", pp)
    con.execute(
        f"CREATE VIEW h_part AS SELECT * FROM read_parquet('{pp}')"
    )
    yield eng, con
    con.close()


def test_q_subquery_notin_having(qenv):
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "SELECT key, count(*) AS n FROM h_src GROUP BY key HAVING "
            "key NOT IN (SELECT key FROM h_src s1 WHERE s1.key > '12')"
        ),
        con,
        "SELECT key, CAST(count(*) AS BIGINT) AS n FROM h_src GROUP "
        "BY key HAVING key NOT IN (SELECT key FROM h_src s1 WHERE "
        "s1.key > '12')",
    )
    assert_matches_oracle(
        eng.sql(
            "SELECT b.p_brand AS m, min(p_retailprice) AS mn FROM "
            "h_part b GROUP BY b.p_brand HAVING b.p_brand NOT IN "
            "(SELECT p_brand FROM (SELECT p_brand, min(p_retailprice) l, "
            "max(p_retailprice) r FROM h_part GROUP BY p_brand) a "
            "WHERE r - l > 600)"
        ),
        con,
        "SELECT b.p_brand AS m, min(p_retailprice) AS mn FROM h_part b "
        "GROUP BY b.p_brand HAVING b.p_brand NOT IN (SELECT p_brand FROM "
        "(SELECT p_brand, min(p_retailprice) l, max(p_retailprice) r "
        "FROM h_part GROUP BY p_brand) a WHERE r - l > 600)",
    )


def test_q_subquery_in_having_correlated(qenv):
    """IN-HAVING whose subquery is correlated on the group key."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "SELECT key, count(*) AS n FROM h_src b GROUP BY key "
            "HAVING key IN (SELECT key FROM h_src a WHERE a.key = "
            "b.key AND a.value > 'val_5')"
        ),
        con,
        "SELECT key, CAST(count(*) AS BIGINT) AS n FROM h_src b "
        "GROUP BY key HAVING key IN (SELECT key FROM h_src a WHERE "
        "a.key = b.key AND a.value > 'val_5')",
    )


def test_q_escape_partition_values(qenv, spark, tmp_path):
    """escape1.q's portable core: partition VALUES with space, colon,
    equals, percent and hash round-trip through write, SHOW
    PARTITIONS, and a pruned read."""
    eng = Engine(spark=spark)
    p = str(tmp_path / "esc1")
    vals = ["plain", "with space", "a:b", "a=b", "50%", "h#tag"]
    rows = [(i, v) for i, v in enumerate(vals)]
    spark.createDataFrame(rows, "a int, part string") \
        .repartition("part").write.partitionBy("part").parquet(p)
    eng.register_table("esc1", p, ["part"])
    # every value queryable by equality (pruning must decode the same
    # way the writer encoded)
    for i, v in enumerate(rows):
        got = eng.sql(
            f"SELECT a FROM esc1 WHERE part = '{v[1]}'"
        ).collect()
        assert [r.a for r in got] == [v[0]], v
    assert eng.sql("SELECT count(*) AS c FROM esc1").collect()[0].c == \
        len(vals)
    # engine-side insert of an escaped value lands queryable too
    eng.sql(
        "INSERT INTO TABLE esc1 PARTITION (part='new value') SELECT 99"
    )
    got = eng.sql(
        "SELECT a FROM esc1 WHERE part = 'new value'"
    ).collect()
    assert [r.a for r in got] == [99]
