"""clientpositive `.q` slice, round 5 batch 4: empty-input aggregation
(nullgroup.q / nullgroup2.q), GROUP BY ordinals (groupby_position.q),
top-N pushdown (limit_pushdown.q) and Hive's MySQL-style LIMIT
offset,count (offset_limit.q) — same replay method as
tests/test_qfile_slice.py."""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_ng")
    src_path = str(root / "src")
    rows = [(str(i % 83), f"val_{i % 83}") for i in range(500)]
    spark.createDataFrame(rows, "key string, value string").coalesce(
        2
    ).write.parquet(src_path)
    eng = Engine(spark=spark)
    eng.register_table("src", src_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW src AS SELECT * FROM read_parquet('{src_path}/*.parquet')"
    )
    yield eng, con, str(root)
    con.close()


def test_q_nullgroup_global_agg_over_empty(qenv):
    """nullgroup.q: a GLOBAL aggregate over an empty input returns ONE
    row (count=0, sum=NULL) — the classic no-GROUP-BY guarantee the
    golden re-runs under every exec-mode conf."""
    eng, con, _ = qenv
    got = eng.sql(
        "SELECT count(1) AS c, sum(key) AS s FROM src x WHERE x.key > 9999"
    )
    rows = got.collect()
    assert len(rows) == 1
    assert rows[0].c == 0 and rows[0].s is None
    assert_matches_oracle(
        got,
        con,
        "SELECT CAST(count(1) AS BIGINT) AS c, "
        "SUM(CAST(key AS DOUBLE)) AS s "
        "FROM src WHERE CAST(key AS DOUBLE) > 9999",
    )


def test_q_nullgroup2_grouped_agg_over_empty(qenv):
    """nullgroup2.q: the same empty input WITH a GROUP BY returns ZERO
    rows — groups only exist where rows do."""
    eng, con, _ = qenv
    got = eng.sql(
        "SELECT x.key AS key, count(1) AS c FROM src x "
        "WHERE x.key > 9999 GROUP BY x.key"
    )
    assert got.count() == 0
    assert_matches_oracle(
        got,
        con,
        "SELECT key, CAST(count(1) AS BIGINT) AS c FROM src "
        "WHERE CAST(key AS DOUBLE) > 9999 GROUP BY key",
    )


def test_q_groupby_position_ordinals_multi_insert(qenv):
    """groupby_position.q: GROUP BY 1 / GROUP BY 1,2 / GROUP BY 2,1
    ordinals inside a multi-insert, plus ORDER BY ordinals on the
    read-back — ordinal resolution against the branch select list."""
    eng, con, root = qenv
    spark = eng.spark
    spark.createDataFrame([], "key string, cnt long").write.mode(
        "overwrite"
    ).parquet(f"{root}/tt1")
    spark.createDataFrame([], "key string, val1 string, cnt long").write.mode(
        "overwrite"
    ).parquet(f"{root}/tt2")
    eng.register_table("tt1", f"{root}/tt1")
    eng.register_table("tt2", f"{root}/tt2")
    eng.sql(
        """
        FROM src
        INSERT OVERWRITE TABLE tt1
          SELECT src.key, COUNT(DISTINCT SUBSTR(src.value,5))
          WHERE src.key < 20 GROUP BY 1
        INSERT OVERWRITE TABLE tt2
          SELECT src.key, src.value, COUNT(DISTINCT SUBSTR(src.value,5))
          WHERE src.key < 20 GROUP BY 2, 1
        """
    )
    assert_matches_oracle(
        eng.sql("SELECT key, cnt FROM tt1 ORDER BY 1, 2"),
        con,
        """
        SELECT key, CAST(COUNT(DISTINCT SUBSTR(value,5)) AS BIGINT) AS cnt
        FROM src WHERE CAST(key AS DOUBLE) < 20 GROUP BY key
        """,
    )
    assert_matches_oracle(
        eng.sql("SELECT key, val1, cnt FROM tt2 ORDER BY 1, 2, 3"),
        con,
        """
        SELECT key, value AS val1,
               CAST(COUNT(DISTINCT SUBSTR(value,5)) AS BIGINT) AS cnt
        FROM src WHERE CAST(key AS DOUBLE) < 20 GROUP BY value, key
        """,
    )


def test_q_limit_pushdown_order_group_distinct(qenv):
    """limit_pushdown.q: ORDER BY + LIMIT over a scan, over a group-by,
    and over DISTINCT — the TopNHash / WindowGroupLimit shapes. ORDER
    keys are made total so LIMIT ties are deterministic across
    engines."""
    eng, con, _ = qenv
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM src ORDER BY key, value LIMIT 20"),
        con,
        "SELECT key, value FROM src ORDER BY key, value LIMIT 20",
    )
    assert_matches_oracle(
        eng.sql(
            "SELECT value, sum(key + 1) AS s FROM src "
            "GROUP BY value ORDER BY value LIMIT 20"
        ),
        con,
        """
        SELECT value, SUM(CAST(key AS DOUBLE) + 1) AS s FROM src
        GROUP BY value ORDER BY value LIMIT 20
        """,
    )
    assert_matches_oracle(
        eng.sql(
            "SELECT DISTINCT key AS dis FROM src ORDER BY dis LIMIT 20"
        ),
        con,
        "SELECT DISTINCT key AS dis FROM src ORDER BY dis LIMIT 20",
    )


def test_q_offset_limit_comma_form(qenv):
    """offset_limit.q: Hive's ``LIMIT offset,count`` (MySQL form,
    HiveParser limitClause) — rewritten to LIMIT..OFFSET; both forms
    must return identical pages, and an offset past the end is empty."""
    eng, con, _ = qenv
    base = (
        "SELECT src.key AS key, sum(substr(src.value,5)) AS s FROM src "
        "GROUP BY src.key ORDER BY src.key "
    )
    oracle_page = """
        SELECT key, SUM(CAST(substr(value,5) AS DOUBLE)) AS s FROM src
        GROUP BY key ORDER BY key LIMIT 10 OFFSET 10
    """
    assert_matches_oracle(eng.sql(base + "LIMIT 10,10"), con, oracle_page)
    comma = [tuple(r) for r in eng.sql(base + "LIMIT 10,10").collect()]
    explicit = [
        tuple(r) for r in eng.sql(base + "LIMIT 10 OFFSET 10").collect()
    ]
    assert comma == explicit
    assert eng.sql(base + "LIMIT 0,10").count() == 10
    assert eng.sql(base + "LIMIT 300,100").count() == 0  # 83 groups total
