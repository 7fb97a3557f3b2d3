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
    read-back — ordinal resolution against the branch select list.
    The .q file SETs hive.groupby.orderby.position.alias=true up top
    (Hive 2.3's default treats bare GROUP BY integers as constants) —
    replayed, reset at the end."""
    eng, con, root = qenv
    eng.sql("set hive.groupby.orderby.position.alias=true")
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
    eng.sql("set hive.groupby.orderby.position.alias=false")


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


def test_q_cte_1_forward_reference(qenv):
    """cte_1.q: Hive resolves the whole WITH map before rewriting, so
    q1 may reference q2 defined AFTER it — replayed through the r5
    topological CTE reorder; also the nested-subquery-over-CTE form."""
    eng, con, _ = qenv
    assert_matches_oracle(
        eng.sql(
            "with q1 as ( select key from src where key = '5') "
            "select * from q1"
        ),
        con,
        "SELECT key FROM src WHERE key = '5'",
    )
    assert_matches_oracle(
        eng.sql(
            "with q1 as ( select key from q2 where key = '5'), "
            "q2 as ( select key from src where key = '5') "
            "select * from (select key from q1) a"
        ),
        con,
        "SELECT key FROM src WHERE key = '5'",
    )


def test_q_cte_shadowing_and_chain(qenv):
    """cte_2.q-style: a CTE shadowing a real table name, and a 3-deep
    forward chain."""
    eng, con, _ = qenv
    # CTE named like the base table shadows it inside the statement
    assert_matches_oracle(
        eng.sql(
            "with src as (select key, value from src where key < 3) "
            "select count(*) as n from src"
        ),
        con,
        "SELECT CAST(count(*) AS BIGINT) AS n FROM src "
        "WHERE CAST(key AS DOUBLE) < 3",
    )
    assert_matches_oracle(
        eng.sql(
            "with a as (select k2 AS k1 from b), "
            "b as (select k3 AS k2 from c), "
            "c as (select key AS k3 from src where key = '7') "
            "select count(*) AS n from a"
        ),
        con,
        "SELECT CAST(count(*) AS BIGINT) AS n FROM src WHERE key = '7'",
    )


def test_q_ppd_transform_filter_above_script(qenv):
    """ppd_transform.q: TRANSFORM ... USING 'cat' inside a subquery with
    an outer WHERE — the filter applies to the script's OUTPUT (it can
    never push through an opaque script), and 'cat' passes rows through
    unchanged."""
    eng, con, _ = qenv
    got = eng.sql(
        """
        SELECT tmap.tkey, tmap.tvalue FROM (
          FROM src
          SELECT TRANSFORM(src.key, src.value)
                 USING 'cat' AS (tkey, tvalue)
        ) tmap
        WHERE tmap.tkey < 100
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT key AS tkey, value AS tvalue FROM src
        WHERE CAST(key AS DOUBLE) < 100
        """,
    )


def test_q_join_cond_pushdown_trailing_on(qenv):
    """join_cond_pushdown_1.q: a three-relation join chain with ALL
    conditions in the trailing ON — the optimizer must route each
    conjunct to the join it binds to; plus a constant-only condition
    (p2.key = 1) composing with an equi-join."""
    eng, con, _ = qenv
    assert_matches_oracle(
        eng.sql(
            """
            select count(*) as n
            from src p1 join src p2 join src p3
              on p1.key = p2.key and p2.key = p3.key
            """
        ),
        con,
        """
        SELECT CAST(count(*) AS BIGINT) AS n
        FROM src p1 JOIN src p2 ON p1.key = p2.key
        JOIN src p3 ON p2.key = p3.key
        """,
    )
    assert_matches_oracle(
        eng.sql(
            """
            select count(*) as n
            from src p1 join src p2 join src p3
              on p2.key = 1 and p3.value = p2.value
            """
        ),
        con,
        """
        SELECT CAST(count(*) AS BIGINT) AS n
        FROM src p1
        CROSS JOIN (SELECT * FROM src WHERE CAST(key AS DOUBLE) = 1) p2
        JOIN src p3 ON p3.value = p2.value
        """,
    )


def test_q_groupby_complex_types(qenv, spark):
    """groupby_complex_types.q: GROUP BY on array / struct / map typed
    expressions, join on array equality, DISTINCT over structs — all
    value-diffed (map grouping literal-asserted: DuckDB cannot hash
    MAP keys)."""
    eng, con, _ = qenv
    assert_matches_oracle(
        eng.sql(
            "SELECT xs, count(*) AS n FROM "
            "(SELECT array(key, '1') AS xs FROM src WHERE key < 5) "
            "GROUP BY xs"
        ),
        con,
        """
        SELECT [key, '1'] AS xs, CAST(count(*) AS BIGINT) AS n
        FROM src WHERE CAST(key AS DOUBLE) < 5 GROUP BY key
        """,
    )
    assert_matches_oracle(
        eng.sql(
            "SELECT count(*) AS n FROM "
            "(SELECT array(key) AS a FROM src WHERE key < 3) x "
            "JOIN (SELECT array(key) AS a FROM src WHERE key < 5) y "
            "ON x.a = y.a"
        ),
        con,
        """
        SELECT CAST(count(*) AS BIGINT) AS n FROM
        (SELECT [key] AS a FROM src WHERE CAST(key AS DOUBLE) < 3) x
        JOIN (SELECT [key] AS a FROM src WHERE CAST(key AS DOUBLE) < 5) y
        ON x.a = y.a
        """,
    )
    got = eng.sql(
        "SELECT m, count(*) AS n FROM "
        "(SELECT map('k', key) AS m FROM src WHERE key < 2) GROUP BY m "
    ).collect()
    # 500 rows over 83 keys → keys 0 and 1 appear 7 times each
    assert sorted((r.m["k"], r.n) for r in got) == [("0", 7), ("1", 7)]


def test_q_union_date_typed_branches(qenv):
    """union_date.q: UNION ALL across DATE-typed branches keeps the
    date type and values through the union."""
    eng, con, _ = qenv
    got = eng.sql(
        """
        SELECT d, count(*) AS n FROM (
          SELECT cast('2011-01-01' as date) AS d FROM src WHERE key < 3
          UNION ALL
          SELECT cast('2012-02-02' as date) AS d FROM src WHERE key < 2
        ) GROUP BY d ORDER BY d
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT d, CAST(count(*) AS BIGINT) AS n FROM (
          SELECT CAST('2011-01-01' AS DATE) AS d FROM src
          WHERE CAST(key AS DOUBLE) < 3
          UNION ALL
          SELECT CAST('2012-02-02' AS DATE) AS d FROM src
          WHERE CAST(key AS DOUBLE) < 2
        ) GROUP BY d ORDER BY d
        """,
    )
