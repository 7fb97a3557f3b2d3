"""clientpositive `.q` slice, round 5 batch 6: the PTF invocation
syntax (ptf.q — `noop(on t partition by .. order by ..)`, Noop.java's
identity PTF), named WINDOW specs (windowing_windowspec.q), and
IN-subqueries inside HAVING (subquery_in_having.q). The noop PTF
rewrites to a DISTRIBUTE BY/SORT BY derived table; oracles run the
equivalent plain query in DuckDB."""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine
from hive_2_3_2_spark.catalog import load_table

from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.fixture(scope="module")
def qenv(spark):
    eng = Engine(spark=spark, sf_dir=SF_DIR)
    con = duckdb.connect()
    for t in ("part", "src_kv"):
        pass
    con.execute(
        "CREATE VIEW part AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/part.parquet')"
    )
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    )
    yield eng, con
    con.close()


def test_q_ptf_noop_windowing(qenv):
    """ptf.q shape 1: rank/dense_rank/running-sum OVER the output of
    noop(on part partition by .. order by ..) — the identity PTF must
    not change results; ordering keys are made total for the frame."""
    eng, con = qenv
    got = eng.sql(
        """
        select p_brand, p_name, p_size,
        rank() over (partition by p_brand order by p_name) as r,
        dense_rank() over (partition by p_brand order by p_name) as dr,
        round(sum(p_retailprice) over (partition by p_brand order by
          p_name, p_partkey rows between unbounded preceding and
          current row), 2) as s1
        from noop(on part
          partition by p_brand
          order by p_name)
        where p_size < 10
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT p_brand, p_name, p_size,
               CAST(rank() OVER (PARTITION BY p_brand ORDER BY p_name)
                    AS BIGINT) AS r,
               CAST(dense_rank() OVER (PARTITION BY p_brand
                    ORDER BY p_name) AS BIGINT) AS dr,
               ROUND(SUM(p_retailprice) OVER (PARTITION BY p_brand
                    ORDER BY p_name, p_partkey ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW), 2) AS s1
        FROM part WHERE p_size < 10
        """,
    )


def test_q_ptf_noop_on_subquery_with_lag(qenv):
    """ptf.q shape 2: noop over a JOINED subquery with DISTRIBUTE BY /
    SORT BY inside the PTF, lag() with a default above it."""
    eng, con = qenv
    got = eng.sql(
        """
        select p_brand, p_name, p_size,
               p_size - lag(p_size, 1, p_size) over
                 (partition by p_brand order by p_name, p_partkey)
                 as deltaSz
        from noop (on (select p1.* from part p1 join part p2
                       on p1.p_partkey = p2.p_partkey
                       where p1.p_size < 8) j
        distribute by j.p_brand
        sort by j.p_name)
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT p_brand, p_name, p_size,
               CAST(p_size - lag(p_size, 1, p_size) OVER
                 (PARTITION BY p_brand ORDER BY p_name, p_partkey)
                 AS INT) AS deltaSz
        FROM part WHERE p_size < 8
        """,
    )


def test_q_windowing_windowspec_named_window(qenv):
    """windowing_windowspec.q: the named WINDOW w1 AS (...) clause
    reused by two expressions, plus the bare 'rows unbounded preceding'
    frame shorthand."""
    eng, con = qenv
    got = eng.sql(
        """
        select p_brand,
               round((avg(p_retailprice) over w1 + 10.0)
                     - (avg(p_retailprice) over w1 - 10.0), 2) as spread,
               sum(p_size) over (partition by p_brand
                 order by p_name, p_partkey rows unbounded preceding)
                 as rs
        from part where p_size <= 5
        window w1 as (partition by p_brand order by p_name, p_partkey)
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT p_brand,
               ROUND((AVG(p_retailprice) OVER w1 + 10.0)
                     - (AVG(p_retailprice) OVER w1 - 10.0), 2) AS spread,
               SUM(p_size) OVER (PARTITION BY p_brand
                 ORDER BY p_name, p_partkey ROWS UNBOUNDED PRECEDING)
                 AS rs
        FROM part WHERE p_size <= 5
        WINDOW w1 AS (PARTITION BY p_brand ORDER BY p_name, p_partkey)
        """,
    )


def test_q_windowing_range_following_frame(qenv):
    """windowing_windowspec.q: RANGE BETWEEN CURRENT ROW AND UNBOUNDED
    FOLLOWING — the reverse-cumulative frame."""
    eng, con = qenv
    got = eng.sql(
        """
        select p_partkey,
               round(sum(p_retailprice) over (partition by p_brand
                 order by p_retailprice range between current row and
                 unbounded following), 2) as tail_sum
        from part where p_size = 1
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT p_partkey,
               ROUND(SUM(p_retailprice) OVER (PARTITION BY p_brand
                 ORDER BY p_retailprice RANGE BETWEEN CURRENT ROW AND
                 UNBOUNDED FOLLOWING), 2) AS tail_sum
        FROM part WHERE p_size = 1
        """,
    )


def test_q_subquery_in_having(qenv):
    """subquery_in_having.q: HAVING <aggregate> IN (grouped subquery)
    and HAVING <group key> IN (grouped subquery) — both decorrelated
    through the aggregate."""
    eng, con = qenv
    got = eng.sql(
        """
        select o_custkey, count(*) as n
        from orders
        group by o_custkey
        having count(*) in (select count(*) from orders s1
                            where s1.o_custkey < 50
                            group by s1.o_custkey)
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY o_custkey
        HAVING count(*) IN (SELECT count(*) FROM orders s1
                            WHERE s1.o_custkey < 50
                            GROUP BY s1.o_custkey)
        """,
    )
    got = eng.sql(
        """
        select o_orderpriority, round(avg(o_totalprice), 2) as avg_price
        from orders b
        group by b.o_orderpriority
        having b.o_orderpriority in
           (select o_orderpriority from orders
            group by o_orderpriority having count(*) > 10)
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT o_orderpriority, ROUND(AVG(o_totalprice), 2) AS avg_price
        FROM orders GROUP BY o_orderpriority
        HAVING o_orderpriority IN
           (SELECT o_orderpriority FROM orders
            GROUP BY o_orderpriority HAVING count(*) > 10)
        """,
    )


def test_q_ptf_noop_streaming_variants(qenv):
    """ptf_streaming.q: the four identity PTFs (Noop, NoopWithMap,
    NoopStreaming, NoopWithMapStreaming — FunctionRegistry.java:517-520)
    all pass the partitioned input through unchanged."""
    eng, con = qenv
    expected = """
        SELECT p_brand, CAST(count(*) AS BIGINT) AS n FROM part
        WHERE p_size = 2 GROUP BY p_brand ORDER BY p_brand
    """
    for fn in ("noop", "noopwithmap", "noopstreaming",
               "noopwithmapstreaming"):
        got = eng.sql(
            f"""
            select p_brand, count(*) as n
            from {fn}(on part partition by p_brand order by p_name)
            where p_size = 2
            group by p_brand order by p_brand
            """
        )
        assert_matches_oracle(got, con, expected)


def test_q_ptf_matchpath_sql_invocation(spark):
    """ptf_matchpath.q: the MatchPath PTF through its SQL invocation
    syntax (udf/ptf/MatchPath.java) — LATE.LATE+ over per-flight
    day-ordered rows, Hive's anchored-at-every-row semantics (each
    suffix of a streak emits its own path: the golden's sz sequence
    6,5,4,3,2), with size(tpath) and tpath[0].day_of_month results."""
    from hive_2_3_2_spark.engine import Engine

    eng = Engine(spark=spark)
    rows = []
    # fl 1142: late on days 20..25 (6-streak) among 18..26
    for dom in range(18, 27):
        rows.append(("Baltimore", "NYC", 2010, 10, dom,
                     40.0 if 20 <= dom <= 25 else 2.0, "1142"))
    # fl 1599: late 21-22 and 25-26-27
    for dom in range(20, 28):
        rows.append(("Baltimore", "SFO", 2010, 10, dom,
                     30.0 if dom in (21, 22, 25, 26, 27) else 1.0, "1599"))
    df = spark.createDataFrame(
        rows,
        "origin_city_name string, dest_city_name string, year int, "
        "month int, day_of_month int, arr_delay float, fl_num string",
    )
    df.createOrReplaceTempView("flights_tiny")
    got = eng.sql(
        """
        select origin_city_name, fl_num, year, month, day_of_month, sz,
               tpath
        from matchpath(on
                flights_tiny
                distribute by fl_num
                sort by year, month, day_of_month
              arg1('LATE.LATE+'),
              arg2('LATE'), arg3(arr_delay > 15),
            arg4('origin_city_name, fl_num, year, month, day_of_month,
                  size(tpath) as sz, tpath[0].day_of_month as tpath')
           )
        """
    )
    out = sorted(
        (r.fl_num, r.day_of_month, r.sz, r.tpath) for r in got.collect()
    )
    assert out == [
        ("1142", 20, 6, 20), ("1142", 21, 5, 21), ("1142", 22, 4, 22),
        ("1142", 23, 3, 23), ("1142", 24, 2, 24),
        ("1599", 21, 2, 21), ("1599", 25, 3, 25), ("1599", 26, 2, 26),
    ]
    assert all(r.origin_city_name == "Baltimore" for r in got.collect())
    spark.catalog.dropTempView("flights_tiny")


def test_q_windowing_navfn_battery(qenv):
    """windowing_navfn.q: first_value / last_value under the DEFAULT
    frame (RANGE UNBOUNDED PRECEDING..CURRENT ROW — last_value is the
    current row, ties included), lead/lag at partition edges (NULL),
    all value-diffed with total orders."""
    eng, con = qenv
    got = eng.sql(
        """
        select p_partkey,
               first_value(p_name) over
                 (partition by p_brand order by p_partkey) AS fv,
               last_value(p_name) over
                 (partition by p_brand order by p_partkey) AS lv,
               lead(p_size) over
                 (partition by p_brand order by p_partkey) AS ld,
               lag(p_size) over
                 (partition by p_brand order by p_partkey) AS lg
        from part where p_size <= 3
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT p_partkey,
               first_value(p_name) OVER
                 (PARTITION BY p_brand ORDER BY p_partkey) AS fv,
               last_value(p_name) OVER
                 (PARTITION BY p_brand ORDER BY p_partkey
                  RANGE UNBOUNDED PRECEDING) AS lv,
               lead(p_size) OVER
                 (PARTITION BY p_brand ORDER BY p_partkey) AS ld,
               lag(p_size) OVER
                 (PARTITION BY p_brand ORDER BY p_partkey) AS lg
        FROM part WHERE p_size <= 3
        """,
    )


def test_q_windowing_ntile(qenv):
    """windowing_ntile.q: ntile over totally-ordered partitions — the
    uneven-bucket distribution rule (first buckets get the extra rows)
    must agree across engines."""
    eng, con = qenv
    got = eng.sql(
        """
        select p_partkey,
               ntile(4) over (partition by p_brand order by p_partkey)
                 AS nt
        from part where p_size <= 4
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT p_partkey,
               CAST(ntile(4) OVER (PARTITION BY p_brand
                 ORDER BY p_partkey) AS BIGINT) AS nt
        FROM part WHERE p_size <= 4
        """,
    )


def test_q_row_number_over_empty_window(qenv):
    """windowing_navfn.q line 1: row_number() OVER () — Hive permits an
    unordered global window (numbering is arbitrary but the SET must be
    exactly 1..N)."""
    eng, _ = qenv
    rows = eng.sql(
        "select row_number() over () AS rn from part where p_size = 1"
    ).collect()
    n = len(rows)
    assert n > 0
    assert sorted(r.rn for r in rows) == list(range(1, n + 1))
