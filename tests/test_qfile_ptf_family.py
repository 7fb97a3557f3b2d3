"""clientpositive ptf.q / ptf_streaming.q / ptf_register_tblfn.q replay
(reference: ql/src/test/queries/clientpositive/ptf.q — 23 numbered
shapes; ptf_streaming.q repeats them over noopstreaming;
ptf_register_tblfn.q registers MatchPath under a user name).

Hive's Noop family (udf/ptf/Noop.java, NoopWithMap.java,
NoopStreaming.java) are pass-through PTFs: row content is unchanged and
their partition/order clause only establishes PTF input ordering, which
matters solely for window specs that OMIT their own — every OVER clause
in these goldens is explicit, so the Spark-first translation is a plain
subquery (engine: Engine._rewrite_noop_ptf_calls). DuckDB oracles run
the same statements with the noop stripped.

The goldens' part table uses p_mfgr; the synthetic part has no p_mfgr,
so shapes run over p_brand (same convention as
test_qfile_windowing_clause.py). All golden files are
SORT_QUERY_RESULTS — assert_matches_oracle sorts both sides.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def qeng(spark, sf_dir):
    return Engine(spark=spark, sf_dir=sf_dir)


def _chk(qeng, oracle, hive_sql, duck_sql):
    assert_matches_oracle(qeng.sql(hive_sql), oracle, duck_sql)


# p_name has ties within p_brand in the synthetic data, so running
# ROWS frames tiebreak on p_partkey (the repo's windowing convention —
# Hive's goldens lean on their own stable file order instead).
WINDOWED = """
select p_brand, p_name, p_size,
rank() over (partition by p_brand order by p_name) as r,
dense_rank() over (partition by p_brand order by p_name) as dr,
round(sum(p_retailprice) over (partition by p_brand
  order by p_name, p_partkey
  rows between unbounded preceding and current row),2) as s1
from {src}
"""

WINDOWED_ORACLE = """
SELECT p_brand, p_name, p_size,
rank() OVER (PARTITION BY p_brand ORDER BY p_name NULLS FIRST) AS r,
dense_rank() OVER (PARTITION BY p_brand
  ORDER BY p_name NULLS FIRST) AS dr,
round(sum(p_retailprice) OVER (PARTITION BY p_brand
  ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS s1
FROM part
"""


def test_q_ptf_1_noop_with_windowing(qeng, oracle):
    """ptf.q test 1: rank/dense_rank/running sum over noop(on part)."""
    _chk(
        qeng, oracle,
        WINDOWED.format(
            src="noop(on part partition by p_brand order by p_name)"
        ),
        WINDOWED_ORACLE,
    )


def test_q_ptf_2_join_inside_noop_distribute_sort(qeng, oracle):
    """ptf.q test 2: subquery-join input with DISTRIBUTE BY/SORT BY
    spelling of the PTF spec."""
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name, p_size,
        p_size - lag(p_size,1,p_size) over (partition by p_brand
          order by p_name, p_partkey) as deltaSz
        from noop (on (select p1.* from part p1 join part p2
                       on p1.p_partkey = p2.p_partkey) j
        distribute by j.p_brand
        sort by j.p_name)
        """,
        """
        SELECT p_brand, p_name, p_size,
        p_size - lag(p_size,1,p_size) OVER (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST) AS deltaSz
        FROM (SELECT p1.* FROM part p1 JOIN part p2
              ON p1.p_partkey = p2.p_partkey) j
        """,
    )


def test_q_ptf_3_only_ptf(qeng, oracle):
    """ptf.q test 3: bare pass-through — row set unchanged."""
    _chk(
        qeng, oracle,
        "select p_brand, p_name, p_size from noop(on part "
        "partition by p_brand order by p_name)",
        "SELECT p_brand, p_name, p_size FROM part",
    )


def test_q_ptf_4_alias(qeng, oracle):
    """ptf.q test 4: explicit alias after the PTF call."""
    _chk(
        qeng, oracle,
        WINDOWED.format(
            src="noop(on part partition by p_brand order by p_name) abc"
        ),
        WINDOWED_ORACLE,
    )


def test_q_ptf_7_8_joins_left_and_right(qeng, oracle):
    """ptf.q tests 7+8: PTF output joined on either side."""
    _chk(
        qeng, oracle,
        """
        select abc.*
        from noop(on part partition by p_brand order by p_name) abc
        join part p1 on abc.p_partkey = p1.p_partkey
        """,
        "SELECT abc.* FROM part abc JOIN part p1 "
        "ON abc.p_partkey = p1.p_partkey",
    )
    _chk(
        qeng, oracle,
        """
        select abc.*
        from part p1 join noop(on part partition by p_brand
          order by p_name) abc on abc.p_partkey = p1.p_partkey
        """,
        "SELECT abc.* FROM part abc JOIN part p1 "
        "ON abc.p_partkey = p1.p_partkey",
    )


def test_q_ptf_9_noopwithmap(qeng, oracle):
    """ptf.q tests 9-10: noopwithmap is the same pass-through (the map
    phase is a Hive execution detail, not a semantic)."""
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name, p_size,
        rank() over (partition by p_brand order by p_name, p_size desc) as r
        from noopwithmap(on part
        partition by p_brand
        order by p_name, p_size desc)
        """,
        """
        SELECT p_brand, p_name, p_size,
        rank() OVER (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_size DESC NULLS LAST) AS r
        FROM part
        """,
    )


def test_q_ptf_12_function_chain(qeng, oracle):
    """ptf.q test 12: noop(on noopwithmap(on noop(on part ...)))."""
    _chk(
        qeng, oracle,
        WINDOWED.format(
            src="""noop(on noopwithmap(on noop(on part
            partition by p_brand
            order by p_brand DESC, p_name
            )))"""
        ),
        WINDOWED_ORACLE,
    )


def test_q_ptf_13_subquery_with_window_clause(qeng, oracle):
    """ptf.q test 13: PTF inside a subquery + named WINDOW clause."""
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name, sub1.cd, sub1.s1
        from (select p_brand, p_name,
        count(p_size) over (partition by p_brand order by p_name) as cd,
        p_retailprice,
        round(sum(p_retailprice) over w1,2) as s1
        from noop(on part partition by p_brand order by p_name)
        window w1 as (partition by p_brand order by p_name, p_partkey
          rows between 2 preceding and 2 following)
        ) sub1
        """,
        """
        SELECT p_brand, p_name, sub1.cd, sub1.s1
        FROM (SELECT p_brand, p_name,
        count(p_size) OVER (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST) AS cd,
        p_retailprice,
        round(sum(p_retailprice) OVER (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST
          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING),2) AS s1
        FROM part) sub1
        """,
    )


def test_q_ptf_14_join_with_distribute_sort_windows(qeng, oracle):
    """ptf.q test 14: PTF+join with DISTRIBUTE BY/SORT BY window
    spellings (rank/dense_rank/count/sum/lag in one select)."""
    _chk(
        qeng, oracle,
        """
        select abc.p_brand, abc.p_name,
        rank() over (distribute by abc.p_brand
          sort by abc.p_name, abc.p_partkey) as r,
        dense_rank() over (distribute by abc.p_brand
          sort by abc.p_name, abc.p_partkey) as dr,
        count(abc.p_name) over (distribute by abc.p_brand
          sort by abc.p_name, abc.p_partkey) as cd,
        abc.p_retailprice,
        round(sum(abc.p_retailprice) over (distribute by abc.p_brand
          sort by abc.p_name, abc.p_partkey
          rows between unbounded preceding and current row),2) as s1,
        abc.p_size,
        abc.p_size - lag(abc.p_size,1,abc.p_size) over (
          distribute by abc.p_brand
          sort by abc.p_name, abc.p_partkey) as deltaSz
        from noop(on part partition by p_brand order by p_name) abc
        join part p1 on abc.p_partkey = p1.p_partkey
        """,
        """
        SELECT abc.p_brand, abc.p_name,
        rank() OVER w AS r,
        dense_rank() OVER w AS dr,
        count(abc.p_name) OVER w AS cd,
        abc.p_retailprice,
        round(sum(abc.p_retailprice) OVER (PARTITION BY abc.p_brand
          ORDER BY abc.p_name NULLS FIRST, abc.p_partkey NULLS FIRST
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS s1,
        abc.p_size,
        abc.p_size - lag(abc.p_size,1,abc.p_size) OVER w AS deltaSz
        FROM part abc JOIN part p1 ON abc.p_partkey = p1.p_partkey
        WINDOW w AS (PARTITION BY abc.p_brand
          ORDER BY abc.p_name NULLS FIRST, abc.p_partkey NULLS FIRST)
        """,
    )


def test_q_ptf_15_distinct(qeng, oracle):
    """ptf.q test 15: SELECT DISTINCT over the PTF output."""
    _chk(
        qeng, oracle,
        "select DISTINCT p_brand, p_name, p_size from noop(on part "
        "partition by p_brand order by p_name)",
        "SELECT DISTINCT p_brand, p_name, p_size FROM part",
    )


def test_q_ptf_16_view_input(qeng, oracle):
    """ptf.q test 16: a VIEW as the PTF input."""
    qeng.sql(
        """
        create view IF NOT EXISTS mfgr_price_view_ptf as
        select p_brand, p_type,
        round(sum(p_retailprice),2) as s
        from part
        group by p_brand, p_type
        """
    )
    try:
        _chk(
            qeng, oracle,
            """
            select p_brand, p_type, s,
            round(sum(s) over w1,2) as s1
            from noop(on mfgr_price_view_ptf
            partition by p_brand
            order by p_brand)
            window w1 as (partition by p_brand order by p_type
              rows between 2 preceding and current row)
            """,
            """
            SELECT p_brand, p_type, s,
            round(sum(s) OVER (PARTITION BY p_brand
              ORDER BY p_type NULLS FIRST
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),2) AS s1
            FROM (SELECT p_brand, p_type, round(sum(p_retailprice),2) AS s
                  FROM part GROUP BY p_brand, p_type) v
            """,
        )
    finally:
        qeng.sql("drop view if exists mfgr_price_view_ptf")


def test_q_ptf_17_multi_insert_from_noop(qeng, oracle, spark, tmp_path):
    """ptf.q test 17: FROM noop(...) INSERT OVERWRITE t1 ... INSERT
    OVERWRITE t2 — the PTF feeds a multi-insert."""
    import os

    p4 = str(tmp_path / "part_4")
    p5 = str(tmp_path / "part_5")
    spark.createDataFrame(
        [], "p_brand string, p_name string, p_size int, r int, dr int, "
        "s double",
    ).write.parquet(p4)
    spark.createDataFrame(
        [], "p_brand string, p_name string, p_size int, s2 double, "
        "r int, dr int, cud double, fv1 int",
    ).write.parquet(p5)
    qeng.register_table("part_4", p4)
    qeng.register_table("part_5", p5)
    qeng.sql(
        """
        from noop(on part
        partition by p_brand
        order by p_name)
        INSERT OVERWRITE TABLE part_4 select p_brand, p_name, p_size,
        rank() over (distribute by p_brand sort by p_name, p_partkey) as r,
        dense_rank() over (distribute by p_brand
          sort by p_name, p_partkey) as dr,
        round(sum(p_retailprice) over (distribute by p_brand
          sort by p_name, p_partkey
          rows between unbounded preceding and current row),2) as s
        INSERT OVERWRITE TABLE part_5 select p_brand, p_name, p_size,
        round(sum(p_size) over (distribute by p_brand sort by p_size
          range between 5 preceding and current row),1) as s2,
        rank() over (distribute by p_brand
          sort by p_brand, p_name, p_partkey) as r,
        dense_rank() over (distribute by p_brand
          sort by p_brand, p_name, p_partkey) as dr,
        round(cume_dist() over (distribute by p_brand
          sort by p_brand, p_name, p_partkey), 6) as cud,
        first_value(p_size, true) over w1 as fv1
        window w1 as (distribute by p_brand
          sort by p_brand, p_name, p_partkey
          rows between 2 preceding and 2 following)
        """
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW part AS SELECT * FROM read_parquet("
        f"'{os.path.join(os.environ.get('SPARK_GRAFT_TEST_SF_DIR', '/root/testdata/sf0.01'), 'part.parquet')}')"
    )
    assert_matches_oracle(
        qeng.sql("select * from part_4"),
        con,
        """
        SELECT p_brand, p_name, p_size,
        rank() OVER w AS r, dense_rank() OVER w AS dr,
        round(sum(p_retailprice) OVER (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS s
        FROM part
        WINDOW w AS (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST)
        """,
    )
    assert_matches_oracle(
        qeng.sql("select * from part_5"),
        con,
        """
        SELECT p_brand, p_name, p_size,
        round(sum(p_size) OVER (PARTITION BY p_brand
          ORDER BY p_size NULLS FIRST
          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW),1) AS s2,
        rank() OVER w AS r, dense_rank() OVER w AS dr,
        round(cume_dist() OVER w, 6) AS cud,
        first_value(p_size IGNORE NULLS) OVER (PARTITION BY p_brand
          ORDER BY p_brand NULLS FIRST, p_name NULLS FIRST,
            p_partkey NULLS FIRST
          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS fv1
        FROM part
        WINDOW w AS (PARTITION BY p_brand
          ORDER BY p_brand NULLS FIRST, p_name NULLS FIRST,
            p_partkey NULLS FIRST)
        """,
    )
    con.close()


def test_q_ptf_19_multi3_chain(qeng, oracle):
    """ptf.q test 19: four-level noop chain with different specs per
    level — still a pass-through."""
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name,
        rank() over (partition by p_brand order by p_name, p_partkey) as r,
        dense_rank() over (partition by p_brand
          order by p_name, p_partkey) as dr,
        p_size, sum(p_size) over (partition by p_brand
          order by p_name, p_partkey
          rows between unbounded preceding and current row) as s1
        from noop(on
                noop(on
                  noop(on
                      noop(on part
                      partition by p_brand
                      order by p_brand)
                    )
                  partition by p_brand,p_name
                  order by p_brand,p_name)
                partition by p_brand
                order by p_brand )
        """,
        """
        SELECT p_brand, p_name,
        rank() OVER w AS r, dense_rank() OVER w AS dr,
        p_size, sum(p_size) OVER (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1
        FROM part
        WINDOW w AS (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST)
        """,
    )


def test_q_ptf_23_chain_no_spec_on_outer(qeng, oracle):
    """ptf.q test 23: outer chain links carry NO spec at all."""
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name,
        rank() over (partition by p_brand order by p_name, p_partkey) as r,
        p_size,
        sum(p_size) over (partition by p_brand order by p_name
          range between unbounded preceding and current row) as s1
        from noopwithmap(on
                noop(on
                      noop(on part
                      partition by p_brand, p_name
                      order by p_brand, p_name)
                  ))
        """,
        """
        SELECT p_brand, p_name,
        rank() OVER (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST) AS r,
        p_size,
        sum(p_size) OVER (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST
          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1
        FROM part
        """,
    )


def test_q_ptf_streaming_noopstreaming(qeng, oracle):
    """ptf_streaming.q test 1: noopstreaming — same pass-through (the
    streaming mode is a Hive memory-management detail)."""
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name, p_size,
        rank() over (partition by p_brand order by p_name) as r,
        round(sum(p_retailprice) over (partition by p_brand
          order by p_name, p_partkey
          rows between unbounded preceding and current row), 2) as s1
        from noopstreaming(on part
          partition by p_brand
          order by p_name)
        """,
        """
        SELECT p_brand, p_name, p_size,
        rank() OVER (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST) AS r,
        round(sum(p_retailprice) OVER (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS s1
        FROM part
        """,
    )


def test_q_ptf_register_tblfn_aliases(qeng, oracle):
    """ptf_register_tblfn.q: CREATE TEMPORARY FUNCTION under a user
    name resolving to a Hive PTF resolver class — the alias invokes the
    canonical rewrite; DROP unregisters it."""
    qeng.sql(
        "create temporary function mynoop as "
        "'org.apache.hadoop.hive.ql.udf.ptf.Noop$NoopResolver'"
    )
    try:
        _chk(
            qeng, oracle,
            "select p_brand, p_name, p_size from mynoop(on part "
            "partition by p_brand order by p_name)",
            "SELECT p_brand, p_name, p_size FROM part",
        )
    finally:
        qeng.sql("drop temporary function mynoop")
    assert "mynoop" not in qeng.ptf_aliases


def test_q_ptf_register_matchpath_alias(spark, tmp_path):
    """ptf_register_tblfn.q second half: MatchPath$MatchPathResolver
    under a user name drives the matchpath rewrite (flights_tiny
    shape: consecutive-late-flight paths per fl_num)."""
    eng = Engine(spark=spark)
    p = str(tmp_path / "flights_tiny")
    rows = [
        ("Baltimore", "New York", 2010, 10, d, float(delay), "1064")
        for d, delay in [(20, 30.0), (21, 40.0), (22, -10.0), (23, 50.0)]
    ] + [
        ("Chicago", "New York", 2010, 10, d, float(delay), "361")
        for d, delay in [(20, 20.0), (21, 25.0), (22, 30.0), (23, 5.0)]
    ]
    spark.createDataFrame(
        rows,
        "origin_city_name string, dest_city_name string, year int, "
        "month int, day_of_month int, arr_delay float, fl_num string",
    ).coalesce(1).write.parquet(p)
    eng.register_table("flights_tiny", p)
    eng.sql(
        "create temporary function matchpathtest as "
        "'org.apache.hadoop.hive.ql.udf.ptf.MatchPath$MatchPathResolver'"
    )
    try:
        got = eng.sql(
            """
            select origin_city_name, fl_num, year, month, day_of_month,
                   sz, tpath
            from matchpathtest(on
                    flights_tiny
                    distribute by fl_num
                    sort by year, month, day_of_month
                  arg1('LATE.LATE+'),
                  arg2('LATE'), arg3(arr_delay > 15),
                arg4('origin_city_name, fl_num, year, month, day_of_month,
                      size(tpath) as sz, tpath[0].day_of_month as tpath')
               )
            """
        ).collect()
        # fl_num 1064: LATE days 20,21 (22 breaks), then 23 alone (no
        # LATE+ continuation) → one match of length 2 starting day 20.
        # fl_num 361: days 20,21,22 all late → matches of len 3,2 from
        # days 20,21 (greedy LATE.LATE+ needs >=2).
        got_set = {
            (r.fl_num, r.day_of_month, r.sz, r.tpath) for r in got
        }
        assert ("1064", 20, 2, 20) in got_set
        assert ("361", 20, 3, 20) in got_set
    finally:
        eng.sql("drop temporary function matchpathtest")


def test_q_ptfgroupbyjoin_window_over_group_into_join(spark, tmp_path):
    """ptfgroupbyjoin.q: row_number over a GROUP BY subquery joined to
    a dim — the PTF sits between the aggregate and the join (Hive's
    HIVE-12504 shape); with and without projecting the window column."""
    eng = Engine(spark=spark)
    con = duckdb.connect()
    p1 = str(tmp_path / "tlb1")
    p2 = str(tmp_path / "tlb2")
    spark.createDataFrame(
        [(100, 1, "abc"), (200, 1, "efg")], "id int, fkey int, val string"
    ).coalesce(1).write.parquet(p1)
    spark.createDataFrame(
        [(1, "key1")], "fid int, name string"
    ).coalesce(1).write.parquet(p2)
    eng.register_table("tlb1", p1)
    eng.register_table("tlb2", p2)
    con.execute(
        f"CREATE VIEW tlb1 AS SELECT * FROM read_parquet('{p1}/*.parquet')"
    )
    con.execute(
        f"CREATE VIEW tlb2 AS SELECT * FROM read_parquet('{p2}/*.parquet')"
    )
    for proj_h, proj_d in (
        ("ddd.id, ddd.fkey, aaa.name", "ddd.id, ddd.fkey, aaa.name"),
        ("ddd.id, ddd.fkey, aaa.name, ddd.rnum",
         "ddd.id, ddd.fkey, aaa.name, ddd.rnum"),
    ):
        assert_matches_oracle(
            eng.sql(
                f"""
                select {proj_h}
                from (
                    select id, fkey,
                    row_number() over (partition by id, fkey) as rnum
                    from tlb1 group by id, fkey
                 ) ddd
                inner join tlb2 aaa on aaa.fid = ddd.fkey
                """
            ),
            con,
            f"""
            SELECT {proj_d}
            FROM (
                SELECT id, fkey,
                row_number() OVER (PARTITION BY id, fkey) AS rnum
                FROM tlb1 GROUP BY id, fkey
             ) ddd
            INNER JOIN tlb2 aaa ON aaa.fid = ddd.fkey
            """,
        )
    con.close()
