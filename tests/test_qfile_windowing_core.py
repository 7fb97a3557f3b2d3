"""windowing.q core battery, rounds 9-10 (reference:
ql/src/test/queries/clientpositive/windowing.q — now the WHOLE file:
tests 2-6, 15-21, 27-30 (r9), tests 7-14 and 22-26 (r10: join+PTF
input, first/last_value, named-window reuse, view inputs both ways,
lateral views, the 3-sink windowed multi-insert, group-by+having);
31-34 were replayed in test_qfile_windowing_clause).

Conventions: goldens use p_mfgr (absent in the synthetic part) → shapes
run over p_brand; ROWS frames and navigation functions tiebreak on
p_partkey (the goldens lean on Hive's stable file order); Hive's
stddev/variance are POPULATION forms (GenericUDAFStd — the engine
rewrites them), so oracles use stddev_pop/var_pop; default (no frame)
specs keep the goldens' tied sort keys because RANGE peer-group frames
are tie-insensitive."""

from __future__ import annotations

import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def qeng(spark, sf_dir):
    return Engine(spark=spark, sf_dir=sf_dir)


def _chk(qeng, oracle, hive_sql, duck_sql):
    assert_matches_oracle(qeng.sql(hive_sql), oracle, duck_sql)


def test_q_windowing_2_3_group_by_with_windowing(qeng, oracle):
    """windowing.q tests 2+3: GROUP BY + plain min() + rank/dense_rank/
    lag over the GROUPED rows, then the HAVING variant."""
    for having, oracle_where in (("", ""), ("having p_size > 0",
                                            "WHERE p_size > 0")):
        _chk(
            qeng, oracle,
            f"""
            select p_brand, p_name, p_size,
            min(p_retailprice) as mi,
            rank() over(distribute by p_brand sort by p_name, p_size) as r,
            dense_rank() over(distribute by p_brand
              sort by p_name, p_size) as dr,
            p_size - lag(p_size,1,p_size) over(distribute by p_brand
              sort by p_name, p_size) as deltaSz
            from part
            group by p_brand, p_name, p_size
            {having}
            """,
            f"""
            SELECT p_brand, p_name, p_size,
            min(p_retailprice) AS mi,
            rank() OVER w AS r,
            dense_rank() OVER w AS dr,
            p_size - lag(p_size,1,p_size) OVER w AS deltaSz
            FROM (SELECT p_brand, p_name, p_size,
                         min(p_retailprice) AS p_retailprice
                  FROM part GROUP BY p_brand, p_name, p_size) g
            {oracle_where}
            GROUP BY p_brand, p_name, p_size, p_retailprice
            WINDOW w AS (PARTITION BY p_brand
              ORDER BY p_name NULLS FIRST, p_size NULLS FIRST)
            """,
        )


def test_q_windowing_5_6_count_battery_and_subquery(qeng, oracle):
    """windowing.q tests 4-6: count over a window mixed with
    rank/sum/lag, plain and wrapped in a subquery projecting only the
    windowed columns."""
    inner_hive = """
    select p_brand, p_name,
    rank() over(distribute by p_brand sort by p_name, p_partkey) as r,
    dense_rank() over(distribute by p_brand
      sort by p_name, p_partkey) as dr,
    count(p_size) over(distribute by p_brand
      sort by p_name, p_partkey) as cd,
    p_retailprice,
    round(sum(p_retailprice) over (distribute by p_brand
      sort by p_name, p_partkey
      rows between unbounded preceding and current row),2) as s1,
    p_size, p_size - lag(p_size,1,p_size) over(distribute by p_brand
      sort by p_name, p_partkey) as deltaSz
    from part
    """
    inner_duck = """
    SELECT p_brand, p_name,
    rank() OVER w AS r, dense_rank() OVER w AS dr,
    count(p_size) OVER w AS cd,
    p_retailprice,
    round(sum(p_retailprice) OVER (PARTITION BY p_brand
      ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS s1,
    p_size, p_size - lag(p_size,1,p_size) OVER w AS deltaSz
    FROM part
    WINDOW w AS (PARTITION BY p_brand
      ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST)
    """
    _chk(qeng, oracle, inner_hive, inner_duck)
    _chk(
        qeng, oracle,
        "select sub1.r, sub1.dr, sub1.cd, sub1.s1, sub1.deltaSz from ("
        + inner_hive + ") sub1",
        "SELECT sub1.r, sub1.dr, sub1.cd, sub1.s1, sub1.deltaSz FROM ("
        + inner_duck + ") sub1",
    )


def test_q_windowing_15_expressions_battery(qeng, oracle):
    """windowing.q test 15: the full ranking/statistics expression
    battery in ONE select — cume_dist, percent_rank, ntile, count, avg,
    stddev (POPULATION in Hive), first_value of an expression,
    last_value, plus a named ROWS window."""
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name, p_size,
        rank() over(distribute by p_brand sort by p_name) as r,
        dense_rank() over(distribute by p_brand sort by p_name) as dr,
        round(cume_dist() over(distribute by p_brand
          sort by p_name),5) as cud,
        round(percent_rank() over(distribute by p_brand
          sort by p_name),5) as pr,
        ntile(3) over(distribute by p_brand
          sort by p_name, p_partkey) as nt,
        count(p_size) over(distribute by p_brand sort by p_name) as ca,
        round(avg(p_size) over(distribute by p_brand
          sort by p_name),5) as avg,
        round(stddev(p_size) over(distribute by p_brand
          sort by p_name),5) as st,
        first_value(p_size % 5) over(distribute by p_brand
          sort by p_name, p_partkey) as fv,
        last_value(p_size) over(distribute by p_brand
          sort by p_name, p_partkey) as lv,
        first_value(p_size) over w1 as fvW1
        from part
        window w1 as (distribute by p_brand
          sort by p_brand, p_name, p_partkey
          rows between 2 preceding and 2 following)
        """,
        """
        SELECT p_brand, p_name, p_size,
        rank() OVER w AS r,
        dense_rank() OVER w AS dr,
        round(cume_dist() OVER w,5) AS cud,
        round(percent_rank() OVER w,5) AS pr,
        ntile(3) OVER wt AS nt,
        count(p_size) OVER w AS ca,
        round(avg(p_size) OVER w,5) AS avg,
        round(stddev_pop(p_size) OVER w,5) AS st,
        first_value(p_size % 5) OVER wt AS fv,
        last_value(p_size) OVER (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST
          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv,
        first_value(p_size) OVER (PARTITION BY p_brand
          ORDER BY p_brand NULLS FIRST, p_name NULLS FIRST,
            p_partkey NULLS FIRST
          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS fvW1
        FROM part
        WINDOW w AS (PARTITION BY p_brand ORDER BY p_name NULLS FIRST),
               wt AS (PARTITION BY p_brand
                 ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST)
        """,
    )


def test_q_windowing_16_27_multiple_range_windows(qeng, oracle):
    """windowing.q tests 16+27: several VALUE-RANGE frames over
    different sort columns in one select (range 5/10 preceding over
    p_size, both frame directions) beside a named ROWS window."""
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name, p_size,
        sum(p_size) over (distribute by p_brand sort by p_name
          range between unbounded preceding and current row) as s1,
        sum(p_size) over (distribute by p_brand sort by p_size
          range between 5 preceding and current row) as s2,
        sum(p_size) over (distribute by p_brand sort by p_size
          range between 10 preceding and current row) as s3,
        sum(p_size) over (distribute by p_brand sort by p_size
          range between current row and 10 following) as s4
        from part
        """,
        """
        SELECT p_brand, p_name, p_size,
        sum(p_size) OVER (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST
          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1,
        sum(p_size) OVER ws5 AS s2,
        sum(p_size) OVER (PARTITION BY p_brand
          ORDER BY p_size NULLS FIRST
          RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS s3,
        sum(p_size) OVER (PARTITION BY p_brand
          ORDER BY p_size NULLS FIRST
          RANGE BETWEEN CURRENT ROW AND 10 FOLLOWING) AS s4
        FROM part
        WINDOW ws5 AS (PARTITION BY p_brand ORDER BY p_size NULLS FIRST
          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
        """,
    )


def test_q_windowing_17_count_star(qeng, oracle):
    """windowing.q test 17: count(*) vs count(col) over the same
    default peer-group frame."""
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name, p_size,
        count(*) over(distribute by p_brand sort by p_name) as c,
        count(p_size) over(distribute by p_brand sort by p_name) as ca
        from part
        """,
        """
        SELECT p_brand, p_name, p_size,
        count(*) OVER w AS c,
        count(p_size) OVER w AS ca
        FROM part
        WINDOW w AS (PARTITION BY p_brand ORDER BY p_name NULLS FIRST)
        """,
    )


def test_q_windowing_18_19_udafs_with_and_without_gby(qeng, oracle):
    """windowing.q tests 18+19: sum/min/max/avg over one named ROWS
    window; then the GROUP BY variant mixing PLAIN min/max aggregates
    with windowed sum/avg over the grouped rows."""
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name, p_size,
        sum(p_retailprice) over w1 as s,
        min(p_retailprice) over w1 as mi,
        max(p_retailprice) over w1 as ma,
        avg(p_retailprice) over w1 as ag
        from part
        window w1 as (distribute by p_brand
          sort by p_brand, p_name, p_partkey
          rows between 2 preceding and 2 following)
        """,
        """
        SELECT p_brand, p_name, p_size,
        sum(p_retailprice) OVER w1 AS s,
        min(p_retailprice) OVER w1 AS mi,
        max(p_retailprice) OVER w1 AS ma,
        avg(p_retailprice) OVER w1 AS ag
        FROM part
        WINDOW w1 AS (PARTITION BY p_brand
          ORDER BY p_brand NULLS FIRST, p_name NULLS FIRST,
            p_partkey NULLS FIRST
          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        """,
    )
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name, p_size, p_retailprice,
        sum(p_retailprice) over w1 as s,
        min(p_retailprice) as mi,
        max(p_retailprice) as ma,
        avg(p_retailprice) over w1 as ag
        from part
        group by p_brand, p_name, p_size, p_retailprice
        window w1 as (distribute by p_brand
          sort by p_brand, p_name, p_retailprice, p_size
          rows between 2 preceding and 2 following)
        """,
        """
        SELECT p_brand, p_name, p_size, p_retailprice,
        sum(p_retailprice) OVER w1 AS s,
        p_retailprice AS mi,
        p_retailprice AS ma,
        avg(p_retailprice) OVER w1 AS ag
        FROM (SELECT DISTINCT p_brand, p_name, p_size, p_retailprice
              FROM part) g
        WINDOW w1 AS (PARTITION BY p_brand
          ORDER BY p_brand NULLS FIRST, p_name NULLS FIRST,
            p_retailprice NULLS FIRST, p_size NULLS FIRST
          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        """,
    )


def test_q_windowing_20_stats_battery(qeng, oracle):
    """windowing.q test 20: stddev (POP in Hive), stddev_pop,
    collect_set (order-canonicalized via sort_array), variance (POP),
    corr and covar_pop over one ROWS frame."""
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name, p_size,
        stddev(p_retailprice) over w1 as sdev,
        stddev_pop(p_retailprice) over w1 as sdev_pop,
        sort_array(collect_set(p_size) over w1) as uniq_size,
        -- variance of 2-decimal prices is an exact rational on the
        -- 1e-4/n^2 lattice whose decimal often ENDS in 5 — a
        -- float-compare boundary; scale to the lattice integer instead
        cast(round(variance(p_retailprice) over w1 * 36000000, 0)
          as bigint) as var,
        corr(p_size, p_retailprice) over w1 as cor,
        covar_pop(p_size, p_retailprice) over w1 as covarp
        from part
        window w1 as (distribute by p_brand
          sort by p_brand, p_name, p_partkey
          rows between 2 preceding and 2 following)
        """,
        """
        SELECT p_brand, p_name, p_size,
        stddev_pop(p_retailprice) OVER w1 AS sdev,
        stddev_pop(p_retailprice) OVER w1 AS sdev_pop,
        list_sort(list_distinct(list(p_size) OVER w1)) AS uniq_size,
        CAST(round(var_pop(p_retailprice) OVER w1 * 36000000, 0)
          AS BIGINT) AS var,
        corr(p_size, p_retailprice) OVER w1 AS cor,
        covar_pop(p_size, p_retailprice) OVER w1 AS covarp
        FROM part
        WINDOW w1 AS (PARTITION BY p_brand
          ORDER BY p_brand NULLS FIRST, p_name NULLS FIRST,
            p_partkey NULLS FIRST
          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        """,
    )


def test_q_windowing_21_dists_percentile_row_number(qeng, oracle):
    """windowing.q test 21: percentile over a ROWS frame beside
    row_number (histogram_numeric's bin centroids are
    estimator-specific — Hive's own goldens mask them)."""
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name, p_size,
        round(percentile(p_partkey, 0.5) over w1, 4) as per,
        row_number() over(distribute by p_brand
          sort by p_brand, p_name, p_partkey) as rn
        from part
        window w1 as (distribute by p_brand
          sort by p_brand, p_name, p_partkey
          rows between 2 preceding and 2 following)
        """,
        """
        SELECT p_brand, p_name, p_size,
        round(quantile_cont(p_partkey, 0.5) OVER w1, 4) AS per,
        row_number() OVER (PARTITION BY p_brand
          ORDER BY p_brand NULLS FIRST, p_name NULLS FIRST,
            p_partkey NULLS FIRST) AS rn
        FROM part
        WINDOW w1 AS (PARTITION BY p_brand
          ORDER BY p_brand NULLS FIRST, p_name NULLS FIRST,
            p_partkey NULLS FIRST
          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        """,
    )


def test_q_windowing_28_29_30_partitioning_spec_rules(qeng, oracle):
    """windowing.q tests 28-30: PARTITION BY/ORDER BY inside the UDAF
    invocation, inside a window DEF, and the default-partitioning rule
    (one window with a frame, one without, in the same select)."""
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name, p_size,
        sum(p_size) over (partition by p_brand order by p_name, p_partkey
          rows between 2 preceding and 2 following) as s
        from part
        """,
        """
        SELECT p_brand, p_name, p_size,
        sum(p_size) OVER (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST
          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS s
        FROM part
        """,
    )
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name, p_size,
        sum(p_size) over w1 as s,
        sum(p_size) over w2 as s2
        from part
        window w1 as (distribute by p_brand sort by p_name, p_partkey
          rows between 2 preceding and 2 following),
          w2 as (partition by p_brand order by p_name)
        """,
        """
        SELECT p_brand, p_name, p_size,
        sum(p_size) OVER (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST
          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS s,
        sum(p_size) OVER (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST
          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s2
        FROM part
        """,
    )


def test_q_windowing_7_join_with_windowing_and_ptf(qeng, oracle):
    """windowing.q test 7 (testJoinWithWindowingAndPTF): windowing over
    the JOIN of a noop PTF chain with the base table — the PTF reduces
    to a clustered subquery, the join keys on p_partkey, and the window
    functions re-declare their partitioning above it."""
    _chk(
        qeng, oracle,
        """
        select abc.p_brand, abc.p_name,
        rank() over(distribute by abc.p_brand
          sort by abc.p_name, abc.p_partkey) as r,
        dense_rank() over(distribute by abc.p_brand
          sort by abc.p_name, abc.p_partkey) as dr,
        abc.p_retailprice,
        round(sum(abc.p_retailprice) over (distribute by abc.p_brand
          sort by abc.p_name, abc.p_partkey
          rows between unbounded preceding and current row),2) as s1,
        abc.p_size,
        abc.p_size - lag(abc.p_size,1,abc.p_size) over(
          distribute by abc.p_brand
          sort by abc.p_name, abc.p_partkey) as deltaSz
        from noop(on part
        partition by p_brand
        order by p_name
        ) abc join part p1 on abc.p_partkey = p1.p_partkey
        """,
        """
        SELECT abc.p_brand, abc.p_name,
        rank() OVER w AS r,
        dense_rank() OVER w AS dr,
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


def test_q_windowing_8_mixed_case_alias(qeng, oracle):
    """windowing.q test 8 (testMixedCaseAlias): an upper-case window
    alias survives (Hive lower-cases resolution, keeps the spelling)."""
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name, p_size,
        rank() over(distribute by p_brand
          sort by p_name, p_size desc) as R
        from part
        """,
        """
        SELECT p_brand, p_name, p_size,
        rank() OVER (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_size DESC NULLS LAST) AS R
        FROM part
        """,
    )


def test_q_windowing_9_10_having_no_gby_forms(qeng, oracle):
    """windowing.q tests 9+10 (testHavingWithWindowing*NoGBY): the
    goldens' HAVING-less spellings — rank/dense_rank + a running sum
    over the same clustered sort."""
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name, p_size,
        rank() over(distribute by p_brand
          sort by p_name, p_partkey) as r,
        dense_rank() over(distribute by p_brand
          sort by p_name, p_partkey) as dr,
        round(sum(p_retailprice) over (distribute by p_brand
          sort by p_name, p_partkey
          rows between unbounded preceding and current row),2) as s1
        from part
        """,
        """
        SELECT p_brand, p_name, p_size,
        rank() OVER w AS r,
        dense_rank() OVER w AS dr,
        round(sum(p_retailprice) OVER (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS s1
        FROM part
        WINDOW w AS (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST)
        """,
    )


def test_q_windowing_11_12_first_last(qeng, oracle):
    """windowing.q tests 11+12 (testFirstLast, testFirstLastWithWhere):
    first_value/last_value over a named ±2 ROWS window (the 2-arg
    last_value(x, false) = don't skip nulls, Spark/Duck default), a
    current-row-only sum, plus the WHERE-filtered variant."""
    for where_h, where_d in (
        ("", ""),
        ("where p_brand = (select min(p_brand) from part)",
         "WHERE p_brand = (SELECT min(p_brand) FROM part)"),
    ):
        _chk(
            qeng, oracle,
            f"""
            select p_brand, p_name, p_size,
            sum(p_size) over (distribute by p_brand
              sort by p_name, p_partkey
              rows between current row and current row) as s2,
            first_value(p_size) over w1 as f,
            last_value(p_size, false) over w1 as l
            from part
            {where_h}
            window w1 as (distribute by p_brand
              sort by p_name, p_partkey
              rows between 2 preceding and 2 following)
            """,
            f"""
            SELECT p_brand, p_name, p_size,
            sum(p_size) OVER (PARTITION BY p_brand
              ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST
              ROWS BETWEEN CURRENT ROW AND CURRENT ROW) AS s2,
            first_value(p_size) OVER w1 AS f,
            last_value(p_size) OVER w1 AS l
            FROM part
            {where_d}
            WINDOW w1 AS (PARTITION BY p_brand
              ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST
              ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
            """,
        )


def test_q_windowing_13_14_sum_window_and_unused_window_clause(
    qeng, oracle
):
    """windowing.q tests 13+14 (testSumWindow, testNoSortClause): two
    sums over different frames; then rank/dense_rank with a WINDOW
    clause nothing references (must parse and be ignored)."""
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name, p_size,
        sum(p_size) over w1 as s1,
        sum(p_size) over (distribute by p_brand
          sort by p_name, p_partkey
          rows between current row and current row) as s2
        from part
        window w1 as (distribute by p_brand sort by p_name, p_partkey
          rows between 2 preceding and 2 following)
        """,
        """
        SELECT p_brand, p_name, p_size,
        sum(p_size) OVER w1 AS s1,
        sum(p_size) OVER (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST
          ROWS BETWEEN CURRENT ROW AND CURRENT ROW) AS s2
        FROM part
        WINDOW w1 AS (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST
          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        """,
    )
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name, p_size,
        rank() over(distribute by p_brand sort by p_name, p_partkey)
          as r,
        dense_rank() over(distribute by p_brand
          sort by p_name, p_partkey) as dr
        from part
        window w1 as (distribute by p_brand sort by p_name
          rows between 2 preceding and 2 following)
        """,
        """
        SELECT p_brand, p_name, p_size,
        rank() OVER w AS r, dense_rank() OVER w AS dr
        FROM part
        WINDOW w AS (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST)
        """,
    )


def test_q_windowing_22_view_as_table_input(qeng, oracle):
    """windowing.q test 22 (testViewAsTableInputWithWindowing): a
    GROUP-BY view consumed by windowed selects — whole-partition sum
    (sort key = partition key → every row is a peer) and a ±2 ROWS
    frame over the view's aggregate."""
    qeng.sql("drop view if exists mfgr_price_view")
    qeng.sql(
        """
        create view IF NOT EXISTS mfgr_price_view as
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
            select *
            from (
            select p_brand, p_type, s,
            round(sum(s) over w1 , 2) as s1
            from mfgr_price_view
            window w1 as (distribute by p_brand sort by p_brand)
            ) sq
            order by p_brand, p_type
            """,
            """
            SELECT * FROM (
            SELECT p_brand, p_type, s,
            round(sum(s) OVER (PARTITION BY p_brand), 2) AS s1
            FROM (SELECT p_brand, p_type,
                  round(sum(p_retailprice),2) AS s
                  FROM part GROUP BY p_brand, p_type) v
            ) sq ORDER BY p_brand, p_type
            """,
        )
        _chk(
            qeng, oracle,
            """
            select p_brand, p_type, s,
            round(sum(s) over w1 ,2) as s1
            from mfgr_price_view
            window w1 as (distribute by p_brand sort by p_type
              rows between 2 preceding and current row)
            """,
            """
            SELECT p_brand, p_type, s,
            round(sum(s) OVER (PARTITION BY p_brand
              ORDER BY p_type NULLS FIRST
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),2) AS s1
            FROM (SELECT p_brand, p_type,
                  round(sum(p_retailprice),2) AS s
                  FROM part GROUP BY p_brand, p_type) v
            """,
        )
    finally:
        qeng.sql("drop view if exists mfgr_price_view")


def test_q_windowing_23_create_view_with_windowing_query(qeng, oracle):
    """windowing.q test 23 (testCreateViewWithWindowingQuery): the
    window spec lives INSIDE the view definition."""
    qeng.sql("drop view if exists mfgr_brand_price_view")
    qeng.sql(
        """
        create view IF NOT EXISTS mfgr_brand_price_view as
        select p_brand, p_type,
        round(sum(p_retailprice) over w1,2) as s
        from part
        window w1 as (distribute by p_brand sort by p_name, p_partkey
          rows between 2 preceding and current row)
        """
    )
    try:
        _chk(
            qeng, oracle,
            "select * from mfgr_brand_price_view",
            """
            SELECT p_brand, p_type,
            round(sum(p_retailprice) OVER (PARTITION BY p_brand
              ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),2) AS s
            FROM part
            """,
        )
    finally:
        qeng.sql("drop view if exists mfgr_brand_price_view")


def test_q_windowing_24_lateral_views(qeng, oracle):
    """windowing.q test 24 (testLateralViews): LATERAL VIEW explode
    feeding a windowed sum whose sort includes the exploded column."""
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name,
        lv_col, p_size, sum(p_size) over w1 as s
        from (select p_brand, p_name, p_partkey, p_size,
              array(1,2,3) arr from part) p
        lateral view explode(arr) part_lv as lv_col
        window w1 as (distribute by p_brand
          sort by p_size, p_partkey, lv_col
          rows between 2 preceding and current row)
        """,
        """
        SELECT p_brand, p_name, lv_col, p_size,
        sum(p_size) OVER (PARTITION BY p_brand
          ORDER BY p_size NULLS FIRST, p_partkey NULLS FIRST,
                   lv_col NULLS FIRST
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s
        FROM (SELECT p_brand, p_name, p_partkey, p_size,
              unnest([1,2,3]) AS lv_col FROM part) p
        """,
    )


def test_q_windowing_25_multi_insert_three_swqs(qeng, oracle, spark):
    """windowing.q test 25 (testMultipleInserts3SWQs): a FROM-first
    multi-insert whose three sinks each carry their own windowed
    select (incl. a WINDOW clause per branch and an INT column
    truncating cume_dist — Hive's implicit insert cast)."""
    for t in ("part_w1", "part_w2", "part_w3"):
        qeng.sql(f"drop table if exists {t}")
    qeng.sql("CREATE TABLE part_w1(p_brand STRING, p_name STRING, "
             "p_size INT, r INT, dr INT, s DOUBLE)")
    qeng.sql("CREATE TABLE part_w2(p_brand STRING, p_name STRING, "
             "p_size INT, r INT, dr INT, cud INT, s2 DOUBLE, fv1 INT)")
    qeng.sql("CREATE TABLE part_w3(p_brand STRING, p_name STRING, "
             "p_size INT, c INT, ca INT, fv INT)")
    try:
        qeng.sql(
            """
            from part
            INSERT OVERWRITE TABLE part_w1
            select p_brand, p_name, p_size,
            rank() over(distribute by p_brand
              sort by p_name, p_partkey) as r,
            dense_rank() over(distribute by p_brand
              sort by p_name, p_partkey) as dr,
            round(sum(p_retailprice) over (distribute by p_brand
              sort by p_name, p_partkey
              rows between unbounded preceding and current row),2) as s
            INSERT OVERWRITE TABLE part_w2
            select p_brand, p_name, p_size,
            rank() over(distribute by p_brand
              sort by p_name, p_partkey) as r,
            dense_rank() over(distribute by p_brand
              sort by p_name, p_partkey) as dr,
            cume_dist() over(distribute by p_brand
              sort by p_name, p_partkey) as cud,
            round(sum(p_size) over (distribute by p_brand sort by p_size
              range between 5 preceding and current row),1) as s2,
            first_value(p_size) over w1 as fv1
            window w1 as (distribute by p_brand
              sort by p_brand, p_name, p_partkey
              rows between 2 preceding and 2 following)
            INSERT OVERWRITE TABLE part_w3
            select p_brand, p_name, p_size,
            count(*) over(distribute by p_brand
              sort by p_name, p_partkey) as c,
            count(p_size) over(distribute by p_brand
              sort by p_name, p_partkey) as ca,
            first_value(p_size) over w1 as fv
            window w1 as (distribute by p_brand
              sort by p_brand, p_name, p_partkey
              rows between 2 preceding and 2 following)
            """
        )
        _chk(
            qeng, oracle,
            "select * from part_w1",
            """
            SELECT p_brand, p_name, p_size,
            CAST(rank() OVER w AS INT) AS r,
            CAST(dense_rank() OVER w AS INT) AS dr,
            round(sum(p_retailprice) OVER (PARTITION BY p_brand
              ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS s
            FROM part
            WINDOW w AS (PARTITION BY p_brand
              ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST)
            """,
        )
        _chk(
            qeng, oracle,
            "select * from part_w2",
            """
            SELECT p_brand, p_name, p_size,
            CAST(rank() OVER w AS INT) AS r,
            CAST(dense_rank() OVER w AS INT) AS dr,
            CAST(trunc(cume_dist() OVER w) AS INT) AS cud,
            round(sum(p_size) OVER (PARTITION BY p_brand
              ORDER BY p_size NULLS FIRST
              RANGE BETWEEN 5 PRECEDING AND CURRENT ROW),1) AS s2,
            first_value(p_size) OVER w1 AS fv1
            FROM part
            WINDOW w AS (PARTITION BY p_brand
              ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST),
            w1 AS (PARTITION BY p_brand
              ORDER BY p_brand NULLS FIRST, p_name NULLS FIRST,
                       p_partkey NULLS FIRST
              ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
            """,
        )
        _chk(
            qeng, oracle,
            "select * from part_w3",
            """
            SELECT p_brand, p_name, p_size,
            CAST(count(*) OVER w AS INT) AS c,
            CAST(count(p_size) OVER w AS INT) AS ca,
            first_value(p_size) OVER w1 AS fv
            FROM part
            WINDOW w AS (PARTITION BY p_brand
              ORDER BY p_name NULLS FIRST, p_partkey NULLS FIRST),
            w1 AS (PARTITION BY p_brand
              ORDER BY p_brand NULLS FIRST, p_name NULLS FIRST,
                       p_partkey NULLS FIRST
              ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
            """,
        )
    finally:
        for t in ("part_w1", "part_w2", "part_w3"):
            qeng.sql(f"drop table if exists {t}")


def test_q_windowing_26_group_by_having_swq_alias(qeng, oracle):
    """windowing.q test 26 (testGroupByHavingWithSWQAndAlias): GROUP
    BY + HAVING under rank/dense_rank/lag windows (the golden repeats
    p_size in the select list; aliased p_size2 here so the name-keyed
    comparator has distinct columns)."""
    _chk(
        qeng, oracle,
        """
        select p_brand, p_name, p_size, min(p_retailprice) as mi,
        rank() over(distribute by p_brand sort by p_name, p_size) as r,
        dense_rank() over(distribute by p_brand
          sort by p_name, p_size) as dr,
        p_size as p_size2, p_size - lag(p_size,1,p_size) over(
          distribute by p_brand sort by p_name, p_size) as deltaSz
        from part
        group by p_brand, p_name, p_size
        having p_size > 0
        """,
        """
        SELECT p_brand, p_name, p_size, mi,
        rank() OVER w AS r,
        dense_rank() OVER w AS dr,
        p_size AS p_size2,
        p_size - lag(p_size,1,p_size) OVER w AS deltaSz
        FROM (SELECT p_brand, p_name, p_size,
                     min(p_retailprice) AS mi
              FROM part GROUP BY p_brand, p_name, p_size
              HAVING p_size > 0) g
        WINDOW w AS (PARTITION BY p_brand
          ORDER BY p_name NULLS FIRST, p_size NULLS FIRST)
        """,
    )
