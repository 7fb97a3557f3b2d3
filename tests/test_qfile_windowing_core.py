"""windowing.q core battery, round 9 (reference:
ql/src/test/queries/clientpositive/windowing.q tests 2-6, 15-21, 27-30
— tests 11-14 and 31-34 were replayed in test_qfile_windowing_clause).

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
