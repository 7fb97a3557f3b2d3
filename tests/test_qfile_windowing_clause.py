"""clientpositive `.q` slice: WINDOW-clause inheritance and value-based
RANGE frames over non-numeric sort keys.

Reference shapes: windowing.q tests 11-14 (named windows), 32
(definition-level inheritance ``w2 as (w1 rows ...)``), 33 (forward
reference + alias chain ``w2 as w3``), 34 (use-site refinement
``over (w3 rows ...)``); cbo_rp_windowing.q line 19 (bounded RANGE
frames over a STRING sort key — Hive's StringValueBoundaryScanner,
ql/src/java/org/apache/hadoop/hive/ql/udf/ptf/ValueBoundaryScanner.java,
ignores the amount, so the frame degenerates to the peer group);
windowing date/timestamp ranges (DateValueBoundaryScanner amt = days,
TimestampValueBoundaryScanner amt = seconds); cmdwithcomments.q
(``--`` inside a double-quoted literal is NOT a comment —
CliDriver.processLine).

Fixture columns diverge from Hive's demo part table (no p_mfgr in the
synthetic data) so the shapes run over p_brand; ROWS frames order by
(p_name, p_partkey) to keep the frame total where Hive's golden relies
on its own stable file order.
"""

from __future__ import annotations

from tests.conftest import assert_matches_oracle

import pytest

from hive_2_3_2_spark.engine import Engine, _split_statements


@pytest.fixture(scope="module")
def qeng(spark, sf_dir):
    return Engine(spark=spark, sf_dir=sf_dir)


def test_q_windowing_named_window_rows(qeng, oracle):
    """windowing.q test 13 (testSumWindow): one windowed sum through
    the named window, one inline — Spark parses the plain clause
    natively; this pins the baseline before the inheritance cases."""
    got = qeng.sql(
        """
        select p_brand, p_name, p_size,
        sum(p_size) over w1 as s1,
        sum(p_size) over (distribute by p_brand sort by p_name, p_partkey
            rows between current row and current row) as s2
        from part
        window w1 as (distribute by p_brand sort by p_name, p_partkey
            rows between 2 preceding and 2 following)
        order by p_brand, p_name, p_partkey
        """
    )
    assert_matches_oracle(
        got,
        oracle,
        """
        SELECT p_brand, p_name, p_size,
        SUM(p_size) OVER (PARTITION BY p_brand ORDER BY p_name, p_partkey
            ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS s1,
        SUM(p_size) OVER (PARTITION BY p_brand ORDER BY p_name, p_partkey
            ROWS BETWEEN CURRENT ROW AND CURRENT ROW) AS s2
        FROM part ORDER BY p_brand, p_name, p_partkey
        """,
    )


def test_q_windowing_def_inheritance(qeng, oracle):
    """windowing.q test 32 (testWindowCrossReference inheritance form):
    ``w2 as (w1 rows between unbounded preceding and current row)``
    inherits w1's partition/order and replaces its frame. Spark rejects
    the definition at parse time; the retry inliner resolves it."""
    got = qeng.sql(
        """
        select p_brand, p_name, p_size,
        sum(p_size) over w1 as s1,
        sum(p_size) over w2 as s2
        from part
        window w1 as (distribute by p_brand sort by p_name, p_partkey
                      rows between 2 preceding and 2 following),
               w2 as (w1 rows between unbounded preceding and current row)
        order by p_brand, p_name, p_partkey
        """
    )
    assert_matches_oracle(
        got,
        oracle,
        """
        SELECT p_brand, p_name, p_size,
        SUM(p_size) OVER (PARTITION BY p_brand ORDER BY p_name, p_partkey
            ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS s1,
        SUM(p_size) OVER (PARTITION BY p_brand ORDER BY p_name, p_partkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s2
        FROM part ORDER BY p_brand, p_name, p_partkey
        """,
    )


def test_q_windowing_forward_ref_and_refinement(qeng, oracle):
    """windowing.q tests 33+34 combined: alias chain with a FORWARD
    reference (``w2 as w3`` before w3 is defined), a string-sort-key
    bounded RANGE window (w1 — peer-group semantics per
    StringValueBoundaryScanner), and a use-site frame refinement
    ``over (w3 rows between 2 preceding and 2 following)``. Three
    retry rewrites chain: parse-error inlining, then the string RANGE
    bound collapse."""
    got = qeng.sql(
        """
        select p_brand, p_name, p_size,
        sum(p_size) over w1 as s1,
        sum(p_size) over w2 as s2,
        sum(p_size) over (w3 rows between 2 preceding and 2 following) as s3
        from part
        window w1 as (distribute by p_brand sort by p_name
                      range between 2 preceding and 2 following),
               w2 as w3,
               w3 as (distribute by p_brand sort by p_name, p_partkey
                      range between unbounded preceding and current row)
        order by p_brand, p_name, p_partkey
        """
    )
    # w1: bounded RANGE over the STRING p_name -> the peer group
    # (PARTITION BY p_brand, p_name). w3 with (p_name, p_partkey) is a
    # total order, so its running RANGE sum equals the ROWS running sum
    # and the refined s3 is a deterministic ROWS frame.
    assert_matches_oracle(
        got,
        oracle,
        """
        SELECT p_brand, p_name, p_size,
        SUM(p_size) OVER (PARTITION BY p_brand, p_name) AS s1,
        SUM(p_size) OVER (PARTITION BY p_brand ORDER BY p_name, p_partkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s2,
        SUM(p_size) OVER (PARTITION BY p_brand ORDER BY p_name, p_partkey
            ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS s3
        FROM part ORDER BY p_brand, p_name, p_partkey
        """,
    )


def test_q_string_range_frame_forms(qeng, oracle):
    """cbo_rp_windowing.q line 19 forms over lineitem's string
    l_linestatus: shorthand ``range 1 preceding``, half-open bounds to
    unbounded edges, and the symmetric bounded form. Every bounded
    numeric edge collapses to the peer-group edge (amount ignored by
    StringValueBoundaryScanner)."""
    got = qeng.sql(
        """
        select l_orderkey, l_linenumber,
        count(l_partkey) over (partition by l_returnflag
            order by l_linestatus range 1 preceding) as c1,
        sum(l_quantity) over (partition by l_returnflag
            order by l_linestatus
            range between 3 preceding and 2 following) as s1,
        sum(l_quantity) over (partition by l_returnflag
            order by l_linestatus
            range between 1 preceding and unbounded following) as s2,
        count(*) over (partition by l_returnflag
            order by l_linestatus
            range between unbounded preceding and 5 following) as c2
        from lineitem
        order by l_orderkey, l_linenumber, c1
        """
    )
    assert_matches_oracle(
        got,
        oracle,
        """
        SELECT l_orderkey, l_linenumber,
        CAST(COUNT(l_partkey) OVER (PARTITION BY l_returnflag, l_linestatus)
             AS BIGINT) AS c1,
        SUM(l_quantity) OVER (PARTITION BY l_returnflag, l_linestatus) AS s1,
        SUM(l_quantity) OVER (PARTITION BY l_returnflag
            ORDER BY l_linestatus
            RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS s2,
        CAST(COUNT(*) OVER (PARTITION BY l_returnflag
            ORDER BY l_linestatus
            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS c2
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber, c1
        """,
    )


def test_q_date_range_frame_days(qeng, oracle):
    """Numeric RANGE bound over a DATE sort key: Hive's
    DateValueBoundaryScanner measures the amount in DAYS (amt*24*3600
    seconds, inclusive cutoff) — rewritten to INTERVAL n DAY, which is
    the same inclusive window. (The catalog view exposes l_shipdate as
    TIMESTAMP, so the sort key is cast to DATE explicitly — a raw
    l_shipdate key takes the TIMESTAMP/seconds path instead, which is
    the correct Hive parity for a timestamp-typed column.)"""
    got = qeng.sql(
        """
        select l_orderkey, l_linenumber,
        count(*) over (partition by l_returnflag
            order by cast(l_shipdate as date)
            range between 30 preceding and current row) as c
        from lineitem
        order by l_orderkey, l_linenumber, c
        """
    )
    assert_matches_oracle(
        got,
        oracle,
        """
        SELECT l_orderkey, l_linenumber,
        CAST(COUNT(*) OVER (PARTITION BY l_returnflag
            ORDER BY CAST(l_shipdate AS DATE)
            RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
            AS BIGINT) AS c
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber, c
        """,
    )


def test_q_timestamp_range_frame_seconds(qeng, oracle):
    """Numeric RANGE bound over a TIMESTAMP sort key: Hive's
    TimestampValueBoundaryScanner measures the amount in SECONDS —
    rewritten to INTERVAL n SECOND."""
    got = qeng.sql(
        """
        select event_id,
        count(*) over (partition by user_id order by ts
            range between 86400 preceding and current row) as c
        from events
        order by event_id
        """
    )
    assert_matches_oracle(
        got,
        oracle,
        """
        SELECT event_id,
        CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 86400 SECOND PRECEDING AND CURRENT ROW)
            AS BIGINT) AS c
        FROM events
        ORDER BY event_id
        """,
    )


def test_q_cmdwithcomments_double_quoted_literal(qeng):
    """cmdwithcomments.q: a double-quoted string literal containing
    ``--`` (and a ``;``) must survive the script splitter — Hive's
    CliDriver treats both quote chars as strings while stripping
    comments."""
    script = (
        'select "this is\nanother --string; value" as s from part'
        " limit 1; -- trailing comment\n"
        "select 2 as two; --done"
    )
    stmts = _split_statements(script)
    assert len(stmts) == 2
    assert "--string; value" in stmts[0]
    rows = qeng.sql(stmts[0]).collect()
    assert rows[0].s == "this is\nanother --string; value"
    assert qeng.sql(stmts[1]).collect()[0].two == 2


def test_q_named_window_inert_on_green_statements(qeng):
    """The inliner is retry-only: a statement Spark parses natively
    (plain WINDOW clause, even with an alias chain) must execute
    without entering the rewrite. Sanity: results present and the
    rewrite helper leaves non-WINDOW text alone."""
    from hive_2_3_2_spark.engine import _rewrite_named_windows

    assert _rewrite_named_windows("select 1 as a from part") is None
    rows = qeng.sql(
        """
        select p_brand, sum(p_size) over w2 as s
        from part
        window w1 as (partition by p_brand order by p_name, p_partkey),
               w2 as w1
        order by p_brand, s limit 5
        """
    ).collect()
    assert len(rows) == 5
