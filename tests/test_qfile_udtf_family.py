"""clientpositive `.q` slice, round 6h: the udtf_* golden family
(reference: ql/src/test/queries/clientpositive/udtf_stack.q,
udtf_replicate_rows.q, udtf_posexplode.q; explode/json_tuple/
parse_url_tuple already replayed in the lateral suite).

- udtf_stack: STACK inside LATERAL VIEW with array-typed columns and a
  NULL column (type comes from the sibling rows), plus the bare
  multi-alias SELECT form;
- udtf_replicate_rows: Hive's row-replication UDTF — emits (n, e...)
  n times, nothing for n <= 0. The engine rewrites it to
  inline(array_repeat(struct(...), greatest(0, n))) (see
  engine.py _rewrite_replicate_rows); every golden shape is replayed
  with its exact expected multiset;
- udtf_posexplode: posexplode over an array column under LATERAL VIEW.
"""

from __future__ import annotations

import pytest

from hive_2_3_2_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark):
    e = Engine(spark=spark)
    spark.createDataFrame(
        [(3, "2", 0), (2, "3", 1), (0, "2", 2), (-1, "k", 3)],
        "x bigint, y string, z int",
    ).createOrReplaceTempView("rr_t")
    spark.createDataFrame(
        [("john", ["mary", "tom"]), ("ana", [])],
        "name string, subordinates array<string>",
    ).createOrReplaceTempView("rr_emp")
    return e


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


def test_q_udtf_stack_lateral_and_bare(eng):
    """udtf_stack.q: LATERAL VIEW STACK with mixed scalar/array columns
    and the bare constant form with a trailing NULL column."""
    rows = _multiset(eng.sql(
        "SELECT x, y FROM (SELECT 1 AS one) t "
        "LATERAL VIEW STACK(2, 'x', array(1), 'z', array(4)) a AS x, y"
    ))
    assert rows == [("x", [1]), ("z", [4])]
    r = eng.sql("SELECT stack(1, 'en', 'dbpedia', NULL )").collect()
    assert [tuple(x) for x in r] == [("en", "dbpedia", None)]


def test_q_replicate_rows_basic(eng):
    """udtf_replicate_rows.q head: (n, y) emitted n times; n=0 and
    n=-1 rows vanish. Golden multiset: 3x(3,'2'), 2x(2,'3')."""
    got = _multiset(eng.sql("SELECT replicate_rows(x, y) FROM rr_t"))
    assert got == [(2, "3")] * 2 + [(3, "2")] * 3


def test_q_replicate_rows_repeated_and_wide(eng):
    """udtf_replicate_rows.q: duplicated columns and the 5-wide form
    with a trailing int column."""
    got = _multiset(eng.sql("SELECT replicate_rows(x, y, y) FROM rr_t"))
    assert got == [(2, "3", "3")] * 2 + [(3, "2", "2")] * 3
    got5 = _multiset(
        eng.sql("SELECT replicate_rows(x, y, y, y, z) FROM rr_t")
    )
    assert got5 == [(2, "3", "3", "3", 1)] * 2 + [(3, "2", "2", "2", 0)] * 3


def test_q_replicate_rows_multi_alias_subquery(eng):
    """udtf_replicate_rows.q: the AS (x,y) multi-alias consumed by an
    outer SELECT that reorders the columns."""
    got = _multiset(eng.sql(
        "select y, x from (SELECT replicate_rows(x,y) as (x,y) "
        "FROM rr_t) subq"
    ))
    assert got == [("2", 3)] * 3 + [("3", 2)] * 2
    got2 = _multiset(eng.sql(
        "select z, y, x from (SELECT replicate_rows(x,y,y) as (z,y,x) "
        "FROM rr_t) subq"
    ))
    assert got2 == [(2, "3", "3")] * 2 + [(3, "2", "2")] * 3


def test_q_replicate_rows_expression_args(eng):
    """udtf_replicate_rows.q tail: computed column arguments."""
    got = _multiset(
        eng.sql("SELECT replicate_rows(x, concat(y,'...'), y) FROM rr_t")
    )
    assert got == [(2, "3...", "3")] * 2 + [(3, "2...", "2")] * 3


def test_q_udtf_posexplode_lateral(eng):
    """udtf_posexplode.q: posexplode under LATERAL VIEW (empty arrays
    contribute nothing without OUTER)."""
    got = _multiset(eng.sql(
        "SELECT name, pos, sub FROM rr_emp "
        "LATERAL VIEW posexplode(subordinates) subView AS pos, sub"
    ))
    assert got == [("john", 0, "mary"), ("john", 1, "tom")]
