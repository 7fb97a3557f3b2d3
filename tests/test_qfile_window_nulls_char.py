"""clientpositive `.q` slice, round 6i: windowing_order_null.q /
windowing_range_multiorder.q and the char/varchar family head
(reference: ql/src/test/queries/clientpositive/windowing_order_null.q,
windowing_range_multiorder.q, char_1.q, char_comparison.q,
varchar_2.q).

- windowing_order_null: explicit NULLS FIRST/LAST in window ORDER BY
  under ROWS and default frames (Hive and Spark agree on NULLS FIRST
  as the ASC default; DuckDB needs it pinned);
- windowing_range_multiorder: RANGE frames over MULTI-COLUMN order —
  the golden's point is that RANGE ... CURRENT ROW means PEER rows
  (ties on all order keys share the frame), not the current row alone,
  under asc/desc mixes and the `range current row` shorthand;
- char_comparison/char_1/varchar_2: CHAR(n) pads on storage and
  ignores trailing pad in comparisons; VARCHAR(n) truncates to length;
  both group/aggregate like their underlying strings.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

# over10k-shaped slice: duplicated order keys (peers) and NULL cells
ROWS = [
    (1, 10, 100.0, "alice"),
    (1, 10, 100.0, "bob"),      # peer of the row above on (i, f)
    (1, 20, 50.0, "carol"),
    (1, None, 50.0, "dave"),
    (2, 10, None, "erin"),
    (2, 30, 75.0, "frank"),
    (2, 30, 75.0, "grace"),     # peer on (i, f)
    (2, 40, 10.0, None),
]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_wnc")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    p = str(root / "wn_t")
    spark.createDataFrame(
        ROWS, "si int, i int, f double, s string"
    ).coalesce(1).write.parquet(p)
    eng.register_table("wn_t", p)
    con.execute(
        f"CREATE VIEW wn_t AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield eng, con
    con.close()


def test_q_window_order_nulls_last_rows(qenv):
    """windowing_order_null.q: NULLS LAST under a ROWS running frame
    and DESC NULLS FIRST."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "select si, i, s, sum(i) over (partition by si "
            "order by i nulls last, s rows unbounded preceding) AS r "
            "from wn_t"
        ),
        con,
        "select si, i, s, CAST(sum(i) over (partition by si "
        "order by i nulls last, s nulls first "
        "rows unbounded preceding) AS BIGINT) AS r from wn_t",
    )
    assert_matches_oracle(
        eng.sql(
            "select si, f, sum(f) over (partition by si "
            "order by f desc nulls first rows unbounded preceding) AS r "
            "from wn_t"
        ),
        con,
        "select si, f, sum(f) over (partition by si "
        "order by f desc nulls first rows unbounded preceding) AS r "
        "from wn_t",
    )


def test_q_range_multiorder_peers_share_frame(qenv):
    """windowing_range_multiorder.q: RANGE ... CURRENT ROW with
    multi-column ORDER BY — peer rows (equal on ALL order keys) share
    one frame value, asc and desc-mixed variants."""
    eng, con = qenv
    for order in ("order by i, f", "order by i, f desc"):
        assert_matches_oracle(
            eng.sql(
                f"select si, i, f, avg(i) over (partition by si {order} "
                "range between unbounded preceding and current row) AS a "
                "from wn_t"
            ),
            con,
            f"select si, i, f, avg(i) over (partition by si "
            f"{order.replace('order by i, f', 'order by i nulls first, f')}"
            " range between unbounded preceding and current row) AS a "
            "from wn_t".replace("f desc", "f desc nulls first"),
        )


def test_q_range_current_row_shorthand(qenv):
    """windowing_range_multiorder.q: the bare `range current row`
    shorthand — frame is exactly the peer group."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "select si, i, f, count(*) over (partition by si "
            "order by i, f range current row) AS c from wn_t"
        ),
        con,
        "select si, i, f, CAST(count(*) over (partition by si "
        "order by i nulls first, f nulls first "
        "range between current row and current row) AS INT) AS c "
        "from wn_t",
    )


def test_q_char_comparison_ignores_pad(qenv):
    """char_comparison.q: CHAR(10) comparisons ignore trailing pad."""
    eng, _ = qenv
    r = eng.sql(
        "select cast('abc' as char(10)) = cast('abc' as char(10)) AS a, "
        "cast('abc' as char(10)) <= cast('abc' as char(10)) AS b, "
        "cast('abc' as char(10)) < cast('abd' as char(10)) AS c, "
        "cast('abc' as char(10)) > cast('abb' as char(10)) AS d, "
        "cast('abc' as char(10)) <> cast('abb' as char(10)) AS e"
    ).collect()[0]
    assert tuple(r) == (True, True, True, True, True)
    # CHAR vs bare string literal: the char's pad is ignored
    r2 = eng.sql(
        "select cast('abc' as char(10)) = 'abc' AS a"
    ).collect()[0]
    assert r2.a is True


def test_q_char1_insert_pads_varchar2_truncates(qenv, spark, tmp_path):
    """char_1.q / varchar_2.q: CHAR(n) pads on storage (length() sees
    n), VARCHAR(n) truncates longer values; both aggregate like their
    underlying strings."""
    eng, con = qenv
    spark.sql("DROP TABLE IF EXISTS wn_char1")
    eng.sql(
        "CREATE TABLE wn_char1 (key char(10), value varchar(3)) "
        f"STORED AS PARQUET LOCATION '{tmp_path}/wn_char1'"
    )
    eng.sql(
        "INSERT OVERWRITE TABLE wn_char1 "
        "SELECT s, s FROM wn_t WHERE s IS NOT NULL"
    )
    rows = {r.key: r for r in eng.sql(
        "SELECT key, length(key) AS lk, value, length(value) AS lv "
        "FROM wn_char1"
    ).collect()}
    assert rows["alice     "].lk == 10          # CHAR(10) pads
    assert rows["alice     "].value == "ali"    # VARCHAR(3) truncates
    assert rows["alice     "].lv == 3
    # grouping by the char column groups padded-equal values together
    assert_matches_oracle(
        eng.sql(
            "SELECT rtrim(key) AS k, count(*) AS c FROM wn_char1 "
            "GROUP BY key"
        ),
        con,
        "SELECT s AS k, CAST(1 AS BIGINT) AS c FROM wn_t "
        "WHERE s IS NOT NULL",
    )
