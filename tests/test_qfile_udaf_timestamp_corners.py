"""clientpositive `.q` slice, round 6h: udaf_corr.q / udaf_covar_pop.q
/ udaf_covar_samp.q with their exact NULL-bearing fixture, plus
timestamp_literal.q / timestamp_comparison2.q corners (reference:
ql/src/test/queries/clientpositive/udaf_corr.q,
data/files/covar_tab.txt).

The covar_tab fixture deliberately has NULL b and c cells; the goldens
pin that corr/covar_* ignore NULL PAIRS (row 1 and 2 each carry one
NULL) and return NULL when fewer than the required pairs survive
(corr of a single pair, covar_samp of one row). Value-diffed against
DuckDB on the same fixture.

timestamp_literal.q: the TIMESTAMP '...' literal form, millisecond
precision comparisons against strings, and the WHERE-over-literal
form. (Numeric<->timestamp cast goldens from timestamp_1.q are
session-timezone-relative — Hive's q.out encodes America/Los_Angeles —
so they are covered by the timezone-neutral casts in
test_qfile_datetime_cast.py instead.)
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

# data/files/covar_tab.txt, NULLs where the file has empty cells
COVAR_TAB = [
    (1, None, 15),
    (2, 3, None),
    (3, 7, 12),
    (4, 4, 14),
    (5, 8, 17),
    (6, 2, 11),
]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_udafts")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    p = str(root / "covar_tab")
    spark.createDataFrame(COVAR_TAB, "a int, b int, c int").coalesce(
        1
    ).write.parquet(p)
    eng.register_table("covar_tab", p)
    con.execute(
        f"CREATE VIEW covar_tab AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield eng, con
    con.close()


def test_q_udaf_corr_null_pairs(qenv):
    """udaf_corr.q: corr over NULL-bearing pairs — NULL for <2
    surviving pairs, NULL-pair rows excluded from the rest."""
    eng, con = qenv
    for where in ("WHERE a < 1", "WHERE a < 3", "WHERE a = 3", ""):
        assert_matches_oracle(
            eng.sql(
                f"SELECT ROUND(corr(b, c), 6) AS r FROM covar_tab {where}"
            ),
            con,
            f"SELECT ROUND(corr(b, c), 6) AS r FROM covar_tab {where}",
        )
    assert_matches_oracle(
        eng.sql(
            "SELECT a, ROUND(corr(b, c), 6) AS r FROM covar_tab "
            "GROUP BY a ORDER BY a"
        ),
        con,
        "SELECT a, ROUND(corr(b, c), 6) AS r FROM covar_tab "
        "GROUP BY a ORDER BY a",
    )


def test_q_udaf_covar_pop_samp(qenv):
    """udaf_covar_pop.q / udaf_covar_samp.q: same fixture, both
    estimators — covar_samp of a single pair is NULL, covar_pop 0."""
    eng, con = qenv
    for fn in ("covar_pop", "covar_samp"):
        for where in ("WHERE a < 1", "WHERE a < 3", "WHERE a = 3", ""):
            assert_matches_oracle(
                eng.sql(
                    f"SELECT ROUND({fn}(b, c), 6) AS r "
                    f"FROM covar_tab {where}"
                ),
                con,
                f"SELECT ROUND({fn}(b, c), 6) AS r FROM covar_tab {where}",
            )


def test_q_timestamp_literal_forms(qenv):
    """timestamp_literal.q: TIMESTAMP literal, millisecond-precision
    string comparison, and the WHERE-over-literals form."""
    eng, _ = qenv
    r = eng.sql("select timestamp '2011-01-01 01:01:01' AS t").collect()[0]
    assert str(r.t) == "2011-01-01 01:01:01"
    r2 = eng.sql(
        "select '2011-01-01 01:01:01.101' <> "
        "timestamp '2011-01-01 01:01:01.100' AS c"
    ).collect()[0]
    assert r2.c is True
    r3 = eng.sql(
        "select 1 AS one where timestamp '2011-01-01 01:01:01.101' <> "
        "timestamp '2011-01-01 01:01:01.100'"
    ).collect()
    assert [x.one for x in r3] == [1]
