"""clientpositive `.q` slice: regex column specifiers (regex_col.q).

Under ``set hive.support.quoted.identifiers=none`` Hive reinterprets a
backtick-quoted name as a Java regex matched (fully) against the input
columns (ParseDriver's QuotedIdentifier `none` mode; regex_col.q,
quotedid_* goldens). Spark inherited the identical feature behind
``spark.sql.parser.quotedRegexColumnNames`` — the engine maps the Hive
conf onto it in _run_set, and back when the conf is restored to
``column``.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(str(i % 83), f"val_{i % 83}") for i in range(200)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_regexcol")
    eng = Engine(spark=spark)
    rows = [
        (k, v, ds, hr)
        for ds in ("2008-04-08", "2008-04-09")
        for hr in ("11", "12")
        for k, v in SRC
    ]
    p_part = str(root / "srcpart")
    spark.createDataFrame(
        rows, "key string, value string, ds string, hr string"
    ).write.partitionBy("ds", "hr").parquet(p_part)
    eng.register_table("rc_srcpart", p_part, ["ds", "hr"])
    con = duckdb.connect()
    body = ", ".join(
        f"('{k}', '{v}', '{ds}', '{hr}')" for k, v, ds, hr in rows
    )
    con.execute(
        "CREATE VIEW rc_srcpart AS SELECT * FROM (VALUES "
        + body + ") AS t(key, value, ds, hr)"
    )
    eng.sql("SET hive.support.quoted.identifiers=none")
    yield eng, con
    # restore identifier quoting for the shared session
    eng.sql("SET hive.support.quoted.identifiers=column")
    assert (
        spark.conf.get("spark.sql.parser.quotedRegexColumnNames") == "false"
    )
    con.close()


def test_q_regex_col_two_char(qenv):
    """regex_col.q: SELECT `..` — every column whose name is exactly
    two chars (ds, hr)."""
    eng, con = qenv
    got = eng.sql("SELECT `..` FROM rc_srcpart")
    assert_matches_oracle(
        got, con, "SELECT ds, hr FROM rc_srcpart"
    )


def test_q_regex_col_qualified(qenv):
    """regex_col.q: table-qualified regex `srcpart.`..``."""
    eng, con = qenv
    got = eng.sql("SELECT rc_srcpart.`..` FROM rc_srcpart")
    assert_matches_oracle(
        got, con, "SELECT ds, hr FROM rc_srcpart"
    )


def test_q_regex_col_join_qualified(qenv):
    """regex_col.q value test: b.`..` over a self-join, ordered."""
    eng, con = qenv
    got = eng.sql(
        """
        SELECT b.`..` FROM rc_srcpart a JOIN rc_srcpart b
        ON a.key = b.key AND a.hr = b.hr AND a.ds = b.ds AND a.key = 103
        ORDER BY ds, hr
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT b.ds, b.hr FROM rc_srcpart a JOIN rc_srcpart b
        ON a.key = b.key AND a.hr = b.hr AND a.ds = b.ds
           AND TRY_CAST(a.key AS DOUBLE) = 103
        ORDER BY b.ds, b.hr
        """,
    )


def test_q_regex_col_middle_char(qenv):
    """regex_col.q: `.e.` fully matches only `key` (value is 5 chars —
    the regex is anchored over the whole name)."""
    eng, con = qenv
    got = eng.sql("SELECT `.e.` FROM rc_srcpart ORDER BY key LIMIT 5")
    assert_matches_oracle(
        got, con, "SELECT key FROM rc_srcpart ORDER BY key LIMIT 5"
    )


def test_q_regex_col_possessive_exclusion(qenv):
    """regex_col.q: `(ds|hr)?+.+` — the Hive idiom for "all columns
    except ds and hr" via a possessive quantifier (Java regex,
    identical engine in Spark)."""
    eng, con = qenv
    got = eng.sql(
        "SELECT `(ds|hr)?+.+` FROM rc_srcpart ORDER BY key, value LIMIT 10"
    )
    assert_matches_oracle(
        got,
        con,
        "SELECT key, value FROM rc_srcpart ORDER BY key, value LIMIT 10",
    )


def test_q_regex_col_off_is_identifier(qenv, spark):
    """With the conf back at `column`, a backticked regex is an
    ordinary (missing) identifier again — typed resolution error, not
    a regex match."""
    eng, con = qenv
    eng.sql("SET hive.support.quoted.identifiers=column")
    try:
        with pytest.raises(Exception, match="UNRESOLVED_COLUMN|cannot be resolved"):
            eng.sql("SELECT `..` FROM rc_srcpart").collect()
    finally:
        eng.sql("SET hive.support.quoted.identifiers=none")
