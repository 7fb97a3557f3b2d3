"""Regression pins for the round-10 ADVICE items.

1. medium — the pre-Gregorian timestamp gate fires on ANY ancient
   literal in the statement, not just the first: a modern literal
   appearing first no longer lets an ancient predicate reach the ORC
   SearchArgument (which silently drops matching rows).
2. medium — the DEFAULT null marker for ROW FORMAT DELIMITED tables is
   backslash-N after Spark's unescapeSQLString (doubled backslash in
   the emitted OPTIONS literal); literal 'N' cells are NOT read as
   NULL and NULLs write as backslash-N, matching Hive text format.
3. low — ROW FORMAT DELIMITED ... STORED AS ORC drops the delimiter
   clause (Hive ignores it for binary formats) instead of emitting a
   double-USING parse error.
4. low — _rewrite_decimal_float_col_compares short-circuits SELECT-less
   DDL (array<int> trips _COL_CMP) and never memoizes temp-view
   schemas, so a view replaced via spark.sql directly cannot serve a
   stale schema to the rewrite.
5. low — Spark test-run output artifacts under target/ are untracked
   and gitignored.
"""

from __future__ import annotations

import glob
import os

import pytest

from hive_2_3_2_spark.engine import Engine


@pytest.fixture()
def eng(spark):
    return Engine(spark=spark)


def test_ancient_ts_gate_fires_on_any_literal(eng, spark):
    """ADVICE #1 (medium): modern literal FIRST, ancient second — the
    OR's ancient arm must still return its row from ORC."""
    spark.sql("DROP TABLE IF EXISTS anc_gate")
    eng.sql("CREATE TABLE anc_gate(ts TIMESTAMP) STORED AS ORC")
    eng.sql(
        "INSERT INTO TABLE anc_gate VALUES "
        "('0001-01-01 00:00:00'), ('2012-03-04 05:06:07')"
    )
    try:
        got = eng.sql(
            "select count(*) c from anc_gate "
            "where ts > timestamp '1998-01-01 00:00:00' "
            "or ts = timestamp '0001-01-01 00:00:00'"
        ).collect()[0].c
        assert got == 2
        # mirrored order still works (the originally-fixed shape)
        got = eng.sql(
            "select count(*) c from anc_gate "
            "where ts = timestamp '0001-01-01 00:00:00' "
            "or ts > timestamp '1998-01-01 00:00:00'"
        ).collect()[0].c
        assert got == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS anc_gate")


def test_default_null_marker_is_backslash_n(eng, spark):
    """ADVICE #2 (medium): without NULL DEFINED AS, the marker is the
    two-char backslash-N — literal 'N' cells survive as 'N', NULLs
    round-trip as NULL, and the on-disk file carries backslash-N."""
    spark.sql("DROP TABLE IF EXISTS nulldef_t")
    eng.sql(
        "CREATE TABLE nulldef_t(k INT, v STRING) "
        "ROW FORMAT DELIMITED FIELDS TERMINATED BY ','"
    )
    try:
        eng.sql(
            "INSERT INTO TABLE nulldef_t VALUES "
            "(1, 'N'), (2, CAST(NULL AS STRING)), (3, 'x')"
        )
        rows = {
            r.k: r.v
            for r in eng.sql("select k, v from nulldef_t").collect()
        }
        assert rows == {1: "N", 2: None, 3: "x"}
        loc = (
            spark.sql("DESCRIBE EXTENDED nulldef_t")
            .filter("col_name = 'Location'")
            .collect()[0][1]
        )
        path = loc.replace("file:", "")
        raw = "".join(
            open(f).read()
            for f in glob.glob(os.path.join(path, "*"))
            if os.path.isfile(f) and not f.endswith(".crc")
        )
        assert "2,\\N" in raw  # NULL written as backslash-N
        assert "1,N" in raw  # literal N NOT escaped into the marker
    finally:
        spark.sql("DROP TABLE IF EXISTS nulldef_t")


def test_delimited_with_binary_stored_as_drops_delims(eng, spark):
    """ADVICE #3 (low): ROW FORMAT DELIMITED + STORED AS ORC is legal
    Hive DDL — the file format wins, delimiters are advisory noise."""
    spark.sql("DROP TABLE IF EXISTS delim_orc")
    eng.sql(
        "CREATE TABLE delim_orc(k INT, v STRING) "
        "ROW FORMAT DELIMITED FIELDS TERMINATED BY ',' STORED AS ORC"
    )
    try:
        eng.sql("INSERT INTO TABLE delim_orc VALUES (1, 'a,b')")
        r = eng.sql("select k, v from delim_orc").collect()
        assert [(x.k, x.v) for x in r] == [(1, "a,b")]
        loc = (
            spark.sql("DESCRIBE EXTENDED delim_orc")
            .filter("col_name = 'Provider'")
            .collect()
        )
        assert loc and loc[0][1].lower() == "orc"
    finally:
        spark.sql("DROP TABLE IF EXISTS delim_orc")


def test_decimal_float_rewrite_skips_selectless_ddl(eng):
    """ADVICE #4 (low): complex-type DDL trips _COL_CMP via '<' but
    must pass through untouched without any catalog scanning."""
    q = (
        "create table cplx (a array<int>, b map<string,int>, "
        "c struct<x:int,y:double>)"
    )
    assert eng._rewrite_decimal_float_col_compares(q) == q
    assert eng._catalog_schema_memo == {}


def test_decimal_float_rewrite_never_memoizes_temp_views(
    eng, spark, tmp_path
):
    """ADVICE #4 (low): a temp view replaced via spark.sql directly
    (no Engine.sql DDL invalidation) must serve its FRESH schema."""
    p = os.path.join(str(tmp_path), "dtab")
    spark.sql(
        "select cast(1.23 as decimal(10,2)) as d"
    ).write.parquet(p)
    eng.register_table("dtab", p)
    spark.sql(
        "create or replace temp view ftab_r11 as "
        "select cast(1.23 as float) as f"
    )
    q = "select * from dtab join ftab_r11 on d = f"
    out = eng._rewrite_decimal_float_col_compares(q)
    assert "CAST(d AS FLOAT)" in out
    assert "ftab_r11" not in eng._catalog_schema_memo
    # replace the view OUTSIDE the engine: f is now double → no rewrite
    spark.sql(
        "create or replace temp view ftab_r11 as "
        "select cast(1.23 as double) as f"
    )
    assert eng._rewrite_decimal_float_col_compares(q) == q
    spark.catalog.dropTempView("ftab_r11")


def test_target_artifacts_untracked():
    """ADVICE #5 (low): no committed Spark output artifacts — target/
    is gitignored and nothing under it is TRACKED (tests recreate the
    directory at runtime, which is fine; committing it was the bug)."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gi = open(os.path.join(repo, ".gitignore")).read().splitlines()
    assert "target/" in gi
    tracked = subprocess.run(
        ["git", "ls-files", "target/"],
        cwd=repo, capture_output=True, text=True,
    ).stdout.strip()
    assert tracked == ""
