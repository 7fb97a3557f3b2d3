"""timestamp_ints_casts.q replay: Hive's two integer→TIMESTAMP cast
modes. ``hive.int.timestamp.conversion.in.seconds`` (HiveConf.java:1337,
default FALSE in the reference) makes integral and boolean casts count
MILLISECONDS since epoch (TimestampWritable.longToTimestamp), while
float/double always count seconds and strings always parse. Spark's
cast is always seconds — the engine DEFAULT matches the reference
(conf false → the typeof-dispatched millis rewrite is active) and
SETting the conf to true restores Spark's plain seconds cast.

Golden pin (timestamp_ints_casts.q.out, UTC-normalized): in millis
mode ctinyint=-36 → epoch-0.036s; in seconds mode → epoch-36s.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

ROWS = [
    # (ctinyint, csmallint, cint, cbigint, cfloat, cdouble, cboolean1)
    (-36, -200, None, -528534767, -36.0, -200.0, None),
    (31, 120, 528534767, 1234567890, 31.5, 120.25, True),
    (None, None, 100000, 10000000000, None, None, False),
    (0, 0, 0, 0, 0.0, 0.0, True),
]
SCHEMA = (
    "ctinyint int, csmallint int, cint int, cbigint bigint, "
    "cfloat double, cdouble double, cboolean1 boolean"
)


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_tsints")
    path = str(root / "alltypes_ts")
    spark.createDataFrame(ROWS, SCHEMA).selectExpr(
        "cast(ctinyint as tinyint) ctinyint",
        "cast(csmallint as smallint) csmallint",
        "cint", "cbigint", "cast(cfloat as float) cfloat", "cdouble",
        "cboolean1",
    ).coalesce(1).write.parquet(path)
    eng = Engine(spark=spark)
    eng.register_table("alltypes_ts", path)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW alltypes_ts AS SELECT * FROM "
        f"read_parquet('{path}/*.parquet')"
    )
    yield eng, con
    con.close()


def test_q_int_ts_casts_seconds_mode(qenv):
    """Second half of timestamp_ints_casts.q (conversion.in.seconds=
    true): every numeric type counts SECONDS — Spark's native cast,
    explicitly SET to pin that the knob round-trips."""
    eng, con = qenv
    eng.sql("set hive.int.timestamp.conversion.in.seconds=true")
    got = eng.sql(
        "select cast(ctinyint as timestamp) AS t_tiny, "
        "cast(csmallint as timestamp) AS t_small, "
        "cast(cint as timestamp) AS t_int, "
        "cast(cbigint as timestamp) AS t_big, "
        "cast(cfloat as timestamp) AS t_float, "
        "cast(cbigint * 0 as timestamp) AS t_zero "
        "from alltypes_ts"
    )
    assert_matches_oracle(
        got,
        con,
        "SELECT make_timestamp(CAST(ctinyint AS BIGINT)*1000000) AS t_tiny,"
        " make_timestamp(CAST(csmallint AS BIGINT)*1000000) AS t_small,"
        " make_timestamp(CAST(cint AS BIGINT)*1000000) AS t_int,"
        " make_timestamp(cbigint*1000000) AS t_big,"
        " make_timestamp(CAST(cfloat*1000000 AS BIGINT)) AS t_float,"
        " make_timestamp(cbigint*0) AS t_zero"
        " FROM alltypes_ts",
    )


def test_q_int_ts_casts_millis_mode(qenv):
    """First half of timestamp_ints_casts.q under the reference
    DEFAULT (conversion.in.seconds=false): integral+boolean types count
    MILLISECONDS, float/double still count seconds."""
    eng, con = qenv
    eng.sql("set hive.int.timestamp.conversion.in.seconds=false")
    try:
        got = eng.sql(
            "select cast(ctinyint as timestamp) AS t_tiny, "
            "cast(csmallint as timestamp) AS t_small, "
            "cast(cint as timestamp) AS t_int, "
            "cast(cbigint as timestamp) AS t_big, "
            "cast(cfloat as timestamp) AS t_float, "
            "cast(cdouble as timestamp) AS t_double, "
            "cast(cboolean1 as timestamp) AS t_bool, "
            "cast(cbigint * 0 as timestamp) AS t_zero "
            "from alltypes_ts"
        )
        assert_matches_oracle(
            got,
            con,
            "SELECT make_timestamp(CAST(ctinyint AS BIGINT)*1000) AS t_tiny,"
            " make_timestamp(CAST(csmallint AS BIGINT)*1000) AS t_small,"
            " make_timestamp(CAST(cint AS BIGINT)*1000) AS t_int,"
            " make_timestamp(cbigint*1000) AS t_big,"
            " make_timestamp(CAST(cfloat*1000000 AS BIGINT)) AS t_float,"
            " make_timestamp(CAST(cdouble*1000000 AS BIGINT)) AS t_double,"
            " make_timestamp(CAST(cboolean1 AS BIGINT)*1000) AS t_bool,"
            " make_timestamp(cbigint*0) AS t_zero"
            " FROM alltypes_ts",
        )
    finally:
        eng.sql("set hive.int.timestamp.conversion.in.seconds=true")


def test_q_int_ts_golden_values_millis(qenv):
    """Exact golden pin: -36 tinyint in millis mode is epoch-0.036s
    (the q.out's 1969-12-31 15:59:59.964 Pacific = 23:59:59.964 UTC)."""
    eng, _ = qenv
    eng.sql("set hive.int.timestamp.conversion.in.seconds=false")
    try:
        row = eng.sql(
            "select cast(ctinyint as timestamp) AS t from alltypes_ts "
            "where ctinyint = -36"
        ).collect()[0]
        assert row.t.isoformat() == "1969-12-31T23:59:59.964000"
        # nested/secondary casts still rewritten (string stays a parse)
        row = eng.sql(
            "select cast(cast(1500 as bigint) as timestamp) AS t, "
            "cast('1970-01-01 00:00:05' as timestamp) AS s "
            "from alltypes_ts where ctinyint = -36"
        ).collect()[0]
        assert row.t.isoformat() == "1970-01-01T00:00:01.500000"
        assert row.s.isoformat() == "1970-01-01T00:00:05"
    finally:
        eng.sql("set hive.int.timestamp.conversion.in.seconds=true")


def test_q_int_ts_default_is_millis(qenv):
    """Reference-parity pin (HiveConf.java:1337 default FALSE): a FRESH
    engine (no SET) counts MILLISECONDS for integral casts — 60 is
    epoch+0.060s, exactly what a Hive 2.3.2 cluster returns
    default-config."""
    eng, _ = qenv
    fresh = Engine(spark=eng.spark)
    row = fresh.sql("select cast(60 as timestamp) AS t").collect()[0]
    assert row.t.isoformat() == "1970-01-01T00:00:00.060000"


def test_q_int_ts_rewrite_single_evaluation():
    """The millis rewrite binds the operand ONCE inside
    transform(array(expr), ...) — nondeterministic operands (rand(),
    uuid()) are evaluated a single time, and the typeof dispatch plus
    both cast branches all reference the bound lambda variable."""
    from hive_2_3_2_spark.engine import _rewrite_int_ts_casts

    out = _rewrite_int_ts_casts("select cast(rand() * 10 as timestamp) t")
    assert out.count("rand()") == 1
    assert "transform(array(rand() * 10)" in out
