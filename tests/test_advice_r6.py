"""Regression tests for the round-5 ADVICE findings.

Five items: avro overwrite staleness, avro timestamp timezone coupling,
CREATE TEMPORARY TABLE ... AS SELECT with JOIN USING, greatest/least
single-evaluation of nondeterministic arguments, and MatchPath symbol
names that collide with the internal placeholder alphabet.
"""

from __future__ import annotations

import datetime
import os

import pytest

from hive_2_3_2_spark.engine import Engine


@pytest.fixture()
def eng(spark):
    return Engine(spark=spark)


# ------------------------------------------------------ avro overwrite


def test_avro_rewrite_fewer_partitions_no_stale_parts(spark, tmp_path):
    """ADVICE r5: write_avro_py must clear pre-existing part files —
    re-writing with FEWER partitions previously left stale part-NNNNN
    files and a subsequent read returned duplicate rows."""
    from hive_2_3_2_spark.sources.avro_py import read_avro_py, write_avro_py

    dst = str(tmp_path / "avro_ow")
    write_avro_py(spark.range(90).repartition(6), dst)
    assert len([p for p in os.listdir(dst) if p.endswith(".avro")]) == 6
    write_avro_py(spark.range(10).repartition(1), dst)
    assert len([p for p in os.listdir(dst) if p.endswith(".avro")]) == 1
    assert read_avro_py(spark, dst).count() == 10


# ------------------------------------------- avro timestamp timezone


def test_avro_timestamp_roundtrip_non_utc_session(spark, tmp_path):
    """ADVICE r5: the epoch<->wall-clock conventions on the write and
    read paths must agree for any session timezone, not just UTC. The
    file stores true UTC epoch micros; the decode converts to the
    session timezone before Arrow reinterprets the naive values."""
    from hive_2_3_2_spark.sources.avro_py import read_avro_py, write_avro_py

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ts = datetime.datetime(2024, 3, 1, 12, 30, 0, 123456)
        df = spark.createDataFrame([(1, ts)], "id bigint, ts timestamp")
        dst = str(tmp_path / "avro_tz")
        write_avro_py(df, dst)
        back = read_avro_py(spark, dst)
        # epoch equality through the engine, independent of how Python
        # renders the collected value
        joined = back.alias("b").join(df.alias("o"), "id").selectExpr(
            "b.ts = o.ts AS same", "b.ts AS bts"
        ).collect()
        assert joined[0].same is True, joined
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


# ------------------------------- CREATE TEMPORARY TABLE ... JOIN USING


def test_create_temp_table_ctas_with_join_using(eng, spark):
    """ADVICE r5: a USING anywhere in the CTAS SELECT body (JOIN ...
    USING (k)) must not disqualify the Hive temp-table handler — only a
    datasource clause BEFORE the AS keyword does."""
    spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string") \
        .createOrReplaceTempView("adv_l")
    spark.createDataFrame([(1, 10), (3, 30)], "k int, w int") \
        .createOrReplaceTempView("adv_r")
    eng.sql(
        "CREATE TEMPORARY TABLE adv_tt AS "
        "SELECT * FROM adv_l JOIN adv_r USING (k)"
    )
    rows = eng.sql("SELECT k, v, w FROM adv_tt").collect()
    assert [(r.k, r.v, r.w) for r in rows] == [(1, "a", 10)]
    eng.sql("DROP TABLE adv_tt")
    spark.catalog.dropTempView("adv_l")
    spark.catalog.dropTempView("adv_r")


# ----------------------------------- greatest/least single evaluation


def test_greatest_rewrite_emits_each_arg_once():
    """ADVICE r5: the null-guard rewrite previously re-emitted every
    argument into both the guard and the value, evaluating
    nondeterministic args twice. The lambda-bound form emits each
    argument exactly once."""
    from hive_2_3_2_spark.engine import _rewrite_greatest_least

    out = _rewrite_greatest_least("select greatest(rand(), x, uuid()) g")
    assert out.count("rand()") == 1
    assert out.count("uuid()") == 1
    # nested call: unique lambda variable names per call site
    nested = _rewrite_greatest_least("select least(a, greatest(b, c)) g")
    assert "__gl0" in nested and "__gl1" in nested


def test_greatest_least_null_semantics_still_hold(eng):
    """The rewrite change must preserve HIVE-12082 semantics: NULL when
    ANY argument is NULL, normal max/min otherwise (udf_greatest.q)."""
    row = eng.sql(
        "select greatest('a', cast(null as string), 'c') gn, "
        "       greatest(11, 13, 12) gi, "
        "       least(2.0, 1.0, 3.0) lf, "
        "       least(cast(null as int), 5, 6) ln"
    ).collect()[0]
    assert row.gn is None and row.ln is None
    assert row.gi == 13 and float(row.lf) == 1.0


def test_greatest_nondeterministic_guard_agrees_with_value(eng):
    """With rand() args the guard and the emitted value must see the
    SAME evaluation: the result is never NULL and always within the
    args' range across many rows."""
    rows = eng.sql(
        "select greatest(rand(), rand()) g from range(200)"
    ).collect()
    assert all(r.g is not None and 0.0 <= r.g < 1.0 for r in rows)


# --------------------------------- MatchPath placeholder-safe symbols


def test_matchpath_symbol_named_like_placeholder(eng, spark):
    """ADVICE r5: a symbol literally named 'A' (or colliding with
    another symbol's placeholder char) must compile to the right regex.
    Symbols here are 'A' and 'B' with definitions chosen so a clobbered
    substitution would produce a different match set."""
    rows = [("g1", i, 1 if 2 <= i <= 4 else 0) for i in range(1, 7)]
    df = spark.createDataFrame(rows, "g string, seq int, hot int")
    df.createOrReplaceTempView("adv_mp")
    got = eng.sql(
        """
        select g, seq, sz
        from matchpath(on
                adv_mp
                distribute by g
                sort by seq
              arg1('B.A+'),
              arg2('B'), arg3(hot = 0),
              arg4('A'), arg5(hot = 1),
            arg6('g, seq, size(tpath) as sz')
           )
        """
    )
    out = sorted((r.seq, r.sz) for r in got.collect())
    # only seq=1 starts a cold row followed by >=1 hot rows (2,3,4)
    assert out == [(1, 4)]
    spark.catalog.dropTempView("adv_mp")
