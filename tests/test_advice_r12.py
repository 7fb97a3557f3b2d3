"""Regression pins for the round-11 ADVICE items plus the verdict's
typed-operand gate on the lenient date rewrites.

1. medium — ROW FORMAT DELIMITED ... STORED AS INPUTFORMAT
   <TextInputFormat> KEEPS its FIELDS TERMINATED BY (LazySimpleSerDe
   still honors delimiters for text input formats — only the STORED AS
   words that carry their own serde, and binary IOF class pairs, drop
   the clause).
2. medium — position-alias handling is per-ITEM
   (SemanticAnalyzer.processPositionAlias): a mixed GROUP BY list
   ('group by 1, k2') turns the integer into a constant with the alias
   off, surfacing Hive's not-grouped error for the ungrouped select
   column; ORDER BY defaults to ORDINALS (hive.orderby.position.alias
   default TRUE, HiveConf.java:1156) and only goes constant when that
   conf is turned off; SORT BY integers are ALWAYS constants (TOK_SORTBY
   is absent from processPositionAlias).
3. low — the engine's avro-native probe shares readers.py's robust
   missing-datasource regex (both 'Failed to find data source' and
   'Failed to find the data source' spellings + the error class name).
4. low — _hv_mb_norm rolls out-of-range TIME fields arithmetically the
   way a lenient GregorianCalendar does (hour 25 lands in the next
   day) instead of NULLing through to_timestamp.
5. low — CTAS bodies (CREATE TEMPORARY TABLE ... AS, the avro-fallback
   CTAS) evaluate through the same pre-dispatch semantic rewrites as a
   standalone SELECT (Engine._body_df), so wrapping a SELECT in DDL
   cannot change its values.
6. verdict — months_between/add_months over schema-resolved
   DATE/TIMESTAMP operands keep Spark's native intrinsic (DATE passes
   through untouched; TIMESTAMP only truncates to whole seconds, the
   GenericUDFMonthsBetween.java:135-156 day-part-in-seconds behavior);
   string operands keep the lenient normalization.
"""

from __future__ import annotations

import pytest

from hive_2_3_2_spark.engine import Engine
from hive_2_3_2_spark.sources.readers import MISSING_DATASOURCE


@pytest.fixture()
def eng(spark):
    return Engine(spark=spark)


def test_delimited_kept_for_text_inputformat(eng, spark):
    """ADVICE #1: STORED AS INPUTFORMAT TextInputFormat is a TEXT
    table — a comma delimiter must survive the rewrite (previously the
    clause dropped and every row mis-parsed under the \\x01 default)."""
    spark.sql("DROP TABLE IF EXISTS iof_text_t")
    eng.sql(
        "CREATE TABLE iof_text_t(k INT, v STRING) "
        "ROW FORMAT DELIMITED FIELDS TERMINATED BY ',' "
        "STORED AS INPUTFORMAT 'org.apache.hadoop.mapred.TextInputFormat' "
        "OUTPUTFORMAT "
        "'org.apache.hadoop.hive.ql.io.HiveIgnoreKeyTextOutputFormat'"
    )
    try:
        eng.sql("INSERT INTO TABLE iof_text_t VALUES (1, 'a'), (2, 'b')")
        rows = sorted(
            (r.k, r.v)
            for r in eng.sql("select k, v from iof_text_t").collect()
        )
        assert rows == [(1, "a"), (2, "b")]
    finally:
        spark.sql("DROP TABLE IF EXISTS iof_text_t")


def test_delimited_dropped_for_binary_inputformat(eng, spark):
    """ADVICE #1 (converse): a parquet IOF class pair still drops the
    delimiter clause — the binary format wins, no double-USING error."""
    spark.sql("DROP TABLE IF EXISTS iof_bin_t")
    eng.sql(
        "CREATE TABLE iof_bin_t(k INT, v STRING) "
        "ROW FORMAT DELIMITED FIELDS TERMINATED BY ',' "
        "STORED AS INPUTFORMAT "
        "'org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat' "
        "OUTPUTFORMAT "
        "'org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat'"
    )
    try:
        eng.sql("INSERT INTO TABLE iof_bin_t VALUES (7, 'z')")
        assert [
            (r.k, r.v)
            for r in eng.sql("select k, v from iof_bin_t").collect()
        ] == [(7, "z")]
        prov = (
            spark.sql("DESCRIBE TABLE EXTENDED iof_bin_t")
            .filter("col_name = 'Provider'")
            .collect()
        )
        assert prov and prov[0].data_type.lower() == "parquet"
    finally:
        spark.sql("DROP TABLE IF EXISTS iof_bin_t")


@pytest.fixture()
def gby_fixture(eng, spark):
    spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x")], "k int, v string"
    ).createOrReplaceTempView("posalias_t")
    yield eng
    spark.catalog.dropTempView("posalias_t")


def test_mixed_groupby_list_constant_when_alias_off(gby_fixture):
    """ADVICE #2: 'group by 1, v' with the alias off (default) treats
    the 1 as a constant — selecting k surfaces the not-grouped error
    class instead of silently grouping by (k, v)."""
    eng = gby_fixture
    with pytest.raises(Exception, match="MISSING_AGGREGATION|not-grouped"):
        eng.sql(
            "select k, v, count(*) c from posalias_t group by 1, v"
        ).collect()


def test_mixed_groupby_list_ordinal_when_alias_on(gby_fixture):
    """Split conf: hive.groupby.position.alias=true enables ordinals
    even with the deprecated combined conf unset."""
    eng = gby_fixture
    eng.sql("set hive.groupby.position.alias=true")
    try:
        rows = sorted(
            (r.k, r.v, r.c)
            for r in eng.sql(
                "select k, v, count(*) c from posalias_t group by 1, v"
            ).collect()
        )
        assert rows == [(1, "x", 1), (1, "y", 1), (2, "x", 1)]
    finally:
        eng.sql("set hive.groupby.position.alias=false")


def test_orderby_position_defaults_to_ordinal(gby_fixture):
    """hive.orderby.position.alias defaults TRUE in Hive 2.3 — ORDER BY
    1 sorts by the first select column (Spark's orderByOrdinal IS that
    behavior; no rewrite fires)."""
    eng = gby_fixture
    got = [
        r.k
        for r in eng.sql(
            "select k from posalias_t order by 1 desc"
        ).collect()
    ]
    assert got == [2, 1, 1]


def test_orderby_constant_when_alias_off(gby_fixture):
    """With hive.orderby.position.alias=false the integer is a constant
    (no-op sort): the statement still succeeds and returns every row."""
    eng = gby_fixture
    eng.sql("set hive.orderby.position.alias=false")
    try:
        rows = eng.sql("select k from posalias_t order by 1").collect()
        assert sorted(r.k for r in rows) == [1, 1, 2]
    finally:
        eng.sql("set hive.orderby.position.alias=true")


def test_sortby_integer_always_constant(gby_fixture):
    """SORT BY is never position-processed in Hive — the integer is a
    constant under every conf combination."""
    eng = gby_fixture
    eng.sql("set hive.groupby.orderby.position.alias=true")
    try:
        rows = eng.sql("select k from posalias_t sort by 1").collect()
        assert sorted(r.k for r in rows) == [1, 1, 2]
    finally:
        eng.sql("set hive.groupby.orderby.position.alias=false")


def test_missing_datasource_regex_covers_both_spellings():
    """ADVICE #3: the shared probe regex matches every spelling Spark
    uses for a missing optional datasource."""
    for msg in (
        "Failed to find data source: avro",
        "Failed to find the data source: avro",
        "[DATA_SOURCE_NOT_FOUND] Failed to find the data source: avro",
    ):
        assert MISSING_DATASOURCE.search(msg), msg
    assert not MISSING_DATASOURCE.search("Path does not exist: /x")


def test_months_between_time_field_rollover(eng):
    """ADVICE #4: hour 25 rolls into the next day (lenient
    GregorianCalendar), so '2002-03-24 25:30:00' equals
    '2002-03-25 01:30:00' — and an asymmetric pair reproduces the
    reference's day-part-in-seconds fraction
    (GenericUDFMonthsBetween.java:136-141: monDiff + (sec1-sec2)/2678400
    rounded to 8 places)."""
    r = eng.sql(
        "select months_between('2002-03-24 25:30:00', "
        "'2002-03-25 01:30:00') as mb"
    ).collect()[0]
    assert r.mb == 0.0
    r = eng.sql(
        "select months_between('1995-03-02 25:30:00', '1995-02-02') as mb"
    ).collect()[0]
    # rolled: 1995-03-03 01:30:00; 1 + ((3*86400+5400)-2*86400)/2678400
    assert r.mb == pytest.approx(1.03427419, abs=1e-8)
    # add_months shares the rollover
    r = eng.sql(
        "select add_months('2014-01-31 25:00:00', 1) as am"
    ).collect()[0]
    assert str(r.am) == "2014-03-01"


def test_ctas_body_gets_semantic_rewrites(eng):
    """ADVICE #5: the lenient months_between value inside a CREATE
    TEMPORARY TABLE ... AS body matches the standalone SELECT
    (previously the body bypassed the pre-dispatch rewrites and
    yielded NULL through Spark's strict parse)."""
    eng.sql(
        "create temporary table mb_ctas_t as "
        "select months_between('2002-03-01', '2002-02-31') as mb"
    )
    try:
        # '2002-02-31' rolls to 2002-03-03: (1-3)*86400/2678400
        got = eng.sql("select mb from mb_ctas_t").collect()[0].mb
        assert got == pytest.approx(-0.06451613, abs=1e-8)
    finally:
        eng.sql("drop table mb_ctas_t")


@pytest.fixture()
def typed_mb(eng, spark):
    spark.sql("DROP TABLE IF EXISTS typed_mb_t")
    eng.sql(
        "CREATE TABLE typed_mb_t(d1 DATE, d2 DATE, ts1 TIMESTAMP, "
        "ts2 TIMESTAMP) STORED AS PARQUET"
    )
    eng.sql(
        "INSERT INTO TABLE typed_mb_t VALUES "
        "('1997-02-28', '1996-10-30', "
        "'2003-04-24 12:00:00.5', '2003-03-23 00:00:00')"
    )
    yield eng
    spark.sql("DROP TABLE IF EXISTS typed_mb_t")


def test_typed_operands_skip_lenient_normalization(typed_mb):
    """Verdict 'what's wrong #1': schema-resolved DATE operands keep
    the native intrinsic untouched; TIMESTAMP operands only gain a
    whole-second truncation — no regexp battery in the rewritten SQL."""
    eng = typed_mb
    q = "select months_between(d1, d2) as mb from typed_mb_t"
    rewritten = eng._semantic_rewrites(q)
    assert rewritten == q  # both DATE → untouched
    rewritten = eng._semantic_rewrites(
        "select months_between(ts1, ts2) as mb from typed_mb_t"
    )
    assert "regexp_extract" not in rewritten
    assert "date_trunc('SECOND', ts1)" in rewritten
    q2 = "select add_months(d1, 1) as am from typed_mb_t"
    assert eng._semantic_rewrites(q2) == q2
    q3 = "select add_months(ts1, 1) as am from typed_mb_t"
    assert eng._semantic_rewrites(q3) == q3
    # string literals keep the lenient parse
    assert "regexp_extract" in eng._semantic_rewrites(
        "select months_between('2002-03-01', '2002-02-31') as mb"
    )


def test_string_in_numeric_subquery_compares_at_double(eng, spark):
    """lineage3.q: ``key IN (SELECT key+18 ...)`` — Hive resolves the
    string-vs-numeric pair at DOUBLE (the golden's UDFToDouble
    predicate edges); Spark's IN-subquery coercion compares at STRING
    ('146' vs '146.0' never matches → silent empty result)."""
    spark.createDataFrame(
        [("128", "v128"), ("146", "v146"), ("", "")],
        "key string, value string",
    ).createOrReplaceTempView("in_subq_t")
    try:
        got = eng.sql(
            "select key, value from in_subq_t "
            "where key in (select key+18 from in_subq_t) order by key"
        ).collect()
        assert [(r.key, r.value) for r in got] == [("146", "v146")]
        # NOT IN over a list containing NULL ('' + 18) stays empty —
        # standard three-valued semantics, same in Hive
        got = eng.sql(
            "select key from in_subq_t "
            "where key not in (select key+18 from in_subq_t)"
        ).collect()
        assert got == []
    finally:
        spark.catalog.dropTempView("in_subq_t")


def test_abs_narrow_ints_promote_to_int(eng, spark):
    """vectorization_nested_udf.q: Hive's abs evaluates BYTE/SHORT at
    INT width (GenericUDFAbs.java:80-86) — abs(tinyint -128) is 128,
    where Spark's native abs wraps at the byte width to -128."""
    spark.createDataFrame(
        [(-128, -32768), (5, 7)], "t tinyint, s smallint"
    ).createOrReplaceTempView("abs_t")
    try:
        r = eng.sql(
            "select sum(abs(t)) st, sum(abs(s)) ss from abs_t"
        ).collect()[0]
        assert (r.st, r.ss) == (133, 32775)
    finally:
        spark.catalog.dropTempView("abs_t")


def test_typed_timestamp_truncates_to_whole_seconds(typed_mb):
    """The reference counts the timestamp day-part in whole SECONDS
    (getDayPartInSec) — a .5s fraction must not leak into the result
    the way Spark's native microsecond months_between would have it."""
    eng = typed_mb
    got = eng.sql(
        "select months_between(ts1, ts2) as mb from typed_mb_t"
    ).collect()[0].mb
    # 1 + ((24*86400+43200) - 23*86400)/2678400 = 1.04838710 (fraction
    # dropped); native-with-fraction would round to 1.04838729
    assert got == pytest.approx(1.04838710, abs=1e-8)
    got = eng.sql(
        "select months_between(d1, d2) as mb from typed_mb_t"
    ).collect()[0].mb
    # 1997-02-28 vs 1996-10-30: monDiff=4, (28-30)*86400/2678400
    assert got == pytest.approx(4 - 2 * 86400 / 2678400, abs=1e-7)
