"""No-AS TRANSFORM default schema + hive hash parity + text-table
all-NULL rows — three REAL engine-vs-Hive divergences the r12 duck
fixture sweep exposed.

1. ``SELECT TRANSFORM(a,b,c,d) USING 'cat'`` without an AS clause:
   Hive's output schema is (key, value) with
   serialization.last.column.takes.rest=true (genScriptPlan,
   SemanticAnalyzer.java:3843-3874; PlanUtils.java:257) — value is the
   REMAINDER of the output line, embedded tabs included. Spark's native
   script transform truncates value to the second field, so input38.q's
   golden '0\\tval_0\\t3\\t7' lost '3\\t7'. Routed through the
   per-partition subprocess operator (statement-level AND the
   subquery-with-INSERT shape).
2. ``hash(...)`` is Hive's getBucketHashCode 31-fold
   (ObjectInspectorUtils.java:633-707), not Spark's Murmur3 — the join
   family's sum(hash(...)) checksums (600+ golden statements) only
   verify under the typed rewrite.
3. A TEXTFILE table written without a nullValue marker DROPS its
   all-NULL rows on read (Spark csv quirk) — input7.q's (NULL, NULL)
   row vanished. Every csv-mapped STORED AS/SERDE/INPUTFORMAT spelling
   now carries Hive's real \\N marker.
"""

from __future__ import annotations

import pytest

from hive_2_3_2_spark.engine import Engine


@pytest.fixture()
def eng(spark):
    return Engine(spark=spark)


@pytest.fixture()
def src(eng, spark, tmp_path):
    rows = [(str(i % 83), f"val_{i % 83}") for i in range(40)]
    spark.createDataFrame(rows, "key string, value string").coalesce(
        1
    ).write.parquet(str(tmp_path / "src"))
    eng.register_table("src", str(tmp_path / "src"))
    return eng


def _jhash(s: str | None) -> int:
    """Java-semantics yardstick: String.hashCode byte fold."""
    if s is None:
        return 0
    h = 0
    for b in s.encode():
        h = ((h * 31 + (b if b < 128 else b - 256)) + 2**31) % 2**32 - 2**31
    return h


def test_noas_transform_statement_level(src):
    rows = src.sql(
        "SELECT TRANSFORM(key, value, 1+2, 3+4) USING 'cat' "
        "FROM src"
    ).collect()
    assert rows[0].value.count("\t") == 2  # rest-of-line, tabs kept
    k, v = rows[0].key, rows[0].value
    assert v == f"val_{k}\t3\t7"


def test_noas_transform_subquery_insert(src, spark):
    """input38.q's exact shape — the table lands Hive's golden cells."""
    spark.sql("DROP TABLE IF EXISTS dest_t38")
    src.sql("CREATE TABLE dest_t38(key STRING, value STRING) STORED AS TEXTFILE")
    try:
        src.sql(
            "FROM (\n  FROM src\n  SELECT TRANSFORM(src.key, src.value,"
            " 1+2, 3+4)\n         USING 'cat'\n) tmap\n"
            "INSERT OVERWRITE TABLE dest_t38 SELECT tmap.key, tmap.value"
        )
        got = {
            (r.key, r.value)
            for r in src.sql("SELECT dest_t38.* FROM dest_t38").collect()
        }
        assert ("0", "val_0\t3\t7") in got
        # input18.q's follow-up projection over the default schema
        rep = src.sql(
            "FROM (\n  FROM src\n  SELECT TRANSFORM(src.key, src.value,"
            " 1+2, 3+4)\n         USING 'cat'\n  CLUSTER BY key\n) tmap\n"
            "SELECT tmap.key, regexp_replace(tmap.value,'\\t','+') AS v "
            "WHERE tmap.key < 100"
        ).collect()
        assert all(r.v.endswith("+3+7") for r in rep)
    finally:
        spark.sql("DROP TABLE IF EXISTS dest_t38")


def test_hive_hash_string_and_fold(src):
    rows = src.sql(
        "SELECT key, value, hash(key) h1, hash(key, value) h2 "
        "FROM src LIMIT 5"
    ).collect()
    for r in rows:
        assert r.h1 == _jhash(r.key)
        expect = ((31 * _jhash(r.key) + _jhash(r.value)) + 2**31) \
            % 2**32 - 2**31
        assert r.h2 == expect


def test_hive_hash_typed_operands(eng, spark):
    spark.createDataFrame(
        [(5, 2**33 + 7, 1.5, 2.5, True, None)],
        "i int, l bigint, f float, d double, b boolean, s string",
    ).createOrReplaceTempView("hh_t")
    r = eng.sql(
        "select hash(i) hi, hash(l) hl, hash(f) hf, hash(d) hd, "
        "hash(b) hb, hash(s) hs, hash(i, l) hil from hh_t"
    ).collect()[0]
    assert (r.hi, r.hl, r.hb, r.hs) == (5, 5, 1, 0)
    assert r.hf == 1069547520  # floatToIntBits(1.5f)
    assert r.hd == 1074003968  # doubleToLongBits(2.5) folded
    assert r.hil == 31 * 5 + 5
    spark.catalog.dropTempView("hh_t")


def test_hive_hash_star_expansion(src):
    """hash(*) / hash(t.*) expand to the row's columns (Hive's select
    analysis feeds GenericUDFHash the expanded row): plain table,
    qualified alias, subselect output (typed via alias hints), and the
    one-level (select * ...) recursion — the orc_llap family's
    sum(hash(*)) checksum pattern."""
    rows = [
        (r.key, r.value)
        for r in src.sql("select key, value from src").collect()
    ]

    def fold(*hs):
        h = 0
        for x in hs:
            h = ((31 * h + x) + 2**31) % 2**32 - 2**31
        return h

    want = sum(fold(_jhash(k), _jhash(v)) for k, v in rows)
    assert src.sql(
        "select sum(hash(*)) s from src"
    ).collect()[0].s == want
    assert src.sql(
        "select sum(hash(a.*)) s from src a"
    ).collect()[0].s == want
    assert src.sql(
        "select sum(hash(*)) s from (select * from src "
        "where key >= '') t"
    ).collect()[0].s == want
    per_key = {}
    for k, _v in rows:
        per_key[k] = per_key.get(k, 0) + 1
    want2 = sum(fold(_jhash(k), _hive_hash_long(c))
                for k, c in per_key.items())
    assert src.sql(
        "select sum(hash(*)) s from (select key, count(*) as c "
        "from src group by key) t"
    ).collect()[0].s == want2
    # unresolvable output stays on Spark's native hash — runs, no error
    assert src.sql(
        "select sum(hash(*)) s from (select key||'x' z from src) t"
    ).collect()[0].s is not None


def _hive_hash_long(v: int) -> int:
    a = v & 0xFFFFFFFFFFFFFFFF
    x = ((a >> 32) ^ a) & 0xFFFFFFFF
    return x - 2**32 if x >= 2**31 else x


def test_textfile_all_null_row_roundtrip(eng, spark):
    """input7.q: the (NULL, NULL) row must survive the TEXTFILE
    write/read (csv nullValue \\N on every csv-mapped format)."""
    spark.sql("DROP TABLE IF EXISTS nullrow_t")
    eng.sql("CREATE TABLE nullrow_t(c1 DOUBLE, c2 INT) STORED AS TEXTFILE")
    try:
        eng.sql(
            "INSERT INTO nullrow_t VALUES (CAST(NULL AS DOUBLE), "
            "CAST(NULL AS INT)), (NULL, 5)"
        )
        rows = eng.sql("SELECT * FROM nullrow_t").collect()
        assert len(rows) == 2
        assert sorted(r.c2 for r in rows if r.c2 is not None) == [5]
    finally:
        spark.sql("DROP TABLE IF EXISTS nullrow_t")
