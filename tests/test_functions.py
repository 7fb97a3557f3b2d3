"""Unit tests for the function surface: gap implementations against
literal expected values (mirrors the reference's TestGenericUDF* pattern,
ql/src/test/.../udf/generic/), plus registry resolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_2_3_2_spark.functions import (
    context_ngrams,
    create_union,
    extract_union,
    field,
    hive_function_map,
    in_file_join,
    mask,
    mask_first_n,
    mask_hash,
    mask_show_first_n,
    ngrams,
    parse_url_tuple,
    sort_array_by,
)


def test_registry_sql_names_resolve(spark):
    unresolved = []
    for name, (kind, detail) in hive_function_map().items():
        if kind == "sql":
            try:
                spark.sql(f"DESCRIBE FUNCTION `{detail}`")
            except Exception:
                unresolved.append((name, detail))
    assert not unresolved, f"registry names not in Spark: {unresolved}"


def test_ngrams_counts(spark):
    df = spark.createDataFrame(
        [("a b a b c",), ("a b x",)], ["text"]
    ).select(F.split("text", " ").alias("toks"))
    out = {r.ngram: r.estfrequency for r in ngrams(df, F.col("toks"), 2, 10).collect()}
    assert out["a b"] == 3.0
    assert out["b a"] == 1.0
    assert out["b c"] == 1.0
    assert out["b x"] == 1.0


def test_ngrams_short_documents_yield_no_grams(spark):
    """Regression: documents with fewer than n tokens (incl. empty arrays)
    must contribute zero n-grams, not crash — sequence(0,-1) is [0,-1] in
    Spark, and the -1 start made slice() throw."""
    df = spark.createDataFrame(
        [("one",), ("",), ("a b c",)], ["text"]
    ).select(F.split("text", " ").alias("toks"))
    out = {r.ngram: r.estfrequency for r in ngrams(df, F.col("toks"), 2, 10).collect()}
    assert out == {"a b": 1.0, "b c": 1.0}
    # context form on the same short docs: no crash, only full-length windows
    ctx = context_ngrams(df, F.col("toks"), ["a", None, "c"], 5).collect()
    assert [(r.ngram, r.estfrequency) for r in ctx] == [("b", 1.0)]


def test_context_ngrams(spark):
    df = spark.createDataFrame(
        [("i love spark",), ("i love sql",), ("i love spark",)], ["text"]
    ).select(F.split("text", " ").alias("toks"))
    out = context_ngrams(df, F.col("toks"), ["i", "love", None], 5).collect()
    assert out[0].ngram == "spark" and out[0].estfrequency == 2.0
    assert out[1].ngram == "sql" and out[1].estfrequency == 1.0


def test_field(spark):
    df = spark.createDataFrame([("b",), ("z",)], ["v"])
    rows = df.select(
        field(F.col("v"), F.lit("a"), F.lit("b"), F.lit("c")).alias("f")
    ).collect()
    assert [r.f for r in rows] == [2, 0]


def test_in_file_join(spark, tmp_path):
    p = tmp_path / "allow.txt"
    p.write_text("alice\nbob\n")
    df = spark.createDataFrame([("alice",), ("eve",)], ["user"])
    rows = in_file_join(df, F.col("user"), str(p)).collect()
    got = {r.user: r.in_file for r in rows}
    assert got == {"alice": True, "eve": False}


def test_parse_url_tuple(spark):
    df = spark.createDataFrame(
        [("https://example.com:8080/a/b?x=1&y=2#frag",)], ["url"]
    )
    row = df.select(
        *parse_url_tuple(F.col("url"), "HOST", "PATH", "QUERY", "QUERY:y")
    ).collect()[0]
    assert row.host == "example.com"
    assert row.path == "/a/b"
    assert row.query == "x=1&y=2"
    assert row.query_y == "2"


def test_sort_array_by(spark):
    df = spark.createDataFrame([(1,)], ["id"]).select(
        F.array(
            F.struct(F.lit(2).alias("a"), F.lit("x").alias("b")),
            F.struct(F.lit(1).alias("a"), F.lit("z").alias("b")),
            F.struct(F.lit(1).alias("a"), F.lit("y").alias("b")),
        ).alias("arr")
    )
    out = df.select(sort_array_by(F.col("arr"), "a", "b").alias("s")).collect()[0].s
    assert [(r.a, r.b) for r in out] == [(1, "y"), (1, "z"), (2, "x")]


def test_union_type_encoding(spark):
    df = spark.createDataFrame([(0, 42, "hi"), (1, 7, "yo")], ["tag", "i", "s"])
    u = df.select(
        create_union(F.col("tag"), F.col("i"), F.col("s")).alias("u")
    )
    rows = u.select(
        extract_union(F.col("u"), 0).alias("as_int"),
        extract_union(F.col("u"), 1).alias("as_str"),
        F.col("u.tag").alias("tag"),
    ).collect()
    assert (rows[0].as_int, rows[0].as_str, rows[0].tag) == (42, None, 0)
    assert (rows[1].as_int, rows[1].as_str, rows[1].tag) == (None, "yo", 1)


def test_masking(spark):
    df = spark.createDataFrame([("Abc123-xy",)], ["s"])
    row = df.select(
        mask(F.col("s")).alias("m"),
        mask_hash(F.col("s")).alias("h"),
        mask_show_first_n(F.col("s"), 4).alias("sf"),
        mask_first_n(F.col("s"), 4).alias("mf"),
    ).collect()[0]
    assert row.m == "Xxxnnn-xx"
    assert len(row.h) == 32  # md5 hex (Hive 2.3's GenericUDFMaskHash)
    assert row.sf == "Abc1nn-xx"
    assert row.mf == "Xxxn23-xy"


def test_hive_div_and_coercion_semantics(spark):
    """Hive permissive semantics (SURVEY §7.4): int/int → double via `/`,
    string/number comparison coerces — requires ansi off."""
    row = spark.sql(
        "SELECT 7 / 2 AS d, 7 DIV 2 AS i, '10' = 10 AS eq, "
        "CAST('abc' AS INT) AS bad"
    ).collect()[0]
    assert row.d == 3.5
    assert row.i == 3
    assert row.eq is True
    assert row.bad is None  # Hive: invalid cast → NULL, not error


def test_hive_bucket_hash_java_vectors(spark):
    """Known Java String.hashCode values (ASCII ⇒ byte fold == hashCode):
    'abc'=96354, 'hello'=99162322, ''=0; int32 wraparound goes negative
    for '1-URGENT' (-1002256291) — reference ObjectInspectorUtils.java:673."""
    from hive_2_3_2_spark.functions.hive_hash import hive_bucket_hash

    df = spark.createDataFrame(
        [("abc",), ("hello",), ("",), ("1-URGENT",), (None,)], ["s"]
    )
    got = {
        r.s: r.h
        for r in df.select("s", hive_bucket_hash("s").alias("h")).collect()
    }
    assert got["abc"] == 96354
    assert got["hello"] == 99162322
    assert got[""] == 0
    assert got["1-URGENT"] == -1002256291
    assert got[None] is None


def test_hive_bucket_hash_batch_matches_reference_fold():
    """The vectorized batch fold (left-padded byte matrix + per-column
    Horner) must equal the per-row reference fold on arbitrary strings —
    unicode multi-byte, empty, long, and int32-wraparound cases."""
    import random
    import string

    from hive_2_3_2_spark.functions.hive_hash import _hash_batch, _hash_one

    random.seed(11)
    samples = ["", "a", "abc", "héllo wörld", "日本語テキスト", "x" * 500] + [
        "".join(
            random.choices(string.printable + "éüñ日本語", k=random.randint(0, 64))
        )
        for _ in range(500)
    ]
    batch = _hash_batch(samples)
    assert [int(h) for h in batch] == [_hash_one(s) for s in samples]


def test_date_format_simpledateformat_patterns(spark):
    """udf_date_format.q: Hive's date_format is Java SimpleDateFormat —
    'Y' (week year), 'E' (day name), 'G' (era) are valid. Spark 3's
    DateTimeFormatter refuses them; the engine runs session-wide under
    spark.sql.legacy.timeParserPolicy=LEGACY (set in ENGINE_CONFS and
    re-ensured by Engine.__init__ — Spark's documented remedy, and
    exactly the Hive semantics, with no statement-order dependence)."""
    from hive_2_3_2_spark.engine import Engine

    eng = Engine(spark=spark)
    before = spark.conf.get(
        "spark.sql.legacy.timeParserPolicy", "CORRECTED"
    )
    try:
        row = eng.sql(
            "select date_format('2015-04-08', 'E') AS e, "
            "date_format('2015-04-08', 'G') AS g, "
            "date_format('2015-04-08', 'Y') AS y, "
            "date_format('2015-04-08', 'MMM') AS m, "
            "date_format(cast('2015-04-08 10:30:45' as timestamp), "
            "'HH:mm:ss') AS hms"
        ).collect()[0]
        assert (row.e, row.g, row.y, row.m, row.hms) == (
            "Wed", "AD", "2015", "Apr", "10:30:45"
        )
    finally:
        # the engine's flip is deliberately sticky for a session;
        # restore here so the shared test session stays CORRECTED
        spark.conf.set(
            "spark.sql.legacy.timeParserPolicy", before or "CORRECTED"
        )
