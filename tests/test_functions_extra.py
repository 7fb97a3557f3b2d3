"""Literal-value unit tests for functions without a portable DuckDB
oracle (xpath family, sentences, format_number, conv, soundex, crc32,
factorial, aes round-trip, parse_url, next_day, from_utc_timestamp,
bround) — the TestGenericUDF* pattern from the reference
(ql/src/test/.../udf/generic/)."""

from __future__ import annotations


def _one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


def test_xpath_family(spark):
    xml = "'<a><b>b1</b><b>b2</b><c>3</c></a>'"
    assert _one(spark, f"xpath({xml}, 'a/b/text()')") == ["b1", "b2"]
    assert _one(spark, f"xpath_string({xml}, 'a/c')") == "3"
    assert _one(spark, f"xpath_int({xml}, 'a/c')") == 3
    assert _one(spark, f"xpath_long({xml}, 'a/c')") == 3
    assert _one(spark, f"xpath_double({xml}, 'a/c')") == 3.0
    assert _one(spark, f"xpath_boolean({xml}, 'a/c = 3')") is True
    assert _one(spark, f"xpath_short({xml}, 'a/c')") == 3


def test_sentences(spark):
    got = _one(spark, "sentences('Hello there! How are you?')")
    assert [list(s) for s in got] == [["Hello", "there"], ["How", "are", "you"]]


def test_format_number_and_printf(spark):
    assert _one(spark, "format_number(1234567.891, 2)") == "1,234,567.89"
    assert _one(spark, "printf('%d-%s-%.1f', 7, 'x', CAST(2.5 AS DOUBLE))") == "7-x-2.5"


def test_conv_bin_hex(spark):
    assert _one(spark, "conv('ff', 16, 10)") == "255"
    assert _one(spark, "conv('255', 10, 2)") == "11111111"
    assert _one(spark, "bin(5)") == "101"
    assert _one(spark, "hex(255)") == "FF"
    assert _one(spark, "unhex('4142')") == bytearray(b"AB")


def test_soundex_levenshtein(spark):
    assert _one(spark, "soundex('Robert')") == "R163"
    assert _one(spark, "soundex('Rupert')") == "R163"
    assert _one(spark, "levenshtein('kitten', 'sitting')") == 3


def test_crc32_factorial(spark):
    assert _one(spark, "crc32('ABC')") == 2743272264
    assert _one(spark, "factorial(10)") == 3628800


def test_aes_roundtrip(spark):
    got = _one(
        spark,
        "CAST(aes_decrypt(aes_encrypt('secret', '0000111122223333'), "
        "'0000111122223333') AS STRING)",
    )
    assert got == "secret"


def test_parse_url(spark):
    url = "'https://h.example.com/p/q?k=v&x=1#f'"
    assert _one(spark, f"parse_url({url}, 'HOST')") == "h.example.com"
    assert _one(spark, f"parse_url({url}, 'PATH')") == "/p/q"
    assert _one(spark, f"parse_url({url}, 'QUERY', 'x')") == "1"
    assert _one(spark, f"parse_url({url}, 'REF')") == "f"
    assert _one(spark, f"parse_url({url}, 'PROTOCOL')") == "https"


def test_next_day_last_day(spark):
    assert str(_one(spark, "next_day(DATE '2024-06-12', 'MON')")) == "2024-06-17"
    assert str(_one(spark, "last_day(DATE '2024-02-05')")) == "2024-02-29"


def test_utc_timestamp_conversions(spark):
    assert (
        str(_one(spark, "from_utc_timestamp(TIMESTAMP '2024-01-01 00:00:00', 'PST')"))
        == "2023-12-31 16:00:00"
    )
    assert (
        str(_one(spark, "to_utc_timestamp(TIMESTAMP '2023-12-31 16:00:00', 'PST')"))
        == "2024-01-01 00:00:00"
    )


def test_bround_vs_round(spark):
    # bround = HALF_EVEN (banker's); round = HALF_UP (Hive semantics)
    assert _one(spark, "round(2.5)") == 3
    assert _one(spark, "bround(2.5)") == 2
    assert _one(spark, "bround(3.5)") == 4


def test_str_split_regex_edge(spark):
    assert _one(spark, "split('a1b2c', '[0-9]')") == ["a", "b", "c"]
    assert _one(spark, "split('abc', '')")[:3] == ["a", "b", "c"]


def test_json_tuple_multi(spark):
    rows = spark.sql(
        """SELECT j.* FROM (SELECT '{"a":1,"b":"x"}' AS js) t
           LATERAL VIEW json_tuple(js, 'a', 'b') j AS a, b"""
    ).collect()
    assert (rows[0].a, rows[0].b) == ("1", "x")


def test_get_json_object_nested(spark):
    assert (
        _one(spark, """get_json_object('{"a":{"b":[1,2,3]}}', '$.a.b[1]')""")
        == "2"
    )


def test_map_keys_values_size(spark):
    assert _one(spark, "sort_array(map_keys(map('a',1,'b',2)))") == ["a", "b"]
    assert sorted(_one(spark, "map_values(map('a',1,'b',2))")) == [1, 2]
    assert _one(spark, "size(map('a',1))") == 1
    assert _one(spark, "size(array(1,2,3))") == 3
    # size(NULL) = -1: Hive's GenericUDFSize semantics (the session's
    # non-ANSI mode keeps Spark's legacy sizeOfNull behavior — exact parity)
    assert _one(spark, "size(CAST(NULL AS ARRAY<INT>))") == -1


def test_hive_virtual_column_input_file_name(spark, sf_dir):
    """Hive's INPUT__FILE__NAME virtual column (parse/VirtualColumn.java)
    rewrites to Spark's input_file_name() through Engine.sql."""
    from hive_2_3_2_spark import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    rows = eng.sql(
        "SELECT DISTINCT regexp_extract(INPUT__FILE__NAME,"
        " '([a-z]+)\\\\.parquet', 1) AS f FROM nation"
    ).collect()
    assert [r.f for r in rows] == ["nation"]
