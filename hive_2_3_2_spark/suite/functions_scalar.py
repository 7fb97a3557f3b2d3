"""Scalar-function surface (SURVEY §2.9 — FunctionRegistry.java:193-536).

Wide SELECTs, each covering a function family on real columns, oracle-
checked where DuckDB has portable equivalents. Functions whose semantics
differ textually between engines (format_number, parse_url, sentences,
hash, ...) are pinned by literal-value unit tests in
tests/test_functions.py instead — same split the reference makes between
.q files and TestGenericUDF* unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.suite import query


@query(
    "fn_string_family",
    oracle="""
    SELECT c_custkey,
           concat(c_name, '#', c_mktsegment)          AS cat,
           upper(c_name)                              AS up,
           lower(c_mktsegment)                        AS lo,
           substr(c_name, 1, 8)                       AS pre,
           CAST(length(c_name) AS INT)                AS len,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0')   AS padded,
           rpad(c_mktsegment, 12, '.')                AS rpadded,
           reverse(c_mktsegment)                      AS rev,
           replace(c_name, 'Customer', 'Cust')        AS repl,
           trim('  ' || c_mktsegment || ' ')          AS trimmed,
           CAST(strpos(c_name, '#') AS INT)           AS hashpos,
           split_part(c_name, '#', 2)                 AS name_num,
           concat_ws('|', c_mktsegment, c_name)       AS joined,
           repeat('ab', 3)                            AS rep,
           ascii(c_mktsegment)                        AS asc_first,
           left(c_mktsegment, 3)                      AS l3,
           right(c_mktsegment, 3)                     AS r3,
           CAST(levenshtein(c_mktsegment, 'MACHINERY') AS INT) AS lev,
           translate(c_mktsegment, 'AEIOU', 'aeiou')  AS transl,
           CAST(starts_with(c_name, 'Customer') AS BOOLEAN) AS sw,
           CAST(contains(c_name, '42') AS BOOLEAN)    AS has42
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions (FunctionRegistry.java:193-284): concat, upper,
    lower, substr, length, lpad, rpad, reverse, replace, trim, instr,
    split+element, concat_ws, repeat, ascii, levenshtein, translate ...
    All JVM-native (whole-stage codegen) — no Python in the hot path."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat("c_name", F.lit("#"), "c_mktsegment").alias("cat"),
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("pre"),
        F.length("c_name").alias("len"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.rpad("c_mktsegment", 12, ".").alias("rpadded"),
        F.reverse("c_mktsegment").alias("rev"),
        F.replace("c_name", F.lit("Customer"), F.lit("Cust")).alias("repl"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "trimmed"
        ),
        F.instr("c_name", "#").alias("hashpos"),
        F.split("c_name", "#").getItem(1).alias("name_num"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("joined"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.ascii("c_mktsegment").alias("asc_first"),
        F.substring("c_mktsegment", 1, 3).alias("l3"),
        F.substring("c_mktsegment", -3, 3).alias("r3"),
        F.levenshtein("c_mktsegment", F.lit("MACHINERY")).alias("lev"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("transl"),
        F.startswith("c_name", F.lit("Customer")).alias("sw"),
        F.contains("c_name", F.lit("42")).alias("has42"),
    )


@query(
    "fn_regex_family",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1)                   AS first_word,
           regexp_replace(text, '\\s+', '_', 'g')                AS underscored,
           CAST(regexp_matches(text, 'spark|hive') AS BOOLEAN)   AS mentions_engine,
           CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS INT)
             AS n_letters
    FROM documents
    WHERE doc_id < 100
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE/RLIKE/regexp family (FunctionRegistry.java:274-277:
    regexp_replace, regexp_extract, rlike)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", r"\s+", "_").alias("underscored"),
        F.col("text").rlike("spark|hive").alias("mentions_engine"),
        F.length(F.regexp_replace("text", "[^a-z]", "")).alias("n_letters"),
    )


@query(
    "fn_math_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1)                       AS r1,
           CAST(FLOOR(l_extendedprice) AS BIGINT)          AS fl,
           CAST(CEIL(l_extendedprice) AS BIGINT)           AS ce,
           ABS(l_discount - 0.05)                          AS ab,
           ROUND(SQRT(l_quantity), 6)                      AS sq,
           ROUND(EXP(l_discount), 6)                       AS ex,
           ROUND(LN(l_extendedprice), 6)                   AS lg,
           ROUND(LOG10(l_extendedprice), 6)                AS lg10,
           ROUND(LOG2(l_quantity), 6)                      AS lg2,
           ROUND(POW(l_quantity, 2), 2)                    AS p2,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE)         AS sg,
           l_orderkey % 7                                  AS md,
           ((l_orderkey % 7) + 7) % 7                      AS pmd,
           ROUND(SIN(l_discount), 6)                       AS sn,
           ROUND(COS(l_discount), 6)                       AS cs,
           ROUND(ATAN(l_discount), 6)                      AS at,
           ROUND(DEGREES(l_discount), 6)                   AS dg,
           ROUND(RADIANS(l_quantity), 6)                   AS rd,
           CAST(l_quantity AS INT) // 7                    AS intdiv,
           ROUND(CBRT(l_extendedprice), 6)                 AS cb,
           ROUND(GREATEST(l_discount, l_tax), 2)           AS gr,
           ROUND(LEAST(l_discount, l_tax), 2)              AS le
    FROM lineitem WHERE l_orderkey < 300
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions (FunctionRegistry.java:207-253): round floor ceil abs
    sqrt exp ln log10 log2 pow sign mod pmod sin cos atan degrees radians
    integer div cbrt greatest least."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        F.floor("l_extendedprice").alias("fl"),
        F.ceil("l_extendedprice").alias("ce"),
        F.abs(F.col("l_discount") - 0.05).alias("ab"),
        F.round(F.sqrt("l_quantity"), 6).alias("sq"),
        F.round(F.exp("l_discount"), 6).alias("ex"),
        F.round(F.log("l_extendedprice"), 6).alias("lg"),
        F.round(F.log10("l_extendedprice"), 6).alias("lg10"),
        F.round(F.log2("l_quantity"), 6).alias("lg2"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("p2"),
        F.signum(F.col("l_discount") - 0.05).alias("sg"),
        (F.col("l_orderkey") % 7).alias("md"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("pmd"),
        F.round(F.sin("l_discount"), 6).alias("sn"),
        F.round(F.cos("l_discount"), 6).alias("cs"),
        F.round(F.atan("l_discount"), 6).alias("at"),
        F.round(F.degrees("l_discount"), 6).alias("dg"),
        F.round(F.radians("l_quantity"), 6).alias("rd"),
        F.expr("CAST(l_quantity AS INT) div 7").alias("intdiv"),
        F.round(F.cbrt("l_extendedprice"), 6).alias("cb"),
        F.round(F.greatest("l_discount", "l_tax"), 2).alias("gr"),
        F.round(F.least("l_discount", "l_tax"), 2).alias("le"),
    )


@query(
    "fn_datetime_family",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT)          AS yr,
           CAST(MONTH(o_orderdate) AS INT)         AS mo,
           CAST(DAY(o_orderdate) AS INT)           AS dy,
           CAST(QUARTER(o_orderdate) AS INT)       AS qt,
           CAST(DAYOFWEEK(o_orderdate) + 1 AS INT) AS dow,
           CAST(WEEKOFYEAR(o_orderdate) AS INT)    AS wk,
           CAST(date_trunc('month', o_orderdate) AS DATE)   AS mstart,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)      AS due,
           CAST(o_orderdate - INTERVAL 1 MONTH AS DATE)     AS prevm,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS eom,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS age_days,
           strftime(o_orderdate, '%Y-%m')          AS ym
    FROM orders WHERE o_orderkey < 500
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions (FunctionRegistry.java:289-320): year month day
    quarter dayofweek weekofyear date_trunc date_add add_months last_day
    datediff date_format. DuckDB dayofweek is 0-based Sunday vs Hive/Spark
    1-based — oracle shifts by 1."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dy"),
        F.quarter(d).alias("qt"),
        F.dayofweek(d).alias("dow"),
        F.weekofyear(d).alias("wk"),
        F.date_trunc("month", d).cast("date").alias("mstart"),
        F.date_add(d.cast("date"), 30).alias("due"),
        F.add_months(d.cast("date"), -1).alias("prevm"),
        F.last_day(d.cast("date")).alias("eom"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).cast(
            "long"
        ).alias("age_days"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


@query(
    "fn_conditional_family",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 400000 THEN 'high'
                WHEN o_totalprice > 200000 THEN 'mid'
                ELSE 'low' END                                   AS bucket,
           CASE o_orderstatus WHEN 'F' THEN 'final'
                              WHEN 'O' THEN 'open' ELSE 'other' END AS status,
           COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'),
                    'unspecified')                               AS prio,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END       AS is_final,
           CAST(o_totalprice BETWEEN 100000 AND 200000 AS BOOLEAN) AS in_band,
           CAST(o_orderstatus IN ('F', 'P') AS BOOLEAN)          AS closed_ish,
           CAST(o_orderpriority IS NOT NULL AS BOOLEAN)          AS has_prio
    FROM orders WHERE o_orderkey < 1000
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditionals (FunctionRegistry.java:358-377, 462-466): CASE (both
    forms), if, coalesce, nullif, between, in, isnotnull."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(tp > 400000, "high").when(tp > 200000, "mid").otherwise("low").alias(
            "bucket"
        ),
        F.when(F.col("o_orderstatus") == "F", "final")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status"),
        F.coalesce(
            F.nullif("o_orderpriority", F.lit("4-NOT SPECIFIED")),
            F.lit("unspecified"),
        ).alias("prio"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_final"),
        tp.between(100000, 200000).alias("in_band"),
        F.col("o_orderstatus").isin("F", "P").alias("closed_ish"),
        F.col("o_orderpriority").isNotNull().alias("has_prio"),
    )


@query(
    "fn_hash_codec_family",
    oracle="""
    SELECT doc_id,
           md5(text)                                        AS h_md5,
           sha256(text)                                     AS h_sha2,
           to_base64(encode(source))                        AS b64,
           decode(from_base64(to_base64(encode(source))))   AS b64_rt,
           to_hex(doc_id)                                   AS hx
    FROM documents WHERE doc_id < 50
    """,
)
def fn_hash_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/codec functions (FunctionRegistry.java:243-256): md5, sha2,
    base64/unbase64, hex. (Hive's ObjectInspector `hash` is engine-
    internal — excluded from parity per SURVEY §2.9.)"""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha2"),
        F.base64(F.col("source").cast("binary")).alias("b64"),
        F.unbase64(F.base64(F.col("source").cast("binary")))
        .cast("string")
        .alias("b64_rt"),
        F.hex("doc_id").alias("hx"),
    )


@query(
    "fn_complex_types",
    oracle="""
    SELECT n_nationkey,
           CAST(len([n_name, upper(n_name), 'x']) AS INT)     AS arr_len,
           [n_name, upper(n_name), 'x'][1]                    AS arr_first,
           CAST(list_contains([n_name, upper(n_name)], n_name) AS BOOLEAN)
             AS has_name,
           array_to_string(list_sort([upper(n_name), n_name, 'x']), ',')
             AS sorted_arr,
           struct_pack(k := n_nationkey, nm := n_name).nm     AS st_field,
           map_from_entries([(n_name, n_nationkey)])[n_name][1] AS mp_val,
           CAST(list_position([10, 20, 30], 20) AS INT)       AS arr_pos,
           array_to_string(list_distinct(list_sort(
             list_concat([n_name], [n_name, upper(n_name)]))), ',') AS arr_union
    FROM nation
    """,
)
def fn_complex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-type constructors/accessors (FunctionRegistry.java:454-478):
    array, size, index ([]), array_contains, sort_array, named_struct, map
    access, array_position, concat+distinct. Nested values are projected to
    scalars for the engine-agnostic hash compare; the nested *types*
    themselves (ArrayType/StructType/MapType — SURVEY §1.3) round-trip in
    tests/test_functions.py."""
    n = load_table(spark, sf_dir, "nation")
    arr = F.array("n_name", F.upper("n_name"), F.lit("x"))
    st = F.named_struct(F.lit("k"), F.col("n_nationkey"), F.lit("nm"), F.col("n_name"))
    return n.select(
        "n_nationkey",
        F.size(arr).alias("arr_len"),
        arr.getItem(0).alias("arr_first"),
        F.array_contains(F.array("n_name", F.upper("n_name")), F.col("n_name")).alias(
            "has_name"
        ),
        F.array_join(
            F.sort_array(F.array(F.upper("n_name"), F.col("n_name"), F.lit("x"))), ","
        ).alias("sorted_arr"),
        st.getField("nm").alias("st_field"),
        F.create_map(F.col("n_name"), F.col("n_nationkey"))
        .getItem(F.col("n_name"))
        .alias("mp_val"),
        F.array_position(F.array(F.lit(10), F.lit(20), F.lit(30)), 20)
        .cast("int")
        .alias("arr_pos"),
        F.array_join(
            F.array_distinct(
                F.sort_array(
                    F.concat(
                        F.array("n_name"), F.array("n_name", F.upper("n_name"))
                    )
                )
            ),
            ",",
        ).alias("arr_union"),
    )


@query(
    "fn_cast_coercion",
    oracle="""
    SELECT l_orderkey,
           CAST(l_quantity AS INT)        AS qty_int,
           CAST(l_quantity AS VARCHAR)    AS qty_str,
           CAST(l_orderkey AS DOUBLE)     AS key_dbl,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_str,
           CAST('42' AS INT)              AS s2i,
           CAST('3.5' AS DOUBLE)          AS s2d,
           CAST(l_quantity > 25 AS INT)   AS b2i
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast surface (FunctionRegistry.java:388-404) with Hive's permissive
    (non-ANSI) coercions — session pins spark.sql.ansi.enabled=false."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_quantity").cast("string").alias("qty_str"),
        F.col("l_orderkey").cast("double").alias("key_dbl"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_str"),
        F.lit("42").cast("int").alias("s2i"),
        F.lit("3.5").cast("double").alias("s2d"),
        (F.col("l_quantity") > 25).cast("int").alias("b2i"),
    )
