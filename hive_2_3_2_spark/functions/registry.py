"""The full Hive-2.3.2 function registry mapped to this engine.

Source of truth: every registration in the reference's
ql/src/java/org/apache/hadoop/hive/ql/exec/FunctionRegistry.java:193-536
(SURVEY §2.9 enumerates them by category). Each entry maps the Hive
function name to how this engine provides it:

- ("sql", name)   — native Spark SQL function, same name/semantics
                    (callable via spark.sql or F.expr);
- ("sql", other)  — native Spark SQL function under a different name;
- ("gap", where)  — implemented in this package (functions/gaps.py) or
                    as a documented pattern;
- ("skip", why)   — engine-internal to Hive, not part of the query
                    surface (ewah bitmaps, LLAP splits, ...).

tests/test_functions.py asserts every ("sql", ...) name actually resolves
in the running Spark session, so this table can't rot silently.
"""

from __future__ import annotations

_SQL_SAME = [
    # strings (FunctionRegistry.java:193-284)
    "concat", "substr", "substring", "substring_index", "space", "repeat",
    "ascii", "lpad", "rpad", "levenshtein", "soundex", "size", "upper",
    "ucase", "lower", "lcase", "trim", "ltrim", "rtrim", "length",
    "character_length", "char_length", "octet_length", "reverse",
    "find_in_set", "initcap", "like", "rlike", "regexp_replace", "replace",
    "regexp_extract", "parse_url", "nvl", "split", "str_to_map",
    "translate", "instr", "locate", "elt", "concat_ws", "sentences",
    "format_number", "printf",
    # math (:207-253)
    "round", "bround", "floor", "sqrt", "cbrt", "ceil", "ceiling", "rand",
    "abs", "pmod", "ln", "log2", "log10", "log", "exp", "power", "pow",
    "sign", "pi", "degrees", "radians", "sin", "asin", "cos", "acos",
    "tan", "atan", "e", "factorial", "conv", "bin", "hex", "unhex", "crc32",
    # hash/codec (:243-256, 465)
    "md5", "sha1", "sha", "sha2", "aes_encrypt", "aes_decrypt", "base64",
    "unbase64", "encode", "decode", "uuid", "chr",
    # datetime (:289-320, 353-354, 485-489)
    "day", "dayofmonth", "dayofweek", "month", "quarter", "year", "hour",
    "minute", "second", "from_unixtime", "to_date", "weekofyear",
    "last_day", "next_day", "trunc", "date_format", "date_add", "date_sub",
    "datediff", "add_months", "months_between", "from_utc_timestamp",
    "to_utc_timestamp", "unix_timestamp", "to_unix_timestamp",
    "current_date", "current_timestamp",
    # json/xml (:322-332)
    "get_json_object", "xpath", "xpath_string", "xpath_boolean",
    "xpath_double", "xpath_number", "xpath_float", "xpath_long",
    "xpath_int", "xpath_short",
    # operators & conditionals (:286-287, 334-377, 450-491)
    "positive", "negative", "mod", "div", "shiftleft", "shiftright",
    "shiftrightunsigned", "isnull", "isnotnull", "if", "in", "between",
    "nullif", "coalesce", "greatest", "least", "assert_true", "when",
    # complex types (:454-478)
    "array", "map", "struct", "named_struct", "sort_array",
    "array_contains", "map_keys", "map_values",
    # aggregates (:407-446)
    "max", "min", "sum", "count", "avg", "std", "stddev", "stddev_pop",
    "stddev_samp", "variance", "var_pop", "var_samp", "covar_pop",
    "covar_samp", "corr", "histogram_numeric", "percentile_approx",
    "collect_set", "collect_list", "percentile",
    "regr_slope", "regr_intercept", "regr_r2", "regr_sxx", "regr_syy",
    "regr_sxy", "regr_avgx", "regr_avgy", "regr_count",
    # windowing (:503-515)
    "lead", "lag", "row_number", "rank", "dense_rank", "percent_rank",
    "cume_dist", "ntile", "first_value", "last_value",
    # UDTFs (:493-500)
    "explode", "posexplode", "inline", "stack", "json_tuple",
    # misc (:350-384)
    "grouping", "current_database", "current_user", "version",
    "java_method", "reflect",
    # masking (:531-536) — native in Spark 3.4+
    "mask",
]

_SQL_RENAMED = {
    # hive name -> spark sql name
    "regexp": "rlike",                    # FunctionRegistry.java:276
    "$sum0": "sum",                       # :411 (sum-or-zero internal)
    "ewah_bitmap": None,                  # placeholder, see _SKIP
    "context_ngrams": None,
    "floor_year": "date_trunc",           # :299-310 Druid granularities
    "floor_quarter": "date_trunc",
    "floor_month": "date_trunc",
    "floor_week": "date_trunc",
    "floor_day": "date_trunc",
    "floor_hour": "date_trunc",
    "floor_minute": "date_trunc",
    "floor_second": "date_trunc",
    "logged_in_user": "current_user",     # :352
    "pi": "pi",
}

_GAPS = {
    # hive name -> functions/gaps.py symbol or pattern
    "hash": "Engine._rewrite_hive_hash — Hive's getBucketHashCode "
            "31-fold over per-type hashCode (GenericUDFHash; "
            "ObjectInspectorUtils.java:633-707), NOT Spark's Murmur3: "
            "typed pre-dispatch rewrite + the __hive_hash_* Arrow UDF "
            "family (functions/hive_hash.py); unresolvable operand "
            "types fall back to Spark's native hash (documented)",
    "compute_stats": "Engine._rewrite_compute_stats — the direct "
                     "spelling of the internal stats UDAF "
                     "(GenericUDAFComputeStats, FunctionRegistry.java"
                     ":441) expands pre-dispatch to a type-dispatched "
                     "named_struct of native aggregates; NDV via "
                     "approx_count_distinct standing in for the FM "
                     "sketch estimate",
    "ngrams": "hive_2_3_2_spark.functions.gaps.ngrams",
    "context_ngrams": "hive_2_3_2_spark.functions.gaps.context_ngrams",
    "field": "hive_2_3_2_spark.functions.gaps.field",
    "in_file": "hive_2_3_2_spark.functions.gaps.in_file_join",
    "parse_url_tuple": "hive_2_3_2_spark.functions.gaps.parse_url_tuple",
    "sort_array_by": "hive_2_3_2_spark.functions.gaps.sort_array_by",
    "create_union": "hive_2_3_2_spark.functions.gaps.create_union",
    "extract_union": "hive_2_3_2_spark.functions.gaps.extract_union",
    "mask_hash": (
        "gaps.mask_hash (md5, Hive 2.3 parity); SQL-callable via "
        "engine.py _rewrite_mask_family"
    ),
    "mask_first_n": (
        "gaps.mask_first_n; SQL-callable via _rewrite_mask_family"
    ),
    "mask_show_first_n": (
        "gaps.mask_show_first_n; SQL-callable via _rewrite_mask_family"
    ),
    "mask_last_n": "SQL-callable via engine.py _rewrite_mask_family",
    "mask_show_last_n": "SQL-callable via engine.py _rewrite_mask_family",
    "matchpath": "hive_2_3_2_spark.operators.ptf.match_path (applyInPandas)",
    "replicate_rows": (
        "engine.py _rewrite_replicate_rows: SQL-callable form rewrites "
        "to inline(array_repeat(struct(...), greatest(0, n)))"
    ),
    "interval_year_month": (
        "engine.py _rewrite_interval_ctors → CAST(x AS INTERVAL YEAR "
        "TO MONTH) (GenericUDFToIntervalYearMonth, "
        "FunctionRegistry.java:399)"
    ),
    "interval_day_time": (
        "engine.py _rewrite_interval_ctors → CAST(x AS INTERVAL DAY "
        "TO SECOND) (GenericUDFToIntervalDayTime, "
        "FunctionRegistry.java:400)"
    ),
}

_SKIP = {
    # engine-internal, not user query surface
    "ewah_bitmap": "internal bitmap-index UDAF (indexes dropped in 2.3)",
    "ewah_bitmap_and": "internal",
    "ewah_bitmap_or": "internal",
    "ewah_bitmap_empty": "internal",
    "get_splits": "LLAP-internal (FunctionRegistry.java:500)",
    "sq_count_check": "Catalyst enforces scalar-subquery cardinality itself",
    "cardinality_violation": "ACID MERGE guard — engine-internal",
    "internal_interval": "parser-internal",
    "in_bloom_filter": "Spark injects runtime bloom filters automatically",
    "bloom_filter": "same",
    "noop": "PTF test helper", "noopwithmap": "PTF test helper",
    "noopstreaming": "PTF test helper",
    "windowingtablefunction": "implicit in Window exprs",
    "reflect2": "JVM reflection escape hatch — security-excluded",
}


def hive_function_map() -> dict[str, tuple[str, str | None]]:
    """name → ("sql"|"gap"|"skip", detail). Covers every FunctionRegistry
    registration category from SURVEY §2.9."""
    out: dict[str, tuple[str, str | None]] = {}
    for name in _SQL_SAME:
        out[name] = ("sql", name)
    for hive_name, spark_name in _SQL_RENAMED.items():
        if spark_name is not None and hive_name not in out:
            out[hive_name] = ("sql", spark_name)
    for name, where in _GAPS.items():
        out[name] = ("gap", where)
    for name, why in _SKIP.items():
        out.setdefault(name, ("skip", why))
    return out
