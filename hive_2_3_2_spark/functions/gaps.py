"""Implementations of the Hive functions Spark lacks natively.

Each cites the reference implementation it mirrors. All are Column
expressions over pyspark.sql.functions (JVM, codegen-friendly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ngram_windows(
    tokens: Column, n: int, partial_tail: bool = False
) -> Column:
    """Space-joined word n-gram windows of a token array, LINEAR time.

    The obvious ``transform(sequence(0, size-n), i -> concat_ws(' ',
    slice(toks, i+1, n)))`` formulation is O(len²): Catalyst inlines the
    captured ``toks`` expression (usually a split/regex over the text)
    into the lambda, re-evaluating it once per OUTPUT ELEMENT (measured:
    top_ngram_share 8.4s → ~1s at sf0.1). This builds the same strings
    by zip_with over n shifted slices — the token array is evaluated
    once per slice, n times total per row.

    partial_tail=False: full windows only; fewer than n tokens → [].
    partial_tail=True: window starts 0..max(size-n, 0) — short docs
    yield one truncated window (the shingle semantics
    llm/text.py/llm/dedup.py pin; concat_ws skips the NULLs zip_with
    pads past the end, which truncates exactly like slice did).
    """
    size = F.size(tokens)
    if partial_tail:
        m = F.greatest(size - F.lit(n), F.lit(0)) + F.lit(1)
    else:
        m = F.greatest(size - F.lit(n - 1), F.lit(0))
    g = F.slice(tokens, 1, m)
    for j in range(1, n):
        g = F.zip_with(
            g,
            F.slice(tokens, 1 + j, m),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    if partial_tail:
        # window-start indexes are 0..max(size-n, 0): a size-0 array
        # still has start 0 → ONE empty-string window (slice can't
        # fabricate it; split() never returns size 0, but the contract
        # is pinned by a hypothesis parity test)
        g = F.when(size == 0, F.array(F.lit(""))).otherwise(g)
    return g


def ngrams(df: DataFrame, tokens: Column, n: int, k: int) -> DataFrame:
    """Top-k word n-grams with frequencies.

    Reference: GenericUDAFnGrams
    (ql/src/java/org/apache/hadoop/hive/ql/udf/generic/GenericUDAFnGrams.java)
    — a heap-bounded frequency estimator UDAF. Spark-first formulation:
    explode n-gram windows → count → top-k; the groupBy does map-side
    partial aggregation, so the shuffle carries (distinct n-gram × task)
    rows — strictly better scaling than Hive's per-reducer heap merge.

    ``tokens``: array<string> column. Returns DataFrame(ngram, estfrequency).
    """
    grams = ngram_windows(tokens, n)
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("double").alias("estfrequency"))
        .orderBy(F.desc("estfrequency"), "ngram")
        .limit(k)
    )


def context_ngrams(
    df: DataFrame, tokens: Column, context: list[str | None], k: int
) -> DataFrame:
    """Top-k n-grams matching a context pattern with NULL holes.

    Reference: GenericUDAFContextNGrams
    (ql/.../udf/generic/GenericUDAFContextNGrams.java): context like
    ['i', 'love', None] returns the top words following "i love".
    Returns DataFrame(ngram, estfrequency) where ngram is the filled holes.
    """
    n = len(context)
    # windows as ARRAYS via the same linear zip_with-of-shifted-slices
    # construction as ngram_windows (transform(idx, slice) re-evaluates
    # the captured token expression per window — O(len²))
    m = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(0))
    windows = F.transform(F.slice(tokens, 1, m), lambda x: F.array(x))
    for j in range(1, n):
        windows = F.zip_with(
            windows,
            F.slice(tokens, 1 + j, m),
            lambda a, b: F.concat(a, F.array(b)),
        )
    matches = F.filter(
        windows,
        lambda w: F.forall(
            F.zip_with(
                w,
                F.array(*[F.lit(c) for c in context]),
                lambda tok, ctx: ctx.isNull() | (tok == ctx),
            ),
            lambda ok: ok,
        ),
    )
    holes = F.transform(
        matches,
        lambda w: F.concat_ws(
            " ",
            F.filter(
                F.zip_with(
                    w,
                    F.array(*[F.lit(c) for c in context]),
                    lambda tok, ctx: F.when(ctx.isNull(), tok),
                ),
                lambda x: x.isNotNull(),
            ),
        ),
    )
    return (
        df.select(F.explode(holes).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("double").alias("estfrequency"))
        .orderBy(F.desc("estfrequency"), "ngram")
        .limit(k)
    )


def field(needle: Column, *haystack: Column) -> Column:
    """field(needle, v1, v2, ...) → 1-based index of needle, 0 if absent.

    Reference: UDFField registration exec/FunctionRegistry.java:262."""
    return F.coalesce(
        F.array_position(F.array(*haystack), needle).cast("int"), F.lit(0)
    )


def in_file(value: Column, path_col: Column) -> Column:
    """in_file(str, filename): true if str equals a line of the file.

    Reference: GenericUDFInFile (FunctionRegistry.java:468). Spark-first:
    the caller should join against ``spark.read.text(path)`` for real
    scale; this expression form supports only literal paths by inlining
    the file's lines (suitable for small allow/deny lists)."""
    raise NotImplementedError(
        "use engine.ops.in_file_join(df, col, path) — expression form would "
        "require reading the file at plan time; the join form scales"
    )


def in_file_join(df: DataFrame, value: Column, path: str) -> DataFrame:
    """Scalable in_file: broadcast semi-join against the file's lines,
    adds boolean column ``in_file``."""
    spark = df.sparkSession
    lines = spark.read.text(path).select(F.col("value").alias("__line"))
    return df.join(
        F.broadcast(lines), value == F.col("__line"), "left"
    ).withColumn("in_file", F.col("__line").isNotNull()).drop("__line")


def parse_url_tuple(url: Column, *parts: str) -> list[Column]:
    """parse_url_tuple(url, p1, p2, ...) → one column per part.

    Reference: GenericUDTFParseUrlTuple (FunctionRegistry.java:498) —
    a UDTF emitting one row; Spark-first it's just N parse_url calls
    (each a native JVM expression)."""
    cols = []
    for p in parts:
        if p.startswith("QUERY:"):
            c = F.parse_url(url, F.lit("QUERY"), F.lit(p[len("QUERY:"):]))
        else:
            c = F.parse_url(url, F.lit(p))
        cols.append(c.alias(p.lower().replace(":", "_")))
    return cols


def sort_array_by(arr: Column, *field_names: str) -> Column:
    """sort_array_by(array<struct>, f1, ...): sort struct array by fields.

    Reference: GenericUDFSortArrayByField (FunctionRegistry.java:457).
    Spark's array_sort with a comparator lambda."""

    def cmp(a: Column, b: Column) -> Column:
        out = F.lit(0)
        # build comparator right-to-left so earlier fields dominate
        for name in reversed(field_names):
            fa, fb = a.getField(name), b.getField(name)
            out = (
                F.when(fa < fb, -1).when(fa > fb, 1).otherwise(out)
            )
        return out

    return F.array_sort(arr, cmp)


def create_union(tag: Column, *values: Column) -> Column:
    """uniontype constructor — struct-tag encoding (SURVEY §1.3).

    Reference type: serdeConstants.java:119 (UNION_TYPE_NAME), ctor
    GenericUDFUnion (FunctionRegistry.java:460 create_union). Encoded as
    struct<tag:tinyint, field0, field1, ...> — the same encoding Spark's
    own Hive compatibility layer uses."""
    fields = [tag.cast("tinyint").alias("tag")]
    for i, v in enumerate(values):
        fields.append(
            F.when(tag == i, v).otherwise(F.lit(None)).alias(f"field{i}")
        )
    return F.struct(*fields)


def extract_union(u: Column, tag: int | None = None) -> Column:
    """extract_union(union[, tag]): with tag → that branch's value (null if
    inactive); without → the struct itself (all branches, inactive=null).

    Reference: GenericUDFExtractUnion (FunctionRegistry.java:461)."""
    if tag is None:
        return u
    return u.getField(f"field{tag}")


def mask_hash(col: Column) -> Column:
    """mask_hash(str) → md5 hex — Hive 2.3's GenericUDFMaskHash hashes
    with md5 (the udf_mask_hash.q golden is a 32-hex digest; Hive 3
    switched to sha256). Reference: GenericUDFMaskHash,
    FunctionRegistry.java:536."""
    return F.md5(col.cast("string"))


def mask(
    col: Column,
    upper_to: str = "X",
    lower_to: str = "x",
    digit_to: str = "n",
) -> Column:
    """mask(str): masks uppercase→X, lowercase→x, digits→n.

    Reference: GenericUDFMask (FunctionRegistry.java:531). Spark 3.4+ has
    a native ``mask`` — this wrapper pins Hive's default replacements."""
    return F.mask(
        col, F.lit(upper_to), F.lit(lower_to), F.lit(digit_to), F.lit(None)
    )


def mask_show_first_n(col: Column, n: int = 4) -> Column:
    """mask_show_first_n: keep the first n chars, mask the rest.

    Reference: GenericUDFMaskShowFirstN (FunctionRegistry.java:534)."""
    rest = col.substr(F.lit(n + 1), F.length(col))
    return F.concat(F.substring(col, 1, n), mask(rest))


def mask_first_n(col: Column, n: int = 4) -> Column:
    """mask_first_n: mask the first n chars, keep the rest.

    Reference: GenericUDFMaskFirstN (FunctionRegistry.java:532)."""
    rest = col.substr(F.lit(n + 1), F.length(col))
    return F.concat(mask(F.substring(col, 1, n)), rest)
