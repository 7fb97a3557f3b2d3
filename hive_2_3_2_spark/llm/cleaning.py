"""Text cleaning / filtering operators for training-data pipelines.

The filters a large-scale pretraining corpus actually runs (C4,
Gopher/MassiveText rules, benchmark decontamination), expressed as
JVM-side Column work — every operator here is a scan-local projection or
a broadcast join; nothing shuffles on data size except the final
aggregation a caller chooses.

- ``scrub_pii``: regex redaction (emails, phone numbers, IPv4) — chained
  regexp_replace, codegen-friendly, no Python.
- ``quality_flags``: Gopher-style document heuristics (word count
  bounds, mean word length, symbol-to-word ratio).
- ``dup_line_fraction`` / ``top_ngram_share``: the MassiveText
  repetition filters (duplicate-line fraction; most-frequent-n-gram
  share via linear explode+groupBy, NOT the quadratic per-row form).
- ``decontaminate``: drop documents sharing any word n-gram with a
  benchmark set (the train/test overlap scrub) — exploded-ngram
  broadcast semi-join, so the corpus is scanned once and never
  self-joined.

Scale notes: scrub/flags/ratios are per-row expressions (100 TB = a map
pass fused into whatever scan already runs). Decontamination joins on
the n-gram string; the benchmark side (thousands of n-grams) broadcasts,
and the corpus side explodes lazily INSIDE the join stage — the
exploded form is never materialized to a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deliberately simple, deterministic patterns (production would plug in
# a richer library; the *shape* — chained JVM regex, no UDF — is the
# point). Kept ASCII-safe so DuckDB oracles reproduce them byte-for-byte.
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE = r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}"
_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def scrub_pii(text: Column) -> Column:
    """Redact emails, phone numbers and IPv4 addresses with typed
    placeholder tokens — the standard pre-tokenization PII pass."""
    out = F.regexp_replace(text, _EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, _PHONE, "<PHONE>")
    return F.regexp_replace(out, _IPV4, "<IP>")


def quality_flags(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
) -> Column:
    """Gopher-style quality rule struct: per-document booleans + the
    underlying measurements (word count, mean word length, hash/ellipsis
    symbol-to-word ratio). Callers filter on ``.overall`` or inspect the
    individual rules — keeping the measurements in the output makes the
    filter auditable (why was this doc dropped?)."""
    words = F.split(F.trim(text), r"\s+")
    n_words = F.size(words)
    mean_len = F.when(
        n_words > 0,
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        )
        / n_words,
    ).otherwise(F.lit(0.0))
    n_symbols = (
        F.length(text) - F.length(F.regexp_replace(text, r"[#…]", ""))
    ) + 2 * (
        (F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", ""))) / 3
    ).cast("long")
    symbol_ratio = F.when(n_words > 0, n_symbols / n_words).otherwise(
        F.lit(0.0)
    )
    ok_words = (n_words >= min_words) & (n_words <= max_words)
    ok_mean = (mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len)
    ok_symbols = symbol_ratio <= max_symbol_ratio
    return F.struct(
        n_words.alias("n_words"),
        F.round(mean_len, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        ok_words.alias("ok_word_count"),
        ok_mean.alias("ok_mean_word_len"),
        ok_symbols.alias("ok_symbol_ratio"),
        (ok_words & ok_mean & ok_symbols).alias("overall"),
    )


def dup_line_fraction(text: Column) -> Column:
    """Fraction of non-empty lines that duplicate an earlier line (the
    MassiveText duplicate-line filter) — linear per-row array work."""
    lines = F.filter(F.split(text, "\n"), lambda ln: F.length(ln) > 0)
    n_lines = F.size(lines)
    return F.round(
        F.when(
            n_lines > 0,
            (n_lines - F.size(F.array_distinct(lines))) / n_lines,
        ).otherwise(F.lit(0.0)),
        4,
    )


def top_ngram_share(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Share of a document's n-grams taken by its most frequent n-gram
    (the MassiveText repetition filter; high ⇒ boilerplate/spam).

    Deliberately a DataFrame op, not a per-row Column: the obvious
    array-only formulation (count each distinct gram by filtering the
    gram array) is O(distinct × total) PER ROW — quadratic in document
    length, a silent cluster-killer on long documents. Exploding to
    (doc, gram) rows and counting via two map-side-combined groupBys is
    linear and shuffles only (doc, gram, count) tuples.

    Returns (id_col, n_grams, top_share); documents shorter than ``n``
    tokens get n_grams = 0, top_share = 0.0.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    size = F.size(toks)
    idx = F.when(size >= n, F.sequence(F.lit(0), size - n)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    exploded = df.select(
        F.col(id_col), F.explode_outer(grams).alias("g")
    )
    counts = exploded.groupBy(id_col, "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        counts.groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("g").isNotNull(), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_grams"),
            F.max(F.when(F.col("g").isNotNull(), F.col("c")).otherwise(0))
            .cast("long")
            .alias("top_c"),
        )
        .select(
            id_col,
            "n_grams",
            F.round(
                F.when(
                    F.col("n_grams") > 0, F.col("top_c") / F.col("n_grams")
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("top_share"),
        )
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Drop documents that share any word ``n``-gram with the benchmark
    set — the train/test contamination scrub every serious pretraining
    run performs.

    Shape: benchmark n-grams (small: eval sets are thousands of docs)
    are distinct'd and BROADCAST; the corpus explodes its n-grams only
    inside the anti-join stage (one scan, no self-join, no corpus-side
    shuffle of exploded rows). Word n-grams of length 8 make accidental
    collisions essentially impossible, so exact string equality is the
    right join key — no hashing step to tune.
    """

    def grams(col: Column) -> Column:
        toks = F.split(F.trim(F.lower(col)), r"\s+")
        size = F.size(toks)
        idx = F.when(size >= n, F.sequence(F.lit(0), size - n)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
        )

    bench_grams = (
        benchmark.select(F.explode(grams(F.col(bench_text_col))).alias("g"))
        .distinct()
    )
    doc_grams = df.select(
        F.col(id_col), F.explode(grams(F.col(text_col))).alias("g")
    )
    contaminated = doc_grams.join(F.broadcast(bench_grams), "g").select(
        id_col
    ).distinct()
    return df.join(contaminated, id_col, "left_anti")
