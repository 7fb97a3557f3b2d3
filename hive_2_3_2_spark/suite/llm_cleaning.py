"""Cleaning/filtering suite entries (implementations: llm/cleaning.py) —
the pretraining-corpus hygiene passes: PII scrubbing, Gopher quality
rules, MassiveText repetition stats, benchmark decontamination. All four
are fully DuckDB-oracle-checked (deterministic regex/arithmetic/set
logic — no hashing, no RNG)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.llm import cleaning as C
from hive_2_3_2_spark.suite import query


@query(
    "clean_pii_scrub",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 text || ' mail user' || CAST(doc_id AS VARCHAR)
                      || '@example.com tel 555-123-4567 ip 10.0.0.1',
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
               '\+?\d{3}[-. ]\d{3}[-. ]\d{4}', '<PHONE>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
             AS scrubbed
    FROM documents
    ORDER BY doc_id
    """,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (llm/cleaning.py scrub_pii): chained JVM
    regexp_replace for emails/phones/IPv4 — a fused map pass, zero
    Python. The corpus text is deterministic-salted with one of each PII
    kind so the scrub provably fires on every row."""
    docs = load_table(spark, sf_dir, "documents")
    salted = F.concat(
        F.col("text"),
        F.lit(" mail user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com tel 555-123-4567 ip 10.0.0.1"),
    )
    return docs.select(
        "doc_id", C.scrub_pii(salted).alias("scrubbed")
    ).orderBy("doc_id")


@query(
    "clean_quality_flags",
    oracle=r"""
    WITH m AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS w,
             length(text) AS lc,
             length(regexp_replace(text, '[#…]', '', 'g')) AS lc_nosym,
             length(regexp_replace(text, '\.\.\.', '', 'g')) AS lc_noell
      FROM documents
    ),
    s AS (
      SELECT doc_id, len(w) AS n_words,
             CASE WHEN len(w) > 0 THEN
               ROUND(list_sum(list_transform(w, x -> length(x)))
                     * 1.0 / len(w), 4)
             ELSE 0.0 END AS mean_word_len,
             CASE WHEN len(w) > 0 THEN
               ROUND(((lc - lc_nosym)
                      + 2 * ((lc - lc_noell) // 3)) * 1.0 / len(w), 4)
             ELSE 0.0 END AS symbol_ratio
      FROM m
    )
    ,
    dl AS (
      SELECT doc_id,
             list_filter(string_split(text, chr(10)),
                         x -> length(x) > 0) AS lines
      FROM documents
    ),
    dup AS (
      SELECT doc_id,
             CASE WHEN len(lines) > 0 THEN
               ROUND((len(lines) - len(list_distinct(lines))) * 1.0
                     / len(lines), 4)
             ELSE 0.0 END AS dup_line_frac
      FROM dl
    )
    SELECT s.doc_id AS doc_id, CAST(n_words AS INT) AS n_words,
           mean_word_len, symbol_ratio,
           (n_words BETWEEN 50 AND 100000)
             AND (mean_word_len BETWEEN 3.0 AND 10.0)
             AND (symbol_ratio <= 0.1) AS overall,
           dup.dup_line_frac AS dup_line_frac
    FROM s JOIN dup ON s.doc_id = dup.doc_id
    ORDER BY doc_id
    """,
)
def quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rules (llm/cleaning.py quality_flags): word
    count bounds, mean word length, symbol-to-word ratio — auditable
    struct (measurements + verdict) — plus the MassiveText
    duplicate-line fraction (llm/cleaning.py dup_line_fraction). All
    scan-local expressions."""
    docs = load_table(spark, sf_dir, "documents")
    q = C.quality_flags(F.col("text"))
    return docs.select(
        "doc_id",
        q.getField("n_words").alias("n_words"),
        q.getField("mean_word_len").alias("mean_word_len"),
        q.getField("symbol_ratio").alias("symbol_ratio"),
        q.getField("overall").alias("overall"),
        C.dup_line_fraction(F.col("text")).alias("dup_line_frac"),
    ).orderBy("doc_id")


@query(
    "clean_repetition_topgram",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             UNNEST(list_transform(range(greatest(len(t) - 1, 0)),
               i -> array_to_string(list_slice(t, i + 1, i + 2), ' '))) AS g
      FROM tok
    ),
    c AS (
      SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY doc_id, g
    ),
    s AS (
      SELECT doc_id, SUM(c) AS n_grams, MAX(c) AS top_c
      FROM c GROUP BY doc_id
    )
    SELECT d.doc_id AS doc_id,
           CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams,
           ROUND(COALESCE(s.top_c * 1.0 / s.n_grams, 0.0), 4) AS top_share
    FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
    ORDER BY doc_id
    """,
)
def repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MassiveText repetition filter (llm/cleaning.py top_ngram_share):
    most-frequent-bigram share per document via linear explode +
    map-side-combined groupBys (the per-row array formulation is
    quadratic in doc length — see the implementation docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    return C.top_ngram_share(docs, n=2).orderBy("doc_id")


@query(
    "clean_decontaminate",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             UNNEST(list_transform(range(greatest(len(t) - 7, 0)),
               i -> array_to_string(list_slice(t, i + 1, i + 8), ' '))) AS g
      FROM tok
    ),
    bg AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
    bad AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (g))
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_clean
    FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM bad)
    GROUP BY lang
    ORDER BY lang
    """,
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (llm/cleaning.py decontaminate): drop
    every document sharing any word 8-gram with the benchmark set (here:
    doc_id % 97 = 0 as a stand-in eval set, which guarantees hits — the
    benchmark docs themselves plus their near-duplicates). Benchmark
    grams broadcast; corpus scanned once, no self-join."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    clean = C.decontaminate(docs, bench, n=8)
    return (
        clean.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_clean"))
        .orderBy("lang")
    )


@query(
    "clean_decontaminate_bloom",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             UNNEST(list_transform(range(greatest(len(t) - 7, 0)),
               i -> array_to_string(list_slice(t, i + 1, i + 8), ' '))) AS g
      FROM tok
    ),
    bg AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
    bad AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (g))
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_clean,
           CAST(SUM(length(text)) AS BIGINT) AS clean_chars
    FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM bad)
    GROUP BY lang
    ORDER BY lang
    """,
)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination (llm/cleaning.py
    decontaminate_bloom): identical clean set to clean_decontaminate —
    Bloom filters have no false negatives, and the exact join removes
    the false positives — so the brute-force SQL IS the oracle. What the
    Bloom buys is the plan: the filter is built from the benchmark side
    with one bit_or groupBy (≤ m/64 shuffled words regardless of
    blocklist size) and probed as a constant-folded literal-array
    expression between the corpus explode and the join, so only
    might-match grams reach the join — the path that stays viable when
    the blocklist outgrows a broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    clean = C.decontaminate_bloom(docs, bench, n=8)
    return (
        clean.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_clean"),
            F.sum(F.length("text")).cast("long").alias("clean_chars"),
        )
        .orderBy("lang")
    )


@query(
    "clean_repeated_segments",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+',
               ' ', 'g')), ' ') AS toks
      FROM documents
    ), p AS (
      SELECT doc_id,
             CAST(unnest(range((len(toks) + 9) // 10)) AS BIGINT) AS idx,
             unnest(list_transform(range((len(toks) + 9) // 10),
               i -> array_to_string(list_slice(toks, i * 10 + 1, i * 10 + 10),
                                    ' '))) AS para
      FROM t
    ), f AS (
      SELECT para, COUNT(*) AS n_occ FROM p GROUP BY 1
    ), kept AS (
      SELECT p.doc_id, p.idx, p.para
      FROM p JOIN f ON p.para = f.para WHERE f.n_occ < 2
    )
    SELECT d.doc_id,
           COALESCE(s.text_clean, '') AS text_clean,
           d.n_segments,
           d.n_segments - COALESCE(s.n_kept, 0) AS n_dropped
    FROM (SELECT doc_id, CAST((len(toks) + 9) // 10 AS BIGINT) AS n_segments
          FROM t) d
    LEFT JOIN (
      SELECT doc_id,
             string_agg(para, e'\n\n' ORDER BY idx) AS text_clean,
             CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM kept GROUP BY doc_id
    ) s ON d.doc_id = s.doc_id
    ORDER BY d.doc_id
    """,
)
def repeated_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level repeated-segment (boilerplate paragraph) removal —
    llm/cleaning.py remove_repeated_segments. The synthetic corpus has
    no newlines, so both sides first derive deterministic paragraph
    boundaries (10-token windows of the normalized text, joined with
    blank lines); the operator then drops every occurrence of any
    paragraph repeated corpus-wide (127 such at sf0.01) and stitches
    the survivors back in order."""
    from hive_2_3_2_spark.llm.text import normalize_for_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(normalize_for_fingerprint(F.col("text")), " ")
    nseg = ((F.size(toks) + 9) / 10).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * 10 + 1, 10)),
    )
    paragraphized = docs.select(
        "doc_id", F.array_join(paras, "\n\n").alias("text_p")
    )
    return C.remove_repeated_segments(
        paragraphized, text_col="text_p", delim="\n\n", min_repeat=2
    ).orderBy("doc_id")


@query(
    "clean_length_outliers",
    oracle="""
    WITH q AS (
      SELECT lang,
             QUANTILE_CONT(n_chars, 0.01) AS p01,
             QUANTILE_CONT(n_chars, 0.99) AS p99
      FROM documents GROUP BY lang
    )
    SELECT d.lang AS lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN d.n_chars < q.p01 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_short,
           CAST(SUM(CASE WHEN d.n_chars > q.p99 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_long,
           ROUND(MIN(q.p01), 2) AS p01, ROUND(MIN(q.p99), 2) AS p99
    FROM documents d JOIN q ON d.lang = q.lang
    GROUP BY d.lang ORDER BY d.lang
    """,
)
def clean_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-based length-outlier flagging — the standard corpus
    hygiene step that drops truncated fragments (< p1) and
    concatenation blobs (> p99) per language. Two-pass shape that
    scales: per-lang exact percentiles (tiny frame) broadcast back onto
    the scan, flags computed JVM-side, one aggregate shuffle — same
    topology as agg_histogram_equiwidth. Spark's percentile and
    DuckDB's quantile_cont share linear interpolation, so thresholds
    hash-match exactly."""
    docs = load_table(spark, sf_dir, "documents")
    q = docs.groupBy("lang").agg(
        F.percentile("n_chars", 0.01).alias("p01"),
        F.percentile("n_chars", 0.99).alias("p99"),
    )
    return (
        docs.join(F.broadcast(q), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("n_chars") < F.col("p01"), 1).otherwise(0)
            ).cast("long").alias("n_short"),
            F.sum(
                F.when(F.col("n_chars") > F.col("p99"), 1).otherwise(0)
            ).cast("long").alias("n_long"),
            F.round(F.min("p01"), 2).alias("p01"),
            F.round(F.min("p99"), 2).alias("p99"),
        )
        .orderBy("lang")
    )
