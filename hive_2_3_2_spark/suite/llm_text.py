"""Text-analysis suite queries over the documents table.

Implementations live in hive_2_3_2_spark/llm/text.py (pure JVM column
expressions); oracles replicate the exact formulas in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.llm import text as T
from hive_2_3_2_spark.suite import query


@query(
    "text_token_counts",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
             AS ws_tokens,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens
    FROM documents
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex pieces
    (llm/text.py whitespace_token_count / bpe_token_count)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.whitespace_token_count(F.col("text")).alias("ws_tokens"),
        T.bpe_token_count(F.col("text")).alias("bpe_tokens"),
    )


@query(
    "text_quality_scores",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             length(text) AS n,
             string_split_regex(lower(trim(text)), '\s+') AS toks,
             length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
               / length(text) AS punct,
             len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                 x -> list_contains(['the','and','of','to','a','in','is'], x)))
               / len(string_split_regex(lower(trim(text)), '\s+')) AS stop,
             list_sum(list_transform(string_split_regex(trim(text), '\s+'),
                 x -> length(x)))
               / len(string_split_regex(trim(text), '\s+')) AS mwl
      FROM documents
    )
    SELECT doc_id,
           ROUND(punct, 6) AS punct_ratio,
           ROUND(stop, 6)  AS stopword_ratio,
           ROUND(mwl, 6)   AS mean_word_len,
           ROUND((
             (CASE WHEN n BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.0 END) +
             (CASE WHEN punct < 0.3 THEN 1.0 ELSE 0.0 END) +
             (CASE WHEN stop > 0.01 AND stop < 0.6 THEN 1.0 ELSE 0.0 END) +
             (CASE WHEN mwl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
           ) / 4.0, 2) AS quality
    FROM t
    """,
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punct/stopword/word-length heuristics
    (llm/text.py quality_score)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.round(T.punct_ratio(t), 6).alias("punct_ratio"),
        F.round(T.stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(T.mean_word_length(t), 6).alias("mean_word_len"),
        F.round(T.quality_score(t), 2).alias("quality"),
    )


@query(
    "text_lang_id",
    oracle=r"""
    WITH s AS (
      SELECT doc_id, lang AS labeled,
             len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> list_contains(['the','and','of','to','a','in','is'], x))) AS s_en,
             len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> list_contains(['el','la','de','que','y','en','los'], x))) AS s_es,
             len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> list_contains(['der','die','und','das','ist','nicht'], x))) AS s_de,
             len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> list_contains(['le','la','et','les','des','est'], x))) AS s_fr
      FROM documents
    )
    SELECT doc_id, labeled,
           CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS detected
    FROM s
    """,
)
def lang_id_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID: argmax of per-language stopword-marker counts with
    deterministic en<es<de<fr tie-break (llm/text.py lang_id)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled"),
        T.lang_id(F.col("text")).alias("detected"),
    )


@query(
    "text_fingerprint_groups",
    oracle=r"""
    SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT)    AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over normalized text, grouped —
    the exact-dedup key (llm/text.py md5_fingerprint)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", T.md5_fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "text_rolling_fingerprint",
    oracle=r"""
    WITH norm AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text),
                          '[^a-z0-9]+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             UNNEST(list_transform(range(greatest(len(t) - 5, 0) + 1),
               i -> array_to_string(list_slice(t, i + 1, i + 5), ' '))) AS s
      FROM norm
    )
    SELECT doc_id,
           CAST(SUM(list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(list_filter(string_split(s, ''),
                                          c -> c <> ''),
                              c -> CAST(unicode(c) AS BIGINT))),
             (r, b) -> (((r * 31 + b + 2147483648) % 4294967296
                         + 4294967296) % 4294967296) - 2147483648
           )) AS BIGINT) AS rfp
    FROM sh GROUP BY doc_id
    """,
)
def rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable rolling shingle-hash fingerprint (llm/text.py
    rolling_shingle_fingerprint_portable): sum of Java-31-fold hashes of
    word-5-shingles over normalized text — engine-independent arithmetic,
    reproduced exactly by the DuckDB oracle (list_reduce over char codes
    with int32-wrap emulation). The Murmur3 throughput twin's determinism
    is pinned in tests/test_llm.py."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.rolling_shingle_fingerprint_portable(F.col("text")).alias("rfp"),
    )


@query(
    "text_tfidf_keywords",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE tok <> '' GROUP BY doc_id, tok
    ),
    dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, tok, tf, df, score FROM (
      SELECT t.doc_id, t.tok, t.tf, d.df,
             ROUND(t.tf * ln((nd.n_docs + 1.0) / (d.df + 1.0)), 6) AS score,
             ROW_NUMBER() OVER (
               PARTITION BY t.doc_id ORDER BY t.tf DESC, d.df ASC, t.tok ASC
             ) AS rn
      FROM tf t JOIN dfreq d USING (tok) CROSS JOIN nd
    ) WHERE rn <= 3
    ORDER BY doc_id, tok
    """,
)
def tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 keywords by smoothed tf-idf (llm/text.py
    tfidf_top_terms) — integer-deterministic ranking, float score."""
    return T.tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=3).orderBy(
        "doc_id", "tok"
    )
