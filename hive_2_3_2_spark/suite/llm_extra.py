"""Round-4 late additions (registered BELOW the r4 window → r5 queue).

Embedding-level benchmark decontamination: the semantic twin of the
n-gram ``clean_decontaminate`` entries — catches paraphrased train/test
overlap that token n-grams miss."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.llm import cleaning as C
from hive_2_3_2_spark.suite import query


@query(
    "clean_decontaminate_embeddings",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), ev AS (
      SELECT * FROM e WHERE vec_id % 20 = 0
    ), co AS (
      SELECT * FROM e WHERE vec_id % 20 != 0
    )
    SELECT a.vec_id AS vec_id,
           CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
           ROUND(MAX(list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) *
                  sqrt(list_dot_product(b.v, b.v)))), 6) AS max_cosine
    FROM co a JOIN ev b
      ON list_dot_product(a.v, b.v) /
         (sqrt(list_dot_product(a.v, a.v)) *
          sqrt(list_dot_product(b.v, b.v))) >= 0.4
    GROUP BY a.vec_id
    ORDER BY vec_id
    """,
)
def decontaminate_embeddings_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Semantic decontamination report (llm/cleaning.py
    decontaminate_embeddings): corpus = embeddings with vec_id%20!=0,
    eval set = the %20==0 slice; report every corpus vector with cosine
    ≥ 0.4 to any eval vector. LSH candidates (16 tables × 5 planes +
    1-bit multiprobe, deterministic seeded hyperplanes) verified by
    exact cosine — the DuckDB oracle is the exact all-pairs join, so a
    hash match PROVES the LSH config reaches full recall on this data."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 20 != 0)
    eval_df = emb.filter(F.col("vec_id") % 20 == 0)
    return C.decontaminate_embeddings(
        corpus, eval_df, threshold=0.4, return_removed=True
    ).orderBy("vec_id")


@query(
    "clean_normalize_unicode",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(
             nfc_normalize(text || ' combining: e' || chr(769) ||
                           chr(7) || '  tail'),
             '[\x00-\x08\x0b-\x1f\x7f]', '', 'g'),
             '[ \t]+', ' ', 'g')) AS clean,
           length(trim(regexp_replace(regexp_replace(
             nfc_normalize(text || ' combining: e' || chr(769) ||
                           chr(7) || '  tail'),
             '[\x00-\x08\x0b-\x1f\x7f]', '', 'g'),
             '[ \t]+', ' ', 'g'))) AS n_chars
    FROM documents
    ORDER BY doc_id
    """,
)
def normalize_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC + control strip + whitespace collapse
    (llm/cleaning.py normalize_text). Every row is salted with a
    decomposed e+COMBINING-ACUTE, a BEL control char and double spaces
    so all three passes provably fire; DuckDB's nfc_normalize is the
    oracle for the composition."""
    docs = load_table(spark, sf_dir, "documents")
    salted = F.concat(
        F.col("text"), F.lit(" combining: é\x07  tail")
    )
    return docs.select(
        "doc_id",
        C.normalize_text(salted).alias("clean"),
        F.length(C.normalize_text(salted)).alias("n_chars"),
    ).orderBy("doc_id")
