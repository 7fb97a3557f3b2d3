"""Composed corpus-prep pipeline entry: the individual LLM operators
(quality filter → exact dedup → benchmark decontamination → chunking)
chained exactly the way a pretraining data pipeline runs them, verified
end-to-end by one chained DuckDB oracle. Each stage is individually
driver-verified elsewhere (clean_quality_flags, dedup_exact_groups /
text_fingerprint_groups, clean_decontaminate, chunk_documents_
overlapping); this entry proves the COMPOSITION — column contracts and
row semantics survive stacking, in both engines.

Scale shape: stages 1-2 are scan-local projections + one md5-key
shuffle; decontamination is a broadcast anti-join (benchmark grams
small); chunking is map-side; the final rollup is one groupBy(lang).
Nothing in the chain materializes an intermediate to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.llm import cleaning as C
from hive_2_3_2_spark.llm import text as T
from hive_2_3_2_spark.llm.chunking import chunk_documents
from hive_2_3_2_spark.suite import query


@query(
    "pipeline_corpus_prep",
    oracle=r"""
    WITH q AS (  -- stage 1: quality filter (word-count + mean-len bounds)
      SELECT doc_id, lang, text,
             len(string_split_regex(trim(text), '\s+')) AS n_words,
             list_sum(list_transform(
               string_split_regex(trim(text), '\s+'),
               x -> length(x))) * 1.0
               / len(string_split_regex(trim(text), '\s+')) AS mwl
      FROM documents
    ),
    kept_q AS (
      SELECT doc_id, lang, text FROM q
      WHERE n_words BETWEEN 30 AND 100000 AND mwl BETWEEN 3.0 AND 10.0
    ),
    fp AS (  -- stage 2: exact dedup on normalized-md5, keep min doc_id
      SELECT doc_id, lang, text,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
               AS f
      FROM kept_q
    ),
    kept_d AS (
      SELECT doc_id, lang, text FROM (
        SELECT *, MIN(doc_id) OVER (PARTITION BY f) AS keep_id FROM fp
      ) WHERE doc_id = keep_id
    ),
    tok AS (  -- stage 3: decontaminate vs the doc_id%97 benchmark set
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             UNNEST(list_transform(range(greatest(len(t) - 7, 0)),
               i -> array_to_string(list_slice(t, i + 1, i + 8), ' '))) AS g
      FROM tok
    ),
    bg AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
    bad AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (g)),
    clean AS (
      SELECT * FROM kept_d WHERE doc_id NOT IN (SELECT doc_id FROM bad)
    ),
    chunks AS (  -- stage 4: 64-token windows, stride 48
      SELECT doc_id, lang,
             least(len(toks) - start, 64) AS n_tokens
      FROM (
        SELECT doc_id, lang,
               string_split_regex(trim(text), '\s+') AS toks,
               UNNEST(range(0,
                 greatest(CAST(FLOOR((len(string_split_regex(trim(text),
                   '\s+')) - 1) / 48) AS BIGINT) * 48, 0) + 1, 48)) AS start
        FROM clean
      )
      WHERE len(toks) - start > 0
    )
    SELECT lang,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM chunks
    GROUP BY lang
    ORDER BY lang
    """,
)
def corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus prep: quality filter (llm/cleaning.py
    quality_flags, min_words=30) → exact dedup keeping the lowest doc_id
    per normalized-md5 fingerprint (llm/text.py md5_fingerprint) →
    benchmark decontamination (llm/cleaning.py decontaminate, 8-gram
    broadcast anti-join vs the doc_id%97 stand-in eval set) → 64-token
    chunking with 16 overlap (llm/chunking.py chunk_documents) → per-lang
    rollup (docs, chunks, tokens)."""
    docs = load_table(spark, sf_dir, "documents")

    qf = C.quality_flags(F.col("text"), min_words=30)
    kept_q = docs.filter(
        qf.getField("ok_word_count") & qf.getField("ok_mean_word_len")
    )

    w = Window.partitionBy("f")
    kept_d = (
        kept_q.withColumn("f", T.md5_fingerprint(F.col("text")))
        .withColumn("keep_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .drop("f", "keep_id")
    )

    bench = docs.filter(F.col("doc_id") % 97 == 0)
    clean = C.decontaminate(kept_d, bench, n=8)

    chunks = chunk_documents(clean, chunk_tokens=64, overlap=16)
    langs = clean.select("doc_id", "lang")
    return (
        chunks.join(F.broadcast(langs), "doc_id")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "pipeline_quality_classifier_bootstrap",
    oracle=r"""
    WITH q AS (
      SELECT doc_id, text,
             len(string_split_regex(trim(text), '\s+')) AS n_words,
             list_sum(list_transform(
               string_split_regex(trim(text), '\s+'),
               x -> length(x))) * 1.0
               / len(string_split_regex(trim(text), '\s+')) AS mwl
      FROM documents
    ),
    norm AS (
      SELECT doc_id,
             (n_words BETWEEN 30 AND 100000
              AND mwl BETWEEN 3.0 AND 10.0) AS label,
             trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS s
      FROM q
    ),
    train AS (SELECT * FROM norm WHERE doc_id % 5 != 0),
    words AS (
      SELECT label AS y, UNNEST(string_split(s, ' ')) AS word
      FROM train WHERE s != ''
    ),
    by_class AS (
      SELECT word,
             CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
             CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
      FROM words WHERE word != '' GROUP BY word
    ),
    vocab AS (
      SELECT * FROM by_class ORDER BY (c_pos + c_neg) DESC, word LIMIT 2048
    ),
    tot AS (
      SELECT SUM(c_pos) AS t_pos, SUM(c_neg) AS t_neg,
             COUNT(*) AS v FROM vocab
    ),
    weights AS (
      SELECT word,
             ln((c_pos + 1.0) / (t_pos + v))
               - ln((c_neg + 1.0) / (t_neg + v)) AS w
      FROM vocab, tot
    ),
    prior AS (
      SELECT ln(CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS DOUBLE)
                / SUM(CASE WHEN label THEN 0 ELSE 1 END)) AS bias
      FROM train
    ),
    score_docs AS (
      SELECT doc_id, label, s FROM norm WHERE doc_id % 5 = 0
    ),
    tf AS (
      SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, UNNEST(string_split(s, ' ')) AS word
            FROM score_docs WHERE s != '')
      WHERE word != '' GROUP BY doc_id, word
    ),
    ev AS (
      SELECT doc_id, SUM(tf * w) AS ev
      FROM tf JOIN weights USING (word) GROUP BY doc_id
    )
    SELECT d.label AS actual,
           (COALESCE(e.ev, 0) + prior.bias) > 0 AS predicted,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM score_docs d LEFT JOIN ev e USING (doc_id), prior
    GROUP BY d.label, (COALESCE(e.ev, 0) + prior.bias) > 0
    ORDER BY actual, predicted
    """,
)
def pipeline_quality_classifier_bootstrap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quality-classifier bootstrap — exactly how production pipelines
    turn cheap heuristics into a learned filter (the GPT-3/CCNet
    pattern: label with rules, train a linear classifier, filter with
    the model): Gopher word-count/mean-word-length rules label the
    corpus, a multinomial NB (llm/lm.py train_nb_model) trains on the
    doc_id%5!=0 slice to IMITATE the heuristic, and the held-out slice's
    confusion matrix (actual × predicted × n) is the deliverable. The
    DuckDB oracle replays labeling, training, and scoring end-to-end —
    composition of clean_quality_flags' rules with the NB machinery,
    both individually verified elsewhere."""
    from hive_2_3_2_spark.llm import lm as L

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_words = F.size(toks)
    mwl = (
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        )
        * F.lit(1.0)
        / n_words
    )
    labeled = docs.withColumn(
        "label",
        n_words.between(30, 100000) & mwl.between(3.0, 10.0),
    )
    train = labeled.filter(F.col("doc_id") % 5 != 0)
    held = labeled.filter(F.col("doc_id") % 5 == 0)
    weights, bias = L.train_nb_model(train, label_col="label")
    scored = L.score_nb_model(held, weights, bias)
    return (
        held.select("doc_id", F.col("label").alias("actual"))
        .join(scored.select("doc_id", "predicted"), "doc_id")
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("actual", "predicted")
    )
