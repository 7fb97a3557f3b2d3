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
    ≥ 0.4 to any eval vector. Exact broadcast-matmul path (the r6
    default): the unit-normalized eval matrix ships once and each Arrow
    batch of corpus vectors scores with a chunked numpy matmul — one
    scan, no join, no shuffle, exact recall by construction (the r6 sf1
    sweep measured 94s → 1.4s over the old LSH path, whose candidate
    factor at a 0.4 threshold exceeded brute force). The LSH variant
    survives as method='lsh' for over-broadcast-budget eval sets, with
    a parity test pinning identical results."""
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


# Fixed subword vocabulary for the tokenizer-apply entry: the operator
# takes ANY vocabulary; a fixed literal one makes the Spark call and the
# DuckDB oracle provably tokenize with identical rules.
_VOCAB = [
    "the", "ing", "tion", "and", "ed", "er", "es", "re", "on", "at",
    "en", "an", "or", "te", "is", "it", "al", "ar", "st", "to", "nt",
    "ng", "se", "ha", "as", "ou", "io", "le", "ve", "co", "me", "de",
    "hi", "ri", "ro", "ic", "ne", "ea", "ra", "ce",
]
_VOCAB_SQL = "[" + ", ".join(f"'{v}'" for v in _VOCAB) + "]"
_MAXL = max(len(v) for v in _VOCAB)

_NORM_WORDS = (
    "unnest(string_split(trim(regexp_replace(lower(text), '[^a-z]+', "
    "' ', 'g')), ' ')) AS word"
)


@query(
    "text_vocab_tokenize",
    oracle=f"""
    WITH RECURSIVE w AS (
      SELECT DISTINCT word FROM (
        SELECT {_NORM_WORDS} FROM documents) t
      WHERE word <> ''
    ), enc AS (
      SELECT word, word AS rest, 0 AS n FROM w
      UNION ALL
      SELECT word, substr(rest, length(tok) + 1), n + 1
      FROM (
        SELECT word, rest, n,
               coalesce(
                 list_filter(
                   list_transform(range(least(length(rest), {_MAXL}), 0, -1),
                                  x -> substr(rest, 1, x)),
                   p -> list_contains({_VOCAB_SQL}, p))[1],
                 substr(rest, 1, 1)) AS tok
        FROM enc WHERE rest <> ''
      ) s
    ), wtok AS (
      SELECT word, n AS n_toks FROM enc WHERE rest = ''
    ), docw AS (
      SELECT doc_id, word, count(*) AS cnt FROM (
        SELECT doc_id, {_NORM_WORDS} FROM documents) t
      WHERE word <> ''
      GROUP BY doc_id, word
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_words,
           CAST(sum(cnt * n_toks) AS BIGINT) AS n_tokens
    FROM docw JOIN wtok USING (word)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_vocab_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy longest-prefix subword tokenization (llm/lm.py
    tokenize_words_greedy / vocab_tokenize_counts): the
    vocabulary-APPLY step complementing bpe_learn's merge training.
    Distinct words encode once through the Arrow UDF; corpus-sized jobs
    stay JVM. The DuckDB oracle replays the greedy longest-prefix scan
    exactly via a recursive CTE, so the hash match proves tokenizer
    semantics, not just counts."""
    from hive_2_3_2_spark.llm.lm import vocab_tokenize_counts

    docs = load_table(spark, sf_dir, "documents")
    return vocab_tokenize_counts(docs, _VOCAB).orderBy("doc_id")


@query(
    "text_nb_lang_classifier",
    oracle=r"""
    WITH norm AS (
      SELECT doc_id, lang,
             trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS s
      FROM documents
    ),
    train AS (SELECT * FROM norm WHERE doc_id % 5 != 0),
    words AS (
      SELECT (lang = 'en') AS y,
             UNNEST(string_split(s, ' ')) AS word
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
      SELECT ln(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
                / SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)) AS bias
      FROM train
    ),
    score_docs AS (SELECT doc_id, s FROM norm WHERE doc_id % 5 = 0),
    tf AS (
      SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, UNNEST(string_split(s, ' ')) AS word
            FROM score_docs WHERE s != '')
      WHERE word != '' GROUP BY doc_id, word
    ),
    ev AS (
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_vocab_words,
             SUM(tf * w) AS ev
      FROM tf JOIN weights USING (word) GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(e.n_vocab_words, 0) AS n_vocab_words,
           ROUND(COALESCE(e.ev, 0) + prior.bias, 4) AS log_odds,
           (COALESCE(e.ev, 0) + prior.bias) > 0 AS predicted
    FROM score_docs d LEFT JOIN ev e USING (doc_id), prior
    ORDER BY doc_id
    """,
)
def text_nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes text classifier (llm/lm.py train_nb_model /
    score_nb_model) — the fastText-quality-filter role of a training-data
    pipeline in a closed form: train P(lang='en' | words) on the
    doc_id%5!=0 slice (add-one smoothing over a 2048-word capped
    vocabulary, deterministic count-then-word tie-break), score the
    held-out slice as log-odds. The model is vocab_size rows broadcast
    into one explode+join+agg scoring pass; integer counts everywhere
    until the trained ln weights; the DuckDB oracle replays training AND
    scoring end-to-end."""
    from hive_2_3_2_spark.llm import lm as L

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0).withColumn(
        "label", F.col("lang") == "en"
    )
    held_out = docs.filter(F.col("doc_id") % 5 == 0)
    weights, bias = L.train_nb_model(train, label_col="label")
    return L.score_nb_model(held_out, weights, bias).orderBy("doc_id")
