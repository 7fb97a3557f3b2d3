"""Corpus language-modeling suite queries: char-bigram LM quality
scoring and BPE merge-candidate statistics.

Implementations in hive_2_3_2_spark/llm/lm.py; every count is integer
until the final ln(), so the DuckDB oracles replay both entries exactly
(avg_logp rounded to 4dp per the suite convention for cross-engine
float sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.llm import lm
from hive_2_3_2_spark.suite import query


@query(
    "text_lm_quality_score",
    oracle=r"""
    WITH norm AS (
      SELECT doc_id, lang,
             trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS s
      FROM documents
    ),
    bg_all AS (
      SELECT doc_id,
             UNNEST(list_transform(range(length(s)-1),
                                   i -> substr(s, i+1, 2))) AS bg
      FROM norm WHERE length(s) >= 2
    ),
    tf AS (
      SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS tf
      FROM bg_all GROUP BY doc_id, bg
    ),
    model AS (
      SELECT bg, CAST(SUM(tf) AS BIGINT) AS c
      FROM tf JOIN documents USING (doc_id)
      WHERE lang = 'en' GROUP BY bg
    ),
    prefix AS (
      SELECT substr(bg, 1, 1) AS p, CAST(SUM(c) AS BIGINT) AS ctot
      FROM model GROUP BY 1
    )
    SELECT t.doc_id,
           CAST(SUM(t.tf) AS BIGINT) AS n_bigrams,
           ROUND(SUM(t.tf * ln((COALESCE(m.c, 0) + 1.0)
                               / (COALESCE(p.ctot, 0) + 27.0)))
                 / SUM(t.tf), 4) AS avg_logp
    FROM tf t
    LEFT JOIN model m USING (bg)
    LEFT JOIN prefix p ON substr(t.bg, 1, 1) = p.p
    GROUP BY t.doc_id
    """,
)
def lm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter: train an add-one-smoothed
    conditional char-bigram model on the English slice (llm/lm.py
    train_char_bigram_lm — model ≤ 27² rows, broadcast), then score every
    document by mean log-prob under it (score_char_bigram_lm). Wrong-
    language and gibberish docs score low; this is the signal CCNet
    buckets a corpus by before sampling."""
    docs = load_table(spark, sf_dir, "documents")
    model = lm.train_char_bigram_lm(docs.filter(F.col("lang") == "en"))
    return lm.score_char_bigram_lm(docs, model).select(
        F.col("id").alias("doc_id"), "n_bigrams", "avg_logp"
    )


@query(
    "text_bpe_merge_candidates",
    oracle=r"""
    WITH norm AS (
      SELECT trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS s
      FROM documents
    ),
    words AS (SELECT UNNEST(string_split(s, ' ')) AS w FROM norm),
    wf AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
      FROM words WHERE w <> '' GROUP BY w
    ),
    pairs AS (
      SELECT substr(w, CAST(i AS INT)+1, 1) AS l,
             substr(w, CAST(i AS INT)+2, 1) AS r, freq
      FROM wf, UNNEST(range(length(w)-1)) AS t(i)
    )
    SELECT l, r, CAST(SUM(freq) AS BIGINT) AS weight
    FROM pairs GROUP BY l, r
    ORDER BY weight DESC, l, r
    LIMIT 20
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE iteration over the corpus: top-20 adjacent character
    pairs by word-frequency-weighted count (llm/lm.py word_frequencies +
    adjacent_pair_counts) with a deterministic weight-desc / pair-asc
    tie-break — the argmax row is what bpe_learn would merge first. The
    corpus collapses to the (word, freq) table once; the pair scan runs
    on that table, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    wf = lm.word_frequencies(docs)
    return (
        lm.adjacent_pair_counts(lm.symbolize(wf))
        .withColumn("l", F.split("pair", " ")[0])
        .withColumn("r", F.split("pair", " ")[1])
        .select("l", "r", "weight")
        .orderBy(F.desc("weight"), "l", "r")
        .limit(20)
    )


@query(
    "text_countmin_heavy_hitters",
    oracle=r"""
    WITH norm AS (
      SELECT trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS s
      FROM documents
    ),
    words AS (SELECT UNNEST(string_split(s, ' ')) AS w FROM norm),
    wf AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
      FROM words WHERE w <> '' GROUP BY w
    ),
    sk AS (
      SELECT u.r,
             ('0x' || substr(md5(u.r || ':' || wf.w), 1, 8))::BIGINT
               % 1024 AS b,
             SUM(wf.freq) AS c
      FROM wf CROSS JOIN UNNEST([0, 1, 2, 3]) AS u(r)
      GROUP BY 1, 2
    ),
    top AS (SELECT w, freq FROM wf ORDER BY freq DESC, w LIMIT 20),
    pr AS (
      SELECT t.w, u.r,
             ('0x' || substr(md5(u.r || ':' || t.w), 1, 8))::BIGINT
               % 1024 AS b
      FROM top t CROSS JOIN UNNEST([0, 1, 2, 3]) AS u(r)
    ),
    probe AS (
      SELECT pr.w, CAST(MIN(sk.c) AS BIGINT) AS estimate
      FROM pr JOIN sk ON sk.r = pr.r AND sk.b = pr.b
      GROUP BY pr.w
    )
    SELECT t.w AS word, t.freq AS exact_count, p.estimate AS cms_estimate
    FROM top t JOIN probe p ON t.w = p.w
    """,
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch (operators/sketches.py): 4×1024
    md5-hashed counter table built in one explode+groupBy, probed for
    the exact top-20 tokens. The ESTIMATES are hash-checked (md5
    bucketing is engine-portable, counters are integers) — not just
    bounds — alongside the exact counts, so the CMS over-estimate
    guarantee is visible in the result. Mergeability (shard sketches
    sum to the whole-corpus sketch) is pinned in tests."""
    from hive_2_3_2_spark.operators.sketches import (
        count_min_build,
        count_min_probe,
    )

    docs = load_table(spark, sf_dir, "documents")
    wf = lm.word_frequencies(docs)
    sketch = count_min_build(wf, "word", "freq")
    top = wf.orderBy(F.desc("freq"), "word").limit(20)
    est = count_min_probe(sketch, top.select("word"), "word")
    return top.join(est, "word").select(
        "word",
        F.col("freq").alias("exact_count"),
        F.col("estimate").alias("cms_estimate"),
    )


@query(
    "text_pmi_collocations",
    oracle=r"""
    WITH norm AS (
      SELECT trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS s
      FROM documents
    ),
    toks AS (SELECT string_split(s, ' ') AS t FROM norm),
    uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT UNNEST(t) AS w FROM toks) WHERE w <> '' GROUP BY w
    ),
    pairs AS (
      SELECT t[CAST(i AS INT)+1] AS w1, t[CAST(i AS INT)+2] AS w2
      FROM toks, UNNEST(range(len(t)-1)) AS u(i)
    ),
    c12 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM pairs WHERE w1 <> '' AND w2 <> '' GROUP BY w1, w2
    ),
    nt AS (SELECT SUM(c) AS n_tok FROM uni),
    np AS (SELECT SUM(c12) AS n_pair FROM c12)
    SELECT p.w1, p.w2, p.c12,
           ROUND(ln((p.c12 / np.n_pair)
                    / ((u1.c / nt.n_tok) * (u2.c / nt.n_tok))), 4) AS pmi
    FROM c12 p
    JOIN uni u1 ON p.w1 = u1.w
    JOIN uni u2 ON p.w2 = u2.w
    CROSS JOIN nt CROSS JOIN np
    WHERE p.c12 >= 5
    ORDER BY c12 DESC, w1, w2
    LIMIT 50
    """,
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction (llm/lm.py word_bigram_pmi): adjacent
    word-pair PMI from integer count tables — two map-side explodes, two
    keyed joins against the unigram table, totals broadcast. Ranked by
    the integer pair count (engine-stable) with PMI annotated; the
    single ln() per output row keeps the oracle exact at 4dp."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        lm.word_bigram_pmi(docs, min_count=5)
        .orderBy(F.desc("c12"), "w1", "w2")
        .limit(50)
    )


@query(
    "sample_weighted_reservoir",
    oracle=r"""
    WITH pr AS (
      SELECT doc_id, n_chars,
             -ln((('0x' || substr(md5('ws1:' || CAST(doc_id AS VARCHAR)),
                                  1, 8))::BIGINT + 1.0)
                 / 4294967296.0) / n_chars AS priority
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, n_chars, ROUND(priority, 6) AS priority
    FROM pr ORDER BY pr.priority, doc_id LIMIT 100
    """,
)
def weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (llm/
    sampling.py weighted_sample — Efraimidis-Spirakis exponential race
    keyed on content-hash uniforms): the 100 lowest -ln(u)/w priorities,
    length-weighted. Map-side priority + TakeOrderedAndProject; the
    identical arithmetic replays in the oracle. Registered here (past
    the r2 driver window) rather than in llm_sampling to keep that
    window's composition stable; rotate forward in r3."""
    docs = load_table(spark, sf_dir, "documents")
    from hive_2_3_2_spark.llm.sampling import weighted_sample

    return weighted_sample(docs, 100, "n_chars").select(
        "doc_id", "n_chars", F.round("priority", 6).alias("priority")
    )


@query(
    "sample_temperature_mixture",
    oracle="""
    WITH per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents
      GROUP BY source
    ),
    p AS (
      SELECT source, n, SQRT(n * 1.0 / SUM(n) OVER ()) AS w FROM per
    )
    SELECT source, n, ROUND(w / SUM(w) OVER (), 6) AS weight
    FROM p ORDER BY source
    """,
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (T=2, i.e. p^(1/2) — the
    multilingual-sampling trick that upweights small sources without
    letting any source dominate): per-source weight
    p_i^0.5 / Σ p_j^0.5. Scale shape: one per-source count aggregate
    (map-side partial, ~20 rows), then two window sums over that tiny
    frame — nothing touches the documents scan twice."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    all_w = Window.partitionBy()
    p = F.col("n") / F.sum("n").over(all_w)
    return (
        per.withColumn("__w", F.sqrt(p))
        .withColumn(
            "weight", F.round(F.col("__w") / F.sum("__w").over(all_w), 6)
        )
        .select("source", "n", "weight")
        .orderBy("source")
    )


@query(
    "text_zipf_head",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    cnt AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM tok
      WHERE tok <> '' GROUP BY tok
    )
    SELECT tok, n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS BIGINT)
             AS rank,
           ROUND(MAX(n) OVER () * 1.0 / n, 4) AS zipf_ratio
    FROM cnt ORDER BY rank LIMIT 50
    """,
)
def text_zipf_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf head profile: top-50 corpus tokens with frequency rank and
    f1/fr ratio — the quick sanity plot for tokenizer/corpus drift.
    explode + count is one shuffle with map-side partials; the top-50
    window runs over the distinct-token frame only (TakeOrdered at
    scale, never the raw token stream)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    return (
        cnt.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "zipf_ratio",
            F.round(F.max("n").over(Window.partitionBy()) / F.col("n"), 4),
        )
        .filter(F.col("rank") <= 50)
        .orderBy("rank")
    )
