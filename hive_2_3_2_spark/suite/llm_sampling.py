"""Deterministic sampling suite entries (llm/sampling.py) — the
reproducible train/eval-split and stratified-sample primitives a
training-data pipeline needs; both fully oracle-checkable because every
decision is content-addressed (md5), not RNG-based."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.llm import sampling as S
from hive_2_3_2_spark.suite import query


@query(
    "sample_hash_split",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
                THEN 'train' ELSE 'eval' END AS split
    FROM documents
    ORDER BY doc_id
    """,
)
def hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/20 train-eval split by md5 prefix threshold —
    same assignment on any engine/run (llm/sampling.py hash_split)."""
    return (
        S.hash_split(load_table(spark, sf_dir, "documents"), train_frac=0.8)
        .select("doc_id", "lang", "split")
        .orderBy("doc_id")
    )


@query(
    "sample_stratified_per_lang",
    oracle="""
    SELECT lang, doc_id, CAST(sample_rank AS INT) AS sample_rank
    FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 4), doc_id
             ) AS sample_rank
      FROM documents
    )
    WHERE sample_rank <= 5
    ORDER BY lang, sample_rank
    """,
)
def stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-5-per-language deterministic stratified sample
    (llm/sampling.py stratified_take; WindowGroupLimit prunes the sort)."""
    return (
        S.stratified_take(load_table(spark, sf_dir, "documents"), k=5)
        .select("lang", "doc_id", "sample_rank")
        .orderBy("lang", "sample_rank")
    )


@query(
    "sample_mixture_rates",
    oracle="""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM documents
    WHERE CASE source
            WHEN 'src0' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4ccd'
            WHEN 'src1' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
            WHEN 'src2' THEN FALSE
            ELSE TRUE
          END
    GROUP BY source
    ORDER BY source
    """,
)
def mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix reweighting: keep 30% of src0, 50% of src1, 0% of
    src2, 100% of the rest — deterministic per-doc hash decision
    (llm/sampling.py mixture_sample). default_rate=1.0 exercises the
    keep-everything path (integer threshold 65536 > every 16-bit bucket)."""
    docs = load_table(spark, sf_dir, "documents")
    kept = S.mixture_sample(
        docs, rates={"src0": 0.3, "src1": 0.5, "src2": 0.0}, default_rate=1.0
    )
    return (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("source")
    )


@query(
    "sample_shuffle_shard",
    oracle="""
    WITH k AS (
      SELECT doc_id, md5('42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      FROM documents
    )
    SELECT doc_id, shuffle_key,
           CAST(strpos('0123456789abcdef', substr(shuffle_key, 1, 1)) - 1
                AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY substr(shuffle_key, 1, 1)
             ORDER BY shuffle_key, doc_id
           ) AS INT) AS pos
    FROM k
    ORDER BY shard, pos
    """,
)
def shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training shuffle (llm/sampling.py shuffle_and_shard):
    seed-42 md5 permutation split into 16 contiguous shards. With n=16
    the high-bits shard id IS the key's first hex char, which is how the
    oracle reproduces it without hex→int conversion. pos (rank within
    shard by key) pins the exact intra-shard ORDER — the property a
    training reader depends on — not just shard membership."""
    docs = load_table(spark, sf_dir, "documents")
    sharded = S.shuffle_and_shard(docs, n_shards=16, seed=42)
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return (
        sharded.withColumn("pos", F.row_number().over(w).cast("int"))
        .select("doc_id", "shuffle_key", "shard", "pos")
        .orderBy("shard", "pos")
    )


@query(
    "sample_domain_cap",
    oracle=r"""
    WITH u AS (
      SELECT doc_id,
             'https://www.' || source || '-m' || CAST(doc_id % 37 AS VARCHAR)
               || '.Example.COM:8080/page/' || CAST(doc_id AS VARCHAR)
               || '?ref=x' AS url
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             regexp_extract(lower(url),
               '^(?:[a-z][a-z0-9+.-]*://)?(?:www\.)?([^/:?#]+)', 1) AS host
      FROM u
    ),
    r AS (
      SELECT host, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY host
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 4), doc_id
             ) AS rn
      FROM h
    )
    SELECT host, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum
    FROM r WHERE rn <= 10
    GROUP BY host
    ORDER BY host
    """,
)
def domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota cap (llm/sampling.py domain_cap): canonicalize a
    URL to its host (lowercase, scheme/www/port/path stripped — one JVM
    regex, mirrored verbatim in the oracle) and keep at most 10 docs per
    host by content-addressed hash order. URLs are synthesized
    deterministically from (source, doc_id) since the corpus has no url
    column; the mixed-case host and :8080/path/?query salt prove each
    canonicalization rule fires. kept_id_sum pins the exact survivor
    set, not just its size."""
    docs = load_table(spark, sf_dir, "documents")
    with_url = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://www."),
            F.col("source"),
            F.lit("-m"),
            (F.col("doc_id") % 37).cast("string"),
            F.lit(".Example.COM:8080/page/"),
            F.col("doc_id").cast("string"),
            F.lit("?ref=x"),
        ),
    )
    capped = S.domain_cap(with_url, url_col="url", k=10)
    return (
        capped.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").cast("long").alias("kept_id_sum"),
        )
        .orderBy("host")
    )


@query(
    "sample_interleave_weighted",
    oracle="""
    SELECT doc_id, source, CAST(src_rank AS INT) AS src_rank,
           ROUND(src_rank / CASE source
               WHEN 'src0' THEN 3.0
               WHEN 'src1' THEN 1.5
               ELSE 1.0 END, 6) AS interleave_pos
    FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 4), doc_id
             ) AS src_rank
      FROM documents
    )
    ORDER BY interleave_pos, doc_id
    LIMIT 100
    """,
)
def interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted proportional interleave of sources (llm/sampling.py
    interleave_by_weight): src0 at 3×, src1 at 1.5× the base rate —
    the deterministic batch-assembly ordering of a training mix."""
    return (
        S.interleave_by_weight(
            load_table(spark, sf_dir, "documents"),
            weights={"src0": 3.0, "src1": 1.5},
        )
        .select("doc_id", "source", "src_rank", "interleave_pos")
        .limit(100)
    )


@query(
    "sample_group_split_leakage_free",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
               AS f
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN substr(md5(f), 1, 4) < 'cccd'
                THEN 'train' ELSE 'eval' END AS split
    FROM fp ORDER BY doc_id
    """,
)
def sample_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free split (llm/sampling.py group_hash_split): the 80/20
    hash threshold applies to the exact-dup CONTENT FINGERPRINT rather
    than the row id, so duplicate documents can never straddle the
    train/eval boundary (near-dup leakage is the classic eval
    contamination bug; transitive clusters compose via
    connected-components ids the same way). Map-side only — no shuffle,
    no join; the oracle replays fingerprint → md5-prefix threshold."""
    from hive_2_3_2_spark.llm.text import md5_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    return (
        S.group_hash_split(
            docs, md5_fingerprint(F.col("text")), train_frac=0.8
        )
        .select("doc_id", "split")
        .orderBy("doc_id")
    )
