"""Deduplication suite queries (implementations: hive_2_3_2_spark/llm/dedup.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.llm import dedup as D
from hive_2_3_2_spark.suite import query


@query(
    "dedup_exact_groups",
    oracle=r"""
    SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT)    AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized-content fingerprint
    (llm/dedup.py exact_dedup)."""
    return D.exact_dedup(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_ngram_jaccard_pairs",
    oracle=r"""
    WITH d AS (
      SELECT doc_id,
             CAST(FLOOR(length(text) / 200) AS BIGINT) AS blk,
             list_distinct(list_transform(
               range(greatest(len(string_split(trim(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g')), ' ')) - 2, 1)),
               i -> array_to_string(list_slice(string_split(trim(regexp_replace(
                 lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), i + 1, i + 3), ' ')
             )) AS sh
      FROM documents
    )
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           ROUND(len(list_intersect(a.sh, b.sh)) * 1.0 /
                 len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
    FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
          len(list_distinct(list_concat(a.sh, b.sh))) >= 0.12
    """,
)
def dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard pairs, blocked by length bucket
    (llm/dedup.py jaccard_pairs) — the exact scorer behind MinHash."""
    return D.jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.12
    )


@query(
    "dedup_minhash_near_duplicates",
    oracle=r"""
    WITH d AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(greatest(len(string_split(trim(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g')), ' ')) - 2, 1)),
               i -> array_to_string(list_slice(string_split(trim(regexp_replace(
                 lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), i + 1, i + 3), ' ')
             )) AS sh
      FROM documents
    )
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           ROUND(len(list_intersect(a.sh, b.sh)) * 1.0 /
                 len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
          len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    """,
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidates exact-verified (llm/dedup.py
    minhash_verified_near_dups): shingle→minhash→band→bucket-join, then
    exact Jaccard over candidate pairs only. Oracle brute-forces ALL
    pairs ≥ 0.5; equality holds because banded-LSH recall at s ≥ 0.5
    (r=4, b=8) is 1.0 on this corpus — measured, and deterministic since
    every hash is seeded. Raw candidate recall is separately asserted in
    tests/test_llm.py."""
    return D.minhash_verified_near_dups(
        load_table(spark, sf_dir, "documents"),
        threshold=0.5,
        num_perm=32,
        bands=8,
    )


@query(
    "dedup_simhash_near_duplicates",
    oracle=r"""
    WITH d AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
      FROM documents
    )
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
    FROM d a JOIN d b ON a.fp = b.fp AND a.doc_id < b.doc_id
    ORDER BY doc_id_a, doc_id_b
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pipeline wiring check: identical normalized text
    ⇒ identical simhash ⇒ Hamming 0 ⇒ ALWAYS a candidate (same 16-bit
    prefix block), so the candidate set restricted to fingerprint-equal
    pairs must equal DuckDB's brute-force identical-fingerprint pairs —
    an exact end-to-end check of the fold/banding/Hamming plumbing
    (llm/dedup.py simhash_near_dups). Near-miss (0 < Hamming ≤ 8)
    behavior is asserted in tests/test_llm.py."""
    from hive_2_3_2_spark.llm.text import md5_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    cands = D.simhash_near_dups(docs, max_hamming=8)
    fp = docs.select(
        F.col("doc_id"), md5_fingerprint(F.col("text")).alias("fp")
    )
    return (
        cands.join(
            fp.select(F.col("doc_id").alias("doc_id_a"), F.col("fp").alias("fp_a")),
            "doc_id_a",
        )
        .join(
            fp.select(F.col("doc_id").alias("doc_id_b"), F.col("fp").alias("fp_b")),
            "doc_id_b",
        )
        .filter(F.col("fp_a") == F.col("fp_b"))
        .select("doc_id_a", "doc_id_b")
        .orderBy("doc_id_a", "doc_id_b")
    )


@query(
    "dedup_embedding_cosine_pairs",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             CAST(embedding[1] > 0 AS INT)
             + 2 * CAST(embedding[2] > 0 AS INT)
             + 4 * CAST(embedding[3] > 0 AS INT) AS blk
      FROM embeddings
    )
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           ROUND(list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) *
                  sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
    FROM e a JOIN e b ON a.blk = b.blk AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) /
          (sqrt(list_dot_product(a.v, a.v)) *
           sqrt(list_dot_product(b.v, b.v))) >= 0.4
    """,
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within 3-bit sign blocks
    (llm/dedup.py embedding_near_dups). 3 bits = 8 blocks — the r6 sf1
    sweep showed the old 1-bit default riding the O(n²/2) self-join
    (84x wall at 10x rows); the oracle mirrors the same 3-bit block so
    the declared semantics stay exactly verifiable."""
    return D.embedding_near_dups(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4,
        n_sign_bits=3,
    )


@query(
    "dedup_connected_clusters",
    oracle=r"""
    WITH RECURSIVE d AS (
      SELECT doc_id,
             CAST(FLOOR(length(text) / 200) AS BIGINT) AS blk,
             list_distinct(list_transform(
               range(greatest(len(string_split(trim(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g')), ' ')) - 2, 1)),
               i -> array_to_string(list_slice(string_split(trim(regexp_replace(
                 lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), i + 1, i + 3), ' ')
             )) AS sh
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
            len(list_distinct(list_concat(a.sh, b.sh))) >= 0.12
    ), und AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION ALL SELECT b, a FROM pairs
    ), walk(node, reach) AS (
      SELECT DISTINCT src, src FROM und
      UNION
      SELECT w.node, u.dst FROM walk w JOIN und u ON u.src = w.reach
    )
    SELECT CAST(node AS BIGINT) AS doc_id,
           CAST(MIN(reach) AS BIGINT) AS component
    FROM walk GROUP BY node ORDER BY doc_id
    """,
)
def dedup_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: Jaccard pairs → distributed min-label
    propagation to a fixpoint (llm/dedup.py connected_components — the
    transitive-closure step pairwise dedup lacks). Oracle computes the
    same components with a recursive CTE; the Spark side is the
    Pregel-style iterative-join algorithm that scales."""
    return D.dedup_clusters(load_table(spark, sf_dir, "documents"), threshold=0.12)


@query(
    "dedup_incremental_batch",
    oracle=r"""
    WITH d AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(greatest(len(string_split(trim(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g')), ' ')) - 2, 1)),
               i -> array_to_string(list_slice(string_split(trim(regexp_replace(
                 lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), i + 1, i + 3), ' ')
             )) AS sh
      FROM documents
    ),
    newd AS (SELECT * FROM d WHERE doc_id % 3 = 0),
    oldd AS (SELECT * FROM d WHERE doc_id % 3 != 0),
    pairs AS (
      SELECT n.doc_id AS new_id, o.doc_id AS match_id,
             'store' AS match_side,
             ROUND(len(list_intersect(n.sh, o.sh)) * 1.0 /
                   len(list_distinct(list_concat(n.sh, o.sh))), 6) AS jaccard
      FROM newd n JOIN oldd o ON TRUE
      UNION ALL
      SELECT a.doc_id, b.doc_id, 'batch',
             ROUND(len(list_intersect(a.sh, b.sh)) * 1.0 /
                   len(list_distinct(list_concat(a.sh, b.sh))), 6)
      FROM newd a JOIN newd b ON a.doc_id > b.doc_id
    )
    SELECT new_id, match_id, match_side, jaccard
    FROM pairs WHERE jaccard >= 0.5
    ORDER BY new_id, match_id, match_side
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a new batch (doc_id % 3 = 0) against a
    persisted signature store of the historical corpus (the rest) —
    llm/dedup.py write_signature_store + incremental_near_dups. The
    store (band-partitioned LSH keys + shingle sets) is built once per
    SF and reused, so the measured path is what a daily ingestion run
    pays: shingle/sign the BATCH only, two (band,bh) equi-joins, exact
    verification of candidates. Oracle brute-forces new×old and
    new×earlier-batch pairs at ≥ 0.5 — equality again rides the
    measured recall-1.0 of the r=4,b=8 banding at s ≥ 0.5."""
    import os

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    from hive_2_3_2_spark.suite._scratch import scratch_root

    store_path = os.path.join(
        scratch_root("dedup_store"), os.path.basename(sf_dir.rstrip("/"))
    )
    if not os.path.exists(os.path.join(store_path, "bands")):
        D.write_signature_store(hist, store_path)
    return D.incremental_near_dups(
        spark, batch, store_path, threshold=0.5
    ).orderBy("new_id", "match_id", "match_side")
