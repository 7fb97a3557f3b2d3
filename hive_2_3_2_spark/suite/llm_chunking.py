"""Chunking / packing suite queries (implementations: llm/chunking.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.llm.chunking import chunk_documents, pack_sequences
from hive_2_3_2_spark.suite import query


@query(
    "chunk_documents_overlapping",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    starts AS (
      SELECT doc_id, toks,
             CAST(UNNEST(range(0,
               greatest(CAST(FLOOR((len(toks) - 1) / 48) AS BIGINT) * 48, 0)
               + 1, 48)) AS BIGINT) AS start
      FROM t
    )
    SELECT doc_id,
           CAST(start / 48 AS BIGINT) AS chunk_id,
           CAST(least(len(toks) - start, 64) AS BIGINT) AS n_tokens,
           array_to_string(list_slice(toks, start + 1, start + 64), ' ')
             AS chunk_text
    FROM starts
    WHERE len(toks) - start > 0
    """,
)
def chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token windows, 16 overlap →
    stride 48) — context-window prep, map-side only (no shuffle)."""
    return chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    )


@query(
    "pack_sequences_greedy",
    oracle=r"""
    WITH RECURSIVE base AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_tokens,
             doc_id % 32 AS shard,
             ROW_NUMBER() OVER (PARTITION BY doc_id % 32 ORDER BY doc_id)
               AS rn
      FROM documents
    ),
    steps AS (
      SELECT shard, rn, doc_id, n_tokens,
             CAST(0 AS BIGINT) AS pack_local, n_tokens AS fill
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.shard, b.rn, b.doc_id, b.n_tokens,
             CASE WHEN s.fill + b.n_tokens > 512
                  THEN s.pack_local + 1 ELSE s.pack_local END,
             CASE WHEN s.fill + b.n_tokens > 512
                  THEN b.n_tokens ELSE s.fill + b.n_tokens END
      FROM steps s
      JOIN base b ON b.shard = s.shard AND b.rn = s.rn + 1
    )
    SELECT doc_id,
           CAST(shard * 1099511627776 + pack_local AS BIGINT) AS pack_id,
           n_tokens,
           CAST(MAX(fill) OVER (PARTITION BY shard, pack_local) AS BIGINT)
             AS pack_fill
    FROM steps
    """,
)
def pack_seqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget sequence packing, sharded for parallelism
    (llm/chunking.py pack_sequences). The per-shard sequential next-fit
    is deterministic (doc_id order, pmod sharding), so the DuckDB oracle
    REPLAYS it exactly with a recursive CTE walking each shard row-by-row
    — the connected-components trick applied to a sequential algorithm.
    Budget/coverage invariants additionally asserted in tests/test_llm.py."""
    return pack_sequences(
        load_table(spark, sf_dir, "documents"), budget=512
    )


@query(
    "pack_length_buckets",
    oracle=r"""
    WITH base AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_tokens,
             CAST(doc_id % 8 AS BIGINT) AS shard
      FROM documents
    ), b AS (
      SELECT *, CAST(length(bin(n_tokens)) AS BIGINT) AS bucket FROM base
    ), r AS (
      SELECT *,
             (ROW_NUMBER() OVER (PARTITION BY bucket, shard
                                 ORDER BY doc_id) - 1) // 8 AS batch_id
      FROM b
    )
    SELECT bucket, shard, CAST(batch_id AS BIGINT) AS batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MAX(n_tokens) AS max_tokens,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           ROUND((MAX(n_tokens) * COUNT(*) - SUM(n_tokens)) * 1.0 /
                 (MAX(n_tokens) * COUNT(*)), 6) AS padding_frac
    FROM r GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assignment (llm/chunking.py
    length_bucket_batches): power-of-two token-length buckets, per-shard
    row_number batching (parallel — no global sort), per-batch padding
    waste. Bucket = integer bit-length via conv(n,10,2), so DuckDB's
    bin() reproduces it exactly; every downstream stat is integer
    arithmetic + one final division, hence hash-stable."""
    from hive_2_3_2_spark.llm.chunking import length_bucket_batches

    return length_bucket_batches(
        load_table(spark, sf_dir, "documents"), batch_size=8, shards=8
    ).orderBy("bucket", "shard", "batch_id")
