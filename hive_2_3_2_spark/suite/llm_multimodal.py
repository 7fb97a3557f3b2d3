"""Multimodal-column suite queries (implementations: llm/multimodal.py).

The container has no image/audio libraries, so payloads are synthesized
from document text (deterministic) — the Spark-side plumbing (binary
columns, typed metadata structs, Arrow batch decode, frame sampling) is
the real, tested surface; the decoder body is the documented stub.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.llm import multimodal as M
from hive_2_3_2_spark.suite import query


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return M.attach_media(
        docs.select("doc_id", F.col("text").cast("binary").alias("payload")),
        "payload",
        "doc_id",
        "text/fake-image",
    )


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           'text/fake-image' AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata struct: the ingest-time metadata
    (byte length, mime) is exact and oracle-checkable."""
    return _media(spark, sf_dir).select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )


@query(
    "multimodal_feature_extract",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, text,
             octet_length(encode(text)) AS nb
      FROM documents
    )
    SELECT media_id, 'text/fake-image' AS mime, CAST(nb AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(range(least(nb, 64)),
                  i -> ascii(substring(text, CAST(i + 1 AS INT), 1))))
                // greatest(least(nb, 64), 1) AS BIGINT) AS feat_mean,
           CAST(64 + nb % 577 AS VARCHAR) || 'x' ||
             CAST(64 + (nb * 31) % 421 AS VARCHAR) AS feat_head
    FROM m
    """,
)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode + feature extraction via mapInPandas
    (llm/multimodal.py extract_features). The decoder is the documented
    deterministic stub (no image libs in container): pseudo-dims
    64+(n%577) × 64+(31n%421), mean of the first 64 payload bytes —
    pure arithmetic over ASCII text bytes, so DuckDB reproduces every
    value and the mapInPandas plumbing gets a full hash-checked row.
    Batch-shape/schema invariants additionally pinned in tests/test_llm.py."""
    return M.extract_features(_media(spark, sf_dir))


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(UNNEST(range(greatest(
             CAST(FLOOR(octet_length(encode(text)) / 64) AS BIGINT), 1)))
             AS BIGINT) AS frame_no
    FROM documents
    """,
)
def mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one row per fixed-size payload window
    (JVM-side posexplode — the video frame-step plan shape)."""
    return M.frame_sample(_media(spark, sf_dir), every_n_bytes=64)


@query(
    "multimodal_resize",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS nb
      FROM documents
    )
    SELECT media_id,
           CAST(CASE WHEN nb = 0 THEN 0 ELSE 64 END AS BIGINT) AS n_bytes,
           CASE WHEN nb = 0 THEN ''
                ELSE array_to_string(list_transform(range(64),
                       i -> substr(hx, CAST(2 * ((i * nb) // 64) + 1 AS INT),
                                   2)), '')
           END AS hx_out
    FROM m
    ORDER BY media_id
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing (llm/multimodal.py resize_media): stride-resample
    every payload to exactly 64 bytes inside mapInPandas Arrow batches
    (the stubbed stand-in for PIL resize — see the implementation
    docstring). Output byte i = input byte (i*n)//64, pure integer
    arithmetic, so the oracle recomputes the resized bytes hex-pair by
    hex-pair in SQL and the driver hash-checks them."""
    resized = M.resize_media(_media(spark, sf_dir), target_bytes=64)
    return resized.select(
        "media_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.hex(F.col("payload")).alias("hx_out"),
    ).orderBy("media_id")


@query(
    "multimodal_real_decode_ppm",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             lpad(CAST((doc_id + 1) * 7919 AS VARCHAR), 12, '0') AS dd
      FROM documents WHERE doc_id < 20
    ),
    digits AS (
      SELECT doc_id,
             UNNEST(string_split(dd, '')) AS ch
      FROM d
    ),
    sums AS (
      SELECT doc_id, SUM(CAST(ch AS INT)) AS s
      FROM digits WHERE ch != '' GROUP BY doc_id
    )
    SELECT d.doc_id AS media_id,
           '8x8' AS feat_head,
           CAST(48 + FLOOR((16.0 * s.s) / 192) AS BIGINT) AS feat_mean,
           CAST(11 + 192 AS BIGINT) AS n_bytes
    FROM d JOIN sums s USING (doc_id)
    ORDER BY media_id
    """,
)
def multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL image-decode path, driver-verified: each doc builds a
    valid 8×8 PPM P6 payload whose 192 pixel bytes are the ASCII digits
    of a deterministic per-doc number (repeat(lpad(id·7919, 12), 16)) —
    constructible identically in both engines. Spark runs the actual
    pure-numpy decoder (llm/multimodal.py decode_ppm via
    extract_features: strict header parse, exact pixel read) and
    reports true dimensions + the integer pixel mean; the oracle
    recomputes that mean arithmetically (floor over 48+digit bytes).
    A hash match therefore PROVES the decoder read the pixels — not a
    stub contract."""
    from hive_2_3_2_spark.llm import multimodal as M

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    payload = F.concat(
        F.lit("P6\n8 8\n255\n"),
        F.repeat(
            F.lpad(((F.col("doc_id") + 1) * 7919).cast("string"), 12, "0"),
            16,
        ),
    ).cast("binary")
    media = M.attach_media(
        docs.withColumn("payload", payload), "payload", "doc_id", "image/ppm"
    )
    return (
        M.extract_features(media)
        .select("media_id", "feat_head", "feat_mean", "n_bytes")
        .orderBy("media_id")
    )
