"""Embedding-ops suite entries (implementations: llm/embeddings.py):
normalization, JL random projection, int8 quantization, per-dimension
statistics — all deterministic arithmetic, all DuckDB-oracled.

The projection oracle bakes the seeded Gaussian matrix into the SQL as
literals (full-precision repr round-trips exactly); the quantization
oracle mirrors the implementation's exact IEEE expression structure
(``floor(v/(absmax/127)+0.5)``) so codes are bit-identical with no
summation anywhere. Float aggregates (means/stds/dots) are rounded to
4dp — summation order differs across engines (BLAS vs sequential), so
6dp would sit too close to half-ULP rounding boundaries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.llm import embeddings as E
from hive_2_3_2_spark.suite import query

_IN_DIM, _OUT_DIM = 64, 8
_MATRIX = E.gaussian_projection_matrix(_IN_DIM, _OUT_DIM, seed=7)


def _col_literal(j: int) -> str:
    """DuckDB list literal for projection-matrix column j."""
    vals = ", ".join(repr(_MATRIX[i][j]) for i in range(_IN_DIM))
    return f"[{vals}]::DOUBLE[]"


@query(
    "emb_l2_normalize",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
    SELECT vec_id,
           ROUND(nrm, 4) AS norm_before,
           ROUND(CASE WHEN nrm = 0 THEN v[1] ELSE v[1] / nrm END, 4) AS u0,
           ROUND(CASE WHEN nrm = 0 THEN v[2] ELSE v[2] / nrm END, 4) AS u1,
           ROUND(CASE WHEN nrm = 0 THEN 0.0
                 ELSE sqrt(list_dot_product(
                        list_transform(v, x -> x / nrm),
                        list_transform(v, x -> x / nrm))) END,
                 4) AS norm_after
    FROM n
    """,
)
def l2_normalize_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-normalization (llm/embeddings.py l2_normalize): JVM-side
    transform/fold, map-side only. Emits pre/post norms + first two
    normalized coords; post-norm rounds to 1.0 for non-zero vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    u = E.l2_normalize(v)
    return emb.select(
        "vec_id",
        F.round(E.l2_norm(v), 4).alias("norm_before"),
        F.round(u[0], 4).alias("u0"),
        F.round(u[1], 4).alias("u1"),
        F.round(E.l2_norm(u), 4).alias("norm_after"),
    )


@query(
    "emb_random_projection",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    )
    SELECT vec_id,
    """
    + ",\n".join(
        f"       ROUND(list_dot_product(v, {_col_literal(j)}), 4) AS p{j}"
        for j in range(_OUT_DIM)
    )
    + """
    FROM e
    """,
)
def random_projection_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss projection 64→8 dims (llm/embeddings.py
    random_projection): seeded Gaussian matrix, one Arrow matmul per
    batch. The oracle recomputes every output dim via list_dot_product
    against the same matrix baked in as literals."""
    emb = load_table(spark, sf_dir, "embeddings")
    p = E.random_projection(
        F.col("embedding").cast("array<double>"), _MATRIX
    )
    return emb.select(
        "vec_id",
        *[F.round(p[j], 4).alias(f"p{j}") for j in range(_OUT_DIM)],
    )


@query(
    "emb_quantize_int8",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS am
      FROM e
    ),
    q AS (
      SELECT vec_id, am,
             CASE WHEN am = 0
                  THEN list_transform(v, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(v, x ->
                       CAST(floor(x / (am / 127.0) + 0.5) AS BIGINT)) END
               AS codes
      FROM s
    )
    SELECT vec_id,
           ROUND(am / 127.0, 6) AS scale,
           CAST(codes[1] AS BIGINT) AS c0,
           CAST(codes[2] AS BIGINT) AS c1,
           CAST(list_sum(codes) AS BIGINT) AS sum_codes,
           CAST(list_min(codes) AS BIGINT) AS min_code,
           CAST(list_max(codes) AS BIGINT) AS max_code
    FROM q
    """,
)
def quantize_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization (llm/embeddings.py quantize_int8).
    Codes are bit-identical across engines: floor(v/(absmax/127)+0.5)
    involves only correctly-rounded IEEE ops (no summation), and the
    oracle mirrors the exact expression structure. Emits scale, two
    codes, and code aggregates (sum/min/max) as integer columns."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = E.quantize_int8(F.col("embedding").cast("array<double>"))
    codes = q.getField("codes")
    return emb.select(
        "vec_id",
        F.round(q.getField("scale"), 6).alias("scale"),
        codes[0].cast("long").alias("c0"),
        codes[1].cast("long").alias("c1"),
        F.aggregate(
            codes, F.lit(0).cast("long"), lambda a, c: a + c
        ).alias("sum_codes"),
        F.array_min(codes).cast("long").alias("min_code"),
        F.array_max(codes).cast("long").alias("max_code"),
    )


@query(
    "emb_dimension_stats",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    x AS (
      SELECT UNNEST(range(len(v))) AS dim, UNNEST(v) AS val FROM e
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           ROUND(AVG(val), 4) AS mean,
           ROUND(stddev_pop(val), 4) AS std
    FROM x GROUP BY dim
    """,
)
def dimension_stats_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension centering/whitening stats (llm/embeddings.py
    dimension_stats): posexplode + one groupBy(dim) — map-side partials
    mean the shuffle carries dim×(count,sum,sumsq), constant in corpus
    size. 4dp rounding absorbs cross-engine summation-order noise."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = E.dimension_stats(emb)
    return out.select(
        "dim",
        F.round(F.col("mean"), 4).alias("mean"),
        F.round(F.col("std"), 4).alias("std"),
    )


# --- SemDeDup-style semantic pruning (llm/dedup.py semantic_dedup) ------
# The sign-LSH "cluster" hyperplanes are seeded, so the oracle bakes them
# in as full-precision literals and replays bucketing + keep-first
# pruning exactly.
from hive_2_3_2_spark.llm import dedup as D  # noqa: E402
from hive_2_3_2_spark.llm import similarity as S  # noqa: E402

_SD_PLANES = S.hyperplanes(dim=64, n_planes=4, seed=7)


def _plane_literal(p: list[float]) -> str:
    return "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[]"


_BUCKET_SQL = " + ".join(
    f"(CAST(list_dot_product(v, {_plane_literal(p)}) > 0 AS BIGINT) * {1 << i})"
    for i, p in enumerate(_SD_PLANES)
)


@query(
    "dedup_semantic_kept",
    oracle=f"""
    WITH e AS (
      SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    bk AS (
      SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm,
             {_BUCKET_SQL} AS bucket
      FROM e
    ),
    dropped AS (
      SELECT DISTINCT a.id
      FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.id > b.id
      WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.3
    )
    SELECT bk.id AS vec_id, bk.bucket, (d.id IS NULL) AS kept
    FROM bk LEFT JOIN dropped d ON bk.id = d.id
    """,
)
def semantic_dedup_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style pruning (llm/dedup.py semantic_dedup): sign-LSH
    bucket as the semantic cluster, keep-first (lowest id) among
    in-bucket neighbors at cosine >= 0.3 (the synthetic embeddings are
    near-isotropic — max pairwise cosine ~0.5 — so 0.3 sits at ~P99 of
    the pair distribution and exercises real pruning; production
    near-dup thresholds like 0.9 would be trivially all-kept here). Emits every vector with its
    bucket and kept flag so the drop set is auditable."""
    emb = load_table(spark, sf_dir, "embeddings")
    return D.semantic_dedup(
        emb, n_planes=4, dim=64, threshold=0.3, seed=7
    ).select(F.col("id").alias("vec_id"), "bucket", "kept")
