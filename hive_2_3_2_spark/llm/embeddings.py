"""Embedding-column operators: normalization, dimensionality reduction,
quantization, per-dimension statistics.

The vector-hygiene passes a 100 TB embedding corpus runs before/alongside
similarity search (llm/similarity.py) and near-dup detection
(llm/dedup.py):

- ``l2_normalize``: unit-norm vectors so dot product == cosine — makes
  every downstream scorer a plain (cheaper) dot product.
- ``random_projection``: Johnson-Lindenstrauss Gaussian projection to a
  lower dimension (Achlioptas/JL; the standard cheap dim-reduction for
  ANN pre-indexing). The projection matrix is a deterministic seeded
  Gaussian — tiny (in_dim × out_dim floats), broadcast inside the Arrow
  UDF closure; one numpy matmul per batch (a k×dim literal-expression
  tree falls out of whole-stage codegen — same failure mode as the
  MinHash fold, see llm/similarity.py).
- ``quantize_int8`` / ``dequantize_int8``: per-vector symmetric int8
  quantization — 4× less storage/shuffle bandwidth than float32, THE
  lever for moving embedding corpora between stages at scale. Rounding
  is pinned to ``floor(x/scale + 0.5)`` so any engine (and the DuckDB
  oracle) reproduces the codes bit-for-bit.
- ``dimension_stats``: per-dimension mean/std across the corpus (the
  whitening/centering statistics). Map-side partial aggregation: the
  shuffle carries dim × (sum, sumsq, n) partials, never row data.

All operators are map-side only (no shuffle except the stats aggregate);
at 100 TB each fuses into whatever scan already runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-top: pandas_udf str-hints must resolve here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def l2_norm(vec: Column) -> Column:
    """Euclidean norm of an array<double> column (JVM-side fold)."""
    return F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def l2_normalize(vec: Column) -> Column:
    """Unit-normalize an array column (JVM-side). Zero vectors stay
    zero (no NaN poisoning downstream aggregates)."""
    n = l2_norm(vec)
    return F.when(n == 0, vec).otherwise(
        F.transform(vec, lambda x: x / n)
    )


def gaussian_projection_matrix(
    in_dim: int, out_dim: int, seed: int = 7
) -> list[list[float]]:
    """Deterministic JL projection matrix, scaled by 1/sqrt(out_dim)
    (preserves expected norms). Row-major: matrix[i][j] maps input dim i
    to output dim j."""
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((in_dim, out_dim)) / np.sqrt(out_dim)
    return m.tolist()


def _project_udf(matrix: list[list[float]]):
    """Arrow-vectorized projection: (batch, in_dim) @ (in_dim, out_dim)
    in one matmul. Factory form per repo convention."""
    M = np.asarray(matrix, dtype=np.float64)

    @pandas_udf("array<double>")
    def project(vecs: pd.Series) -> pd.Series:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        return pd.Series(list(V @ M))

    return project


def random_projection(vec: Column, matrix: list[list[float]]) -> Column:
    """Project an array<double> column through ``matrix`` (in_dim ×
    out_dim). Use gaussian_projection_matrix for a seeded JL matrix, or
    pass a learned (e.g. PCA) matrix — the operator only assumes a fixed
    small matrix that fits in the UDF closure."""
    return _project_udf(matrix)(vec)


def quantize_int8(vec: Column) -> Column:
    """Per-vector symmetric int8 quantization.

    Returns struct(scale double, codes array<int>) with
    ``scale = max(|v|)/127`` and ``codes[i] = floor(v[i]/scale + 0.5)``
    (explicit floor-based half-up so the arithmetic is engine-portable —
    built-in round() differs between HALF_UP and banker's across
    engines). Zero vectors get scale 0 and all-zero codes."""
    absmax = F.aggregate(
        vec, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = absmax / F.lit(127.0)
    codes = F.when(
        absmax == 0, F.transform(vec, lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            vec, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int")
        )
    )
    return F.struct(scale.alias("scale"), codes.alias("codes"))


def dequantize_int8(q: Column) -> Column:
    """Inverse of quantize_int8: codes * scale → array<double>."""
    scale = q.getField("scale")
    return F.transform(q.getField("codes"), lambda c: c * scale)


def dimension_stats(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """Per-dimension (dim, mean, std) across the corpus — the
    centering/whitening statistics.

    posexplode to (dim, value) rows, then one groupBy(dim): Catalyst's
    map-side partial aggregation means the shuffle carries only
    dim × (count, sum, sumsq) partials per task — constant in corpus
    size. (The no-explode alternative — dim separate avg(v[i]) columns —
    is what kmeans_centroids uses; here rows-per-dim IS the wanted
    output shape.)"""
    v = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "dim", "val"
        )
    )
    return (
        v.groupBy("dim")
        .agg(
            F.avg("val").alias("mean"),
            F.stddev_pop("val").alias("std"),
        )
        .select(F.col("dim").cast("long").alias("dim"), "mean", "std")
    )
