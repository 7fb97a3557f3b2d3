"""UDF / UDAF / UDTF extension API (SURVEY §2.11).

Reference extension points:
- scalar  GenericUDF      (ql/.../udf/generic/GenericUDF.java:68)
- agg     GenericUDAFEvaluator (ql/.../udf/generic/GenericUDAFEvaluator.java:50
          — iterate/terminatePartial/merge/terminate lifecycle)
- table   GenericUDTF     (ql/.../udf/generic/GenericUDTF.java:37)
- registration CREATE [TEMPORARY] FUNCTION → exec/FunctionTask.java,
  FunctionRegistry.java:1589

Spark-first equivalents, exposed as decorators/registrars:
- scalar: ``scalar_udf`` (row Python — compat path) and ``vector_udf``
  (Arrow pandas_udf — 10-100× faster; the default users should pick);
- UDAF: ``grouped_agg_udf`` (pandas GROUPED_AGG — Spark runs partial
  aggregation per shuffle side, the same split Hive's evaluator modes
  express) and applyInPandas for full-partition custom logic;
- UDTF: ``row_udtf`` — PySpark's native Python UDTF class API
  (process/terminate ≈ GenericUDTF.process:81/forward:106).

All registered names are callable from SQL (``spark.sql``) — the
CREATE TEMPORARY FUNCTION surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def scalar_udf(
    spark: SparkSession, name: str, fn: Callable, return_type: str
):
    """Register a row-at-a-time Python UDF under ``name`` (CREATE
    TEMPORARY FUNCTION parity). Prefer vector_udf for hot paths."""
    return spark.udf.register(name, fn, return_type)


def vector_udf(
    spark: SparkSession, name: str, fn: Callable, return_type: str
):
    """Register an Arrow-vectorized scalar UDF: ``fn`` maps
    pandas.Series → pandas.Series. This is the performance-correct
    extension point (JVM↔Python transfer is Arrow batches)."""
    return spark.udf.register(name, F.pandas_udf(fn, return_type))


def grouped_agg_udf(
    spark: SparkSession, name: str, fn: Callable, return_type: str
):
    """Register a UDAF: ``fn`` maps pandas.Series → scalar.

    Usable in groupBy().agg() and over unbounded windows. Catalyst splits
    partial/final automatically — the GenericUDAFEvaluator mode lifecycle
    (COMPLETE/PARTIAL1/FINAL...) with zero user code."""
    udaf = F.pandas_udf(fn, return_type, F.PandasUDFType.GROUPED_AGG)
    return spark.udf.register(name, udaf)


def row_udtf(spark: SparkSession, name: str, cls: type, return_type: str):
    """Register a Python UDTF class (native PySpark UDTF API):

        class Expand:
            def eval(self, x: int):      # ≈ GenericUDTF.process (:81)
                yield (x, 'a')            # ≈ forward (:106)
                yield (x, 'b')
            def terminate(self):          # ≈ GenericUDTF.close
                yield (-1, 'end')

        row_udtf(spark, "expand", Expand, "k int, tag string")
        spark.sql("SELECT * FROM expand(1)")
    """
    udtf_obj = F.udtf(cls, returnType=return_type)
    spark.udtf.register(name, udtf_obj)
    return udtf_obj
