"""Hive bucket-hash parity for string keys.

Reference: ObjectInspectorUtils.hashCode, case STRING
(serde/src/java/org/apache/hadoop/hive/serde2/objectinspector/
ObjectInspectorUtils.java:673-683): a fold over the SIGNED UTF-8 bytes,
``r = r * 31 + b`` with int32 wraparound — equal to Java
``String.hashCode()`` for ASCII text. Bucket number is then
``(hash & Integer.MAX_VALUE) % numBuckets``
(ObjectInspectorUtils.getBucketNumber:619-625).

Spark's own ``hash()`` is Murmur3 — a different function — so
TABLESAMPLE(BUCKET ... ON string_col) can only reproduce Hive's exact
row set through this fold. The byte loop can't stay JVM-side without an
interpreted per-character aggregate, so it's an Arrow-vectorized pandas
UDF (the sanctioned Python case: semantics Spark's built-ins can't
express).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-top: pandas_udf str-hints must resolve here
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

_UDF_NAME = "hive_bucket_hash"


def _hash_one(s: str | None) -> int | None:
    if s is None:
        return None
    b = np.frombuffer(s.encode("utf-8"), dtype=np.int8)
    r = np.int32(0)
    with np.errstate(over="ignore"):
        for x in b:
            r = np.int32(r * np.int32(31) + np.int32(x))
    return int(r)


def hive_bucket_hash_udf():
    """ObjectInspectorUtils.hashCode(STRING) as an Arrow pandas UDF:
    signed-UTF-8-byte fold with int32 wraparound; NULL → NULL.
    Factory form (not module-level @pandas_udf): a module-level UDF
    object requires an active session at import time, which breaks on
    executors importing this module to unpickle."""

    @pandas_udf("int")
    def hive_bucket_hash(s: pd.Series) -> pd.Series:
        return s.map(_hash_one).astype("Int32")

    return hive_bucket_hash


def hive_bucket_hash(col):
    """Column form: hive_bucket_hash(col) — Hive's string bucket hash."""
    return hive_bucket_hash_udf()(col)


def register_hive_hash(spark: SparkSession) -> None:
    """Make hive_bucket_hash callable from SQL (idempotent)."""
    spark.udf.register(_UDF_NAME, hive_bucket_hash_udf())
