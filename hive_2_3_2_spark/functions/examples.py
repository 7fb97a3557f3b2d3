"""Importable example callables for CREATE TEMPORARY FUNCTION.

The reference resolves the AS-string of CREATE [TEMPORARY] FUNCTION to a
JVM class on the session classpath (exec/FunctionTask.java — Registry
.registerTemporaryUDF). This engine's extension language is Python, so
the AS-string names an importable ``module.attr`` instead; these are the
shipped examples (and the test fixtures for that statement surface).

Two shapes are accepted by the resolver:
- a plain callable — registered as a row Python UDF; the SQL return
  type derives from the ``-> type`` annotation (str/int/float/bool/bytes;
  unannotated defaults to string), mirroring how FunctionTask derives
  the UDF signature from the class;
- a prebuilt ``UserDefinedFunction`` (``F.udf`` / ``F.pandas_udf``) —
  registered as-is; this is the Arrow-vectorized fast path users should
  prefer for hot loops (udf_api.vector_udf rationale).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def word_count(s: str) -> int:
    """Whitespace-token count (split() semantics: runs of whitespace,
    leading/trailing ignored, empty/NULL → 0)."""
    return len(s.split()) if s else 0


def sign_label(x: float) -> str:
    """'pos' / 'neg' / 'zero' classification of a numeric value."""
    if x is None:
        return None
    if x > 0:
        return "pos"
    if x < 0:
        return "neg"
    return "zero"


def _double_series(s):
    return s * 2.0


# Prebuilt Arrow-vectorized UDF (pandas Series -> Series): resolves via
# CREATE TEMPORARY FUNCTION twice_it AS
#   'hive_2_3_2_spark.functions.examples.twice'.
# Built lazily (PEP 562): parsing the "double" DDL type needs the
# driver JVM, and executors re-import this module when unpickling the
# plain-callable UDFs above — a module-level pandas_udf would crash
# there.
def __getattr__(name: str):
    if name == "twice":
        return F.pandas_udf(_double_series, "double")
    raise AttributeError(name)
