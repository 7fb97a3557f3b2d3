"""Python equivalents of the reference's TEST-JAR UDF classes.

The golden corpus registers a handful of functions that live in the
reference's test jars rather than the product registry (itests/util
UDFs, the contrib example UDTF, and the vectorized-badexample custom
jar). Their behaviors are tiny and documented; re-expressing them here
lets CREATE TEMPORARY FUNCTION accept the golden .q files' exact
AS-strings (engine.py maps the class names to these attributes):

- testlength — itests/util/src/main/java/org/apache/hadoop/hive/ql/
  udf/UDFTestLength.java:35 (``IntWritable evaluate(Text)``: string
  length, NULL-preserving)
- testlength2 — .../UDFTestLength2.java:32 (same semantics via Java
  primitives)
- test_udf_get_java_string — .../generic/GenericUDFTestGetJavaString
  .java:43 (identity that re-wraps as a lazy Java String — a pure
  passthrough value-wise)
- sum_list — .../generic/GenericUDAFSumList.java:128 (sums every
  element of every input list, converted toLong; LongWritable result)
- UDAFTestMax — .../UDAFTestMax.java is behaviorally Hive's max over
  each primitive type; engine.py registers it as an alias of the
  builtin ``max`` (all overloads for free) instead of a Python UDAF
- UDTFCount2 — contrib/src/java/org/apache/hadoop/hive/contrib/udtf/
  example/GenericUDTFCount2.java (counts input rows in process(),
  forwards the count TWICE in close())
- rot13 — itests/custom-udfs/udf-vectorized-badexample/src/main/java/
  hive/it/custom/udfs/GenericUDFRot13.java (ROT13 over ASCII letters)

Everything is Arrow-vectorized (pandas_udf / GROUPED_AGG) — no
row-at-a-time Python in any scan path. The UDF objects are built
LAZILY via module ``__getattr__`` from NESTED functions: a module-level
``@pandas_udf`` both needs an active session at import time and gets
pickled by reference, so executors re-importing this module would blow
up — nested closures pickle by value and the module import stays inert.
"""

from __future__ import annotations


def _build_testlength():
    from pyspark.sql.functions import pandas_udf

    def _testlength(s):
        return s.str.len().astype("Int32")

    return pandas_udf(_testlength, "int")


def _build_testlength2():
    from pyspark.sql.functions import pandas_udf

    def _testlength2(s):
        return s.str.len().astype("Int32")

    return pandas_udf(_testlength2, "int")


def _build_test_udf_get_java_string():
    from pyspark.sql.functions import pandas_udf

    def _identity(s):
        return s

    return pandas_udf(_identity, "string")


def _build_rot13():
    from pyspark.sql.functions import pandas_udf

    def _rot13(s):
        import codecs

        return s.map(
            lambda v: codecs.encode(v, "rot13") if v is not None else None
        )

    return pandas_udf(_rot13, "string")


def _build_sum_list():
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _sum_list(lists):
        total = 0
        for lst in lists:
            if lst is None:
                continue
            for x in lst:
                if x is not None:
                    total += int(float(x))
        return total

    return pandas_udf(_sum_list, "bigint", PandasUDFType.GROUPED_AGG)


class UDTFCount2:
    """GenericUDTFCount2: process() counts rows, close() forwards the
    count twice. Invoked with a TABLE argument (single partition) so
    the count is global — the same totality Hive's single fetch/reduce
    task gives the golden (udtf_nofetchtask.q: 'Correct output should
    be 2 rows')."""

    RETURN_TYPE = "col1 bigint"

    def __init__(self) -> None:
        self._count = 0

    def eval(self, row) -> None:  # noqa: ARG002 — row-counting only
        self._count += 1

    def terminate(self):
        yield (self._count,)
        yield (self._count,)


_FACTORIES = {
    "testlength": _build_testlength,
    "testlength2": _build_testlength2,
    "test_udf_get_java_string": _build_test_udf_get_java_string,
    "rot13": _build_rot13,
    "sum_list": _build_sum_list,
}
_BUILT: dict = {}


def __getattr__(name: str):
    if name in _FACTORIES:
        if name not in _BUILT:
            _BUILT[name] = _FACTORIES[name]()
        return _BUILT[name]
    raise AttributeError(name)
