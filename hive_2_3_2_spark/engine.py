"""Engine facade — the single entry point a reference user would switch to.

Collapses the reference's three front-ends (CLI ``CliDriver.java:94``,
HiveServer2 ``SQLOperation.java:91``, programmatic ``Driver.java:1371``;
SURVEY.md §3) into one in-process API:

    eng = Engine(sf_dir="/root/testdata/sf0.01")
    eng.sql("SELECT ... FROM lineitem ...")     # HiveQL-compatible SQL
    eng.table("lineitem")                        # DataFrame handle

Spark's SQL parser natively accepts the Hive dialect the reference's ANTLR
grammar defines (parse/HiveParser.g) — LATERAL VIEW, DISTRIBUTE/SORT/
CLUSTER BY, GROUPING SETS, TRANSFORM — so ``sql()`` is a direct pass-through
plus a tiny rewriter for the few Hive-isms Spark rejects.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from hive_2_3_2_spark.catalog import register_star_schema
from hive_2_3_2_spark.session import get_spark


# Hive-isms Spark's parser rejects → portable rewrites. Kept deliberately
# small: almost all of HiveQL parses natively in Spark SQL.
_REWRITES: list[tuple[re.Pattern[str], str]] = [
    # `x <> y` parses fine; `==` parses fine. Hive's backtick quoting parses
    # fine. The notable gap: Hive allows `sort_array_by` (no Spark native) —
    # handled in functions/, not here.
    # Hive: SELECT ... FROM t TABLESAMPLE(BUCKET x OUT OF y ON col)
    #   → deterministic modulo filter (genSamplePredicate,
    #   parse/SemanticAnalyzer.java:10268). Hive's bucket hash of an
    #   integral column IS the value (ObjectInspectorUtils.hashCode), so
    #   pmod(col, y) = x-1 reproduces Hive's exact bucket row set for int
    #   keys (string keys would need Java String.hashCode — unsupported).
    (
        re.compile(
            r"TABLESAMPLE\s*\(\s*BUCKET\s+(\d+)\s+OUT\s+OF\s+(\d+)\s+ON\s+([\w.]+)\s*\)",
            re.IGNORECASE,
        ),
        r"WHERE pmod(\3, \2) = (\1 - 1)",
    ),
    # Hive virtual columns (parse/VirtualColumn.java): INPUT__FILE__NAME
    # maps 1:1 to Spark's input_file_name(). BLOCK__OFFSET__INSIDE__FILE /
    # ROW__OFFSET__INSIDE__BLOCK have no parquet-scan equivalent in Spark
    # (the closest row-identity primitive is monotonically_increasing_id,
    # a different contract) — left unsupported, surfaced as a parse error.
    (
        re.compile(r"\bINPUT__FILE__NAME\b", re.IGNORECASE),
        "input_file_name()",
    ),
]


class Engine:
    """A session + catalog bound to a data directory."""

    def __init__(
        self,
        spark: SparkSession | None = None,
        sf_dir: str | None = None,
    ) -> None:
        self.spark = spark or get_spark()
        self.tables: dict[str, DataFrame] = {}
        if sf_dir is not None:
            self.tables = register_star_schema(self.spark, sf_dir)

    def sql(self, query: str) -> DataFrame:
        """Run HiveQL-compatible SQL (reference entry:
        ql/src/java/org/apache/hadoop/hive/ql/Driver.java:1371 ``run``)."""
        return self.spark.sql(rewrite_hiveql(query))

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def explain(self, query: str) -> str:
        """Formatted physical plan (reference: exec/ExplainTask.java:117)."""
        df = self.sql(query)
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )


def rewrite_hiveql(query: str) -> str:
    """Apply the (small) set of HiveQL→Spark SQL rewrites."""
    out = query
    for pat, repl in _REWRITES:
        out = pat.sub(repl, out)
    return out
