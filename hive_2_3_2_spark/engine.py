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


class HiveQLUnsupportedError(NotImplementedError):
    """A HiveQL construct this engine deliberately does not emulate —
    raised with a precise reason instead of letting Spark produce a
    generic parse/analysis error (or, worse, silently wrong rows)."""


# Hive: FROM t TABLESAMPLE(BUCKET x OUT OF y ON col) [alias]
#   → inline filtered subquery with a deterministic modulo predicate
#   (genSamplePredicate, parse/SemanticAnalyzer.java:10268). Hive's bucket
#   hash of an integral column IS the value (ObjectInspectorUtils.hashCode),
#   so pmod(col, y) = x-1 reproduces Hive's exact bucket row set for int
#   keys. Non-integral keys use Java String.hashCode — NOT reproduced;
#   Engine.sql raises HiveQLUnsupportedError rather than silently
#   returning a different row set. The subquery form (rather than an
#   appended WHERE) stays valid with existing WHERE clauses, aliases and
#   following joins.
_TABLESAMPLE = re.compile(
    r"([\w.]+)\s+TABLESAMPLE\s*\(\s*BUCKET\s+(\d+)\s+OUT\s+OF\s+(\d+)"
    r"\s+ON\s+([\w.]+)\s*\)(\s+(?:AS\s+)?(?!WHERE|GROUP|ORDER|JOIN|ON|LEFT|"
    r"RIGHT|FULL|INNER|CROSS|UNION|LIMIT|HAVING\b)(\w+))?",
    re.IGNORECASE,
)

_INTEGRAL_TYPES = {"byte", "short", "int", "integer", "long", "bigint",
                   "smallint", "tinyint"}


def _rewrite_tablesample(m: re.Match[str], col_type: str | None = None) -> str:
    table, x, y, col = m.group(1), m.group(2), m.group(3), m.group(4)
    alias = m.group(6) or table.split(".")[-1]
    bare_col = col.split(".")[-1]
    if col_type == "string":
        # Hive buckets strings with the signed-UTF-8-byte fold
        # (ObjectInspectorUtils.hashCode:673) then
        # (hash & Integer.MAX_VALUE) % y (getBucketNumber:625) —
        # hive_bucket_hash reproduces the fold exactly.
        pred = f"(hive_bucket_hash({bare_col}) & 2147483647) % {y} = {int(x) - 1}"
    else:
        pred = f"pmod({bare_col}, {y}) = {int(x) - 1}"
    return f"(SELECT * FROM {table} WHERE {pred}) {alias}"


# Other Hive-isms Spark's parser rejects → portable rewrites. Kept
# deliberately small: almost all of HiveQL parses natively in Spark SQL.
_REWRITES: list[tuple[re.Pattern[str], str]] = [
    # Hive virtual columns (parse/VirtualColumn.java): INPUT__FILE__NAME
    # maps 1:1 to Spark's input_file_name(). BLOCK__OFFSET__INSIDE__FILE /
    # ROW__OFFSET__INSIDE__BLOCK have no parquet-scan equivalent in Spark
    # (the closest row-identity primitive is monotonically_increasing_id,
    # a different contract) — HiveQLUnsupportedError below.
    (
        re.compile(r"\bINPUT__FILE__NAME\b", re.IGNORECASE),
        "input_file_name()",
    ),
]

_UNSUPPORTED_VIRTUAL = re.compile(
    r"\b(BLOCK__OFFSET__INSIDE__FILE|ROW__OFFSET__INSIDE__BLOCK)\b",
    re.IGNORECASE,
)


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
        return self.spark.sql(rewrite_hiveql(query, spark=self.spark))

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def explain(self, query: str) -> str:
        """Formatted physical plan (reference: exec/ExplainTask.java:117).
        Uses the portable stdout-capture path (works under Spark Connect
        too), not private py4j internals."""
        from hive_2_3_2_spark.plans import explain_str

        return explain_str(self.sql(query))


def rewrite_hiveql(query: str, spark: SparkSession | None = None) -> str:
    """Apply the (small) set of HiveQL→Spark SQL rewrites.

    When a ``spark`` session is provided, TABLESAMPLE(BUCKET ... ON col)
    bucket columns are type-checked against the catalog: Hive buckets
    non-integral keys with Java String.hashCode, which pmod does not
    reproduce, so those raise HiveQLUnsupportedError instead of silently
    returning a different row set than Hive.
    """
    un = _UNSUPPORTED_VIRTUAL.search(query)
    if un:
        raise HiveQLUnsupportedError(
            f"virtual column {un.group(1)} has no Spark parquet-scan "
            "equivalent (row-identity inside a file block); use "
            "INPUT__FILE__NAME or monotonically_increasing_id() depending "
            "on intent"
        )
    col_types: dict[int, str | None] = {}
    if spark is not None:
        for m in _TABLESAMPLE.finditer(query):
            table, col = m.group(1), m.group(4).split(".")[-1]
            try:
                schema = spark.table(table).schema
            except Exception:
                continue  # unregistered table — cannot resolve, let it run
            for f in schema.fields:
                if f.name.lower() == col.lower():
                    t = f.dataType.simpleString()
                    if t in ("string", "varchar", "char"):
                        # full Hive parity via the hive_bucket_hash UDF
                        from hive_2_3_2_spark.functions.hive_hash import (
                            register_hive_hash,
                        )

                        register_hive_hash(spark)
                        col_types[m.start()] = "string"
                    elif t not in _INTEGRAL_TYPES:
                        raise HiveQLUnsupportedError(
                            f"TABLESAMPLE(BUCKET ... ON {col}): column type "
                            f"{t} has no Hive bucket-hash emulation here "
                            "(integral keys use the value, string keys the "
                            "UTF-8 byte fold) — sample on an integral or "
                            "string column"
                        )
    out = _TABLESAMPLE.sub(
        lambda m: _rewrite_tablesample(m, col_types.get(m.start())), query
    )
    for pat, repl in _REWRITES:
        out = pat.sub(repl, out)
    return out
